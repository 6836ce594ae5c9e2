"""Audio-visual source-separation entry point (reference eval_avsrcsep.py parity).

Trains a conditioned U-Net to predict the target source's mel mask from a
mixture; evaluates by lifting the sigmoid mask to linear frequency via the
mel filterbank, masking the complex mixture STFT, ISTFT back to waveform and
scoring SDR/SIR/SAR with bss_eval (all DSP host-side, matching the
reference's CPU SpectrogramMasking path, eval_avsrcsep.py:264-277).

Usage:
    python eval_avsrcsep.py [--config-name avsrcsep] [overrides...]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from deepavfusion_tpu.data.synthetic import use_synthetic

from eval_linprobe import build_encoder_cfg, load_encoder_checkpoint


def synthetic_srcsep_loader(batch, steps, image_size, mels, frames, rate=16000,
                            dur=3.0, seed=0, with_waveforms=False):
    from deepavfusion_tpu.data.transforms import log_mel_np

    rng = np.random.RandomState(seed)
    n = int(rate * dur)
    for _ in range(steps):
        # two synthetic tones + noise as the two sources
        t = np.arange(n) / rate
        w1 = (0.4 * np.sin(2 * np.pi * rng.uniform(200, 1000) * t)
              + 0.05 * rng.randn(n)).astype(np.float32)[None].repeat(batch, 0)
        w2 = (0.4 * np.sin(2 * np.pi * rng.uniform(1500, 4000) * t)
              + 0.05 * rng.randn(n)).astype(np.float32)[None].repeat(batch, 0)
        mel = lambda w: log_mel_np(w, rate, n_mels=mels)
        out = {
            "image": rng.randn(batch, image_size, image_size, 3).astype(np.float32),
            "audio": mel(w1)[..., None],                 # target source spec
            "mixed_audio": mel(w1 + w2)[..., None],
        }
        if with_waveforms:
            out["waveforms"] = np.stack([w1, w2], axis=1)    # (B, 2, n)
            out["frames"] = rng.randn(batch, 2, image_size, image_size, 3).astype(np.float32)
        yield out


def separate_waveform(mix_waveform: np.ndarray, pred_mask_logits: np.ndarray,
                      rate: int, mels: int) -> np.ndarray:
    """SpectrogramMasking parity: sigmoid mask (mels, 192) → pad one frame →
    mel→linear lift → complex-STFT multiply → ISTFT (reference :272-277).

    Runs on the host CPU backend — this is the reference's CPU DSP path, and
    complex FFT is unimplemented on the axon TPU backend anyway.
    """
    from deepavfusion_tpu.ops import audio as audio_ops
    from deepavfusion_tpu import runtime

    n_fft = int(rate * 0.05)
    hop = int(rate / 64)
    mask = 1.0 / (1.0 + np.exp(-np.asarray(pred_mask_logits, np.float32)))
    mask = np.concatenate([mask, np.zeros(mask.shape[:-1] + (1,), np.float32)], -1)
    with jax.default_device(runtime.host_cpu_device()):
        lin = np.asarray(audio_ops.mel_to_linear(jnp.asarray(mask), rate, n_fft))
        spec = np.asarray(audio_ops.spectrogram(
            jnp.asarray(mix_waveform), n_fft, hop, power=None))
        rec = audio_ops.inverse_spectrogram(
            jnp.asarray(lin * spec), mix_waveform.shape[-1], n_fft, hop)
    return np.asarray(rec)


def main_worker(args) -> dict:
    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.models.avsrcsep import AVSrcSep
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import checkpoint as ckpt_lib
    from deepavfusion_tpu.train import logging as log_lib
    from deepavfusion_tpu.train import lr_sched, meters, trainer as trainer_lib
    from deepavfusion_tpu.train.bss_eval import AVSrcSepEvaluator

    job_dir = f"{args.output_dir}/{args.job_name}"
    log_lib.setup_logging(f"{job_dir}/train.log")
    print(f"job dir: {job_dir}")

    mesh = mesh_lib.make_mesh(dict(args.env.mesh) if args.env.get("mesh") else None)

    eff_batch = args.opt.batch_size * args.opt.accum_iter
    lr = args.opt.lr if args.opt.lr else args.opt.blr * eff_batch / 256
    print(f"base lr: {args.opt.blr:.2e}  actual lr: {lr:.2e}")

    dtype = jnp.bfloat16 if args.opt.get("dtype") == "bfloat16" else jnp.float32
    enc_cfg = build_encoder_cfg(args)
    model = AVSrcSep(enc_cfg, log_freq=args.avss.log_freq,
                     weighted_loss=args.avss.weighted_loss,
                     binary_mask=args.avss.binary_mask, dtype=dtype)

    mels, frames = args.data.audio_mels, int(args.data.audio_dur * 64)
    with jax.default_device(runtime.host_cpu_device()):
        img0 = jnp.zeros((1, args.data.image_size, args.data.image_size, 3))
        aud0 = jnp.zeros((1, mels, frames, 1))
        variables = model.init(jax.random.key(0), img0, aud0, aud0, train=True)
    params = dict(variables["params"])
    batch_stats = variables["batch_stats"]
    params, _ = load_encoder_checkpoint(params, args)

    steps_per_epoch = float(args.data.get("steps_per_epoch", 100 if args.debug else 1000)) / args.opt.accum_iter
    opt_cfg = lr_sched.OptimizerConfig(
        lr=lr, warmup_epochs=float(args.opt.warmup_epochs),
        epochs=float(args.opt.epochs), steps_per_epoch=steps_per_epoch,
        weight_decay=args.opt.weight_decay, clip_grad=args.opt.clip_grad,
        layer_decay=args.opt.layer_decay, depth=enc_cfg.max_depth,
    )
    tx, lr_fn = lr_sched.make_adamw(params, opt_cfg)

    def loss_fn(p, batch, key, model_state):
        (loss, _, _), updated = model.apply(
            {"params": p, **model_state}, batch["image"], batch["mixed_audio"],
            batch["audio"], train=True, deterministic=False,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return loss, ({"loss": loss}, updated)

    state = trainer_lib.TrainState.create(
        params, tx, model_state={"batch_stats": batch_stats}
    )
    step_fn = trainer_lib.make_train_step(loss_fn, tx, args.opt.accum_iter,
                                          mesh=mesh, donate=False)

    eval_fn = jax.jit(
        lambda p, ms, img, mix: model.apply({"params": p, **ms}, img, mix)[1]
    )

    ckpt = ckpt_lib.CheckpointManager(f"{job_dir}/checkpoints", args.log.save_freq)
    start_epoch = 0
    if args.opt.resume and ckpt.exists():
        state, start_epoch = ckpt.resume(state)
        print(f"Resumed from epoch {start_epoch}")

    def loaders(epoch, train):
        if use_synthetic(args):
            n = max(int(steps_per_epoch), 1) if train else 2
            return synthetic_srcsep_loader(
                args.opt.batch_size * (args.opt.accum_iter if train else 1), n,
                args.data.image_size, mels, frames, args.data.audio_rate,
                args.data.audio_dur, seed=epoch * 1000 + (0 if train else 7),
                with_waveforms=not train,
            )
        from deepavfusion_tpu.data import pipeline

        return pipeline.srcsep_loader(args, train=train, epoch=epoch)

    state = mesh_lib.replicate(state, mesh)
    stats = {}
    epochs = int(args.opt.epochs)
    for epoch in range(start_epoch, epochs):
        if not args.get("eval"):
            logger = meters.MetricLogger()
            deferred = meters.DeferredMetrics()
            header = f"[Train][Ep-{epoch}/{epochs}]"
            for it, batch in enumerate(
                logger.log_every(loaders(epoch, True), args.log.print_freq, header)
            ):
                batch = mesh_lib.shard_batch(batch, mesh)
                key = jax.random.fold_in(jax.random.key(0), epoch * 100000 + it)
                state, m = step_fn(state, batch, key)
                # one-step-late metrics: no per-step host<->device sync
                ready = deferred.push(it, m)
                if ready is not None:
                    pit, pm = ready
                    if not np.isfinite(pm["loss"]):
                        raise RuntimeError(f"Loss is {pm['loss']}")
                    logger.update(n=args.opt.batch_size, loss=pm["loss"],
                                  grad_norm=pm["grad_norm"],
                                  lr=float(lr_fn(epoch * steps_per_epoch + pit)))
                if args.debug and it >= 3:
                    break
            ready = deferred.pop()
            if ready is not None:
                pit, pm = ready
                if not np.isfinite(pm["loss"]):
                    raise RuntimeError(f"Loss is {pm['loss']}")
                logger.update(n=args.opt.batch_size, loss=pm["loss"],
                              grad_norm=pm["grad_norm"],
                              lr=float(lr_fn(epoch * steps_per_epoch + pit)))
            logger.synchronize_between_processes()
            print(f"{header} Averaged stats: {logger}")
            ckpt.save(epoch + 1, jax.device_get(state))

        # evaluate: two forward passes (one per source frame), mask → ISTFT → bss
        evaluator = AVSrcSepEvaluator()
        for batch in loaders(epoch, False):
            if "waveforms" not in batch:
                continue
            mix_wave = batch["waveforms"].sum(1)
            m1 = np.asarray(eval_fn(state.params, state.model_state,
                                    jnp.asarray(batch["frames"][:, 0]),
                                    jnp.asarray(batch["mixed_audio"])))
            m2 = np.asarray(eval_fn(state.params, state.model_state,
                                    jnp.asarray(batch["frames"][:, 1]),
                                    jnp.asarray(batch["mixed_audio"])))
            for i in range(mix_wave.shape[0]):
                gt = batch["waveforms"][i]
                p1 = separate_waveform(mix_wave[i], m1[i], args.data.audio_rate, mels)
                p2 = separate_waveform(mix_wave[i], m2[i], args.data.audio_rate, mels)
                pred = np.stack([p1, p2], 0)
                if (gt**2).sum(-1).min() < 1e-5 or (pred**2).sum(-1).min() < 1e-5:
                    continue
                evaluator.update(gt, pred, name=i)
        if evaluator.sdr_list:
            sdr, sir, sar = evaluator.average_sdr_sir_sar()
            stats = {"sdr": sdr, "sir": sir, "sar": sar}
            print(f"[Eval][Ep-{epoch}] SDR={sdr:.4f} SIR={sir:.4f} SAR={sar:.4f}")
        if args.get("eval") or args.debug:
            break
    return stats


if __name__ == "__main__":
    from deepavfusion_tpu.config import load_config

    argv = sys.argv[1:]
    name = "avsrcsep"
    if "--config-name" in argv:
        i = argv.index("--config-name")
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main_worker(load_config(name, overrides=argv))
