"""Audio-visual segmentation entry point (reference eval_avsegm.py parity).

AVSBench S4/MS3 (binary) and AVSS (71-class) protocols: AVSegmSimple decoder
over a pretrained encoder, AdamW + layer decay, per-frame dense eval through
the AVSegmEvaluator (histogram mIoU / max-F).

Usage:
    python eval_avsegm.py [--config-name avsegm] [overrides...]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from deepavfusion_tpu.data.synthetic import use_synthetic

from eval_linprobe import build_encoder_cfg, load_encoder_checkpoint


def synthetic_segm_loader(batch, steps, image_size, mels, frames, ncls, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        out = {
            "image": rng.randn(batch, image_size, image_size, 3).astype(np.float32),
            "audio": rng.randn(batch, mels, frames, 1).astype(np.float32),
        }
        if ncls == 1:
            out["gt_map"] = (rng.rand(batch, image_size, image_size) > 0.7).astype(np.float32)
        else:
            out["gt_map"] = rng.randint(0, ncls, (batch, image_size, image_size)).astype(np.int32)
        yield out


def main_worker(args) -> dict:
    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.data import catalog
    from deepavfusion_tpu.models.avsegm import AVSegmSimple
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import checkpoint as ckpt_lib
    from deepavfusion_tpu.train import logging as log_lib
    from deepavfusion_tpu.train import lr_sched, meters, trainer as trainer_lib
    from deepavfusion_tpu.train.segm_eval import AVSegmEvaluator

    job_dir = f"{args.output_dir}/{args.job_name}"
    log_lib.setup_logging(f"{job_dir}/train.log")
    print(f"job dir: {job_dir}")

    mesh = mesh_lib.make_mesh(dict(args.env.mesh) if args.env.get("mesh") else None)
    nc_raw = catalog.num_classes(args.data.dataset)
    ncls = nc_raw if nc_raw > 2 else 1          # reference eval_avsegm.py:104-105

    eff_batch = args.opt.batch_size * args.opt.accum_iter
    lr = args.opt.lr if args.opt.lr else args.opt.blr * eff_batch / 256
    print(f"base lr: {args.opt.blr:.2e}  actual lr: {lr:.2e}")

    dtype = jnp.bfloat16 if args.opt.get("dtype") == "bfloat16" else jnp.float32
    enc_cfg = build_encoder_cfg(args)
    model = AVSegmSimple(enc_cfg, num_classes=ncls, dtype=dtype)

    mels, frames = args.data.audio_mels, int(args.data.audio_dur * 64)
    with jax.default_device(runtime.host_cpu_device()):
        img0 = jnp.zeros((1, args.data.image_size, args.data.image_size, 3))
        aud0 = jnp.zeros((1, mels, frames, 1))
        gt0 = (jnp.zeros((1, args.data.image_size, args.data.image_size), jnp.float32)
               if ncls == 1 else
               jnp.zeros((1, args.data.image_size, args.data.image_size), jnp.int32))
        variables = model.init(jax.random.key(0), img0, aud0, gt0, train=True)
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
        (loss, _), updated = model.apply(
            {"params": p, **model_state}, batch["image"], batch["audio"],
            batch["gt_map"], train=True, deterministic=False,
            rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return loss, ({"loss": loss}, updated)

    state = trainer_lib.TrainState.create(
        params, tx, model_state={"batch_stats": batch_stats}
    )
    step_fn = trainer_lib.make_train_step(loss_fn, tx, args.opt.accum_iter,
                                          mesh=mesh, donate=False)

    eval_fn = jax.jit(
        lambda p, ms, b: model.apply({"params": p, **ms}, b["image"], b["audio"])[1]
    )

    ckpt = ckpt_lib.CheckpointManager(f"{job_dir}/checkpoints", args.log.save_freq)
    start_epoch = 0
    if args.opt.resume and ckpt.exists():
        state, start_epoch = ckpt.resume(state)
        print(f"Resumed from epoch {start_epoch}")

    def loaders(epoch, train):
        if use_synthetic(args):
            n = max(int(steps_per_epoch), 1) if train else 4
            return synthetic_segm_loader(
                args.opt.batch_size * (args.opt.accum_iter if train else 1), n,
                args.data.image_size, mels, frames, ncls,
                seed=epoch * 1000 + (0 if train else 7),
            )
        from deepavfusion_tpu.data import pipeline

        return pipeline.segmentation_loader(args, train=train, epoch=epoch)

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

        evaluator = AVSegmEvaluator()
        for batch in loaders(epoch, False):
            logits = eval_fn(state.params, state.model_state, batch)
            evaluator.update(np.asarray(logits), np.asarray(batch["gt_map"]))
        stats = evaluator.average_metrics()
        print(f"[Eval][Ep-{epoch}] miou={stats['miou']:.3f} "
              f"miou_noBg={stats['miou_noBg']:.3f} fscore={stats['fscore']:.3f} "
              f"fscore_noBg={stats['fscore_noBg']:.3f}")
        if args.get("eval") or args.debug:
            break
    return stats


if __name__ == "__main__":
    from deepavfusion_tpu.config import load_config

    argv = sys.argv[1:]
    name = "avsegm"
    if "--config-name" in argv:
        i = argv.index("--config-name")
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main_worker(load_config(name, overrides=argv))
