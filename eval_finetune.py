"""Full fine-tuning entry point (reference eval_finetune.py parity).

Trainable encoder with drop-path, AVMixup (joint image+audio, per-element
lambda), class-prior head-bias init, AdamW with BEiT layer-wise lr decay,
class-frequency-weighted joint loss, dense multi-frame eval (5-D input
flattened to batch, logits averaged over frames).

Usage:
    python eval_finetune.py [--config-name finetune] [overrides...]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from deepavfusion_tpu.data.synthetic import use_synthetic

from eval_linprobe import build_encoder_cfg, load_encoder_checkpoint


def main_worker(args) -> dict:
    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.data import catalog, synthetic
    from deepavfusion_tpu.models.classifier import AVClassifier
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import checkpoint as ckpt_lib
    from deepavfusion_tpu.train import classify, logging as log_lib
    from deepavfusion_tpu.train import lr_sched, meters, trainer as trainer_lib

    job_dir = f"{args.output_dir}/{args.job_name}"
    log_lib.setup_logging(f"{job_dir}/train.log")
    print(f"job dir: {job_dir}")

    mesh = mesh_lib.make_mesh(dict(args.env.mesh) if args.env.get("mesh") else None)
    ncls = catalog.num_classes(args.data.dataset)
    multi_label = catalog.is_multi_label(args.data.dataset)

    eff_batch = args.opt.batch_size * args.opt.accum_iter
    lr = args.opt.lr if args.opt.lr else args.opt.blr * eff_batch / 256
    print(f"base lr: {args.opt.blr:.2e}  actual lr: {lr:.2e}")

    dtype = jnp.bfloat16 if args.opt.get("dtype") == "bfloat16" else jnp.float32
    model = AVClassifier(build_encoder_cfg(args), ncls, freeze_encoder=False,
                         input_norm=False, dtype=dtype)

    with jax.default_device(runtime.host_cpu_device()):
        img0 = jnp.zeros((1, args.data.image_size, args.data.image_size, 3))
        aud0 = jnp.zeros((1, args.data.audio_mels, int(args.data.audio_dur * 64), 1))
        params = dict(model.init(jax.random.key(0), img0, aud0)["params"])
    params, _ = load_encoder_checkpoint(params, args)

    # class-frequency table: from the dataset when available, else uniform
    if use_synthetic(args):
        class_freq = np.full((ncls,), 1.0 / ncls, np.float32)
    else:
        from deepavfusion_tpu.data import pipeline

        class_freq = pipeline.class_distribution(args)
    bias = classify.head_bias_init(class_freq)
    for head in ("image_head", "audio_head", "fusion_head"):
        params[head] = dict(params[head])
        params[head]["bias"] = jnp.asarray(bias)

    depth = build_encoder_cfg(args).max_depth
    steps_per_epoch = float(args.data.get("steps_per_epoch", 100 if args.debug else 1000)) / args.opt.accum_iter
    opt_cfg = lr_sched.OptimizerConfig(
        lr=lr, warmup_epochs=float(args.opt.warmup_epochs),
        epochs=float(args.opt.epochs), steps_per_epoch=steps_per_epoch,
        weight_decay=args.opt.weight_decay, clip_grad=args.opt.clip_grad,
        layer_decay=args.opt.layer_decay, depth=depth,
    )
    tx, lr_fn = lr_sched.make_adamw(params, opt_cfg)

    smoothing = float(args.opt.smoothing or 0.0)
    use_mixup = float(args.data.get("mixup", 0.0) or 0.0) > 0.0
    cf = np.asarray(class_freq)            # host-side: static seen-mask
    seen = cf > 0

    def loss_fn(p, batch, key):
        image, audio = batch["image"], batch["audio"]
        labels = batch["label"]
        drop_key, mix_key = jax.random.split(key)
        if use_mixup:
            image, audio, targets = classify.av_mixup(
                mix_key, image, audio, labels, ncls,
                mixup_alpha=float(args.data.mixup),
                prob=float(args.data.mixup_prob), smoothing=smoothing,
            )
        li, la, lf = model.apply(
            {"params": p}, image, audio, train=True, deterministic=False,
            rngs={"dropout": drop_key},
        )
        def crit(logits):
            if use_mixup:
                if multi_label:
                    return classify.bce_with_logits(
                        logits[:, seen], targets[:, seen], reduce=False)
                return classify.soft_target_ce(logits[:, seen], targets[:, seen])
            if multi_label:
                return classify.bce_with_logits(
                    logits[:, seen], labels.astype(jnp.float32)[:, seen], reduce=False)
            if smoothing > 0:
                return classify.label_smoothing_ce(logits, labels, smoothing)
            return classify.cross_entropy(logits, labels)

        if args.opt.joint_loss:
            loss = crit((li + la + lf) / 3.0)
        else:
            loss = (crit(li) + crit(la) + crit(lf)) / 3.0
        loss = classify.class_weighted_loss(loss, cf, multi_label and use_mixup)
        return loss, {"loss": loss}

    state = trainer_lib.TrainState.create(params, tx)
    step_fn = trainer_lib.make_train_step(loss_fn, tx, args.opt.accum_iter,
                                          mesh=mesh, donate=False)

    def fwd(p, batch):
        image = batch["image"]
        if image.ndim == 5:  # dense eval: (B, N, H, W, C) → flatten to batch
            b, n = image.shape[:2]
            li, la, lf = model.apply(
                {"params": p},
                image.reshape((b * n,) + image.shape[2:]),
                batch["audio"].reshape((b * n,) + batch["audio"].shape[2:]),
            )
            return (li.reshape(b, n, -1).mean(1), la.reshape(b, n, -1).mean(1),
                    lf.reshape(b, n, -1).mean(1))
        return model.apply({"params": p}, image, batch["audio"])

    eval_fn = jax.jit(fwd)

    ckpt = ckpt_lib.CheckpointManager(f"{job_dir}/checkpoints", args.log.save_freq)
    start_epoch = 0
    if args.opt.resume and ckpt.exists():
        state, start_epoch = ckpt.resume(state)
        print(f"Resumed from epoch {start_epoch}")

    def loaders(epoch, train):
        if use_synthetic(args):
            n = max(int(steps_per_epoch), 1) if train else 8
            return synthetic.synthetic_loader(
                args.opt.batch_size * (args.opt.accum_iter if train else 1), n,
                seed=epoch * 1000 + (0 if train else 777),
                image_size=args.data.image_size, audio_mels=args.data.audio_mels,
                audio_frames=int(args.data.audio_dur * 64), num_classes=ncls,
            )
        from deepavfusion_tpu.data import pipeline

        return pipeline.classification_loader(args, train=train, epoch=epoch,
                                              dense_val=True)

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

        pi, pa, pf, ys = [], [], [], []
        for batch in loaders(epoch, False):
            li, la, lf = eval_fn(state.params, batch)
            pi.append(np.asarray(li)), pa.append(np.asarray(la))
            pf.append(np.asarray(lf)), ys.append(np.asarray(batch["label"]))
        # gather host-local preds/labels across processes before scoring
        # (reference eval_linprobe.py:242-246 concat_all_gather; finetune
        # evaluates through the same gathered-prediction protocol)
        cat = lambda xs: mesh_lib.host_gather(np.concatenate(xs))
        stats = classify.classification_eval_stats(
            cat(pi), cat(pa), cat(pf), cat(ys), multi_label,
        )
        print(f"[Eval][Ep-{epoch}] " + " | ".join(f"{k}={v:.2f}" for k, v in stats.items()))
        if args.get("eval") or args.debug:
            break
    return stats


if __name__ == "__main__":
    from deepavfusion_tpu.config import load_config

    argv = sys.argv[1:]
    name = "finetune"
    if "--config-name" in argv:
        i = argv.index("--config-name")
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main_worker(load_config(name, overrides=argv))
