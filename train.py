"""MAE pretraining entry point (reference train.py parity).

Usage:
    python train.py [--config-name deepavfusion] [opt.epochs=10] [debug=true] ...

Composes the YAML config, builds the AVMAE model + jitted DP train step,
runs the epoch loop with checkpointing, metric logging and the online kNN
probe. With no dataset on disk (or ``data.synthetic=true``) it runs on
synthetic batches — the TPU-native analogue of the reference's debug mode.
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from deepavfusion_tpu.data.synthetic import use_synthetic


def main_worker(args) -> dict:
    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.data import synthetic
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import checkpoint as ckpt_lib
    from deepavfusion_tpu.train import logging as log_lib
    from deepavfusion_tpu.train import meters, pretrain

    job_dir = f"{args.output_dir}/{args.job_name}"
    log_lib.setup_logging(f"{job_dir}/train.log")
    print(f"job dir: {job_dir}")

    mesh = mesh_lib.make_mesh(dict(args.env.mesh) if args.env.get("mesh") else None)
    n_dev = mesh.devices.size
    world_batch = args.opt.batch_size

    cfg = pretrain.PretrainConfig(
        image_backbone=args.model.image.backbone,
        audio_backbone=args.model.audio.backbone,
        image_depth=args.model.image.get("depth"),
        audio_depth=args.model.audio.get("depth"),
        scan_layers=bool(args.model.get("scan_layers", False)),
        remat=bool(args.model.get("remat", False)),
        image_size=args.data.image_size,
        audio_mels=args.data.audio_mels,
        audio_frames=int(args.data.audio_dur * 64),
        fusion_arch=args.model.fusion.arch,
        fusion_layers=args.model.fusion.layers,
        num_fusion_tkns=(args.model.fusion.num_fusion_tkns,
                         args.model.fusion.num_aggr_image_tkns,
                         args.model.fusion.num_aggr_audio_tkns),
        fusion_mlp_ratio=args.model.fusion.mlp_ratio,
        fusion_attn_ratio=args.model.fusion.attn_ratio,
        fusion_num_heads=args.model.fusion.num_heads,
        image_decoder_arch=args.model.image.decoder_arch,
        image_decoder_depth=args.model.image.decoder_depth,
        image_mask_ratio=args.model.image.mask_ratio,
        image_norm_loss=args.model.image.norm_loss,
        audio_decoder_arch=args.model.audio.decoder_arch,
        audio_decoder_depth=args.model.audio.decoder_depth,
        audio_mask_ratio=args.model.audio.mask_ratio,
        audio_norm_loss=args.model.audio.norm_loss,
        epochs=float(args.opt.epochs),
        warmup_epochs=float(args.opt.warmup_epochs),
        batch_size=args.opt.batch_size,
        accum_iter=args.opt.accum_iter,
        weight_decay=args.opt.weight_decay,
        blr=args.opt.blr,
        lr=args.opt.lr,
        clip_grad=args.opt.clip_grad,
        pt_lr_mult_start=args.opt.pt_lr_mult_start,
        pt_lr_mult_end=args.opt.pt_lr_mult_end,
        pt_warmup_epochs=args.opt.pt_warmup_epochs,
        image_pretrained=bool(args.model.image.pretrained),
        audio_pretrained=bool(args.model.audio.pretrained),
        dtype=jnp.bfloat16 if args.opt.get("dtype", "bfloat16") == "bfloat16" else jnp.float32,
    )

    # Data
    steps_per_epoch = int(args.data.get("steps_per_epoch", 100 if args.debug else 1000))
    cfg.steps_per_epoch = float(steps_per_epoch) / cfg.accum_iter

    def epoch_loader(epoch):
        if use_synthetic(args):
            return synthetic.synthetic_loader(
                cfg.batch_size * cfg.accum_iter,
                max(steps_per_epoch // cfg.accum_iter, 1),
                seed=epoch * 100_000, image_size=cfg.image_size,
                audio_mels=cfg.audio_mels, audio_frames=cfg.audio_frames,
                u8_images=bool(args.data.get("u8_images", True)),
            )
        from deepavfusion_tpu.data import pipeline

        return pipeline.pretrain_loader(args, cfg, epoch)

    # Model + step
    model = pretrain.build_model(cfg)
    params = pretrain.init_params(model, cfg, seed=args.env.seed or 0)
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"Model: AVMAE {cfg.image_backbone}+{cfg.audio_backbone} "
          f"fusion={cfg.fusion_arch} params={n_params/1e6:.1f}M")
    print(f"base lr: {cfg.blr:.2e}  actual lr: {pretrain.effective_lr(cfg, world_batch):.2e}  "
          f"accum: {cfg.accum_iter}  eff batch: {world_batch * cfg.accum_iter}")

    # Pretrained backbone init (MAE-IN1k / AudioMAE) when checkpoints exist
    params = maybe_load_backbone_inits(params, args)

    tx, state, step_fn, lr_fn = pretrain.make_pretrain_step(
        model, params, cfg, world_batch, mesh=mesh,
        watch_gradients=bool(args.log.get("wandb_watch_freq", 0)),
    )
    state = mesh_lib.replicate(state, mesh)

    ckpt = ckpt_lib.CheckpointManager(f"{job_dir}/checkpoints", args.log.save_freq)
    start_epoch = 0
    if args.opt.resume and ckpt.exists():
        state, start_epoch = ckpt.resume(state)
        print(f"Resumed from epoch {start_epoch}")

    wb = log_lib.MetricsLogger(
        job_dir, args.job_name, dict(args), use_wandb=args.log.use_wandb,
        entity=args.log.wandb_entity, project=args.log.wandb_project,
        print_freq=args.log.print_freq,
    )

    # Online kNN retrieval probe (reference train.py:117,131-134)
    knn_probe = build_knn_probe(model, cfg, args, mesh)

    from deepavfusion_tpu.train.profiling import StepProfiler

    profiler = StepProfiler(
        log_dir=f"{job_dir}/profile",
        num_steps=int(args.log.get("profile_steps", 0) or 0),
    )

    epochs = int(args.opt.epochs)
    last = {}

    def consume(ready):
        """Handle the one-step-late host copy of the metrics."""
        if ready is None:
            return
        pstep, m = ready
        m["lr"] = float(lr_fn(pstep))
        if not np.isfinite(m["loss"]):
            raise RuntimeError(f"Loss is {m['loss']}, stopping training")
        # vector metrics (grad_hist/* from watch_gradients) bypass the
        # scalar meters and go straight to the sink as histograms
        hists = {k: v for k, v in m.items() if getattr(v, "ndim", 0)}
        logger.update(n=cfg.batch_size,
                      **{k: v for k, v in m.items() if k not in hists})
        wb.log({**logger.latest(), **hists}, step=pstep)

    for epoch in range(start_epoch, epochs):
        logger = meters.MetricLogger()
        deferred = meters.DeferredMetrics()
        header = f"[Train][Ep-{epoch}/{epochs}]"
        for it, batch in enumerate(
            logger.log_every(epoch_loader(epoch), args.log.print_freq, header)
        ):
            gstep = int(cfg.steps_per_epoch) * epoch + it
            profiler.step_begin(gstep)
            batch = mesh_lib.shard_batch(batch, mesh)
            key = jax.random.fold_in(jax.random.key(args.env.seed or 0), gstep)
            state, m = step_fn(state, batch, key)
            # one-step-deep pipeline: materialize the PREVIOUS step's metrics
            # while this step executes (no per-step host<->device sync)
            consume(deferred.push(gstep, m))
            profiler.step_end(gstep)
            if args.debug and it >= 3:
                break
        consume(deferred.pop())
        logger.synchronize_between_processes()
        print(f"{header} Averaged stats: {logger}")
        last = logger.averages()

        if knn_probe is not None and (
            epoch % args.log.eval_freq == 0 or epoch == epochs - 1
            or epoch == start_epoch
        ):
            knn_stats = knn_probe.evaluate(state.params, epoch=epoch)
            wb.log(knn_stats, step=int(cfg.steps_per_epoch) * (epoch + 1), force=True)
            last.update(knn_stats)

        ckpt.save(epoch + 1, jax.device_get(state))
    return last


def build_knn_probe(model, cfg, args, mesh):
    """kNN probe over the held-out set; synthetic fallback in debug runs."""
    from deepavfusion_tpu.data import catalog, synthetic
    from deepavfusion_tpu.train.knn_probe import EvalAVNNProbe

    if not args.get("nn_probe"):
        return None

    def encode_fn(params, image, audio):
        return model.apply(
            {"params": params}, jnp.asarray(image), jnp.asarray(audio),
            method=lambda m, i, a: m.encoder(i, a),
        )

    encode_jit = jax.jit(encode_fn)

    if use_synthetic(args):
        ncls = catalog.NUM_CLASSES.get(args.data.dataset, 10)

        def loader_fn():
            return synthetic.synthetic_loader(
                max(args.opt.batch_size // 4, 2), 4, seed=12345,
                image_size=cfg.image_size, audio_mels=cfg.audio_mels,
                audio_frames=cfg.audio_frames, num_classes=ncls,
            )
    else:
        from deepavfusion_tpu.data import pipeline

        def loader_fn():
            return pipeline.classification_loader(args, train=False)

    multi = catalog.MULTI_CLASS_DBS.get(args.data.dataset, False)
    return EvalAVNNProbe(encode_jit, loader_fn, multi_label=multi)


def maybe_load_backbone_inits(params, args):
    """Load MAE-IN1k / AudioMAE .pth inits when present on disk (reference
    models/vits.py:9-14 PRETRAINED_WEIGHTS). Silently skipped otherwise."""
    import os

    from deepavfusion_tpu.convert import torch2jax as cvt

    table = {
        "vit_base_audiomae_as2m": "assets/models/vitbase_audiomae_as2m.pth",
        "vit_base_mae_in1k": "assets/models/mae_pretrain_vit_base.pth",
    }
    for mod in ("image", "audio"):
        name = args.model[mod].get("pretrained")
        path = table.get(str(name), None)
        if path and os.path.exists(path):
            sd = cvt.load_torch_state_dict(path)
            depth = len([k for k in params["encoder"][mod] if k.startswith("blocks_")])
            tree = cvt.vit_from_mae_init(sd, depth)
            import jax.numpy as jnp_

            params["encoder"][mod].update(
                {k: jax.tree.map(jnp_.asarray, v) for k, v in tree.items()}
            )
            print(f"Loaded {mod} backbone init from {path}")
    return params


if __name__ == "__main__":
    from deepavfusion_tpu.config import load_config

    argv = sys.argv[1:]
    name = "deepavfusion"
    if "--config-name" in argv:
        i = argv.index("--config-name")
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    args = load_config(name, overrides=argv)
    main_worker(args)
