"""Audio-visual synchronization entry point.

The reference releases this task's surface as models + config only:
configs/avsync.yaml names ``worker: eval_avsync`` but ships no
eval_avsync.py (SURVEY.md §2.1 #17, the orphaned capability). This entry
completes it: VideoEarlyFusion trunk + a binary sync head over the pooled
fusion tokens, trained with CE over synchronized/offset AV pairs.

Usage:
    python eval_avsync.py [--config-name avsync] [overrides...]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from deepavfusion_tpu.data.synthetic import use_synthetic
from flax import linen as nn


class AVSyncClassifier(nn.Module):
    """VideoEarlyFusion trunk + linear sync head on mean-pooled fusion tokens."""

    cfg: object
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, video, audio, deterministic: bool = True):
        from deepavfusion_tpu.models.video_earlyfusion import VideoEarlyFusion

        xv, xa, xf = VideoEarlyFusion(self.cfg, dtype=self.dtype, name="encoder")(
            video, audio, deterministic=deterministic
        )
        pooled = xf.mean(axis=1).astype(jnp.float32)
        return nn.Dense(2, name="sync_head")(pooled)


def synthetic_sync_loader(batch, steps, num_frames, size, mels, frames, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        yield {
            "video": rng.randn(batch, num_frames, size, size, 3).astype(np.float32),
            "audio": rng.randn(batch, mels, frames, 1).astype(np.float32),
            "sync": rng.randint(0, 2, batch).astype(np.int32),
        }


def main_worker(args) -> dict:
    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.models.video_earlyfusion import (VideoEarlyFusionConfig,
                                                           video_vit_config)
    from deepavfusion_tpu.models.vit import vit_config
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import checkpoint as ckpt_lib
    from deepavfusion_tpu.train import classify, logging as log_lib
    from deepavfusion_tpu.train import lr_sched, meters, trainer as trainer_lib

    job_dir = f"{args.output_dir}/{args.job_name}"
    log_lib.setup_logging(f"{job_dir}/train.log")
    print(f"job dir: {job_dir}")

    mesh = mesh_lib.make_mesh(dict(args.env.mesh) if args.env.get("mesh") else None)

    num_frames = int(args.data.num_frames)
    size = int(args.data.crop_size)
    mels, frames = args.data.audio_mels, int(args.data.audio_dur * 64)

    eff_batch = args.opt.batch_size * args.opt.accum_iter
    lr = args.opt.lr if args.opt.lr else args.opt.blr * eff_batch / 256
    dtype = jnp.bfloat16 if args.opt.get("dtype") == "bfloat16" else jnp.float32

    extra_v = {"depth": args.model.video["depth"]} if args.model.video.get("depth") else {}
    extra_a = {"depth": args.model.audio["depth"]} if args.model.audio.get("depth") else {}
    cfg = VideoEarlyFusionConfig(
        video=video_vit_config(args.model.video.backbone,
                               (num_frames, size, size), 3,
                               drop_path=float(args.opt.drop_path or 0.0), **extra_v),
        audio=vit_config(args.model.audio.backbone, (mels, frames), 1,
                         drop_path=float(args.opt.drop_path or 0.0), **extra_a),
        fusion_layers=args.model.fusion.layers,
        num_fusion_tkns=(args.model.fusion.num_fusion_tkns,
                         args.model.fusion.num_aggr_visual_tkns,
                         args.model.fusion.num_aggr_audio_tkns),
        fusion_mlp_ratio=args.model.fusion.mlp_ratio,
        fusion_attn_ratio=args.model.fusion.attn_ratio,
        drop_path=float(args.opt.drop_path or 0.0),
        remat=bool(args.model.get("remat", False)),
        # scan-over-layers trunk: ~12x smaller XLA program, minutes off cold
        # remote compiles (NOTES.md r3). Checkpoints translate between
        # layouts (convert.torch2jax.{stack,unstack}_video_trunk).
        scan_layers=bool(args.model.get("scan_layers", False)),
        fusion_num_heads=args.model.fusion.num_heads,
    )
    model = AVSyncClassifier(cfg, dtype=dtype)

    with jax.default_device(runtime.host_cpu_device()):
        v0 = jnp.zeros((1, num_frames, size, size, 3))
        a0 = jnp.zeros((1, mels, frames, 1))
        params = dict(model.init(jax.random.key(0), v0, a0)["params"])

    steps_per_epoch = float(args.data.get("steps_per_epoch", 100 if args.debug else 1000)) / args.opt.accum_iter
    opt_cfg = lr_sched.OptimizerConfig(
        lr=lr, warmup_epochs=float(args.opt.warmup_epochs),
        epochs=float(args.opt.epochs), steps_per_epoch=steps_per_epoch,
        weight_decay=args.opt.weight_decay, clip_grad=args.opt.clip_grad,
        layer_decay=args.opt.layer_decay, depth=cfg.max_depth,
    )
    tx, lr_fn = lr_sched.make_adamw(params, opt_cfg)

    def loss_fn(p, batch, key):
        logits = model.apply({"params": p}, batch["video"], batch["audio"],
                             deterministic=False, rngs={"dropout": key})
        loss = classify.label_smoothing_ce(
            logits, batch["sync"], float(args.opt.smoothing or 0.0))
        acc = (logits.argmax(-1) == batch["sync"]).mean() * 100.0
        return loss, {"loss": loss, "acc": acc}

    state = trainer_lib.TrainState.create(params, tx)
    step_fn = trainer_lib.make_train_step(loss_fn, tx, args.opt.accum_iter,
                                          mesh=mesh, donate=False)
    eval_fn = jax.jit(lambda p, b: model.apply({"params": p}, b["video"], b["audio"]))

    ckpt = ckpt_lib.CheckpointManager(f"{job_dir}/checkpoints", args.log.save_freq)
    start_epoch = 0
    if args.opt.resume and ckpt.exists():
        state, start_epoch = ckpt.resume(state)
        print(f"Resumed from epoch {start_epoch}")

    def loaders(epoch, train):
        if use_synthetic(args):
            n = max(int(steps_per_epoch), 1) if train else 4
            return synthetic_sync_loader(
                args.opt.batch_size * (args.opt.accum_iter if train else 1), n,
                num_frames, size, mels, frames, seed=epoch * 1000 + (0 if train else 7))
        from deepavfusion_tpu.data import datasets, loader, transforms

        db = datasets.load_dataset(
            args.data.dataset, args.data.data_path, dataset_type="simple",
            train=train, audio_dur=args.data.audio_dur,
            audio_rate=args.data.audio_rate,
        )
        sync_db = datasets.AVSyncVideoDataset(
            db.base_path, db.video_files, audio_dur=args.data.audio_dur,
            audio_rate=args.data.audio_rate,
            class_labels=db.class_labels, class_desc=db.class_desc,
            temporal_jitter=train,
            visual_transform=(transforms.ImageTrainTransform(size, args.data.crop_min)
                              if train else transforms.ImageEvalTransform(size)),
            audio_transform=(transforms.AudioTrainTransform(
                args.data.audio_rate, args.data.audio_dur, mels) if train else
                transforms.AudioEvalTransform(
                    args.data.audio_rate, args.data.audio_dur, mels)),
            num_frames=num_frames, video_rate=int(args.data.video_rate),
        )
        return loader.get_dataloader(sync_db, args.env.distributed,
                                     args.opt.batch_size * (args.opt.accum_iter if train else 1),
                                     args.env.workers, shuffle=train, drop_last=train)

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
                batch = {k: v for k, v in batch.items() if k != "file_id"}
                batch = mesh_lib.shard_batch(batch, mesh)
                key = jax.random.fold_in(jax.random.key(0), epoch * 100000 + it)
                state, m = step_fn(state, batch, key)
                # one-step-late metrics: no per-step host<->device sync
                ready = deferred.push(it, m)
                if ready is not None:
                    _, pm = ready
                    if not np.isfinite(pm["loss"]):
                        raise RuntimeError(f"Loss is {pm['loss']}")
                    logger.update(n=args.opt.batch_size, loss=pm["loss"],
                                  acc=pm["acc"], grad_norm=pm["grad_norm"])
                if args.debug and it >= 3:
                    break
            ready = deferred.pop()
            if ready is not None:
                _, pm = ready
                if not np.isfinite(pm["loss"]):
                    raise RuntimeError(f"Loss is {pm['loss']}")
                logger.update(n=args.opt.batch_size, loss=pm["loss"],
                              acc=pm["acc"], grad_norm=pm["grad_norm"])
            logger.synchronize_between_processes()
            print(f"{header} Averaged stats: {logger}")
            ckpt.save(epoch + 1, jax.device_get(state))

        correct, total = 0, 0
        for batch in loaders(epoch, False):
            batch = {k: v for k, v in batch.items() if k != "file_id"}
            logits = np.asarray(eval_fn(state.params, batch))
            correct += int((logits.argmax(-1) == batch["sync"]).sum())
            total += len(batch["sync"])
        stats = {"val_sync_acc": 100.0 * correct / max(total, 1)}
        print(f"[Eval][Ep-{epoch}] sync_acc={stats['val_sync_acc']:.2f}")
        if args.get("eval") or args.debug:
            break
    return stats


if __name__ == "__main__":
    from deepavfusion_tpu.config import load_config

    argv = sys.argv[1:]
    name = "avsync"
    if "--config-name" in argv:
        i = argv.index("--config-name")
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main_worker(load_config(name, overrides=argv))
