"""Linear-probe evaluation entry point (reference eval_linprobe.py parity).

Frozen encoder + affine-free BatchNorm feature normalization + three linear
heads trained with LARS; prediction = mean of the three heads. Exactly six
trainable tensors (3 × W,b), asserted like the reference (:116).

Usage:
    python eval_linprobe.py [--config-name linprobe] [overrides...]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from deepavfusion_tpu.data.synthetic import use_synthetic


def build_encoder_cfg(args):
    from deepavfusion_tpu.models import deepavfusion as trunk_mod
    from deepavfusion_tpu.models.vit import vit_config

    scan = bool(args.model.get("scan_layers", False))
    # optional depth override (model.image.depth / model.audio.depth) for
    # fast smoke tests — absent from the reference flag surface
    extra_i = {"depth": args.model.image["depth"]} if args.model.image.get("depth") else {}
    extra_a = {"depth": args.model.audio["depth"]} if args.model.audio.get("depth") else {}
    if extra_i or extra_a or scan:
        cfg = trunk_mod.DeepAVFusionConfig(
            image=vit_config(args.model.image.backbone,
                             (args.data.image_size, args.data.image_size), 3, **extra_i),
            audio=vit_config(args.model.audio.backbone,
                             (args.data.audio_mels, int(args.data.audio_dur * 64)), 1, **extra_a),
            fusion_arch=args.model.fusion.arch,
            fusion_layers=args.model.fusion.layers,
            num_fusion_tkns=(args.model.fusion.num_fusion_tkns,
                             args.model.fusion.num_aggr_image_tkns,
                             args.model.fusion.num_aggr_audio_tkns),
            fusion_mlp_ratio=args.model.fusion.mlp_ratio,
            fusion_attn_ratio=args.model.fusion.attn_ratio,
            fusion_num_heads=args.model.fusion.num_heads,
            scan_layers=scan,
        )
        return cfg

    return trunk_mod.config_from_args(
        image_arch=args.model.image.backbone,
        image_size=(args.data.image_size, args.data.image_size),
        audio_arch=args.model.audio.backbone,
        audio_size=(args.data.audio_mels, int(args.data.audio_dur * 64)),
        fusion_arch=args.model.fusion.arch,
        fusion_layers=args.model.fusion.layers,
        num_fusion_tkns=(args.model.fusion.num_fusion_tkns,
                         args.model.fusion.num_aggr_image_tkns,
                         args.model.fusion.num_aggr_audio_tkns),
        fusion_mlp_ratio=args.model.fusion.mlp_ratio,
        fusion_attn_ratio=args.model.fusion.attn_ratio,
        fusion_num_heads=args.model.fusion.num_heads,
        drop_path=float(args.opt.get("drop_path", 0.0) or 0.0),
        attn_drop=float(args.opt.get("attn_drop", 0.0) or 0.0),
        drop=float(args.opt.get("proj_drop", 0.0) or 0.0),
    )


def load_encoder_checkpoint(params, args):
    """Load the pretrained encoder subtree by prefix strip: torch .pth via the
    converter, or an orbax pretraining checkpoint (state.params.encoder)."""
    import os

    path = args.get("checkpoint")
    if not path and args.get("pretrain_job_name"):
        path = (f"{args.output_dir}/checkpoints/"
                f"checkpoint_{args.pretrain_resume_epoch}")
    if not path:
        return params, False
    scan = bool(args.model.get("scan_layers", False))
    depth = int(args.model.image.get("depth") or 12)

    def adapt(tree):
        # translate between the unrolled and scanned (stacked) trunk layouts
        # as needed — checkpoints from either layout load into either model
        from deepavfusion_tpu.convert.torch2jax import stack_trunk, unstack_trunk

        if scan and "layers" not in tree:
            tree = stack_trunk(jax.tree.map(np.asarray, tree), depth)
        elif not scan and "layers" in tree:
            tree = unstack_trunk(jax.tree.map(np.asarray, tree), depth)
        return jax.tree.map(jnp.asarray, tree)

    if str(path).endswith(".pth"):
        from deepavfusion_tpu.convert import torch2jax as cvt

        sd = cvt.load_torch_state_dict(path)
        tree = cvt.deepavfusion(sd, args.encoder_prefix, depth, depth,
                                args.model.fusion.arch)
        params = dict(params)
        params["encoder"] = adapt(tree)
        print(f"Loaded pre-trained checkpoint: {path}")
        return params, True
    if os.path.exists(path):
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(path)
        enc = restored["state"]["params"]["encoder"]
        params = dict(params)
        params["encoder"] = adapt(enc)
        print(f"Loaded pre-trained checkpoint: {path}")
        return params, True
    print(f"WARNING: checkpoint {path} not found; probing a random encoder")
    return params, False


def main_worker(args) -> dict:
    from deepavfusion_tpu import runtime
    runtime.setup()
    import optax

    from deepavfusion_tpu.data import catalog, synthetic
    from deepavfusion_tpu.models.classifier import AVClassifier
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import checkpoint as ckpt_lib
    from deepavfusion_tpu.train import classify, lars as lars_lib, logging as log_lib
    from deepavfusion_tpu.train import lr_sched, meters

    job_dir = f"{args.output_dir}/{args.job_name}"
    log_lib.setup_logging(f"{job_dir}/train.log")
    print(f"job dir: {job_dir}")

    mesh = mesh_lib.make_mesh(dict(args.env.mesh) if args.env.get("mesh") else None)
    ncls = catalog.num_classes(args.data.dataset)
    multi_label = catalog.is_multi_label(args.data.dataset)

    # lr scaling (reference eval_linprobe.py:31-36 same as train.py)
    eff_batch = args.opt.batch_size * args.opt.accum_iter
    lr = args.opt.lr if args.opt.lr else args.opt.blr * eff_batch / 256
    print(f"base lr: {args.opt.blr:.2e}  actual lr: {lr:.2e}")

    dtype = jnp.bfloat16 if args.opt.get("dtype") == "bfloat16" else jnp.float32
    model = AVClassifier(build_encoder_cfg(args), ncls, freeze_encoder=True,
                         input_norm=True, dtype=dtype)

    with jax.default_device(runtime.host_cpu_device()):
        img0 = jnp.zeros((1, args.data.image_size, args.data.image_size, 3))
        aud0 = jnp.zeros((1, args.data.audio_mels, int(args.data.audio_dur * 64), 1))
        variables = model.init(jax.random.key(0), img0, aud0, train=True)
    params, batch_stats = dict(variables["params"]), variables["batch_stats"]
    params, _ = load_encoder_checkpoint(params, args)

    # LARS over exactly the 6 head tensors (reference :115-117)
    head_mask = {k: jax.tree.map(lambda _: k.endswith("_head"), v)
                 for k, v in params.items()}
    n_trainable = sum(jax.tree.leaves(jax.tree.map(int, head_mask)))
    assert n_trainable == 6, f"expected 6 trainable tensors, got {n_trainable}"

    steps_per_epoch = float(args.data.get("steps_per_epoch", 100 if args.debug else 1000)) / args.opt.accum_iter
    lr_fn = lr_sched.warmup_cosine(lr, float(args.opt.warmup_epochs),
                                   float(args.opt.epochs), steps_per_epoch)
    tx = optax.masked(
        lars_lib.lars(lr_fn, weight_decay=args.opt.weight_decay), head_mask
    )

    from deepavfusion_tpu.train import trainer as trainer_lib

    def loss_fn(p, batch, key, model_state):
        (logits_i, logits_a, logits_f), updated = model.apply(
            {"params": p, **model_state}, batch["image"], batch["audio"],
            train=True, mutable=["batch_stats"],
        )
        preds = (logits_i + logits_a + logits_f) / 3.0
        if multi_label:
            loss = classify.bce_with_logits(preds, batch["label"].astype(jnp.float32))
        else:
            loss = classify.cross_entropy(preds, batch["label"])
        return loss, ({"loss": loss}, updated)

    state = trainer_lib.TrainState.create(
        params, tx, model_state={"batch_stats": batch_stats}
    )
    step_fn = trainer_lib.make_train_step(loss_fn, tx, args.opt.accum_iter,
                                          mesh=mesh, donate=False)

    def fwd(p, ms, batch):
        return model.apply(
            {"params": p, **ms}, batch["image"], batch["audio"], train=False,
        )

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

        return pipeline.classification_loader(args, train=train, epoch=epoch)

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

        # evaluate
        pi, pa, pf, ys = [], [], [], []
        for batch in loaders(epoch, False):
            li, la, lf = eval_fn(state.params, state.model_state, batch)
            pi.append(np.asarray(li)), pa.append(np.asarray(la))
            pf.append(np.asarray(lf)), ys.append(np.asarray(batch["label"]))
        # gather host-local preds/labels across processes before scoring
        # (reference eval_linprobe.py:242-246 concat_all_gather)
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
    name = "linprobe"
    if "--config-name" in argv:
        i = argv.index("--config-name")
        name = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    main_worker(load_config(name, overrides=argv))
