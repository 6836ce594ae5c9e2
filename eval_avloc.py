"""Audio-visual sound-localization evaluation (Flickr-SoundNet).

Beyond-parity entry: the reference ships the Flickr-SoundNet data surface
(datasets.py:737-755, XML bbox consensus maps) but no consumer. This entry
evaluates a pretrained encoder zero-shot with the standard localization
protocol: the localization map is the cosine similarity between the pooled
audio embedding and every visual token embedding, upsampled to image
resolution; metrics are cIoU@0.5 and the AUC of the cIoU-vs-threshold curve
(Senocak et al. protocol).

Usage:
    python eval_avloc.py [--config-name linprobe] data.dataset=flickr_soundnet_5k \
        checkpoint=... [data.synthetic=true for a smoke run]
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

from deepavfusion_tpu.data.synthetic import use_synthetic

from eval_linprobe import build_encoder_cfg, load_encoder_checkpoint


def localization_map(x_image_tokens: np.ndarray, x_audio_tokens: np.ndarray,
                     grid: tuple[int, int], out_size: int) -> np.ndarray:
    """Cosine similarity audio-embedding × visual tokens → (out, out) map."""
    a = x_audio_tokens.mean(axis=0)
    a = a / (np.linalg.norm(a) + 1e-12)
    v = x_image_tokens / (np.linalg.norm(x_image_tokens, axis=-1,
                                         keepdims=True) + 1e-12)
    sim = v @ a                                       # (L,)
    gh, gw = grid
    m = sim.reshape(gh, gw)
    # bilinear upsample
    out = jax.image.resize(jnp.asarray(m), (out_size, out_size), "bilinear")
    m = np.asarray(out)
    lo, hi = m.min(), m.max()
    return (m - lo) / (hi - lo + 1e-12)


def ciou(loc_map: np.ndarray, gt_map: np.ndarray, map_thr: float = 0.5,
         gt_thr: float = 0.0) -> float:
    """Consensus IoU (Senocak et al.): intersection weights by consensus."""
    pred = loc_map >= map_thr * loc_map.max()
    gt = gt_map > gt_thr
    inter = (pred & gt).sum()
    union = pred.sum() + gt.sum() - inter
    return float(inter) / max(float(union), 1e-12)


def auc_of_ciou(cious: np.ndarray, thresholds=None) -> float:
    """Area under the success-rate curve: fraction of samples with
    cIoU ≥ t for t in [0, 1) (standard localization AUC)."""
    thresholds = thresholds if thresholds is not None else np.linspace(0, 1, 21)[:-1]
    success = [(cious >= t).mean() for t in thresholds]
    return float(np.mean(success))


def synthetic_loc_loader(batch, steps, image_size, mels, frames, seed=0):
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        gt = np.zeros((batch, image_size, image_size), np.float32)
        gt[:, image_size // 4 : 3 * image_size // 4,
           image_size // 4 : 3 * image_size // 4] = 1.0
        yield {
            "image": rng.randn(batch, image_size, image_size, 3).astype(np.float32),
            "audio": rng.randn(batch, mels, frames, 1).astype(np.float32),
            "gt_map": gt,
        }


def main_worker(args) -> dict:
    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.models.deepavfusion import DeepAVFusion
    from deepavfusion_tpu.train import logging as log_lib

    job_dir = f"{args.output_dir}/{args.job_name}"
    log_lib.setup_logging(f"{job_dir}/eval.log")
    print(f"job dir: {job_dir}")

    enc_cfg = build_encoder_cfg(args)
    dtype = jnp.bfloat16 if args.opt.get("dtype") == "bfloat16" else jnp.float32
    model = DeepAVFusion(enc_cfg, dtype=dtype)

    mels, frames = args.data.audio_mels, int(args.data.audio_dur * 64)
    with jax.default_device(runtime.host_cpu_device()):
        img0 = jnp.zeros((1, args.data.image_size, args.data.image_size, 3))
        aud0 = jnp.zeros((1, mels, frames, 1))
        params = {"encoder": model.init(jax.random.key(0), img0, aud0)["params"]}
    params, _ = load_encoder_checkpoint(params, args)
    enc_params = params["encoder"]

    fwd = jax.jit(lambda p, i, a: model.apply({"params": p}, i, a))

    def loaders():
        if use_synthetic(args):
            return synthetic_loc_loader(
                args.opt.batch_size, 4, args.data.image_size, mels, frames)
        from deepavfusion_tpu.data import datasets, loader, transforms

        db = datasets.load_flickr_soundnet(
            args.data.data_path, partition="val",
            metadata_dir=args.data.get("metadata_dir", "metadata"),
            visual_transform=transforms.ImageEvalTransform(
                args.data.image_size, resize_factor=1.0),
            audio_transform=transforms.AudioEvalTransform(
                args.data.audio_rate, args.data.audio_dur, args.data.audio_mels),
            audio_dur=args.data.audio_dur, audio_rate=args.data.audio_rate,
        )
        return loader.get_dataloader(db, args.env.distributed,
                                     args.opt.batch_size, args.env.workers,
                                     shuffle=False, drop_last=False)

    grid = enc_cfg.image.grid_size
    cious = []
    for batch in loaders():
        xi, xa, _ = fwd(enc_params, jnp.asarray(batch["image"]),
                        jnp.asarray(batch["audio"]))
        xi, xa = np.asarray(xi, np.float32), np.asarray(xa, np.float32)
        for i in range(xi.shape[0]):
            m = localization_map(xi[i], xa[i], grid, args.data.image_size)
            cious.append(ciou(m, np.asarray(batch["gt_map"][i])))
    cious = np.asarray(cious)
    stats = {
        "ciou_0.5": float((cious >= 0.5).mean() * 100.0),
        "auc": auc_of_ciou(cious) * 100.0,
        "n": int(cious.size),
    }
    print(f"[Eval] cIoU@0.5={stats['ciou_0.5']:.2f} AUC={stats['auc']:.2f} "
          f"(n={stats['n']})")
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
