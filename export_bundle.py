"""Export a trained model as a serving bundle (deepavfusion_tpu/serve.py).

Completes the train → deploy story: point at a pretraining or probe/finetune
checkpoint (orbax, or a torch .pth through the converter) and get a
platform-portable StableHLO + params bundle that serves with no model code.

    # pooled-feature encoder bundle from a pretraining checkpoint
    python export_bundle.py --config-name linprobe task=encoder \
        checkpoint=checkpoints/.../checkpoint_latest bundle_dir=/tmp/enc \
        bundle_batch=8

    # three-logit-head classifier bundle (random-init head unless a
    # classifier checkpoint is given via classifier_checkpoint=...)
    python export_bundle.py --config-name linprobe task=classifier \
        checkpoint=... bundle_dir=/tmp/cls nn_probe.num_classes=309

    # dense heads: avsegm mask logits / avsrcsep separation-mask logits
    # (head_checkpoint= restores a trained head incl. BatchNorm stats)
    python export_bundle.py --config-name linprobe task=avsegm \
        checkpoint=... head_checkpoint=... bundle_dir=/tmp/segm

Uses the same config surface as eval_linprobe (model.*, data.*); the
encoder checkpoint resolves exactly as there (checkpoint= or
pretrain_job_name=).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main_worker(args) -> str:
    from deepavfusion_tpu import runtime, serve
    runtime.setup()
    from eval_linprobe import build_encoder_cfg, load_encoder_checkpoint

    task = args.get("task", "encoder")
    out_dir = args.get("bundle_dir") or f"{args.output_dir}/bundle_{task}"
    batch = int(args.get("bundle_batch", 8))
    quantize = args.get("bundle_quantize") or None   # "int8" → weight-only PTQ
    image_size = int(args.data.image_size)
    mels = int(args.data.audio_mels)
    frames = int(args.data.audio_dur * 64)

    cfg = build_encoder_cfg(args)
    with jax.default_device(runtime.host_cpu_device()):
        img0 = jnp.zeros((1, image_size, image_size, 3))
        aud0 = jnp.zeros((1, mels, frames, 1))
        if task == "encoder":
            from deepavfusion_tpu.models.deepavfusion import DeepAVFusion

            model = DeepAVFusion(cfg)
            params = model.init(jax.random.key(0), img0, aud0)["params"]
            params = {"encoder": params}
            params, loaded = load_encoder_checkpoint(params, args)
            print(f"encoder checkpoint loaded: {loaded}")
            serve.export_encoder(model, params["encoder"], out_dir, batch,
                                 image_size, mels, frames, quantize=quantize)
        elif task == "classifier":
            from deepavfusion_tpu.data import catalog
            from deepavfusion_tpu.models.classifier import AVClassifier

            ncls = args.nn_probe.get("num_classes") or catalog.num_classes(
                args.data.dataset)
            model = AVClassifier(cfg, int(ncls), freeze_encoder=False,
                                 input_norm=False)
            params = dict(model.init(jax.random.key(0), img0, aud0)["params"])
            params, loaded = load_encoder_checkpoint(params, args)
            print(f"encoder checkpoint loaded: {loaded}")
            cls_ckpt = args.get("classifier_checkpoint")
            if cls_ckpt:
                # a linprobe/finetune orbax checkpoint dir: restore the whole
                # payload code-free (metadata template) and take the params
                from deepavfusion_tpu.serve import _load_params

                restored = _load_params(str(cls_ckpt))
                params = restored["state"]["params"]
            serve.export_classifier(model, params, out_dir, batch,
                                    image_size, mels, frames,
                                    quantize=quantize)
        elif task in ("avsegm", "avsrcsep"):
            # dense heads carry BatchNorm running stats: export the full
            # variables dict from a trained head checkpoint (or init stats)
            if task == "avsegm":
                from deepavfusion_tpu.data import catalog
                from deepavfusion_tpu.models.avsegm import AVSegmSimple

                ncls = args.get("num_classes")
                if ncls is None:
                    ds = args.data.get("dataset")
                    # binary masks for S4/MS3, 71-class for AVSS
                    ncls = catalog.num_classes(ds) if ds == "avsbench-avss" else 1
                model = AVSegmSimple(cfg, num_classes=int(ncls))
            else:
                from deepavfusion_tpu.models.avsrcsep import AVSrcSep

                model = AVSrcSep(cfg)
            variables = dict(model.init(jax.random.key(0), img0, aud0,
                                        train=False))
            params = dict(variables["params"])
            params, loaded = load_encoder_checkpoint(params, args)
            print(f"encoder checkpoint loaded: {loaded}")
            variables["params"] = params
            head_ckpt = args.get("head_checkpoint")
            if head_ckpt:
                from deepavfusion_tpu.serve import _load_params

                restored = _load_params(str(head_ckpt))
                variables["params"] = restored["state"]["params"]
                ms = restored["state"].get("model_state", {})
                if "batch_stats" in ms:
                    variables["batch_stats"] = ms["batch_stats"]
            export = (serve.export_segm if task == "avsegm"
                      else serve.export_srcsep)
            export(model, variables, out_dir, batch, image_size, mels, frames,
                   quantize=quantize)
        else:
            raise ValueError(
                f"unknown task {task!r} (encoder|classifier|avsegm|avsrcsep)")
    print(f"bundle written: {out_dir}")
    return out_dir


def main():
    from deepavfusion_tpu.config import load_config

    config_name = "linprobe"
    overrides = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--config-name":
            config_name = argv[i + 1]
            i += 2
        else:
            overrides.append(argv[i])
            i += 1
    args = load_config(config_name, overrides=overrides)
    main_worker(args)


if __name__ == "__main__":
    main()
