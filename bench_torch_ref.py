"""Measured same-host proxy for the torch reference's pretraining step.

VERDICT round-2 item 8: ``bench.py``'s ``vs_baseline`` divides by an ASSUMED
100 clips/s/chip because the reference publishes no throughput (SURVEY.md
§6). This script provides the only *measurable* comparison available in this
image: the reference's ACTUAL model code (imported unmodified from
/root/reference/models via tests/timm_shim — the same oracle the parity
tests use) vs this stack's JAX CPU backend, running the identical full
pretraining step (ViT-B dual encoder + factorized fusion + dual plain
decoders + masked MSE + AdamW) on the same host CPU.

This is a framework-overhead comparison, NOT a TPU-vs-GPU claim: both sides
run on host CPU cores. It bounds how much of bench.py's TPU number comes
from the hardware vs the stack.

Prints ONE JSON line:
  {"torch_cpu_clips_per_s", "jax_cpu_clips_per_s", "jax_over_torch", ...}

Usage: python bench_torch_ref.py [batch=4] [steps=3]
(batch 4 keeps a 1-core run under ~10 min; scale up on bigger hosts.)
"""
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent / "tests"))


def bench_torch(batch: int, steps: int) -> dict:
    import torch

    from reference_models import load_reference

    ref = load_reference()
    torch.manual_seed(0)
    trunk = ref.deepavfusion.DeepAVFusion(
        # '' skips weight download (vits.py:136: `pretrained != ''` gate)
        image_arch="vit_base", image_pretrained="", image_size=(224, 224),
        audio_arch="vit_base", audio_pretrained="", audio_size=(128, 192),
        fusion_arch="factorized_mmi", num_fusion_tkns=(16, 8, 8),
        fusion_mlp_ratio=1.0, fusion_attn_ratio=0.25, fusion_num_heads=12,
    )
    model = ref.avmae.AVMAE(encoder=trunk, encoder_dim=768)
    opt = torch.optim.AdamW(model.parameters(), lr=1.5e-4, betas=(0.9, 0.95))
    model.train()

    rng = np.random.RandomState(0)
    img = torch.from_numpy(rng.randn(batch, 3, 224, 224).astype(np.float32))
    aud = torch.from_numpy(rng.randn(batch, 1, 128, 192).astype(np.float32))

    def one_step():
        opt.zero_grad(set_to_none=True)
        loss_i, loss_a, _, _ = model(img, aud)
        loss = loss_i + loss_a
        loss.backward()
        opt.step()
        return float(loss)

    one_step()  # warmup (allocator, autograd graph caches)
    t0 = time.perf_counter()
    last = [one_step() for _ in range(steps)][-1]
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(last), f"torch loss non-finite: {last}"
    return {"step_s": dt, "clips_per_s": batch / dt, "loss": last,
            "threads": torch.get_num_threads()}


def bench_jax(batch: int, steps: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import pretrain

    mesh = mesh_lib.make_mesh({"data": 1})
    cfg = pretrain.PretrainConfig(fusion_mlp_ratio=1.0, dtype=jnp.float32,
                                  steps_per_epoch=1000.0, scan_layers=True)
    model = pretrain.build_model(cfg)
    params = pretrain.init_params(model, cfg, seed=0)
    _, state, step_fn, _ = pretrain.make_pretrain_step(
        model, params, cfg, world_batch=batch, mesh=mesh)

    rng = np.random.RandomState(0)
    batch_tree = {
        "image": rng.randn(batch, 224, 224, 3).astype(np.float32),
        "audio": rng.randn(batch, 128, 192, 1).astype(np.float32),
    }
    state = mesh_lib.replicate(state, mesh)
    batch_tree = mesh_lib.shard_batch(batch_tree, mesh)
    keys = jax.random.split(jax.random.key(0), steps + 1)

    state, m = step_fn(state, batch_tree, keys[0])  # warmup incl. compile
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for k in keys[1:]:
        state, m = step_fn(state, batch_tree, k)
    last = float(jax.device_get(m["loss"]))
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(last), f"jax loss non-finite: {last}"
    return {"step_s": dt, "clips_per_s": batch / dt, "loss": last}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    tj = bench_jax(batch, steps)
    tt = bench_torch(batch, steps)
    print(json.dumps({
        "metric": "same-host CPU pretrain step, torch reference vs this stack",
        "batch": batch, "steps": steps,
        "torch_cpu_clips_per_s": round(tt["clips_per_s"], 3),
        "torch_step_s": round(tt["step_s"], 2),
        "torch_threads": tt["threads"],
        "jax_cpu_clips_per_s": round(tj["clips_per_s"], 3),
        "jax_step_s": round(tj["step_s"], 2),
        "jax_over_torch": round(tj["clips_per_s"] / tt["clips_per_s"], 3),
        "note": "both sides on host CPU; bounds framework overhead, not a "
                "GPU claim — see bench.py docstring",
    }))


if __name__ == "__main__":
    main()
