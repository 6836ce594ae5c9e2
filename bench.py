"""Benchmark: AV clips/sec/chip for the full ViT-B MAE pretraining step.

Measures the BASELINE.json north-star metric — one complete optimizer step
(masking + dual-ViT-B encoder with factorized fusion + dual 8-layer decoders
+ masked MSE + grads + AdamW w/ reference schedules) at the VGGSound
pretraining config (fusion attn_ratio 0.25, mlp_ratio 1.0), bf16 compute.

The reference publishes no throughput numbers (SURVEY.md §6), so vs_baseline
is reported against a fixed reference point of 100 clips/s/chip — a
generous estimate of the per-GPU throughput of the PyTorch stack's published
launch configs (8 GPU × bs64; no measured number exists).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


REFERENCE_CLIPS_PER_SEC_PER_CHIP = 100.0


def main():
    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import pretrain

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    n_dev = len(jax.devices())
    mesh = mesh_lib.make_mesh({"data": n_dev})

    # scan_layers: the per-layer trio compiles once (lax.scan over stacked
    # params) — bit-identical to the unrolled trunk (tested) and ~12x smaller
    # XLA program, keeping the one-time remote compile tractable.
    cfg = pretrain.PretrainConfig(fusion_mlp_ratio=1.0, dtype=jnp.bfloat16,
                                  steps_per_epoch=1000.0, scan_layers=True)
    model = pretrain.build_model(cfg)
    params = pretrain.init_params(model, cfg, seed=0)
    _, state, step_fn, _ = pretrain.make_pretrain_step(
        model, params, cfg, world_batch=batch, mesh=mesh
    )

    rng = np.random.RandomState(0)
    batch_tree = {
        "image": rng.randn(batch, 224, 224, 3).astype(np.float32),
        "audio": rng.randn(batch, 128, 192, 1).astype(np.float32),
    }
    state = mesh_lib.replicate(state, mesh)
    batch_tree = mesh_lib.shard_batch(batch_tree, mesh)

    # compile + warmup
    state, metrics = step_fn(state, batch_tree, jax.random.key(0))
    jax.block_until_ready(state)

    # Time in small synced chunks: a fully async chain under-reports through
    # the remote-dispatch tunnel; per-step sync over-reports (round-trip
    # latency). Chunks of 5 amortize dispatch while forcing real execution.
    chunk = 5
    n_chunks = max(steps // chunk, 1)
    t0 = time.perf_counter()
    k = 1
    for _ in range(n_chunks):
        for _ in range(chunk):
            state, metrics = step_fn(state, batch_tree, jax.random.key(k))
            k += 1
        jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / (n_chunks * chunk)

    clips_per_sec_per_chip = batch / dt / n_dev
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"

    print(json.dumps({
        "metric": "AV clips/sec/chip ViT-B MAE pretrain step",
        "value": round(clips_per_sec_per_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_per_chip / REFERENCE_CLIPS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == "__main__":
    main()
