"""Benchmark: AV clips/sec/chip for the full ViT-B MAE pretraining step.

Measures the BASELINE.json north-star metric — one complete optimizer step
(masking + dual-ViT-B encoder with factorized fusion + dual 8-layer decoders
+ masked MSE + grads + AdamW w/ reference schedules) at the VGGSound
pretraining config (fusion attn_ratio 0.25, mlp_ratio 1.0), bf16 compute.

The reference publishes no throughput numbers (SURVEY.md §6), so vs_baseline
is reported against a fixed reference point of 100 clips/s/chip — a
generous estimate of the per-GPU throughput of the PyTorch stack's published
launch configs (8 GPU × bs64; no measured number exists).

Resilience: the TPU backend lives behind a tunnel that has died mid-session
before (NOTES.md round 1); a bare ``jax.devices()`` can hang forever. The
backend is probed in a subprocess with a timeout and bounded retries before
the main process initializes it; on give-up the script exits rc=1 with a
clear one-line reason on stderr.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
the extra keys record MFU (from compiled cost_analysis FLOPs ÷ step time ÷
v5e bf16 peak), both timing modes, and the batch/device setup.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


REFERENCE_CLIPS_PER_SEC_PER_CHIP = 100.0
# Peak bf16 throughput of one TPU v5e (v5 lite) chip.
V5E_PEAK_BF16_FLOPS = 197e12

PROBE_TIMEOUT_S = int(os.environ.get("DAVF_BENCH_PROBE_TIMEOUT", "180"))
PROBE_RETRIES = int(os.environ.get("DAVF_BENCH_PROBE_RETRIES", "3"))


def probe_backend() -> int:
    """Count devices in a subprocess so a dead tunnel can't hang us.

    Returns the device count on success; exits rc=1 with a clear reason
    after bounded retries.
    """
    # The environment's sitecustomize pins jax_platforms at interpreter
    # startup; an explicit JAX_PLATFORMS intent must be re-applied through
    # jax.config (env vars alone are ignored — CLAUDE.md gotchas).
    code = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "print('NDEV=%d' % len(jax.devices()))"
    )
    last = ""
    for attempt in range(1, PROBE_RETRIES + 1):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=PROBE_TIMEOUT_S,
            )
            for line in r.stdout.splitlines():
                if line.startswith("NDEV="):
                    n = int(line.split("=", 1)[1])
                    print(f"backend probe ok: {n} device(s)", file=sys.stderr)
                    return n
            last = (r.stderr or r.stdout).strip()[-500:]
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {PROBE_TIMEOUT_S}s (tunnel hang?)"
        print(f"backend probe attempt {attempt}/{PROBE_RETRIES} failed: {last}",
              file=sys.stderr)
        time.sleep(min(30 * attempt, 120))
    print(f"bench: giving up — backend unavailable after {PROBE_RETRIES} "
          f"probe attempts; last error: {last}", file=sys.stderr)
    sys.exit(1)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    probe_backend()

    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    import jax.numpy as jnp

    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.parallel import mesh as mesh_lib
    from deepavfusion_tpu.train import pretrain

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

    # Keys pre-split on device: passing jax.random.key(k) per step would pay
    # a host→device transfer through the tunnel inside the timed loop.
    n_keys = 2 * steps + 2
    all_keys = jax.device_put(
        jax.random.split(jax.random.key(0), n_keys),
        mesh_lib.replicated(mesh),
    )

    # AOT-compile so cost_analysis FLOPs are available for MFU.
    t0 = time.perf_counter()
    lowered = step_fn.lower(state, batch_tree, all_keys[0])
    compiled = lowered.compile()
    compile_s = time.perf_counter() - t0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_step = float(ca.get("flops", 0.0))
    except Exception as e:  # cost_analysis availability varies by backend
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        flops_per_step = 0.0

    # warmup (also executes the program once end-to-end)
    ki = 1
    state, metrics = compiled(state, batch_tree, all_keys[ki]); ki += 1
    jax.block_until_ready(state)

    # Timing mode 1 — small synced chunks: a fully async chain under-reports
    # through the remote-dispatch tunnel; per-step sync over-reports (round
    # trip). Chunks of 5 amortize dispatch while forcing real execution.
    chunk = 5
    n_chunks = max(steps // chunk, 1)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        for _ in range(chunk):
            state, metrics = compiled(state, batch_tree, all_keys[ki]); ki += 1
        jax.block_until_ready(state)
    dt_chunked = (time.perf_counter() - t0) / (n_chunks * chunk)

    # Timing mode 2 — one long async run, single final sync. Agreement with
    # mode 1 (≤ ~20%) certifies the number isn't a dispatch-pipeline artifact.
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = compiled(state, batch_tree, all_keys[ki % n_keys]); ki += 1
    jax.block_until_ready(state)
    dt_long = (time.perf_counter() - t0) / steps

    # Report the more conservative (slower) of the two timings.
    dt = max(dt_chunked, dt_long)
    clips_per_sec_per_chip = batch / dt / n_dev
    mfu = (flops_per_step / dt / (V5E_PEAK_BF16_FLOPS * n_dev)
           if flops_per_step else None)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    if mfu is not None and not (0.0 < mfu < 1.0):
        print(f"WARNING: implausible MFU {mfu:.3f} — timing artifact?",
              file=sys.stderr)

    print(json.dumps({
        "metric": "AV clips/sec/chip ViT-B MAE pretrain step",
        "value": round(clips_per_sec_per_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_per_chip / REFERENCE_CLIPS_PER_SEC_PER_CHIP, 3),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "step_ms_chunked": round(dt_chunked * 1e3, 2),
        "step_ms_longrun": round(dt_long * 1e3, 2),
        "tflops_per_step": round(flops_per_step / 1e12, 2),
        "compile_s": round(compile_s, 1),
        "batch": batch,
        "devices": n_dev,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
