"""Benchmark: AV clips/sec/chip for the full ViT-B MAE pretraining step.

Measures the BASELINE.json north-star metric — one complete optimizer step
(masking + dual-ViT-B encoder with factorized fusion + dual 8-layer decoders
+ masked MSE + grads + AdamW w/ reference schedules) at the VGGSound
pretraining config (fusion attn_ratio 0.25, mlp_ratio 1.0), bf16 compute.

The reference publishes no throughput numbers (SURVEY.md §6), so vs_baseline
is reported against an ASSUMED reference point of 100 clips/s/chip — a
generous estimate of the per-GPU throughput of the PyTorch stack's published
launch configs (8 GPU × bs64; no measured number exists). The JSON output
labels this explicitly (`baseline.source = "assumed"`): the ratio is NOT a
measured torch-vs-TPU comparison. For a measured (same-host, CPU-only)
torch-reference proxy, run ``bench_torch_ref.py`` — it times the reference's
actual model code (via tests/timm_shim) next to this stack's CPU backend.

Timing methodology (important): through the remote-TPU (axon) tunnel,
``block_until_ready`` on dispatched calls does NOT reliably reflect remote
execution completion — per-call timing loops measured 4-18 ms/step for a
program whose true device time is ~183 ms/step (verified by losses
decreasing across steps and invariance across sync methods). The only
artifact-immune measurement is K steps inside ONE jitted ``lax.scan``
(single dispatch) followed by a device→host value fetch: wall / K then
bounds per-step time to within (dispatch+fetch)/K. That is what this bench
reports. A per-call chunked timing is also printed for reference but never
used for the headline number.

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
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10

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
    # Trunk-layout ladder measured on the v5e at B=64 (see NOTES.md):
    #   scan trunk            183.2 ms/step
    #   scan + remat          160.1 ms/step
    #   unrolled + remat      161.4 ms/step (24% recompute FLOPs, no win)
    #   unrolled (default)    126.1 ms/step, MFU 0.376
    # The unrolled trunk lets XLA fuse/pipeline across layer boundaries at
    # the cost of a ~12x larger one-time compile (725 s cold through the
    # tunnel, persisted). DAVF_BENCH_SCAN=1 benches the scan trunk (NB:
    # cost_analysis counts a scan body once, so MFU is undercounted ~2x in
    # that mode); DAVF_BENCH_REMAT=1 adds remat (helps ONLY the scan trunk).
    remat = os.environ.get("DAVF_BENCH_REMAT", "0") == "1"
    scan = os.environ.get("DAVF_BENCH_SCAN", "0") == "1"
    # DAVF_BENCH_DEC_HEADS: decoder head-count experiment (16 = reference;
    # 8 → head dim 64, friendlier to the MXU's 128-wide tiles)
    dec_heads = int(os.environ.get("DAVF_BENCH_DEC_HEADS", "16"))
    # AdamW first-moment storage: bf16 is the production default since r5
    # (114.97 -> 113.34 ms/step measured A/B on the v5e — it halves the m
    # read+write of the HBM-bound update tail). DAVF_BENCH_MU_F32=1 benches
    # the torch-bit-parity f32 mode instead.
    mu_dtype = ("float32" if os.environ.get("DAVF_BENCH_MU_F32")
                else "bfloat16")
    # DAVF_BENCH_DEC_REMAT=1: rematerialize only the MAE decoder blocks
    # (the r5 roofline shows them HBM-bound on stored intermediates).
    dec_remat = os.environ.get("DAVF_BENCH_DEC_REMAT", "0") == "1"
    cfg = pretrain.PretrainConfig(fusion_mlp_ratio=1.0, dtype=jnp.bfloat16,
                                  steps_per_epoch=1000.0, scan_layers=scan,
                                  remat=remat, decoder_num_heads=dec_heads,
                                  adam_mu_dtype=mu_dtype,
                                  decoder_remat=dec_remat)
    model = pretrain.build_model(cfg)
    params = pretrain.init_params(model, cfg, seed=0)
    _, state, step_fn, _ = pretrain.make_pretrain_step(
        model, params, cfg, world_batch=batch, mesh=mesh
    )
    # the raw (unjitted) step body — scanned below so K steps are ONE dispatch
    step_body = getattr(step_fn, "__wrapped__", step_fn)

    rng = np.random.RandomState(0)
    batch_tree = {
        "image": rng.randn(batch, 224, 224, 3).astype(np.float32),
        "audio": rng.randn(batch, 128, 192, 1).astype(np.float32),
    }
    state = mesh_lib.replicate(state, mesh)
    batch_tree = mesh_lib.shard_batch(batch_tree, mesh)

    def multi_step(st, keys):
        def body(s, k):
            s2, m = step_body(s, batch_tree, k)
            return s2, m["loss"]
        return jax.lax.scan(body, st, keys)

    multi = jax.jit(multi_step, donate_argnums=(0,))
    keys = jax.device_put(jax.random.split(jax.random.key(0), steps),
                          mesh_lib.replicated(mesh))

    # AOT-compile so cost_analysis FLOPs are available for MFU.
    t0 = time.perf_counter()
    compiled = multi.lower(state, keys).compile()
    compile_s = time.perf_counter() - t0

    def _flops(c):
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))

    try:
        # XLA counts a lax.scan body ONCE (not × trip count), so take the
        # per-step FLOPs from the single-step program's cost analysis.
        flops_per_step = _flops(step_fn.lower(state, batch_tree, keys[0]).compile())
    except Exception as e:  # cost_analysis availability varies by backend
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        flops_per_step = 0.0

    # warmup: one full scan executed end-to-end, result VALUE fetched
    state, losses = compiled(state, keys)
    warm_losses = np.asarray(jax.device_get(losses))
    assert np.isfinite(warm_losses).all(), f"non-finite loss {warm_losses}"

    # Timed reps: each is one dispatch of `steps` scanned train steps,
    # bounded by a device→host fetch of the per-step losses. Median of reps.
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = compiled(state, keys)
        last_loss = float(np.asarray(jax.device_get(losses))[-1])
        reps.append((time.perf_counter() - t0) / steps)
    dt = float(np.median(reps))

    clips_per_sec_per_chip = batch / dt / n_dev
    mfu = (flops_per_step / dt / (V5E_PEAK_BF16_FLOPS * n_dev)
           if flops_per_step else None)
    assert np.isfinite(last_loss), f"non-finite loss {last_loss}"
    if mfu is not None and not (0.0 < mfu < 1.0):
        print(f"WARNING: implausible MFU {mfu:.3f} — timing artifact?",
              file=sys.stderr)

    # Baseline: prefer the MEASURED torch-reference number when the
    # committed artifact exists (TORCH_REF_CPU.json, produced by
    # bench_torch_ref.py: the reference's ACTUAL model code on this host's
    # CPU). The reference publishes no GPU throughput (SURVEY §6), so the
    # measured comparison available in this image is same-host CPU — the
    # ratio is then TPU-chip-vs-host-CPU-core, labeled as such. Fallback:
    # the r1-era assumed 100 clips/s, still labeled "assumed".
    baseline = {
        "value": REFERENCE_CLIPS_PER_SEC_PER_CHIP,
        "unit": "clips/s/chip",
        "source": "assumed",  # reference publishes no throughput (SURVEY §6)
        "note": "vs_baseline is vs this assumption, not a measurement",
    }
    ref_fn = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "TORCH_REF_CPU.json")
    if os.path.exists(ref_fn):
        with open(ref_fn) as f:
            t = json.load(f)
        baseline = {
            "value": t["torch_cpu_clips_per_s"],
            "unit": "clips/s on one host CPU core (torch reference code)",
            "source": "measured",
            "note": "torch reference's actual model code measured on this "
                    f"host's CPU at batch {t['batch']} "
                    f"({t['torch_step_s']}s/step, {t['torch_threads']} "
                    "thread) — bench_torch_ref.py / TORCH_REF_CPU.json; "
                    "ratio = TPU chip vs one host CPU core, not vs GPU",
        }
    print(json.dumps({
        "metric": "AV clips/sec/chip ViT-B MAE pretrain step",
        "value": round(clips_per_sec_per_chip, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_per_chip / baseline["value"], 3),
        "baseline": baseline,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "step_ms": round(dt * 1e3, 2),
        "step_ms_reps": [round(r * 1e3, 2) for r in reps],
        "tflops_per_step": round(flops_per_step / 1e12, 2),
        "compile_s": round(compile_s, 1),
        "scan_steps_per_dispatch": steps,
        "batch": batch,
        "devices": n_dev,
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
