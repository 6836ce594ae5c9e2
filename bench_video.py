"""Benchmark: the avsync (VideoEarlyFusion) train step, Pallas route A/B.

The video models are the framework's only LONG-sequence surface: joint
space-time self-attention over 8·14·14 = 1568 tokens at the stock avsync
config (16 frames, video_vit_base — configs/avsync.yaml; reference
models/video_vits.py:135-138). That shape runs the KV-tiled online-softmax
kernels and routes to Pallas by default for BOTH training and inference —
a policy set by THIS bench, not the isolated A/B: the tiled backward
LOSES in isolation (7.36 vs 5.76 ms, bench_attention.py) yet the full
remat train step measures 954 ms routed vs 1165 ms on XLA (18% faster,
loss-parity-checked) — XLA materializes the 1568-squared logits in HBM
per layer while the tiled kernels stay VMEM-resident, and in the remat
backward that HBM traffic dominates (NOTES.md r3 "Kernel v4").

It times the FULL avsync train step (VideoEarlyFusion trunk + sync head +
CE + grads + AdamW update) at the stock batch with the route on vs off
(DAVF_NO_PALLAS_TRAIN=1), remat on and off, using bench.py's
artifact-immune scan-of-K single-dispatch methodology.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} where
value is clips/s/chip with the route ON (best remat setting) and
vs_baseline is the speedup over the route-OFF (pure XLA) step. Variants
that do not fit HBM are recorded as "oom".
"""
import json
import os
import sys
import time

import numpy as np

from bench import probe_backend, V5E_PEAK_BF16_FLOPS


def build(remat: bool, batch: int):
    import jax
    import jax.numpy as jnp

    from eval_avsync import AVSyncClassifier
    from deepavfusion_tpu.models.video_earlyfusion import (
        VideoEarlyFusionConfig, video_vit_config)
    from deepavfusion_tpu.models.vit import vit_config
    from deepavfusion_tpu import runtime
    from deepavfusion_tpu.train import lr_sched, trainer as trainer_lib
    from deepavfusion_tpu.train import classify
    from deepavfusion_tpu.parallel import mesh as mesh_lib

    num_frames, size, mels, frames = 16, 224, 128, 192
    # scan_layers by default: ~12x smaller program, minutes faster to
    # cold-compile through the remote service. DAVF_BENCH_UNROLLED=1
    # measures the unrolled trunk instead (bench.py's finding on the AVMAE
    # step: unrolled is ~27% faster once compiled — at a much longer
    # one-time cold compile).
    scan = os.environ.get("DAVF_BENCH_UNROLLED", "0") != "1"
    cfg = VideoEarlyFusionConfig(
        video=video_vit_config("video_vit_base", (num_frames, size, size), 3,
                               drop_path=0.2),
        audio=vit_config("vit_base", (mels, frames), 1, drop_path=0.2),
        fusion_layers="all", num_fusion_tkns=(16, 8, 8),
        fusion_mlp_ratio=4.0, fusion_attn_ratio=0.25, fusion_num_heads=12,
        drop_path=0.2, remat=remat, scan_layers=scan,
    )
    model = AVSyncClassifier(cfg, dtype=jnp.bfloat16)
    with jax.default_device(runtime.host_cpu_device()):
        v0 = jnp.zeros((1, num_frames, size, size, 3))
        a0 = jnp.zeros((1, mels, frames, 1))
        params = dict(model.init(jax.random.key(0), v0, a0)["params"])

    opt_cfg = lr_sched.OptimizerConfig(
        lr=3e-4, warmup_epochs=20.0, epochs=100.0, steps_per_epoch=1000.0,
        weight_decay=0.05, clip_grad=None, layer_decay=0.75,
        depth=cfg.max_depth)
    tx, _ = lr_sched.make_adamw(params, opt_cfg)

    def loss_fn(p, batch_tree, key):
        logits = model.apply({"params": p}, batch_tree["video"],
                             batch_tree["audio"], deterministic=False,
                             rngs={"dropout": key})
        loss = classify.label_smoothing_ce(logits, batch_tree["sync"], 0.1)
        return loss, {"loss": loss}

    mesh = mesh_lib.make_mesh({"data": len(jax.devices())})
    state = trainer_lib.TrainState.create(params, tx)
    step_fn = trainer_lib.make_train_step(loss_fn, tx, 1, mesh=mesh,
                                          donate=False)
    step_body = getattr(step_fn, "__wrapped__", step_fn)

    rng = np.random.RandomState(0)
    batch_tree = {
        "video": rng.randn(batch, num_frames, size, size, 3).astype(np.float32),
        "audio": rng.randn(batch, mels, frames, 1).astype(np.float32),
        "sync": rng.randint(0, 2, batch).astype(np.int32),
    }
    state = mesh_lib.replicate(state, mesh)
    batch_tree = mesh_lib.shard_batch(batch_tree, mesh)
    return state, step_fn, step_body, batch_tree


def run_variant(route: str, remat: bool, batch: int, steps: int):
    """One (route, remat) measurement. Returns a row dict (or {'error': ...})."""
    import jax

    # trace-time knob: the dispatch env is read when the jit traces
    if route == "xla":
        os.environ["DAVF_NO_PALLAS_TRAIN"] = "1"
    else:
        os.environ.pop("DAVF_NO_PALLAS_TRAIN", None)

    try:
        state, step_fn, step_body, batch_tree = build(remat, batch)

        # batch_tree is an ARGUMENT, not a closure capture: a closed-over
        # device array is embedded as an HLO constant, and a 16-frame video
        # batch (hundreds of MB) blows the remote compile service's request
        # size limit (HTTP 413) long before the program itself does.
        def multi_step(st, bt, keys):
            def body(s, k):
                s2, m = step_body(s, bt, k)
                return s2, m["loss"]
            return jax.lax.scan(body, st, keys)

        multi = jax.jit(multi_step, donate_argnums=(0,))
        keys = jax.random.split(jax.random.key(0), steps)

        t0 = time.perf_counter()
        compiled = multi.lower(state, batch_tree, keys).compile()
        compile_s = time.perf_counter() - t0

        def _flops(c):
            ca = c.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))

        # XLA cost_analysis counts a lax.scan body ONCE (not x trip count),
        # so a scan-trunk program's FLOPs are undercounted ~depth-fold and
        # MFU is omitted (bench.py r2 finding). DAVF_BENCH_UNROLLED=1 gives
        # a trustworthy MFU.
        flops = 0.0
        if os.environ.get("DAVF_BENCH_UNROLLED", "0") == "1":
            try:
                flops = _flops(step_fn.lower(state, batch_tree, keys[0]).compile())
            except Exception as e:
                print(f"cost_analysis unavailable: {e}", file=sys.stderr)

        state, losses = compiled(state, batch_tree, keys)
        warm = np.asarray(jax.device_get(losses))
        assert np.isfinite(warm).all(), f"non-finite losses {warm}"
        # same params/batch/keys across variants → the first-step losses are
        # a route-on-vs-off numerical parity check (bf16 tolerance)
        first_loss = float(warm[0])

        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, losses = compiled(state, batch_tree, keys)
            _ = float(np.asarray(jax.device_get(losses))[-1])
            reps.append((time.perf_counter() - t0) / steps)
        dt = float(np.median(reps))
        row = {
            "step_ms": round(dt * 1e3, 2),
            "clips_per_sec": round(batch / dt, 1),
            "compile_s": round(compile_s, 1),
            "first_loss": round(first_loss, 4),
        }
        if flops:
            row["mfu"] = round(flops / dt / V5E_PEAK_BF16_FLOPS, 4)
        return row
    except Exception as e:  # OOM or compile failure — record, keep going
        msg = str(e)
        kind = "oom" if "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower() \
            else "error"
        print(f"[{route} remat={remat}] {kind}: {msg[:300]}", file=sys.stderr)
        return {kind: msg[:200]}
    finally:
        os.environ.pop("DAVF_NO_PALLAS_TRAIN", None)


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    probe_backend()
    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    from deepavfusion_tpu import runtime
    runtime.setup()

    rows = {}
    for route in ("pallas", "xla"):
        for remat in (True, False):
            name = f"{route}_remat" if remat else route
            rows[name] = run_variant(route, remat, batch, steps)
            print(f"{name}: {rows[name]}", file=sys.stderr)

    def best(route):
        cands = [r for n, r in rows.items()
                 if n.startswith(route) and "step_ms" in r]
        return min(cands, key=lambda r: r["step_ms"]) if cands else None

    bp, bx = best("pallas"), best("xla")
    value = bp["clips_per_sec"] if bp else 0.0
    speedup = round(bx["step_ms"] / bp["step_ms"], 3) if bp and bx else None
    print(json.dumps({
        "metric": "avsync train step clips/s/chip (pallas tiled route)",
        "value": value,
        "unit": "clips/s/chip",
        "vs_baseline": speedup,          # route-ON over route-OFF (XLA) step
        "baseline": {"source": "measured",
                     "what": "same step with DAVF_NO_PALLAS_TRAIN=1"},
        "batch": batch, "steps_chained": steps,
        "backend": jax.default_backend(),
        "variants": rows,
    }))


if __name__ == "__main__":
    main()
