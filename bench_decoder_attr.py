"""Fine-grained attribution + FLOPs/HBM roofline of the MAE decoder tail
(VERDICT r4 item 1: bound each segment with FLOPs AND bytes, not TF/s alone).

Each segment runs in a FRESH SUBPROCESS: in-process chains contaminate
through the remote-TPU service (the same GEMM chain measured 3.3 TF/s
mid-process vs 107 TF/s standalone — NOTES.md r5), so the parent spawns
`--segment=NAME` children and aggregates one JSON line with, per segment:

  measured ms (K-iteration single-dispatch lax.scan chain, RTT-corrected),
  cost_analysis GFLOPs + MBytes of ONE step (scan bodies are counted once),
  roofline bound = max(F / 157.9 TF/s, B / 819 GB/s), and measured/bound.

Segments — one dec_img layer (B=64, N=228, D=512, H=16, Dh=32, mlp 4x) bf16:
  blk_{fwd,fwdbwd}      the full Block (8x blk ~ the whole dec_img trunk)
  attnmod_{fwd,fwdbwd}  LN1 + SelfAttention (qkv/core/proj) + residual
  mlpmod_{fwd,fwdbwd}   LN2 + Mlp(4x) + residual
  gemm_{qkv,mlp,proj}   the decoder's exact GEMM shapes, isolated

Usage: python bench_decoder_attr.py [batch] [iters]          (parent)
       python bench_decoder_attr.py [batch] [iters] --segment=blk_fwd
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

SOL_TFS = 157.9e12   # measured big-matmul SOL on this v5e (NOTES.md)
SOL_BW = 819e9       # v5e HBM bandwidth
RTT_MS = 37.5        # measured fixed per-dispatch round trip (NOTES.md r5)

SEGMENTS = ("blk_fwd", "blk_fwdbwd", "attnmod_fwd", "attnmod_fwdbwd",
            "mlpmod_fwd", "mlpmod_fwdbwd", "gemm_qkv", "gemm_mlp",
            "gemm_proj")


def run_segment(batch, iters, name):
    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    import jax.numpy as jnp

    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.models.layers import (Block, Mlp, SelfAttention,
                                                layer_norm)
    import flax.linen as nn

    D, H, MLP = 512, 16, 4.0
    N = 228
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, N, D), dt)

    out = {"segment": name, "batch": batch, "iters": iters}

    def chain(fn, carry):
        def body(c, _):
            return fn(c), ()

        f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=iters)[0])
        try:
            ca = f.lower(carry).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            # scan bodies are counted ONCE by cost_analysis -> per-step cost
            out["gflops"] = round(ca.get("flops", 0.0) / 1e9, 2)
            out["mbytes"] = round(ca.get("bytes accessed", 0.0) / 1e6, 2)
        except Exception as e:  # noqa: BLE001
            out["cost_error"] = str(e)[:120]
        o = f(carry)
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]
                                      ).ravel()[0])
        t0 = time.perf_counter()
        o = f(carry)
        _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(o)[0]
                                      ).ravel()[0])
        wall = (time.perf_counter() - t0) * 1e3
        out["ms_raw"] = round(wall / iters, 4)
        out["ms"] = round((wall - RTT_MS) / iters, 4)

    if name.startswith("gemm_"):
        k1 = {"gemm_qkv": 3 * D, "gemm_mlp": int(D * MLP),
              "gemm_proj": D}[name]
        w1 = jnp.asarray(rng.randn(D, k1) * 0.02, dt)
        w2 = jnp.asarray(rng.randn(k1, D) * 0.02, dt)
        xx = jnp.asarray(rng.randn(batch * N, D), dt)

        def gemm(c):
            # plain chained GEMM pair; the 0.02-scaled weights keep the
            # carry's magnitude drifting slowly enough for 400 iterations
            # (denormal flush is free on TPU), and a renorm would serialize
            # a full reduction into every iteration (measured 3x slower)
            return (c @ w1) @ w2

        chain(gemm, xx)
        print(json.dumps(out))
        return

    if name.startswith("blk_"):
        mod = Block(H, MLP, qkv_bias=True, norm_eps=1e-5, dtype=dt)

        def apply(pp, xx):
            return mod.apply({"params": pp}, xx, False)
    elif name.startswith("attnmod_"):
        class AttnMod(nn.Module):
            @nn.compact
            def __call__(self, xx):
                y = layer_norm(1e-5, dt, "norm1")(xx)
                return xx + SelfAttention(H, qkv_bias=True, dtype=dt,
                                          name="attn")(y, False)

        mod = AttnMod()

        def apply(pp, xx):
            return mod.apply({"params": pp}, xx)
    else:
        class MlpMod(nn.Module):
            @nn.compact
            def __call__(self, xx):
                y = layer_norm(1e-5, dt, "norm2")(xx)
                return xx + Mlp(int(D * MLP), dtype=dt, name="mlp")(y, False)

        mod = MlpMod()

        def apply(pp, xx):
            return mod.apply({"params": pp}, xx)

    params = jax.device_put(mod.init(jax.random.key(0), x)["params"])

    def loss(pp, xx):
        return apply(pp, xx).astype(jnp.float32).mean()

    if name.endswith("_fwd"):
        # all three modules map (B, N, D) -> (B, N, D): chain the OUTPUT
        # directly. The earlier xx*(1+0*loss) fold measured 2-3x slower
        # than the module's share of the fwd+bwd chain — the scalar
        # reduction + full-tensor multiply serialized the chain.
        def fwd(xx):
            return apply(params, xx)

        chain(fwd, x)
    else:
        grad = jax.grad(loss, argnums=(0, 1))

        def fwdbwd(carry):
            pp, xx = carry
            gp, gx = grad(pp, xx)
            return (jax.tree.map(lambda v, g: v + 1e-9 * g.astype(v.dtype),
                                 pp, gp), xx + 1e-9 * gx.astype(xx.dtype))

        chain(fwdbwd, (params, x))
    print(json.dumps(out))


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(argv[0]) if argv else 64
    iters = int(argv[1]) if len(argv) > 1 else 400
    seg = None
    for a in sys.argv[1:]:
        if a.startswith("--segment="):
            seg = a.split("=", 1)[1]
    if seg:
        run_segment(batch, iters, seg)
        return

    rows = {}
    for name in SEGMENTS:
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(batch),
             str(iters), f"--segment={name}"],
            capture_output=True, text=True, timeout=3000,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        if p.returncode:
            rows[name] = {"error": (p.stderr or p.stdout)[-300:]}
            print(f"{name}: FAILED", file=sys.stderr, flush=True)
            continue
        d = json.loads(p.stdout.strip().splitlines()[-1])
        row = {k: d[k] for k in ("ms", "ms_raw", "gflops", "mbytes")
               if k in d}
        if "gflops" in row and row["ms"]:
            # GF / (GF/s) and MB / (MB/s) are SECONDS -> scale to ms
            bound = max(row["gflops"] / (SOL_TFS / 1e9),
                        row["mbytes"] / (SOL_BW / 1e6)) * 1e3
            row["bound_ms"] = round(bound, 4)
            row["ratio"] = round(row["ms"] / bound, 3)
            row["tfs"] = round(row["gflops"] / row["ms"], 1)
            row["gbs"] = round(row["mbytes"] / row["ms"], 1)
        rows[name] = row
        print(f"{name}: {row}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "dec_img per-op roofline (one layer)",
        "value": rows.get("blk_fwdbwd", {}).get("ms"),
        "unit": "ms (blk fwd+bwd, RTT-corrected)",
        "vs_baseline": rows.get("blk_fwdbwd", {}).get("ratio", 0),
        "batch": batch, "iters": iters,
        "sol": {"tfs": SOL_TFS, "bw": SOL_BW, "rtt_ms": RTT_MS},
        "segments": rows,
    }))


if __name__ == "__main__":
    main()
