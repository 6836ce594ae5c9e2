"""A/B benchmark: fused whole-block fusion kernel vs the unfused XLA path.

Times the COMPLETE factorized FusionBlock (norms + aggregate cross-attns +
pair attention + projections + residuals + MLP) forward and forward+backward
at the production pretrain shapes, fused (ops/pallas/fusion_block.py, one
Pallas kernel per direction) vs unfused (the batched-XLA module path). The
unfused block was measured at 31% of the B=64 pretrain step for a few
percent of its FLOPs (NOTES.md r3) — this bench decides the
DAVF_FUSED_BLOCK default route.

Timing: K iterations chained inside one lax.scan dispatch (see bench.py
methodology note — per-call timing through the axon tunnel is broken).

Usage: python bench_fusion_block.py [batch] [--full] [--allow-cpu]
Prints one JSON line.
"""
import json
import os
import sys
import time

import numpy as np


def time_chained(fn, x, iters=200):
    import jax

    def chain(c):
        def body(c, _):
            return fn(c), ()
        out, _ = jax.lax.scan(body, c, None, length=iters)
        return out

    f = jax.jit(chain)
    out = f(x)
    _ = np.asarray(jax.device_get(out.ravel()[0]))
    t0 = time.perf_counter()
    out = f(x)
    _ = np.asarray(jax.device_get(out.ravel()[0]))
    return (time.perf_counter() - t0) / iters


def main():
    argv = sys.argv[1:]
    allow_cpu = "--allow-cpu" in argv
    full = "--full" in argv
    argv = [a for a in argv if not a.startswith("--")]
    batch = int(argv[0]) if argv else 64

    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    import jax.numpy as jnp

    from deepavfusion_tpu import runtime
    runtime.setup()

    backend = jax.default_backend()
    if backend != "tpu" and not allow_cpu:
        print(f"bench_fusion_block: backend is {backend}, need tpu "
              "(--allow-cpu to override)", file=sys.stderr)
        sys.exit(1)

    from deepavfusion_tpu.models.fusion_blocks import FusionBlock

    d, h = 768, 12
    tkns = (16, 8, 8)
    nv, na = (196, 96) if full else (49, 19)
    mod = FusionBlock(arch="factorized_mmi", num_heads=h, attn_ratio=0.25,
                      mlp_ratio=1.0, fusion_tkns=tkns, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    xf = jnp.asarray(rng.randn(batch, sum(tkns), d), jnp.bfloat16)
    xi = jnp.asarray(rng.randn(batch, nv, d), jnp.bfloat16)
    xa = jnp.asarray(rng.randn(batch, na, d), jnp.bfloat16)

    rows = {}
    outs = {}
    grads = {}
    for mode in ("unfused", "fused"):
        os.environ.pop("DAVF_FUSED_BLOCK", None)
        os.environ.pop("DAVF_NO_FUSED_BLOCK", None)
        os.environ["DAVF_FUSED_BLOCK" if mode == "fused"
                   else "DAVF_NO_FUSED_BLOCK"] = "1"
        params = mod.init(jax.random.key(0), xf, xi, xa)["params"]

        def fwd(c):
            return mod.apply({"params": params}, c, xi, xa)

        rows[f"{mode}_fwd_us"] = round(time_chained(fwd, xf) * 1e6, 1)
        outs[mode] = jax.device_get(jax.jit(fwd)(xf)).astype(np.float32)

        def loss(c, p):
            return mod.apply({"params": p}, c, xi, xa).astype(
                jnp.float32).sum()

        # grads wrt inputs AND params — without the param grads XLA DCEs
        # most of the unfused backward (the fused custom VJP always computes
        # them), which made the first isolated A/B unfairly favor XLA.
        g = jax.grad(loss, argnums=(0, 1))
        grads[mode] = jax.device_get(
            jax.jit(lambda c: g(c, params)[0])(xf)).astype(np.float32)

        def gstep(c):
            dc, dp = g(c, params)
            leaves = jax.tree_util.tree_leaves(dp)
            s = sum(l.astype(jnp.float32).sum() for l in leaves)
            return c + 1e-6 * dc.astype(c.dtype) + 0.0 * s.astype(c.dtype)

        rows[f"{mode}_fwdbwd_us"] = round(time_chained(gstep, xf) * 1e6, 1)
        print(f"{mode}: {rows}", file=sys.stderr)
    os.environ.pop("DAVF_FUSED_BLOCK", None)
    os.environ.pop("DAVF_NO_FUSED_BLOCK", None)

    fwd_ratio = rows["fused_fwd_us"] / rows["unfused_fwd_us"]
    bwd_ratio = rows["fused_fwdbwd_us"] / rows["unfused_fwdbwd_us"]
    out_err = float(np.max(np.abs(outs["fused"] - outs["unfused"])))
    grad_err = float(np.max(np.abs(grads["fused"] - grads["unfused"])))
    print(json.dumps({
        "metric": "fused fusion-block vs unfused XLA (full block)",
        "value": round(bwd_ratio, 3),
        "unit": "fused/unfused fwd+bwd time ratio",
        "vs_baseline": 1.0,
        "batch": batch, "nv": nv, "na": na, "backend": backend,
        "fwd_ratio": round(fwd_ratio, 3),
        "out_max_abs_err": round(out_err, 5),
        "dxf_max_abs_err": round(grad_err, 5),
        **rows,
    }))


if __name__ == "__main__":
    main()
