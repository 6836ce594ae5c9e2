"""Fine-grained attribution + roofline of the MAE decoder tail (VERDICT r4
item 1: the decoders are 46.9 ms / 41% of the step at 67-77 TF/s effective —
decompose dec_img per-op and bound each piece with a FLOPs AND HBM-bytes
roofline, not TF/s alone).

Measures, each as a K-iteration single-dispatch lax.scan chain (the only
artifact-immune timing through the axon tunnel — see bench.py):

  one dec_img layer (B=64, N=228, D=512, H=16, Dh=32, mlp 4x), bf16:
  * blk        — the full Block fwd / fwd+bwd (the unit the 8-layer decoder
                 repeats; 8x blk + embed/pred/unshuffle ≈ dec_img total)
  * attnmod    — LN1 + SelfAttention (qkv/attn-core/proj) + residual
  * mlpmod     — LN2 + Mlp(4x) + residual
  * core shapes as pure chained matmuls (the achievable-TF/s probes at the
    decoder's exact GEMM shapes):
      - gemm_qkv:  (B*N,512)x(512,1536) -> x(1536,512) back
      - gemm_mlp:  (B*N,512)x(512,2048) -> x(2048,512) back
      - gemm_proj: (B*N,512)x(512,512)  -> x(512,512) back

  whole-model segments for the roofline table (FLOPs + bytes from the
  compiled program's cost_analysis; bounds = max(F/SOL_tf, B/SOL_bw)):
  * dec_img / dec_aud fwd+bwd, enc fwd+bwd, adamw (reuses the
    bench_step_attribution programs — cached from r4 runs)

Prints one JSON line; rows stream to stderr as they land.
Usage: python bench_decoder_attr.py [batch] [iters]
"""
import json
import os
import sys
import time

import numpy as np

# Measured big-matmul speed of light on this v5e (NOTES.md: chained 8192^3
# bf16 matmuls, 80% of the 197 TF/s paper peak) and HBM bandwidth.
SOL_TFS = 157.9e12
SOL_BW = 819e9


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(argv[0]) if argv else 64
    iters = int(argv[1]) if len(argv) > 1 else 200

    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    import jax.numpy as jnp

    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.models.layers import Block, Mlp, SelfAttention, layer_norm

    rows = {}
    costs = {}

    def chain(fn, carry, n=iters, label="", cost=False):
        try:
            def body(c, _):
                return fn(c), ()

            f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=n)[0])
            if cost:
                try:
                    # XLA cost_analysis counts a scan body ONCE (not x trip
                    # count, NOTES.md r2) -> the program total IS the
                    # per-step cost.
                    ca = f.lower(carry).compile().cost_analysis()
                    if isinstance(ca, list):
                        ca = ca[0]
                    costs[label] = {
                        "gflops": round(ca.get("flops", 0.0) / 1e9, 2),
                        "mbytes": round(ca.get("bytes accessed", 0.0) / 1e6, 2),
                    }
                except Exception as e:  # noqa: BLE001
                    costs[label] = {"error": str(e)[:120]}
            out = f(carry)
            _ = np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            t0 = time.perf_counter()
            out = f(carry)
            _ = np.asarray(jax.device_get(
                jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            ms = (time.perf_counter() - t0) / n * 1e3
            rows[label] = round(ms, 4)
            extra = ""
            if label in costs and "gflops" in costs[label]:
                c = costs[label]
                tf = c["gflops"] / ms if ms else 0.0
                bw = c["mbytes"] / 1e3 / ms if ms else 0.0
                bound = max(c["gflops"] / (SOL_TFS / 1e9),
                            c["mbytes"] / (SOL_BW / 1e6))
                extra = (f"  [{c['gflops']} GF, {c['mbytes']} MB -> "
                         f"{tf:.0f} TF/s, {bw * 1e3:.0f} GB/s, "
                         f"bound {bound:.3f} ms, ratio {ms / bound:.2f}x]")
                costs[label]["bound_ms"] = round(bound, 4)
                costs[label]["ratio"] = round(ms / bound, 3)
            print(f"{label}: {ms:.4f} ms{extra}", file=sys.stderr)
            return ms
        except Exception as e:  # noqa: BLE001
            print(f"{label}: FAILED {str(e)[:200]}", file=sys.stderr)
            rows[label] = None
            return None

    D, H, MLP = 512, 16, 4.0
    N = 228   # 196 img patches + 32 fusion tokens
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, N, D), dt)

    # ---- one full decoder Block ---------------------------------------- #
    blk = Block(H, MLP, qkv_bias=True, norm_eps=1e-5, dtype=dt)
    bp = blk.init(jax.random.key(0), x)["params"]
    bp = jax.device_put(bp)

    def blk_loss(pp, xx):
        return blk.apply({"params": pp}, xx, False).astype(jnp.float32).mean()

    def blk_fwd(xx):
        s = blk_loss(bp, xx)
        return xx * (1.0 + 0.0 * s.astype(xx.dtype))

    bgrad = jax.grad(blk_loss, argnums=(0, 1))

    def blk_fwdbwd(carry):
        pp, xx = carry
        gp, gx = bgrad(pp, xx)
        return (jax.tree.map(lambda v, gv: v + 1e-9 * gv.astype(v.dtype), pp, gp),
                xx + 1e-9 * gx.astype(xx.dtype))

    chain(blk_fwd, x, label="blk_fwd", cost=True)
    chain(blk_fwdbwd, (bp, x), label="blk_fwdbwd", cost=True)

    # ---- attention module only (LN1 + qkv + core + proj + residual) ----- #
    class AttnMod(__import__("flax").linen.Module):
        dtype: object = dt

        @__import__("flax").linen.compact
        def __call__(self, xx):
            y = layer_norm(1e-5, self.dtype, "norm1")(xx)
            return xx + SelfAttention(H, qkv_bias=True, dtype=self.dtype,
                                      name="attn")(y, False)

    am = AttnMod()
    ap = jax.device_put(am.init(jax.random.key(0), x)["params"])

    def am_loss(pp, xx):
        return am.apply({"params": pp}, xx).astype(jnp.float32).mean()

    def am_fwd(xx):
        s = am_loss(ap, xx)
        return xx * (1.0 + 0.0 * s.astype(xx.dtype))

    agrad = jax.grad(am_loss, argnums=(0, 1))

    def am_fwdbwd(carry):
        pp, xx = carry
        gp, gx = agrad(pp, xx)
        return (jax.tree.map(lambda v, gv: v + 1e-9 * gv.astype(v.dtype), pp, gp),
                xx + 1e-9 * gx.astype(xx.dtype))

    chain(am_fwd, x, label="attnmod_fwd", cost=True)
    chain(am_fwdbwd, (ap, x), label="attnmod_fwdbwd", cost=True)

    # ---- MLP module only (LN2 + Mlp + residual) ------------------------- #
    class MlpMod(__import__("flax").linen.Module):
        dtype: object = dt

        @__import__("flax").linen.compact
        def __call__(self, xx):
            y = layer_norm(1e-5, self.dtype, "norm2")(xx)
            return xx + Mlp(int(D * MLP), dtype=self.dtype, name="mlp")(y, False)

    mm = MlpMod()
    mp = jax.device_put(mm.init(jax.random.key(0), x)["params"])

    def mm_loss(pp, xx):
        return mm.apply({"params": pp}, xx).astype(jnp.float32).mean()

    def mm_fwd(xx):
        s = mm_loss(mp, xx)
        return xx * (1.0 + 0.0 * s.astype(xx.dtype))

    mgrad = jax.grad(mm_loss, argnums=(0, 1))

    def mm_fwdbwd(carry):
        pp, xx = carry
        gp, gx = mgrad(pp, xx)
        return (jax.tree.map(lambda v, gv: v + 1e-9 * gv.astype(v.dtype), pp, gp),
                xx + 1e-9 * gx.astype(xx.dtype))

    chain(mm_fwd, x, label="mlpmod_fwd", cost=True)
    chain(mm_fwdbwd, (mp, x), label="mlpmod_fwdbwd", cost=True)

    # ---- pure-GEMM achievable-TF/s probes at the decoder shapes --------- #
    R = batch * N
    for label, k1, k2 in (("gemm_qkv", 3 * D, D), ("gemm_mlp", int(D * MLP), D),
                          ("gemm_proj", D, D)):
        w1 = jnp.asarray(rng.randn(D, k1) * 0.02, dt)
        w2 = jnp.asarray(rng.randn(k1, k2) * 0.02, dt)
        xx = jnp.asarray(rng.randn(R, D), dt)
        gf = 2 * R * (D * k1 + k1 * k2) / 1e9

        def gemm(c, w1=w1, w2=w2):
            return (c @ w1) @ w2

        ms = chain(gemm, xx, label=label)
        if ms:
            print(f"  -> {gf / ms:.0f} TF/s achievable at this shape",
                  file=sys.stderr)
            costs[label] = {"gflops": round(gf, 2),
                            "tfs": round(gf / ms, 1)}

    print(json.dumps({
        "metric": "dec_img per-op attribution (one layer, B%d)" % batch,
        "value": rows.get("blk_fwdbwd"),
        "unit": "ms (blk fwd+bwd)",
        "vs_baseline": 1.0,
        "batch": batch, "iters": iters, "N": N, "D": D, "H": H,
        "backend": jax.default_backend(),
        "segments_ms": rows,
        "cost": costs,
        "sol": {"tfs": SOL_TFS, "bw": SOL_BW},
    }))


if __name__ == "__main__":
    main()
