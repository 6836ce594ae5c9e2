"""dense_mmi at the PRODUCTION eval shape (VERDICT r3 item 6).

The dense-interactions fusion block attends over ALL nv x na token pairs
(reference models/fusion_blocks.py:171-177) — 196 x 96 = 18,816 pairs at
full-token eval. This bench proves the shape is feasible end to end on one
v5e and quantifies PairDense's memory claim:

  1. ViT-B dense_mmi trunk fwd and fwd+bwd step time at B=8 bf16, full
     tokens, vs the factorized trunk at the same shape;
  2. ``memory_analysis`` of PairDense vs a materialized Dense-over-pairs
     projection at (B=64, 196x96, d=768): the pair tensor alone is
     64 * 18816 * 1536 * 2 B = 3.7 GB, which PairDense never allocates.

Usage: python bench_dense_mmi.py [batch=8] [iters=40]
Prints ONE JSON line.
"""
import json
import os
import sys
import time

import numpy as np


def time_chained(fn, x, iters):
    import jax

    def chain(c):
        def body(c, _):
            return fn(c), ()
        return jax.lax.scan(body, c, None, length=iters)[0]

    f = jax.jit(chain)
    out = f(x)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    out = f(x)
    _ = np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(argv[0]) if argv else 8
    iters = int(argv[1]) if len(argv) > 1 else 40

    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    import jax.numpy as jnp

    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.models import deepavfusion as trunk_mod
    from deepavfusion_tpu.models.vit import vit_config

    rows = {}
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(batch, 224, 224, 3), jnp.bfloat16)
    aud = jnp.asarray(rng.randn(batch, 128, 192, 1), jnp.bfloat16)

    for arch in ("dense_mmi", "factorized_mmi"):
        # scan_layers: the UNROLLED dense trunk program trips the remote
        # compile service's ~30-min drop twice in a row (broken pipe, r4);
        # the scanned trunk is the same math in a 12x smaller program and
        # is the entry default through the tunnel anyway (NOTES.md r3).
        cfg = trunk_mod.DeepAVFusionConfig(
            image=vit_config("vit_base", (224, 224), 3),
            audio=vit_config("vit_base", (128, 192), 1),
            fusion_arch=arch, num_fusion_tkns=(16, 8, 8),
            fusion_mlp_ratio=1.0, fusion_attn_ratio=0.25,
            fusion_num_heads=12, scan_layers=True)
        trunk = trunk_mod.DeepAVFusion(cfg, dtype=jnp.bfloat16)
        with jax.default_device(runtime.host_cpu_device()):
            params = trunk.init(jax.random.key(0),
                                jnp.zeros((1, 224, 224, 3)),
                                jnp.zeros((1, 128, 192, 1)))["params"]
        params = jax.device_put(params)

        def fwd(x):
            xi, xa, xf = trunk.apply({"params": params}, x, aud)
            s = (xi.astype(jnp.float32).mean()
                 + xa.astype(jnp.float32).mean()
                 + xf.astype(jnp.float32).mean())
            return x * (1.0 + 0.0 * s.astype(x.dtype))

        def loss(pp, x):
            xi, xa, xf = trunk.apply({"params": pp}, x, aud)
            return (xi.astype(jnp.float32).mean()
                    + xa.astype(jnp.float32).mean()
                    + xf.astype(jnp.float32).mean())

        g = jax.grad(loss)

        def fwdbwd(pp):
            gg = g(pp, img)
            return jax.tree.map(lambda v, gv: v + 1e-9 * gv.astype(v.dtype),
                                pp, gg)

        rows[f"{arch}_fwd_ms"] = round(time_chained(fwd, img, iters) * 1e3, 3)
        rows[f"{arch}_fwdbwd_ms"] = round(
            time_chained(fwdbwd, params, iters) * 1e3, 3)
        print(f"{arch}: {rows}", file=sys.stderr)

    # ---- PairDense vs materialized pairs: compiled memory analysis ------- #
    from deepavfusion_tpu.models.fusion_blocks import PairDense, _pairs
    from flax import linen as nn

    b2, nv, na, d, inner = 64, 196, 96, 768, 192
    x1 = jnp.asarray(rng.randn(b2, nv, d), jnp.bfloat16)
    x2 = jnp.asarray(rng.randn(b2, na, d), jnp.bfloat16)
    pd = PairDense(inner, dtype=jnp.bfloat16)
    pd_params = pd.init(jax.random.key(1), x1[:1], x2[:1])["params"]

    def use_pairdense(a, b):
        return pd.apply({"params": pd_params}, a, b).astype(
            jnp.float32).sum()

    dense = nn.Dense(inner, dtype=jnp.bfloat16)
    dn_params = {"kernel": pd_params["kernel"],
                 "bias": pd_params["bias"]}

    def use_materialized(a, b):
        return dense.apply({"params": dn_params}, _pairs(a, b)).astype(
            jnp.float32).sum()

    def temp_bytes(fn):
        c = jax.jit(fn).lower(x1, x2).compile()
        ma = c.memory_analysis()
        if isinstance(ma, (list, tuple)):
            ma = ma[0]
        return int(getattr(ma, "temp_size_in_bytes", 0))

    rows["pairdense_temp_mb"] = round(temp_bytes(use_pairdense) / 2**20, 1)
    rows["materialized_temp_mb"] = round(
        temp_bytes(use_materialized) / 2**20, 1)
    print(f"memory: {rows['pairdense_temp_mb']} vs "
          f"{rows['materialized_temp_mb']} MB", file=sys.stderr)

    print(json.dumps({
        "metric": "dense_mmi full-shape (196x96=18816 pairs) feasibility",
        "value": rows["dense_mmi_fwdbwd_ms"],
        "unit": "ms fwd+bwd trunk step",
        "vs_baseline": round(rows["dense_mmi_fwdbwd_ms"]
                             / rows["factorized_mmi_fwdbwd_ms"], 3),
        "batch": batch, "iters": iters,
        "backend": jax.default_backend(),
        **rows,
    }))


if __name__ == "__main__":
    main()
