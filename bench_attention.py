"""A/B benchmark: Pallas fused flash-attention vs the XLA einsum path.

Times forward and forward+backward at every real attention shape in the
framework (reference shapes per models/fusion_blocks.py:171-177, 245-252 and
the MAE decoder, SURVEY.md §5.7), on the default backend. The result decides
``ops/attention._use_pallas_default`` (VERDICT round-1 item 2).

Shapes (ViT-B VGGSound pretraining config, batch 64):
  * encoder self-attn, visible tokens:  image (32+49)=81, audio (32+19)=51
  * encoder self-attn, full eval:       image (32+196)=228, audio (32+96)=128
  * decoder self-attn:                  image (32+196)=228, audio (32+96)=128 @ dim512/H16
  * fusion cross-attn aggregators:      q=8 over 49/19 (pretrain) or 196/96
  * factorized pair attention:          q=16 over 8x8=64 pairs
  * joint fusion self-attn bound:       324 (196+96+32)

Usage: python bench_attention.py [batch] [--fwd-only] [--allow-cpu]
       python bench_attention.py [batch] --in-context
Prints one JSON line with per-shape timings and the verdict.

--in-context times a FULL ViT block (qkv proj + attention + mlp) at
64x228x768 with the attention on each path — the measurement that exposed
round 2's 15x Pallas regression (isolated-op wins did not transfer because
the v1 kernel's host-side pad/slice fenced XLA fusion around the custom
call; see ops/pallas/flash_attention.py v2 notes).
"""
import json
import os
import sys
import time

import numpy as np


def time_chained(op, q, k, v, iters=400, grad=False):
    """Time `iters` applications of op chained inside ONE lax.scan dispatch,
    bounded by a device→host value fetch.

    Through the remote-TPU tunnel, per-call timing + block_until_ready
    under-reports by >10x (see bench.py docstring); a single dispatch of a
    scanned chain (each iteration's output feeding the next's query) is the
    only artifact-immune measurement. The chain also prevents XLA from
    eliding repeated identical applications.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    if grad:
        def loss(qq, kk, vv):
            return op(qq, kk, vv).astype(jnp.float32).sum()

        g = jax.grad(loss, argnums=(0, 1, 2))

        def body(c, _):
            dq, dk, dv = g(c, k, v)
            # fold the grads back into the carry to keep the chain live
            return (c + 1e-6 * dq.astype(c.dtype)), ()
    else:
        def body(c, _):
            return op(c, k, v).astype(c.dtype), ()

    def chain(c):
        out, _ = jax.lax.scan(body, c, None, length=iters)
        return out

    f = jax.jit(chain)
    out = f(q)                                   # compile + warm
    _ = np.asarray(jax.device_get(out.ravel()[0]))
    t0 = time.perf_counter()
    out = f(q)
    _ = np.asarray(jax.device_get(out.ravel()[0]))
    return (time.perf_counter() - t0) / iters


def bench_in_context(batch, interp, n=228):
    """Full ViT block fwd (and fwd+bwd) with XLA vs Pallas attention inside.

    ``--n=1568`` measures the video joint-attention block (16-frame
    video_vit_base) — the shape served by the v3 KV-tiled kernels. The
    full-step in-context measurement for the video route is bench_video.py.
    """
    import jax
    import jax.numpy as jnp

    from deepavfusion_tpu.models.layers import Block

    d = 768
    iters = 100 if n <= 512 else 20
    rows = {}
    for mode in ("xla", "pallas"):
        # the dispatch env is read at trace time (ops/attention.py), so
        # toggling it between jit compiles selects the path cleanly
        os.environ.pop("DAVF_PALLAS", None)
        os.environ.pop("DAVF_NO_PALLAS", None)
        os.environ["DAVF_PALLAS" if mode == "pallas" else "DAVF_NO_PALLAS"] = "1"

        blk = Block(num_heads=12, mlp_ratio=4.0, qkv_bias=True,
                    dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.RandomState(0).randn(batch, n, d), jnp.bfloat16)
        params = blk.init(jax.random.key(0), x, True)["params"]

        def fwd(xx):
            return blk.apply({"params": params}, xx, True)

        rows[f"{mode}_block_fwd_us"] = round(
            time_chained(lambda q, k, v: fwd(q), x, None, None, iters=iters) * 1e6, 1)

        def loss(xx):
            return fwd(xx).astype(jnp.float32).sum()

        g = jax.grad(loss)

        def gbody(q, k, v):
            return q + 1e-6 * g(q).astype(q.dtype)

        rows[f"{mode}_block_bwd_us"] = round(
            time_chained(gbody, x, None, None, iters=iters) * 1e6, 1)
    os.environ.pop("DAVF_PALLAS", None)
    os.environ.pop("DAVF_NO_PALLAS", None)
    rows["fwd_ratio_pallas_over_xla"] = round(
        rows["pallas_block_fwd_us"] / rows["xla_block_fwd_us"], 3)
    rows["bwd_ratio_pallas_over_xla"] = round(
        rows["pallas_block_bwd_us"] / rows["xla_block_bwd_us"], 3)
    return rows


def main():
    argv = [a for a in sys.argv[1:]]
    fwd_only = "--fwd-only" in argv
    allow_cpu = "--allow-cpu" in argv
    in_context = "--in-context" in argv
    only = None
    ctx_n = 228
    for a in argv:
        if a.startswith("--only="):     # e.g. --only=video_joint_1568
            only = a.split("=", 1)[1]
        if a.startswith("--n="):        # in-context block sequence length
            ctx_n = int(a.split("=", 1)[1])
    argv = [a for a in argv if not a.startswith("--")]
    batch = int(argv[0]) if argv else 64

    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    import jax.numpy as jnp

    from deepavfusion_tpu import runtime
    runtime.setup()
    from deepavfusion_tpu.ops import attention
    from deepavfusion_tpu.ops.pallas.flash_attention import flash_attention

    backend = jax.default_backend()
    if backend != "tpu" and not allow_cpu:
        print(f"bench_attention: backend is {backend}, need tpu "
              "(--allow-cpu to override)", file=sys.stderr)
        sys.exit(1)
    interp = backend != "tpu"   # CPU smoke runs the kernels in interpret mode

    if in_context:
        rows = bench_in_context(batch, interp, n=ctx_n)
        print(json.dumps({
            "metric": "in-context ViT block (xla vs pallas attention)",
            "value": rows["fwd_ratio_pallas_over_xla"],
            "unit": "pallas/xla block-fwd time ratio",
            "vs_baseline": 1.0,
            "batch": batch, "n": ctx_n, "backend": backend, **rows,
        }))
        return

    B = batch
    # (name, H, Nq, Nk, Dh, scale_override)
    SHAPES = [
        ("enc_img_visible", 12, 81, 81, 64, None),
        ("enc_aud_visible", 12, 51, 51, 64, None),
        ("enc_img_full", 12, 228, 228, 64, None),
        ("enc_aud_full", 12, 128, 128, 64, None),
        ("dec_img", 16, 228, 228, 32, None),
        ("dec_aud", 16, 128, 128, 32, None),
        # attn_ratio 0.25: inner dim 192, H=12 → Dh=16; scale from unreduced
        # per-head dim 64 (reference quirk, fusion_blocks.py:157-159)
        ("xattn_img_visible", 12, 8, 49, 16, 64 ** -0.5),
        ("xattn_img_full", 12, 8, 196, 16, 64 ** -0.5),
        ("pair_attn", 12, 16, 64, 16, 64 ** -0.5),
        ("joint_324", 12, 324, 324, 64, None),
        # video_vit_base joint space-time self-attn: 16 frames, tubelet
        # (2,16,16) → 8·14·14 = 1568 tokens (models/video_vit.py; reference
        # models/video_vits.py:135-138). Exercises the v3 KV-TILED kernels
        # (the one-shot working set blows VMEM at this N). Benched at the
        # avsync-scale batch (B//8) — the full video model runs batch 32.
        ("video_joint_1568", 12, 1568, 1568, 64, None),
        # 24-frame joint attention (reference models/video_vits.py:135-138:
        # 12·14·14 = 2352 tokens) — rows alone exceed the KV-tiled budget,
        # so this exercises the v4 Q+KV-TILED kernels (Q-block grid dim,
        # dk/dv accumulated in VMEM scratch).
        ("video_joint_2352", 12, 2352, 2352, 64, None),
    ]
    SHAPE_BATCH = {"video_joint_1568": max(4, B // 8),
                   "video_joint_2352": max(2, B // 16)}

    if only:
        SHAPES = [s for s in SHAPES if s[0] == only]
        if not SHAPES:
            print(f"bench_attention: no shape named {only!r}", file=sys.stderr)
            sys.exit(1)

    rng = np.random.RandomState(0)
    rows = {}
    pallas_wins_fwd = pallas_wins_train = 0
    for name, h, nq, nk, dh, scale in SHAPES:
        b = SHAPE_BATCH.get(name, B)
        q = jnp.asarray(rng.randn(b, h, nq, dh), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, h, nk, dh), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, h, nk, dh), jnp.bfloat16)

        xla_op = lambda q, k, v: attention.xla_attention(q, k, v, scale=scale)
        pal_op = lambda q, k, v: flash_attention(q, k, v, scale=scale, interpret=interp)

        row = {}
        if b != B:
            row["batch"] = b
        row["xla_fwd_us"] = round(time_chained(xla_op, q, k, v) * 1e6, 1)
        row["pallas_fwd_us"] = round(time_chained(pal_op, q, k, v) * 1e6, 1)
        pallas_wins_fwd += row["pallas_fwd_us"] < row["xla_fwd_us"]

        if not fwd_only:
            row["xla_bwd_us"] = round(
                time_chained(xla_op, q, k, v, grad=True) * 1e6, 1)
            row["pallas_bwd_us"] = round(
                time_chained(pal_op, q, k, v, grad=True) * 1e6, 1)
            pallas_wins_train += row["pallas_bwd_us"] < row["xla_bwd_us"]

            def loss_x(q, k, v):
                return attention.xla_attention(q, k, v, scale=scale).astype(jnp.float32).sum()

            def loss_p(q, k, v):
                return flash_attention(q, k, v, scale=scale, interpret=interp).astype(jnp.float32).sum()

            # numerical cross-check while we're here
            gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
            gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(q, k, v)
            err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
                      for a, b in zip(gx, gp))
            row["grad_max_abs_err"] = round(err, 5)
        rows[name] = row
        print(f"{name}: {row}", file=sys.stderr)

    n = len(SHAPES)
    verdict = ("pallas" if (pallas_wins_fwd + pallas_wins_train) >
               (n if not fwd_only else n / 2) else "xla")
    print(json.dumps({
        "metric": "attention A/B (pallas vs xla)",
        "value": pallas_wins_fwd + pallas_wins_train,
        "unit": f"pallas wins of {n * (1 if fwd_only else 2)}",
        "vs_baseline": 1.0,
        "batch": B,
        "backend": backend,
        "verdict": verdict,
        "shapes": rows,
    }))


if __name__ == "__main__":
    main()
