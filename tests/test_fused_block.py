"""Fused whole-block fusion kernel (ops/pallas/fusion_block.py) parity.

Oracle is the unfused flax FusionBlock (itself parity-tested against the
reference's actual torch code in test_reference_parity.py). The Pallas
kernels run in interpret mode on CPU; the routed module path is exercised
with DAVF_FUSED_BLOCK=1, where non-TPU lowerings take the platform_dependent
XLA fallback (_forward_core) — same math, no Pallas.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepavfusion_tpu.models.fusion_blocks import FusionBlock
from deepavfusion_tpu.ops.pallas import fusion_block as fb

B, NV, NA, D, H = 4, 49, 19, 96, 4
TKNS = (16, 8, 8)
ATTN_RATIO, MLP_RATIO = 0.25, 1.0
SCALE = (D // H) ** -0.5


def _mod(**kw):
    kw.setdefault("arch", "factorized_mmi")
    kw.setdefault("num_heads", H)
    kw.setdefault("attn_ratio", ATTN_RATIO)
    kw.setdefault("mlp_ratio", MLP_RATIO)
    kw.setdefault("fusion_tkns", TKNS)
    return FusionBlock(**kw)


def _inputs(seed=0, nv=NV, na=NA):
    rng = np.random.RandomState(seed)
    return (jnp.asarray(rng.randn(B, sum(TKNS), D).astype(np.float32)),
            jnp.asarray(rng.randn(B, nv, D).astype(np.float32)),
            jnp.asarray(rng.randn(B, na, D).astype(np.float32)))


def _get(tree, path):
    node = tree
    for k in path.split("."):
        node = node[k]
    return node


@pytest.fixture()
def setup():
    xf, xi, xa = _inputs()
    mod = _mod()
    params = mod.init(jax.random.key(0), xf, xi, xa)["params"]
    ptuple = tuple(_get(params, p) for p in fb.PARAM_ORDER)
    return mod, params, ptuple, xf, xi, xa


def test_forward_parity_interpret(setup):
    mod, params, ptuple, xf, xi, xa = setup
    ref = mod.apply({"params": params}, xf, xi, xa)
    out = fb.fused_factorized_block(xf, xi, xa, ptuple, num_heads=H,
                                    fusion_tkns=TKNS, scale=SCALE,
                                    interpret=True)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_grad_parity_interpret(setup):
    mod, params, ptuple, xf, xi, xa = setup
    w = jnp.asarray(np.random.RandomState(9).randn(B, sum(TKNS), D)
                    .astype(np.float32))

    def loss_ref(params, xf, xi, xa):
        return jnp.sum(mod.apply({"params": params}, xf, xi, xa) * w)

    def loss_fused(pt, xf, xi, xa):
        return jnp.sum(fb.fused_factorized_block(
            xf, xi, xa, pt, num_heads=H, fusion_tkns=TKNS, scale=SCALE,
            interpret=True) * w)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, xf, xi, xa)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(ptuple, xf, xi, xa)
    for i, name in enumerate(fb.PARAM_ORDER):
        a, b = _get(gr[0], name), gf[0][i]
        err = float(jnp.max(jnp.abs(a - b)))
        if name == "attn.k.bias":
            # softmax is invariant to a key-side bias (q·bk is constant over
            # keys): the true grad is 0 and both sides are float noise.
            assert err < 1e-4
            continue
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        assert err / scale < 3e-5, (name, err, scale)
    for j in range(3):
        err = float(jnp.max(jnp.abs(gr[1 + j] - gf[1 + j])))
        scale = float(jnp.max(jnp.abs(gr[1 + j]))) + 1e-12
        assert err / scale < 3e-5, ("dx", j, err / scale)


def test_asymmetric_sources_and_tokens():
    """nv != na source lengths and full-token (eval) shapes."""
    xf, xi, xa = _inputs(3, nv=196, na=96)
    mod = _mod()
    params = mod.init(jax.random.key(1), xf, xi, xa)["params"]
    ptuple = tuple(_get(params, p) for p in fb.PARAM_ORDER)
    ref = mod.apply({"params": params}, xf, xi, xa)
    out = fb.fused_factorized_block(xf, xi, xa, ptuple, num_heads=H,
                                    fusion_tkns=TKNS, scale=SCALE,
                                    interpret=True)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_routed_module_tree_and_fallback(monkeypatch):
    """DAVF_FUSED_BLOCK=1: the routed module declares the identical param
    tree, and the non-TPU lowering (XLA fallback branch) matches the
    unfused path."""
    xf, xi, xa = _inputs(7)
    mod = _mod()
    params_off = mod.init(jax.random.key(2), xf, xi, xa)["params"]
    ref = mod.apply({"params": params_off}, xf, xi, xa)

    monkeypatch.setenv("DAVF_FUSED_BLOCK", "1")
    params_on = mod.init(jax.random.key(2), xf, xi, xa)["params"]
    flat_off = jax.tree_util.tree_leaves_with_path(params_off)
    flat_on = jax.tree_util.tree_leaves_with_path(params_on)
    assert [p for p, _ in flat_off] == [p for p, _ in flat_on]
    for (_, a), (_, b) in zip(flat_off, flat_on):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out = mod.apply({"params": params_off}, xf, xi, xa)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_route_predicates():
    """The route stays off for dropout-active training, return_weights,
    empty sources, and token-count mismatches."""
    xf, xi, xa = _inputs(11)
    os.environ["DAVF_FUSED_BLOCK"] = "1"
    try:
        args = (xf, xi, xa)
        m = _mod()
        assert m._fused_route(*args, deterministic=True,
                              return_weights=False)
        assert not m._fused_route(*args, deterministic=True,
                                  return_weights=True)
        m2 = _mod(drop=0.1)
        assert not m2._fused_route(*args, deterministic=False,
                                   return_weights=False)
        assert m2._fused_route(*args, deterministic=True,
                               return_weights=False)
        assert not m._fused_route(xf, xi[:, :0], xa, deterministic=True,
                                  return_weights=False)
        # scan bodies construct the block with allow_fused=False (the scan
        # transpose's stacked-dW accumulation blows scoped VMEM on TPU)
        m3 = _mod(allow_fused=False)
        assert not m3._fused_route(*args, deterministic=True,
                                   return_weights=False)
    finally:
        del os.environ["DAVF_FUSED_BLOCK"]


def test_scan_trunk_never_routes_fused(monkeypatch):
    """The scanned trunk must not contain the fused-block platform cond
    even when DAVF_FUSED_BLOCK=1 forces the route elsewhere: XLA stack-
    allocates the stacked weight-grad accumulation in scoped VMEM inside
    the cond branch and the train step fails to compile on a real v5e
    ("Scoped allocation with size 33.41M and limit 16.00M exceeded",
    bench_pipeline.py r4). The unrolled trunk keeps the route."""
    from deepavfusion_tpu.models import deepavfusion as trunk_mod
    from deepavfusion_tpu.models.vit import vit_config

    monkeypatch.setenv("DAVF_FUSED_BLOCK", "1")

    def lowered_text(scan):
        tiny = dict(embed_dim=96, depth=2, num_heads=4,
                    patch_size=(16, 16))
        cfg = trunk_mod.DeepAVFusionConfig(
            image=vit_config("vit_small", (32, 32), 3, **tiny),
            audio=vit_config("vit_small", (32, 32), 1, **tiny),
            fusion_arch="factorized_mmi", num_fusion_tkns=TKNS,
            fusion_mlp_ratio=1.0, fusion_attn_ratio=0.25,
            fusion_num_heads=4, scan_layers=scan)
        trunk = trunk_mod.DeepAVFusion(cfg, dtype=jnp.float32)
        img = jnp.zeros((1, 32, 32, 3))
        aud = jnp.zeros((1, 32, 32, 1))
        params = trunk.init(jax.random.key(0), img, aud)["params"]

        def f(p):
            xi, xa, xff = trunk.apply({"params": p}, img, aud)
            return (xi.sum() + xa.sum() + xff.sum())

        return jax.jit(jax.grad(f)).lower(params).as_text()

    # the fused route's lax.platform_dependent is the only stablehlo.case
    # in this trunk's lowering (module-path names don't survive lowering)
    assert "stablehlo.case" not in lowered_text(scan=True)
    assert "stablehlo.case" in lowered_text(scan=False)


def test_batch_tile_grid_accumulation(setup):
    """Multi-step grids (batch tile < B) accumulate dparams identically to
    the single-step grid."""
    mod, params, ptuple, xf, xi, xa = setup
    w = jnp.asarray(np.random.RandomState(5).randn(B, sum(TKNS), D)
                    .astype(np.float32))

    def loss(pt, bt):
        return jnp.sum(fb.fused_factorized_block(
            xf, xi, xa, pt, num_heads=H, fusion_tkns=TKNS, scale=SCALE,
            batch_tile=bt, interpret=True) * w)

    g1 = jax.grad(lambda p: loss(p, B))(ptuple)
    g2 = jax.grad(lambda p: loss(p, 1))(ptuple)
    for a, b, name in zip(g1, g2, fb.PARAM_ORDER):
        err = float(jnp.max(jnp.abs(a - b)))
        if name == "attn.k.bias":   # true grad is 0 (see test above)
            assert err < 1e-4
            continue
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        assert err / scale < 1e-5, (name, err / scale)


def test_planner_covers_reference_shapes():
    """The bench-critical factorized shapes must plan a tile for BOTH
    directions (ViT-B pretrain visible tokens + full-token eval); absurd
    shapes must not plan at all."""
    for (tkns, nv, na, d, inner, hidden) in [
        (TKNS, 49, 19, 768, 192, 768),     # vggsound pretrain (visible)
        (TKNS, 196, 96, 768, 192, 768),    # full-token eval
    ]:
        assert fb.plan_batch_tile(64, tkns, nv, na, d, inner, hidden, 12,
                                  2) is not None, (tkns, nv, na, d)
    assert fb.plan_batch_tile(64, (64, 32, 32), 40000, 96, 768, 768,
                              3072, 12, 2) is None
