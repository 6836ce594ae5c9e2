"""Attention primitive tests: XLA path vs torch softmax-attention, Pallas interpret mode."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from deepavfusion_tpu.ops import attention


def _torch_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    logits = torch.einsum("bhqd,bhkd->bhqk", q, k) * scale
    w = logits.softmax(-1)
    return torch.einsum("bhqk,bhkd->bhqd", w, v), w


def test_xla_attention_matches_torch():
    rng = np.random.RandomState(0)
    q = rng.randn(2, 4, 9, 16).astype(np.float32)
    k = rng.randn(2, 4, 13, 16).astype(np.float32)
    v = rng.randn(2, 4, 13, 16).astype(np.float32)
    ours, w_ours = attention.xla_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), return_weights=True
    )
    theirs, w_theirs = _torch_attention(*map(torch.from_numpy, (q, k, v)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_ours), w_theirs.numpy(), atol=1e-5)


def test_flash_attention_interpret_matches_xla():
    from deepavfusion_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(2, 3, 324, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 3, 324, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 3, 324, 64).astype(np.float32))
    got = flash_attention(q, k, v, interpret=True)
    want = attention.xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_unaligned_shapes():
    from deepavfusion_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(2)
    # 49 visible image tokens + 32 fusion = pretraining encoder shape; 19 kv
    q = jnp.asarray(rng.randn(1, 12, 81, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 12, 19, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 12, 19, 64).astype(np.float32))
    got = flash_attention(q, k, v, interpret=True)
    want = attention.xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_split_merge_heads_roundtrip():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 5, 24).astype(np.float32))
    h = attention.split_heads(x, 4)
    assert h.shape == (2, 4, 5, 6)
    back = attention.merge_heads(h)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_flash_attention_gradient_matches_xla():
    """The train step differentiates through the Pallas kernel — its VJP must
    match the XLA attention's gradients."""
    from deepavfusion_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 2, 24, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 10, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 10, 16).astype(np.float32))
    import jax

    def loss_pallas(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    def loss_xla(q, k, v):
        return (attention.xla_attention(q, k, v) ** 2).sum()

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_pallas_inference_policy(monkeypatch):
    """Large-N inference routes to Pallas on TPU BY DEFAULT since kernel v2
    (in-context regression root-caused, NOTES.md r3); training/small/biased
    shapes stay XLA."""
    import numpy as np

    from deepavfusion_tpu.ops import attention as A

    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    q = np.zeros((1, 2, 228, 32)); k = np.zeros((1, 2, 228, 32))
    small_q = np.zeros((1, 2, 81, 32))
    assert A._pallas_for_inference(q, k, None)                 # default ON
    assert not A._pallas_for_inference(small_q, k, None)       # small N
    assert not A._pallas_for_inference(q, k, np.zeros(1))      # bias
    monkeypatch.setenv("DAVF_NO_PALLAS_INFER", "1")
    assert not A._pallas_for_inference(q, k, None)             # route opt-out
    monkeypatch.delenv("DAVF_NO_PALLAS_INFER")
    monkeypatch.setenv("DAVF_NO_PALLAS", "1")
    assert not A._pallas_for_inference(q, k, None)             # kill switch
    monkeypatch.delenv("DAVF_NO_PALLAS")
    monkeypatch.setattr(A, "_on_tpu", lambda: False)
    assert not A._pallas_for_inference(q, k, None)             # CPU


def test_platform_dependent_fallback_on_cpu(monkeypatch):
    """Policy says Pallas (mocked TPU backend) but the lowering platform is
    CPU — the platform_dependent dispatch must fall back to the XLA branch
    instead of failing in pallas_call's cpu lowering (the bug hit by
    model.init under jax.default_device(cpu), NOTES.md r3)."""
    import jax

    from deepavfusion_tpu.ops import attention as A

    monkeypatch.setattr(A, "_on_tpu", lambda: True)  # policy believes TPU
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(1, 2, 228, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 228, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 228, 32).astype(np.float32))
    out = jax.jit(
        lambda q, k, v: A.dot_product_attention(q, k, v, inference=True)
    )(q, k, v)
    want = A.xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)

    # grads differentiate through the platform_dependent dispatch too
    g = jax.jit(jax.grad(
        lambda q: A.dot_product_attention(q, k, v, inference=True).sum()))(q)
    assert np.isfinite(np.asarray(g)).all()


def test_pallas_training_policy(monkeypatch):
    """Training shapes at N >= 192 route to Pallas by default (end-to-end
    measured win, NOTES.md r3); smaller training shapes stay XLA."""
    from deepavfusion_tpu.ops import attention as A

    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    q = np.zeros((1, 2, 228, 32)); k = np.zeros((1, 2, 228, 32))
    small_q = np.zeros((1, 2, 81, 32)); small_k = np.zeros((1, 2, 81, 32))
    assert A._pallas_for_training(q, k, None)
    assert not A._pallas_for_training(small_q, small_k, None)
    assert not A._pallas_for_training(q, k, np.zeros(1))      # bias
    monkeypatch.setenv("DAVF_PALLAS_TRAIN_MIN_N", "64")
    assert A._pallas_for_training(small_q, small_k, None)     # threshold knob
    monkeypatch.delenv("DAVF_PALLAS_TRAIN_MIN_N")
    monkeypatch.setenv("DAVF_NO_PALLAS_TRAIN", "1")
    assert not A._pallas_for_training(q, k, None)
    monkeypatch.delenv("DAVF_NO_PALLAS_TRAIN")
    monkeypatch.setattr(A, "_on_tpu", lambda: False)
    assert not A._pallas_for_training(q, k, None)


def test_pallas_route_vmem_feasibility_gate(monkeypatch):
    """Every real (bf16 training) shape maps to a kernel tier: one-shot
    (324), tiled (1600 = 16-frame joint attention + fusion prefix; 2352 =
    24 frames). Only sequences whose K/V rows + f32 dk/dv accumulators
    alone blow the padded budget (~16k tokens) fall back to XLA."""
    from deepavfusion_tpu.ops import attention as A

    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    bf16 = np.float16  # same itemsize as the bf16 the models train in
    vid_q = np.zeros((1, 12, 1600, 64), bf16); vid_k = np.zeros((1, 12, 1600, 64), bf16)
    vid24_q = np.zeros((1, 12, 2352, 64), bf16); vid24_k = np.zeros((1, 12, 2352, 64), bf16)
    huge_q = np.zeros((1, 12, 2 ** 14, 64), bf16); huge_k = np.zeros((1, 12, 2 ** 14, 64), bf16)
    ok_q = np.zeros((1, 12, 324, 64), bf16); ok_k = np.zeros((1, 12, 324, 64), bf16)
    assert A._kernel_fits(ok_q, ok_k)                        # one-shot
    assert A._kernel_fits(vid_q, vid_k)                      # tiled
    assert A._kernel_fits(vid24_q, vid24_k)                  # tiled, q-blocked
    assert not A._kernel_fits(huge_q, huge_k)                # K/V rows too big
    # All feasible N>=192 shapes route for training AND inference. The tiled
    # video shapes lose their ISOLATED backward A/B but win 18% in context
    # (full remat train step, bench_video.py) — the in-context measurement
    # sets the policy (see _pallas_for_training).
    assert A._pallas_for_training(vid_q, vid_k, None)
    assert A._pallas_for_inference(vid_q, vid_k, None)
    assert A._pallas_for_training(vid24_q, vid24_k, None)
    assert A._pallas_for_inference(vid24_q, vid24_k, None)
    assert not A._pallas_for_training(huge_q, huge_k, None)
    assert not A._pallas_for_inference(huge_q, huge_k, None)
    assert A._pallas_for_training(ok_q, ok_k, None)


def test_tiled_planner_padded_accounting():
    """The r3 hardware regression: unpadded arithmetic OK'd a 1600-token
    plan whose true Mosaic footprint was 19.4 MB vs the 16 MB scoped-VMEM
    limit. The planner must account lane padding (Dh=64 -> 128, (N,1)
    stats -> 128 lanes) and never emit an over-budget plan."""
    from deepavfusion_tpu.ops.pallas import flash_attention as F

    # padded sizes: a (1600, 64) f32 buffer really occupies 1600x128 lanes
    assert F._vbytes(1600, 64, 4) == 1600 * 128 * 4
    assert F._vbytes(1600, 1, 4) == 1600 * 128 * 4      # the stats column
    assert F._vbytes(1, 1600, 4) == 8 * 1664 * 4        # the rank-3 lse row
    assert F._vbytes(100, 64, 2) == 112 * 128 * 2       # bf16 sublane tile 16

    # the in-model video shapes (bf16 training) must plan in-budget
    for n in (1568, 1600, 2352):
        for planner in (F._plan_fwd_tiled, F._plan_bwd_tiled):
            plan = planner(n, n, 64, 64, 2)
            assert plan is not None, (planner.__name__, n)
            bq, bk = plan
            # bq must be Mosaic-legal: the whole dim, or a 128-multiple
            # (lane-position lse block; ragged tails are masked in-kernel)
            assert bq == n or bq % 128 == 0
            assert bk % 128 == 0
    # r5 retuned _TILED_BUDGET to 30 MiB (whole-row plans won the hardware
    # sweep); the padded-accounting invariant is that the historical 10 MiB
    # budget still forces the f32 1600 fwd to Q-block (the r3 19.4 MB plan
    # came from UNPADDED arithmetic OK'ing whole-row under 10 MiB)
    bq, _ = F._plan_fwd_tiled(1600, 1600, 64, 64, 4, budget=10 * 1024 * 1024)
    assert bq < 1600


def _tiled_shapes_engage(q, k, v):
    """Sanity helper: assert the (nq, nk) pair exceeds the one-shot budget so
    the test actually exercises the tiled kernels."""
    from deepavfusion_tpu.ops.pallas import flash_attention as F

    nq, dh = q.shape[2], q.shape[3]
    nk, dhv = k.shape[2], v.shape[3]
    per_head = 4 * (nq * dh + nk * dh + nk * dhv + nq * dhv + 2 * nq * nk + nq)
    assert per_head > F._VMEM_BUDGET


def test_flash_attention_tiled_matches_xla():
    """KV-tiled forward (online softmax, unaligned tail chunk) vs XLA."""
    from deepavfusion_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(1, 2, 1000, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 900, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 900, 64).astype(np.float32))
    _tiled_shapes_engage(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    want = attention.xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_qtiled_matches_xla(monkeypatch):
    """Q-blocked tiled forward (24-frame joint-attention scale, 2352
    tokens). The r5 default budget picks whole-row plans, so the historical
    10 MiB budget is pinned here to keep the Q grid dim + ragged-tail path
    under interpret-mode coverage."""
    from deepavfusion_tpu.ops.pallas import flash_attention as F

    monkeypatch.setenv("DAVF_TILED_PLAN_FWD", "512,512")
    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(1, 2, 2352, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 2352, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 2352, 64).astype(np.float32))
    plan = F._plan_fwd_tiled(2352, 2352, 64, 64, 4,
                             budget=10 * 1024 * 1024)
    assert plan is not None and plan[0] < 2352
    got = F.flash_attention(q, k, v, interpret=True)
    want = attention.xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_qtiled_gradient_matches_xla(monkeypatch):
    """Tiled backward: dk/dv accumulated across Q-block grid steps in VMEM
    scratch (zeroed at the first Q step, written back at the last). The
    1600-token f32 plan must Q-block (bq < nq) so the accumulation across
    grid steps is actually exercised — pinned to the historical 10 MiB
    budget (the r5 default plans whole-row)."""
    import jax

    from deepavfusion_tpu.ops.pallas import flash_attention as F

    monkeypatch.setenv("DAVF_TILED_PLAN_BWD", "512,512")
    rng = np.random.RandomState(10)
    q = jnp.asarray(rng.randn(1, 1, 1600, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 1600, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1, 1600, 64).astype(np.float32))
    plan = F._plan_bwd_tiled(1600, 1600, 64, 64, 4,
                             budget=10 * 1024 * 1024)
    assert plan is not None and plan[0] < 1600

    def loss_pallas(q, k, v):
        return (F.flash_attention(q, k, v, interpret=True) ** 2).sum()

    def loss_xla(q, k, v):
        return (attention.xla_attention(q, k, v) ** 2).sum()

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3,
            err_msg="q-tiled VJP disagrees with XLA autodiff")


def test_flash_attention_tiled_gradient_matches_xla():
    """The tiled backward's per-chunk dq/dk/dv accumulation vs XLA autodiff."""
    import jax

    from deepavfusion_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(8)
    q = jnp.asarray(rng.randn(1, 1, 1000, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 900, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1, 900, 64).astype(np.float32))
    _tiled_shapes_engage(q, k, v)

    def loss_pallas(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    def loss_xla(q, k, v):
        return (attention.xla_attention(q, k, v) ** 2).sum()

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_p, g_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3,
            err_msg="tiled VJP disagrees with XLA autodiff")


@pytest.mark.parametrize("hg", [2, 4])
def test_tiled_head_grouping_and_plan_override(monkeypatch, hg):
    """Head-grouped tiled kernels (DAVF_TILED_HG) and the (bq, bk) plan
    override (DAVF_TILED_PLAN_FWD/_BWD) — the calibration sweep hooks —
    must be value-identical to the default hg=1 planner path. Exercises
    ragged Q tails (768-row blocks over 1000 rows) and the unaligned tail
    chunk (bk=256 over 900) under grouping."""
    import jax

    from deepavfusion_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(1, 4, 1000, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 4, 900, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 4, 900, 64).astype(np.float32))
    _tiled_shapes_engage(q, k, v)

    def loss(q, k, v):
        return (flash_attention(q, k, v, interpret=True) ** 2).sum()

    out_ref = flash_attention(q, k, v, interpret=True)
    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setenv("DAVF_TILED_HG", str(hg))
    monkeypatch.setenv("DAVF_TILED_PLAN_FWD", "768,256")
    monkeypatch.setenv("DAVF_TILED_PLAN_BWD", "768,256")
    out_hg = flash_attention(q, k, v, interpret=True)
    g_hg = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    np.testing.assert_allclose(np.asarray(out_hg), np.asarray(out_ref),
                               atol=2e-5)
    for a, b in zip(g_hg, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3,
            err_msg=f"head-grouped (hg={hg}) tiled VJP diverges")


def test_nolse_and_lse_paths_agree():
    """Kernel v4 routes one-shot-both-directions shapes through an lse-free
    custom VJP whose backward recomputes the softmax stats; the lse-carrying
    path must produce the same outputs AND gradients on the same inputs."""
    import jax

    from deepavfusion_tpu.ops.pallas import flash_attention as F

    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(1, 4, 36, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 4, 28, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 4, 28, 16).astype(np.float32))
    assert F._one_shot_nolse(36, 28, 16, 16, 4)   # this shape takes the fast path

    scale = 16 ** -0.5
    out_nolse = F._flash_nolse(q, k, v, scale, True)
    out_lse = F._flash(q, k, v, scale, True)
    np.testing.assert_allclose(np.asarray(out_nolse), np.asarray(out_lse),
                               atol=2e-5)

    g_nolse = jax.grad(
        lambda *a: (F._flash_nolse(*a, scale, True) ** 2).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    g_lse = jax.grad(
        lambda *a: (F._flash(*a, scale, True) ** 2).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_nolse, g_lse):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_one_shot_bwd_fits_boundaries():
    """Kernel-tier boundary: one-shot backward for the trunk shapes, tiled
    backward at the video lengths (informational — routing is in-context
    driven, see _pallas_for_training)."""
    from deepavfusion_tpu.ops.pallas.flash_attention import one_shot_bwd_fits

    assert one_shot_bwd_fits(228, 228, 32, 32, 2)     # MAE image decoder
    assert one_shot_bwd_fits(324, 324, 64, 64, 2)     # joint fusion bound
    assert not one_shot_bwd_fits(1568, 1568, 64, 64, 2)   # 16-frame video
    assert not one_shot_bwd_fits(2352, 2352, 64, 64, 2)   # 24-frame video


def test_packed_kernels_match_xla(monkeypatch):
    """v5 packed-QK one-shot kernels (DAVF_PACKED opt-in): exact per-head
    math incl. the Nkp tail path (nk=228 -> 256) and the no-tail path
    (nk=128), forward and gradients."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from deepavfusion_tpu.ops import attention as A
    from deepavfusion_tpu.ops.pallas import flash_attention as fa

    monkeypatch.setenv("DAVF_PACKED", "1")
    rng = np.random.RandomState(0)
    for b, h, nq, nk, dh in [(2, 16, 100, 228, 32),   # tail-masked nkp=256
                             (2, 16, 128, 128, 32),   # nkp == nk
                             (2, 8, 60, 100, 16),     # p=8, tail-masked
                             (2, 4, 130, 130, 64)]:   # p=2, tail-masked
        assert fa._pk_cfg(h, nq, nk, dh, dh, 4) is not None, (h, nq, nk, dh)
        q = jnp.asarray(rng.randn(b, h, nq, dh), jnp.float32)
        k = jnp.asarray(rng.randn(b, h, nk, dh), jnp.float32)
        v = jnp.asarray(rng.randn(b, h, nk, dh), jnp.float32)

        got = fa.flash_attention(q, k, v, interpret=True)
        want = A.xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

        def loss_p(q, k, v):
            return (fa.flash_attention(q, k, v, interpret=True) ** 2).sum()

        def loss_x(q, k, v):
            return (A.xla_attention(q, k, v) ** 2).sum()

        gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-4, rtol=5e-4)


def test_packed_cfg_gating(monkeypatch):
    from deepavfusion_tpu.ops.pallas import flash_attention as fa

    monkeypatch.setenv("DAVF_PACKED", "1")
    cfg = fa._pk_cfg(16, 228, 228, 32, 32, 2)
    assert cfg is not None and cfg[0] == 4 and cfg[1] == 256
    assert cfg[2] % 4 == 0 and cfg[3] % 4 == 0      # head groups are p-multiples
    # dhv != dh (fusion pair attention) stays on the v4 dots
    assert fa._pk_cfg(12, 16, 64, 16, 64, 2) is None
    # head count not divisible by the pack
    assert fa._pk_cfg(6, 128, 128, 32, 32, 2) is None
    # Dh=128+ has nothing to pack
    assert fa._pk_cfg(8, 128, 128, 128, 128, 2) is None
    # opt-in gate
    monkeypatch.delenv("DAVF_PACKED")
    assert fa._pk_cfg(16, 228, 228, 32, 32, 2) is None
