"""Attention primitive tests: XLA path vs torch softmax-attention, Pallas interpret mode."""
import numpy as np
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
    """Every real shape maps to a kernel tier: one-shot (324), v3 KV-tiled
    (1568 = 16-frame joint attention), v4 Q+KV-tiled (2352 = 24 frames).
    Only sequences whose K/V rows alone approach the VMEM budget (~16k
    tokens) fall back to XLA."""
    from deepavfusion_tpu.ops import attention as A

    monkeypatch.setattr(A, "_on_tpu", lambda: True)
    vid_q = np.zeros((1, 12, 1568, 64)); vid_k = np.zeros((1, 12, 1568, 64))
    vid24_q = np.zeros((1, 12, 2352, 64)); vid24_k = np.zeros((1, 12, 2352, 64))
    huge_q = np.zeros((1, 12, 2 ** 14, 64)); huge_k = np.zeros((1, 12, 2 ** 14, 64))
    ok_q = np.zeros((1, 12, 324, 64)); ok_k = np.zeros((1, 12, 324, 64))
    assert A._kernel_fits(ok_q, ok_k)                        # one-shot
    assert A._kernel_fits(vid_q, vid_k)                      # v3 tiled
    assert A._kernel_fits(vid24_q, vid24_k)                  # v4 q-tiled
    assert not A._kernel_fits(huge_q, huge_k)                # K/V rows too big
    assert A._pallas_for_training(vid_q, vid_k, None)
    assert A._pallas_for_inference(vid_q, vid_k, None)
    assert A._pallas_for_training(vid24_q, vid24_k, None)
    assert not A._pallas_for_training(huge_q, huge_k, None)
    assert A._pallas_for_training(ok_q, ok_k, None)


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


def test_flash_attention_qtiled_matches_xla():
    """v4 Q+KV-tiled forward (24-frame joint-attention scale, 2352 tokens:
    rows alone exceed the KV-tiled budget, so the Q grid dim engages)."""
    from deepavfusion_tpu.ops.pallas import flash_attention as F

    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(1, 2, 2352, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 2, 2352, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 2, 2352, 64).astype(np.float32))
    # assert the shape really picks a bq < nq (the v4 tier)
    kv_rows = 4 * (2352 * 64 * 2)
    per_q_row = 4 * (64 + 2 * 64 + 3) + 4 * 2 * 128
    assert F._pick_bq(2352, per_q_row, F._VMEM_BUDGET - kv_rows) < 2352
    got = F.flash_attention(q, k, v, interpret=True)
    want = attention.xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_attention_qtiled_gradient_matches_xla():
    """v4 backward: dk/dv accumulated across Q-block grid steps in VMEM
    scratch (zeroed at the first Q step, written back at the last)."""
    import jax

    from deepavfusion_tpu.ops.pallas import flash_attention as F

    rng = np.random.RandomState(10)
    q = jnp.asarray(rng.randn(1, 1, 2352, 64).astype(np.float32))
    k = jnp.asarray(rng.randn(1, 1, 2352, 64).astype(np.float32))
    v = jnp.asarray(rng.randn(1, 1, 2352, 64).astype(np.float32))
    # the bwd tier check: past the v3 ceiling → the q-tiled kernel runs
    v3_rows = 4 * (2 * (2352 * 64 + 2352 * 64) + 3 * 2352 * 64
                   + 2352 * 64 + 2 * 2352)
    assert v3_rows + 4 * 4 * 2352 * 128 > F._VMEM_BUDGET_TILED_BWD

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
