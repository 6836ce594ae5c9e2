"""dense_mmi at the production PAIR COUNT (VERDICT r3 item 6 shape test).

The full-token eval shape attends over 196 x 96 = 18,816 pairs (reference
models/fusion_blocks.py:171-177). Correctness at that pair count is checked
here on CPU at a reduced embed dim (the pair count, not the width, is what
the PairDense factoring changes); the on-hardware step-time/memory numbers
live in bench_dense_mmi.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from deepavfusion_tpu.models.fusion_blocks import (
    DenseAVInteractionsAttention, PairDense, _pairs)
from flax import linen as nn

B, NV, NA, D, H = 2, 196, 96, 96, 4


def test_pairdense_matches_materialized_at_full_pair_count():
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.randn(B, NV, D).astype(np.float32))
    x2 = jnp.asarray(rng.randn(B, NA, D).astype(np.float32))
    pd = PairDense(24)
    params = pd.init(jax.random.key(0), x1, x2)["params"]
    got = pd.apply({"params": params}, x1, x2)
    assert got.shape == (B, NV * NA, 24)
    ref = nn.Dense(24).apply({"params": params}, _pairs(x1, x2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_dense_attention_full_pair_count_fwd_and_grad():
    rng = np.random.RandomState(1)
    xmm = jnp.asarray(rng.randn(B, 16, D).astype(np.float32))
    xv = jnp.asarray(rng.randn(B, NV, D).astype(np.float32))
    xa = jnp.asarray(rng.randn(B, NA, D).astype(np.float32))
    attn = DenseAVInteractionsAttention(num_heads=H, dim_ratio=0.25)
    params = attn.init(jax.random.key(2), xmm, xa, xv)["params"]
    out = attn.apply({"params": params}, xmm, xa, xv)
    assert out.shape == (B, 16, D)
    assert np.isfinite(np.asarray(out)).all()

    def loss(p):
        return attn.apply({"params": p}, xmm, xa, xv).sum()

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
