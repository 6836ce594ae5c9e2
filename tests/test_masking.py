"""Tests for MAE random masking / gather / unshuffle under fixed PRNG keys."""
import jax
import jax.numpy as jnp
import numpy as np

from deepavfusion_tpu.ops import masking


def test_random_masking_invariants():
    key = jax.random.key(0)
    info = masking.random_masking(key, 4, 196, 0.75)
    assert info.ids_keep.shape == (4, 49)
    assert info.mask.shape == (4, 196)
    assert info.ids_restore.shape == (4, 196)
    mask = np.asarray(info.mask)
    # Exactly len_keep zeros per row
    np.testing.assert_array_equal(mask.sum(1), np.full(4, 196 - 49, np.float32))
    # Kept positions are unmasked
    for b in range(4):
        assert mask[b][np.asarray(info.ids_keep)[b]].sum() == 0
    # ids_restore is inverse of shuffle: restore of arange-shuffled is identity
    for b in range(4):
        shuf = np.argsort(np.asarray(info.ids_restore)[b])
        assert set(shuf[:49]) == set(np.asarray(info.ids_keep)[b])


def test_masking_deterministic():
    a = masking.random_masking(jax.random.key(7), 2, 96, 0.8)
    b = masking.random_masking(jax.random.key(7), 2, 96, 0.8)
    np.testing.assert_array_equal(np.asarray(a.ids_keep), np.asarray(b.ids_keep))
    c = masking.random_masking(jax.random.key(8), 2, 96, 0.8)
    assert not np.array_equal(np.asarray(a.ids_keep), np.asarray(c.ids_keep))


def test_gather_unshuffle_roundtrip():
    key = jax.random.key(1)
    B, L, D = 2, 12, 4
    x = jnp.arange(B * L * D, dtype=jnp.float32).reshape(B, L, D)
    info = masking.random_masking(key, B, L, 0.5)
    vis = masking.gather_tokens(x, info.ids_keep)
    assert vis.shape == (B, 6, D)
    mask_token = jnp.full((D,), -1.0)
    full = masking.unshuffle_with_mask_tokens(vis, mask_token, info.ids_restore)
    assert full.shape == (B, L, D)
    full_np, x_np, mask = np.asarray(full), np.asarray(x), np.asarray(info.mask)
    # kept positions restored to original values; masked positions = mask token
    for b in range(B):
        for l in range(L):
            if mask[b, l] == 0:
                np.testing.assert_array_equal(full_np[b, l], x_np[b, l])
            else:
                np.testing.assert_array_equal(full_np[b, l], -np.ones(D))


def test_patchify_matches_torch_einsum():
    import torch

    rng = np.random.RandomState(0)
    x_nhwc = rng.randn(2, 8, 12, 3).astype(np.float32)
    ours = np.asarray(masking.patchify(jnp.asarray(x_nhwc), (4, 4)))

    # reference: models/avmae.py:200-214 operates on NCHW
    xt = torch.from_numpy(x_nhwc.transpose(0, 3, 1, 2))
    bs, c = xt.shape[:2]
    ph = pw = 4
    gh, gw = 2, 3
    xt = xt.reshape(bs, c, gh, ph, gw, pw)
    xt = torch.einsum("nchpwq->nhwpqc", xt)
    theirs = xt.reshape(bs, gh * gw, ph * pw * c).numpy()
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_unpatchify_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 24, 1).astype(np.float32))
    p = masking.patchify(x, (8, 8))
    back = masking.unpatchify(p, (8, 8), (2, 3), 1)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
