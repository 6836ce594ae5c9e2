"""Tests for sincos position embeddings vs an independent torch re-derivation."""
import numpy as np

from deepavfusion_tpu.ops import pos_embed


def test_sincos_1d_basic():
    emb = pos_embed.sincos_1d(8, np.array([0.0, 1.0]))
    assert emb.shape == (2, 8)
    # position 0: sin=0, cos=1
    np.testing.assert_allclose(emb[0, :4], 0.0, atol=1e-7)
    np.testing.assert_allclose(emb[0, 4:], 1.0, atol=1e-7)
    # position 1, first channel: sin(1)
    np.testing.assert_allclose(emb[1, 0], np.sin(1.0), atol=1e-6)


def test_sincos_2d_matches_reference_algorithm():
    """Re-derive with an independent implementation of the published MAE recipe."""
    d, gh, gw = 16, 3, 5
    got = pos_embed.sincos_2d(d, (gh, gw))
    assert got.shape == (gh * gw, d)

    def one_d(dim, positions):
        omega = 1.0 / 10000 ** (np.arange(dim // 2) / (dim / 2))
        out = positions[:, None] * omega[None, :]
        return np.concatenate([np.sin(out), np.cos(out)], 1)

    # Token order is row-major over (h, w); first half of channels encodes w
    # (the reference's meshgrid quirk), second half encodes h.
    hh, ww = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    expected = np.concatenate(
        [one_d(d // 2, ww.reshape(-1).astype(np.float32)),
         one_d(d // 2, hh.reshape(-1).astype(np.float32))], axis=1)
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_sincos_2d_distinct_positions():
    emb = pos_embed.sincos_2d(768, (14, 14))
    assert emb.shape == (196, 768)
    # All rows distinct
    assert np.unique(np.round(emb, 5), axis=0).shape[0] == 196


def test_sincos_3d_shape_and_dim_split():
    emb = pos_embed.sincos_3d(768, (12, 14, 14), thw_props=(2, 1, 1))
    assert emb.shape == (12 * 14 * 14, 768)
    h_dim = int(768 * 0.25)
    w_dim = int(768 * 0.25)
    t_dim = 768 - h_dim - w_dim
    assert t_dim == 384
    # temporal channels constant within a time slice
    sl = emb[: 14 * 14, :t_dim]
    np.testing.assert_allclose(sl, np.broadcast_to(sl[0], sl.shape), atol=1e-6)
