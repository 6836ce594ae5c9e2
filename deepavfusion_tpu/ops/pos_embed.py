"""Fixed sinusoidal position embeddings (1D/2D/3D).

Numerically matches the reference generators (reference: util/pos_embed.py:16-90)
so converted checkpoints reproduce features exactly. Computed host-side in
float64-free numpy (float32 throughout, as the reference does) and baked into
the parameter pytree as non-trainable constants.
"""
from __future__ import annotations

import numpy as np


def sincos_1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """1D sin-cos table for arbitrary positions.

    pos: any-shape float array of positions; returns (pos.size, embed_dim)
    with the first half sin and second half cos (reference: util/pos_embed.py:72-90).
    """
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float32)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000.0**omega
    out = np.einsum("m,d->md", pos.reshape(-1).astype(np.float32), omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def sincos_2d(embed_dim: int, grid_size) -> np.ndarray:
    """2D sin-cos table over an (H, W) grid → (H*W, embed_dim).

    Half the channels encode the row coordinate, half the column
    (reference: util/pos_embed.py:42-69). Note the reference builds the grid
    with ``np.meshgrid(grid_w, grid_h)`` (w first) and then indexes
    grid[0] as the "h" embedding — meaning the *w coordinate varies fastest*
    and the first half of channels actually encodes the column index. We
    reproduce that exact layout for checkpoint parity.
    """
    if isinstance(grid_size, int):
        grid_size = (grid_size, grid_size)
    gh, gw = grid_size
    grid_h = np.arange(gh, dtype=np.float32)
    grid_w = np.arange(gw, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first, matching reference
    grid = np.stack(grid, axis=0).reshape([2, 1, gh, gw])
    emb_h = sincos_1d(embed_dim // 2, grid[0])
    emb_w = sincos_1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


def sincos_3d(embed_dim: int, grid_size, thw_props=(2, 1, 1)) -> np.ndarray:
    """3D sin-cos table over a (T, H, W) grid → (T*H*W, embed_dim).

    Channel budget split proportionally to thw_props with the remainder going
    to the temporal axis (reference: util/pos_embed.py:16-40). The reference
    meshgrid is (t, w, h) order with ij-indexing and then emb order [t, h, w]
    built from grid[0], grid[1], grid[2] — i.e. the "h" embedding is actually
    driven by the w coordinate array and vice versa; reproduced verbatim.
    """
    h_dim = int(embed_dim * (thw_props[1] / float(sum(thw_props))))
    w_dim = int(embed_dim * (thw_props[2] / float(sum(thw_props))))
    t_dim = embed_dim - h_dim - w_dim

    gt, gh, gw = grid_size
    grid = np.meshgrid(
        np.arange(gt, dtype=np.float32),
        np.arange(gw, dtype=np.float32),
        np.arange(gh, dtype=np.float32),
        indexing="ij",
    )
    grid = np.stack(grid, axis=0).reshape([3, 1, gt, gh, gw])
    emb_t = sincos_1d(t_dim, grid[0])
    emb_h = sincos_1d(h_dim, grid[1])
    emb_w = sincos_1d(w_dim, grid[2])
    return np.concatenate([emb_t, emb_h, emb_w], axis=1).astype(np.float32)


def interpolate_2d(table: np.ndarray, old_grid, new_grid) -> np.ndarray:
    """Bicubic interpolation of a (H*W, D) pos-embed table to a new grid
    (reference util/pos_embed.py:98-119, used for hi-res transfer of learned
    tables in external checkpoints; our own tables are regenerated instead)."""
    import jax
    import jax.numpy as jnp

    from .. import runtime

    oh, ow = old_grid
    nh, nw = new_grid
    d = table.shape[-1]
    x = jnp.asarray(table.reshape(1, oh, ow, d), jnp.float32)
    with jax.default_device(runtime.host_cpu_device()):
        y = jax.image.resize(x, (1, nh, nw, d), method="bicubic")
    return np.asarray(y).reshape(nh * nw, d)
