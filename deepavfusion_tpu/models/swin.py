"""Shifted-window transformer block for the alternative MAE decoder
(reference models/swin.py, used when decoder_arch='swin', avmae.py:37-51).

Window attention with learned relative-position bias; when fusion tokens are
passed they are replicated into every window as extra attention tokens (bias
and shift-mask zero-padded for them), and their post-attention values are
averaged back across windows (reference :160-205). Works on grids divisible
by the window size (the reference's audio grid 8×12 with window 4; the image
14×14 grid cannot window-partition there either).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, Mlp, layer_norm
from ..ops import attention as attn_ops


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nWin, ws·ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B·nWin, ws·ws, C) → (B, H, W, C)."""
    nw = (h // ws) * (w // ws)
    b = x.shape[0] // nw
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws², ws²) index into the (2ws−1)² bias table (timm layout)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nWin, ws², ws²) 0/−100 mask for shifted windows (reference :136-158)."""
    img = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wsl, :] = cnt
            cnt += 1
    win = np.asarray(window_partition(jnp.asarray(img), ws))[:, :, 0]
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    """SwinTransformerBlock with optional per-window fusion tokens."""

    input_resolution: tuple[int, int]
    num_heads: int
    window_size: int = 4
    shift_size: int = 0
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_fusion: jnp.ndarray | None = None,
                 deterministic: bool = True):
        H, W = self.input_resolution
        ws = min(self.window_size, min(H, W))
        shift = 0 if min(H, W) <= self.window_size else self.shift_size
        b, l, c = x.shape
        area = ws * ws
        h = self.num_heads

        shortcut = x
        norm1 = layer_norm(self.norm_eps, self.dtype, "norm1")  # shared, like reference
        y = norm1(x).reshape(b, H, W, c)
        if x_fusion is not None:
            shortcut_fusion = x_fusion
            yf = norm1(x_fusion)

        if shift > 0:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
        ywin = window_partition(y, ws)                     # (B·nw, area, C)
        nw = ywin.shape[0] // b

        if x_fusion is not None:
            lf = yf.shape[1]
            yf_rep = jnp.repeat(yf, nw, axis=0)            # tokens per window
            ywin = jnp.concatenate([ywin, yf_rep], axis=1)
        n = ywin.shape[1]

        # window attention with relative position bias (+ shift mask)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), h),
        )
        idx = relative_position_index(ws).reshape(-1)
        rel = bias_table[idx].reshape(area, area, h).transpose(2, 0, 1)
        bias = jnp.zeros((h, n, n), jnp.float32).at[:, :area, :area].set(rel)
        bias = jnp.broadcast_to(bias[None], (b * nw, h, n, n))
        if shift > 0:
            m = jnp.asarray(shift_attn_mask(H, W, ws, shift))
            mfull = jnp.zeros((nw, n, n), jnp.float32).at[:, :area, :area].set(m)
            mfull = jnp.tile(mfull, (b, 1, 1))
            bias = bias + mfull[:, None]

        qkv = nn.Dense(3 * c, use_bias=True, dtype=self.dtype, name="attn_qkv")(ywin)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = attn_ops.split_heads(q, h)
        k = attn_ops.split_heads(k, h)
        v = attn_ops.split_heads(v, h)
        out = attn_ops.xla_attention(q, k, v, bias=bias)
        out = attn_ops.merge_heads(out)
        out = nn.Dense(c, dtype=self.dtype, name="attn_proj")(out)

        if x_fusion is not None:
            attn_win, attn_fusion = out[:, :area], out[:, area:]
            attn_fusion = attn_fusion.reshape(b, nw, lf, c).mean(axis=1)
        else:
            attn_win = out

        y = window_reverse(attn_win, ws, H, W)
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y.reshape(b, l, c)

        if x_fusion is not None:
            cat = jnp.concatenate([shortcut, shortcut_fusion], axis=1) + \
                jnp.concatenate([y, attn_fusion], axis=1)
            z = layer_norm(self.norm_eps, self.dtype, "norm2")(cat)
            z = Mlp(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(
                z, deterministic)
            cat = cat + z
            return cat[:, :l], cat[:, l:]
        x = shortcut + y
        z = layer_norm(self.norm_eps, self.dtype, "norm2")(x)
        z = Mlp(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp")(z, deterministic)
        return x + z
