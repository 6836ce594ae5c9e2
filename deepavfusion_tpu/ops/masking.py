"""MAE random masking as static-shape, jit-compiled gather/scatter ops.

The keep-length is static (computed from the mask ratio at trace time), so the
argsort-of-uniform-noise shuffle compiles to fixed-shape sorts and gathers —
no dynamic shapes anywhere (reference semantics: models/avmae.py:120-142).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MaskInfo(NamedTuple):
    ids_keep: jnp.ndarray      # (B, len_keep) int32 — indices of visible tokens
    mask: jnp.ndarray          # (B, L) f32 — 1 where masked (removed), 0 where kept
    ids_restore: jnp.ndarray   # (B, L) int32 — inverse shuffle permutation


def random_masking(key: jax.Array, batch: int, length: int, mask_ratio: float) -> MaskInfo:
    """Per-sample random masking by argsort of uniform noise.

    Matches the reference algorithm exactly (models/avmae.py:120-142): sort
    noise ascending, keep the first ``int(L * (1 - mask_ratio))`` positions.
    """
    len_keep = int(length * (1.0 - mask_ratio))
    noise = jax.random.uniform(key, (batch, length))
    ids_shuffle = jnp.argsort(noise, axis=1).astype(jnp.int32)
    ids_restore = jnp.argsort(ids_shuffle, axis=1).astype(jnp.int32)
    ids_keep = ids_shuffle[:, :len_keep]

    mask = jnp.ones((batch, length), jnp.float32)
    mask = mask.at[:, :len_keep].set(0.0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return MaskInfo(ids_keep, mask, ids_restore)


def gather_tokens(x: jnp.ndarray, ids_keep: jnp.ndarray) -> jnp.ndarray:
    """Select visible tokens: (B, L, D) × (B, K) → (B, K, D)

    (reference: models/vits.py:99-100)."""
    return jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)


def unshuffle_with_mask_tokens(
    x: jnp.ndarray, mask_token: jnp.ndarray, ids_restore: jnp.ndarray
) -> jnp.ndarray:
    """Append mask tokens and invert the shuffle: (B, K, D) → (B, L, D)

    (reference: models/avmae.py:161-162). mask_token broadcasts from (D,) or (1, 1, D).
    """
    b, k, d = x.shape
    l = ids_restore.shape[1]
    filler = jnp.broadcast_to(jnp.reshape(mask_token, (1, 1, d)), (b, l - k, d)).astype(x.dtype)
    full = jnp.concatenate([x, filler], axis=1)
    return jnp.take_along_axis(full, ids_restore[:, :, None], axis=1)


def patchify(x: jnp.ndarray, patch_size) -> jnp.ndarray:
    """(B, H, W, C) → (B, gH*gW, pH*pW*C) patch flattening.

    Channel-last input (TPU-native layout); per-patch element order matches the
    reference einsum 'nchpwq->nhwpqc' → (pH, pW, C) fastest-varying C
    (reference: models/avmae.py:200-214), so reconstruction targets align with
    converted checkpoints.
    """
    b, h, w, c = x.shape
    ph, pw = patch_size
    gh, gw = h // ph, w // pw
    x = x.reshape(b, gh, ph, gw, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # (B, gH, gW, pH, pW, C)
    return x.reshape(b, gh * gw, ph * pw * c)


def unpatchify(x: jnp.ndarray, patch_size, grid_size, channels: int) -> jnp.ndarray:
    """Inverse of patchify: (B, gH*gW, pH*pW*C) → (B, H, W, C)."""
    b = x.shape[0]
    ph, pw = patch_size
    gh, gw = grid_size
    x = x.reshape(b, gh, gw, ph, pw, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * ph, gw * pw, channels)
