"""Shared transformer layers (flax.linen), bf16-compute / f32-param policy.

Functional re-implementations of the timm building blocks the reference uses
(timm PatchEmbed/Block/Mlp/DropPath via models/vits.py:5 and
models/fusion_blocks.py:3), with TPU-idiomatic choices: channel-last patch
conv, f32 softmax/LayerNorm, fused attention dispatch through
ops.attention.dot_product_attention (Pallas on TPU).

Parameter tree naming mirrors the torch module names (qkv/proj/fc1/fc2/
norm1/norm2) so the checkpoint converter is a mechanical key map.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import attention as attn_ops

Dtype = jnp.dtype


def _check_no_attn_drop(attn_drop: float) -> None:
    """``attn_drop`` (dropout on the attention weights, timm Attention) is
    intentionally unsupported — every shipped config sets it to 0 and the
    fused attention paths never materialize a weights tensor to drop. Fail
    loudly at trace time instead of silently ignoring a nonzero value."""
    if attn_drop:
        raise NotImplementedError(
            "attn_drop (dropout on attention weights) is not supported; "
            "all reference configs set it to 0."
        )


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        key = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(key, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    """timm Mlp: fc1 → GELU → drop → fc2 → drop."""

    hidden_dim: int
    out_dim: Optional[int] = None
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def layer_norm(eps: float, dtype: Dtype, name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=eps, dtype=dtype, name=name)


class SelfAttention(nn.Module):
    """Fused-QKV multi-head self-attention (timm Attention parity:
    reference models/fusion_blocks.py:6-30)."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        _check_no_attn_drop(self.attn_drop)
        d = x.shape[-1]
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = attn_ops.split_heads(q, self.num_heads)
        k = attn_ops.split_heads(k, self.num_heads)
        v = attn_ops.split_heads(v, self.num_heads)
        out = attn_ops.dot_product_attention(q, k, v, return_weights=return_weights,
                                             inference=deterministic)
        if return_weights:
            out, weights = out
        out = attn_ops.merge_heads(out)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if return_weights:
            return out, weights
        return out


class CrossAttention(nn.Module):
    """q from x1, fused kv from x2 (reference models/fusion_blocks.py:33-59)."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x1: jnp.ndarray,
        x2: jnp.ndarray,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        _check_no_attn_drop(self.attn_drop)
        d = x1.shape[-1]
        q = nn.Dense(d, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(x1)
        kv = nn.Dense(2 * d, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(x2)
        k, v = jnp.split(kv, 2, axis=-1)
        q = attn_ops.split_heads(q, self.num_heads)
        k = attn_ops.split_heads(k, self.num_heads)
        v = attn_ops.split_heads(v, self.num_heads)
        out = attn_ops.dot_product_attention(q, k, v, return_weights=return_weights,
                                             inference=deterministic)
        if return_weights:
            out, weights = out
        out = attn_ops.merge_heads(out)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if return_weights:
            return out, weights
        return out


class Block(nn.Module):
    """Pre-norm transformer block (timm Block parity: qkv_bias=True,
    norm → attn → +res, norm → mlp → +res; reference models/fusion_blocks.py:62-80)."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        d = x.shape[-1]
        y = layer_norm(self.norm_eps, self.dtype, "norm1")(x)
        y = SelfAttention(
            self.num_heads, self.qkv_bias, self.attn_drop, self.drop,
            dtype=self.dtype, name="attn",
        )(y, deterministic=deterministic)
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        y = layer_norm(self.norm_eps, self.dtype, "norm2")(x)
        y = Mlp(int(d * self.mlp_ratio), drop=self.drop, dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic
        )
        x = x + DropPath(self.drop_path)(y, deterministic=deterministic)
        return x


class PatchEmbed(nn.Module):
    """Conv patch embedding on channel-last input: (B, H, W, C) → (B, gh*gw, D).

    Token order is row-major over (h, w), identical to timm's NCHW
    flatten(2).transpose (reference: models/vits.py:27 via timm PatchEmbed).
    """

    patch_size: tuple[int, int]
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.embed_dim,
            kernel_size=self.patch_size,
            strides=self.patch_size,
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)
        b, gh, gw, d = x.shape
        return x.reshape(b, gh * gw, d)
