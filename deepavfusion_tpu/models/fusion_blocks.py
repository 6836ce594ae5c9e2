"""Audio-visual fusion blocks — the scientific core of the framework.

Three fusion architectures, functionally identical to the reference
(models/fusion_blocks.py), selected by ``fusion_arch``:

  * ``token``          — FusionBlock_LocalAVTokens (:120): fusion queries
    cross-attend to the concatenated (audio, image) token set, with a
    ``attn_ratio`` bottleneck on q/k/v.
  * ``dense_mmi``      — FusionBlock_DenseAVInteractions (:189): K/V are built
    from ALL nv×na concatenated AV token pairs.
  * ``factorized_mmi`` — FusionBlock_FactorizedAVInteractions (:266, default):
    dedicated aggregate tokens attend over each modality linearly, then the
    fusion tokens attend over the nv×na outer-product pairs of the aggregates
    (8×8 = 64 by default) — the repo's algorithmic answer to quadratic
    cross-modal cost (SURVEY.md §5.7).

Reference quirks reproduced bit-for-bit (they affect converted checkpoints):

  1. Residuals are added to the *normalized* fusion tokens — each wrapper
     reassigns ``xmm = norm1_mm(xmm)`` before the residual add
     (fusion_blocks.py:136-143, 205-212, 281-288).
  2. ``token`` arch wiring swap: the trunk calls blk_fusion(x_fusion,
     x_image, x_audio) (deepavfusion.py:106) into params named (xmm, xa, xv)
     (fusion_blocks.py:135) — so ``norm1_img`` normalizes AUDIO tokens,
     ``norm1_aud`` normalizes IMAGE tokens, and the cross-attention source is
     cat(audio, image) in that order.
  3. ``dense_mmi`` pair order: inner attention signature is (xmm, xa, xv)
     while the wrapper passes (xmm, xv, xa) (fusion_blocks.py:168 vs :206), so
     pairs are (audio_i ⊕ image_j), audio-major.
  4. Attention scale: LocalAVTokens scales by the *reduced* head dim
     (fusion_blocks.py:93-95); Dense and Factorized scale by the *unreduced*
     head dim (:157-159, :219-221) even though q/k are projected to
     ``dim*attn_ratio``.
  5. Factorized V projects to the full dim while Q/K are reduced (:228-230).

TPU-first: pair tensors for the factorized arch stay O(nv·na·2d) = 64×1536
(tiny); the Pallas kernel path fuses each softmax(QKᵀ)V. All LayerNorms use
eps=1e-5 (torch default — the trunk constructs these with plain nn.LayerNorm,
deepavfusion.py:50) in contrast to the ViT blocks' 1e-6.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..ops import attention as attn_ops
from .layers import CrossAttention, DropPath, Dtype, Mlp, layer_norm

FUSION_NORM_EPS = 1e-5  # plain torch.nn.LayerNorm default (deepavfusion.py:50)


def _pairs(x_major: jnp.ndarray, x_minor: jnp.ndarray) -> jnp.ndarray:
    """All-pairs concat: (B, n1, d) × (B, n2, d) → (B, n1*n2, 2d), n1-major."""
    b, n1, d = x_major.shape
    n2 = x_minor.shape[1]
    a = jnp.broadcast_to(x_major[:, :, None, :], (b, n1, n2, d))
    c = jnp.broadcast_to(x_minor[:, None, :, :], (b, n1, n2, d))
    return jnp.concatenate([a, c], axis=-1).reshape(b, n1 * n2, 2 * d)


class PairDense(nn.Module):
    """``nn.Dense(features)`` applied to the all-pairs concat — WITHOUT
    materializing the (B, n1·n2, 2d) pair tensor.

    Since pairs_ij = cat(x_major_i, x_minor_j), the projection factors
    exactly: W·pairs_ij = W[:d]ᵀ x_major_i + W[d:]ᵀ x_minor_j (+ bias).
    The parameter tree ("kernel" (2d, features), "bias") is IDENTICAL to
    nn.Dense over ``_pairs`` — converted checkpoints, init values (same
    param path → same RNG fold), and the reference-parity tests all see
    the same parameters; only the compute graph changes. Step-time
    attribution (NOTES.md r3) showed the fusion blocks at 33% of the
    pretrain step for ~2% of its FLOPs — this cuts the pair-projection
    matmuls by n1·n2/(n1+n2) (9.4x for the factorized 8×8 aggregates,
    130x for dense_mmi at full-eval 196×96 pairs) and removes the 2d-wide
    pair tensor from HBM entirely (dense_mmi full eval at B=64: 3.7 GB).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_major: jnp.ndarray, x_minor: jnp.ndarray) -> jnp.ndarray:
        b, n1, d = x_major.shape
        n2 = x_minor.shape[1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2 * d, self.features))
        x_major = x_major.astype(self.dtype)
        x_minor = x_minor.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        y1 = x_major @ kernel[:d]                      # (B, n1, f)
        y2 = x_minor @ kernel[d:]                      # (B, n2, f)
        y = y1[:, :, None, :] + y2[:, None, :, :]      # (B, n1, n2, f)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(self.dtype)
        return y.reshape(b, n1 * n2, self.features)


class LocalAVTokensAttention(nn.Module):
    """CrossAttention_LocalAVTokens (reference fusion_blocks.py:89-117):
    fusion queries → cat(src1, src2) keys/values, q/k/v bottlenecked to
    dim*dim_ratio, scale from the reduced head dim."""

    num_heads: int
    dim_ratio: float = 1.0
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xmm, src1, src2, deterministic=True, return_weights=False):
        d = xmm.shape[-1]
        inner = int(d * self.dim_ratio)
        x_src = jnp.concatenate([src1, src2], axis=1)
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(xmm)
        kv = nn.Dense(2 * inner, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(x_src)
        k, v = jnp.split(kv, 2, axis=-1)
        q = attn_ops.split_heads(q, self.num_heads)
        k = attn_ops.split_heads(k, self.num_heads)
        v = attn_ops.split_heads(v, self.num_heads)
        out = attn_ops.dot_product_attention(q, k, v, return_weights=return_weights)
        if return_weights:
            out, w = out
        out = attn_ops.merge_heads(out)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return (out, w) if return_weights else out


class DenseAVInteractionsAttention(nn.Module):
    """CrossAttention_DenseAVInteractions (reference fusion_blocks.py:154-186):
    K/V from all (major_i ⊕ minor_j) pairs, scale from the UNREDUCED head dim."""

    num_heads: int
    dim_ratio: float = 1.0
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xmm, x_major, x_minor, deterministic=True, return_weights=False):
        d = xmm.shape[-1]
        inner = int(d * self.dim_ratio)
        scale = (d // self.num_heads) ** -0.5  # quirk #4: full-dim head scale
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(xmm)
        kv = PairDense(2 * inner, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="kv")(x_major, x_minor)
        k, v = jnp.split(kv, 2, axis=-1)
        q = attn_ops.split_heads(q, self.num_heads)
        k = attn_ops.split_heads(k, self.num_heads)
        v = attn_ops.split_heads(v, self.num_heads)
        out = attn_ops.dot_product_attention(
            q, k, v, scale=scale, return_weights=return_weights
        )
        if return_weights:
            out, w = out
        out = attn_ops.merge_heads(out)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return (out, w) if return_weights else out


class FactorizedAVInteractionsAttention(nn.Module):
    """CrossAttention_FactorizedAVInteractions (reference fusion_blocks.py:216-263).

    Fusion tokens split (nmm, nv, na); nv aggregates cross-attend over image
    tokens, na over audio tokens; the nmm fusion tokens then attend over the
    nv×na aggregate pairs. Q/K reduced to dim*dim_ratio, V full dim,
    scale from the unreduced head dim.
    """

    num_heads: int
    fusion_tkns: tuple[int, int, int] = (16, 8, 8)
    dim_ratio: float = 1.0
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xmm, xv, xa, deterministic=True, return_weights=False):
        d = xmm.shape[-1]
        inner = int(d * self.dim_ratio)
        scale = (d // self.num_heads) ** -0.5
        nmm, nv, na = self.fusion_tkns

        xmm2 = xmm[:, :nmm]
        xmm_v = xmm[:, nmm : nmm + nv]
        xmm_a = xmm[:, nmm + nv :]

        xmm_v = CrossAttention(
            self.num_heads, self.qkv_bias, self.attn_drop, self.proj_drop,
            dtype=self.dtype, name="attn_v",
        )(xmm_v, xv, deterministic=deterministic)
        xmm_a = CrossAttention(
            self.num_heads, self.qkv_bias, self.attn_drop, self.proj_drop,
            dtype=self.dtype, name="attn_a",
        )(xmm_a, xa, deterministic=deterministic)

        # pairs are (xmm_v_i ⊕ xmm_a_j), v-major — projected WITHOUT
        # materializing the (B, nv*na, 2d) concat (PairDense)
        q = nn.Dense(inner, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(xmm2)
        k = PairDense(inner, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="k")(xmm_v, xmm_a)
        v = PairDense(d, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="v")(xmm_v, xmm_a)
        q = attn_ops.split_heads(q, self.num_heads)
        k = attn_ops.split_heads(k, self.num_heads)
        v = attn_ops.split_heads(v, self.num_heads)
        out = attn_ops.dot_product_attention(
            q, k, v, scale=scale, return_weights=return_weights
        )
        if return_weights:
            out, w = out
        out = attn_ops.merge_heads(out)
        out = nn.Dense(d, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        out = jnp.concatenate([out, xmm_v, xmm_a], axis=1)
        return (out, w) if return_weights else out


class FusionBlock(nn.Module):
    """Pre-norm fusion block wrapper (norm_mm/norm_aud/norm_img → arch
    attention → residual-on-normed → norm2 → MLP → residual).

    ``arch`` ∈ {token, dense_mmi, factorized_mmi}. Called exactly like the
    trunk does: __call__(x_fusion, x_image, x_audio)
    (reference deepavfusion.py:106) — the per-arch wiring swaps documented in
    the module docstring happen inside.
    """

    arch: str
    num_heads: int
    attn_ratio: float = 0.25
    mlp_ratio: float = 4.0
    fusion_tkns: tuple[int, int, int] = (16, 8, 8)
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_fusion: jnp.ndarray,
        x_image: jnp.ndarray,
        x_audio: jnp.ndarray,
        deterministic: bool = True,
        return_weights: bool = False,
    ):
        d = x_fusion.shape[-1]
        norm_mm = layer_norm(FUSION_NORM_EPS, self.dtype, "norm1_mm")
        norm_aud = layer_norm(FUSION_NORM_EPS, self.dtype, "norm1_aud")
        norm_img = layer_norm(FUSION_NORM_EPS, self.dtype, "norm1_img")

        xmm = norm_mm(x_fusion)
        if self.arch == "token":
            # quirk #2: swapped norms, src order (audio, image)
            src1 = norm_img(x_audio)
            src2 = norm_aud(x_image)
            attn = LocalAVTokensAttention(
                self.num_heads, self.attn_ratio, self.qkv_bias,
                self.attn_drop, self.drop, dtype=self.dtype, name="attn",
            )
            res = attn(xmm, src1, src2, deterministic=deterministic,
                       return_weights=return_weights)
        elif self.arch == "dense_mmi":
            # quirk #3: pairs are (audio_i ⊕ image_j), audio-major
            xv = norm_img(x_image)
            xa = norm_aud(x_audio)
            attn = DenseAVInteractionsAttention(
                self.num_heads, self.attn_ratio, self.qkv_bias,
                self.attn_drop, self.drop, dtype=self.dtype, name="attn",
            )
            res = attn(xmm, xa, xv, deterministic=deterministic,
                       return_weights=return_weights)
        elif self.arch == "factorized_mmi":
            xv = norm_img(x_image)
            xa = norm_aud(x_audio)
            attn = FactorizedAVInteractionsAttention(
                self.num_heads, self.fusion_tkns, self.attn_ratio, self.qkv_bias,
                self.attn_drop, self.drop, dtype=self.dtype, name="attn",
            )
            res = attn(xmm, xv, xa, deterministic=deterministic,
                       return_weights=return_weights)
        else:
            raise ValueError(f"unknown fusion arch: {self.arch}")

        if return_weights:
            res, weights = res
        # quirk #1: residual base is the NORMALIZED fusion tokens
        xmm = xmm + DropPath(self.drop_path)(res, deterministic=deterministic)
        if return_weights:
            return weights

        y = layer_norm(FUSION_NORM_EPS, self.dtype, "norm2")(xmm)
        y = Mlp(int(d * self.mlp_ratio), drop=self.drop, dtype=self.dtype, name="mlp")(
            y, deterministic=deterministic
        )
        xmm = xmm + DropPath(self.drop_path)(y, deterministic=deterministic)
        return xmm
