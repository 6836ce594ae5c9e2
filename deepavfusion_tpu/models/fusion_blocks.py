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

Deliberate non-parity: ``attn_drop`` (dropout on the attention *weights*,
reference fusion_blocks.py:27/:52) is NOT supported — every shipped config
sets it to 0 and the fused attention paths have no weights tensor to drop.
The attention modules below raise at trace time if attn_drop != 0 rather
than silently ignoring it.

TPU-first: pair tensors for the factorized arch stay O(nv·na·2d) = 64×1536
(tiny); the Pallas kernel path fuses each softmax(QKᵀ)V. All LayerNorms use
eps=1e-5 (torch default — the trunk constructs these with plain nn.LayerNorm,
deepavfusion.py:50) in contrast to the ViT blocks' 1e-6.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import attention as attn_ops
from .layers import CrossAttention, DropPath, Dtype, Mlp, layer_norm

FUSION_NORM_EPS = 1e-5  # plain torch.nn.LayerNorm default (deepavfusion.py:50)


def _env_flag(name: str) -> bool:
    """Boolean env flag: unset / '' / '0' / 'false' / 'off' mean OFF.

    Read at TRACE time — toggling after a jitted function is cached has no
    effect on that cache entry.
    """
    return os.environ.get(name, "").strip().lower() not in ("", "0", "false", "off")


def _check_no_attn_drop(attn_drop: float) -> None:
    if attn_drop:
        raise NotImplementedError(
            "attn_drop (dropout on attention weights) is intentionally "
            "unsupported in the fusion attention paths; all reference "
            "configs set it to 0 (see module docstring)."
        )


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


class _DenseParams(nn.Module):
    """Declares ``nn.Dense``'s parameters — same names, shapes, and
    initializers, so the param path (and therefore init values, converted
    checkpoints, and the reference-parity tests) is indistinguishable from a
    real ``nn.Dense`` — without computing anything. Callers fetch the weights
    to run batched/merged matmuls (see ``FactorizedAVInteractionsAttention``:
    step-time attribution put the fusion blocks at 31% of the pretrain step
    for ~3% of its FLOPs, NOTES.md r3 — fewer, bigger ops is the fix)."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _XAttnParams(nn.Module):
    """Parameter shell matching ``layers.CrossAttention``'s tree
    (q / kv / proj Dense submodules) for batched two-branch evaluation."""

    dim: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        return (
            _DenseParams(self.dim, self.dim, self.qkv_bias, name="q")(),
            _DenseParams(2 * self.dim, self.dim, self.qkv_bias, name="kv")(),
            _DenseParams(self.dim, self.dim, True, name="proj")(),
        )


class _LNParams(nn.Module):
    """Parameter shell matching ``nn.LayerNorm``'s tree (scale ones, bias
    zeros — deterministic inits, so shell and real module are
    indistinguishable at any param path)."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _FactorizedParams(nn.Module):
    """Shell for FactorizedAVInteractionsAttention's full tree — used by the
    fused-block route to fetch every weight for the Pallas megakernel."""

    dim: int
    inner: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        pv = _XAttnParams(self.dim, self.qkv_bias, name="attn_v")()
        pa = _XAttnParams(self.dim, self.qkv_bias, name="attn_a")()
        q = _DenseParams(self.inner, self.dim, self.qkv_bias, name="q")()
        k = _DenseParams(self.inner, 2 * self.dim, self.qkv_bias, name="k")()
        v = _DenseParams(self.dim, 2 * self.dim, self.qkv_bias, name="v")()
        proj = _DenseParams(self.dim, self.dim, True, name="proj")()
        return pv, pa, q, k, v, proj


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
        _check_no_attn_drop(self.attn_drop)
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
        _check_no_attn_drop(self.attn_drop)
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

    def _aggregate_batched(self, xmm_v, xmm_a, xv, xa, deterministic):
        """Run attn_v and attn_a as ONE set of stacked-weight batched matmuls.

        The two aggregator cross-attentions are identical in shape on the
        query side (nv == na fusion aggregates, same dim, same heads) and
        differ only in weights and key/value source length — so the branch
        axis folds into the head axis and the whole aggregation runs as one
        q-matmul, one kv-matmul, one masked attention, and one proj-matmul
        instead of ~10 separate tiny ops. The shorter source is zero-padded
        to the longer and masked with -inf logits bias (exp(-inf) = 0, so
        results are bit-equal to the unbatched branches up to reduction
        order). Param tree is identical to two CrossAttention submodules
        (_XAttnParams), so converted checkpoints and parity tests see no
        difference. Motivation: the fusion track is dispatch-bound at 31%
        of the pretrain step for ~3% of its FLOPs (NOTES.md r3).
        """
        d = xmm_v.shape[-1]
        H = self.num_heads
        dh = d // H
        pv = _XAttnParams(d, self.qkv_bias, name="attn_v")()
        pa = _XAttnParams(d, self.qkv_bias, name="attn_a")()
        dt = self.dtype

        def stack_w(i):
            return jnp.stack([pv[i][0], pa[i][0]]).astype(dt)

        def stack_b(i):
            if pv[i][1] is None:
                return None
            return jnp.stack([pv[i][1], pa[i][1]]).astype(dt)[None, :, None, :]

        nq = xmm_v.shape[1]
        xq = jnp.stack([xmm_v, xmm_a], axis=1).astype(dt)  # (B, 2, nq, d)
        q = jnp.einsum("bsnd,sdf->bsnf", xq, stack_w(0))
        if (bq := stack_b(0)) is not None:
            q = q + bq

        nv_t, na_t = xv.shape[1], xa.shape[1]
        nk = max(nv_t, na_t)
        if nv_t == na_t:
            xsrc = jnp.stack([xv, xa], axis=1).astype(dt)
            bias = None
        else:
            pad = lambda t: jnp.pad(t, ((0, 0), (0, nk - t.shape[1]), (0, 0)))
            xsrc = jnp.stack([pad(xv), pad(xa)], axis=1).astype(dt)
            valid = jnp.stack(
                [jnp.arange(nk) < nv_t, jnp.arange(nk) < na_t]
            )  # (2, nk)
            bias = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)
            bias = jnp.broadcast_to(bias[:, None, None, :], (2, H, 1, nk))
            bias = bias.reshape(1, 2 * H, 1, nk)
        kv = jnp.einsum("bsnd,sdf->bsnf", xsrc, stack_w(1))
        if (bkv := stack_b(1)) is not None:
            kv = kv + bkv
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):  # (B, 2, n, d) → (B, 2H, n, dh): branch folds into heads
            b, s, n, _ = t.shape
            return (t.reshape(b, s, n, H, dh).transpose(0, 1, 3, 2, 4)
                    .reshape(b, s * H, n, dh))

        out = attn_ops.dot_product_attention(
            heads(q), heads(k), heads(v), bias=bias, inference=deterministic
        )
        b = out.shape[0]
        out = (out.reshape(b, 2, H, nq, dh).transpose(0, 1, 3, 2, 4)
               .reshape(b, 2, nq, d))
        out = jnp.einsum("bsnd,sdf->bsnf", out, stack_w(2)) + stack_b(2)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out[:, 0], out[:, 1]

    def _pair_kv_merged(self, xmm_v, xmm_a, inner):
        """PairDense for k (→inner) and v (→full dim) share their inputs, so
        their four side-matmuls merge into two by concatenating the kernels
        along the feature axis. Params identical to two PairDense modules."""
        d = xmm_v.shape[-1]
        wk, bk = _DenseParams(inner, 2 * d, self.qkv_bias, name="k")()
        wv, bv = _DenseParams(d, 2 * d, self.qkv_bias, name="v")()
        dt = self.dtype
        w = jnp.concatenate([wk, wv], axis=1).astype(dt)  # (2d, inner + d)
        y1 = xmm_v.astype(dt) @ w[:d]  # (B, nv, inner + d)
        y2 = xmm_a.astype(dt) @ w[d:]  # (B, na, inner + d)
        y = y1[:, :, None, :] + y2[:, None, :, :]
        if bk is not None:
            y = y + jnp.concatenate([bk, bv]).astype(dt)
        b, nv, na, _ = y.shape
        y = y.reshape(b, nv * na, inner + d)
        return y[..., :inner], y[..., inner:]

    @nn.compact
    def __call__(self, xmm, xv, xa, deterministic=True, return_weights=False):
        _check_no_attn_drop(self.attn_drop)
        d = xmm.shape[-1]
        inner = int(d * self.dim_ratio)
        scale = (d // self.num_heads) ** -0.5
        nmm, nv, na = self.fusion_tkns

        xmm2 = xmm[:, :nmm]
        xmm_v = xmm[:, nmm : nmm + nv]
        xmm_a = xmm[:, nmm + nv :]

        # Batched fast path (same param tree — see _aggregate_batched). The
        # unbatched branches remain for nv != na configs, for zero-length
        # sources (a fully-masked modality attends over an empty key set and
        # must yield exact zeros, not a NaN softmax over all-padded keys),
        # and as the DAVF_UNBATCHED_FUSION=1 A/B control (bit-comparable to
        # the batched path only when deterministic=True: with proj_drop > 0
        # the two paths draw different dropout RNG streams — one Dropout
        # over the stacked tensor vs two module-scoped Dropouts).
        batched = (nv == na and xv.shape[1] > 0 and xa.shape[1] > 0
                   and not _env_flag("DAVF_UNBATCHED_FUSION"))
        if batched:
            xmm_v, xmm_a = self._aggregate_batched(
                xmm_v, xmm_a, xv, xa, deterministic
            )
        else:
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
        if batched:
            k, v = self._pair_kv_merged(xmm_v, xmm_a, inner)
        else:
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


class _MlpParams(nn.Module):
    """Shell matching ``layers.Mlp``'s tree (fc1/fc2)."""

    hidden: int
    dim: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.hidden, self.dim, True, name="fc1")(),
                _DenseParams(self.dim, self.hidden, True, name="fc2")())


class FusionBlock(nn.Module):
    """Pre-norm fusion block wrapper (norm_mm/norm_aud/norm_img → arch
    attention → residual-on-normed → norm2 → MLP → residual).

    ``arch`` ∈ {token, dense_mmi, factorized_mmi}. Called exactly like the
    trunk does: __call__(x_fusion, x_image, x_audio)
    (reference deepavfusion.py:106) — the per-arch wiring swaps documented in
    the module docstring happen inside.

    On TPU the whole factorized block (norms + aggregate attentions + pair
    attention + projections + residuals + MLP) runs as ONE fused Pallas
    kernel per direction (ops/pallas/fusion_block.py) whenever no dropout is
    active — the unfused block is hundreds of sub-MXU-sized XLA ops and was
    measured at 31% of the pretrain step for a few percent of its FLOPs
    (NOTES.md r3). The fused route declares an identical parameter tree
    (shell modules), so checkpoints, init values, and the parity tests are
    unaffected. DAVF_NO_FUSED_BLOCK=1 disables the route (trace-time).
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
    # Trunks set this False inside nn.scan bodies: the scan transpose
    # accumulates the STACKED (12, ...) weight grads, and XLA fuses that
    # accumulation into the platform_dependent cond branch wrapping the
    # Pallas custom call, then stack-allocates it in scoped VMEM —
    # "Scoped allocation with size 33.41M and limit 16.00M exceeded"
    # (v5e, jit(step_fn)/transpose(jvp(AVMAE))/encoder/while/body/.../
    # blk_fusion._fused_factorized/cond/pallas_call). The unrolled trunk
    # (bench.py production config) keeps the fused route.
    allow_fused: bool = True

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
        if (self.arch == "factorized_mmi"
                and self._fused_route(x_fusion, x_image, x_audio,
                                      deterministic, return_weights)):
            return self._fused_factorized(x_fusion, x_image, x_audio)
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

    # ------------------------------------------------------------------ #
    # Fused whole-block Pallas route (factorized_mmi only)
    # ------------------------------------------------------------------ #
    def _fused_route(self, x_fusion, x_image, x_audio, deterministic,
                     return_weights) -> bool:
        """Trace-time routing decision for the fused megakernel.

        Requires: no attention-map request, qkv biases present (always true
        for the trunk, deepavfusion.py), no ACTIVE dropout (all shipped
        pretrain configs run drop=drop_path=0), non-empty sources (an empty
        key set must produce exact zeros via the unbatched branch), a TPU
        default backend, and a VMEM-feasible batch tile for BOTH kernel
        directions."""
        if not self.allow_fused:
            return False
        if _env_flag("DAVF_NO_FUSED_BLOCK") or _env_flag("DAVF_NO_PALLAS"):
            return False
        if return_weights or not self.qkv_bias:
            return False
        if not deterministic and (self.drop != 0.0 or self.drop_path != 0.0):
            return False
        if x_image.shape[1] == 0 or x_audio.shape[1] == 0:
            return False
        if sum(self.fusion_tkns) != x_fusion.shape[1]:
            return False
        # DAVF_FUSED_BLOCK=1 forces the route on any backend — safe, because
        # non-TPU *lowerings* take the platform_dependent XLA fallback; used
        # by the CPU tests to exercise the fused declaration path.
        if not (attn_ops._on_tpu() or _env_flag("DAVF_FUSED_BLOCK")):
            return False
        from ..ops.pallas import fusion_block as fused

        d = x_fusion.shape[-1]
        return fused.fits(
            x_fusion.shape[0], self.fusion_tkns, x_image.shape[1],
            x_audio.shape[1], d, int(d * self.attn_ratio),
            int(d * self.mlp_ratio), self.num_heads,
            jnp.dtype(self.dtype).itemsize,
        )

    def _fused_factorized(self, x_fusion, x_image, x_audio):
        """Declare the identical parameter tree via shells and run the whole
        block as one Pallas kernel per direction. The non-TPU lowering
        branch (multi-platform serving exports, init under a CPU default
        device) runs the same math as plain XLA ops (_forward_core)."""
        from ..ops.pallas import fusion_block as fused

        d = x_fusion.shape[-1]
        inner = int(d * self.attn_ratio)
        g_mm, b_mm = _LNParams(d, name="norm1_mm")()
        g_aud, b_aud = _LNParams(d, name="norm1_aud")()
        g_img, b_img = _LNParams(d, name="norm1_img")()
        pv, pa, q, k, v, proj = _FactorizedParams(
            d, inner, self.qkv_bias, name="attn")()
        g2, b2 = _LNParams(d, name="norm2")()
        fc1, fc2 = _MlpParams(int(d * self.mlp_ratio), d, name="mlp")()
        ptuple = (
            g_mm, b_mm, g_img, b_img, g_aud, b_aud,
            pv[0][0], pv[0][1], pv[1][0], pv[1][1], pv[2][0], pv[2][1],
            pa[0][0], pa[0][1], pa[1][0], pa[1][1], pa[2][0], pa[2][1],
            q[0], q[1], k[0], k[1], v[0], v[1], proj[0], proj[1],
            g2, b2, fc1[0], fc1[1], fc2[0], fc2[1],
        )
        scale = (d // self.num_heads) ** -0.5  # quirk #4: unreduced head dim
        dt = self.dtype
        xf = x_fusion.astype(dt)
        xi = x_image.astype(dt)
        xa = x_audio.astype(dt)

        def on_tpu(xf, xi, xa):
            return fused.fused_factorized_block(
                xf, xi, xa, ptuple, num_heads=self.num_heads,
                fusion_tkns=self.fusion_tkns, scale=scale,
                eps=FUSION_NORM_EPS)

        def fallback(xf, xi, xa):
            cfg = (self.num_heads, *self.fusion_tkns, float(scale),
                   float(FUSION_NORM_EPS))
            return fused._forward_core(
                xf, xi, xa, fused._prep(ptuple, xf.dtype), cfg)[0]

        return jax.lax.platform_dependent(xf, xi, xa, tpu=on_tpu,
                                          default=fallback)
