"""Attention primitives with a Pallas flash-attention fast path.

One entry point — :func:`dot_product_attention` — used by every attention
module in the framework (ViT self-attention with fusion-token prefix, fusion
cross-attention, factorized pair-attention, Swin window attention). On TPU it
dispatches to the fused Pallas kernel in ``ops/pallas/flash_attention.py``;
everywhere else (CPU tests, tiny shapes, attention-map requests) it runs the
pure-XLA einsum path, which XLA fuses well on its own at these sequence
lengths (≤ 324 tokens for the reference configs, SURVEY.md §5.7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _use_pallas_default() -> bool:
    """Pallas dispatch policy.

    The fused kernels are correctness-tested (forward on real TPU; forward +
    custom-VJP backward in interpret mode), but the backward kernel has not
    yet been A/B-verified faster than XLA's fusion at these small sequence
    lengths (≤324 tokens) on real hardware. Until then the default path is
    XLA; set DAVF_PALLAS=1 to route all attention through the Pallas kernels.
    """
    import os

    if os.environ.get("DAVF_NO_PALLAS"):
        return False
    if not os.environ.get("DAVF_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    return_weights: bool = False,
    scale: float | None = None,
):
    """Reference-semantics softmax attention.

    q: (B, H, Nq, Dh), k/v: (B, H, Nk, Dh[v]); default scale = Dh_q**-0.5
    applied to logits exactly as the reference (models/fusion_blocks.py:23).
    ``scale`` overrides it — the reference's Dense/Factorized fusion attentions
    compute the scale from the *unreduced* head dim (models/fusion_blocks.py:
    157-159, 219-221) even though q/k are projected to ``dim*attn_ratio``.
    Softmax is computed in f32 regardless of input dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", weights.astype(v.dtype), v)
    if return_weights:
        return out, weights
    return out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    return_weights: bool = False,
    use_pallas: bool | None = None,
    scale: float | None = None,
):
    """Dispatching attention: Pallas flash kernel on TPU, XLA einsum elsewhere.

    Falls back to XLA whenever attention weights are requested (probing /
    visualization paths) or an additive bias is supplied.
    """
    if return_weights or bias is not None:
        return xla_attention(q, k, v, bias=bias, return_weights=return_weights, scale=scale)
    if use_pallas is None:
        use_pallas = _use_pallas_default()
    if use_pallas:
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    return xla_attention(q, k, v, scale=scale)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, N, D) → (B, H, N, D/H)."""
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, N, Dh) → (B, N, H*Dh)."""
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
