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


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _use_pallas_default() -> bool:
    """Global Pallas override.

    On-hardware A/B (v5e, all 10 real shapes, fwd+bwd, 400-iteration
    single-dispatch chains — NOTES.md): XLA wins 17/20, so XLA is the
    training default. Set DAVF_PALLAS=1 to force the Pallas kernels
    everywhere, DAVF_NO_PALLAS=1 to force XLA everywhere (disables the
    large-N inference fast path below too).
    """
    import os

    if os.environ.get("DAVF_NO_PALLAS"):
        return False
    if not os.environ.get("DAVF_PALLAS"):
        return False
    return _on_tpu()


# The isolated-op A/B showed Pallas fwd wins at the two largest shapes
# (228 tokens: 875→620 µs; 324: 1259→921 µs), but IN-CONTEXT measurement
# (full ViT block fwd at 64×228×768 on the v5e) showed the Pallas custom
# call 15x SLOWER than the XLA path (38.9 vs 2.6 ms/block) — inserting the
# custom call breaks XLA's fusion across the qkv/mlp neighborhood. The
# auto route is therefore OPT-IN (DAVF_PALLAS_INFER=1) until the in-context
# regression is root-caused; isolated-op wins do not transfer.
_PALLAS_INFERENCE_MIN_N = 192


def _pallas_for_inference(q, k, bias) -> bool:
    import os

    if os.environ.get("DAVF_NO_PALLAS"):
        return False
    if not os.environ.get("DAVF_PALLAS_INFER"):
        return False
    return (bias is None and q.shape[2] >= _PALLAS_INFERENCE_MIN_N
            and k.shape[2] >= _PALLAS_INFERENCE_MIN_N and _on_tpu())


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
    inference: bool = False,
):
    """Dispatching attention.

    Policy (data-driven, NOTES.md A/B): XLA einsum everywhere by default —
    the isolated-op Pallas wins did NOT transfer in context (see
    _pallas_for_inference). DAVF_PALLAS=1 forces Pallas globally;
    DAVF_PALLAS_INFER=1 enables the large-N inference route. Falls back to
    XLA whenever attention weights are requested or a bias is supplied. The
    Pallas kernel carries a custom VJP, so a differentiated call stays
    correct either way.
    """
    if return_weights or bias is not None:
        return xla_attention(q, k, v, bias=bias, return_weights=return_weights, scale=scale)
    if use_pallas is None:
        use_pallas = _use_pallas_default() or (
            inference and _pallas_for_inference(q, k, bias))
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
