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

    On-hardware A/B of kernel v4 (v5e, all 12 shapes, fwd+bwd,
    400-iteration single-dispatch chains — NOTES.md r3 "Kernel v4"): the
    small (N <= 128) shapes sit on the ~100 us dispatch floor where XLA
    wins, so XLA remains the *global* default (pretrain encoders run at
    visible-token sizes 81/51). Pallas wins BOTH directions of every
    one-shot N >= 192 shape (dec_img 401/1138 vs 782/1472 us; joint_324
    510/1628 vs 1221/2338) and the tiled video FORWARD (2267 vs 2828 us at
    1568 tokens) but loses the tiled backward (7355 vs 5756) — hence the
    per-direction routes below. Set DAVF_PALLAS=1 to force the Pallas
    kernels everywhere, DAVF_NO_PALLAS=1 to force XLA everywhere (disables
    the N >= 192 routes too).
    """
    import os

    if os.environ.get("DAVF_NO_PALLAS"):
        return False
    if not os.environ.get("DAVF_PALLAS"):
        return False
    return _on_tpu()


# Large-N inference fast path — ON by default since kernel v2 (round 3).
#
# History: the v1 kernel won the two largest shapes in isolation but was 15x
# SLOWER in-context (38.9 vs 2.6 ms per 64x228x768 ViT block fwd) — its
# host-side jnp.pad of the head dim to 128 lanes (and the slice back) added
# HBM round-trips and fenced XLA's fusion around the custom call, so the
# route shipped opt-in. v2 removed the padding; v4 (native-dtype matmuls,
# lse-free one-shot VJP, (k,n) operand layouts) widened the win: in-context
# ViT block fwd ratio 0.942 / bwd 0.855 (Pallas faster both ways), isolated
# enc_img_full fwd 260 vs 621 us, and the tiled video forward 2267 vs
# 2828 us (NOTES.md r3 "Kernel v4").
# DAVF_NO_PALLAS=1 or DAVF_NO_PALLAS_INFER=1 disables the route.
_PALLAS_INFERENCE_MIN_N = 192
# VMEM feasibility for the route. The one-shot kernels hold one head's full
# (Nq, Nk) probability matrix (x3 in bwd) in VMEM — fine for the trunk's
# 51-324-token shapes (SURVEY §5.7). Longer sequences (video joint
# space-time attention: 1568-1600 tokens at 16 frames, 2352 at 24 frames)
# go through the tiled online-softmax kernels when their *padded* working
# set fits (ops/pallas/flash_attention.tiled_fits — the single source of
# truth, shared with the kernel's own plan selection). XLA fallback past
# that (~16k tokens at Dh=64, or shapes with no usable Q-block divisor).
_PALLAS_MAX_HEAD_BYTES = 10 * 1024 * 1024


def _kernel_fits(q, k) -> bool:
    nq, dh = q.shape[2], q.shape[3]
    nk = k.shape[2]
    one_shot_bwd = 4 * (3 * nq * nk + 4 * (nq + nk) * dh + nq)
    if one_shot_bwd <= _PALLAS_MAX_HEAD_BYTES:
        return True
    # dhv assumed == dh — true for every self-attention; the fusion shapes
    # with dhv > dh are all one-shot.
    from .pallas.flash_attention import tiled_fits

    import jax.numpy as jnp

    return tiled_fits(nq, nk, dh, dh, jnp.dtype(q.dtype).itemsize)


def _pallas_for_inference(q, k, bias) -> bool:
    import os

    if os.environ.get("DAVF_NO_PALLAS") or os.environ.get("DAVF_NO_PALLAS_INFER"):
        return False
    return (bias is None and q.shape[2] >= _PALLAS_INFERENCE_MIN_N
            and k.shape[2] >= _PALLAS_INFERENCE_MIN_N
            and _kernel_fits(q, k) and _on_tpu())


_PALLAS_TRAIN_MIN_N = 192


def _pallas_for_training(q, k, bias) -> bool:
    """Route TRAINING attention at N >= 192 to the Pallas kernel — ON by
    default since the end-to-end A/B (v5e, B=64 ViT-B pretrain step): the
    228-token MAE image decoder is the only pretrain shape that qualifies,
    and routing it measures 121.4 vs 125.0 ms/step (527 vs 512 clips/s/chip,
    MFU 0.392 vs 0.380 — NOTES.md r3). The v4 kernels win every one-shot
    fwd+bwd at N >= 192 (dec_img 401/1138 vs 782/1472 us). The TILED
    (video) shapes lose their isolated backward A/B (7.36 vs 5.76 ms at
    1568 tokens) yet win decisively IN CONTEXT: the full avsync train step
    (stock config: remat, batch 32) measures 954 ms with the tiled route
    vs 1165 ms on XLA — 18% faster, loss-parity-checked (bench_video.py).
    XLA materializes the 1568-squared logits in HBM per layer while the
    tiled kernels stay VMEM-resident; in the remat backward that HBM
    traffic dominates the kernels' own inefficiency. So ALL feasible
    N >= 192 shapes route for training. DAVF_PALLAS_TRAIN_MIN_N overrides
    the threshold; DAVF_NO_PALLAS_TRAIN=1 or DAVF_NO_PALLAS=1 disables."""
    import os

    if os.environ.get("DAVF_NO_PALLAS") or os.environ.get("DAVF_NO_PALLAS_TRAIN"):
        return False
    n = int(os.environ.get("DAVF_PALLAS_TRAIN_MIN_N", _PALLAS_TRAIN_MIN_N))
    return (bias is None and q.shape[2] >= n and k.shape[2] >= n
            and _kernel_fits(q, k) and _on_tpu())


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

    Policy (data-driven, NOTES.md r3 A/B): XLA einsum for the small
    (visible-token) training shapes where it wins every A/B row; the v4
    Pallas kernel at N >= 192 — for inference always, for training when
    the backward is one-shot (see _pallas_for_inference /
    _pallas_for_training). DAVF_PALLAS=1 forces Pallas
    globally; DAVF_NO_PALLAS=1 forces XLA everywhere. Falls back to XLA
    whenever attention weights are requested or a bias is supplied. The
    Pallas kernel carries a custom VJP, so a differentiated call stays
    correct either way.
    """
    if return_weights or bias is not None:
        return xla_attention(q, k, v, bias=bias, return_weights=return_weights, scale=scale)
    if use_pallas is None:
        use_pallas = _use_pallas_default() or (
            inference and _pallas_for_inference(q, k, bias)) or (
            not inference and _pallas_for_training(q, k, bias))
    if use_pallas:
        from .pallas.flash_attention import flash_attention

        # The backend check above is trace-time, but the LOWERING platform
        # can differ (e.g. model.init under jax.default_device(cpu) while
        # the default backend is TPU, or a multi-platform serving export).
        # platform_dependent resolves per lowering platform, so non-TPU
        # lowerings fall back to the XLA path instead of failing in
        # pallas_call's cpu lowering.
        return jax.lax.platform_dependent(
            q, k, v,
            tpu=lambda qq, kk, vv: flash_attention(qq, kk, vv, scale=scale),
            default=lambda qq, kk, vv: xla_attention(qq, kk, vv, scale=scale),
        )
    return xla_attention(q, k, v, scale=scale)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, N, D) → (B, H, N, D/H)."""
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, N, Dh) → (B, N, H*Dh)."""
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
