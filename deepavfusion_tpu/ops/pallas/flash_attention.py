"""Fused flash-attention Pallas kernel for TPU.

Covers every attention shape in the framework (SURVEY.md §5.7): encoder
self-attention with fusion-token prefix (N ≤ 324), MAE decoder self-attention
(N ≤ 228), fusion cross-attention, and factorized pair-attention. Sequence
lengths are small, so the design goal is not tiling a huge N but *fusing the
whole softmax(QKᵀ)V chain in VMEM* to avoid materializing logits in HBM and to
keep the MXU fed: one grid step per (batch × head-group), K/V resident, online
softmax over K blocks.

Replaces the reference's reliance on cuDNN/ATen attention matmuls
(reference: models/fusion_blocks.py:18-59 q@kᵀ → softmax → @v chains).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    """One (batch·head) slice: q (Nq, Dh), k/v (Nkp, Dh) fully in VMEM.

    Nkp may be padded; invalid keys are masked with -inf logits.
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                                   # (Nq, Nkp)

    nkp = k.shape[0]
    if nkp != kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) / denom
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
    scale: float | None = None,
):
    """softmax(q kᵀ · scale) v fused in VMEM.

    q: (B, H, Nq, Dh), k: (B, H, Nk, Dh), v: (B, H, Nk, Dhv) — Dhv may differ
    from Dh (the factorized fusion attention projects V to the full dim while
    Q/K are reduced; reference models/fusion_blocks.py:228-230). Default scale
    is Dh**-0.5. Returns (B, H, Nq, Dhv) in q.dtype.
    """
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    dhv = v.shape[3]
    if scale is None:
        scale = dh**-0.5

    # Pad sequence dims to sublane multiples; head dims to lane multiple.
    nq_p = _round_up(nq, 8)
    nk_p = _round_up(nk, 8)
    dh_p = _round_up(dh, 128)
    dhv_p = _round_up(dhv, 128)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, nq_p - nq), (0, dh_p - dh)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, nk_p - nk), (0, dh_p - dh)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, nk_p - nk), (0, dhv_p - dhv)))

    qp = qp.reshape(b * h, nq_p, dh_p)
    kp = kp.reshape(b * h, nk_p, dh_p)
    vp = vp.reshape(b * h, nk_p, dhv_p)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=nk),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, nq_p, dh_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, dh_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk_p, dhv_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nq_p, dhv_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq_p, dhv_p), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nq_p * nk_p * (dh_p + dhv_p),
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=b * h * nq_p * nk_p,
        ),
    )(qp, kp, vp)

    out = out.reshape(b, h, nq_p, dhv_p)[:, :, :nq, :dhv]
    return out
