"""Fused flash-attention Pallas kernels for TPU, with a custom VJP.

Covers every attention shape in the framework (SURVEY.md §5.7): encoder
self-attention with fusion-token prefix (N ≤ 324), MAE decoder self-attention
(N ≤ 228), fusion cross-attention, and factorized pair-attention. Sequence
lengths are small, so the design goal is not tiling a huge N but *fusing the
whole softmax(QKᵀ)V chain in VMEM* — no logits materialized in HBM — with one
grid step per (batch × head).

pallas_call does not support reverse-mode autodiff, so training goes through
an explicit custom_vjp (the standard flash-attention backward): the forward
kernel also emits the per-row logsumexp; the backward kernel recomputes the
probabilities from (q, k, lse) and produces dq/dk/dv in one fused pass.

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


# --------------------------------------------------------------------------- #
# Kernels
# --------------------------------------------------------------------------- #
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, kv_len: int):
    """One (batch·head) slice fully in VMEM: q (Nq, Dh), k/v (Nkp, Dh[v])."""
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
    # lse broadcast across a full 128-lane tile (layout-friendly on TPU)
    lse = (m + jnp.log(denom)).astype(jnp.float32)          # (Nq, 1)
    lse_ref[0] = jnp.broadcast_to(lse, (lse.shape[0], 128))


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, kv_len: int):
    """Fused dq/dk/dv for one (batch·head) slice, recomputing P from lse."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]                                 # (Nq, 1)
    do = do_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    nkp = k.shape[0]
    if nkp != kv_len:
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < kv_len, logits, NEG_INF)
    p = jnp.exp(logits - lse)                                   # (Nq, Nkp)

    # dv = Pᵀ dO
    dv = jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP = dO Vᵀ ; D = rowsum(dO ∘ O) ; dS = P ∘ (dP − D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    dcap = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - dcap)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# --------------------------------------------------------------------------- #
# Host-side padding / pallas_call plumbing
# --------------------------------------------------------------------------- #
def _pad_inputs(q, k, v):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    dhv = v.shape[3]
    nq_p, nk_p = _round_up(nq, 8), _round_up(nk, 8)
    dh_p, dhv_p = _round_up(dh, 128), _round_up(dhv, 128)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, nq_p - nq), (0, dh_p - dh)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, nk_p - nk), (0, dh_p - dh)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, nk_p - nk), (0, dhv_p - dhv)))
    return (qp.reshape(b * h, nq_p, dh_p), kp.reshape(b * h, nk_p, dh_p),
            vp.reshape(b * h, nk_p, dhv_p))


def _block(shape_nd):
    return pl.BlockSpec((1,) + shape_nd, lambda i: (i,) + (0,) * len(shape_nd),
                        memory_space=pltpu.VMEM)


def _fwd_call(q, k, v, scale, interpret):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    dhv = v.shape[3]
    qp, kp, vp = _pad_inputs(q, k, v)
    bh, nq_p, dh_p = qp.shape
    nk_p, dhv_p = kp.shape[1], vp.shape[2]

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=nk),
        grid=(bh,),
        in_specs=[_block((nq_p, dh_p)), _block((nk_p, dh_p)), _block((nk_p, dhv_p))],
        out_specs=(_block((nq_p, dhv_p)), _block((nq_p, 128))),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_p, dhv_p), q.dtype),
            jax.ShapeDtypeStruct((bh, nq_p, 128), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * nq_p * nk_p * (dh_p + dhv_p),
            bytes_accessed=(qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * nq_p * nk_p,
        ),
    )(qp, kp, vp)
    out_full = out.reshape(b, h, nq_p, dhv_p)[:, :, :nq, :dhv]
    return out_full, (out, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale, interpret):
    return _fwd_call(q, k, v, scale, interpret)[0]


def _flash_fwd(q, k, v, scale, interpret):
    out_full, (out_p, lse) = _fwd_call(q, k, v, scale, interpret)
    return out_full, (q, k, v, out_p, lse)


def _flash_bwd(scale, interpret, residuals, g):
    q, k, v, out_p, lse = residuals
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    dhv = v.shape[3]
    qp, kp, vp = _pad_inputs(q, k, v)
    bh, nq_p, dh_p = qp.shape
    nk_p, dhv_p = kp.shape[1], vp.shape[2]
    gp = jnp.pad(
        g, ((0, 0), (0, 0), (0, nq_p - nq), (0, dhv_p - dhv))
    ).reshape(bh, nq_p, dhv_p)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, kv_len=nk),
        grid=(bh,),
        in_specs=[
            _block((nq_p, dh_p)), _block((nk_p, dh_p)), _block((nk_p, dhv_p)),
            _block((nq_p, dhv_p)), _block((nq_p, 128)), _block((nq_p, dhv_p)),
        ],
        out_specs=(_block((nq_p, dh_p)), _block((nk_p, dh_p)), _block((nk_p, dhv_p))),
        out_shape=(
            jax.ShapeDtypeStruct((bh, nq_p, dh_p), q.dtype),
            jax.ShapeDtypeStruct((bh, nk_p, dh_p), k.dtype),
            jax.ShapeDtypeStruct((bh, nk_p, dhv_p), v.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * bh * nq_p * nk_p * (dh_p + dhv_p),
            bytes_accessed=2 * (qp.size + kp.size + vp.size) * qp.dtype.itemsize,
            transcendentals=bh * nq_p * nk_p,
        ),
    )(qp, kp, vp, out_p, lse, gp)

    dq = dq.reshape(b, h, nq_p, dh_p)[:, :, :nq, :dh]
    dk = dk.reshape(b, h, nk_p, dh_p)[:, :, :nk, :dh]
    dv = dv.reshape(b, h, nk_p, dhv_p)[:, :, :nk, :dhv]
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    interpret: bool = False,
    scale: float | None = None,
):
    """softmax(q kᵀ · scale) v fused in VMEM, differentiable (custom VJP).

    q: (B, H, Nq, Dh), k: (B, H, Nk, Dh), v: (B, H, Nk, Dhv) — Dhv may differ
    from Dh (the factorized fusion attention projects V to the full dim while
    Q/K are reduced; reference models/fusion_blocks.py:228-230). Default scale
    is Dh**-0.5. Returns (B, H, Nq, Dhv) in q.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, float(scale), bool(interpret))
