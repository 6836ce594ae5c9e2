"""Fused flash-attention Pallas kernels for TPU, with a custom VJP.

Covers every attention shape in the framework (SURVEY.md §5.7): encoder
self-attention with fusion-token prefix (N ≤ 324), MAE decoder self-attention
(N ≤ 228), fusion cross-attention, and factorized pair-attention. Sequence
lengths are small, so the design goal is not tiling a huge N but *fusing the
whole softmax(QKᵀ)V chain in VMEM* — no logits materialized in HBM.

v2 design (round-3; the v1 kernel lost its own A/B, VERDICT r2 weak #1):

  * NO host-side padding. v1 jnp.pad'ed the head dim up to 128 lanes in HBM
    (8x the bytes for the Dh=16 fusion heads) and sliced the result back —
    extra HBM round-trips on every call, and the pad/slice ops fence XLA's
    fusion around the custom call (the root cause of the 15x in-context
    regression, NOTES.md r2). v2 passes the natural (B, H, N, Dh) arrays
    straight through; Mosaic masks the non-tile-aligned tails in VMEM, so
    HBM traffic is the logical bytes.
  * Heads are packed per grid step: grid (B, H/HG) with an (HG, N, Dh)
    block, batched dot_generals over the head-group dim. v1 launched one
    grid step per (batch*head) — 768 tiny launches at B=64/H=12 whose fixed
    cost dominated every small shape (pair_attn 933 us vs 112 us XLA).
    HG is the largest head count whose working set fits a VMEM budget.
  * lse is carried as (B, H, Nq, 1) so the backward's broadcast against the
    (HG, Nq, Nk) logits is a free lane-broadcast (v1 stored a 128-lane
    replicated copy — more HBM traffic, and a relayout in bwd).

pallas_call does not support reverse-mode autodiff, so training goes through
an explicit custom_vjp (the standard flash-attention backward): the forward
kernel also emits the per-row logsumexp; the backward kernel recomputes the
probabilities from (q, k, lse) and produces dq/dk/dv in one fused pass.

v3 adds a KV-TILED variant (online softmax) for sequences whose full
(Nq, Nk) probability matrix no longer fits the VMEM budget — the video
models' joint space-time attention (video_vit.py joint_all: 16 frames →
8·14·14 = 1568 tokens; reference models/video_vits.py:49-60). Token rows
(q/k/v/o) are small even at thousands of tokens, so they stay resident in
VMEM; only the logits are computed in static KV chunks via an unrolled
chunk loop, with the classic (m, l, acc) running-max rescale in fwd and
per-chunk dq/dk/dv accumulation in bwd. The one-shot kernels are kept
verbatim for every shape they already won on the A/B (NOTES.md r3); the
tiled path engages only where the one-shot working set would blow VMEM.

v4 adds Q-TILING on top: a third grid dimension over Q-row blocks, so
sequences whose q/o/do/dq rows alone approach the VMEM budget (24-frame
joint space-time attention: 12·14·14 = 2352 tokens, reference
models/video_vits.py:135-138 — previously an XLA fallback) run the same
online-softmax loop per Q block. K/V rows stay whole in VMEM (cheap to
~16k tokens); in the backward the Q-block grid dim is INNERMOST and the
dk/dv block index maps ignore it, so Mosaic keeps the dk/dv accumulators
VMEM-resident across Q steps (the TPU grid is sequential) — zeroed at the
first Q step, written back once per (batch, head). With the three tiers
(one-shot / KV-tiled / Q+KV-tiled) every static shape up to ~16k tokens
maps to a fused kernel; selection is purely by working-set arithmetic.

Replaces the reference's reliance on cuDNN/ATen attention matmuls
(reference: models/fusion_blocks.py:18-59 q@kᵀ → softmax → @v chains).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-grid-step VMEM working-set budget. Physical VMEM is ~16 MB; Mosaic
# double-buffers the in/out blocks across grid steps, so stay well under.
_VMEM_BUDGET = 5 * 1024 * 1024
# Looser ceiling for the v3 KV-tiled BACKWARD's total working set (rows +
# min-chunk temps): its single-Q-step grid keeps block double-buffering
# small, and the 1568-token shape (~6.4 MB) measured faster on v3 than the
# general Q-tiled path would predict. Past this, the v4 Q+KV-tiled kernel
# takes over (2352 tokens: ~9.6 MB would risk the physical limit).
_VMEM_BUDGET_TILED_BWD = 8 * 1024 * 1024


def _head_group(h: int, per_head_bytes: int) -> int:
    """Largest divisor of h whose working set fits the VMEM budget."""
    hg = max(min(_VMEM_BUDGET // max(per_head_bytes, 1), h), 1)
    while h % hg:
        hg -= 1
    return hg


_BATCH_DNUMS = (((2,), (2,)), ((0,), (0,)))   # (HG,M,K)x(HG,N,K) -> (HG,M,N)
_PV_DNUMS = (((2,), (1,)), ((0,), (0,)))      # (HG,M,K)x(HG,K,N) -> (HG,M,N)


# --------------------------------------------------------------------------- #
# Kernels
# --------------------------------------------------------------------------- #
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    """One (batch, head-group) slice fully in VMEM.

    q (1, HG, Nq, Dh), k (1, HG, Nk, Dh), v (1, HG, Nk, Dhv).
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, _BATCH_DNUMS, preferred_element_type=jnp.float32
    ) * scale                                               # (HG, Nq, Nk)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, _PV_DNUMS, preferred_element_type=jnp.float32
    ) / denom
    o_ref[0] = out.astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(denom)                         # (HG, Nq, 1)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    """Fused dq/dk/dv for one (batch, head-group) slice, recomputing P."""
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                        # (HG, Nq, 1)
    do = do_ref[0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, _BATCH_DNUMS, preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(logits - lse)                               # (HG, Nq, Nk)

    # dv = Pᵀ dO  — (HG, Nk, Dhv)
    dv = jax.lax.dot_general(
        p, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # dP = dO Vᵀ ; D = rowsum(dO ∘ O) ; dS = P ∘ (dP − D)
    dp = jax.lax.dot_general(
        do, v, _BATCH_DNUMS, preferred_element_type=jnp.float32
    )
    dcap = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - dcap)
    dq = jax.lax.dot_general(
        ds, k, _PV_DNUMS, preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


# --------------------------------------------------------------------------- #
# KV-tiled kernels (v3) — online softmax over static KV chunks
# --------------------------------------------------------------------------- #
def _kv_chunks(nk: int, bk: int):
    """Static (start, size) chunk list; the tail chunk is simply smaller
    (every slice is trace-time static — no masking, works in interpret)."""
    return [(s, min(bk, nk - s)) for s in range(0, nk, bk)]


def _fwd_kernel_tiled(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                      bk: int):
    """Online-softmax forward: full token rows in VMEM, logits in KV chunks."""
    q = q_ref[0].astype(jnp.float32)                        # (HG, Nq, Dh)
    hg, nq, _ = q.shape
    dhv = v_ref.shape[-1]
    nk = k_ref.shape[2]

    m_i = jnp.full((hg, nq, 1), -jnp.inf, jnp.float32)
    l_i = jnp.zeros((hg, nq, 1), jnp.float32)
    acc = jnp.zeros((hg, nq, dhv), jnp.float32)
    for start, size in _kv_chunks(nk, bk):
        k = k_ref[0, :, start:start + size, :].astype(jnp.float32)
        v = v_ref[0, :, start:start + size, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, _BATCH_DNUMS, preferred_element_type=jnp.float32
        ) * scale                                           # (HG, Nq, size)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_i = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, _PV_DNUMS, preferred_element_type=jnp.float32
        )
        m_i = m_new
    o_ref[0] = (acc / l_i).astype(o_ref.dtype)
    lse_ref[0] = m_i + jnp.log(l_i)


def _bwd_kernel_tiled(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float, bk: int):
    """Fused dq/dk/dv with the probabilities recomputed per KV chunk."""
    q = q_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                        # (HG, Nq, 1)
    do = do_ref[0].astype(jnp.float32)
    hg, nq, dh = q.shape
    nk = k_ref.shape[2]

    dcap = jnp.sum(do * o, axis=-1, keepdims=True)          # (HG, Nq, 1)
    dq = jnp.zeros((hg, nq, dh), jnp.float32)
    for start, size in _kv_chunks(nk, bk):
        k = k_ref[0, :, start:start + size, :].astype(jnp.float32)
        v = v_ref[0, :, start:start + size, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, _BATCH_DNUMS, preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)                                # (HG, Nq, size)
        dv_ref[0, :, start:start + size, :] = jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v, _BATCH_DNUMS, preferred_element_type=jnp.float32
        )
        ds = p * (dp - dcap)
        dq = dq + jax.lax.dot_general(
            ds, k, _PV_DNUMS, preferred_element_type=jnp.float32
        ) * scale
        dk_ref[0, :, start:start + size, :] = (jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale).astype(dk_ref.dtype)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_kernel_qtiled(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                       scale: float, bk: int, nqb: int):
    """v4 backward: one Q-row block per grid step, dk/dv accumulated in f32
    VMEM scratch across the (innermost, sequential) Q grid dimension.

    The dk/dv output block index maps ignore the Q index, so Mosaic keeps
    one buffer resident and writes back once per (batch, head-group); the
    scratch accumulators likewise persist across Q steps. The Q block size
    always divides Nq (``_pick_bq``) — no padded garbage rows can leak into
    the dk/dv contractions (which contract OVER the q-row dim).
    """
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros(dk_acc.shape, dk_acc.dtype)
        dv_acc[...] = jnp.zeros(dv_acc.shape, dv_acc.dtype)

    q = q_ref[0].astype(jnp.float32)                        # (HG, bq, Dh)
    o = o_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                        # (HG, bq, 1)
    do = do_ref[0].astype(jnp.float32)
    hg, bq, dh = q.shape
    nk = k_ref.shape[2]

    dcap = jnp.sum(do * o, axis=-1, keepdims=True)          # (HG, bq, 1)
    dq = jnp.zeros((hg, bq, dh), jnp.float32)
    for start, size in _kv_chunks(nk, bk):
        k = k_ref[0, :, start:start + size, :].astype(jnp.float32)
        v = v_ref[0, :, start:start + size, :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, _BATCH_DNUMS, preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)                                # (HG, bq, size)
        dv_acc[:, start:start + size, :] += jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, v, _BATCH_DNUMS, preferred_element_type=jnp.float32
        )
        ds = p * (dp - dcap)
        dq = dq + jax.lax.dot_general(
            ds, k, _PV_DNUMS, preferred_element_type=jnp.float32
        ) * scale
        dk_acc[:, start:start + size, :] += jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(qi == nqb - 1)
    def _writeback():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _pick_bk(nq: int, budget: int, n_temps: int) -> int:
    """Largest 128-multiple chunk whose (HG=1) chunk temps fit the budget."""
    bk = budget // max(4 * nq * n_temps, 1)
    return max((bk // 128) * 128, 128)


def _pick_bq(nq: int, per_row_bytes: int, budget: int) -> int:
    """Largest divisor of nq whose Q-block rows fit the budget.

    A DIVISOR (not a 128-multiple with a masked tail) because the backward
    contracts over q rows — padded garbage rows would leak into dk/dv.
    """
    cap = max(budget // max(per_row_bytes, 1), 1)
    best = 1
    for d in range(1, int(nq ** 0.5) + 1):
        if nq % d == 0:
            for cand in (d, nq // d):
                if cand <= cap and cand > best:
                    best = cand
    return best


# --------------------------------------------------------------------------- #
# pallas_call plumbing — no host-side padding, natural (B, H, N, D) layout
# --------------------------------------------------------------------------- #
def _block(hg, *shape_nd):
    return pl.BlockSpec((1, hg) + tuple(shape_nd),
                        lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)


def _qblock(hg, bq, d):
    """Q-row block: the third grid dim walks Nq in bq-row steps."""
    return pl.BlockSpec((1, hg, bq, d),
                        lambda b, g, qi: (b, g, qi, 0),
                        memory_space=pltpu.VMEM)


def _kvblock(hg, nk, d):
    """Whole-K/V block, revisited across the (innermost) Q grid dim."""
    return pl.BlockSpec((1, hg, nk, d),
                        lambda b, g, qi: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(q, k, v, scale, interpret):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    dhv = v.shape[3]
    # f32 working set per head: q,k,v,o rows + logits/p (the big one) + lse
    per_head = 4 * (nq * dh + nk * dh + nk * dhv + nq * dhv + 2 * nq * nk + nq)
    if per_head <= _VMEM_BUDGET:
        kernel = functools.partial(_fwd_kernel, scale=scale)
        hg = _head_group(h, per_head)
        grid = (b, h // hg)
        in_specs = [_block(hg, nq, dh), _block(hg, nk, dh), _block(hg, nk, dhv)]
        out_specs = (_block(hg, nq, dhv), _block(hg, nq, 1))
    else:
        # Tiled (v3/v4). K/V rows stay whole per step; pick the largest
        # divisor-of-Nq Q block whose rows + softmax state + chunk temps fit.
        hg = 1
        kv_rows = 4 * (nk * dh + nk * dhv)
        per_q_row = 4 * (dh + 2 * dhv + 3) + 4 * 2 * 128  # rows + min temps
        bq = _pick_bq(nq, per_q_row, _VMEM_BUDGET - kv_rows)
        rows = kv_rows + 4 * (bq * dh + 2 * bq * dhv + 3 * bq)
        bk = _pick_bk(bq, _VMEM_BUDGET - rows, n_temps=2)
        kernel = functools.partial(_fwd_kernel_tiled, scale=scale, bk=bk)
        grid = (b, h, nq // bq)
        in_specs = [_qblock(1, bq, dh), _kvblock(1, nk, dh),
                    _kvblock(1, nk, dhv)]
        out_specs = (_qblock(1, bq, dhv), _qblock(1, bq, 1))

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, nq, dhv), q.dtype),
            jax.ShapeDtypeStruct((b, h, nq, 1), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nq * nk * (dh + dhv),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(q, k, v)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, scale, interpret):
    return _fwd_call(q, k, v, scale, interpret)[0]


def _flash_fwd(q, k, v, scale, interpret):
    out, lse = _fwd_call(q, k, v, scale, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, interpret, residuals, g):
    q, k, v, out, lse = residuals
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    dhv = v.shape[3]
    scratch_shapes = []
    per_head = 4 * (2 * (nq * dh + nk * dh) + 2 * (nk * dhv + nq * dhv)
                    + 3 * nq * nk + nq)
    # v3 whole-row working set: q/o/do/dq rows + k/v/dk/dv rows + lse/dcap,
    # PLUS the 4 chunk temps at the minimum 128-wide chunk — judged against
    # a looser ceiling than _VMEM_BUDGET (the v3 single-Q-step grid revisits
    # nothing, so less double-buffering headroom is needed; the measured-good
    # 1568-token shape sits at ~6.4 MB and stays v3, the 2352-token shape at
    # ~9.6 MB goes v4).
    v3_rows = 4 * (2 * (nq * dh + nk * dh) + 3 * nq * dhv + nk * dhv + 2 * nq)
    v3_total = v3_rows + 4 * 4 * nq * 128
    if per_head <= _VMEM_BUDGET:
        kernel = functools.partial(_bwd_kernel, scale=scale)
        hg = _head_group(h, per_head)
        grid = (b, h // hg)
        in_specs = [
            _block(hg, nq, dh), _block(hg, nk, dh), _block(hg, nk, dhv),
            _block(hg, nq, dhv), _block(hg, nq, 1), _block(hg, nq, dhv),
        ]
        out_specs = (_block(hg, nq, dh), _block(hg, nk, dh),
                     _block(hg, nk, dhv))
    elif v3_total <= _VMEM_BUDGET_TILED_BWD:
        # v3 KV-tiled: all q rows per step, chunk temps s/p/dp/ds.
        bk = _pick_bk(nq, max(_VMEM_BUDGET - v3_rows, 1), n_temps=4)
        kernel = functools.partial(_bwd_kernel_tiled, scale=scale, bk=bk)
        hg = 1
        grid = (b, h)
        in_specs = [
            _block(1, nq, dh), _block(1, nk, dh), _block(1, nk, dhv),
            _block(1, nq, dhv), _block(1, nq, 1), _block(1, nq, dhv),
        ]
        out_specs = (_block(1, nq, dh), _block(1, nk, dh), _block(1, nk, dhv))
    else:
        # v4 Q+KV-tiled: K/V rows + f32 dk/dv accumulators resident; one
        # Q-row block per (innermost) grid step.
        hg = 1
        fixed = 4 * 2 * (nk * dh + nk * dhv)      # k/v refs + dk/dv scratch
        per_q_row = 4 * (2 * dh + 3 * dhv + 2) + 4 * 4 * 128
        bq = _pick_bq(nq, per_q_row, _VMEM_BUDGET - fixed)
        rows = fixed + 4 * bq * (2 * dh + 3 * dhv + 2)
        bk = _pick_bk(bq, _VMEM_BUDGET - rows, n_temps=4)
        nqb = nq // bq
        kernel = functools.partial(_bwd_kernel_qtiled, scale=scale, bk=bk,
                                   nqb=nqb)
        grid = (b, h, nqb)
        in_specs = [
            _qblock(1, bq, dh), _kvblock(1, nk, dh), _kvblock(1, nk, dhv),
            _qblock(1, bq, dhv), _qblock(1, bq, 1), _qblock(1, bq, dhv),
        ]
        out_specs = (_qblock(1, bq, dh), _kvblock(1, nk, dh),
                     _kvblock(1, nk, dhv))
        scratch_shapes = [pltpu.VMEM((1, nk, dh), jnp.float32),
                          pltpu.VMEM((1, nk, dhv), jnp.float32)]

    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, nq, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, nk, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, nk, dhv), v.dtype),
        ),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * nq * nk * (dh + dhv),
            bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(q, k, v, out, lse, g)
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

    Small shapes run the one-shot kernels (whole probability matrix in VMEM);
    shapes past the VMEM budget (video joint space-time attention) switch to
    the KV-tiled online-softmax kernels automatically. Selection is purely by
    static shape, per-direction (a long sequence may tile the bwd only).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _flash(q, k, v, float(scale), bool(interpret))
