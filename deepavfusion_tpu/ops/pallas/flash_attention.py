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
  * lse is carried as a rank-3 (B, H, Nq) row (see the v3 notes below —
    a (B, H, Nq, 1) column would be lane-padded 128x in HBM by the TPU
    (8,128) tiling; v1 stored exactly such a replicated copy).

pallas_call does not support reverse-mode autodiff, so training goes through
an explicit custom_vjp (the standard flash-attention backward): the forward
kernel also emits the per-row logsumexp; the backward kernel recomputes the
probabilities from (q, k, lse) and produces dq/dk/dv in one fused pass.

v3 adds a TILED variant (online softmax) for sequences whose full
(Nq, Nk) probability matrix no longer fits the VMEM budget — the video
models' joint space-time attention (video_vit.py joint_all: 16 frames →
8·14·14 = 1568 tokens, 1600 with the fusion-token prefix; reference
models/video_vits.py:49-60). The grid gains an (innermost, sequential)
third dimension over Q-row blocks; K/V rows stay whole in VMEM and are
revisited across Q steps (constant index map — no reload), logits are
computed in KV chunks via a lax.fori_loop with the classic (m, l, acc)
running-max rescale in fwd (fori_loop, not an unrolled Python loop: Mosaic
gives unrolled iterations overlapping stack liveness — the unrolled
12-chunk forward at 1568 tokens allocated 18.7 MB of stack against a
9.4 MB single-chunk working set and blew the scoped-VMEM cap on hardware).
The backward runs the same loop per Q block with dq accumulated in
registers and dk/dv accumulated in f32 VMEM scratch across Q steps (zeroed
at the first Q step, written back once per (batch, head) — legal because
the TPU grid is sequential).

Plan selection is exact working-set arithmetic under the TPU tiling rules
(``_vbytes``: lanes pad to 128, so a Dh=64 buffer costs 2x its logical
bytes and an (N, 1) stats column costs 128x — the r3 lesson: unpadded
arithmetic OK'd a 1600-token plan whose true footprint was 19.4 MB against
the 16 MB scoped-VMEM limit). The largest divisor-of-Nq Q block and the
largest KV chunk whose *padded* total fits ``_TILED_BUDGET`` win; the
one-shot kernels are kept verbatim for every shape they already won on the
A/B (NOTES.md r3).

The per-row logsumexp is carried as (B, H, 1, Nq) — N in the LANE dim with
a singleton sublane: the natural (B, H, Nq, 1) column would be lane-padded
128x by the TPU (8,128) tiling (314 MB of HBM, and two DMA passes of it,
for the batch-32 video shape; 20 MB as a lane row). The lane layout also
makes lane-position bq blocks legal whenever bq is a 128-multiple, which
frees the Q-block size from the divisor-of-Nq constraint: blocks are
128-multiples with a masked ragged tail (the backward zeroes tail rows of
p/ds/q/do before the dk/dv contractions, which sum over Q rows — forward
rows are independent, so only the automatic masked write is needed there).

Replaces the reference's reliance on cuDNN/ATen attention matmuls
(reference: models/fusion_blocks.py:18-59 q@kᵀ → softmax → @v chains).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-grid-step working-set budget for the ONE-SHOT kernels' head-group
# packing, in *unpadded* bytes (native dtype for in/out rows and the P/dS
# casts, f32 for the softmax temps). Mosaic double-buffers the in/out
# blocks across grid steps, so stay well under the scoped-VMEM cap.
# (Deliberately kept as unpadded arithmetic — the head groups it picks are
# A/B-measured-good; see _vbytes for the padded math the tiled tier uses.)
_VMEM_BUDGET = 5 * 1024 * 1024
# Ceiling for the tiled tier's *padded* working-set estimate (_vbytes
# terms, incl. double-buffered in/out blocks and every f32 temp).
# RETUNED in round 5 from the on-hardware plan sweep (bench_tiled_sweep,
# v5e, video_joint_1568 B=8): the old 10 MiB budget forced (bq=640,
# bk=128)-class plans that measured bwd 7715 us (LOSING to XLA's 5768 —
# the r3/r4 "tiled backward loses its isolated A/B" result was a PLANNER
# artifact, not a kernel limit); whole-row plans demolish both:
#
#   plan (bq, bk, hg)   fwd us   bwd us     (XLA: 2834 / 5768)
#   640/128 (old 10MiB) 2670     7715
#   1568,512            1333     3417   <- budget 30 MiB picks this
#   1024,512            1710     4408
#   512,512             1657     4698
#
# 30 MiB picks the whole-row bq with bk=512 at 1568-1600 tokens and
# (2352, 512)fwd/(2352, 256)bwd at 24 frames; estimates stay under half
# the 64 MiB scoped cap (Mosaic's stack allocator historically lands at
# ~2/3 of this estimator — the r4 fused-block calibration).
_TILED_BUDGET = 30 * 1024 * 1024
# Mosaic scoped-VMEM cap for the TILED calls (default 16 MiB; v5e physical
# VMEM is 128 MiB). 64 MiB gives the stack allocator ~6x headroom over the
# planner's budget while leaving half the physical VMEM for Mosaic's block
# double-buffering. The one-shot kernels keep the default cap they were
# A/B-validated under.
_TILED_VMEM_LIMIT = 64 * 1024 * 1024
# KV chunk widths the planner tries, largest first (multiples of the 128
# lane tile; wider chunks mean fewer, larger MXU ops).
_BK_CANDIDATES = (512, 256, 128)

# v4 (round-3 MFU push): the kernels no longer upcast q/k/v to f32 before
# the matmuls. The MXU multiplies bf16 natively with f32 accumulation
# (preferred_element_type) — upcasting first forced multi-pass f32-input
# matmuls, several times slower per MACC, which is why the A/B-measured
# decoder shapes ran at ~10 TF/s against a ~49 TF/s k=32-depth bound.
# The probability matrix (and dS in the backward) are computed in f32 for
# softmax stability, then cast back to the INPUT dtype for their second-
# stage matmuls — exactly the xla_attention semantics
# (``weights.astype(v.dtype)`` before the PV einsum), so f32-input tests
# keep full precision while bf16 production traffic stays on the fast MXU
# path end-to-end. Softmax runs in base 2 (exp2 with log2(e) folded into
# the logit scale — one fewer VPU multiply per logit element; the stored
# logsumexp is base-2, consumed only by our own backward).
_LOG2E = 1.4426950408889634

# v4 lse elision: on-hardware attribution of the dec_img one-shot forward
# (B64 H16 N228 Dh32, chained timing) puts QK^T at ~400 us, softmax+PV at
# ~35 us — and the logsumexp emission at ~200 us (the (HG, Nq, 1) →
# (HG, 1, Nq) sublane→lane transpose inside the kernel, plus the extra
# output). The one-shot kernels hold the whole row in VMEM, so the
# backward can recompute the row max/denominator with two cheap lane
# reductions instead of consuming an lse residual. Shapes where BOTH
# directions fit the one-shot budget therefore run an lse-free custom VJP
# (_flash_nolse); everything else (the tiled video shapes, and mixed
# one-shot-fwd/tiled-bwd sizes) keeps the lse-carrying path unchanged.


def _vbytes(rows: int, cols: int, itemsize: int = 4) -> int:
    """VMEM bytes of a (rows, cols) buffer under TPU tiling: the lane
    (minor) dim pads to 128, the sublane dim to 8 (f32) / 16 (bf16)."""
    lanes = -(-cols // 128) * 128
    sub = 8 if itemsize >= 4 else 16
    return (-(-rows // sub) * sub) * lanes * itemsize


def _bq_candidates(nq: int):
    """Q-block sizes, largest first: the whole-Nq block (always a legal
    Mosaic block — equal to the array dim — and needs no tail masking),
    then descending 128-multiples (legal in the lane-position lse block;
    ragged tails are masked)."""
    out = [nq]
    out.extend(k * 128 for k in range(nq // 128, 0, -1) if k * 128 != nq)
    return out


def _plan_fwd_tiled(nq, nk, dh, dhv, itemsize, budget=_TILED_BUDGET):
    """(bq, bk) for the tiled forward, or None if nothing fits ``budget``.

    Sums every VMEM buffer of one grid step in padded (_vbytes) terms:
    double-buffered in/out blocks, the f32 casts, the (bq, 1) softmax
    stats (128-lane padded!), and the (bq, bk) chunk temps.
    """
    item = min(itemsize, 4)
    kv = 2 * (_vbytes(nk, dh, item) + _vbytes(nk, dhv, item))
    for bq in _bq_candidates(nq):
        fixed = (kv
                 + 2 * _vbytes(bq, dh, item)       # q in (double-buffered)
                 + 2 * _vbytes(bq, dhv, item)      # o out
                 + 2 * _vbytes(1, bq, 4)           # lse out (lane row)
                 + _vbytes(bq, dh, 4)              # q f32 cast
                 + _vbytes(bq, dhv, 4)             # acc
                 + 4 * _vbytes(bq, 1, 4))          # m_i/l_i/m_new/alpha
        for bk in _BK_CANDIDATES:
            total = (fixed + _vbytes(bk, dh, 4) + _vbytes(bk, dhv, 4)
                     + 2 * _vbytes(bq, bk, 4))     # s, p
            if total <= budget:
                return bq, bk
    return None


def _plan_bwd_tiled(nq, nk, dh, dhv, itemsize, budget=_TILED_BUDGET):
    """(bq, bk) for the Q-tiled backward, or None if nothing fits."""
    item = min(itemsize, 4)
    fixed0 = (2 * (_vbytes(nk, dh, item) + _vbytes(nk, dhv, item))   # k/vt in
              + 2 * _vbytes(dh, nk, item)                            # kt in
              + _vbytes(nk, dh, 4) + _vbytes(nk, dhv, 4)             # scratch
              + 2 * (_vbytes(nk, dh, item) + _vbytes(nk, dhv, item)))  # dk/dv
    for bq in _bq_candidates(nq):
        fixed = (fixed0
                 + 2 * _vbytes(bq, dh, item)                       # dq out
                 + 2 * (_vbytes(bq, dh, item) + 2 * _vbytes(bq, dhv, item))
                 + 2 * _vbytes(1, bq, 4)                           # lse in
                 + _vbytes(bq, dh, 4) + 2 * _vbytes(bq, dhv, 4)    # f32 casts
                 + _vbytes(bq, 1, 4)                               # dcap
                 + _vbytes(bq, dh, 4))                             # dq acc
        for bk in _BK_CANDIDATES:
            # s,p,dp,ds chunk temps + one s-sized term for the tail mask
            total = (fixed + _vbytes(bk, dh, 4) + _vbytes(bk, dhv, 4)
                     + 5 * _vbytes(bq, bk, 4))
            if total <= budget:
                return bq, bk
    return None


def _plan_override(which: str):
    """Trace-time (bq, bk) override of the tiled planner — a calibration
    hook for bench_attention sweeps (``DAVF_TILED_PLAN_FWD/_BWD="bq,bk"``).
    Like every DAVF_ knob it is read at trace time: already-compiled
    programs ignore later changes."""
    s = os.environ.get(f"DAVF_TILED_PLAN_{which}")
    if not s:
        return None
    bq, bk = (int(x) for x in s.split(","))
    return bq, bk


def _tiled_hg(h: int) -> int:
    """Head-group size for the TILED kernels. The tiled kernel bodies are
    written generically over a leading head-group dim (batched
    dot_generals, exactly like the one-shot kernels); grouping amortizes
    Mosaic's per-op issue overhead at the cost of hg× the resident K/V
    and chunk temps. Default 1 = the r3/r4 measured configuration;
    DAVF_TILED_HG is a trace-time sweep hook like DAVF_TILED_PLAN_*."""
    hg = max(1, min(int(os.environ.get("DAVF_TILED_HG", "1")), h))
    while h % hg:
        hg -= 1
    return hg


def _min_plan(nq: int):
    """Best-effort fallback when no plan fits the budget: the smallest
    usable Q block. Only reachable by direct flash_attention() calls on
    shapes the dispatch layer (ops/attention.tiled_fits) already refuses
    to route — keeps interpret-mode tests runnable on any shape."""
    return (128, 128) if nq > 128 else (nq, 128)


def tiled_fits(nq: int, nk: int, dh: int, dhv: int, itemsize: int) -> bool:
    """True iff BOTH tiled directions have an in-budget plan — the single
    source of truth for ops/attention's routing feasibility gate."""
    return (_plan_fwd_tiled(nq, nk, dh, dhv, itemsize) is not None
            and _plan_bwd_tiled(nq, nk, dh, dhv, itemsize) is not None)


def one_shot_bwd_fits(nq: int, nk: int, dh: int, dhv: int, itemsize: int) -> bool:
    """True iff the BACKWARD runs one-shot (whole row in VMEM).

    Informational (kernel-tier boundary), NOT a routing gate. History: the
    Q-tiled backward appeared to lose its isolated A/B in r3/r4 (7.36 vs
    5.76 ms XLA at 1568 tokens) — the r5 plan sweep showed that was a
    PLANNER artifact (the 10 MiB budget); with whole-row plans the tiled
    kernels win BOTH directions isolated too (bwd 3.42 vs 5.77 ms; see
    _TILED_BUDGET note), on top of the 18% in-context train-step win
    (bench_video.py)."""
    return (_per_head_bwd(nq, nk, dh, dhv, itemsize, lse=True) <= _VMEM_BUDGET
            or _per_head_bwd(nq, nk, dh, dhv, itemsize, lse=False)
            <= _VMEM_BUDGET)


def _head_group(h: int, per_head_bytes: int) -> int:
    """Largest divisor of h whose working set fits the VMEM budget."""
    hg = max(min(_VMEM_BUDGET // max(per_head_bytes, 1), h), 1)
    while h % hg:
        hg -= 1
    return hg


_BATCH_DNUMS = (((2,), (2,)), ((0,), (0,)))   # (HG,M,K)x(HG,N,K) -> (HG,M,N)
_PV_DNUMS = (((2,), (1,)), ((0,), (0,)))      # (HG,M,K)x(HG,K,N) -> (HG,M,N)
_MKN_DNUMS = _PV_DNUMS                        # alias: plain (m,k)x(k,n)


# --------------------------------------------------------------------------- #
# Kernels
# --------------------------------------------------------------------------- #
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    """One (batch, head-group) slice fully in VMEM.

    q (1, HG, Nq, Dh), k (1, HG, Nk, Dh), v (1, HG, Nk, Dhv).
    Matmul inputs stay in their native dtype (bf16 → native MXU passes);
    softmax is f32 base-2; lse is stored base-2 (see _LOG2E note above).
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s2 = jax.lax.dot_general(
        q, k, _BATCH_DNUMS, preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)                                    # (HG, Nq, Nk)
    m2 = jnp.max(s2, axis=-1, keepdims=True)
    p = jnp.exp2(s2 - m2)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, _PV_DNUMS, preferred_element_type=jnp.float32
    ) * (1.0 / denom)
    o_ref[0] = out.astype(o_ref.dtype)
    lse_ref[0] = jnp.swapaxes(m2 + jnp.log2(denom), -1, -2)  # (HG, 1, Nq)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    """Fused dq/dk/dv for one (batch, head-group) slice, recomputing P.

    P and dS are computed in f32, then cast to the input dtype for their
    matmuls (native-dtype MXU passes; see the _LOG2E/v4 note above). lse
    arrives base-2.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    o = o_ref[0]
    lse2 = jnp.swapaxes(lse_ref[0], -1, -2)                 # (HG, Nq, 1)
    do = do_ref[0]

    s2 = jax.lax.dot_general(
        q, k, _BATCH_DNUMS, preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    p = jnp.exp2(s2 - lse2)                                 # (HG, Nq, Nk) f32
    pc = p.astype(v.dtype)

    # dv = Pᵀ dO  — (HG, Nk, Dhv)
    dv = jax.lax.dot_general(
        pc, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # dP = dO Vᵀ ; D = rowsum(dO ∘ O) ; dS = P ∘ (dP − D)
    dp = jax.lax.dot_general(
        do, v, _BATCH_DNUMS, preferred_element_type=jnp.float32
    )
    dcap = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                   axis=-1, keepdims=True)
    ds = (p * (dp - dcap)).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, _PV_DNUMS, preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale

    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _per_head_fwd(nq, nk, dh, dhv, item, lse):
    """Unpadded one-shot fwd working set per head (see _VMEM_BUDGET note)."""
    cast = item if item < 4 else 0
    return (item * (nq * dh + nk * dh + nk * dhv + nq * dhv)
            + (8 + cast) * nq * nk + (4 * nq if lse else 0))


def _per_head_bwd(nq, nk, dh, dhv, item, lse):
    """Unpadded one-shot bwd working set per head. The lse-free variant
    reads K in both layouts (one extra nk*dh buffer; vt replaces v)."""
    cast = item if item < 4 else 0
    return (2 * item * (nq * dh + nk * dh + nk * dhv + nq * dhv)
            + (0 if lse else item * nk * dh)
            + (16 + 2 * cast) * nq * nk + (8 if lse else 4) * nq)


def _one_shot_nolse(nq, nk, dh, dhv, item):
    """True iff BOTH directions fit the one-shot budget → the lse-free
    custom VJP applies (the backward recomputes the softmax stats)."""
    return (_per_head_fwd(nq, nk, dh, dhv, item, lse=False) <= _VMEM_BUDGET
            and _per_head_bwd(nq, nk, dh, dhv, item, lse=False) <= _VMEM_BUDGET)


def _fwd_kernel_nolse(q_ref, kt_ref, v_ref, o_ref, *, scale: float):
    """One-shot forward without the logsumexp output — the fast path for
    every trunk shape (both directions one-shot; see the lse-elision note).

    K arrives TRANSPOSED — (HG, Dh, Nk), the (k, n) layout the MXU wants
    for the rhs. With the natural (Nk, Dh) layout Mosaic contracts lane
    against lane and pays an internal transpose: A/B-measured 430 vs
    332 us for the bare dec_img QK^T (B64 H16 N228 Dh32, incl. the S
    write-back; q-transposed variants measured worse, so q stays (m, k)).
    The transpose itself is done by XLA outside the kernel, where it fuses
    with the surrounding layout ops.
    """
    q = q_ref[0]
    kt = kt_ref[0]
    v = v_ref[0]
    s2 = jax.lax.dot_general(
        q, kt, _MKN_DNUMS, preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)                                    # (HG, Nq, Nk)
    m2 = jnp.max(s2, axis=-1, keepdims=True)
    p = jnp.exp2(s2 - m2)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, _PV_DNUMS, preferred_element_type=jnp.float32
    ) * (1.0 / denom)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel_nolse(q_ref, k_ref, kt_ref, vt_ref, o_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float):
    """Fused dq/dk/dv recomputing the normalized P from scratch — two lane
    reductions (~tens of us) instead of the lse residual's HBM round-trip
    and in-kernel transpose (~200 us measured, see the lse-elision note).

    The two lane-contract matmuls (s2 recompute, dP = dO Vᵀ) take
    TRANSPOSED (Dh/Dhv, Nk) operands (see _fwd_kernel_nolse's layout
    note); dq = dS K wants the natural (Nk, Dh) K, already (k, n) — so K
    arrives in both layouts (the duplicate HBM read is a few MB — noise
    next to the ~100 us/matmul the (k, n) layout saves), while natural V
    is not needed at all. dv/dk contract over sublanes (the Nq dim) and
    keep natural operands.
    """
    q = q_ref[0]
    k = k_ref[0]
    kt = kt_ref[0]
    vt = vt_ref[0]
    o = o_ref[0]
    do = do_ref[0]

    s2 = jax.lax.dot_general(
        q, kt, _MKN_DNUMS, preferred_element_type=jnp.float32
    ) * (scale * _LOG2E)
    m2 = jnp.max(s2, axis=-1, keepdims=True)
    e = jnp.exp2(s2 - m2)
    p = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))      # normalized P, f32
    pc = p.astype(do.dtype)

    dv = jax.lax.dot_general(
        pc, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, vt, _MKN_DNUMS, preferred_element_type=jnp.float32
    )
    dcap = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                   axis=-1, keepdims=True)
    ds = (p * (dp - dcap)).astype(q.dtype)
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
# Tiled kernels — online softmax over KV chunks, Q-row-block grid
#
# The chunk loop is a lax.fori_loop, NOT an unrolled Python loop: Mosaic
# allocates unrolled iterations' temporaries with overlapping stack
# liveness, so a 12-chunk unrolled forward at 1568 tokens compiled to an
# 18.7 MB stack (vs the 9.4 MB single-chunk working-set estimate) and blew
# the 16 MB scoped-VMEM limit — measured on the v5e, r3. A fori_loop body
# bounds live temps to ONE chunk regardless of chunk count. The ragged
# tail chunk (nk % bk) runs once, statically, after the loop.
# --------------------------------------------------------------------------- #
def _fwd_kernel_tiled(q_ref, kt_ref, v_ref, o_ref, lse_ref, *, scale: float,
                      bk: int):
    """Online-softmax forward: one Q-row block resident, logits in KV chunks.

    Base-2 softmax, native-dtype matmul inputs (see the _LOG2E/v4 note).
    K arrives TRANSPOSED — (HG, Dh, Nk), the (k, n) rhs layout the MXU
    wants for QKᵀ (the r3 one-shot A/B measured the natural layout's
    internal transpose at ~100 us per matmul at the dec shape); chunks are
    lane-dim slices of the resident block. V stays natural — the PV matmul
    is already (k, n)."""
    q = q_ref[0]                                            # (HG, bq, Dh)
    hg, bq, _ = q.shape
    dhv = v_ref.shape[-1]
    nk = kt_ref.shape[-1]

    def chunk(kt, v, m_i, l_i, acc):
        s2 = jax.lax.dot_general(
            q, kt, _PV_DNUMS, preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)                                # (HG, bq, size)
        m_new = jnp.maximum(m_i, jnp.max(s2, axis=-1, keepdims=True))
        p = jnp.exp2(s2 - m_new)
        alpha = jnp.exp2(m_i - m_new)
        l_new = l_i * alpha + jnp.sum(p, axis=-1, keepdims=True)
        a_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, _PV_DNUMS, preferred_element_type=jnp.float32
        )
        return m_new, l_new, a_new

    def body(i, carry):
        kt = kt_ref[0, :, :, pl.ds(i * bk, bk)]
        v = v_ref[0, :, pl.ds(i * bk, bk), :]
        return chunk(kt, v, *carry)

    init = (jnp.full((hg, bq, 1), -jnp.inf, jnp.float32),
            jnp.zeros((hg, bq, 1), jnp.float32),
            jnp.zeros((hg, bq, dhv), jnp.float32))
    m_i, l_i, acc = jax.lax.fori_loop(0, nk // bk, body, init)
    if nk % bk:                                             # static tail
        m_i, l_i, acc = chunk(
            kt_ref[0, :, :, nk - nk % bk:],
            v_ref[0, :, nk - nk % bk:, :],
            m_i, l_i, acc)
    o_ref[0] = (acc * (1.0 / l_i)).astype(o_ref.dtype)
    lse_ref[0] = jnp.swapaxes(m_i + jnp.log2(l_i), -1, -2)  # (HG, 1, bq)


def _bwd_kernel_qtiled(q_ref, k_ref, kt_ref, vt_ref, o_ref, lse_ref, do_ref,
                       dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                       scale: float, bk: int, nqb: int, nq_total: int):
    """Tiled backward: one Q-row block per grid step, dk/dv accumulated in
    f32 VMEM scratch across the (innermost, sequential) Q grid dimension.

    The dk/dv output block index maps ignore the Q index, so Mosaic keeps
    one buffer resident and writes back once per (batch, head-group); the
    scratch accumulators likewise persist across Q steps. When the Q block
    does not divide Nq, the last step's out-of-bounds rows carry undefined
    data — they are zeroed in q/do/p before the dk/dv contractions (which
    sum OVER the q-row dim; explicit selects also stop a possible NaN/Inf
    in the garbage rows from poisoning the sums via 0*inf).

    The two lane-contract matmuls (the s2 recompute and dP = dO Vᵀ) take
    TRANSPOSED (Dh/Dhv, Nk) operands, mirroring the one-shot lse-free
    backward's (k, n) layouts; dq = dS K wants natural K, so K arrives in
    both layouts and natural V is not needed at all.
    """
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros(dk_acc.shape, dk_acc.dtype)
        dv_acc[...] = jnp.zeros(dv_acc.shape, dv_acc.dtype)

    q = q_ref[0]                                            # (HG, bq, Dh)
    o = o_ref[0].astype(jnp.float32)
    lse2 = jnp.swapaxes(lse_ref[0], -1, -2)                 # (HG, bq, 1)
    do = do_ref[0]
    hg, bq, dh = q.shape
    nk = k_ref.shape[2]
    dt = q.dtype

    if nq_total % bq:
        rows = jax.lax.broadcasted_iota(jnp.int32, (hg, bq, 1), 1)
        valid = rows < (nq_total - qi * bq)                 # (HG, bq, 1)
        q = jnp.where(valid, q, jnp.zeros((), q.dtype))
        do = jnp.where(valid, do, jnp.zeros((), do.dtype))
        # o feeds dcap = sum(do*o): a NaN in a garbage row would survive
        # the do=0 mask (0*NaN) and then poison ds = p*(dp-dcap) the same
        # way — so o must be zeroed too, not just do.
        o = jnp.where(valid, o, 0.0)
        # a garbage lse could make exp2(s2 - lse2) overflow in dead rows
        lse2 = jnp.where(valid, lse2, jnp.inf)

    dcap = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)

    def chunk(k, kt, vt, dq):
        """One KV chunk: dq contribution returned, dk/dv chunks returned
        for the caller to accumulate into scratch at the right offset."""
        s2 = jax.lax.dot_general(
            q, kt, _PV_DNUMS, preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        p = jnp.exp2(s2 - lse2)                             # (HG, bq, size)
        dvc = jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do, vt, _PV_DNUMS, preferred_element_type=jnp.float32
        )
        ds = (p * (dp - dcap)).astype(dt)
        dq = dq + jax.lax.dot_general(
            ds, k, _PV_DNUMS, preferred_element_type=jnp.float32
        ) * scale
        dkc = jax.lax.dot_general(
            ds, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        return dq, dkc, dvc

    def body(i, dq):
        sl = pl.ds(i * bk, bk)
        dq, dkc, dvc = chunk(k_ref[0, :, sl, :], kt_ref[0, :, :, sl],
                             vt_ref[0, :, :, sl], dq)
        dk_acc[:, sl, :] += dkc
        dv_acc[:, sl, :] += dvc
        return dq

    dq = jax.lax.fori_loop(0, nk // bk, body,
                           jnp.zeros((hg, bq, dh), jnp.float32))
    if nk % bk:                                             # static tail
        t0 = nk - nk % bk
        dq, dkc, dvc = chunk(k_ref[0, :, t0:, :], kt_ref[0, :, :, t0:],
                             vt_ref[0, :, :, t0:], dq)
        dk_acc[:, t0:, :] += dkc
        dv_acc[:, t0:, :] += dvc
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(qi == nqb - 1)
    def _writeback():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


# --------------------------------------------------------------------------- #
# pallas_call plumbing — no host-side padding, natural (B, H, N, D) layout
# --------------------------------------------------------------------------- #
def _block(hg, *shape_nd):
    return pl.BlockSpec((1, hg) + tuple(shape_nd),
                        lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)


def _lseblock(hg, nq):
    """Whole-row block for the (B, H, 1, Nq) logsumexp (lane layout)."""
    return pl.BlockSpec((1, hg, 1, nq), lambda b, g: (b, g, 0, 0),
                        memory_space=pltpu.VMEM)


def _qblock(hg, bq, d):
    """Q-row block: the third grid dim walks Nq in bq-row steps."""
    return pl.BlockSpec((1, hg, bq, d),
                        lambda b, g, qi: (b, g, qi, 0),
                        memory_space=pltpu.VMEM)


def _qlseblock(hg, bq):
    """Lane-position Q block of the (B, H, 1, Nq) logsumexp — bq must be a
    128-multiple (or the whole Nq) for Mosaic block legality."""
    return pl.BlockSpec((1, hg, 1, bq), lambda b, g, qi: (b, g, 0, qi),
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
    compiler_params = None
    # Working set per head: native-dtype q/k/v/o rows, f32 s2+p (the big
    # ones) + the native-dtype P cast for the PV matmul, f32 lse row.
    per_head = _per_head_fwd(nq, nk, dh, dhv, q.dtype.itemsize, lse=True)
    if per_head <= _VMEM_BUDGET:
        kernel = functools.partial(_fwd_kernel, scale=scale)
        hg = _head_group(h, per_head)
        grid = (b, h // hg)
        in_specs = [_block(hg, nq, dh), _block(hg, nk, dh), _block(hg, nk, dhv)]
        out_specs = (_block(hg, nq, dhv), _lseblock(hg, nq))
        args = (q, k, v)
    else:
        plan = (_plan_override("FWD")
                or _plan_fwd_tiled(nq, nk, dh, dhv, q.dtype.itemsize))
        bq, bk = plan if plan is not None else _min_plan(nq)
        hg = _tiled_hg(h)
        kernel = functools.partial(_fwd_kernel_tiled, scale=scale, bk=bk)
        grid = (b, h // hg, pl.cdiv(nq, bq))
        in_specs = [_qblock(hg, bq, dh), _kvblock(hg, dh, nk),
                    _kvblock(hg, nk, dhv)]
        out_specs = (_qblock(hg, bq, dhv), _qlseblock(hg, bq))
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=_TILED_VMEM_LIMIT)
        # (k, n) layout: K transposed XLA-side (fuses with layout ops)
        args = (q, jnp.swapaxes(k, -1, -2), v)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((b, h, nq, dhv), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, nq), jnp.float32),
        ),
        compiler_params=compiler_params,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nq * nk * (dh + dhv),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(*args)
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
    compiler_params = None
    # Native-dtype q/dq/k/dk/v/dv/o/do + f32 s2/p/dp/ds + the native-dtype
    # P and dS casts + f32 lse/dcap rows.
    per_head = _per_head_bwd(nq, nk, dh, dhv, q.dtype.itemsize, lse=True)
    if per_head <= _VMEM_BUDGET:
        kernel = functools.partial(_bwd_kernel, scale=scale)
        hg = _head_group(h, per_head)
        grid = (b, h // hg)
        in_specs = [
            _block(hg, nq, dh), _block(hg, nk, dh), _block(hg, nk, dhv),
            _block(hg, nq, dhv), _lseblock(hg, nq), _block(hg, nq, dhv),
        ]
        out_specs = (_block(hg, nq, dh), _block(hg, nk, dh),
                     _block(hg, nk, dhv))
        args = (q, k, v, out, lse, g)
    else:
        # Tiled: K (both layouts) + Vᵀ rows + f32 dk/dv accumulators
        # resident; one Q-row block per (innermost) grid step. See the
        # kernel's (k, n)-layout note.
        plan = (_plan_override("BWD")
                or _plan_bwd_tiled(nq, nk, dh, dhv, q.dtype.itemsize))
        bq, bk = plan if plan is not None else _min_plan(nq)
        nqb = pl.cdiv(nq, bq)
        hg = _tiled_hg(h)
        kernel = functools.partial(_bwd_kernel_qtiled, scale=scale, bk=bk,
                                   nqb=nqb, nq_total=nq)
        grid = (b, h // hg, nqb)
        in_specs = [
            _qblock(hg, bq, dh), _kvblock(hg, nk, dh), _kvblock(hg, dh, nk),
            _kvblock(hg, dhv, nk),
            _qblock(hg, bq, dhv), _qlseblock(hg, bq), _qblock(hg, bq, dhv),
        ]
        out_specs = (_qblock(hg, bq, dh), _kvblock(hg, nk, dh),
                     _kvblock(hg, nk, dhv))
        scratch_shapes = [pltpu.VMEM((hg, nk, dh), jnp.float32),
                          pltpu.VMEM((hg, nk, dhv), jnp.float32)]
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=_TILED_VMEM_LIMIT)
        args = (q, k, jnp.swapaxes(k, -1, -2), jnp.swapaxes(v, -1, -2),
                out, lse, g)

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
        compiler_params=compiler_params,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * nq * nk * (dh + dhv),
            bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(*args)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


# --------------------------------------------------------------------------- #
# lse-free fast path — one-shot both directions (see the lse-elision note)
# --------------------------------------------------------------------------- #
def _fwd_call_nolse(q, k, v, scale, interpret):
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    dhv = v.shape[3]
    pk = _pk_cfg(h, nq, nk, dh, dhv, q.dtype.itemsize)
    if pk is not None:
        p, nkp, hgf, _ = pk
        return pl.pallas_call(
            functools.partial(_fwd_kernel_nolse_pk, scale=scale, p=p,
                              nkp=nkp),
            grid=(b, h // hgf),
            in_specs=[_block(hgf, nq, dh), _block(hgf, nk, dh),
                      _block(hgf, nk, dhv)],
            out_specs=_block(hgf, nq, dhv),
            out_shape=jax.ShapeDtypeStruct((b, h, nq, dhv), q.dtype),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_PACKED_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * h * nq * (nkp * 128 // dh + nk),
                bytes_accessed=(q.size + k.size + v.size)
                * q.dtype.itemsize,
                transcendentals=b * h * nq * nk,
            ),
        )(q, k, v)
    hg = _head_group(h, _per_head_fwd(nq, nk, dh, dhv, q.dtype.itemsize,
                                      lse=False))
    kt = jnp.swapaxes(k, -1, -2)        # (B, H, Dh, Nk) — XLA-side, fuses
    return pl.pallas_call(
        functools.partial(_fwd_kernel_nolse, scale=scale),
        grid=(b, h // hg),
        in_specs=[_block(hg, nq, dh), _block(hg, dh, nk), _block(hg, nk, dhv)],
        out_specs=_block(hg, nq, dhv),
        out_shape=jax.ShapeDtypeStruct((b, h, nq, dhv), q.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * nq * nk * (dh + dhv),
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(q, kt, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_nolse(q, k, v, scale, interpret):
    return _fwd_call_nolse(q, k, v, scale, interpret)


def _flash_nolse_fwd(q, k, v, scale, interpret):
    out = _fwd_call_nolse(q, k, v, scale, interpret)
    return out, (q, k, v, out)


def _flash_nolse_bwd(scale, interpret, residuals, g):
    q, k, v, out = residuals
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    dhv = v.shape[3]
    pk = _pk_cfg(h, nq, nk, dh, dhv, q.dtype.itemsize)
    if pk is not None:
        p, nkp, _, hgb = pk
        return pl.pallas_call(
            functools.partial(_bwd_kernel_nolse_pk, scale=scale, p=p,
                              nkp=nkp),
            grid=(b, h // hgb),
            in_specs=[
                _block(hgb, nq, dh), _block(hgb, nk, dh),
                _block(hgb, nk, dhv), _block(hgb, nq, dhv),
                _block(hgb, nq, dhv),
            ],
            out_specs=(_block(hgb, nq, dh), _block(hgb, nk, dh),
                       _block(hgb, nk, dhv)),
            out_shape=(
                jax.ShapeDtypeStruct((b, h, nq, dh), q.dtype),
                jax.ShapeDtypeStruct((b, h, nk, dh), k.dtype),
                jax.ShapeDtypeStruct((b, h, nk, dhv), v.dtype),
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_PACKED_VMEM_LIMIT),
            cost_estimate=pl.CostEstimate(
                flops=5 * b * h * nq * nk * (dh + dhv),
                bytes_accessed=2 * (q.size + k.size + v.size)
                * q.dtype.itemsize,
                transcendentals=b * h * nq * nk,
            ),
        )(q, k, v, out, g)
    hg = _head_group(h, _per_head_bwd(nq, nk, dh, dhv, q.dtype.itemsize,
                                      lse=False))
    kt = jnp.swapaxes(k, -1, -2)        # (B, H, Dh, Nk)
    vt = jnp.swapaxes(v, -1, -2)        # (B, H, Dhv, Nk)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_nolse, scale=scale),
        grid=(b, h // hg),
        in_specs=[
            _block(hg, nq, dh), _block(hg, nk, dh), _block(hg, dh, nk),
            _block(hg, dhv, nk), _block(hg, nq, dhv), _block(hg, nq, dhv),
        ],
        out_specs=(_block(hg, nq, dh), _block(hg, nk, dh),
                   _block(hg, nk, dhv)),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, nq, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, nk, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, nk, dhv), v.dtype),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * nq * nk * (dh + dhv),
            bytes_accessed=2 * (q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * nq * nk,
        ),
    )(q, k, kt, vt, out, g)
    return dq, dk, dv


_flash_nolse.defvjp(_flash_nolse_fwd, _flash_nolse_bwd)


# --------------------------------------------------------------------------- #
# v5: lane-packed QKᵀ / dP for small head dims (round-5 decoder-tail attack)
#
# The MXU contracts 128 lanes per pass, so a dot whose CONTRACTION dim is
# the head dim runs at <= Dh/128 MXU density at Dh=32 — and Mosaic's
# batched small-matmul emitter lands below even that bound (the v4
# dec_img QKᵀ measured ~330 us for 6.8 GFLOP ≈ 20 TF/s against a 39 TF/s
# padded bound; knockout probes, NOTES.md r5). Exactly two of the one-shot
# kernels' six matmuls contract over Dh — the forward/recomputed QKᵀ and
# the backward's dP = dO Vᵀ; everything else contracts over the sequence
# dim and is already fast. The v5 kernels replace those two dots with
# DENSE 128-lane contractions: P = 128/Dh heads' q (or dO) rows are
# lane-concatenated to a (Nq, 128) block, and K (or V) is expanded in
# VMEM to a block-diagonal (P*Nkp, 128) stack
#
#     Kst[j*Nkp + t, j*Dh : (j+1)*Dh] = K_j[t]      (zeros elsewhere)
#
# so  S4 = Q4 @ Kstᵀ  computes every head's logits EXACTLY (the zero
# blocks kill all cross-head terms), side by side in Nkp-wide lane blocks
# that are sliced back to the head-major layout the rest of the kernel
# already uses. Measured on the v5e (B=64 dec shape): the dense dot runs
# at ~142 TF/s (108 us) vs ~330 us for the per-head batched dot, and the
# block-diagonal stack build is ~25 us of VPU selects/concats. Padded
# FLOPs = the same 128/Dh x the useful FLOPs the per-head bound already
# paid — but now they run at dense-MXU rate. Nkp rounds Nk up to a
# 128-multiple so every lane slice is tile-aligned; the padded columns
# are sliced away before the softmax ever sees them.
#
# I/O stays the natural head-major (B, H, N, Dh) layout — no host-side
# relayouts, no routing changes; the packed math is invisible outside the
# kernel. Exactness: identical op-for-op math to the v4 kernels (f32
# base-2 softmax, native-dtype matmul inputs with f32 accumulation).
# DAVF_NO_PACKED=1 disables (falls back to the per-head v4 dots).
# --------------------------------------------------------------------------- #
_PACKED_VMEM_LIMIT = 64 * 1024 * 1024


_MM_NT = (((1,), (1,)), ((), ()))      # (M,K)x(N,K) -> (M,N)


def _pk_cfg(h, nq, nk, dh, dhv, itemsize):
    """(p, nkp, hg_fwd, hg_bwd) for the packed-QKᵀ one-shot kernels, or
    None. Eligible when the head dim packs into the 128-lane tile (Dh in
    {16, 32, 64}), V has the same head dim (every self-attention; the
    fusion shapes with dhv > dh keep the v4 dots), and the head count
    divides into packs. Head groups are p-multiples — each group of p
    heads shares one dense dot — sized to the packed VMEM budget (the
    64 MiB scoped cap leaves the stack allocator room; fewer grid steps
    amortize the measured ~0.6 us/step floor)."""
    # OPT-IN (DAVF_PACKED=1): five packed designs were A/B'd on the v5e at
    # the dec_img train shape (B=64 H16 N228 Dh32; NOTES.md r5 table) and
    # the best measured 435/1375 us fwd/bwd vs the per-head v4 kernels'
    # 401/1138 — the isolated dense dot IS ~3x faster (108 vs 330 us,
    # knockout probes) but the stack builds + per-head slice softmax +
    # repacking VPU work eats the win at these shapes. Kept for A/B and
    # for future shapes where the dense-contraction advantage outgrows
    # the fixed VPU overhead.
    if not os.environ.get("DAVF_PACKED"):
        return None
    if dhv != dh or dh not in (16, 32, 64):
        return None
    p = 128 // dh
    if h % p:
        return None
    nkp = -(-nk // 128) * 128

    def per_head(bwd):
        io = (2 if bwd else 1) * itemsize * 4 * nq * dh
        sm = ((16 + 2 * itemsize) if bwd else (8 + itemsize)) * nq * nk
        stacks = (2 if bwd else 1) * itemsize * nkp * 128
        s4 = (2 if bwd else 1) * 4 * nq * nkp
        return io + sm + stacks + s4

    def pick(bwd):
        per = per_head(bwd)
        hg = max(min(_PK_BUDGET // max(per, 1), h), 0)
        hg -= hg % p
        while hg > p and h % hg:
            hg -= p
        return hg if hg and h % hg == 0 else (p if h % p == 0 and p * per
                                              <= _PK_BUDGET else 0)

    hgf, hgb = pick(False), pick(True)
    ov = os.environ.get("DAVF_PK_HG")       # trace-time calibration sweep
    if ov:
        hgf = hgb = max(p, min(int(ov) - int(ov) % p, h))
        while h % hgf:
            hgf = hgb = hgf - p
    if not hgf or not hgb:
        return None
    return p, nkp, hgf, hgb


_PK_BUDGET = 24 * 1024 * 1024


def _stack_rows(slices, nkp):
    """Per-head (1, Nk, Dh) value slices -> block-diagonal (1, P*Nkp, P*Dh)
    stack (see the v5 note). Pure lane/sublane zero-concats — no
    transposes, no reshapes, rank preserved throughout (Mosaic has no
    general reshape/squeeze path — the fusion_block.py lesson)."""
    p = len(slices)
    _, nk, dh = slices[0].shape
    dt = slices[0].dtype
    parts = []
    for j, kj in enumerate(slices):
        cols = []
        if j:
            cols.append(jnp.zeros((1, nk, j * dh), dt))
        cols.append(kj)
        if j < p - 1:
            cols.append(jnp.zeros((1, nk, (p - 1 - j) * dh), dt))
        blk = jnp.concatenate(cols, axis=2) if len(cols) > 1 else cols[0]
        if nkp != nk:
            blk = jnp.concatenate(
                [blk, jnp.zeros((1, nkp - nk, p * dh), dt)], axis=1)
        parts.append(blk)
    return jnp.concatenate(parts, axis=1)


def _lane_cat(x, lo, p):
    """p consecutive head slices of x lane-concatenated: (1, N, P*Dh)."""
    return jnp.concatenate([x[lo + j:lo + j + 1] for j in range(p)], axis=-1)


_TN_DNUMS = (((1,), (1,)), ((0,), (0,)))   # (1,K,M)x(1,K,N) -> (1,M,N)


def _packed_probs(s4, p, nk, nkp, dt):
    """Per-head base-2 softmax on lane SLICES of the packed logits s4
    (1, Nq, P*Nkp) f32, re-packed as dt with zero tails. The padded tail
    columns are never sliced in, so no -inf masking is needed; the zero
    tails multiply the stacks' zero rows downstream. Returns (probs_packed
    dt, per-head f32 probs list for the backward's dS)."""
    pcs, prs = [], []
    pad = None
    for j in range(p):
        sj = s4[:, :, j * nkp:j * nkp + nk]
        m = jnp.max(sj, axis=-1, keepdims=True)
        e = jnp.exp2(sj - m)
        pr = e * (1.0 / jnp.sum(e, axis=-1, keepdims=True))
        prs.append(pr)
        pj = pr.astype(dt)
        if nkp != nk:
            if pad is None:
                pad = jnp.zeros((1, sj.shape[1], nkp - nk), dt)
            pj = jnp.concatenate([pj, pad], axis=-1)
        pcs.append(pj)
    return jnp.concatenate(pcs, axis=-1), prs


def _fwd_kernel_nolse_pk(q_ref, k_ref, v_ref, o_ref, *, scale, p, nkp):
    """v5 one-shot forward: every matmul a packed-dense 128-contraction
    (see the module note) — QKᵀ against the block-diagonal K stack, PV
    against the V stack (whose zero blocks make the packed probabilities'
    zero tails harmless). Softmax runs per head on lane slices; only thin
    (1, N, Dh) outputs are concatenated. Rank-3 slices/concats and
    size-1-batch dot_generals only (Mosaic has no reshape/squeeze path)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    hg, nq, dh = q.shape
    nk = k.shape[1]
    outs = []
    for g in range(hg // p):
        a4 = _lane_cat(q, g * p, p)
        kst = _stack_rows([k[g * p + j:g * p + j + 1] for j in range(p)],
                          nkp)
        vst = _stack_rows([v[g * p + j:g * p + j + 1] for j in range(p)],
                          nkp)
        s4 = jax.lax.dot_general(
            a4, kst, _BATCH_DNUMS, preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)                            # (1, Nq, P*Nkp)
        pc4, _ = _packed_probs(s4, p, nk, nkp, q.dtype)
        o4 = jax.lax.dot_general(
            pc4, vst, _PV_DNUMS, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)                           # (1, Nq, 128) merged
        outs.extend(o4[:, :, j * dh:(j + 1) * dh] for j in range(p))
    o_ref[0] = jnp.concatenate(outs, axis=0)


def _bwd_kernel_nolse_pk(q_ref, k_ref, v_ref, o_ref, do_ref,
                         dq_ref, dk_ref, dv_ref, *, scale, p, nkp):
    """v5 one-shot backward: all five matmuls packed-dense (QKᵀ recompute,
    dP = dO Vstᵀ, dVst = P4ᵀ dO4, dKst = dS4ᵀ Q4, dQ4 = dS4 Kst); per-head
    softmax/dS on lane slices; dk/dv extracted from the stacks' diagonal
    blocks as thin slices. The off-diagonal blocks of dKst/dVst are the
    padding waste the dense-MXU rate already paid for."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    o = o_ref[0]
    do = do_ref[0]
    dt = q.dtype
    hg, nq, dh = q.shape
    nk = k.shape[1]

    dqs, dks, dvs = [], [], []
    pad = None
    for g in range(hg // p):
        a4 = _lane_cat(q, g * p, p)
        do4 = _lane_cat(do, g * p, p)
        o4 = _lane_cat(o, g * p, p)
        kst = _stack_rows([k[g * p + j:g * p + j + 1] for j in range(p)],
                          nkp)
        vst = _stack_rows([v[g * p + j:g * p + j + 1] for j in range(p)],
                          nkp)
        s4 = jax.lax.dot_general(
            a4, kst, _BATCH_DNUMS, preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)
        dp4 = jax.lax.dot_general(
            do4, vst, _BATCH_DNUMS, preferred_element_type=jnp.float32)
        pc4, prs = _packed_probs(s4, p, nk, nkp, dt)
        prod = do4.astype(jnp.float32) * o4.astype(jnp.float32)
        dss = []
        for j in range(p):
            dcap = jnp.sum(prod[:, :, j * dh:(j + 1) * dh], axis=-1,
                           keepdims=True)
            dpj = dp4[:, :, j * nkp:j * nkp + nk]
            dsj = (prs[j] * (dpj - dcap)).astype(dt)
            if nkp != nk:
                if pad is None:
                    pad = jnp.zeros((1, nq, nkp - nk), dt)
                dsj = jnp.concatenate([dsj, pad], axis=-1)
            dss.append(dsj)
        ds4 = jnp.concatenate(dss, axis=-1)             # (1, Nq, P*Nkp)

        dvst = jax.lax.dot_general(
            pc4, do4, _TN_DNUMS, preferred_element_type=jnp.float32)
        dkst = jax.lax.dot_general(
            ds4, a4, _TN_DNUMS, preferred_element_type=jnp.float32)
        dq4 = jax.lax.dot_general(
            ds4, kst, _PV_DNUMS, preferred_element_type=jnp.float32
        ) * scale
        dq4 = dq4.astype(dq_ref.dtype)

        dqs.extend(dq4[:, :, j * dh:(j + 1) * dh] for j in range(p))
        dks.extend((dkst[:, j * nkp:j * nkp + nk, j * dh:(j + 1) * dh]
                    * scale).astype(dk_ref.dtype) for j in range(p))
        dvs.extend(dvst[:, j * nkp:j * nkp + nk,
                        j * dh:(j + 1) * dh].astype(dv_ref.dtype)
                   for j in range(p))
    dq_ref[0] = jnp.concatenate(dqs, axis=0)
    dk_ref[0] = jnp.concatenate(dks, axis=0)
    dv_ref[0] = jnp.concatenate(dvs, axis=0)


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
    Shapes where both directions are one-shot skip the logsumexp residual
    entirely (lse-free VJP; see the v4 lse-elision note above).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, nq, dh = q.shape
    nk = k.shape[2]
    if _one_shot_nolse(nq, nk, dh, v.shape[3], q.dtype.itemsize):
        return _flash_nolse(q, k, v, float(scale), bool(interpret))
    return _flash(q, k, v, float(scale), bool(interpret))
