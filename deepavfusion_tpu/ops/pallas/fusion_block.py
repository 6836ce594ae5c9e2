"""One-kernel fused FusionBlock (factorized_mmi) — forward and backward.

The factorized fusion block (reference models/fusion_blocks.py:216-289) is
~20 GFLOP of 8-to-32-token matmuls per layer, but as individual XLA ops the
12 blocks cost 31% of the B=64 pretrain step for a few percent of its FLOPs
(NOTES.md r3 knockout attribution): every op is far too small to fill the
MXU pipeline and each fusion boundary round-trips HBM. This module collapses
the ENTIRE block — three LayerNorms, both aggregate cross-attentions, the
factorized pair-attention (with the PairDense factoring: the (nv·na, 2d)
pair tensor is never materialized), output projections, residuals, norm2 and
the MLP — into ONE Pallas kernel forward and ONE kernel backward (a
flash-attention-style recompute VJP: no residual tensors cross HBM between
fwd and bwd except the block inputs themselves).

Weights live in VMEM with constant index maps (fetched once per kernel, not
per grid step); the grid walks batch tiles; weight/bias/LN gradients are
accumulated in f32 directly in resident output blocks across grid steps and
written back once.

Numerics mirror the unfused path op for op:
  * LayerNorm math in f32 (flax LayerNorm semantics incl. fast variance),
    output cast to the compute dtype;
  * matmuls take native-dtype (bf16) inputs with f32 accumulation, rounded
    to the compute dtype before the bias add (flax Dense semantics);
  * softmax in f32 (base-2, scale·log2e folded into the logits), probability
    matrix cast to the value dtype for the PV matmul (ops/attention
    xla_attention semantics);
  * the attention scale is the UNREDUCED head dim (d/H)**-0.5 even though
    pair q/k project to d*attn_ratio (reference quirk #4,
    models/fusion_blocks.py:219-221);
  * GELU is the exact (erf) form, matching nn.gelu(approximate=False).

Parameter order (PARAM_ORDER below) matches the flax FusionBlock tree; the
caller (models/fusion_blocks.FusionBlock) declares identical parameter
shells, so converted checkpoints and the reference-parity tests see the same
tree whether or not the fused route is taken.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _vbytes

_LOG2E = 1.4426950408889634
_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327

# Flax param-tree paths (under the FusionBlock module) in tuple order.
PARAM_ORDER = (
    "norm1_mm.scale", "norm1_mm.bias",
    "norm1_img.scale", "norm1_img.bias",
    "norm1_aud.scale", "norm1_aud.bias",
    "attn.attn_v.q.kernel", "attn.attn_v.q.bias",
    "attn.attn_v.kv.kernel", "attn.attn_v.kv.bias",
    "attn.attn_v.proj.kernel", "attn.attn_v.proj.bias",
    "attn.attn_a.q.kernel", "attn.attn_a.q.bias",
    "attn.attn_a.kv.kernel", "attn.attn_a.kv.bias",
    "attn.attn_a.proj.kernel", "attn.attn_a.proj.bias",
    "attn.q.kernel", "attn.q.bias",
    "attn.k.kernel", "attn.k.bias",
    "attn.v.kernel", "attn.v.bias",
    "attn.proj.kernel", "attn.proj.bias",
    "norm2.scale", "norm2.bias",
    "mlp.fc1.kernel", "mlp.fc1.bias",
    "mlp.fc2.kernel", "mlp.fc2.bias",
)
N_PARAMS = len(PARAM_ORDER)
# Indices of LayerNorm scales/biases — these stay f32 inside the kernel
# (flax computes LN entirely in f32 and casts only the final output).
_LN_IDX = frozenset((0, 1, 2, 3, 4, 5, 26, 27))

# dot_general dimension numbers (rank-3 with a leading batch dim, rank-2).
_B3 = (((2,), (2,)), ((0,), (0,)))     # (G,M,K)x(G,N,K) -> (G,M,N)
_PV3 = (((2,), (1,)), ((0,), (0,)))    # (G,M,K)x(G,K,N) -> (G,M,N)
_RT3 = (((1,), (1,)), ((0,), (0,)))    # (G,M,N)x(G,M,K) -> (G,N,K)
_MM2 = (((1,), (0,)), ((), ()))        # (R,K)x(K,F)   -> (R,F)
_DW2 = (((0,), (0,)), ((), ()))        # (R,K)x(R,F)   -> (K,F)
_DX2 = (((1,), (1,)), ((), ()))        # (R,F)x(K,F)   -> (R,K)

_F32 = jnp.float32


def _dot(a, b, dn):
    return jax.lax.dot_general(a, b, dn, preferred_element_type=_F32)


def _mm(x, w, b, dt):
    """flax Dense: rounded-to-dt matmul output, then dt bias add.

    x: (..., K) -> 2-d rows; w: (K, F); b: (1, F) or None."""
    r = x.reshape(-1, x.shape[-1])
    y = _dot(r, w, _MM2).astype(dt)
    if b is not None:
        y = y + b.astype(dt)
    return y.reshape(x.shape[:-1] + (w.shape[-1],))


def _ln(x, g, b, eps):
    """f32 LayerNorm (fast variance, flax semantics). Returns (y_f32, xhat,
    rstd); the caller casts y to the compute dtype."""
    xf = x.astype(_F32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * rstd
    return xhat * g.astype(_F32) + b.astype(_F32), xhat, rstd


def _ln_bwd(dy, xhat, rstd, g):
    """dx (f32) for LN given upstream dy (f32) on the LN output."""
    dyg = dy * g.astype(_F32)
    m1 = jnp.mean(dyg, axis=-1, keepdims=True)
    m2 = jnp.mean(dyg * xhat, axis=-1, keepdims=True)
    return rstd * (dyg - m1 - xhat * m2)


def _to_heads(x, h):
    """(B, N, H*E) -> (H*B, N, E), head-major group index g = head*B + b.

    Implemented as H static lane slices + a major-axis concatenate: Mosaic
    cannot lower the natural reshape/transpose ((32,768) -> (4,8,12,64)
    "unsupported shape cast", measured on the v5e), but lane slicing and
    leading-dim concatenation both lower cleanly. The layout is internal to
    the kernel — _from_heads inverts it with the same convention."""
    b, n, f = x.shape
    e = f // h
    return jnp.concatenate([x[:, :, i * e:(i + 1) * e] for i in range(h)],
                           axis=0)


def _from_heads(x, b):
    """(H*B, N, E) -> (B, N, H*E) — inverse of _to_heads."""
    hb, n, e = x.shape
    h = hb // b
    return jnp.concatenate([x[i * b:(i + 1) * b] for i in range(h)], axis=-1)


def _pair_sum(x1, x2):
    """out[b, i*n2 + j] = x1[b, i] + x2[b, j] — the PairDense broadcast sum
    in rank-3 ops only (sublane broadcast + concats; Mosaic has no rank-4
    broadcast/reshape path)."""
    b, n1, f = x1.shape
    n2 = x2.shape[1]
    rep = jnp.concatenate(
        [jnp.broadcast_to(x1[:, i:i + 1, :], (b, n2, f)) for i in range(n1)],
        axis=1)
    til = jnp.concatenate([x2] * n1, axis=1)
    return rep + til


def _pair_sum_bwd(dy, n1, n2):
    """(d_x1, d_x2) for _pair_sum given dy (B, n1*n2, f)."""
    d1 = jnp.concatenate(
        [jnp.sum(dy[:, i * n2:(i + 1) * n2], axis=1, keepdims=True)
         for i in range(n1)], axis=1)                      # (B, n1, f)
    d2 = dy[:, :n2]
    for i in range(1, n1):
        d2 = d2 + dy[:, i * n2:(i + 1) * n2]               # (B, n2, f)
    return d1, d2


def _attn_fwd(qh, kh, vh, scale, dt):
    """f32 softmax attention on head-major rank-3 inputs.

    Returns (o (G,Nq,Ev) dt, p (G,Nq,Nk) f32)."""
    s = _dot(qh, kh, _B3) * (scale * _LOG2E)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    p = p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))
    o = _dot(p.astype(dt), vh, _PV3).astype(dt)
    return o, p


def _attn_bwd(p, qh, kh, vh, oh, doh, scale, dt):
    """flash-style attention backward from the recomputed probabilities.

    Returns (dq, dk, dv) in dt, head-major rank-3."""
    dv = _dot(p.astype(dt), doh, _RT3).astype(dt)
    dp = _dot(doh, vh, _B3)
    dcap = jnp.sum(doh.astype(_F32) * oh.astype(_F32), axis=-1, keepdims=True)
    ds = (p * (dp - dcap)).astype(dt)
    dq = (_dot(ds, kh, _PV3) * scale).astype(dt)
    dk = (_dot(ds, qh, _RT3) * scale).astype(dt)
    return dq, dk, dv


def _erf(x):
    """f32 erf from exp (Mosaic has no erf primitive): Abramowitz-Stegun
    7.1.26, max abs error 1.5e-7 — at f32 epsilon level, well inside the
    kernel's parity tolerances. Used in interpret mode too, so the CPU
    tests validate exactly the math that ships on TPU."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    y = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return jnp.sign(x) * (1.0 - y * jnp.exp(-ax * ax))


def _gelu(x):
    """Exact-erf GELU in f32 (nn.gelu(approximate=False) semantics)."""
    xf = x.astype(_F32)
    return xf * 0.5 * (1.0 + _erf(xf * _INV_SQRT2))


def _gelu_grad(x):
    xf = x.astype(_F32)
    phi = jnp.exp(xf * xf * -0.5) * _INV_SQRT_2PI
    return 0.5 * (1.0 + _erf(xf * _INV_SQRT2)) + xf * phi


def _forward_core(xf, xi, xa, p, cfg):
    """The whole block on VALUES (shared by fwd kernel and bwd recompute).

    Returns (out, cache) where cache holds every intermediate the backward
    consumes. Shapes: xf (B, nmm+nfv+nfa, d), xi (B, Nv, d), xa (B, Na, d).
    """
    (h, nmm, nfv, nfa, scale, eps) = cfg
    dt = xf.dtype
    b = xf.shape[0]
    d = xf.shape[-1]
    (g_mm, b_mm, g_img, b_img, g_aud, b_aud,
     wq_v, bq_v, wkv_v, bkv_v, wp_v, bp_v,
     wq_a, bq_a, wkv_a, bkv_a, wp_a, bp_a,
     wq_p, bq_p, wk_p, bk_p, wv_p, bv_p, wo_p, bo_p,
     g2, b2, w1, b1, w2, b2m) = p

    xmm_f, xhat_mm, rstd_mm = _ln(xf, g_mm, b_mm, eps)
    xmm = xmm_f.astype(dt)
    xv_f, xhat_i, rstd_i = _ln(xi, g_img, b_img, eps)
    xv = xv_f.astype(dt)
    xa_f, xhat_a, rstd_a = _ln(xa, g_aud, b_aud, eps)
    xan = xa_f.astype(dt)

    xmm2 = xmm[:, :nmm]
    xmv = xmm[:, nmm:nmm + nfv]
    xma = xmm[:, nmm + nfv:]

    def branch(xq, xsrc, wq, bq, wkv, bkv):
        q = _mm(xq, wq, bq, dt)                       # (B, nf, d)
        kv = _mm(xsrc, wkv, bkv, dt)                  # (B, Ns, 2d)
        kk, vv = kv[..., :d], kv[..., d:]
        qh = _to_heads(q, h)
        kh = _to_heads(kk, h)
        vh = _to_heads(vv, h)
        oh, pr = _attn_fwd(qh, kh, vh, scale, dt)
        return qh, kh, vh, oh, pr, _from_heads(oh, b)

    qvh, kvh, vvh, ovh, pv, ov = branch(xmv, xv, wq_v, bq_v, wkv_v, bkv_v)
    aggv = _mm(ov, wp_v, bp_v, dt)                    # (B, nfv, d)
    qah, kah, vah, oah, pa, oa = branch(xma, xan, wq_a, bq_a, wkv_a, bkv_a)
    agga = _mm(oa, wp_a, bp_a, dt)                    # (B, nfa, d)

    # --- factorized pair attention (PairDense: pairs never materialized
    # at 2d width; k/v are built as broadcast sums of per-side projections)
    inner = wq_p.shape[-1]
    qp = _mm(xmm2, wq_p, bq_p, dt)                    # (B, nmm, inner)
    k1 = _mm(aggv, wk_p[:d], bk_p, dt)                # bias folded into k1
    k2 = _mm(agga, wk_p[d:], None, dt)
    v1 = _mm(aggv, wv_p[:d], bv_p, dt)
    v2 = _mm(agga, wv_p[d:], None, dt)
    kp = _pair_sum(k1, k2)                            # (B, nfv*nfa, inner)
    vp = _pair_sum(v1, v2)                            # (B, nfv*nfa, d)
    qph = _to_heads(qp, h)
    kph = _to_heads(kp, h)
    vph = _to_heads(vp, h)
    oph, pp = _attn_fwd(qph, kph, vph, scale, dt)
    op = _from_heads(oph, b)                          # (B, nmm, d)
    o = _mm(op, wo_p, bo_p, dt)                       # (B, nmm, d)

    res = jnp.concatenate([o, aggv, agga], axis=1)    # (B, nf, d)
    x1 = xmm + res                                    # residual on NORMALIZED
    y_f, xhat2, rstd2 = _ln(x1, g2, b2, eps)
    y = y_f.astype(dt)
    h1 = _mm(y, w1, b1, dt)                           # (B, nf, hidden)
    hg = _gelu(h1).astype(dt)
    h2 = _mm(hg, w2, b2m, dt)                         # (B, nf, d)
    out = x1 + h2

    cache = dict(
        xhat_mm=xhat_mm, rstd_mm=rstd_mm, xhat_i=xhat_i, rstd_i=rstd_i,
        xhat_a=xhat_a, rstd_a=rstd_a, xmm=xmm, xv=xv, xan=xan,
        xmm2=xmm2, xmv=xmv, xma=xma,
        qvh=qvh, kvh=kvh, vvh=vvh, ovh=ovh, pv=pv, ov=ov, aggv=aggv,
        qah=qah, kah=kah, vah=vah, oah=oah, pa=pa, oa=oa, agga=agga,
        qp=qp, qph=qph, kph=kph, vph=vph, oph=oph, pp=pp, op=op,
        x1=x1, xhat2=xhat2, rstd2=rstd2, y=y, h1=h1, hg=hg,
    )
    return out, cache


def _fwd_kernel(*refs, cfg):
    xf = refs[0][...]
    xi = refs[1][...]
    xa = refs[2][...]
    p = tuple(r[...] for r in refs[3:3 + N_PARAMS])
    out_ref = refs[3 + N_PARAMS]
    out, _ = _forward_core(xf, xi, xa, p, cfg)
    out_ref[...] = out


def _rows(x):
    return x.reshape(-1, x.shape[-1])


def _bwd_kernel(*refs, cfg):
    """Recompute forward, then the full chain backward.

    refs: [xf, xi, xa, params*32, g,
           dxf, dxi, dxa, dparams*32]
    dparam refs are f32 resident blocks (constant index maps) accumulated
    across batch-tile grid steps; x-grads are written per tile.
    """
    (h, nmm, nfv, nfa, scale, eps) = cfg
    xf = refs[0][...]
    xi = refs[1][...]
    xa = refs[2][...]
    p = tuple(r[...] for r in refs[3:3 + N_PARAMS])
    g = refs[3 + N_PARAMS][...]
    dxf_ref, dxi_ref, dxa_ref = refs[4 + N_PARAMS:7 + N_PARAMS]
    dp_refs = refs[7 + N_PARAMS:7 + 2 * N_PARAMS]

    (g_mm, b_mm, g_img, b_img, g_aud, b_aud,
     wq_v, bq_v, wkv_v, bkv_v, wp_v, bp_v,
     wq_a, bq_a, wkv_a, bkv_a, wp_a, bp_a,
     wq_p, bq_p, wk_p, bk_p, wv_p, bv_p, wo_p, bo_p,
     g2, b2, w1, b1, w2, b2m) = p

    dt = xf.dtype
    b = xf.shape[0]
    d = xf.shape[-1]
    inner = wq_p.shape[-1]

    _, c = _forward_core(xf, xi, xa, p, cfg)

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _zero():
        for r in dp_refs:
            r[...] = jnp.zeros(r.shape, r.dtype)

    acc = {}

    def add(idx, val):
        acc[idx] = acc.get(idx, 0.0) + val.astype(_F32)

    def dense_bwd(dy, x_in, w, w_idx, b_idx):
        """dy (B,N,F) dt; returns dx (B,N,K) dt; accumulates dW/db."""
        dy2 = _rows(dy)
        x2 = _rows(x_in)
        add(w_idx, _dot(x2, dy2, _DW2))
        if b_idx is not None:
            add(b_idx, jnp.sum(dy2.astype(_F32), axis=0, keepdims=True))
        dx = _dot(dy2, w, _DX2).astype(dt)
        return dx.reshape(x_in.shape[:-1] + (w.shape[0],))

    # ---- out = x1 + h2
    dx1 = g.astype(_F32)
    # ---- MLP: h2 = hg @ w2 + b2m ; hg = gelu(h1) ; h1 = y @ w1 + b1
    dhg = dense_bwd(g, c["hg"], w2, 30, 31)
    dh1 = (dhg.astype(_F32) * _gelu_grad(c["h1"])).astype(dt)
    dy = dense_bwd(dh1, c["y"], w1, 28, 29)
    # ---- y = LN(x1; g2, b2)
    dyf = dy.astype(_F32)
    add(26, jnp.sum(_rows(dyf * c["xhat2"]), axis=0, keepdims=True))
    add(27, jnp.sum(_rows(dyf), axis=0, keepdims=True))
    dx1 = dx1 + _ln_bwd(dyf, c["xhat2"], c["rstd2"], g2)
    dx1c = dx1.astype(dt)

    # ---- res split: [o (nmm), aggv (nfv), agga (nfa)]
    do = dx1c[:, :nmm]
    daggv = dx1c[:, nmm:nmm + nfv].astype(_F32)
    dagga = dx1c[:, nmm + nfv:].astype(_F32)

    # ---- o = op @ wo_p + bo_p
    dop = dense_bwd(do, c["op"], wo_p, 24, 25)
    # ---- pair attention
    doph = _to_heads(dop, h)
    dqph, dkph, dvph = _attn_bwd(c["pp"], c["qph"], c["kph"], c["vph"],
                                 c["oph"], doph, scale, dt)
    dqp = _from_heads(dqph, b)
    dkp = _from_heads(dkph, b)                         # (B, nfv*nfa, inner)
    dvp = _from_heads(dvph, b)                         # (B, nfv*nfa, d)
    # qp = xmm2 @ wq_p + bq_p
    dxmm2 = dense_bwd(dqp, c["xmm2"], wq_p, 18, 19)
    # kp[i,j] = aggv_i @ wk_p[:d] + agga_j @ wk_p[d:] + bk_p  (PairDense)
    dk1, dk2 = _pair_sum_bwd(dkp, nfv, nfa)
    dv1, dv2 = _pair_sum_bwd(dvp, nfv, nfa)
    add(20, jnp.concatenate(
        [_dot(_rows(c["aggv"]), _rows(dk1.astype(dt)), _DW2),
         _dot(_rows(c["agga"]), _rows(dk2.astype(dt)), _DW2)], axis=0))
    add(21, jnp.sum(_rows(dk1), axis=0, keepdims=True))
    add(22, jnp.concatenate(
        [_dot(_rows(c["aggv"]), _rows(dv1.astype(dt)), _DW2),
         _dot(_rows(c["agga"]), _rows(dv2.astype(dt)), _DW2)], axis=0))
    add(23, jnp.sum(_rows(dv1), axis=0, keepdims=True))
    daggv = daggv + (_dot(_rows(dk1.astype(dt)), wk_p[:d], _DX2)
                     + _dot(_rows(dv1.astype(dt)), wv_p[:d], _DX2)
                     ).reshape(b, nfv, d)
    dagga = dagga + (_dot(_rows(dk2.astype(dt)), wk_p[d:], _DX2)
                     + _dot(_rows(dv2.astype(dt)), wv_p[d:], _DX2)
                     ).reshape(b, nfa, d)

    # ---- aggregate branches
    def branch_bwd(dagg, oagg, pr, qh, kh, vh, oh, xq, xsrc,
                   wq, wkv, wp, idx_q, idx_kv, idx_p):
        dov = dense_bwd(dagg.astype(dt), oagg, wp, idx_p, idx_p + 1)
        dovh = _to_heads(dov, h)
        dqh, dkh, dvh = _attn_bwd(pr, qh, kh, vh, oh, dovh, scale, dt)
        dq = _from_heads(dqh, b)
        dkv = jnp.concatenate([_from_heads(dkh, b), _from_heads(dvh, b)],
                              axis=-1)
        dxq = dense_bwd(dq, xq, wq, idx_q, idx_q + 1)
        dxsrc = dense_bwd(dkv, xsrc, wkv, idx_kv, idx_kv + 1)
        return dxq, dxsrc

    dxmv, dxv = branch_bwd(daggv, c["ov"], c["pv"], c["qvh"], c["kvh"],
                           c["vvh"], c["ovh"], c["xmv"], c["xv"],
                           wq_v, wkv_v, wp_v, 6, 8, 10)
    dxma, dxa_n = branch_bwd(dagga, c["oa"], c["pa"], c["qah"], c["kah"],
                             c["vah"], c["oah"], c["xma"], c["xan"],
                             wq_a, wkv_a, wp_a, 12, 14, 16)

    # ---- xmm (normalized fusion tokens): residual + the three query slices
    dxmm_n = dx1 + jnp.concatenate(
        [dxmm2.astype(_F32), dxmv.astype(_F32), dxma.astype(_F32)], axis=1)
    add(0, jnp.sum(_rows(dxmm_n * c["xhat_mm"]), axis=0, keepdims=True))
    add(1, jnp.sum(_rows(dxmm_n), axis=0, keepdims=True))
    dxf_ref[...] = _ln_bwd(dxmm_n, c["xhat_mm"], c["rstd_mm"], g_mm).astype(dt)

    dxvf = dxv.astype(_F32)
    add(2, jnp.sum(_rows(dxvf * c["xhat_i"]), axis=0, keepdims=True))
    add(3, jnp.sum(_rows(dxvf), axis=0, keepdims=True))
    dxi_ref[...] = _ln_bwd(dxvf, c["xhat_i"], c["rstd_i"], g_img).astype(dt)

    dxaf = dxa_n.astype(_F32)
    add(4, jnp.sum(_rows(dxaf * c["xhat_a"]), axis=0, keepdims=True))
    add(5, jnp.sum(_rows(dxaf), axis=0, keepdims=True))
    dxa_ref[...] = _ln_bwd(dxaf, c["xhat_a"], c["rstd_a"], g_aud).astype(dt)

    for idx, val in acc.items():
        dp_refs[idx][...] += val


# --------------------------------------------------------------------------- #
# VMEM planning
# --------------------------------------------------------------------------- #
# Budgets are in ESTIMATOR units (the _act_bytes/_weights_bytes sum counts
# every buffer as simultaneously live; Mosaic's stack allocator reuses dead
# temporaries, so real allocation runs ~1.5x below the estimate — measured
# on the v5e: pretrain-shape bwd tile 16 estimates 174.7 MiB and allocates
# 116.13 MiB against the 127 MiB cap). Calibration (B=64 ViT-B pretrain
# shape, bf16, r4 A/B):
#   fwd:  tile 8 = 343.5 us, tile 16 = 420.1 us  → budget set to pick 8
#   bwd:  tile 8 = 507 us,   tile 16 = 361 us    → budget set to pick 16
#         (tile 32 estimates 301 MiB → ~200 MiB real: cannot fit)
_FWD_BUDGET = 60 * 1024 * 1024
_BWD_BUDGET = 190 * 1024 * 1024
# Scoped-VMEM cap for the fused kernels (v5e physical VMEM is 128 MiB).
_VMEM_LIMIT = 127 * 1024 * 1024


def _param_shapes(d, inner, hidden):
    """(shape, is_ln) per PARAM_ORDER entry, biases as (1, f) rows."""
    v = lambda f: (1, f)
    return (
        (v(d), 1), (v(d), 1), (v(d), 1), (v(d), 1), (v(d), 1), (v(d), 1),
        ((d, d), 0), (v(d), 0), ((d, 2 * d), 0), (v(2 * d), 0),
        ((d, d), 0), (v(d), 0),
        ((d, d), 0), (v(d), 0), ((d, 2 * d), 0), (v(2 * d), 0),
        ((d, d), 0), (v(d), 0),
        ((d, inner), 0), (v(inner), 0), ((2 * d, inner), 0), (v(inner), 0),
        ((2 * d, d), 0), (v(d), 0), ((d, d), 0), (v(d), 0),
        (v(d), 1), (v(d), 1),
        ((d, hidden), 0), (v(hidden), 0), ((hidden, d), 0), (v(d), 0),
    )


def _weights_bytes(d, inner, hidden, item):
    total = 0
    for shape, is_ln in _param_shapes(d, inner, hidden):
        total += _vbytes(shape[0], shape[1], 4 if is_ln else item)
    return total


def _act_bytes(bt, tkns, nv, na, d, inner, hidden, h, item, bwd):
    """Rough padded working set of one grid step's activations/temps."""
    nmm, nfv, nfa = tkns
    nf = nmm + nfv + nfa
    pairs = nfv * nfa
    t = item
    rows = bt * (nf + nv + na)
    total = 0
    # in (x3) + out blocks, double-buffered
    total += 4 * (_vbytes(bt * nf, d, t) + _vbytes(bt * nv, d, t)
                  + _vbytes(bt * na, d, t))
    # LN f32 intermediates (xhat per input + y/x1) and dt casts
    total += 5 * _vbytes(rows, d, 4) + 3 * _vbytes(rows, d, t)
    # kv projections for both branches (dt) + head relayout copies
    total += 2 * (_vbytes(bt * nv, 2 * d, t) + _vbytes(bt * na, 2 * d, t))
    # pair k/v (dt) + head copies
    total += 2 * (_vbytes(bt * pairs, inner, t) + _vbytes(bt * pairs, d, t))
    # probabilities f32 (aggregate: nf_agg x src; pair: nmm x pairs)/head
    total += (_vbytes(bt * h * nfv, nv, 4) + _vbytes(bt * h * nfa, na, 4))
    total += _vbytes(bt * h * nmm, pairs, 4)
    # mlp temps
    total += _vbytes(bt * nf, hidden, 4 + t) + _vbytes(bt * nf, hidden, t)
    if bwd:
        total = 2 * total  # grads mirror most activations
        total += 3 * _vbytes(rows, d, 4)
    return total


def plan_tiles(b, tkns, nv, na, d, inner, hidden, h, itemsize):
    """(bt_fwd, bt_bwd): the largest batch tiles (divisors of b, <=32) whose
    estimator-unit working sets fit the per-direction budgets; None where
    nothing fits (the directions differ: the backward additionally holds the
    f32 parameter-gradient accumulators resident)."""
    item = max(min(itemsize, 4), 2)
    wb = _weights_bytes(d, inner, hidden, item)
    wb_bwd = wb + _weights_bytes(d, inner, hidden, 4)
    bt_fwd = bt_bwd = None
    for bt in sorted({min(b, 32), 16, 8, 4, 2, 1}, reverse=True):
        if bt > b or b % bt:
            continue
        fwd = wb + _act_bytes(bt, tkns, nv, na, d, inner, hidden, h, item,
                              False)
        bwd = wb_bwd + _act_bytes(bt, tkns, nv, na, d, inner, hidden, h,
                                  item, True)
        if bt_fwd is None and fwd <= _FWD_BUDGET:
            bt_fwd = bt
        if bt_bwd is None and bwd <= _BWD_BUDGET:
            bt_bwd = bt
    return bt_fwd, bt_bwd


def plan_batch_tile(b, tkns, nv, na, d, inner, hidden, h, itemsize):
    """Largest batch tile usable for BOTH directions (training route)."""
    bt_fwd, bt_bwd = plan_tiles(b, tkns, nv, na, d, inner, hidden, h,
                                itemsize)
    if bt_fwd is None or bt_bwd is None:
        return None
    return min(bt_fwd, bt_bwd)


# --------------------------------------------------------------------------- #
# pallas_call plumbing + custom VJP
# --------------------------------------------------------------------------- #
def _x_spec(bt, n, d):
    return pl.BlockSpec((bt, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _w_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _flops_fwd(b, nf, nv, na, d, inner, hidden, nmm, nfv, nfa):
    m = 2 * b * d
    fl = m * (nfv + nfa) * d          # agg q
    fl += m * (nv + na) * 2 * d       # agg kv
    fl += m * (nfv + nfa) * d         # agg proj
    fl += 2 * b * (nfv * nv + nfa * na) * (d // 1) * 2  # agg attn (approx)
    fl += m * nmm * inner             # pair q
    fl += m * (nfv + nfa) * (inner + d)  # pair k/v side projections
    fl += 2 * b * nmm * nfv * nfa * (inner + d)
    fl += m * nmm * d                 # pair proj
    fl += 2 * m * nf * hidden         # mlp
    return fl


def _prep(params, dt):
    """Weights cast to the compute dtype, LN params to f32, 1-d biases to
    (1, f) lane rows — done INSIDE the custom VJP so parameter gradients
    come back f32 with a single rounding."""
    return tuple(
        (p.astype(jnp.float32) if i in _LN_IDX else p.astype(dt)).reshape(
            (1, -1) if p.ndim == 1 else p.shape)
        for i, p in enumerate(params)
    )


def _fwd_call(xf, xi, xa, orig_params, cfg, bt, interpret):
    params = _prep(orig_params, xf.dtype)
    b, nf, d = xf.shape
    nv, na = xi.shape[1], xa.shape[1]
    (h, nmm, nfv, nfa, scale, eps) = cfg
    hidden = params[28].shape[-1]
    inner = params[18].shape[-1]
    grid = (b // bt,)
    in_specs = [_x_spec(bt, nf, d), _x_spec(bt, nv, d), _x_spec(bt, na, d)]
    in_specs += [_w_spec(p.shape) for p in params]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=_x_spec(bt, nf, d),
        out_shape=jax.ShapeDtypeStruct((b, nf, d), xf.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=_flops_fwd(b, nf, nv, na, d, inner, hidden, nmm, nfv, nfa),
            bytes_accessed=(xf.size + xi.size + xa.size) * xf.dtype.itemsize
            + sum(p.size * p.dtype.itemsize for p in params),
            transcendentals=b * h * (nmm * nfv * nfa + nfv * nv + nfa * na),
        ),
    )(xf, xi, xa, *params)


def _bwd_call(xf, xi, xa, orig_params, g, cfg, bt, interpret):
    params = _prep(orig_params, xf.dtype)
    b, nf, d = xf.shape
    nv, na = xi.shape[1], xa.shape[1]
    grid = (b // bt,)
    nsteps = b // bt
    in_specs = [_x_spec(bt, nf, d), _x_spec(bt, nv, d), _x_spec(bt, na, d)]
    in_specs += [_w_spec(p.shape) for p in params]
    in_specs += [_x_spec(bt, nf, d)]
    out_specs = [_x_spec(bt, nf, d), _x_spec(bt, nv, d), _x_spec(bt, na, d)]
    out_specs += [_w_spec(p.shape) for p in params]
    out_shape = [jax.ShapeDtypeStruct((b, nf, d), xf.dtype),
                 jax.ShapeDtypeStruct((b, nv, d), xi.dtype),
                 jax.ShapeDtypeStruct((b, na, d), xa.dtype)]
    out_shape += [jax.ShapeDtypeStruct(p.shape, jnp.float32) for p in params]
    hidden = params[28].shape[-1]
    inner = params[18].shape[-1]
    (h, nmm, nfv, nfa, scale, eps) = cfg
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg),
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=3 * _flops_fwd(b, nf, nv, na, d, inner, hidden, nmm, nfv,
                                 nfa),
            bytes_accessed=2 * ((xf.size + xi.size + xa.size)
                                * xf.dtype.itemsize
                                + sum(p.size * p.dtype.itemsize
                                      for p in params)),
            transcendentals=b * h * (nmm * nfv * nfa + nfv * nv + nfa * na),
        ),
    )(xf, xi, xa, *params, g)
    # dparams are f32 in prepped shapes; restore the original 1-d biases.
    dparams = tuple(dp.reshape(p.shape)
                    for dp, p in zip(outs[3:], orig_params))
    return outs[0], outs[1], outs[2], dparams


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused(xf, xi, xa, params, cfg, bts, interpret):
    return _fwd_call(xf, xi, xa, params, cfg, bts[0], interpret)


def _fused_fwd(xf, xi, xa, params, cfg, bts, interpret):
    return _fwd_call(xf, xi, xa, params, cfg, bts[0], interpret), (xf, xi,
                                                                   xa, params)


def _fused_bwd(cfg, bts, interpret, res, g):
    xf, xi, xa, params = res
    dxf, dxi, dxa, dparams = _bwd_call(xf, xi, xa, params, g, cfg, bts[1],
                                       interpret)
    dparams = tuple(dp.astype(p.dtype) for dp, p in zip(dparams, params))
    return dxf, dxi, dxa, dparams


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_factorized_block(
    x_fusion: jnp.ndarray,
    x_image: jnp.ndarray,
    x_audio: jnp.ndarray,
    params: tuple,
    *,
    num_heads: int,
    fusion_tkns: tuple[int, int, int],
    scale: float,
    eps: float = 1e-5,
    batch_tile: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused factorized_mmi FusionBlock: returns the new fusion tokens.

    ``params`` is a 32-tuple in PARAM_ORDER (original dtypes: f32 params,
    1-d biases). Weight casting to the compute dtype and the (1, f) bias
    row reshape happen INSIDE the custom VJP, so parameter gradients come
    back f32 with a single rounding (the kernel accumulates them in f32
    across batch tiles).
    """
    import os

    nmm, nfv, nfa = fusion_tkns
    b, nf, d = x_fusion.shape
    dt = x_fusion.dtype
    if batch_tile is None and os.environ.get("DAVF_FUSED_TILE"):
        batch_tile = int(os.environ["DAVF_FUSED_TILE"])  # hw calibration
    if batch_tile is None:
        inner = params[18].shape[-1]
        hidden = params[28].shape[-1]
        bts = plan_tiles(b, tuple(fusion_tkns), x_image.shape[1],
                         x_audio.shape[1], d, inner, hidden, num_heads,
                         jnp.dtype(dt).itemsize)
        if bts[0] is None or bts[1] is None:
            raise ValueError("no batch tile fits VMEM; caller should route "
                             "to the unfused path (use fits())")
    else:
        bts = (int(batch_tile), int(batch_tile))
    cfg = (num_heads, nmm, nfv, nfa, float(scale), float(eps))
    return _fused(x_fusion, x_image, x_audio, tuple(params), cfg,
                  tuple(bts), bool(interpret))


def fits(b, fusion_tkns, nv, na, d, inner, hidden, num_heads,
         itemsize) -> bool:
    """Routing feasibility: True iff some batch tile fits both directions."""
    return plan_batch_tile(b, tuple(fusion_tkns), nv, na, d, inner, hidden,
                           num_heads, itemsize) is not None
