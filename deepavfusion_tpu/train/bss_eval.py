"""BSS eval (SDR / SIR / SAR) — from-scratch numpy implementation of the
classic Vincent et al. 2006 bss_eval_sources criteria.

Replaces the reference's mir_eval dependency (eval_avsrcsep.py:15,307, called
with compute_permutation=False). The decomposition projects each estimated
source onto the subspace spanned by 512-tap delayed versions of the reference
sources (least-squares multichannel time-invariant filter):

    s_filt   = proj of est onto delays of the TRUE source
    e_interf = proj onto delays of ALL sources − s_filt
    e_artif  = est − proj onto all sources

    SDR = 10·log10 ‖s_filt‖² / ‖e_interf + e_artif‖²
    SIR = 10·log10 ‖s_filt‖² / ‖e_interf‖²
    SAR = 10·log10 ‖s_filt + e_interf‖² / ‖e_artif‖²
"""
from __future__ import annotations

import numpy as np
from scipy.linalg import toeplitz
from scipy.signal import fftconvolve


def _next_pow2(n: int) -> int:
    return 1 << (int(np.ceil(np.log2(n))))


def _project(reference_sources: np.ndarray, estimated_source: np.ndarray,
             flen: int) -> np.ndarray:
    """Least-squares projection of est onto delayed (0..flen-1) references."""
    nsrc, nsampl = reference_sources.shape
    n_fft = _next_pow2(nsampl + flen - 1)

    sf = np.fft.fft(
        np.hstack([reference_sources, np.zeros((nsrc, flen - 1))]), n=n_fft, axis=1
    )
    sef = np.fft.fft(np.hstack([estimated_source, np.zeros(flen - 1)]), n=n_fft)

    G = np.zeros((nsrc * flen, nsrc * flen))
    for i in range(nsrc):
        for j in range(i, nsrc):
            ssf = np.real(np.fft.ifft(sf[i] * np.conj(sf[j])))
            ss = toeplitz(np.hstack((ssf[0], ssf[-1 : -flen : -1])), r=ssf[:flen])
            G[i * flen : (i + 1) * flen, j * flen : (j + 1) * flen] = ss
            G[j * flen : (j + 1) * flen, i * flen : (i + 1) * flen] = ss.T

    D = np.zeros(nsrc * flen)
    for i in range(nsrc):
        ssef = np.real(np.fft.ifft(sf[i] * np.conj(sef)))
        D[i * flen : (i + 1) * flen] = np.hstack((ssef[0], ssef[-1 : -flen : -1]))

    try:
        C = np.linalg.solve(G, D).reshape(flen, nsrc, order="F")
    except np.linalg.LinAlgError:
        C = np.linalg.lstsq(G, D, rcond=None)[0].reshape(flen, nsrc, order="F")

    sproj = np.zeros(nsampl + flen - 1)
    for i in range(nsrc):
        sproj += fftconvolve(C[:, i], reference_sources[i])[: nsampl + flen - 1]
    return sproj


def _decompose(reference_sources: np.ndarray, estimated_source: np.ndarray,
               j: int, flen: int):
    nsampl = estimated_source.shape[0]
    s_true = np.hstack([reference_sources[j], np.zeros(flen - 1)])
    e_spat = _project(reference_sources[j : j + 1], estimated_source, flen) - s_true
    e_interf = (_project(reference_sources, estimated_source, flen)
                - s_true - e_spat)
    e_artif = -s_true - e_spat - e_interf
    e_artif[:nsampl] += estimated_source
    return s_true, e_spat, e_interf, e_artif


def _criteria(s_true, e_spat, e_interf, e_artif, eps=0.0):
    s_filt = s_true + e_spat
    sdr = 10.0 * np.log10(np.sum(s_filt**2) / (np.sum((e_interf + e_artif) ** 2)))
    sir = 10.0 * np.log10(np.sum(s_filt**2) / (np.sum(e_interf**2)))
    sar = 10.0 * np.log10(np.sum((s_filt + e_interf) ** 2) / (np.sum(e_artif**2)))
    return sdr, sir, sar


def bss_eval_sources(
    reference_sources: np.ndarray,
    estimated_sources: np.ndarray,
    compute_permutation: bool = False,
    flen: int = 512,
):
    """(sdr, sir, sar, perm) arrays of shape (nsrc,), matching
    mir_eval.separation.bss_eval_sources' interface."""
    reference_sources = np.atleast_2d(np.asarray(reference_sources, np.float64))
    estimated_sources = np.atleast_2d(np.asarray(estimated_sources, np.float64))
    nsrc = reference_sources.shape[0]

    if compute_permutation:
        from itertools import permutations

        best, best_perm = None, None
        for perm in permutations(range(nsrc)):
            crit = [
                _criteria(*_decompose(reference_sources,
                                      estimated_sources[perm[j]], j, flen))
                for j in range(nsrc)
            ]
            mean_sir = np.mean([c[1] for c in crit])
            if best is None or mean_sir > best[0]:
                best = (mean_sir, crit)
                best_perm = perm
        crit = best[1]
        perm = np.asarray(best_perm)
    else:
        crit = [
            _criteria(*_decompose(reference_sources, estimated_sources[j], j, flen))
            for j in range(nsrc)
        ]
        perm = np.arange(nsrc)

    sdr = np.asarray([c[0] for c in crit])
    sir = np.asarray([c[1] for c in crit])
    sar = np.asarray([c[2] for c in crit])
    return sdr, sir, sar, perm


class AVSrcSepEvaluator:
    """Accumulates per-sample SDR/SIR/SAR (reference eval_avsrcsep.py:280-313)."""

    def __init__(self):
        self.clear()

    def clear(self):
        self.name_list, self.sdr_list, self.sir_list, self.sar_list = [], [], [], []

    def update(self, waveform_gt: np.ndarray, waveform_pred: np.ndarray, name):
        sdr, sir, sar, _ = bss_eval_sources(waveform_gt, waveform_pred, False)
        self.name_list.append(name)
        self.sdr_list.append(sdr)
        self.sir_list.append(sir)
        self.sar_list.append(sar)

    def average_sdr_sir_sar(self):
        return (float(np.mean(self.sdr_list)), float(np.mean(self.sir_list)),
                float(np.mean(self.sar_list)))
