"""Audio DSP front-end: STFT, HTK mel filterbank, log-mel, ISTFT, mel→linear.

TPU-native replacement for the reference's torchaudio pipeline
(reference: util/audio_transforms.py:3-35 re-exporting torchaudio.transforms;
canonical chain at train.py:50-54:
    Pad → RandomVol → MelSpectrogram(n_fft=rate*0.05, hop=rate/64, n_mels=128) → Log).

All functions are pure jax.numpy and jit/vmap-friendly so the front-end can run
either on-host (CPU backend) inside the input pipeline or on-device fused into
the train step. Semantics match torchaudio 2.x defaults exactly:

  * Spectrogram: center=True reflect pad by n_fft//2, periodic Hann window of
    win_length=n_fft, hop_length, onesided rFFT, power=2.0, no normalization.
  * MelScale: HTK mel scale (2595*log10(1+f/700)), f_min=0, f_max=rate/2,
    norm=None, triangular overlapping filters over n_fft//2+1 linear bins.
  * Log: log10(x + 1e-7)  (reference: util/audio_transforms.py:29-35).
  * InverseSpectrogram: overlap-add ISTFT with window-envelope normalization,
    used by the separation eval (reference: eval_avsrcsep.py:264-277).

Shape convention follows torchaudio: waveform (..., time) → mel (..., n_mels, frames)
with frames = time // hop + 1 for center=True. The reference trims the last
frame ([:, :, :-1], e.g. datasets.py:242) giving 192 frames for 3 s @ 16 kHz.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# Window / filterbank construction (host-side numpy, cached)
# --------------------------------------------------------------------------- #
@functools.lru_cache(maxsize=None)
def hann_window(win_length: int, periodic: bool = True) -> np.ndarray:
    """Periodic Hann window matching torch.hann_window defaults."""
    n = win_length if not periodic else win_length + 1
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))
    return w[:win_length].astype(np.float32)


def hz_to_mel(freq, htk: bool = True):
    freq = np.asarray(freq, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    raise NotImplementedError("only HTK scale is used by the reference")


def mel_to_hz(mel, htk: bool = True):
    mel = np.asarray(mel, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    raise NotImplementedError


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """Triangular HTK mel filterbank, shape (n_freqs, n_mels).

    Matches torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk'),
    which the reference's MelSpectrogram uses by default.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


# --------------------------------------------------------------------------- #
# STFT / spectrogram
# --------------------------------------------------------------------------- #
def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """Split (..., T) into overlapping frames (..., n_frames, frame_length)."""
    n_frames = (x.shape[-1] - frame_length) // hop + 1
    idx = np.arange(frame_length)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[..., idx]


def spectrogram(
    waveform: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
    power: float | None = 2.0,
    center: bool = True,
):
    """torchaudio.transforms.Spectrogram equivalent.

    waveform: (..., time). Returns (..., n_fft//2+1, n_frames) power/magnitude
    spectrogram (power=None returns the complex STFT).
    """
    win_length = win_length or n_fft
    window = jnp.asarray(hann_window(win_length))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    if center:
        pad = n_fft // 2
        waveform = jnp.pad(
            waveform,
            [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)],
            mode="reflect",
        )
    frames = frame_signal(waveform, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)          # (..., frames, bins)
    spec = jnp.swapaxes(spec, -1, -2)                      # (..., bins, frames)
    if power is None:
        return spec
    mag2 = spec.real**2 + spec.imag**2
    if power == 2.0:
        return mag2
    return mag2 ** (power / 2.0)


def melspectrogram(
    waveform: jnp.ndarray,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    n_mels: int = 128,
    f_min: float = 0.0,
    f_max: float | None = None,
    power: float = 2.0,
) -> jnp.ndarray:
    """torchaudio.transforms.MelSpectrogram equivalent: (..., n_mels, frames)."""
    spec = spectrogram(waveform, n_fft, hop_length, power=power)
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, f_min, f_max))
    # (..., bins, frames) x (bins, mels) → (..., mels, frames)
    return jnp.einsum("...bf,bm->...mf", spec, fb)


def log_mel(
    waveform: jnp.ndarray,
    sample_rate: int = 16000,
    duration: float = 3.0,
    n_mels: int = 128,
    eps: float = 1e-7,
    trim_last: bool = True,
) -> jnp.ndarray:
    """The reference's full canonical audio feature: log10-mel, last frame trimmed.

    3 s @ 16 kHz → n_fft=800, hop=250 → 193 frames → 192 after trim
    (reference: train.py:50-54, datasets.py:242).
    """
    n_fft = int(sample_rate * 0.05)
    hop = int(sample_rate / 64)
    mel = melspectrogram(waveform, sample_rate, n_fft, hop, n_mels=n_mels)
    out = jnp.log10(mel + eps)
    if trim_last:
        out = out[..., :-1]
    return out


# --------------------------------------------------------------------------- #
# Inverse STFT + mel→linear lift (separation eval path)
# --------------------------------------------------------------------------- #
def inverse_spectrogram(
    spec: jnp.ndarray,
    length: int,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
) -> jnp.ndarray:
    """torchaudio.transforms.InverseSpectrogram equivalent (center=True).

    spec: complex (..., n_fft//2+1, n_frames) → waveform (..., length).
    Overlap-add with squared-window envelope normalization.
    """
    win_length = win_length or n_fft
    window = jnp.asarray(hann_window(win_length))
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window                                # (..., n_frames, n_fft)

    n_frames = frames.shape[-2]
    total = n_fft + hop_length * (n_frames - 1)
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))

    # Overlap-add via scatter-add on frame start offsets.
    idx = (np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None]).reshape(-1)
    out = jnp.zeros((flat.shape[0], total), flat.dtype)
    out = out.at[:, idx].add(flat.reshape(flat.shape[0], -1))

    env = np.zeros(total, np.float32)
    w2 = np.asarray(hann_window(win_length)) ** 2
    for i in range(n_frames):
        env[i * hop_length : i * hop_length + n_fft] += w2
    env = np.where(env > 1e-11, env, 1.0)
    out = out / jnp.asarray(env)

    pad = n_fft // 2
    out = out[:, pad : pad + length]
    return out.reshape(batch_shape + (length,))


def mel_to_linear(mel_mask: jnp.ndarray, sample_rate: int, n_fft: int) -> jnp.ndarray:
    """Lift a mel-domain mask to linear frequency via the filterbank.

    Plain unnormalized ``fb @ mask`` einsum, exactly as the reference does with
    torchaudio's MelScale.fb (reference: eval_avsrcsep.py:274-275,
    ``torch.einsum('bmt,fm->bft', pred_mask, fb)`` with fb (n_freqs, n_mels)).
    mel_mask: (..., n_mels, frames) → (..., n_fft//2+1, frames).
    """
    n_mels = mel_mask.shape[-2]
    fb = jnp.asarray(mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate))  # (bins, mels)
    return jnp.einsum("bm,...mf->...bf", fb, mel_mask)


# --------------------------------------------------------------------------- #
# Waveform transforms (reference: util/audio_transforms.py)
# --------------------------------------------------------------------------- #
def pad_flip_tile(waveform: jnp.ndarray, samples: int) -> jnp.ndarray:
    """Reference Pad: tile with alternating time-flips until long enough, crop.

    (reference: util/audio_transforms.py:19-27). Static-shape friendly: number
    of doublings is computed from the static input length.
    """
    t = waveform.shape[-1]
    while t < samples:
        waveform = jnp.concatenate([waveform, jnp.flip(waveform, axis=-1)], axis=-1)
        t = waveform.shape[-1]
    return waveform[..., :samples]


def random_vol(waveform: jnp.ndarray, key: jax.Array, gain_db=(-6.0, 6.0)) -> jnp.ndarray:
    """Reference RandomVol: uniform dB gain then clamp to [-1, 1]

    (reference: util/audio_transforms.py:8-17)."""
    g = jax.random.uniform(key, (), minval=gain_db[0], maxval=gain_db[1])
    return jnp.clip(waveform * 10.0 ** (g / 20.0), -1.0, 1.0)
