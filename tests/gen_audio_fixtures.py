"""Generate the committed golden fixtures for the mel audio front-end.

The torchaudio pipeline the reference depends on
(util/audio_transforms.py:3, MelSpectrogram(n_fft=800, hop=250, n_mels=128)
→ Log, trimmed 193→192 frames) is re-derived here INDEPENDENTLY of
deepavfusion_tpu/ops/audio.py, in torch:

  * STFT from ``torch.stft`` (the exact kernel torchaudio.Spectrogram wraps);
  * the HTK mel filterbank transcribed from the published
    ``torchaudio.functional.melscale_fbanks`` algorithm
    (norm=None, mel_scale='htk') — triangular filters between mel-spaced
    points, min(up-slope, down-slope) clamped at 0.

When a real torchaudio install is present (NOT the case in this image),
running with ``--torchaudio`` regenerates the fixture straight from
``torchaudio.functional.melscale_fbanks`` + ``torchaudio.transforms
.MelSpectrogram`` and asserts it matches this transcription bit-for-bit
(≤1e-6) before writing — committing from a torchaudio machine upgrades the
fixture provenance without changing any test.

Usage:  python tests/gen_audio_fixtures.py [--torchaudio]
Writes: tests/fixtures/audio_golden.npz
"""
import os
import sys

import numpy as np
import torch


def hz_to_mel(f):
    return 2595.0 * torch.log10(1.0 + f / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def melscale_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate):
    """Transcription of torchaudio.functional.melscale_fbanks
    (norm=None, mel_scale='htk'), float32 like torchaudio."""
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
    m_pts = torch.linspace(hz_to_mel(torch.tensor(f_min)),
                           hz_to_mel(torch.tensor(f_max)), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels + 1,)
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)  # (n_freqs, n_mels+2)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = torch.max(torch.zeros(1), torch.min(down_slopes, up_slopes))
    return fb                                              # (n_freqs, n_mels)


def mel_spectrogram(wav, sample_rate, n_fft, hop, n_mels):
    """torchaudio.transforms.MelSpectrogram equivalent: power-2 centered
    reflect-padded Hann STFT → fbank matmul. (..., n_mels, frames)."""
    spec = torch.stft(
        wav, n_fft=n_fft, hop_length=hop, window=torch.hann_window(n_fft),
        center=True, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    ).abs().pow(2.0)                                       # (..., bins, frames)
    fb = melscale_fbanks(n_fft // 2 + 1, 0.0, sample_rate / 2, n_mels,
                         sample_rate)
    return torch.einsum("fm,...ft->...mt", fb, spec)


def main():
    use_torchaudio = "--torchaudio" in sys.argv
    rate, n_fft, hop, n_mels = 16000, 800, 250, 128

    torch.manual_seed(0)
    t = torch.arange(rate * 3, dtype=torch.float32) / rate
    waves = {
        "noise": torch.randn(2, rate * 3) * 0.1,
        "chirp": torch.sin(2 * np.pi * (200 * t + 1500 * t ** 2)).unsqueeze(0),
        "tone_1s": torch.sin(2 * np.pi * 440 * t[:rate]).unsqueeze(0),
    }

    fb = melscale_fbanks(n_fft // 2 + 1, 0.0, rate / 2, n_mels, rate)
    fb_small = melscale_fbanks(257, 0.0, rate / 2, 64, rate)

    if use_torchaudio:
        import torchaudio

        fb_ta = torchaudio.functional.melscale_fbanks(
            n_fft // 2 + 1, 0.0, rate / 2, n_mels, rate, norm=None,
            mel_scale="htk")
        assert torch.allclose(fb, fb_ta, atol=1e-6), "fbank transcription drift"
        mel_t = torchaudio.transforms.MelSpectrogram(
            sample_rate=rate, n_fft=n_fft, hop_length=hop, n_mels=n_mels)
        for name, w in waves.items():
            assert torch.allclose(mel_spectrogram(w, rate, n_fft, hop, n_mels),
                                  mel_t(w), atol=1e-4), name
        print("verified against real torchaudio")

    out = {
        "rate": np.int64(rate), "n_fft": np.int64(n_fft),
        "hop": np.int64(hop), "n_mels": np.int64(n_mels),
        "fbank": fb.numpy(), "fbank_257x64": fb_small.numpy(),
    }
    for name, w in waves.items():
        mel = mel_spectrogram(w, rate, n_fft, hop, n_mels)
        out[f"wav_{name}"] = w.numpy()
        out[f"mel_{name}"] = mel.numpy()
        # the reference's canonical feature: log10(mel + 1e-7), 193→192 trim
        out[f"logmel_{name}"] = torch.log10(mel + 1e-7)[..., :-1].numpy()

    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "fixtures", "audio_golden.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {dest} ({os.path.getsize(dest) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
