"""Golden tests for the audio front-end vs torch.stft / torchaudio semantics."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from deepavfusion_tpu.ops import audio


RATE = 16000
N_FFT = int(RATE * 0.05)   # 800
HOP = int(RATE / 64)       # 250


def test_hann_window_matches_torch():
    ours = audio.hann_window(N_FFT)
    theirs = torch.hann_window(N_FFT).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_spectrogram_matches_torch_stft():
    rng = np.random.RandomState(0)
    wav = rng.randn(2, RATE * 3).astype(np.float32) * 0.1

    ours = np.asarray(audio.spectrogram(jnp.asarray(wav), N_FFT, HOP, power=2.0))

    t = torch.stft(
        torch.from_numpy(wav), n_fft=N_FFT, hop_length=HOP,
        window=torch.hann_window(N_FFT), center=True, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    theirs = t.abs().pow(2).numpy()
    assert ours.shape == theirs.shape == (2, N_FFT // 2 + 1, 193)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_complex_spectrogram_matches_torch_stft():
    rng = np.random.RandomState(1)
    wav = rng.randn(1, RATE).astype(np.float32)
    ours = np.asarray(audio.spectrogram(jnp.asarray(wav), N_FFT, HOP, power=None))
    t = torch.stft(
        torch.from_numpy(wav), n_fft=N_FFT, hop_length=HOP,
        window=torch.hann_window(N_FFT), center=True, pad_mode="reflect",
        return_complex=True,
    ).numpy()
    np.testing.assert_allclose(ours.real, t.real, atol=2e-3)
    np.testing.assert_allclose(ours.imag, t.imag, atol=2e-3)


def test_mel_filterbank_properties():
    """HTK mel filterbank invariants per torchaudio melscale_fbanks(norm=None)."""
    fb = audio.mel_filterbank(N_FFT // 2 + 1, 128, RATE)
    assert fb.shape == (401, 128)
    assert fb.min() >= 0.0
    # Each filter is a triangle peaking at 1.0-ish (unnormalized slopes ≤ 1)
    assert fb.max() <= 1.0 + 1e-6
    # Interior linear bins are covered by at least one filter
    coverage = fb[1:-1].sum(axis=1)
    assert (coverage > 0).mean() > 0.95
    # Mel center frequencies are monotonically increasing
    centers = fb.argmax(axis=0)
    assert np.all(np.diff(centers.astype(np.int64)) >= 0)


def test_mel_filterbank_analytic_centers():
    """Filter k peaks at the linear bin nearest to mel point k+1 (HTK)."""
    n_mels = 16
    fb = audio.mel_filterbank(N_FFT // 2 + 1, n_mels, RATE)
    m_pts = np.linspace(0.0, 2595.0 * np.log10(1 + (RATE / 2) / 700.0), n_mels + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    bin_hz = (RATE // 2) / (N_FFT // 2)
    for k in range(n_mels):
        peak_bin = fb[:, k].argmax()
        assert abs(peak_bin * bin_hz - f_pts[k + 1]) <= 2 * bin_hz


def test_log_mel_shape_and_trim():
    wav = jnp.zeros((4, RATE * 3))
    out = audio.log_mel(wav, RATE, 3.0, n_mels=128)
    assert out.shape == (4, 128, 192)  # 193 frames trimmed to 192
    # silence → log10(eps)
    np.testing.assert_allclose(np.asarray(out), np.log10(1e-7), atol=1e-5)


def test_istft_roundtrip():
    rng = np.random.RandomState(2)
    wav = rng.randn(2, RATE * 3).astype(np.float32)
    spec = audio.spectrogram(jnp.asarray(wav), N_FFT, HOP, power=None)
    rec = np.asarray(audio.inverse_spectrogram(spec, wav.shape[-1], N_FFT, HOP))
    np.testing.assert_allclose(rec, wav, atol=1e-3)


def test_istft_matches_torch():
    rng = np.random.RandomState(3)
    wav = rng.randn(RATE).astype(np.float32)
    spec_t = torch.stft(
        torch.from_numpy(wav), n_fft=N_FFT, hop_length=HOP,
        window=torch.hann_window(N_FFT), center=True, return_complex=True,
    )
    # Apply an arbitrary mask so we exercise a non-trivial inversion
    mask = torch.rand(spec_t.shape)
    masked = spec_t * mask
    theirs = torch.istft(
        masked, n_fft=N_FFT, hop_length=HOP, window=torch.hann_window(N_FFT),
        center=True, length=RATE,
    ).numpy()
    ours = np.asarray(
        audio.inverse_spectrogram(jnp.asarray(masked.numpy()), RATE, N_FFT, HOP)
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-3)


def test_pad_flip_tile():
    wav = jnp.asarray(np.arange(5, dtype=np.float32)[None])
    out = np.asarray(audio.pad_flip_tile(wav, 12))
    expected = np.array([0, 1, 2, 3, 4, 4, 3, 2, 1, 0, 0, 1], dtype=np.float32)
    np.testing.assert_array_equal(out[0], expected)
    # No-op when long enough
    out2 = np.asarray(audio.pad_flip_tile(wav, 3))
    np.testing.assert_array_equal(out2[0], np.array([0, 1, 2], np.float32))


def test_random_vol_bounds():
    import jax

    wav = jnp.ones((1, 100)) * 0.9
    out = audio.random_vol(wav, jax.random.key(0))
    assert np.asarray(out).max() <= 1.0
    assert np.asarray(out).min() >= 0.9 * 10 ** (-6 / 20) - 1e-6


def test_mel_to_linear_shape():
    mask = jnp.ones((1, 128, 193)) * 0.5
    lin = audio.mel_to_linear(mask, RATE, N_FFT)
    assert lin.shape == (1, 401, 193)
    fb = audio.mel_filterbank(401, 128, RATE)
    np.testing.assert_allclose(np.asarray(lin)[0, :, 0], fb.sum(1) * 0.5, rtol=1e-5)


def test_random_vol_numpy_matches_jax_bounds():
    from deepavfusion_tpu.data import transforms as T

    wav = np.ones((1, 1000), np.float32) * 0.5
    out = T.random_vol_np(wav)
    # ±6 dB on 0.5: [0.25, 1.0] clipped
    assert 0.24 <= out.max() <= 1.0


def test_spectrogram_frame_count_formula():
    # center=True: frames = T//hop + 1 for any length
    for t in [16000, 48000, 12345]:
        wav = jnp.zeros((1, t))
        s = audio.spectrogram(wav, N_FFT, HOP, power=2.0)
        assert s.shape[-1] == t // HOP + 1


# ---------------------------------------------------------------------------
# Committed golden fixtures (tests/fixtures/audio_golden.npz, generated by
# tests/gen_audio_fixtures.py): an INDEPENDENT torch transcription of the
# torchaudio MelSpectrogram pipeline (torch.stft + the published
# melscale_fbanks algorithm, norm=None/htk). Regenerating on a machine with
# real torchaudio (--torchaudio) verifies the transcription against
# torchaudio itself before writing. Pins both the JAX (ops/audio.py) and the
# numpy worker (data/transforms.py) front-ends. SURVEY.md hard part #1.
# ---------------------------------------------------------------------------
import os as _os

_FIX = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                     "fixtures", "audio_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(_FIX)


def test_golden_fbank_matches(golden):
    # 2e-5 abs: the fixture is computed with torch float32 transcendentals
    # (like torchaudio); ours uses float64 numpy — the residual is pure
    # float32 rounding in the mel-point exponentials, ~1 filterbank ulp.
    fb = audio.mel_filterbank(int(golden["n_fft"]) // 2 + 1,
                              int(golden["n_mels"]), int(golden["rate"]))
    np.testing.assert_allclose(fb, golden["fbank"], atol=2e-5)


def test_golden_fbank_small_matches(golden):
    fb = audio.mel_filterbank(257, 64, int(golden["rate"]))
    np.testing.assert_allclose(fb, golden["fbank_257x64"], atol=2e-5)


@pytest.mark.parametrize("name", ["noise", "chirp", "tone_1s"])
def test_golden_melspectrogram_jax(golden, name):
    wav = golden[f"wav_{name}"]
    mel = np.asarray(audio.melspectrogram(
        jnp.asarray(wav), int(golden["rate"]), int(golden["n_fft"]),
        int(golden["hop"]), n_mels=int(golden["n_mels"])))
    ref = golden[f"mel_{name}"]
    # rtol-dominated: mel power spans ~13 decades; near-zero bins are float32
    # rounding noise on both sides.
    np.testing.assert_allclose(mel, ref, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("name", ["noise", "chirp"])
def test_golden_logmel_numpy_worker(golden, name):
    """data/transforms.py worker path vs the committed log-mel (incl. the
    193→192 frame trim, reference datasets.py:242)."""
    from deepavfusion_tpu.data import transforms as T

    wav = golden[f"wav_{name}"]
    out = T.log_mel_np(wav, rate=int(golden["rate"]),
                       n_mels=int(golden["n_mels"]))
    # log10 amplifies float32 rounding of mel bins sitting at the 1e-7 eps
    # floor (chirp spectra have many near-zero bins); 0.02 dB-scale slack.
    np.testing.assert_allclose(out, golden[f"logmel_{name}"], atol=2e-2)
