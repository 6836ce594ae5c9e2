"""C++ decode stage tests using generated media (WAV + animated GIF)."""
import struct
import wave

import numpy as np
import pytest

from deepavfusion_tpu.data import avreader


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    """2 s stereo 44.1 kHz with a 440 Hz tone."""
    path = tmp_path_factory.mktemp("media") / "tone.wav"
    rate = 44100
    t = np.arange(rate * 2) / rate
    tone = (0.5 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
    stereo = np.stack([tone, tone], 1).reshape(-1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(stereo.tobytes())
    return str(path), rate, tone


@pytest.fixture(scope="module")
def gif_file(tmp_path_factory):
    """10-frame animated GIF, 64×48, each frame a distinct solid gray level."""
    from PIL import Image

    path = tmp_path_factory.mktemp("media") / "anim.gif"
    frames = [
        Image.new("RGB", (64, 48), (i * 25, i * 25, i * 25)) for i in range(10)
    ]
    frames[0].save(
        str(path), save_all=True, append_images=frames[1:], duration=100, loop=0
    )
    return str(path)


def test_audio_reader_decodes_tone(wav_file):
    path, rate, tone = wav_file
    r = avreader.AudioReader(path, rate=16000)
    assert r.orig_rate == 44100
    assert abs(r.duration - 2.0) < 0.05
    wav = r.read(0.0, 1.0)
    assert wav.shape == (1, 16000)
    assert wav.dtype == np.float32
    # dominant frequency ≈ 440 Hz
    spec = np.abs(np.fft.rfft(wav[0]))
    peak_hz = spec.argmax() * 16000 / 16000
    assert abs(peak_hz - 440) < 5
    assert np.abs(wav).max() <= 1.0


def test_audio_reader_native_rate_exact_values(wav_file):
    path, rate, tone = wav_file
    r = avreader.AudioReader(path)  # no resample
    wav = r.read(0.0, 0.5)
    assert wav.shape == (1, 22050)
    # swresample's standard -3 dB stereo→mono downmix: 0.707·L + 0.707·R
    # (identical to PyAV's AudioResampler(layout='mono'), i.e. reference parity)
    want = tone[:22050].astype(np.float32) / 32768.0 * np.sqrt(2.0, dtype=np.float32)
    np.testing.assert_allclose(wav[0], want, atol=2e-3)


def test_audio_reader_pads_past_end(wav_file):
    path, _, _ = wav_file
    r = avreader.AudioReader(path, rate=8000)
    wav = r.read(1.5, 3.5)  # extends 1.5 s past EOF → symmetric pad
    assert wav.shape == (1, 16000)
    assert np.isfinite(wav).all()


def test_video_reader_frames(gif_file):
    r = avreader.VideoReader(gif_file)
    assert (r.width, r.height) == (64, 48)
    frame, ts = r.precise_frame(0.45)
    assert frame.shape == (48, 64, 3)
    # frame at ~0.45 s is the 5th (level 4*25=100) at 10 fps
    assert abs(int(frame[0, 0, 0]) - 100) <= 26
    frame2, ts2 = r.quick_random_frame(0.0, 0.9)
    assert frame2.shape == (48, 64, 3)
    # solid frames: all pixels equal
    assert frame2.std() < 1.0


def test_video_reader_resize(gif_file):
    r = avreader.VideoReader(gif_file)
    frame, _ = r.precise_frame(0.0, size=(32, 24))
    assert frame.shape == (24, 32, 3)


def test_video_reader_clip(gif_file):
    r = avreader.VideoReader(gif_file)
    frames, ts = r.get_clip(0.0, 0.5, fps=10)
    assert len(frames) == 5
    levels = [int(f[0, 0, 0]) for f in frames]
    assert levels == sorted(levels)  # monotonically brighter


@pytest.fixture(scope="module")
def h264_clip(tmp_path_factory):
    """Real H.264+AAC mp4 from the native corpus encoder (avencode.cpp)."""
    import subprocess
    from pathlib import Path

    native = Path(avreader.__file__).parent.parent / "native"
    enc = native / "avencode"
    if not enc.exists():
        subprocess.run(["make", "-C", str(native), "avencode"], check=True,
                       capture_output=True)
    path = tmp_path_factory.mktemp("media") / "clip.mp4"
    subprocess.run([str(enc), str(path), "6", "25", "320", "240", "7"],
                   check=True, capture_output=True)
    return str(path)


def test_avreader_combined_single_open(h264_clip):
    """AVReader serves both streams from one container open, matching the
    separate VideoReader/AudioReader outputs."""
    r = avreader.AVReader(h264_clip, rate=16000)
    assert r.width == 320 and r.height == 240
    assert r.rate == 16000
    w1 = r.read(1.0, 4.0)
    a = avreader.AudioReader(h264_clip, rate=16000)
    w2 = a.read(1.0, 4.0)
    np.testing.assert_array_equal(w1, w2)
    assert w1.shape == (1, 48000)
    f, ts = r.precise_frame(2.0)
    assert f.shape == (240, 320, 3)
    r.close()
    a.close()


def test_fused_crop_decode_matches_pil(h264_clip):
    """Fused crop+scale decode ≈ decode-full → PIL crop+bilinear resize
    (different resampling kernels: swscale AREA vs PIL; small tolerance)."""
    import ctypes

    from PIL import Image

    r = avreader.VideoReader(h264_clip)
    full, ts = r.precise_frame(2.0)
    crop = (60, 20, 180, 180)
    out = np.empty((112, 112, 3), np.uint8)
    ts2 = r._lib.avdec_video_frame_crop(
        r._h, 2.0, 1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        *crop, 112, 112)
    assert abs(ts - ts2) < 1e-6
    x, y, cw, ch = crop
    pil = np.asarray(Image.fromarray(full).crop((x, y, x + cw, y + ch))
                     .resize((112, 112), Image.BILINEAR))
    diff = np.abs(pil.astype(np.float32) - out.astype(np.float32))
    assert diff.mean() < 4.0, diff.mean()
    r.close()


def test_video_dataset_fused_path_shapes(h264_clip, tmp_path):
    """VideoDataset takes the fused path when the transform has crop_spec."""
    import os

    from deepavfusion_tpu.data import datasets, transforms

    db = datasets.VideoDataset(
        base_path=os.path.dirname(h264_clip),
        video_files=[os.path.basename(h264_clip)],
        visual_transform=transforms.ImageTrainTransform(64, 0.5),
        audio_transform=transforms.AudioTrainTransform(16000, 3.0, 32),
        temporal_jitter=True,
    )
    s = db[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["image"].dtype == np.float32
    assert s["audio"].shape == (32, 192, 1)
    # normalized output: roughly centered stats
    assert abs(float(s["image"].mean())) < 3.0


def test_eval_transform_crop_spec_center():
    from deepavfusion_tpu.data import transforms

    t = transforms.ImageEvalTransform(224)
    (x, y, cw, ch), out, flip = t.crop_spec(640, 360)
    assert not flip and out == (224, 224)
    assert cw == ch == int(round(360 * 224 / t.resize_to))
    assert x == (640 - cw) // 2 and y == (360 - ch) // 2


def test_dense_dataset_fused_path(h264_clip):
    """DenseVideoDataset takes the fused single-open path with per-frame
    crop re-draws."""
    import os

    from deepavfusion_tpu.data import datasets, transforms

    db = datasets.DenseVideoDataset(
        base_path=os.path.dirname(h264_clip),
        video_files=[os.path.basename(h264_clip)],
        visual_transform=transforms.ImageEvalTransform(64),
        audio_transform=transforms.AudioEvalTransform(16000, 3.0, 32),
        dense_n=4, dense_span=5,
    )
    s = db[0]
    assert s["image"].shape == (4, 64, 64, 3)
    assert s["audio"].shape == (4, 32, 192, 1)
    assert np.isfinite(s["image"]).all() and np.isfinite(s["audio"]).all()


def test_mixture_dataset_fused_path(h264_clip):
    """MixtureVideoDataset sums K sources through the fused single-open path."""
    import os
    import shutil

    from deepavfusion_tpu.data import datasets, transforms

    second = h264_clip.replace(".mp4", "_b.mp4")
    if not os.path.exists(second):
        shutil.copy(h264_clip, second)
    db = datasets.MixtureVideoDataset(
        base_path=os.path.dirname(h264_clip),
        video_files=[os.path.basename(h264_clip), os.path.basename(second)],
        visual_transform=transforms.ImageTrainTransform(64, 0.5),
        audio_transform=transforms.AudioTrainTransform(16000, 3.0, 32,
                                                       random_vol=False),
        num_mixtures=2, temporal_jitter=True,
    )
    s = db[0]
    assert s["image"].shape == (64, 64, 3)
    assert s["audio"].shape == (32, 192, 1)
    assert s["mixed_audio"].shape == (32, 192, 1)
    assert s["frames"].shape == (2, 64, 64, 3)
    assert s["waveforms"].shape == (2, 48000)


def test_avsync_dataset_fused_path(h264_clip):
    """AVSyncVideoDataset decodes the whole clip with one consistent fused
    crop (temporally consistent augmentation)."""
    import os

    from deepavfusion_tpu.data import datasets, transforms

    db = datasets.AVSyncVideoDataset(
        base_path=os.path.dirname(h264_clip),
        video_files=[os.path.basename(h264_clip)],
        visual_transform=transforms.ImageTrainTransform(64, 0.5),
        audio_transform=transforms.AudioEvalTransform(16000, 3.0, 32),
        num_frames=4, video_rate=4,
    )
    s = db[0]
    assert s["video"].shape == (4, 64, 64, 3)
    assert s["audio"].shape == (32, 192, 1)
    assert s["sync"] in (0, 1)


def test_avsync_dataset_fallback_consistent_augmentation(h264_clip):
    """The non-fused fallback (custom transform without crop_spec) must draw
    ONE augmentation per clip, like the fused path, by replaying the RNG
    state for every frame (ADVICE r2 #1)."""
    import os
    import random as pyrandom

    import numpy as np

    from deepavfusion_tpu.data import datasets, transforms

    class RecordingTransform:
        # no crop_spec → exercises the fallback branch
        def __call__(self, img):
            v = pyrandom.random()
            return np.full((8, 8, 3), v, np.float32)

    db = datasets.AVSyncVideoDataset(
        base_path=os.path.dirname(h264_clip),
        video_files=[os.path.basename(h264_clip)],
        visual_transform=RecordingTransform(),
        audio_transform=transforms.AudioEvalTransform(16000, 3.0, 32),
        num_frames=4, video_rate=4,
    )
    s = db[0]
    draws = s["video"][:, 0, 0, 0]
    assert np.all(draws == draws[0]), "per-frame RNG draws differ within a clip"
    # and across samples the draw still varies (RNG advanced past the clip)
    s2 = db[0]
    assert s2["video"][0, 0, 0, 0] != draws[0]
