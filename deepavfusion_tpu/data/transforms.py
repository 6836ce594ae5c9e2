"""Host-side (dataloader-worker) transforms: numpy/PIL, torch-free.

Image transforms reproduce the torchvision ops the reference composes
(train.py:45-49 RandomResizedCrop/HFlip/Normalize; eval_linprobe.py:71-72
Resize(1/0.875)+CenterCrop; util/image_labels_transforms.py paired variants
with nearest-neighbor label interpolation). Audio transforms reproduce
util/audio_transforms.py on numpy, with a pure-numpy log-mel matching the
JAX ops/audio.py implementation bit-for-bit (same window/filterbank tables).
"""
from __future__ import annotations

import random
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from ..ops import audio as audio_ops

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


# --------------------------------------------------------------------------- #
# Image transforms (single image); each takes/returns PIL until to_array
# --------------------------------------------------------------------------- #
def random_resized_crop_params(w, h, scale=(0.5, 1.0), ratio=(3 / 4, 4 / 3),
                               rng: Optional[random.Random] = None):
    rng = rng or random
    area = w * h
    log_ratio = (np.log(ratio[0]), np.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = np.exp(rng.uniform(*log_ratio))
        cw = int(round(np.sqrt(target_area * aspect)))
        ch = int(round(np.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x = rng.randint(0, w - cw)
            y = rng.randint(0, h - ch)
            return x, y, cw, ch
    # fallback: center crop of the constrained aspect
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    return (w - cw) // 2, (h - ch) // 2, cw, ch


def random_resized_crop(img: Image.Image, size: int, scale=(0.5, 1.0),
                        labels: Sequence[Image.Image] = (),
                        rng=None, ratio=(3 / 4, 4 / 3)):
    x, y, cw, ch = random_resized_crop_params(img.width, img.height, scale, ratio, rng)
    img = img.crop((x, y, x + cw, y + ch)).resize((size, size), Image.BICUBIC)
    labels = [
        l.crop((x, y, x + cw, y + ch)).resize((size, size), Image.NEAREST)
        for l in labels
    ]
    return img, labels


def resize_center_crop(img: Image.Image, size: int, resize_to: Optional[int] = None,
                       labels: Sequence[Image.Image] = ()):
    resize_to = resize_to or size
    w, h = img.size
    s = resize_to / min(w, h)
    nw, nh = int(round(w * s)), int(round(h * s))
    img = img.resize((nw, nh), Image.BICUBIC)
    labels = [l.resize((nw, nh), Image.NEAREST) for l in labels]
    x = (nw - size) // 2
    y = (nh - size) // 2
    img = img.crop((x, y, x + size, y + size))
    labels = [l.crop((x, y, x + size, y + size)) for l in labels]
    return img, labels


def hflip(img: Image.Image, labels: Sequence[Image.Image] = (), p=0.5, rng=None):
    rng = rng or random
    if rng.random() < p:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
        labels = [l.transpose(Image.FLIP_LEFT_RIGHT) for l in labels]
    return img, labels


def to_normalized_array(img: Image.Image) -> np.ndarray:
    """PIL RGB → float32 HWC normalized with ImageNet stats."""
    x = np.asarray(img, np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class ImageTrainTransform:
    """RandomResizedCrop + HFlip + Normalize (reference train.py:45-49).

    ``normalize=False`` returns the post-crop/flip frame as uint8 HWC — the
    uint8-H2D lever: /255−mean/std then runs in-graph on device
    (ops/image.maybe_normalize_u8), 4x fewer host→device bytes."""

    def __init__(self, size: int = 224, crop_min: float = 0.5,
                 normalize: bool = True):
        self.size = size
        self.crop_min = crop_min
        self.normalize = normalize

    def __call__(self, img, labels=()):
        img, labels = random_resized_crop(img, self.size, (self.crop_min, 1.0),
                                          labels=labels)
        img, labels = hflip(img, labels)
        out = (to_normalized_array(img) if self.normalize
               else np.asarray(img, np.uint8))
        return (out, labels) if labels else out

    # Fused decode-time crop protocol (native avdec_video_frame_crop): the
    # dataset asks for the crop rect up front, the C++ stage does crop+scale
    # during decode, and only flip+normalize run in Python. Pixel-resampling
    # kernel differs slightly from the PIL path (swscale AREA/BILINEAR vs PIL
    # BICUBIC) — an augmentation-path divergence, tested to be small.
    def crop_spec(self, w: int, h: int):
        x, y, cw, ch = random_resized_crop_params(w, h, (self.crop_min, 1.0))
        return (x, y, cw, ch), (self.size, self.size), random.random() < 0.5

    def finish(self, arr: np.ndarray, flip: bool) -> np.ndarray:
        if flip:
            arr = arr[:, ::-1]
        if not getattr(self, "normalize", True):
            return np.ascontiguousarray(arr, dtype=np.uint8)
        x = arr.astype(np.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD


def finish_label(label: Image.Image, crop, out_size, flip: bool) -> np.ndarray:
    """Apply a crop_spec's geometry to a paired label map: crop → NEAREST
    resize → flip, mirroring the image's fused decode-time crop exactly
    (the paired-transform contract of util/image_labels_transforms.py)."""
    x, y, cw, ch = crop
    out = label.crop((x, y, x + cw, y + ch)).resize(out_size, Image.NEAREST)
    arr = np.asarray(out)
    return arr[:, ::-1].copy() if flip else arr


class ImageEvalTransform:
    """Resize(size/0.875) + CenterCrop + Normalize (eval_linprobe.py:71-72).

    Segmentation eval uses resize_to == size (eval_avsegm.py:68-72)."""

    def __init__(self, size: int = 224, resize_factor: float = 0.875,
                 normalize: bool = True):
        self.size = size
        self.resize_to = int(size / resize_factor) if resize_factor else size
        self.normalize = normalize

    def __call__(self, img, labels=()):
        img, labels = resize_center_crop(img, self.size, self.resize_to, labels)
        out = (to_normalized_array(img) if self.normalize
               else np.asarray(img, np.uint8))
        return (out, labels) if labels else out

    def crop_spec(self, w: int, h: int):
        # Resize(short side → resize_to) + CenterCrop(size) ≡ one centered
        # source crop of side min(w,h)·size/resize_to scaled to size.
        src = int(round(min(w, h) * self.size / self.resize_to))
        src = min(src, w, h)
        return (((w - src) // 2, (h - src) // 2, src, src),
                (self.size, self.size), False)

    finish = ImageTrainTransform.finish


# --------------------------------------------------------------------------- #
# Audio transforms (numpy)
# --------------------------------------------------------------------------- #
def pad_flip_tile_np(wav: np.ndarray, samples: int) -> np.ndarray:
    while wav.shape[-1] < samples:
        wav = np.concatenate([wav, wav[..., ::-1]], axis=-1)
    return wav[..., :samples]


def random_vol_np(wav: np.ndarray, gain_db=(-6.0, 6.0), rng=None) -> np.ndarray:
    rng = rng or random
    g = rng.uniform(*gain_db)
    return np.clip(wav * 10.0 ** (g / 20.0), -1.0, 1.0)


def log_mel_np(wav: np.ndarray, rate: int = 16000, n_mels: int = 128,
               eps: float = 1e-7, trim_last: bool = True) -> np.ndarray:
    """Pure-numpy log-mel identical to ops.audio.log_mel (same window and
    filterbank tables; numpy rfft). wav (..., T) → (..., n_mels, frames)."""
    n_fft = int(rate * 0.05)
    hop = int(rate / 64)
    window = audio_ops.hann_window(n_fft)
    pad = n_fft // 2
    x = np.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    # strided framing (no gather copy) → windowed copy → rfft; the mel
    # projection runs as a BLAS matmul on contiguous (frames, bins)
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft, axis=-1)
    frames = frames[..., ::hop, :]
    spec = np.fft.rfft(frames * window, n=n_fft, axis=-1)
    power = spec.real ** 2 + spec.imag ** 2            # (..., frames, bins)
    fb = audio_ops.mel_filterbank(n_fft // 2 + 1, n_mels, rate)
    mel = power.astype(np.float32) @ fb                # (..., frames, mels)
    out = np.log10(mel + eps).swapaxes(-1, -2)         # (..., mels, frames)
    return out[..., :-1] if trim_last else out


class AudioTrainTransform:
    """Pad → RandomVol → log-mel → trim (reference train.py:50-54)."""

    def __init__(self, rate=16000, dur=3.0, n_mels=128, random_vol=True):
        self.rate, self.dur, self.n_mels = rate, dur, n_mels
        self.random_vol = random_vol

    def __call__(self, wav: np.ndarray) -> np.ndarray:
        wav = pad_flip_tile_np(wav, int(self.dur * self.rate))
        if self.random_vol:
            wav = random_vol_np(wav)
        return log_mel_np(wav, self.rate, self.n_mels)


class AudioEvalTransform(AudioTrainTransform):
    def __init__(self, rate=16000, dur=3.0, n_mels=128):
        super().__init__(rate, dur, n_mels, random_vol=False)
