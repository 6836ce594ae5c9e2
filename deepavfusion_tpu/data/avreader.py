"""Python surface over the C++ FFmpeg decode stage (native/avdecode.cpp).

Mirrors the reference avreader.py API (VideoReader.quick_random_frame /
precise_frame / get_clip, AudioReader.read) with the decode hot path in C++
— no PyAV. The library is built by ``make -C deepavfusion_tpu/native`` and
auto-built on first use when a toolchain is present.
"""
from __future__ import annotations

import ctypes
import os
import random
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libavdecode.so"
_lib = None


def _nsamples(t_min: float, t_max: float, rate: int) -> int:
    """Exact sample count for a [t_min, t_max) span: round-half-up, NOT
    truncation — (t0+3.0)-t0 in float64 can land a hair under 3.0 and
    int(2.9999999999999996*16000) would drop a sample (~1% of random t0).
    Mirrors avdecode.cpp's nsamples formula exactly."""
    import math

    return int(math.floor((t_max - t_min) * rate + 0.5))


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        except Exception as e:  # pragma: no cover
            raise RuntimeError(
                f"libavdecode.so missing and build failed: {e}") from e
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.avdec_open.restype = ctypes.c_void_p
    lib.avdec_open.argtypes = [ctypes.c_char_p]
    lib.avdec_close.argtypes = [ctypes.c_void_p]
    lib.avdec_video_info.restype = ctypes.c_int
    lib.avdec_video_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.avdec_audio_info.restype = ctypes.c_int
    lib.avdec_audio_info.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.avdec_video_frame.restype = ctypes.c_double
    lib.avdec_video_frame.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
    ]
    lib.avdec_audio_read.restype = ctypes.c_long
    lib.avdec_audio_read.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.avdec_video_frame_crop.restype = ctypes.c_double
    lib.avdec_video_frame_crop.argtypes = [
        ctypes.c_void_p, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return lib


class VideoReader:
    """Seek-based frame extraction (reference avreader.py:8-70)."""

    def __init__(self, filename: str):
        lib = _load_lib()
        self._lib = lib
        self._h = lib.avdec_open(filename.encode())
        if not self._h:
            raise IOError(f"cannot open {filename}")
        fps = ctypes.c_double()
        dur = ctypes.c_double()
        st = ctypes.c_double()
        w = ctypes.c_int()
        hh = ctypes.c_int()
        nf = ctypes.c_long()
        if lib.avdec_video_info(self._h, fps, dur, st, w, hh, nf) != 0:
            raise IOError(f"no video stream in {filename}")
        self.fps = fps.value
        self.duration = dur.value
        self.start_time = st.value
        self.width = w.value
        self.height = hh.value
        self.num_frames = nf.value

    def _decode(self, t: float, precise: bool, size=None):
        w, h = size if size else (self.width, self.height)
        buf = np.empty((h, w, 3), np.uint8)
        ts = self._lib.avdec_video_frame(
            self._h, float(t), int(precise),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h,
        )
        if ts < -1e8:
            raise IOError("decode failed")
        return buf, ts

    def _decode_crop(self, t: float, precise: bool, crop, out_size):
        """Fused crop+scale decode (native avdec_video_frame_crop): no
        full-resolution RGB frame is materialized — the RandomResizedCrop
        pixel work happens inside the C++ stage."""
        cx, cy, cw, ch = crop
        ow, oh = out_size
        buf = np.empty((oh, ow, 3), np.uint8)
        ts = self._lib.avdec_video_frame_crop(
            self._h, float(t), int(precise),
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            int(cx), int(cy), int(cw), int(ch), int(ow), int(oh),
        )
        if ts < -1e8:
            raise IOError("decode failed")
        return buf, ts

    def quick_random_frame(self, t_min=None, t_max=None, size=None, crop=None):
        t_min = self.start_time if t_min is None else t_min
        t_max = self.start_time + self.duration if t_max is None else t_max
        t = random.uniform(t_min, t_max)
        if crop is not None:
            return self._decode_crop(t, precise=False, crop=crop, out_size=size)
        return self._decode(t, precise=False, size=size)

    def precise_frame(self, t: float, size=None, crop=None):
        if crop is not None:
            return self._decode_crop(t, precise=True, crop=crop, out_size=size)
        return self._decode(t, precise=True, size=size)

    def get_clip(self, t_start=None, t_end=None, fps: Optional[float] = None,
                 size=None, crop=None):
        """Frame-accurate clip at the given fps (reference get_clip :33-45,
        sampled on a uniform grid instead of every container frame)."""
        t_start = self.start_time if t_start is None else t_start
        t_end = self.start_time + self.duration if t_end is None else t_end
        fps = fps or self.fps
        n = max(int(round((t_end - t_start) * fps)), 1)
        frames, ts = [], []
        for i in range(n):
            t = t_start + i / fps
            f, actual = self.precise_frame(t, size=size, crop=crop)
            frames.append(f)
            ts.append(actual)
        return frames, ts

    def close(self):
        if self._h:
            self._lib.avdec_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class AVReader(VideoReader):
    """Single-open combined reader: one avformat container open serves both
    the frame decode and the audio span read (the reference — and the
    separate VideoReader/AudioReader pair above — pays avformat_open_input +
    find_stream_info twice per sample, reference datasets.py:230-233)."""

    def __init__(self, filename: str, rate: Optional[int] = None):
        super().__init__(filename)
        r = ctypes.c_int()
        dur = ctypes.c_double()
        st = ctypes.c_double()
        ch = ctypes.c_int()
        if self._lib.avdec_audio_info(self._h, r, dur, st, ch) != 0:
            raise IOError(f"no audio stream in {filename}")
        self.orig_rate = r.value
        self.audio_duration = dur.value
        self.audio_start_time = st.value
        self.channels = ch.value
        self.rate = rate or self.orig_rate

    def read(self, t_min=None, t_max=None) -> np.ndarray:
        """→ float32 (1, nsamples) in [-1, 1], exactly (t_max-t_min)*rate."""
        t_min = self.audio_start_time if t_min is None else t_min
        t_max = (self.audio_start_time + self.audio_duration
                 if t_max is None else t_max)
        n = _nsamples(t_min, t_max, self.rate)
        out = np.empty(n, np.float32)
        got = self._lib.avdec_audio_read(
            self._h, float(t_min), float(t_max), int(self.rate),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if got < 0:
            raise IOError(f"audio decode failed ({got})")
        return out[None, :]


class AudioReader:
    """Audio span decode with exact sample-count semantics
    (reference avreader.py:73-143)."""

    def __init__(self, filename: str, rate: Optional[int] = None):
        lib = _load_lib()
        self._lib = lib
        self._h = lib.avdec_open(filename.encode())
        if not self._h:
            raise IOError(f"cannot open {filename}")
        r = ctypes.c_int()
        dur = ctypes.c_double()
        st = ctypes.c_double()
        ch = ctypes.c_int()
        if lib.avdec_audio_info(self._h, r, dur, st, ch) != 0:
            raise IOError(f"no audio stream in {filename}")
        self.orig_rate = r.value
        self.duration = dur.value
        self.start_time = st.value
        self.channels = ch.value
        self.rate = rate or self.orig_rate

    def read(self, t_min=None, t_max=None) -> np.ndarray:
        """→ float32 (1, nsamples) in [-1, 1], exactly (t_max-t_min)*rate."""
        t_min = self.start_time if t_min is None else t_min
        t_max = self.start_time + self.duration if t_max is None else t_max
        n = _nsamples(t_min, t_max, self.rate)
        out = np.empty(n, np.float32)
        got = self._lib.avdec_audio_read(
            self._h, float(t_min), float(t_max), int(self.rate),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if got < 0:
            raise IOError(f"audio decode failed ({got})")
        return out[None, :]

    def close(self):
        if self._h:
            self._lib.avdec_close(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
