"""Minimal MJPEG+PCM AVI muxer — test fixture only.

Generates real audio+video containers without an ffmpeg CLI, so the C++
decode stage and the dataset classes can be exercised end-to-end in tests.
"""
from __future__ import annotations

import io
import struct

import numpy as np
from PIL import Image


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def write_avi(path: str, frames: list[np.ndarray], fps: int,
              audio: np.ndarray | None = None, rate: int = 16000) -> None:
    """frames: list of (H, W, 3) uint8; audio: int16 mono samples."""
    h, w = frames[0].shape[:2]
    n = len(frames)

    jpegs = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, "JPEG", quality=95)
        jpegs.append(buf.getvalue())

    has_audio = audio is not None
    streams = 2 if has_audio else 1

    avih = _chunk(b"avih", struct.pack(
        "<14I",
        int(1e6 / fps),        # usec per frame
        0, 0, 0x10,            # max bytes/sec, padding, flags (HASINDEX)
        n, 0, streams, 0, w, h, 0, 0, 0, 0,
    ))

    strh_v = _chunk(b"strh", struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, 0, 0xFFFFFFFF, 0,
        0, 0, w, h,
    ))
    strf_v = _chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    ))
    strl_v = _list(b"strl", strh_v + strf_v)

    strls = strl_v
    if has_audio:
        block = 2  # 16-bit mono
        strh_a = _chunk(b"strh", struct.pack(
            "<4s4sIHHIIIIIIII4H",
            b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1, rate, 0,
            len(audio), 0, 0xFFFFFFFF, block, 0, 0, 0, 0,
        ))
        strf_a = _chunk(b"strf", struct.pack(
            "<HHIIHH", 1, 1, rate, rate * block, block, 16,
        ))
        strls += _list(b"strl", strh_a + strf_a)

    hdrl = _list(b"hdrl", avih + strls)

    # movi: interleave one video chunk + the audio slice per frame period
    movi_payload = b""
    index = []
    offset = 4  # after 'movi' fourcc
    spf = rate // fps if has_audio else 0
    for i in range(n):
        c = _chunk(b"00dc", jpegs[i])
        index.append((b"00dc", 0x10, offset, len(jpegs[i])))
        movi_payload += c
        offset += len(c)
        if has_audio:
            sl = audio[i * spf : (i + 1) * spf].astype("<i2").tobytes()
            c = _chunk(b"01wb", sl)
            index.append((b"01wb", 0x10, offset, len(sl)))
            movi_payload += c
            offset += len(c)
    movi = _list(b"movi", movi_payload)

    idx1 = _chunk(b"idx1", b"".join(
        cc + struct.pack("<III", flags, off, ln) for cc, flags, off, ln in index
    ))

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)


def make_test_video(path: str, seconds: float = 4.0, fps: int = 5,
                    size=(64, 48), rate: int = 16000, tone_hz: float = 440.0,
                    seed: int = 0) -> None:
    """Gradient frames (brightness encodes time) + tone audio."""
    rng = np.random.RandomState(seed)
    n = int(seconds * fps)
    w, h = size
    frames = []
    for i in range(n):
        level = int(255 * i / max(n - 1, 1))
        f = np.full((h, w, 3), level, np.uint8)
        frames.append(f)
    t = np.arange(int(seconds * rate)) / rate
    audio = (0.5 * np.sin(2 * np.pi * tone_hz * t) * 32767).astype(np.int16)
    write_avi(path, frames, fps, audio, rate)
