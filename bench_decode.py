"""Host decode + fbank preprocessing latency benchmark.

Measures the BASELINE.json second metric ("p50 decode+fbank preprocess
latency"): per-clip latency of (open → seek → decode one frame → decode 3 s
audio → log-mel), the exact per-sample work of the pretraining dataloader
(reference avreader.py:146-168 micro-benchmark + datasets.py VideoDataset).
Runs over generated AV clips when no dataset directory is given.

Usage: python bench_decode.py [clips_dir_glob] [n_samples]
Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.
"""
import glob
import json
import random
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def make_synthetic_clips(n=8):
    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from avi_writer import make_test_video

    d = tempfile.mkdtemp(prefix="davf_bench_")
    fns = []
    for i in range(n):
        fn = f"{d}/clip{i}.mp4"
        make_test_video(fn, seconds=10.0, fps=24, size=(320, 240), seed=i)
        fns.append(fn)
    return fns


def main():
    from deepavfusion_tpu.data import avreader
    from deepavfusion_tpu.data.transforms import log_mel_np

    pattern = sys.argv[1] if len(sys.argv) > 1 else None
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    fns = sorted(glob.glob(pattern)) if pattern else make_synthetic_clips()
    if not fns:
        raise SystemExit(f"no clips matched {pattern}")

    rng = random.Random(0)
    lat = []
    for _ in range(n):
        fn = rng.choice(fns)
        t0 = time.perf_counter()
        v = avreader.VideoReader(fn)
        a = avreader.AudioReader(fn, rate=16000)
        mid = v.start_time + v.duration / 2
        frame, _ = v.quick_random_frame(mid - 1.5, mid + 1.5)
        wav = a.read(mid - 1.5, mid + 1.5)
        mel = log_mel_np(wav, 16000, 128)
        v.close()
        a.close()
        lat.append(time.perf_counter() - t0)
        assert mel.shape == (1, 128, 192)

    p50 = float(np.percentile(lat, 50) * 1000)
    p95 = float(np.percentile(lat, 95) * 1000)
    # PyAV reference micro-benchmark order of magnitude: ~30-60 ms/clip for
    # open+frame+audio on VGGSound mp4s (avreader.py:146-168, no published
    # number) — use 40 ms as the comparison point.
    print(json.dumps({
        "metric": "p50 decode+fbank preprocess latency",
        "value": round(p50, 2),
        "unit": "ms/clip",
        "vs_baseline": round(40.0 / max(p50, 1e-6), 3),
        "p95_ms": round(p95, 2),
    }))


if __name__ == "__main__":
    main()
