"""Host decode + fbank preprocessing benchmark: per-clip latency AND
sustained threaded-loader throughput against a VGGSound-shaped corpus.

Two measurements in one JSON line:
  * p50/p95 per-clip latency of (open → seek → decode one frame → decode 3 s
    audio → log-mel) — the exact per-sample work of the pretraining
    dataloader (reference avreader.py:146-168 micro-benchmark +
    datasets.py VideoDataset);
  * sustained clips/s of the real threaded DataLoader (data/loader.py) over
    the real VideoDataset + train transforms at batch 64 with the
    reference's worker provisioning (15 decode workers per accelerator,
    reference launcher.py:114) — the number that must exceed the train
    step's clips/s for the host to keep the chip fed.

With no corpus directory given, a deterministic H.264+AAC corpus at
VGGSound-like dimensions (10 s, 25 fps, 640x360, 16 kHz mono) is generated
by the C++ encoder (native/avencode.cpp) and cached under
~/.cache/deepavfusion_tpu/bench_corpus.

Knobs (VERDICT round-2 item 9):
  * DAVF_BENCH_ENTROPY=1 — generate a high-entropy corpus (per-pixel noise,
    24 noise blocks, camera shake; see native/avencode.cpp) that decodes at
    closer-to-real-video cost; cached separately per entropy level.
  * DAVF_BENCH_WORKER_SWEEP=1 (or automatic when nproc > 1) — measure
    sustained clips/s at worker counts 1,2,4,8,15 (capped near nproc) and
    report the scaling curve, demonstrating the host-side margin the moment
    multi-core hardware is available.

Usage: python bench_decode.py [clips_dir_glob] [n_latency_samples]
Prints one JSON line {"metric", "value", "unit", "vs_baseline", ...}.
"""
import glob
import json
import os
import random
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

NATIVE = Path(__file__).parent / "deepavfusion_tpu" / "native"
ENTROPY = int(os.environ.get("DAVF_BENCH_ENTROPY", "0"))
CORPUS_DIR = Path(os.path.expanduser(
    "~/.cache/deepavfusion_tpu/bench_corpus"
    + (f"_e{ENTROPY}" if ENTROPY else "")))
CORPUS_N = int(os.environ.get("DAVF_BENCH_CORPUS_N", "200"))
WORKERS = int(os.environ.get("DAVF_BENCH_WORKERS", "15"))  # ref launcher.py:114
BATCH = 64


def make_corpus(n=CORPUS_N) -> list[str]:
    """Deterministic VGGSound-shaped H.264 corpus, generated once."""
    enc = NATIVE / "avencode"
    if not enc.exists():
        subprocess.run(["make", "-C", str(NATIVE), "avencode"], check=True,
                       capture_output=True)
    CORPUS_DIR.mkdir(parents=True, exist_ok=True)
    fns = sorted(str(p) for p in CORPUS_DIR.glob("clip*.mp4"))
    if len(fns) >= n:
        return fns[:n]

    def gen(i):
        fn = CORPUS_DIR / f"clip{i:04d}.mp4"
        if not fn.exists():
            subprocess.run(
                [str(enc), str(fn), "10", "25", "640", "360", str(i),
                 "16000", str(ENTROPY)],
                check=True, capture_output=True)
        return str(fn)

    with ThreadPoolExecutor(os.cpu_count() or 8) as pool:
        fns = sorted(pool.map(gen, range(n)))
    return fns


def latency_bench(fns, n):
    from deepavfusion_tpu.data import avreader
    from deepavfusion_tpu.data.transforms import log_mel_np

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
    return (float(np.percentile(lat, 50) * 1000),
            float(np.percentile(lat, 95) * 1000))


def sustained_bench(fns, batches=16, workers=WORKERS):
    # batches >> loader prefetch depth (2), so the producer's head start
    # during warmup inflates the figure by <13%.
    """Real VideoDataset + train transforms through the threaded DataLoader."""
    from deepavfusion_tpu.data import datasets, loader, transforms

    base = os.path.dirname(fns[0])
    db = datasets.VideoDataset(
        base_path=base,
        video_files=[os.path.basename(f) for f in fns],
        visual_transform=transforms.ImageTrainTransform(224, 0.5),
        audio_transform=transforms.AudioTrainTransform(16000, 3.0, 128),
        temporal_jitter=True,
    )
    dl = loader.DataLoader(db, batch_size=BATCH, shuffle=True, drop_last=True,
                           workers=workers, prefetch=2, replacement=True)
    it = iter(dl)
    b = next(it)  # warmup: thread pool spin-up + page cache
    assert b["image"].shape == (BATCH, 224, 224, 3)
    assert b["audio"].shape == (BATCH, 128, 192, 1)
    t0 = time.perf_counter()
    done = 0
    # loop epochs: one epoch of a small corpus yields fewer than `batches`
    # batches (len(dataset)//BATCH), and a 1-batch measurement is noise
    while done < batches:
        for b in it:
            done += 1
            if done >= batches:
                break
        else:
            it = iter(dl)   # next epoch
            continue
    dt = time.perf_counter() - t0
    return BATCH * done / dt


def main():
    # Host-only benchmark: pin the CPU backend BEFORE anything imports the
    # data layer — loader.py consults jax.process_count() for host sharding,
    # and letting that initialize the pinned (tunneled) TPU platform would
    # block a pure-host benchmark on TPU availability.
    import jax

    jax.config.update("jax_platforms", "cpu")

    pattern = sys.argv[1] if len(sys.argv) > 1 else None
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    fns = sorted(glob.glob(pattern)) if pattern else make_corpus()
    if not fns:
        raise SystemExit(f"no clips matched {pattern}")

    p50, p95 = latency_bench(fns, n)
    clips_per_s = sustained_bench(fns)

    # worker-count scaling sweep: explicit opt-in, or automatic on multi-core
    # hosts (this container has nproc=1, where a sweep is meaningless).
    ncpu = os.cpu_count() or 1
    sweep = None
    if os.environ.get("DAVF_BENCH_WORKER_SWEEP") == "1" or ncpu > 1:
        counts = [c for c in (1, 2, 4, 8, 15) if c <= max(2 * ncpu, 2)]
        sweep = {str(c): round(sustained_bench(fns, batches=8, workers=c), 1)
                 for c in counts}

    # PyAV reference micro-benchmark order of magnitude: ~30-60 ms/clip for
    # open+frame+audio on VGGSound mp4s (avreader.py:146-168, no published
    # number) — use 40 ms as the comparison point.
    print(json.dumps({
        "metric": "p50 decode+fbank preprocess latency",
        "value": round(p50, 2),
        "unit": "ms/clip",
        "vs_baseline": round(40.0 / max(p50, 1e-6), 3),
        "p95_ms": round(p95, 2),
        "sustained_clips_per_s": round(clips_per_s, 1),
        "loader_workers": WORKERS,
        "worker_sweep_clips_per_s": sweep,
        "nproc": ncpu,
        "batch": BATCH,
        "corpus": f"{len(fns)} x 10s 640x360 H.264 (+16kHz AAC)"
                  + (f" entropy={ENTROPY}" if ENTROPY else ""),
    }))


if __name__ == "__main__":
    main()
