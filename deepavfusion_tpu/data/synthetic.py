"""Synthetic fixed-shape AV batches for tests, benchmarks and debug runs.

The TPU analogue of the reference's ``debug`` truncation flag (SURVEY.md §4):
every entry point can run end-to-end on synthetic data with no media on disk.
Shapes match the canonical pipeline: image (B, 224, 224, 3) normalized RGB,
audio (B, 128, 192, 1) log-mel.
"""
from __future__ import annotations

import os
from typing import Iterator

import numpy as np


def use_synthetic(args) -> bool:
    """Resolve ``data.synthetic`` honestly — real data is the default.

    - ``data.synthetic=true``: synthetic batches (explicit opt-in for smoke
      runs / tests / benchmarks).
    - otherwise: real data; if ``data.data_path`` does not exist, fail fast
      with a loud error instead of silently training on random noise.
    """
    if args.data.get("synthetic"):
        return True
    path = args.data.get("data_path")
    if path and os.path.exists(str(path)):
        return False
    raise FileNotFoundError(
        f"data.data_path={path!r} does not exist and data.synthetic is not "
        "enabled — refusing to train on random noise. Mount the dataset at "
        "data.data_path or pass data.synthetic=true for an explicit "
        "synthetic-data run."
    )


def synthetic_batch(
    batch_size: int,
    image_size: int = 224,
    audio_mels: int = 128,
    audio_frames: int = 192,
    num_classes: int = 0,
    seed: int = 0,
    u8_images: bool = False,
) -> dict:
    rng = np.random.RandomState(seed)
    if u8_images:
        # production wire format (data.u8_images, ops/image.py): raw uint8
        # pixels shipped to the device, /255-mean/std folded into the step
        image = rng.randint(0, 256, size=(batch_size, image_size,
                                          image_size, 3), dtype=np.uint8)
    else:
        image = rng.randn(batch_size, image_size, image_size, 3
                          ).astype(np.float32)
    batch = {
        "image": image,
        "audio": rng.randn(batch_size, audio_mels, audio_frames, 1).astype(np.float32),
    }
    if num_classes:
        batch["label"] = rng.randint(0, num_classes, size=(batch_size,)).astype(np.int32)
    return batch


def synthetic_loader(batch_size: int, steps: int, seed: int = 0, **kw) -> Iterator[dict]:
    for i in range(steps):
        yield synthetic_batch(batch_size, seed=seed + i, **kw)
