"""Task-level data pipelines: config → loaders of fixed-shape batches.

Glue between the entry points and the dataset/loader layer, reproducing each
reference entry point's transform composition (train.py:41-62,
eval_linprobe.py:43-86, eval_avsegm.py:42-86, eval_avsrcsep.py:40-89).
"""
from __future__ import annotations

import numpy as np

from . import datasets, loader, transforms


def _audio_frames(args) -> int:
    return int(args.data.audio_dur * 64)


def pretrain_loader(args, cfg, epoch: int):
    # uint8-H2D lever (default ON): ship post-crop/flip frames as uint8 and
    # normalize in-graph (ops/image.py) — 4x fewer host->device bytes with
    # identical bf16 compute. data.u8_images=false restores host f32.
    u8 = bool(args.data.get("u8_images", True))
    db = datasets.load_dataset(
        args.data.dataset, args.data.data_path, dataset_type="simple",
        visual_transform=transforms.ImageTrainTransform(
            args.data.image_size, args.data.crop_min, normalize=not u8),
        audio_transform=transforms.AudioTrainTransform(
            args.data.audio_rate, args.data.audio_dur, args.data.audio_mels),
        train=True, audio_dur=args.data.audio_dur,
        audio_rate=args.data.audio_rate, temporal_jitter=True,
    )
    dl = loader.get_dataloader(db, args.env.distributed,
                               cfg.batch_size * cfg.accum_iter,
                               args.env.workers, shuffle=True, drop_last=True)
    dl.set_epoch(epoch)
    return dl


def classification_loader(args, train: bool, epoch: int = 0, dense_val: bool = False):
    if train:
        vt = transforms.ImageTrainTransform(args.data.image_size, args.data.crop_min)
        at = transforms.AudioTrainTransform(
            args.data.audio_rate, args.data.audio_dur, args.data.audio_mels)
        dtype = "simple"
    else:
        vt = transforms.ImageEvalTransform(args.data.image_size)
        at = transforms.AudioEvalTransform(
            args.data.audio_rate, args.data.audio_dur, args.data.audio_mels)
        dtype = "dense" if dense_val else "simple"
    db = datasets.load_dataset(
        args.data.dataset, args.data.data_path, dataset_type=dtype,
        visual_transform=vt, audio_transform=at, train=train,
        audio_dur=args.data.audio_dur, audio_rate=args.data.audio_rate,
        temporal_jitter=train,
    )
    bs = args.opt.batch_size * (args.opt.accum_iter if train else 1)
    dl = loader.get_dataloader(db, args.env.distributed, bs, args.env.workers,
                               shuffle=train, drop_last=train)
    dl.set_epoch(epoch)
    return dl


def class_distribution(args) -> np.ndarray:
    db = datasets.load_dataset(
        args.data.dataset, args.data.data_path, dataset_type="simple",
        visual_transform=None, audio_transform=None, train=True,
        audio_dur=args.data.audio_dur, audio_rate=args.data.audio_rate,
    )
    return np.asarray(db.class_dist, np.float32)


def segmentation_loader(args, train: bool, epoch: int = 0):
    if train:
        vt = transforms.ImageTrainTransform(args.data.image_size, args.data.crop_min)
        at = transforms.AudioTrainTransform(
            args.data.audio_rate, args.data.audio_dur, args.data.audio_mels)
    else:
        # segmentation eval resizes straight to image_size (eval_avsegm.py:68-72)
        vt = transforms.ImageEvalTransform(args.data.image_size, resize_factor=1.0)
        at = transforms.AudioEvalTransform(
            args.data.audio_rate, args.data.audio_dur, args.data.audio_mels)
    db = datasets.load_dataset(
        args.data.dataset, args.data.data_path,
        visual_transform=vt, audio_transform=at, train=train,
        audio_dur=args.data.audio_dur, audio_rate=args.data.audio_rate,
        temporal_jitter=train, dense=not train,
    )
    bs = args.opt.batch_size * (args.opt.accum_iter if train else 1)
    dl = loader.get_dataloader(db, args.env.distributed,
                               bs if train else 1,   # dense eval: per-video
                               args.env.workers, shuffle=train, drop_last=train)
    dl.set_epoch(epoch)
    return dl


def srcsep_loader(args, train: bool, epoch: int = 0):
    if train:
        vt = transforms.ImageTrainTransform(args.data.image_size, args.data.crop_min)
        at = transforms.AudioTrainTransform(
            args.data.audio_rate, args.data.audio_dur, args.data.audio_mels,
            random_vol=False)
    else:
        vt = transforms.ImageEvalTransform(args.data.image_size)
        at = transforms.AudioEvalTransform(
            args.data.audio_rate, args.data.audio_dur, args.data.audio_mels)
    db = datasets.load_dataset(
        args.data.dataset, args.data.data_path, dataset_type="mixed_audio",
        visual_transform=vt, audio_transform=at, train=train,
        audio_dur=args.data.audio_dur, audio_rate=args.data.audio_rate,
        temporal_jitter=train, num_mixtures=args.avss.num_mixtures,
    )
    bs = args.opt.batch_size * (args.opt.accum_iter if train else 1)
    dl = loader.get_dataloader(db, args.env.distributed, bs, args.env.workers,
                               shuffle=train, drop_last=train)
    dl.set_epoch(epoch)
    return dl
