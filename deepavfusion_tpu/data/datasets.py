"""Datasets + catalogs (reference datasets.py parity, torch-free).

Dataset classes return numpy dicts with fixed-shape tensors; all media decode
goes through the C++ FFmpeg stage (data/avreader.py). Failure policy matches
the reference: any exception in __getitem__ retries a random other sample
(datasets.py:139-140, 203-205).

Catalogs parse the same annotation-file formats as the reference
(datasets.py:513-755): VGGSound vggsound.csv, AudioSet
class_labels_indices.csv + *_segments.csv, MUSIC anno/*.csv with the
deterministic solo/duet eval split slicing, AVSBench metadata.csv +
label2idx.json, VGG-Music metadata lists, Flickr-SoundNet XML bboxes.
"""
from __future__ import annotations

import csv
import glob
import json
import math
import os
import random
from collections import defaultdict

import numpy as np
from PIL import Image

from . import avreader
from .catalog import NUM_CLASSES, MULTI_CLASS_DBS  # noqa: F401 (re-export)


def _one_hot_multi(lbls, n):
    v = np.zeros(n, np.float32)
    for l in lbls:
        v[l] = 1.0
    return v


class BaseVideoDataset:
    """Sample list + class distribution + retry-on-error (reference :143-205)."""

    def __init__(self, base_path, video_files, audio_dur=3.0, audio_rate=16000,
                 class_labels=None, class_desc=None, temporal_jitter=False,
                 oversample=None, **_):
        # dict-valued file lists (MUSIC) flatten to grouped-by-video lists
        if isinstance(video_files, dict):
            keys = sorted(video_files.keys())
            flat_files, flat_labels = [], []
            for k in keys:
                flat_files.extend(video_files[k])
                if class_labels is not None:
                    flat_labels.extend(class_labels[k])
            video_files = flat_files
            class_labels = flat_labels if class_labels is not None else None
        self.base_path = base_path
        self.video_files = video_files
        self.class_labels = class_labels
        self.class_desc = class_desc
        self.audio_dur = audio_dur
        self.audio_rate = audio_rate
        self.temporal_jitter = temporal_jitter
        self.oversample = int(oversample) if oversample else 1

        if class_desc is not None and class_labels is not None:
            dist = np.zeros(len(class_desc), np.float64)
            for lbl in class_labels:
                for l in lbl if isinstance(lbl, (list, tuple)) else [lbl]:
                    dist[l] += 1
            self.class_dist = (dist / dist.sum()).astype(np.float32)
        else:
            self.class_dist = None

    def get_sample_metadata(self, idx):
        file_id = self.video_files[idx].split(".")[0]
        filename = f"{self.base_path}/{self.video_files[idx]}"
        anno = {"file_id": file_id}
        if self.class_labels is not None:
            lbl = self.class_labels[idx]
            if isinstance(lbl, (list, tuple)):
                lbl = _one_hot_multi(lbl, len(self.class_desc))
            anno["class"] = lbl
        return file_id, filename, anno

    def getitem(self, idx):
        raise NotImplementedError

    def __len__(self):
        return len(self.video_files) * self.oversample

    def __getitem__(self, idx, _retries: int = 32):
        # retry-a-random-other-sample policy (reference datasets.py:203-205),
        # but bounded so a fully-broken dataset raises instead of recursing
        for _ in range(_retries):
            try:
                return self.getitem(idx % len(self.video_files))
            except Exception:
                idx = random.randrange(len(self.video_files))
        return self.getitem(idx % len(self.video_files))

    def __repr__(self):
        return (f"{type(self).__name__}\n  - Path: {self.base_path}\n"
                f"  - No Samples: {len(self)}")


class VideoDataset(BaseVideoDataset):
    """'simple': one random frame + one log-mel per clip (reference :208-251)."""

    def __init__(self, *args, visual_transform=None, audio_transform=None, **kw):
        super().__init__(*args, **kw)
        self.visual_transform = visual_transform
        self.audio_transform = audio_transform

    def sample_start(self, vreader):
        if self.temporal_jitter:
            mid = random.uniform(vreader.start_time + self.audio_dur / 2,
                                 vreader.start_time + vreader.duration - self.audio_dur / 2)
        else:
            mid = vreader.start_time + vreader.duration / 2.0
        return mid - self.audio_dur / 2

    def get_sample(self, filename):
        vt = self.visual_transform
        if hasattr(vt, "crop_spec"):
            # fast path: one container open for both streams, crop+scale
            # fused into the C++ decode (native avdec_video_frame_crop) —
            # no full-res RGB frame and no PIL in the hot loop
            reader = avreader.AVReader(filename, rate=self.audio_rate)
            start = self.sample_start(reader)
            crop, out_size, flip = vt.crop_spec(reader.width, reader.height)
            frame_np, _ = reader.quick_random_frame(
                start, start + self.audio_dur, size=out_size, crop=crop)
            frame = vt.finish(frame_np, flip)
            wav = reader.read(start, start + self.audio_dur)
            mel = self.audio_transform(wav)
            reader.close()
            return frame, mel

        vreader = avreader.VideoReader(filename)
        areader = avreader.AudioReader(filename, rate=self.audio_rate)
        start = self.sample_start(vreader)

        frame_np, _ = vreader.quick_random_frame(start, start + self.audio_dur)
        frame = self.visual_transform(Image.fromarray(frame_np))
        wav = areader.read(start, start + self.audio_dur)
        mel = self.audio_transform(wav)
        vreader.close()
        areader.close()
        return frame, mel

    def getitem(self, idx):
        file_id, filename, anno = self.get_sample_metadata(idx)
        frame, mel = self.get_sample(filename)
        return {"image": frame.astype(np.float32),
                "audio": mel[0][..., None].astype(np.float32), **anno}


class DenseVideoDataset(BaseVideoDataset):
    """'dense': N frames + N specs spanning dense_span seconds (reference :254-298)."""

    def __init__(self, *args, visual_transform=None, audio_transform=None,
                 dense_n=10, dense_span=10, **kw):
        super().__init__(*args, **kw)
        self.visual_transform = visual_transform
        self.audio_transform = audio_transform
        self.dense_n = dense_n
        self.dense_span = dense_span

    def getitem(self, idx):
        file_id, filename, anno = self.get_sample_metadata(idx)
        vt = self.visual_transform
        fused = hasattr(vt, "crop_spec")
        if fused:
            # single container open; crop+scale fused into the C++ decode.
            # Crop params are re-drawn per frame, matching the PIL path's
            # per-frame visual_transform call.
            vreader = areader = avreader.AVReader(filename, rate=self.audio_rate)
        else:
            vreader = avreader.VideoReader(filename)
            areader = avreader.AudioReader(filename, rate=self.audio_rate)

        span = min(self.dense_span, vreader.duration)
        if self.temporal_jitter and vreader.duration > span:
            start = random.uniform(vreader.start_time,
                                   vreader.start_time + vreader.duration - span)
        else:
            start = max(vreader.start_time + vreader.duration / 2 - span / 2,
                        vreader.start_time)
        clip_ts = np.linspace(start, start + span - self.audio_dur,
                              self.dense_n) + self.audio_dur / 2

        frames = []
        for t in clip_ts:
            if fused:
                crop, out_size, flip = vt.crop_spec(vreader.width, vreader.height)
                f, _ = vreader.precise_frame(t, size=out_size, crop=crop)
                frames.append(vt.finish(f, flip))
            else:
                f, _ = vreader.precise_frame(t)
                frames.append(vt(Image.fromarray(f)))
        frames = np.stack(frames)

        wav = areader.read(clip_ts[0] - self.audio_dur / 2,
                           clip_ts[-1] + self.audio_dur / 2)
        wlen = int(self.audio_dur * self.audio_rate)
        offs = np.linspace(0, wav.shape[1] - wlen, self.dense_n).astype(int)
        specs = np.stack([
            self.audio_transform(wav[:, i:i + wlen])[0][..., None] for i in offs
        ])
        vreader.close()
        if not fused:
            areader.close()
        return {"image": frames.astype(np.float32),
                "audio": specs.astype(np.float32), **anno}


class MixtureVideoDataset(BaseVideoDataset):
    """'mixed_audio': sums K source waveforms (reference :304-373)."""

    def __init__(self, *args, visual_transform=None, audio_transform=None,
                 num_mixtures=2, video_files_mix=None, **kw):
        super().__init__(*args, **kw)
        self.visual_transform = visual_transform
        self.audio_transform = audio_transform
        self.num_mixtures = num_mixtures
        self.video_files_mix = video_files_mix
        assert num_mixtures >= 2

    def _filenames(self, idx):
        fns = [f"{self.base_path}/{self.video_files[idx]}"]
        if self.video_files_mix is not None:
            fns.append(f"{self.base_path}/{self.video_files_mix[idx]}")
        else:
            others = [r for r in range(len(self.video_files)) if r != idx]
            for m in np.random.choice(others, self.num_mixtures - 1, replace=False):
                fns.append(f"{self.base_path}/{self.video_files[m]}")
        return fns

    def getitem(self, idx):
        fns = self._filenames(idx)
        vt = self.visual_transform
        fused = hasattr(vt, "crop_spec")
        frames, waveforms, specs = [], [], []
        for fn in fns:
            if fused:
                # single container open per source; fused crop-at-decode
                vreader = areader = avreader.AVReader(fn, rate=self.audio_rate)
                a_start, a_dur = areader.audio_start_time, areader.audio_duration
            else:
                vreader = avreader.VideoReader(fn)
                areader = avreader.AudioReader(fn, rate=self.audio_rate)
                a_start, a_dur = areader.start_time, areader.duration
            start = max(vreader.start_time, a_start)
            end = min(vreader.start_time + vreader.duration, a_start + a_dur)
            if self.temporal_jitter:
                tc = random.uniform(start + self.audio_dur / 2, end - self.audio_dur / 2)
            else:
                tc = (start + end) / 2.0
            if fused:
                crop, out_size, flip = vt.crop_spec(vreader.width, vreader.height)
                f, _ = vreader.quick_random_frame(
                    tc - self.audio_dur / 2, tc + self.audio_dur / 2,
                    size=out_size, crop=crop)
                frames.append(vt.finish(f, flip))
            else:
                f, _ = vreader.quick_random_frame(tc - self.audio_dur / 2,
                                                  tc + self.audio_dur / 2)
                frames.append(vt(Image.fromarray(f)))
            wav = areader.read(tc - self.audio_dur / 2, tc + self.audio_dur / 2)
            waveforms.append(wav)
            specs.append(self.audio_transform(wav)[0][..., None])
            vreader.close()
            if not fused:
                areader.close()

        mix_wav = np.stack(waveforms).sum(0)
        mix_spec = self.audio_transform(mix_wav)[0][..., None]
        return {
            "image": frames[0].astype(np.float32),          # frame of source 1
            "audio": specs[0].astype(np.float32),           # target source spec
            "mixed_audio": mix_spec.astype(np.float32),
            "frames": np.stack(frames).astype(np.float32),
            "waveforms": np.stack([w[0] for w in waveforms]).astype(np.float32),
            "file_id": self.video_files[idx].split(".")[0],
        }


class FolderVideoDataset:
    """AVSBench frame-folder layout: {path}/{id}/frames/N.jpg +
    labels_semantic/N.png + audio.wav (reference :27-140)."""

    def __init__(self, path, samples, audio_dur=3.0, audio_rate=16000,
                 visual_transform=None, audio_transform=None, class_labels=None,
                 temporal_jitter=True, dense=False, oversample=None,
                 return_semantics=False, **_):
        self.path = path
        self.samples = samples
        self.class_labels = class_labels
        self.audio_dur = audio_dur
        self.audio_rate = audio_rate
        self.visual_transform = visual_transform
        self.audio_transform = audio_transform
        self.temporal_jitter = temporal_jitter
        self.dense = dense
        self.oversample = int(oversample) if oversample else 1
        self.return_semantics = return_semantics

    def _read(self, file_id, frame_no, start, class_labels):
        from . import transforms as tf_mod

        vt = self.visual_transform
        frame_fn = f"{self.path}/{file_id}/frames/{frame_no}.jpg"
        segm_img = Image.open(
            f"{self.path}/{file_id}/labels_semantic/{frame_no}.png").convert("L")
        if hasattr(vt, "crop_spec"):
            # fused path: the C++ stage decodes the JPEG (image2 demuxer)
            # with crop+scale applied in swscale; the label map gets the
            # same geometry via NEAREST resampling in PIL (labels are tiny)
            r = avreader.VideoReader(frame_fn)
            crop, out_size, flip = vt.crop_spec(r.width, r.height)
            arr, _ = r.precise_frame(0.0, size=out_size, crop=crop)
            r.close()
            frame = vt.finish(arr, flip)
            segm = tf_mod.finish_label(segm_img, crop, out_size, flip)
        else:
            img = Image.open(frame_fn).convert("RGB")
            frame, (segm,) = vt(img, labels=(segm_img,))
        segm = np.asarray(segm, np.int64).copy()
        keep = np.isin(segm, [l - 1 for l in class_labels])
        segm = np.where(keep, segm, 0)

        areader = avreader.AudioReader(f"{self.path}/{file_id}/audio.wav",
                                       rate=self.audio_rate)
        wav = areader.read(start, start + self.audio_dur)
        areader.close()
        mel = self.audio_transform(wav)[0][..., None]
        return frame, segm, mel

    def _one(self, idx, frame_no=None):
        file_id = self.samples[idx]
        n_frames = len(glob.glob(f"{self.path}/{file_id}/labels_semantic/*.png"))
        if n_frames == 0:
            raise FileNotFoundError(file_id)
        areader = avreader.AudioReader(f"{self.path}/{file_id}/audio.wav",
                                       rate=self.audio_rate)
        duration = areader.duration
        areader.close()
        if frame_no is None:
            if self.temporal_jitter:
                frame_no = random.randrange(n_frames)
                jit = random.uniform(-self.audio_dur * 0.33, self.audio_dur * 0.33)
                start = max(min(frame_no + 0.5 + jit - self.audio_dur / 2,
                                duration - self.audio_dur), 0)
            else:
                frame_no = n_frames // 2
                start = max(min(frame_no + 0.5 - self.audio_dur / 2,
                                duration - self.audio_dur), 0)
        else:
            start = max(min(frame_no + 0.5 - self.audio_dur / 2,
                            duration - self.audio_dur), 0)
        frame, segm, mel = self._read(file_id, frame_no, start,
                                      self.class_labels[idx])
        if not self.return_semantics:
            segm = (segm > 0).astype(np.float32)
        return frame, mel, segm, file_id, n_frames

    def __len__(self):
        return len(self.samples) * self.oversample

    def __getitem__(self, idx, _retries: int = 32):
        try:
            idx = idx % len(self.samples)
            if not self.dense:
                frame, mel, segm, fid, _ = self._one(idx)
                return {"image": frame.astype(np.float32),
                        "audio": mel.astype(np.float32),
                        "gt_map": segm, "file_id": fid}
            # dense: every annotated frame of the video
            _, _, _, fid, n_frames = self._one(idx, frame_no=0)
            frames, mels, segms = [], [], []
            for fn in range(n_frames):
                f, m, s, _, _ = self._one(idx, frame_no=fn)
                frames.append(f), mels.append(m), segms.append(s)
            return {"image": np.stack(frames).astype(np.float32),
                    "audio": np.stack(mels).astype(np.float32),
                    "gt_map": np.stack(segms), "file_id": fid}
        except Exception:
            if _retries <= 0:
                raise
            return self.__getitem__(random.randrange(len(self.samples)),
                                    _retries=_retries - 1)


# --------------------------------------------------------------------------- #
# Catalogs
# --------------------------------------------------------------------------- #
def get_vggsound(data_path, dataset=VideoDataset, partition="train", **kwargs):
    data = list(csv.reader(open(f"{data_path}/annotations/vggsound.csv")))
    data = [dt for dt in data if dt[-1] == partition]
    dictionary = sorted(os.listdir(f"{data_path}/clips/"))
    all_filenames, all_labels = [], []
    for yid, t, cls, part in data:
        cls = (cls.replace(" ", "_").replace("(", "_")
               .replace(")", "_").replace(",", "_"))
        all_filenames.append(f"{cls}/{yid}_{int(t):06d}_{int(t) + 10:06d}.mp4")
        all_labels.append(dictionary.index(cls))
    avail = set("/".join(fn.split("/")[-2:])
                for fn in glob.glob(f"{data_path}/clips/*/*.mp4"))
    filenames = [fn for fn in all_filenames if fn in avail]
    labels = [l for fn, l in zip(all_filenames, all_labels) if fn in avail]
    return dataset(base_path=f"{data_path}/clips", video_files=filenames,
                   class_labels=labels, class_desc=dictionary, **kwargs)


def resolve_metadata_dir(metadata_dir="metadata"):
    """Resolve the split-metadata directory: cwd-relative ``metadata/``
    (reference behavior) when present, else the repo-vendored copy shipped
    next to the package (metadata/ at the repo root, see metadata/README.md).
    """
    if os.path.isdir(metadata_dir):
        return metadata_dir
    vendored = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "..", "metadata")
    return vendored if os.path.isdir(vendored) else metadata_dir


def get_vggsound_music(data_path, dataset=VideoDataset, partition="train",
                       metadata_dir="metadata", **kwargs):
    metadata_dir = resolve_metadata_dir(metadata_dir)
    if partition == "train":
        data = list(csv.reader(open(f"{metadata_dir}/vggmusic_train.txt")))
        fix = lambda c: (c.replace("violin", "violin__fiddle")
                         .replace("steel_guitar", "steel_guitar__slide_guitar"))
        vocab = sorted({fix(cls) for _, cls in data})
        filenames, class_labels = defaultdict(list), defaultdict(list)
        for yid, cls in data:
            cls = fix(cls)
            fn = f"playing_{cls}/{yid[:11]}_{int(yid[-6:]):06d}_{int(yid[-6:]) + 10:06d}.mp4"
            if os.path.exists(f"{data_path}/clips/{fn}"):
                filenames[yid[:11]].append(fn)
                class_labels[yid[:11]].append(vocab.index(cls))
        return dataset(base_path=f"{data_path}/clips", video_files=filenames,
                       class_labels=class_labels, **kwargs)
    data = list(csv.reader(open(f"{metadata_dir}/vggmusic_eval_ss.csv")))[1:]
    f1 = [f"playing_{c1}/{y1[:11]}_{int(y1[-6:]):06d}_{int(y1[-6:]) + 10:06d}.mp4"
          for y1, y2, c1, c2, _ in data]
    f2 = [f"playing_{c2}/{y2[:11]}_{int(y2[-6:]):06d}_{int(y2[-6:]) + 10:06d}.mp4"
          for y1, y2, c1, c2, _ in data]
    return dataset(base_path=f"{data_path}/clips", video_files=f1,
                   video_files_mix=f2, class_labels=None, **kwargs)


def get_music(data_path, dataset=VideoDataset, partition="train",
              version="solo", **kwargs):
    if version == "solo":
        data = [list(s) + ["solo"] for s in csv.reader(open(f"{data_path}/anno/music_solo.csv"))][1:]
    elif version == "solo21":
        data = [list(s) + ["solo"] for s in csv.reader(open(f"{data_path}/anno/music21_solo.csv"))][1:]
    elif version == "music":
        data = [list(s) + ["solo"] for s in csv.reader(open(f"{data_path}/anno/music_solo.csv"))][1:]
        data += [list(s) + ["duet"] for s in csv.reader(open(f"{data_path}/anno/music21_duet.csv"))][1:]
    else:
        raise ValueError(f"unknown MUSIC version {version}")

    vocab = sorted({cls.replace(" ", "_") for _, cls, _, _ in data})
    filenames, class_labels, stype = defaultdict(list), defaultdict(list), {}
    for yid, cls, _, dtype in data:
        cls = cls.replace(" ", "_")
        fns = [fn.replace(f"{data_path}/clips_360p_segm/", "")
               for fn in glob.glob(f"{data_path}/clips_360p_segm/{cls}/{yid}.*.mp4")]
        if fns:
            filenames[yid].extend(fns)
            class_labels[yid].extend([vocab.index(cls)] * len(fns))
            stype[yid] = dtype

    # deterministic solo/duet split slicing (reference :594-600)
    all_ids = sorted(filenames.keys())
    solos = sorted(y for y, t in stype.items() if t == "solo")
    duets = sorted(y for y, t in stype.items() if t == "duet")
    eval_ids = set(solos[:: max(len(solos) // 130, 1)]) if solos else set()
    test_ids = set(duets[:: max(len(duets) // 85, 1)]) if duets else set()
    train_ids = set(all_ids) - eval_ids - test_ids
    keep = train_ids if partition == "train" else eval_ids
    filenames = {y: filenames[y] for y in filenames if y in keep}
    class_labels = {y: class_labels[y] for y in class_labels if y in keep}
    oversample = int(math.ceil(
        sum(len(v) for v in filenames.values()) / max(len(filenames), 1)))
    return dataset(base_path=f"{data_path}/clips_360p_segm",
                   video_files=filenames, class_labels=class_labels,
                   class_desc=vocab, oversample=oversample, **kwargs)


def get_audioset(data_path, dataset=VideoDataset, partition="unbalanced_train",
                 class_resample=0, **kwargs):
    ontology = list(csv.reader(open(f"{data_path}/annotations/class_labels_indices.csv")))[1:]
    labels = {cls: int(idx) for idx, cls, desc in ontology}
    desc = [d for _, _, d in ontology]
    rows = list(csv.reader(open(f"{data_path}/annotations/{partition}_segments.csv")))[3:]
    avail = set("/".join(fn.split("/")[-2:])
                for fn in glob.glob(f"{data_path}/clips/*/*.mp4"))
    filenames, class_labels = [], []
    for d in rows:
        yid, st, et = d[0], float(d[1].strip()), float(d[2].strip())
        cls = [labels[c.strip().replace('"', "")] for c in d[3:]]
        fn = f"{yid[:2]}/{yid}_{int(st):06d}_{int(et):06d}.mp4"
        if fn in avail:
            filenames.append(fn)
            class_labels.append(cls)
    return dataset(base_path=f"{data_path}/clips", video_files=filenames,
                   class_labels=class_labels, class_desc=desc, **kwargs)


def _get_avsbench(data_path, partition, versions, return_semantics, oversample,
                  label_fix=None, split_objs=True, **kwargs):
    data = list(csv.reader(open(f"{data_path}/metadata.csv")))[1:]
    classes = json.load(open(f"{data_path}/label2idx.json"))
    if versions is not None:
        data = [d for d in data if d[-2] == partition and d[-1] in versions]
    else:
        data = [d for d in data if d[-2] == partition]
    samples, class_labels = [], []
    for vid, uid, s_min, s_sec, a_obj, split, label in data:
        folder = f"{label}/{uid}"
        if os.path.exists(f"{data_path}/{folder}"):
            samples.append(folder)
            # S4 rows name ONE object whose class name may itself contain
            # underscores — the reference looks it up whole (datasets.py:660);
            # only MS3/AVSS split multi-object strings on '_' (:684, :707).
            names = a_obj.split("_") if split_objs else [a_obj]
            if label_fix:
                names = [label_fix(n) for n in names]
            class_labels.append([classes[n] for n in names])
    return FolderVideoDataset(
        path=data_path, samples=samples, class_labels=class_labels,
        oversample=oversample if partition == "train" else 1,
        return_semantics=return_semantics, **kwargs,
    )


def get_avsbench_s4(data_path, partition="train", **kwargs):
    kwargs.pop("dataset", None)
    return _get_avsbench(data_path, partition, ("v1s",), False, 10,
                         label_fix=None, split_objs=False, **kwargs)


def get_avsbench_ms3(data_path, partition="train", **kwargs):
    kwargs.pop("dataset", None)
    return _get_avsbench(data_path, partition, ("v1m",), False, 100, **kwargs)


def get_avsbench_avss(data_path, partition="train", **kwargs):
    kwargs.pop("dataset", None)
    return _get_avsbench(
        data_path, partition, None, True, 5,
        label_fix=lambda n: n.replace("off-the-screen", "background"), **kwargs)


class ImageAudioDataset:
    """Image + wav pairs (reference datasets.py:376-510): center audio window,
    optional waveform mixtures, class-balanced resampling, per-sample
    annotation loader (e.g. Flickr-SoundNet XML bboxes)."""

    def __init__(self, data_path, image_files, audio_files,
                 audio_dur=3.0, audio_rate=16000, num_mixtures=1,
                 visual_transform=None, audio_transform=None,
                 anno_files=None, anno_loader=None,
                 class_labels=None, class_desc=None,
                 class_resample=0, oversample=None, **_):
        self.data_path = data_path
        self.image_files = image_files
        self.audio_files = audio_files
        self.anno_files = anno_files
        self.anno_loader = anno_loader
        self.class_labels = class_labels
        self.class_desc = class_desc
        self.audio_dur = audio_dur
        self.audio_rate = audio_rate
        self.num_mixtures = num_mixtures
        self.visual_transform = visual_transform
        self.audio_transform = audio_transform
        self.oversample = int(oversample) if oversample else 1

        self.class_resample = class_resample
        if class_resample:
            self.class2samples = defaultdict(list)
            for idx, lbl in enumerate(class_labels):
                for l in lbl if isinstance(lbl, (list, tuple)) else [lbl]:
                    self.class2samples[l].append(idx)
            self.class_keys = sorted(self.class2samples)

    def _sample_idx(self, idx):
        idx = idx % len(self.image_files)
        if self.class_resample:
            lbl = random.choice(self.class_keys)
            idx = random.choice(self.class2samples[lbl])
        return idx

    def _read_pair(self, image_fn, audio_fn, anno=None):
        frame = Image.open(image_fn).convert("RGB")
        if anno is not None and "gt_map" in anno:
            gt = Image.fromarray((np.asarray(anno["gt_map"]) * 255).astype(np.uint8))
            frame, (gt,) = self.visual_transform(frame, labels=(gt,))
            anno["gt_map"] = np.asarray(gt, np.float32) / 255.0
        else:
            frame = self.visual_transform(frame)
            if isinstance(frame, tuple):
                frame = frame[0]

        areader = avreader.AudioReader(audio_fn, rate=self.audio_rate)
        start = max((areader.duration - self.audio_dur) / 2, 0.0)
        wav = areader.read(start, start + self.audio_dur)
        areader.close()
        mel = self.audio_transform(wav)[0][..., None]
        return frame, mel, wav

    def __len__(self):
        return len(self.image_files) * self.oversample

    def __getitem__(self, idx):
        idx = self._sample_idx(idx)
        anno = {"file_id": self.image_files[idx].split(".")[0]}
        if self.class_labels is not None:
            lbl = self.class_labels[idx]
            if isinstance(lbl, (list, tuple)):
                lbl = _one_hot_multi(lbl, len(self.class_desc))
            anno["class"] = lbl
        if self.anno_files is not None and self.anno_loader is not None:
            anno.update(self.anno_loader(f"{self.data_path}/{self.anno_files[idx]}"))

        frame, mel, wav = self._read_pair(
            f"{self.data_path}/{self.image_files[idx]}",
            f"{self.data_path}/{self.audio_files[idx]}", anno)
        out = {"image": np.asarray(frame, np.float32),
               "audio": mel.astype(np.float32), **anno}

        if self.num_mixtures > 1:
            waves, frames = [wav], [np.asarray(frame, np.float32)]
            others = [r for r in range(len(self.image_files)) if r != idx]
            for m in np.random.choice(others, self.num_mixtures - 1, replace=False):
                f2, _, w2 = self._read_pair(
                    f"{self.data_path}/{self.image_files[m]}",
                    f"{self.data_path}/{self.audio_files[m]}")
                waves.append(w2)
                frames.append(np.asarray(f2, np.float32))
            mix = np.stack(waves).sum(0)
            out["mixed_audio"] = self.audio_transform(mix)[0][..., None].astype(np.float32)
            out["waveforms"] = np.stack([w[0] for w in waves]).astype(np.float32)
            out["frames"] = np.stack(frames)
        return out


def flickr_anno_parser(fn):
    import xml.etree.ElementTree as ET

    bboxes = [node for field in ET.parse(fn).getroot() for node in field
              if node.tag == "bbox"]
    bboxes = [[int(ch.text) * 224 // 256 for ch in bb[1:]] for bb in bboxes]
    loc = np.zeros((224, 224), np.float32)
    for xmin, ymin, xmax, ymax in bboxes:
        loc[ymin:ymax, xmin:xmax] += 1
    return {"gt_map": np.clip(loc / 2, 0, 1)}


def load_flickr_soundnet(data_path, partition="val", metadata_dir="metadata",
                         **kwargs):
    """Flickr-SoundNet sound-localization eval set (reference :737-754)."""
    assert partition == "val"
    metadata_dir = resolve_metadata_dir(metadata_dir)
    video_ids = [v for v, t in csv.reader(open(f"{metadata_dir}/flickr_test.csv"))]
    kwargs.pop("dataset", None)
    return ImageAudioDataset(
        data_path,
        image_files=[f"frames/{v}.jpg" for v in video_ids],
        audio_files=[f"audio/{v}.wav" for v in video_ids],
        anno_files=[f"Annotations/{v}.xml" for v in video_ids],
        anno_loader=flickr_anno_parser,
        **kwargs,
    )


DATASET_TYPES = {
    "simple": VideoDataset,
    "dense": DenseVideoDataset,
    "mixed_audio": MixtureVideoDataset,
}


def load_dataset(dataset, data_path, dataset_type="simple", train=True, **kwargs):
    """Dispatcher (reference datasets.py:757-792)."""
    cls = DATASET_TYPES[dataset_type]
    if dataset == "audioset":
        return get_audioset(data_path, cls, "unbalanced_train" if train else "eval", **kwargs)
    if dataset == "audioset-bal":
        return get_audioset(data_path, cls, "unbalanced_train" if train else "eval",
                            class_resample=100, **kwargs)
    if dataset == "audioset-bal-orig":
        return get_audioset(data_path, cls, "balanced_train" if train else "eval", **kwargs)
    if dataset == "vggsound":
        return get_vggsound(data_path, cls, "train" if train else "test", **kwargs)
    if dataset == "vggsound_music":
        return get_vggsound_music(data_path, cls, "train" if train else "test", **kwargs)
    if dataset == "music":
        return get_music(data_path, cls, "train" if train else "test", "music", **kwargs)
    if dataset == "music_solo":
        return get_music(data_path, cls, "train" if train else "test", "solo", **kwargs)
    if dataset == "music_solo21":
        return get_music(data_path, cls, "train" if train else "test", "solo21", **kwargs)
    if dataset == "avsbench_s4":
        return get_avsbench_s4(data_path, "train" if train else "val", **kwargs)
    if dataset == "avsbench_ms3":
        return get_avsbench_ms3(data_path, "train" if train else "val", **kwargs)
    if dataset == "avsbench_avss":
        return get_avsbench_avss(data_path, "train" if train else "val", **kwargs)
    if dataset == "flickr_soundnet_5k":
        return load_flickr_soundnet(data_path, "train" if train else "val", **kwargs)
    raise NotImplementedError(dataset)


class AVSyncVideoDataset(BaseVideoDataset):
    """Audio-visual synchronization pairs for the avsync task.

    The reference ships the avsync config + VideoEarlyFusion models but no
    dataset implementation (its dispatcher raises for dataset_type='avsync';
    the __main__ smoke loop at datasets.py:813-841 shows the intended
    interface: sync_prob, asyn_gap, num_frames, video_rate). Each sample is a
    short video clip plus an audio span either aligned (label 1) or offset by
    a gap drawn from ``asyn_gap`` seconds (label 0).
    """

    def __init__(self, *args, visual_transform=None, audio_transform=None,
                 num_frames=16, video_rate=8, sync_prob=0.5,
                 asyn_gap=(0.125, 2.0), **kw):
        super().__init__(*args, **kw)
        self.visual_transform = visual_transform
        self.audio_transform = audio_transform
        self.num_frames = num_frames
        self.video_rate = video_rate
        self.sync_prob = sync_prob
        self.asyn_gap = asyn_gap

    def getitem(self, idx):
        file_id, filename, anno = self.get_sample_metadata(idx)
        vt = self.visual_transform
        fused = hasattr(vt, "crop_spec")
        if fused:
            vreader = areader = avreader.AVReader(filename, rate=self.audio_rate)
            a_start0, a_dur = areader.audio_start_time, areader.audio_duration
        else:
            vreader = avreader.VideoReader(filename)
            areader = avreader.AudioReader(filename, rate=self.audio_rate)
            a_start0, a_dur = areader.start_time, areader.duration

        clip_dur = self.num_frames / self.video_rate
        vt0 = vreader.start_time
        vt1 = vreader.start_time + vreader.duration - clip_dur
        t = random.uniform(vt0, max(vt0, vt1))
        if fused:
            # one crop/flip for the whole clip (temporally consistent video
            # augmentation), decoded crop-at-scale in the C++ stage
            crop, out_size, flip = vt.crop_spec(vreader.width, vreader.height)
            raw, _ = vreader.get_clip(t, t + clip_dur, fps=self.video_rate,
                                      size=out_size, crop=crop)
            frames = np.stack([vt.finish(f, flip)
                               for f in raw[: self.num_frames]])
        else:
            raw, _ = vreader.get_clip(t, t + clip_dur, fps=self.video_rate)
            # temporally consistent augmentation in the fallback too: replay
            # the same RNG state for every frame so a single crop/flip is
            # drawn per clip, matching the fused path's one crop_spec.
            py_state, np_state = random.getstate(), np.random.get_state()
            out = []
            for f in raw[: self.num_frames]:
                random.setstate(py_state)
                np.random.set_state(np_state)
                out.append(vt(Image.fromarray(f)))
            frames = np.stack(out)

        is_sync = random.random() < self.sync_prob
        a_mid = t + clip_dur / 2
        if not is_sync:
            lo, hi = self.asyn_gap
            hi = min(hi if np.isfinite(hi) else a_dur, a_dur)
            gap = random.uniform(lo, max(lo, hi)) * random.choice([-1, 1])
            a_mid = a_mid + gap
        a_start = min(max(a_mid - self.audio_dur / 2, a_start0),
                      a_start0 + a_dur - self.audio_dur)
        wav = areader.read(a_start, a_start + self.audio_dur)
        mel = self.audio_transform(wav)[0][..., None]
        vreader.close()
        if not fused:
            areader.close()
        return {"video": frames.astype(np.float32),
                "audio": mel.astype(np.float32),
                "sync": np.int32(is_sync), "file_id": file_id}
