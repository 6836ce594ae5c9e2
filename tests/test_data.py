"""Data-layer tests: transforms parity, datasets over generated media, loader."""
import csv
import json
import os
import wave

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from avi_writer import make_test_video
from deepavfusion_tpu.data import datasets, loader, transforms
from deepavfusion_tpu.ops import audio as audio_ops


# --------------------------------------------------------------------------- #
# Transforms
# --------------------------------------------------------------------------- #
def test_numpy_log_mel_matches_jax():
    rng = np.random.RandomState(0)
    wav = rng.randn(1, 48000).astype(np.float32) * 0.1
    got = transforms.log_mel_np(wav, 16000, 128)
    want = np.asarray(audio_ops.log_mel(jnp.asarray(wav), 16000, 3.0, 128))
    assert got.shape == want.shape == (1, 128, 192)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_image_train_transform_shape_and_norm():
    img = Image.fromarray(np.full((100, 160, 3), 128, np.uint8))
    t = transforms.ImageTrainTransform(64, crop_min=0.5)
    out = t(img)
    assert out.shape == (64, 64, 3)
    # gray 128/255 normalized
    want = (128 / 255.0 - transforms.IMAGENET_MEAN) / transforms.IMAGENET_STD
    np.testing.assert_allclose(out[0, 0], want, atol=1e-5)


def test_image_eval_transform_center_crop():
    # distinct center: black image with white center pixel block
    arr = np.zeros((128, 256, 3), np.uint8)
    arr[54:74, 118:138] = 255
    t = transforms.ImageEvalTransform(112)  # resize shorter side to 128, crop 112
    out = t(Image.fromarray(arr))
    assert out.shape == (112, 112, 3)
    # white block lands in the crop center
    assert out[56, 56, 0] > out[0, 0, 0]


def test_paired_label_transform_nearest():
    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    lbl = Image.fromarray((np.arange(64 * 64).reshape(64, 64) % 5).astype(np.uint8))
    t = transforms.ImageEvalTransform(32, resize_factor=1.0)
    out, (lbl_out,) = t(img, labels=(lbl,))
    lbl_np = np.asarray(lbl_out)
    assert lbl_np.shape == (32, 32)
    assert set(np.unique(lbl_np)) <= {0, 1, 2, 3, 4}  # nearest keeps exact ids


# --------------------------------------------------------------------------- #
# Fake datasets on disk
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def vggsound_root(tmp_path_factory):
    """VGGSound-layout directory with 4 generated AV clips in 2 classes."""
    root = tmp_path_factory.mktemp("vggsound")
    (root / "annotations").mkdir()
    rows = []
    for i, cls in enumerate(["dog_barking", "cat_meowing"] * 2):
        yid = f"vid{i:011d}"
        (root / "clips" / cls).mkdir(parents=True, exist_ok=True)
        make_test_video(str(root / "clips" / cls / f"{yid}_000000_000010.mp4"),
                        seconds=4.0, fps=5, tone_hz=300 + 100 * i, seed=i)
        rows.append([yid, "0", cls.replace("_", " ", 1), "train" if i < 3 else "test"])
    with open(root / "annotations" / "vggsound.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(root)


def test_vggsound_catalog_and_simple_dataset(vggsound_root):
    db = datasets.get_vggsound(
        vggsound_root, datasets.VideoDataset, partition="train",
        visual_transform=transforms.ImageTrainTransform(32),
        audio_transform=transforms.AudioTrainTransform(16000, 3.0, 64),
        audio_dur=3.0, audio_rate=16000, temporal_jitter=True,
    )
    assert len(db) == 3
    assert db.class_dist is not None
    s = db[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["audio"].shape == (64, 192, 1)
    assert isinstance(s["class"], (int, np.integer))


def test_dense_dataset(vggsound_root):
    db = datasets.get_vggsound(
        vggsound_root, datasets.DenseVideoDataset, partition="train",
        visual_transform=transforms.ImageEvalTransform(32),
        audio_transform=transforms.AudioEvalTransform(16000, 3.0, 64),
        audio_dur=3.0, audio_rate=16000, dense_n=4, dense_span=4,
    )
    s = db[0]
    assert s["image"].shape == (4, 32, 32, 3)
    assert s["audio"].shape == (4, 64, 192, 1)


def test_mixture_dataset(vggsound_root):
    db = datasets.get_vggsound(
        vggsound_root, datasets.MixtureVideoDataset, partition="train",
        visual_transform=transforms.ImageEvalTransform(32),
        audio_transform=transforms.AudioEvalTransform(16000, 3.0, 64),
        audio_dur=3.0, audio_rate=16000, num_mixtures=2,
    )
    s = db[0]
    assert s["audio"].shape == (64, 192, 1)
    assert s["mixed_audio"].shape == (64, 192, 1)
    assert s["frames"].shape == (2, 32, 32, 3)
    assert s["waveforms"].shape == (2, 48000)
    # mixture spec differs from single-source spec
    assert np.abs(s["mixed_audio"] - s["audio"]).max() > 0.1


@pytest.fixture(scope="module")
def avsbench_root(tmp_path_factory):
    """AVSBench folder layout: label/uid/{frames,labels_semantic,audio.wav}."""
    root = tmp_path_factory.mktemp("avsbench")
    rows = [["vid", "uid", "s_min", "s_sec", "a_obj", "split", "label"]]
    classes = {"background": 0, "dog": 1, "cat": 2}
    for i, (obj, label) in enumerate([("dog", "v1s"), ("cat", "v1s")]):
        uid = f"u{i}"
        d = root / label / uid
        (d / "frames").mkdir(parents=True)
        (d / "labels_semantic").mkdir()
        for fn in range(5):
            Image.fromarray(
                np.full((48, 64, 3), 40 * fn, np.uint8)).save(d / "frames" / f"{fn}.jpg")
            m = np.zeros((48, 64), np.uint8)
            m[10:30, 10:40] = classes[obj]
            Image.fromarray(m).save(d / "labels_semantic" / f"{fn}.png")
        rate = 16000
        t = np.arange(rate * 5) / rate
        tone = (0.4 * np.sin(2 * np.pi * 440 * t) * 32767).astype(np.int16)
        with wave.open(str(d / "audio.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(tone.tobytes())
        rows.append(["v", uid, "0", "0", obj, "train", label])
    with open(root / "metadata.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    json.dump(classes, open(root / "label2idx.json", "w"))
    return str(root)


def test_avsbench_s4_dataset(avsbench_root):
    db = datasets.get_avsbench_s4(
        avsbench_root, partition="train",
        visual_transform=transforms.ImageTrainTransform(32),
        audio_transform=transforms.AudioTrainTransform(16000, 3.0, 64),
        audio_dur=3.0, audio_rate=16000, temporal_jitter=True,
    )
    assert len(db) == 20  # 2 samples × oversample 10
    s = db[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["audio"].shape == (64, 192, 1)
    assert s["gt_map"].shape == (32, 32)
    assert s["gt_map"].dtype == np.float32   # binary task
    assert set(np.unique(s["gt_map"])) <= {0.0, 1.0}


def test_avsbench_dense_eval(avsbench_root):
    db = datasets.get_avsbench_s4(
        avsbench_root, partition="train",
        visual_transform=transforms.ImageEvalTransform(32, resize_factor=1.0),
        audio_transform=transforms.AudioEvalTransform(16000, 3.0, 64),
        audio_dur=3.0, audio_rate=16000, temporal_jitter=False, dense=True,
    )
    s = db[0]
    assert s["image"].shape == (5, 32, 32, 3)
    assert s["gt_map"].shape == (5, 32, 32)


def test_loader_batches(vggsound_root):
    db = datasets.get_vggsound(
        vggsound_root, datasets.VideoDataset, partition="train",
        visual_transform=transforms.ImageTrainTransform(32),
        audio_transform=transforms.AudioTrainTransform(16000, 3.0, 64),
        audio_dur=3.0, audio_rate=16000, temporal_jitter=True,
    )
    dl = loader.get_dataloader(db, batch_size=2, workers=2, shuffle=True)
    batches = list(dl)
    assert len(batches) == 1  # 3 samples, drop_last
    b = batches[0]
    assert b["image"].shape == (2, 32, 32, 3)
    assert b["audio"].shape == (2, 64, 192, 1)
    assert b["class"].shape == (2,)


def test_retry_on_corrupt_sample(vggsound_root, tmp_path):
    db = datasets.get_vggsound(
        vggsound_root, datasets.VideoDataset, partition="train",
        visual_transform=transforms.ImageTrainTransform(32),
        audio_transform=transforms.AudioTrainTransform(16000, 3.0, 64),
        audio_dur=3.0, audio_rate=16000,
    )
    # corrupt one file path in the list; __getitem__ must retry another sample
    db.video_files = ["nonexistent/broken.mp4"] + list(db.video_files[1:])
    s = db[0]
    assert s["image"].shape == (32, 32, 3)


@pytest.fixture(scope="module")
def flickr_root(tmp_path_factory):
    """Flickr-SoundNet layout: frames/*.jpg + audio/*.wav + Annotations/*.xml."""
    root = tmp_path_factory.mktemp("flickr")
    meta = tmp_path_factory.mktemp("metadata")
    (root / "frames").mkdir()
    (root / "audio").mkdir()
    (root / "Annotations").mkdir()
    rows = []
    for i in range(3):
        vid = f"fl{i}"
        Image.fromarray(np.full((256, 256, 3), 50 * i, np.uint8)).save(
            root / "frames" / f"{vid}.jpg")
        rate = 16000
        t = np.arange(rate * 4) / rate
        tone = (0.4 * np.sin(2 * np.pi * (300 + 100 * i) * t) * 32767).astype(np.int16)
        with wave.open(str(root / "audio" / f"{vid}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(tone.tobytes())
        (root / "Annotations" / f"{vid}.xml").write_text(
            "<annotation><object><name>x</name><bbox>"
            "<c>1</c><xmin>64</xmin><ymin>64</ymin><xmax>192</xmax><ymax>192</ymax>"
            "</bbox></object></annotation>")
        rows.append([vid, "0"])
    with open(meta / "flickr_test.csv", "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return str(root), str(meta)


def test_flickr_soundnet_dataset(flickr_root):
    root, meta = flickr_root
    db = datasets.load_flickr_soundnet(
        root, partition="val", metadata_dir=meta,
        visual_transform=transforms.ImageEvalTransform(224, resize_factor=1.0),
        audio_transform=transforms.AudioEvalTransform(16000, 3.0, 64),
        audio_dur=3.0, audio_rate=16000,
    )
    assert len(db) == 3
    s = db[0]
    assert s["image"].shape == (224, 224, 3)
    assert s["audio"].shape == (64, 192, 1)
    assert s["gt_map"].shape == (224, 224)
    # consensus bbox map is 0.5 inside the single box (clip(1/2))
    assert abs(s["gt_map"][112, 112] - 0.5) < 0.02
    assert s["gt_map"][5, 5] == 0.0


def test_image_audio_mixture(flickr_root):
    root, meta = flickr_root
    db = datasets.load_flickr_soundnet(
        root, partition="val", metadata_dir=meta,
        visual_transform=transforms.ImageEvalTransform(64, resize_factor=1.0),
        audio_transform=transforms.AudioEvalTransform(16000, 3.0, 64),
        audio_dur=3.0, audio_rate=16000, num_mixtures=2,
    )
    s = db[0]
    assert s["mixed_audio"].shape == (64, 192, 1)
    assert s["waveforms"].shape == (2, 48000)
    assert s["frames"].shape == (2, 64, 64, 3)


def test_retry_bounded_on_fully_broken_dataset():
    db = datasets.VideoDataset(
        base_path="/nonexistent", video_files=["a.mp4", "b.mp4"],
        visual_transform=None, audio_transform=None,
    )
    with pytest.raises(Exception):
        db[0]   # must raise, not recurse forever


def _pipeline_args(vggsound_root, **over):
    from deepavfusion_tpu.config import load_config

    overrides = [
        "data.synthetic=false", f"data.data_path={vggsound_root}",
        "data.dataset=vggsound", "opt.batch_size=2", "opt.accum_iter=1",
        "env.workers=2", "data.audio_mels=64",
    ] + [f"{k}={v}" for k, v in over.items()]
    return load_config("deepavfusion", overrides=overrides)


def test_pipeline_pretrain_loader(vggsound_root):
    from deepavfusion_tpu.data import pipeline
    from deepavfusion_tpu.train.pretrain import PretrainConfig

    args = _pipeline_args(vggsound_root)
    cfg = PretrainConfig(batch_size=2, accum_iter=1, audio_mels=64, image_size=224)
    dl = pipeline.pretrain_loader(args, cfg, epoch=0)
    batch = next(iter(dl))
    assert batch["image"].shape == (2, 224, 224, 3)
    assert batch["audio"].shape == (2, 64, 192, 1)


def test_pipeline_classification_loader_and_class_dist(vggsound_root):
    from deepavfusion_tpu.data import pipeline

    args = _pipeline_args(vggsound_root)
    dl = pipeline.classification_loader(args, train=True, epoch=0)
    batch = next(iter(dl))
    assert batch["image"].shape[0] == 2
    assert "class" in batch

    dist = pipeline.class_distribution(args)
    assert dist.ndim == 1 and abs(dist.sum() - 1.0) < 1e-5


def test_loader_replacement_default_matches_reference():
    """Non-distributed shuffled loading samples WITH replacement
    (reference util/data.py:10-12); distributed does not."""
    from deepavfusion_tpu.data import loader

    class Tiny:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"x": np.zeros(2, np.float32)}

    dl = loader.get_dataloader(Tiny(), distributed=False, batch_size=2)
    assert dl.replacement is True
    dl = loader.get_dataloader(Tiny(), distributed=True, batch_size=2)
    assert dl.replacement is False
    dl = loader.get_dataloader(Tiny(), distributed=False, batch_size=2,
                               shuffle=False)
    assert dl.replacement is False
    # replacement sampling actually repeats indices
    dl = loader.get_dataloader(Tiny(), distributed=False, batch_size=2, seed=3)
    idxs = dl._indices()
    assert len(idxs) == 10 and len(set(idxs)) < 10


def test_folder_fused_jpeg_decode_matches_pil(avsbench_root, tmp_path):
    """The C++ stage decodes single JPEGs (image2 demuxer) with fused
    crop+scale; label maps get the same geometry via finish_label."""
    import glob as _glob

    from deepavfusion_tpu.data import avreader

    jpg = sorted(_glob.glob(f"{avsbench_root}/v1s/u0/frames/*.jpg"))[0]
    r = avreader.VideoReader(jpg)
    assert (r.width, r.height) == (64, 48)
    arr, _ = r.precise_frame(0.0, size=(32, 32), crop=(8, 4, 48, 40))
    r.close()
    pil = Image.open(jpg).convert("RGB").crop((8, 4, 56, 44)).resize(
        (32, 32), Image.BILINEAR)
    diff = np.abs(np.asarray(pil, np.float32) - arr.astype(np.float32))
    assert diff.mean() < 4.0, diff.mean()

    lbl = Image.open(sorted(
        _glob.glob(f"{avsbench_root}/v1s/u0/labels_semantic/*.png"))[0]).convert("L")
    out = transforms.finish_label(lbl, (8, 4, 48, 40), (32, 32), flip=True)
    assert out.shape == (32, 32)
    assert set(np.unique(out)) <= set(np.unique(np.asarray(lbl)))
