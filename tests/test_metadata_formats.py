"""Every catalog parser vs miniature fixtures in the EXACT upstream formats.

VERDICT round-2 item 6: 20 of 23 split files arrive via
metadata/fetch_metadata.sh and their real formats were untested in-image.
tests/fixtures/metadata_formats/ commits miniature files that reproduce the
upstream quirks the reference's parsers depend on (reference
datasets.py:513-755):

  * vggsound.csv — no header, quoted labels containing commas/spaces;
  * AudioSet class_labels_indices.csv (index,mid,display_name header, quoted
    display names) + *_segments.csv (3 `#` comment lines; LEADING SPACES
    before the quoted multi-mid field, so csv.reader splits the mids across
    columns d[3:] — the quirk the strip/replace('"') handling exists for);
  * MUSIC anno csvs — header + (video_id, class-with-spaces, url) columns;
  * AVSBench metadata.csv (vid,uid,s_min,s_sec,a_obj,split,label) +
    label2idx.json — incl. single-object S4 class names containing '_';
  * Flickr-SoundNet Annotations XML — bbox children in 256-px space.
"""
import csv
import json
import os
import shutil
from pathlib import Path

import numpy as np

from deepavfusion_tpu.data import datasets as D

FIX = Path(__file__).parent / "fixtures" / "metadata_formats"


def _touch(p):
    Path(p).parent.mkdir(parents=True, exist_ok=True)
    Path(p).touch()


def test_vggsound_format(tmp_path):
    dp = tmp_path
    (dp / "annotations").mkdir()
    shutil.copy(FIX / "vggsound.csv", dp / "annotations" / "vggsound.csv")
    # clips/ dirs define the class dictionary (sorted listdir); make all 4
    # classes plus the on-disk files for 3 of the 4 train rows
    want = {
        "--4gqARaEJE": ("playing_tennis", 0),
        "-1pRmoJIGQc": ("vehicle_horn__car_horn__honking", 63),
        "-5cWYy0UB3E": ("people_crowd", 121),
    }
    for cls in ("playing_tennis", "vehicle_horn__car_horn__honking",
                "people_crowd", "fireworks_banging", "race_car__auto_racing"):
        (dp / "clips" / cls).mkdir(parents=True)
    for yid, (cls, t) in want.items():
        _touch(dp / "clips" / cls / f"{yid}_{t:06d}_{t + 10:06d}.mp4")

    db = D.get_vggsound(str(dp), partition="train")
    assert sorted(db.video_files) == sorted(
        f"{cls}/{yid}_{t:06d}_{t + 10:06d}.mp4" for yid, (cls, t) in want.items())
    # labels index into the sorted clips/ listing, exactly like the reference
    dictionary = sorted(os.listdir(dp / "clips"))
    got = dict(zip(db.video_files, db.class_labels))
    for yid, (cls, t) in want.items():
        fn = f"{cls}/{yid}_{t:06d}_{t + 10:06d}.mp4"
        assert got[fn] == dictionary.index(cls), (fn, got[fn])
    assert db.class_desc == dictionary

    # test split: only the on-disk race_car clip
    _touch(dp / "clips" / "race_car__auto_racing" /
           "-2AHYz1HJbU_000010_000020.mp4")
    db_test = D.get_vggsound(str(dp), partition="test")
    assert db_test.video_files == [
        "race_car__auto_racing/-2AHYz1HJbU_000010_000020.mp4"]


def test_audioset_format(tmp_path):
    dp = tmp_path
    (dp / "annotations").mkdir()
    shutil.copy(FIX / "class_labels_indices.csv",
                dp / "annotations" / "class_labels_indices.csv")
    shutil.copy(FIX / "balanced_train_segments.csv",
                dp / "annotations" / "balanced_train_segments.csv")
    rows = {
        "--PJHxphWEs": (30, 40, [0, 2]),     # "/m/09x0r,/m/03qc9zr"
        "--ZhevVpy1s": (50, 60, [1]),
        "-0RWZT-miFs": (420, 430, [3, 0, 1]),
    }
    for yid, (st, et, _) in rows.items():
        _touch(dp / "clips" / yid[:2] / f"{yid}_{st:06d}_{et:06d}.mp4")

    db = D.get_audioset(str(dp), partition="balanced_train")
    assert len(db.video_files) == 3
    got = dict(zip(db.video_files, db.class_labels))
    for yid, (st, et, cls) in rows.items():
        fn = f"{yid[:2]}/{yid}_{st:06d}_{et:06d}.mp4"
        assert got[fn] == cls, (fn, got[fn], cls)
    # display_name column (quoted, with commas) becomes class_desc verbatim
    assert db.class_desc[1] == "Male speech, man speaking"
    assert db.class_desc[3] == "Chewing, mastication"


def test_music_format(tmp_path):
    dp = tmp_path
    (dp / "anno").mkdir()
    shutil.copy(FIX / "music_solo.csv", dp / "anno" / "music_solo.csv")
    shutil.copy(FIX / "music21_duet.csv", dp / "anno" / "music21_duet.csv")
    # materialize segmented clips for a subset: ids keep >=130 solos so the
    # reference's [::len//130] eval slicing is exercised as upstream
    solo_rows = list(csv.reader(open(FIX / "music_solo.csv")))[1:]
    duet_rows = list(csv.reader(open(FIX / "music21_duet.csv")))[1:]
    for yid, cls, _ in solo_rows:
        cls = cls.replace(" ", "_")
        for seg in range(2):
            _touch(dp / "clips_360p_segm" / cls / f"{yid}.{seg}.mp4")
    for yid, cls, _ in duet_rows:
        cls = cls.replace(" ", "_")
        _touch(dp / "clips_360p_segm" / cls / f"{yid}.0.mp4")

    db_tr = D.get_music(str(dp), partition="train", version="music")
    db_ev = D.get_music(str(dp), partition="eval", version="music")
    n_solo = len(solo_rows)
    eval_ids = set(sorted(r[0] for r in solo_rows)[:: n_solo // 130])

    def ids(db):  # dict-valued file lists flatten grouped-by-video (Base ctor)
        return {fn.split("/")[1].split(".", 1)[0] for fn in db.video_files}

    assert ids(db_ev) == eval_ids
    assert len(db_tr.video_files) > 0
    assert not (ids(db_tr) & eval_ids)
    # each solo id contributes its two segments; labels index the joint vocab
    vocab = sorted({r[1].replace(" ", "_") for r in solo_rows + duet_rows})
    for fn, lbl in zip(db_tr.video_files, db_tr.class_labels):
        assert lbl == vocab.index(fn.split("/")[0]), (fn, lbl)
    some = sorted(ids(db_ev))[0]
    assert sum(fn.split("/")[1].startswith(some) for fn in db_ev.video_files) == 2
    assert db_tr.oversample >= 1


def _avsbench_tree(tmp_path):
    dp = tmp_path
    shutil.copy(FIX / "avsbench_metadata.csv", dp / "metadata.csv")
    shutil.copy(FIX / "avsbench_label2idx.json", dp / "label2idx.json")
    for row in list(csv.reader(open(FIX / "avsbench_metadata.csv")))[1:]:
        _, uid, _, _, _, _, label = row
        (dp / label / uid).mkdir(parents=True, exist_ok=True)
    return dp


def test_avsbench_s4_format(tmp_path):
    dp = _avsbench_tree(tmp_path)
    classes = json.load(open(FIX / "avsbench_label2idx.json"))
    db = D.get_avsbench_s4(str(dp), partition="train")
    assert db.samples == ["v1s/0_vEOBMYmIli0", "v1s/2_mJ2jGsUJpes"]
    # single-object class names keep their underscores (reference :660)
    assert db.class_labels == [[classes["human_voice"]],
                               [classes["dog_barking"]]]
    assert db.oversample == 10 and db.return_semantics is False
    db_t = D.get_avsbench_s4(str(dp), partition="test")
    assert db_t.class_labels == [[classes["cap_gun_shooting"]]]
    assert db_t.oversample == 1


def test_avsbench_ms3_format(tmp_path):
    dp = _avsbench_tree(tmp_path)
    classes = json.load(open(FIX / "avsbench_label2idx.json"))
    db = D.get_avsbench_ms3(str(dp), partition="train")
    assert db.samples == ["v1m/3_lKcWnYnlF1E"]
    # multi-object strings split on '_' (reference :684)
    assert db.class_labels == [[classes["baby"], classes["man"]]]
    assert db.oversample == 100


def test_avsbench_avss_format(tmp_path):
    dp = _avsbench_tree(tmp_path)
    classes = json.load(open(FIX / "avsbench_label2idx.json"))
    db = D.get_avsbench_avss(str(dp), partition="train")
    # all versions for the partition; off-the-screen → background (:707);
    # AVSS splits even the v1s single-object names (reference :704)
    assert db.samples == ["v1s/0_vEOBMYmIli0", "v1s/2_mJ2jGsUJpes",
                          "v1m/3_lKcWnYnlF1E", "v2/5_ABCDEFGHIJK"]
    assert db.class_labels[0] == [classes["human"], classes["voice"]]
    assert db.class_labels[1] == [classes["dog"], classes["barking"]]
    assert db.class_labels[3] == [classes["human"], classes["voice"],
                                  classes["dog"]]
    assert db.return_semantics is True
    db_v = D.get_avsbench_avss(str(dp), partition="val")
    assert db_v.class_labels == [[classes["background"], classes["man"]]]


def test_flickr_xml_consensus_map():
    out = D.flickr_anno_parser(str(FIX / "flickr_anno.xml"))
    gt = np.asarray(out["gt_map"], np.float32)
    assert gt.shape == (224, 224)
    # bboxes scaled by 224//256: [56,28,168,196] and [70,35,175,210]
    assert gt[30, 60] == 0.5      # covered by exactly one bbox → 1/2
    assert gt[100, 100] == 1.0    # covered by both → clipped to 1
    assert gt[0, 0] == 0.0
    assert gt[28, 56] == 0.5 and gt[27, 55] == 0.0  # exact top-left corner
