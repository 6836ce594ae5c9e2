"""Cross-process eval-gather tests (process-count-mocked).

The reference gathers predictions/features across ranks before scoring
(reference util/distributed.py:114-127 concat_all_gather, used at
eval_linprobe.py:242-246 and util/knn_probe.py:108-111). Here the loader
shards the val set per host, so `mesh_lib.host_gather` must run before any
metric computation. These tests mock the process count to verify the gather
is actually invoked at the call sites, and that scoring gathered shards
equals scoring the full set in a single process.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

import jax
from jax.experimental import multihost_utils

from deepavfusion_tpu.parallel import mesh as mesh_lib
from deepavfusion_tpu.train import classify
from deepavfusion_tpu.train import knn_probe


def test_host_gather_identity_single_process():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = mesh_lib.host_gather(x)
    np.testing.assert_array_equal(out, x)


def _mock_two_hosts(monkeypatch, other_shard_fn):
    """Pretend to be host 0 of 2; process_allgather returns [mine; other]."""
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    def fake_allgather(tree, tiled=False):
        assert tiled, "host_gather must use tiled (concatenating) gather"
        return jax.tree.map(
            lambda x: np.concatenate([np.asarray(x), other_shard_fn(x)], axis=0),
            tree,
        )

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)


def test_host_gather_invokes_allgather_when_multiprocess(monkeypatch):
    _mock_two_hosts(monkeypatch, lambda x: np.asarray(x) + 100.0)
    x = np.ones((2, 3), np.float32)
    out = mesh_lib.host_gather(x)
    assert out.shape == (4, 3)
    np.testing.assert_array_equal(out[2:], x + 100.0)


def test_host_gather_objects_single_process():
    """reference all_gather_object analogue (util/distributed.py:130-133):
    single-process no-op returns [obj] unchanged. The real 2-process
    different-size-payload path runs in tests/mp_worker.py."""
    obj = {"a": 1, "b": [1, 2, "three"]}
    assert mesh_lib.host_gather_objects(obj) == [obj]


def test_sharded_eval_metrics_match_single_process():
    """Scoring [shard0; shard1; ...] == scoring the full set — the invariant
    host_gather restores for linprobe/finetune classification eval."""
    rng = np.random.RandomState(0)
    n, c = 64, 7
    li, la, lf = (rng.randn(n, c).astype(np.float32) for _ in range(3))
    y = rng.randint(0, c, size=n)

    full = classify.classification_eval_stats(li, la, lf, y, multi_label=False)

    # per-host shards in host order, then tiled-gather (= plain concat)
    splits = [0, 17, 33, 50, n]
    cat = lambda arr: np.concatenate(
        [arr[splits[i]:splits[i + 1]] for i in range(4)], axis=0)
    sharded = classify.classification_eval_stats(
        cat(li), cat(la), cat(lf), cat(y), multi_label=False)
    assert full == sharded


def test_knn_extract_features_gathers_across_hosts(monkeypatch):
    """extract_features must return the ALL-host feature database, not the
    local shard (reference util/knn_probe.py:108-111)."""
    _mock_two_hosts(monkeypatch, lambda x: np.asarray(x) * -1.0)

    d = 8

    def encode_fn(params, image, audio):
        b = image.shape[0]
        # (batch, tokens, dim) — extract_features mean-pools over tokens
        f = np.tile(np.arange(d, dtype=np.float32), (b, 3, 1))
        return f, f + 1, f + 2

    loader = [
        {"image": np.zeros((4, 2, 2, 3)), "audio": np.zeros((4, 2, 2, 1)),
         "label": np.arange(4)},
        {"image": np.zeros((2, 2, 2, 3)), "audio": np.zeros((2, 2, 2, 1)),
         "label": np.arange(2)},
    ]
    v, a, m, y = knn_probe.extract_features(encode_fn, loader, params=None)
    # 6 local rows + 6 "other host" rows
    assert v.shape == (12, d) and a.shape == (12, d) and m.shape == (12, d)
    assert y.shape[0] == 12
    np.testing.assert_array_equal(v[6:], -v[:6])


def test_linprobe_eval_gather_call_site(monkeypatch, tmp_path):
    """The linprobe entry must route eval preds through host_gather."""
    calls = []
    real = mesh_lib.host_gather

    def spy(tree):
        calls.append(jax.tree.map(lambda x: np.asarray(x).shape, tree))
        return real(tree)

    monkeypatch.setattr(mesh_lib, "host_gather", spy)

    from test_entries import run_entry

    stats = run_entry("eval_linprobe", "linprobe", tmp_path,
                      extra=["eval=true"])
    assert "val_acc1_all" in stats
    # 4 gathers per eval epoch: image/audio/fusion logits + labels
    assert len(calls) >= 4
