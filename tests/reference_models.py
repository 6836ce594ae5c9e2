"""Load the reference's *actual* torch model code as the parity oracle.

VERDICT round-2 item 1: ``tests/torch_oracle.py`` is a transcription written
by the same builder who wrote the JAX models, so a misread quirk would pass
parity on both sides. This module imports
``/root/reference/models/{vits,fusion_blocks,deepavfusion,avmae,swin,
video_vits,video_earlyfusion,classifier,...}.py`` unmodified, under the
minimal timm shim in ``tests/timm_shim/`` — making the reference itself the
oracle. ``torch_oracle.py`` remains as a secondary fixture.

The reference's top-level packages (``models``, ``util``) are registered in
sys.modules with explicit ``__path__`` entries instead of putting
/root/reference on sys.path, so the reference's ``train.py``/``launcher.py``/
``datasets.py`` can never shadow this repo's same-named entry points.
"""
from __future__ import annotations

import importlib
import pathlib
import sys
import types
from functools import partial

_SHIM = str(pathlib.Path(__file__).resolve().parent / "timm_shim")
_REF = pathlib.Path("/root/reference")

_MODULES = (
    "vits", "fusion_blocks", "deepavfusion", "avmae", "swin",
    "video_vits", "video_earlyfusion", "classifier", "avsegm", "avsrcsep",
)


def _ensure_pkg(name: str, path: pathlib.Path) -> None:
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    mod.__path__ = [str(path)]
    mod.__package__ = name
    sys.modules[name] = mod


_loaded: types.SimpleNamespace | None = None


def load_reference() -> types.SimpleNamespace:
    """Import and cache the reference model modules; returns a namespace with
    one attribute per module (e.g. ``ref.deepavfusion.DeepAVFusion``)."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if not _REF.exists():  # pragma: no cover - always present in this image
        raise RuntimeError(f"reference checkout not found at {_REF}")
    if _SHIM not in sys.path:
        sys.path.insert(0, _SHIM)
    _ensure_pkg("models", _REF / "models")
    _ensure_pkg("util", _REF / "util")
    ns = types.SimpleNamespace()
    for m in _MODULES:
        setattr(ns, m, importlib.import_module(f"models.{m}"))
    # the reference's schedule/param-group code (train-step parity oracle)
    ns.lr_sched = importlib.import_module("util.lr_sched")

    _register_tiny_archs(ns)
    _loaded = ns
    return ns


def _register_tiny_archs(ns: types.SimpleNamespace) -> None:
    """Register small test archs into the reference's vits/video_vits factory
    tables so DeepAVFusion(image_arch=...) can build CPU-sized models while
    still running the reference's unmodified ViT/Block/fusion code."""
    import torch.nn as nn

    def vit_tiny_test(pretrained=False, **kwargs):
        assert not pretrained
        return ns.vits.ViT(
            patch_size=16, embed_dim=48, depth=3, num_heads=4,
            mlp_ratio=4, norm_layer=partial(nn.LayerNorm, eps=1e-6), **kwargs)

    ns.vits.__dict__.setdefault("vit_tiny_test", vit_tiny_test)
