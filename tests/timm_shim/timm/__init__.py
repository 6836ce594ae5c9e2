"""Minimal timm shim for importing the reference's model code unmodified.

The reference (/root/reference/models/*.py) imports a small, stable slice of
timm (~0.9.x API): ``vision_transformer.{PatchEmbed,Block,Attention,Mlp,
DropPath}``, ``layers.{PatchEmbed,Mlp,DropPath,to_2tuple,to_ntuple,
trunc_normal_,_assert}`` and ``swin_transformer.{get_relative_position_index,
window_partition,window_reverse}``. timm is not installed in this image, so
this package provides faithful re-implementations of exactly that surface —
same module math, same state_dict key layout — letting the parity tests run
the reference's *actual* model classes as the oracle (VERDICT round-2 item 1).

This shim is test-only; nothing in deepavfusion_tpu imports it.
"""
from . import models, optim  # noqa: F401

__version__ = "0.9.16+shim"
