"""Hydra-lite config system preserving the reference's YAML flag surface.

The reference composes Hydra 1.3 configs (launcher.py:103,
configs/deepavfusion.yaml:1-5): a task YAML pulls the groups ``hydra/``,
``env/``, ``log/`` (+ ``nn_probe/`` for pretraining), supports ``${a.b}``
interpolation, dotted CLI overrides (``opt.blr=1e-4``), and a ``worker:``
field that names the entry module. We reproduce that surface with a small
dependency-free loader: same group layout, same field names, same
interpolation + override syntax.
"""
from __future__ import annotations

import copy
import os
import re
from pathlib import Path
from typing import Any, Optional

import yaml

CONFIG_DIR = Path(__file__).parent / "configs"


class DotDict(dict):
    """Attribute-style access with recursive wrapping; .get like Hydra's."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return DotDict(v) if isinstance(v, dict) and not isinstance(v, DotDict) else v

    def __setattr__(self, k, v):
        self[k] = v

    def get(self, k, default=None):
        v = super().get(k, default)
        return DotDict(v) if isinstance(v, dict) and not isinstance(v, DotDict) else v


def _deep_merge(base: dict, over: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


_INTERP = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _resolve_path(tree: dict, dotted: str):
    node: Any = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def _interpolate(tree: dict) -> dict:
    """Resolve ${a.b} references (possibly chained) against the full tree."""

    def resolve_value(v, depth=0):
        if depth > 10:
            raise ValueError(f"interpolation loop at {v!r}")
        if isinstance(v, str):
            full = _INTERP.fullmatch(v.strip())
            if full:  # whole-value reference keeps the referent's type
                return resolve_value(_resolve_path(tree, full.group(1)), depth + 1)
            def sub(m):
                r = resolve_value(_resolve_path(tree, m.group(1)), depth + 1)
                return str(r)
            return _INTERP.sub(sub, v)
        return v

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return resolve_value(node)

    # iterate to fixpoint over nested refs inside strings
    for _ in range(5):
        new = walk(tree)
        if new == tree:
            break
        tree = new
    return tree


def _parse_override_value(s: str):
    if s.lower() in ("null", "none", "~", ""):
        return None
    v = yaml.safe_load(s)
    if isinstance(v, str):
        # PyYAML won't parse '1e-3' as float (YAML 1.1 requires '1.0e-3')
        try:
            return float(v)
        except ValueError:
            return v
    return v


def apply_overrides(tree: dict, overrides: list[str]) -> dict:
    """Dotted CLI overrides: ``a.b.c=value`` (Hydra basic syntax)."""
    tree = copy.deepcopy(tree)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov!r}")
        key, _, raw = ov.partition("=")
        node = tree
        parts = key.strip().lstrip("+").split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = _parse_override_value(raw)
    return tree


def load_config(
    name: str,
    overrides: Optional[list[str]] = None,
    config_dir: Optional[os.PathLike] = None,
) -> DotDict:
    """Load <config_dir>/<name>.yaml, compose its ``defaults`` groups, apply
    overrides, resolve interpolations."""
    cdir = Path(config_dir) if config_dir else CONFIG_DIR
    path = cdir / (name if name.endswith(".yaml") else f"{name}.yaml")
    raw = yaml.safe_load(path.read_text()) or {}

    tree: dict = {}
    for entry in raw.pop("defaults", []) or []:
        if isinstance(entry, str):
            continue  # e.g. '_self_'
        (group, choice), = entry.items()
        gpath = cdir / group / f"{choice}.yaml"
        gtree = yaml.safe_load(gpath.read_text()) or {}
        if group == "hydra":
            continue  # launch plumbing only in the reference
        tree = _deep_merge(tree, {group: gtree})
    tree = _deep_merge(tree, raw)
    if overrides:
        tree = apply_overrides(tree, overrides)
    tree = _interpolate(tree)
    tree = _coerce_numbers(tree)
    return DotDict(tree)


_SCI_FLOAT = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _coerce_numbers(node):
    """PyYAML (YAML 1.1) leaves '3e-4' as a string — coerce exponent-form
    numeric literals to float recursively. Values like '300/2' stay strings."""
    if isinstance(node, dict):
        return {k: _coerce_numbers(v) for k, v in node.items()}
    if isinstance(node, list):
        return [_coerce_numbers(v) for v in node]
    if isinstance(node, str) and _SCI_FLOAT.match(node.strip()):
        return float(node)
    return node
