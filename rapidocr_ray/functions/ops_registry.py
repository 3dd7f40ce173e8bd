"""Config-driven preprocessing op chains — the M5/§2.9 user-extension
surface.

The reference instantiates preproc ops BY CLASS NAME from the config
(``eval(op_name)(**param)`` in create_operators,
ch_ppocr_v3_det/utils.py:226-236; declarative list form in
ocrweb_multi/config.yaml:22-35).  Here the same surface is an explicit
registry dict — never eval — with validated declarative steps:

    chain = build_op_chain([
        {"op": "DetResize", "limit_side_len": 960, "limit_type": "max"},
        {"op": "NormalizeImage"},
        {"op": "ToCHW"},
        {"op": "KeepKeys", "keys": ["image", "shape"]},
    ])
    data = run_op_chain(chain, {"image": img})

Ops operate on a dict IR (the reference's ``data`` dict); returning
None short-circuits the chain (transform(), utils.py:214-223).
Register custom ops with ``register_op``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from rapidocr_ray.functions.imgproc import det_resize, normalize_chw

OP_REGISTRY: dict[str, Callable] = {}


def register_op(name: str):
    def deco(cls):
        if name in OP_REGISTRY:
            raise ValueError(f"op {name!r} already registered")
        OP_REGISTRY[name] = cls
        return cls

    return deco


@register_op("DetResize")
class DetResize:
    """M1 DetResizeForTest as a chain op."""

    def __init__(self, limit_side_len: int = 960, limit_type: str = "max"):
        self.limit_side_len = limit_side_len
        self.limit_type = limit_type

    def __call__(self, data: dict) -> dict | None:
        try:
            resized, shape = det_resize(data["image"], self.limit_side_len, self.limit_type)
        except ValueError:
            return None  # short-circuit (utils.py:178-180 None return)
        data = dict(data)
        data["image"] = resized
        data["shape"] = shape
        return data


@register_op("NormalizeImage")
class NormalizeImage:
    """M2+M3: normalize and emit CHW float32."""

    def __call__(self, data: dict) -> dict:
        data = dict(data)
        data["image"] = normalize_chw(data["image"])
        return data


@register_op("ToCHW")
class ToCHW:
    """M3 standalone (no-op if NormalizeImage already emitted CHW)."""

    def __call__(self, data: dict) -> dict:
        img = data["image"]
        if img.ndim == 3 and img.shape[0] not in (1, 3):
            data = dict(data)
            data["image"] = img.transpose(2, 0, 1)
        return data


@register_op("KeepKeys")
class KeepKeys:
    """M4 projection: keep listed keys in order (utils.py:90-98)."""

    def __init__(self, keys: list[str]):
        self.keys = list(keys)

    def __call__(self, data: dict) -> list:
        return [data[k] for k in self.keys]


def build_op_chain(steps: list[dict]) -> list:
    """Validated construction: unknown names and bad params raise at
    build time, not mid-pipeline."""
    chain = []
    for step in steps:
        if "op" not in step:
            raise ValueError(f"step missing 'op': {step!r}")
        name = step["op"]
        if name not in OP_REGISTRY:
            raise KeyError(f"unknown op {name!r}; registered: {sorted(OP_REGISTRY)}")
        params = {k: v for k, v in step.items() if k != "op"}
        chain.append(OP_REGISTRY[name](**params))
    return chain


def run_op_chain(chain: list, data):
    """transform() analog: None short-circuits (utils.py:214-223)."""
    for op in chain:
        data = op(data)
        if data is None:
            return None
    return data
