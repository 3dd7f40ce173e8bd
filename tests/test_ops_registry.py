"""M5/§2.9 config-driven op chains: registry, validation, short-circuit."""

import numpy as np
import pytest

from rapidocr_ray.functions.ops_registry import (
    OP_REGISTRY,
    build_op_chain,
    register_op,
    run_op_chain,
)


def det_chain():
    return build_op_chain(
        [
            {"op": "DetResize", "limit_side_len": 960, "limit_type": "max"},
            {"op": "NormalizeImage"},
            {"op": "ToCHW"},
            {"op": "KeepKeys", "keys": ["image", "shape"]},
        ]
    )


def test_chain_runs_and_projects():
    img = np.zeros((100, 200), dtype=np.uint8)
    out = run_op_chain(det_chain(), {"image": img})
    tensor, shape = out
    assert tensor.shape == (3, 96, 192)
    assert shape[:2] == (100, 200)


def test_short_circuit_on_degenerate_input():
    img = np.zeros((1, 2000), dtype=np.uint8)  # resize -> None path
    assert run_op_chain(det_chain(), {"image": img}) is None


def test_unknown_op_rejected_at_build():
    with pytest.raises(KeyError, match="unknown op"):
        build_op_chain([{"op": "EvalMe"}])


def test_missing_op_key_rejected():
    with pytest.raises(ValueError, match="missing 'op'"):
        build_op_chain([{"limit_side_len": 10}])


def test_bad_params_raise_at_build_not_runtime():
    with pytest.raises(TypeError):
        build_op_chain([{"op": "DetResize", "bogus": 1}])


def test_custom_op_registration():
    name = "TestDouble"
    if name not in OP_REGISTRY:

        @register_op(name)
        class Double:
            def __call__(self, data):
                data = dict(data)
                data["image"] = data["image"] * 2
                return data

    chain = build_op_chain([{"op": name}])
    out = run_op_chain(chain, {"image": np.ones((2, 2), dtype=np.uint8)})
    assert (out["image"] == 2).all()
    with pytest.raises(ValueError, match="already registered"):
        register_op(name)(object)
