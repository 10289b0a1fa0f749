"""Registration-order rotation: the driver's correctness pass checks the
first ~50 registered keys only, so the window must land exactly on the
keys that need fresh driver evidence (see operators/__init__.py)."""

from __future__ import annotations

from awsbeats_spark.operators import _ROUND3_WINDOW, _ROUND4_BLOCK
from awsbeats_spark.registry import load_all


def test_round3_window_registers_first():
    assert len(_ROUND3_WINDOW) == 50
    keys = list(load_all())
    assert keys[: len(_ROUND3_WINDOW)] == _ROUND3_WINDOW


def test_round4_block_follows():
    keys = list(load_all())
    start = len(_ROUND3_WINDOW)
    assert keys[start : start + len(_ROUND4_BLOCK)] == _ROUND4_BLOCK


def test_rotation_names_unique_and_registered():
    keys = set(load_all())
    rotation = _ROUND3_WINDOW + _ROUND4_BLOCK
    assert len(set(rotation)) == len(rotation)
    assert set(rotation) <= keys
