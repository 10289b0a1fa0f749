"""Stable scratch directories for operators that materialize a table
layout (ORC round-trip, partitioned lake, schema-evolution generations).

A fresh mkdtemp per invocation leaks one whole-table copy per call —
bench/probe loops run each operator dozens of times and would fill the
disk. A FIXED path per (operator, sf_dir) plus Spark's overwrite mode
makes every rerun reuse the same directory: bounded disk, no cleanup
ordering problem (the returned DataFrame reads the path lazily, so the
directory must outlive the operator call — deletion is not an option).
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def work_dir(op_name: str, sf_dir: str) -> str:
    """Deterministic scratch path for one operator on one dataset."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"awsbeats_{op_name}_{key}")
    os.makedirs(path, exist_ok=True)
    return path
