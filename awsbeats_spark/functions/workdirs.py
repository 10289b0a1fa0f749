"""Stable scratch directories for operators that materialize a table
layout (ORC round-trip, partitioned lake, schema-evolution generations).

A fresh mkdtemp per invocation leaks one whole-table copy per call —
bench/probe loops run each operator dozens of times and would fill the
disk. A FIXED path per (user, operator, sf_dir) plus Spark's overwrite
mode makes every rerun reuse the same directory: bounded disk, no
cleanup ordering problem (the returned DataFrame reads the path lazily,
so the directory must outlive the operator call — deletion is not an
option).

Concurrency contract: one process per sf_dir at a time (the bench and
correctness drivers satisfy this). Two concurrent processes on the same
sf_dir would overwrite a directory whose lazily-read DataFrame the other
process may still be scanning. The path is namespaced per-user and
created 0o700 with an ownership check so another local user can neither
squat the path nor read the scratch data.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def work_dir(op_name: str, sf_dir: str) -> str:
    """Deterministic scratch path for one operator on one dataset."""
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    uid = os.getuid() if hasattr(os, "getuid") else 0
    path = os.path.join(
        tempfile.gettempdir(), f"awsbeats_u{uid}_{op_name}_{key}"
    )
    os.makedirs(path, mode=0o700, exist_ok=True)
    if hasattr(os, "getuid"):
        st = os.stat(path)
        if st.st_uid != uid:
            raise RuntimeError(
                f"scratch dir {path} is owned by uid {st.st_uid}, not {uid} "
                "— refusing to reuse a directory another user created"
            )
    return path
