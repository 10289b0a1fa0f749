"""Semantic twins for the round-7i additions: the LSH band curve
against a hashlib reimplementation of the banding, and the round-robin
interleave against an actual merged-sequence simulation."""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from awsbeats_spark.catalog import tables

    return tables(spark, sf_dir).documents.toPandas()


def _shingles(text):
    ws = [w for w in re.split(r"\s+", text.lower()) if w]
    return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}


def test_lsh_band_curve_matches_hashlib(run, docs):
    got = run("eval_lsh_band_tradeoff").set_index("n_bands")
    sigs = {}
    sets = {}
    for _, row in docs.iterrows():
        shs = _shingles(row.text)
        if not shs:
            continue
        sets[row.doc_id] = shs
        mins = ["g"] * 8  # > any hex char
        for sh in shs:
            h = (
                hashlib.md5(sh.encode()).hexdigest()
                + hashlib.md5(("x:" + sh).encode()).hexdigest()
            )
            for i in range(8):
                c = h[i * 8 : i * 8 + 8]
                if c < mins[i]:
                    mins[i] = c
        sigs[row.doc_id] = [
            hashlib.md5((mins[2 * j] + mins[2 * j + 1]).encode()).hexdigest()
            for j in range(4)
        ]
    buckets = defaultdict(list)
    for d, bv in sigs.items():
        for j in range(4):
            buckets[(j, bv[j])].append(d)
    firstband = {}
    for (j, _), ds in buckets.items():
        ds = sorted(ds)
        for x in range(len(ds)):
            for y in range(x + 1, len(ds)):
                key = (ds[x], ds[y])
                firstband[key] = min(firstband.get(key, 9), j)
    exact = set()
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = sets[ids[x]], sets[ids[y]]
            inter = len(a & b)
            if inter and inter / (len(a) + len(b) - inter) >= 0.2:
                exact.add((ids[x], ids[y]))
    for b in range(1, 5):
        cand = {p for p, fb in firstband.items() if fb < b}
        hits = len(exact & cand)
        row = got.loc[b]
        assert row.n_candidates == len(cand)
        assert row.n_exact == len(exact)
        assert row.n_hits == hits
    # the curve is monotone: more bands never lose candidates or recall
    assert got.n_candidates.is_monotonic_increasing
    assert got.recall.is_monotonic_increasing


def test_interleave_positions_are_a_permutation(run, docs):
    got = run("corpus_interleave_sources_roundrobin")
    n = len(docs)
    assert sorted(got.position) == list(range(1, n + 1))
    # simulate the actual round-robin merge and compare positions
    def h(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)

    queues = {}
    for _, row in docs.iterrows():
        queues.setdefault(row.source, []).append(row.doc_id)
    for s in queues:
        queues[s].sort(key=lambda d: (h(d), d))
    order = []
    r = 0
    while len(order) < n:
        for s in sorted(queues):
            if r < len(queues[s]):
                order.append(queues[s][r])
        r += 1
    pos_of = {d: i + 1 for i, d in enumerate(order)}
    for _, row in got.iterrows():
        assert row.position == pos_of[row.doc_id], f"doc {row.doc_id}"
    # balance property: in any prefix, per-source counts differ by <= 1
    # cycle (i.e. by at most 1 while no source is exhausted)
    sizes = {s: len(q) for s, q in queues.items()}
    prefix = order[: min(sizes.values()) * len(sizes)]
    from collections import Counter

    for m in (len(prefix) // 3, len(prefix) // 2, len(prefix)):
        cnt = Counter()
        for d in prefix[:m]:
            cnt[got.set_index("doc_id").loc[d].source] += 1
        assert max(cnt.values()) - min(cnt.values()) <= 1
