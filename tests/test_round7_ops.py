"""Semantic twins for the round-7 additions, independent of the DuckDB
oracle parity: the markdown section splitter against a pure-Python
line parser over independently synthesized markdown, the daily profile
heatmap against pandas groupbys, and the multiset reconciliation
against collections.Counter arithmetic."""

from __future__ import annotations

import json
import re

import pandas as pd
import pyarrow.parquet as pq
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w]


def _markdown_of(text: str) -> str:
    lines = []
    for w in _words(text):
        if len(w) % 7 == 0:
            lines.append(f"# {w}")
        elif len(w) % 7 == 3:
            lines.append(f"## {w}")
        else:
            lines.append(w)
    return "\n".join(lines)


def _parse_sections(md: str):
    h1 = h2 = None
    cur: list[str] = []
    out = []
    for line in md.split("\n"):
        if line.startswith("## "):
            if cur:
                out.append((h1, h2, len(cur), cur[0], cur[-1]))
                cur = []
            h2 = line[3:]
        elif line.startswith("# "):
            if cur:
                out.append((h1, h2, len(cur), cur[0], cur[-1]))
                cur = []
            h1, h2 = line[2:], None
        elif line:
            cur.append(line)
    if cur:
        out.append((h1, h2, len(cur), cur[0], cur[-1]))
    return out


def test_markdown_sections_match_python_parser(run, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    expected = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        secs = _parse_sections(_markdown_of(text))
        for idx, (h1, h2, n, first, last) in enumerate(secs):
            expected[(doc_id, idx)] = (h1, h2, n, first, last)
    got = run("udtf_markdown_sections")
    keys = {(r.doc_id, r.section_idx) for r in got.itertuples()}
    assert keys == set(expected)
    for r in got.itertuples():
        h1, h2, n, first, last = expected[(r.doc_id, r.section_idx)]
        assert (r.h1 if pd.notna(r.h1) else None) == h1
        assert (r.h2 if pd.notna(r.h2) else None) == h2
        assert r.n_words == n and r.first_word == first and r.last_word == last


def test_markdown_parser_hand_cases():
    # h1 resets h2; preamble has no headers; empty sections not emitted
    md = "pre\n# A\n## B\nx\ny\n# C\nz"
    assert _parse_sections(md) == [
        (None, None, 1, "pre", "pre"),
        ("A", "B", 2, "x", "y"),
        ("C", None, 1, "z", "z"),
    ]
    assert _parse_sections("# A\n## B") == []  # headers only, no body


def test_daily_column_stats_match_pandas(run, sf_dir):
    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    frames = {
        "value": ev["value"].astype(float),
        "user_id": ev["user_id"].astype(float),
        "props_k": ev["props"].map(
            lambda p: float(json.loads(p).get("k"))
            if p and "k" in json.loads(p)
            else None
        ),
    }
    got = run("profile_daily_column_stats").set_index(
        ["day", "column_name"]
    )
    for col, series in frames.items():
        g = pd.DataFrame({"day": ev["day"], "v": series}).groupby("day")["v"]
        for day, grp in g:
            row = got.loc[(day, col)]
            assert row["n_rows"] == len(grp)
            assert row["n_nulls"] == int(grp.isna().sum())
            assert row["n_distinct"] == grp.dropna().nunique()
            assert abs(row["vmin"] - round(grp.min(), 4)) < 2e-4
            assert abs(row["vmax"] - round(grp.max(), 4)) < 2e-4
            assert abs(row["vavg"] - grp.mean()) < 2e-4


def test_multiset_compare_matches_counter(run, sf_dir):
    from collections import Counter

    ev = pq.read_table(f"{sf_dir}/events.parquet").to_pandas()
    first = ev["ts"] < pd.Timestamp("2024-01-16")
    ca = Counter(ev.loc[first, "user_id"])
    cb = Counter(ev.loc[~first, "user_id"])
    got = run("set_multiset_compare").set_index("user_id")
    assert set(got.index) == set(ca) | set(cb)
    for uid in got.index:
        row = got.loc[uid]
        na, nb = ca.get(uid, 0), cb.get(uid, 0)
        assert row["n_left"] == na and row["n_right"] == nb
        assert row["delta"] == nb - na
        expect = (
            "right_only"
            if na == 0
            else "left_only"
            if nb == 0
            else "equal"
            if na == nb
            else "count_up"
            if nb > na
            else "count_down"
        )
        assert row["status"] == expect
    # the reconciliation must actually discriminate on this fixture
    assert got["status"].nunique() >= 2


def test_semdedup_lexical_overlap_jaccard_matches_python(run, sf_dir):
    """Every annotated pair's jaccard must equal a pure-Python shingle
    recompute, and the pair set must equal embed_semdedup_prune's."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    shs = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = _words(text)
        shs[doc_id] = {
            " ".join(ws[i : i + 3]) for i in range(len(ws) - 2)
        }
    got = run("eval_semdedup_lexical_overlap")
    prune = run("embed_semdedup_prune")
    assert {(r.keep_id, r.prune_id) for r in got.itertuples()} == {
        (r.keep_id, r.prune_id) for r in prune.itertuples()
    }
    for r in got.itertuples():
        sa, sb = shs[r.keep_id], shs[r.prune_id]
        union = len(sa) + len(sb) - len(sa & sb)
        jac = round(len(sa & sb) / union, 6) if union else 0.0
        assert abs(r.jaccard - jac) < 2e-6, (r.keep_id, r.prune_id)
        assert r.lexical_dup == (jac >= 0.2)
