"""Semantic checks for the round-5 rebuild of asymmetric containment
(DF-capped universe + top-k bounded output) and its cap-impact eval —
independent recomputation in pandas, not just oracle parity."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from awsbeats_spark.operators.llm.dedup import (
    CONTAINMENT_THRESHOLD,
    DF_CAP,
    PAIR_TOPK,
)
from awsbeats_spark.registry import load_all

SPECS = load_all()


def _shingle_set(text: str) -> set[str]:
    w = [t for t in re.split(r"\s+", text.lower()) if t]
    return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}


def _write_docs(dst, texts):
    rows = [
        (i, t, "en", "web", len(t)) for i, t in enumerate(texts)
    ]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(dst / "documents.parquet"), index=False)


def _containment_pandas(texts, capped: bool):
    """Exact directed containment pairs recomputed in pure Python."""
    sets = {i: _shingle_set(t) for i, t in enumerate(texts)}
    if capped:
        df = {}
        for s in sets.values():
            for sh in s:
                df[sh] = df.get(sh, 0) + 1
        sets = {
            i: {sh for sh in s if df[sh] <= DF_CAP}
            for i, s in sets.items()
        }
    out = []
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b or not sb:
                continue
            shared = len(sa & sb)
            cont = shared / len(sa)
            if cont >= CONTAINMENT_THRESHOLD:
                out.append((a, b, shared, cont))
    return out


def test_containment_df_cap_drops_boilerplate_pairs(
    spark, tmp_path_factory
):
    """DF_CAP+5 exact copies of one sentence: every shingle's df exceeds
    the cap, so the capped universe is empty and NO pair may surface —
    the uncapped contract would have emitted (DF_CAP+5)*(DF_CAP+4)
    directed rows. This is the O(df²) candidate mass the rebuild
    removes."""
    dst = tmp_path_factory.mktemp("sf_cont_boiler")
    sentence = "all rights reserved contact the site administrator today"
    _write_docs(dst, [sentence] * (DF_CAP + 5))
    out = SPECS["dedup_containment_asymmetric"].fn(spark, str(dst))
    assert out.count() == 0


def test_containment_topk_bound_and_ranking(spark, tmp_path_factory):
    """A 9-doc near-dup cluster (below DF_CAP, so the cap is inert):
    output must carry at most PAIR_TOPK partners per anchor, ranked by
    containment DESC with doc_b ASC tiebreak, and every emitted score
    must match the pandas recompute on the capped universe."""
    dst = tmp_path_factory.mktemp("sf_cont_topk")
    base = (
        "the quick brown fox jumps over the lazy dog near the riverbank "
        "while morning fog settles across the quiet valley floor"
    )
    texts = [base + f" unique suffix token{i} tail{i}" for i in range(9)]
    _write_docs(dst, texts)
    out = (
        SPECS["dedup_containment_asymmetric"]
        .fn(spark, str(dst))
        .toPandas()
    )
    want = _containment_pandas(texts, capped=True)
    want_by_anchor = {}
    for a, b, shared, cont in want:
        want_by_anchor.setdefault(a, []).append((-cont, b, shared))
    assert (out.groupby("doc_a").size() <= PAIR_TOPK).all()
    for a, grp in out.groupby("doc_a"):
        grp = grp.sort_values("rk")
        exp = sorted(want_by_anchor[a])[: len(grp)]
        assert list(grp["doc_b"]) == [b for _, b, _ in exp]
        assert list(grp["shared"]) == [s for _, _, s in exp]
        for got_c, (neg_c, _, _) in zip(grp["containment_a_in_b"], exp):
            assert got_c == pytest.approx(-neg_c, abs=1.01e-6)
        assert list(grp["rk"]) == list(range(1, len(grp) + 1))


def test_containment_cap_impact_recall_matches_pandas(
    spark, tmp_path_factory
):
    """eval_containment_cap_impact's pair_recall must equal the exact
    overlap/uncapped ratio recomputed in pure Python on a corpus where
    the cap genuinely discards pairs (boilerplate cluster) while a
    small true-dup cluster survives."""
    dst = tmp_path_factory.mktemp("sf_cont_eval")
    boiler = "standard legal disclaimer footer text applies to everyone"
    base = (
        "a very specific story about twelve green herons nesting on "
        "the old lighthouse roof during the long winter storms"
    )
    texts = [boiler] * (DF_CAP + 3) + [
        base + f" ending{i} coda{i}" for i in range(4)
    ]
    _write_docs(dst, texts)
    out = (
        SPECS["eval_containment_cap_impact"]
        .fn(spark, str(dst))
        .toPandas()
        .iloc[0]
    )
    uncapped = {(a, b) for a, b, _, _ in _containment_pandas(texts, False)}
    capped_all = _containment_pandas(texts, True)
    by_anchor = {}
    for a, b, shared, cont in capped_all:
        by_anchor.setdefault(a, []).append((-cont, b))
    capped = {
        (a, b)
        for a, lst in by_anchor.items()
        for _, b in sorted(lst)[:PAIR_TOPK]
    }
    assert out["n_uncapped"] == len(uncapped)
    assert out["n_capped"] == len(capped)
    assert out["n_overlap"] == len(capped & uncapped)
    want_recall = (
        1.0 if not uncapped else len(capped & uncapped) / len(uncapped)
    )
    assert out["pair_recall"] == pytest.approx(want_recall, abs=1.01e-6)
    # the cap must have actually discarded something here, or the test
    # proves nothing
    assert len(uncapped) > len(capped & uncapped)
