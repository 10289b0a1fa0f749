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


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


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


def test_percentile_approx_sandwich_tight_bound(spark, sf_dir):
    """The oracle pins the sketch inside the delta=0.02 exact sandwich;
    this test pins the TIGHT bound: the sketch value must sit within
    +/- 2 ranks of the target quantile's exact order statistics
    (accuracy=10000 guarantees <= max(n/accuracy, 1) rank error at test
    scale, +1 for interpolation)."""
    import numpy as np

    out = SPECS["agg_percentile_approx"].fn(spark, sf_dir).toPandas()
    assert out["within_bounds"].all()
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    # recompute the sketch value exactly as the operator does, then
    # check it against the value domain of nearby exact ranks
    from pyspark.sql import functions as F

    from awsbeats_spark.catalog import tables

    t = tables(spark, sf_dir)
    raw = (
        t.events.groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("qv"))
        .toPandas()
    )
    for _, r in raw.iterrows():
        vals = np.sort(
            ev[ev["event_type"] == r["event_type"]]["value"].values
        )
        n = len(vals)
        for q, got in zip([0.5, 0.95, 0.99], r["qv"]):
            target = q * (n - 1)
            lo_rank = max(int(np.floor(target)) - 2, 0)
            hi_rank = min(int(np.ceil(target)) + 2, n - 1)
            assert vals[lo_rank] <= got <= vals[hi_rank], (
                r["event_type"],
                q,
            )
    # and the sandwich itself is ordered + brackets the true quantile
    for _, r in out.iterrows():
        vals = ev[ev["event_type"] == r["event_type"]]["value"].values
        true_q = np.quantile(vals, r["quantile"])
        assert r["exact_lo"] <= true_q + 1e-4
        assert true_q - 1e-4 <= r["exact_hi"]


def test_set_all_ops_multiplicity_matches_pandas(run, sf_dir):
    """Bag semantics: INTERSECT ALL keeps min(count_l, count_r) copies,
    EXCEPT ALL keeps max(count_l - count_r, 0) — recomputed from raw
    order rows in pandas."""
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    open_counts = od[od["o_orderstatus"] == "O"]["o_custkey"].value_counts()

    big = od[od["o_totalprice"] > 100000]["o_custkey"].value_counts()
    got = run("set_intersect_all")["custkey"].value_counts()
    want = {
        k: min(open_counts.get(k, 0), big.get(k, 0))
        for k in set(open_counts.index) | set(big.index)
    }
    want = {k: v for k, v in want.items() if v > 0}
    assert got.to_dict() == want

    big150 = od[od["o_totalprice"] > 150000]["o_custkey"].value_counts()
    got = run("set_except_all")["custkey"].value_counts()
    want = {
        k: open_counts.get(k, 0) - big150.get(k, 0)
        for k in open_counts.index
    }
    want = {k: v for k, v in want.items() if v > 0}
    assert got.to_dict() == want


def test_existence_mark_matches_pandas(run, sf_dir):
    od = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    returned = set(li[li["l_returnflag"] == "R"]["l_orderkey"])
    out = run("join_existence_mark")
    assert len(out) == len(od)  # every order survives (mark, not filter)
    m = dict(zip(out["o_orderkey"], out["has_return"]))
    for k in od["o_orderkey"].sample(200, random_state=7):
        assert m[k] == (k in returned)


def test_sketch_evals_bounds_hold_and_exact_matches_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")

    out = run("eval_approx_distinct_error")
    assert out["within_bound"].all()
    want = li.groupby("l_returnflag")["l_orderkey"].nunique()
    for _, r in out.iterrows():
        assert r["exact_orders"] == want[r["l_returnflag"]]

    out = run("eval_freq_items_vs_exact")
    assert out["found_in_sketch"].all()  # the Misra-Gries guarantee
    counts = ev["event_type"].value_counts()
    frequent = counts[counts > 0.05 * len(ev)]
    assert set(out["item"]) == set(frequent.index)
    for _, r in out.iterrows():
        assert r["exact_count"] == counts[r["item"]]

    out = run("eval_hll_union_vs_exact")
    assert out["within_bound"].all()
    want = ev.groupby("event_type")["user_id"].nunique()
    for _, r in out.iterrows():
        assert r["exact_users"] == want[r["event_type"]]


def test_percentile_disc_rank_matches_numpy_rule(run, sf_dir):
    """DuckDB/PostgreSQL percentile_disc rule: element at 1-based rank
    ceil(q*n) of the sorted multiset."""
    import math

    import numpy as np

    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    out = run("agg_percentile_disc_rank")
    for flag, grp in li.groupby("l_returnflag"):
        vals = np.sort(grp["l_extendedprice"].values)
        n = len(vals)
        for q in (0.5, 0.9, 0.99):
            want = round(float(vals[math.ceil(q * n) - 1]), 2)
            got = out[
                (out["l_returnflag"] == flag) & (out["quantile"] == q)
            ]["val"].iloc[0]
            assert got == pytest.approx(want, abs=1.01e-2), (flag, q)
            # discrete percentile must be an actual element
            assert (np.round(vals, 2) == got).any()


def test_audience_overlap_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = ev.assign(d=ev["ts"].dt.date).groupby("d")["user_id"].agg(set)
    out = run("events_audience_overlap_daily")
    assert len(out) > 0
    for _, r in out.head(10).iterrows():
        import datetime

        d = datetime.date.fromisoformat(r["day"])
        nd = datetime.date.fromisoformat(r["next_day"])
        assert (nd - d).days == 1
        a, b = days[d], days[nd]
        assert r["n_users"] == len(a) and r["n_users_next"] == len(b)
        assert r["n_common"] == len(a & b)
        assert r["jaccard"] == pytest.approx(
            len(a & b) / len(a | b), abs=1.01e-6
        )


def test_degree_distribution_matches_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    deg = (
        li[["l_suppkey", "l_partkey"]]
        .drop_duplicates()
        .groupby("l_suppkey")
        .size()
    )
    want = deg.value_counts().to_dict()
    out = run("graph_degree_distribution")
    assert dict(zip(out["degree"], out["n_suppliers"])) == want


def test_bmp_ahash_known_pattern_and_determinism():
    """A hand-built 16x16 BMP, left half black / right half white: each
    sampled row must read 00001111 (left-to-right), giving a known
    64-bit pattern; hashing twice is bit-identical; the synthesized-BMP
    path agrees with geometry spec."""
    import struct as st

    from awsbeats_spark.operators.llm.multimodal import (
        bmp_ahash,
        synthesize_bmp,
    )

    w = h = 16
    stride = ((3 * w + 3) // 4) * 4
    rows = []
    for _ in range(h):
        row = bytearray()
        for x in range(w):
            v = 0 if x < 8 else 255
            row += bytes((v, v, v))
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pixels = b"".join(rows)  # bottom-up, but pattern is y-invariant
    header = st.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = st.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    gw, gh, val = bmp_ahash(header + info + pixels)
    assert (gw, gh) == (16, 16)
    row_bits = 0b00001111
    want = 0
    for _ in range(8):
        want = (want << 8) | row_bits
    if want >= 1 << 63:
        want -= 1 << 64
    assert val == want
    # determinism + spec-geometry on the synthesized path
    data = "some image-modality document text".encode()
    p = synthesize_bmp(data)
    assert bmp_ahash(p) == bmp_ahash(p)
    n = len(data)
    assert bmp_ahash(p)[0] == 4 + n % 29
    assert bmp_ahash(p)[1] == 4 + (7 * n) % 17
