"""Semantic checks for the round-5b batch (Welch A/B readout, key
candidate scan, ABC classification, embedding dim variance, video luma
stats) — independent recomputation in pandas/numpy, not just oracle
parity."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_welch_ttest_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()].assign(variant=ev["user_id"] % 2)
    out = run("events_ab_welch_ttest").set_index("event_type")
    assert len(out) > 0
    for et, grp in ev.groupby("event_type"):
        a = grp.loc[grp["variant"] == 0, "value"].values
        b = grp.loc[grp["variant"] == 1, "value"].values
        if len(a) < 2 or len(b) < 2:
            assert et not in out.index
            continue
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        df = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1)
            + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        r = out.loc[et]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["t_stat"] == pytest.approx(t, abs=1.01e-4)
        assert r["welch_df"] == pytest.approx(df, abs=1.01e-2)
        # Welch df always lands between min arm df and pooled df
        assert min(len(a), len(b)) - 1 <= r["welch_df"] <= len(a) + len(b) - 2


def test_key_candidate_scan_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    out = run("dq_key_candidate_scan").set_index("column_name")
    assert set(out.index) == set(o.columns)
    for c in o.columns:
        r = out.loc[c]
        assert r["n_rows"] == len(o)
        assert r["n_non_null"] == o[c].notna().sum()
        assert r["n_distinct"] == o[c].nunique(dropna=True)
        assert r["is_key_candidate"] == (
            o[c].nunique(dropna=True) == len(o)
            and o[c].notna().all()
        )
    # the surrogate key must be discovered, a low-cardinality enum must not
    assert bool(out.loc["o_orderkey", "is_key_candidate"])
    assert not bool(out.loc["o_orderstatus", "is_key_candidate"])


def test_abc_classification_matches_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        (li["l_extendedprice"] * (1 - li["l_discount"]))
        .groupby(li["l_partkey"])
        .sum()
        .map(lambda x: math.floor(x * 100 + 0.5) / 100)
        .sort_values(ascending=False)
    )
    total = rev.sum()
    cum = rev.cumsum()
    cls = np.where(cum <= 0.80 * total, "A", np.where(cum <= 0.95 * total, "B", "C"))
    want = pd.Series(cls).value_counts()
    out = run("orders_abc_classification").set_index("abc_class")
    assert set(out.index) == set(want.index)
    for k in want.index:
        assert out.loc[k, "n_parts"] == want[k]
    # classes partition the parts and shares sum to ~1
    assert out["n_parts"].sum() == len(rev)
    assert out["revenue_share"].sum() == pytest.approx(1.0, abs=1e-3)
    # Pareto shape: A has the large revenue share with a minority of rows
    assert out.loc["A", "revenue_share"] >= out.loc["C", "revenue_share"]


def test_dim_variance_topk_matches_numpy(run, sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    mat = np.stack(emb["embedding"].values).astype(np.float64)
    var = mat.var(axis=0)
    order = np.lexsort((np.arange(1, mat.shape[1] + 1), -var))
    out = run("embed_dim_variance_topk").sort_values("var_rank")
    assert len(out) == 8
    assert list(out["dim"]) == [int(order[i]) + 1 for i in range(8)]
    for _, r in out.iterrows():
        d = int(r["dim"]) - 1
        assert r["var_val"] == pytest.approx(var[d], abs=1.01e-6)
        assert r["mean_val"] == pytest.approx(mat[:, d].mean(), abs=1.01e-6)


def test_video_luma_stats_matches_byte_recompute(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = run("multimodal_video_luma_stats").set_index("doc_id")
    vids = docs[docs["text"].str.encode("utf-8").str.len() % 3 == 2]
    assert len(out) == len(vids)
    for _, row in vids.head(15).iterrows():
        data = row["text"].encode("utf-8")
        n = len(data)
        w, h = 10 + 2 * (n % 7), 10 + 2 * ((7 * n) % 5)
        plane = np.frombuffer(
            (data * (-(-(w * h) // n)))[: w * h], dtype=np.uint8
        ).astype(np.float64)
        r = out.loc[row["doc_id"]]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_frames"] == 1 + n % 24
        assert r["mean_luma"] == pytest.approx(plane.mean(), abs=1.01e-4)
        assert r["luma_contrast"] == pytest.approx(
            plane.std(), abs=1.01e-4
        )


def test_ratio_metric_delta_ci_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()]
    out = run("events_ratio_metric_delta_ci").set_index("event_type")
    assert len(out) > 0
    for et, grp in ev.groupby("event_type"):
        per = grp.groupby("user_id")["value"].agg(["sum", "count"])
        x, y = per["sum"].values, per["count"].values.astype(float)
        n = len(per)
        if n < 2:
            assert et not in out.index
            continue
        r = x.sum() / y.sum()
        vx, vy = x.var(ddof=1), y.var(ddof=1)
        cxy = np.cov(x, y, ddof=1)[0, 1]
        se = math.sqrt((vx + r * r * vy - 2 * r * cxy) / n) / y.mean()
        row = out.loc[et]
        assert row["n_users"] == n
        assert row["ratio"] == pytest.approx(r, abs=1.01e-6)
        assert row["se"] == pytest.approx(se, abs=1.01e-6)
        assert row["ci_lo"] == pytest.approx(r - 1.96 * se, abs=2.01e-6)
        assert row["ci_hi"] == pytest.approx(r + 1.96 * se, abs=2.01e-6)
        # the clustered SE must not be the naive per-event SE
        assert row["ci_lo"] < row["ratio"] < row["ci_hi"]


def test_functional_dependency_check_matches_pandas(run, sf_dir):
    out = run("dq_functional_dependency_check").set_index(
        ["table_name", "determinant", "dependent"]
    )
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    frames = {"lineitem": li, "orders": o}
    assert len(out) == 4
    for (tbl, det, dep), r in out.iterrows():
        nd = frames[tbl].groupby(det)[dep].nunique()
        assert r["n_groups"] == len(nd)
        assert r["n_violating"] == (nd > 1).sum()
        assert r["max_distinct_dep"] == nd.max()
        assert r["fd_holds"] == bool((nd <= 1).all())
    # the true key FD must hold; the folk-FDs must be violated
    assert bool(out.loc[("orders", "o_orderkey", "o_custkey"), "fd_holds"])
    assert not bool(
        out.loc[("lineitem", "l_orderkey", "l_suppkey"), "fd_holds"]
    )


def test_ndcg_graded_matches_pandas(run, sf_dir):
    import re as _re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    from awsbeats_spark.operators.llm.retrieval import (
        _NDCG_K,
        QUERY_TERMS,
    )

    bm = run("retrieval_bm25_topk")
    out = run("retrieval_ndcg_graded").set_index("query_id")
    words = docs.set_index("doc_id")["text"].map(
        lambda t: set(w for w in _re.split(r"\s+", t.lower()) if w)
    )
    for qid, terms in QUERY_TERMS.items():
        rel = words.map(lambda ws: sum(t in ws for t in terms))
        top = bm[(bm["query_id"] == qid) & (bm["rn"] <= _NDCG_K)]
        dcg = sum(
            (2.0 ** rel[d] - 1) / math.log2(r + 1)
            for d, r in zip(top["doc_id"], top["rn"])
        )
        ideal = rel[rel > 0].sort_values(ascending=False).head(_NDCG_K)
        idcg = sum(
            (2.0**g - 1) / math.log2(i + 2) for i, g in enumerate(ideal)
        )
        r = out.loc[qid]
        assert r["dcg"] == pytest.approx(dcg, abs=1.01e-6)
        assert r["idcg"] == pytest.approx(idcg, abs=1.01e-6)
        assert r["ndcg"] == pytest.approx(dcg / idcg, abs=1.01e-6)
        assert 0 < r["ndcg"] <= 1.0


def test_csv_corrupt_permissive_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = run("codec_csv_corrupt_permissive").set_index("event_type")
    bad = ev["event_id"] % 7 == 3
    for et, grp in ev.groupby("event_type"):
        gbad = bad.loc[grp.index]
        r = out.loc[et]
        assert r["n_good"] == (~gbad).sum()
        assert r["n_corrupt"] == gbad.sum()
        assert r["sum_value_good"] == pytest.approx(
            grp.loc[~gbad, "value"].sum(), abs=1.01e-2
        )
    # quarantine must never be empty at this corruption rate
    assert (out["n_corrupt"] > 0).all()


def test_funnel_windowed_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = run("events_funnel_windowed").iloc[0]
    fv = ev[ev["event_type"] == "view"].groupby("user_id")["ts"].min()
    cl = ev[ev["event_type"] == "click"].merge(
        fv.rename("fv"), left_on="user_id", right_index=True
    )
    cl = cl[
        (cl["ts"] > cl["fv"])
        & (cl["ts"] <= cl["fv"] + pd.Timedelta(hours=1))
    ]
    fc = cl.groupby("user_id")["ts"].min()
    pu = ev[ev["event_type"] == "purchase"].merge(
        fc.rename("fc"), left_on="user_id", right_index=True
    )
    pu = pu[
        (pu["ts"] > pu["fc"])
        & (pu["ts"] <= pu["fc"] + pd.Timedelta(hours=24))
    ]
    fp = pu.groupby("user_id")["ts"].min()
    assert out["n_viewed"] == len(fv)
    assert out["n_clicked_1h"] == len(fc)
    assert out["n_purchased_24h"] == len(fp)
    # windowed funnel is strictly narrower than the unconstrained one
    assert len(fp) <= len(fc) <= len(fv)
    assert out["click_rate"] == pytest.approx(len(fc) / len(fv), abs=1.01e-6)


def test_part_yoy_growth_matches_pandas(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        (li["l_extendedprice"] * (1 - li["l_discount"]))
        .groupby([li["l_partkey"], li["l_shipdate"].dt.year])
        .sum()
        .map(lambda x: math.floor(x * 100 + 0.5) / 100)
    )
    pairs = []
    for (pk, yr), r in rev.items():
        prev = rev.get((pk, yr - 1))
        if prev is not None and prev >= 100.0:
            pairs.append((pk, yr, r, prev, (r - prev) / prev))
    pairs.sort(key=lambda t: (-t[4], t[0], t[1]))
    out = run("q_part_yoy_growth_topk").sort_values("rk")
    assert len(out) == 15
    for row, (pk, yr, r, prev, g) in zip(out.itertuples(), pairs[:15]):
        assert (row.l_partkey, row.yr) == (pk, yr)
        assert row.growth_pct == pytest.approx(100 * g, abs=1.01e-4)


def test_runs_test_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev = ev[ev["value"].notna()]
    out = run("ts_runs_test_randomness").set_index("event_type")
    for et, grp in ev.groupby("event_type"):
        grp = grp.sort_values(["ts", "event_id"])
        hi = (grp["value"] > grp["value"].mean()).values
        n1, n2 = int(hi.sum()), int((~hi).sum())
        runs = 1 + int((hi[1:] != hi[:-1]).sum())
        r = out.loc[et]
        assert r["n_runs"] == runs
        assert (r["n_above"], r["n_below"]) == (n1, n2)
        e = 1 + 2 * n1 * n2 / (n1 + n2)
        v = (
            2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)
            / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        )
        assert r["expected_runs"] == pytest.approx(e, abs=1.01e-4)
        assert r["z_score"] == pytest.approx(
            (runs - e) / math.sqrt(v), abs=1.01e-4
        )


def test_asof_forward_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = run("join_asof_forward")
    pur = ev[ev["event_type"] == "purchase"]
    err = ev[ev["event_type"] == "error"]
    assert len(out) == len(pur)
    sample = out.sort_values("purchase_id").head(40)
    pts = pur.set_index("event_id")["ts"]
    for row in sample.itertuples():
        cand = err[
            (err["user_id"] == row.user_id)
            & (err["ts"] >= pts[row.purchase_id])
        ].sort_values(["ts", "event_id"])
        if cand.empty:
            assert pd.isna(row.next_error_id)
        else:
            assert row.next_error_id == cand.iloc[0]["event_id"]


def test_kmv_set_ops_matches_hashlib(run, sf_dir):
    import hashlib

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    a = set(ev.loc[ev["event_type"] == "click", "user_id"])
    b = set(ev.loc[ev["event_type"] == "view", "user_id"])
    union, inter = a | b, a & b
    u = {
        uid: (int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) + 0.5)
        / 2**32
        for uid in union
    }
    k = 8
    smallest = sorted(union, key=lambda x: u[x])[:k]
    uk = u[smallest[-1]]
    est_u = (k - 1) / uk if len(union) >= k else float(len(union))
    rho = (
        sum(1 for x in smallest if x in inter) / k
        if len(union) >= k
        else len(inter) / len(union)
    )
    out = run("sketch_kmv_set_ops").iloc[0]
    assert out["exact_union"] == len(union)
    assert out["exact_intersect"] == len(inter)
    assert out["est_union"] == pytest.approx(est_u, abs=1.01e-2)
    assert out["est_intersect"] == pytest.approx(
        rho * est_u if len(union) >= k else float(len(inter)), abs=1.01e-2
    )
    assert out["jaccard_exact"] == pytest.approx(
        len(inter) / len(union), abs=1.01e-6
    )


def test_hour_chi2_matches_numpy(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = run("events_hour_uniformity_chi2").set_index("event_type")
    for et, grp in ev.groupby("event_type"):
        hrs = (
            grp["ts"].astype("datetime64[us]").astype("int64")
            // 10**6
            // 3600
            % 24
        ).value_counts()
        total = len(grp)
        e = total / 24.0
        chi2 = sum((n - e) ** 2 / e for n in hrs) + (24 - len(hrs)) * e
        r = out.loc[et]
        assert r["n_hours_seen"] == len(hrs)
        assert r["n_events"] == total
        assert r["chi2"] == pytest.approx(chi2, abs=1.01e-4)
        assert r["dof"] == 23


def test_source_vocab_overlap_matches_pandas(run, sf_dir):
    import re as _re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = {}
    for src, grp in docs.groupby("source"):
        vocab[src] = set(
            w
            for t in grp["text"]
            for w in _re.split(r"\s+", t.lower())
            if w
        )
    out = run("text_source_vocab_overlap")
    srcs = sorted(vocab)
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    for row in out.head(25).itertuples():
        va, vb = vocab[row.source_a], vocab[row.source_b]
        assert row.source_a < row.source_b
        assert (row.vocab_a, row.vocab_b) == (len(va), len(vb))
        assert row.n_common == len(va & vb)
        assert row.jaccard == pytest.approx(
            len(va & vb) / len(va | vb), abs=1.01e-6
        )


def test_not_in_vs_not_exists_trap_fires(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    keys = o.loc[o["o_orderstatus"] != "P", "o_custkey"]
    n_nulls = (o["o_orderstatus"] == "P").sum()
    expected_anti = (~c["c_custkey"].isin(set(keys))).sum()
    out = run("join_not_in_vs_not_exists").iloc[0]
    assert out["n_null_keys"] == n_nulls
    assert out["n_not_exists"] == expected_anti
    # with nulls present, NOT IN is vacuously empty — the trap
    assert n_nulls > 0
    assert out["n_not_in"] == 0
    assert bool(out["semantics_differ"]) == (expected_anti != 0)


def test_order_reconciliation_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    r2 = lambda s: (s * 100 + 0.5).apply(math.floor) / 100  # noqa: E731
    line = (
        (li["l_extendedprice"] * (1 - li["l_discount"]) * (1 + li["l_tax"]))
        .groupby(li["l_orderkey"])
        .sum()
    )
    # inner join: orders with no lineitem rows are not reconciled
    m = o.set_index("o_orderkey").loc[o["o_orderkey"].isin(line.index)]
    delta = (r2(m["o_totalprice"]) - r2(line.reindex(m.index))).abs()
    out = run("dq_order_total_reconciliation").set_index("o_orderstatus")
    for st, grp in m.groupby("o_orderstatus"):
        d = delta.loc[grp.index].dropna()
        r = out.loc[st]
        assert r["n_orders"] == len(d)
        assert r["n_mismatched"] == (d > 0.01).sum()
        assert r["avg_abs_delta"] == pytest.approx(d.mean(), abs=1.01e-2)
    # this testdata's headers are independent of lines: the gate must fire
    assert (out["pass_rate"] < 0.05).all()


def test_ljung_box_matches_acf_recompute(run, sf_dir):
    acf = run("ts_acf_hourly")
    out = run("ts_ljung_box_q").iloc[0]
    n = int(acf.loc[acf["lag"] == 1, "n_pairs"].iloc[0]) + 1
    q = n * (n + 2) * sum(
        row.acf**2 / (n - row.lag) for row in acf.itertuples()
    )
    assert out["n_points"] == n
    assert out["max_lag"] == len(acf) == out["dof"]
    assert out["q_stat"] == pytest.approx(q, abs=1.01e-4)


def test_ship_latency_quantiles_match_numpy(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    j = li.merge(
        o[["o_orderkey", "o_orderdate", "o_orderpriority"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    ep = lambda s: s.astype("datetime64[us]").astype("int64") // (  # noqa: E731
        86_400 * 10**6
    )
    j["days"] = ep(j["l_shipdate"]) - ep(j["o_orderdate"])
    out = run("orders_ship_latency_quantiles").set_index("o_orderpriority")
    for pr, grp in j.groupby("o_orderpriority"):
        vals = np.sort(grp["days"].values)
        r = out.loc[pr]
        assert r["n_lines"] == len(vals)
        for q, col in ((0.5, "p50_days"), (0.9, "p90_days"), (0.99, "p99_days")):
            assert r[col] == vals[math.ceil(q * len(vals)) - 1]
    # latencies must be non-negative and monotone across quantiles
    assert (out["p50_days"] <= out["p90_days"]).all()
    assert (out["p90_days"] <= out["p99_days"]).all()


def test_srm_check_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = run("events_ab_srm_check").set_index("event_type")
    for et, grp in ev.groupby("event_type"):
        users = grp["user_id"].unique()
        na = int((users % 2 == 0).sum())
        nb = int((users % 2 == 1).sum())
        r = out.loc[et]
        assert (r["n_users_a"], r["n_users_b"]) == (na, nb)
        chi2 = (na - nb) ** 2 / (na + nb)
        assert r["chi2"] == pytest.approx(chi2, abs=1.01e-4)
        assert bool(r["srm_suspected"]) == (chi2 > 3.841)


def test_assortativity_matches_numpy(run, sf_dir):
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    edges = li[["l_suppkey", "l_partkey"]].drop_duplicates()
    ds = edges.groupby("l_suppkey").size()
    dp = edges.groupby("l_partkey").size()
    x = edges["l_suppkey"].map(ds).values.astype(float)
    y = edges["l_partkey"].map(dp).values.astype(float)
    out = run("graph_assortativity_degree").iloc[0]
    assert out["n_edges"] == len(edges)
    assert out["avg_supp_degree"] == pytest.approx(x.mean(), abs=1.01e-4)
    assert out["avg_part_degree"] == pytest.approx(y.mean(), abs=1.01e-4)
    assert out["assortativity"] == pytest.approx(
        np.corrcoef(x, y)[0, 1], abs=1.01e-4
    )
    assert -1.0 <= out["assortativity"] <= 1.0


def test_edge_density_matches_byte_recompute(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = run("multimodal_image_edge_density").set_index("doc_id")
    enc = docs["text"].str.encode("utf-8").str.len()
    imgs = docs[(enc % 3 == 0) & (enc > 0)]
    assert len(out) == len(imgs)
    for _, row in imgs.head(15).iterrows():
        data = row["text"].encode("utf-8")
        n = len(data)
        w, h = 4 + n % 29, 4 + (7 * n) % 17
        stride = ((3 * w + 3) // 4) * 4
        cyc = (data * (-(-(stride * h) // n)))[: stride * h]
        px = np.frombuffer(cyc, dtype=np.uint8).reshape(h, stride)
        green = px[:, 1 : 3 * w : 3].astype(np.int64)
        want = np.abs(np.diff(green, axis=1)).sum() / (h * (w - 1))
        r = out.loc[row["doc_id"]]
        assert (r["width"], r["height"]) == (w, h)
        assert r["edge_density"] == pytest.approx(want, abs=1.01e-4)


def test_revenue_concentration_matches_pandas(run, sf_dir):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    r2 = lambda s: (s * 100 + 0.5).apply(math.floor) / 100  # noqa: E731
    per = (
        o.groupby([o["o_orderdate"].dt.year.rename("yr"), "o_custkey"])[
            "o_totalprice"
        ]
        .sum()
        .pipe(r2)
    )
    out = run("q_revenue_concentration_topn_share").set_index("yr")
    for yr, grp in per.groupby(level=0):
        vals = grp.sort_values(ascending=False).values
        total = vals.sum()
        r = out.loc[yr]
        assert r["n_customers"] == len(vals)
        assert r["top10_share"] == pytest.approx(
            vals[:10].sum() / total, abs=1.01e-6
        )
        assert r["top100_share"] == pytest.approx(
            vals[:100].sum() / total, abs=1.01e-6
        )
        # shares are monotone and bounded
        assert 0 < r["top10_share"] <= r["top100_share"] <= 1.0


def test_audio_silence_gate_matches_byte_recompute(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    out = run("multimodal_audio_silence_gate").set_index("doc_id")
    enc = docs["text"].str.encode("utf-8").str.len()
    auds = docs[(enc % 3 == 1) & (enc > 0)]
    assert len(out) == len(auds)
    for _, row in auds.head(15).iterrows():
        data = row["text"].encode("utf-8")
        ns = 600 + len(data) % 500
        pcm = np.frombuffer(
            (data * (-(-ns // len(data))))[:ns], dtype=np.uint8
        ).astype(np.int64)
        n_sil = int((np.abs(pcm - 128) <= 8).sum())
        n_clip = int(((pcm == 0) | (pcm == 255)).sum())
        r = out.loc[row["doc_id"]]
        assert r["n_samples"] == ns
        assert r["silence_ratio"] == pytest.approx(n_sil / ns, abs=1.01e-6)
        assert r["clip_ratio"] == pytest.approx(n_clip / ns, abs=1.01e-6)
        assert bool(r["gate_pass"]) == (
            n_sil / ns <= 0.98 and n_clip / ns <= 0.10
        )


def test_first_touch_attribution_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    credit = {}
    for _, grp in ev.groupby("user_id"):
        first_np = None
        for row in grp.itertuples():
            if row.event_type == "purchase":
                key = first_np or "(none)"
                n, v = credit.get(key, (0, 0.0))
                credit[key] = (n + 1, v + row.value)
            elif first_np is None:
                first_np = row.event_type
    out = run("events_attribution_first_touch").set_index("touch_type")
    assert set(out.index) == set(credit)
    for k, (n, v) in credit.items():
        assert out.loc[k, "n_purchases"] == n
        assert out.loc[k, "attributed_value"] == pytest.approx(
            v, abs=1.01e-2
        )
    # first- and last-touch must credit the same purchase total
    last = run("events_attribution_last_touch")
    assert last["n_purchases"].sum() == out["n_purchases"].sum()


def test_transition_entropy_rate_matches_recompute(run, sf_dir):
    trans = run("events_markov_transitions")
    out = run("events_transition_entropy_rate").iloc[0]
    n_total = trans["n_trans"].sum()
    rate = -sum(
        (r.n_trans / n_total) * math.log(r.prob)
        for r in trans.itertuples()
    )
    joint = -sum(
        (r.n_trans / n_total) * math.log(r.n_trans / n_total)
        for r in trans.itertuples()
    )
    assert out["n_transitions"] == n_total
    assert out["n_edges"] == len(trans)
    assert out["entropy_rate_nats"] == pytest.approx(rate, abs=1.01e-6)
    assert out["joint_entropy_nats"] == pytest.approx(joint, abs=1.01e-6)
    # conditioning can only reduce entropy: rate <= joint entropy
    assert out["entropy_rate_nats"] <= out["joint_entropy_nats"]
