"""Semantic twins for the round-8 additions: the NDJSON repairer
against a pure-Python replay of the corruption+repair cycle, and the
footer-drift audit against pandas per-day aggregates + interval
Jaccard."""

from __future__ import annotations

import json
import math

import pytest

from awsbeats_spark.operators.udtf import _NDJSON_W
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _events(spark, sf_dir):
    from awsbeats_spark.catalog import tables

    return tables(spark, sf_dir).events.toPandas()


def test_ndjson_repair_matches_python_replay(run, spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = run("udtf_ndjson_repair")
    expected = {}
    for uid, grp in ev.sort_values("event_id").groupby("user_id"):
        recs = [
            '{"event_id":%d,"event_type":"%s","user_id":%d}'
            % (r.event_id, r.event_type, r.user_id)
            for r in grp.itertuples()
        ]
        # corruption: fixed-width lines; the stream's last record loses
        # its final line when it spans >= 2
        streams = []
        for i, rec in enumerate(recs):
            lines = [
                rec[j : j + _NDJSON_W] for j in range(0, len(rec), _NDJSON_W)
            ]
            if i == len(recs) - 1 and len(lines) >= 2:
                lines = lines[:-1]
            streams.append(lines)
        # repair: buffer until json parses; flush tail incomplete
        buf, nl, idx = "", 0, 0
        for lines in streams:
            for line in lines:
                buf += line
                nl += 1
                try:
                    json.loads(buf)
                except ValueError:
                    continue
                expected[(uid, idx)] = (buf, nl, True)
                buf, nl, idx = "", 0, idx + 1
        if buf:
            expected[(uid, idx)] = (buf, nl, False)
    assert len(got) == len(expected)
    for row in got.itertuples():
        rep, nl, comp = expected[(row.user_id, row.rec_idx)]
        assert row.repaired == rep
        assert row.n_lines == nl
        assert bool(row.complete) == comp
    # the truncation must actually fire: every stream ends incomplete
    # unless its final record fit one line
    n_incomplete = int((~got.complete).sum())
    assert n_incomplete > 0
    assert (
        got[~got.complete].repaired.str.len() % _NDJSON_W == 0
    ).all()  # incomplete tails are whole lines


def test_ndjson_repair_incomplete_is_strict_prefix(run, spark, sf_dir):
    got = run("udtf_ndjson_repair")
    bad = got[~got.complete]
    for row in bad.itertuples():
        # the partial record must still be unparseable JSON (the repair
        # did not invent a closing brace)
        with pytest.raises(ValueError):
            json.loads(row.repaired)
    # complete records all parse and carry their own ids
    ok = got[got.complete]
    for row in ok.head(200).itertuples():
        obj = json.loads(row.repaired)
        assert obj["user_id"] == row.user_id


def test_footer_drift_matches_pandas(run, spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = run("profile_parquet_footer_drift").sort_values("day")
    day = ev.ts.dt.strftime("%Y-%m-%d")
    agg = (
        ev.assign(day=day)
        .groupby("day")["value"]
        .agg(["min", "max", "count"])
        .sort_index()
    )
    assert list(got.day) == list(agg.index)
    assert got.footer_min_matches.all()
    assert got.footer_max_matches.all()
    assert got.footer_rows_match.all()
    prev = None
    for row, (d, a) in zip(got.itertuples(), agg.iterrows()):
        assert row.data_min == a["min"]
        assert row.data_max == a["max"]
        assert row.n_rows == a["count"]
        if prev is None:
            assert row.range_overlap_prev is None or math.isnan(
                row.range_overlap_prev
            )
        else:
            union = max(a["max"], prev["max"]) - min(a["min"], prev["min"])
            inter = max(
                0.0, min(a["max"], prev["max"]) - max(a["min"], prev["min"])
            )
            exp = 1.0 if union == 0 else round(inter / union, 6)
            assert row.range_overlap_prev == pytest.approx(exp, abs=1e-9)
        prev = a


def test_matryoshka_recall_matches_numpy(run, spark, sf_dir):
    import numpy as np

    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.llm.similarity import (
        MRL_DIMS,
        N_QUERIES,
        TOP_K,
    )

    emb = tables(spark, sf_dir).embeddings.toPandas()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.itertuples()}
    got = run("eval_matryoshka_recall_curve").set_index("dim").sort_index()

    def topk(qid, d):
        qv = vecs[qid][:d]
        scored = []
        for nid, cv in vecs.items():
            if nid == qid:
                continue
            c = cv[:d]
            cos = float(qv @ c / (np.linalg.norm(qv) * np.linalg.norm(c)))
            scored.append((-cos, nid))
        scored.sort()
        return {nid for _, nid in scored[:TOP_K]}

    full_dim = len(next(iter(vecs.values())))
    for d in MRL_DIMS:
        hits = 0
        for qid in range(N_QUERIES):
            truth = topk(qid, full_dim)
            hits += len(truth & topk(qid, d))
        assert got.loc[d].hits == hits
        assert got.loc[d].recall_at_k == round(hits / (N_QUERIES * TOP_K), 6)
    # the largest MRL dim IS the full dim: recall must be exactly 1
    assert got.loc[max(MRL_DIMS)].recall_at_k == 1.0
    # truncation can only be audited if it actually costs something
    assert got.loc[min(MRL_DIMS)].recall_at_k < 1.0


def test_cluster_size_powerlaw_matches_numpy(run, spark, sf_dir):
    import hashlib
    import math
    import re
    from collections import Counter

    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.llm.dedup import N_MINHASH

    docs = tables(spark, sf_dir).documents.toPandas()
    sigs = []
    for text in docs.text:
        ws = [w for w in re.split(r"\s+", text.lower()) if w]
        shs = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        if not shs:
            continue
        hs = [
            hashlib.md5(s.encode()).hexdigest()
            + hashlib.md5(("x:" + s).encode()).hexdigest()
            for s in shs
        ]
        sigs.append(
            tuple(min(h[i * 8 : i * 8 + 8] for h in hs) for i in range(N_MINHASH))
        )
    hist = Counter(Counter(sigs).values())
    got = run("dedup_cluster_size_powerlaw").set_index("cluster_size").sort_index()
    assert dict(zip(got.index, got.n_clusters)) == dict(hist)
    xs = [math.log(s) for s in hist]
    ys = [math.log(c) for c in hist.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert got.slope.nunique() == 1
    assert got.slope.iloc[0] == pytest.approx(slope, abs=1e-6)
    # near-dup mass must exist for the fit to mean anything
    assert len(hist) >= 2 and max(hist) >= 2


def test_source_conflict_matches_pandas(run, spark, sf_dir):
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.registry import QUERIES

    pairs = QUERIES["dedup_minhash"].fn(spark, sf_dir).toPandas()
    docs = tables(spark, sf_dir).documents.toPandas().set_index("doc_id").source
    got = run("dedup_source_conflict_audit")
    pairs["sa"] = pairs.doc_a.map(docs)
    pairs["sb"] = pairs.doc_b.map(docs)
    pairs["source_a"] = pairs[["sa", "sb"]].min(axis=1)
    pairs["source_b"] = pairs[["sa", "sb"]].max(axis=1)
    exp = (
        pairs.groupby(["source_a", "source_b"])
        .agg(n_pairs=("jaccard", "size"), avg_jaccard=("jaccard", "mean"))
        .reset_index()
    )
    assert len(got) == len(exp)
    m = got.set_index(["source_a", "source_b"]).sort_index()
    for row in exp.itertuples():
        g = m.loc[(row.source_a, row.source_b)]
        assert g.n_pairs == row.n_pairs
        assert g.avg_jaccard == pytest.approx(row.avg_jaccard, abs=1e-6)
        assert bool(g.cross_source) == (row.source_a != row.source_b)
    # the audit only earns its name if some pair actually crosses sources
    assert got.cross_source.any()


def test_temperature_plan_matches_numpy(run, spark, sf_dir):
    import re

    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.llm.corpus import _MIX_TAUS

    docs = tables(spark, sf_dir).documents.toPandas()
    docs["n_tokens"] = docs.text.map(
        lambda t: len([w for w in re.split(r"\s+", t.lower()) if w])
    )
    tok = docs.groupby("source").n_tokens.sum()
    total = tok.sum()
    got = run("corpus_temperature_sampling_plan")
    assert len(got) == len(tok) * len(_MIX_TAUS)
    for tau in _MIX_TAUS:
        sub = got[got.tau == tau].set_index("source")
        w = tok**tau / (tok**tau).sum()
        for src, wi in w.items():
            assert sub.loc[src].weight == pytest.approx(wi, abs=1e-6)
            assert sub.loc[src].effective_epochs == pytest.approx(
                wi * total / tok[src], abs=1e-6
            )
        # weights are a distribution; tau=1 is proportional sampling
        assert sub.weight.sum() == pytest.approx(1.0, abs=1e-5)
    t1 = got[got.tau == 1.0].set_index("source")
    low = got[got.tau == min(_MIX_TAUS)].set_index("source")
    # low temperature must upsample the smallest source
    smallest = tok.idxmin()
    assert low.loc[smallest].weight > t1.loc[smallest].weight


def test_backpressure_matches_literal_recurrence(run, spark, sf_dir):
    import math

    ev = _events(spark, sf_dir)
    got = run("stream_backpressure_queue_depth").sort_values("window_start")
    arr = (
        ev.assign(h=ev.ts.dt.floor("h"))
        .groupby("h")
        .size()
        .sort_index()
    )
    cap = math.ceil(1.05 * arr.mean())
    assert (got.capacity == cap).all()
    q = 0
    depths = []
    for a in arr:
        q = max(0, q + a - cap)
        depths.append(q)
    assert list(got.arrivals) == list(arr)
    assert list(got.queue_depth) == depths
    # the audit must exhibit both congestion and drain on this stream
    assert max(depths) > 0
    assert 0 in depths


def test_slo_burn_matches_pandas(run, spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = run("pipeline_slo_burn_alert").sort_values("window_start")
    hourly = (
        ev.assign(h=ev.ts.dt.floor("h"), err=(ev.event_type == "error"))
        .groupby("h")
        .agg(n=("err", "size"), n_err=("err", "sum"))
        .sort_index()
    )
    n6 = hourly.n.rolling(6, min_periods=1).sum().astype(int)
    e6 = hourly.n_err.rolling(6, min_periods=1).sum().astype(int)
    fast = (10000 * hourly.n_err > 2625 * hourly.n) & (10000 * e6 > 2625 * n6)
    slow = 10000 * e6 > 2625 * n6
    assert list(got.n) == list(hourly.n)
    assert list(got.n_err) == list(hourly.n_err)
    assert list(got.fast_burn) == list(fast)
    assert list(got.slow_burn) == list(slow)
    for row, (e, nn) in zip(got.itertuples(), zip(e6, n6)):
        assert row.err_rate_6h == round(e / nn, 6)
    # both alert states must occur, and fast implies slow by construction
    assert got.fast_burn.any() and (~got.fast_burn).any()
    assert (~got.fast_burn | got.slow_burn).all()


def test_seq_pack_nextfit_matches_replay_and_invariants(run, spark, sf_dir):
    import math
    import re

    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.udtf import _PACK_L

    docs = tables(spark, sf_dir).documents.toPandas()
    docs["n_tokens"] = docs.text.map(
        lambda t: len([w for w in re.split(r"\s+", t.lower()) if w])
    )
    got = run("udtf_seq_pack_nextfit")
    exp = {}
    for src, grp in docs.sort_values("doc_id").groupby("source"):
        bin_id, fill, first = 0, 0, True
        for r in grp.itertuples():
            if first:
                first, fill = False, r.n_tokens
            elif fill + r.n_tokens <= _PACK_L:
                fill += r.n_tokens
            else:
                bin_id, fill = bin_id + 1, r.n_tokens
            exp[r.doc_id] = (src, r.n_tokens, bin_id, fill)
    assert len(got) == len(exp)
    for row in got.itertuples():
        src, n, b, f = exp[row.doc_id]
        assert (row.source, row.n_tokens, row.bin_id, row.fill_after) == (
            src,
            n,
            b,
            f,
        )
    # invariants: no bin overfills (unless a single oversized doc),
    # bin ids are dense per source, and bin count respects the
    # information-theoretic lower bound ceil(total_tokens / L)
    per_bin = got.groupby(["source", "bin_id"]).n_tokens.agg(["sum", "size"])
    over = per_bin[per_bin["sum"] > _PACK_L]
    assert (over["size"] == 1).all()
    for src, grp in got.groupby("source"):
        bins = sorted(grp.bin_id.unique())
        assert bins == list(range(len(bins)))
        lower = math.ceil(grp.n_tokens.clip(upper=_PACK_L).sum() / _PACK_L)
        assert len(bins) >= lower
    # the packing must actually have multi-doc bins to be non-trivial
    assert (per_bin["size"] >= 2).any()


def test_capacity_curve_matches_replay(run, spark, sf_dir):
    import math

    ev = _events(spark, sf_dir)
    got = run("eval_backpressure_capacity_curve").set_index("capacity_factor").sort_index()
    arr = ev.assign(h=ev.ts.dt.floor("h")).groupby("h").size().sort_index()
    assert len(got) == 4
    for f in (0.95, 1.0, 1.05, 1.2):
        cap = math.ceil(f * arr.mean())
        q, depths = 0, []
        for a in arr:
            q = max(0, q + a - cap)
            depths.append(q)
        row = got.loc[f]
        assert row.capacity == cap
        assert row.peak_depth == max(depths)
        assert row.backlogged_hours == sum(1 for d in depths if d > 0)
        assert row.mean_depth == pytest.approx(
            round(sum(depths) / len(depths), 6), abs=1e-9
        )
    # the curve must be monotone: more capacity, less backlog
    assert got.peak_depth.is_monotonic_decreasing
    assert got.loc[0.95].peak_depth > got.loc[1.2].peak_depth


def test_pack_efficiency_consistent_with_both_packers(run, spark, sf_dir):
    from awsbeats_spark.operators.udtf import _PACK_L
    from awsbeats_spark.registry import QUERIES

    got = run("eval_seq_pack_efficiency").set_index("source")
    nf = run("udtf_seq_pack_nextfit")
    packs = QUERIES["corpus_token_pack"].fn(spark, sf_dir).toPandas()
    for src, grp in nf.groupby("source"):
        row = got.loc[src]
        assert row.n_bins_nextfit == grp.bin_id.max() + 1
        assert row.n_tokens == grp.n_tokens.sum()
        assert row.fill_nextfit == round(
            grp.n_tokens.sum() / ((grp.bin_id.max() + 1) * _PACK_L), 6
        )
    for src, grp in packs.groupby("source"):
        row = got.loc[src]
        assert row.n_packs_offset == grp.pack_id.nunique()
        per_pack = grp.groupby("pack_id").n_tokens.sum()
        assert row.n_overflow_offset == int((per_pack > _PACK_L).sum())
    # structural relations: next-fit never overflows, so it can never
    # use FEWER bins than the offset spec on the same shard
    assert (got.n_bins_nextfit >= got.n_packs_offset).all()
    assert (got.fill_nextfit <= 1.0).all()
