"""Semantic twins for the round-6 additions: BPE encode checked against
a pure-Python reference apply (same merge table, same leftmost-first
rule), and registered-domain dedup against a pandas public-suffix
recompute — independent of the DuckDB oracle parity."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq
import pytest

from awsbeats_spark.operators.llm.dedup import _PSL_SUFFIXES, _URL_TLDS
from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w]


def _bpe_rules(vocab: Counter, topn: int = 20) -> list[str]:
    pair_counts: Counter = Counter()
    for w, f in vocab.items():
        if len(w) >= 2:
            for i in range(len(w) - 1):
                pair_counts[w[i : i + 2]] += f
    ranked = sorted(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [p for p, _ in ranked[:topn]]


def _bpe_encode(w: str, rules: list[str]) -> list[str]:
    toks = list(w)
    for p in rules:
        a, b = p[0], p[1]
        out: list[str] = []
        for x in toks:
            if out and out[-1] == a and x == b:
                out[-1] = p
            else:
                out.append(x)
        toks = out
    return toks


def test_bpe_reference_hand_cases():
    # leftmost-first within an a==b run; cross-rule char consumption
    assert _bpe_encode("aaa", ["aa"]) == ["aa", "a"]
    assert _bpe_encode("aaaa", ["aa"]) == ["aa", "aa"]
    assert _bpe_encode("abc", ["ab", "bc"]) == ["ab", "c"]
    assert _bpe_encode("abc", ["bc", "ab"]) == ["a", "bc"]
    assert _bpe_encode("x", ["xy"]) == ["x"]


def test_bpe_encode_matches_python_reference(run, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    vocab: Counter = Counter()
    for t in docs["text"]:
        vocab.update(_words(t))
    rules = _bpe_rules(vocab)
    got = run("corpus_bpe_encode").set_index("w")
    assert set(got.index) == set(vocab)
    all_toks = sorted(
        {t for w in vocab for t in _bpe_encode(w, rules)}
    )
    tid = {t: i + 1 for i, t in enumerate(all_toks)}
    for w, f in vocab.items():
        toks = _bpe_encode(w, rules)
        row = got.loc[w]
        assert row["freq"] == f, w
        assert row["n_tokens"] == len(toks), w
        assert row["tokens"] == "|".join(toks), w
        assert row["token_ids"] == ",".join(str(tid[t]) for t in toks), w
        # encode must be lossless: tokens concatenate back to the word
        assert "".join(toks) == w


def test_url_registered_domain_matches_pandas(run, sf_dir):
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    psl = set(_PSL_SUFFIXES)
    agg: dict[str, dict] = {}
    for doc_id, lang, source in zip(
        docs["doc_id"], docs["lang"], docs["source"]
    ):
        host = f"{lang}.cdn{doc_id % 3}.{source}{_URL_TLDS[doc_id % 4]}"
        labels = host.split(".")
        k_pub = max(
            k
            for k in range(1, len(labels))
            if ".".join(labels[-k:]) in psl
        )
        reg = ".".join(labels[-(k_pub + 1) :])
        a = agg.setdefault(
            reg, {"n_docs": 0, "hosts": set(), "keeper": doc_id}
        )
        a["n_docs"] += 1
        a["hosts"].add(host)
        a["keeper"] = min(a["keeper"], doc_id)
    got = run("dedup_url_registered_domain").set_index("registered_domain")
    assert set(got.index) == set(agg)
    for reg, a in agg.items():
        row = got.loc[reg]
        assert row["n_docs"] == a["n_docs"], reg
        assert row["n_hosts"] == len(a["hosts"]), reg
        assert row["keeper_doc_id"] == a["keeper"], reg
    # multi-part TLDs must NOT collapse to the raw TLD: a co.uk host's
    # registered domain carries three labels
    assert all("." in r for r in got.index)
    assert any(r.endswith(".co.uk") and r.count(".") == 2 for r in got.index)
    assert any(r.endswith(".github.io") and r.count(".") == 2 for r in got.index)


def test_crossencoder_rerank_permutes_bm25_shortlist(run):
    ce = run("retrieval_crossencoder_rerank")
    bm = run("retrieval_bm25_topk")
    for qid, grp in ce.groupby("query_id"):
        # stage 2 reranks exactly the stage-1 shortlist (no adds/drops)
        bdocs = set(bm[bm["query_id"] == qid]["doc_id"])
        assert set(grp["doc_id"]) == bdocs
        assert sorted(grp["rn"]) == list(range(1, len(grp) + 1))
        assert sorted(grp["bm25_rn"]) == list(range(1, len(grp) + 1))
        # a permutation's displacement sums to zero
        assert int(grp["rank_delta"].sum()) == 0
    # the joint features must actually disagree with BM25 somewhere,
    # and the hashed bigram interaction must fire on this corpus
    assert (ce["rank_delta"] != 0).any()
    assert (ce["bigram_hits"] > 0).any()


def _geohash_ref(lat: float, lon: float, precision: int = 5) -> str:
    """Textbook bisection geohash (independent of the operator's
    closed-form interleave)."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = [], [], True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    for i in range(precision):
        chunk = bits[i * 5 : i * 5 + 5]
        out.append(alphabet[int("".join(map(str, chunk)), 2)])
    return "".join(out)


def test_geohash_density_matches_bisection_reference(run, sf_dir):
    import pandas as pd

    cust = pq.read_table(f"{sf_dir}/customer.parquet").to_pandas()
    M = 233280
    lat = ((cust["c_custkey"] * 9301 + 49297) % M) / M * 170.0 - 85.0
    lon = ((cust["c_custkey"] * 49297 + 9301) % M) / M * 360.0 - 180.0
    gh5 = [
        _geohash_ref(la, lo) for la, lo in zip(lat.tolist(), lon.tolist())
    ]
    ref = pd.DataFrame({"gh5": gh5})
    ref["gh3"] = ref["gh5"].str[:3]
    per = (
        ref.groupby("gh3")
        .agg(
            n_points=("gh5", "size"),
            n_cells5=("gh5", "nunique"),
            min_gh5=("gh5", "min"),
        )
        .reset_index()
        .sort_values(["n_points", "gh3"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    got = run("geo_geohash_density").sort_values("rn").reset_index(drop=True)
    assert got["gh3"].tolist() == per["gh3"].tolist()
    assert got["n_points"].tolist() == per["n_points"].tolist()
    assert got["n_cells5"].tolist() == per["n_cells5"].tolist()
    assert got["min_gh5"].tolist() == per["min_gh5"].tolist()


def test_bt_source_strength_matches_numpy(run, sf_dir):
    import numpy as np
    import pandas as pd

    docs = (
        pq.read_table(f"{sf_dir}/documents.parquet")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    by_id = docs.set_index("doc_id")
    wins: dict = {}
    for doc_id in docs["doc_id"]:
        if doc_id + 1 not in by_id.index:
            continue
        a, b = by_id.loc[doc_id], by_id.loc[doc_id + 1]
        if a["source"] == b["source"] or a["n_chars"] == b["n_chars"]:
            continue
        w, l = (
            (a["source"], b["source"])
            if a["n_chars"] > b["n_chars"]
            else (b["source"], a["source"])
        )
        wins[(w, l)] = wins.get((w, l), 0) + 1
    items = sorted({s for p in wins for s in p})
    idx = {s: i for i, s in enumerate(items)}
    k = len(items)
    n = np.zeros((k, k))
    W = np.zeros(k)
    for (w, l), c in wins.items():
        n[idx[w], idx[l]] += c
        n[idx[l], idx[w]] += c
        W[idx[w]] += c
    s = np.ones(k)
    for _ in range(3):
        denom = np.array(
            [
                sum(
                    n[i, j] / (s[i] + s[j])
                    for j in range(k)
                    if n[i, j] > 0
                )
                for i in range(k)
            ]
        )
        s = W / denom
        s = np.round(s * k / s.sum(), 8)
    got = run("corpus_bt_source_strength").set_index("source")
    assert set(got.index) == set(items)
    for src in items:
        i = idx[src]
        assert got.loc[src, "n_wins"] == W[i]
        # per-source comparisons = sum_j n_ij (each comparison involving
        # i counted once — ADVICE r6 dropped the erroneous /2)
        assert got.loc[src, "n_comparisons"] == n[i, :].sum()
        assert abs(got.loc[src, "bt_strength"] - round(s[i], 6)) < 2e-6, src
    # strength must order consistently with a sanity signal: the top
    # source by strength should have an above-average win rate
    top = got.sort_values("rank").iloc[0]
    assert top["n_wins"] / top["n_comparisons"] >= 0.5


def test_mix_reweight_mw_matches_numpy(run, sf_dir):
    import numpy as np
    from collections import Counter

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    sw: dict = {}
    for src, text in zip(docs["source"], docs["text"]):
        c = sw.setdefault(src, Counter())
        c.update(_words(text))
    corpus = Counter()
    for c in sw.values():
        corpus.update(c)
    tot = sum(corpus.values())
    sources = sorted(sw)
    loss = {}
    for src in sources:
        tot_s = sum(sw[src].values())
        loss[src] = round(
            -sum(
                (c / tot_s) * np.log(corpus[w] / tot)
                for w, c in sw[src].items()
            ),
            8,
        )
    k = len(sources)
    w = {s: round(1.0 / k, 8) for s in sources}
    for _ in range(3):
        mloss = sum(w[s] * loss[s] for s in sources)
        raw = {s: w[s] * np.exp(1.0 * (loss[s] - mloss)) for s in sources}
        z = sum(raw.values())
        w = {s: round(raw[s] / z, 8) for s in sources}
    got = run("corpus_mix_reweight_mw").set_index("source")
    assert set(got.index) == set(sources)
    for src in sources:
        assert abs(got.loc[src, "xent_loss"] - round(loss[src], 6)) < 2e-6
        assert abs(got.loc[src, "mix_weight"] - round(w[src], 6)) < 2e-6
    # weights stay on the simplex and lean into high-loss sources
    # (weights start uniform, so after the updates the MIX WEIGHT is
    # monotone in loss; eff_upweight is not — it divides by natural
    # share, which is independent of loss)
    assert abs(got["mix_weight"].sum() - 1.0) < 1e-4
    hi = max(sources, key=lambda s: loss[s])
    lo = min(sources, key=lambda s: loss[s])
    assert got.loc[hi, "mix_weight"] >= got.loc[lo, "mix_weight"]


def test_zorder_audit_matches_numpy_morton(run, sf_dir):
    import numpy as np

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).to_pandas()
    mo, mp = li["l_orderkey"].max(), li["l_partkey"].max()
    qo = np.floor(li["l_orderkey"].to_numpy() * 65536.0 / (mo + 1)).astype(
        np.int64
    )
    qp = np.floor(li["l_partkey"].to_numpy() * 65536.0 / (mp + 1)).astype(
        np.int64
    )
    z = np.zeros(len(li), dtype=np.int64)
    for b in range(16):
        z += ((qo >> (15 - b)) & 1) << (31 - 2 * b)
        z += ((qp >> (15 - b)) & 1) << (30 - 2 * b)
    li["bucket"] = z >> 26
    ref = li.groupby("bucket").agg(
        n_rows=("l_orderkey", "size"),
        min_o=("l_orderkey", "min"),
        max_o=("l_orderkey", "max"),
        min_p=("l_partkey", "min"),
        max_p=("l_partkey", "max"),
    )
    got = run("scale_zorder_clustering_audit").set_index("bucket")
    assert set(got.index) == set(ref.index)
    for bkt, r in ref.iterrows():
        g = got.loc[bkt]
        assert g["n_rows"] == r["n_rows"]
        assert g["min_orderkey"] == r["min_o"]
        assert g["max_orderkey"] == r["max_o"]
        assert abs(
            g["span_orderkey"] - round((r["max_o"] - r["min_o"] + 1) / (mo + 1), 6)
        ) < 1e-9
        assert abs(
            g["span_partkey"] - round((r["max_p"] - r["min_p"] + 1) / (mp + 1), 6)
        ) < 1e-9
    # THE z-order claim: both dimensions' average bucket span sit far
    # below 1 (single-key sorting would pin one near 1); 64 buckets
    # split each dimension ~8 ways, boundary effects allowed
    assert got["span_orderkey"].mean() < 0.35
    assert got["span_partkey"].mean() < 0.35
    assert int(got["n_rows"].sum()) == len(li)


def test_profile_value_topk_matches_pandas(run, sf_dir):
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority", "o_orderdate"],
    ).to_pandas()
    n = len(orders)
    panels = {
        "o_orderstatus": orders["o_orderstatus"],
        "o_orderpriority": orders["o_orderpriority"],
        "o_year": orders["o_orderdate"].dt.year.astype(str),
    }
    got = run("profile_value_topk")
    for col, series in panels.items():
        vc = series.value_counts()
        ref = sorted(
            vc.items(), key=lambda kv: (-kv[1], kv[0])
        )[:5]
        sub = got[got["column_name"] == col].sort_values("rn")
        assert list(sub["value"]) == [v for v, _ in ref]
        assert list(sub["cnt"]) == [c for _, c in ref]
        for (_, c), sh in zip(ref, sub["share"]):
            assert abs(sh - round(c / n, 6)) < 1e-9


def _md5_bucket(w: str, mod: int) -> int:
    import hashlib

    return int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % mod


def test_dsir_importance_matches_numpy_and_upweights_target(run, sf_dir):
    import numpy as np
    from collections import Counter

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    B = 64
    doc_feats, doc_lang = {}, {}
    tgt, raw = Counter(), Counter()
    for doc_id, lang, text in zip(docs["doc_id"], docs["lang"], docs["text"]):
        c = Counter(_md5_bucket(w, B) for w in _words(text))
        doc_feats[doc_id] = c
        doc_lang[doc_id] = lang
        raw.update(c)
        if lang == "en":
            tgt.update(c)
    nt, nr = sum(tgt.values()), sum(raw.values())
    lr = {
        b: np.log((tgt.get(b, 0) + 1.0) / (nt + B))
        - np.log((raw[b] + 1.0) / (nr + B))
        for b in raw
    }
    per_lang: dict = {}
    for doc_id, c in doc_feats.items():
        logw = round(sum(cnt * lr[b] for b, cnt in c.items()), 8)
        a = per_lang.setdefault(doc_lang[doc_id], [])
        a.append(logw)
    got = run("corpus_dsir_importance").set_index("lang")
    assert set(got.index) == set(per_lang)
    for lang, ws in per_lang.items():
        assert got.loc[lang, "n_docs"] == len(ws)
        assert abs(got.loc[lang, "mean_logw"] - round(np.mean(ws), 4)) < 2e-4
        assert (
            abs(
                got.loc[lang, "pos_share"]
                - round(np.mean([w > 0 for w in ws]), 6)
            )
            < 1e-6
        )
    # the method's point: the target slice upweights itself
    assert got.loc["en", "mean_logw"] == got["mean_logw"].max()
    assert got.loc["en", "pos_share"] >= got["pos_share"].max() - 1e-9


def test_quality_classifier_filter_matches_numpy(run, sf_dir):
    import hashlib

    import numpy as np
    from collections import Counter

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    B = 64
    wts = {
        b: (
            int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:4], 16) % 2001
            - 1000
        )
        / 1000.0
        for b in range(B)
    }
    per_source: dict = {}
    for src, text in zip(docs["source"], docs["text"]):
        c = Counter(_md5_bucket(w, B) for w in _words(text))
        s = sum(np.log(1 + cnt) * wts[b] for b, cnt in c.items())
        p = round(1.0 / (1.0 + np.exp(-s)), 8)
        per_source.setdefault(src, []).append(p)
    got = run("corpus_quality_classifier_filter").set_index("source")
    assert set(got.index) == set(per_source)
    for src, ps in per_source.items():
        assert got.loc[src, "n_docs"] == len(ps)
        assert abs(got.loc[src, "mean_score"] - round(np.mean(ps), 4)) < 2e-4
        assert (
            abs(
                got.loc[src, "pass_rate"]
                - round(np.mean([p >= 0.5 for p in ps]), 6)
            )
            < 1e-6
        )


def test_adamic_adar_matches_pandas(run, sf_dir):
    import numpy as np

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    edges = li.drop_duplicates()
    deg = edges.groupby("l_partkey").size()
    keep = deg[(deg >= 2) & (deg <= 50)]
    scores: dict = {}
    common: dict = {}
    for part, d in keep.items():
        supps = sorted(edges[edges["l_partkey"] == part]["l_suppkey"])
        w = 1.0 / np.log(d)
        for i in range(len(supps)):
            for j in range(i + 1, len(supps)):
                key = (supps[i], supps[j])
                scores[key] = scores.get(key, 0.0) + w
                common[key] = common.get(key, 0) + 1
    per_a: dict = {}
    for (a, b), sc in scores.items():
        per_a.setdefault(a, []).append((round(sc, 6), b))
    expect = {}
    for a, lst in per_a.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        for rk, (sc, b) in enumerate(lst[:5], 1):
            expect[(a, b)] = (sc, rk)
    got = run("graph_adamic_adar_topk")
    assert len(got) == len(expect)
    for row in got.itertuples():
        key = (row.supp_a, row.supp_b)
        assert key in expect, key
        sc, rk = expect[key]
        assert abs(row.aa_score - sc) < 1e-9, key
        assert row.rk == rk, key
        assert row.n_common == common[key], key


def test_winnowing_matches_python_reference(run, sf_dir):
    import hashlib

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    W = 4
    got = run("text_winnowing_fingerprints").set_index("doc_id")
    expected_docs = set()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = _words(text)
        grams = [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
        if len(grams) < W:
            continue
        expected_docs.add(doc_id)
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        fps = set()
        for j in range(len(hs) - W + 1):
            win = hs[j : j + W]
            m = min(win)
            # rightmost minimal hash of the window
            p = j + max(i for i, v in enumerate(win) if v == m)
            fps.add((p + 1, hs[p]))
        row = got.loc[doc_id]
        assert row["n_grams"] == len(grams)
        assert row["n_windows"] == len(grams) - W + 1
        assert row["n_fingerprints"] == len(fps)
        digest = hashlib.md5(
            "|".join(f"{p}:{h}" for p, h in sorted(fps)).encode()
        ).hexdigest()
        assert row["fp_digest"] == digest, doc_id
        # the winnowing density guarantee: expected 2/(w+1), generous cap
        assert row["density"] <= 0.75
    assert set(got.index) == expected_docs


def test_video_scene_cuts_matches_numpy(run, sf_dir):
    import numpy as np

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    got = run("multimodal_video_scene_cuts").set_index("doc_id")
    checked = 0
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        data = text.encode()
        n = len(data)
        if n % 3 != 2:
            continue
        w, h = 10 + 2 * (n % 7), 10 + 2 * ((7 * n) % 5)
        frames = 1 + n % 24
        probed = min(frames, 8)
        area = w * h
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
        sums = []
        for i in range(probed):
            frame = arr[(np.arange(area) + i * 17) % n]
            if i % 4 == 3:  # inverted cut frame (shot structure)
                frame = 255 - frame
            sums.append(int(frame.sum()))
        deltas = [abs(sums[i] - sums[i - 1]) / area for i in range(1, probed)]
        cut_frames = [i + 1 for i, d in enumerate(deltas) if d > 8.0]
        row = got.loc[doc_id]
        assert row["n_frames"] == frames
        assert row["n_probed"] == probed
        assert row["n_cuts"] == len(cut_frames), doc_id
        assert row["first_cut_frame"] == (cut_frames[0] if cut_frames else 0)
        expect_max = max(deltas) if deltas else 0.0
        assert abs(row["max_luma_delta"] - expect_max) < 1e-3, doc_id
        checked += 1
    assert checked == len(got)
    # the motion synth must actually produce detectable cuts somewhere
    assert (got["n_cuts"] > 0).any()


def test_ddsketch_matches_numpy_and_error_bound(run, sf_dir):
    import math

    import numpy as np

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    ev = ev[ev["value"] > 0]
    got = run("sketch_ddsketch_quantiles")
    g = 1.02
    for (et, q), grp in got.groupby(["event_type", "q"]):
        vals = np.sort(ev[ev["event_type"] == et]["value"].to_numpy())
        n = len(vals)
        rank = math.ceil(q * n)
        exact = vals[rank - 1]
        buckets = np.ceil(np.log(vals) / math.log(g)).astype(np.int64)
        # smallest bucket whose cumulative count reaches the rank
        order = np.sort(buckets)
        qb = order[rank - 1]
        est = 2 * g**qb / (g + 1)
        row = grp.iloc[0]
        assert row["n"] == n
        assert row["bucket"] == qb, (et, q)
        assert abs(row["dd_estimate"] - round(est, 6)) < 1e-9
        assert abs(row["exact_value"] - round(float(exact), 6)) < 1e-9
        # the DDSketch guarantee itself
        assert abs(est - exact) / exact <= (g - 1) / (g + 1) + 1e-6
        assert bool(row["within_bound"]) is True


def test_littles_law_identity_holds(run, sf_dir):
    import pandas as pd

    got = run("orders_littles_law_audit").iloc[0]
    # the invariant: on a complete extract the sweep L equals lambda*W
    assert bool(got["within_tol"]) is True
    assert abs(got["l_time_avg"] - got["l_littles"]) < 2e-6
    # independent recompute of lambda and W
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).to_pandas()
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
    ).to_pandas()
    comp = li.groupby("l_orderkey")["l_shipdate"].max()
    oc = orders.set_index("o_orderkey").join(comp, how="inner")
    od = pd.to_datetime(oc["o_orderdate"]).dt.normalize()
    cd = pd.to_datetime(oc["l_shipdate"]).dt.normalize()
    w = (cd - od).dt.days.mean()
    horizon = (cd.max() - od.min()).days
    assert got["n_orders"] == len(oc)
    assert got["horizon_days"] == horizon
    assert abs(got["w_days"] - round(w, 6)) < 2e-6
    assert abs(got["lambda_per_day"] - round(len(oc) / horizon, 6)) < 2e-6


def test_bpe_compression_by_lang_matches_python(run, sf_dir):
    from collections import Counter

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    vocab: Counter = Counter()
    for t in docs["text"]:
        vocab.update(_words(t))
    rules = _bpe_rules(vocab)
    ntok = {w: len(_bpe_encode(w, rules)) for w in vocab}
    per_lang: dict = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        a = per_lang.setdefault(lang, [0, 0, 0])  # words, chars, tokens
        for w in _words(text):
            a[0] += 1
            a[1] += len(w)
            a[2] += ntok[w]
    got = run("corpus_bpe_compression_by_lang").set_index("lang")
    assert set(got.index) == set(per_lang)
    for lang, (nw, nc, nt) in per_lang.items():
        row = got.loc[lang]
        assert row["n_words"] == nw
        assert row["n_chars"] == nc
        assert row["n_bpe_tokens"] == nt
        assert abs(row["tokens_per_word"] - round(nt / nw, 6)) < 1e-9
        assert abs(row["chars_per_token"] - round(nc / nt, 6)) < 1e-9
        # BPE must compress: strictly fewer tokens than chars
        assert nt < nc


def test_spc_western_electric_rules_match_pandas(run, sf_dir):
    import numpy as np
    import pandas as pd

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    daily = (
        orders.assign(d=pd.to_datetime(orders["o_orderdate"]).dt.normalize())
        .groupby("d")["o_totalprice"]
        .sum()
        .sort_index()
    )
    mu, sigma = daily.mean(), daily.std(ddof=0)
    z = np.round((daily - mu) / sigma, 6)
    rows = {}
    zv = z.to_numpy()
    for i, d in enumerate(z.index):
        w3 = zv[max(0, i - 2) : i + 1]
        w5 = zv[max(0, i - 4) : i + 1]
        w8 = zv[max(0, i - 7) : i + 1]
        r1 = abs(zv[i]) > 3
        r2 = (w3 > 2).sum() >= 2 or (w3 < -2).sum() >= 2
        r3 = (w5 > 1).sum() >= 4 or (w5 < -1).sum() >= 4
        r4 = (w8 > 0).sum() == 8 or (w8 < 0).sum() == 8
        if r1 or r2 or r3 or r4:
            rows[d.strftime("%Y-%m-%d")] = (r1, r2, r3, r4, zv[i])
    got = run("dq_spc_western_electric").set_index("day")
    assert set(got.index) == set(rows)
    for day, (r1, r2, r3, r4, zval) in rows.items():
        g = got.loc[day]
        assert (bool(g["r1"]), bool(g["r2"]), bool(g["r3"]), bool(g["r4"])) == (
            bool(r1), bool(r2), bool(r3), bool(r4)), day
        assert abs(g["z"] - zval) < 2e-6


def test_content_defined_chunks_matches_python(run, sf_dir):
    import hashlib
    from collections import Counter

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    per_doc = {}
    chunk_freq: Counter = Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = _words(text)
        if not ws:
            continue
        chunks, cur = [], []
        for w in ws:
            cur.append(w)
            if _md5_bucket(w, 16) == 0:  # boundary word closes its chunk
                chunks.append(cur)
                cur = []
        if cur:
            chunks.append(cur)
        hs = [hashlib.md5(" ".join(c).encode()).hexdigest() for c in chunks]
        per_doc[doc_id] = (chunks, hs)
        chunk_freq.update(hs)
    got = run("dedup_content_defined_chunks").set_index("doc_id")
    assert set(got.index) == set(per_doc)
    # edit-stability: CDC boundaries are position-independent, so a
    # shared word sequence yields shared chunk hashes; dup chunks exist
    # on this repetitive corpus
    assert (got["n_dup_chunks"] > 0).any()
    for doc_id, (chunks, hs) in per_doc.items():
        row = got.loc[doc_id]
        assert row["n_chunks"] == len(chunks)
        assert row["n_words"] == sum(len(c) for c in chunks)
        ndup = sum(1 for h in hs if chunk_freq[h] > 1)
        assert row["n_dup_chunks"] == ndup, doc_id
        assert abs(row["dup_ratio"] - round(ndup / len(chunks), 6)) < 1e-9


def test_isotropy_audit_matches_numpy(run, sf_dir):
    import numpy as np

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    X = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    mu = X.mean(axis=0)
    m2 = (X * X).mean(axis=0)
    var = m2 - mu * mu
    got = run("embed_isotropy_audit").iloc[0]
    assert got["n_vectors"] == len(X)
    assert got["dim"] == X.shape[1]
    assert abs(got["mean_sq_norm"] - round(float(m2.sum()), 6)) < 2e-6
    assert abs(got["norm_mean_sq"] - round(float((mu * mu).sum()), 6)) < 2e-6
    assert (
        abs(got["isotropy_proxy"] - round(float((mu * mu).sum() / m2.sum()), 6))
        < 2e-6
    )
    assert abs(got["top_var_share"] - round(float(var.max() / var.sum()), 6)) < 2e-6
    # the moment identity IS the mean pairwise dot product: check it
    # against a direct (small-n) computation
    G = X @ X.T
    n = len(X)
    mean_cross = (G.sum() - np.trace(G)) / (n * (n - 1))
    # E[<x,y>] over distinct pairs ~ ||mu||^2 up to O(1/n)
    assert abs(mean_cross - (mu * mu).sum()) < 0.05 * max(
        1.0, abs((mu * mu).sum())
    ) + 0.05


def test_kcenter_coreset_matches_numpy(run, sf_dir):
    import numpy as np

    emb = (
        pq.read_table(f"{sf_dir}/embeddings.parquet")
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.array([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    sel = [0]  # index of min vec_id (sorted)
    picks = [(1, ids[0], 0.0)]
    min_d2 = ((X - X[0]) ** 2).sum(axis=1)
    for r in range(2, 9):
        min_d2[sel] = -1.0  # exclude selected
        # argmax with min-vec_id tie-break (ids sorted => first argmax)
        i = int(np.argmax(min_d2))
        picks.append((r, ids[i], float(min_d2[i])))
        sel.append(i)
        min_d2 = np.minimum(min_d2, ((X - X[i]) ** 2).sum(axis=1))
    cover = float(
        np.min(
            ((X[:, None, :] - X[sel][None, :, :]) ** 2).sum(axis=2), axis=1
        ).max()
    )
    got = run("embed_kcenter_coreset").sort_values("ord").reset_index(drop=True)
    assert list(got["vec_id"]) == [v for _, v, _ in picks]
    for (o, v, d), row in zip(picks, got.itertuples()):
        assert abs(row.d2_at_pick - round(d, 6)) < 1e-6, o
    assert abs(got["coverage_radius_sq"].iloc[0] - round(cover, 6)) < 1e-6
    # greedy k-center property: pick distances are non-increasing, and
    # the coverage radius is bounded by the last pick's distance
    d2s = got["d2_at_pick"].tolist()[1:]
    assert all(a >= b - 1e-9 for a, b in zip(d2s, d2s[1:]))
    assert got["coverage_radius_sq"].iloc[0] <= d2s[-1] + 1e-9


def test_huber_m_location_matches_numpy(run, sf_dir):
    import numpy as np

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice"],
    ).to_pandas()
    got = run("agg_huber_m_location").set_index("l_returnflag")
    for flag, grp in li.groupby("l_returnflag"):
        x = grp["l_extendedprice"].astype(float).to_numpy()
        med = np.quantile(x, 0.5)  # linear interpolation == percentile()
        s = round(1.4826 * np.quantile(np.abs(x - med), 0.5), 6)
        mu = round(med, 6)
        for _ in range(3):
            dev = np.abs(x - mu)
            w = np.where(dev <= 1.345 * s, 1.0, (1.345 * s) / dev)
            mu = round(float((x * w).sum() / w.sum()), 6)
        row = got.loc[flag]
        assert row["n"] == len(x)
        assert abs(row["median_x"] - round(med, 4)) < 2e-4
        assert abs(row["huber_mu"] - round(mu, 4)) < 2e-4
        # robustness direction: huber sits between median and mean
        lo, hi = sorted([row["median_x"], row["mean_x"]])
        assert lo - 1e-3 <= row["huber_mu"] <= hi + 1e-3


def test_hits_matches_numpy_power_iteration(run, sf_dir):
    import numpy as np
    import pandas as pd

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_suppkey", "l_partkey"]
    ).to_pandas()
    e = li.drop_duplicates()
    supps = np.sort(e["l_suppkey"].unique())
    parts = np.sort(e["l_partkey"].unique())
    si = {s: i for i, s in enumerate(supps)}
    pi = {p: i for i, p in enumerate(parts)}
    M = np.zeros((len(supps), len(parts)))
    for s, p in zip(e["l_suppkey"], e["l_partkey"]):
        M[si[s], pi[p]] = 1.0
    h = np.ones(len(supps))
    for _ in range(3):
        a = M.T @ h
        a = np.round(a / a.max(), 8)
        h = M @ a
        h = np.round(h / h.max(), 8)
    got = run("graph_hits_hubs_authorities")
    hub_rows = got[got["node_type"] == "hub"].sort_values("rnk")
    auth_rows = got[got["node_type"] == "authority"].sort_values("rnk")
    hub_ref = sorted(
        zip(np.round(h, 6), supps), key=lambda t: (-t[0], t[1])
    )[:10]
    for row, (score, nid) in zip(hub_rows.itertuples(), hub_ref):
        assert row.node_id == nid
        assert abs(row.score - score) < 2e-6
    auth_ref = sorted(
        zip(np.round(a, 6), parts), key=lambda t: (-t[0], t[1])
    )[:10]
    for row, (score, nid) in zip(auth_rows.itertuples(), auth_ref):
        assert row.node_id == nid
        assert abs(row.score - score) < 2e-6


def test_weibull_fit_matches_numpy(run, sf_dir):
    import numpy as np
    import pandas as pd

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    ).to_pandas()
    orders["o_orderdate"] = pd.to_datetime(orders["o_orderdate"])
    orders = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    gaps = (
        orders.groupby("o_custkey")["o_orderdate"].diff().shift(-1)
    )
    # per-customer lead: recompute directly
    gap_days = []
    for _, grp in orders.groupby("o_custkey"):
        d = grp["o_orderdate"].to_numpy()
        for i in range(len(d) - 1):
            g = (d[i + 1] - d[i]).astype("timedelta64[D]").astype(int)
            if g > 0:
                gap_days.append(float(g))
    x_sorted = np.sort(np.array(gap_days))
    n = len(x_sorted)
    i = np.arange(1, n + 1)
    xs = np.log(x_sorted)
    ys = np.log(-np.log(1 - (i - 0.3) / (n + 0.4)))
    k = ((xs * ys).mean() - xs.mean() * ys.mean()) / (
        (xs * xs).mean() - xs.mean() ** 2
    )
    lam = np.exp(xs.mean() - ys.mean() / k)
    got = run("orders_weibull_fit_interpurchase").iloc[0]
    assert got["n_gaps"] == n
    assert abs(got["shape_k"] - round(float(k), 4)) < 2e-3
    assert abs(got["scale_days"] - round(float(lam), 4)) < max(
        2e-3, 1e-4 * lam
    )
    assert 0 <= got["r2"] <= 1
    # a Weibull scale should sit in the same ballpark as the mean gap
    assert 0.3 * got["mean_gap"] <= got["scale_days"] <= 3 * got["mean_gap"]


def test_page_hinkley_matches_numpy(run, sf_dir):
    import numpy as np
    import pandas as pd

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    daily = (
        orders.assign(d=pd.to_datetime(orders["o_orderdate"]).dt.normalize())
        .groupby("d")["o_totalprice"]
        .sum()
        .sort_index()
        .to_numpy()
    )
    # same grid quantization as the operator (round 10: recurrence
    # inputs are quantized so both engines fold identical doubles)
    daily = np.floor(daily * 100.0 + 0.5) / 100.0
    mu = np.floor(daily.mean() * 10000.0 + 0.5) / 10000.0
    sigma = np.floor(daily.std(ddof=0) * 10000.0 + 0.5) / 10000.0
    delta = 0.005 * mu
    lam = round(5.0 * sigma, 4)
    expected = {}
    for name, m in (
        ("up", np.cumsum(daily - mu - delta)),
        ("down", np.cumsum(mu - daily - delta)),
    ):
        ph = np.round(m - np.minimum.accumulate(m), 4)
        alarm = ph > lam
        if alarm.any():
            first = int(np.argmax(alarm))
            expected[name] = (int(alarm.sum()), ph[first], round(float(ph.max()), 4))
    got = run("ts_page_hinkley_drift").set_index("direction")
    assert set(got.index) == set(expected)
    for name, (n_days, ph_first, ph_max) in expected.items():
        row = got.loc[name]
        assert row["n_alarm_days"] == n_days, name
        assert abs(row["ph_at_first_alarm"] - ph_first) < 2e-3
        assert abs(row["ph_max"] - ph_max) < 2e-3
        assert abs(row["threshold"] - lam) < 2e-3


def test_rowgroup_stats_audit_verdicts_true(run, sf_dir):
    import pyarrow.parquet as papq

    got = run("scan_rowgroup_stats_audit").set_index("column_name")
    assert set(got.index) == {"l_orderkey", "l_extendedprice"}
    for col in got.index:
        row = got.loc[col]
        for v in (
            "footer_min_matches",
            "footer_max_matches",
            "footer_rowcount_matches",
            "rg_stats_bracketed",
        ):
            assert bool(row[v]) is True, (col, v)
    # independent pyarrow check of one column's footer facts
    md = papq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata
    ci = md.schema.names.index("l_orderkey")
    mins = [
        md.row_group(i).column(ci).statistics.min
        for i in range(md.num_row_groups)
    ]
    assert float(min(mins)) == got.loc["l_orderkey", "data_min"]
    assert (
        sum(md.row_group(i).num_rows for i in range(md.num_row_groups))
        == got.loc["l_orderkey", "n_rows"]
    )


def test_gumbel_block_maxima_matches_numpy(run, sf_dir):
    import math

    import numpy as np
    import pandas as pd

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    ).to_pandas()
    daily = (
        orders.assign(d=pd.to_datetime(orders["o_orderdate"]).dt.normalize())
        .groupby("d")["o_totalprice"]
        .sum()
    )
    blocks = daily.groupby(daily.index.to_period("M")).max().to_numpy()
    mean, sd = blocks.mean(), blocks.std(ddof=0)
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    got = run("ts_gumbel_block_maxima").iloc[0]
    assert got["n_blocks"] == len(blocks)
    assert abs(got["mean_max"] - round(mean, 4)) < 1e-2
    assert abs(got["location_mu"] - round(mu, 4)) < 1e-2
    assert abs(got["scale_beta"] - round(beta, 4)) < 1e-2
    for t in (12, 60):
        rl = mu - beta * math.log(-math.log(1 - 1.0 / t))
        assert abs(got[f"rl_{t}"] - round(rl, 4)) < 1e-2
    # return levels increase with horizon and exceed the typical max
    assert got["rl_60"] > got["rl_12"] > got["location_mu"]


def test_mannwhitney_matches_scipy_formula(run, sf_dir):
    import numpy as np

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    a = ev[ev["event_type"] == "click"]["value"].to_numpy()
    b = ev[ev["event_type"] == "purchase"]["value"].to_numpy()
    combined = np.concatenate([a, b])
    order = combined.argsort(kind="mergesort")
    ranks = np.empty(len(combined))
    # midranks
    sorted_vals = combined[order]
    i = 0
    while i < len(sorted_vals):
        j = i
        while j + 1 < len(sorted_vals) and sorted_vals[j + 1] == sorted_vals[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    r1 = ranks[: len(a)].sum()
    n1, n2 = len(a), len(b)
    u1 = r1 - n1 * (n1 + 1) / 2
    mu_u = n1 * n2 / 2
    _, counts = np.unique(combined, return_counts=True)
    tie = float((counts.astype(np.float64) ** 3 - counts).sum())
    n = n1 + n2
    sigma = math_sqrt = (
        (n1 * n2 / 12) * ((n + 1) - tie / (n * (n - 1)))
    ) ** 0.5
    z = round((u1 - mu_u) / sigma, 4)
    got = run("events_mannwhitney_u").iloc[0]
    assert got["n1"] == n1 and got["n2"] == n2
    assert abs(got["u_statistic"] - round(u1, 1)) < 1e-6
    assert abs(got["z"] - z) < 2e-4
    assert bool(got["significant_95"]) == (abs(z) > 1.96)
    assert abs(got["rank_biserial"] - round(1 - 2 * u1 / (n1 * n2), 6)) < 1e-6


def test_mahalanobis_outliers_matches_numpy(run, sf_dir):
    import numpy as np

    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    ).to_pandas()
    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
    ).to_pandas()
    cnt = li.groupby("l_orderkey").size()
    per = orders.set_index("o_orderkey").join(
        cnt.rename("n"), how="inner"
    )
    x = per["o_totalprice"].to_numpy(dtype=float)
    y = per["n"].to_numpy(dtype=float)
    mx, my = x.mean(), y.mean()
    vx, vy = (x * x).mean() - mx * mx, (y * y).mean() - my * my
    cxy = (x * y).mean() - mx * my
    det = vx * vy - cxy * cxy
    d2 = np.round(
        ((x - mx) ** 2 * vy - 2 * (x - mx) * (y - my) * cxy
         + (y - my) ** 2 * vx) / det,
        4,
    )
    keys = per.index.to_numpy()
    flagged = sorted(
        [(d, k) for d, k in zip(d2, keys) if d > 5.991464547107979],
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = run("dq_mahalanobis_outliers").sort_values("rn")
    assert list(got["o_orderkey"]) == [k for _, k in flagged]
    for (d, _), g in zip(flagged, got["d2"]):
        assert abs(g - d) < 2e-3
    # cross-check against numpy's actual matrix inverse on one point
    S = np.array([[vx, cxy], [cxy, vy]])
    v0 = np.array([x[0] - mx, y[0] - my])
    ref = float(v0 @ np.linalg.inv(S) @ v0)
    assert abs(ref - d2[0]) < 1e-2


def test_weiszfeld_matches_numpy_and_improves_objective(run, sf_dir):
    import numpy as np

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    j = cust.merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    ).merge(region, left_on="n_regionkey", right_on="r_regionkey")
    M = 233280
    j["lat"] = ((j["c_custkey"] * 9301 + 49297) % M) / M * 170.0 - 85.0
    j["lon"] = ((j["c_custkey"] * 49297 + 9301) % M) / M * 360.0 - 180.0
    got = run("geo_geometric_median_weiszfeld").set_index("r_name")
    for rname, grp in j.groupby("r_name"):
        P = grp[["lat", "lon"]].to_numpy()
        m = np.round(P.mean(axis=0), 6)
        for _ in range(3):
            d = np.maximum(np.sqrt(((P - m) ** 2).sum(axis=1)), 1e-9)
            m = np.round((P / d[:, None]).sum(axis=0) / (1.0 / d).sum(), 6)
        row = got.loc[rname]
        assert row["n_points"] == len(P)
        assert abs(row["gmedian_lat"] - round(float(m[0]), 4)) < 2e-3
        assert abs(row["gmedian_lon"] - round(float(m[1]), 4)) < 2e-3
        # the median's objective must not exceed the centroid's
        assert row["mean_d_gmedian"] <= row["mean_d_centroid"] + 1e-6


def test_kruskal_wallis_matches_scipy_formula(run, sf_dir):
    import numpy as np

    ev = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    ).to_pandas()
    vals = ev["value"].to_numpy()
    order = vals.argsort(kind="mergesort")
    ranks = np.empty(len(vals))
    sv = vals[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i : j + 1]] = (i + j) / 2 + 1
        i = j + 1
    n = len(vals)
    groups = ev["event_type"].to_numpy()
    sr2 = 0.0
    per_group = {}
    for g in np.unique(groups):
        r = ranks[groups == g]
        per_group[g] = (len(r), r.mean())
        sr2 += r.sum() ** 2 / len(r)
    h = 12.0 / (n * (n + 1)) * sr2 - 3 * (n + 1)
    _, counts = np.unique(vals, return_counts=True)
    c = 1 - float((counts.astype(float) ** 3 - counts).sum()) / (
        n**3 - n
    )
    hc = round(h / c, 4)
    got = run("events_kruskal_wallis_h").set_index("event_type")
    assert set(got.index) == set(per_group)
    for g, (ng, mr) in per_group.items():
        row = got.loc[g]
        assert row["n_g"] == ng
        assert abs(row["mean_rank"] - round(mr, 4)) < 2e-3
        assert abs(row["h_corrected"] - hc) < 2e-3
        # critical value derived from the observed group count (df = k-1)
        from awsbeats_spark.operators.quality import _KW_CHI2_95

        crit = _KW_CHI2_95[len(per_group) - 1]
        assert bool(row["significant_95"]) == (hc > crit)


def test_luhn_validator_against_reference_impl(run):
    def luhn_ok(num: str) -> bool:
        total = 0
        for i, ch in enumerate(reversed(num), start=1):
            d = int(ch)
            if i % 2 == 0:
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return total % 10 == 0

    # known-good card test numbers for the reference implementation
    assert luhn_ok("4532015112830366")
    assert luhn_ok("79927398713")
    assert not luhn_ok("79927398714")
    got = run("dq_luhn_checksum_validate").iloc[0]
    # even keys get a true check digit, odd a corrupted one
    assert bool(got["checksum_logic_consistent"]) is True
    assert 0.4 < got["valid_rate"] < 0.6
    assert got["n_valid"] < got["n_numbers"]


def test_idf_weighted_jaccard_matches_python(run, sf_dir):
    import math
    from collections import Counter

    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    n_docs = len(docs)
    doc_shs = {}
    df: Counter = Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        ws = _words(text)
        shs = {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}
        doc_shs[doc_id] = shs
        df.update(shs)
    w = {s: math.log(n_docs / c) for s, c in df.items() if c <= 100}
    ids = sorted(doc_shs)
    expected = {}
    for i, a in enumerate(ids):
        sa = {s for s in doc_shs[a] if s in w}
        wa = sum(w[s] for s in sa)
        for b in ids[i + 1 :]:
            sb = {s for s in doc_shs[b] if s in w}
            shared = sa & sb
            if not shared:
                continue
            sw = sum(w[s] for s in shared)
            # threshold on the ROUNDED score, matching the operator's
            # engine-portable boundary rule (ADVICE r6)
            wj = round(sw / (wa + sum(w[s] for s in sb) - sw), 6)
            if wj >= 0.2:
                expected[(a, b)] = wj
    got = run("dedup_idf_weighted_jaccard")
    pairs = {
        (r.doc_a, r.doc_b): r.weighted_jaccard for r in got.itertuples()
    }
    assert set(pairs) == set(expected)
    for k, v in expected.items():
        assert abs(pairs[k] - v) < 2e-6, k
