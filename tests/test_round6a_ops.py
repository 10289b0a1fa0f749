"""Semantic checks for the round-6a batch (audio active segments,
impossible travel, JSON corrupt quarantine, length-bucket batching)."""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()

_M = 233280


def _lat(k):
    return ((k * 9301 + 49297) % _M) / _M * 170.0 - 85.0


def _lon(k):
    return ((k * 49297 + 9301) % _M) / _M * 360.0 - 180.0


def _hav(lat1, lon1, lat2, lon2):
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    h = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    return 2 * 6371.0 * math.asin(math.sqrt(h))


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_audio_segments_match_numpy(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    payloads = docs["text"].str.encode("utf-8")
    sel = docs[(payloads.str.len() % 3 == 1) & (payloads.str.len() > 0)]
    expected = set()
    for doc_id, text in zip(sel["doc_id"], sel["text"]):
        raw = text.encode("utf-8")
        n = len(raw)
        ns = 600 + n % 500
        pcm = np.frombuffer(
            (raw * (ns // n + 1))[:ns], np.uint8
        ).astype(np.int64)
        dev = np.abs(pcm - 128)
        active = []
        for w in range(-(-ns // 256)):
            ch = dev[w * 256 : (w + 1) * 256]
            if 2 * int(ch.sum()) > 67 * len(ch):
                active.append((w, int(ch.sum()), len(ch)))
        # islands of consecutive window ids
        seg = []
        for w, sd, cnt in active:
            if seg and w == seg[-1][-1][0] + 1:
                seg[-1].append((w, sd, cnt))
            else:
                seg.append([(w, sd, cnt)])
        for s in seg:
            sd = sum(x[1] for x in s)
            cnt = sum(x[2] for x in s)
            act = float(
                Decimal(sd / cnt).quantize(
                    Decimal("0.0001"), rounding=ROUND_HALF_UP
                )
            )
            expected.add(
                (int(doc_id), s[0][0], s[-1][0], len(s), act)
            )
    out = run("multimodal_audio_active_segments")
    got = {
        (
            int(r.doc_id), int(r.seg_start), int(r.seg_end),
            int(r.n_windows), float(r.mean_activity),
        )
        for r in out.itertuples()
    }
    assert got == expected
    assert len(out) > 0


def test_impossible_travel_matches_pandas(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["ts", "event_id"]
    )
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    flagged = set()
    for uid, grp in ev.groupby("user_id"):
        rows = list(zip(grp["event_id"], grp["us"]))
        for (e0, t0), (e1, t1) in zip(rows, rows[1:]):
            hop = round(
                _hav(
                    _lat(int(e0)), _lon(int(e0)),
                    _lat(int(e1)), _lon(int(e1)),
                ),
                4,
            )
            gap = round((t1 - t0) / 1e6 / 3600.0, 6)
            if gap > 0 and hop / gap > 900.0:
                flagged.add((int(uid), int(e1)))
    out = run("geo_impossible_travel_flags")
    got = {(int(r.user_id), int(r.event_id)) for r in out.itertuples()}
    assert got == flagged
    for r in out.itertuples():
        assert r.speed_kmh > 900.0


def test_json_corrupt_reconciles(run, sf_dir):
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    out = run("codec_json_corrupt_permissive").set_index("event_type")
    for tp, grp in ev.groupby("event_type"):
        bad = grp["event_id"] % 7 == 3
        r = out.loc[tp]
        assert r["n_clean"] == (~bad).sum()
        assert r["n_quarantined"] == bad.sum()
        assert r["clean_value_sum"] == pytest.approx(
            round(grp.loc[~bad, "value"].sum(), 2), abs=2e-2
        )


def test_length_buckets_match_pandas(run, sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    lens = docs["text"].apply(
        lambda t: len([w for w in re.split(r"\s+", t.lower()) if w])
    )
    lens = lens[lens >= 1]
    gmax = lens.max()
    out = run("corpus_length_bucket_batching").set_index("bucket")
    grp = lens.groupby(lens // 64)
    assert set(out.index) == set(grp.groups)
    for b, g in grp:
        r = out.loc[b]
        assert r["n_docs"] == len(g)
        assert r["max_tokens"] == g.max()
        assert r["pad_waste_bucketed"] == pytest.approx(
            1 - g.sum() / (len(g) * g.max()), abs=2e-6
        )
        assert r["pad_waste_global"] == pytest.approx(
            1 - g.sum() / (len(g) * gmax), abs=2e-6
        )
        # bucketed batching can only reduce waste
        assert r["pad_waste_bucketed"] <= r["pad_waste_global"] + 1e-12
