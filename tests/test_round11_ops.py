"""Semantic twins for the round-11 additions: each operator checked
against an independent pandas/pure-Python replay (the DuckDB oracle is
the driver's check; these pin the SEMANTICS against a second
formulation, per the round-3 test strategy)."""

from __future__ import annotations

import hashlib
import math
import re
import struct
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def _docs(spark, sf_dir):
    from awsbeats_spark.catalog import tables

    return tables(spark, sf_dir).documents.toPandas()


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"\s+", text.lower()) if w]


def _md5_bucket(doc_id: int) -> str:
    return hashlib.md5(str(doc_id).encode()).hexdigest()[0]


# --------------------------------------------------------------------------
# eval_contamination_ngram_overlap
# --------------------------------------------------------------------------


def test_contamination_matches_pure_python_set_walk(run, spark, sf_dir):
    """Per-eval-doc contamination fraction must equal a direct Python
    set-intersection walk of the 5-gram universes (no joins, no caps)."""
    from awsbeats_spark.operators.llm.corpus import _DECON_N, _EVAL_BUCKETS

    docs = _docs(spark, sf_dir)
    grams = {}
    for d, t in zip(docs["doc_id"], docs["text"]):
        ws = _words(t)
        grams[d] = {
            " ".join(ws[i : i + _DECON_N])
            for i in range(len(ws) - _DECON_N + 1)
        }
    is_eval = {d: _md5_bucket(d) in _EVAL_BUCKETS for d in docs["doc_id"]}
    train_union = set()
    for d in docs["doc_id"]:
        if not is_eval[d]:
            train_union |= grams[d]
    out = run("eval_contamination_ngram_overlap").set_index("doc_id")
    eval_ids = [d for d in docs["doc_id"] if is_eval[d]]
    assert sorted(out.index) == sorted(eval_ids)
    for d in eval_ids:
        row = out.loc[d]
        n_sh = len(grams[d])
        n_hit = len(grams[d] & train_union)
        assert row["n_shingles"] == n_sh
        assert row["n_contaminated"] == n_hit
        if n_sh == 0:
            assert row["severity"] == "no_ngrams"
            assert row["contamination_frac"] is None or math.isnan(
                row["contamination_frac"]
            )
        else:
            assert math.isclose(
                row["contamination_frac"], n_hit / n_sh, abs_tol=1e-6
            )
            expect = (
                "clean"
                if n_hit == 0
                else ("partial" if 2 * n_hit < n_sh else "dirty")
            )
            assert row["severity"] == expect


def test_contamination_severity_is_exhaustive_and_consistent(run):
    out = run("eval_contamination_ngram_overlap")
    assert set(out["severity"]) <= {"clean", "partial", "dirty", "no_ngrams"}
    clean = out[out["severity"] == "clean"]
    assert (clean["n_contaminated"] == 0).all()
    dirty = out[out["severity"] == "dirty"]
    assert (2 * dirty["n_contaminated"] >= dirty["n_shingles"]).all()


# --------------------------------------------------------------------------
# embed_alignment_uniformity
# --------------------------------------------------------------------------


def test_alignment_uniformity_matches_numpy_definitions(run, spark, sf_dir):
    """The single-row metrics must equal Wang & Isola's definitional
    forms computed straight from the sampled vectors with numpy (full
    precision, no grid) — the 1e-9 quantization must stay far inside
    the 1e-5 comparison tolerance."""
    from awsbeats_spark.catalog import tables
    from awsbeats_spark.operators.llm.similarity import (
        _AU_SAMPLE_FRAC,
        _AU_TARGET_VECS,
    )

    emb = tables(spark, sf_dir).embeddings.toPandas()
    f = min(_AU_SAMPLE_FRAC, _AU_TARGET_VECS / max(len(emb), 1))
    keep = [
        int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) / 2**32 < f
        for v in emb["vec_id"]
    ]
    sample = emb[np.array(keep)].reset_index(drop=True)
    vecs = np.array([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    labels = sample["label"].to_numpy()
    d2, pos = [], []
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            d2.append(np.sum((vecs[i] - vecs[j]) ** 2))
            pos.append(labels[i] == labels[j])
    d2, pos = np.array(d2), np.array(pos)
    row = run("embed_alignment_uniformity").iloc[0]
    assert row["n_sampled"] == len(sample)
    assert row["n_pairs"] == len(d2)
    assert row["n_pos_pairs"] == int(pos.sum())
    assert math.isclose(row["alignment"], d2[pos].mean(), abs_tol=1e-5)
    assert math.isclose(
        row["uniformity"], math.log(np.exp(-2.0 * d2).mean()), abs_tol=1e-5
    )


# --------------------------------------------------------------------------
# dedup_suffix_array_substring
# --------------------------------------------------------------------------


def test_substring_spans_verify_against_raw_tokens(run, spark, sf_dir):
    """Every reported span must be (a) a genuine verbatim token match of
    the claimed length at the claimed offsets and (b) MAXIMAL — the
    tokens just before and just after the span must differ or not
    exist. Positions are 1-based seed offsets."""
    from awsbeats_spark.operators.llm.dedup import (
        _SUBSTR_MIN_TOKENS,
        _SUBSTR_N,
    )

    docs = _docs(spark, sf_dir)
    toks = {d: _words(t) for d, t in zip(docs["doc_id"], docs["text"])}
    out = run("dedup_suffix_array_substring")
    assert len(out) > 0, "fixture corpus must contain shared spans"
    for _, r in out.iterrows():
        a, b = toks[r["doc_a"]], toks[r["doc_b"]]
        ia, ib, n = int(r["a_start"]) - 1, int(r["b_start"]) - 1, int(
            r["span_tokens"]
        )
        assert n >= _SUBSTR_MIN_TOKENS
        assert r["n_seeds"] == n - _SUBSTR_N + 1
        assert a[ia : ia + n] == b[ib : ib + n]
        # maximality: extending one token either way must break the match
        if ia > 0 and ib > 0:
            assert a[ia - 1] != b[ib - 1]
        if ia + n < len(a) and ib + n < len(b):
            assert a[ia + n] != b[ib + n]


def test_substring_finds_planted_span_in_synthetic_corpus(
    spark, tmp_path_factory
):
    """Completeness on a corpus where the ground truth is constructed:
    two documents share one planted 12-token passage (all seeds low-df),
    a third shares nothing long enough — exactly one span must come
    back, with exact offsets and length."""
    from awsbeats_spark.catalog import TABLE_NAMES
    from awsbeats_spark.operators.llm.dedup import _SUBSTR_N

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("sf_substr")
    for t in TABLE_NAMES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        if t != "documents":
            pq.write_table(schema.empty_table(), str(dst / f"{t}.parquet"))
    span = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    texts = [
        "aa bb cc " + span + " dd ee",  # span at 1-based token 4
        span + " zz yy xx ww vv uu tt",  # span at token 1
        "alpha bravo charlie nn oo pp qq rr ss",  # only a 3-token prefix
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["src0"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(dst / "documents.parquet"))
    out = (
        SPECS["dedup_suffix_array_substring"].fn(spark, str(dst)).toPandas()
    )
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["span_tokens"] == 12
    assert (r["a_start"], r["b_start"]) == (4, 1)
    assert r["n_seeds"] == 12 - _SUBSTR_N + 1


# --------------------------------------------------------------------------
# multimodal_image_dct_phash
# --------------------------------------------------------------------------


def _phash_pure_python(payload: bytes) -> tuple[int, int, int]:
    """Independent replay: struct/bytes parsing and sequential math.cos
    loops — no numpy — following the documented quantization spec."""
    from awsbeats_spark.operators.llm.multimodal import _PHASH_G, _PHASH_K

    g, k = _PHASH_G, _PHASH_K
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    top_down = h < 0
    h = abs(h)
    stride = ((3 * w + 3) // 4) * 4

    def pix(row_top: int, col: int) -> int:  # grayscale at top-down coords
        row = row_top if top_down else h - 1 - row_top
        off = data_off + row * stride + 3 * col
        return (payload[off] + payload[off + 1] + payload[off + 2]) // 3

    gray = [
        [
            pix(((2 * gy + 1) * h) // (2 * g), ((2 * gx + 1) * w) // (2 * g))
            for gx in range(g)
        ]
        for gy in range(g)
    ]
    basis = [
        [
            round(math.cos(math.pi * (2 * i + 1) * u / (2 * g)), 12)
            for i in range(g)
        ]
        for u in range(k)
    ]
    rs = [
        [
            round(sum(gray[y][x] * basis[v][x] for x in range(g)), 6)
            for v in range(k)
        ]
        for y in range(g)
    ]
    coef = [
        round(sum(basis[u][y] * rs[y][v] for y in range(g)), 6)
        for u in range(k)
        for v in range(k)
    ][1:]
    med = sorted(coef)[len(coef) // 2]
    val = 0
    for c in coef:
        val = (val << 1) | (1 if c > med else 0)
    return int(w), int(h), val


def test_phash_matches_pure_python_replay(run, spark, sf_dir):
    from awsbeats_spark.operators.llm.multimodal import synthesize_bmp

    docs = _docs(spark, sf_dir)
    out = run("multimodal_image_dct_phash").set_index("doc_id")
    image_docs = {
        d: t
        for d, t in zip(docs["doc_id"], docs["text"])
        if len(t.encode()) % 3 == 0
    }
    assert sorted(out.index) == sorted(image_docs)
    for d, t in image_docs.items():
        w, h, v = _phash_pure_python(synthesize_bmp(t.encode()))
        row = out.loc[d]
        assert (row["width"], row["height"], row["phash"]) == (w, h, v)


def test_phash_bit_population_and_range(run):
    out = run("multimodal_image_dct_phash")
    assert out["phash"].between(0, (1 << 15) - 1).all()
    pops = out["phash"].map(lambda v: bin(int(v)).count("1"))
    # median split of 15: at most 7 bits; exactly 7 unless ties at median
    assert (pops <= 7).all()
    assert (pops == 7).mean() > 0.5, "most real images should have no ties"


def test_phash_differs_from_ahash_on_smooth_gradient():
    """The property pHash exists for: a smooth horizontal luma gradient
    flips about half of aHash's bits (each sample compared to the
    global mean) but leaves pHash's low-frequency structure stable
    under a small DC-free perturbation. Minimal form: two images whose
    pixel rows differ only by a global byte rotation should collide
    under pHash iff their coarse structure matches; a constant image
    must hash to exactly 0 (all coefficients tie at the median)."""
    from awsbeats_spark.operators.llm.multimodal import (
        bmp_phash,
        synthesize_bmp,
    )

    w_const, h_const, v_const = bmp_phash(synthesize_bmp(b"x" * 33))
    assert v_const == 0
    # determinism across calls (fresh buffers)
    a1 = bmp_phash(synthesize_bmp(b"some gradient-ish content" * 4))
    a2 = bmp_phash(synthesize_bmp(b"some gradient-ish content" * 4))
    assert a1 == a2
