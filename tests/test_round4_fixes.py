"""Regression tests for the round-4 ADVICE fixes (operators/llm/corpus.py):

1. ``corpus_bigram_entropy_rate`` must survive 0/1-word documents.
   Spark's ``sequence(1, size - 1)`` counts DOWN for size < 2
   (``sequence(1, 0)`` = [1, 0]), so without the ``size >= 2``
   pre-filter the transform indexes ``ws[1]`` on a 1-word doc and ANSI
   mode raises INVALID_ARRAY_INDEX, killing the job.
2. ``corpus_vocab_growth_heaps`` must emit a row (vocab=0, n_tokens=0)
   for checkpoints where no word/token precedes them — matching the
   DuckDB oracle's scalar-subquery + coalesce semantics — and must not
   run an eager count() job at plan-build time.
"""

from __future__ import annotations

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def degenerate_docs_dir(tmp_path_factory):
    """60 documents: the first 55 empty or one-word (no bigrams, and no
    tokens at all for the empty ones), then 5 normal two-word docs —
    exercises both the ANSI array-index path and the degenerate Heaps
    checkpoint at cp=50."""
    dst = tmp_path_factory.mktemp("sf_degenerate")
    rows = []
    for i in range(55):
        text = "" if i % 2 == 0 else "solo"
        rows.append((i, text, "en", "web", len(text)))
    for i in range(55, 60):
        rows.append((i, "alpha beta", "en", "web", 10))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(str(dst / "documents.parquet"), index=False)
    return str(dst)


def test_bigram_entropy_survives_short_docs(spark, degenerate_docs_dir):
    out = (
        SPECS["corpus_bigram_entropy_rate"]
        .fn(spark, degenerate_docs_dir)
        .toPandas()
    )
    assert len(out) == 1
    row = out.iloc[0]
    # 5 docs x 1 bigram ("alpha","beta"); H(w2|w1)=0 (beta always follows
    # alpha); joint entropy of a single distinct bigram is 0.
    assert row["n_bigrams"] == 5
    assert row["n_distinct_bigrams"] == 1
    assert row["entropy_rate_nats"] == 0.0
    assert row["joint_entropy_nats"] == 0.0


def test_vocab_growth_emits_degenerate_checkpoints(
    spark, degenerate_docs_dir
):
    out = (
        SPECS["corpus_vocab_growth_heaps"]
        .fn(spark, degenerate_docs_dir)
        .toPandas()
        .set_index("n_docs")
        .sort_index()
    )
    # 60 docs -> checkpoints 50 only (next is 100)
    assert list(out.index) == [50]
    # first 50 docs: 25 empty + 25 "solo" -> vocab {solo}, 25 tokens
    assert out.loc[50, "vocab"] == 1
    assert out.loc[50, "n_tokens"] == 25


def test_vocab_growth_all_empty_prefix(spark, tmp_path_factory):
    """A corpus whose first 50 docs are ALL empty: the cp=50 checkpoint
    has no firsts and no tokens — before the fix the inner joins dropped
    the row; the oracle emits vocab=0 / n_tokens=0."""
    dst = tmp_path_factory.mktemp("sf_allempty")
    rows = [(i, "", "en", "web", 0) for i in range(50)]
    rows += [(i, "word list here", "en", "web", 14) for i in range(50, 60)]
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(dst / "documents.parquet"), index=False)
    out = (
        SPECS["corpus_vocab_growth_heaps"]
        .fn(spark, str(dst))
        .toPandas()
        .set_index("n_docs")
    )
    assert 50 in out.index
    assert out.loc[50, "vocab"] == 0
    assert out.loc[50, "n_tokens"] == 0


def test_vocab_growth_plan_is_lazy(spark, degenerate_docs_dir):
    """Building the DataFrame must not trigger a Spark *scan* job. One
    job is allowed: ``spark.read.parquet`` runs a file-listing/schema
    job for any operator. The old code additionally ran a full
    documents.count() at plan-build time (>= 2 jobs)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = SPECS["corpus_vocab_growth_heaps"].fn(spark, degenerate_docs_dir)
    after = tracker.getJobIdsForGroup(None)
    assert len(after) - len(before) <= 1, (
        "plan build launched more than the parquet schema-listing job"
    )
    assert df.columns == ["n_docs", "vocab", "n_tokens"]


# --------------------------------------------------------------------------
# dedup_ngram_topk_bounded: bounded output on an adversarial corpus
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def dup_cluster_dir(tmp_path_factory):
    """40 near-identical docs (one word differs) + 10 unrelated docs:
    the uncapped all-pairs contract emits ~40*39/2 = 780 rows; the
    bounded operator must stay at <= PAIR_TOPK per anchor doc."""
    dst = tmp_path_factory.mktemp("sf_dupcluster")
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronauts catalog meteor fragments beside the river delta "
        "counting pebbles and naming each one after a forgotten storm"
    )
    rows = []
    for i in range(40):
        text = base + f" variant token{i}"
        rows.append((i, text, "en", "web", len(text)))
    for i in range(40, 50):
        text = " ".join(f"unique{i}w{j}" for j in range(30))
        rows.append((i, text, "en", "web", len(text)))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(dst / "documents.parquet"), index=False)
    return str(dst)


def test_topk_bounded_output_on_dup_cluster(spark, dup_cluster_dir):
    from awsbeats_spark.operators.llm.dedup import PAIR_TOPK

    uncapped = (
        SPECS["dedup_ngram_jaccard"].fn(spark, dup_cluster_dir).toPandas()
    )
    bounded = (
        SPECS["dedup_ngram_topk_bounded"].fn(spark, dup_cluster_dir).toPandas()
    )
    # the cluster really explodes the all-pairs contract...
    assert len(uncapped) >= 40 * 39 / 2
    # ...and the bounded operator caps it at PAIR_TOPK per anchor
    assert bounded.groupby("doc_a").size().max() <= PAIR_TOPK
    assert len(bounded) <= PAIR_TOPK * bounded["doc_a"].nunique()
    assert len(bounded) < len(uncapped) / 5
    # ranks are 1..k, descending jaccard within each anchor
    for _, g in bounded.groupby("doc_a"):
        g = g.sort_values("rk")
        assert list(g["rk"]) == list(range(1, len(g) + 1))
        assert (g["jaccard"].diff().dropna() <= 1e-12).all()
