"""Round-11 optimization seams: the single-``F.expr`` fast paths and the
gated scan fan-out must be behavior-identical to the forms they replace.

The fast paths exist to cut py4j driver roundtrips during DataFrame
*construction* (guide §1: measured 2084→1019 socket commands on the
minhash build); they must produce the same rows bit-for-bit, because the
oracle hash-compares raw values. ``scan_fanout`` exists to spread a
bench-scale single-file scan across cores (guide §2.5) and must be a
provable no-op past its size gates so it can never fire at data scale.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from awsbeats_spark.catalog import scan_fanout
from awsbeats_spark.functions.textfns import shingles, words
from awsbeats_spark.functions.vectorfns import cosine, dot, norm

DOCS = [
    ("a", "The  quick brown\tfox jumps over the lazy dog"),
    ("b", "one two"),
    ("c", ""),
    ("d", "  leading and trailing   "),
    ("e", "Mixed CASE Tokens repeat repeat repeat"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_words_fast_path_matches_column_form(spark):
    df = _docs_df(spark)
    fast = df.select("doc_id", words("text").alias("w")).collect()
    slow = df.select("doc_id", words(F.col("text")).alias("w")).collect()
    assert sorted(fast) == sorted(slow)


def test_shingles_fast_path_matches_column_form(spark):
    # includes docs with fewer than n words (the sequence(1,0) guard)
    df = _docs_df(spark).select("doc_id", words("text").alias("w"))
    for n in (2, 3, 5):
        fast = df.select("doc_id", shingles("w", n).alias("sh")).collect()
        slow = df.select("doc_id", shingles(F.col("w"), n).alias("sh")).collect()
        assert sorted(fast) == sorted(slow), f"n={n}"


def test_vector_fast_paths_match_column_forms_bitwise(spark):
    # the fold order is identical (sequential aggregate), so results
    # must be BIT-identical, not just close — the oracle hashes them
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.5, -3.25, 1e-9], [0.5, -1.5, 2.0, 1e9]),
            (2, [0.1, 0.2, 0.3, 0.4], [0.4, 0.3, 0.2, 0.1]),
        ],
        ["i", "a", "b"],
    )
    fast = df.select(
        dot("a", "b").alias("d"), norm("a").alias("n"), cosine("a", "b").alias("c")
    ).collect()
    slow = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        norm(F.col("a")).alias("n"),
        cosine(F.col("a"), F.col("b")).alias("c"),
    ).collect()
    assert fast == slow


def _write_table(tmp_path, name="documents", rows=64):
    tbl = pa.table({"doc_id": pa.array(range(rows), type=pa.int64())})
    pq.write_table(tbl, str(tmp_path / f"{name}.parquet"))


def test_scan_fanout_spreads_small_single_file_scan(spark, tmp_path):
    _write_table(tmp_path)
    df = spark.read.parquet(str(tmp_path / "documents.parquet"))
    assert df.rdd.getNumPartitions() == 1  # the bench-scale shape
    out = scan_fanout(df, str(tmp_path), "documents")
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # same rows, order-insensitive (callers are order-insensitive math)
    assert sorted(r.doc_id for r in out.collect()) == list(range(64))


def test_scan_fanout_noop_when_scan_already_splits(spark, tmp_path):
    # est_splits >= cores -> the input parallelizes on its own at scan
    # time and the helper must return the SAME object (no repartition)
    _write_table(tmp_path)
    df = spark.read.parquet(str(tmp_path / "documents.parquet"))
    key = "spark.sql.files.maxPartitionBytes"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "1b")
        assert scan_fanout(df, str(tmp_path), "documents") is df
    finally:
        spark.conf.set(key, old)


def test_scan_fanout_noop_past_absolute_size_gate(spark, tmp_path, monkeypatch):
    # past 256 MB the helper must be a guaranteed no-op (data scale)
    import awsbeats_spark.catalog as cat

    _write_table(tmp_path)
    df = spark.read.parquet(str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(cat, "_FANOUT_MAX_BYTES", 0)
    assert cat.scan_fanout(df, str(tmp_path), "documents") is df


def test_scan_fanout_noop_when_input_missing(spark, tmp_path):
    # unknown layout (no local file) -> never guess, never repartition
    _write_table(tmp_path)
    df = spark.read.parquet(str(tmp_path / "documents.parquet"))
    assert scan_fanout(df, "/nonexistent", "documents") is df
