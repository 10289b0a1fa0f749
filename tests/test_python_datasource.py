"""Tests for the `kinesis_replay` Python DataSource (sources/python_ds.py):
batch reads with shard-partition parallelism and shard_id pushdown
pruning, streaming reads with replayable offsets + checkpoint restart,
and the native write path running the reference delivery protocol
(chunked bulk puts, partial-failure retry, commit-time ACK manifest —
/root/reference/streams/client.go:69-189 semantics)."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from awsbeats_spark.sources.python_ds import (
    KinesisReplayDataSource,
    ShardArchiveReader,
    register,
)

pytestmark = pytest.mark.usefixtures("spark")


def _write_shard(d: Path, shard: str, n: int, start: int = 0) -> None:
    lines = [
        json.dumps({"partition_key": f"pk{(start + i) % 3}", "data": f"payload-{shard}-{start + i}"})
        for i in range(n)
    ]
    with open(d / f"{shard}.ndjson", "a", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


@pytest.fixture
def archive(tmp_path):
    d = tmp_path / "archive"
    d.mkdir()
    _write_shard(d, "shard-0", 4)
    _write_shard(d, "shard-1", 3)
    _write_shard(d, "shard-2", 2)
    return d


@pytest.fixture
def registered(spark):
    register(spark)
    return spark


def test_batch_read_one_partition_per_shard(registered, archive):
    df = registered.read.format("kinesis_replay").option("path", str(archive)).load()
    assert df.schema.simpleString() == (
        "struct<shard_id:string,sequence_number:bigint,partition_key:string,data:string>"
    )
    assert df.count() == 9
    assert df.rdd.getNumPartitions() == 3  # parallelism = shard count
    got = {r["data"] for r in df.filter(F.col("shard_id") == "shard-1").collect()}
    assert got == {"payload-shard-1-0", "payload-shard-1-1", "payload-shard-1-2"}
    # sequence numbers are per-shard line numbers
    seqs = [
        r["sequence_number"]
        for r in df.filter(F.col("shard_id") == "shard-0")
        .orderBy("sequence_number")
        .collect()
    ]
    assert seqs == [0, 1, 2, 3]


def test_pushdown_prunes_shard_files():
    """EqualTo/In on shard_id must prune partitions at the source —
    unopened files, not post-scan filtering (unit-level, no Spark)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        dp = Path(d)
        _write_shard(dp, "shard-0", 1)
        _write_shard(dp, "shard-1", 1)
        _write_shard(dp, "shard-2", 1)
        from pyspark.sql.datasource import EqualTo, GreaterThan, In

        r = ShardArchiveReader({"path": d})
        rest = list(
            r.pushFilters(
                [In(("shard_id",), ("shard-0", "shard-2")), GreaterThan(("sequence_number",), 0)]
            )
        )
        # the non-shard filter is returned for Spark to apply
        assert len(rest) == 1 and isinstance(rest[0], GreaterThan)
        parts = r.partitions()
        assert sorted(p.shard_id for p in parts) == ["shard-0", "shard-2"]

        r2 = ShardArchiveReader({"path": d})
        assert list(r2.pushFilters([EqualTo(("shard_id",), "shard-1")])) == []
        assert [p.shard_id for p in r2.partitions()] == ["shard-1"]


def test_pushdown_result_correct_through_spark(registered, archive):
    df = (
        registered.read.format("kinesis_replay")
        .option("path", str(archive))
        .load()
        .filter(F.col("shard_id").isin("shard-0", "shard-2"))
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert {r["shard_id"]: r["n"] for r in df.collect()} == {"shard-0": 4, "shard-2": 2}


def test_stream_read_incremental_offsets_and_restart(registered, archive, tmp_path):
    """New lines and new shards arrive exactly once per trigger; a
    restarted query resumes from committed offsets (no duplicates)."""
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink_parquet")

    def start():
        return (
            registered.readStream.format("kinesis_replay")
            .option("path", str(archive))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    def landed():
        return registered.read.parquet(sink)

    q = start()
    try:
        q.processAllAvailable()
        assert landed().count() == 9
        _write_shard(archive, "shard-1", 2, start=3)  # grow a shard
        _write_shard(archive, "shard-3", 1)  # brand-new shard
        q.processAllAvailable()
        assert landed().count() == 12
    finally:
        q.stop()

    _write_shard(archive, "shard-3", 2, start=1)
    q = start()  # restart from checkpoint: only the 2 new lines arrive
    try:
        q.processAllAvailable()
        df = landed()
        assert df.count() == 14  # exactly-once accumulation, no duplicates
        assert df.select("shard_id", "sequence_number").distinct().count() == 14
        assert df.filter("shard_id = 'shard-3'").count() == 3
    finally:
        q.stop()


def test_batch_write_delivers_all_records_with_manifest(registered, tmp_path):
    out = tmp_path / "delivered"
    out.mkdir()
    df = registered.range(1203).select(
        F.concat(F.lit("pk"), (F.col("id") % 7).cast("string")).alias("partition_key"),
        F.concat(F.lit("rec-"), F.col("id").cast("string"), F.lit("\n")).alias("data"),
    )
    (
        df.repartition(4)
        .write.format("kinesis_replay")
        .option("path", str(out))
        .option("batch_size", "500")
        .mode("append")
        .save()
    )
    calls = sorted(out.glob("call-*.json"))
    delivered = [rec for c in calls for rec in json.loads(c.read_text())]
    assert len(delivered) == 1203
    assert {r["data"] for r in delivered} == {f"rec-{i}\n" for i in range(1203)}
    # chunking respects the AWS 500-record bulk cap
    assert all(len(json.loads(c.read_text())) <= 500 for c in calls)
    manifest = json.loads((out / "_DELIVERY_MANIFEST.json").read_text())
    assert manifest["new_batch"] == 1203 and manifest["acked"] == 1203
    assert manifest["tasks"] == 4


def test_stream_write_acks_per_epoch(registered, archive, tmp_path):
    out = tmp_path / "stream_out"
    out.mkdir()
    q = (
        registered.readStream.format("kinesis_replay")
        .option("path", str(archive))
        .load()
        .selectExpr("partition_key", "data")
        .writeStream.format("kinesis_replay")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    delivered = [
        rec for c in out.glob("call-*.json") for rec in json.loads(c.read_text())
    ]
    assert {r["data"] for r in delivered} == {
        f"payload-shard-{s}-{i}" for s, n in [(0, 4), (1, 3), (2, 2)] for i in range(n)
    }
    commits = list((out / "commits").glob("batch-*.json"))
    assert commits, "per-epoch ACK manifest missing"
    total = sum(json.loads(c.read_text())["acked"] for c in commits)
    assert total == 9
