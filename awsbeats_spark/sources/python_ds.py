"""`kinesis_replay`: a Spark 4 Python DataSource exposing a shard
archive of delivery records as a first-class format — batch reads,
streaming reads with replayable offsets, and batch/stream writes that
run the reference's batched-retry delivery protocol.

This is the Data Source V2 re-expression of the reference plugin's two
ends (SURVEY.md §2.A/§2.C):

* the READ side models a Kinesis consumer (GetRecords) over an archived
  stream: a directory of `<shard_id>.ndjson` files, one JSON object
  `{"partition_key": ..., "data": ...}` per line, sequence numbers =
  line numbers — exactly what the delivery pipeline (or Firehose→S3)
  lands. Locally that's the replay/dev analog of the real connector,
  the same role localstack plays for the reference
  (/root/reference/example/streams/docker-compose.yml).
* the WRITE side is the reference's output plugin as a native
  `df.write.format(...)` / `writeStream.format(...)` sink instead of a
  foreachBatch closure: per-task `write()` runs chunked ≤500 bulk puts
  with partial-failure retry + capped backoff (streams/client.go:69-189
  semantics via sinks.kinesis.publish_records), returns the observer
  counters as its WriterCommitMessage, and the driver-side `commit()`
  is batch.ACK() — it lands a per-epoch manifest of the summed
  counters (A21) only after EVERY task succeeded.

Scale design (100 TB):
* one InputPartition per shard (per shard-slice when streaming) — read
  parallelism is the shard count, the same unit Kinesis itself scales
  by; rows never funnel through the driver.
* batch reads support FILTER PUSHDOWN on `shard_id` (EqualTo/In):
  pruned shards are never opened — source-level partition pruning.
* streaming offsets are `{shard_id: next_line}` dicts — O(#shards)
  driver state, no per-row driver work; `readBetweenOffsets` replays a
  committed range exactly, so recovery is deterministic.
* writes ship from executors directly (one client per task); the driver
  only aggregates counter structs.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from itertools import islice
from typing import TYPE_CHECKING, Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    In,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Row

SCHEMA_DDL = "shard_id string, sequence_number bigint, partition_key string, data string"


def _shard_files(path: str) -> dict[str, str]:
    """shard_id -> absolute file path, sorted for determinism."""
    out: dict[str, str] = {}
    for name in sorted(os.listdir(path)):
        if name.endswith(".ndjson"):
            out[name[: -len(".ndjson")]] = os.path.join(path, name)
    return out


def _count_lines(path: str) -> int:
    n = 0
    with open(path, "rb") as f:
        for _ in f:
            n += 1
    return n


def _read_lines(
    shard_id: str, path: str, start: int, end: int | None
) -> Iterator[tuple[str, int, str, str]]:
    """Parse lines [start, end) of one shard file into rows."""
    with open(path, encoding="utf-8") as f:
        for seq, line in enumerate(islice(f, start, end), start=start):
            line = line.strip()
            if not line:
                continue
            obj = json.loads(line)
            yield (
                shard_id,
                seq,
                obj.get("partition_key", ""),
                obj.get("data", ""),
            )


@dataclass
class _ShardSlice(InputPartition):
    shard_id: str
    path: str
    start: int
    end: int | None  # None = to EOF (batch)


class ShardArchiveReader(DataSourceReader):
    """Batch reader: one partition per shard, shard_id pushdown."""

    def __init__(self, options: dict[str, str]):
        self.path = options["path"]
        self._keep_shards: set[str] | None = None  # None = all

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:  # noqa: N802
        """Consume shard_id equality filters (source-level pruning);
        return everything else for Spark to evaluate."""
        remaining: list[Filter] = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("shard_id",):
                keep = {str(f.value)}
            elif isinstance(f, In) and f.attribute == ("shard_id",):
                keep = {str(v) for v in f.value}
            else:
                remaining.append(f)
                continue
            self._keep_shards = (
                keep if self._keep_shards is None else self._keep_shards & keep
            )
        return remaining

    def partitions(self) -> Sequence[InputPartition]:
        shards = _shard_files(self.path)
        if self._keep_shards is not None:
            shards = {s: p for s, p in shards.items() if s in self._keep_shards}
        return [_ShardSlice(s, p, 0, None) for s, p in shards.items()]

    def read(self, partition: _ShardSlice) -> Iterator[tuple]:
        return _read_lines(
            partition.shard_id, partition.path, partition.start, partition.end
        )


class ShardArchiveStreamReader(DataSourceStreamReader):
    """Streaming reader: offsets are {shard_id: next_line}; each
    micro-batch plans one partition per shard slice that grew."""

    def __init__(self, options: dict[str, str]):
        self.path = options["path"]

    def initialOffset(self) -> dict:  # noqa: N802
        return {}

    def latestOffset(self) -> dict:  # noqa: N802
        # O(#shards) metadata scan on the driver; a real Kinesis source
        # would ask the service for shard-latest sequence numbers.
        return {s: _count_lines(p) for s, p in _shard_files(self.path).items()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:  # noqa: N802
        shards = _shard_files(self.path)
        out = []
        for shard_id, hi in end.items():
            lo = int(start.get(shard_id, 0))
            if hi > lo and shard_id in shards:
                out.append(_ShardSlice(shard_id, shards[shard_id], lo, int(hi)))
        return out

    def read(self, partition: _ShardSlice) -> Iterator[tuple]:
        return _read_lines(
            partition.shard_id, partition.path, partition.start, partition.end
        )

    def commit(self, end: dict) -> None:
        pass  # archive files are immutable; nothing to release

    def stop(self) -> None:
        pass


@dataclass
class _DeliveryCommit(WriterCommitMessage):
    new_batch: int = 0
    acked: int = 0
    attempts: int = 0
    retried: int = 0


def _writer_cfg_client(options: dict[str, str]):
    """Build (SinkConfig, BulkPutClient) from string writer options.
    client=filedump (default, local stand-in) | kinesis (boto3)."""
    from awsbeats_spark.sinks.kinesis import SinkConfig, make_boto3_client
    from awsbeats_spark.sinks.local import FileDumpClient

    cfg = SinkConfig(
        region=options.get("region", "local"),
        stream_name=options.get("stream_name", "archive"),
        mode=options.get("mode", "streams"),
        partition_key_provider="xid",  # rows already carry their key
        batch_size=int(options.get("batch_size", "500")),
        max_retries=int(options.get("max_retries", "3")),
        backoff_init_s=float(options.get("backoff_init_s", "0.01")),
        backoff_max_s=float(options.get("backoff_max_s", "1.0")),
    )
    cfg.validate()
    kind = options.get("client", "filedump")
    if kind == "filedump":
        return cfg, FileDumpClient(options["path"])
    if kind == "kinesis":  # pragma: no cover - needs AWS
        return cfg, make_boto3_client(cfg)
    raise ValueError(f"unknown client option: {kind!r}")


class DeliveryWriter(DataSourceWriter):
    """Batch write = one delivery job; rows must have `partition_key`
    and `data` columns (project_record output)."""

    def __init__(self, options: dict[str, str]):
        self.options = dict(options)

    def write(self, iterator: Iterator["Row"]) -> _DeliveryCommit:
        from awsbeats_spark.sinks.kinesis import publish_records

        cfg, client = _writer_cfg_client(self.options)
        records = [
            {"partition_key": row["partition_key"], "data": row["data"]}
            for row in iterator
        ]
        c = publish_records(client, records, cfg, sleep=lambda _s: None)
        return _DeliveryCommit(c.new_batch, c.acked, c.attempts, c.retried)

    def commit(self, messages: list[_DeliveryCommit | None]) -> None:
        self._land_manifest(self.options, messages, name="_DELIVERY_MANIFEST.json")

    def abort(self, messages) -> None:
        pass  # at-least-once: already-delivered records are in-contract

    @staticmethod
    def _land_manifest(options, messages, name: str) -> None:
        """batch.ACK(): runs only after every task committed."""
        totals = {"new_batch": 0, "acked": 0, "attempts": 0, "retried": 0, "tasks": 0}
        for m in messages:
            if m is not None:
                totals["new_batch"] += m.new_batch
                totals["acked"] += m.acked
                totals["attempts"] += m.attempts
                totals["retried"] += m.retried
                totals["tasks"] += 1
        path = os.path.join(options["path"], name)
        with open(path, "w", encoding="utf-8") as f:
            json.dump(totals, f)


class DeliveryStreamWriter(DataSourceStreamWriter):
    """Streaming write: per-epoch delivery with a per-batch ACK
    manifest (epoch commit == batch.ACK(), SURVEY.md §1.1)."""

    def __init__(self, options: dict[str, str]):
        self.options = dict(options)

    def write(self, iterator: Iterator["Row"]) -> _DeliveryCommit:
        return DeliveryWriter(self.options).write(iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803
        commits = os.path.join(self.options["path"], "commits")
        os.makedirs(commits, exist_ok=True)
        DeliveryWriter._land_manifest(
            {"path": commits}, messages, name=f"batch-{batchId}.json"
        )

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        pass


class KinesisReplayDataSource(DataSource):
    """format("kinesis_replay") — register once per session with
    `spark.dataSource.register(KinesisReplayDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_replay"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return ShardArchiveReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:  # noqa: N802
        return ShardArchiveStreamReader(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return DeliveryWriter(self.options)

    def streamWriter(  # noqa: N802
        self, schema: StructType, overwrite: bool
    ) -> DataSourceStreamWriter:
        return DeliveryStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(KinesisReplayDataSource)
