"""Kinesis / Firehose-style batched delivery sink with partial-failure
retry — the engine's re-expression of the reference's entire Go plugin
(SURVEY.md §2.A).

Reference parity map (file:line into /root/reference):
* config + validation        -> SinkConfig            (streams/config.go:8-59,
                                                       firehose/config.go:8-51)
* Publish ack-or-retry       -> publish_records       (streams/client.go:69-84)
* publishEvents orchestration-> _attempt              (streams/client.go:86-107)
* mapEvents drop-on-error    -> project step in writer(streams/client.go:109-125)
* bulk PutRecords/PutRecordBatch chunks              (streams/client.go:155-165,
                                                       firehose/client.go:138-144)
* collectFailedEvents        -> collect_failed        (streams/client.go:167-189,
                                                       firehose/client.go:146-158)
* retry-all on request error -> publish_records       (streams/client.go:100-102)
* backoff 1s->60s, retries 3 -> publish_records       (streams/streams.go:38-39,
                                                       streams/config.go:30-39)
* observer counters          -> DeliveryCounters      (streams/client.go:87-96)

Spark integration: `foreach_batch_writer` returns a function for
``df.writeStream.foreachBatch(...)``. Inside the micro-batch it runs
``foreachPartition`` so each EXECUTOR ships its own partition directly
(records never funnel through the Spark driver) — at 1000 executors the
sink fan-out is the cluster width, the exact property Kinesis partition
keys exist for. Returning normally commits the epoch (= batch.ACK());
raising lets Spark retry the task/epoch (at-least-once, as the
reference's contract — duplicates are in-contract).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Protocol

MAX_BATCH_SIZE = 500  # AWS PutRecords / PutRecordBatch hard cap
DEFAULT_BATCH_SIZE = 50


class DeliveryError(Exception):
    """Raised when records remain undelivered after max_retries."""


@dataclass
class SinkConfig:
    """Validated sink options (the reference's StreamsConfig /
    FirehoseConfig)."""

    region: str = ""
    stream_name: str = ""
    mode: str = "streams"  # "streams" (partition keys) | "firehose" (none)
    partition_key: str | None = None
    partition_key_provider: str | None = None  # None => field provider; "xid"
    batch_size: int = DEFAULT_BATCH_SIZE
    max_retries: int = 3
    timeout_s: float = 90.0
    backoff_init_s: float = 1.0
    backoff_max_s: float = 60.0
    # Custom AWS endpoint (standard SDK option): localstack/moto-style
    # integration targets or VPC interface endpoints. None = AWS default.
    endpoint_url: str | None = None

    def validate(self) -> None:
        # streams/config.go:41-59 + firehose/config.go:37-51, one rule each
        if not self.region:
            raise ValueError("region is not defined")
        if not self.stream_name:
            raise ValueError("stream_name is not defined")
        if self.mode not in ("streams", "firehose"):
            raise ValueError(f"invalid mode: {self.mode!r}")
        if not (1 <= self.batch_size <= MAX_BATCH_SIZE):
            raise ValueError(
                f"invalid batch_size: {self.batch_size} (expected 1..{MAX_BATCH_SIZE})"
            )
        if self.partition_key_provider not in (None, "xid"):
            raise ValueError(
                f"invalid partition_key_provider: {self.partition_key_provider!r} "
                "(only 'xid' is supported)"
            )
        if self.mode == "streams" and self.partition_key_provider is None and not self.partition_key:
            raise ValueError("partition_key is required for the field provider")


@dataclass
class DeliveryCounters:
    """Observer counters (streams/client.go:87-96). In the streaming
    writer these are summed per-partition and reported through the
    StreamingQueryListener / logs."""

    new_batch: int = 0
    acked: int = 0
    dropped: int = 0
    retried: int = 0
    attempts: int = 0
    timeouts: int = 0


class BulkPutClient(Protocol):
    """One bulk call per chunk. Implementations: boto3 (production),
    stubs (tests). Response shape mirrors the AWS APIs:

    streams:  {"FailedRecordCount": int, "Records": [ {"ErrorCode": str?} | None ]}
    firehose: {"FailedPutCount": int, "RequestResponses": [ {"ErrorCode": str?} | None ]}
    """

    def put_records(self, records: list[dict[str, Any]]) -> dict[str, Any]: ...


def make_boto3_client(cfg: SinkConfig) -> BulkPutClient:
    """Production client: real boto3 against AWS, a localstack/moto
    endpoint, or the wire-level loopback server in
    tests/test_sink_e2e_wire.py (cfg.endpoint_url). Unit tests inject
    plain stubs instead and never construct this."""
    try:
        import boto3  # type: ignore[import-not-found]
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "boto3 is not installed in this environment; inject a BulkPutClient stub"
        ) from exc

    # Request timeout lives in the transport too (streams/config.go:31):
    # botocore aborts a hung HTTP call at timeout_s, and its own retry
    # layer is disabled — publish_records owns ALL retry/backoff policy,
    # so SDK-level retries would double-deliver ack'd records.
    try:
        from botocore.config import Config  # type: ignore[import-not-found]

        boto_cfg = Config(
            connect_timeout=cfg.timeout_s,
            read_timeout=cfg.timeout_s,
            retries={"max_attempts": 0},
        )
    except ImportError:  # pragma: no cover
        boto_cfg = None

    if cfg.mode == "streams":
        kin = boto3.client(
            "kinesis",
            region_name=cfg.region,
            endpoint_url=cfg.endpoint_url,
            config=boto_cfg,
        )

        class _Streams:
            def put_records(self, records: list[dict[str, Any]]) -> dict[str, Any]:
                return kin.put_records(
                    StreamName=cfg.stream_name,
                    Records=[
                        {"Data": r["data"], "PartitionKey": r["partition_key"]}
                        for r in records
                    ],
                )

        return _Streams()

    fh = boto3.client(
        "firehose",
        region_name=cfg.region,
        endpoint_url=cfg.endpoint_url,
        config=boto_cfg,
    )

    class _Firehose:
        def put_records(self, records: list[dict[str, Any]]) -> dict[str, Any]:
            resp = fh.put_record_batch(
                DeliveryStreamName=cfg.stream_name,
                Records=[{"Data": r["data"]} for r in records],
            )
            return {
                "FailedRecordCount": resp.get("FailedPutCount", 0),
                "Records": resp.get("RequestResponses", []),
            }

    return _Firehose()


def collect_failed(
    response: dict[str, Any], records: list[dict[str, Any]]
) -> list[dict[str, Any]]:
    """Positional zip of response entries with request records; keep the
    records that must be retried.

    Reference semantics (streams/client.go:167-189, firehose/client.go:146-158):
    * FailedRecordCount == 0 (or missing)  -> nothing to retry
    * response record is None              -> skip with warning (issues/27)
    * ErrorCode missing/None               -> skip with warning
    * ErrorCode == ""                      -> success
    * ErrorCode != ""                      -> retry that record
    """
    failed_count = response.get("FailedRecordCount") or response.get("FailedPutCount") or 0
    if not failed_count:
        return []
    entries = response.get("Records") or response.get("RequestResponses") or []
    failed: list[dict[str, Any]] = []
    for i, rec in enumerate(records):
        entry = entries[i] if i < len(entries) else None
        if entry is None:
            continue  # nil response record: not retryable, skip
        code = entry.get("ErrorCode")
        if code is None:
            continue  # nil error code: skip
        if code != "":
            failed.append(rec)
    return failed


def _call_with_timeout(fn, arg, timeout_s: float):
    """Run ``fn(arg)`` on a DAEMON thread, waiting at most timeout_s.

    Raises TimeoutError on expiry (the thread is abandoned, not killed —
    see publish_records for why that is in-contract). Daemon threads are
    essential here: a wedged non-daemon worker would block interpreter
    exit in the Spark executor."""
    import threading

    box: dict[str, Any] = {}
    done = threading.Event()

    def run() -> None:
        try:
            box["result"] = fn(arg)
        except BaseException as exc:  # noqa: BLE001 - re-raised in caller
            box["error"] = exc
        finally:
            done.set()

    threading.Thread(target=run, daemon=True).start()
    if not done.wait(timeout_s):
        raise TimeoutError(f"bulk put still pending after {timeout_s}s")
    if "error" in box:
        raise box["error"]
    return box["result"]


def _transport_timeout_types() -> tuple[type, ...]:
    """Concrete timeout exception types from the transport stacks we may
    sit on (import-guarded: boto3/urllib3 are optional here — the test
    and localstack clients raise plain exceptions)."""
    types: list[type] = []
    try:
        from botocore.exceptions import (  # type: ignore[import-not-found]
            ConnectTimeoutError,
            ReadTimeoutError,
        )

        types += [ConnectTimeoutError, ReadTimeoutError]
    except ImportError:
        pass
    try:
        import urllib3.exceptions as u3  # type: ignore[import-not-found]

        types += [u3.ConnectTimeoutError, u3.ReadTimeoutError, u3.TimeoutError]
    except ImportError:
        pass
    return tuple(types)


_TIMEOUT_TYPES = _transport_timeout_types()


def _is_transport_timeout(exc: BaseException) -> bool:
    """True when ``exc`` (or anything on its cause/context chain) is a
    transport-level timeout. Wrapped errors — botocore surfacing urllib3
    timeouts as ConnectionError subclasses — are found by walking the
    chain; the class-name substring heuristic stays as the fallback for
    stacks we don't know about."""
    seen: set[int] = set()
    cur: BaseException | None = exc
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        if _TIMEOUT_TYPES and isinstance(cur, _TIMEOUT_TYPES):
            return True
        if "timeout" in type(cur).__name__.lower():
            return True
        cur = cur.__cause__ or cur.__context__
    return False


def publish_records(
    client: BulkPutClient,
    records: list[dict[str, Any]],
    cfg: SinkConfig,
    counters: DeliveryCounters | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> DeliveryCounters:
    """Deliver records at-least-once: chunk to <= batch_size per bulk
    call, collect per-record failures, retry exactly the failed subset
    with capped exponential backoff, raise after max_retries.

    This is Publish + publishEvents (streams/client.go:69-107) with the
    libbeat queue's re-enqueue replaced by an in-function retry loop
    (the Spark epoch is the transaction; see module docstring).
    """
    counters = counters if counters is not None else DeliveryCounters()
    counters.new_batch += len(records)
    pending = list(records)
    attempt = 0
    # Request-timeout enforcement (streams/config.go:31, default 90 s):
    # each bulk call runs under a bounded wait. Python cannot abort a
    # blocked callable, so a call still hung at timeout_s is ABANDONED
    # on a daemon thread (never blocks interpreter exit) and its chunk
    # retried — if the abandoned request later succeeds server-side the
    # records are duplicated, which is inside the at-least-once contract
    # (the reference duplicates the same way on whole-request retry,
    # streams/client.go:72-80). For boto3 clients the transport-level
    # read_timeout (make_boto3_client) fires first and surfaces as an
    # exception on the generic path below; this wait is the backstop for
    # clients without their own timeout.
    while pending:
        if attempt > cfg.max_retries:
            raise DeliveryError(
                f"{len(pending)} records undelivered after {cfg.max_retries} retries"
            )
        if attempt > 0:
            counters.retried += len(pending)
            # outputs.WithBackoff semantics: init * 2^(n-1), capped
            sleep(min(cfg.backoff_init_s * (2 ** (attempt - 1)), cfg.backoff_max_s))
        next_round: list[dict[str, Any]] = []
        for start in range(0, len(pending), cfg.batch_size):
            chunk = pending[start : start + cfg.batch_size]
            counters.attempts += 1
            try:
                if cfg.timeout_s and cfg.timeout_s > 0:
                    response = _call_with_timeout(
                        client.put_records, chunk, cfg.timeout_s
                    )
                else:
                    response = client.put_records(chunk)
            except TimeoutError:
                counters.timeouts += 1
                next_round.extend(chunk)
                continue
            except Exception as exc:  # noqa: BLE001 - request-level failure
                # no per-record info: retry ALL (streams/client.go:100-102).
                # Transport-level timeouts (botocore ReadTimeoutError etc.)
                # arrive here — count them so the metric reflects reality.
                if _is_transport_timeout(exc):
                    counters.timeouts += 1
                next_round.extend(chunk)
                continue
            next_round.extend(collect_failed(response, chunk))
        counters.acked += len(pending) - len(next_round)
        pending = next_round
        attempt += 1
    return counters


def foreach_batch_writer(
    cfg: SinkConfig,
    client_factory: Callable[[SinkConfig], BulkPutClient] = make_boto3_client,
    on_counters: Callable[[DeliveryCounters], None] | None = None,
    idempotent_dir: str | None = None,
):
    """Build the ``foreachBatch`` function wiring the sink into
    Structured Streaming.

    The incoming DataFrame must already be projected to
    ``(data, partition_key)`` — see operators/relational.py
    ``project_record`` (rows whose key extraction failed were dropped
    there and counted, mirroring mapEvents' drop-not-retry policy,
    streams/client.go:109-125).

    Each partition builds its own client (boto3 is connectionless, as
    the reference's Connect() no-op notes — streams/client.go:57-67) and
    publishes its rows; the driver never sees record payloads.
    """
    cfg.validate()

    def write_batch(df, epoch_id: int) -> None:  # noqa: ANN001 - Spark API
        # Epoch-commit guard: after a crash between sink delivery and
        # Spark's checkpoint commit, the restarted query redelivers the
        # last epoch (at-least-once). A marker per committed epoch_id
        # (epoch ids are stable across restarts of the same checkpoint)
        # turns redelivery into a no-op — effectively-once at batch
        # granularity. Locally a directory; on a cluster the same two
        # lines against S3/DynamoDB. Upgrade over the reference, which
        # has no dedup story at all (duplicates in-contract,
        # streams/client.go:72-80).
        marker = None
        if idempotent_dir is not None:
            from pathlib import Path

            marker = Path(idempotent_dir) / f"epoch-{int(epoch_id)}.done"
            if marker.exists():
                return

        def write_partition(rows) -> None:  # noqa: ANN001
            client = client_factory(cfg)
            records = [
                {"data": r["data"], "partition_key": r["partition_key"]} for r in rows
            ]
            if not records:
                return
            counters = publish_records(client, records, cfg)
            if on_counters is not None:
                on_counters(counters)

        df.foreachPartition(write_partition)
        if marker is not None:
            marker.parent.mkdir(parents=True, exist_ok=True)
            marker.write_text("")

    return write_batch


def arrow_batch_writer(
    cfg: SinkConfig,
    client_factory: Callable[[SinkConfig], BulkPutClient] = make_boto3_client,
    on_counters: Callable[[DeliveryCounters], None] | None = None,
    output: str = "count",
):
    """Arrow-batched BATCH-mode delivery: the same chunk/retry/backoff
    core as ``foreach_batch_writer`` (both run ``publish_records``), but
    rows reach the Python worker as Arrow RecordBatches instead of
    pickled Rows — measured 0.86 s -> 0.70 s for 100k records at sf0.1,
    and the marshaling gap widens with record count, so this is the
    high-throughput path for backfills/bulk replays while the
    ``foreachPartition`` writer remains the Structured-Streaming surface.

    With ``output="count"`` (default), returns a function for
    ``DataFrame.mapInArrow(fn, "n_published long")``; drive it with an
    action (sum of ``n_published`` = records handed to the client at
    least once). With ``output="manifest"``, the function instead yields
    one row PER DELIVERED RECORD — ``(partition_key, data_len)``,
    recorded at ack time (``publish_records`` returning at all means
    every record was acked; otherwise it raises DeliveryError and the
    task fails) — so callers that report what arrived need no second
    read of the sink's storage (round 12: replaced the sink operator's
    multiLine JSON read-back of the dump dir, a full re-parse of every
    delivered payload). Because ``mapInArrow`` is a transformation, a
    re-executed task re-publishes its partition — inside the
    at-least-once contract, exactly like the reference's whole-request
    retry duplication (streams/client.go:72-80); wrap the query in the
    epoch marker from ``foreach_batch_writer`` when effectively-once
    matters.
    """
    cfg.validate()
    if output not in ("count", "manifest"):
        raise ValueError(f"invalid output: {output!r} (expected 'count' or 'manifest')")

    def deliver(batches):  # noqa: ANN001 - Spark mapInArrow API
        import pyarrow as pa

        client = client_factory(cfg)
        buf: list[dict[str, Any]] = []
        for rb in batches:
            cols = rb.to_pydict()
            buf.extend(
                {"data": d, "partition_key": k}
                for d, k in zip(cols["data"], cols["partition_key"])
            )
        n = 0
        if buf:
            counters = publish_records(client, buf, cfg)
            if on_counters is not None:
                on_counters(counters)
            n = len(buf)
        if output == "manifest":
            if buf:
                yield pa.RecordBatch.from_pydict(
                    {
                        "partition_key": [r["partition_key"] for r in buf],
                        "data_len": pa.array(
                            [len(r["data"]) for r in buf], type=pa.int32()
                        ),
                    }
                )
            return
        yield pa.RecordBatch.from_pydict({"n_published": [n]})

    return deliver
