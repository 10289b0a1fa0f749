"""Failure-matrix tests for the Kinesis-style sink — mirrors the
reference's test suite scenario-for-scenario
(/root/reference/streams/client_test.go:109-226,
/root/reference/firehose/client_test.go:44-72,
/root/reference/streams/config_test.go:5-51): success, nil response
record, nil error code, per-record error, whole-request failure, plus
config validation bounds. Pure Python — no Spark session needed.
"""

from __future__ import annotations

import pytest

from awsbeats_spark.sinks.kinesis import (
    DeliveryCounters,
    DeliveryError,
    SinkConfig,
    collect_failed,
    publish_records,
)


def rec(i: int) -> dict:
    return {"data": f"event-{i}\n", "partition_key": str(i)}


def ok_entry():
    return {"ErrorCode": ""}


def cfg(**kw) -> SinkConfig:
    base = dict(region="us-east-1", stream_name="test", partition_key="k")
    base.update(kw)
    return SinkConfig(**base)


class ScriptedClient:
    """Returns scripted responses per call; records call payloads."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.calls: list[list[dict]] = []

    def put_records(self, records):
        self.calls.append(list(records))
        resp = self.responses.pop(0)
        if isinstance(resp, Exception):
            raise resp
        return resp


def test_all_success_acks_everything_no_retry():
    records = [rec(i) for i in range(3)]
    client = ScriptedClient(
        [{"FailedRecordCount": 0, "Records": [ok_entry()] * 3}]
    )
    counters = publish_records(client, records, cfg(), sleep=lambda s: None)
    assert counters.acked == 3
    assert counters.retried == 0
    assert len(client.calls) == 1


def test_nil_response_record_skipped_not_retried():
    # reference issues/27: response.Records[i] == nil -> warn + skip
    records = [rec(0), rec(1)]
    client = ScriptedClient(
        [{"FailedRecordCount": 1, "Records": [None, ok_entry()]}]
    )
    counters = publish_records(client, records, cfg(), sleep=lambda s: None)
    assert counters.retried == 0
    assert len(client.calls) == 1


def test_nil_error_code_skipped_not_retried():
    records = [rec(0), rec(1)]
    client = ScriptedClient(
        [{"FailedRecordCount": 1, "Records": [{"ErrorCode": None}, ok_entry()]}]
    )
    counters = publish_records(client, records, cfg(), sleep=lambda s: None)
    assert counters.retried == 0


def test_simulated_error_retries_exactly_that_record():
    records = [rec(0), rec(1), rec(2)]
    client = ScriptedClient(
        [
            {
                "FailedRecordCount": 1,
                "Records": [ok_entry(), {"ErrorCode": "simulated_error"}, ok_entry()],
            },
            {"FailedRecordCount": 0, "Records": [ok_entry()]},
        ]
    )
    sleeps: list[float] = []
    counters = publish_records(client, records, cfg(), sleep=sleeps.append)
    assert counters.acked == 3
    assert counters.retried == 1
    assert client.calls[1] == [rec(1)]  # exactly the failed record
    assert sleeps == [1.0]  # backoff_init


def test_whole_request_failure_retries_all():
    # streams/client.go:100-102: request error w/o per-record info
    records = [rec(0), rec(1)]
    client = ScriptedClient(
        [
            RuntimeError("network down"),
            {"FailedRecordCount": 0, "Records": [ok_entry()] * 2},
        ]
    )
    counters = publish_records(client, records, cfg(), sleep=lambda s: None)
    assert counters.acked == 2
    assert client.calls[1] == records


def test_retries_exhausted_raises_for_task_retry():
    records = [rec(0)]
    client = ScriptedClient([RuntimeError("down")] * 10)
    with pytest.raises(DeliveryError):
        publish_records(client, records, cfg(max_retries=3), sleep=lambda s: None)
    assert len(client.calls) == 4  # initial + 3 retries


def test_backoff_is_exponential_and_capped():
    records = [rec(0)]
    client = ScriptedClient(
        [RuntimeError("down")] * 3
        + [{"FailedRecordCount": 0, "Records": [ok_entry()]}]
    )
    sleeps: list[float] = []
    publish_records(
        client,
        records,
        cfg(max_retries=5, backoff_init_s=1.0, backoff_max_s=2.5),
        sleep=sleeps.append,
    )
    assert sleeps == [1.0, 2.0, 2.5]  # 1, 2, capped(4 -> 2.5)


def test_chunking_respects_batch_size():
    records = [rec(i) for i in range(7)]
    client = ScriptedClient(
        [{"FailedRecordCount": 0, "Records": [ok_entry()] * 3}] * 3
    )
    counters = publish_records(client, records, cfg(batch_size=3), sleep=lambda s: None)
    assert [len(c) for c in client.calls] == [3, 3, 1]
    assert counters.acked == 7
    assert counters.attempts == 3


def test_firehose_response_shape_supported():
    records = [rec(0), rec(1)]
    client = ScriptedClient(
        [
            {
                "FailedPutCount": 1,
                "RequestResponses": [{"ErrorCode": "boom"}, ok_entry()],
            },
            {"FailedPutCount": 0, "RequestResponses": [ok_entry()]},
        ]
    )
    counters = publish_records(
        client, records, cfg(mode="firehose", partition_key=None), sleep=lambda s: None
    )
    assert counters.acked == 2
    assert client.calls[1] == [rec(0)]


def test_collect_failed_tolerates_short_response():
    failed = collect_failed({"FailedRecordCount": 1, "Records": [{"ErrorCode": "x"}]},
                            [rec(0), rec(1)])
    assert failed == [rec(0)]


def test_counters_accumulate_across_batches():
    counters = DeliveryCounters()
    client = ScriptedClient(
        [{"FailedRecordCount": 0, "Records": [ok_entry()]}] * 2
    )
    publish_records(client, [rec(0)], cfg(), counters, sleep=lambda s: None)
    publish_records(client, [rec(1)], cfg(), counters, sleep=lambda s: None)
    assert counters.new_batch == 2 and counters.acked == 2


# --- config validation (streams/config_test.go:5-51, one rule per test) ---


def test_config_missing_region_rejected():
    with pytest.raises(ValueError, match="region"):
        cfg(region="").validate()


def test_config_missing_stream_rejected():
    with pytest.raises(ValueError, match="stream_name"):
        cfg(stream_name="").validate()


@pytest.mark.parametrize("size", [0, 501])
def test_config_batch_size_bounds_rejected(size):
    with pytest.raises(ValueError, match="batch_size"):
        cfg(batch_size=size).validate()


def test_config_batch_size_50_ok():
    cfg(batch_size=50).validate()


def test_config_unknown_provider_rejected():
    # reference: only "xid" is a legal provider (streams/config.go:53-57)
    with pytest.raises(ValueError, match="provider"):
        cfg(partition_key_provider="uuid").validate()


def test_config_field_provider_requires_key():
    with pytest.raises(ValueError, match="partition_key"):
        SinkConfig(region="r", stream_name="s").validate()


def test_idempotent_epoch_guard_skips_redelivered_batch(tmp_path):
    """Simulated crash-redelivery: Spark re-invokes foreachBatch with
    the SAME epoch_id after a restart that lost the checkpoint commit.
    With idempotent_dir set, the second delivery is a no-op; a new
    epoch still writes. (Spark session needed: foreachPartition.)"""
    import json
    from pathlib import Path

    from awsbeats_spark.session import get_spark
    from awsbeats_spark.sinks.kinesis import foreach_batch_writer
    from awsbeats_spark.sinks.local import FileDumpClient

    spark = get_spark("awsbeats-tests")
    out = tmp_path / "out"
    out.mkdir()
    writer = foreach_batch_writer(
        cfg(batch_size=2),
        client_factory=lambda c: FileDumpClient(str(out)),
        idempotent_dir=str(tmp_path / "epochs"),
    )
    df = spark.createDataFrame(
        [(f"e{i}\n", str(i)) for i in range(5)], "data string, partition_key string"
    ).coalesce(1)

    def n_records():
        return sum(
            len(json.loads(p.read_text())) for p in Path(out).glob("call-*.json")
        )

    writer(df, 7)
    assert n_records() == 5
    writer(df, 7)  # redelivery of the same epoch: must be a no-op
    assert n_records() == 5
    writer(df, 8)  # next epoch still delivers
    assert n_records() == 10


class HangingClient:
    """First call blocks until released; later calls succeed."""

    def __init__(self, release):
        self.release = release
        self.calls = 0

    def put_records(self, records):
        self.calls += 1
        if self.calls == 1:
            self.release.wait(timeout=30)
        return {"FailedRecordCount": 0, "Records": [ok_entry()] * len(records)}


def test_timeout_aborts_hung_attempt_and_retries():
    # streams/config.go:31 — a put still hung at timeout_s fails the
    # attempt; the chunk is retried and counted.
    import threading

    release = threading.Event()
    client = HangingClient(release)
    records = [rec(0)]
    counters = publish_records(
        client, records, cfg(timeout_s=0.05), sleep=lambda s: None
    )
    release.set()
    assert counters.timeouts == 1
    assert counters.retried == 1
    assert counters.acked == 1
    assert client.calls == 2


def test_timeout_exhaustion_raises_delivery_error():
    import threading

    class AlwaysHanging:
        def __init__(self):
            self.release = threading.Event()

        def put_records(self, records):
            self.release.wait(timeout=30)
            return {"FailedRecordCount": 0, "Records": []}

    client = AlwaysHanging()
    with pytest.raises(DeliveryError):
        publish_records(
            client,
            [rec(0)],
            cfg(timeout_s=0.02, max_retries=1),
            sleep=lambda s: None,
        )
    client.release.set()


class _FakeAwsClient:
    """Stub for boto3.client(...): records constructor + request kwargs."""

    def __init__(self, service, **kwargs):
        self.service = service
        self.kwargs = kwargs
        self.requests = []

    def put_records(self, **req):
        self.requests.append(req)
        return {"FailedRecordCount": 0, "Records": [{"ErrorCode": ""}] * len(req["Records"])}

    def put_record_batch(self, **req):
        self.requests.append(req)
        return {"FailedPutCount": 1, "RequestResponses": [{"ErrorCode": "X"}]}


@pytest.fixture()
def fake_boto3(monkeypatch):
    import sys
    import types

    created = []

    boto3 = types.ModuleType("boto3")

    def client(service, **kwargs):
        c = _FakeAwsClient(service, **kwargs)
        created.append(c)
        return c

    boto3.client = client
    botocore = types.ModuleType("botocore")
    botocore_config = types.ModuleType("botocore.config")

    class Config:
        def __init__(self, **kw):
            self.kw = kw

    botocore_config.Config = Config
    botocore.config = botocore_config
    monkeypatch.setitem(sys.modules, "boto3", boto3)
    monkeypatch.setitem(sys.modules, "botocore", botocore)
    monkeypatch.setitem(sys.modules, "botocore.config", botocore_config)
    return created


def test_boto3_streams_adapter_request_shape(fake_boto3):
    # the production adapter maps records to the PutRecords wire shape
    # (streams/client.go:155-165) and carries timeout_s into the
    # transport config with SDK retries off (publish_records owns retry)
    from awsbeats_spark.sinks.kinesis import make_boto3_client

    c = cfg(partition_key_provider="xid", timeout_s=45.0)
    client = make_boto3_client(c)
    resp = client.put_records([{"data": "d1\n", "partition_key": "pk1"}])
    aws = fake_boto3[0]
    assert aws.service == "kinesis"
    assert aws.kwargs["region_name"] == "us-east-1"
    assert aws.kwargs["config"].kw == {
        "connect_timeout": 45.0,
        "read_timeout": 45.0,
        "retries": {"max_attempts": 0},
    }
    assert aws.requests[0]["StreamName"] == "test"
    assert aws.requests[0]["Records"] == [{"Data": "d1\n", "PartitionKey": "pk1"}]
    assert collect_failed(resp, [rec(0)]) == []


def test_boto3_firehose_adapter_normalizes_response(fake_boto3):
    # firehose PutRecordBatch responses (FailedPutCount/RequestResponses)
    # are normalized to the streams shape so collect_failed is shared
    # (firehose/client.go:138-158)
    from awsbeats_spark.sinks.kinesis import make_boto3_client

    client = make_boto3_client(cfg(mode="firehose", partition_key=None))
    resp = client.put_records([{"data": "d1\n", "partition_key": "pk1"}])
    aws = fake_boto3[0]
    assert aws.service == "firehose"
    assert aws.requests[0]["DeliveryStreamName"] == "test"
    assert aws.requests[0]["Records"] == [{"Data": "d1\n"}]
    assert resp["FailedRecordCount"] == 1
    failed = collect_failed(resp, [rec(0)])
    assert len(failed) == 1


def test_wrapped_transport_timeout_counted():
    # A timeout surfaced as a non-timeout-named wrapper (botocore wraps
    # urllib3 timeouts in ConnectionError subclasses) must still count:
    # _is_transport_timeout walks the cause chain.
    from awsbeats_spark.sinks.kinesis import _is_transport_timeout

    class EndpointConnectionError(Exception):
        pass

    class ReadTimeoutError(Exception):
        pass

    wrapper = EndpointConnectionError("could not connect")
    wrapper.__cause__ = ReadTimeoutError("read timed out")
    assert _is_transport_timeout(wrapper)
    assert _is_transport_timeout(ReadTimeoutError("direct"))
    assert not _is_transport_timeout(ValueError("boom"))

    class FlakyClient:
        def __init__(self):
            self.calls = 0

        def put_records(self, records):
            self.calls += 1
            if self.calls == 1:
                raise wrapper
            return {"FailedRecordCount": 0, "Records": [ok_entry()] * len(records)}

    client = FlakyClient()
    counters = publish_records(client, [rec(0)], cfg(), sleep=lambda s: None)
    assert counters.timeouts == 1
    assert counters.acked == 1


def test_arrow_batch_writer_delivers_and_retries(spark, tmp_path):
    """The Arrow-batched batch-delivery path (mapInArrow) must hand every
    record to the same publish_records core — chunked to batch_size, with
    a per-record failure retried — and report n_published per partition."""
    from pyspark.sql import functions as F

    from awsbeats_spark.sinks.kinesis import arrow_batch_writer
    from awsbeats_spark.sinks.local import FileDumpClient

    out_dir = str(tmp_path / "arrow_sink")
    (tmp_path / "arrow_sink").mkdir()
    c = cfg(partition_key=None, partition_key_provider="xid", batch_size=5)
    df = spark.createDataFrame(
        [(f"payload-{i}\n", str(i)) for i in range(23)],
        "data string, partition_key string",
    ).repartition(3)
    deliver = arrow_batch_writer(c, client_factory=lambda _c: FileDumpClient(out_dir))
    total = (
        df.mapInArrow(deliver, "n_published long")
        .agg(F.sum("n_published").alias("n"))
        .collect()[0]["n"]
    )
    assert total == 23
    import json
    import pathlib

    delivered = []
    for p in sorted(pathlib.Path(out_dir).glob("*.json")):
        delivered.extend(json.loads(p.read_text()))
    assert sorted(r["data"] for r in delivered) == sorted(
        f"payload-{i}\n" for i in range(23)
    )
    # chunking respected: no file carries more than batch_size records
    for p in pathlib.Path(out_dir).glob("*.json"):
        assert len(json.loads(p.read_text())) <= 5


def test_arrow_batch_writer_retry_parity_with_foreach_core():
    """Driving the Arrow writer's deliver fn directly (no Spark) with a
    scripted flaky client shows it retries exactly like publish_records —
    both writers share the core, so a partial failure must not dup-deliver
    the acked records."""
    import pyarrow as pa

    from awsbeats_spark.sinks.kinesis import arrow_batch_writer

    flaky = ScriptedClient(
        [
            {
                "FailedRecordCount": 1,
                "Records": [ok_entry(), {"ErrorCode": "Throttling"}, ok_entry()],
            },
            {"FailedRecordCount": 0, "Records": [ok_entry()]},
        ]
    )
    seen = []
    deliver = arrow_batch_writer(
        cfg(backoff_init_s=0, backoff_max_s=0),
        client_factory=lambda _c: flaky,
        on_counters=seen.append,
    )
    rb = pa.RecordBatch.from_pydict(
        {"data": ["a\n", "b\n", "c\n"], "partition_key": ["1", "2", "3"]}
    )
    [out] = list(deliver(iter([rb])))
    assert out.to_pydict() == {"n_published": [3]}
    assert [len(call) for call in flaky.calls] == [3, 1]
    assert flaky.calls[1][0]["data"] == "b\n"
    assert seen[0].acked == 3 and seen[0].retried == 1


def test_arrow_manifest_writer_rows_match_dumped_payloads(spark, tmp_path):
    """output='manifest' (round 12): the delivery tasks return one row
    per DELIVERED record — (partition_key, byte length at ack time) —
    replacing the sink operator's multiLine JSON read-back. The manifest
    must agree exactly with what the client persisted (the old read-back
    computed length(data) from the dumped files), and delivery itself
    must still happen."""
    import json
    import pathlib

    from awsbeats_spark.sinks.kinesis import arrow_batch_writer
    from awsbeats_spark.sinks.local import FileDumpClient

    out_dir = str(tmp_path / "manifest_sink")
    (tmp_path / "manifest_sink").mkdir()
    c = cfg(partition_key=None, partition_key_provider="xid", batch_size=5)
    rows = [(f"payload-{i}-{'x' * (i % 7)}\n", str(i)) for i in range(23)]
    df = spark.createDataFrame(rows, "data string, partition_key string").repartition(3)
    deliver = arrow_batch_writer(
        c, client_factory=lambda _c: FileDumpClient(out_dir), output="manifest"
    )
    manifest = df.mapInArrow(deliver, "partition_key string, data_len int").collect()
    # one manifest row per input record, lengths = the data actually sent
    assert sorted((r["partition_key"], r["data_len"]) for r in manifest) == sorted(
        (k, len(d)) for d, k in rows
    )
    # delivery really happened: the dumped files carry the same records,
    # and re-deriving the manifest from them (the old read-back) agrees
    dumped = []
    for p in pathlib.Path(out_dir).glob("*.json"):
        dumped.extend(json.loads(p.read_text()))
    assert sorted((r["partition_key"], len(r["data"])) for r in dumped) == sorted(
        (r["partition_key"], r["data_len"]) for r in manifest
    )


def test_arrow_writer_rejects_unknown_output_mode():
    from awsbeats_spark.sinks.kinesis import arrow_batch_writer

    try:
        arrow_batch_writer(cfg(), output="bogus")
    except ValueError as exc:
        assert "bogus" in str(exc)
    else:  # pragma: no cover
        raise AssertionError("expected ValueError for invalid output mode")
