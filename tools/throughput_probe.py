"""Delivery-path throughput probe: measures the engine-side cost of the
reference's actual job — project events to (data, partition_key)
records, chunk to <=500-record bulk calls, run the partial-failure
retry protocol — against the filesystem stand-in client, end to end.

This backs the BASELINE.md claim that the engine-side delivery cost is
negligible next to the AWS API limits bounding the real system (the
reference's ceiling is 500 records/RPC + network RTT; locally the RPC
is a file append).

Usage: python tools/throughput_probe.py [sf_dir]   (default sf0.1)
Prints one JSON line: {"records": N, "seconds": s, "rec_per_s": r,
"mode": "..."} per measured mode.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awsbeats_spark.catalog import tables  # noqa: E402
from awsbeats_spark.session import get_spark  # noqa: E402
from awsbeats_spark.sinks.kinesis import SinkConfig, foreach_batch_writer  # noqa: E402
from awsbeats_spark.sinks.local import FileDumpClient  # noqa: E402
from awsbeats_spark.streaming.pipeline import project_records  # noqa: E402


def measure(mode: str, sf_dir: str) -> dict:
    spark = get_spark("throughput-probe")
    t = tables(spark, sf_dir)
    cfg = SinkConfig(
        region="us-east-1",
        stream_name="events",
        mode="streams" if mode != "firehose" else "firehose",
        partition_key_provider="xid" if mode != "firehose" else None,
        batch_size=500,
    )
    records = project_records(t.events, cfg)
    n = records.count()
    out_dir = tempfile.mkdtemp(prefix=f"tp_{mode}_")
    writer = foreach_batch_writer(
        cfg, client_factory=lambda _c: FileDumpClient(out_dir)
    )
    t0 = time.perf_counter()
    writer(records, 0)
    dt = time.perf_counter() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "mode": mode,
        "records": n,
        "seconds": round(dt, 3),
        "rec_per_s": int(n / dt),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # warm once (JIT + Arrow pool) then measure
    measure("streams", sf_dir)
    for mode in ("streams", "firehose"):
        print(json.dumps(measure(mode, sf_dir)))


if __name__ == "__main__":
    main()
