"""Run one registered query under a BARE default SparkSession (1 GB
driver heap, default shuffle partitions, no engine tuning) — the guide
§5 memory-sizing probe. Usage:

    python tools/bare_probe.py <key> [sf_dir] [master]

Prints wall time or the failure signature.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from awsbeats_spark.registry import QUERIES, load_all


def main() -> None:
    key = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    master = sys.argv[3] if len(sys.argv) > 3 else "local[32]"
    load_all()
    spark = (
        SparkSession.builder.master(master)
        .appName("bare-probe")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    q = QUERIES[key]
    t0 = time.monotonic()
    try:
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print({"key": key, "sf_dir": sf_dir, "ok": True, "sec": round(time.monotonic() - t0, 2)})
    except Exception as exc:  # noqa: BLE001 - probe reports the signature
        msg = str(exc)
        print({"key": key, "sf_dir": sf_dir, "ok": False, "sec": round(time.monotonic() - t0, 2),
               "error": type(exc).__name__, "head": msg[:2000]})
        sys.exit(1)


if __name__ == "__main__":
    main()
