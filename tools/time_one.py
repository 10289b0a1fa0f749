"""Time a single registered query at a given SF dir: median of N runs
after one warmup. Usage: python tools/time_one.py <key> [n_runs] [sf_dir]."""

from __future__ import annotations

import os
import sys
import statistics
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awsbeats_spark.registry import QUERIES, load_all
from awsbeats_spark.session import get_spark


def main() -> None:
    key = sys.argv[1]
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    load_all()
    spark = get_spark()
    q = QUERIES[key]
    # warmup
    q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(n_runs):
        t0 = time.monotonic()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.monotonic() - t0, 3))
    print({"key": key, "runs": times, "median": statistics.median(times)})


if __name__ == "__main__":
    main()
