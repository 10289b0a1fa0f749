"""Print the FINAL adaptive plan (after execution) of one query plus its
wall time — shows which exchanges AQE actually reused at runtime, which
the static PLANS.md dump cannot (it prints isFinalPlan=false).

Usage: python tools/final_plan.py <name> [sf_dir] [--time-only]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from awsbeats_spark.registry import load_all  # noqa: E402
from awsbeats_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    time_only = "--time-only" in sys.argv
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("final-plan")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    # warmup at sf0.001 like bench.py
    specs[name].fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    df = specs[name].fn(spark, sf_dir)
    t0 = time.perf_counter()
    n = len(df.collect())
    dt = time.perf_counter() - t0
    print(f"### {name}: {dt:.3f}s collect ({n} rows, {sf_dir})")
    if not time_only:
        print(df._jdf.queryExecution().executedPlan().toString())


if __name__ == "__main__":
    main()
