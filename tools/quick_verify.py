"""Fast single-session oracle check for a handful of keys (round-11
optimization inner loop). Same comparison discipline as verify_local
(dtype-kind gate + exact floats), but reuses one small local session so
a rewrite can be checked in seconds at sf0.001/sf0.01 before the full
bare sweep re-runs.

Usage: python tools/quick_verify.py [sf_dir] name [name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

from tools.verify_local import compare, duck_con  # noqa: E402
from awsbeats_spark.registry import load_all  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.001"
    spark = SparkSession.builder.master("local[4]").appName("quick-verify").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    specs = load_all()
    failures = 0
    for name in args:
        spec = specs[name]
        spark_pdf = spec.fn(spark, sf_dir).toPandas()
        if spec.oracle is None:
            print(f"SKIP  {name} rows-only ({len(spark_pdf)} rows)")
            continue
        oracle_pdf = con.sql(spec.oracle).df()
        status, msg = compare(name, spark_pdf, oracle_pdf)
        print(f"{status}  {name:36s} {msg}")
        if status == "FAIL":
            failures += 1
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
