"""Split each headline query's time into driver-side build (fn() call)
vs execute (noop write): the round-11 §4/§9 decomposition, kept as a
tool so the optimization evidence is reproducible.

Usage: python tools/split_probe.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awsbeats_spark.registry import load_all
from awsbeats_spark.session import get_spark
from bench import HEADLINE


def main() -> None:
    args = sys.argv[1:]
    # A directory-shaped first arg (relative or absolute) is the sf dir;
    # anything else is a query name. Default honors SPARK_GRAFT_SF_DIR
    # like bench.py so env-driven runs probe the same data.
    default_sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = args.pop(0) if args and os.path.isdir(args[0]) else default_sf
    names = args or HEADLINE
    spark = get_spark("split-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    unknown = [n for n in names if n not in specs]
    if unknown:
        sys.exit(f"unknown query name(s): {unknown} (is the first arg a missing dir?)")
    # warmup all
    for name in names:
        specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"{'query':36s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    tot_b = tot_e = 0.0
    for name in names:
        builds, execs = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        b, e = sorted(builds)[1], sorted(execs)[1]
        tot_b += b
        tot_e += e
        print(f"{name:36s} {b:7.3f} {e:7.3f} {b + e:7.3f}")
    print(f"{'TOTAL (median sums)':36s} {tot_b:7.3f} {tot_e:7.3f} {tot_b + tot_e:7.3f}")


if __name__ == "__main__":
    main()
