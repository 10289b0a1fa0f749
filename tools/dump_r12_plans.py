"""Dump per-query .explain("formatted") files for the round-12
optimization evidence: plans/r12/<query>_{before,after}.txt.

Usage: python tools/dump_r11_plans.py before|after [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from awsbeats_spark.plans.inspect import formatted_plan, plan_counts  # noqa: E402
from awsbeats_spark.registry import load_all  # noqa: E402
from awsbeats_spark.session import get_spark  # noqa: E402
from bench import HEADLINE  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or HEADLINE
    sf_dir = "/root/testdata/sf0.1"
    out_dir = "/root/repo/plans/r12"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-r11-plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        counts = plan_counts(df)
        props = ", ".join(f"{k}={v}" for k, v in counts.items() if v)
        with open(f"{out_dir}/{name}_{tag}.txt", "w") as fh:
            fh.write(f"# {name} ({tag}) — {props}\n\n")
            fh.write(formatted_plan(df))
            fh.write("\n")
        print(f"wrote {name}_{tag}.txt  [{props}]")


if __name__ == "__main__":
    main()
