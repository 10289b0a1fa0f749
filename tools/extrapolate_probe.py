"""10x extrapolation probe: time operators at sf0.1 vs the /tmp/sf1
replica (tools/build_sf1.py) and print observed alpha(0.1 -> 1).

This is the harness behind EXTRAPOLATION.md — run it after any
plan-affecting change to confirm the growth exponents still hold an
order of magnitude past the bench scale factor.

Usage:
    python tools/build_sf1.py                # once, writes /tmp/sf1
    python tools/extrapolate_probe.py name [name ...]
    python tools/extrapolate_probe.py --headline
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from awsbeats_spark.registry import load_all
from awsbeats_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
BIG = "/tmp/sf1"


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    if not os.path.isdir(BIG):
        print(f"{BIG} missing — run: python tools/build_sf1.py", file=sys.stderr)
        return 1
    specs = load_all()
    if args == ["--headline"]:
        from bench import HEADLINE

        names = HEADLINE
    else:
        names = args
    spark = get_spark("extrapolate-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in names:
        try:
            ts = {}
            for sf_dir in (BASE, BIG):
                # warm once (codegen/JIT), then time once; callers after
                # a big change should eyeball >1.1 alphas, not decimals
                specs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                t0 = time.perf_counter()
                specs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                ts[sf_dir] = time.perf_counter() - t0
            alpha = math.log(ts[BIG] / ts[BASE]) / math.log(10)
            flag = "  <-- CHECK" if alpha > 1.1 else ""
            print(
                f"{name:32s} sf0.1 {ts[BASE]:7.2f}  sf1 {ts[BIG]:8.2f}  "
                f"alpha {alpha:5.2f}{flag}"
            )
            if alpha > 1.1:
                rc = 1
        except Exception as exc:  # noqa: BLE001
            print(f"{name:32s} ERR {str(exc)[:100]}")
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
