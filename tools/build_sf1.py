"""Build a synthetic 10x replica of sf0.1 at /tmp/sf1 for scale
EXTRAPOLATION runs only (never for correctness — the driver's tables
stay the only query inputs; TESTDATA.md is untouched).

Replication: each fact table is unioned 10x with entity keys shifted
per replica so key cardinalities grow with the data (orders/lineitem
orderkeys, event ids, doc/vec ids). Dimension tables are left at their
original size — the TPC-H-ish dims stay broadcastable by design, which
is exactly the 100-TB assumption the operators document. Document text
gets a per-replica suffix token so exact/near-dup structure is
preserved (each original dup-group appears once per replica) instead of
every doc becoming a 10-way cross-replica duplicate.

Usage: python tools/build_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
N_REP = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    spark = get_spark("build-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    t = tables(spark, SRC)
    rep = F.explode(F.sequence(F.lit(0), F.lit(N_REP - 1))).alias("rep")

    def dup(df, **shifts):
        d = df.select("*", rep)
        for col, stride in shifts.items():
            d = d.withColumn(col, F.col(col) + F.col("rep") * F.lit(stride))
        return d.drop("rep")

    okey = 10_000_000  # > max o_orderkey at sf0.1
    writes = {
        # dims: unchanged (broadcastable at any SF by design)
        "region": t.region,
        "nation": t.nation,
        "customer": t.customer,
        "supplier": t.supplier,
        "part": t.part,
        "orders": dup(t.orders, o_orderkey=okey),
        "lineitem": dup(t.lineitem, l_orderkey=okey),
        "events": dup(t.events, event_id=100_000_000),
        "embeddings": dup(t.embeddings, vec_id=1_000_000),
        "documents": dup(t.documents, doc_id=1_000_000).withColumn(
            "text",
            F.concat(
                "text",
                F.lit(" rtag"),
                ((F.col("doc_id") / 1_000_000).cast("long")).cast("string"),
            ),
        ),
    }
    os.makedirs(out, exist_ok=True)
    for name, df in writes.items():
        df.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print("wrote", name)


if __name__ == "__main__":
    main()
