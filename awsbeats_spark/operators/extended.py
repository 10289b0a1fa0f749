"""Extended operator coverage: streaming scan + sink as first-class
queries, the Pandas-UDF surface, SQL-API operators (CTEs, grouping
sets, correlated subqueries, unpivot), and TPC-H-shaped composites.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query


@query(
    "scan_events_stream",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def scan_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table: a real readStream (file
    source standing in for Kinesis locally — SURVEY.md §2.C) drained
    synchronously with an availableNow trigger into a memory sink. The
    oracle checks the streamed rows equal the batch table: streaming
    and batch reads are the same DataFrame algebra."""
    import os
    import tempfile

    t = tables(spark, sf_dir)  # pins TZ + nanos conf + ships package
    schema = t.events.schema  # post-normalization schema (ts: timestamp)
    # the file streaming source wants a DIRECTORY to watch; expose the
    # parquet data through a temp dir of symlinks. A Spark-written
    # replica stores events.parquet as a DIRECTORY of part files — the
    # file source does not recurse through a symlinked subdirectory, so
    # link each part file individually in that case.
    watch_dir = tempfile.mkdtemp(prefix="events_stream_")
    src = f"{sf_dir}/events.parquet"
    if os.path.isdir(src):
        for i, part in enumerate(sorted(os.listdir(src))):
            if part.endswith(".parquet"):
                os.symlink(
                    os.path.join(src, part),
                    os.path.join(watch_dir, f"part-{i:05d}.parquet"),
                )
    else:
        os.symlink(src, os.path.join(watch_dir, "events.parquet"))
    # The stream read must stay consistent with the catalog's batch read
    # for EVERY physical ts flavor (legacy nanos-as-long, naive micros ->
    # NTZ, tz-adjusted micros -> TimestampType). Rather than re-deriving
    # the flavor from the footer, take the RAW batch schema Spark infers
    # for this file under the current session confs (tables() above
    # already set the legacy-nanos flag when needed) and apply the same
    # normalization _load does.
    from pyspark.sql.types import LongType, TimestampType

    raw_ts = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    raw_schema = (
        f"event_id long, ts {raw_ts.simpleString()}, user_id long,"
        " event_type string, value double, props string"
    )
    stream = spark.readStream.schema(raw_schema).parquet(watch_dir)
    if isinstance(raw_ts, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif not isinstance(raw_ts, TimestampType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    stream = stream.select("event_id", "user_id", "event_type", "value")
    name = f"scan_stream_{uuid.uuid4().hex[:10]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert schema is not None
    return spark.table(name)


@query("sink_kinesis_batched_retry", oracle=None, tags=("rows-only",))
def sink_kinesis_batched_retry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delivery sink as a queries() operator: project the events
    table to records, push them through the chunked/retrying writer
    against the filesystem stand-in client, and return what ARRIVED —
    rows-only check (the driver asserts row count stability; the byte
    contract is oracle-checked via project_record and pytest).

    Delivery rides the Arrow-batched batch writer (same
    publish_records chunk/retry/backoff core as the streaming
    foreachPartition writer, rows crossing to Python as Arrow batches
    instead of pickled Rows — measured 0.86 -> 0.70 s at sf0.1; the
    wire/e2e tests keep exercising the streaming writer)."""
    from awsbeats_spark.sinks.kinesis import SinkConfig, arrow_batch_writer
    from awsbeats_spark.sinks.local import FileDumpClient
    from awsbeats_spark.streaming.pipeline import project_records

    t = tables(spark, sf_dir)
    # The stand-in simulates a NETWORK service (localstack analog), so
    # its dump dir should not bill this host's slow ext4 metadata ops
    # (~1.4 ms/small file, measured round 11) to the operator: deliver
    # to RAM-backed /dev/shm when present (SPARK_GRAFT_SINK_DUMP_DIR
    # overrides — used round 12 to A/B the engine win with the dump
    # pinned to disk). The Spark-side work — projection, Arrow crossing,
    # chunk/retry/backoff — is unchanged.
    shm = os.environ.get(
        "SPARK_GRAFT_SINK_DUMP_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    out_dir = tempfile.mkdtemp(prefix="kinesis_sink_", dir=shm)
    # The dump dir is write-only now (the manifest path never re-reads
    # it), so reclaim it at interpreter exit — repeated bench/driver
    # invocations otherwise accumulate ~21 MB of RAM-backed files per
    # run (measured 2.9 GB of litter over one working session).
    import atexit
    import shutil

    atexit.register(shutil.rmtree, out_dir, True)
    from awsbeats_spark.catalog import scan_fanout
    cfg = SinkConfig(
        region="us-east-1",
        stream_name="events",
        partition_key_provider="xid",
        batch_size=500,
    )
    # scan_fanout (round 11): the bench-scale events table is ONE small
    # parquet file, so the to_json projection, the Arrow crossing AND
    # the whole Python chunk/retry/write loop serialized on a single
    # core. Delivery is per-record and order-free (rows-only contract);
    # at data scale the scan splits on its own and this is a no-op.
    records = project_records(scan_fanout(t.events, sf_dir, "events"), cfg)
    # Round 12 (VERDICT r11 item 5): the delivery tasks now RETURN the
    # per-record manifest (partition_key, byte length at ack time), so
    # "what arrived" no longer needs the driver collect() + a multiLine
    # JSON re-parse of every dumped file (~0.25 s of the 0.95 s sink).
    # Delivery itself is unchanged — the client still persists every
    # chunk, publish_records still chunks/retries/backs off, and the
    # action that materializes this DataFrame forces the delivery.
    deliver = arrow_batch_writer(
        cfg, client_factory=lambda _c: FileDumpClient(out_dir), output="manifest"
    )
    return records.mapInArrow(deliver, "partition_key string, data_len int")


def _zscore_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    import math

    m = pdf["value"].mean()
    s = pdf["value"].std(ddof=1)
    z = (pdf["value"] - m) / s
    out = pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "zscore": [math.floor(v * 10000 + 0.5) / 10000 for v in z],
        }
    )
    return out


@query(
    "udf_pandas_zscore",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4) AS zscore
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def udf_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-map Pandas UDF surface (applyInPandas): per-group
    z-score computed in Arrow-batched pandas, checked against the pure
    SQL window formulation. This is the escape hatch pattern for
    operators Spark can't express (SURVEY.md §2.C UDF row) — used here
    on a computation that CAN be expressed so the oracle can check the
    batch plumbing itself."""
    t = tables(spark, sf_dir)
    return (
        t.events.select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_zscore_fn, schema="event_id long, event_type string, zscore double")
    )


def _spread_fn(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "value_spread": [float(pdf["value"].max() - pdf["value"].min())],
            "n": [len(pdf)],
        }
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT event_type,
           max(value) - min(value) AS value_spread,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate UDF surface: one output row per group from
    pandas (exact min/max arithmetic — engine-independent)."""
    t = tables(spark, sf_dir)
    return (
        t.events.select("event_type", "value")
        .groupBy("event_type")
        .applyInPandas(_spread_fn, schema="event_type string, value_spread double, n long")
    )


@query(
    "sql_cte_query",
    oracle="""
    WITH seg_rev AS (
        SELECT c_mktsegment AS segment,
               round(sum(o_totalprice), 2) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    )
    SELECT segment, revenue, n_orders
    FROM seg_rev
    WHERE revenue > 0
    """,
)
def sql_cte_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL API surface: same Catalyst plan as the DataFrame form
    (SURVEY.md §2.C scalar/SQL rows) — revenue per market segment
    through a CTE."""
    t = tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH seg_rev AS (
            SELECT c_mktsegment AS segment,
                   floor(sum(o_totalprice) * 100.0D + 0.5D) / 100.0D AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        )
        SELECT segment, revenue, n_orders
        FROM seg_rev
        WHERE revenue > 0
        """
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(o_orderstatus, '(all)')   AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets (by status / by priority / grand total) in
    one pass — Spark expands to a single Expand + aggregate, not three
    scans."""
    t = tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '(all)')   AS status,
               coalesce(o_orderpriority, '(all)') AS priority,
               floor(sum(o_totalprice) * 100.0D + 0.5D) / 100.0D AS revenue,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "subquery_correlated",
    oracle="""
    SELECT c_custkey, c_name,
           (SELECT round(max(o_totalprice), 2) FROM orders
             WHERE o_custkey = c_custkey) AS max_order
    FROM customer
    WHERE c_acctbal > 5000
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst de-correlates it into a
    left outer aggregate join (no per-row re-execution, unlike the
    naive nested-loop reading of the SQL)."""
    t = tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    t.customer.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name,
               (SELECT floor(max(o_totalprice) * 100.0D + 0.5D) / 100.0D FROM orders
                 WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        WHERE c_acctbal > 5000
        """
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, s_acctbal AS metric_value FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) FROM supplier
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide -> long) via stack()."""
    t = tables(spark, sf_dir)
    return t.supplier.select(
        "s_suppkey",
        F.expr(
            "stack(2, 'acctbal', s_acctbal, 'nationkey', CAST(s_nationkey AS DOUBLE)) "
            "AS (metric, metric_value)"
        ),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'large'
                WHEN o_totalprice > 50000 THEN 'medium'
                ELSE 'small' END AS size_class,
           least(o_totalprice, 100000.0)    AS capped,
           greatest(o_totalprice, 1000.0)   AS floored,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "large")
        .when(F.col("o_totalprice") > 50000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.least("o_totalprice", F.lit(100000.0)).alias("capped"),
        F.greatest("o_totalprice", F.lit(1000.0)).alias("floored"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(CAST(sum(CAST(round(l_extendedprice * l_discount * 100, 0)
                               AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate
    reaches the parquet reader, making this I/O-bound at any scale."""
    t = tables(spark, sf_dir)
    li = t.lineitem
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # exact integer-cents revenue (sf1 hardening, round 11) — the
            # single full-table sum is the largest-magnitude 2-dp round
            # in the catalog
            rnd(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice") * F.col("l_discount") * 100
                        + 0.5
                    )
                ).cast("double")
                / 100.0,
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 45
    )
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelates to a left-semi join, then a
    tiny aggregate."""
    t = tables(spark, sf_dir)
    big_items = t.lineitem.filter(F.col("l_quantity") > 45)
    return (
        t.orders.join(big_items, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q_top_customers",
    oracle="""
    SELECT c_custkey, c_name,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100, 0) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue by customer, top 20 with
    deterministic tiebreak; the limit folds into TakeOrderedAndProject
    after the aggregate."""
    t = tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t.lineitem.filter(F.col("l_returnflag") == "R"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("c_custkey", "c_name")
        # exact integer-cents revenue (sf1 hardening, round 11) — also
        # the top-20 ordering key, so grid-exactness keeps the cut stable
        .agg(
            rnd(
                F.sum(
                    F.floor(
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * 100
                        + 0.5
                    )
                ).cast("double")
                / 100.0,
                2,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q_brand_supplier_stats",
    oracle="""
    SELECT p_brand,
           count(DISTINCT l_suppkey) AS n_suppliers,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_brand_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per brand over a broadcast
    dim join."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            rnd(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@query(
    "window_first_last",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order,
           nth_value(o_orderkey, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with explicit full-partition frames (the
    default frame would silently make last_value = current row)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


_PCT_QS = [0.5, 0.95, 0.99]
_PCT_DELTA = 0.02  # exact-bound rank slack, see docstring


def _pct_approx_oracle() -> str:
    lo_qs = ", ".join(str(max(q - _PCT_DELTA, 0.0)) for q in _PCT_QS)
    hi_qs = ", ".join(str(min(q + _PCT_DELTA, 1.0)) for q in _PCT_QS)
    quantiles = ", ".join(f"({i + 1}, {q})" for i, q in enumerate(_PCT_QS))
    return f"""
    WITH g AS (
        SELECT event_type, count(*) AS n,
               quantile_cont(value, [{lo_qs}]) AS lo_arr,
               quantile_cont(value, [{hi_qs}]) AS hi_arr
        FROM events GROUP BY event_type
    ),
    q AS (SELECT * FROM (VALUES {quantiles}) AS t(i, quantile))
    SELECT event_type, quantile, n,
           round(lo_arr[i], 4) AS exact_lo,
           round(hi_arr[i], 4) AS exact_hi,
           TRUE AS within_bounds
    FROM g CROSS JOIN q
    """


@query("agg_percentile_approx", oracle=_pct_approx_oracle())
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (mergeable KLL-style sketch,
    accuracy=10000): the scale path for the exact percentile in
    agg_stats — fixed-memory, partition-mergeable, no full value
    shuffle.

    Hash-checkable since round 5 (VERDICT r3/r4 carried ask): the raw
    sketch VALUE is engine-specific so it cannot be hash-compared, but
    the EXACT interpolated percentiles at quantile ± delta can — both
    engines compute them identically (percentile <-> quantile_cont, the
    agg_percentile_exact parity). The operator emits that exact
    sandwich (exact_lo, exact_hi) plus ``within_bounds`` = the sketch
    value landing inside it, computed Spark-side against the UNROUNDED
    bounds; the oracle asserts the sandwich values and
    within_bounds=TRUE. A sketch whose rank error drifts past
    delta=0.02 quantile units flips the boolean and the driver's hash
    check goes red. Honesty note: the sketch's own guarantee is far
    tighter (<= max(n/accuracy, 1) ranks ~= 1 rank at test scale; delta
    covers >= 3.7 ranks at the smallest SF's group sizes, the minimum
    interpolation-safe slack); tests/test_round5_ops.py pins the tight
    bound, the oracle pins gross correctness at any scale."""
    t = tables(spark, sf_dir)
    lo_exprs = [
        F.percentile("value", F.lit(max(q - _PCT_DELTA, 0.0)))
        for q in _PCT_QS
    ]
    hi_exprs = [
        F.percentile("value", F.lit(min(q + _PCT_DELTA, 1.0)))
        for q in _PCT_QS
    ]
    return (
        t.events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", _PCT_QS, 10000).alias("qv"),
            F.array(*lo_exprs).alias("lo_arr"),
            F.array(*hi_exprs).alias("hi_arr"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "event_type",
            "n",
            "lo_arr",
            "hi_arr",
            F.posexplode("qv").alias("pos", "value"),
        )
        .select(
            "event_type",
            F.element_at(
                F.array(*[F.lit(q) for q in _PCT_QS]), F.col("pos") + 1
            ).alias("quantile"),
            "n",
            rnd(F.element_at("lo_arr", F.col("pos") + 1), 4).alias(
                "exact_lo"
            ),
            rnd(F.element_at("hi_arr", F.col("pos") + 1), 4).alias(
                "exact_hi"
            ),
            (
                (F.col("value") >= F.element_at("lo_arr", F.col("pos") + 1))
                & (F.col("value") <= F.element_at("hi_arr", F.col("pos") + 1))
            ).alias("within_bounds"),
        )
    )


@query(
    "scan_python_datasource",
    oracle="""
    SELECT event_type,
           count(*) AS n_records,
           round(sum(value), 2) AS sum_value,
           count(DISTINCT user_id) AS n_keys
    FROM events
    GROUP BY event_type
    """,
)
def scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the events table through the `kinesis_replay` Python
    DataSource (sources/python_ds.py): archive events as NDJSON shard
    files keyed by user_id % 4 (the materialization is test plumbing),
    then read them back via `spark.read.format("kinesis_replay")` — one
    input partition per shard — parse the payload JSON, and aggregate.
    Matching the oracle on the raw table proves the source's
    shard/sequence/payload plumbing is lossless.

    Engine twin of the reference's consumer side: records land exactly
    as the delivery path serialized them (streams/client.go:127-154
    NDJSON contract) and are re-read with Kinesis GetRecords semantics
    (shard_id + per-shard sequence numbers).
    """
    import os
    import shutil

    t = tables(spark, sf_dir)  # pins TZ; ships package to executors
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    from awsbeats_spark.sources.python_ds import register

    register(spark)
    # Fixture write is DISTRIBUTED: executors write one text file per
    # shard (repartition("shard") puts each shard value in exactly one
    # task, so partitionBy yields one part file per shard dir); the
    # driver only does O(#shards) file renames — no row iteration
    # through the driver at any scale.
    from awsbeats_spark.functions.workdirs import work_dir

    staging = work_dir("kinesis_archive_stage", sf_dir)
    (
        t.events.select(
            (F.col("user_id") % 4).cast("string").alias("shard"),
            F.to_json(
                F.struct(
                    F.col("user_id").cast("string").alias("partition_key"),
                    F.to_json(
                        F.struct("event_id", "user_id", "event_type", "value")
                    ).alias("data"),
                )
            ).alias("value"),
        )
        .repartition("shard")
        .write.partitionBy("shard")
        .mode("overwrite")
        .text(staging)
    )
    # fixed path for the same reason as staging: the returned DataFrame
    # reads it lazily, so it must outlive the call — reuse, don't leak.
    # Shard files are rewritten wholesale ("wb") each invocation.
    archive = work_dir("kinesis_archive", sf_dir)
    # drop stale shards from a previous run first: if this run produces
    # fewer shard values (dataset shrank/emptied), leftover
    # shard-*.ndjson files would silently mix old data into the read
    for stale in os.listdir(archive):
        if stale.startswith("shard-") and stale.endswith(".ndjson"):
            os.unlink(os.path.join(archive, stale))
    for d in sorted(os.listdir(staging)):
        if not d.startswith("shard="):
            continue
        shard_id = d.split("=", 1)[1]
        parts = sorted(
            p
            for p in os.listdir(os.path.join(staging, d))
            if p.startswith("part-") and p.endswith(".txt")
        )
        with open(
            os.path.join(archive, f"shard-{shard_id}.ndjson"), "wb"
        ) as out:
            for p in parts:
                with open(os.path.join(staging, d, p), "rb") as src:
                    shutil.copyfileobj(src, out)
    # the staging copy is fully concatenated into the archive: drop it
    # (work_dir is a fixed path, so the NEXT call recreates it cheaply)
    shutil.rmtree(staging, ignore_errors=True)

    payload_schema = "event_id long, user_id long, event_type string, value double"
    return (
        spark.read.format("kinesis_replay")
        .option("path", archive)
        .load()
        .select(F.from_json("data", payload_schema).alias("e"))
        .groupBy(F.col("e.event_type").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            rnd(F.sum("e.value"), 2).alias("sum_value"),
            F.countDistinct("e.user_id").alias("n_keys"),
        )
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE anc AS (
        SELECT user_id AS start_id, user_id AS node, 0 AS depth
        FROM (SELECT DISTINCT user_id FROM events)
        UNION ALL
        SELECT start_id, node // 2, depth + 1 FROM anc WHERE node > 1
    )
    SELECT start_id AS user_id,
           CAST(max(depth) AS BIGINT) AS chain_len,
           CAST(count(*) AS BIGINT) AS n_chain_nodes,
           CAST(min(node) AS BIGINT) AS root_node
    FROM anc GROUP BY start_id
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk each user's
    halving-chain hierarchy (parent = node div 2 — a synthetic but
    deterministic org tree) to the root, reporting chain length and
    node count. Exercises the iterative-union executor: each recursion
    step is one distributed job over the frontier, so total work is
    O(|users| · log maxid) rows — the frontier never exceeds the user
    set, and at 100 TB the recursion depth (not the corpus size) is
    the bounded iteration count. The engine-extension analog of
    hierarchical/graph traversal in SQL."""
    t = tables(spark, sf_dir)
    t.events.select("user_id").distinct().createOrReplaceTempView(
        "_rcte_users"
    )
    return spark.sql(
        """
        WITH RECURSIVE anc AS (
            SELECT user_id AS start_id, user_id AS node, 0 AS depth
            FROM _rcte_users
            UNION ALL
            SELECT start_id, node DIV 2, depth + 1 FROM anc WHERE node > 1
        )
        SELECT start_id AS user_id,
               CAST(max(depth) AS BIGINT) AS chain_len,
               CAST(count(*) AS BIGINT) AS n_chain_nodes,
               CAST(min(node) AS BIGINT) AS root_node
        FROM anc GROUP BY start_id
        """
    )
