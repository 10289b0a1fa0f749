"""Pipeline-surface operators: the reference's actual job, batch-checkable.

These reproduce the libbeat-side pipeline the reference is configured
into (SURVEY.md §2.B) and the plugin's own per-event transforms
(§2.A): partition-key providers, enrichment, and observability counters.
The streaming wiring lives in awsbeats_spark/streaming/; these batch
twins exist so the DuckDB oracle can check the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query


@query(
    "partition_key_field",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS partition_key
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def partition_key_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field partition-key provider: the configured field's value becomes
    the key; events missing the field are dropped, not retried
    (/root/reference/streams/partition_key.go:26-39 + the drop semantics
    of mapEvents, /root/reference/streams/client.go:109-125)."""
    t = tables(spark, sf_dir)
    pk = F.get_json_object("props", "$.k")
    return (
        t.events.select("event_id", pk.alias("partition_key"))
        .filter(F.col("partition_key").isNotNull())
    )


@query(
    "partition_key_xid",
    oracle="""
    SELECT event_id,
           lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 16, '0')
             || lpad(CAST(event_id AS VARCHAR), 12, '0') AS partition_key
    FROM events
    """,
)
def partition_key_xid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xid-style partition key: globally unique and time-sortable
    (/root/reference/streams/partition_key.go:41-47 — xid = timestamp +
    machine + counter). Engine version: zero-padded micros-since-epoch ++
    zero-padded event_id — same uniqueness/sortability contract, but
    deterministic so the oracle can check it. Uniform spread across
    Kinesis shards comes from key cardinality, as with xid."""
    t = tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.concat(
            F.lpad(F.unix_micros("ts").cast("string"), 16, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("partition_key"),
    )


@query(
    "enrich_metadata",
    oracle="""
    SELECT event_id, event_type,
           'aws'            AS cloud_provider,
           'us-east-1'      AS cloud_region,
           n_name           AS node_name
    FROM events
    JOIN nation ON CAST(user_id % 25 AS INT) = n_nationkey
    """,
)
def enrich_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrichment processor (add_cloud_metadata —
    /root/reference/example/streams/filebeat.yml:16-17): constant
    environment fields plus a broadcast-joined lookup. The lookup dim is
    broadcast: zero shuffle on the event stream at any scale."""
    t = tables(spark, sf_dir)
    return (
        t.events.join(
            F.broadcast(t.nation),
            (F.col("user_id") % 25).cast("int") == F.col("n_nationkey"),
        )
        .select(
            "event_id",
            "event_type",
            F.lit("aws").alias("cloud_provider"),
            F.lit("us-east-1").alias("cloud_region"),
            F.col("n_name").alias("node_name"),
        )
    )


@query(
    "observability_counters",
    oracle="""
    SELECT count(*) AS new_batch,
           count(json_extract_string(props, '$.k')) AS acked,
           count(*) - count(json_extract_string(props, '$.k')) AS dropped
    FROM events
    """,
)
def observability_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observer counters NewBatch/Acked/Dropped
    (/root/reference/streams/client.go:87-96): events that fail
    projection (missing partition-key field) count as dropped, the rest
    as acked. One-row global aggregate — partial aggregation makes this
    a constant-size shuffle at any scale."""
    t = tables(spark, sf_dir)
    pk = F.get_json_object("props", "$.k")
    return t.events.agg(
        F.count(F.lit(1)).alias("new_batch"),
        F.count(pk).alias("acked"),
        (F.count(F.lit(1)) - F.count(pk)).alias("dropped"),
    )


@query(
    "json_parse_promote",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           upper(event_type) AS event_type_norm,
           CASE WHEN json_valid(props) THEN NULL ELSE 'parse_error' END AS error
    FROM events
    """,
)
def json_parse_promote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-line parsing with keys promoted to top level and an error
    column for corrupt input (json.keys_under_root + add_error_key —
    /root/reference/example/streams/filebeat.yml:13-14). On the clean
    testdata the error column is all-NULL; the corrupt path is exercised
    in tests/test_streaming_pipeline.py with malformed lines."""
    t = tables(spark, sf_dir)
    parsed = F.from_json(
        "props", "k bigint", {"mode": "PERMISSIVE"}
    )
    return t.events.select(
        "event_id",
        parsed.getField("k").alias("k"),
        F.upper("event_type").alias("event_type_norm"),
        F.when(parsed.isNull(), F.lit("parse_error")).otherwise(F.lit(None)).alias("error"),
    )


@query(
    "observability_observe_inline",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           round(sum(value), 4) AS sum_value
    FROM events
    """,
)
def observability_observe_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native `DataFrame.observe` as the Observer seam: metrics
    (row count, drop count, value mass) ride INSIDE the pass that
    processes the data — zero extra scan, exactly how the reference's
    `outputs.Observer` counts during delivery rather than after it
    (/root/reference/streams/client.go:87-96). In production the
    observation is read from a QueryExecutionListener / streaming
    progress event while the main result flows to the sink; here the
    operator returns the observed metrics as the result so the oracle
    can check the numbers themselves.

    Scale: observe() compiles to the same partial-aggregate shape as an
    agg() — constant-size state per task merged on the driver, no
    second job, no extra shuffle over the data.
    """
    from pyspark.sql import Observation

    t = tables(spark, sf_dir)
    obs = Observation("pipeline_metrics")
    pk = F.get_json_object("props", "$.k")
    observed = t.events.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(pk.isNull().cast("long")).alias("n_dropped"),
        F.sum("value").alias("sum_value"),
    )
    # Drive the observed pass with a metrics-only action (noop write =
    # full pass, nothing collected), then surface the observation.
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["n_dropped"], float(m["sum_value"]))],
        "n_rows bigint, n_dropped bigint, sum_value double",
    ).select(
        "n_rows",
        "n_dropped",
        F.floor(F.col("sum_value") * 1e4 + F.lit(0.5)) / 1e4,
    ).toDF("n_rows", "n_dropped", "sum_value")


# --------------------------------------------------------------------------
# Multiwindow SLO burn-rate alert (SRE-workbook style)
# --------------------------------------------------------------------------

# error budget 25% (the synthetic stream runs ~20% errors); burn
# threshold 1.05x budget, compared via exact integer cross-multiply:
# err/n > 1.05 * 0.25  <=>  10000*err > 2625*n  (no float knife edges)
_SLO_NUM = 10000
_SLO_DEN = 2625


@query(
    "pipeline_slo_burn_alert",
    oracle=f"""
    WITH hourly AS (
        SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
                   AS window_start,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_err
        FROM events GROUP BY 1
    ),
    rolled AS (
        SELECT window_start, n, n_err,
               sum(n) OVER (ORDER BY window_start
                            ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n6,
               sum(n_err) OVER (ORDER BY window_start
                                ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
                   AS err6
        FROM hourly
    )
    SELECT window_start, n, n_err,
           round(n_err * 1.0 / n, 6) AS err_rate,
           round(err6 * 1.0 / n6, 6) AS err_rate_6h,
           ({_SLO_NUM} * n_err > {_SLO_DEN} * n
            AND {_SLO_NUM} * err6 > {_SLO_DEN} * n6) AS fast_burn,
           ({_SLO_NUM} * err6 > {_SLO_DEN} * n6) AS slow_burn
    FROM rolled
    """,
)
def pipeline_slo_burn_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate alert (the SRE-workbook pattern) over
    the delivery pipeline's error stream: per hour, the 1-hour and
    rolling 6-hour error rates against a 25% error budget, paging
    (``fast_burn``) only when BOTH windows burn >1.05x budget — the
    short window gives detection latency, the long window suppresses
    one-bucket blips — and ticketing (``slow_burn``) on the long window
    alone. This is the alerting layer the reference leaves to
    CloudWatch on top of [[observability_counters]]' raw acked/failed
    counts; burn comparisons are exact integer cross-multiplications
    (10000*err > 2625*n), so no float knife edge can flip an alert
    between engines.

    Scale shape: one keyed hourly aggregate (map-side combinable),
    then two stock window sums over one row per hour — the same
    driver-page-sized series argument as
    [[stream_backpressure_queue_depth]]; partition by (service, week)
    at fleet scale."""
    t = tables(spark, sf_dir)
    hourly = t.events.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("window_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_err"),
    )
    w6 = Window.orderBy("window_start").rowsBetween(-5, 0)
    rolled = hourly.withColumn("n6", F.sum("n").over(w6)).withColumn(
        "err6", F.sum("n_err").over(w6)
    )
    fast = (_SLO_NUM * F.col("n_err") > _SLO_DEN * F.col("n")) & (
        _SLO_NUM * F.col("err6") > _SLO_DEN * F.col("n6")
    )
    slow = _SLO_NUM * F.col("err6") > _SLO_DEN * F.col("n6")
    return rolled.select(
        "window_start",
        "n",
        "n_err",
        rnd(F.col("n_err") / F.col("n"), 6).alias("err_rate"),
        rnd(F.col("err6") / F.col("n6"), 6).alias("err_rate_6h"),
        fast.alias("fast_burn"),
        slow.alias("slow_burn"),
    )
