"""Batch twins of the streaming analytics operators.

Structured Streaming's windowed aggregations run identically over a
batch DataFrame (same `window()` / `session_window()` expressions), so
each streaming operator registers its batch twin here for the DuckDB
oracle; the actual readStream→writeStream wiring and watermark behavior
are exercised in tests/test_streaming.py (SURVEY.md §2.B B5/B6 —
size+time micro-batch flush and periodic metric sampling).

Window starts are emitted as epoch seconds (BIGINT) — engine-neutral,
no timestamp-precision ambiguity in the hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query


@query(
    "stream_tumbling_agg",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window per event_type — the engine form of the
    reference pipeline's periodic metric sampling (10s/60s periods,
    /root/reference/example/metricbeat/metricbeat.yml:20-46), scaled to
    the testdata's time range. Uses F.window (streaming-identical), not
    date_trunc, so the same expression runs under readStream."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_sliding_agg",
    oracle="""
    WITH expanded AS (
        SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) - offs AS window_start,
               value
        FROM events
        CROSS JOIN (SELECT unnest([0, 3600]) AS offs)
    )
    SELECT window_start,
           count(*) AS n_events,
           round(avg(value), 4) AS avg_value
    FROM expanded
    GROUP BY window_start
    """,
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour window sliding every hour: each event lands in exactly two
    windows (starts at trunc(ts) and trunc(ts)-1h — the oracle expands
    the same two offsets). Sliding windows multiply rows by
    (length/slide); keep that ratio small at scale."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_events",
            "avg_value",
        )
    )


@query(
    "stream_session_window",
    oracle="""
    WITH ordered AS (
        -- tie-break ORDER BY with event_id: duplicate (user, ts) rows
        -- otherwise get an ARBITRARY order that may DIFFER between this
        -- window pass and the cumsum pass below, splitting a tie block
        -- into two sessions (3 phantom sessions in 95k at the sf1
        -- replica, where timestamps repeat; Spark's session_window is
        -- merge-based and has no ordering to get wrong)
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP)) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                         OR lag(ts) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                            IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_seq
        FROM ordered
    )
    SELECT user_id,
           CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
           count(*) AS n_events,
           CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS span_seconds,
           round(sum(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_seq
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap, via Spark's
    native session_window (merging windows in streaming). The oracle
    rebuilds sessions with the classic gaps-and-islands SQL. span_seconds
    is max(ts)-min(ts) (event span; session_window.end adds the gap)."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .select(
            "user_id",
            F.unix_timestamp("min_ts").alias("session_start"),
            "n_events",
            (F.unix_timestamp("max_ts") - F.unix_timestamp("min_ts")).alias("span_seconds"),
            "sum_value",
        )
    )


@query(
    "stream_watermark_dedup",
    oracle="""
    SELECT DISTINCT event_id, user_id, event_type
    FROM (
        SELECT event_id, user_id, event_type FROM events
        UNION ALL
        SELECT event_id, user_id, event_type FROM events
    )
    """,
)
def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once-ify duplicated delivery: dropDuplicates on the event
    key over an at-least-once (duplicated) input — the batch twin of
    withWatermark(ts, d).dropDuplicates(["event_id"]) which bounds the
    dedup state in streaming (SURVEY.md §2.C). The input is the events
    table unioned with itself to simulate redelivery."""
    t = tables(spark, sf_dir)
    ev = t.events.select("event_id", "user_id", "event_type")
    return ev.unionByName(ev).dropDuplicates(["event_id"])


_HOP_TOP_N = 3


@query(
    "stream_hopping_topk",
    oracle=f"""
    WITH expanded AS (
        SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
                   - offs AS window_start,
               event_type, value
        FROM events
        CROSS JOIN (SELECT unnest([0, 3600]) AS offs)
    ),
    agg AS (
        SELECT window_start, event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM expanded
        GROUP BY 1, 2
    )
    SELECT window_start, event_type, n_events, sum_value, rank
    FROM (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY window_start
                   ORDER BY n_events DESC, event_type
               ) AS INT) AS rank
        FROM agg
    ) WHERE rank <= {_HOP_TOP_N}
    """,
)
def stream_hopping_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N event types per HOPPING window (2h length, 1h slide) — the
    reference pipeline's top-N metric selection (SURVEY.md §2.B B7,
    the example configs' "top N processes by CPU") under streaming
    window semantics rather than a static group: each event lands in
    length/slide = 2 windows, counts aggregate per (window, type), and
    the rank is per window. Uses F.window (streaming-identical), so
    the same expression runs under readStream; the oracle expands the
    two hop offsets explicitly like [[stream_sliding_agg]].

    Scale shape: the hop multiplies rows by length/slide (2 here — keep
    that ratio small at scale) before one keyed fold on the bounded
    (window, event_type) key set; the rank window partitions by
    window_start, |types|-bounded per partition. In a live stream the
    rank runs on the windowed aggregate state, which a watermark
    bounds.
    """
    t = tables(spark, sf_dir)
    agg = (
        t.events.groupBy(
            F.window("ts", "2 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("n_events"), F.asc("event_type")
        )
    )
    return agg.withColumn("rank", rank).filter(
        F.col("rank") <= _HOP_TOP_N
    )


_WM_BLOCK = 1024  # arrival-order block size for the distributed prefix max
_WM_DELAYS = (60, 300, 900, 3600)  # candidate watermark delays (seconds)


@query(
    "stream_watermark_lateness_curve",
    oracle=f"""
    WITH arr AS (
        SELECT event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS es
        FROM events
    ),
    runmax AS (
        SELECT event_id, es,
               max(es) OVER (
                   ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS high_water
        FROM arr
    ),
    lat AS (SELECT high_water - es AS lateness_us FROM runmax),
    d AS (SELECT unnest([{", ".join(str(d) for d in _WM_DELAYS)}]) AS delay_s)
    SELECT CAST(d.delay_s AS BIGINT) AS delay_s,
           CAST(count(*) FILTER (lat.lateness_us
                                 > CAST(d.delay_s AS BIGINT) * 1000000)
                AS BIGINT) AS n_dropped,
           round(count(*) FILTER (lat.lateness_us
                                  > CAST(d.delay_s AS BIGINT) * 1000000)
                 * 1.0 / count(*), 6) AS frac_dropped
    FROM lat CROSS JOIN d
    GROUP BY d.delay_s
    """,
)
def stream_watermark_lateness_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Watermark tuning curve: for each candidate delay, the fraction
    of the historical stream a `withWatermark(ts, delay)` would have
    DROPPED — each event's lateness is high_water - ts where
    high_water is the running max event time in ARRIVAL order
    (event_id), exactly the quantity Structured Streaming's watermark
    tracks. [[events_lateness_stats]] describes the lateness
    distribution; this op answers the design question directly
    ("what delay keeps 99.99% of events?") as a measured
    drop-rate-vs-delay curve, the evidence behind every
    [[stream_watermark_dedup]] / windowed-agg watermark choice.

    Scale shape — the reason this isn't the oracle's global window:
    the running max over arrival order is computed as a DISTRIBUTED
    PREFIX SCAN — per-block cumulative max inside each {blk}-event
    arrival block (a window partitioned BY BLOCK, parallel), combined
    with the exclusive prefix max OVER block maxima (a |blocks|-sized
    table, broadcast back). max() is associative, so the decomposition
    is exact; no single-partition funnel touches event grain. The
    oracle replays the same semantics with DuckDB's global window,
    which is fine at oracle scale.
    """
    t = tables(spark, sf_dir)
    # EXACT integer micros (the events_session_gap_sensitivity fix,
    # applied to the same latent class): unix_timestamp() FLOORS to
    # seconds while the old oracle's CAST(epoch() AS BIGINT) ROUNDED,
    # so a lateness landing exactly on a delay boundary could flip
    arr = t.events.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("es"),
        (F.col("event_id") / _WM_BLOCK).cast("long").alias("blk"),
    )
    in_block = F.max("es").over(
        Window.partitionBy("blk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    blocks = arr.groupBy("blk").agg(F.max("es").alias("bmax"))
    # exclusive prefix max over the (tiny) block-max table
    prefix = blocks.withColumn(
        "pmax",
        F.max("bmax").over(
            Window.orderBy("blk").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
    ).select("blk", "pmax")
    lat = (
        arr.withColumn("inb", in_block)
        .join(F.broadcast(prefix), "blk")
        .select(
            (
                F.greatest(F.col("inb"), F.coalesce(F.col("pmax"), F.col("inb")))
                - F.col("es")
            ).alias("lateness")
        )
    )
    delays = spark.createDataFrame(
        [(d,) for d in _WM_DELAYS], "delay_s long"
    )
    dropped = F.count(
        F.when(F.col("lateness") > F.col("delay_s") * 1000000, 1)
    )
    return (
        lat.crossJoin(F.broadcast(delays))
        .groupBy("delay_s")
        .agg(
            dropped.cast("long").alias("n_dropped"),
            rnd(
                dropped / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("frac_dropped"),
        )
    )


stream_watermark_lateness_curve.__doc__ = (
    stream_watermark_lateness_curve.__doc__.replace("{blk}", str(_WM_BLOCK))
)


_GAP_CANDIDATES = (900, 1800, 3600)  # candidate session gaps (seconds)


@query(
    "events_session_gap_sensitivity",
    oracle=f"""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                 ) AS gap_us
        FROM events
    ),
    users AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
    cand AS (
        SELECT unnest([{", ".join(str(g) for g in _GAP_CANDIDATES)}])
            AS gap_threshold_s
    )
    SELECT CAST(cand.gap_threshold_s AS BIGINT) AS gap_threshold_s,
           CAST(users.n_users
                + count(*) FILTER (gaps.gap_us
                                   >= CAST(cand.gap_threshold_s AS BIGINT)
                                      * 1000000)
                AS BIGINT) AS n_sessions,
           round((users.n_users
                  + count(*) FILTER (gaps.gap_us
                                     >= CAST(cand.gap_threshold_s AS BIGINT)
                                        * 1000000))
                 * 1.0 / users.n_users, 4) AS sessions_per_user
    FROM gaps CROSS JOIN cand CROSS JOIN users
    GROUP BY cand.gap_threshold_s, users.n_users
    """,
)
def events_session_gap_sensitivity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sessionization sensitivity curve — total session count (and
    sessions per user) as a function of the inactivity-gap threshold,
    for the candidate gaps every session-window deployment argues
    about: a session COUNT needs no session assembly, only boundary
    counting (sessions = users + boundaries where gap ≥ threshold),
    so the whole curve is one lag window and conditional counts —
    the response-surface discipline ([[eval_lsh_band_tradeoff]],
    [[stream_watermark_lateness_curve]]) applied to
    [[stream_session_window]]'s 30-minute knob, which sits exactly on
    this curve.

    Scale shape: one user-partitioned lag window (parallel by user —
    the same shuffle sessionization itself needs), then a ×|candidates|
    conditional fold; no session rows are materialized.
    """
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # EXACT integer micros on both sides: unix_timestamp() FLOORS to
    # seconds while DuckDB's CAST(epoch() AS BIGINT) ROUNDS, so a gap
    # whose endpoints straddle a .5s fraction flipped the >= threshold
    # test between engines (caught by the sf0.1 full sweep, round 10 —
    # one boundary in 95k sessions)
    es = F.unix_micros(F.col("ts"))
    gaps = t.events.select(
        "user_id", (es - F.lag(es).over(w)).alias("gap_us")
    )
    n_users = t.events.agg(
        F.countDistinct("user_id").alias("n_users")
    )
    cand = spark.createDataFrame(
        [(g,) for g in _GAP_CANDIDATES], "gap_threshold_s long"
    )
    return (
        gaps.crossJoin(F.broadcast(cand))
        .crossJoin(F.broadcast(n_users))
        .groupBy("gap_threshold_s", "n_users")
        .agg(
            F.count(
                F.when(
                    F.col("gap_us")
                    >= F.col("gap_threshold_s") * 1000000,
                    1,
                )
            ).alias("n_boundaries")
        )
        .select(
            "gap_threshold_s",
            (F.col("n_users") + F.col("n_boundaries"))
            .cast("long")
            .alias("n_sessions"),
            rnd(
                (F.col("n_users") + F.col("n_boundaries"))
                * 1.0
                / F.col("n_users"),
                4,
            ).alias("sessions_per_user"),
        )
    )


# --------------------------------------------------------------------------
# Backpressure: queue depth under a fixed-capacity consumer
# --------------------------------------------------------------------------


@query(
    "stream_backpressure_queue_depth",
    oracle="""
    WITH arr AS (
        SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
                   AS window_start,
               CAST(count(*) AS BIGINT) AS arrivals
        FROM events GROUP BY 1
    ),
    cap AS (
        SELECT CAST(ceil(1.05 * avg(arrivals)) AS BIGINT) AS capacity FROM arr
    ),
    pfx AS (
        SELECT window_start, arrivals, capacity,
               sum(arrivals - capacity) OVER (
                   ORDER BY window_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pf
        FROM arr CROSS JOIN cap
    )
    SELECT window_start, arrivals, capacity,
           CAST(greatest(0, pf - least(0, min(pf) OVER (
               ORDER BY window_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ))) AS BIGINT) AS queue_depth
    FROM pfx
    """,
)
def stream_backpressure_queue_depth(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Queue depth per hour window under a fixed-capacity consumer —
    the backpressure audit behind sizing the reference's queue.mem
    (4096 events, example/streams/filebeat.yml:25-28): arrivals above
    capacity accumulate, spare capacity drains, depth never goes
    negative. The clipped recurrence
    ``q_t = max(0, q_{t-1} + arrivals_t - C)`` is NOT a plain window
    sum, but it has the classic closed form
    ``q_t = pf_t - min(0, min_{s<t} pf_s)`` over the prefix sums
    ``pf = cumsum(arrivals - C)`` — so both engines compute it with two
    stock window functions (cumsum + running min), no recursion, no
    UDF, no driver loop. Capacity is pinned to ceil(1.05 x mean hourly
    arrivals) so the audit exposes genuine burst backlogs rather than
    a constant under/over-provision.

    Scale shape: one keyed aggregate (hour buckets), then windows over
    one row per hour — years fit a driver page; partition the window
    by (tenant, week) when they don't. The pattern is the same
    distributed block-prefix trick as [[stream_watermark_lateness_curve]]
    when the per-window series itself is too large for one partition."""
    t = tables(spark, sf_dir)
    arr = t.events.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("arrivals"))
    cap = arr.agg(
        F.ceil(1.05 * F.avg("arrivals")).cast("long").alias("capacity")
    )
    w = Window.orderBy("window_start")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    pfx = arr.crossJoin(F.broadcast(cap)).withColumn(
        "pf",
        F.sum(F.col("arrivals") - F.col("capacity")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return pfx.select(
        "window_start",
        "arrivals",
        "capacity",
        F.greatest(
            F.lit(0),
            F.col("pf") - F.least(F.lit(0), F.min("pf").over(wprev)),
        )
        .cast("long")
        .alias("queue_depth"),
    )


_CAP_FACTORS = (0.95, 1.0, 1.05, 1.2)


@query(
    "eval_backpressure_capacity_curve",
    oracle=f"""
    WITH arr AS (
        SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
                   AS window_start,
               CAST(count(*) AS BIGINT) AS arrivals
        FROM events GROUP BY 1
    ),
    caps AS (
        SELECT f, CAST(ceil(f * (SELECT avg(arrivals) FROM arr)) AS BIGINT)
                   AS capacity
        FROM (SELECT unnest({list(_CAP_FACTORS)}) AS f)
    ),
    pfx AS (
        SELECT f, capacity, window_start, arrivals,
               sum(arrivals - capacity) OVER (
                   PARTITION BY f ORDER BY window_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pf
        FROM arr CROSS JOIN caps
    ),
    depth AS (
        SELECT f, capacity, window_start, arrivals,
               greatest(0, pf - least(0, min(pf) OVER (
                   PARTITION BY f ORDER BY window_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ))) AS q
        FROM pfx
    )
    SELECT f AS capacity_factor, capacity,
           CAST(max(q) AS BIGINT) AS peak_depth,
           CAST(sum(CASE WHEN q > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS backlogged_hours,
           round(avg(q), 6) AS mean_depth
    FROM depth GROUP BY f, capacity
    """,
)
def eval_backpressure_capacity_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Capacity-sizing response curve for
    [[stream_backpressure_queue_depth]]: the full queue-depth series
    replayed at capacity factors {0.95, 1.0, 1.05, 1.2} x mean arrival
    rate, summarized per factor as peak depth / backlogged hours / mean
    depth — the curve that answers "how much headroom buys how much
    backlog" BEFORE provisioning (0.95x must show unbounded growth,
    1.2x near-zero; the knee between them is the sizing answer). Same
    design-curve contract as [[eval_lsh_band_tradeoff]] and
    [[stream_watermark_lateness_curve]]: every knob ships its measured
    response, and all factors come from ONE hourly aggregate — the
    curve multiplies only the one-row-per-hour series, never the event
    scan.

    Scale shape: one keyed hourly aggregate, then |factors| x hours
    window rows — the factor axis rides the tiny series, so cost is
    identical to the single-capacity audit."""
    t = tables(spark, sf_dir)
    arr = t.events.groupBy(
        F.unix_timestamp(F.date_trunc("hour", "ts")).alias("window_start")
    ).agg(F.count(F.lit(1)).alias("arrivals"))
    mean_arr = arr.agg(F.avg("arrivals").alias("mu"))
    caps = (
        mean_arr.select(
            F.explode(
                F.array(*[F.lit(x) for x in _CAP_FACTORS])
            ).alias("f"),
            "mu",
        )
        .select("f", F.ceil(F.col("f") * F.col("mu")).cast("long").alias("capacity"))
    )
    w = Window.partitionBy("f").orderBy("window_start")
    pf = F.sum(F.col("arrivals") - F.col("capacity")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    depth = (
        arr.crossJoin(F.broadcast(caps))
        .withColumn("pf", pf)
        .withColumn(
            "q",
            F.greatest(
                F.lit(0),
                F.col("pf")
                - F.least(
                    F.lit(0),
                    F.min("pf").over(
                        w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                ),
            ),
        )
    )
    return depth.groupBy(F.col("f").alias("capacity_factor"), "capacity").agg(
        F.max("q").cast("long").alias("peak_depth"),
        F.sum((F.col("q") > 0).cast("long")).alias("backlogged_hours"),
        rnd(F.avg("q"), 6).alias("mean_depth"),
    )
