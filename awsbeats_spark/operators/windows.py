"""Window-function operators.

Reference parity: top-N selection is the one windowed operation in the
reference's pipeline configs (top 5 processes by cpu/memory —
/root/reference/example/metricbeat/metricbeat.yml:36-38, SURVEY.md §2.B
B7); the rest generalizes it.

Scale notes: a window partitioned by a key is ONE shuffle on that key;
the per-partition sort is local. Skewed partition keys (one user with
10^9 events) are the hazard — AQE skew handling does not split window
partitions, so for known-skewed keys pre-bucket by (key, ts-range) and
merge. The partitionBy-less global window is deliberately absent: it
would serialize on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query


@query(
    "window_topn_rank",
    oracle="""
    SELECT event_type, event_id, round(value, 2) AS value, rn
    FROM (
        SELECT event_type, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id
               ) AS rn
        FROM events
    )
    WHERE rn <= 5
    """,
)
def window_topn_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 per group by metric — the reference pipeline's top-N
    processor (SURVEY.md B7). event_id tiebreaks equal values so the
    selected set is deterministic."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id", rnd("value", 2).alias("value"), "rn")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           round(value, 2) AS value,
           round(lag(value)  OVER w, 2) AS prev_value,
           round(lead(value) OVER w, 2) AS next_value,
           CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
                - floor(epoch(CAST(lag(ts) OVER w AS TIMESTAMP))) AS BIGINT)
               AS secs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event time (inter-event gaps)."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return t.events.select(
        "event_id",
        "user_id",
        rnd("value", 2).alias("value"),
        rnd(F.lag("value").over(w), 2).alias("prev_value"),
        rnd(F.lead("value").over(w), 2).alias("next_value"),
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).alias(
            "secs_since_prev"
        ),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spent,
           row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS order_seq
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer with an explicit ROWS frame; o_orderkey
    in the sort makes the prefix (hence the sum) deterministic."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        rnd(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spent"),
        F.row_number().over(w).alias("order_seq"),
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT c_custkey, c_nationkey,
           rank()         OVER w AS bal_rank,
           dense_rank()   OVER w AS bal_dense_rank,
           round(percent_rank() OVER w, 6) AS bal_pct_rank,
           ntile(4)       OVER w AS bal_quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile per nation."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return t.customer.select(
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
        rnd(F.percent_rank().over(w), 6).alias("bal_pct_rank"),
        F.ntile(4).over(w).alias("bal_quartile"),
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 4) AS moving_avg_3,
           round(min(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 2) AS moving_min_3
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 3-row frame aggregates per user."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, 0)
    )
    return t.events.select(
        "event_id",
        "user_id",
        rnd(F.avg("value").over(w), 4).alias("moving_avg_3"),
        rnd(F.min("value").over(w), 2).alias("moving_min_3"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW
           ), 2) AS spend_30d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-customer rolling 30-day spend.
    Unlike ROWS frames, RANGE bounds are value-based — rows with equal
    order timestamps share a frame, so the result is deterministic
    without a unique tiebreaker. Ordering on epoch seconds keeps both
    engines on identical integer arithmetic."""
    t = tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-2592000, 0)
    )
    return t.orders.select(
        "o_orderkey",
        "o_custkey",
        rnd(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


@query(
    "window_sessionize_gap",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
                         OR lag(ts) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, event_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           max(floor(epoch(ts))::BIGINT) - min(floor(epoch(ts))::BIGINT) AS duration_s
    FROM sess
    GROUP BY user_id, session_id
    """,
)
def window_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization built from primitives (lag -> new-session
    flag -> running sum = session id -> per-session aggregate): the
    manual form of session_window (stream_session_window uses the
    built-in), needed whenever session boundaries depend on more than a
    fixed gap (e.g. a logout event). One shuffle on user_id serves both
    windows and the final aggregate."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev = F.lag(F.unix_timestamp("ts")).over(w)
    new_session = F.when(
        prev.isNull() | ((F.unix_timestamp("ts") - prev) > 1800), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        t.events.select("user_id", "event_id", "ts", new_session.alias("ns"))
        .withColumn("session_id", F.sum("ns").over(run).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts")))
            .cast("bigint")
            .alias("duration_s"),
        )
    )


@query(
    "window_sliding_distinct",
    oracle="""
    WITH ev AS (
        SELECT date_trunc('hour', ts) AS h, user_id FROM events
    ),
    bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
    grid AS (
        SELECT unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS window_end
        FROM bounds b
    )
    SELECT window_end, count(DISTINCT user_id) AS users_24h
    FROM grid
    JOIN ev ON ev.h BETWEEN window_end - INTERVAL 23 HOUR AND window_end
    GROUP BY window_end
    """,
)
def window_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24h distinct users, evaluated hourly. Spark window
    frames cannot hold COUNT(DISTINCT), and the naive rewrite (range
    self-join of every hour against 24 hours of raw events) is
    quadratic in window count. Scalable rewrite: each event's hour
    bucket is exploded into the 24 window-end hours it contributes to
    (bounded ×24 row growth), then one hash aggregate counts distinct
    users per window — Spark plans the distinct as the standard
    two-phase (window_end, user_id) partial-dedup then count, so the
    shuffled volume is the deduped pair count, not the exploded rows.
    Pre-shrinking to (hour, user_id) distinct BEFORE the explode bounds
    the multiplier input at key-cardinality, not event count."""
    ev = (
        tables(spark, sf_dir)
        .events.select(
            F.date_trunc("hour", F.col("ts")).alias("h"), "user_id"
        )
        .distinct()
    )
    bounds = ev.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    return (
        ev.crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            "h0",
            "h1",
            F.explode(
                F.sequence(
                    F.col("h"),
                    F.col("h") + F.expr("INTERVAL 23 HOURS"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("window_end"),
        )
        .filter((F.col("window_end") >= F.col("h0")) & (F.col("window_end") <= F.col("h1")))
        .groupBy("window_end")
        .agg(F.countDistinct("user_id").alias("users_24h"))
    )


# --------------------------------------------------------------------------
# Moving median over an ordered trailing frame
# --------------------------------------------------------------------------


@query(
    "window_moving_median",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
           round(median(l_extendedprice) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
           ), 4) AS median_5
    FROM lineitem
    """,
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 5-row moving median of extended price per supplier,
    ordered by ship date with a unique (orderkey, linenumber)
    tiebreaker so every engine assembles identical frames. Median is a
    true holistic aggregate — unlike avg it cannot be run as a
    running accumulator — so Spark evaluates `percentile` over each
    frame; the frame is 5 rows, making the per-row cost constant. One
    shuffle on l_suppkey, local sort, no Python."""
    li = tables(spark, sf_dir).lineitem
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-4, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        rnd(F.expr("percentile(l_extendedprice, 0.5)").over(w), 4).alias(
            "median_5"
        ),
    )


# --------------------------------------------------------------------------
# Gaps-and-islands: longest consecutive-day activity streak per user
# --------------------------------------------------------------------------


@query(
    "window_streak_longest",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events WHERE event_type = 'purchase'
    ),
    grp AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (
                   PARTITION BY user_id ORDER BY d) AS INT) AS g
        FROM days
    ),
    streaks AS (
        SELECT user_id, g,
               CAST(count(*) AS BIGINT) AS streak_len,
               min(d) AS streak_start
        FROM grp GROUP BY user_id, g
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(sum(streak_len) AS BIGINT) AS n_active_days,
           max(streak_len) AS longest_streak,
           strftime(min(streak_start) FILTER (
               WHERE streak_len = (SELECT max(s2.streak_len)
                                   FROM streaks s2
                                   WHERE s2.user_id = streaks.user_id)
           ), '%Y-%m-%d') AS longest_start
    FROM streaks GROUP BY user_id
    """,
)
def window_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: the longest run of consecutive purchase days
    per user (date minus row_number collapses each run to one group
    key), reporting streak count, active days, the longest streak, and
    its earliest start date. Scale shape: the raw fact collapses to
    DISTINCT (user, day) first — bounded at 365 rows/user/year — so the
    row_number window and both aggregates run on day-level buckets; one
    shuffle on user_id serves the window and the final groupBy via
    exchange reuse. The classic sessionize-by-calendar shape."""
    ev = tables(spark, sf_dir).events
    days = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn(
        "g", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    streaks = grp.groupBy("user_id", "g").agg(
        F.count(F.lit(1)).alias("streak_len"),
        F.min("d").alias("streak_start"),
    )
    return streaks.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("streak_len").cast("long").alias("n_active_days"),
        F.max("streak_len").alias("longest_streak"),
        F.date_format(
            F.min_by(
                F.col("streak_start"),
                F.struct(-F.col("streak_len"), F.col("streak_start")),
            ),
            "yyyy-MM-dd",
        ).alias("longest_start"),
    )


# --------------------------------------------------------------------------
# Ratio-to-report: share of partition and of grand total
# --------------------------------------------------------------------------


@query(
    "window_share_of_total",
    oracle="""
    WITH nat AS (
        SELECT c.c_nationkey, round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
    ),
    named AS (
        SELECT n.n_regionkey, n.n_name, t.revenue
        FROM nat t JOIN nation n ON t.c_nationkey = n.n_nationkey
    )
    SELECT n_regionkey, n_name, revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY n_regionkey), 6)
               AS share_of_region,
           round(revenue / sum(revenue) OVER (), 6) AS share_of_total,
           rank() OVER (PARTITION BY n_regionkey
                        ORDER BY revenue DESC, n_name) AS rank_in_region
    FROM named
    """,
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue as a share of its region
    and of the grand total, plus in-region rank — the BI denominator
    pattern. Scale shape: the fact collapses to |nations| (25) rows
    FIRST; both share windows (including the partitionBy-less grand
    total) run on that bucket table, so the usually-forbidden global
    window is safe by construction. One exchange for the aggregate,
    broadcast for names."""
    t = tables(spark, sf_dir)
    nat = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey")
        .agg(rnd(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    named = nat.join(
        F.broadcast(t.nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("n_regionkey", "n_name", "revenue")
    wr = Window.partitionBy("n_regionkey")
    wall = Window.partitionBy()
    wrank = Window.partitionBy("n_regionkey").orderBy(
        F.desc("revenue"), F.asc("n_name")
    )
    return named.select(
        "n_regionkey",
        "n_name",
        "revenue",
        rnd(F.col("revenue") / F.sum("revenue").over(wr), 6).alias(
            "share_of_region"
        ),
        rnd(F.col("revenue") / F.sum("revenue").over(wall), 6).alias(
            "share_of_total"
        ),
        F.rank().over(wrank).alias("rank_in_region"),
    )


# --------------------------------------------------------------------------
# Hampel filter: rolling-median +/- k*MAD outlier flags per user stream
# --------------------------------------------------------------------------

_HAMPEL_K = 3.0
_HAMPEL_SCALE = 1.4826  # MAD -> sigma for Gaussian data


@query(
    "window_outlier_hampel",
    oracle=f"""
    WITH based AS (
        SELECT user_id, event_id, ts, value,
               median(value) OVER w AS med
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
        )
    ),
    framed AS (
        SELECT user_id, event_id, ts, value, med,
               median(abs(value - med)) OVER w2 AS mad
        FROM based
        WINDOW w2 AS (
            PARTITION BY user_id
            ORDER BY ts, event_id
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
        )
    )
    SELECT user_id, event_id, round(value, 4) AS value,
           round(med, 4) AS rolling_median,
           round({_HAMPEL_SCALE} * mad, 4) AS sigma_est
    FROM framed
    WHERE abs(value - med) > {_HAMPEL_K} * {_HAMPEL_SCALE} * mad
      AND mad > 0
    """,
)
def window_outlier_hampel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter over each user's event-value stream: a point is an
    outlier when it sits more than 3 scaled-MAD from the
    trailing 7-point rolling median. Two-pass variant: pass 1 computes
    each point's trailing median; pass 2 takes the rolling median of
    |value - own trailing median| as the dispersion estimate (the
    textbook single-anchor MAD would nest a window inside a window —
    inexpressible in either engine's window algebra and quadratic to
    emulate; the two-pass residual-MAD is the standard streaming
    formulation and is what this operator pins on BOTH engines). The
    streaming-friendly robust
    detector (a single spike cannot drag the median baseline the way
    it drags ts_ewma's mean, and unlike the global ts_anomaly_mad the
    baseline adapts to each user's local level). The nested holistic
    window (median of |value - rolling median| over the SAME frame) is
    the expensive-looking part, but the frame is 7 rows so per-row
    cost is constant; one shuffle on user_id, locally sorted, no
    Python. Zero-MAD frames (constant values) are excluded, not
    divided by — the ANSI lesson."""
    ev = tables(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    med = F.expr("percentile(value, 0.5)").over(w)
    framed = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        med.alias("med"),
    ).withColumn(
        "mad",
        F.expr("percentile(abs(value - med), 0.5)").over(
            Window.partitionBy("user_id")
            .orderBy("ts", "event_id")
            .rowsBetween(-6, Window.currentRow)
        ),
    )
    return (
        framed.filter(
            (F.col("mad") > 0)
            & (
                F.abs(F.col("value") - F.col("med"))
                > _HAMPEL_K * _HAMPEL_SCALE * F.col("mad")
            )
        )
        .select(
            "user_id",
            "event_id",
            rnd("value", 4).alias("value"),
            rnd("med", 4).alias("rolling_median"),
            rnd(F.lit(_HAMPEL_SCALE) * F.col("mad"), 4).alias("sigma_est"),
        )
    )


# --------------------------------------------------------------------------
# Gaps-and-islands: consecutive-month activity runs per customer
# --------------------------------------------------------------------------


@query(
    "window_gap_islands",
    oracle="""
    WITH months AS (
        SELECT DISTINCT o_custkey,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                   AS mi,
               strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mstr
        FROM orders
    ),
    tagged AS (
        SELECT o_custkey, mi, mstr,
               mi - row_number() OVER (
                   PARTITION BY o_custkey ORDER BY mi) AS grp
        FROM months
    ),
    islands AS (
        SELECT o_custkey, grp,
               count(*) AS island_len,
               min(mi) AS start_mi,
               min(mstr) AS start_month
        FROM tagged GROUP BY o_custkey, grp
    ),
    ranked AS (
        SELECT o_custkey, island_len, start_month,
               count(*) OVER (PARTITION BY o_custkey) AS n_islands,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY island_len DESC, start_mi ASC) AS rk
        FROM islands
    )
    SELECT o_custkey AS custkey,
           CAST(n_islands AS BIGINT) AS n_islands,
           CAST(island_len AS BIGINT) AS longest_len,
           start_month AS longest_start
    FROM ranked WHERE rk = 1
    """,
)
def window_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic gaps-and-islands pattern: collapse each customer's
    active months into maximal runs of CONSECUTIVE months (islands)
    using the row_number-difference trick — month_index minus the
    per-customer row_number is constant exactly within a consecutive
    run, so one window pass plus one groupBy finds every island with
    no self-join and no iteration. Emits each customer's island count
    and their longest island (ties broken to the earliest start) —
    the per-entity engagement-continuity summary subscription and
    retention teams ask for.

    Scale shape: DISTINCT (customer, month) first — the frame the
    windows run on is bounded by customers x 84 months regardless of
    order volume; then one partitioned sort serves both the
    row_number tagging and (after the island groupBy, which re-uses
    the same customer hash partitioning) the final top-1 rank. Output
    is exactly one row per active customer. At 100 TB the only knob is
    the months-universe width, not the fact table."""
    o = tables(spark, sf_dir).orders
    months = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi"),
        F.date_format(
            F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM"
        ).alias("mstr"),
    ).distinct()
    wrn = Window.partitionBy("o_custkey").orderBy("mi")
    tagged = months.withColumn(
        "grp", F.col("mi") - F.row_number().over(wrn)
    )
    islands = tagged.groupBy("o_custkey", "grp").agg(
        F.count(F.lit(1)).alias("island_len"),
        F.min("mi").alias("start_mi"),
        F.min("mstr").alias("start_month"),
    )
    wcnt = Window.partitionBy("o_custkey")
    wrk = Window.partitionBy("o_custkey").orderBy(
        F.desc("island_len"), F.asc("start_mi")
    )
    ranked = islands.select(
        "o_custkey",
        "island_len",
        "start_month",
        F.count(F.lit(1)).over(wcnt).alias("n_islands"),
        F.row_number().over(wrk).alias("rk"),
    )
    return ranked.filter(F.col("rk") == 1).select(
        F.col("o_custkey").alias("custkey"),
        F.col("n_islands").cast("long").alias("n_islands"),
        F.col("island_len").cast("long").alias("longest_len"),
        F.col("start_month").alias("longest_start"),
    )


# --------------------------------------------------------------------------
# Bollinger bands: rolling mean +/- 2 sigma with breach flags
# --------------------------------------------------------------------------

_BOLL_WIN = 7  # trailing days in the band estimate
_BOLL_MIN = 5  # minimum observations before a band is emitted
_BOLL_K = 2.0  # band half-width in rolling sigmas


@query(
    "window_bollinger_breach",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               sum(value) AS tot
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, date_trunc('day', ts)
    ),
    banded AS (
        SELECT event_type, day, tot,
               avg(tot) OVER w AS mu,
               stddev_samp(tot) OVER w AS sd,
               count(*) OVER w AS n_win
        FROM daily
        WINDOW w AS (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN {_BOLL_WIN - 1} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           round(tot, 4) AS value,
           round(mu, 4) AS band_mid,
           round(mu - {_BOLL_K} * sd, 4) AS band_lo,
           round(mu + {_BOLL_K} * sd, 4) AS band_hi,
           (tot > mu + {_BOLL_K} * sd) AS breach_hi,
           (tot < mu - {_BOLL_K} * sd) AS breach_lo
    FROM banded
    WHERE n_win >= {_BOLL_MIN} AND sd > 0
    """,
)
def window_bollinger_breach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-style control bands on each event_type's daily value
    total: trailing-7-day mean +/- 2 trailing sigmas, with the band
    computed over STRICTLY PRECEDING days (1 preceding, never the
    current row) so today's spike cannot widen the band that judges it
    — the out-of-sample discipline ts_anomaly_mad (global robust
    scale) and window_outlier_hampel (centered window) don't impose.
    breach_hi/breach_lo are the trading-chart upper/lower band breaks,
    i.e. days that moved more than 2 sigma against their own recent
    regime; warm-up days (< 5 prior observations) and flat regimes
    (sd = 0) are withheld rather than emitted with degenerate bands.

    Scale shape: the fact scan folds to (type, day) cardinality first;
    one partitioned sort serves the rolling mean, sigma, and count
    frames together (a single window spec). Output is at most one row
    per stream-day."""
    ev = tables(spark, sf_dir).events.filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.sum("value").alias("tot"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-(_BOLL_WIN - 1), -1)
    )
    banded = daily.select(
        "event_type",
        "day",
        "tot",
        F.avg("tot").over(w).alias("mu"),
        F.stddev_samp("tot").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    )
    lo = F.col("mu") - _BOLL_K * F.col("sd")
    hi = F.col("mu") + _BOLL_K * F.col("sd")
    return banded.filter(
        (F.col("n_win") >= _BOLL_MIN) & (F.col("sd") > 0)
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        rnd("tot", 4).alias("value"),
        rnd("mu", 4).alias("band_mid"),
        rnd(lo, 4).alias("band_lo"),
        rnd(hi, 4).alias("band_hi"),
        (F.col("tot") > hi).alias("breach_hi"),
        (F.col("tot") < lo).alias("breach_lo"),
    )


# --------------------------------------------------------------------------
# RSI (Cutler's SMA variant) over the daily revenue series per priority
# --------------------------------------------------------------------------

_RSI_P = 14


@query(
    "window_rsi_cutler",
    oracle=f"""
    WITH daily AS (
        SELECT o_orderpriority AS priority,
               strftime(date_trunc('day', o_orderdate), '%Y-%m-%d') AS day,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1, 2
    ),
    delta AS (
        SELECT priority, day, revenue,
               revenue - lag(revenue) OVER w AS d,
               row_number() OVER w AS rn
        FROM daily
        WINDOW w AS (PARTITION BY priority ORDER BY day)
    ),
    gl AS (
        SELECT priority, day, revenue, rn,
               avg(greatest(d, 0)) OVER (
                   PARTITION BY priority ORDER BY day
                   ROWS BETWEEN {_RSI_P - 1} PRECEDING AND CURRENT ROW
               ) AS avg_gain,
               avg(greatest(-d, 0)) OVER (
                   PARTITION BY priority ORDER BY day
                   ROWS BETWEEN {_RSI_P - 1} PRECEDING AND CURRENT ROW
               ) AS avg_loss
        FROM delta
    )
    SELECT priority, day, revenue,
           CASE WHEN avg_loss = 0 THEN 100.0
                ELSE round(100.0 - 100.0 / (1.0 + avg_gain / avg_loss), 4)
           END AS rsi
    FROM gl WHERE rn > {_RSI_P}
    """,
)
def window_rsi_cutler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (Cutler's simple-moving-average variant,
    period 14) over the daily order-revenue series per priority class.
    Cutler's form is chosen deliberately over Wilder's: the SMA of
    gains/losses is a fixed ROWS frame — expressible as a pure window
    aggregate in any engine — where Wilder's exponential smoothing is a
    running recurrence that would force a sequential scan per series.
    Warm-up rows (fewer than 14 deltas) are dropped; a zero-loss frame
    pegs RSI at 100 by convention.

    Scale shape: orders collapse to (priority, day) revenue first
    (mergeable, bounded by the calendar), so the window operates on
    day-grain series — one shuffle on the series key, local sorts,
    output bounded by days x priorities."""
    orders = tables(spark, sf_dir).orders
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.date_format(F.date_trunc("day", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "day"
        ),
    ).agg(rnd(F.sum("o_totalprice"), 2).alias("revenue"))
    w = Window.partitionBy("priority").orderBy("day")
    delta = daily.select(
        "priority",
        "day",
        "revenue",
        (F.col("revenue") - F.lag("revenue").over(w)).alias("d"),
        F.row_number().over(w).alias("rn"),
    )
    wf = w.rowsBetween(-(_RSI_P - 1), Window.currentRow)
    gl = delta.select(
        "priority",
        "day",
        "revenue",
        "rn",
        F.avg(F.greatest(F.col("d"), F.lit(0.0))).over(wf).alias("avg_gain"),
        F.avg(F.greatest(-F.col("d"), F.lit(0.0))).over(wf).alias("avg_loss"),
    )
    return gl.filter(F.col("rn") > _RSI_P).select(
        "priority",
        "day",
        "revenue",
        F.when(F.col("avg_loss") == 0, F.lit(100.0))
        .otherwise(
            rnd(100.0 - 100.0 / (1.0 + F.col("avg_gain") / F.col("avg_loss")), 4)
        )
        .alias("rsi"),
    )
