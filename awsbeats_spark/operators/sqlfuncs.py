"""Extended SQL-surface operators: conditional/selective aggregates,
regression aggregates, higher-order array functions, date-series
generation, positional explode, and array set algebra.

The reference has none of these (its only aggregation is the observer
counters — /root/reference/streams/client.go:87-96); all are engine
extensions per SURVEY.md §2.C, expressed in built-in JVM functions so
Catalyst keeps them inside whole-stage codegen.

Scale notes are per-operator; the common theme is that every array /
higher-order expression is a pure projection (no shuffle), and every
aggregate is partial-aggregated map-side before its one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query

# Deterministic argmax/argmin ordering: o_totalprice carries ties at
# sf>=0.01, so the ordering value mixes in the unique key at a scale
# (1e-9) far above double ulp at price magnitude (~1e-10) but far below
# any real price gap. Both engines evaluate the identical expression, so
# the selected row agrees bit-for-bit.
_PRICE_TIEBREAK = "(o_totalprice + o_orderkey * 1e-9)"


@query(
    "agg_conditional_bools",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_big,
           bool_or(o_orderstatus = 'F')       AS any_final,
           bool_and(o_totalprice > 0)         AS all_positive,
           max_by(o_orderkey, {_PRICE_TIEBREAK}) AS top_order,
           min_by(o_orderkey, {_PRICE_TIEBREAK}) AS bottom_order
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_conditional_bools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / boolean / selective aggregates in one pass:
    count_if, bool_or, bool_and, max_by, min_by.

    Scale: all five are algebraic aggregates with map-side partials —
    shuffle volume is O(groups × 5 scalars) regardless of row count.
    max_by/min_by in particular replace the window-sort idiom
    (row_number + filter) with a partial-aggregatable argmax."""
    t = tables(spark, sf_dir)
    tiebreak = F.col("o_totalprice") + F.col("o_orderkey") * F.lit(1e-9)
    return t.orders.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_final"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.max_by("o_orderkey", tiebreak).alias("top_order"),
        F.min_by("o_orderkey", tiebreak).alias("bottom_order"),
    )


@query(
    "agg_regression_by_group",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6)        AS r2,
           round(corr(l_extendedprice, l_quantity), 6)           AS price_qty_corr,
           count(*)                                              AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit (price explained by quantity)
    via the SQL regression aggregate family.

    Scale: regr_* are algebraic (sums / sums-of-products moments), so the
    fit is one partial-aggregated pass — no per-group data collection, no
    iteration. The moments shuffle as 6 doubles per group."""
    t = tables(spark, sf_dir)
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return t.lineitem.groupBy("l_returnflag").agg(
        rnd(F.regr_slope(y, x), 4).alias("slope"),
        rnd(F.regr_intercept(y, x), 2).alias("intercept"),
        rnd(F.regr_r2(y, x), 6).alias("r2"),
        rnd(F.corr(y, x), 6).alias("price_qty_corr"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "scalar_higher_order",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), t -> len(t) > 3))
               AS n_long_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '), t -> len(t)))
               AS BIGINT) AS total_token_len,
           CAST(list_max(list_transform(string_split(text, ' '), t -> len(t)))
               AS BIGINT) AS max_token_len
    FROM documents
    """,
)
def scalar_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — transform (map), filter, aggregate
    (fold) — over the tokenized document text.

    Scale: lambdas compile to JVM expressions evaluated per-row inside
    whole-stage codegen; the token arrays never materialize outside the
    row, so this is shuffle-free and Python-free at any data size."""
    t = tables(spark, sf_dir)
    toks = F.split("text", " ", -1)
    lens = F.transform(toks, lambda tok: F.length(tok).cast("long"))
    return t.documents.select(
        "doc_id",
        F.size(F.filter(toks, lambda tok: F.length(tok) > 3)).alias("n_long_tokens"),
        F.aggregate(lens, F.lit(0).cast("long"), lambda acc, x: acc + x).alias(
            "total_token_len"
        ),
        F.array_max(lens).alias("max_token_len"),
    )


@query(
    "scalar_sequence_months",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('month', min(o_orderdate)) AS mn,
               date_trunc('month', max(o_orderdate)) AS mx
        FROM orders
    ),
    months AS (
        SELECT unnest(generate_series(mn, mx, INTERVAL 1 MONTH)) AS month
        FROM bounds
    ),
    counts AS (
        SELECT date_trunc('month', o_orderdate) AS month,
               count(*)                         AS n_orders,
               round(sum(o_totalprice), 2)      AS total_price
        FROM orders
        GROUP BY 1
    )
    SELECT m.month,
           coalesce(c.n_orders, 0)      AS n_orders,
           coalesce(c.total_price, 0.0) AS total_price
    FROM months m LEFT JOIN counts c USING (month)
    """,
)
def scalar_sequence_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-free monthly calendar via sequence() + explode, left-joined to
    per-month order totals (months with no orders surface as zero rows —
    the dual of GROUP BY, which silently drops empty buckets).

    Scale: the generated axis is O(months) — tiny — so it broadcasts;
    the only shuffle is the per-month partial aggregate of orders."""
    t = tables(spark, sf_dir)
    bounds = t.orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("mn"),
        F.date_trunc("month", F.max("o_orderdate")).alias("mx"),
    )
    months = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 month"))).alias("month")
    )
    counts = t.orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        rnd(F.sum("o_totalprice"), 2).alias("total_price"),
    )
    return months.join(F.broadcast(counts), "month", "left").select(
        "month",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("total_price", F.lit(0.0)).alias("total_price"),
    )


@query(
    "lateral_posexplode",
    oracle="""
    SELECT doc_id,
           t.pos AS pos,
           string_split(text, ' ')[t.pos] AS tok
    FROM documents,
         unnest(generate_series(1, least(3, len(string_split(text, ' ')))))
             AS t(pos)
    """,
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode — the first three tokens of each document with
    their 1-based ordinal, i.e. UNNEST ... WITH ORDINALITY.

    Scale: posexplode is a Generate node fused into the scan stage — row
    expansion happens pipelined, no shuffle; slicing BEFORE exploding
    caps the expansion factor at 3× regardless of document length."""
    t = tables(spark, sf_dir)
    toks = F.split("text", " ", -1)
    return t.documents.select(
        "doc_id", F.posexplode(F.slice(toks, 1, 3)).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok")


@query(
    "scalar_array_setops",
    oracle="""
    WITH toked AS (
        SELECT doc_id,
               string_split(lower(text), ' ') AS toks
        FROM documents
    ),
    ht AS (
        SELECT doc_id,
               toks[1:8] AS head8,
               toks[greatest(len(toks) - 7, 1):len(toks)] AS tail8
        FROM toked
    )
    SELECT doc_id,
           len(list_distinct(list_cat(head8, tail8))) AS n_union,
           len(list_intersect(head8, tail8))          AS n_common,
           -- coalesce: DuckDB array_to_string([]) is NULL where Spark
           -- array_join([]) is '' (sf0.1 sweep, round 10 — five docs
           -- whose head vocabulary is fully contained in the tail)
           coalesce(array_to_string(
               list_sort(list_distinct(
                   list_filter(head8, t -> NOT list_contains(tail8, t)))), ','),
               '') AS head_only
    FROM ht
    """,
)
def scalar_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra — union / intersect / except between the first
    and last 8 tokens of each document (a cheap head-vs-tail vocabulary
    overlap probe).

    Scale: pure per-row expressions; the distinct/sort operate on ≤16
    element arrays inside the row, never across rows — shuffle-free."""
    t = tables(spark, sf_dir)
    toks = F.split(F.lower("text"), " ", -1)
    d = t.documents.select(
        "doc_id",
        F.slice(toks, 1, 8).alias("head8"),
        F.slice(
            toks, F.greatest(F.size(toks) - 7, F.lit(1)), 8
        ).alias("tail8"),
    )
    return d.select(
        "doc_id",
        F.size(F.array_union("head8", "tail8")).alias("n_union"),
        F.size(F.array_intersect("head8", "tail8")).alias("n_common"),
        F.array_join(F.array_sort(F.array_except("head8", "tail8")), ",").alias(
            "head_only"
        ),
    )


@query(
    "cdc_apply_tombstones",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type, value, ts,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY user_id) AS n_ops
        FROM events
    )
    SELECT user_id,
           event_type          AS last_op,
           round(value, 2)     AS last_value,
           ts                  AS last_ts,
           n_ops
    FROM ranked
    WHERE rn = 1 AND event_type <> 'error'
    """,
)
def cdc_apply_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply with tombstone semantics: replay each user's ordered op
    stream (events as a change log), keep the final state per key, and
    drop keys whose LAST op is a tombstone ('error' here) — i.e. the
    MERGE of an upsert+delete changelog into a snapshot.

    Extends dedup_latest_per_key with delete semantics — the missing
    piece for maintaining a mutable table from an append-only stream
    (the reference pipeline is append-only; at-least-once redelivery
    makes last-writer-wins exactly this computation).

    Scale: one shuffle on user_id serves both window functions (same
    partition key); the tombstone filter is post-window and free."""
    t = tables(spark, sf_dir)
    by_user = Window.partitionBy("user_id")
    w = by_user.orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .withColumn("n_ops", F.count(F.lit(1)).over(by_user))
        .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            rnd("value", 2).alias("last_value"),
            F.col("ts").alias("last_ts"),
            "n_ops",
        )
    )


@query(
    "scalar_variant_json",
    oracle="""
    WITH docs AS (
        SELECT event_id,
               json_object(
                   'who', json_object('user_id', user_id,
                                      'event_type', event_type),
                   'vals', json_array(value, value * 2),
                   'k', CAST(json_extract(props, '$.k') AS INTEGER)
               ) AS doc
        FROM events
    )
    SELECT event_id,
           json_extract_string(doc, '$.who.event_type')       AS who_type,
           CAST(json_extract(doc, '$.k') AS INTEGER)          AS k,
           round(CAST(json_extract(doc, '$.vals[1]') AS DOUBLE), 6)
               AS second_val
    FROM docs
    """,
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured round trip through Spark 4's VARIANT type: build a
    nested JSON document from typed columns, parse_json it into a
    variant, extract typed fields back out with variant_get paths.

    This is the engine's answer to the reference's schema-less
    `common.MapStr` events (SURVEY.md §1.2,
    /root/reference/streams/partition_key.go:26-38): keep the dynamic
    remainder as VARIANT, extract-and-cast lazily at query time.

    Scale: variant parse/extract are JVM expressions in the projection —
    no shuffle, no Python; VARIANT's binary encoding avoids re-parsing
    the JSON text per extraction (the get paths read the parsed tree)."""
    t = tables(spark, sf_dir)
    doc = F.to_json(
        F.struct(
            F.struct("user_id", "event_type").alias("who"),
            F.array(F.col("value"), F.col("value") * 2).alias("vals"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
    )
    v = F.parse_json(doc)
    return t.events.select(
        "event_id",
        F.variant_get(v, "$.who.event_type", "string").alias("who_type"),
        F.variant_get(v, "$.k", "int").alias("k"),
        rnd(F.variant_get(v, "$.vals[1]", "double"), 6).alias("second_val"),
    )


@query(
    "scalar_interval_math",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS VARCHAR) AS due_date,
           CAST(CAST(o_orderdate - INTERVAL 1 MONTH AS DATE) AS VARCHAR) AS prior_month,
           datediff('day', DATE '2024-01-01', o_orderdate) AS days_into_2024,
           round(12 * (year(o_orderdate) - 2020)
                 + (month(o_orderdate) - 6)
                 + (day(o_orderdate) - 15) / 31.0, 4) AS months_since_mid_2020
    FROM orders
    """,
)
def scalar_interval_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/date arithmetic family: +- INTERVAL, datediff, and a
    months_between equivalent. months_between's fractional rule (31-day
    divisor on the day remainder) is spelled out identically on both
    engines so the oracle is bit-stable; all expressions are
    whole-stage-codegen projections."""
    t = tables(spark, sf_dir)
    o = t.orders
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).cast("date").cast("string").alias("due_date"),
        (F.col("o_orderdate") - F.expr("INTERVAL 1 MONTH")).cast("date").cast("string").alias("prior_month"),
        F.datediff(F.col("o_orderdate"), F.lit("2024-01-01").cast("date")).alias(
            "days_into_2024"
        ),
        rnd(
            12 * (F.year("o_orderdate") - 2020)
            + (F.month("o_orderdate") - 6)
            + (F.dayofmonth("o_orderdate") - 15) / 31.0,
            4,
        ).alias("months_since_mid_2020"),
    )


@query(
    "agg_string_concat_ordered",
    oracle="""
    SELECT o_custkey,
           string_agg(o_orderpriority, '|' ORDER BY o_orderkey) AS priorities,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def agg_string_concat_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg ... ORDER BY):
    per-customer priority history concatenated in order-key order. Spark
    expresses it as collect_list of (sort_key, value) structs +
    array_sort + transform + array_join — all one aggregate pass; the
    struct sort happens on the grouped arrays (bounded per key), not as
    a global sort."""
    t = tables(spark, sf_dir)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("o_orderkey", "o_orderpriority"))),
        lambda s: s["o_orderpriority"],
    )
    return t.orders.groupBy("o_custkey").agg(
        F.array_join(ordered, "|").alias("priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )
