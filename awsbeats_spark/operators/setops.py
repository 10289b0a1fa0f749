"""Set operators (union / intersect / except) — engine extension
(absent in the reference, SURVEY.md §2.C).

Scale notes: distinct set semantics imply a shuffle on the full row; at
100 TB prefer pushing the distinct below the union (dedup each branch
first) when branches are individually large but overlap-heavy — Catalyst
does not do that rewrite automatically for unions of similar size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.registry import query


@query(
    "set_union",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): building-segment customers ∪ big spenders."""
    t = tables(spark, sf_dir)
    a = t.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = t.orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — compiles to a left-semi join over distinct rows."""
    t = tables(spark, sf_dir)
    a = t.customer.filter(F.col("c_acctbal") > 0).select(F.col("c_custkey").alias("custkey"))
    b = t.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — compiles to a left-anti join over distinct
    rows (DataFrame.subtract == SQL EXCEPT). The price filter keeps the
    difference non-empty (every customer has some order)."""
    t = tables(spark, sf_dir)
    a = t.customer.select(F.col("c_custkey").alias("custkey"))
    b = t.orders.filter(F.col("o_totalprice") > 250000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: each custkey appears
    min(count_left, count_right) times, the SQL-standard multiplicity
    rule. Distinct-free set ops matter at scale because they skip the
    global dedup shuffle the DISTINCT variants pay; Spark compiles
    intersectAll to a partial-count aggregate + generate (counts
    travel, not rows). Sources deliberately carry duplicates (a
    customer has many orders) so the ALL semantics are actually
    exercised."""
    t = tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = t.orders.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: each custkey appears
    max(count_left - count_right, 0) times. Same no-global-distinct
    scale property as set_intersect_all; the multiplicity arithmetic is
    where engines diverge if either side silently dedups, which the
    hash compare would catch."""
    t = tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = t.orders.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.exceptAll(b)


@query(
    "set_symmetric_diff_all",
    oracle="""
    WITH a AS (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ),
    b AS (
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 120000
    ),
    ca AS (SELECT custkey, count(*) AS na FROM a GROUP BY custkey),
    cb AS (SELECT custkey, count(*) AS nb FROM b GROUP BY custkey)
    SELECT coalesce(ca.custkey, cb.custkey) AS custkey,
           CAST(coalesce(na, 0) AS BIGINT) AS n_left,
           CAST(coalesce(nb, 0) AS BIGINT) AS n_right,
           CAST(abs(coalesce(na, 0) - coalesce(nb, 0)) AS BIGINT)
               AS multiplicity
    FROM ca FULL JOIN cb USING (custkey)
    WHERE coalesce(na, 0) <> coalesce(nb, 0)
    """,
)
def set_symmetric_diff_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset SYMMETRIC DIFFERENCE — the set op SQL doesn't name:
    keys whose multiplicities differ between the two bags, with
    |count_left - count_right| as the surviving multiplicity (the bag
    analog of XOR; equal-count keys vanish). Completes the ALL-variant
    family next to [[set_intersect_all]] (min) and [[set_except_all]]
    (clamped difference).

    Scale shape: computed COUNT-WISE, not row-wise — each side
    collapses to (key, count) with map-side combine before a single
    full outer join on the key, so multiplicities travel as one long
    per key instead of repeated rows (the same counts-travel trick
    Spark's intersectAll compiles to, here made explicit because no
    built-in exists). The diff-count grain is also the USEFUL output
    for the op's main job — reconciling two table snapshots — where
    "which keys changed and by how much" beats a bag of repeated
    rows."""
    t = tables(spark, sf_dir)
    a = t.orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = t.orders.filter(F.col("o_totalprice") > 120000).select(
        F.col("o_custkey").alias("custkey")
    )
    ca = a.groupBy("custkey").agg(F.count(F.lit(1)).alias("na"))
    cb = b.groupBy("custkey").agg(F.count(F.lit(1)).alias("nb"))
    joined = ca.join(cb, "custkey", "full")
    nl = F.coalesce(F.col("na"), F.lit(0))
    nr = F.coalesce(F.col("nb"), F.lit(0))
    return (
        joined.select(
            "custkey",
            nl.alias("n_left"),
            nr.alias("n_right"),
            F.abs(nl - nr).alias("multiplicity"),
        )
        .filter(F.col("n_left") != F.col("n_right"))
    )


# --------------------------------------------------------------------------
# Multiset snapshot reconciliation (full compare report, all statuses)
# --------------------------------------------------------------------------

_MSC_SPLIT_DAY = "2024-01-16"  # first vs second half of the event month


@query(
    "set_multiset_compare",
    oracle=f"""
    WITH a AS (
        SELECT user_id, count(*) AS n_left FROM events
        WHERE date_trunc('day', ts) < DATE '{_MSC_SPLIT_DAY}'
        GROUP BY user_id
    ),
    b AS (
        SELECT user_id, count(*) AS n_right FROM events
        WHERE date_trunc('day', ts) >= DATE '{_MSC_SPLIT_DAY}'
        GROUP BY user_id
    )
    SELECT coalesce(a.user_id, b.user_id) AS user_id,
           CAST(coalesce(a.n_left, 0) AS BIGINT) AS n_left,
           CAST(coalesce(b.n_right, 0) AS BIGINT) AS n_right,
           CAST(coalesce(b.n_right, 0) - coalesce(a.n_left, 0) AS BIGINT)
               AS delta,
           CASE WHEN a.user_id IS NULL THEN 'right_only'
                WHEN b.user_id IS NULL THEN 'left_only'
                WHEN a.n_left = b.n_right THEN 'equal'
                WHEN b.n_right > a.n_left THEN 'count_up'
                ELSE 'count_down' END AS status
    FROM a FULL JOIN b ON a.user_id = b.user_id
    """,
)
def set_multiset_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full multiset RECONCILIATION report between two snapshots — here
    the per-user event multiset of the first vs second half of the
    month — one row per key with both multiplicities, the signed delta,
    and a status taxonomy (left_only / right_only / equal / count_up /
    count_down). The complete-compare sibling of
    [[set_symmetric_diff_all]] (which emits only the mismatched keys):
    reconciliation jobs need the EQUAL rows too, because "n keys
    compared, k equal" is the audit headline, and the signed delta
    (not |delta|) says which snapshot gained.

    Scale shape: each side collapses to (key, count) with map-side
    combine before ONE full outer join on the key — multiplicities
    travel as a long per key, never as repeated rows; at 100 TB this
    is the snapshot-diff plan for any two table versions (swap the
    date predicate for version predicates)."""
    t = tables(spark, sf_dir)
    split = F.lit(_MSC_SPLIT_DAY).cast("date")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    a = (
        t.events.filter(day < split)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_left"))
    )
    b = (
        t.events.filter(day >= split)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_right"))
    )
    aa, bb = a.alias("a"), b.alias("b")
    joined = aa.join(bb, F.col("a.user_id") == F.col("b.user_id"), "full")
    nl = F.coalesce(F.col("n_left"), F.lit(0))
    nr = F.coalesce(F.col("n_right"), F.lit(0))
    status = (
        F.when(F.col("a.user_id").isNull(), F.lit("right_only"))
        .when(F.col("b.user_id").isNull(), F.lit("left_only"))
        .when(F.col("n_left") == F.col("n_right"), F.lit("equal"))
        .when(F.col("n_right") > F.col("n_left"), F.lit("count_up"))
        .otherwise(F.lit("count_down"))
    )
    return joined.select(
        F.coalesce(F.col("a.user_id"), F.col("b.user_id")).alias("user_id"),
        nl.alias("n_left"),
        nr.alias("n_right"),
        (nr - nl).alias("delta"),
        status.alias("status"),
    )


# --------------------------------------------------------------------------
# Relational division (÷): users who performed ALL event types
# --------------------------------------------------------------------------


@query(
    "set_relational_division",
    oracle="""
    WITH types AS (SELECT DISTINCT event_type FROM events),
    k AS (SELECT count(*) AS n_types FROM types),
    per_user AS (
        SELECT user_id,
               count(DISTINCT event_type) AS n_distinct,
               count(*) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_distinct AS BIGINT) AS n_distinct_types,
           CAST(n_events AS BIGINT) AS n_events
    FROM per_user CROSS JOIN k
    WHERE n_distinct = k.n_types
    """,
)
def set_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational DIVISION (Codd's ÷, the eighth classic operator and
    the one SQL never got a keyword for): the users who performed
    EVERY event type in the corpus — divide(events[user, type],
    types[type]). Implemented as the standard count-comparison
    rewrite: a user qualifies iff their distinct-type count equals the
    divisor's cardinality, which turns the double-negation
    (NOT EXISTS ... NOT EXISTS) textbook form into two keyed
    aggregates and a broadcast scalar — the shape that scales
    (the NOT EXISTS form is a correlated anti-join per divisor row;
    [[join_not_in_vs_not_exists]] covers that family's semantics).
    Completes the setops module: union/intersect/except handle
    rows-as-sets, [[set_multiset_compare]] handles bags, division
    handles the for-all quantifier.

    Scale shape: one distinct-aggregate per user (map-side partial on
    (user, type) first), a |types|-row divisor reduced to one scalar,
    broadcast; no shuffle beyond the user-keyed fold.
    """
    t = tables(spark, sf_dir)
    k = t.events.select("event_type").distinct().agg(
        F.count(F.lit(1)).alias("n_types")
    )
    # distinct-count and plain count as SEPARATE aggregates joined on
    # the key: mixing them in one agg forces an Expand (the documented
    # 60x-at-10x anti-pattern; see agg_median_two_pass_binned note)
    distinct_types = (
        t.events.select("user_id", "event_type")
        .distinct()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    totals = t.events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    per_user = distinct_types.join(totals, "user_id")
    return (
        per_user.crossJoin(F.broadcast(k))
        .filter(F.col("n_distinct") == F.col("n_types"))
        .select(
            "user_id",
            F.col("n_distinct").cast("long").alias("n_distinct_types"),
            F.col("n_events").cast("long").alias("n_events"),
        )
    )
