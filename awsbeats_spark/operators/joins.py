"""Join operators: equi (shuffle + broadcast), semi/anti, outer,
theta/range, and as-of.

All absent in the reference (a delivery sink — SURVEY.md §2.C); this is
the engine extension. Every join documents its scale strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd, rnd_sql
from awsbeats_spark.registry import query


@query(
    "join_inner_hash",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big-big equi join: both sides shuffle on the key (sort-merge or
    shuffled-hash, AQE's choice). The o_orderstatus filter is pushed
    below the join so only matching rows shuffle."""
    t = tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_orderstatus") == "F")
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT p_brand,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100, 0) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 20
    GROUP BY p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⨝ small dim with an explicit broadcast hint: zero shuffle on
    the 100-TB fact side — the filtered dim ships to every executor."""
    t = tables(spark, sf_dir)
    part = t.part.filter(F.col("p_size") <= 20)
    return (
        t.lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            # exact integer-cents revenue (sf1 hardening, round 11)
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
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey)                       AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers without orders (count=0)."""
    t = tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            rnd(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 100000
    )
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join: probe side never duplicates rows and
    only the join key of the build side shuffles."""
    t = tables(spark, sf_dir)
    big_orders = t.orders.filter(F.col("o_totalprice") > 100000)
    return (
        t.customer.join(big_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 250000
    )
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join (customers with no quarter-million
    order — every customer has SOME order in this data, so the filter
    keeps the anti-join result non-trivial)."""
    t = tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 250000)
    return (
        t.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_acctbal")
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT s_suppkey, s_name, c_custkey,
           round(abs(s_acctbal - c_acctbal), 2) AS bal_gap
    FROM supplier
    JOIN customer
      ON s_nationkey = c_nationkey
     AND c_acctbal BETWEEN s_acctbal - 500 AND s_acctbal + 500
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/band join: the equi component (nationkey) lets Spark hash-
    partition; the band predicate is evaluated post-match. At 100 TB with
    no equi component you'd bucketize the range key (floor(bal/500)) and
    equi-join on adjacent buckets — same result, hash-joinable."""
    t = tables(spark, sf_dir)
    s, c = t.supplier, t.customer
    return (
        s.join(
            c,
            (F.col("s_nationkey") == F.col("c_nationkey"))
            & F.col("c_acctbal").between(F.col("s_acctbal") - 500, F.col("s_acctbal") + 500),
        )
        .select(
            "s_suppkey",
            "s_name",
            "c_custkey",
            rnd(F.abs(F.col("s_acctbal") - F.col("c_acctbal")), 2).alias("bal_gap"),
        )
    )


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id  AS purchase_id,
           p.user_id   AS user_id,
           c.event_id  AS last_click_id,
           round(c.value, 2) AS last_click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        SELECT user_id, ts, min(event_id) AS event_id,
               min_by(value, event_id) AS value
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each purchase, the most
    recent click by the same user at-or-before the purchase time.

    Implemented as the scalable union-and-carry pattern: tag both sides,
    union, and carry the last click forward with a window running over
    (user_id, ts) — ONE shuffle on user_id, no pairwise expansion, no
    pandas. Clicks sort before purchases at equal ts (kind ordering) to
    honor the >= bound. Among clicks TIED at the same (user, ts) the
    smallest event_id wins — without a pinned winner both engines pick
    an arbitrary tie member and diverge (surfaced by the sf1 replica's
    duplicated-timestamp clones in join_asof_forward, round 11): the
    window orders tied click_ids DESC so the frame-last row is the
    minimum id, and the oracle pre-collapses ties to that same winner
    before DuckDB's native ASOF JOIN (which has no tie rule of its
    own).

    Single-parse selectExpr build (round 12): the Column-API form cost
    492 py4j roundtrips / 0.14 s of the query's 0.41 s wall — all
    driver-side construction for a sub-second query (guide §1; the same
    conversion the round-11 text/similarity builds got). Expression
    trees are identical, pinned bit-wise by tests/test_r12_builds.py."""
    t = tables(spark, sf_dir)
    ev = t.events
    clicks = ev.where("event_type = 'click'").selectExpr(
        "user_id",
        "ts",
        "0 AS kind",
        "event_id AS click_id",
        "value AS click_value",
        "CAST(NULL AS BIGINT) AS purchase_id",
    )
    purchases = ev.where("event_type = 'purchase'").selectExpr(
        "user_id",
        "ts",
        "1 AS kind",
        "CAST(NULL AS BIGINT) AS click_id",
        "CAST(NULL AS DOUBLE) AS click_value",
        "event_id AS purchase_id",
    )
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts, kind, click_id DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return (
        clicks.unionByName(purchases)
        .selectExpr(
            "purchase_id",
            "user_id",
            "kind",
            f"last(click_id, true) {over} AS last_click_id",
            f"last(click_value, true) {over} AS last_click_value",
        )
        .where("kind = 1")
        .selectExpr(
            "purchase_id",
            "user_id",
            "last_click_id",
            f"{rnd_sql('last_click_value', 2)} AS last_click_value",
        )
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (
        SELECT c_nationkey AS nationkey, count(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ),
    sn AS (
        SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT coalesce(cn.nationkey, sn.nationkey) AS nationkey,
           coalesce(n_customers, 0) AS n_customers,
           coalesce(n_suppliers, 0) AS n_suppliers
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides — aggregate BEFORE the
    join so the outer join operates on O(groups) rows, not O(rows)."""
    t = tables(spark, sf_dir)
    cn = t.customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    sn = t.supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        cn.join(sn, "nationkey", "full_outer")
        .select(
            F.col("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "join_cross_limited",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def join_cross_limited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Cartesian product — legitimate only when one side is
    tiny and bounded (5 regions x 25 nations here). Spark requires the
    explicit crossJoin call precisely because an accidental cross product
    is the classic 100-TB query killer; the planner broadcasts the
    smaller side so no shuffle occurs."""
    t = tables(spark, sf_dir)
    return t.region.select("r_name").crossJoin(t.nation.select("n_name"))


@query(
    "join_interval_bucketed",
    oracle="""
    SELECT o_orderkey, o_orderdate AS window_start, count(*) AS n_shipped
    FROM orders
    JOIN lineitem ON l_shipdate >= o_orderdate
                 AND l_shipdate <  o_orderdate + INTERVAL 7 DAY
    WHERE o_orderkey % 97 = 0
    GROUP BY o_orderkey, o_orderdate
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join, bucketized: count lineitems shipped inside
    each sampled order's 7-day window. A pure range join (no equi key)
    is a nested-loop cross product in OSS Spark — quadratic at 100 TB.
    The scalable rewrite: explode each interval into its covered day
    buckets (8 rows per 7-day window), bucket each point by its day,
    equi-join on the bucket (hash join, co-partitioned shuffle), then
    re-check the exact containment predicate. Each point's day matches
    at most one exploded row per interval, so the bucket join produces
    no duplicate pairs and needs no post-dedup. Bucket width tunes the
    explode factor vs join selectivity; at any SF the shuffle carries
    interval_count x 8 + point_count rows instead of the cross product.

    Second-order scale fix (found by the 10x extrapolation run, alpha
    1.49 -- EXTRAPOLATION.md): when BOTH sides grow over a FIXED date
    domain, even the bucketed join enumerates points_per_day x
    intervals_per_day pairs -- quadratic in density. The exact cure is
    per-day pre-aggregation: a day FULLY contained in the window
    contributes its point COUNT (one row per day, bounded by the date
    domain, not by data size); only BOUNDARY days (partial coverage --
    possible only when interval endpoints are not midnight-aligned)
    fall back to point-level checking."""
    t = tables(spark, sf_dir)
    one_day = F.expr("INTERVAL 1 DAY")
    ivl = (
        t.orders.filter(F.col("o_orderkey") % 97 == 0)
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("window_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("window_end"),
        )
        .withColumn(
            "bucket_day",
            F.explode(
                F.sequence(
                    F.date_trunc("DAY", F.col("window_start")),
                    F.date_trunc("DAY", F.col("window_end")),
                    F.expr("INTERVAL 1 DAY"),
                )
            ),
        )
    )
    full_day = (F.col("bucket_day") >= F.col("window_start")) & (
        (F.col("bucket_day") + one_day) <= F.col("window_end")
    )
    pts = t.lineitem.select(
        "l_shipdate", F.date_trunc("DAY", F.col("l_shipdate")).alias("bucket_day")
    )
    day_counts = pts.groupBy("bucket_day").agg(F.count(F.lit(1)).alias("n_pts"))
    full = (
        ivl.filter(full_day)
        .join(day_counts, "bucket_day")
        .groupBy("o_orderkey", "window_start")
        .agg(F.sum("n_pts").alias("n_full"))
    )
    partial = (
        ivl.filter(~full_day)
        .join(pts, "bucket_day")
        .filter(
            (F.col("l_shipdate") >= F.col("window_start"))
            & (F.col("l_shipdate") < F.col("window_end"))
        )
        .groupBy("o_orderkey", "window_start")
        .agg(F.count(F.lit(1)).alias("n_part"))
    )
    n = F.coalesce(F.col("n_full"), F.lit(0)) + F.coalesce(F.col("n_part"), F.lit(0))
    return (
        full.join(partial, ["o_orderkey", "window_start"], "full_outer")
        .select("o_orderkey", "window_start", n.cast("bigint").alias("n_shipped"))
        .filter(F.col("n_shipped") > 0)
    )


@query(
    "join_asof_nearest",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id  AS user_id,
           c.event_id AS nearest_click_id,
           c.ts       AS nearest_click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
        SELECT event_id, ts
        FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
        ORDER BY abs(epoch(p.ts) - epoch(c.ts)), c.ts, c.event_id
        LIMIT 1
    ) c ON true
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-event as-of join (pandas merge_asof direction='nearest'):
    for each purchase, the click by the same user closest in time in
    EITHER direction, ties to the earlier click. One union-and-carry
    pass computes both candidates — the last click at-or-before
    (forward carry) and the first click after (backward carry over the
    same sorted run) — then a row-local comparison picks the smaller
    |Δt|. ONE shuffle on user_id total, versus the oracle's per-row
    lateral scan which is quadratic per user; at 100 TB the carry
    pattern is the only viable plan, and it reuses the single sort."""
    t = tables(spark, sf_dir)
    ev = t.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    both = clicks.unionByName(purchases)
    # tie rule (sf1 finding, round 11): among clicks tied at the same
    # (user, ts) the SMALLEST event_id wins on both carry directions,
    # matching the oracle's explicit ORDER BY ..., c.ts, c.event_id —
    # backward carry orders tied ids DESC so frame-last is the min,
    # forward carry orders ASC so frame-first is the min.
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", F.col("click_id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "click_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_ts = F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(wb)
    prev_id = F.last("click_id", ignorenulls=True).over(wb)
    next_ts = F.first(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(wf)
    next_id = F.first("click_id", ignorenulls=True).over(wf)
    d_prev = F.col("p_ts").cast("double") - F.col("prev_ts").cast("double")
    d_next = F.col("next_ts").cast("double") - F.col("p_ts").cast("double")
    # prev wins ties (earlier click); a missing side loses automatically.
    use_prev = F.col("prev_ts").isNotNull() & (
        F.col("next_ts").isNull() | (d_prev <= d_next)
    )
    return (
        both.withColumn("prev_ts", prev_ts)
        .withColumn("prev_id", prev_id)
        .withColumn("next_ts", next_ts)
        .withColumn("next_id", next_id)
        .filter(F.col("kind") == 1)
        .withColumnRenamed("ts", "p_ts")
        .select(
            F.col("purchase_id"),
            F.col("user_id"),
            F.when(use_prev, F.col("prev_id"))
            .otherwise(F.col("next_id"))
            .alias("nearest_click_id"),
            F.when(use_prev, F.col("prev_ts"))
            .otherwise(F.col("next_ts"))
            .alias("nearest_click_ts"),
        )
    )


_FUZZY_MAX_DIST = 4


@query(
    "join_fuzzy_name_blocked",
    oracle=f"""
    WITH names AS (
        SELECT p_name, count(*) AS n_parts,
               string_split(p_name, ' ')[1] AS blk
        FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n_parts AS n_a, b.n_parts AS n_b
    FROM names a JOIN names b
      ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {_FUZZY_MAX_DIST}
    ORDER BY dist, name_a, name_b
    """,
)
def join_fuzzy_name_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-join: near-identical part names
    (Levenshtein distance <= 4) found WITHOUT an O(n^2) cross join —
    candidate pairs are restricted to a blocking key (first name word)
    before the edit-distance predicate runs. Engine extension: the
    name/record-linkage step of a dedup pipeline, same
    block-then-verify shape as the MinHash band join (llm/dedup.py).

    Scale: dedupe to distinct names FIRST (the distinct-name relation
    is tiny next to the row count), equi-join on the blocking key so
    the expensive Levenshtein only runs inside blocks, carry per-name
    row counts so downstream merges know the blast radius. A 100-TB
    run swaps the single blocking key for multiple redundant keys
    (first word, length band, soundex) unioned — same plan shape."""
    t = tables(spark, sf_dir)
    names = (
        t.part.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .withColumn("blk", F.split(F.col("p_name"), " ")[0])
    )
    a = names.alias("a")
    b = names.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(dist <= _FUZZY_MAX_DIST)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            dist.alias("dist"),
            F.col("a.n_parts").alias("n_a"),
            F.col("b.n_parts").alias("n_b"),
        )
        .orderBy("dist", "name_a", "name_b")
    )


@query(
    "join_null_safe",
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           coalesce(a.pk, '(null)') AS key_repr
    FROM (SELECT event_id, json_extract_string(props, '$.k') AS pk
          FROM events WHERE event_id % 100 = 0) a
    JOIN (SELECT event_id, json_extract_string(props, '$.k') AS pk
          FROM events WHERE event_id % 100 = 50) b
      ON a.pk IS NOT DISTINCT FROM b.pk
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): rows whose
    extracted key is NULL on BOTH sides still match — the semantics CDC
    merges and late-enrichment joins need (plain equality silently drops
    every null-keyed row). Same hash-join physical shape: Spark hashes
    the null bucket like any other key value, so the plan stays an
    equi-join, not a nested loop."""
    t = tables(spark, sf_dir)
    pk = F.get_json_object("props", "$.k")
    a = t.events.filter(F.col("event_id") % 100 == 0).select(
        F.col("event_id").alias("id_a"), pk.alias("pk_a")
    )
    b = t.events.filter(F.col("event_id") % 100 == 50).select(
        F.col("event_id").alias("id_b"), pk.alias("pk_b")
    )
    return a.join(b, F.col("pk_a").eqNullSafe(F.col("pk_b"))).select(
        "id_a", "id_b", F.coalesce(F.col("pk_a"), F.lit("(null)")).alias("key_repr")
    )


@query(
    "join_dynamic_in_pushdown",
    oracle="""
    SELECT l_orderkey, l_partkey, l_extendedprice
    FROM lineitem
    WHERE l_partkey IN (
        SELECT p_partkey FROM part
        WHERE p_brand = 'Brand#13' AND p_size >= 45
    )
    """,
)
def join_dynamic_in_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join executed as a dynamic IN-list pushed into the fact scan.

    The dimension predicate (brand + size) selects a small key set; we
    collect those keys (one O(|keys|) driver action, guarded by a count
    cap) and turn the semi join into `isin(...)`, which Catalyst pushes
    into the parquet reader as `PushedFilters: [In(l_partkey, ...)]` —
    the fact side is pruned AT THE SCAN, before any join or shuffle
    exists. This is the manual twin of dynamic partition pruning /
    runtime row-group skipping: at 100 TB the IN-filter skips whole
    row groups via parquet min/max stats, where a broadcast semi join
    would still read and deserialize every fact row. Above the cap the
    operator falls back to a broadcast left-semi join (same result,
    still no fact shuffle).
    """
    t = tables(spark, sf_dir)
    dim = t.part.filter(
        (F.col("p_brand") == "Brand#13") & (F.col("p_size") >= 45)
    ).select("p_partkey")
    cap = 10_000
    keys = [r[0] for r in dim.limit(cap + 1).collect()]
    fact = t.lineitem.select("l_orderkey", "l_partkey", "l_extendedprice")
    if len(keys) > cap:  # key set too big for an IN literal: broadcast semi
        return fact.join(
            F.broadcast(dim), fact.l_partkey == dim.p_partkey, "left_semi"
        )
    return fact.filter(F.col("l_partkey").isin(keys))


# --------------------------------------------------------------------------
# Correlated key-hash join sampling (join cardinality/sum estimation)
# --------------------------------------------------------------------------

_SAMPLE_NIBBLES = ("0", "1", "2", "3")  # md5 first nibble -> p = 4/16


@query(
    "join_keyhash_sample_estimate",
    oracle="""
    WITH exact AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_rows,
               sum(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                        AS BIGINT)) AS exact_rev_c
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderpriority = '1-URGENT'
    ),
    sampled AS (
        SELECT CAST(count(*) AS BIGINT) AS s_rows,
               coalesce(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100, 0) AS BIGINT)), 0) AS s_rev_c
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderpriority = '1-URGENT'
          AND substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)
              IN ('0', '1', '2', '3')
    )
    SELECT e.exact_rows,
           CAST(round(s.s_rows * 4.0, 0) AS BIGINT) AS est_rows,
           round(CAST(e.exact_rev_c AS DOUBLE) / 100.0, 2) AS exact_revenue,
           round(CAST(s.s_rev_c * 4 AS DOUBLE) / 100.0, 2) AS est_revenue,
           round(abs(s.s_rows * 4.0 - e.exact_rows)
                 / e.exact_rows, 4) AS rows_rel_err,
           round(CAST(abs(s.s_rev_c * 4 - e.exact_rev_c) AS DOUBLE)
                 / CAST(e.exact_rev_c AS DOUBLE), 4) AS revenue_rel_err
    FROM exact e CROSS JOIN sampled s
    """,
)
def join_keyhash_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join estimation by CORRELATED key-hash sampling, with its error
    measured against the exact join. Sampling each side independently
    (Bernoulli on rows) breaks joins — a p-sample of each side keeps
    only p^2 of the matching pairs and, worse, a biased subset of the
    key distribution. The correct scheme samples the JOIN KEY DOMAIN:
    keep a key iff md5(key) falls in a fixed nibble range (p = 1/4
    here), apply the SAME predicate to both sides, and every surviving
    key keeps ALL its rows on both sides — the join inside the sample
    is exact, and totals scale back by 1/p (unbiased for sums over
    keys). This is how a 100 TB planner probes join cardinality / AQE
    validates statistics without running the join: the sample predicate
    pushes into both parquet scans (key is a scan column), the sampled
    join is ~p of the full join's shuffle, and the estimate's relative
    error is reported, not assumed. Hash sampling (not key % 4) keeps
    the sample content-addressed and free of key-assignment patterns;
    md5 makes the two engines (and every rerun) agree bit-for-bit."""
    t = tables(spark, sf_dir)
    keep = F.substring(
        F.md5(F.col("o_orderkey").cast("string")), 1, 1
    ).isin(*_SAMPLE_NIBBLES)
    orders = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    li = t.lineitem.select(
        "l_orderkey",
        # exact integer-cents revenue (sf1 finding, round 11: raw double
        # sums drift within the 2-dp round at sf1 magnitudes — the
        # q_nation_trade_balance integer-cents pattern)
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
        ).alias("rev_c"),
    )
    joined = orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
    exact = joined.agg(
        F.count(F.lit(1)).alias("exact_rows"),
        F.sum("rev_c").alias("exact_rev_c"),
    )
    sampled = (
        orders.filter(keep)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("s_rows"),
            F.coalesce(F.sum("rev_c"), F.lit(0)).alias("s_rev_c"),
        )
    )
    return exact.crossJoin(F.broadcast(sampled)).select(
        "exact_rows",
        F.round(F.col("s_rows") * 4.0, 0).cast("long").alias("est_rows"),
        rnd(F.col("exact_rev_c").cast("double") / 100.0, 2).alias(
            "exact_revenue"
        ),
        rnd((F.col("s_rev_c") * 4).cast("double") / 100.0, 2).alias(
            "est_revenue"
        ),
        rnd(
            F.abs(F.col("s_rows") * 4.0 - F.col("exact_rows"))
            # guard: exact_rows = 0 on an empty/filtered-out input is an
            # ANSI divide-by-zero, not a NULL — emit NULL rel err instead
            / F.when(F.col("exact_rows") > 0, F.col("exact_rows")),
            4,
        ).alias("rows_rel_err"),
        rnd(
            F.abs(F.col("s_rev_c") * 4 - F.col("exact_rev_c")).cast("double")
            / F.when(
                F.col("exact_rev_c") != 0, F.col("exact_rev_c").cast("double")
            ),
            4,
        ).alias("revenue_rel_err"),
    )


# --------------------------------------------------------------------------
# As-of join with staleness tolerance (reject too-old matches)
# --------------------------------------------------------------------------

_ASOF_TOLERANCE_S = 3600  # max staleness: 1 hour


@query(
    "join_asof_tolerance",
    oracle=f"""
    SELECT p.event_id AS purchase_id,
           p.user_id AS user_id,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.ts)
                     <= {_ASOF_TOLERANCE_S}::BIGINT * 1000000
                THEN c.event_id END AS last_click_id,
           CASE WHEN epoch_us(p.ts) - epoch_us(c.ts)
                     <= {_ASOF_TOLERANCE_S}::BIGINT * 1000000
                THEN CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000
                          AS BIGINT)
           END AS staleness_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        SELECT user_id, ts, min(event_id) AS event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound — the form every market-data /
    attribution pipeline actually runs: the most recent click at-or-
    before each purchase COUNTS ONLY IF it is at most 1 hour old;
    older matches are nulled (not dropped — the purchase row survives
    with an explicit no-attribution marker, which is the honest
    left-join contract). Same union-and-carry plan as join_asof (ONE
    shuffle on user_id, no pairwise expansion); the tolerance is a
    post-carry null-out, so it adds zero movement. At 100 TB the
    tolerance ALSO enables state pruning in the streaming twin: a
    carried click older than the bound can be dropped from state."""
    t = tables(spark, sf_dir)
    ev = t.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("click_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("click_id"),
        F.col("event_id").alias("purchase_id"),
    )
    # tied same-(user, ts) clicks: smallest event_id wins (DESC order so
    # the frame-last row is the min id — the join_asof tie rule; the
    # staleness value is tie-invariant because tied clicks share ts)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", F.col("click_id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # microsecond arithmetic on BOTH engines: whole-second truncation
    # (unix_timestamp vs DuckDB's fractional epoch()) flips boundary rows
    stale_us = F.unix_micros("ts") - F.unix_micros(
        F.last(F.when(F.col("kind") == 0, F.col("ts")), ignorenulls=True).over(w)
    )
    # freshness must test the MATERIALIZED staleness column: reusing the
    # stale_us expression after filter(kind == 1) would re-evaluate its
    # window over the purchase-only frame (no clicks -> always null)
    fresh = F.col("staleness_us") <= _ASOF_TOLERANCE_S * 1_000_000
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("staleness_us", stale_us)
        .filter(F.col("kind") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.when(fresh, F.col("last_click_id")).alias("last_click_id"),
            F.when(
                fresh, F.floor(F.col("staleness_us") / 1_000_000).cast("long")
            ).alias("staleness_s"),
        )
    )


@query(
    "join_existence_mark",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           EXISTS (
               SELECT 1 FROM lineitem
               WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
           ) AS has_return
    FROM orders
    """,
)
def join_existence_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mark join (existence flag as a COLUMN, not a filter): every order
    row survives, annotated with whether any returned lineitem exists —
    the shape semi/anti joins cannot produce because they drop rows.
    Implemented as the classic distinct-reduce + left join + IS NOT
    NULL mark: the probe side is first deduped to unique keys (at
    100 TB that collapses the 4-rows-per-order lineitem probe to |keys|
    before the join, and a returned-subset key table is often
    broadcast-able), so the join multiplies nothing and the mark is a
    null check. The SQL-facing twin is EXISTS in the SELECT list, which
    Spark plans as ExistenceJoin — same physical idea, declared
    declaratively."""
    t = tables(spark, sf_dir)
    returned = (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("mark", F.lit(1))
    )
    return t.orders.join(returned, "o_orderkey", "left").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("mark").isNotNull().alias("has_return"),
    )


@query(
    "join_asof_forward",
    oracle="""
    SELECT p.event_id  AS purchase_id,
           p.user_id   AS user_id,
           e.event_id  AS next_error_id,
           round(e.value, 2) AS next_error_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
        SELECT user_id, ts, min(event_id) AS event_id,
               min_by(value, event_id) AS value
        FROM events WHERE event_type = 'error'
        GROUP BY user_id, ts
    ) e
      ON p.user_id = e.user_id AND p.ts <= e.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the direction join_asof (backward),
    join_asof_nearest, and join_asof_tolerance don't cover: for each
    purchase, the user's NEXT error event at-or-after the purchase
    time (post-transaction failure attribution). Same union-and-carry
    plan as the backward op, mirrored: one shuffle on user_id, a
    first-forward window frame (current row to unbounded FOLLOWING)
    carrying the earliest later error back onto each purchase; at equal
    timestamps the purchase sorts before the error (kind ordering) so
    the <= bound is honored. Among errors TIED at the same (user, ts)
    the smallest event_id wins (sf1 finding, round 11: the replica's
    duplicated-timestamp clones made the frame-first row arbitrary —
    spark picked one clone, DuckDB's tie-rule-free ASOF another): the
    window adds error_id ASC so frame-first = minimum id, and the
    oracle pre-collapses ties to that same winner. DuckDB's native
    forward ASOF JOIN remains the oracle. No pairwise expansion at any
    scale — cost is the per-user sort any window op pays."""
    t = tables(spark, sf_dir)
    ev = t.events
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("error_id"),
        F.lit(None).cast("double").alias("error_value"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.col("event_id").alias("error_id"),
        F.col("value").alias("error_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "error_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    return (
        purchases.unionByName(errors)
        .withColumn(
            "next_error_id", F.first("error_id", ignorenulls=True).over(w)
        )
        .withColumn(
            "next_error_value",
            F.first("error_value", ignorenulls=True).over(w),
        )
        .filter(F.col("kind") == 0)
        .select(
            "purchase_id",
            "user_id",
            "next_error_id",
            rnd("next_error_value", 2).alias("next_error_value"),
        )
    )


@query(
    "join_not_in_vs_not_exists",
    oracle="""
    WITH sub AS (
        SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                    ELSE o_custkey END AS k
        FROM orders
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM sub)) AS n_not_in,
           (SELECT CAST(count(*) AS BIGINT) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey))
               AS n_not_exists,
           (SELECT CAST(count(*) AS BIGINT) FROM sub WHERE k IS NULL)
               AS n_null_keys,
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM sub))
           <> (SELECT count(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM sub
                                 WHERE sub.k = c.c_custkey))
               AS semantics_differ
    """,
)
def join_not_in_vs_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN vs NOT EXISTS under NULLs — executed, not explained: the
    subquery key (custkey, nulled where orderstatus='P') contains
    NULLs, so three-valued logic makes `NOT IN` vacuously empty while
    `NOT EXISTS` returns the true anti-join count. Both run for real:
    NOT IN exercises Spark's null-aware anti join (the plan that
    broadcasts the key set and checks the null flag — a genuinely
    different physical operator from the left-anti hash join NOT
    EXISTS compiles to), and the row reports both counts plus the null
    count so the trap is measured, not asserted. This is the audit a
    migration runs before porting Hive/warehouse SQL with NOT IN onto
    any engine.

    Scale shape: two anti-join-shaped subqueries against the same
    key projection; the null-aware variant requires the key set
    build-side (Spark broadcasts it — fine: it is one column of a
    dimension-sized subquery); counts fold to one row."""
    t = tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("nivne_orders")
    t.customer.createOrReplaceTempView("nivne_customer")
    return spark.sql(
        """
        WITH sub AS (
            SELECT CASE WHEN o_orderstatus = 'P' THEN NULL
                        ELSE o_custkey END AS k
            FROM nivne_orders
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM nivne_customer
                WHERE c_custkey NOT IN (SELECT k FROM sub)) AS n_not_in,
               (SELECT CAST(count(*) AS BIGINT) FROM nivne_customer c
                WHERE NOT EXISTS (SELECT 1 FROM sub
                                  WHERE sub.k = c.c_custkey))
                   AS n_not_exists,
               (SELECT CAST(count(*) AS BIGINT) FROM sub WHERE k IS NULL)
                   AS n_null_keys,
               (SELECT count(*) FROM nivne_customer
                WHERE c_custkey NOT IN (SELECT k FROM sub))
               <> (SELECT count(*) FROM nivne_customer c
                   WHERE NOT EXISTS (SELECT 1 FROM sub
                                     WHERE sub.k = c.c_custkey))
                   AS semantics_differ
        """
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join prefilter with measured false-positive rate
# --------------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_HASHES = 3
_BLOOM_BAL_MIN = 5000.0  # small-side predicate: rich suppliers


def _bloom_bit_sql(key: str, i: int) -> str:
    """i-th bloom bit address: an independent 28-bit slice of md5."""
    return (
        f"CAST(('0x' || substring(md5(CAST({key} AS VARCHAR)), "
        f"{7 * i + 1}, 7))::BIGINT % {_BLOOM_M} AS BIGINT)"
    )


def _bloom_addr_from_hex(h, i: int):
    """Bit address i from an already-computed md5 hex column — lets a
    probe side compute the digest ONCE per row instead of once per hash
    function (round 11: 3 md5/row -> 1 on the 100-TB side)."""
    return F.conv(F.substring(h, 7 * i + 1, 7), 16, 10).cast("bigint") % _BLOOM_M


def _bloom_bit_col(key, i: int):
    return _bloom_addr_from_hex(F.md5(key.cast("string")), i)


@query(
    "join_bloom_prefilter_audit",
    oracle=f"""
    WITH small AS (
        SELECT DISTINCT s_suppkey AS k FROM supplier
        WHERE s_acctbal > {_BLOOM_BAL_MIN}
    ),
    bits AS (
        SELECT DISTINCT b FROM small, unnest([
            {", ".join(_bloom_bit_sql("k", i) for i in range(_BLOOM_HASHES))}
        ]) t(b)
    ),
    big AS (SELECT l_suppkey AS k FROM lineitem),
    probed AS (
        SELECT big.k,
               {" AND ".join(
                   f"EXISTS (SELECT 1 FROM bits WHERE b = {_bloom_bit_sql('big.k', i)})"
                   for i in range(_BLOOM_HASHES))} AS pass_bloom,
               EXISTS (SELECT 1 FROM small WHERE small.k = big.k) AS truly_in
        FROM big
    )
    SELECT CAST((SELECT count(*) FROM small) AS BIGINT) AS n_small_keys,
           CAST(count(*) AS BIGINT) AS n_big_rows,
           CAST(count(*) FILTER (pass_bloom) AS BIGINT) AS n_pass_bloom,
           CAST(count(*) FILTER (truly_in) AS BIGINT) AS n_true_match,
           CAST(count(*) FILTER (pass_bloom AND NOT truly_in) AS BIGINT)
               AS n_false_pos,
           round(count(*) FILTER (pass_bloom AND NOT truly_in)
                 / greatest(count(*) - count(*) FILTER (truly_in), 1), 6)
               AS fp_rate
    FROM probed
    """,
    tags=("joins", "scale", "eval"),
)
def join_bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prefilter, with its false-positive rate
    measured instead of assumed: build a {m}-bit / {k}-hash Bloom
    filter over the small side's join keys (rich suppliers), probe
    every big-side row (lineitem) through it, and report pass counts
    against the exact semi-join truth. This is the runtime-filter
    technique Spark's own bloom-filter join injects at cluster scale
    — the fact rows that can't match never reach the shuffle — made
    first-class and auditable: n_pass vs n_true IS the shuffled-bytes
    saving, and fp_rate says whether m and k fit the key cardinality
    (measured 0 at sf0.01's 48 keys, where the textbook
    (1 - e^(-kn/m))^k predicts ~4e-5; the rate column is what catches
    an undersized filter when n grows past m's budget). Bit addresses
    are content-addressed md5
    slices, so the filter is deterministic and the oracle rebuilds it
    bit-for-bit ([[sketch_bloom_membership]] is the sketch itself;
    this op is the JOIN deployment with the honesty row).

    Scale shape: the bit set is |small| x k distinct ints — broadcast
    as a bitmap in production, modeled here as a broadcast equi-join
    per hash; the big side is touched once map-side with NO shuffle
    (every probe is a broadcast lookup), and the single output row
    folds from map-side partials."""
    t = tables(spark, sf_dir)
    small = (
        t.supplier.filter(F.col("s_acctbal") > _BLOOM_BAL_MIN)
        .select(F.col("s_suppkey").alias("k"))
        .distinct()
    )
    bits = (
        small.select(
            F.explode(
                F.array(
                    *[_bloom_bit_col(F.col("k"), i) for i in range(_BLOOM_HASHES)]
                )
            ).alias("b")
        )
        .distinct()
    )
    big = t.lineitem.select(F.col("l_suppkey").alias("k"))
    # digest once per big-side row; each hash function slices the same
    # hex attribute (was: one md5 per hash per row) — round 11
    probed = big.withColumn("_h", F.md5(F.col("k").cast("string")))
    for i in range(_BLOOM_HASHES):
        bi = bits.select(F.col("b").alias(f"b{i}")).withColumn(
            f"hit{i}", F.lit(1)
        )
        probed = probed.withColumn(
            f"addr{i}", _bloom_addr_from_hex(F.col("_h"), i)
        ).join(
            F.broadcast(bi),
            F.col(f"addr{i}") == F.col(f"b{i}"),
            "left",
        )
    probed = probed.join(
        F.broadcast(small.withColumn("truly", F.lit(1))), "k", "left"
    ).select(
        (
            sum(
                F.coalesce(F.col(f"hit{i}"), F.lit(0))
                for i in range(_BLOOM_HASHES)
            )
            == _BLOOM_HASHES
        ).alias("pass_bloom"),
        F.col("truly").isNotNull().alias("truly_in"),
    )
    n_small = small.count()
    agg = probed.agg(
        F.count(F.lit(1)).cast("long").alias("n_big_rows"),
        F.sum(F.col("pass_bloom").cast("long")).cast("long").alias(
            "n_pass_bloom"
        ),
        F.sum(F.col("truly_in").cast("long")).cast("long").alias(
            "n_true_match"
        ),
        F.sum(
            (F.col("pass_bloom") & ~F.col("truly_in")).cast("long")
        ).cast("long").alias("n_false_pos"),
    )
    return agg.select(
        F.lit(n_small).cast("long").alias("n_small_keys"),
        "n_big_rows",
        "n_pass_bloom",
        "n_true_match",
        "n_false_pos",
        rnd(
            F.col("n_false_pos")
            / F.greatest(
                F.col("n_big_rows") - F.col("n_true_match"), F.lit(1)
            ),
            6,
        ).alias("fp_rate"),
    )


join_bloom_prefilter_audit.__doc__ = (
    join_bloom_prefilter_audit.__doc__
    .replace("{m}", str(_BLOOM_M))
    .replace("{k}", str(_BLOOM_HASHES))
)


# --------------------------------------------------------------------------
# Point-in-time join against the SCD-2 dimension
# --------------------------------------------------------------------------


def _pit_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    scd2 = QUERIES["upsert_scd2_merge"].oracle
    return f"""
    WITH dim AS ({scd2}),
    joined AS (
        SELECT o.o_orderkey, d.version, d.segment
        FROM orders o
        LEFT JOIN dim d
               ON d.custkey = o.o_custkey
              AND CAST(o.o_orderdate AS DATE) >= CAST(d.valid_from AS DATE)
              AND (d.valid_to IS NULL
                   OR CAST(o.o_orderdate AS DATE) < CAST(d.valid_to AS DATE))
    )
    SELECT segment,
           CAST(version AS INT) AS version,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM joined
    WHERE version IS NOT NULL
    GROUP BY segment, version
    """


@query(
    "join_point_in_time_scd2",
    oracle=_pit_oracle(),
    tags=("joins", "cdc"),
)
def join_point_in_time_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (AS OF) join against the SCD-2 dimension — the
    query pattern SCD-2 history EXISTS to serve: every order joins to
    the dimension version that was valid ON ITS ORDER DATE
    (valid_from <= date < valid_to, open-ended current rows matching
    everything after their effective date), so facts booked before
    the segment change carry the OLD segment and later ones the new —
    no retroactive rewriting of history. Composes
    [[upsert_scd2_merge]]'s own oracle for the dimension, and the
    aggregated (segment, version) order counts make the version
    split visible and hash-checked ([[join_asof]] is the
    nearest-event form on timestamps; this is the interval-validity
    form on effective dating).

    Scale shape: the dimension is broadcast (dim tables are small by
    definition — at 100 TB the fact side streams through the
    broadcast interval lookup with zero shuffle); the validity
    predicate is row-local; the final fold is (segment, version)
    grain. Each fact matches at most one version by the interval
    partitioning invariant the SCD-2 merge maintains."""
    from awsbeats_spark.registry import QUERIES

    t = tables(spark, sf_dir)
    dim = QUERIES["upsert_scd2_merge"].fn(spark, sf_dir).select(
        "custkey",
        "segment",
        "version",
        F.to_date("valid_from").alias("vf"),
        F.to_date("valid_to").alias("vt"),
    )
    od = F.to_date("o_orderdate")
    joined = t.orders.join(
        F.broadcast(dim),
        (t.orders["o_custkey"] == dim["custkey"])
        & (od >= F.col("vf"))
        & (F.col("vt").isNull() | (od < F.col("vt"))),
        "left",
    )
    return (
        joined.filter(F.col("version").isNotNull())
        .groupBy("segment", F.col("version").cast("int").alias("version"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Blocking-scheme quality eval (pair completeness vs reduction ratio)
# --------------------------------------------------------------------------

# Fixed NAME BUDGET (not a fraction): the ground-truth cross join is
# O(budget^2) on any schema and any corpus size. A proportional md5
# sample (the round-9 original) kept ~30% of distinct names, so the
# truth pair join grew quadratically with distinct-name count — the
# same trap embed_cosine_pair_histogram hit in round 7 (alpha 1.94 ->
# fixed audit budget -0.09). Rank-by-md5 keeps the sample deterministic
# and unbiased; top-K by hash is a TakeOrderedAndProject (per-partition
# heap + K-row merge), never a full sort.
_BLK_SAMPLE_BUDGET = 500
_BLK_EDIT_MAX = 4  # same match predicate as join_fuzzy_name_blocked


@query(
    "eval_blocking_quality",
    oracle=f"""
    WITH names AS (
        SELECT DISTINCT p_name FROM part
        ORDER BY md5(p_name), p_name LIMIT {_BLK_SAMPLE_BUDGET}
    ),
    keyed AS (
        SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM names
    ),
    pairs AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               a.blk = b.blk AS same_block,
               levenshtein(a.p_name, b.p_name) <= {_BLK_EDIT_MAX} AS is_true
        FROM keyed a JOIN keyed b ON a.p_name < b.p_name
    )
    SELECT CAST((SELECT count(*) FROM names) AS BIGINT) AS n_names,
           CAST(count(*) AS BIGINT) AS n_possible_pairs,
           CAST(sum(CASE WHEN same_block THEN 1 ELSE 0 END) AS BIGINT)
               AS n_candidates,
           CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_pairs,
           CAST(sum(CASE WHEN is_true AND same_block THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true_found,
           round(sum(CASE WHEN is_true AND same_block THEN 1 ELSE 0 END)
                 * 1.0 / nullif(sum(CASE WHEN is_true THEN 1 ELSE 0 END), 0),
                 6) AS pair_completeness,
           round(1.0 - sum(CASE WHEN same_block THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS reduction_ratio
    FROM pairs
    """,
)
def eval_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage blocking eval — the two numbers that justify (or
    indict) [[join_fuzzy_name_blocked]]'s first-word blocking key:
    **pair completeness** (what fraction of true fuzzy matches land in
    the same block, i.e. recall the blocking can't lose downstream) and
    **reduction ratio** (what fraction of the O(n^2) comparison space
    the blocking eliminates) — the standard trade-off pair of the
    record-linkage literature (Christen, "Data Matching", ch. 7). Ground
    truth (all Levenshtein <= {em} pairs) requires the full cross
    product, so it runs on a FIXED BUDGET of {bud} distinct names —
    the first {bud} ranked by md5(p_name), a deterministic unbiased
    draw — exactly how a production linkage pipeline audits its
    blocking: exhaustively on a bounded sample, never on the corpus.
    A new blocking key ships when completeness holds near 1.0 and the
    reduction ratio rises.

    Scale shape: the budget makes the truth cross join O(budget^2) —
    CONSTANT in corpus size and schema (a fraction-based sample would
    grow quadratically with distinct-name count; see the
    embed_cosine_pair_histogram precedent). The rank-by-hash draw is a
    TakeOrderedAndProject over the distinct names, not a full sort;
    candidate counting reuses the same pair relation. The corpus-scale
    blocked JOIN itself is join_fuzzy_name_blocked; this eval never
    touches full-corpus pairs."""
    t = tables(spark, sf_dir)
    names = (
        t.part.select("p_name")
        .distinct()
        .orderBy(F.md5("p_name"), F.col("p_name"))
        .limit(_BLK_SAMPLE_BUDGET)
        .withColumn("blk", F.split(F.col("p_name"), " ")[0])
    )
    a, b = names.alias("a"), names.alias("b")
    pairs = a.join(b, F.col("a.p_name") < F.col("b.p_name")).select(
        (F.col("a.blk") == F.col("b.blk")).alias("same_block"),
        (
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            <= _BLK_EDIT_MAX
        ).alias("is_true"),
    )
    found = F.sum((F.col("is_true") & F.col("same_block")).cast("long"))
    true_ct = F.sum(F.col("is_true").cast("long"))
    cand = F.sum(F.col("same_block").cast("long"))
    nn = names.agg(F.count(F.lit(1)).cast("long").alias("n_names"))
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_possible_pairs"),
        cand.alias("n_candidates"),
        true_ct.alias("n_true_pairs"),
        found.alias("n_true_found"),
        rnd(found / F.nullif(true_ct, F.lit(0)), 6).alias(
            "pair_completeness"
        ),
        rnd(1.0 - cand / F.count(F.lit(1)), 6).alias("reduction_ratio"),
    )
    # lazy 1-row x 1-row join (no eager count at construction time)
    return F.broadcast(nn).crossJoin(stats).select(
        "n_names",
        "n_possible_pairs",
        "n_candidates",
        "n_true_pairs",
        "n_true_found",
        "pair_completeness",
        "reduction_ratio",
    )


eval_blocking_quality.__doc__ = eval_blocking_quality.__doc__.replace(
    "{em}", str(_BLK_EDIT_MAX)
).replace("{bud}", str(_BLK_SAMPLE_BUDGET))
