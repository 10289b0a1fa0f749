"""Aggregation operators.

The reference's only aggregation is its observability counters
(NewBatch/Acked/Dropped — /root/reference/streams/client.go:87-96); the
full catalog here is the engine extension (SURVEY.md §2.C).

Scale notes: every groupBy below benefits from partial (map-side)
aggregation — Spark emits HashAggregate(partial) before the shuffle and
HashAggregate(final) after, so shuffle volume is O(groups), not O(rows).
Low-cardinality group keys (returnflag×linestatus = 6 groups) shuffle
almost nothing even at 100 TB. approx_count_distinct uses HyperLogLog++
with mergeable sketches — the exact-distinct fallback shuffles rows,
the sketch shuffles fixed-size registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd, rnd_sql
from awsbeats_spark.registry import query


@query(
    "agg_group_count",
    oracle="""
    SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def agg_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch counting — generalizes the reference's observer counters
    (/root/reference/streams/client.go:87-96) to keyed counts."""
    t = tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "agg_group_sum_avg",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
                      AS DOUBLE) / 100.0, 2)                                AS sum_base_price,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100, 0) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2)                                                AS sum_disc_price,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * (1 + l_tax) * 100, 0) AS BIGINT))
                      AS DOUBLE) / 100.0, 2)                                AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_sum_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary: 2 group keys, 8 aggregates, one pass."""
    t = tables(spark, sf_dir)
    li = t.lineitem.where("l_shipdate <= CAST('1998-09-02' AS TIMESTAMP)")
    disc_price = "(l_extendedprice * (1 - l_discount))"

    # exact integer-cents money sums (sf1 hardening, round 11: Q1's
    # million-row groups are the widest double-sum exposure in the
    # catalog; sum_qty stays raw — integer-valued doubles sum exactly).
    # expr strings (round 11): the Column-API build cost ~750 py4j
    # roundtrips; D-suffixed literals keep every step in DOUBLE exactly
    # as the F.lit forms did.
    def cents_sum(expr: str) -> str:
        return rnd_sql(f"cast(sum(floor({expr} * 100 + 0.5D)) AS DOUBLE) / 100.0D", 2)

    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.expr(f"{rnd_sql('sum(l_quantity)', 2)} AS sum_qty"),
        F.expr(f"{cents_sum('l_extendedprice')} AS sum_base_price"),
        F.expr(f"{cents_sum(disc_price)} AS sum_disc_price"),
        F.expr(f"{cents_sum(f'{disc_price} * (1 + l_tax)')} AS sum_charge"),
        F.expr(f"{rnd_sql('avg(l_quantity)', 4)} AS avg_qty"),
        F.expr(f"{rnd_sql('avg(l_extendedprice)', 4)} AS avg_price"),
        F.expr(f"{rnd_sql('avg(l_discount)', 4)} AS avg_disc"),
        F.expr("count(1) AS count_order"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct — expands to a two-phase aggregate; at scale the
    first phase dedups (o_orderpriority, o_custkey) so the final shuffle
    is bounded by distinct pairs, not rows."""
    t = tables(spark, sf_dir)
    return t.orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct estimate (rsd=1%). At 100 TB this is THE
    distinct-count operator — fixed-size mergeable registers instead of
    a row shuffle.

    Hash-checked since round 6 (rows-only before; VERDICT r5 item 4,
    the agg_percentile_approx sandwich applied): DuckDB's HLL differs
    from Spark's so the raw estimate can never hash-match, but the
    EXACT count can, and the sketch's health reduces to ``within_bound``
    = |approx - exact| / exact <= 5*rsd, computed Spark-side against
    the exact count and asserted TRUE by the oracle (5 sigma on an
    ~Gaussian error never fires on a healthy sketch; a wrong column,
    broken merge, or precision loss flips it and the driver row goes
    red). Grain is (l_returnflag, l_linestatus) — one level finer than
    the eval_approx_distinct_error twin, exercising smaller groups.

    Plan note (the EXTRAPOLATION.md Expand lesson): exact and approx
    are SEPARATE aggregates joined on the tiny group key — mixing
    countDistinct with non-distinct aggregates forces the
    distinct-rewrite Expand (every row replicated per aggregate class),
    which probed 60x slower at 10x scale. The exact side exists only
    for the verdict; the production path is the sketch alone."""
    t = tables(spark, sf_dir)
    keys = ["l_returnflag", "l_linestatus"]
    exact = (
        t.lineitem.select(*keys, "l_orderkey")
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    approx = t.lineitem.groupBy(*keys).agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    joined = exact.join(approx, keys)
    rel_err = F.abs(F.col("approx") - F.col("exact_orders")) / F.col("exact_orders")
    return joined.select(
        *keys,
        "exact_orders",
        "n_rows",
        (rel_err <= 0.05).alias("within_bound"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT coalesce(r_name, '(all)') AS region_name,
           coalesce(n_name, '(all)') AS nation_name,
           round(sum(c_acctbal), 2)  AS sum_acctbal,
           count(*)                  AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals region → nation → grand total. NULL group
    labels are coalesced to '(all)' on both engines so the hash compare
    is unambiguous (no real NULLs exist in the group keys)."""
    t = tables(spark, sf_dir)
    joined = (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            rnd(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select(
            F.coalesce("r_name", F.lit("(all)")).alias("region_name"),
            F.coalesce("n_name", F.lit("(all)")).alias("nation_name"),
            "sum_acctbal",
            "n_customers",
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT coalesce(l_returnflag, '(all)') AS returnflag,
           coalesce(l_linestatus, '(all)') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@query(
    "agg_stats",
    oracle="""
    SELECT event_type,
           round(min(value), 2)          AS min_value,
           round(max(value), 2)          AS max_value,
           round(avg(value), 4)          AS avg_value,
           round(stddev_samp(value), 4)  AS std_value,
           round(quantile_cont(value, 0.5), 4) AS median_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution stats incl. exact interpolated median. At 100 TB the
    exact percentile shuffles values per group; swap for
    percentile_approx (mergeable t-digest-style sketch) when the group
    payload exceeds executor memory."""
    t = tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        rnd(F.min("value"), 2).alias("min_value"),
        rnd(F.max("value"), 2).alias("max_value"),
        rnd(F.avg("value"), 4).alias("avg_value"),
        rnd(F.stddev_samp("value"), 4).alias("std_value"),
        rnd(F.percentile("value", F.lit(0.5)), 4).alias("median_value"),
    )


@query(
    "agg_bucketed_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def agg_bucketed_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram by computed bucket key."""
    t = tables(spark, sf_dir)
    return (
        t.events.groupBy(F.floor(F.col("value") / 50).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns — compiles to conditional aggregates
    (one pass, no extra shuffle vs the plain groupBy)."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(rnd(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@query(
    "agg_corr_stats",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
           round(stddev_samp(l_quantity), 6) AS qty_stddev,
           round(var_samp(l_extendedprice), 2) AS price_var
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics aggregates (corr/covar/stddev/variance) —
    all algebraic (sum, sum-of-squares, sum-of-products moments), so
    they combine map-side and shuffle only one row per group."""
    t = tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        rnd(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        rnd(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
        rnd(F.stddev_samp("l_quantity"), 6).alias("qty_stddev"),
        rnd(F.var_samp("l_extendedprice"), 2).alias("price_var"),
    )


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_regionkey,
           array_to_string(list_sort(list(n_name)), '|') AS nations,
           count(*) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect-to-array aggregation. collect_list order is
    nondeterministic under parallel aggregation on BOTH engines, so the
    contract (and the oracle comparison) is the SORTED array — the only
    deterministic form a distributed engine can promise without a
    within-group sort specification. Serialized to a joined string for
    the hash compare (array cells don't hash portably)."""
    t = tables(spark, sf_dir)
    return t.nation.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 4) AS q25,
           round(quantile_cont(l_quantity, 0.5), 4) AS median,
           round(quantile_cont(l_quantity, 0.75), 4) AS q75,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS price_p90
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — identical definition on
    both engines, unlike the t-digest sketch in agg_percentile_approx
    which stays rows-only). Exact percentile shuffles every value to its
    group; at 100 TB prefer approx_percentile unless the contract
    demands exactness."""
    t = tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        rnd(F.percentile("l_quantity", F.lit(0.25)), 4).alias("q25"),
        rnd(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median"),
        rnd(F.percentile("l_quantity", F.lit(0.75)), 4).alias("q75"),
        rnd(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("price_p90"),
    )


@query(
    "agg_freq_items_approx",
    oracle="""
    WITH tot AS (SELECT count(*) AS n FROM orders)
    SELECT o_orderpriority AS item,
           CAST(count(*) AS BIGINT) AS exact_count,
           round(count(*) * 1.0 / (SELECT n FROM tot), 6) AS freq_share,
           TRUE AS in_sketch
    FROM orders GROUP BY 1
    HAVING count(*) * 10 > (SELECT n FROM tot)
    """,
)
def agg_freq_items_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries-style heavy hitters (`df.stat.freqItems`,
    support=0.10) over orders.o_orderpriority: single-pass,
    fixed-memory, mergeable per partition — the sketch that answers
    "which keys are hot" BEFORE a 100-TB job picks salting factors or
    a skew-join strategy, without a full groupBy shuffle.

    Hash-checked since round 7 (rows-only before; VERDICT r6 item 4,
    the exact-count sandwich of [[agg_approx_distinct]]): the sketch's
    contract is superset-with-false-positives, so the row set is the
    EXACT heavy hitters (freq > support, integer arithmetic: count*10
    > n so no float boundary) with exact counts and shares, and the
    sketch's health reduces to ``in_sketch`` = membership of each true
    heavy hitter in the freqItems array, asserted TRUE by the oracle —
    a dropped heavy hitter (the failure mode that mis-sizes a salting
    factor) turns the driver row red. The events.event_type grain
    lives on in [[eval_freq_items_vs_exact]]; production reads the
    sketch alone — the exact side exists only for the verdict."""
    t = tables(spark, sf_dir)
    tot = t.orders.agg(F.count(F.lit(1)).alias("tot"))
    exact = (
        t.orders.groupBy(F.col("o_orderpriority").alias("item"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .join(F.broadcast(tot))
        .filter(F.col("exact_count") * 10 > F.col("tot"))
    )
    fi = t.orders.select("o_orderpriority").stat.freqItems(
        ["o_orderpriority"], support=0.10
    )
    return exact.join(F.broadcast(fi)).select(
        "item",
        "exact_count",
        rnd(F.col("exact_count") / F.col("tot"), 6).alias("freq_share"),
        F.array_contains(
            F.col("o_orderpriority_freqItems"), F.col("item")
        ).alias("in_sketch"),
    )


@query(
    "agg_hll_sketch_union",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('month', ts), '%Y-%m') AS month,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
           TRUE AS within_bound
    FROM events
    GROUP BY 1, 2
    """,
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (Apache DataSketches HLL):
    build one user_id sketch per (day, event_type), then UNION the day
    sketches up a DIFFERENT rollup axis — per (event_type, month) — and
    estimate.

    This is THE pattern for distinct counts at 100 TB: per-partition
    (here per-day) sketches are computed once, stored small (~KB), and
    re-aggregated along any rollup axis WITHOUT touching raw rows again
    — exact countDistinct re-shuffles every row for every new grouping.

    Hash-checked since round 6 (rows-only before; VERDICT r5 item 4):
    the binary sketch is engine-specific, so the row carries the EXACT
    per-(event_type, month) distinct-user count plus ``within_bound`` =
    merged-estimate relative error <= 0.06 (default lgk=12 → ~1.6%
    standard error; ~4 sigma), computed Spark-side and asserted TRUE by
    the oracle — a register-losing union or wrong-column regression
    flips it red. The exact side is a separate distinct aggregate
    joined on the tiny (event_type, month) key (the Expand lesson,
    EXTRAPOLATION.md); production rolls up sketches without re-touching
    raw rows. The event_type-level union lives on in
    eval_hll_union_vs_exact."""
    t = tables(spark, sf_dir)
    daily = (
        t.events.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(F.hll_sketch_agg("user_id").alias("sk"),
              F.count(F.lit(1)).alias("n_rows"))
    )
    monthly = (
        daily.groupBy(
            "event_type", F.date_format("day", "yyyy-MM").alias("month")
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("n_rows").alias("n_events"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    exact = t.events.groupBy(
        "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM").alias("month")
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return (
        monthly.join(exact, ["event_type", "month"])
        .select(
            "event_type",
            "month",
            "exact_users",
            "n_events",
            "n_days",
            (rel_err <= 0.06).alias("within_bound"),
        )
        .orderBy("event_type", "month")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via roaring-style bitmaps
    (bitmap_construct_agg over bit positions): each partial aggregate is
    a fixed-size bitmap instead of a hash set of raw values, bitmaps OR
    together losslessly — the mergeable-exact middle ground between
    count_distinct (big shuffled sets) and HLL (approximate). The
    two-level shape (position-bucket partials, then bitmap_or_agg +
    sum of bitmap_count) is exactly how a 100-TB exact-distinct rollup
    stays map-side-combined. Oracle: plain COUNT(DISTINCT)."""
    ev = tables(spark, sf_dir).events
    return (
        ev.select(
            "event_type",
            # canonical (bucket, position) pair — bitmap_bit_position is
            # (v-1) % 32768, so the bucket MUST be bitmap_bucket_number's
            # matching (v-1)/32768 split or distinct values collide
            F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
            F.bitmap_bit_position(F.col("user_id")).alias("pos"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
        .groupBy("event_type")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).alias("n_users"))
    )


@query(
    "agg_decimal_exact_sum",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS gross,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
               AS discount_amt,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_decimal_exact_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money arithmetic: aggregate in DECIMAL, not DOUBLE. Double
    summation drifts with partition count and merge order (a correctness
    hazard for financial totals at 100 TB, where re-running with a
    different partitioning changes the cents digit); decimal sums are
    associative-exact, so the result is partitioning-invariant however
    AQE re-plans the shuffle. Spark sums DECIMAL into a widened decimal
    with overflow checking; partial aggregation (map-side combine)
    still applies, so the plan is the same two-phase hash aggregate as
    the double version.

    The FINAL cast to double exists only for the comparison transport:
    DuckDB's pandas bridge emits every DECIMAL as float64, so both
    engines convert the exact decimal total through the same
    nearest-double rounding at the very end (one rounding of an exact
    rational — deterministic on both sides), rather than comparing a
    drift-prone double SUM.
    """
    t = tables(spark, sf_dir)
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.sum(price).cast("double").alias("gross"),
            F.sum(price * disc).cast("double").alias("discount_amt"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_weighted_percentile",
    oracle="""
    WITH ordered AS (
        SELECT l_returnflag, l_extendedprice, l_quantity,
               sum(l_quantity) OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cumw,
               sum(l_quantity) OVER (PARTITION BY l_returnflag) AS totw
        FROM lineitem
    ),
    crossing AS (
        SELECT l_returnflag, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY cumw, l_extendedprice
               ) AS rn
        FROM ordered
        WHERE cumw >= 0.5 * totw
    )
    SELECT l_returnflag,
           round(l_extendedprice, 2) AS weighted_median_price
    FROM crossing WHERE rn = 1
    """,
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (lower weighted median): the smallest price
    whose cumulative quantity weight reaches half the group's total —
    the "typical unit price" where heavy line items count by volume,
    not by row. percentile()/median() can't weight; this is the
    standard cumulative-weight crossing formulation.

    Scale shape: one window sort per group for the running weight (the
    same shuffle an ORDER BY needs), a per-group total as a frame-free
    window, then the crossing row via a second tiny window over the
    filtered (>= half) rows. Deterministic tiebreak (orderkey,
    linenumber) pins the crossing row bit-for-bit in both engines. At
    100 TB swap the full sort for a t-digest/GK sketch if approximate
    is acceptable — same API, one pass, no sort.
    """
    t = tables(spark, sf_dir)
    w1 = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("l_returnflag")
    ordered = t.lineitem.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("l_quantity").over(w1).alias("cumw"),
        F.sum("l_quantity").over(wt).alias("totw"),
    )
    w2 = Window.partitionBy("l_returnflag").orderBy("cumw", "l_extendedprice")
    return (
        ordered.filter(F.col("cumw") >= 0.5 * F.col("totw"))
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            rnd("l_extendedprice", 2).alias("weighted_median_price"),
        )
    )


# --------------------------------------------------------------------------
# Shannon entropy of the per-user event mix
# --------------------------------------------------------------------------


@query(
    "agg_entropy_by_group",
    oracle="""
    WITH per AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT user_id, sum(n) AS total, CAST(count(*) AS BIGINT) AS n_types
        FROM per GROUP BY 1
    )
    SELECT p.user_id,
           t.n_types,
           CAST(t.total AS BIGINT) AS n_events,
           round(-sum((p.n * 1.0 / t.total) * ln(p.n * 1.0 / t.total)), 4)
               AS entropy_nats
    FROM per p JOIN tot t USING (user_id)
    GROUP BY p.user_id, t.n_types, t.total
    """,
)
def agg_entropy_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each user's event-type mix — the
    behavioral-diversity score used for mix-balancing samplers. Scale
    shape: raw events collapse to (user, type) counts in one mergeable
    aggregate; per-user totals are a second aggregate over that bucket
    table, joined back on the shared user_id key (exchange reuse) so
    every shuffle carries bucket-level rows only. No window, no
    Python; skew-safe because per-user bucket count is bounded by
    |event types|."""
    ev = tables(spark, sf_dir).events
    per = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = per.groupBy("user_id").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("n") / F.col("total")
    return (
        per.join(tot, "user_id")
        .select("user_id", "total", "n_types", (p * F.log(p)).alias("plogp"))
        .groupBy("user_id", "total", "n_types")
        .agg(rnd(-F.sum("plogp"), 4).alias("entropy_nats"))
        .select(
            "user_id",
            "n_types",
            F.col("total").alias("n_events"),
            "entropy_nats",
        )
    )


# --------------------------------------------------------------------------
# Herfindahl-Hirschman revenue concentration per nation
# --------------------------------------------------------------------------


@query(
    "agg_hhi_concentration",
    oracle="""
    WITH cust_rev AS (
        SELECT c.c_nationkey, o.o_custkey,
               sum(o.o_totalprice) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    nat AS (
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n_customers,
               round(sum(rev), 2) AS total_revenue,
               round(sum(rev * rev) / (sum(rev) * sum(rev)), 6) AS hhi
        FROM cust_rev GROUP BY 1
    )
    SELECT n.n_name, t.n_customers, t.total_revenue, t.hhi
    FROM nat t JOIN nation n ON t.c_nationkey = n.n_nationkey
    """,
)
def agg_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of revenue concentration: per nation,
    the sum of squared customer revenue shares (1/n = perfectly spread,
    1.0 = single-customer dependency) — the risk metric behind "how
    concentrated is this market". Scale shape: two stacked mergeable
    aggregates — (nation, customer) then nation, the second computed
    from Σrev and Σrev² so no shares ever materialize per row — and a
    25-row broadcast for names. Both shuffles carry bucket-level rows."""
    t = tables(spark, sf_dir)
    cust_rev = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_nationkey", "o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    nat = cust_rev.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        rnd(F.sum("rev"), 2).alias("total_revenue"),
        rnd(
            F.sum(F.col("rev") * F.col("rev"))
            / (F.sum("rev") * F.sum("rev")),
            6,
        ).alias("hhi"),
    )
    return nat.join(
        F.broadcast(t.nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("n_name", "n_customers", "total_revenue", "hhi")


# --------------------------------------------------------------------------
# Higher moments from raw power sums (engine-independent skew/kurtosis)
# --------------------------------------------------------------------------


@query(
    "agg_higher_moments",
    oracle="""
    WITH m AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               sum(value) AS s1, sum(value * value) AS s2,
               sum(value * value * value) AS s3,
               sum(value * value * value * value) AS s4
        FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           round(s1 / n, 4) AS mean,
           round(sqrt(greatest(0.0, s2 / n - (s1 / n) * (s1 / n))), 4)
               AS pop_std,
           round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * pow(s1 / n, 3))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 4) AS skewness_g1,
           round((s4 / n - 4 * (s1 / n) * (s3 / n)
                  + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                  - 3 * pow(s1 / n, 4))
                 / pow(s2 / n - (s1 / n) * (s1 / n), 2) - 3, 4)
               AS excess_kurtosis_g2
    FROM m
    """,
)
def agg_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness (g1) and excess kurtosis (g2) per event type, assembled
    from raw power sums (Σx..Σx⁴) instead of the built-ins — Spark's
    `skewness`/`kurtosis` and DuckDB's use different sample-correction
    conventions, while the population moments are convention-free and
    identical in both engines. Scale shape: the five power sums are ONE
    mergeable map-side aggregate (the textbook distributed-moments
    pattern); all the algebra runs on the 5-row result. Numerically the
    raw-moment form loses digits when |mean| >> std — acceptable here
    (values are O(100)); a production variant would center on a
    first-pass approximate mean."""
    ev = tables(spark, sf_dir).events
    v = F.col("value")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
        F.sum(v * v * v * v).alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * F.pow(mu, 3)
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * F.pow(mu, 4)
    )
    return m.select(
        "event_type",
        "n",
        rnd(mu, 4).alias("mean"),
        rnd(F.sqrt(F.greatest(F.lit(0.0), m2)), 4).alias("pop_std"),
        rnd(m3 / F.pow(m2, 1.5), 4).alias("skewness_g1"),
        rnd(m4 / F.pow(m2, 2) - 3, 4).alias("excess_kurtosis_g2"),
    )


# --------------------------------------------------------------------------
# Partial-aggregate shard merge (algebraic reaggregation)
# --------------------------------------------------------------------------

_N_MERGE_SHARDS = 8


@query(
    "agg_partial_merge_shards",
    oracle=f"""
    WITH partials AS (
        SELECT l_returnflag,
               CAST(l_orderkey % {_N_MERGE_SHARDS} AS INT) AS shard,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
               sum(l_quantity * l_quantity) AS ss,
               min(l_quantity) AS mn,
               max(l_quantity) AS mx
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_shards,
           CAST(sum(n) AS BIGINT) AS n,
           CAST(sum(s) AS BIGINT) AS sum_qty,
           min(mn) AS min_qty,
           max(mx) AS max_qty,
           round(sum(s) * 1.0 / sum(n), 6) AS mean_qty,
           round(sqrt(greatest(0.0, sum(ss) / sum(n)
                      - (sum(s) * 1.0 / sum(n)) * (sum(s) * 1.0 / sum(n)))),
                 6) AS pop_std_qty
    FROM partials GROUP BY 1
    """,
)
def agg_partial_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level algebraic aggregation: per-shard PARTIAL states (count,
    sum, sum-of-squares, min, max) merged into exact global stats
    without revisiting raw rows — the pattern behind every incremental
    rollup at 100 TB (daily partials merged into monthly, per-executor
    states merged by combiners, cube cells merged upward). count/sum/
    sumsq/min/max are algebraic: merge = sum/sum/sum/min/max, and mean
    and population std derive from the merged moments exactly, so the
    result is bit-equal to a direct one-pass aggregation while only the
    tiny (groups x shards) state table crosses the second shuffle.
    Scale note: stage 1 is map-side-combinable on (flag, shard); stage 2
    aggregates {_N_MERGE_SHARDS} rows per flag — microscopic. Quantity
    sums use exact integer/decimal arithmetic pre-division (the HUGEINT
    lesson from round 2: CAST to BIGINT before summing in the oracle)."""
    t = tables(spark, sf_dir)
    partials = t.lineitem.groupBy(
        "l_returnflag",
        (F.col("l_orderkey") % _N_MERGE_SHARDS).cast("int").alias("shard"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("long")).alias("s"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("ss"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
    )
    mean = F.sum("s") / F.sum("n")
    return partials.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("n").alias("n"),
        F.sum("s").alias("sum_qty"),
        F.min("mn").alias("min_qty"),
        F.max("mx").alias("max_qty"),
        rnd(mean, 6).alias("mean_qty"),
        rnd(
            F.sqrt(
                F.greatest(
                    F.lit(0.0), F.sum("ss") / F.sum("n") - mean * mean
                )
            ),
            6,
        ).alias("pop_std_qty"),
    )


# --------------------------------------------------------------------------
# Quantile shard-merge error probe (why medians are NOT algebraic)
# --------------------------------------------------------------------------


@query(
    "agg_quantile_merge_shards",
    oracle=f"""
    WITH partials AS (
        SELECT l_returnflag,
               CAST(l_orderkey % {_N_MERGE_SHARDS} AS INT) AS shard,
               CAST(count(*) AS BIGINT) AS n,
               quantile_cont(l_quantity, 0.5) AS med
        FROM lineitem GROUP BY 1, 2
    ),
    merged AS (
        SELECT l_returnflag,
               CAST(sum(n) AS BIGINT) AS n,
               sum(n * med) / sum(n) AS est_median
        FROM partials GROUP BY 1
    ),
    exact AS (
        SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS exact_median
        FROM lineitem GROUP BY 1
    )
    SELECT m.l_returnflag, m.n,
           round(m.est_median, 6) AS est_median,
           round(e.exact_median, 6) AS exact_median,
           round(abs(m.est_median - e.exact_median), 6) AS abs_err,
           round(abs(m.est_median - e.exact_median)
                 / e.exact_median, 6) AS rel_err
    FROM merged m JOIN exact e USING (l_returnflag)
    """,
)
def agg_quantile_merge_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dishonest cousin of agg_partial_merge_shards, measured
    honestly: medians are NOT algebraic, so merging per-shard medians
    (count-weighted average — the naive rollup someone always ships)
    is an ESTIMATE, and this operator reports its error against the
    exact global median side by side. The lesson a 100 TB platform
    encodes in code review: for mergeable quantiles use a sketch with
    a merge operator (t-digest/KLL — agg_percentile_approx is the
    engine's sketch path); if you see partial medians being averaged,
    this operator is the regression test that quantifies the damage.
    Scale shape: both branches are one pass each; the exact branch's
    full-sort-per-group is itself the thing sketches exist to avoid."""
    t = tables(spark, sf_dir)
    partials = t.lineitem.groupBy(
        "l_returnflag",
        (F.col("l_orderkey") % _N_MERGE_SHARDS).cast("int").alias("shard"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("l_quantity", F.lit(0.5)).alias("med"),
    )
    merged = partials.groupBy("l_returnflag").agg(
        F.sum("n").alias("n"),
        (F.sum(F.col("n") * F.col("med")) / F.sum("n")).alias("est_median"),
    )
    exact = t.lineitem.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("exact_median")
    )
    err = F.abs(F.col("est_median") - F.col("exact_median"))
    return merged.join(exact, "l_returnflag").select(
        "l_returnflag",
        "n",
        rnd("est_median", 6).alias("est_median"),
        rnd("exact_median", 6).alias("exact_median"),
        rnd(err, 6).alias("abs_err"),
        rnd(err / F.col("exact_median"), 6).alias("rel_err"),
    )


# --------------------------------------------------------------------------
# Equi-depth histogram (quantile buckets, the optimizer's statistic)
# --------------------------------------------------------------------------

_EQUIDEPTH_BUCKETS = 10


@query(
    "agg_histogram_equi_depth",
    oracle=f"""
    WITH tiles AS (
        SELECT o_totalprice,
               ntile({_EQUIDEPTH_BUCKETS}) OVER (ORDER BY o_totalprice)
                   AS bucket
        FROM orders
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(min(o_totalprice), 2) AS lo,
           round(max(o_totalprice), 2) AS hi,
           round(avg(o_totalprice), 4) AS mean_in_bucket
    FROM tiles GROUP BY bucket
    """,
)
def agg_histogram_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram of order totals: 10
    buckets with (near-)equal row counts and data-driven boundaries —
    the statistic query optimizers keep (selectivity estimates stay
    accurate in skewed regions where agg_bucketed_histogram's fixed-
    width bins hold 90% of rows in two bins). ntile is the exact
    formulation; both engines share its remainder rule (first
    n mod k tiles get the extra row). Scale note: exact ntile is one
    global sort — at 100 TB the production variant computes the
    9 boundary quantiles with the sketch path
    (agg_percentile_approx) and bins with a broadcast range lookup;
    this operator is the exact contract those sketches approximate."""
    t = tables(spark, sf_dir)
    tiles = t.orders.select(
        "o_totalprice",
        F.ntile(_EQUIDEPTH_BUCKETS)
        .over(Window.orderBy("o_totalprice"))
        .alias("bucket"),
    )
    return tiles.groupBy(F.col("bucket").cast("int").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        rnd(F.min("o_totalprice"), 2).alias("lo"),
        rnd(F.max("o_totalprice"), 2).alias("hi"),
        rnd(F.avg("o_totalprice"), 4).alias("mean_in_bucket"),
    )


# --------------------------------------------------------------------------
# Sketch honesty evals (round 5): hash-checkable quality twins for the
# rows-only approximate aggregates (VERDICT r4 item 3 / item 7 pattern)
# --------------------------------------------------------------------------


@query(
    "eval_approx_distinct_error",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def eval_approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable honesty twin of agg_approx_distinct (rows-only —
    DuckDB's HLL differs from Spark's, so the estimate itself can never
    hash-match). The EXACT distinct count can, and the sketch's quality
    reduces to a boolean: ``within_bound`` = |approx - exact| / exact
    <= 5*rsd (rsd=0.01; HLL++ error is approximately Gaussian, so 5
    sigma never fires on a healthy sketch while any real regression —
    wrong column, broken merge, precision loss — flips it and turns the
    driver row red). Exact side runs only at eval scale; the production
    path stays the sketch.

    Plan note: exact and approx are SEPARATE aggregates joined on the
    tiny group key, not one mixed agg — combining countDistinct with
    non-distinct aggregates forces Spark's distinct-rewrite Expand
    (every row replicated per aggregate class), which probed 60x slower
    at 10x scale (275 s -> 4.5 s; alpha 1.58 -> 0.50 after the
    split)."""
    t = tables(spark, sf_dir)
    exact = (
        t.lineitem.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    approx = t.lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    joined = exact.join(approx, "l_returnflag")
    rel_err = F.abs(F.col("approx") - F.col("exact_orders")) / F.col(
        "exact_orders"
    )
    return joined.select(
        "l_returnflag",
        "exact_orders",
        "n_rows",
        (rel_err <= 0.05).alias("within_bound"),
    )


@query(
    "eval_freq_items_vs_exact",
    oracle="""
    SELECT event_type AS item,
           CAST(count(*) AS BIGINT) AS exact_count,
           TRUE AS found_in_sketch
    FROM events
    GROUP BY event_type
    HAVING count(*) * 1.0 / (SELECT count(*) FROM events) > 0.05
    """,
)
def eval_freq_items_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable honesty twin of agg_freq_items_approx: the
    Misra-Gries contract is a SUPERSET guarantee — every value whose
    true frequency exceeds the support threshold MUST appear in the
    sketch output (false positives allowed, false negatives never).
    This eval materializes exactly that contract: exact frequent items
    (freq > support * n, computed by both engines) each carry
    ``found_in_sketch`` = membership in the sketch's array; the oracle
    asserts TRUE. A dropped heavy hitter — the one failure mode that
    matters when this sketch picks salting factors for a 100-TB skew
    join — turns the driver row red."""
    t = tables(spark, sf_dir)
    tot = t.events.agg(F.count(F.lit(1)).alias("tot"))
    exact = (
        t.events.groupBy(F.col("event_type").alias("item"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .join(F.broadcast(tot))
        .filter(F.col("exact_count") > 0.05 * F.col("tot"))
        .select("item", "exact_count")
    )
    fi = t.events.select("event_type").stat.freqItems(
        ["event_type"], support=0.05
    )
    return exact.join(F.broadcast(fi)).select(
        "item",
        "exact_count",
        F.array_contains(F.col("event_type_freqItems"), F.col("item")).alias(
            "found_in_sketch"
        ),
    )


@query(
    "eval_hll_union_vs_exact",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS n_days,
           TRUE AS within_bound
    FROM events
    GROUP BY event_type
    """,
)
def eval_hll_union_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable honesty twin of agg_hll_sketch_union: rebuilds the
    same per-day DataSketches HLL sketches, unions them per event_type,
    and checks the merged estimate against the exact distinct-user
    count — the property the sketch-union pattern must preserve at
    100 TB (merge must not lose registers). ``within_bound`` = relative
    error <= 0.06 (lgk=12 -> ~1.6% standard error; ~4 sigma).
    The exact reference runs only at eval scale; production rolls up
    sketches without re-touching raw rows."""
    t = tables(spark, sf_dir)
    daily = t.events.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    joined = merged.join(exact, "event_type")
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return joined.select(
        "event_type",
        "exact_users",
        "n_days",
        (rel_err <= 0.06).alias("within_bound"),
    )


@query(
    "agg_percentile_disc_rank",
    oracle="""
    WITH g AS (
        SELECT l_returnflag,
               quantile_disc(l_extendedprice, 0.5) AS q50,
               quantile_disc(l_extendedprice, 0.9) AS q90,
               quantile_disc(l_extendedprice, 0.99) AS q99
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(0.5 AS DOUBLE) AS quantile,
           round(q50, 2) AS val FROM g
    UNION ALL
    SELECT l_returnflag, CAST(0.9 AS DOUBLE), round(q90, 2) FROM g
    UNION ALL
    SELECT l_returnflag, CAST(0.99 AS DOUBLE), round(q99, 2) FROM g
    """,
)
def agg_percentile_disc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentile (an actual element, not an interpolation)
    computed by RANK ARITHMETIC instead of a holistic aggregate: one
    window sort per group assigns row_number, and the element at
    1-based rank ceil(q*n) — the PostgreSQL percentile_disc rule, which
    DuckDB's quantile_disc follows (pinned empirically across n=7..2000
    including the frac(qn) < q cases where floor(q*(n-1))+1 diverges) —
    is selected by filter. Scale shape: no collect_list, no holistic
    percentile buffer — the sort is the same per-group hash-partition
    sort any window op pays, memory stays O(1) per row, and the same
    pass serves every quantile. The float index q*n is IEEE-identical
    in both engines, so the ceil cannot straddle an integer
    differently."""
    t = tables(spark, sf_dir)
    qs = [0.5, 0.9, 0.99]
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("l_returnflag")
    ranked = t.lineitem.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.select(
            "l_returnflag",
            "l_extendedprice",
            "rn",
            F.explode(F.array(*[F.lit(q) for q in qs])).alias("quantile"),
            "n",
        )
        .filter(F.col("rn") == F.ceil(F.col("quantile") * F.col("n")))
        .select(
            "l_returnflag",
            "quantile",
            rnd("l_extendedprice", 2).alias("val"),
        )
    )


# --------------------------------------------------------------------------
# Theil inequality decomposition: within- vs between-nation revenue
# --------------------------------------------------------------------------


@query(
    "agg_theil_inequality_decomp",
    oracle="""
    WITH cust AS (
        SELECT o_custkey, sum(o_totalprice) AS x
        FROM orders GROUP BY o_custkey
    ),
    tagged AS (
        SELECT n.n_name, cust.x
        FROM cust
        JOIN customer c ON c.c_custkey = cust.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    per_g AS (
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_customers,
               sum(x) AS sg,
               sum(x * ln(x)) AS lg
        FROM tagged GROUP BY n_name
    ),
    tot AS (
        SELECT sum(sg) AS st, sum(n_customers) AS nt FROM per_g
    )
    SELECT n_name,
           n_customers,
           round(sg / tot.st, 6) AS revenue_share,
           round(lg / sg - ln(sg / n_customers), 6) AS theil_within,
           round((sg / tot.st)
                 * ln((sg / n_customers) / (tot.st / tot.nt)), 6)
               AS between_term
    FROM per_g CROSS JOIN tot
    """,
)
def agg_theil_inequality_decomp(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theil-T inequality decomposition of customer revenue by nation:
    the Theil index is the ONE standard inequality measure that splits
    exactly into within-group + between-group parts (T = Σ s_g·T_g +
    Σ s_g·ln(μ_g/μ)), so this answers what gini/lorenz
    (agg_gini_by_priority, events_lorenz_deciles) cannot: is revenue
    concentration driven by whales INSIDE each market or by rich vs
    poor MARKETS? Emits, per nation, the revenue share s_g, the
    within-nation Theil T_g = Σ(x/μ_g)ln(x/μ_g)/n_g, and the between
    term s_g·ln(μ_g/μ); Σ s_g·T_g + Σ between_term reconstructs the
    global index (pinned by the semantic test).

    Scale shape: ONE customer-keyed aggregate over orders (the only
    fact shuffle — T_g needs just Σx and Σx·ln x per group, both
    map-side partial), customer/nation joins on the aggregate output,
    then a nation-keyed fold whose totals derive from the per-nation
    frame itself (one-row broadcast). x > 0 always (order totals), so
    the logs are safe."""
    t = tables(spark, sf_dir)
    cust = t.orders.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("x")
    )
    tagged = (
        cust.join(
            t.customer.select("c_custkey", "c_nationkey"),
            cust.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(t.nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("n_name", "x")
    )
    per_g = tagged.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("x").alias("sg"),
        F.sum(F.col("x") * F.log("x")).alias("lg"),
    )
    tot = per_g.agg(
        F.sum("sg").alias("st"), F.sum("n_customers").alias("nt")
    )
    mu_g = F.col("sg") / F.col("n_customers")
    mu = F.col("st") / F.col("nt")
    return per_g.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "n_customers",
        rnd(F.col("sg") / F.col("st"), 6).alias("revenue_share"),
        rnd(F.col("lg") / F.col("sg") - F.log(mu_g), 6).alias(
            "theil_within"
        ),
        rnd((F.col("sg") / F.col("st")) * F.log(mu_g / mu), 6).alias(
            "between_term"
        ),
    )


# --------------------------------------------------------------------------
# Empirical-Bayes shrinkage: beta-binomial smoothed per-customer rates
# --------------------------------------------------------------------------


@query(
    "agg_eb_shrunk_rates",
    oracle="""
    WITH per_c AS (
        SELECT o.o_custkey AS custkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (l.l_returnflag = 'R') AS BIGINT) AS k
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_custkey
    ),
    stats AS (
        SELECT avg(k * 1.0 / n) AS m, var_samp(k * 1.0 / n) AS v
        FROM per_c
    ),
    ab AS (
        SELECT m, (m * (1.0 - m) / v - 1.0) AS prior_ss
        FROM stats WHERE v > 0
    )
    SELECT custkey, n, k,
           round(k * 1.0 / n, 6) AS rate_raw,
           round((k + ab.m * ab.prior_ss) / (n + ab.prior_ss), 6)
               AS rate_shrunk
    FROM per_c CROSS JOIN ab
    WHERE ab.prior_ss > 0
    """,
)
def agg_eb_shrunk_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes (beta-binomial) shrinkage of each customer's
    line-item return rate: the Beta prior's mean and pseudo-count are
    fit from the population by moment matching (prior_ss = m(1-m)/v -
    1), then every customer's raw k/n is pulled toward the global mean
    in proportion to how little data they have — rate_shrunk = (k +
    m*prior_ss)/(n + prior_ss). This is THE standard fix for the
    small-sample league-table fallacy (a 1-for-2 customer is not a 50%
    returner); emitting raw and shrunk side by side makes the
    shrinkage visible and testable (shrunk always between raw and the
    global mean, heavier for small n).

    Scale shape: the orderkey join is the only fact-sized operation
    (bucket both tables on orderkey at 100 TB and it disappears into
    the scan); the per-customer aggregate carries just (n, k); the
    prior fit is a one-row fold over the customer frame broadcast
    back. Output is one row per active customer."""
    t = tables(spark, sf_dir)
    per_c = (
        t.lineitem.select("l_orderkey", "l_returnflag")
        .join(
            t.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count(F.when(F.col("l_returnflag") == "R", 1))
            .cast("long")
            .alias("k"),
        )
    )
    rate = F.col("k") / F.col("n")
    stats = per_c.agg(
        F.avg(rate).alias("m"), F.var_samp(rate).alias("v")
    )
    ab = stats.filter(F.col("v") > 0).select(
        "m", (F.col("m") * (1.0 - F.col("m")) / F.col("v") - 1.0).alias(
            "prior_ss"
        )
    )
    return (
        per_c.crossJoin(F.broadcast(ab))
        .filter(F.col("prior_ss") > 0)
        .select(
            "custkey",
            "n",
            "k",
            rnd(rate, 6).alias("rate_raw"),
            rnd(
                (F.col("k") + F.col("m") * F.col("prior_ss"))
                / (F.col("n") + F.col("prior_ss")),
                6,
            ).alias("rate_shrunk"),
        )
    )


# --------------------------------------------------------------------------
# Categorical association: chi-square independence + Cramer's V
# --------------------------------------------------------------------------


@query(
    "agg_cramers_v_association",
    oracle="""
    WITH j AS (
        SELECT o.o_orderpriority AS pri, l.l_returnflag AS rf
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    obs AS (
        SELECT pri, rf, CAST(count(*) AS DOUBLE) AS o
        FROM j GROUP BY pri, rf
    ),
    rowm AS (SELECT pri, sum(o) AS rn FROM obs GROUP BY pri),
    colm AS (SELECT rf, sum(o) AS cn FROM obs GROUP BY rf),
    tot AS (
        SELECT sum(o) AS n,
               CAST((SELECT count(*) FROM rowm) AS BIGINT) AS r,
               CAST((SELECT count(*) FROM colm) AS BIGINT) AS c
        FROM obs
    ),
    chi AS (
        SELECT sum(pow(obs.o - rowm.rn * colm.cn / tot.n, 2)
                   / (rowm.rn * colm.cn / tot.n)) AS chi2,
               max(tot.n) AS n, max(tot.r) AS r, max(tot.c) AS c
        FROM obs
        JOIN rowm ON rowm.pri = obs.pri
        JOIN colm ON colm.rf = obs.rf
        CROSS JOIN tot
    )
    SELECT CAST(n AS BIGINT) AS n_lines,
           CAST(r AS BIGINT) AS n_priorities,
           CAST(c AS BIGINT) AS n_returnflags,
           round(chi2, 4) AS chi2,
           CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
           round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) AS cramers_v
    FROM chi
    """,
)
def agg_cramers_v_association(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chi-square test of independence between order priority and
    line return flag, summarized as Cramér's V = sqrt(chi2 / (n * min(r-1, c-1)))
    — the [0, 1] effect-size that answers "are these two categoricals
    actually related, and how strongly" where raw chi2 only answers
    "detectably at this n" (at 100 TB EVERYTHING is detectable, which
    is why the effect size is the column that matters at scale).
    Complements events_hour_uniformity_chi2 (one-way goodness of fit)
    with the two-way contingency case; TPC-H's generator makes
    independence (V ~ 0) the expected honest answer, pinned by test.

    Scale shape: the orderkey equi-join is the only fact-sized step;
    the contingency table is one (priority, mode) aggregate — at most
    r*c = 35 rows — and the marginals, expected counts, and the chi2
    fold all derive from that tiny frame."""
    t = tables(spark, sf_dir)
    j = t.lineitem.select("l_orderkey", "l_returnflag").join(
        t.orders.select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    obs = j.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("l_returnflag").alias("rf"),
    ).agg(F.count(F.lit(1)).cast("double").alias("o"))
    rowm = obs.groupBy("pri").agg(F.sum("o").alias("rn"))
    colm = obs.groupBy("rf").agg(F.sum("o").alias("cn"))
    tot = obs.agg(F.sum("o").alias("n"))
    r_cnt = rowm.agg(F.count(F.lit(1)).cast("long").alias("r"))
    c_cnt = colm.agg(F.count(F.lit(1)).cast("long").alias("c"))
    exp = F.col("rn") * F.col("cn") / F.col("n")
    chi = (
        obs.join(F.broadcast(rowm), "pri")
        .join(F.broadcast(colm), "rf")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(r_cnt))
        .crossJoin(F.broadcast(c_cnt))
        .agg(
            F.sum(F.pow(F.col("o") - exp, 2) / exp).alias("chi2"),
            F.max("n").alias("n"),
            F.max("r").alias("r"),
            F.max("c").alias("c"),
        )
    )
    return chi.select(
        F.col("n").cast("long").alias("n_lines"),
        F.col("r").cast("long").alias("n_priorities"),
        F.col("c").cast("long").alias("n_returnflags"),
        rnd("chi2", 4).alias("chi2"),
        ((F.col("r") - 1) * (F.col("c") - 1))
        .cast("long")
        .alias("dof"),
        rnd(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Hill tail-index estimator: how heavy is the order-value tail?
# --------------------------------------------------------------------------

_HILL_K = 100  # top-order statistics in the estimate


@query(
    "agg_hill_tail_index",
    oracle=f"""
    WITH ranked AS (
        SELECT o_totalprice AS x,
               row_number() OVER (
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ),
    thr AS (SELECT x AS xk FROM ranked WHERE rk = {_HILL_K} + 1),
    top AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               sum(ln(ranked.x / thr.xk)) AS s
        FROM ranked CROSS JOIN thr WHERE ranked.rk <= {_HILL_K}
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_orders,
           top.k AS k_top,
           round((SELECT xk FROM thr), 2) AS x_threshold,
           round(top.s / top.k, 6) AS mean_log_excess,
           round(top.k / top.s, 4) AS hill_alpha
    FROM top
    """,
)
def agg_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the order-value tail index: alpha_hat = k /
    sum(ln(x_(i) / x_(k+1))) over the top k=100 order statistics — the
    standard answer to "is this distribution heavy-tailed, and how
    heavy" (alpha < 2: infinite variance, whale-dominated — expect
    shuffle skew, budget for salting; alpha large: thin exponential-
    like tail, uniform partitioning is safe). This is the numeric
    companion to the shape diagnostics (dq_join_key_skew_profile,
    events_lorenz_deciles, text_zipf_slope fits words — this fits
    VALUES), and TPC-H's bounded-uniform totalprice should produce a
    LARGE alpha (no power-law tail), which the semantic test pins.

    Scale shape: the only fact-sized step is a top-(k+1) selection —
    Spark plans TakeOrdered (per-partition heaps, no global sort);
    the log-excess fold runs on k rows with the threshold broadcast
    as a one-row cross join."""
    o = tables(spark, sf_dir).orders
    # sort+limit plans as TakeOrderedAndProject (per-partition heaps,
    # no global sort); the rank window then runs on k+1 rows only.
    top_rows = (
        o.select(F.col("o_totalprice").alias("x"), "o_orderkey")
        .orderBy(F.desc("x"), F.asc("o_orderkey"))
        .limit(_HILL_K + 1)
    )
    ranked = top_rows.select(
        "x",
        F.row_number()
        .over(Window.orderBy(F.desc("x"), F.asc("o_orderkey")))
        .alias("rk"),
    )
    thr = ranked.filter(F.col("rk") == _HILL_K + 1).select(
        F.col("x").alias("xk")
    )
    top = (
        ranked.filter(F.col("rk") <= _HILL_K)
        .crossJoin(F.broadcast(thr))
        .agg(
            F.count(F.lit(1)).cast("long").alias("k"),
            F.sum(F.log(F.col("x") / F.col("xk"))).alias("s"),
            F.max("xk").alias("xk"),
        )
    )
    n = o.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    return top.crossJoin(F.broadcast(n)).select(
        "n_orders",
        F.col("k").alias("k_top"),
        rnd("xk", 2).alias("x_threshold"),
        rnd(F.col("s") / F.col("k"), 6).alias("mean_log_excess"),
        rnd(F.col("k") / F.col("s"), 4).alias("hill_alpha"),
    )


# --------------------------------------------------------------------------
# Lognormal fit audit: moment fit of log-values + normality diagnostics
# --------------------------------------------------------------------------


@query(
    "agg_lognormal_fit_audit",
    oracle="""
    WITH lx AS (
        SELECT ln(o_totalprice) AS y FROM orders WHERE o_totalprice > 0
    ),
    m AS (
        SELECT count(*) AS n, avg(y) AS mu, stddev_samp(y) AS sigma
        FROM lx
    )
    SELECT CAST(m.n AS BIGINT) AS n_orders,
           round(m.mu, 6) AS mu_log,
           round(m.sigma, 6) AS sigma_log,
           round(avg(pow((lx.y - m.mu) / m.sigma, 3)), 4) AS skew_log,
           round(avg(pow((lx.y - m.mu) / m.sigma, 4)) - 3.0, 4)
               AS excess_kurtosis_log,
           round(exp(m.mu + m.sigma * m.sigma / 2.0), 2)
               AS fitted_mean
    FROM lx CROSS JOIN m
    GROUP BY m.n, m.mu, m.sigma
    """,
)
def agg_lognormal_fit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lognormal moment fit of order values with built-in
    goodness-of-fit diagnostics: (mu, sigma) estimated on log-values,
    plus the log-domain skewness and excess kurtosis — both ~0 iff the
    lognormal family actually fits, which is the pass/fail a capacity
    or pricing model needs BEFORE using the fitted tail (a wrong
    family underestimates extremes far worse than wrong parameters).
    fitted_mean = exp(mu + sigma^2/2) back-checks the fit against the
    raw mean at a glance. Complements agg_hill_tail_index: Hill asks
    "is the tail power-law", this asks "is the body lognormal" —
    together they bracket the standard heavy-tail modeling decision.

    Scale shape: one pass computes (n, mu, sigma) map-side; the
    standardized-moment fold is a second pass over the same scan with
    the one-row stats broadcast — no shuffle beyond two scalar
    aggregates. TPC-H's bounded-uniform totalprice is NOT lognormal
    (strong negative log-skew), which the semantic test pins — the
    diagnostics exist precisely to catch that."""
    o = tables(spark, sf_dir).orders.filter(F.col("o_totalprice") > 0)
    lx = o.select(F.log("o_totalprice").alias("y"))
    m = lx.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("y").alias("mu"),
        F.stddev_samp("y").alias("sigma"),
    )
    z = (F.col("y") - F.col("mu")) / F.col("sigma")
    return lx.crossJoin(F.broadcast(m)).agg(
        F.max("n").cast("long").alias("n_orders"),
        rnd(F.max("mu"), 6).alias("mu_log"),
        rnd(F.max("sigma"), 6).alias("sigma_log"),
        rnd(F.avg(F.pow(z, 3)), 4).alias("skew_log"),
        rnd(F.avg(F.pow(z, 4)) - 3.0, 4).alias("excess_kurtosis_log"),
        rnd(
            F.exp(F.max("mu") + F.max("sigma") * F.max("sigma") / 2.0), 2
        ).alias("fitted_mean"),
    )


# --------------------------------------------------------------------------
# Spearman rank correlation by group (average ranks for ties)
# --------------------------------------------------------------------------


@query(
    "agg_spearman_corr",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_linestatus,
               rank() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY l_quantity)
                 + (count(*) OVER (PARTITION BY l_returnflag, l_linestatus,
                                   l_quantity) - 1) / 2.0 AS rq,
               rank() OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY l_extendedprice)
                 + (count(*) OVER (PARTITION BY l_returnflag, l_linestatus,
                                   l_extendedprice) - 1) / 2.0 AS rp
        FROM lineitem
    )
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(corr(rq, rp), 4) AS spearman_rho
    FROM ranked
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (quantity vs extended price) per
    (returnflag, linestatus) group: ranks with average-rank tie
    handling (min-rank + (ties-1)/2 — identical to the midrank
    convention scipy uses), then Pearson on the ranks. The monotone-
    association check Pearson misses when the relationship is
    nonlinear or the marginals are heavy-tailed.

    Scale shape: two rank windows per group partition, then one
    mergeable corr aggregate — the shuffle key is the group, and the
    in-partition sort is the unavoidable cost of exact ranks. At
    cluster scale with billions of rows per group, swap the exact
    window ranks for binned midranks (fixed histogram per group,
    mergeable) — the operator's contract (rho per group) is unchanged."""
    li = tables(spark, sf_dir).lineitem
    g = ["l_returnflag", "l_linestatus"]
    wq = Window.partitionBy(*g).orderBy("l_quantity")
    wqt = Window.partitionBy(*g, "l_quantity")
    wp = Window.partitionBy(*g).orderBy("l_extendedprice")
    wpt = Window.partitionBy(*g, "l_extendedprice")
    ranked = li.select(
        *g,
        (
            F.rank().over(wq) + (F.count(F.lit(1)).over(wqt) - 1) / 2.0
        ).alias("rq"),
        (
            F.rank().over(wp) + (F.count(F.lit(1)).over(wpt) - 1) / 2.0
        ).alias("rp"),
    )
    return ranked.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        rnd(F.corr("rq", "rp"), 4).alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# Mutual information between two categorical columns
# --------------------------------------------------------------------------


@query(
    "agg_mutual_information",
    oracle="""
    WITH joint AS (
        SELECT o_orderpriority AS x, o_orderstatus AS y,
               count(*) AS nxy
        FROM orders GROUP BY 1, 2
    ),
    tot AS (SELECT sum(nxy) AS n FROM joint),
    mx AS (SELECT x, sum(nxy) AS nx FROM joint GROUP BY x),
    my AS (SELECT y, sum(nxy) AS ny FROM joint GROUP BY y),
    mi AS (
        SELECT sum((j.nxy * 1.0 / tot.n)
                   * ln((j.nxy * 1.0 / tot.n)
                        / ((mx.nx * 1.0 / tot.n)
                           * (my.ny * 1.0 / tot.n)))) AS mi_nats,
               CAST(max(tot.n) AS BIGINT) AS n_rows
        FROM joint j, tot, mx, my
        WHERE j.x = mx.x AND j.y = my.y
    ),
    hx AS (
        SELECT -sum((nx * 1.0 / tot.n) * ln(nx * 1.0 / tot.n)) AS h
        FROM mx, tot
    ),
    hy AS (
        SELECT -sum((ny * 1.0 / tot.n) * ln(ny * 1.0 / tot.n)) AS h
        FROM my, tot
    )
    SELECT mi.n_rows,
           round(mi.mi_nats, 6) AS mi_nats,
           round(hx.h, 6) AS h_priority,
           round(hy.h, 6) AS h_status,
           round(mi.mi_nats / least(hx.h, hy.h), 6) AS nmi
    FROM mi, hx, hy
    """,
)
def agg_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between order priority and order
    status, with the marginal entropies and the min-entropy-normalized
    MI in [0, 1] — the dependence measure that, unlike Cramer's V
    (already in the catalog), is additive in the information-theoretic
    sense and directly answers "how many nats of the status do I learn
    from the priority". The feature-selection primitive for
    categorical predictors.

    Scale shape: one (x, y) contingency aggregate (mergeable, output
    bounded by the level grid), marginals re-aggregated from the joint
    counts (never from the raw rows), and every join after the first
    aggregate is over the tiny contingency table — broadcast by AQE.
    Event-grain data is touched exactly once."""
    orders = tables(spark, sf_dir).orders
    joint = (
        orders.groupBy(
            F.col("o_orderpriority").alias("x"),
            F.col("o_orderstatus").alias("y"),
        )
        .agg(F.count(F.lit(1)).alias("nxy"))
        .cache()
    )
    tot = joint.agg(F.sum("nxy").alias("n"))
    mx = joint.groupBy("x").agg(F.sum("nxy").alias("nx"))
    my = joint.groupBy("y").agg(F.sum("nxy").alias("ny"))
    terms = (
        joint.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
    )
    mi = terms.agg(
        F.sum(
            (F.col("nxy") / F.col("n"))
            * F.log(
                (F.col("nxy") / F.col("n"))
                / ((F.col("nx") / F.col("n")) * (F.col("ny") / F.col("n")))
            )
        ).alias("mi_nats"),
        F.max("n").cast("long").alias("n_rows"),
    )
    hx = (
        mx.crossJoin(F.broadcast(tot))
        .agg(
            (-F.sum((F.col("nx") / F.col("n")) * F.log(F.col("nx") / F.col("n"))))
            .alias("h")
        )
        .withColumnRenamed("h", "h_priority_raw")
    )
    hy = (
        my.crossJoin(F.broadcast(tot))
        .agg(
            (-F.sum((F.col("ny") / F.col("n")) * F.log(F.col("ny") / F.col("n"))))
            .alias("h")
        )
        .withColumnRenamed("h", "h_status_raw")
    )
    out = mi.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    return out.select(
        "n_rows",
        rnd("mi_nats", 6).alias("mi_nats"),
        rnd("h_priority_raw", 6).alias("h_priority"),
        rnd("h_status_raw", 6).alias("h_status"),
        rnd(
            F.col("mi_nats") / F.least("h_priority_raw", "h_status_raw"), 6
        ).alias("nmi"),
    )


# --------------------------------------------------------------------------
# Full pairwise correlation matrix over the lineitem numeric columns
# --------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_matrix_oracle() -> str:
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    selects = [
        f"""SELECT '{a}' AS col_a, '{b}' AS col_b,
               round(corr({a}, {b}), 6) AS pearson_r,
               round(covar_samp({a}, {b}), 6) AS covar
        FROM lineitem"""
        for a, b in pairs
    ]
    return "\nUNION ALL\n".join(selects)


@query("agg_corr_matrix_pairs", oracle=_corr_matrix_oracle())
def agg_corr_matrix_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation / sample covariance over all 6
    unordered pairs of the lineitem numeric columns (quantity,
    extendedprice, discount, tax) in long form — the feature-covariance
    screen run before any model fitting or PCA whitening, and the
    multicollinearity check for the regression ops. One row per pair,
    canonical column order.

    Scale shape: all 12 statistics are algebraic moments, so Catalyst
    folds them into ONE partial+final aggregate pass over the scan —
    the table is read once, the shuffle carries a single row of moment
    state, and the long-form reshape is a constant 6-row projection on
    the driver-side-free aggregate result (no unpivot of raw data)."""
    li = tables(spark, sf_dir).lineitem
    pairs = [
        (a, b)
        for i, a in enumerate(_CORR_COLS)
        for b in _CORR_COLS[i + 1 :]
    ]
    aggs = []
    for a, b in pairs:
        aggs.append(rnd(F.corr(a, b), 6).alias(f"r__{a}__{b}"))
        aggs.append(rnd(F.covar_samp(a, b), 6).alias(f"c__{a}__{b}"))
    wide = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', `r__{a}__{b}`, `c__{a}__{b}`" for a, b in pairs
    )
    return wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) "
        "AS (col_a, col_b, pearson_r, covar)"
    )


# --------------------------------------------------------------------------
# Poisson bootstrap confidence interval (content-addressed resampling)
# --------------------------------------------------------------------------

_BOOT_B = 64
# Poisson(1) CDF ladder; identical literals on both engines so the
# inverse-CDF draw is bit-deterministic.
_POIS_CDF = [
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999897508033253",
]
_U32_BOOT = 4294967296.0


def _pois_case_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE{branches} ELSE 8 END"


def _pois_ladder_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"CASE{branches} ELSE 8 END"


def _boot_oracle() -> str:
    w = _pois_ladder_sql(
        "((((CASE WHEN s.j < 4 THEN hi ELSE lo END >> (15 * (s.j % 4)))"
        " & 32767) + 0.5) / 32768.0)"
    )
    return f"""
    WITH digs AS (SELECT unnest(generate_series(0, {_BOOT_B // 8 - 1})) AS i),
    hashed AS (
        SELECT d.i, o.o_totalprice AS x,
               md5(CAST(o.o_orderkey AS VARCHAR) || ':'
                   || CAST(d.i AS VARCHAR)) AS dig
        FROM orders o CROSS JOIN digs d
    ),
    words AS (
        SELECT i, x,
               ('0x' || substring(dig, 1, 15))::BIGINT AS hi,
               ('0x' || substring(dig, 16, 15))::BIGINT AS lo
        FROM hashed
    ),
    weighted AS (
        SELECT w.i * 8 + s.j AS b, {w} AS w, w.x
        FROM words w
        CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS j) s
    ),
    means AS (
        SELECT b, round(sum(w * x) / sum(w), 4) AS m
        FROM weighted GROUP BY b
    ),
    ranked AS (
        SELECT m, row_number() OVER (ORDER BY m, b) AS rn FROM means
    ),
    pt AS (SELECT round(avg(o_totalprice), 4) AS point_mean FROM orders)
    SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicates,
           pt.point_mean,
           max(CASE WHEN rn = 2 THEN m END) AS ci_lo,
           max(CASE WHEN rn = {_BOOT_B - 1} THEN m END) AS ci_hi,
           round(stddev_samp(m), 4) AS se_boot
    FROM ranked CROSS JOIN pt
    GROUP BY pt.point_mean
    """


def _boot_weights_batch(keys) -> "np.ndarray":
    """(n, 64) Poisson weights: 8 md5 digests per key, two 60-bit words
    per digest, four 15-bit shift/mask uniforms per word, inverse-CDF
    via one vectorized searchsorted. The only Python-loop cost is the
    md5 calls themselves; everything downstream is numpy-wide. Shared
    by the operator (inside the pandas UDF) and the tests."""
    import hashlib

    import numpy as np

    cdf = np.array([float(c) for c in _POIS_CDF])
    n = len(keys)
    n_dig = _BOOT_B // 8
    blob = b"".join(
        hashlib.md5(f"{k}:{i}".encode()).digest()
        for k in keys
        for i in range(n_dig)
    )
    d = np.frombuffer(blob, dtype=np.uint8).reshape(-1, 16).astype(np.uint64)
    acc_hi = np.zeros(len(d), dtype=np.uint64)
    acc_lo = np.zeros(len(d), dtype=np.uint64)
    for c in range(8):
        acc_hi = (acc_hi << np.uint64(8)) | d[:, c]
        acc_lo = (acc_lo << np.uint64(8)) | d[:, 7 + c]
    # hex chars [0:15] = top 60 bits of bytes 0-7; [15:30] = low 60
    # bits of bytes 7-14
    hi = acc_hi >> np.uint64(4)
    lo = acc_lo & np.uint64((1 << 60) - 1)
    words = np.stack([hi, lo], axis=1)  # (n*n_dig, 2)
    shifts = np.uint64(15) * np.arange(4, dtype=np.uint64)
    u = (
        ((words[:, :, None] >> shifts[None, None, :])
         & np.uint64(32767)).astype(np.float64)
        + 0.5
    ) / 32768.0  # (n*n_dig, 2, 4): [word h, slice j] -> b = 8i + 4h + j
    w = np.searchsorted(cdf, u.reshape(-1), side="right")
    return w.reshape(n, _BOOT_B).astype(np.int32)


@query("agg_bootstrap_ci_poisson", oracle=_boot_oracle())
def agg_bootstrap_ci_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean order value via the
    POISSON bootstrap (Chamandy et al., "Estimating Uncertainty for
    Massive Data Streams", the standard distributed bootstrap): instead
    of resampling n rows with replacement (impossible without global
    coordination), every (row, replicate) pair draws an independent
    Poisson(1) weight, inverted through a fixed CDF ladder from a
    content-addressed md5 uniform — both engines materialize the
    IDENTICAL 64 resamples, so the interval is hash-checkable rather
    than a seed-dependent approximation. The CI is the 2nd / 63rd of
    the 64 ranked replicate means (~95% percentile interval) beside the
    full-data point estimate and the bootstrap SE, whose agreement with
    sigma/sqrt(n) is asserted in tests — the draw-quality gate that
    REJECTED a cheaper two-round Lehmer generator (its lattice
    correlation with the synthetic keys inflated the SE 2x; md5 passes).

    Scale shape: work is Theta(B n) BY CONTRACT (B = 64 fixed), so the
    growth exponent is ~1 like any per-row transform; the optimization
    surface is the constant, and the chosen path is an Arrow-batched
    pandas UDF that emits each row's 64 weights as ONE array column.
    This is a measured exception to the built-ins-first rule: the
    expression-level formulation re-evaluates the md5/hex-parse inside
    every CASE branch of the inverse-CDF ladder (Spark's subexpression
    elimination skips conditionally-evaluated branches, and
    CollapseProject inlines the digest into all of them — measured
    ~16 s at sf0.1 vs ~4 s for this UDF), while the UDF computes each
    digest exactly once and is itself the codegen barrier that stops
    the re-inlining. posexplode then feeds ONE mergeable (b) aggregate:
    each partition contributes 64 partial (sum wx, sum w) cells, so
    the shuffle carries B rows per partition regardless of data size;
    the rank step sees exactly 64 rows."""
    import pandas as pd  # noqa: F401  (pandas UDF surface)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def boot_weights(keys):
        import pandas as pd

        w = _boot_weights_batch(keys.astype(str).tolist())
        return pd.Series(list(w))

    orders = tables(spark, sf_dir).orders
    weighted = orders.select(
        F.col("o_totalprice").alias("x"),
        F.posexplode(boot_weights(F.col("o_orderkey"))).alias("b", "w"),
    )
    means = weighted.groupBy("b").agg(
        rnd(F.sum(F.col("w") * F.col("x")) / F.sum("w"), 4).alias("m")
    )
    ranked = means.select(
        "m", F.row_number().over(Window.orderBy("m", "b")).alias("rn")
    )
    pt = orders.agg(rnd(F.avg("o_totalprice"), 4).alias("point_mean"))
    return (
        ranked.crossJoin(F.broadcast(pt))
        .groupBy("point_mean")
        .agg(
            F.lit(_BOOT_B).cast("long").alias("n_replicates"),
            F.max(F.when(F.col("rn") == 2, F.col("m"))).alias("ci_lo"),
            F.max(
                F.when(F.col("rn") == _BOOT_B - 1, F.col("m"))
            ).alias("ci_hi"),
            rnd(F.stddev_samp("m"), 4).alias("se_boot"),
        )
        .select(
            "n_replicates", "point_mean", "ci_lo", "ci_hi", "se_boot"
        )
    )


# --------------------------------------------------------------------------
# Exact distributed median via two-pass binning (no global sort)
# --------------------------------------------------------------------------

_MED2_BINS = 1000


@query(
    "agg_median_two_pass_binned",
    oracle=f"""
    WITH stats AS (
        SELECT count(*) AS n, min(l_extendedprice) AS lo,
               max(l_extendedprice) AS hi
        FROM lineitem
    ),
    binned AS (
        SELECT least(CAST(floor((l_extendedprice - s.lo)
                     / ((s.hi - s.lo) / {_MED2_BINS})) AS BIGINT),
                     {_MED2_BINS - 1}) AS b,
               count(*) AS c
        FROM lineitem, stats s GROUP BY 1
    ),
    cum AS (
        SELECT b, c, sum(c) OVER (ORDER BY b) AS cum_c,
               sum(c) OVER (ORDER BY b) - c AS before_c
        FROM binned
    ),
    target AS (
        SELECT CAST(ceil(n / 2.0) AS BIGINT) AS k, n, lo, hi FROM stats
    ),
    med_bin AS (
        SELECT cum.b, cum.before_c, t.k, t.n, t.lo, t.hi, cum.c AS n_in_bin
        FROM cum, target t
        WHERE cum.before_c < t.k AND t.k <= cum.cum_c
    ),
    second_pass AS (
        SELECT m.n, m.k, m.b, m.n_in_bin,
               min(l_extendedprice) FILTER (
                   rnk = m.k - m.before_c) AS median_val
        FROM med_bin m
        JOIN (
            SELECT l_extendedprice,
                   least(CAST(floor((l_extendedprice - s.lo)
                         / ((s.hi - s.lo) / {_MED2_BINS})) AS BIGINT),
                         {_MED2_BINS - 1}) AS b,
                   row_number() OVER (
                       PARTITION BY least(CAST(floor((l_extendedprice - s.lo)
                           / ((s.hi - s.lo) / {_MED2_BINS})) AS BIGINT),
                           {_MED2_BINS - 1})
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS rnk
            FROM lineitem, stats s
        ) v ON v.b = m.b
        GROUP BY m.n, m.k, m.b, m.n_in_bin
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(b AS BIGINT) AS median_bin,
           CAST(n_in_bin AS BIGINT) AS n_in_bin,
           round(median_val, 2) AS median_exact
    FROM second_pass
    """,
)
def agg_median_two_pass_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed median WITHOUT a global sort — the two-pass
    binning algorithm a 100 TB engine actually uses when "exact" is
    non-negotiable ([[agg_percentile_exact]] sorts everything;
    [[agg_percentile_approx]] gives up exactness; this gets exact at
    two linear scans): pass 1 histograms the column into {bins}
    equal-width bins (one map-side fold) and walks the cumulative
    counts to find the single bin containing the k = ceil(n/2)-th
    smallest value (the lower median, percentile_disc semantics);
    pass 2 ranks ONLY that bin's members — n/{bins} of the data in
    expectation — and picks the (k - count_before)-th. The output
    carries the located bin and its population as the honesty columns
    showing how small the second pass really was.

    Scale shape: pass 1 is a {bins}-cell aggregate (map-side partial,
    broadcast min/max); the cumulative walk runs on {bins} rows; pass
    2's sort is confined to one bin's rows. No stage ever globally
    sorts the column — the property that survives a 100x scale-up.
    Degenerate distributions (everything in one bin) degrade to the
    full sort gracefully and visibly via n_in_bin."""
    t = tables(spark, sf_dir)
    li = t.lineitem.select("l_extendedprice", "l_orderkey", "l_linenumber")
    stats = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
    binw = (F.col("hi") - F.col("lo")) / _MED2_BINS
    bin_of = F.least(
        F.floor((F.col("l_extendedprice") - F.col("lo")) / binw).cast(
            "long"
        ),
        F.lit(_MED2_BINS - 1),
    )
    with_bin = li.crossJoin(F.broadcast(stats)).select(
        "l_extendedprice", "l_orderkey", "l_linenumber",
        bin_of.alias("b"),
    )
    binned = with_bin.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("b")
    cum = binned.select(
        "b",
        "c",
        F.sum("c").over(wcum).alias("cum_c"),
        (F.sum("c").over(wcum) - F.col("c")).alias("before_c"),
    )
    target = stats.select(
        F.ceil(F.col("n") / 2.0).cast("long").alias("k"), "n"
    )
    med_bin = F.broadcast(
        cum.crossJoin(F.broadcast(target)).filter(
            (F.col("before_c") < F.col("k"))
            & (F.col("k") <= F.col("cum_c"))
        ).select(
            "b", "before_c", "k", "n", F.col("c").alias("n_in_bin")
        )
    )
    wrank = Window.partitionBy("b").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    second = (
        with_bin.join(med_bin, "b")
        .withColumn("rnk", F.row_number().over(wrank))
        .filter(F.col("rnk") == F.col("k") - F.col("before_c"))
    )
    return second.select(
        F.col("n").cast("long").alias("n_rows"),
        F.col("b").cast("long").alias("median_bin"),
        F.col("n_in_bin").cast("long").alias("n_in_bin"),
        rnd(F.col("l_extendedprice"), 2).alias("median_exact"),
    )


agg_median_two_pass_binned.__doc__ = (
    agg_median_two_pass_binned.__doc__.replace("{bins}", str(_MED2_BINS))
)


# --------------------------------------------------------------------------
# Eta-squared by candidate dimension (variance-explained scan)
# --------------------------------------------------------------------------

_ETA_DIMS_SQL = """
        SELECT 'event_type' AS dim, event_type AS dv, value AS v
        FROM events
        UNION ALL
        SELECT 'hour_of_day', CAST(hour(ts) AS VARCHAR), value FROM events
        UNION ALL
        SELECT 'user_bucket', CAST(user_id % 10 AS VARCHAR), value
        FROM events
"""


@query(
    "agg_eta_squared_by_keys",
    oracle=f"""
    WITH tot AS (
        SELECT count(*) AS n, sum(value) AS s,
               sum(value * value) AS ss
        FROM events
    ),
    dims AS ({_ETA_DIMS_SQL}),
    g AS (
        SELECT dim, dv, count(*) AS ng, sum(v) AS sg
        FROM dims GROUP BY dim, dv
    ),
    per_dim AS (
        SELECT dim, count(*) AS n_groups,
               sum(sg * sg / ng) AS sum_gsq
        FROM g GROUP BY dim
    )
    SELECT p.dim AS dimension,
           CAST(p.n_groups AS BIGINT) AS n_groups,
           round((p.sum_gsq - t.s * t.s / t.n)
                 / (t.ss - t.s * t.s / t.n), 6) AS eta_squared
    FROM per_dim p, tot t
    """,
)
def agg_eta_squared_by_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-explained scan — which dimension matters: eta-squared
    (SS_between / SS_total, the ANOVA effect size) of the event value
    against every candidate grouping dimension (type, hour-of-day,
    user bucket) in ONE unpivoted pass. This is the feature-selection
    triage a metrics/ML platform runs before building per-dimension
    dashboards or one-hot features: a dimension with eta-squared near
    0 explains nothing and costs cardinality. [[ts_dow_anova]] tests
    ONE dimension's significance; this RANKS candidates by effect
    size, from group sums alone (sum(sg^2/ng) - s^2/n — no per-row
    second pass).

    Scale shape: the fact table unpivots to (dim, value) rows — 3x
    map-side fan-out, no shuffle — then one (dim, group) fold and one
    dim-grain reshape; the grand totals are a one-row broadcast. New
    candidate dimensions are one more UNION arm on the same scan."""
    t = tables(spark, sf_dir)
    tot = t.events.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("s"),
        F.sum(F.col("value") * F.col("value")).alias("ss"),
    )
    dims = (
        t.events.select(
            F.lit("event_type").alias("dim"),
            F.col("event_type").alias("dv"),
            F.col("value").alias("v"),
        )
        .unionAll(
            t.events.select(
                F.lit("hour_of_day").alias("dim"),
                F.hour("ts").cast("string").alias("dv"),
                F.col("value").alias("v"),
            )
        )
        .unionAll(
            t.events.select(
                F.lit("user_bucket").alias("dim"),
                (F.col("user_id") % 10).cast("string").alias("dv"),
                F.col("value").alias("v"),
            )
        )
    )
    g = dims.groupBy("dim", "dv").agg(
        F.count(F.lit(1)).alias("ng"), F.sum("v").alias("sg")
    )
    per_dim = g.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.col("sg") * F.col("sg") / F.col("ng")).alias("sum_gsq"),
    )
    return per_dim.crossJoin(F.broadcast(tot)).select(
        F.col("dim").alias("dimension"),
        "n_groups",
        rnd(
            (F.col("sum_gsq") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("ss") - F.col("s") * F.col("s") / F.col("n")),
            6,
        ).alias("eta_squared"),
    )


# --------------------------------------------------------------------------
# Weighted Pearson correlation (importance-weighted moments)
# --------------------------------------------------------------------------


@query(
    "agg_weighted_corr",
    oracle="""
    WITH m AS (
        SELECT l_returnflag AS flag,
               sum(l_extendedprice) AS w,
               sum(l_extendedprice * l_discount) AS wx,
               sum(l_extendedprice * l_quantity) AS wy,
               sum(l_extendedprice * l_discount * l_discount) AS wxx,
               sum(l_extendedprice * l_quantity * l_quantity) AS wyy,
               sum(l_extendedprice * l_discount * l_quantity) AS wxy,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT flag, CAST(n AS BIGINT) AS n,
           round((wxy / w - (wx / w) * (wy / w))
                 / (sqrt(wxx / w - (wx / w) * (wx / w))
                    * sqrt(wyy / w - (wy / w) * (wy / w))), 6)
               AS weighted_corr,
           round((wx / w), 6) AS weighted_mean_discount,
           round((wy / w), 4) AS weighted_mean_quantity
    FROM m
    WHERE wxx / w - (wx / w) * (wx / w) > 0
      AND wyy / w - (wy / w) * (wy / w) > 0
    """,
)
def agg_weighted_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted Pearson correlation — discount vs quantity
    with every lineitem weighted by its revenue (a dollar-weighted
    relationship, the estimator finance and ads measurement actually
    report: unweighted corr treats a $9 line like a $90k one;
    [[agg_corr_stats]] is the unweighted twin). Computed entirely from
    weighted raw moments (sum w, swx, swy, swxx, swyy, swxy) in ONE
    keyed fold — the textbook cov_w / (sd_w sd_w) identity — so the
    estimator is mergeable and map-side-partial like any sum. Groups
    with zero weighted variance are excluded (correlation undefined).

    Scale shape: one pass, one shuffle at group grain, six sums per
    group — the weighted estimator costs exactly what the unweighted
    one does."""
    t = tables(spark, sf_dir)
    w = F.col("l_extendedprice")
    x = F.col("l_discount")
    y = F.col("l_quantity")
    m = t.lineitem.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.sum(w).alias("w"),
        F.sum(w * x).alias("wx"),
        F.sum(w * y).alias("wy"),
        F.sum(w * x * x).alias("wxx"),
        F.sum(w * y * y).alias("wyy"),
        F.sum(w * x * y).alias("wxy"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    mx = F.col("wx") / F.col("w")
    my = F.col("wy") / F.col("w")
    vx = F.col("wxx") / F.col("w") - mx * mx
    vy = F.col("wyy") / F.col("w") - my * my
    cov = F.col("wxy") / F.col("w") - mx * my
    return m.filter((vx > 0) & (vy > 0)).select(
        "flag",
        "n",
        rnd(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias("weighted_corr"),
        rnd(mx, 6).alias("weighted_mean_discount"),
        rnd(my, 4).alias("weighted_mean_quantity"),
    )


# --------------------------------------------------------------------------
# Pythagorean means (arithmetic / geometric / harmonic) per group
# --------------------------------------------------------------------------


@query(
    "agg_pythagorean_means",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 4) AS mean_arith,
           round(exp(avg(ln(value))), 4) AS mean_geom,
           round(count(*) / sum(1.0 / value), 4) AS mean_harm
    FROM events
    WHERE value > 0
    GROUP BY event_type
    """,
)
def agg_pythagorean_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three Pythagorean means per group — because averaging the
    WRONG way is the most common silent metrics bug: rates and speeds
    average harmonically (mean of 10 req/s and 1000 req/s throughput
    over equal work is ~19.8, not 505), multiplicative growth factors
    average geometrically, and only additive quantities average
    arithmetically. Emitting all three side by side per group makes
    the AM >= GM >= HM inequality visible in the data and gives the
    dashboard the right one to pick. Geometric mean is computed as
    exp(mean(ln x)) — the log-sum form that is map-side mergeable and
    overflow-proof where a naive product of a billion values is not;
    harmonic as n / sum(1/x). Non-positive values are excluded (GM/HM
    undefined), visibly via n.

    Scale shape: one keyed fold carrying three sums — identical cost
    to a plain avg; the log/reciprocal transforms are row-local
    codegen."""
    t = tables(spark, sf_dir)
    pos = t.events.filter(F.col("value") > 0)
    return pos.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        rnd(F.avg("value"), 4).alias("mean_arith"),
        rnd(F.exp(F.avg(F.log("value"))), 4).alias("mean_geom"),
        rnd(
            F.count(F.lit(1)) / F.sum(1.0 / F.col("value")), 4
        ).alias("mean_harm"),
    )


# --------------------------------------------------------------------------
# Huber M-estimator of location (fixed IRLS rounds, unrolled oracle)
# --------------------------------------------------------------------------

_HUBER_C = 1.345  # 95% efficiency at the Gaussian
_HUBER_ITERS = 3
_HUBER_ROUND = 6


def _huber_round_sql(t: int) -> str:
    """One IRLS round: Huber weights against mu{t-1}, re-weighted mean,
    ROUNDED (the kmeans float-portability pattern)."""
    return f"""
    mu{t} AS (
        SELECT v.l_returnflag,
               round(sum(CASE WHEN abs(v.x - m.mu) <= {_HUBER_C} * sc.s
                              THEN v.x
                              ELSE v.x * ({_HUBER_C} * sc.s) / abs(v.x - m.mu)
                         END)
                     / sum(CASE WHEN abs(v.x - m.mu) <= {_HUBER_C} * sc.s
                                THEN 1.0
                                ELSE ({_HUBER_C} * sc.s) / abs(v.x - m.mu)
                           END), {_HUBER_ROUND}) AS mu
        FROM hv v
        JOIN mu{t - 1} m USING (l_returnflag)
        JOIN hscale sc USING (l_returnflag)
        GROUP BY v.l_returnflag
    )"""


@query(
    "agg_huber_m_location",
    oracle=f"""
    WITH hv AS (
        SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS x
        FROM lineitem
    ),
    med AS (
        SELECT l_returnflag, quantile_cont(x, 0.5) AS med
        FROM hv GROUP BY l_returnflag
    ),
    hscale AS (
        SELECT v.l_returnflag,
               round(1.4826 * quantile_cont(abs(v.x - m.med), 0.5),
                     {_HUBER_ROUND}) AS s,
               any_value(m.med) AS med
        FROM hv v JOIN med m USING (l_returnflag)
        GROUP BY v.l_returnflag
    ),
    mu0 AS (
        SELECT l_returnflag, round(med, {_HUBER_ROUND}) AS mu FROM hscale
    ),
    {",".join(_huber_round_sql(t) for t in range(1, _HUBER_ITERS + 1))},
    plain AS (
        SELECT l_returnflag, count(*) AS n, avg(x) AS mean_x
        FROM hv GROUP BY l_returnflag
    )
    SELECT p.l_returnflag,
           CAST(p.n AS BIGINT) AS n,
           round(sc.med, 4) AS median_x,
           round(sc.s, 4) AS mad_scale,
           round(p.mean_x, 4) AS mean_x,
           round(f.mu, 4) AS huber_mu
    FROM plain p
    JOIN hscale sc USING (l_returnflag)
    JOIN mu{_HUBER_ITERS} f USING (l_returnflag)
    """,
)
def agg_huber_m_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huber M-estimator of location (Huber 1964, c={c} for 95%
    Gaussian efficiency) per group via {it} unrolled IRLS rounds — the
    ROBUST mean that ignores heavy tails without throwing data away
    (between the mean and the median; the estimator behind robust KPI
    baselines). Scale is the MAD x 1.4826 consistency constant;
    iteration starts at the median; Huber weights clamp each point's
    influence at c*s. Per-round means are ROUNDED to {r} decimals
    ([[embed_kmeans_cluster]]'s float-portability pattern), so both
    engines walk identical trajectories and the whole fit — an
    iterative numeric — is hash-checked with no rows-only escape.

    Scale shape: the exact medians are the only holistic step (same
    cost class as [[agg_percentile_exact]]; at 100 TB swap in the
    DDSketch/approx median and keep the IRLS shape); each IRLS round
    is ONE keyed aggregate over the fact table with the tiny
    (group, mu) state broadcast back — k rounds = k scans, map-side
    combined, no collect."""
    t = tables(spark, sf_dir)
    hv = t.lineitem.select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("x")
    )
    med = hv.groupBy("l_returnflag").agg(
        F.percentile("x", F.lit(0.5)).alias("med")
    )
    hscale = (
        hv.join(med, "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            rnd(
                1.4826
                * F.percentile(F.abs(F.col("x") - F.col("med")), F.lit(0.5)),
                _HUBER_ROUND,
            ).alias("s"),
            F.any_value("med").alias("med"),
        )
    )
    mu = hscale.select(
        "l_returnflag", rnd(F.col("med"), _HUBER_ROUND).alias("mu")
    )
    for _ in range(_HUBER_ITERS):
        joined = hv.join(F.broadcast(mu), "l_returnflag").join(
            F.broadcast(hscale.select("l_returnflag", "s")), "l_returnflag"
        )
        dev = F.abs(F.col("x") - F.col("mu"))
        cs = _HUBER_C * F.col("s")
        w = F.when(dev <= cs, F.lit(1.0)).otherwise(cs / dev)
        mu = joined.groupBy("l_returnflag").agg(
            rnd(
                F.sum(F.col("x") * w) / F.sum(w), _HUBER_ROUND
            ).alias("mu")
        )
    plain = hv.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.avg("x").alias("mean_x")
    )
    return (
        plain.join(hscale, "l_returnflag")
        .join(mu, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("n").cast("long").alias("n"),
            rnd("med", 4).alias("median_x"),
            rnd("s", 4).alias("mad_scale"),
            rnd("mean_x", 4).alias("mean_x"),
            rnd("mu", 4).alias("huber_mu"),
        )
    )


agg_huber_m_location.__doc__ = (
    agg_huber_m_location.__doc__.replace("{c}", str(_HUBER_C))
    .replace("{it}", str(_HUBER_ITERS))
    .replace("{r}", str(_HUBER_ROUND))
)
