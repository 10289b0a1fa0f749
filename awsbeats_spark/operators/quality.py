"""Data-quality / validation operators — engine extension (SURVEY.md
§2.C). The reference ships records blind (it drops rows only on encode
error, streams/client.go:109-125); a 100-TB ingest pipeline needs
declarative quality gates that run as ONE aggregation pass per table,
not a rule-at-a-time rescan.

Scale notes: every operator here is a single scan with map-side partial
aggregation (conditional sums / anti-join counts against broadcast
dims); nothing rescans per rule. At 1000 executors each check is one
exchange of a handful of counter rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query

# (rule_name, predicate SQL) — violations counted where the predicate is
# TRUE. One shared expression per rule: ANSI enough to be identical on
# both engines.
_LINEITEM_RULES = (
    ("quantity_out_of_range", "l_quantity < 1 OR l_quantity > 50"),
    ("discount_out_of_range", "l_discount < 0 OR l_discount > 0.5"),
    ("tax_negative", "l_tax < 0"),
    ("price_not_positive", "l_extendedprice <= 0"),
    ("returnflag_invalid", "l_returnflag NOT IN ('A', 'N', 'R')"),
    ("linestatus_invalid", "l_linestatus NOT IN ('O', 'F')"),
    ("orderkey_null", "l_orderkey IS NULL"),
)


@query(
    "dq_constraint_violations",
    oracle="\nUNION ALL\n".join(
        f"""SELECT '{name}' AS rule_name,
               CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               count(*) AS n_rows
        FROM lineitem"""
        for name, pred in _LINEITEM_RULES
    ),
)
def dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint checking (the Deequ/expectations analog):
    every rule compiles to a conditional sum in ONE HashAggregate over a
    single lineitem scan — adding a rule adds a column to the aggregate,
    not a pass over the data. The oracle's UNION ALL of per-rule scans
    is the semantic spec only."""
    li = tables(spark, sf_dir).lineitem
    aggs = [
        F.sum(F.expr(pred).cast("long")).alias(f"v_{name}")
        for name, pred in _LINEITEM_RULES
    ] + [F.count(F.lit(1)).alias("n_rows")]
    wide = li.agg(*aggs)
    stack_args = ", ".join(f"'{name}', v_{name}" for name, _ in _LINEITEM_RULES)
    return wide.select(
        F.expr(
            f"stack({len(_LINEITEM_RULES)}, {stack_args}) AS (rule_name, n_violations)"
        ),
        "n_rows",
    ).select("rule_name", "n_violations", "n_rows")


@query(
    "dq_referential_orphans",
    oracle="""
    SELECT 'lineitem->orders' AS fk_edge,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'orders->customer' AS fk_edge,
           (SELECT count(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS n_orphans
    UNION ALL
    SELECT 'customer->nation' AS fk_edge,
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey)) AS n_orphans
    UNION ALL
    SELECT 'supplier->nation' AS fk_edge,
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey)) AS n_orphans
    """,
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key orphan counts across the star schema's edges, each an
    anti-join count. Dimension sides are broadcast (BROADCAST_TABLES),
    so each edge costs one scan of the fact side and zero shuffles of
    it; the lineitem->orders edge is the only shuffled anti-join and it
    shuffles on the join key exactly once."""
    t = tables(spark, sf_dir)

    def orphans(fact: DataFrame, fk: str, dim: DataFrame, pk: str, edge: str):
        dim_keys = dim.select(F.col(pk).alias(fk)).distinct()
        # orders is a fact-sized dim: let the anti-join shuffle on its
        # key; the true dimensions broadcast
        side = dim_keys if edge == "lineitem->orders" else F.broadcast(dim_keys)
        return (
            fact.join(side, on=fk, how="left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(edge).alias("fk_edge"), "n_orphans")
        )

    return (
        orphans(t.lineitem, "l_orderkey", t.orders, "o_orderkey", "lineitem->orders")
        .unionAll(orphans(t.orders, "o_custkey", t.customer, "c_custkey", "orders->customer"))
        .unionAll(orphans(t.customer, "c_nationkey", t.nation, "n_nationkey", "customer->nation"))
        .unionAll(orphans(t.supplier, "s_nationkey", t.nation, "n_nationkey", "supplier->nation"))
    )


@query(
    "dq_duplicate_keys",
    oracle="""
    SELECT 'orders' AS table_name,
           count(*) AS n_dup_keys,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS n_dup_rows
    FROM (SELECT o_orderkey, count(*) AS n FROM orders
          GROUP BY o_orderkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'customer' AS table_name,
           count(*) AS n_dup_keys,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS n_dup_rows
    FROM (SELECT c_custkey, count(*) AS n FROM customer
          GROUP BY c_custkey HAVING count(*) > 1)
    UNION ALL
    SELECT 'part' AS table_name,
           count(*) AS n_dup_keys,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS n_dup_rows
    FROM (SELECT p_partkey, count(*) AS n FROM part
          GROUP BY p_partkey HAVING count(*) > 1)
    """,
)
def dq_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key uniqueness audit: per table, how many key values
    occur more than once and how many rows they cover. Each branch is
    groupBy(key) with map-side combine then a one-row rollup — the same
    shape ANALYZE-style jobs use; branches union into one result."""

    t = tables(spark, sf_dir)

    def dups(df: DataFrame, key: str, label: str) -> DataFrame:
        return (
            df.groupBy(key)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(
                F.count(F.lit(1)).alias("n_dup_keys"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("n_dup_rows"),
            )
            .select(F.lit(label).alias("table_name"), "n_dup_keys", "n_dup_rows")
        )

    return (
        dups(t.orders, "o_orderkey", "orders")
        .unionAll(dups(t.customer, "c_custkey", "customer"))
        .unionAll(dups(t.part, "p_partkey", "part"))
    )


@query(
    "dq_freshness_watermark",
    oracle="""
    WITH hi AS (SELECT max(ts) AS max_ts FROM events)
    SELECT CAST(hi.max_ts AS VARCHAR) AS max_ts_repr,
           CAST(sum(CASE WHEN e.ts >= hi.max_ts - INTERVAL 1 HOUR
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_last_hour,
           CAST(sum(CASE WHEN e.ts < hi.max_ts - INTERVAL 24 HOUR
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_older_than_day
    FROM events e CROSS JOIN hi
    GROUP BY hi.max_ts
    """,
)
def dq_freshness_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-freshness audit: the table's high-watermark timestamp,
    how many events landed in the trailing hour, and how much of the
    table is older than a day. One max() aggregate broadcast back over
    one scan — the standard freshness SLO probe."""
    ev = tables(spark, sf_dir).events
    hi = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(hi))
        .groupBy("max_ts")
        .agg(
            F.sum(
                (F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 1 HOURS")).cast(
                    "long"
                )
            ).alias("n_last_hour"),
            F.sum(
                (F.col("ts") < F.col("max_ts") - F.expr("INTERVAL 24 HOURS")).cast(
                    "long"
                )
            ).alias("n_older_than_day"),
        )
        .select(
            F.col("max_ts").cast("string").alias("max_ts_repr"),
            "n_last_hour",
            "n_older_than_day",
        )
    )


# --------------------------------------------------------------------------
# Distribution drift (PSI) and Benford first-digit audit — round-3 additions
# --------------------------------------------------------------------------

_PSI_SPLIT = "1998-04-01"  # midpoint of the orders date domain
_PSI_WIDTH = 50000.0
_PSI_BUCKETS = 10


@query(
    "dq_distribution_drift_psi",
    oracle=f"""
    WITH counts AS (
        SELECT least(CAST(floor(o_totalprice / {_PSI_WIDTH}) AS BIGINT),
                     {_PSI_BUCKETS - 1}) AS bucket,
               count(*) FILTER (WHERE o_orderdate < DATE '{_PSI_SPLIT}')
                   AS n_ref_raw,
               count(*) FILTER (WHERE o_orderdate >= DATE '{_PSI_SPLIT}')
                   AS n_cur_raw
        FROM orders
        GROUP BY 1
    ),
    spine AS (SELECT unnest(generate_series(0, {_PSI_BUCKETS - 1})) AS bucket),
    filled AS (
        SELECT s.bucket,
               CAST(coalesce(n_ref_raw, 0) AS BIGINT) AS n_ref,
               CAST(coalesce(n_cur_raw, 0) AS BIGINT) AS n_cur
        FROM spine s LEFT JOIN counts c ON s.bucket = c.bucket
    ),
    tot AS (
        SELECT *,
               CAST(sum(n_ref) OVER () AS DOUBLE) AS t_ref,
               CAST(sum(n_cur) OVER () AS DOUBLE) AS t_cur
        FROM filled
    )
    SELECT bucket, n_ref, n_cur,
           round((n_ref + 1.0) / (t_ref + {_PSI_BUCKETS}), 6) AS p_ref,
           round((n_cur + 1.0) / (t_cur + {_PSI_BUCKETS}), 6) AS p_cur,
           round(((n_cur + 1.0) / (t_cur + {_PSI_BUCKETS})
                  - (n_ref + 1.0) / (t_ref + {_PSI_BUCKETS}))
                 * ln(((n_cur + 1.0) / (t_cur + {_PSI_BUCKETS}))
                      / ((n_ref + 1.0) / (t_ref + {_PSI_BUCKETS}))), 6)
               AS psi_term
    FROM tot
    """,
)
def dq_distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution,
    reference half (orderdate < 1998-04-01) vs current half — the
    standard production drift gate for a feature/metric column.
    Laplace-smoothed (+1 per bucket) so empty buckets stay finite;
    sum(psi_term) > 0.2 is the conventional alarm.

    Scale shape: ONE fact scan with conditional map-side counts into a
    fixed 10-bucket spine (broadcast range join on a 10-row dim), then
    window totals over the 10-row aggregate. At 100 TB the only
    exchange is 10 counter rows; drift checks rescan nothing.
    """
    t = tables(spark, sf_dir)
    split = F.lit(_PSI_SPLIT).cast("date")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / _PSI_WIDTH).cast("long"),
        F.lit(_PSI_BUCKETS - 1),
    )
    counts = (
        t.orders.select(
            bucket.alias("bucket"),
            (F.col("o_orderdate").cast("date") < split).cast("long").alias("is_ref"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").alias("n_ref_raw"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("n_cur_raw"),
        )
    )
    spine = spark.range(_PSI_BUCKETS).withColumnRenamed("id", "bucket")
    filled = (
        F.broadcast(spine)
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_ref_raw", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur_raw", F.lit(0)).alias("n_cur"),
        )
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t_ref = F.sum("n_ref").over(w).cast("double")
    t_cur = F.sum("n_cur").over(w).cast("double")
    p_ref = (F.col("n_ref") + 1.0) / (t_ref + _PSI_BUCKETS)
    p_cur = (F.col("n_cur") + 1.0) / (t_cur + _PSI_BUCKETS)
    return filled.select(
        "bucket",
        "n_ref",
        "n_cur",
        rnd(p_ref, 6).alias("p_ref"),
        rnd(p_cur, 6).alias("p_cur"),
        rnd((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
    )


# Benford expected first-digit shares log10(1 + 1/d), injected as the
# SAME Python double literals on both engines (no cross-engine log10).
_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}

_BENFORD_SPINE_SQL = ", ".join(
    f"({d}, {v!r})" for d, v in _BENFORD.items()
)


@query(
    "dq_benford_first_digit",
    oracle=f"""
    WITH obs AS (
        SELECT CAST(substring(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                        AS BIGINT)
                                   AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               count(*) AS n_orders
        FROM orders
        WHERE floor(o_totalprice * 100 + 0.5) >= 1
        GROUP BY 1
    ),
    spine(digit, exp_share) AS (VALUES {_BENFORD_SPINE_SQL}),
    tot AS (
        SELECT s.digit, s.exp_share,
               CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(sum(coalesce(o.n_orders, 0)) OVER () AS DOUBLE) AS total
        FROM spine s LEFT JOIN obs o ON s.digit = o.digit
    )
    SELECT digit, n_orders,
           round(CASE WHEN total > 0 THEN n_orders / total
                      ELSE 0.0 END, 6) AS obs_share,
           round(exp_share, 6) AS exp_share,
           round(CASE WHEN total > 0
                      THEN pow(n_orders - total * exp_share, 2)
                           / (total * exp_share)
                      ELSE 0.0 END, 4) AS chi2_term
    FROM tot
    """,
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order values: observed first-significant-
    digit shares vs log10(1+1/d), with per-digit Pearson chi-square
    contributions — the classic fabricated-data / unit-mixup detector
    for monetary columns. The digit comes from integer-to-string
    formatting of the CENTS value (exact, engine-identical — never
    float log10): leading significant digit is invariant under the
    x100 decimal shift, so sub-unit amounts like 0.53 audit as digit 5
    instead of falling out of the spine. Contract: values are read at
    cents resolution (rounded half-up); amounts below half a cent are
    excluded.

    Scale shape: one scan, 9-way map-side count, broadcast join to a
    9-row constant spine, window totals over 9 rows. Single exchange of
    9 counter rows at any data size.
    """
    t = tables(spark, sf_dir)
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5)
    digit = F.substring(cents.cast("long").cast("string"), 1, 1).cast("long")
    obs = (
        t.orders.filter(cents >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders_raw"))
    )
    spine = spark.createDataFrame(
        [(d, v) for d, v in _BENFORD.items()], "digit long, exp_share double"
    )
    w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    joined = (
        F.broadcast(spine)
        .join(obs, "digit", "left")
        .select(
            "digit",
            "exp_share",
            F.coalesce("n_orders_raw", F.lit(0)).alias("n_orders"),
        )
        .withColumn("total", F.sum("n_orders").over(w).cast("double"))
    )
    # total > 0 guard (both sides): the constant spine emits 9 rows even
    # on an EMPTY orders table, where ANSI mode turns n/total into a
    # divide-by-zero error instead of a 0-share row
    nonzero = F.col("total") > 0
    return joined.select(
        "digit",
        "n_orders",
        rnd(
            F.when(nonzero, F.col("n_orders") / F.col("total")).otherwise(0.0), 6
        ).alias("obs_share"),
        rnd(F.col("exp_share"), 6).alias("exp_share"),
        rnd(
            F.when(
                nonzero,
                F.pow(F.col("n_orders") - F.col("total") * F.col("exp_share"), 2)
                / (F.col("total") * F.col("exp_share")),
            ).otherwise(0.0),
            4,
        ).alias("chi2_term"),
    )


_KS_WIDTH = 500.0
_KS_BINS = 1000


@query(
    "dq_ks_test_two_sample",
    oracle=f"""
    WITH binned AS (
        SELECT least(CAST(floor(o_totalprice / {_KS_WIDTH}) AS BIGINT),
                     {_KS_BINS - 1}) AS bin,
               count(*) FILTER (WHERE o_orderdate < DATE '{_PSI_SPLIT}')
                   AS r,
               count(*) FILTER (WHERE o_orderdate >= DATE '{_PSI_SPLIT}')
                   AS c
        FROM orders
        GROUP BY 1
    ),
    cum AS (
        SELECT bin,
               CAST(sum(r) OVER (ORDER BY bin) AS DOUBLE) AS cr,
               CAST(sum(c) OVER (ORDER BY bin) AS DOUBLE) AS cc,
               CAST(sum(r) OVER () AS DOUBLE) AS tr,
               CAST(sum(c) OVER () AS DOUBLE) AS tc
        FROM binned
    )
    SELECT CAST(max(tr) AS BIGINT) AS n_ref,
           CAST(max(tc) AS BIGINT) AS n_cur,
           round(max(abs(cr / tr - cc / tc)), 6) AS ks_d,
           round(2 * exp(-2 * pow(max(abs(cr / tr - cc / tc)), 2)
                         * (max(tr) * max(tc) / (max(tr) + max(tc)))), 6)
               AS p_approx
    FROM cum
    """,
)
def dq_ks_test_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test on order values,
    reference vs current date half — the nonparametric sibling of
    `dq_distribution_drift_psi` (PSI needs bucket tuning; KS gives a
    p-value). D is computed on a 1000-bin quantized ECDF: the exact KS
    would order-sort every distinct value into ONE global cumulative
    window — a single-partition sort of the whole fact at 100 TB —
    while the quantized ECDF reduces the scan to <=1000 integer
    counter rows first (quantization error <= one bin of mass, far
    below any drift worth alarming on). ECDF cumsums run over the
    bounded bin spine; the asymptotic p-value 2·exp(-2·D²·n_eff) uses
    the standard large-sample formula.
    """
    t = tables(spark, sf_dir)
    split = F.lit(_PSI_SPLIT).cast("date")
    bin_ = F.least(
        F.floor(F.col("o_totalprice") / _KS_WIDTH).cast("long"),
        F.lit(_KS_BINS - 1),
    )
    binned = (
        t.orders.select(
            bin_.alias("bin"),
            (F.col("o_orderdate").cast("date") < split).cast("long").alias("is_ref"),
        )
        .groupBy("bin")
        .agg(
            F.sum("is_ref").alias("r"),
            F.sum(F.lit(1) - F.col("is_ref")).alias("c"),
        )
    )
    wcum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = binned.select(
        F.sum("r").over(wcum).cast("double").alias("cr"),
        F.sum("c").over(wcum).cast("double").alias("cc"),
        F.sum("r").over(wall).cast("double").alias("tr"),
        F.sum("c").over(wall).cast("double").alias("tc"),
    )
    d = F.max(F.abs(F.col("cr") / F.col("tr") - F.col("cc") / F.col("tc")))
    n_eff = F.max("tr") * F.max("tc") / (F.max("tr") + F.max("tc"))
    return cum.agg(
        F.max("tr").cast("long").alias("n_ref"),
        F.max("tc").cast("long").alias("n_cur"),
        rnd(d, 6).alias("ks_d"),
        rnd(2 * F.exp(-2 * F.pow(d, 2) * n_eff), 6).alias("p_approx"),
    )


@query(
    "agg_gini_by_priority",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey) AS i
        FROM orders
    )
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(2.0 * sum(i * o_totalprice)
                 / (count(*) * sum(o_totalprice))
                 - (count(*) + 1.0) / count(*), 6) AS gini
    FROM ranked
    GROUP BY o_orderpriority
    """,
)
def agg_gini_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of order value within each priority class —
    the inequality/concentration gate (is 80% of the spend in 1% of
    the orders?) used to pick sampling and partitioning strategies.
    Exact rank formula G = 2·Σ(i·x_i)/(n·Σx) - (n+1)/n over values
    sorted ascending (orderkey tiebreak makes ranks engine-identical).

    Scale shape: one shuffle partitioned by priority with an in-
    partition sort feeding row_number, then the same exchange's
    aggregation — a sort-based group agg, no global sort, no second
    scan. Skewed priorities behave like any hot group-by key."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    ranked = t.orders.select(
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("i"),
    )
    n = F.count(F.lit(1))
    return ranked.groupBy("o_orderpriority").agg(
        n.alias("n_orders"),
        rnd(
            2.0 * F.sum(F.col("i") * F.col("o_totalprice"))
            / (n * F.sum("o_totalprice"))
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# IQR outlier fences per group
# --------------------------------------------------------------------------


@query(
    "dq_outlier_iqr",
    oracle="""
    WITH fences AS (
        SELECT event_type,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(f.q1, 4) AS q1,
           round(f.q3, 4) AS q3,
           CAST(sum(CASE WHEN e.value < f.q1 - 1.5 * (f.q3 - f.q1)
                           OR e.value > f.q3 + 1.5 * (f.q3 - f.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM events e JOIN fences f ON e.event_type = f.event_type
    GROUP BY e.event_type, f.q1, f.q3
    """,
)
def dq_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier screen: per event type, exact Q1/Q3 of
    `value`, then count rows outside [Q1-1.5·IQR, Q3+1.5·IQR]. Scale
    shape: pass 1 computes the quantiles as a per-type aggregate
    (exact `percentile` here; at 100 TB swap to approx_percentile —
    the fence logic is unchanged); pass 2 re-scans with the tiny fence
    table BROADCAST, so the fact never shuffles — both passes are
    map-side against the same pruned 2-column scan."""
    ev = tables(spark, sf_dir).events
    fences = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("q1"),
        F.expr("percentile(value, 0.75)").alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("value") < F.col("q1") - 1.5 * iqr) | (
        F.col("value") > F.col("q3") + 1.5 * iqr
    )
    return (
        ev.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "q1", "q3")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(is_out.cast("int")).cast("long").alias("n_outliers"),
        )
        .select(
            "event_type",
            "n_rows",
            rnd(F.col("q1"), 4).alias("q1"),
            rnd(F.col("q3"), 4).alias("q3"),
            "n_outliers",
        )
    )


# --------------------------------------------------------------------------
# Daily ingest-volume anomaly (z-score vs trailing window)
# --------------------------------------------------------------------------


@query(
    "dq_volume_anomaly_daily",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM events GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day, n_rows,
           CAST(count(*) OVER w AS BIGINT) AS n_baseline_days,
           round(avg(n_rows) OVER w, 4) AS baseline_avg,
           round(CASE WHEN stddev_samp(n_rows) OVER w > 0
                      THEN (n_rows - avg(n_rows) OVER w)
                           / stddev_samp(n_rows) OVER w
                 END, 4) AS volume_z
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    """,
)
def dq_volume_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume monitor: each day's row count z-scored against the
    trailing 7-day baseline (excluding the day itself) — the
    data-ops alarm that catches a broken producer or a double-delivery
    BEFORE downstream metrics drift. Scale shape: the fact collapses
    to |days| rows in one mergeable aggregate; the baseline window runs
    on that tiny series (global window safe by construction). NULL
    z-score on the warm-up days / zero-variance baselines in both
    engines."""
    ev = tables(spark, sf_dir).events
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d")
    ).agg(F.count(F.lit(1)).alias("n_rows"))
    w = Window.orderBy("d").rowsBetween(-7, -1)
    mu = F.avg("n_rows").over(w)
    sd = F.stddev_samp("n_rows").over(w)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_rows",
        F.count(F.lit(1)).over(w).alias("n_baseline_days"),
        rnd(mu, 4).alias("baseline_avg"),
        rnd(
            F.when(sd > 0, (F.col("n_rows") - mu) / sd), 4
        ).alias("volume_z"),
    )


# --------------------------------------------------------------------------
# Row-level quarantine with violated-rule reasons
# --------------------------------------------------------------------------


@query(
    "dq_quarantine_rows",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice, 2) AS o_totalprice,
           array_to_string(list_filter([
               CASE WHEN o_totalprice <= 0 THEN 'nonpositive_price' END,
               CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                    THEN 'bad_status' END,
               CASE WHEN o_orderdate > TIMESTAMP '2001-12-31'
                    THEN 'future_date' END,
               CASE WHEN o_totalprice > 450000 THEN 'price_outlier' END
           ], x -> x IS NOT NULL), ',') AS violations,
           CAST(len(list_filter([
               CASE WHEN o_totalprice <= 0 THEN 'nonpositive_price' END,
               CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                    THEN 'bad_status' END,
               CASE WHEN o_orderdate > TIMESTAMP '2001-12-31'
                    THEN 'future_date' END,
               CASE WHEN o_totalprice > 450000 THEN 'price_outlier' END
           ], x -> x IS NOT NULL)) AS INT) AS n_violations
    FROM orders
    WHERE o_totalprice <= 0
       OR o_orderstatus NOT IN ('F', 'O', 'P')
       OR o_orderdate > TIMESTAMP '2001-12-31'
       OR o_totalprice > 450000
    """,
)
def dq_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level quarantine: rows failing ANY declarative rule are
    emitted with the comma-joined list of violated rule names — the
    dead-letter side of a write path where clean rows continue and
    quarantined rows land in a review table with their reasons. Scale
    shape: one map-side projection evaluating every rule once per row
    (the rule array is built from the same CASE expressions the filter
    uses, so Catalyst subexpression-eliminates them); no shuffle, and
    at 100 TB the quarantine output is the small side by design."""
    o = tables(spark, sf_dir).orders
    rules = F.array(
        F.when(F.col("o_totalprice") <= 0, "nonpositive_price"),
        F.when(
            ~F.col("o_orderstatus").isin("F", "O", "P"), "bad_status"
        ),
        F.when(
            F.col("o_orderdate") > F.lit("2001-12-31").cast("timestamp"),
            "future_date",
        ),
        F.when(F.col("o_totalprice") > 450000, "price_outlier"),
    )
    fired = F.filter(rules, lambda x: x.isNotNull())
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            rnd("o_totalprice", 2).alias("o_totalprice"),
            F.array_join(fired, ",").alias("violations"),
            F.size(fired).alias("n_violations"),
        )
        .filter(F.col("n_violations") > 0)
    )


# --------------------------------------------------------------------------
# Join-key skew profile: the histogram a shuffle planner consults
# --------------------------------------------------------------------------


@query(
    "dq_join_key_skew_profile",
    oracle="""
    WITH sizes AS (
        SELECT l_orderkey, CAST(count(*) AS BIGINT) AS group_size
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(group_size) AS BIGINT) AS n_rows,
           round(avg(group_size), 4) AS mean_size,
           CAST(quantile_disc(group_size, 0.5) AS BIGINT) AS p50_size,
           CAST(quantile_disc(group_size, 0.9) AS BIGINT) AS p90_size,
           CAST(quantile_disc(group_size, 0.99) AS BIGINT) AS p99_size,
           CAST(max(group_size) AS BIGINT) AS max_size,
           round(max(group_size) / avg(group_size), 4) AS skew_factor
    FROM sizes
    """,
)
def dq_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-cardinality profile of a join/grouping key (l_orderkey): key
    count, row count, mean/p50/p90/p99/max group size, and the skew
    factor (max/mean) — the number that decides BETWEEN the engine's
    own skew mitigations (skew_factor near 1: plain hash join;
    heavy tail: AQE skew split; a few pathological keys: salting as in
    join_skew_salted; one mega-key: isolate-and-broadcast). Profiling
    the key BEFORE the join costs one cheap aggregate over the key
    column alone (pruned scan) and prevents the 100 TB failure mode
    where one reducer receives a whole hot key. Discrete (not
    interpolated) quantiles — group sizes are integers and both
    engines' disc-quantile picks an actual observed size."""
    t = tables(spark, sf_dir)
    sizes = t.lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("group_size")
    )
    disc = lambda p: F.expr(  # noqa: E731
        f"percentile_approx(group_size, {p}, 2147483647)"
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("group_size").alias("n_rows"),
        rnd(F.avg("group_size"), 4).alias("mean_size"),
        disc(0.5).cast("long").alias("p50_size"),
        disc(0.9).cast("long").alias("p90_size"),
        disc(0.99).cast("long").alias("p99_size"),
        F.max("group_size").alias("max_size"),
        rnd(F.max("group_size") / F.avg("group_size"), 4).alias(
            "skew_factor"
        ),
    )


# --------------------------------------------------------------------------
# Surrogate-key gap audit: missing id ranges in a dense sequence
# --------------------------------------------------------------------------


@query(
    "dq_sequence_gap_audit",
    oracle="""
    WITH received AS (
        SELECT event_id FROM events
        WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1)
              IN ('0', '1', '2', '3')
    ),
    seq AS (
        SELECT event_id,
               lead(event_id) OVER (ORDER BY event_id) AS next_id
        FROM received
    ),
    gaps AS (
        SELECT event_id AS gap_after,
               CAST(event_id + 1 AS BIGINT) AS missing_from,
               CAST(next_id - 1 AS BIGINT) AS missing_to,
               CAST(next_id - event_id - 1 AS BIGINT) AS n_missing
        FROM seq
        WHERE next_id - event_id > 1
    )
    SELECT gap_after, missing_from, missing_to, n_missing
    FROM gaps
    ORDER BY n_missing DESC, missing_from
    LIMIT 100
    """,
)
def dq_sequence_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap audit over a surrogate key sequence: each output row is one
    missing RANGE. The audited stream here is a deterministic
    md5-sampled view of events (~25% of ids — this testdata's id
    domains are all dense, so the sampled view is the harness that
    gives the audit real gaps to find and compact at every SF; in
    production the input is the as-received log and a non-empty result
    IS the alarm): each row is one missing RANGE
    [missing_from, missing_to] with its size — the compact
    representation (never one row per missing id, which explodes when
    a whole partition of upstream data is lost) — bounded to the 100
    largest gaps.
    Gaps in an append-log's sequence are the cheapest tripwire for
    silent data loss between systems: a dropped Kinesis shard or a
    failed micro-batch shows up here before any business metric moves
    (the reference's at-least-once contract means gaps, not dups, are
    the alarming direction). Scale shape: lead() over a global
    id ordering — at 100 TB the id is range-partitioned (sort within
    partition + one boundary row exchanged per partition pair), the
    same two-phase trick as any global-order window; gap OUTPUT is
    bounded by the number of loss events, not data size (and capped at
    the top 100 by size here — a TakeOrdered, no global sort of gaps)."""
    ev = tables(spark, sf_dir).events
    received = ev.select("event_id").filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1).isin(
            "0", "1", "2", "3"
        )
    )
    nxt = F.lead("event_id").over(Window.orderBy("event_id"))
    seq = received.withColumn("next_id", nxt)
    gaps = seq.filter(F.col("next_id") - F.col("event_id") > 1).select(
        F.col("event_id").alias("gap_after"),
        (F.col("event_id") + 1).cast("long").alias("missing_from"),
        (F.col("next_id") - 1).cast("long").alias("missing_to"),
        (F.col("next_id") - F.col("event_id") - 1).cast("long").alias(
            "n_missing"
        ),
    )
    return gaps.orderBy(F.desc("n_missing"), F.asc("missing_from")).limit(
        100
    )


# --------------------------------------------------------------------------
# A/B experiment readout: Welch's t-test per metric segment
# --------------------------------------------------------------------------


@query(
    "events_ab_welch_ttest",
    oracle="""
    WITH tagged AS (
        SELECT event_type, value,
               CAST(user_id % 2 AS INT) AS variant
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type,
               count(*) FILTER (variant = 0) AS n_a,
               count(*) FILTER (variant = 1) AS n_b,
               avg(value) FILTER (variant = 0) AS m_a,
               avg(value) FILTER (variant = 1) AS m_b,
               var_samp(value) FILTER (variant = 0) AS v_a,
               var_samp(value) FILTER (variant = 1) AS v_b
        FROM tagged GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(m_a - m_b, 4) AS mean_diff,
           round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4) AS t_stat,
           round(pow(v_a / n_a + v_b / n_b, 2)
                 / (pow(v_a / n_a, 2) / (n_a - 1)
                    + pow(v_b / n_b, 2) / (n_b - 1)), 2) AS welch_df
    FROM g
    WHERE n_a >= 2 AND n_b >= 2
    """,
)
def events_ab_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: Welch's unequal-variance t statistic per
    event_type, variant assigned by the deterministic user_id parity
    (the stand-in for a real assignment column). Welch (not pooled
    Student) because production variants routinely have unequal
    variance AND unequal size — the pooled test's false-positive rate
    drifts exactly when traffic splits drift. Emits the
    Welch–Satterthwaite degrees of freedom alongside t so the consumer
    can threshold properly instead of pretending n is large.

    Scale shape: ONE aggregation pass — conditional count/avg/var_samp
    per variant fold map-side into six partial counters per group; no
    self-join, no second scan, output is one row per event_type. The
    guard n>=2 per arm keeps var_samp defined (and DIVIDE_BY_ZERO out,
    per the ANSI pitfall with zero-variance frames)."""
    ev = tables(spark, sf_dir).events.filter(F.col("value").isNotNull())
    variant = (F.col("user_id") % 2).cast("int")
    tagged = ev.select("event_type", "value", variant.alias("variant"))
    a = F.col("variant") == 0
    b = F.col("variant") == 1
    g = tagged.groupBy("event_type").agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(b, 1)).alias("n_b"),
        F.avg(F.when(a, F.col("value"))).alias("m_a"),
        F.avg(F.when(b, F.col("value"))).alias("m_b"),
        F.var_samp(F.when(a, F.col("value"))).alias("v_a"),
        F.var_samp(F.when(b, F.col("value"))).alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    df_num = F.pow(se2, 2)
    df_den = F.pow(F.col("v_a") / F.col("n_a"), 2) / (F.col("n_a") - 1) + F.pow(
        F.col("v_b") / F.col("n_b"), 2
    ) / (F.col("n_b") - 1)
    return g.filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2)).select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        rnd(F.col("m_a") - F.col("m_b"), 4).alias("mean_diff"),
        rnd((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 4).alias("t_stat"),
        rnd(df_num / df_den, 2).alias("welch_df"),
    )


# --------------------------------------------------------------------------
# Primary-key candidate scan: per-column uniqueness profile in one pass
# --------------------------------------------------------------------------

_KEY_SCAN_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


@query(
    "dq_key_candidate_scan",
    oracle="""
    WITH n AS (SELECT count(*) AS n_rows FROM orders)
    """
    + "\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS column_name,
           (SELECT n_rows FROM n) AS n_rows,
           count({c}) AS n_non_null,
           count(DISTINCT {c}) AS n_distinct,
           round(count(DISTINCT {c})
                 / CAST((SELECT n_rows FROM n) AS DOUBLE), 6)
               AS distinct_ratio,
           count(DISTINCT {c}) = (SELECT n_rows FROM n)
               AND count({c}) = (SELECT n_rows FROM n) AS is_key_candidate
    FROM orders
    """
        for c in _KEY_SCAN_COLS
    ),
)
def dq_key_candidate_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Primary-key candidate scan: exact distinct count, non-null count
    and uniqueness ratio for every column of orders, flagging columns
    that could serve as a key (all-distinct AND no nulls). The ingest
    gate that catches a fanned-out join or a truncated id column before
    downstream MERGEs silently multiply rows.

    Scale shape: Spark computes ALL columns in ONE aggregation pass —
    count_distinct per column folds map-side (no per-column rescan, no
    melt-then-shuffle of the full table; the melted form would shuffle
    n_rows x n_cols rows, this shuffles one partial-state row per
    partition). The single wide row is then unpivoted driver-free via
    an in-plan union of 6 one-row projections. At 100 TB swap
    count_distinct for approx_count_distinct per the profiling twins
    (profile_columns / profile_columns_approx)."""
    o = tables(spark, sf_dir).orders
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _KEY_SCAN_COLS:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
    wide = o.agg(*aggs)
    parts = []
    for c in _KEY_SCAN_COLS:
        nd, nn = F.col(f"nd_{c}"), F.col(f"nn_{c}")
        parts.append(
            wide.select(
                F.lit(c).alias("column_name"),
                F.col("n_rows").cast("long").alias("n_rows"),
                nn.cast("long").alias("n_non_null"),
                nd.cast("long").alias("n_distinct"),
                rnd(nd / F.col("n_rows").cast("double"), 6).alias(
                    "distinct_ratio"
                ),
                ((nd == F.col("n_rows")) & (nn == F.col("n_rows"))).alias(
                    "is_key_candidate"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Ratio-metric CI via the delta method over per-user aggregates
# --------------------------------------------------------------------------


@query(
    "events_ratio_metric_delta_ci",
    oracle="""
    WITH per_user AS (
        SELECT event_type, user_id,
               sum(value) AS x, CAST(count(*) AS DOUBLE) AS y
        FROM events WHERE value IS NOT NULL
        GROUP BY event_type, user_id
    ),
    g AS (
        SELECT event_type,
               count(*) AS n_users,
               sum(x) / sum(y) AS ratio,
               avg(y) AS my,
               var_samp(x) AS vx, var_samp(y) AS vy,
               covar_samp(x, y) AS cxy
        FROM per_user GROUP BY event_type
    )
    SELECT event_type, CAST(n_users AS BIGINT) AS n_users,
           round(ratio, 6) AS ratio,
           round(sqrt((vx + ratio * ratio * vy - 2 * ratio * cxy)
                      / n_users) / my, 6) AS se,
           round(ratio - 1.96 * sqrt((vx + ratio * ratio * vy
                      - 2 * ratio * cxy) / n_users) / my, 6) AS ci_lo,
           round(ratio + 1.96 * sqrt((vx + ratio * ratio * vy
                      - 2 * ratio * cxy) / n_users) / my, 6) AS ci_hi
    FROM g WHERE n_users >= 2
    """,
)
def events_ratio_metric_delta_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-metric confidence interval by the delta method, clustered
    at the user: the per-event mean value (sum value / n events) is a
    RATIO of two user-level sums, and users — not events — are the
    independent unit, so the naive per-event SE is wrong whenever one
    user contributes many events. This is the standard experimentation-
    platform correction (linearization of X/Y around the means):
    Var(R) ~ (var_x + R^2 var_y - 2 R cov_xy) / (n * mean_y^2).

    Scale shape: two chained aggregations — events fold to one (x, y)
    row per (event_type, user) map-side, then five moment partials per
    event_type; nothing is collected, output is one row per event_type.
    The covariance term is exactly why this can't be two independent
    Welch arms: x and y are correlated within a user."""
    ev = tables(spark, sf_dir).events.filter(F.col("value").isNotNull())
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.sum("value").alias("x"),
        F.count(F.lit(1)).cast("double").alias("y"),
    )
    g = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        (F.sum("x") / F.sum("y")).alias("ratio"),
        F.avg("y").alias("my"),
        F.var_samp("x").alias("vx"),
        F.var_samp("y").alias("vy"),
        F.covar_samp("x", "y").alias("cxy"),
    )
    r = F.col("ratio")
    se = (
        F.sqrt(
            (F.col("vx") + r * r * F.col("vy") - 2 * r * F.col("cxy"))
            / F.col("n_users")
        )
        / F.col("my")
    )
    return g.filter(F.col("n_users") >= 2).select(
        "event_type",
        F.col("n_users").cast("long").alias("n_users"),
        rnd(r, 6).alias("ratio"),
        rnd(se, 6).alias("se"),
        rnd(r - 1.96 * se, 6).alias("ci_lo"),
        rnd(r + 1.96 * se, 6).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# Functional-dependency check: does column A determine column B?
# --------------------------------------------------------------------------

_FD_CANDIDATES = (
    ("lineitem", "l_orderkey", "l_suppkey"),
    ("lineitem", "l_partkey", "l_extendedprice"),
    ("orders", "o_orderkey", "o_custkey"),
    ("orders", "o_custkey", "o_orderpriority"),
)


@query(
    "dq_functional_dependency_check",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{tbl}' AS table_name, '{det}' AS determinant,
           '{dep}' AS dependent,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (nd > 1) AS BIGINT) AS n_violating,
           CAST(max(nd) AS BIGINT) AS max_distinct_dep,
           count(*) FILTER (nd > 1) = 0 AS fd_holds
    FROM (
        SELECT {det}, count(DISTINCT {dep}) AS nd
        FROM {tbl} GROUP BY {det}
    )
    """
        for tbl, det, dep in _FD_CANDIDATES
    ),
)
def dq_functional_dependency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling: for each candidate pair
    (determinant -> dependent), count determinant groups whose
    dependent is NOT single-valued. FD violations are how schema drift
    actually presents — a column everyone assumed was per-key constant
    (status per order, priority per customer) quietly forks, and every
    downstream `max(dep) GROUP BY det` silently picks sides. The scan
    both confirms true keys (o_orderkey -> o_custkey holds) and
    quantifies how badly folk-FDs fail (max_distinct_dep is the fork
    width).

    Scale shape: one column-pruned aggregation per candidate pair
    (count_distinct folds map-side), unioned at four summary rows; no
    pair rescans more than its two columns. Candidate pairs are config,
    not discovery — mining all O(cols^2) pairs is a different (sampled)
    operator."""
    t = tables(spark, sf_dir)
    parts = []
    for tbl, det, dep in _FD_CANDIDATES:
        nd = (
            getattr(t, tbl)
            .groupBy(det)
            .agg(F.countDistinct(dep).alias("nd"))
        )
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        parts.append(
            nd.agg(
                F.lit(tbl).alias("table_name"),
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                F.count(F.lit(1)).cast("long").alias("n_groups"),
                viol.cast("long").alias("n_violating"),
                F.max("nd").cast("long").alias("max_distinct_dep"),
                (viol == 0).alias("fd_holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Cross-table money reconciliation: order header vs line-level recompute
# --------------------------------------------------------------------------


@query(
    "dq_order_total_reconciliation",
    oracle="""
    WITH per_order AS (
        SELECT o.o_orderkey, o.o_orderstatus,
               round(o.o_totalprice, 2) AS header_total,
               round(sum(l.l_extendedprice * (1 - l.l_discount)
                         * (1 + l.l_tax)), 2) AS line_total
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderstatus, o.o_totalprice
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (abs(header_total - line_total) > 0.01)
               AS BIGINT) AS n_mismatched,
           round(avg(abs(header_total - line_total)), 2)
               AS avg_abs_delta,
           round(max(abs(header_total - line_total)), 2)
               AS max_abs_delta,
           round(count(*) FILTER (abs(header_total - line_total) <= 0.01)
                 / CAST(count(*) AS DOUBLE), 6) AS pass_rate
    FROM per_order GROUP BY o_orderstatus
    """,
)
def dq_order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail money reconciliation: each order's stored
    o_totalprice against the line-level recompute
    sum(extprice·(1-disc)·(1+tax)), summarized per order status. The
    single most common warehouse integrity gate — a header total that
    drifts from its details means a partial load, a double-applied
    discount, or an out-of-order CDC merge; the per-status split
    localizes WHICH lifecycle stage corrupts. On this synthetic
    testdata the headers are independent of the lines, so the gate
    (correctly) reports ~0 pass rate — the operator's value is that it
    measures rather than assumes. Both sides are cents-rounded before
    the comparison so the tolerance is exact.

    Scale shape: one join on the natural key followed by map-side
    foldable per-order sums, then a per-status summary — the join is
    the same co-partitioned orderkey join every TPC-H query pays, and
    at 100 TB both tables bucket on orderkey to make it shuffle-free."""
    t = tables(spark, sf_dir)
    per_order = (
        t.lineitem.join(
            t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey
        )
        .groupBy("o_orderkey", "o_orderstatus", "o_totalprice")
        .agg(
            rnd(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("line_total")
        )
        .select(
            "o_orderstatus",
            rnd("o_totalprice", 2).alias("header_total"),
            "line_total",
        )
    )
    delta = F.abs(F.col("header_total") - F.col("line_total"))
    return per_order.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.count(F.when(delta > 0.01, 1)).cast("long").alias("n_mismatched"),
        rnd(F.avg(delta), 2).alias("avg_abs_delta"),
        rnd(F.max(delta), 2).alias("max_abs_delta"),
        rnd(
            F.count(F.when(delta <= 0.01, 1))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("pass_rate"),
    )


# --------------------------------------------------------------------------
# Sample-ratio-mismatch gate for the A/B assignment
# --------------------------------------------------------------------------


@query(
    "events_ab_srm_check",
    oracle="""
    WITH units AS (
        SELECT DISTINCT event_type, user_id,
               CAST(user_id % 2 AS INT) AS variant
        FROM events
    ),
    g AS (
        SELECT event_type,
               CAST(count(*) FILTER (variant = 0) AS DOUBLE) AS n_a,
               CAST(count(*) FILTER (variant = 1) AS DOUBLE) AS n_b
        FROM units GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_users_a,
           CAST(n_b AS BIGINT) AS n_users_b,
           round(pow(n_a - n_b, 2) / (n_a + n_b), 4) AS chi2,
           pow(n_a - n_b, 2) / (n_a + n_b) > 3.841 AS srm_suspected
    FROM g WHERE n_a + n_b > 0
    """,
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch gate — the FIRST check any experiment
    readout must pass, before the Welch/delta-method stats mean
    anything: under a 50/50 assignment the exposed-UNIT counts per arm
    follow chi-square with 1 dof, and chi2 = (n_a - n_b)²/(n_a + n_b)
    above 3.841 (p < 0.05) means the assignment itself is broken
    (bot filtering one arm, redirect loss, logging drop) and every
    downstream metric is untrustworthy. Units are distinct users per
    event_type, not events — event-count SRM false-alarms on any
    heavy-user imbalance.

    Scale shape: one distinct aggregate at (type, user) cardinality,
    then two conditional counts per group; folds map-side like every
    gate in this module."""
    ev = tables(spark, sf_dir).events
    units = ev.select(
        "event_type", "user_id", (F.col("user_id") % 2).cast("int").alias("variant")
    ).distinct()
    g = units.groupBy("event_type").agg(
        F.count(F.when(F.col("variant") == 0, 1))
        .cast("double")
        .alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1))
        .cast("double")
        .alias("n_b"),
    )
    chi2 = F.pow(F.col("n_a") - F.col("n_b"), 2) / (
        F.col("n_a") + F.col("n_b")
    )
    return g.filter(F.col("n_a") + F.col("n_b") > 0).select(
        "event_type",
        F.col("n_a").cast("long").alias("n_users_a"),
        F.col("n_b").cast("long").alias("n_users_b"),
        rnd(chi2, 4).alias("chi2"),
        (chi2 > 3.841).alias("srm_suspected"),
    )


# --------------------------------------------------------------------------
# CUPED variance-reduced A/B readout (pre-period covariate adjustment)
# --------------------------------------------------------------------------


@query(
    "events_ab_cuped",
    oracle="""
    WITH ev AS (
        SELECT event_type, user_id,
               CAST(user_id % 2 AS INT) AS variant,
               CASE WHEN ts < TIMESTAMP '2024-01-16'
                    THEN value ELSE 0 END AS px,
               CASE WHEN ts >= TIMESTAMP '2024-01-16'
                    THEN value ELSE 0 END AS py
        FROM events WHERE value IS NOT NULL
    ),
    u AS (
        SELECT event_type, user_id, max(variant) AS variant,
               sum(px) AS x, sum(py) AS y
        FROM ev GROUP BY event_type, user_id
    ),
    s AS (
        SELECT event_type, covar_samp(x, y) AS cn, var_samp(x) AS cd,
               avg(x) AS mx
        FROM u GROUP BY event_type
    ),
    j AS (
        SELECT u.event_type, u.variant, u.y,
               s.cn / s.cd AS theta,
               u.y - (s.cn / s.cd) * (u.x - s.mx) AS y_adj
        FROM u JOIN s ON s.event_type = u.event_type
        WHERE s.cd > 0
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           round(max(theta), 4) AS theta,
           round(avg(CASE WHEN variant = 0 THEN y END)
                 - avg(CASE WHEN variant = 1 THEN y END), 4) AS lift_raw,
           round(avg(CASE WHEN variant = 0 THEN y_adj END)
                 - avg(CASE WHEN variant = 1 THEN y_adj END), 4)
               AS lift_cuped,
           round(1 - var_samp(y_adj) / var_samp(y), 4) AS var_reduction
    FROM j
    GROUP BY event_type
    HAVING var_samp(y) > 0
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (Controlled-experiment Using Pre-Experiment Data) readout:
    the experiment metric is each user's second-fortnight value total,
    the covariate is the same user's FIRST-fortnight total, and the
    adjusted metric y - theta*(x - mean(x)) with theta =
    cov(x,y)/var(x) removes the between-user variance the pre-period
    already explains. This is the industry-standard variance-reduction
    trick (Deng et al., WSDM'13): same expectation (assignment is
    independent of pre-period behaviour), strictly smaller variance,
    so the same traffic detects smaller lifts. Emits the raw and
    adjusted lift side by side plus the realized variance-reduction
    ratio 1 - var(y_adj)/var(y) — the honesty column that shows what
    the covariate actually bought (theta^2 * corr-structure, ~0 when
    pre and post are uncorrelated).

    Scale shape: one user-level aggregation (the big shuffle, keyed by
    (event_type, user)), then a per-event_type stats fold whose output
    is dimension-sized and broadcast back — no row-level self-join, no
    second scan of events. The theta denominator guard (var(x) > 0)
    drops degenerate strata instead of emitting NaN. Variant is the
    deterministic user_id parity stand-in for the assignment column,
    matching events_ab_welch_ttest / events_ab_srm_check."""
    ev = tables(spark, sf_dir).events.filter(F.col("value").isNotNull())
    cutoff = F.lit("2024-01-16").cast("timestamp")
    u = (
        ev.select(
            "event_type",
            "user_id",
            (F.col("user_id") % 2).cast("int").alias("variant"),
            F.when(F.col("ts") < cutoff, F.col("value"))
            .otherwise(F.lit(0.0))
            .alias("px"),
            F.when(F.col("ts") >= cutoff, F.col("value"))
            .otherwise(F.lit(0.0))
            .alias("py"),
        )
        .groupBy("event_type", "user_id")
        .agg(
            F.max("variant").alias("variant"),
            F.sum("px").alias("x"),
            F.sum("py").alias("y"),
        )
    )
    s = u.groupBy("event_type").agg(
        F.covar_samp("x", "y").alias("cn"),
        F.var_samp("x").alias("cd"),
        F.avg("x").alias("mx"),
    )
    theta = F.col("cn") / F.col("cd")
    j = (
        u.join(F.broadcast(s), "event_type")
        .filter(F.col("cd") > 0)
        .select(
            "event_type",
            "variant",
            "y",
            theta.alias("theta"),
            (F.col("y") - theta * (F.col("x") - F.col("mx"))).alias("y_adj"),
        )
    )
    a = F.col("variant") == 0
    b = F.col("variant") == 1
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.max("theta").alias("theta_raw"),
            (
                F.avg(F.when(a, F.col("y"))) - F.avg(F.when(b, F.col("y")))
            ).alias("lr"),
            (
                F.avg(F.when(a, F.col("y_adj")))
                - F.avg(F.when(b, F.col("y_adj")))
            ).alias("lc"),
            (1 - F.var_samp("y_adj") / F.var_samp("y")).alias("vr"),
            F.var_samp("y").alias("vy"),
        )
        .filter(F.col("vy") > 0)
        .select(
            "event_type",
            "n_users",
            rnd("theta_raw", 4).alias("theta"),
            rnd("lr", 4).alias("lift_raw"),
            rnd("lc", 4).alias("lift_cuped"),
            rnd("vr", 4).alias("var_reduction"),
        )
    )


# --------------------------------------------------------------------------
# Earth-mover drift: Wasserstein-1 between two periods' value histograms
# --------------------------------------------------------------------------

_EMD_BINS = 10
_EMD_CUTOFF = "TIMESTAMP '2024-01-16'"


@query(
    "dq_value_drift_emd",
    oracle=f"""
    WITH v AS (
        SELECT value,
               CASE WHEN ts < {_EMD_CUTOFF} THEN 0 ELSE 1 END AS period
        FROM events WHERE value IS NOT NULL
    ),
    rng AS (
        SELECT min(value) AS mn, max(value) AS mx FROM v
    ),
    binned AS (
        SELECT period,
               least({_EMD_BINS} - 1,
                     CAST(floor((value - rng.mn) / (rng.mx - rng.mn)
                                * {_EMD_BINS}) AS INT)) AS bin
        FROM v CROSS JOIN rng WHERE rng.mx > rng.mn
    ),
    counts AS (
        SELECT b.bin,
               count(*) FILTER (period = 0) AS na,
               count(*) FILTER (period = 1) AS nb
        FROM binned b GROUP BY b.bin
    ),
    grid AS (
        SELECT g.bin, coalesce(c.na, 0) AS na, coalesce(c.nb, 0) AS nb
        FROM (SELECT unnest(generate_series(0, {_EMD_BINS} - 1)) AS bin) g
        LEFT JOIN counts c ON c.bin = g.bin
    ),
    tot AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM grid),
    cum AS (
        SELECT grid.bin,
               sum(grid.na * 1.0 / tot.ta)
                   OVER (ORDER BY grid.bin) AS ca,
               sum(grid.nb * 1.0 / tot.tb)
                   OVER (ORDER BY grid.bin) AS cb
        FROM grid CROSS JOIN tot
    )
    SELECT CAST(max(tot.ta) AS BIGINT) AS n_before,
           CAST(max(tot.tb) AS BIGINT) AS n_after,
           round(sum(abs(cum.ca - cum.cb))
                 * (max(rng.mx) - max(rng.mn)) / {_EMD_BINS}.0, 6)
               AS emd,
           round(max(abs(cum.ca - cum.cb)), 6) AS max_cdf_gap
    FROM cum CROSS JOIN tot CROSS JOIN rng
    """,
)
def dq_value_drift_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth-mover (Wasserstein-1) drift between the first fortnight's
    and the second fortnight's event-value distributions, computed on a
    fixed 10-bin equal-width grid: EMD = Σ|CDF_a - CDF_b| * bin_width.
    The drift metric that PSI (dq_distribution_drift_psi) and KS
    (dq_ks_test_two_sample) both miss: PSI ignores WHERE mass moved
    (swapping adjacent bins scores the same as moving mass end to end)
    and KS only sees the single worst gap — EMD integrates distance
    moved, which is what a downstream regression actually feels. The
    max-CDF-gap column doubles as the binned KS statistic for free.

    Scale shape: one global min/max fold broadcast back, one (period,
    bin) hash aggregate, then all cumsum/EMD arithmetic runs on the
    fixed 10-row grid — fact cardinality touches exactly two scalar
    aggregation passes, nothing else. The bin grid is generated, not
    derived, so empty bins can't silently drop out of the CDF."""
    ev = tables(spark, sf_dir).events.filter(F.col("value").isNotNull())
    cutoff = F.lit("2024-01-16").cast("timestamp")
    v = ev.select(
        "value",
        F.when(F.col("ts") < cutoff, 0).otherwise(1).alias("period"),
    )
    rng = v.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = (
        v.crossJoin(F.broadcast(rng))
        .filter(F.col("mx") > F.col("mn"))
        .select(
            "period",
            F.least(
                F.lit(_EMD_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * _EMD_BINS
                ).cast("int"),
            ).alias("bin"),
        )
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.when(F.col("period") == 0, 1)).alias("na"),
        F.count(F.when(F.col("period") == 1, 1)).alias("nb"),
    )
    grid = (
        rng.select(
            F.explode(F.sequence(F.lit(0), F.lit(_EMD_BINS - 1))).alias(
                "bin"
            )
        )
        .join(counts, "bin", "left")
        .select(
            "bin",
            F.coalesce("na", F.lit(0)).alias("na"),
            F.coalesce("nb", F.lit(0)).alias("nb"),
        )
    )
    tot = grid.agg(F.sum("na").alias("ta"), F.sum("nb").alias("tb"))
    wcum = Window.orderBy("bin")
    cum = grid.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.sum(F.col("na") / F.col("ta")).over(wcum).alias("ca"),
        F.sum(F.col("nb") / F.col("tb")).over(wcum).alias("cb"),
        "ta",
        "tb",
    )
    return cum.crossJoin(F.broadcast(rng)).agg(
        F.max("ta").cast("long").alias("n_before"),
        F.max("tb").cast("long").alias("n_after"),
        rnd(
            F.sum(F.abs(F.col("ca") - F.col("cb")))
            * (F.max("mx") - F.max("mn"))
            / float(_EMD_BINS),
            6,
        ).alias("emd"),
        rnd(F.max(F.abs(F.col("ca") - F.col("cb"))), 6).alias(
            "max_cdf_gap"
        ),
    )


# --------------------------------------------------------------------------
# Experiment planning: minimum detectable effect at standard power
# --------------------------------------------------------------------------

_MDE_Z = 1.959964 + 0.841621  # z_{0.975} + z_{0.80}: 5% two-sided, 80% power


@query(
    "events_ab_power_mde",
    oracle=f"""
    WITH tagged AS (
        SELECT event_type, value, CAST(user_id % 2 AS INT) AS variant
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type,
               count(*) FILTER (variant = 0) AS n_a,
               count(*) FILTER (variant = 1) AS n_b,
               var_samp(value) AS pooled_var,
               avg(value) AS mean_all
        FROM tagged GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           round(sqrt(pooled_var), 4) AS sd,
           round({_MDE_Z} * sqrt(pooled_var / n_a + pooled_var / n_b), 4)
               AS mde_abs,
           round({_MDE_Z} * sqrt(pooled_var / n_a + pooled_var / n_b)
                 / mean_all, 4) AS mde_rel
    FROM g
    WHERE n_a >= 2 AND n_b >= 2 AND mean_all <> 0
    """,
)
def events_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment PLANNING readout: the minimum detectable effect at
    the industry-standard 80% power / 5% two-sided alpha, given each
    metric's realized variance and the current traffic split — MDE =
    (z_0.975 + z_0.80) * sqrt(sigma^2/n_a + sigma^2/n_b), absolute and
    relative to the metric mean. This is the question asked BEFORE
    events_ab_welch_ttest is ever run ("can this experiment even see a
    2% lift?"), and the fourth leg of the experimentation suite
    (Welch readout, SRM gate, CUPED variance reduction, power
    planning); reading it next to events_ab_cuped's var_reduction
    shows exactly how much smaller an MDE CUPED buys (factor
    sqrt(1 - var_reduction)).

    Scale shape: ONE aggregation pass over events — conditional counts
    plus a pooled variance, six partial counters per event_type, no
    joins, output one row per metric."""
    ev = tables(spark, sf_dir).events.filter(F.col("value").isNotNull())
    tagged = ev.select(
        "event_type",
        "value",
        (F.col("user_id") % 2).cast("int").alias("variant"),
    )
    g = tagged.groupBy("event_type").agg(
        F.count(F.when(F.col("variant") == 0, 1)).alias("n_a"),
        F.count(F.when(F.col("variant") == 1, 1)).alias("n_b"),
        F.var_samp("value").alias("pooled_var"),
        F.avg("value").alias("mean_all"),
    )
    mde = _MDE_Z * F.sqrt(
        F.col("pooled_var") / F.col("n_a")
        + F.col("pooled_var") / F.col("n_b")
    )
    return g.filter(
        (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (F.col("mean_all") != 0)
    ).select(
        "event_type",
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        rnd(F.sqrt("pooled_var"), 4).alias("sd"),
        rnd(mde, 4).alias("mde_abs"),
        rnd(mde / F.col("mean_all"), 4).alias("mde_rel"),
    )


# --------------------------------------------------------------------------
# Naive Bayes feature likelihoods (purchase-propensity model params)
# --------------------------------------------------------------------------


@query(
    "events_nb_feature_loglik",
    oracle="""
    WITH flags AS (
        SELECT user_id,
               bool_or(event_type = 'purchase') AS is_pos,
               bool_or(event_type = 'click') AS f_click,
               bool_or(event_type = 'view') AS f_view,
               bool_or(event_type = 'signup') AS f_signup,
               bool_or(event_type = 'error') AS f_error
        FROM events GROUP BY user_id
    ),
    counts AS (
        SELECT count(*) FILTER (is_pos) AS n_pos,
               count(*) FILTER (NOT is_pos) AS n_neg
        FROM flags
    ),
    feat AS (
        SELECT 'click' AS feature,
               count(*) FILTER (f_click AND is_pos) AS n_pos_with,
               count(*) FILTER (f_click AND NOT is_pos) AS n_neg_with
        FROM flags
        UNION ALL
        SELECT 'view', count(*) FILTER (f_view AND is_pos),
               count(*) FILTER (f_view AND NOT is_pos) FROM flags
        UNION ALL
        SELECT 'signup', count(*) FILTER (f_signup AND is_pos),
               count(*) FILTER (f_signup AND NOT is_pos) FROM flags
        UNION ALL
        SELECT 'error', count(*) FILTER (f_error AND is_pos),
               count(*) FILTER (f_error AND NOT is_pos) FROM flags
    )
    SELECT f.feature,
           CAST(f.n_pos_with AS BIGINT) AS n_pos_with,
           CAST(f.n_neg_with AS BIGINT) AS n_neg_with,
           round((f.n_pos_with + 1.0) / (c.n_pos + 2.0), 6) AS p_given_pos,
           round((f.n_neg_with + 1.0) / (c.n_neg + 2.0), 6) AS p_given_neg,
           round(ln(((f.n_pos_with + 1.0) / (c.n_pos + 2.0))
                    / ((f.n_neg_with + 1.0) / (c.n_neg + 2.0))), 6)
               AS loglik_ratio
    FROM feat f, counts c
    """,
)
def events_nb_feature_loglik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli Naive Bayes feature likelihoods for purchase
    propensity: label = user ever purchased, features = presence of
    each other event type, parameters = Laplace-smoothed (+1/+2)
    conditional presence rates and their log-likelihood ratio — the
    classical supervised learner fitted ENTIRELY with two hash
    aggregates (no gradient loop, no driver state), the way NB is
    actually trained on cluster-scale clickstreams. Complements
    [[embed_knn_classify]] (instance-based) with the parametric
    family; the llr column IS the model — a scorer sums it over a
    user's feature set ([[events_ab_welch_ttest]] and friends judge
    the resulting uplift). Smoothing makes every probability strictly
    inside (0,1), so the log is total and hash-stable.

    Scale shape: one user-grain bool_or fold (map-side partial), one
    one-row class count broadcast, and a 4-row feature reshape —
    events are touched exactly once regardless of feature count; new
    features add columns to the SAME fold, not new scans."""
    t = tables(spark, sf_dir)
    flags = t.events.groupBy("user_id").agg(
        F.bool_or(F.col("event_type") == "purchase").alias("is_pos"),
        *[
            F.bool_or(F.col("event_type") == ft).alias(f"f_{ft}")
            for ft in ("click", "view", "signup", "error")
        ],
    )
    counts = flags.agg(
        F.sum(F.col("is_pos").cast("long")).alias("n_pos"),
        F.sum((~F.col("is_pos")).cast("long")).alias("n_neg"),
    )
    feats = None
    for ft in ("click", "view", "signup", "error"):
        row = flags.agg(
            F.lit(ft).alias("feature"),
            F.sum(
                (F.col(f"f_{ft}") & F.col("is_pos")).cast("long")
            ).alias("n_pos_with"),
            F.sum(
                (F.col(f"f_{ft}") & ~F.col("is_pos")).cast("long")
            ).alias("n_neg_with"),
        )
        feats = row if feats is None else feats.unionAll(row)
    p_pos = (F.col("n_pos_with") + 1.0) / (F.col("n_pos") + 2.0)
    p_neg = (F.col("n_neg_with") + 1.0) / (F.col("n_neg") + 2.0)
    return feats.crossJoin(F.broadcast(counts)).select(
        "feature",
        "n_pos_with",
        "n_neg_with",
        rnd(p_pos, 6).alias("p_given_pos"),
        rnd(p_neg, 6).alias("p_given_neg"),
        rnd(F.log(p_pos / p_neg), 6).alias("loglik_ratio"),
    )


# --------------------------------------------------------------------------
# Schema contract check: expected vs actual column types
# --------------------------------------------------------------------------

# the published ingest contract for the orders table, in canonical
# engine-neutral type names
_ORDERS_CONTRACT = [
    ("o_orderkey", "int64"),
    ("o_custkey", "int64"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "float64"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
    ("o_clerk", "string"),
    ("o_shippriority", "int64"),
    ("o_comment", "string"),
]

_CANON_SPARK = {
    "bigint": "int64",
    "long": "int64",
    "int": "int32",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "timestamp_ntz": "timestamp",
    "timestamp": "timestamp",
    "date": "date",
    "boolean": "bool",
}

_CANON_DUCK_SQL = """
    CASE upper(column_type)
        WHEN 'BIGINT' THEN 'int64'
        WHEN 'INTEGER' THEN 'int32'
        WHEN 'DOUBLE' THEN 'float64'
        WHEN 'FLOAT' THEN 'float32'
        WHEN 'VARCHAR' THEN 'string'
        WHEN 'TIMESTAMP' THEN 'timestamp'
        WHEN 'TIMESTAMP_NS' THEN 'timestamp'
        WHEN 'DATE' THEN 'date'
        WHEN 'BOOLEAN' THEN 'bool'
        ELSE lower(column_type)
    END
"""

_CONTRACT_VALUES = ", ".join(
    f"({i}, '{n}', '{t}')" for i, (n, t) in enumerate(_ORDERS_CONTRACT)
)


@query(
    "dq_schema_contract_check",
    oracle=f"""
    WITH actual AS (
        SELECT column_name,
               {_CANON_DUCK_SQL} AS actual_type
        FROM (DESCRIBE SELECT * FROM orders)
    ),
    contract AS (
        SELECT * FROM (VALUES {_CONTRACT_VALUES})
            AS t(pos, column_name, expected_type)
    )
    SELECT c.column_name,
           c.expected_type,
           a.actual_type,
           a.actual_type IS NOT NULL
               AND a.actual_type = c.expected_type AS ok
    FROM contract c LEFT JOIN actual a USING (column_name)
    """,
)
def dq_schema_contract_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema contract enforcement — the ingest gate that runs BEFORE
    any data is read: every column the published contract promises is
    checked against the actual parquet schema (presence + canonical
    type), one verdict row per contract column. Missing columns
    surface as actual_type NULL / ok false rather than a downstream
    AnalysisException at 3 a.m.; type drift (an upstream producer
    widening int to string) is caught at the boundary where it is
    cheap. Canonical engine-neutral type names make the same contract
    enforceable by Spark, DuckDB, or any catalog
    ([[scan_schema_evolution]] handles the SANCTIONED evolution path;
    this op rejects the unsanctioned kind). [[profile_columns]]
    describes what IS; this op asserts what MUST BE.

    Scale shape: pure metadata — the parquet footer schema, zero data
    rows scanned regardless of table size; the check is a constant-
    size join of two type lists."""
    actual = {
        f.name: _CANON_SPARK.get(
            f.dataType.simpleString(), f.dataType.simpleString()
        )
        for f in tables(spark, sf_dir).orders.schema.fields
    }
    rows = [
        (
            name,
            expected,
            actual.get(name),
            actual.get(name) is not None and actual.get(name) == expected,
        )
        for name, expected in _ORDERS_CONTRACT
    ]
    return spark.createDataFrame(
        rows,
        "column_name string, expected_type string, actual_type string,"
        " ok boolean",
    )


# --------------------------------------------------------------------------
# Simpson's paradox probe: stratified vs pooled metric comparison
# --------------------------------------------------------------------------

_SIMPSON_SEG_A = "BUILDING"
_SIMPSON_SEG_B = "MACHINERY"


@query(
    "dq_simpsons_paradox_probe",
    oracle=f"""
    WITH j AS (
        SELECT o.o_orderpriority AS stratum, c.c_mktsegment AS seg,
               o.o_totalprice AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        WHERE c.c_mktsegment IN ('{_SIMPSON_SEG_A}', '{_SIMPSON_SEG_B}')
    ),
    per AS (
        SELECT stratum,
               count(*) FILTER (seg = '{_SIMPSON_SEG_A}') AS n_a,
               count(*) FILTER (seg = '{_SIMPSON_SEG_B}') AS n_b,
               avg(v) FILTER (seg = '{_SIMPSON_SEG_A}') AS avg_a,
               avg(v) FILTER (seg = '{_SIMPSON_SEG_B}') AS avg_b
        FROM j GROUP BY stratum
    ),
    pooled AS (
        SELECT avg(v) FILTER (seg = '{_SIMPSON_SEG_A}')
               > avg(v) FILTER (seg = '{_SIMPSON_SEG_B}') AS pooled_a_wins
        FROM j
    )
    SELECT p.stratum,
           CAST(p.n_a AS BIGINT) AS n_a, CAST(p.n_b AS BIGINT) AS n_b,
           round(p.avg_a, 4) AS avg_a, round(p.avg_b, 4) AS avg_b,
           p.avg_a > p.avg_b AS a_wins,
           (p.avg_a > p.avg_b) <> q.pooled_a_wins AS reversed_vs_pooled
    FROM per p, pooled q
    WHERE p.n_a > 0 AND p.n_b > 0
    """,
)
def dq_simpsons_paradox_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's paradox probe — the aggregation-literacy gate every
    metrics platform needs: compare two cohorts' average order value
    WITHIN each stratum (order priority) next to the POOLED verdict,
    and flag strata whose winner contradicts the pooled winner. When
    reversed_vs_pooled fires on most strata, the pooled number is a
    mix-effect artifact (the cohorts load different strata), not a
    real difference — the classic way a dashboard misleads at any
    scale ([[events_ab_srm_check]] catches broken randomization;
    this catches broken AGGREGATION). Strata where either cohort is
    absent are excluded: no comparison exists.

    Scale shape: one broadcast dim join, one stratum-grain conditional
    aggregate (map-side partial), one one-row pooled aggregate
    broadcast back — two scans of the fact table, nothing else."""
    t = tables(spark, sf_dir)
    j = (
        t.orders.join(
            F.broadcast(
                t.customer.select("c_custkey", "c_mktsegment")
            ),
            t.orders["o_custkey"] == F.col("c_custkey"),
        )
        .filter(
            F.col("c_mktsegment").isin(_SIMPSON_SEG_A, _SIMPSON_SEG_B)
        )
        .select(
            F.col("o_orderpriority").alias("stratum"),
            F.col("c_mktsegment").alias("seg"),
            F.col("o_totalprice").alias("v"),
        )
    )
    is_a = F.col("seg") == _SIMPSON_SEG_A
    is_b = F.col("seg") == _SIMPSON_SEG_B
    per = j.groupBy("stratum").agg(
        F.count(F.when(is_a, 1)).cast("long").alias("n_a"),
        F.count(F.when(is_b, 1)).cast("long").alias("n_b"),
        F.avg(F.when(is_a, F.col("v"))).alias("avg_a_raw"),
        F.avg(F.when(is_b, F.col("v"))).alias("avg_b_raw"),
    )
    pooled = j.agg(
        (
            F.avg(F.when(is_a, F.col("v")))
            > F.avg(F.when(is_b, F.col("v")))
        ).alias("pooled_a_wins")
    )
    return (
        per.crossJoin(F.broadcast(pooled))
        .filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .select(
            "stratum",
            "n_a",
            "n_b",
            rnd(F.col("avg_a_raw"), 4).alias("avg_a"),
            rnd(F.col("avg_b_raw"), 4).alias("avg_b"),
            (F.col("avg_a_raw") > F.col("avg_b_raw")).alias("a_wins"),
            (
                (F.col("avg_a_raw") > F.col("avg_b_raw"))
                != F.col("pooled_a_wins")
            ).alias("reversed_vs_pooled"),
        )
    )


# --------------------------------------------------------------------------
# Rare-category audit: levels below the support floor
# --------------------------------------------------------------------------

_RARE_SUPPORT = 0.0065  # minimum level share before consolidation


@query(
    "dq_rare_category_audit",
    oracle=f"""
    WITH levels AS (
        SELECT p_brand || '/' || p_type AS level, count(*) AS n
        FROM part GROUP BY 1
    ),
    tot AS (SELECT sum(n) AS total, count(*) AS n_levels FROM levels)
    SELECT l.level,
           CAST(l.n AS BIGINT) AS n,
           round(l.n / CAST(t.total AS DOUBLE), 6) AS share,
           l.n / CAST(t.total AS DOUBLE) < {_RARE_SUPPORT} AS is_rare
    FROM levels l, tot t
    """,
)
def dq_rare_category_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-category audit — the feature-engineering gate before
    one-hot/target encoding: every level of a high-cardinality
    categorical (the brand x type composite, 150 levels) with its
    support share and the is_rare verdict against the 0.65% floor. Rare
    levels become 'OTHER' downstream: they carry no statistical
    signal, blow up encoded width, and (in target encoding) leak
    label noise — this table is the consolidation contract, versioned
    with the data rather than hardcoded in the model repo
    ([[profile_columns]] says what columns look like;
    [[dq_constraint_violations]] checks values; this decides the
    encodable vocabulary).

    Scale shape: one level-grain fold (map-side partial), a one-row
    total broadcast — the audit costs one scan at any cardinality,
    and the output is level-grain (bounded by the vocabulary, not
    the row count)."""
    t = tables(spark, sf_dir)
    levels = t.part.groupBy(
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias(
            "level"
        )
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = levels.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_levels")
    )
    share = F.col("n") / F.col("total").cast("double")
    return levels.crossJoin(F.broadcast(tot)).select(
        "level",
        F.col("n").cast("long").alias("n"),
        rnd(share, 6).alias("share"),
        (share < _RARE_SUPPORT).alias("is_rare"),
    )





# --------------------------------------------------------------------------
# Sequential probability ratio test (Wald SPRT) experiment monitor
# --------------------------------------------------------------------------

_SPRT_LIFT = 1.25   # H1: conversion rate = LIFT * p0
_SPRT_ALPHA = 0.05
_SPRT_BETA = 0.20
# Wald boundaries: ln((1-beta)/alpha), ln(beta/(1-alpha))
_SPRT_UPPER = 2.772589
_SPRT_LOWER = -1.558145


@query(
    "events_ab_sequential_sprt",
    oracle=f"""
    WITH exposures AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               user_id,
               bool_or(event_type = 'purchase') AS converted
        FROM events
        WHERE substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
              BETWEEN '0' AND '7'
        GROUP BY 1, 2
    ),
    p0x AS (
        SELECT count(*) FILTER (converted) / CAST(count(*) AS DOUBLE)
                   AS p0
        FROM (
            SELECT CAST(date_trunc('day', ts) AS DATE) AS d, user_id,
                   bool_or(event_type = 'purchase') AS converted
            FROM events GROUP BY 1, 2
        )
    ),
    daily AS (
        SELECT d, count(*) AS n, count(*) FILTER (converted) AS c
        FROM exposures GROUP BY d
    ),
    cum AS (
        SELECT d,
               sum(n) OVER (ORDER BY d) AS n_cum,
               sum(c) OVER (ORDER BY d) AS c_cum
        FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(n_cum AS BIGINT) AS n_exposures,
           CAST(c_cum AS BIGINT) AS n_conversions,
           round(c_cum * ln({_SPRT_LIFT})
                 + (n_cum - c_cum)
                   * ln((1 - {_SPRT_LIFT} * p.p0) / (1 - p.p0)), 6)
               AS llr,
           CASE WHEN c_cum * ln({_SPRT_LIFT})
                     + (n_cum - c_cum)
                       * ln((1 - {_SPRT_LIFT} * p.p0) / (1 - p.p0))
                     >= {_SPRT_UPPER} THEN 'accept_h1'
                WHEN c_cum * ln({_SPRT_LIFT})
                     + (n_cum - c_cum)
                       * ln((1 - {_SPRT_LIFT} * p.p0) / (1 - p.p0))
                     <= {_SPRT_LOWER} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM cum, p0x p
    """,
)
def events_ab_sequential_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test as an experiment
    monitor — the SEQUENTIAL lane the A/B family was missing
    ([[events_ab_welch_ttest]] is fixed-horizon;
    [[events_ab_power_mde]] sizes that horizon up front; SPRT lets
    the experiment STOP the day the evidence is in, with alpha/beta
    guaranteed by the Wald boundaries ln((1-b)/a), ln(b/(1-a))):
    daily (user, day) exposures of the md5-assigned treatment arm
    accumulate a log-likelihood ratio of H1 (conversion = {lift}x
    the pooled baseline) against H0 (baseline), and each day carries
    the running verdict. Since ln(p1/p0) = ln(lift) exactly, the
    per-conversion increment is a constant and the whole path is
    closed-form from cumulative counts — hash-checkable, no
    simulation.

    Scale shape: one (day, user) fold (map-side partial), a one-row
    pooled baseline broadcast, one cumulative window over the
    calendar-grain frame. The monitor costs one scan per refresh at
    any event volume."""
    t = tables(spark, sf_dir)
    all_exp = t.events.groupBy(
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
        "user_id",
    ).agg(F.bool_or(F.col("event_type") == "purchase").alias("converted"))
    p0x = all_exp.agg(
        (
            F.count(F.when(F.col("converted"), 1))
            / F.count(F.lit(1)).cast("double")
        ).alias("p0")
    )
    arm = all_exp.filter(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
        .between("0", "7")
    )
    daily = arm.groupBy("d").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("converted"), 1)).alias("c"),
    )
    wcum = Window.orderBy("d")
    cum = daily.select(
        "d",
        F.sum("n").over(wcum).alias("n_cum"),
        F.sum("c").over(wcum).alias("c_cum"),
    )
    import math as _m

    llr = F.col("c_cum") * _m.log(_SPRT_LIFT) + (
        F.col("n_cum") - F.col("c_cum")
    ) * F.log((1 - _SPRT_LIFT * F.col("p0")) / (1 - F.col("p0")))
    return cum.crossJoin(F.broadcast(p0x)).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_cum").cast("long").alias("n_exposures"),
        F.col("c_cum").cast("long").alias("n_conversions"),
        rnd(llr, 6).alias("llr"),
        F.when(llr >= _SPRT_UPPER, F.lit("accept_h1"))
        .when(llr <= _SPRT_LOWER, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


events_ab_sequential_sprt.__doc__ = (
    events_ab_sequential_sprt.__doc__.replace("{lift}", str(_SPRT_LIFT))
)


# --------------------------------------------------------------------------
# Partition checksums: order-independent XOR row digests per day
# --------------------------------------------------------------------------


@query(
    "dq_partition_checksums",
    oracle="""
    WITH rows_h AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
               ('0x' || substring(md5(
                   CAST(event_id AS VARCHAR) || '|' ||
                   CAST(user_id AS VARCHAR) || '|' || event_type
               ), 1, 15))::BIGINT AS h
        FROM events
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(bit_xor(h) AS BIGINT) AS xor_checksum
    FROM rows_h GROUP BY d
    """,
)
def dq_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-grain replication checksums — the table-diff
    primitive for cross-cluster reconciliation: every row digests to
    a 60-bit md5 slice and each day's rows fold with XOR — an
    order-independent, overflow-free, MERGEABLE aggregate, so two
    sites compute checksums independently (any partitioning, any row
    order) and a mismatched day pinpoints WHERE replication diverged
    without shipping data ([[corpus_version_hash]] is the
    dataset-grain identity; this is the per-partition diff map that
    says which partition to re-sync). A dropped row, a duplicated
    row, or a mutated key all flip the XOR with probability
    1 - 2^-60.

    Scale shape: row digest is map-side codegen; XOR folds map-side
    partial like any sum; output is calendar-grain. The op costs one
    scan and reconciling two 100 TB replicas costs exchanging a few
    kilobytes of (day, checksum) rows."""
    t = tables(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("event_id").cast("string"),
                    F.col("user_id").cast("string"),
                    F.col("event_type"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return t.events.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
        .alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.bit_xor(h).cast("long").alias("xor_checksum"),
    )


# --------------------------------------------------------------------------
# Cohen's d effect sizes between segment pairs
# --------------------------------------------------------------------------

_COHEN_BASE_SEG = "BUILDING"


@query(
    "events_cohens_d_effect_size",
    oracle=f"""
    WITH j AS (
        SELECT c.c_mktsegment AS seg, o.o_totalprice AS v
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    stats AS (
        SELECT seg, count(*) AS n, avg(v) AS m, var_samp(v) AS s2
        FROM j GROUP BY seg
    ),
    base AS (
        SELECT n AS n0, m AS m0, s2 AS s20 FROM stats
        WHERE seg = '{_COHEN_BASE_SEG}'
    )
    SELECT s.seg AS segment,
           CAST(s.n AS BIGINT) AS n,
           round(s.m - b.m0, 4) AS mean_diff,
           round((s.m - b.m0)
                 / sqrt(((s.n - 1) * s.s2 + (b.n0 - 1) * b.s20)
                        / (s.n + b.n0 - 2)), 6) AS cohens_d,
           CASE WHEN abs((s.m - b.m0)
                    / sqrt(((s.n - 1) * s.s2 + (b.n0 - 1) * b.s20)
                           / (s.n + b.n0 - 2))) < 0.2 THEN 'negligible'
                WHEN abs((s.m - b.m0)
                    / sqrt(((s.n - 1) * s.s2 + (b.n0 - 1) * b.s20)
                           / (s.n + b.n0 - 2))) < 0.5 THEN 'small'
                WHEN abs((s.m - b.m0)
                    / sqrt(((s.n - 1) * s.s2 + (b.n0 - 1) * b.s20)
                           / (s.n + b.n0 - 2))) < 0.8 THEN 'medium'
                ELSE 'large' END AS magnitude
    FROM stats s, base b
    WHERE s.seg <> '{_COHEN_BASE_SEG}'
    """,
)
def events_cohens_d_effect_size(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cohen's d effect sizes — every market segment's order value
    against the {base} baseline, standardized by the pooled standard
    deviation, with the conventional negligible/small/medium/large
    banding: the number that says whether a difference MATTERS, which
    a p-value cannot ([[events_ab_welch_ttest]] answers 'is it real';
    at 100 TB everything is statistically significant and effect size
    is the only defensible ranking; [[events_ab_power_mde]] consumes
    exactly this d to size experiments). Computed from per-segment
    count/mean/variance — one mergeable fold, the pooled-sd formula
    applied segment-by-segment against the broadcast baseline row.

    Scale shape: one broadcast dim join + one segment-grain moment
    fold + a one-row baseline broadcast — one scan regardless of
    volume."""
    t = tables(spark, sf_dir)
    j = t.orders.join(
        F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
        t.orders["o_custkey"] == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("v"),
    )
    stats = j.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("v").alias("m"),
        F.var_samp("v").alias("s2"),
    )
    base = stats.filter(F.col("seg") == _COHEN_BASE_SEG).select(
        F.col("n").alias("n0"),
        F.col("m").alias("m0"),
        F.col("s2").alias("s20"),
    )
    pooled = F.sqrt(
        (
            (F.col("n") - 1) * F.col("s2")
            + (F.col("n0") - 1) * F.col("s20")
        )
        / (F.col("n") + F.col("n0") - 2)
    )
    d = (F.col("m") - F.col("m0")) / pooled
    return (
        stats.filter(F.col("seg") != _COHEN_BASE_SEG)
        .crossJoin(F.broadcast(base))
        .select(
            F.col("seg").alias("segment"),
            F.col("n").cast("long").alias("n"),
            rnd(F.col("m") - F.col("m0"), 4).alias("mean_diff"),
            rnd(d, 6).alias("cohens_d"),
            F.when(F.abs(d) < 0.2, F.lit("negligible"))
            .when(F.abs(d) < 0.5, F.lit("small"))
            .when(F.abs(d) < 0.8, F.lit("medium"))
            .otherwise(F.lit("large"))
            .alias("magnitude"),
        )
    )


events_cohens_d_effect_size.__doc__ = (
    events_cohens_d_effect_size.__doc__.replace(
        "{base}", _COHEN_BASE_SEG
    )
)


# --------------------------------------------------------------------------
# Western Electric control-chart rules over the daily revenue KPI
# --------------------------------------------------------------------------


@query(
    "dq_spc_western_electric",
    oracle="""
    WITH daily AS (
        SELECT o_orderdate::DATE AS d, sum(o_totalprice) AS rev
        FROM orders GROUP BY 1
    ),
    stats AS (
        SELECT avg(rev) AS mu, stddev_pop(rev) AS sigma FROM daily
    ),
    z AS (
        SELECT d, rev, round((rev - mu) / sigma, 6) AS z
        FROM daily CROSS JOIN stats
    ),
    flags AS (
        SELECT d, rev, z,
               abs(z) > 3 AS r1,
               (sum(CASE WHEN z > 2 THEN 1 ELSE 0 END) OVER w3 >= 2
                OR sum(CASE WHEN z < -2 THEN 1 ELSE 0 END) OVER w3 >= 2)
                   AS r2,
               (sum(CASE WHEN z > 1 THEN 1 ELSE 0 END) OVER w5 >= 4
                OR sum(CASE WHEN z < -1 THEN 1 ELSE 0 END) OVER w5 >= 4)
                   AS r3,
               (sum(CASE WHEN z > 0 THEN 1 ELSE 0 END) OVER w8 = 8
                OR sum(CASE WHEN z < 0 THEN 1 ELSE 0 END) OVER w8 = 8)
                   AS r4
        FROM z
        WINDOW w3 AS (ORDER BY d ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
               w5 AS (ORDER BY d ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
               w8 AS (ORDER BY d ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           round(rev, 2) AS revenue, z,
           r1, r2, r3, r4
    FROM flags
    WHERE r1 OR r2 OR r3 OR r4
    """,
)
def dq_spc_western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical process control over the daily-revenue KPI with the
    WESTERN ELECTRIC rules (1956 handbook; the alarm logic SPC software
    still ships): R1 one point beyond 3 sigma, R2 two of three
    consecutive beyond 2 sigma on the same side, R3 four of five
    beyond 1 sigma same side, R4 eight consecutive on one side of the
    center line. Where [[window_bollinger_breach]] flags single-point
    excursions, the run-based rules catch small sustained shifts a
    3-sigma test misses — the monitoring layer a 100-TB ingest pipeline
    points at its daily volume/revenue KPIs.

    Engine parity: z-scores are ROUNDED to 6 decimals before every
    rule comparison in both engines, so partial-aggregation wobble in
    mu/sigma cannot flip a rule at a boundary. Scale shape: the fact
    table collapses to calendar grain in one aggregate; all four rules
    are rolling counts over that tiny series (the calendar-grain
    window precedent); the baseline mu/sigma is a broadcast 1-row
    aggregate."""
    t = tables(spark, sf_dir)
    daily = t.orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    stats = daily.agg(
        F.avg("rev").alias("mu"), F.stddev_pop("rev").alias("sigma")
    )
    z = daily.crossJoin(F.broadcast(stats)).select(
        "d",
        "rev",
        rnd((F.col("rev") - F.col("mu")) / F.col("sigma"), 6).alias("z"),
    )
    w3 = Window.orderBy("d").rowsBetween(-2, 0)
    w5 = Window.orderBy("d").rowsBetween(-4, 0)
    w8 = Window.orderBy("d").rowsBetween(-7, 0)

    def _cnt(cond, w):
        return F.sum(F.when(cond, 1).otherwise(0)).over(w)

    zc = F.col("z")
    flags = z.select(
        "d",
        "rev",
        "z",
        (F.abs(zc) > 3).alias("r1"),
        ((_cnt(zc > 2, w3) >= 2) | (_cnt(zc < -2, w3) >= 2)).alias("r2"),
        ((_cnt(zc > 1, w5) >= 4) | (_cnt(zc < -1, w5) >= 4)).alias("r3"),
        ((_cnt(zc > 0, w8) == 8) | (_cnt(zc < 0, w8) == 8)).alias("r4"),
    )
    return flags.filter(
        F.col("r1") | F.col("r2") | F.col("r3") | F.col("r4")
    ).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        rnd("rev", 2).alias("revenue"),
        "z",
        "r1",
        "r2",
        "r3",
        "r4",
    )


# --------------------------------------------------------------------------
# Mann-Whitney U test (value-grain midranks, tie-corrected normal approx)
# --------------------------------------------------------------------------

_MWU_A = "click"
_MWU_B = "purchase"


@query(
    "events_mannwhitney_u",
    oracle=f"""
    WITH v AS (
        SELECT value,
               sum(CASE WHEN event_type = '{_MWU_A}' THEN 1 ELSE 0 END) AS na,
               sum(CASE WHEN event_type = '{_MWU_B}' THEN 1 ELSE 0 END) AS nb
        FROM events
        WHERE event_type IN ('{_MWU_A}', '{_MWU_B}')
        GROUP BY value
    ),
    ranked AS (
        SELECT value, na, nb, na + nb AS t,
               sum(na + nb) OVER (ORDER BY value) - (na + nb) AS cnt_lt
        FROM v
    ),
    agg AS (
        SELECT sum(na) AS n1, sum(nb) AS n2,
               sum(na * (cnt_lt + (t + 1) / 2.0)) AS r1,
               sum(CAST(t AS DOUBLE) * t * t - t) AS tie_term
        FROM ranked
    ),
    stat AS (
        SELECT n1, n2,
               r1 - n1 * (n1 + 1) / 2.0 AS u1,
               n1 * n2 / 2.0 AS mu_u,
               sqrt(n1 * n2 / 12.0
                    * ((n1 + n2 + 1)
                       - tie_term / ((n1 + n2) * (n1 + n2 - 1.0))))
                   AS sigma_u
        FROM agg
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           round(u1, 1) AS u_statistic,
           round((u1 - mu_u) / sigma_u, 4) AS z,
           abs(round((u1 - mu_u) / sigma_u, 4)) > 1.96 AS significant_95,
           round(1 - 2 * u1 / (n1 * n2), 6) AS rank_biserial
    FROM stat
    """,
)
def events_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U (Wilcoxon rank-sum): does the '{a}' value
    distribution stochastically dominate '{b}'? — the nonparametric
    two-sample location test that needs no normality, completing the
    testing shelf next to the parametric [[events_ab_welch_ttest]] and
    the distribution-shape [[dq_ks_test_two_sample]]. Tie-corrected
    normal approximation (no continuity correction, pinned) plus the
    rank-biserial effect size 1 - 2U/(n1*n2) (the readable number:
    P(X>Y) - P(Y>X)).

    Engine-parity AND scale shape come from the same trick: midranks
    are computed at VALUE grain — midrank(v) = #less + (#equal+1)/2
    via one cumulative window over the DISTINCT-value relation (values
    are 2-decimal-bounded, so that relation is bounded regardless of
    corpus size — no global row sort, the rank arithmetic is exact
    integer-and-halves). The rank-sum and tie term are exact sums;
    only the final z touches irrational arithmetic, rounded at 4
    before the significance comparison."""
    t = tables(spark, sf_dir)
    v = (
        t.events.filter(F.col("event_type").isin(_MWU_A, _MWU_B))
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == _MWU_A, 1).otherwise(0)
            ).alias("na"),
            F.sum(
                F.when(F.col("event_type") == _MWU_B, 1).otherwise(0)
            ).alias("nb"),
        )
    )
    wv = Window.orderBy("value")
    ranked = v.select(
        "na",
        "nb",
        (F.col("na") + F.col("nb")).alias("t"),
        (
            F.sum(F.col("na") + F.col("nb")).over(wv)
            - (F.col("na") + F.col("nb"))
        ).alias("cnt_lt"),
    )
    agg = ranked.agg(
        F.sum("na").alias("n1"),
        F.sum("nb").alias("n2"),
        F.sum(
            F.col("na") * (F.col("cnt_lt") + (F.col("t") + 1) / 2.0)
        ).alias("r1"),
        F.sum(
            F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tie_term"),
    )
    u1 = F.col("r1") - F.col("n1") * (F.col("n1") + 1) / 2.0
    mu_u = F.col("n1") * F.col("n2") / 2.0
    sigma_u = F.sqrt(
        F.col("n1")
        * F.col("n2")
        / 12.0
        * (
            (F.col("n1") + F.col("n2") + 1)
            - F.col("tie_term")
            / ((F.col("n1") + F.col("n2")) * (F.col("n1") + F.col("n2") - 1.0))
        )
    )
    z = rnd((u1 - mu_u) / sigma_u, 4)
    return agg.select(
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        rnd(u1, 1).alias("u_statistic"),
        z.alias("z"),
        (F.abs(z) > 1.96).alias("significant_95"),
        rnd(1 - 2 * u1 / (F.col("n1") * F.col("n2")), 6).alias(
            "rank_biserial"
        ),
    )


events_mannwhitney_u.__doc__ = events_mannwhitney_u.__doc__.replace(
    "{a}", _MWU_A
).replace("{b}", _MWU_B)


# --------------------------------------------------------------------------
# Bivariate Mahalanobis outliers (closed-form 2x2 inverse)
# --------------------------------------------------------------------------

_MAHA_CHI2_95_2DF = 5.991464547107979  # chi^2 0.95 quantile, 2 df
_MAHA_TOPK = 20


@query(
    "dq_mahalanobis_outliers",
    oracle=f"""
    WITH per AS (
        SELECT o.o_orderkey, o.o_totalprice AS x,
               CAST(c.n AS DOUBLE) AS y
        FROM orders o
        JOIN (SELECT l_orderkey, count(*) AS n
              FROM lineitem GROUP BY l_orderkey) c
          ON c.l_orderkey = o.o_orderkey
    ),
    mom AS (
        SELECT avg(x) AS mx, avg(y) AS my,
               avg(x * x) - avg(x) * avg(x) AS vx,
               avg(y * y) - avg(y) * avg(y) AS vy,
               avg(x * y) - avg(x) * avg(y) AS cxy
        FROM per
    ),
    d AS (
        SELECT o_orderkey, x, y,
               round(((x - mx) * (x - mx) * vy
                      - 2 * (x - mx) * (y - my) * cxy
                      + (y - my) * (y - my) * vx)
                     / (vx * vy - cxy * cxy), 4) AS d2
        FROM per CROSS JOIN mom
    )
    SELECT o_orderkey, round(x, 2) AS totalprice,
           CAST(y AS BIGINT) AS n_items, d2,
           row_number() OVER (ORDER BY d2 DESC, o_orderkey) AS rn
    FROM d
    WHERE d2 > {_MAHA_CHI2_95_2DF!r}
    QUALIFY rn <= {_MAHA_TOPK}
    """,
)
def dq_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIVARIATE outlier detection by Mahalanobis distance on the
    (order value, line count) plane — the joint-distribution check the
    univariate [[dq_outlier_iqr]] cannot express: a $180k order is
    normal and a 7-line order is normal, but a $180k SINGLE-LINE order
    is exactly what fraud/DQ review wants surfaced. d² against the
    2x2 covariance (closed-form inverse — no linear algebra library),
    flagged above the chi²(2df, 95%) quantile, top-{k} reported.
    d² rounds to 4 before both the threshold and the rank, so moment
    wobble cannot flip boundaries.

    Scale shape: one per-order count aggregate + one moment reduce
    (broadcast 1-row); the distance is a map-side expression; top-k is
    a rank over the flagged subset. The same closed form covers any
    fixed small feature pair; beyond ~5 features you'd move to a
    driver-side inverse (the k-means O(d²) precedent)."""
    t = tables(spark, sf_dir)
    cnt = t.lineitem.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    per = t.orders.join(
        cnt, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        "o_orderkey",
        F.col("o_totalprice").alias("x"),
        F.col("n").cast("double").alias("y"),
    )
    mom = per.agg(
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        (F.avg(F.col("x") * F.col("x")) - F.avg("x") * F.avg("x")).alias("vx"),
        (F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias("vy"),
        (F.avg(F.col("x") * F.col("y")) - F.avg("x") * F.avg("y")).alias(
            "cxy"
        ),
    )
    dx, dy = F.col("x") - F.col("mx"), F.col("y") - F.col("my")
    det = F.col("vx") * F.col("vy") - F.col("cxy") * F.col("cxy")
    d2 = rnd(
        (
            dx * dx * F.col("vy")
            - 2 * dx * dy * F.col("cxy")
            + dy * dy * F.col("vx")
        )
        / det,
        4,
    )
    d = per.crossJoin(F.broadcast(mom)).select(
        "o_orderkey", "x", "y", d2.alias("d2")
    )
    rn = F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(F.desc("d2"), F.asc("o_orderkey"))
    )
    return (
        d.filter(F.col("d2") > _MAHA_CHI2_95_2DF)
        .withColumn("rn", rn)
        .filter(F.col("rn") <= _MAHA_TOPK)
        .select(
            "o_orderkey",
            rnd("x", 2).alias("totalprice"),
            F.col("y").cast("long").alias("n_items"),
            "d2",
            "rn",
        )
    )


dq_mahalanobis_outliers.__doc__ = dq_mahalanobis_outliers.__doc__.replace(
    "{k}", str(_MAHA_TOPK)
)


# --------------------------------------------------------------------------
# Kruskal-Wallis H across all event types (ranks ANOVA, tie-corrected)
# --------------------------------------------------------------------------

# chi^2 0.95 quantiles keyed by df = k-1 (ADVICE r6: derive the critical
# value from the OBSERVED group count instead of hardcoding 4 df — a
# fixture with != 5 event types would silently test at the wrong df)
_KW_CHI2_95 = {
    1: 3.841458820694124,
    2: 5.991464547107979,
    3: 7.814727903251179,
    4: 9.487729036781154,
    5: 11.070497693516351,
    6: 12.591587243743977,
    7: 14.067140449340169,
    8: 15.50731305586545,
    9: 16.918977604620448,
    10: 18.307038053275146,
    11: 19.67513757268249,
    12: 21.02606981748307,
}

_KW_CRIT_SQL = "CASE " + " ".join(
    f"WHEN k = {df + 1} THEN {q!r}" for df, q in _KW_CHI2_95.items()
) + " END"


@query(
    "events_kruskal_wallis_h",
    oracle=f"""
    WITH vt AS (
        SELECT value, event_type, count(*) AS ngv
        FROM events GROUP BY value, event_type
    ),
    vtot AS (SELECT value, sum(ngv) AS t FROM vt GROUP BY value),
    mr AS (
        SELECT value, t,
               sum(t) OVER (ORDER BY value) - t + (t + 1) / 2.0 AS midrank
        FROM vtot
    ),
    pg AS (
        SELECT vt.event_type,
               sum(vt.ngv) AS ng,
               sum(vt.ngv * mr.midrank) AS rg
        FROM vt JOIN mr USING (value)
        GROUP BY vt.event_type
    ),
    gl AS (
        SELECT sum(ng) AS n, count(*) AS k,
               sum(rg * rg / ng) AS sr2
        FROM pg
    ),
    tie AS (
        SELECT sum(CAST(t AS DOUBLE) * t * t - t) AS tt FROM vtot
    ),
    h AS (
        SELECT gl.n, gl.k,
               (12.0 / (gl.n * (gl.n + 1)) * gl.sr2 - 3 * (gl.n + 1))
               / (1 - tie.tt / (CAST(gl.n AS DOUBLE) * gl.n * gl.n - gl.n))
                   AS hc,
               {_KW_CRIT_SQL} AS crit
        FROM gl CROSS JOIN tie
    )
    SELECT pg.event_type,
           CAST(pg.ng AS BIGINT) AS n_g,
           round(pg.rg / pg.ng, 4) AS mean_rank,
           round(h.hc, 4) AS h_corrected,
           round(h.hc, 4) > h.crit AS significant_95
    FROM pg CROSS JOIN h
    """,
)
def events_kruskal_wallis_h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H — one-way ANOVA on ranks across ALL event
    types at once, the k-group extension of [[events_mannwhitney_u]]
    (pairwise tests across 5 groups inflate alpha; KW is the single
    omnibus gate run first). Tie-corrected H against chi²(k-1 df,
    95%); per-group mean ranks show WHERE the separation is.

    Same engine-parity-and-scale trick as the U test: midranks at
    VALUE grain (#less + (#equal+1)/2 via one cumulative window over
    the bounded distinct-value relation — exact integer-and-halves, no
    global row sort), rank sums as exact products, only the final H
    irrational and rounded at 4 before the significance compare."""
    t = tables(spark, sf_dir)
    vt = t.events.groupBy("value", "event_type").agg(
        F.count(F.lit(1)).alias("ngv")
    )
    vtot = vt.groupBy("value").agg(F.sum("ngv").alias("t"))
    wv = Window.orderBy("value")
    mr = vtot.select(
        "value",
        "t",
        (
            F.sum("t").over(wv) - F.col("t") + (F.col("t") + 1) / 2.0
        ).alias("midrank"),
    )
    pg = (
        vt.join(mr, "value")
        .groupBy("event_type")
        .agg(
            F.sum("ngv").alias("ng"),
            F.sum(F.col("ngv") * F.col("midrank")).alias("rg"),
        )
    )
    gl = pg.agg(
        F.sum("ng").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum(F.col("rg") * F.col("rg") / F.col("ng")).alias("sr2"),
    )
    tie = vtot.agg(
        F.sum(
            F.col("t").cast("double") * F.col("t") * F.col("t") - F.col("t")
        ).alias("tt")
    )
    hc = (
        12.0 / (F.col("n") * (F.col("n") + 1)) * F.col("sr2")
        - 3 * (F.col("n") + 1)
    ) / (
        1
        - F.col("tt")
        / (F.col("n").cast("double") * F.col("n") * F.col("n") - F.col("n"))
    )
    crit = F.lit(None).cast("double")
    for df, q in _KW_CHI2_95.items():
        crit = F.when(F.col("k") == df + 1, F.lit(q)).otherwise(crit)
    h = gl.crossJoin(F.broadcast(tie)).select(
        rnd(hc, 4).alias("hc"), crit.alias("crit")
    )
    return pg.crossJoin(F.broadcast(h)).select(
        "event_type",
        F.col("ng").cast("long").alias("n_g"),
        rnd(F.col("rg") / F.col("ng"), 4).alias("mean_rank"),
        F.col("hc").alias("h_corrected"),
        (F.col("hc") > F.col("crit")).alias("significant_95"),
    )


# --------------------------------------------------------------------------
# Luhn checksum validation (the checksum-DQ primitive)
# --------------------------------------------------------------------------

_LUHN_LEN = 13  # '4' + 11 digits + check digit


@query(
    "dq_luhn_checksum_validate",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey,
               '4' || lpad(CAST(o_orderkey % 100000000000 AS VARCHAR),
                           11, '0') AS b
        FROM orders
    ),
    chk AS (
        SELECT o_orderkey, b,
               -- Luhn sum of the 12 base digits as if a check digit
               -- follows (so position i from the right of the FULL
               -- number is i+1): double the odd positions of b-from-
               -- right
               CAST(list_sum(list_transform(generate_series(1, 12),
                   i -> CASE WHEN i % 2 = 1
                        THEN CASE WHEN 2 * CAST(substring(b, 13 - i, 1)
                                           AS INT) > 9
                             THEN 2 * CAST(substring(b, 13 - i, 1) AS INT) - 9
                             ELSE 2 * CAST(substring(b, 13 - i, 1) AS INT)
                             END
                        ELSE CAST(substring(b, 13 - i, 1) AS INT)
                        END)) AS BIGINT) AS s
        FROM base
    ),
    full_num AS (
        SELECT o_orderkey,
               b || CAST(CASE WHEN o_orderkey % 2 = 0
                         THEN (10 - s % 10) % 10
                         ELSE ((10 - s % 10) % 10 + 5) % 10
                         END AS VARCHAR) AS num
        FROM chk
    ),
    validated AS (
        SELECT o_orderkey, num,
               CAST(list_sum(list_transform(generate_series(1, {_LUHN_LEN}),
                   i -> CASE WHEN i % 2 = 0
                        THEN CASE WHEN 2 * CAST(substring(num,
                                  {_LUHN_LEN + 1} - i, 1) AS INT) > 9
                             THEN 2 * CAST(substring(num,
                                  {_LUHN_LEN + 1} - i, 1) AS INT) - 9
                             ELSE 2 * CAST(substring(num,
                                  {_LUHN_LEN + 1} - i, 1) AS INT)
                             END
                        ELSE CAST(substring(num,
                                  {_LUHN_LEN + 1} - i, 1) AS INT)
                        END)) AS BIGINT) % 10 = 0 AS ok,
               o_orderkey % 2 = 0 AS should_be_ok
        FROM full_num
    )
    SELECT CAST(count(*) AS BIGINT) AS n_numbers,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           round(avg(CASE WHEN ok THEN 1.0 ELSE 0.0 END), 6) AS valid_rate,
           bool_and(ok = should_be_ok) AS checksum_logic_consistent
    FROM validated
    """,
)
def dq_luhn_checksum_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LUHN checksum validation (ISO/IEC 7812 — card numbers, IMEIs,
    provider ids): the checksum-DQ primitive an ingest pipeline runs on
    identifier columns to catch truncation/transposition corruption
    before it joins anything. The testdata carries no card-like
    column, so one is DERIVED per order ('4' + 11 digits of the key)
    with a REAL Luhn check digit appended for even keys and a
    deliberately wrong one for odd keys — validating both the
    accept and the reject path; `checksum_logic_consistent` asserts
    the validator agrees with the construction on every row (a single
    digit-doubling or position-parity bug flips it red).

    Pure integer digit-fold arithmetic in both engines (no floats
    anywhere until the rate). Scale shape: map-side expression over
    the scan + one global count reduce — embarrassingly parallel."""
    t = tables(spark, sf_dir)
    base = t.orders.select(
        "o_orderkey",
        F.concat(
            F.lit("4"),
            F.lpad((F.col("o_orderkey") % 100000000000).cast("string"), 11, "0"),
        ).alias("b"),
    )

    def _luhn_sum(col_name: str, length: int, double_odd: bool):
        # position i counts from the RIGHT of the string
        parity = 1 if double_odd else 0

        def term(i):
            d = F.substring(F.col(col_name), length + 1 - i, 1).cast("int")
            dd = 2 * d
            doubled = F.when(dd > 9, dd - 9).otherwise(dd)
            return doubled if i % 2 == parity else d

        return sum((term(i) for i in range(1, length + 1)), start=F.lit(0))

    chk = base.select(
        "o_orderkey", "b", _luhn_sum("b", 12, True).alias("s")
    )
    check_digit = (10 - F.col("s") % 10) % 10
    full_num = chk.select(
        "o_orderkey",
        F.concat(
            F.col("b"),
            F.when(F.col("o_orderkey") % 2 == 0, check_digit)
            .otherwise((check_digit + 5) % 10)
            .cast("int")
            .cast("string"),
        ).alias("num"),
    )
    validated = full_num.select(
        "o_orderkey",
        (_luhn_sum("num", _LUHN_LEN, False) % 10 == 0).alias("ok"),
        (F.col("o_orderkey") % 2 == 0).alias("should_be_ok"),
    )
    return validated.agg(
        F.count(F.lit(1)).alias("n_numbers"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .cast("long")
        .alias("n_valid"),
        rnd(F.avg(F.when(F.col("ok"), 1.0).otherwise(0.0)), 6).alias(
            "valid_rate"
        ),
        F.bool_and(F.col("ok") == F.col("should_be_ok")).alias(
            "checksum_logic_consistent"
        ),
    )


# --------------------------------------------------------------------------
# Levene / Brown-Forsythe variance-homogeneity test across groups
# --------------------------------------------------------------------------

# Large-sample 95% critical values for F(df1, inf) = chi2_95(df1)/df1.
# With df2 = N - k in the thousands the finite-df2 correction is < 0.5%,
# which is the documented approximation (this is a data-quality gate,
# not an inference engine).
_LEVENE_F95_INF = {
    1: 3.8415, 2: 2.9957, 3: 2.6049, 4: 2.3719, 5: 2.2141,
    6: 2.0986, 7: 2.0096, 8: 1.9384, 9: 1.8799, 10: 1.8307,
}


def _levene_crit_values_sql() -> str:
    rows = ", ".join(f"({k}, {v})" for k, v in _LEVENE_F95_INF.items())
    return f"(VALUES {rows}) AS crit(df1, f95)"


@query(
    "dq_levene_variance_homogeneity",
    oracle=f"""
    WITH c AS (
        SELECT event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
               event_id
        FROM events
    ),
    rk AS (
        SELECT event_type, cents,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY cents, event_id
               ) AS r,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM c
    ),
    med AS (
        SELECT event_type, cents AS med_c
        FROM rk WHERE r = (n + 1) // 2
    ),
    z AS (
        SELECT c.event_type, abs(c.cents - med.med_c) AS z
        FROM c JOIN med USING (event_type)
    ),
    per_g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_g,
               CAST(sum(z) AS BIGINT) AS s1,
               CAST(sum(z * z) AS BIGINT) AS s2
        FROM z GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n_g) AS BIGINT) AS n,
               CAST(sum(s1) AS BIGINT) AS s1_all
        FROM per_g
    ),
    stat AS (
        SELECT tot.k, tot.n,
               sum(per_g.n_g
                   * pow(per_g.s1 * 1.0 / per_g.n_g
                         - tot.s1_all * 1.0 / tot.n, 2)) AS num,
               sum(per_g.s2 - per_g.s1 * 1.0 * per_g.s1 / per_g.n_g)
                   AS den
        FROM per_g CROSS JOIN tot
        GROUP BY tot.k, tot.n
    )
    SELECT stat.k AS k_groups, stat.n AS n_total,
           stat.k - 1 AS df1, stat.n - stat.k AS df2,
           round((stat.n - stat.k) * 1.0 / (stat.k - 1)
                 * stat.num / stat.den, 6) AS w_stat,
           crit.f95 AS crit_f_95,
           round((stat.n - stat.k) * 1.0 / (stat.k - 1)
                 * stat.num / stat.den, 6) > crit.f95 AS significant_95
    FROM stat JOIN {_levene_crit_values_sql()}
        ON crit.df1 = stat.k - 1
    """,
    tags=("quality",),
)
def dq_levene_variance_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity test (Levene's test with the
    median center — the robust form) across event types on `value`:
    W = ((N-k)/(k-1)) * Σ n_g (z̄_g - z̄)² / Σ Σ (z - z̄_g)² with
    z = |x - median_g|. The pre-check every pooled analysis
    ([[ts_dow_anova]], [[events_ab_welch_ttest]]'s equal-variance
    cousin) should run first: heteroscedastic groups silently break
    pooled variance estimates, and this is the gate that says so.

    Engine parity (the [[ts_gumbel_block_maxima]] integer-cents chain):
    values are exact 2-decimal doubles, so everything up to the final
    ratio — the per-group DISCRETE median (rank-picked at (n+1)//2
    with (cents, event_id) ordering, no interpolation), every |x-med|
    deviation, and the moment sums S1/S2 — is exact BIGINT arithmetic;
    both engines then evaluate the identical pure function of those
    integers. The critical value is derived from the OBSERVED group
    count via a broadcast df1→F(df1, inf) lookup (the ADVICE r6 rule:
    never hardcode a df), exact to <0.5% at df2 in the thousands.

    Scale shape: one per-group sort for the rank-picked median (the
    exact-median cost — at extreme scale swap for approx_percentile
    and the test remains valid as plain Levene-with-a-robust-center),
    then two keyed folds down to k rows and a k-row reduction.
    """
    t = tables(spark, sf_dir)
    c = t.events.select(
        "event_type",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    rk = c.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n"),
    )
    med = rk.filter(
        F.col("r") == F.floor((F.col("n") + 1) / 2).cast("long")
    ).select("event_type", F.col("cents").alias("med_c"))
    z = c.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("cents") - F.col("med_c")).alias("z")
    )
    per_g = z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("z").cast("long").alias("s1"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("s2"),
    )
    tot = per_g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s1").cast("long").alias("s1_all"),
    )
    joined = per_g.crossJoin(F.broadcast(tot))
    stat = joined.groupBy("k", "n").agg(
        F.sum(
            F.col("n_g")
            * F.pow(
                F.col("s1") * 1.0 / F.col("n_g")
                - F.col("s1_all") * 1.0 / F.col("n"),
                2,
            )
        ).alias("num"),
        F.sum(
            F.col("s2") - F.col("s1") * 1.0 * F.col("s1") / F.col("n_g")
        ).alias("den"),
    )
    crit = spark.createDataFrame(
        [(k, v) for k, v in _LEVENE_F95_INF.items()], "df1 long, f95 double"
    )
    wstat = (
        (F.col("n") - F.col("k"))
        * 1.0
        / (F.col("k") - 1)
        * F.col("num")
        / F.col("den")
    )
    return (
        stat.withColumn("df1", (F.col("k") - 1).cast("long"))
        .join(F.broadcast(crit), "df1")
        .select(
            F.col("k").alias("k_groups"),
            F.col("n").alias("n_total"),
            "df1",
            (F.col("n") - F.col("k")).alias("df2"),
            rnd(wstat, 6).alias("w_stat"),
            F.col("f95").alias("crit_f_95"),
            # Compare the ROUNDED statistic in both engines: num/den are
            # double sums whose summation order differs across engines, so
            # an unrounded knife-edge W could flip the flag (ADVICE r7 —
            # the round-before-compare rule from dedup_idf_weighted_jaccard).
            (rnd(wstat, 6) > F.col("f95")).alias("significant_95"),
        )
    )


# --------------------------------------------------------------------------
# k-anonymity / l-diversity audit (privacy gate for training-data release)
# --------------------------------------------------------------------------

_KANON_K = 5  # groups smaller than this are re-identification risks
_KANON_BAND = 1000.0  # acctbal generalization band width


@query(
    "dq_k_anonymity",
    oracle=f"""
    WITH grouped AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / {_KANON_BAND}) AS BIGINT) AS bal_band,
               CAST(count(*) AS BIGINT) AS grp_n,
               CAST(count(DISTINCT CASE WHEN c_acctbal < 0
                                        THEN 'delinquent'
                                        ELSE 'current' END) AS BIGINT) AS l_div
        FROM customer
        GROUP BY 1, 2, 3
    )
    SELECT CAST(sum(grp_n) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(min(grp_n) AS BIGINT) AS min_group_size,
           round(avg(grp_n), 6) AS avg_group_size,
           CAST(count(*) FILTER (WHERE grp_n < {_KANON_K}) AS BIGINT)
               AS groups_below_k,
           CAST(coalesce(sum(grp_n) FILTER (WHERE grp_n < {_KANON_K}), 0)
               AS BIGINT) AS rows_below_k,
           round(coalesce(sum(grp_n) FILTER (WHERE grp_n < {_KANON_K}), 0)
                 * 1.0 / sum(grp_n), 6) AS pct_rows_below_k,
           CAST(min(l_div) AS BIGINT) AS min_l_diversity,
           CAST(count(*) FILTER (WHERE l_div < 2) AS BIGINT) AS groups_l1,
           round(coalesce(sum(grp_n) FILTER (WHERE l_div < 2), 0)
                 * 1.0 / sum(grp_n), 6) AS pct_rows_l1
    FROM grouped
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    al. 2007) over the customer table's quasi-identifiers — the privacy
    gate a training-data release runs AFTER [[corpus_pii_scrub]]'s
    direct-identifier redaction: scrubbing emails does nothing if the
    remaining (nation, market segment, balance band) tuple is unique
    enough to re-identify a row by linkage. Every row is generalized to
    its QI group (acctbal coarsened to {band}-unit bands); the report
    counts rows in groups smaller than k={k} (re-identifiable) and
    groups whose SENSITIVE attribute (delinquency: acctbal < 0) takes a
    single value (l-diversity 1 — membership alone discloses the
    sensitive fact even when the group is large). A release ships when
    pct_rows_below_k and pct_rows_l1 are ~0; otherwise the QI bands
    widen and the audit reruns.

    Scale shape: ONE hash aggregate at QI grain (count + conditional
    distinct-of-2 fold map-side), then a second aggregate over the
    QI-cardinality-bounded group relation to a single report row. No
    joins, no windows; at 100 TB this is a groupBy whose output is
    bounded by the generalization lattice, not the row count."""
    t = tables(spark, sf_dir)
    grouped = (
        t.customer.select(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / _KANON_BAND)
            .cast("long")
            .alias("bal_band"),
            (F.col("c_acctbal") < 0).cast("int").alias("delinq"),
        )
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(
            F.count(F.lit(1)).alias("grp_n"),
            # distinct count of a BINARY sensitive attribute is
            # max - min + 1 — one mergeable fold instead of the
            # countDistinct Expand + extra (QI, sens)-grain exchange
            (F.max("delinq") - F.min("delinq") + 1).alias("l_div"),
        )
    )
    below = F.col("grp_n") < _KANON_K
    l1 = F.col("l_div") < 2
    return grouped.agg(
        F.sum("grp_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("grp_n").cast("long").alias("min_group_size"),
        rnd(F.avg("grp_n"), 6).alias("avg_group_size"),
        F.count_if(below).alias("groups_below_k"),
        F.coalesce(F.sum(F.when(below, F.col("grp_n"))), F.lit(0))
        .cast("long")
        .alias("rows_below_k"),
        rnd(
            F.coalesce(F.sum(F.when(below, F.col("grp_n"))), F.lit(0))
            / F.sum("grp_n"),
            6,
        ).alias("pct_rows_below_k"),
        F.min("l_div").cast("long").alias("min_l_diversity"),
        F.count_if(l1).alias("groups_l1"),
        rnd(
            F.coalesce(F.sum(F.when(l1, F.col("grp_n"))), F.lit(0))
            / F.sum("grp_n"),
            6,
        ).alias("pct_rows_l1"),
    )


dq_k_anonymity.__doc__ = dq_k_anonymity.__doc__.replace(
    "{k}", str(_KANON_K)
).replace("{band}", str(int(_KANON_BAND)))
