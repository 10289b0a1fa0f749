"""Remaining TPC-H query shapes, adapted to the driver's reduced
schemas (no partsupp table; lineitem lacks shipmode/commitdate,
customer lacks phone — filters use the columns that exist).

These widen the SQL surface beyond the reference (which has no query
engine at all — see SURVEY.md §0) with the classic composite patterns:
conditional aggregation (Q14), HAVING-semi-join (Q18), outer-join
distribution (Q13), nation-pair volume (Q7), profit rollup (Q9),
argmax-by-scalar-subquery (Q15), fraction-of-total filter (Q11),
anti-join + scalar subquery (Q22), and a disjunctive multi-range
predicate (Q19).

Scale notes live per-operator; the recurring ones: dimension tables
(nation, supplier, part at these SFs) are broadcast so the fact scan
never shuffles for them, and aggregate-then-join orderings keep the
shuffled payload at the aggregate's cardinality, not the fact table's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query


@query(
    "q_promo_revenue_ratio",
    oracle="""
    SELECT round(
               100.0 * sum(CASE WHEN p_type = 'PROMO'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0 END)
               / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_ratio
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of promo-part revenue in a quarter — one
    broadcast join (part is the small side) and one conditional
    aggregation, single pass over the date-pruned lineitem scan. The
    shipdate range predicate reaches the parquet scan as a pushed
    filter, so at 100 TB only the quarter's row groups are read."""
    t = tables(spark, sf_dir)
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            rnd(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("promo_ratio")
        )
    )


@query(
    "q_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with their customers. The HAVING subquery is computed ONCE as a
    grouped aggregate (map-side partial combine, ~1% selectivity at the
    threshold) and broadcast-semi-joined back to orders, so the big
    lineitem table is scanned once for the filter and once for the
    final per-order sums — never cross-joined. Top-100 by totalprice
    runs as TakeOrderedAndProject with o_orderkey as the unique
    tiebreaker."""
    t = tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 250)
        .select("l_orderkey")
    )
    return (
        t.orders.join(
            F.broadcast(big), F.col("o_orderkey") == big["l_orderkey"], "left_semi"
        )
        .join(t.lineitem, F.col("o_orderkey") == t.lineitem["l_orderkey"])
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(rnd(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed 0, 1, 2, … non-urgent
    orders. The priority predicate lives in the JOIN CONDITION, not a
    WHERE — a left join must keep order-less customers with count 0
    (`count(o_orderkey)` skips the nulls the outer join fabricates).
    Two-level aggregation: the first groups by the join key (so it
    reuses the join's hash partitioning — no second exchange), the
    second is a tiny shuffle on the distinct counts."""
    t = tables(spark, sf_dir)
    per_cust = (
        t.customer.join(
            t.orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between a nation pair, by year
    and direction. Both nation joins AND the supplier/customer dims are
    broadcast; crucially the nation-name filter is applied to the
    broadcast sides BEFORE the join, so the fact-side scan drops to the
    two nations' suppliers/customers immediately — at 100 TB the only
    shuffle left is lineitem⨝orders on orderkey."""
    t = tables(spark, sf_dir)
    pair = ("NATION_1", "NATION_2")
    n1 = t.nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.filter(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = t.supplier.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    cust = t.customer.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    return (
        t.lineitem.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(rnd(F.sum("volume"), 2).alias("revenue"))
    )


@query(
    "q_product_profit_by_nation",
    oracle="""
    SELECT n_name AS nation, year(l_shipdate) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount) * (1 - l_tax)), 2)
               AS net_revenue
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'ECONOMY'
    GROUP BY n_name, year(l_shipdate)
    """,
)
def q_product_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (profit per nation-year for one product line;
    net of discount and tax since the reduced schema has no
    ps_supplycost). The p_type filter prunes the broadcast part dim
    first, which turns the fact join into a broadcast-semi-style
    reduction; supplier→nation is a two-hop broadcast chain. One
    shuffle total: the final group-by."""
    t = tables(spark, sf_dir)
    econ = t.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    return (
        t.lineitem.join(F.broadcast(econ), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("l_year"))
        .agg(
            rnd(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 - F.col("l_tax"))
                ),
                2,
            ).alias("net_revenue")
        )
    )


@query(
    "q_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in a
    quarter. The revenue CTE is computed once; the scalar max comes
    from a 1-row aggregate cross-joined (broadcast) back — NOT a
    window over all suppliers, which would shuffle+sort the whole
    aggregate for one scalar. Ties (multiple max suppliers) survive,
    matching the SQL subquery semantics."""
    t = tables(spark, sf_dir)
    rev = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx), rev["total_rev"] == mx["mx"])
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q_important_suppliers",
    oracle="""
    WITH sv AS (
        SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS value
        FROM lineitem
        GROUP BY l_suppkey
    )
    SELECT l_suppkey AS s_suppkey, round(value, 2) AS supplier_value
    FROM sv
    WHERE value > (SELECT sum(value) * 0.0015 FROM sv)
    """,
)
def q_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (fraction-of-total filter, on supplier revenue
    since there is no partsupp): suppliers whose revenue exceeds 0.15%
    of ALL revenue. The per-supplier aggregate is computed once and
    reused for both the scalar total (second-level 1-row aggregate,
    broadcast) and the filter — Spark's ReusedExchange makes the reuse
    free; the alternative correlated rewrite would rescan lineitem."""
    t = tables(spark, sf_dir)
    sv = (
        t.lineitem.groupBy("l_suppkey")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
    )
    total = sv.agg((F.sum("value") * F.lit(0.0015)).alias("cutoff"))
    return (
        sv.join(F.broadcast(total), sv["value"] > total["cutoff"])
        .select(F.col("l_suppkey").alias("s_suppkey"), rnd(F.col("value"), 2).alias("supplier_value"))
    )


@query(
    "q_rich_inactive_customers",
    oracle="""
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
)
def q_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders, counted per nation. Composition of the two subquery forms:
    the scalar AVG becomes a broadcast 1-row cross join, the NOT EXISTS
    becomes a LEFT ANTI join against the pre-filtered (and therefore
    small) urgent-order keys. Anti-join side is projected to the join
    key only before the shuffle — at 100 TB that's the difference
    between shuffling a column and shuffling the orders table."""
    t = tables(spark, sf_dir)
    avg_bal = t.customer.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    urgent = (
        t.orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    return (
        t.customer.join(F.broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            rnd(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q_disjunctive_brand_filter",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
           AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
           AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3'  AND l_quantity BETWEEN 20 AND 30
           AND p_size BETWEEN 1 AND 15)
    """,
)
def q_disjunctive_brand_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of brand × quantity-range × size
    conditions across the join. Catalyst extracts the common
    single-side conjuncts (quantity ∈ [1,30] on lineitem, the brand set
    and size ∈ [1,15] on part) and pushes them below the join, so the
    scan is pruned even though the user predicate spans both tables —
    the classic OR-predicate pushdown test."""
    t = tables(spark, sf_dir)
    j = t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & q.between(1, 11) & s.between(1, 5))
        | ((b == "Brand#23") & q.between(10, 20) & s.between(1, 10))
        | ((b == "Brand#3") & q.between(20, 30) & s.between(1, 15))
    )
    return j.filter(cond).agg(
        rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


@query(
    "q_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
               AS high_line_count,
           count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
               AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape adapted to the reduced schema (lineitem has no
    l_shipmode/l_commitdate/l_receiptdate): l_linestatus stands in for
    the ship mode and "late" means shipped more than 90 days after the
    order date. Counts high- vs low-priority orders among late lines.

    Scale: the shipdate window is a pushed parquet filter, so only two
    years of row groups are scanned; lineitem⨝orders is a shuffle join
    on the natural key (orderkey), which co-partitions with no skew;
    the 90-day lateness predicate needs both sides so it evaluates
    post-join; the final aggregate has 2 groups — partial (map-side)
    aggregation reduces each task's output to ~2 rows before the
    exchange, so the agg shuffle is negligible at any SF."""
    t = tables(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(hi, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~hi, F.lit(1))).alias("low_line_count"),
        )
    )


@query(
    "q_waiting_suppliers",
    oracle="""
    WITH f_li AS (
        SELECT l_orderkey, l_suppkey,
               l_shipdate > o_orderdate + INTERVAL 60 DAY AS is_late
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
    ),
    per_order AS (
        SELECT l_orderkey,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
        FROM f_li
        GROUP BY l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM f_li
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE is_late AND n_supp > 1 AND n_late = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape adapted (no l_commitdate/l_receiptdate: "late"
    means shipped >60 days after the order date): suppliers who were
    the SOLE late supplier on a finished multi-supplier order. The
    classic exists/not-exists pair is re-expressed aggregate-first —
    per-order distinct-supplier and distinct-late-supplier counts, then
    a join back to the late lines — which is the scalable plan: both
    the aggregate and the join key on l_orderkey, so AQE coalesces
    them onto one exchange, and no correlated per-row subquery runs.

    Scale: supplier is broadcast; the self-join of lineitem with its
    own per-order aggregate reuses the orderkey partitioning (one
    shuffle feeds both the aggregate and the join); top-20 with a
    (numwait, s_name) tiebreak is deterministic for the oracle."""
    t = tables(spark, sf_dir)
    f_li = (
        t.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            t.orders.filter(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "is_late")
    )
    per_order = f_li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        f_li.filter(F.col("is_late"))
        .join(
            per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            "l_orderkey",
        )
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "q_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(l_extendedprice / l_quantity) AS supply_cost
        FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part
            WHERE p_type = 'STANDARD' AND p_size <= 5)
        GROUP BY 1, 2
    ), cand AS (
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost,
               min(supply_cost) OVER (PARTITION BY p_partkey) AS best
        FROM ps
        JOIN part     ON partkey = p_partkey
        JOIN supplier ON suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           round(supply_cost, 4) AS supply_cost
    FROM cand
    WHERE supply_cost = best
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape, adapted: the driver schema has no partsupp table
    (FIXTURES.md), so the part-supplier cost relation is derived from
    lineitem as min observed unit price per (partkey, suppkey). For each
    small STANDARD part, find the EUROPE supplier(s) offering the
    minimum cost — the classic correlated-min subquery, expressed as a
    window min instead of a self-join (one pass, no second scan).

    Scale: the part filter is applied as a broadcast semi-join BEFORE
    the (partkey, suppkey) aggregate, so at 100 TB the shuffle carries
    only the selective subset, not every lineitem. All four dimension
    joins broadcast; the only wide exchanges are the aggregate and the
    window repartition on p_partkey (AQE coalesces both at runtime).
    """
    from pyspark.sql.window import Window

    t = tables(spark, sf_dir)
    sel_parts = t.part.filter(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 5)
    )
    ps = (
        t.lineitem.join(
            F.broadcast(sel_parts.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supply_cost"
            )
        )
    )
    cand = (
        ps.join(F.broadcast(sel_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t.region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("best", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("best"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            rnd(F.col("supply_cost"), 4).alias("supply_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q_dominant_part_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               sum(l_quantity) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          AND l_partkey IN (
              SELECT p_partkey FROM part WHERE p_type = 'ECONOMY')
        GROUP BY 1, 2
    ), dominant AS (
        SELECT DISTINCT suppkey FROM (
            SELECT suppkey, qty,
                   sum(qty) OVER (PARTITION BY partkey) AS total
            FROM shipped)
        WHERE qty > 0.5 * total
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (SELECT suppkey FROM dominant)
    ORDER BY s_name
    """,
)
def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape, adapted: without partsupp.ps_availqty the
    "excess stock" predicate becomes a dominance predicate — suppliers
    who shipped more than half of a part's total 1996 volume for any
    ECONOMY part. Preserves Q20's nested structure: part-filter
    semi-join -> per-(part, supplier) aggregate -> correlated comparison
    against a per-part total -> semi-join back to supplier + nation.

    Scale: part filter pushed as a broadcast semi before the aggregate;
    the correlated total is a window sum over the already-aggregated
    (part, supplier) relation (cardinality |parts x suppliers|, tiny
    next to lineitem); the final supplier semi-join broadcasts the
    dominant-supplier set. l_quantity is integral, so sums are exact
    and the 0.5*total threshold has no float-order hazard.
    """
    from pyspark.sql.window import Window

    t = tables(spark, sf_dir)
    eco = t.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    shipped = (
        t.lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(eco), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        shipped.withColumn("total", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.5 * F.col("total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        t.supplier.join(
            F.broadcast(dominant),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Customer spending-tier migration matrix (H1 -> H2)
# --------------------------------------------------------------------------


@query(
    "q_customer_migration_matrix",
    oracle="""
    WITH bounds AS (
        SELECT make_timestamp((epoch_us(min(o_orderdate))
                               + epoch_us(max(o_orderdate))) // 2) AS t_mid
        FROM orders
    ),
    halves AS (
        SELECT o.o_custkey,
               CASE WHEN o.o_orderdate < b.t_mid THEN 1 ELSE 2 END AS half,
               sum(o.o_totalprice) AS spend
        FROM orders o CROSS JOIN bounds b
        GROUP BY 1, 2
    ),
    tiers AS (
        SELECT o_custkey, half,
               ntile(4) OVER (PARTITION BY half
                              ORDER BY spend DESC, o_custkey) AS tier
        FROM halves
    )
    SELECT h1.tier AS tier_h1, h2.tier AS tier_h2,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM tiers h1
    JOIN tiers h2 ON h1.o_custkey = h2.o_custkey
                 AND h1.half = 1 AND h2.half = 2
    GROUP BY 1, 2
    """,
)
def q_customer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer tier migration: spend quartile in the first half of the
    observation window vs the second (ntile per half, spend-desc with
    custkey tiebreak), crossed into the 4x4 movement matrix that
    quantifies upgrades and churn-slides. Scale shape: per-(customer,
    half) spend is one mergeable aggregate; each half's quartiling is
    a user-grain ranked window (range-partitioned sort at 100 TB, the
    corpus_global_shuffle cost class); the migration join runs
    customer-keyed and the output is 16 cells."""
    o = tables(spark, sf_dir).orders
    # o_orderdate is TIMESTAMP_NTZ; UTC session makes the TZ round-trip
    # lossless, and epoch-micros midpoint math matches the oracle exactly
    bounds = o.agg(
        F.timestamp_micros(
            (
                (
                    F.unix_micros(F.min("o_orderdate").cast("timestamp"))
                    + F.unix_micros(F.max("o_orderdate").cast("timestamp"))
                )
                / 2
            ).cast("long")
        )
        .cast("timestamp_ntz")
        .alias("t_mid")
    )
    halves = (
        o.crossJoin(F.broadcast(bounds))
        .groupBy(
            "o_custkey",
            F.when(F.col("o_orderdate") < F.col("t_mid"), 1)
            .otherwise(2)
            .alias("half"),
        )
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    w = Window.partitionBy("half").orderBy(
        F.desc("spend"), F.asc("o_custkey")
    )
    tiers = halves.select(
        "o_custkey", "half", F.ntile(4).over(w).alias("tier")
    )
    h1 = tiers.filter(F.col("half") == 1).select(
        "o_custkey", F.col("tier").alias("tier_h1")
    )
    h2 = tiers.filter(F.col("half") == 2).select(
        "o_custkey", F.col("tier").alias("tier_h2")
    )
    return h1.join(h2, "o_custkey").groupBy("tier_h1", "tier_h2").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# --------------------------------------------------------------------------
# Nation trade balance: one dimension, two join roles
# --------------------------------------------------------------------------


@query(
    "q_nation_trade_balance",
    oracle="""
    WITH flows AS (
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                    AS BIGINT) AS rev_c
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE sn.n_name <> cn.n_name
    ),
    exports AS (
        SELECT supp_nation AS nation, sum(rev_c) AS exports_c
        FROM flows GROUP BY 1
    ),
    imports AS (
        SELECT cust_nation AS nation, sum(rev_c) AS imports_c
        FROM flows GROUP BY 1
    )
    SELECT coalesce(e.nation, i.nation) AS nation,
           round(CAST(coalesce(e.exports_c, 0) AS DOUBLE) / 100.0, 2)
               AS exports,
           round(CAST(coalesce(i.imports_c, 0) AS DOUBLE) / 100.0, 2)
               AS imports,
           round(CAST(coalesce(e.exports_c, 0) - coalesce(i.imports_c, 0)
                      AS DOUBLE) / 100.0, 2) AS trade_balance
    FROM exports e FULL OUTER JOIN imports i ON e.nation = i.nation
    """,
)
def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-border trade balance per nation: revenue where the nation
    SUPPLIES a foreign customer (exports) minus revenue where its
    customers buy from foreign suppliers (imports). The interesting
    plan property is the DUAL-ROLE dimension: `nation` joins the same
    fact flow twice through two different foreign-key paths (supplier
    side and customer side) — both as broadcasts, aliased so Catalyst
    treats them as independent relations (TPC-H Q7 does per-pair
    volume; this is the per-nation net rollup of the same flow tree).
    Scale shape: the two big-big joins (lineitem-orders) are the
    theoretical minimum; dims broadcast; the export/import rollups
    reuse one flows subtree, and the final full-outer join runs on
    |nations| rows."""
    t = tables(spark, sf_dir)
    sn = t.nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = t.nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    flows = (
        t.lineitem.join(
            F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            # exact integer-cents flow (sf1 finding, round 11: raw double
            # sums at sf1's 1e10 magnitudes drifted within the 2-dp round
            # — the Gumbel/Page-Hinkley integer-cents pattern)
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
            )
            .cast("long")
            .alias("rev_c"),
        )
    )
    exports = flows.groupBy(F.col("supp_nation").alias("nation")).agg(
        F.sum("rev_c").alias("exports_c")
    )
    imports = flows.groupBy(F.col("cust_nation").alias("nation")).agg(
        F.sum("rev_c").alias("imports_c")
    )
    exp_c = F.coalesce("exports_c", F.lit(0))
    imp_c = F.coalesce("imports_c", F.lit(0))
    return (
        exports.join(imports, "nation", "full_outer")
        .select(
            "nation",
            rnd(exp_c.cast("double") / 100.0, 2).alias("exports"),
            rnd(imp_c.cast("double") / 100.0, 2).alias("imports"),
            rnd((exp_c - imp_c).cast("double") / 100.0, 2).alias(
                "trade_balance"
            ),
        )
    )


@query(
    "orders_abc_classification",
    oracle="""
    WITH per_part AS (
        SELECT l_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT l_partkey, rev,
               sum(rev) OVER (ORDER BY rev DESC, l_partkey
                              ROWS UNBOUNDED PRECEDING) AS cum_rev,
               sum(rev) OVER () AS total_rev
        FROM per_part
    ),
    classed AS (
        SELECT CASE WHEN cum_rev <= 0.80 * total_rev THEN 'A'
                    WHEN cum_rev <= 0.95 * total_rev THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev, total_rev
        FROM ranked
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           round(sum(rev), 2) AS class_revenue,
           round(sum(rev) / max(total_rev), 4) AS revenue_share
    FROM classed GROUP BY abc_class
    """,
)
def orders_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory classification: parts ranked by revenue,
    class A = parts inside the top 80% of cumulative revenue, B = next
    15%, C = the long tail. The classic ops question — how few SKUs
    carry most of the money — answered as three summary rows.

    Determinism across engines: per-part revenue is rounded to cents
    BEFORE the running sum (cent values are exact in doubles, so the
    cumulative is order-independent), the cumulative frame is pinned by
    (rev DESC, partkey), and the 0.80/0.95 boundaries multiply the same
    exact total on both sides.

    Scale shape: the fact scan aggregates to one row per part first
    (map-side partial sums), so the window sort runs over |parts| rows
    — at 100 TB that is millions, not billions, and a single-reducer
    global running sum over millions of pre-aggregated rows is the
    correct trade for exact class boundaries (the keyed alternative:
    range-partition by rev with one boundary exchange, same two-phase
    trick as any global-order window)."""
    li = tables(spark, sf_dir).lineitem
    per_part = li.groupBy("l_partkey").agg(
        rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("rev")
    )
    w = (
        Window.orderBy(F.desc("rev"), F.asc("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_part.select(
        "rev",
        F.sum("rev").over(w).alias("cum_rev"),
        F.sum("rev").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total_rev"),
    )
    classed = ranked.select(
        F.when(F.col("cum_rev") <= 0.80 * F.col("total_rev"), "A")
        .when(F.col("cum_rev") <= 0.95 * F.col("total_rev"), "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev",
        "total_rev",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        rnd(F.sum("rev"), 2).alias("class_revenue"),
        rnd(F.sum("rev") / F.max("total_rev"), 4).alias("revenue_share"),
    )


@query(
    "q_part_yoy_growth_topk",
    oracle="""
    WITH py AS (
        SELECT l_partkey, CAST(year(l_shipdate) AS INT) AS yr,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS rev
        FROM lineitem GROUP BY l_partkey, year(l_shipdate)
    ),
    j AS (
        SELECT a.l_partkey, a.yr, a.rev, b.rev AS prev_rev
        FROM py a JOIN py b
          ON b.l_partkey = a.l_partkey AND b.yr = a.yr - 1
        WHERE b.rev >= 100.0
    ),
    r AS (
        SELECT l_partkey, yr, rev, prev_rev,
               round(100.0 * (rev - prev_rev) / prev_rev, 4) AS growth_pct,
               row_number() OVER (
                   ORDER BY (rev - prev_rev) / prev_rev DESC, l_partkey, yr
               ) AS rk
        FROM j
    )
    SELECT l_partkey, yr, rev, prev_rev, growth_pct,
           CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 15
    """,
)
def q_part_yoy_growth_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fastest-growing parts: per-part revenue by ship year,
    year-over-year growth against the CONSECUTIVE previous year only
    (self-join on yr-1, not lag() — lag would silently compare across
    gap years when a part skips a year), floored at prev_rev >= 100 so
    near-zero denominators can't launder noise into the top ranks;
    top 15 by growth. Determinism: per-(part, year) revenue is rounded
    to cents before the ratio, so the ranking key is a quotient of
    exact values and both engines order identically.

    Scale shape: the fact table folds to |parts| x |years| rows first;
    the growth self-join runs at that reduced cardinality on the same
    (l_partkey) key — with the pre-aggregate hash-partitioned by part,
    AQE plans it shuffle-free; the final top-15 is a TakeOrdered, not
    a global sort."""
    li = tables(spark, sf_dir).lineitem
    py = li.groupBy(
        "l_partkey", F.year("l_shipdate").cast("int").alias("yr")
    ).agg(
        rnd(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("rev")
    )
    prev = py.select(
        F.col("l_partkey").alias("pk"),
        (F.col("yr") + 1).alias("nyr"),
        F.col("rev").alias("prev_rev"),
    ).filter(F.col("prev_rev") >= 100.0)
    j = py.join(
        prev,
        (F.col("l_partkey") == F.col("pk")) & (F.col("yr") == F.col("nyr")),
    )
    ratio = (F.col("rev") - F.col("prev_rev")) / F.col("prev_rev")
    rk = F.row_number().over(
        Window.orderBy(ratio.desc(), F.asc("l_partkey"), F.asc("yr"))
    )
    return (
        j.select(
            "l_partkey",
            "yr",
            "rev",
            "prev_rev",
            rnd(100.0 * ratio, 4).alias("growth_pct"),
            rk.alias("rk"),
        )
        .filter(F.col("rk") <= 15)
        .select(
            "l_partkey",
            "yr",
            "rev",
            "prev_rev",
            "growth_pct",
            F.col("rk").cast("int").alias("rk"),
        )
    )


@query(
    "orders_ship_latency_quantiles",
    oracle="""
    WITH lat AS (
        SELECT o.o_orderpriority,
               CAST(epoch_us(l.l_shipdate) // 86400000000
                    - epoch_us(o.o_orderdate) // 86400000000 AS BIGINT)
                   AS days,
               l.l_orderkey, l.l_linenumber
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    ranked AS (
        SELECT o_orderpriority, days,
               row_number() OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY days, l_orderkey, l_linenumber) AS rn,
               count(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM lat
    )
    SELECT o_orderpriority,
           CAST(max(n) AS BIGINT) AS n_lines,
           max(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
               THEN days END) AS p50_days,
           max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
               THEN days END) AS p90_days,
           max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
               THEN days END) AS p99_days
    FROM ranked GROUP BY o_orderpriority
    """,
)
def orders_ship_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency SLA readout: discrete p50/p90/p99 of
    (ship day − order day) per order priority — the fulfillment metric
    behind "do URGENT orders actually ship faster?". Day boundaries
    come from integer epoch-day arithmetic (epoch_us // 86400e6), not
    calendar extraction, per the cross-engine timestamp discipline;
    quantiles use the percentile_disc rank rule (element at
    ceil(q·n)), so every reported number is a latency that actually
    occurred.

    Scale shape: one orderkey join (bucketable shuffle-free at 100 TB),
    then ONE per-priority window sort serving all three quantiles via
    rank arithmetic — no holistic percentile buffer, memory O(1) per
    row (same plan discipline as agg_percentile_disc_rank)."""
    t = tables(spark, sf_dir)
    # l_shipdate/o_orderdate are TIMESTAMP_NTZ; the catalog pins the
    # session TZ to UTC, so the cast to TIMESTAMP is instant-preserving
    day = lambda c: (  # noqa: E731
        F.unix_micros(F.col(c).cast("timestamp")) / F.lit(86_400_000_000)
    ).cast("long")
    lat = t.lineitem.join(
        t.orders, t.orders.o_orderkey == t.lineitem.l_orderkey
    ).select(
        "o_orderpriority",
        (day("l_shipdate") - day("o_orderdate")).alias("days"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        "days", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = lat.select(
        "o_orderpriority",
        "days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    def pick(q):
        return F.max(
            F.when(
                F.col("rn")
                == F.ceil(F.lit(q) * F.col("n")).cast("long"),
                F.col("days"),
            )
        )
    return ranked.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_lines"),
        pick(0.5).alias("p50_days"),
        pick(0.9).alias("p90_days"),
        pick(0.99).alias("p99_days"),
    )


@query(
    "q_revenue_concentration_topn_share",
    oracle="""
    WITH per_cust AS (
        SELECT CAST(year(o_orderdate) AS INT) AS yr, o_custkey,
               round(sum(o_totalprice), 2) AS rev
        FROM orders GROUP BY yr, o_custkey
    ),
    ranked AS (
        SELECT yr, rev,
               row_number() OVER (
                   PARTITION BY yr ORDER BY rev DESC, o_custkey) AS rk,
               sum(rev) OVER (PARTITION BY yr) AS total
        FROM per_cust
    )
    SELECT yr,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(max(total), 2) AS total_revenue,
           round(sum(CASE WHEN rk <= 10 THEN rev ELSE 0 END)
                 / max(total), 6) AS top10_share,
           round(sum(CASE WHEN rk <= 100 THEN rev ELSE 0 END)
                 / max(total), 6) AS top100_share
    FROM ranked GROUP BY yr
    """,
)
def q_revenue_concentration_topn_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer revenue concentration TREND: the share of each year's
    revenue carried by its top-10 and top-100 customers. The
    key-account risk metric — rising top-10 share means the business
    (or, in data terms, the join key distribution) is concentrating,
    which is simultaneously an account-management alarm and a skew
    forecast for every customer-keyed shuffle downstream. Complements
    the static global views (agg_hhi_concentration, events_lorenz_
    deciles) with the per-year trajectory.

    Determinism: per-(year, customer) revenue is cents-rounded before
    ranking and the running totals, rank ties break on custkey.
    Scale shape: orders fold to |years| x |customers| first; one
    per-year window sort at that reduced cardinality serves rank and
    total in a single pass; output is one row per year."""
    o = tables(spark, sf_dir).orders
    per_cust = o.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"), "o_custkey"
    ).agg(rnd(F.sum("o_totalprice"), 2).alias("rev"))
    w = Window.partitionBy("yr").orderBy(F.desc("rev"), F.asc("o_custkey"))
    wt = Window.partitionBy("yr")
    ranked = per_cust.select(
        "yr",
        "rev",
        F.row_number().over(w).alias("rk"),
        F.sum("rev").over(wt).alias("total"),
    )
    share = lambda k: rnd(  # noqa: E731
        F.sum(F.when(F.col("rk") <= k, F.col("rev")).otherwise(0.0))
        / F.max("total"),
        6,
    )
    return ranked.groupBy("yr").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        rnd(F.max("total"), 2).alias("total_revenue"),
        share(10).alias("top10_share"),
        share(100).alias("top100_share"),
    )


# --------------------------------------------------------------------------
# Fulfillment mix audit: order-status share per year (count AND value)
# --------------------------------------------------------------------------


@query(
    "q_order_status_mix_yearly",
    oracle="""
    WITH g AS (
        SELECT year(o_orderdate) AS yr, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(o_totalprice) AS value_raw
        FROM orders GROUP BY 1, 2
    ),
    tot AS (
        SELECT yr, sum(n_orders) AS yr_orders, sum(value_raw) AS yr_value
        FROM g GROUP BY yr
    )
    SELECT g.yr AS order_year, g.o_orderstatus AS status, g.n_orders,
           round(g.value_raw, 2) AS total_value,
           round(g.n_orders * 1.0 / tot.yr_orders, 4) AS share_orders,
           round(g.value_raw / tot.yr_value, 4) AS share_value
    FROM g JOIN tot ON tot.yr = g.yr
    """,
)
def q_order_status_mix_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment mix audit: per order-year, each order status's share
    of order COUNT and of booked VALUE side by side. The two shares
    diverging is the actionable signal — open orders carrying an
    outsized value share means big-ticket fulfillment lags, the thing
    a revenue-recognition or ops review asks first. Complements
    q_customer_migration_matrix (which tracks per-customer transitions)
    with the corpus-level mix trend over the one orders column no
    other mix query aggregates.

    Scale shape: one hash aggregate keyed by (year, status) — a
    |years| x 3 frame — then per-year totals derive from IT, not from
    a second orders scan, and the share join is dimension-sized
    (broadcastable). Output is bounded by years x statuses regardless
    of order volume."""
    o = tables(spark, sf_dir).orders
    g = o.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderstatus").alias("status"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("o_totalprice").alias("value_raw"),
    )
    tot = g.groupBy("yr").agg(
        F.sum("n_orders").alias("yr_orders"),
        F.sum("value_raw").alias("yr_value"),
    )
    return g.join(F.broadcast(tot), "yr").select(
        F.col("yr").alias("order_year"),
        "status",
        "n_orders",
        rnd("value_raw", 2).alias("total_value"),
        rnd(F.col("n_orders") / F.col("yr_orders"), 4).alias(
            "share_orders"
        ),
        rnd(F.col("value_raw") / F.col("yr_value"), 4).alias("share_value"),
    )


# --------------------------------------------------------------------------
# Discount elasticity: does a deeper discount actually move quantity?
# --------------------------------------------------------------------------


@query(
    "q_discount_elasticity",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(avg(l.l_quantity), 4) AS avg_qty,
           round(regr_slope(l.l_quantity, l.l_discount), 4)
               AS qty_discount_slope,
           round(corr(l.l_quantity, l.l_discount), 4) AS qty_discount_corr
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    HAVING count(*) >= 3
    """,
)
def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand discount elasticity probe: the OLS slope (and
    correlation) of ordered quantity on discount depth across a
    brand's line items. Pricing teams run exactly this scatter-slope
    before believing a promo drove volume — slope ~0 with deep
    discounts is margin burned for nothing, and the TPC-H generator's
    independence of qty and discount makes near-zero the expected
    honest answer here (the test pins that). Complements
    q_promo_revenue_ratio (revenue share under promo) with the
    response-curve view.

    Scale shape: one part-keyed equi-join (broadcast-sized dimension at
    bench scale; co-partitioned hash join beyond) feeding a single
    brand-keyed aggregate — regr_slope/corr fold map-side into six
    moment counters per brand, no second pass."""
    t = tables(spark, sf_dir)
    j = t.lineitem.select("l_partkey", "l_quantity", "l_discount").join(
        F.broadcast(t.part.select("p_partkey", "p_brand")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.avg("l_quantity").alias("aq"),
            F.regr_slope("l_quantity", "l_discount").alias("sl"),
            F.corr("l_quantity", "l_discount").alias("co"),
        )
        .filter(F.col("n_lines") >= 3)
        .select(
            "p_brand",
            "n_lines",
            rnd("aq", 4).alias("avg_qty"),
            rnd("sl", 4).alias("qty_discount_slope"),
            rnd("co", 4).alias("qty_discount_corr"),
        )
    )


# --------------------------------------------------------------------------
# Month-end loading: is revenue pulled into the last days of the month?
# --------------------------------------------------------------------------

_ME_DAYS = 3  # "month-end" = last 3 calendar days


@query(
    "orders_month_end_loading",
    oracle=f"""
    WITH o AS (
        SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
               o_totalprice,
               CASE WHEN day(o_orderdate)
                         > day(last_day(o_orderdate)) - {_ME_DAYS}
                    THEN 1 ELSE 0 END AS is_me,
               CAST(day(last_day(o_orderdate)) AS INT) AS days_in_month
        FROM orders
    ),
    g AS (
        SELECT yr, mo, max(days_in_month) AS dim,
               CAST(count(*) AS BIGINT) AS n_orders,
               sum(o_totalprice) AS rev,
               sum(o_totalprice * is_me) AS rev_me,
               CAST(sum(is_me) AS BIGINT) AS n_me
        FROM o GROUP BY yr, mo
    )
    SELECT yr AS order_year, CAST(mo AS INT) AS order_month,
           n_orders, n_me,
           round(rev_me / rev, 6) AS month_end_rev_share,
           round({_ME_DAYS}.0 / dim, 6) AS uniform_share,
           round((rev_me / rev) / ({_ME_DAYS}.0 / dim), 4)
               AS loading_ratio
    FROM g
    """,
)
def orders_month_end_loading(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-end loading audit: per calendar month, the share of
    revenue booked in the last 3 days versus the uniform expectation
    (3 / days-in-month), expressed as a loading ratio — the classic
    sales-pull-forward / quota-gaming detector a finance team runs
    (ratio sustained above ~1.2 means deals are being crammed into the
    close; TPC-H's uniform generator makes ~1.0 the honest expected
    answer, which the test pins within noise). last_day() handles
    month lengths and leap February identically in both engines.

    Scale shape: one hash aggregate keyed by (year, month) with four
    map-side-foldable counters — the month-end flag is a row-local
    expression, so no second pass, no join, output bounded by the
    calendar."""
    o = tables(spark, sf_dir).orders
    is_me = (
        F.dayofmonth("o_orderdate")
        > F.dayofmonth(F.last_day("o_orderdate")) - _ME_DAYS
    ).cast("int")
    g = o.select(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        "o_totalprice",
        is_me.alias("is_me"),
        F.dayofmonth(F.last_day("o_orderdate")).cast("int").alias(
            "days_in_month"
        ),
    ).groupBy("yr", "mo").agg(
        F.max("days_in_month").alias("dim"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("o_totalprice").alias("rev"),
        F.sum(F.col("o_totalprice") * F.col("is_me")).alias("rev_me"),
        F.sum("is_me").cast("long").alias("n_me"),
    )
    share = F.col("rev_me") / F.col("rev")
    unif = F.lit(float(_ME_DAYS)) / F.col("dim")
    return g.select(
        F.col("yr").alias("order_year"),
        F.col("mo").cast("int").alias("order_month"),
        "n_orders",
        "n_me",
        rnd(share, 6).alias("month_end_rev_share"),
        rnd(unif, 6).alias("uniform_share"),
        rnd(share / unif, 4).alias("loading_ratio"),
    )


# --------------------------------------------------------------------------
# Composite supplier scorecard (multi-KPI join + rank)
# --------------------------------------------------------------------------

_SCORECARD_TOP = 25


@query(
    "supplier_scorecard_composite",
    oracle=f"""
    WITH kpis AS (
        SELECT l_suppkey AS suppkey,
               count(*) AS n_lines,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                   AS revenue,
               round(avg(l_discount), 6) AS avg_discount,
               round(avg(CASE WHEN l_returnflag = 'R'
                              THEN 1.0 ELSE 0.0 END), 6) AS return_rate
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s.s_name, k.suppkey, CAST(k.n_lines AS BIGINT) AS n_lines,
           k.revenue, k.avg_discount, k.return_rate,
           CAST(rn AS INT) AS revenue_rank
    FROM (
        SELECT *, row_number() OVER (
                   ORDER BY revenue DESC, suppkey) AS rn
        FROM kpis
    ) k
    JOIN supplier s ON s.s_suppkey = k.suppkey
    WHERE rn <= {_SCORECARD_TOP}
    """,
    tags=("tpch",),
)
def supplier_scorecard_composite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Supplier scorecard — the reporting pattern that joins several
    KPIs computed in ONE pass over the fact table: line volume,
    discounted revenue, average discount depth (the margin-give-away
    signal) and return rate
    (returnflag = 'R', [[q_returned_items]]' signal) — then ranks by
    revenue and decorates the top {top} with the supplier dimension.
    The point of the shape: N KPIs cost one scan + one keyed fold when
    expressed as conditional aggregates, not N scans ([[agg_conditional_bools]]
    micro-benchmarks the same trick); a dashboard query that scans per
    KPI is the classic accidental 5x at 100 TB.

    Scale shape: one map-side-partial aggregate at supplier grain, a
    bounded top-{top} sort on supplier-grain rows, one broadcast dim
    join LAST (decorate after ranking so the join touches {top} rows,
    not all suppliers)."""
    t = tables(spark, sf_dir)
    kpis = t.lineitem.groupBy(
        F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        rnd(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        rnd(F.avg("l_discount"), 6).alias("avg_discount"),
        rnd(
            F.avg(
                F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)
            ),
            6,
        ).alias("return_rate"),
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("suppkey"))
    top = (
        kpis.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _SCORECARD_TOP)
    )
    return top.join(
        F.broadcast(
            t.supplier.select(
                F.col("s_suppkey").alias("suppkey"), "s_name"
            )
        ),
        "suppkey",
    ).select(
        "s_name",
        "suppkey",
        "n_lines",
        "revenue",
        "avg_discount",
        "return_rate",
        F.col("rn").cast("int").alias("revenue_rank"),
    )


supplier_scorecard_composite.__doc__ = (
    supplier_scorecard_composite.__doc__.replace(
        "{top}", str(_SCORECARD_TOP)
    )
)


# --------------------------------------------------------------------------
# Basket-size distribution (order width histogram with value overlay)
# --------------------------------------------------------------------------


@query(
    "orders_basket_size_histogram",
    oracle="""
    WITH widths AS (
        SELECT o.o_orderkey, count(l.l_orderkey) AS n_lines,
               any_value(o.o_totalprice) AS price
        FROM orders o
        LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey
    )
    SELECT CAST(n_lines AS INT) AS basket_size,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(price), 4) AS avg_order_value,
           round(count(*) * 1.0 / (SELECT count(*) FROM widths), 6)
               AS share
    FROM widths GROUP BY n_lines
    """,
    tags=("tpch",),
)
def orders_basket_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Basket-size distribution — the merchandising 101 table: how
    many lineitems orders carry (INCLUDING zero-line orders, which the
    LEFT join keeps and an inner join would silently drop — the same
    itemless orders [[eval_reco_holdout_hitrate]] had to exclude), and
    whether wide baskets are worth more (avg order value overlaid per
    width). The share column makes it a probability mass function a
    capacity model consumes directly.

    Scale shape: one fact-side count aggregate keyed by order (the
    join is key-to-key, no fan-out beyond true lines-per-order), one
    histogram fold at basket-size grain, one one-row total broadcast
    for the share."""
    t = tables(spark, sf_dir)
    widths = (
        t.orders.join(
            t.lineitem,
            t.orders["o_orderkey"] == t.lineitem["l_orderkey"],
            "left",
        )
        .groupBy(t.orders["o_orderkey"])
        .agg(
            F.count(t.lineitem["l_orderkey"]).alias("n_lines"),
            F.any_value(F.col("o_totalprice")).alias("price"),
        )
    )
    tot = widths.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        widths.groupBy(F.col("n_lines").cast("int").alias("basket_size"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            rnd(F.avg("price"), 4).alias("avg_order_value"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "basket_size",
            "n_orders",
            "avg_order_value",
            rnd(F.col("n_orders") / F.col("n_total").cast("double"), 6)
            .alias("share"),
        )
    )


# --------------------------------------------------------------------------
# Revenue bridge: price / volume / mix decomposition between years
# --------------------------------------------------------------------------

_BRIDGE_Y0 = 1997
_BRIDGE_Y1 = 1998


@query(
    "q_revenue_bridge_decomposition",
    oracle=f"""
    WITH base AS (
        SELECT p.p_type AS ptype,
               year(o.o_orderdate) AS y,
               sum(l.l_quantity) AS q,
               sum(l.l_extendedprice * (1 - l.l_discount)) AS rev
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE year(o.o_orderdate) IN ({_BRIDGE_Y0}, {_BRIDGE_Y1})
        GROUP BY p.p_type, year(o.o_orderdate)
    ),
    wide AS (
        SELECT ptype,
               max(CASE WHEN y = {_BRIDGE_Y0} THEN q END) AS q0,
               max(CASE WHEN y = {_BRIDGE_Y0} THEN rev END) AS r0,
               max(CASE WHEN y = {_BRIDGE_Y1} THEN q END) AS q1,
               max(CASE WHEN y = {_BRIDGE_Y1} THEN rev END) AS r1
        FROM base GROUP BY ptype
    )
    SELECT ptype,
           round(r0, 2) AS rev_base, round(r1, 2) AS rev_next,
           round((q1 - q0) * (r0 / q0), 2) AS volume_effect,
           round((r1 / q1 - r0 / q0) * q0, 2) AS price_effect,
           round((q1 - q0) * (r1 / q1 - r0 / q0), 2) AS mix_effect,
           round(r1 - r0, 2) AS delta_total
    FROM wide
    WHERE q0 > 0 AND q1 > 0
    """,
    tags=("tpch",),
)
def q_revenue_bridge_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue bridge — the FP&A decomposition that explains a
    year-over-year revenue move as volume effect ((Q1-Q0)·P0), price
    effect ((P1-P0)·Q0) and the interaction/mix term
    ((Q1-Q0)·(P1-P0)), per part type between {y0} and {y1}, where P
    is the realized (discounted) unit price rev/qty. The three
    effects sum EXACTLY to delta_total by construction — the identity
    a finance reviewer checks first, and here it is hash-checked
    across engines rather than asserted ([[q_discount_elasticity]]
    estimates the demand curve; this op explains the realized P&L).
    Types absent in either year are excluded (no bridge exists).

    Scale shape: one fact scan with the year predicate pushed to the
    parquet reader, dims broadcast, a (type, year) fold, then a 6-row
    pivot — the decomposition itself is row-local arithmetic."""
    t = tables(spark, sf_dir)
    base = (
        t.lineitem.join(
            t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"]
        )
        .join(
            F.broadcast(t.part.select("p_partkey", "p_type")),
            t.lineitem["l_partkey"] == F.col("p_partkey"),
        )
        .filter(F.year("o_orderdate").isin(_BRIDGE_Y0, _BRIDGE_Y1))
        .groupBy(
            F.col("p_type").alias("ptype"),
            F.year("o_orderdate").alias("y"),
        )
        .agg(
            F.sum("l_quantity").alias("q"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev"),
        )
    )
    wide = base.groupBy("ptype").agg(
        F.max(F.when(F.col("y") == _BRIDGE_Y0, F.col("q"))).alias("q0"),
        F.max(F.when(F.col("y") == _BRIDGE_Y0, F.col("rev"))).alias("r0"),
        F.max(F.when(F.col("y") == _BRIDGE_Y1, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("y") == _BRIDGE_Y1, F.col("rev"))).alias("r1"),
    )
    p0 = F.col("r0") / F.col("q0")
    p1 = F.col("r1") / F.col("q1")
    return wide.filter((F.col("q0") > 0) & (F.col("q1") > 0)).select(
        "ptype",
        rnd(F.col("r0"), 2).alias("rev_base"),
        rnd(F.col("r1"), 2).alias("rev_next"),
        rnd((F.col("q1") - F.col("q0")) * p0, 2).alias("volume_effect"),
        rnd((p1 - p0) * F.col("q0"), 2).alias("price_effect"),
        rnd((F.col("q1") - F.col("q0")) * (p1 - p0), 2).alias(
            "mix_effect"
        ),
        rnd(F.col("r1") - F.col("r0"), 2).alias("delta_total"),
    )


q_revenue_bridge_decomposition.__doc__ = (
    q_revenue_bridge_decomposition.__doc__
    .replace("{y0}", str(_BRIDGE_Y0))
    .replace("{y1}", str(_BRIDGE_Y1))
)


# --------------------------------------------------------------------------
# Discount-depth bands: pricing leakage waterfall
# --------------------------------------------------------------------------


@query(
    "q_discount_depth_bands",
    oracle="""
    WITH banded AS (
        SELECT CASE WHEN l_discount = 0 THEN '0: none'
                    WHEN l_discount <= 0.03 THEN '1: 1-3%'
                    WHEN l_discount <= 0.06 THEN '2: 4-6%'
                    ELSE '3: 7%+' END AS band,
               l_extendedprice * (1 - l_discount) AS rev,
               l_extendedprice * l_discount AS given_away
        FROM lineitem
    ),
    tot AS (SELECT sum(rev) AS total_rev FROM banded)
    SELECT b.band,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(b.rev), 2) AS revenue,
           round(sum(b.given_away), 2) AS discount_given,
           round(sum(b.rev) / t.total_rev, 6) AS revenue_share,
           round(sum(b.given_away)
                 / (sum(b.rev) + sum(b.given_away)), 6) AS leakage_rate
    FROM banded b, tot t
    GROUP BY b.band, t.total_rev
    """,
    tags=("tpch",),
)
def q_discount_depth_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-depth waterfall — the pricing-leakage table revenue
    teams actually review: lineitems banded by discount depth, each
    band reporting realized revenue, the dollars given away, its
    share of total revenue, and the leakage rate (given-away over
    list). Deep-discount bands carrying a big revenue share is the
    'we buy volume with margin' signal; [[q_discount_elasticity]]
    asks whether the discounts WORK, this op prices what they COST.
    Band edges are the classic 0 / 1-3 / 4-6 / 7+ ladder, labels
    prefixed for deterministic ordering.

    Scale shape: one banded fold (map-side partial, band is row-local
    CASE), a one-row total broadcast for the share — one scan."""
    t = tables(spark, sf_dir)
    band = (
        F.when(F.col("l_discount") == 0, F.lit("0: none"))
        .when(F.col("l_discount") <= 0.03, F.lit("1: 1-3%"))
        .when(F.col("l_discount") <= 0.06, F.lit("2: 4-6%"))
        .otherwise(F.lit("3: 7%+"))
    )
    banded = t.lineitem.select(
        band.alias("band"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "rev"
        ),
        (F.col("l_extendedprice") * F.col("l_discount")).alias(
            "given_away"
        ),
    )
    tot = banded.agg(F.sum("rev").alias("total_rev"))
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum("rev").alias("rev_raw"),
            F.sum("given_away").alias("ga_raw"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n_lines",
            rnd(F.col("rev_raw"), 2).alias("revenue"),
            rnd(F.col("ga_raw"), 2).alias("discount_given"),
            rnd(F.col("rev_raw") / F.col("total_rev"), 6).alias(
                "revenue_share"
            ),
            rnd(
                F.col("ga_raw") / (F.col("rev_raw") + F.col("ga_raw")), 6
            ).alias("leakage_rate"),
        )
    )
