"""Scale-pattern operators: skew mitigation, codec round-trips, the
batch twin of the stateful streaming operator, and more TPC-H-shaped
composites.

These exist for the 100-TB design story as much as for coverage: salting
is the standard fix for hot keys that AQE's skew-join can't always catch
(aggregations, deliberate co-location), and the codec round-trips prove
the NDJSON/CSV wire formats the reference ships (A9 encode — see
/root/reference/streams/client.go:127-154) parse back losslessly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query

N_SALT = 8


@query(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY user_id
    """,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/stateful.py's applyInPandasWithState
    operator: the same per-user accumulation expressed as a grouped
    Pandas UDF. The streaming version's final state after draining all
    batches equals this batch result — which is exactly what the oracle
    checks (the cross-batch accumulation itself is covered by
    tests/test_streaming.py::test_stateful_running_totals_across_batches).
    """
    t = tables(spark, sf_dir)

    def totals(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [len(pdf)],
                "total_value": [float(pdf["value"].sum())],
            }
        )

    out = (
        t.events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandas(totals, "user_id long, n_events long, total_value double")
    )
    return out.select("user_id", "n_events", rnd("total_value", 4).alias("total_value"))


@query(
    "agg_skew_salted",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for hot grouping keys: phase 1
    groups on (key, salt) so a hot key's rows spread over N_SALT
    reducers; phase 2 merges the partials. events.event_type has few
    distinct values — exactly the shape where a single reducer per key
    melts at 100 TB. Same result as the direct groupBy (the oracle IS
    the direct groupBy); sum/count are algebraic so the two-phase split
    is exact."""
    t = tables(spark, sf_dir)
    partial = (
        t.events.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(N_SALT)))
        .groupBy("event_type", "salt")
        .agg(F.count(F.lit(1)).alias("pc"), F.sum("value").alias("ps"))
    )
    return partial.groupBy("event_type").agg(
        F.sum("pc").alias("n_events"), rnd(F.sum("ps"), 4).alias("total_value")
    )


@query(
    "join_skew_salted",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100, 0) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join: the probe (fact) side adds a deterministic
    salt, the build (dim) side explodes each row N_SALT ways, and the
    join key becomes (key, salt) — a hot orderkey's lineitems spread
    over N_SALT partitions instead of one. Join output is identical to
    the unsalted join (every probe row still matches exactly one build
    row); the oracle is the unsalted join. At 100 TB this is the manual
    fallback when AQE skew-join can't split (e.g. bucketed inputs or
    broadcast-ineligible dims)."""
    t = tables(spark, sf_dir)
    li = t.lineitem.select(
        "l_orderkey",
        "l_extendedprice",
        "l_discount",
        F.pmod(F.col("l_linenumber").cast("long"), F.lit(N_SALT)).alias("salt"),
    )
    o = t.orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))).alias("salt"),
    )
    return (
        li.join(o, (F.col("l_orderkey") == F.col("o_orderkey")) & (li.salt == o.salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            # exact integer-cents revenue (sf1 finding, round 11: raw
            # double sums drift within the 2-dp round at sf1 magnitudes)
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
        )
    )


@query(
    "codec_json_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type, value, props FROM events
    """,
)
def codec_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDJSON codec round-trip: serialize each event row to a compact
    JSON line (the reference's wire format — A9,
    /root/reference/streams/client.go:127-154), then parse it back with
    an explicit schema (B2, filebeat json.keys_under_root). The oracle
    is the identity — proving the encode/decode pair is lossless,
    including the nested JSON-in-a-string `props` column. All JVM-side
    (to_json/from_json), no Python in the loop."""
    t = tables(spark, sf_dir)
    line = F.to_json(F.struct("event_id", "user_id", "event_type", "value", "props"))
    parsed = F.from_json(
        F.col("line"),
        "event_id long, user_id long, event_type string, value double, props string",
    )
    return (
        t.events.select(line.alias("line"))
        .select(parsed.alias("e"))
        .select("e.event_id", "e.user_id", "e.event_type", "e.value", "e.props")
    )


#: Spark's CSV codec TRIMS unquoted whitespace by default — a
#: whitespace-only payload silently becomes empty (found by the
#: hypothesis round-trip property). These options make the codec
#: lossless; every engine CSV path must pass them.
CSV_LOSSLESS_OPTS = {
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


@query(
    "codec_csv_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def codec_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV codec round-trip (to_csv -> from_csv with explicit schema):
    the other row-oriented wire format a Firehose->S3->Athena pipeline
    consumes. Identity oracle proves losslessness for the scalar
    columns."""
    t = tables(spark, sf_dir)
    line = F.to_csv(
        F.struct("event_id", "user_id", "event_type", "value"), CSV_LOSSLESS_OPTS
    )
    parsed = F.from_csv(
        F.col("line"),
        F.lit("event_id long, user_id long, event_type string, value double"),
        CSV_LOSSLESS_OPTS,
    )
    return (
        t.events.select(line.alias("line"))
        .select(parsed.alias("e"))
        .select("e.event_id", "e.user_id", "e.event_type", "e.value")
    )


@query(
    "q_market_share",
    oracle="""
    SELECT year(o_orderdate) AS o_year,
           round(sum(CASE WHEN n_name = 'CHINA'
                          THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY year(o_orderdate)
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per order
    year — a 5-table join where every dimension (customer, nation,
    region) broadcasts and only the fact tables shuffle. The region
    filter prunes through two joins before touching lineitem rows."""
    t = tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            rnd(
                F.sum(F.when(F.col("n_name") == "CHINA", rev).otherwise(F.lit(0)))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q_ship_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filtered 3-table join, grouped revenue, top-10 —
    Spark executes the sort+limit as TakeOrderedAndProject (per-partition
    top-k then a driver merge of k*partitions rows, never a full sort).
    Ordering on the ROUNDED revenue with the unique l_orderkey tiebreaker
    keeps the selected set deterministic across engines."""
    t = tables(spark, sf_dir)
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "agg_mode_argmax",
    oracle="""
    SELECT user_id, event_type AS top_event_type, cnt AS n
    FROM (
        SELECT user_id, event_type, count(*) AS cnt,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY count(*) DESC, event_type
               ) AS rn
        FROM events
        GROUP BY user_id, event_type
    )
    WHERE rn = 1
    """,
)
def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key mode (most frequent value, ties broken lexicographically)
    via count + min_by over a (-count, value) ordering struct — two
    map-side-combinable aggregations, no window, no sort. The window
    formulation the oracle uses would shuffle and sort every (key,
    value) pair; min_by reduces map-side."""
    t = tables(spark, sf_dir)
    counts = t.events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.groupBy("user_id").agg(
        F.min_by(
            F.col("event_type"), F.struct(-F.col("cnt"), F.col("event_type"))
        ).alias("top_event_type"),
        F.max("cnt").alias("n"),
    )


@query(
    "window_ntile_cume",
    oracle="""
    SELECT c_custkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/percent_rank/cume_dist)
    over a global ordering with a unique tiebreaker. A single unbounded
    window = one sort; at 100 TB global ntile needs range partitioning
    (Spark plans a single-partition window — use approx percentiles
    instead at that scale, kept here for SQL-surface parity)."""
    t = tables(spark, sf_dir)
    w = Window.orderBy("c_acctbal", "c_custkey")
    return t.customer.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        rnd(F.percent_rank().over(w), 6).alias("pct_rank"),
        rnd(F.cume_dist().over(w), 6).alias("cume"),
    )


FEATURE_SCHEMA = "doc_id bigint, f0 double, f1 double, f2 double, f3 double"


def extract_feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas feature extractor: binary payloads in, fixed-width
    float features out — the batch shape of a real embedding/feature
    model (which would run an ONNX/torch session per Arrow batch here).
    Features are a deterministic function of payload length so the
    DuckDB oracle can recompute them."""
    for pdf in batches:
        n = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "f0": n / 1000.0,
                "f1": (n % 97) / 97.0,
                "f2": (n * 7 % 129) / 129.0,
                "f3": (n * 13 % 251) / 251.0,
            }
        )


@query(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           round(octet_length(encode(text)) / 1000.0, 6) AS f0,
           round((octet_length(encode(text)) % 97) / 97.0, 6) AS f1,
           round((octet_length(encode(text)) * 7 % 129) / 129.0, 6) AS f2,
           round((octet_length(encode(text)) * 13 % 251) / 251.0, 6) AS f3
    FROM documents
    """,
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over opaque binary payloads via mapInPandas —
    the plumbing (binary column in, typed float features out, Arrow
    batches, partition-parallel) is exactly what a production
    image/audio featurizer uses; the feature formula is the
    deterministic stand-in for the missing codec libraries (same policy
    as multimodal_decode)."""
    t = tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    feats = payloads.mapInPandas(extract_feature_batches, schema=FEATURE_SCHEMA)
    return feats.select(
        "doc_id",
        rnd("f0", 6).alias("f0"),
        rnd("f1", 6).alias("f1"),
        rnd("f2", 6).alias("f2"),
        rnd("f3", 6).alias("f3"),
    )


@query(
    "upsert_scd1",
    oracle="""
    SELECT coalesce(u.c_custkey, c.c_custkey) AS c_custkey,
           coalesce(u.new_acctbal, c.c_acctbal) AS acctbal,
           CASE WHEN u.c_custkey IS NOT NULL THEN 1 ELSE 0 END AS updated
    FROM customer c
    FULL OUTER JOIN (
        SELECT c_custkey, round(c_acctbal * 1.1, 2) AS new_acctbal
        FROM customer WHERE c_mktsegment = 'BUILDING'
    ) u ON c.c_custkey = u.c_custkey
    """,
)
def upsert_scd1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-1 upsert (merge-overwrite) expressed as a full outer join +
    coalesce: rows in the update set replace the base values, unmatched
    base rows pass through, brand-new keys insert. This is the engine's
    MERGE INTO — at 100 TB both sides hash-partition on the key, and a
    format with merge support (Delta/Iceberg) turns the same plan into
    a file-level rewrite."""
    t = tables(spark, sf_dir)
    base = t.customer.select("c_custkey", "c_acctbal")
    updates = (
        t.customer.filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            F.col("c_custkey").alias("u_custkey"),
            rnd(F.col("c_acctbal") * 1.1, 2).alias("new_acctbal"),
        )
    )
    return base.join(
        updates, F.col("c_custkey") == F.col("u_custkey"), "full_outer"
    ).select(
        F.coalesce("u_custkey", "c_custkey").alias("c_custkey"),
        F.coalesce("new_acctbal", "c_acctbal").alias("acctbal"),
        F.when(F.col("u_custkey").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("updated"),
    )


@query(
    "lateral_explode_props",
    oracle="""
    SELECT event_id, je.key AS prop_key, je.value AS prop_value
    FROM events,
         LATERAL (SELECT unnest(map_keys(props_map)) AS key,
                         unnest(map_values(props_map)) AS value
                  FROM (SELECT CAST(json(props) AS MAP(VARCHAR, VARCHAR)) AS props_map)) je
    WHERE props IS NOT NULL AND props <> ''
    """,
)
def lateral_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode of the dynamic props map (the reference's
    schema-less MapStr remainder — SURVEY.md §1.2): one output row per
    (event, key). from_json to MAP then explode — the standard pattern
    for promoting semi-structured key/values to rows without a schema
    migration."""
    t = tables(spark, sf_dir)
    m = F.from_json("props", "map<string,string>")
    return (
        t.events.filter(F.col("props").isNotNull() & (F.col("props") != ""))
        .select("event_id", F.explode(m).alias("prop_key", "prop_value"))
    )


@query(
    "q_small_qty_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average)
    decorrelated into an aggregate + join — the rewrite Catalyst and
    every serious optimizer performs. Expressed directly as the
    decorrelated form: one pass computes per-part averages, a broadcast
    join applies the threshold."""
    t = tables(spark, sf_dir)
    part_avg = t.lineitem.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("p_brand") == "Brand#1")
        .join(F.broadcast(part_avg), F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(rnd(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100, 0) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top customers by returned-item revenue — selective
    fact filter, three joins (nation broadcasts), top-20 via
    TakeOrderedAndProject on the rounded measure with a unique key
    tiebreaker."""
    t = tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_returnflag") == "R")
        .join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        # exact integer-cents revenue (sf1 finding, round 11) — also the
        # top-20 ordering key, so grid-exactness keeps the cut stable
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
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "sample_hash_deterministic",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 1) IN ('0', '1', '2')
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed deterministic sampling (~3/16 of rows): rows
    whose key-md5 starts with 0|1|2. Unlike rand()-based sampling this
    is reproducible across engines, runs, and partitionings — the only
    sampling a 100-TB pipeline can debug with (the same rows appear in
    every rerun and on every engine; the RNG-based df.sample cannot be
    oracle-checked at all)."""
    t = tables(spark, sf_dir)
    return t.events.filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1).isin("0", "1", "2")
    ).select("event_id", "user_id", "event_type")


@query(
    "events_funnel",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
               min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        FROM events
        GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(first_view) AS n_viewed,
           count(CASE WHEN first_click > first_view THEN 1 END) AS n_then_clicked,
           count(CASE WHEN first_purchase > first_click
                       AND first_click > first_view THEN 1 END) AS n_completed
    FROM firsts
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): per-user first-touch
    timestamps via conditional min (ONE pass, one shuffle on user_id —
    no self-joins, the naive N-step funnel join is N shuffles), then
    ordering predicates count stage completions."""
    t = tables(spark, sf_dir)
    first = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts")))  # noqa: E731
    firsts = t.events.groupBy("user_id").agg(
        first("click").alias("first_click"),
        first("view").alias("first_view"),
        first("purchase").alias("first_purchase"),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_view").alias("n_viewed"),
        F.count(F.when(F.col("first_click") > F.col("first_view"), F.lit(1))).alias(
            "n_then_clicked"
        ),
        F.count(
            F.when(
                (F.col("first_purchase") > F.col("first_click"))
                & (F.col("first_click") > F.col("first_view")),
                F.lit(1),
            )
        ).alias("n_completed"),
    )


@query(
    "dedup_latest_per_key",
    oracle="""
    WITH r AS (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    )
    SELECT user_id, ts AS last_ts, event_id AS last_event_id,
           event_type AS last_event_type, round(value, 2) AS last_value
    FROM r WHERE rn = 1
    """,
)
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key dedup (the CDC compaction / snapshot-build
    primitive): keep each user's most recent event. Implemented as a
    single struct-max aggregate — mergeable map-side partials, ONE
    shuffle at key cardinality, no window sort over the raw scan (the
    oracle's row_number form is the semantic spec; the extremum is
    identical because event_id breaks ts ties uniquely)."""
    ev = tables(spark, sf_dir).events
    latest = F.max(
        F.struct(F.col("ts"), F.col("event_id"), F.col("event_type"), F.col("value"))
    ).alias("s")
    return ev.groupBy("user_id").agg(latest).select(
        "user_id",
        F.col("s.ts").alias("last_ts"),
        F.col("s.event_id").alias("last_event_id"),
        F.col("s.event_type").alias("last_event_type"),
        rnd(F.col("s.value"), 2).alias("last_value"),
    )


@query(
    "codec_orc_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type, value, props FROM events
    """,
)
def codec_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-format interchange: write the events table to ORC and
    read it back (identity oracle against the parquet source — the
    round trip must be lossless). ORC is the other columnar lake format
    a Spark warehouse exchanges with Hive/Trino; the read path gets the
    same vectorized scan + pushdown treatment as parquet
    (tests/test_sink_parquet.py pins ORC predicate pushdown). The write
    is executor-parallel; the driver only names the directory."""
    from awsbeats_spark.functions.workdirs import work_dir

    t = tables(spark, sf_dir)
    # fixed per-sf path + overwrite: repeated invocations (bench loops)
    # reuse one directory instead of accumulating whole-table copies
    out = work_dir("codec_orc", sf_dir)
    cols = ["event_id", "user_id", "event_type", "value", "props"]
    t.events.select(*cols).write.mode("overwrite").orc(out)
    return spark.read.orc(out).select(*cols)


@query(
    "part_skyline_pareto",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size)
    )
    """,
)
def part_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) query: parts minimizing (price, size) —
    no other part is <= on both dimensions and < on one.

    NOT a quadratic NOT EXISTS on the engine side: the skyline only
    depends on the per-price minimum size, so we (1) hash-aggregate to
    one row per distinct price (big-table work, parallel), (2) compute
    the strictly-cheaper running-min of size with a lag over the
    distinct-price frame — a window over |distinct prices| rows, NOT
    over the table — and (3) broadcast the surviving (price, min size)
    pairs back. A point survives iff its size equals its price-group
    minimum and beats every cheaper group's minimum. At 100 TB the only
    global step is the distinct-price window (bounded by price
    cardinality); everything table-sized is hash-partitioned. The
    oracle keeps the textbook NOT EXISTS formulation as the
    independent (quadratic) definition.
    """
    t = tables(spark, sf_dir)
    grp = t.part.groupBy("p_retailprice").agg(
        F.min("p_size").alias("grp_min_size")
    )
    w = Window.orderBy("p_retailprice").rowsBetween(
        Window.unboundedPreceding, -1
    )
    sky_prices = (
        grp.withColumn("cheaper_min", F.min("grp_min_size").over(w))
        .filter(
            F.col("cheaper_min").isNull()
            | (F.col("grp_min_size") < F.col("cheaper_min"))
        )
        .select(
            F.col("p_retailprice").alias("sky_price"),
            F.col("grp_min_size").alias("sky_size"),
        )
    )
    return (
        t.part.join(
            F.broadcast(sky_prices),
            (F.col("p_retailprice") == F.col("sky_price"))
            & (F.col("p_size") == F.col("sky_size")),
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


_ES_TOPK = 50
_U32 = 4294967296.0  # 2^32


@query(
    "sample_weighted_es",
    oracle=f"""
    WITH keyed AS (
        SELECT o_orderkey, o_totalprice,
               (('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                    ::BIGINT + 0.5) / {_U32} AS u
        FROM orders
        WHERE o_totalprice > 0
    )
    SELECT o_orderkey, o_totalprice,
           round(ln(u) / o_totalprice, 10) AS es_key
    FROM keyed
    ORDER BY es_key DESC, o_orderkey
    LIMIT {_ES_TOPK}
    """,
)
def sample_weighted_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis-Spirakis: each
    row draws u from a content-addressed uniform (md5 of its key — the
    same row wins on every engine, rerun, and partitioning) and the
    top-k by ln(u)/w are the sample. This is THE distributed weighted
    sampler: no sequential pass, no rejection loop, and the top-k is a
    per-partition heap + driver merge (TakeOrderedAndProject), so a
    100-TB weighted draw costs one scan and k rows of traffic.

    P(i in sample) follows sequential weighted draws w/o replacement;
    ln(u)/w ordering is the standard log-space form of u^(1/w)."""
    t = tables(spark, sf_dir)
    u = (
        F.conv(
            F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 0.5
    ) / _U32
    return (
        t.orders.filter(F.col("o_totalprice") > 0)
        .select(
            "o_orderkey",
            "o_totalprice",
            rnd(F.log(u) / F.col("o_totalprice"), 10).alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "o_orderkey")
        .limit(_ES_TOPK)
    )


_KMV_K = 8


@query(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH hashed AS (
        SELECT DISTINCT event_type,
               (('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    ::BIGINT + 0.5) / {_U32} AS u
        FROM events
    ),
    ranked AS (
        SELECT event_type, u,
               row_number() OVER (PARTITION BY event_type ORDER BY u) AS rk,
               count(*) OVER (PARTITION BY event_type) AS n_exact
        FROM hashed
    )
    SELECT event_type,
           CAST(max(n_exact) AS BIGINT) AS n_exact,
           round(max(CASE WHEN rk = {_KMV_K} THEN u END), 8) AS kth_u,
           round(CASE WHEN max(n_exact) >= {_KMV_K}
                      THEN ({_KMV_K} - 1)
                           / max(CASE WHEN rk = {_KMV_K} THEN u END)
                      ELSE max(n_exact) END, 2) AS est_distinct
    FROM ranked
    GROUP BY event_type
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch, built by hand (k=8): hash each
    user to a content-addressed uniform, keep the k smallest per group,
    estimate |distinct| = (k-1)/u_(k) — THE mergeable-summary
    construction behind theta sketches, shown against the exact count
    so the estimate is auditable. Unlike approx_count_distinct's opaque
    HLL this sketch is mergeable BY UNION OF ROWS (min-k of a union =
    min-k of min-k's), which is what incremental/rollup pipelines need.

    Scale shape: one distinct aggregate at (type, user) cardinality,
    then per-group windows over the distinct-hash rows; at 100 TB the
    windowed input per group is the distinct-user set — flip the
    row_number selection to an `approx`-style partial min-k aggregate
    when groups get huge (same sketch, same estimator)."""
    t = tables(spark, sf_dir)
    u = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 0.5
    ) / _U32
    hashed = (
        t.events.select("event_type", u.alias("u")).distinct()
    )
    wrk = Window.partitionBy("event_type").orderBy("u")
    wall = Window.partitionBy("event_type")
    ranked = hashed.select(
        "event_type",
        "u",
        F.row_number().over(wrk).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("n_exact"),
    )
    kth = F.max(F.when(F.col("rk") == _KMV_K, F.col("u")))
    n_exact = F.max("n_exact")
    return ranked.groupBy("event_type").agg(
        n_exact.cast("long").alias("n_exact"),
        rnd(kth, 8).alias("kth_u"),
        rnd(
            F.when(n_exact >= _KMV_K, (_KMV_K - 1) / kth).otherwise(
                n_exact.cast("double")
            ),
            2,
        ).alias("est_distinct"),
    )


_ASSOC_TOPN = 20


@query(
    "events_assoc_rules",
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type
        FROM events
    ),
    nb AS (SELECT count(DISTINCT (user_id, day)) AS n FROM baskets),
    singles AS (
        SELECT event_type, count(*) AS c FROM baskets GROUP BY 1
    ),
    pairs AS (
        SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS cab
        FROM baskets a
        JOIN baskets b ON a.user_id = b.user_id AND a.day = b.day
                      AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT ta, tb, CAST(cab AS BIGINT) AS n_baskets_both,
           round(cab * 1.0 / nb.n, 6) AS support,
           round(cab * 1.0 / sa.c, 6) AS conf_a_to_b,
           round(cab * 1.0 / sb.c, 6) AS conf_b_to_a,
           round(cab * 1.0 * nb.n / (sa.c * sb.c), 4) AS lift
    FROM pairs
    JOIN singles sa ON sa.event_type = ta
    JOIN singles sb ON sb.event_type = tb
    CROSS JOIN nb
    ORDER BY lift DESC, ta, tb
    LIMIT {_ASSOC_TOPN}
    """,
)
def events_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over (user, day) baskets: support, both
    confidences, and lift for every co-occurring event-type pair —
    market-basket analysis, the 'users who error also repurchase?'
    query. Lift > 1 = positive association.

    Scale shape: baskets are ONE distinct aggregate; the pair self-join
    keys on the basket id, so fan-out is bounded by types-per-basket
    (never all-pairs of users); singles and the basket count broadcast
    back. At 100 TB everything after the basket aggregate is
    vocabulary-sized."""
    t = tables(spark, sf_dir)
    baskets = t.events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    ).distinct()
    nb = baskets.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n")
    )
    singles = baskets.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    b = baskets.select(
        F.col("user_id").alias("u2"),
        F.col("day").alias("d2"),
        F.col("event_type").alias("tb"),
    )
    pairs = (
        baskets.join(
            b,
            (F.col("user_id") == F.col("u2"))
            & (F.col("day") == F.col("d2"))
            & (F.col("event_type") < F.col("tb")),
        )
        .groupBy(F.col("event_type").alias("ta"), "tb")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    sa = singles.select(F.col("event_type").alias("ta"), F.col("c").alias("ca"))
    sb = singles.select(F.col("event_type").alias("tb"), F.col("c").alias("cb"))
    return (
        pairs.join(F.broadcast(sa), "ta")
        .join(F.broadcast(sb), "tb")
        .crossJoin(F.broadcast(nb))
        .select(
            "ta",
            "tb",
            F.col("cab").alias("n_baskets_both"),
            rnd(F.col("cab") * 1.0 / F.col("n"), 6).alias("support"),
            rnd(F.col("cab") * 1.0 / F.col("ca"), 6).alias("conf_a_to_b"),
            rnd(F.col("cab") * 1.0 / F.col("cb"), 6).alias("conf_b_to_a"),
            rnd(F.col("cab") * 1.0 * F.col("n") / (F.col("ca") * F.col("cb")), 4).alias(
                "lift"
            ),
        )
        .orderBy(F.desc("lift"), "ta", "tb")
        .limit(_ASSOC_TOPN)
    )


_TRIM_Q = 0.05  # symmetric 5% winsorization bounds


@query(
    "agg_winsorized_mean",
    oracle=f"""
    WITH bounds AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, {_TRIM_Q}) AS lo,
               quantile_cont(l_extendedprice, {1 - _TRIM_Q}) AS hi
        FROM lineitem GROUP BY 1
    )
    SELECT l.l_returnflag,
           count(*) AS n_rows,
           round(avg(l.l_extendedprice), 4) AS raw_mean,
           round(avg(least(greatest(l.l_extendedprice, b.lo), b.hi)), 4)
               AS winsorized_mean,
           round(avg(CASE WHEN l.l_extendedprice >= b.lo
                           AND l.l_extendedprice <= b.hi
                          THEN l.l_extendedprice END), 4) AS trimmed_mean
    FROM lineitem l JOIN bounds b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group means: winsorized (values clamped to the 5%/95%
    quantiles) and trimmed (values outside dropped) next to the raw
    mean — the outlier-resistant aggregates metric pipelines switch to
    when a single fat-fingered row moves the daily average. Quantile
    bounds per group are a small aggregate broadcast back over ONE
    re-scan; the clamp itself is a codegen'd expression.

    Scale shape: two passes over the fact (bounds, then clamp+avg) —
    the unavoidable minimum for exact quantile bounds; with
    approx_percentile the first pass becomes single-exchange mergeable
    at 100 TB, same second pass."""
    li = tables(spark, sf_dir).lineitem
    bounds = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(_TRIM_Q)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(1 - _TRIM_Q)).alias("hi"),
    )
    joined = li.join(F.broadcast(bounds), "l_returnflag")
    clamped = F.least(
        F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")
    )
    inside = F.col("l_extendedprice").between(F.col("lo"), F.col("hi"))
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        rnd(F.avg("l_extendedprice"), 4).alias("raw_mean"),
        rnd(F.avg(clamped), 4).alias("winsorized_mean"),
        rnd(F.avg(F.when(inside, F.col("l_extendedprice"))), 4).alias(
            "trimmed_mean"
        ),
    )


# --------------------------------------------------------------------------
# Hand-rolled Count-Min sketch: frequency estimates for heavy keys
# --------------------------------------------------------------------------

_CM_DEPTH = 3
_CM_WIDTH = 64


def _cm_cell_sql(d: int) -> str:
    return (
        f"CAST(('0x' || substring(md5('{d}:' || CAST(user_id AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {_CM_WIDTH}"
    )


@query(
    "sketch_countmin_user_freq",
    oracle=f"""
    WITH cells AS (
        SELECT d.d AS depth, CAST(count(*) AS BIGINT) AS cnt,
               CASE d.d
                   WHEN 0 THEN {_cm_cell_sql(0)}
                   WHEN 1 THEN {_cm_cell_sql(1)}
                   ELSE {_cm_cell_sql(2)}
               END AS cell
        FROM events CROSS JOIN (SELECT unnest([0, 1, 2]) AS d) d
        GROUP BY 1, 3
    ),
    top_users AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
        FROM events GROUP BY 1
        ORDER BY count(*) DESC, user_id LIMIT 10
    )
    SELECT t.user_id, t.true_count,
           CAST(min(c.cnt) AS BIGINT) AS cm_estimate
    FROM top_users t
    JOIN cells c
      ON c.cell = CASE c.depth
                      WHEN 0 THEN CAST(('0x' || substring(md5('0:' || CAST(t.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {_CM_WIDTH}
                      WHEN 1 THEN CAST(('0x' || substring(md5('1:' || CAST(t.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {_CM_WIDTH}
                      ELSE CAST(('0x' || substring(md5('2:' || CAST(t.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {_CM_WIDTH}
                  END
    GROUP BY t.user_id, t.true_count
    """,
)
def sketch_countmin_user_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled Count-Min sketch (depth 3 x width 64, md5 row
    hashes): build the counter grid as ONE mergeable (depth, cell)
    aggregate — 192 cells total regardless of input size — then report
    min-over-rows estimates vs true counts for the top-10 users. The
    sketch aggregate is the 100-TB path: constant-size state, map-side
    partials, one tiny shuffle; the exact top-10 comparison side exists
    to expose the estimation error and would be dropped (or sampled) at
    scale. Overestimate-only by construction (est >= true)."""
    ev = tables(spark, sf_dir).events
    depths = spark.range(_CM_DEPTH).select(F.col("id").cast("int").alias("depth"))

    def cell_for(depth_col, user_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            depth_col.cast("string"),
                            F.lit(":"),
                            user_col.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _CM_WIDTH
        )

    cells = (
        ev.crossJoin(F.broadcast(depths))
        .groupBy("depth", cell_for(F.col("depth"), F.col("user_id")).alias("cell"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top_users = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.asc("user_id"))
        .limit(10)
    )
    probes = top_users.crossJoin(F.broadcast(depths)).select(
        "user_id",
        "true_count",
        "depth",
        cell_for(F.col("depth"), F.col("user_id")).alias("cell"),
    )
    return (
        probes.join(F.broadcast(cells), ["depth", "cell"])
        .groupBy("user_id", "true_count")
        .agg(F.min("cnt").alias("cm_estimate"))
    )


# --------------------------------------------------------------------------
# Hand-rolled Bloom filter membership probe
# --------------------------------------------------------------------------

_BLOOM_BITS = 4096
_BLOOM_HASHES = 4


def _bloom_pos_sql(k: int, key: str) -> str:
    return (
        f"CAST(('0x' || substring(md5('{k}:' || CAST({key} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {_BLOOM_BITS}"
    )


@query(
    "sketch_bloom_membership",
    oracle=f"""
    WITH bits AS (
        SELECT DISTINCT CASE k.k
            WHEN 0 THEN {_bloom_pos_sql(0, "c_custkey")}
            WHEN 1 THEN {_bloom_pos_sql(1, "c_custkey")}
            WHEN 2 THEN {_bloom_pos_sql(2, "c_custkey")}
            ELSE {_bloom_pos_sql(3, "c_custkey")}
        END AS pos
        FROM customer
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
        WHERE c_mktsegment = 'BUILDING'
    ),
    probe AS (
        SELECT o.o_orderkey, o.o_custkey,
               CAST(count(*) AS BIGINT) AS n_hits,
               CAST(max(CASE WHEN c.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
                    AS INT) AS is_member
        FROM orders o
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
        LEFT JOIN bits b
          ON b.pos = CASE k.k
                 WHEN 0 THEN {_bloom_pos_sql(0, "o_custkey")}
                 WHEN 1 THEN {_bloom_pos_sql(1, "o_custkey")}
                 WHEN 2 THEN {_bloom_pos_sql(2, "o_custkey")}
                 ELSE {_bloom_pos_sql(3, "o_custkey")}
             END
        LEFT JOIN (SELECT c_custkey FROM customer
                   WHERE c_mktsegment = 'BUILDING') c
          ON o.o_custkey = c.c_custkey
        GROUP BY o.o_orderkey, o.o_custkey
        HAVING count(b.pos) = {_BLOOM_HASHES}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_bloom_pass,
           CAST(sum(is_member) AS BIGINT) AS n_true_members,
           CAST(count(*) - sum(is_member) AS BIGINT) AS n_false_positives
    FROM probe
    """,
)
def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-rolled Bloom filter (4096 bits, 4 md5-derived hash
    positions): the BUILDING-segment customer keys set their bit
    positions; every order probes all 4 positions and passes only when
    all are set. Reports pass count, true members, and false
    positives — the probe-side pre-filter that would prune a 100-TB
    fact BEFORE its join shuffle. Scale shape: the bit set is a
    DISTINCT aggregate of the small dim (≤4096 rows), broadcast into
    the probe; the fact is scanned once, never shuffled; the exact
    membership check (for FP accounting) is a broadcast join against
    the same small dim."""
    t = tables(spark, sf_dir)
    building = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    ks = spark.range(_BLOOM_HASHES).select(F.col("id").cast("int").alias("k"))

    def pos_for(k_col, key_col):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            k_col.cast("string"),
                            F.lit(":"),
                            key_col.cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % _BLOOM_BITS
        )

    bits = (
        building.crossJoin(F.broadcast(ks))
        .select(pos_for(F.col("k"), F.col("c_custkey")).alias("pos"))
        .distinct()
    )
    probe = (
        t.orders.crossJoin(F.broadcast(ks))
        .withColumn("pos", pos_for(F.col("k"), F.col("o_custkey")))
        .join(F.broadcast(bits), "pos", "left_semi")
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") == _BLOOM_HASHES)
    )
    members = building.select(
        F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("is_m")
    )
    flagged = probe.join(F.broadcast(members), "o_custkey", "left")
    return flagged.agg(
        F.count(F.lit(1)).alias("n_bloom_pass"),
        F.sum(F.coalesce("is_m", F.lit(0))).cast("long").alias("n_true_members"),
        (F.count(F.lit(1)) - F.sum(F.coalesce("is_m", F.lit(0))))
        .cast("long")
        .alias("n_false_positives"),
    )


# --------------------------------------------------------------------------
# Bucketed co-located join: the layout that deletes the join shuffle
# --------------------------------------------------------------------------

_BUCKETS = 8


@query(
    "join_bucketed_noshuffle",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100, 0) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderstatus
    """,
)
def join_bucketed_noshuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing: both join sides are (re)written as
    managed tables bucketed 8 ways on the join key, then joined and
    aggregated THROUGH the catalog — the layout hash-places matching
    rows in matching files, so the join and the bucket-key groupBy run
    with ZERO shuffle of either fact table (the physical-plan property
    is pinned by tests/test_bucketed_join.py and the bucketed-plan test
    for this key). At 100 TB this is the storage decision that turns an
    every-query 100 TB network shuffle into a one-time layout cost paid
    at ingest — exactly how warehouse fact tables co-locate with their
    largest dimension. The oracle is the plain join: bucketing must
    never change results, only movement. Table names carry an sf tag so
    concurrent scale factors don't clobber each other; mode=overwrite
    keeps repeated runs (bench loops) idempotent."""
    import hashlib

    from awsbeats_spark.sinks.bucketed import read_table, write_bucketed

    t = tables(spark, sf_dir)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    ot, lt = f"b4_orders_{tag}", f"b4_lineitem_{tag}"
    write_bucketed(
        t.orders.select("o_orderkey", "o_orderstatus"),
        ot,
        "o_orderkey",
        buckets=_BUCKETS,
    )
    write_bucketed(
        t.lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_extendedprice",
            "l_discount",
        ),
        lt,
        "o_orderkey",
        buckets=_BUCKETS,
    )
    o, li = read_table(spark, ot), read_table(spark, lt)
    # exact integer-cents revenue (sf1 finding, round 11: raw double sums
    # drift within the 2-dp round at sf1 magnitudes — the
    # q_nation_trade_balance integer-cents pattern)
    rev_c = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5
    )
    return (
        o.join(li, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rnd(F.sum(rev_c).cast("double") / 100.0, 2).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# CSV interchange with hostile content (quotes, delimiters, newlines)
# --------------------------------------------------------------------------


@query(
    "codec_csv_quoted_roundtrip",
    oracle="""
    SELECT doc_id,
           text,
           CAST(length(text) AS BIGINT) AS n_chars
    FROM documents
    """,
)
def codec_csv_quoted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV interchange under hostile content: free text containing
    commas, double quotes, and embedded newlines is written quoted-and-
    escaped and read back with multiLine parsing — the identity oracle
    proves the round trip is byte-lossless. This is the edge matrix
    codec_csv_roundtrip (flat numeric events) doesn't touch and the one
    that silently corrupts data lakes: an unquoted writer splits rows
    at embedded newlines and the reader sees phantom records. The
    escape character is set to the RFC 4180 doubled-quote convention so
    third-party readers (DuckDB, pandas, Excel) agree. Scale note:
    multiLine CSV is NOT splittable (a reader can't start mid-file
    inside a quoted field) — each file parses whole, so write many
    moderate files (executor-parallel here) rather than one giant one;
    columnar formats remain the real answer at 100 TB, which is why
    this op exists as the interchange path, not the storage path."""
    from awsbeats_spark.functions.workdirs import work_dir

    t = tables(spark, sf_dir)
    out = work_dir("codec_csv_quoted", sf_dir)
    cols = ["doc_id", "text"]
    (
        t.documents.select(*cols)
        .write.mode("overwrite")
        .options(header=True, quoteAll=True, escape='"')
        .csv(out)
    )
    back = (
        spark.read.options(
            header=True, multiLine=True, quote='"', escape='"'
        )
        .schema("doc_id long, text string")
        .csv(out)
    )
    # empty string round-trips as null in CSV (no quoted-empty marker
    # survives quoteAll+escape reliably across readers) — normalize
    return back.select(
        "doc_id",
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long").alias(
            "n_chars"
        ),
    )


@query(
    "codec_csv_corrupt_permissive",
    oracle="""
    SELECT event_type,
           CAST(count(*) FILTER (event_id % 7 <> 3) AS BIGINT) AS n_good,
           CAST(count(*) FILTER (event_id % 7 = 3) AS BIGINT) AS n_corrupt,
           round(sum(value) FILTER (event_id % 7 <> 3), 2) AS sum_value_good
    FROM events
    GROUP BY event_type
    """,
)
def codec_csv_corrupt_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record quarantine on CSV ingest: a replica of events is
    serialized with a deterministic fraction of rows damaged (the value
    field replaced by a non-numeric token for event_id % 7 == 3), then
    read back under PERMISSIVE mode with columnNameOfCorruptRecord —
    damaged rows parse to null value and surface the raw line in the
    corrupt column instead of killing the job (FAILFAST) or silently
    vanishing (DROPMALFORMED). The operator reports, per event_type,
    how many rows survived, how many were quarantined, and the sum over
    the survivors — the reconciliation numbers an ingest gate publishes
    before promoting a load. The oracle recomputes all three from the
    clean source, so the parse-and-quarantine path is hash-checked
    end-to-end (doubles round-trip CSV exactly via shortest-repr).

    Scale shape: header-less single-line CSV stays splittable, the
    write/read is executor-parallel, and the readback aggregates
    map-side to one row per event_type."""
    from awsbeats_spark.functions.workdirs import work_dir

    t = tables(spark, sf_dir)
    out = work_dir("codec_csv_corrupt", sf_dir)
    damaged = t.events.select(
        "event_id",
        "event_type",
        F.when(F.col("event_id") % 7 == 3, F.lit("__NOT_A_NUMBER__"))
        .otherwise(F.col("value").cast("string"))
        .alias("value"),
    )
    damaged.write.mode("overwrite").options(header=False).csv(out)
    back = (
        spark.read.options(header=False, mode="PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(
            "event_id long, event_type string, value double,"
            " _corrupt string"
        )
        .csv(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1))
        .cast("long")
        .alias("n_good"),
        F.count(F.when(F.col("_corrupt").isNotNull(), 1))
        .cast("long")
        .alias("n_corrupt"),
        rnd(F.sum(F.when(F.col("_corrupt").isNull(), F.col("value"))), 2)
        .alias("sum_value_good"),
    )


@query(
    "events_funnel_windowed",
    oracle="""
    WITH fv AS (
        SELECT user_id, min(ts) AS fv FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    fc AS (
        SELECT e.user_id, min(e.ts) AS fc
        FROM events e JOIN fv ON fv.user_id = e.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) > epoch_us(fv.fv)
          AND epoch_us(e.ts) <= epoch_us(fv.fv) + 3600000000::BIGINT
        GROUP BY e.user_id
    ),
    fp AS (
        SELECT e.user_id, min(e.ts) AS fp
        FROM events e JOIN fc ON fc.user_id = e.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) > epoch_us(fc.fc)
          AND epoch_us(e.ts) <= epoch_us(fc.fc) + 86400000000::BIGINT
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM fv) AS n_viewed,
           (SELECT CAST(count(*) AS BIGINT) FROM fc) AS n_clicked_1h,
           (SELECT CAST(count(*) AS BIGINT) FROM fp) AS n_purchased_24h,
           round((SELECT count(*) FROM fc)
                 / nullif(CAST((SELECT count(*) FROM fv) AS DOUBLE), 0), 6)
               AS click_rate,
           round((SELECT count(*) FROM fp)
                 / nullif(CAST((SELECT count(*) FROM fc) AS DOUBLE), 0), 6)
               AS purchase_rate
    """,
)
def events_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-CONSTRAINED funnel: view -> click within 1 hour -> purchase
    within 24 hours of that click, each step anchored at the user's
    FIRST qualifying event. The unconstrained funnel (events_funnel)
    answers "did they ever"; product analytics almost always asks "did
    they within the window" — without the constraint, a purchase three
    weeks after an unrelated click inflates conversion. Boundaries
    compare microsecond epochs (unix_micros / epoch_us) so sub-second
    timestamps cannot straddle a second-truncation differently across
    engines.

    Scale shape: three chained user-keyed aggregations, each one
    shuffle on user_id with map-side min partials; step N's survivor
    set (shrinking) joins back to the event log, never to itself. No
    window over the full log, no per-user event collection."""
    ev = tables(spark, sf_dir).events
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fv"))
    )
    fc = (
        ev.filter(F.col("event_type") == "click")
        .join(fv, "user_id")
        .filter(
            (us("ts") > us("fv"))
            & (us("ts") <= us("fv") + F.lit(3_600_000_000))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("fc"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fc, "user_id")
        .filter(
            (us("ts") > us("fc"))
            & (us("ts") <= us("fc") + F.lit(86_400_000_000))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("fp"))
    )
    counts = (
        fv.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(fc.agg(F.count(F.lit(1)).alias("n_clicked_1h")))
        .crossJoin(fp.agg(F.count(F.lit(1)).alias("n_purchased_24h")))
    )
    return counts.select(
        F.col("n_viewed").cast("long").alias("n_viewed"),
        F.col("n_clicked_1h").cast("long").alias("n_clicked_1h"),
        F.col("n_purchased_24h").cast("long").alias("n_purchased_24h"),
        rnd(
            F.col("n_clicked_1h")
            / F.nullif(F.col("n_viewed").cast("double"), F.lit(0.0)),
            6,
        ).alias("click_rate"),
        rnd(
            F.col("n_purchased_24h")
            / F.nullif(F.col("n_clicked_1h").cast("double"), F.lit(0.0)),
            6,
        ).alias("purchase_rate"),
    )


@query(
    "sketch_kmv_set_ops",
    oracle=f"""
    WITH flags AS (
        SELECT user_id,
               bool_or(event_type = 'click') AS in_a,
               bool_or(event_type = 'view') AS in_b
        FROM events WHERE event_type IN ('click', 'view')
        GROUP BY user_id
    ),
    hashed AS (
        SELECT (('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    ::BIGINT + 0.5) / {_U32} AS u,
               in_a, in_b
        FROM flags
    ),
    ranked AS (
        SELECT u, in_a, in_b, row_number() OVER (ORDER BY u) AS rk
        FROM hashed
    ),
    agg AS (
        SELECT count(*) AS n_union,
               count(*) FILTER (in_a AND in_b) AS n_intersect,
               max(CASE WHEN rk = {_KMV_K} THEN u END) AS uk,
               count(*) FILTER (rk <= {_KMV_K} AND in_a AND in_b) AS k_both
        FROM ranked
    )
    SELECT CAST(n_union AS BIGINT) AS exact_union,
           CAST(n_intersect AS BIGINT) AS exact_intersect,
           round(CASE WHEN n_union >= {_KMV_K}
                      THEN ({_KMV_K} - 1) / uk
                      ELSE CAST(n_union AS DOUBLE) END, 2) AS est_union,
           round(CASE WHEN n_union >= {_KMV_K}
                      THEN (k_both / {_KMV_K}.0) * (({_KMV_K} - 1) / uk)
                      ELSE CAST(n_intersect AS DOUBLE) END, 2)
               AS est_intersect,
           round(CASE WHEN n_union >= {_KMV_K}
                      THEN k_both / {_KMV_K}.0
                      ELSE n_intersect / CAST(n_union AS DOUBLE) END, 6)
               AS jaccard_est,
           round(n_intersect / CAST(n_union AS DOUBLE), 6) AS jaccard_exact
    FROM agg
    """,
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET ALGEBRA — the reason to pick KMV over HLL: the
    k smallest hashes of A ∪ B are computable from the two sketches
    alone, and the fraction of that union sketch belonging to both sets
    estimates Jaccard, so |A ∩ B| ≈ ρ·|A ∪ B| without ever comparing
    memberships at scale. Audiences here are click-users vs view-users;
    exact union/intersection ride along so the estimate is auditable
    (the honesty-eval discipline), and the content-addressed md5
    uniform makes the whole construction deterministic — the estimate
    itself is hash-checked, not just bounded.

    Scale shape: one (user)-keyed aggregate with two bool_or partials,
    then a single global min-k window over DISTINCT-user rows (at
    100 TB: replace with a partial min-k aggregate — min-k of a union
    is the min-k of min-k's, so executors merge k-row states)."""
    t = tables(spark, sf_dir)
    flags = (
        t.events.filter(F.col("event_type").isin("click", "view"))
        .groupBy("user_id")
        .agg(
            F.bool_or(F.col("event_type") == "click").alias("in_a"),
            F.bool_or(F.col("event_type") == "view").alias("in_b"),
        )
    )
    u = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        + 0.5
    ) / _U32
    ranked = flags.select(
        u.alias("u"), "in_a", "in_b"
    ).withColumn("rk", F.row_number().over(Window.orderBy("u")))
    both = F.col("in_a") & F.col("in_b")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.count(F.when(both, 1)).alias("n_intersect"),
        F.max(F.when(F.col("rk") == _KMV_K, F.col("u"))).alias("uk"),
        F.count(F.when((F.col("rk") <= _KMV_K) & both, 1)).alias("k_both"),
    )
    n_u, n_i = F.col("n_union"), F.col("n_intersect")
    est_u = (_KMV_K - 1) / F.col("uk")
    rho = F.col("k_both") / float(_KMV_K)
    big = n_u >= _KMV_K
    return agg.select(
        n_u.cast("long").alias("exact_union"),
        n_i.cast("long").alias("exact_intersect"),
        rnd(F.when(big, est_u).otherwise(n_u.cast("double")), 2).alias(
            "est_union"
        ),
        rnd(
            F.when(big, rho * est_u).otherwise(n_i.cast("double")), 2
        ).alias("est_intersect"),
        rnd(
            F.when(big, rho).otherwise(n_i / n_u.cast("double")), 6
        ).alias("jaccard_est"),
        rnd(n_i / n_u.cast("double"), 6).alias("jaccard_exact"),
    )


# --------------------------------------------------------------------------
# Manual HyperLogLog with content-addressed registers (hash-checkable)
# --------------------------------------------------------------------------

_HLL_M = 64  # registers
_HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al. 2007)


@query(
    "sketch_hll_manual_registers",
    oracle=f"""
    WITH hashed AS (
        SELECT DISTINCT event_type,
               ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT AS x
        FROM events
    ),
    el AS (
        SELECT event_type, x % {_HLL_M} AS j, x // {_HLL_M} AS w
        FROM hashed
    ),
    regs AS (
        SELECT event_type, j,
               max(CASE WHEN w = 0 THEN 27
                        ELSE 26 - CAST(floor(log2(w)) AS INT) END) AS r
        FROM el GROUP BY event_type, j
    ),
    grid AS (
        SELECT t.event_type, g.j, coalesce(regs.r, 0) AS r
        FROM (SELECT DISTINCT event_type FROM hashed) t
        CROSS JOIN (SELECT unnest(generate_series(0, {_HLL_M} - 1)) AS j) g
        LEFT JOIN regs ON regs.event_type = t.event_type AND regs.j = g.j
    ),
    folded AS (
        SELECT event_type,
               sum(pow(2.0, -r)) AS z,
               count(*) FILTER (r = 0) AS v
        FROM grid GROUP BY event_type
    ),
    ex AS (
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        FROM events GROUP BY event_type
    )
    SELECT f.event_type, ex.n_exact,
           CAST(f.v AS BIGINT) AS n_empty_registers,
           round(CASE WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / f.z
                           <= 2.5 * {_HLL_M} AND f.v > 0
                      THEN {_HLL_M} * ln({_HLL_M} * 1.0 / f.v)
                      ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / f.z
                 END, 2) AS est_distinct,
           round((CASE WHEN {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / f.z
                            <= 2.5 * {_HLL_M} AND f.v > 0
                       THEN {_HLL_M} * ln({_HLL_M} * 1.0 / f.v)
                       ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M} / f.z
                  END - ex.n_exact) / ex.n_exact, 4) AS rel_err
    FROM folded f JOIN ex ON ex.event_type = f.event_type
    """,
)
def sketch_hll_manual_registers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """HyperLogLog built from first principles with content-addressed
    hashes — unlike agg_approx_distinct / agg_hll_sketch_union (Spark's
    opaque built-in sketches, honest but rows-only checkable), every
    internal of THIS sketch is hash-checked cross-engine: the md5
    uniform splits into a 6-bit register index and a 26-bit suffix,
    rho is the suffix's leading-zero count + 1, registers take the max,
    and the harmonic-mean estimate alpha*m^2 / sum(2^-R) (with
    Flajolet's small-range linear-counting correction m*ln(m/V)) is
    deterministic because sum(2^-R) over 64 dyadic terms is EXACT in
    double. The rel_err column against the exact distinct count is the
    built-in honesty measurement (the eval-twin discipline, inline).

    Scale shape: the register build is one (type, register) aggregate
    whose output is |types| x 64 regardless of cardinality — the whole
    point of HLL at 100 TB; register tables from different shards
    merge by the same max (agg_partial_merge_shards' pattern). The
    exact count (for rel_err) is the only expensive leg and exists
    purely as the honesty column."""
    ev = tables(spark, sf_dir).events
    hashed = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
            16,
            10,
        )
        .cast("long")
        .alias("x"),
    ).distinct()
    el = hashed.select(
        "event_type",
        (F.col("x") % _HLL_M).alias("j"),
        F.floor(F.col("x") / _HLL_M).cast("long").alias("w"),
    )
    rho = (
        F.when(F.col("w") == 0, F.lit(27))
        .otherwise(26 - F.floor(F.log2("w")).cast("int"))
        .cast("int")
    )
    regs = el.groupBy("event_type", "j").agg(F.max(rho).alias("r"))
    types = hashed.select("event_type").distinct()
    grid = (
        types.select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(_HLL_M - 1))).alias("j"),
        )
        .join(regs, ["event_type", "j"], "left")
        .select(
            "event_type", "j", F.coalesce("r", F.lit(0)).alias("r")
        )
    )
    folded = grid.groupBy("event_type").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("z"),
        F.count(F.when(F.col("r") == 0, 1)).alias("v"),
    )
    ex = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    raw = _HLL_ALPHA * _HLL_M * _HLL_M / F.col("z")
    est = F.when(
        (raw <= 2.5 * _HLL_M) & (F.col("v") > 0),
        _HLL_M * F.log(_HLL_M / F.col("v")),
    ).otherwise(raw)
    return folded.join(ex, "event_type").select(
        "event_type",
        "n_exact",
        F.col("v").cast("long").alias("n_empty_registers"),
        rnd(est, 2).alias("est_distinct"),
        rnd((est - F.col("n_exact")) / F.col("n_exact"), 4).alias(
            "rel_err"
        ),
    )


# --------------------------------------------------------------------------
# Linear counting sketch: bitmap-occupancy distinct estimate, auditable
# --------------------------------------------------------------------------

_LC_M = 1024  # bitmap width (bits)


@query(
    "sketch_linear_counting_distinct",
    oracle=f"""
    WITH bits AS (
        SELECT DISTINCT event_type,
               ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % {_LC_M} AS bit
        FROM events
    ),
    exact AS (
        SELECT event_type, count(DISTINCT user_id) AS n_exact
        FROM events GROUP BY 1
    ),
    occ AS (
        SELECT event_type, count(*) AS n_bits_set FROM bits GROUP BY 1
    )
    SELECT o.event_type,
           CAST(o.n_bits_set AS BIGINT) AS n_bits_set,
           CAST(e.n_exact AS BIGINT) AS n_exact,
           round(-{_LC_M} * ln(({_LC_M} - o.n_bits_set) * 1.0 / {_LC_M}),
                 2) AS est_distinct,
           round((-{_LC_M} * ln(({_LC_M} - o.n_bits_set) * 1.0
                                / {_LC_M}) - e.n_exact)
                 * 1.0 / e.n_exact, 6) AS rel_err
    FROM occ o JOIN exact e USING (event_type)
    """,
)
def sketch_linear_counting_distinct(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Linear (bitmap) counting, Whang et al. 1990: hash every user
    into a 1024-bit bitmap per event type and estimate the distinct
    count from bitmap occupancy, n_hat = -m ln(V) with V the empty-bit
    fraction — the OTHER classic distinct sketch next to KMV
    ([[sketch_kmv_distinct]]) and HLL ([[sketch_hll_manual_registers]]),
    and the most accurate of the three while cardinality stays below
    the bitmap size. The md5 bit addresses are content-addressed, so
    the sketch state AND the estimate are bit-identical across engines
    — hash-checked, not rows-only — and the exact count plus relative
    error ride along as the honesty columns.

    Scale shape: the bitmap is a (type, bit) distinct aggregate capped
    at |types| x 1024 cells no matter the event count (partial
    map-side distinct absorbs the volume); union-merging shards is
    bitwise OR — set-union of (type, bit) rows — the mergeability that
    makes it a real sketch rather than a local trick."""
    ev = tables(spark, sf_dir).events
    bit = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % _LC_M
    )
    bits = ev.select("event_type", bit.alias("bit")).distinct()
    occ = bits.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_bits_set")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    est = -float(_LC_M) * F.log(
        (F.lit(_LC_M) - F.col("n_bits_set")) / float(_LC_M)
    )
    return occ.join(exact, "event_type").select(
        "event_type",
        "n_bits_set",
        "n_exact",
        rnd(est, 2).alias("est_distinct"),
        rnd((est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


# --------------------------------------------------------------------------
# Neyman-allocated stratified sampling (deterministic md5 draw)
# --------------------------------------------------------------------------

_NEYMAN_BUDGET = 500


@query(
    "sample_stratified_neyman",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               count(*) AS n_pop,
               stddev_samp(value) AS s_h,
               avg(value) AS pop_mean
        FROM events GROUP BY event_type
    ),
    tot AS (SELECT sum(n_pop * s_h) AS w FROM stats),
    alloc AS (
        SELECT event_type, n_pop, s_h, pop_mean,
               CAST(floor({_NEYMAN_BUDGET} * n_pop * s_h / tot.w)
                    AS BIGINT) AS n_alloc
        FROM stats, tot
    ),
    ranked AS (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rn
        FROM events
    ),
    sampled AS (
        SELECT r.event_type,
               count(*) AS n_sampled,
               avg(r.value) AS sample_mean
        FROM ranked r JOIN alloc a USING (event_type)
        WHERE r.rn <= a.n_alloc
        GROUP BY r.event_type
    )
    SELECT a.event_type, CAST(a.n_pop AS BIGINT) AS n_pop,
           round(a.s_h, 6) AS s_h, a.n_alloc,
           CAST(s.n_sampled AS BIGINT) AS n_sampled,
           round(s.sample_mean, 4) AS sample_mean,
           round(a.pop_mean, 4) AS pop_mean
    FROM alloc a JOIN sampled s USING (event_type)
    """,
    tags=("scale", "sampling"),
)
def sample_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocated stratified sampling (Neyman 1934 — the optimal
    allocation for estimating a population mean under a fixed budget):
    each stratum h gets n_h = floor(B * N_h * S_h / sum(N * S)) of the
    B={_NEYMAN_BUDGET} budget, proportional to size TIMES spread, so
    volatile strata are oversampled and near-constant ones barely
    sampled — the design-of-experiments upgrade over proportional
    allocation ([[corpus_stratified_split]] fixes fractions;
    [[sample_weighted_es]] weights rows; this sizes strata optimally).
    The draw is the engine's content-addressed discipline: rank by
    md5(event_id) within stratum and take the first n_h, so the
    SAMPLE ITSELF — not just its size — is deterministic, and the
    sample mean is hash-checked against the oracle next to the
    population mean it estimates (the honesty pair).

    Scale shape: stratum stats are one map-side-partial aggregate; the
    allocation is a broadcast one-row total; the draw is one rank
    window per stratum (at 100 TB: replace the exact rank with the
    md5-threshold trick — take rows with md5 < n_h/N_h-scaled cutoff —
    to avoid the sort entirely; the rank form is kept here because it
    makes the allocation EXACT, and per-stratum sorts parallelize
    across strata)."""
    t = tables(spark, sf_dir)
    stats = t.events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pop"),
        F.stddev_samp("value").alias("s_h"),
        F.avg("value").alias("pop_mean"),
    )
    tot = stats.agg(
        F.sum(F.col("n_pop") * F.col("s_h")).alias("w")
    )
    alloc = stats.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_pop",
        "s_h",
        "pop_mean",
        F.floor(
            _NEYMAN_BUDGET * F.col("n_pop") * F.col("s_h") / F.col("w")
        ).cast("long").alias("n_alloc"),
    )
    win = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    ranked = t.events.select(
        "event_type", "value", F.row_number().over(win).alias("rn")
    )
    sampled = (
        ranked.join(F.broadcast(alloc.select("event_type", "n_alloc")),
                    "event_type")
        .filter(F.col("rn") <= F.col("n_alloc"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.avg("value").alias("sample_mean"),
        )
    )
    return alloc.join(sampled, "event_type").select(
        "event_type",
        F.col("n_pop").cast("long").alias("n_pop"),
        rnd(F.col("s_h"), 6).alias("s_h"),
        "n_alloc",
        "n_sampled",
        rnd(F.col("sample_mean"), 4).alias("sample_mean"),
        rnd(F.col("pop_mean"), 4).alias("pop_mean"),
    )


sample_stratified_neyman.__doc__ = sample_stratified_neyman.__doc__.replace(
    "{_NEYMAN_BUDGET}", str(_NEYMAN_BUDGET)
)


# --------------------------------------------------------------------------
# SCD-2 merge: apply a change batch with effective dating
# --------------------------------------------------------------------------

_SCD2_EPOCH = "1995-01-01"
_SCD2_CHANGE_DATE = "1997-06-01"
_SCD2_NEW_SEGMENT = "MACHINERY"


@query(
    "upsert_scd2_merge",
    oracle=f"""
    WITH changes AS (
        SELECT c_custkey, '{_SCD2_NEW_SEGMENT}' AS new_segment
        FROM customer
        WHERE c_custkey % 7 = 0 AND c_mktsegment <> '{_SCD2_NEW_SEGMENT}'
    )
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
           1 AS version,
           '{_SCD2_EPOCH}' AS valid_from,
           CASE WHEN ch.c_custkey IS NOT NULL
                THEN '{_SCD2_CHANGE_DATE}' END AS valid_to,
           ch.c_custkey IS NULL AS is_current
    FROM customer c LEFT JOIN changes ch ON ch.c_custkey = c.c_custkey
    UNION ALL
    SELECT c_custkey AS custkey, new_segment AS segment,
           2 AS version,
           '{_SCD2_CHANGE_DATE}' AS valid_from,
           CAST(NULL AS VARCHAR) AS valid_to,
           true AS is_current
    FROM changes
    """,
    tags=("scale", "cdc"),
)
def upsert_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 merge — the warehouse MERGE INTO with history: applying a
    change batch to a dimension closes the superseded row (valid_to =
    effective date, is_current = false) and inserts a version-2 row
    open-ended from that date, while untouched keys pass through as
    current version 1. [[upsert_scd1]] is the overwrite variant (no
    history); [[scd2_history_intervals]] RECONSTRUCTS intervals from an
    event log — this op is the forward maintenance path that keeps
    those intervals true as changes arrive. The change batch is
    deterministic (customers with custkey % 7 = 0 moving to
    {_SCD2_NEW_SEGMENT}), standing in for the day's CDC feed.

    Scale shape: one left join of the dimension against the change
    batch on the business key (broadcast when the batch is small, hash
    join otherwise) plus a union — no windows, no global state. On a
    lakehouse format the same plan becomes a file-level MERGE; the
    engine expresses the row-level semantics the format then optimizes."""
    t = tables(spark, sf_dir)
    changes = (
        t.customer.filter(
            (F.col("c_custkey") % 7 == 0)
            & (F.col("c_mktsegment") != _SCD2_NEW_SEGMENT)
        )
        .select(
            F.col("c_custkey").alias("ch_key"),
            F.lit(_SCD2_NEW_SEGMENT).alias("new_segment"),
        )
    )
    base = t.customer.join(
        F.broadcast(changes),
        t.customer["c_custkey"] == changes["ch_key"],
        "left",
    ).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit(1).alias("version"),
        F.lit(_SCD2_EPOCH).alias("valid_from"),
        F.when(
            F.col("ch_key").isNotNull(), F.lit(_SCD2_CHANGE_DATE)
        ).alias("valid_to"),
        F.col("ch_key").isNull().alias("is_current"),
    )
    inserts = changes.select(
        F.col("ch_key").alias("custkey"),
        F.col("new_segment").alias("segment"),
        F.lit(2).alias("version"),
        F.lit(_SCD2_CHANGE_DATE).alias("valid_from"),
        F.lit(None).cast("string").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return base.unionAll(inserts)


upsert_scd2_merge.__doc__ = upsert_scd2_merge.__doc__.replace(
    "{_SCD2_NEW_SEGMENT}", _SCD2_NEW_SEGMENT
)


# --------------------------------------------------------------------------
# Incremental materialized-view refresh (partial-merge, self-audited)
# --------------------------------------------------------------------------

_MV_SPLIT_DATE = "1997-01-01"


@query(
    "mv_incremental_refresh",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority AS p, count(*) AS n, sum(o_totalprice) AS s
        FROM orders WHERE o_orderdate < TIMESTAMP '{_MV_SPLIT_DATE}'
        GROUP BY 1
    ),
    delta AS (
        SELECT o_orderpriority AS p, count(*) AS n, sum(o_totalprice) AS s
        FROM orders WHERE o_orderdate >= TIMESTAMP '{_MV_SPLIT_DATE}'
        GROUP BY 1
    ),
    merged AS (
        SELECT p, CAST(sum(n) AS BIGINT) AS n_orders,
               round(sum(s), 2) AS total,
               round(sum(s) / sum(n), 4) AS avg_price
        FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
        GROUP BY p
    ),
    full_rec AS (
        SELECT o_orderpriority AS p, CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total,
               round(sum(o_totalprice) / count(*), 4) AS avg_price
        FROM orders GROUP BY 1
    )
    SELECT m.p AS priority, m.n_orders, m.total, m.avg_price,
           (m.n_orders = f.n_orders AND m.total = f.total) AS matches_full
    FROM merged m JOIN full_rec f ON f.p = m.p
    """,
    tags=("scale", "mv"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view refresh by partial-aggregate
    merge: yesterday's MV state (count, sum partials over the base
    period) absorbs today's delta batch with ONE small merge aggregate
    instead of a full-table recompute — the algebraic-rollup property
    (count/sum/avg are self-maintainable; [[agg_partial_merge_shards]]
    proves the merge algebra shard-wise, this op runs the actual
    refresh protocol on a date split). The honesty column: every row
    carries matches_full, the comparison against a from-scratch
    recompute of the same MV, so the refresh path is AUDITED inside
    the operator rather than trusted ([[dq_order_total_reconciliation]]
    style). At 100 TB the left term never rescans history — the base
    partials are yesterday's stored MV — and the full-recompute lane
    exists only as the periodic audit.

    Scale shape: two date-pruned scans (the split predicate reaches
    the parquet reader; on a date-partitioned lake the base scan reads
    the stored MV instead), two map-side-partial aggregates at
    priority grain, one 10-row merge. The audit recompute is one more
    aggregate at the same grain."""
    t = tables(spark, sf_dir)
    split = F.lit(_MV_SPLIT_DATE).cast("timestamp_ntz")

    def partials(df):
        return df.groupBy(F.col("o_orderpriority").alias("p")).agg(
            F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
        )

    base = partials(t.orders.filter(F.col("o_orderdate") < split))
    delta = partials(t.orders.filter(F.col("o_orderdate") >= split))
    merged = (
        base.unionAll(delta)
        .groupBy("p")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            rnd(F.sum("s"), 2).alias("total"),
            rnd(F.sum("s") / F.sum("n"), 4).alias("avg_price"),
        )
    )
    full_rec = t.orders.groupBy(
        F.col("o_orderpriority").alias("p")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("f_n"),
        rnd(F.sum("o_totalprice"), 2).alias("f_total"),
    )
    return merged.join(full_rec, "p").select(
        F.col("p").alias("priority"),
        "n_orders",
        "total",
        "avg_price",
        (
            (F.col("n_orders") == F.col("f_n"))
            & (F.col("total") == F.col("f_total"))
        ).alias("matches_full"),
    )


# --------------------------------------------------------------------------
# Manifest-driven scan: read only the files a manifest lists
# --------------------------------------------------------------------------


@query(
    "scan_manifest_filelist",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    WHERE CAST(event_id % 4 AS INT) IN (0, 1)
    GROUP BY event_type
    """,
    tags=("scan", "scale"),
)
def scan_manifest_filelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-driven scanning — the table-format idea (Iceberg/Delta
    manifests) on plain parquet: the events table is laid out as four
    bucket directories, a manifest names the two buckets this query
    owns, and the reader is handed ONLY the manifest's paths — files
    outside the manifest are never opened, not merely filtered. This
    is file-level pruning as an explicit contract rather than an
    optimizer courtesy: at 100 TB the difference between "scan
    everything then filter" and "open 2 of 4 million files" is the
    whole game, and a manifest (or partition index) is how the 2 are
    named without listing the lake. The oracle replays the manifest's
    selection as the equivalent predicate.

    Scale shape: the bucket write is executor-parallel partitionBy;
    the manifest is metadata (driver-side file list, kilobytes); the
    read plan contains only the listed directories, so partition
    pruning is structural. Aggregation on the pruned scan is one
    map-side-partial fold."""
    import json
    import os

    from awsbeats_spark.functions.workdirs import work_dir

    t = tables(spark, sf_dir)
    root = work_dir("manifest_scan", sf_dir)
    cols = ["event_id", "user_id", "event_type", "value"]
    (
        t.events.select(*cols)
        .withColumn("bucket", (F.col("event_id") % 4).cast("int"))
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(root)
    )
    manifest_path = os.path.join(root, "_engine_manifest.json")
    manifest = {"paths": [f"{root}/bucket={b}" for b in (0, 1)]}
    with open(manifest_path, "w") as fh:
        json.dump(manifest, fh)
    with open(manifest_path) as fh:
        listed = json.load(fh)["paths"]
    scanned = spark.read.parquet(*listed)
    return scanned.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        rnd(F.sum("value"), 2).alias("total_value"),
    )


# --------------------------------------------------------------------------
# Corrupt-record quarantine on JSON-lines ingest
# --------------------------------------------------------------------------


@query(
    "codec_json_corrupt_permissive",
    oracle="""
    SELECT event_type,
           CAST(count(*) FILTER (CAST(event_id % 7 AS INT) <> 3)
               AS BIGINT) AS n_clean,
           CAST(count(*) FILTER (CAST(event_id % 7 AS INT) = 3)
               AS BIGINT) AS n_quarantined,
           round(sum(value) FILTER (CAST(event_id % 7 AS INT) <> 3), 2)
               AS clean_value_sum
    FROM events
    GROUP BY event_type
    """,
    tags=("scale", "codec"),
)
def codec_json_corrupt_permissive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corrupt-record quarantine on JSON-lines ingest — the JSON twin
    of [[codec_csv_corrupt_permissive]]: a replica of events is
    serialized as NDJSON with a deterministic fraction of lines
    damaged (the numeric value field emitted as a STRING for
    event_id % 7 == 3 — a type mismatch, which PERMISSIVE quarantines
    while still recovering the row's well-typed fields; an invalid
    token would null the whole row and lose the group key), read back
    under PERMISSIVE mode with
    columnNameOfCorruptRecord, and reconciled per event_type:
    survivors, quarantined, and the survivors' value sum. JSON is the
    format the reference actually emits
    (/root/reference/streams/client.go serializes records as JSON
    lines), so this lane is the reference's own wire format under
    damage. PERMISSIVE + quarantine column is the contract that keeps
    a 100 TB load alive through a bad producer instead of FAILFAST
    killing it or DROPMALFORMED lying about it.

    Scale shape: NDJSON stays line-splittable, write/read are
    executor-parallel, the readback aggregate is map-side partial at
    type grain."""
    import json as _json

    from awsbeats_spark.functions.workdirs import work_dir

    t = tables(spark, sf_dir)
    out = work_dir("codec_json_corrupt", sf_dir)
    line = F.concat(
        F.lit('{"event_id": '),
        F.col("event_id").cast("string"),
        F.lit(', "event_type": "'),
        F.col("event_type"),
        F.lit('", "value": '),
        F.when(
            F.col("event_id") % 7 == 3, F.lit('"__NOT_A_NUMBER__"')
        ).otherwise(F.col("value").cast("string")),
        F.lit("}"),
    )
    t.events.select(line.alias("value")).write.mode("overwrite").text(out)
    back = (
        spark.read.options(mode="PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(
            "event_id long, event_type string, value double,"
            " _corrupt string"
        )
        .json(out)
    )
    return back.groupBy("event_type").agg(
        F.count(F.when(F.col("_corrupt").isNull(), 1))
        .cast("long")
        .alias("n_clean"),
        F.count(F.when(F.col("_corrupt").isNotNull(), 1))
        .cast("long")
        .alias("n_quarantined"),
        rnd(
            F.sum(
                F.when(F.col("_corrupt").isNull(), F.col("value"))
            ),
            2,
        ).alias("clean_value_sum"),
    )


# --------------------------------------------------------------------------
# Sort-free deterministic sampling by md5 threshold
# --------------------------------------------------------------------------

_THRESH_FRAC = 0.05  # target sampling fraction


@query(
    "sample_md5_threshold",
    oracle=f"""
    WITH u AS (
        SELECT event_type, value,
               ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8))
                   ::BIGINT / 4294967296.0 AS unif
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pop,
           CAST(count(*) FILTER (unif < {_THRESH_FRAC}) AS BIGINT)
               AS n_sampled,
           round(count(*) FILTER (unif < {_THRESH_FRAC})
                 / CAST(count(*) AS DOUBLE), 6) AS achieved_frac,
           round(avg(value) FILTER (unif < {_THRESH_FRAC}), 4)
               AS sample_mean,
           round(avg(value), 4) AS pop_mean
    FROM u GROUP BY event_type
    """,
    tags=("scale", "sampling"),
)
def sample_md5_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-free deterministic sampling — the 100 TB sampler: a row is
    in the sample iff its content-addressed md5 uniform falls below
    the target fraction. No rank window, no shuffle, no RNG state:
    the predicate is row-local, pushes into the scan like any filter,
    the SAME rows are sampled on every engine/run/partitioning, and
    the sample composes (a 5% sample is a superset-of-nothing /
    subset-of a 10% one using the same hash — progressive sampling
    for free). This is the threshold variant
    [[sample_stratified_neyman]]'s docstring names as its cluster-
    scale path: Neyman gets EXACT allocation via a per-stratum rank;
    this trades exactness (binomial wobble, reported as
    achieved_frac vs the 5% target) for zero coordination.
    [[sample_hash_deterministic]] buckets by hash for splits; this is
    the tunable-fraction form with the honesty columns (sample vs
    population mean per stratum).

    Scale shape: one map-side filter + one keyed fold. Nothing else.
    That IS the point."""
    t = tables(spark, sf_dir)
    unif = (
        F.conv(
            F.substring(F.md5(F.col("event_id").cast("string")), 1, 8),
            16,
            10,
        ).cast("double")
        / 4294967296.0
    )
    u = t.events.select(
        "event_type", "value", unif.alias("unif")
    )
    in_s = F.col("unif") < _THRESH_FRAC
    return u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        F.count(F.when(in_s, 1)).cast("long").alias("n_sampled"),
        rnd(
            F.count(F.when(in_s, 1)) / F.count(F.lit(1)).cast("double"), 6
        ).alias("achieved_frac"),
        rnd(F.avg(F.when(in_s, F.col("value"))), 4).alias("sample_mean"),
        rnd(F.avg("value"), 4).alias("pop_mean"),
    )


# --------------------------------------------------------------------------
# Z-order clustering audit (Morton interleave -> min/max pruning width)
# --------------------------------------------------------------------------

_Z_BITS = 16  # per-key quantization
_Z_BUCKETS_LOG2 = 6  # 64 equal-width z-range buckets (top 6 bits)


def _z_terms(shr, qo: str, qp: str) -> str:
    """The 32 Morton-interleave terms as a SQL sum (even bit positions
    from the orderkey rank, odd from the partkey rank). `shr(x, n)`
    renders a right-shift in the target dialect."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(
            f"({shr(qo, _Z_BITS - 1 - b)} & 1) * {1 << (31 - 2 * b)}"
        )
        terms.append(
            f"({shr(qp, _Z_BITS - 1 - b)} & 1) * {1 << (30 - 2 * b)}"
        )
    return " + ".join(terms)


@query(
    "scale_zorder_clustering_audit",
    oracle=f"""
    WITH mx AS (
        SELECT max(l_orderkey) AS mo, max(l_partkey) AS mp FROM lineitem
    ),
    q AS (
        SELECT l_orderkey, l_partkey,
               CAST(floor(l_orderkey * {1 << _Z_BITS}.0 / (mo + 1))
                    AS BIGINT) AS qo,
               CAST(floor(l_partkey * {1 << _Z_BITS}.0 / (mp + 1))
                    AS BIGINT) AS qp,
               mo, mp
        FROM lineitem CROSS JOIN mx
    ),
    z AS (
        SELECT l_orderkey, l_partkey, mo, mp,
               {_z_terms(lambda x, n: f"({x} >> {n})", 'qo', 'qp')} AS zval
        FROM q
    ),
    b AS (
        SELECT *, zval >> {32 - _Z_BUCKETS_LOG2} AS bucket FROM z
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(l_orderkey) AS BIGINT) AS min_orderkey,
           CAST(max(l_orderkey) AS BIGINT) AS max_orderkey,
           round((max(l_orderkey) - min(l_orderkey) + 1.0)
                 / (any_value(mo) + 1), 6) AS span_orderkey,
           round((max(l_partkey) - min(l_partkey) + 1.0)
                 / (any_value(mp) + 1), 6) AS span_partkey
    FROM b GROUP BY bucket
    """,
)
def scale_zorder_clustering_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Z-ORDER (Morton curve) clustering audit — the data-layout
    primitive behind Delta/Iceberg `ZORDER BY`: quantize two join/filter
    keys to 16-bit ranks, interleave their bits into a 32-bit z-value
    (closed-form 32-term shift-mask sum, the [[geo_geohash_density]]
    technique on key space instead of lat/lon), bucket rows by the top
    6 z-bits (= 64 equal-width z ranges ~ 64 files written in z order),
    and report each bucket's min/max KEY SPANS — exactly the statistics
    a scan planner prunes on. The audit's point: under z-order BOTH
    spans sit near 1/sqrt(64) = 1/8 per bucket (each dimension splits
    ~8 ways), so predicates on EITHER key skip ~7/8 of files, where
    single-key sorting gives a perfect span on one key and span ~1 on
    the other. Every step is integer arithmetic on both engines
    (double quantize feeding floor is bit-identical — the LCG/geohash
    argument), so the audit is hash-checked end to end.

    Scale shape: z-value and bucket are MAP-SIDE expressions (one
    whole-stage-codegen projection over the fact scan — this is the
    write-path clustering key, costing nothing extra at rewrite time);
    the audit is one keyed aggregate over the bucket id plus a
    broadcast 1-row max. No sort, no window: equal-width z ranges
    stand in for the equal-count file split so the audit stays
    shuffle-light at any scale."""
    t = tables(spark, sf_dir)
    mx = t.lineitem.agg(
        F.max("l_orderkey").alias("mo"), F.max("l_partkey").alias("mp")
    )
    q = t.lineitem.select("l_orderkey", "l_partkey").crossJoin(
        F.broadcast(mx)
    ).select(
        "l_orderkey",
        "l_partkey",
        "mo",
        "mp",
        F.floor(F.col("l_orderkey") * float(1 << _Z_BITS) / (F.col("mo") + 1))
        .cast("long")
        .alias("qo"),
        F.floor(F.col("l_partkey") * float(1 << _Z_BITS) / (F.col("mp") + 1))
        .cast("long")
        .alias("qp"),
    )
    zval = sum(
        (
            F.shiftright(F.col("qo"), _Z_BITS - 1 - b).bitwiseAND(F.lit(1))
            * F.lit(1 << (31 - 2 * b))
            + F.shiftright(F.col("qp"), _Z_BITS - 1 - b).bitwiseAND(F.lit(1))
            * F.lit(1 << (30 - 2 * b))
            for b in range(_Z_BITS)
        ),
        start=F.lit(0),
    )
    b = q.select(
        "l_orderkey",
        "l_partkey",
        "mo",
        "mp",
        F.shiftright(zval, 32 - _Z_BUCKETS_LOG2).alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        rnd(
            (F.max("l_orderkey") - F.min("l_orderkey") + 1.0)
            / (F.any_value("mo") + 1),
            6,
        ).alias("span_orderkey"),
        rnd(
            (F.max("l_partkey") - F.min("l_partkey") + 1.0)
            / (F.any_value("mp") + 1),
            6,
        ).alias("span_partkey"),
    )


# --------------------------------------------------------------------------
# DDSketch quantiles (log-bucketed, mergeable, deterministic)
# --------------------------------------------------------------------------

_DD_GAMMA = 1.02  # relative accuracy (gamma-1)/(gamma+1) ~ 0.99%
_DD_QS = (0.5, 0.95, 0.99)


@query(
    "sketch_ddsketch_quantiles",
    oracle=f"""
    WITH v AS (SELECT event_type, value FROM events WHERE value > 0),
    bk AS (
        SELECT event_type,
               CAST(ceil(ln(value) / ln({_DD_GAMMA})) AS BIGINT) AS b
        FROM v
    ),
    bc AS (SELECT event_type, b, count(*) AS c FROM bk GROUP BY 1, 2),
    cum AS (
        SELECT event_type, b,
               sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cum,
               sum(c) OVER (PARTITION BY event_type) AS n
        FROM bc
    ),
    qs AS (SELECT CAST(q AS DOUBLE) AS q
           FROM (VALUES {", ".join(f"({q})" for q in _DD_QS)}) AS t(q)),
    sel AS (
        SELECT event_type, q, n, min(b) AS qb
        FROM cum CROSS JOIN qs
        WHERE cum >= ceil(q * n)
        GROUP BY event_type, q, n
    ),
    ex AS (
        SELECT event_type,
               {", ".join(f"quantile_disc(value, {q}) AS e{i}"
                          for i, q in enumerate(_DD_QS))}
        FROM v GROUP BY event_type
    ),
    j AS (
        SELECT s.event_type, s.q, s.n, s.qb,
               2 * power({_DD_GAMMA}, s.qb) / ({_DD_GAMMA} + 1) AS est,
               CASE {" ".join(f"WHEN s.q = {q} THEN e{i}"
                              for i, q in enumerate(_DD_QS))} END AS ex
        FROM sel s JOIN ex USING (event_type)
    )
    SELECT event_type, q, CAST(n AS BIGINT) AS n,
           CAST(qb AS BIGINT) AS bucket,
           round(est, 6) AS dd_estimate,
           round(ex, 6) AS exact_value,
           abs(est - ex) / ex <= 0.011 AS within_bound
    FROM j
    """,
)
def sketch_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch (Masson, Rim & Lee, VLDB 2019) — the RELATIVE-error
    quantile sketch: values land in log-scale buckets i =
    ceil(ln(v)/ln({g})), the q-quantile is read from the cumulative
    bucket counts at rank ceil(q*n) (the percentile_disc rule pinned by
    [[agg_percentile_disc_rank]]), and the estimate 2*{g}^i/({g}+1) is
    guaranteed within ({g}-1)/({g}+1) ~ 1% of the true value at ANY
    quantile — unlike rank-error sketches (KLL/t-digest tails). Unlike
    those, DDSketch is fully DETERMINISTIC (the bucket function has no
    randomness and no merge-order dependence), so this operator is
    hash-checked end to end — no rows-only escape — with the exact
    disc-quantile and a within_bound verdict column riding along
    (sandwich pattern).

    Scale shape: THE mergeable-quantile pattern for 100 TB — the
    bucket id is a map-side expression, partial (type, bucket) counts
    combine losslessly across any partitioning/rollup axis, and sketch
    size is bounded by the value range's log span (~1.2k buckets per
    60 dB of dynamic range). Quantile extraction runs on the
    bucket-grain table: one cumulative window + a rank probe."""
    t = tables(spark, sf_dir)
    v = t.events.filter(F.col("value") > 0).select(
        "event_type", "value", "event_id"
    )
    g = _DD_GAMMA
    bk = v.select(
        "event_type",
        F.ceil(F.log("value") / F.log(F.lit(g))).cast("long").alias("b"),
    )
    bc = bk.groupBy("event_type", "b").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("event_type").orderBy("b")
    wall = Window.partitionBy("event_type")
    cum = bc.select(
        "event_type",
        "b",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    qs = spark.createDataFrame([(float(q),) for q in _DD_QS], "q double")
    sel = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("event_type", "q", "n")
        .agg(F.min("b").alias("qb"))
    )
    wrank = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = v.select(
        "event_type",
        "value",
        F.row_number().over(wrank).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("n_ex"),
    )
    exact = (
        ranked.crossJoin(F.broadcast(qs))
        .filter(F.col("rn") == F.ceil(F.col("q") * F.col("n_ex")))
        .select("event_type", "q", F.col("value").alias("ex"))
    )
    est = 2 * F.pow(F.lit(g), F.col("qb")) / (g + 1)
    return (
        sel.join(exact, ["event_type", "q"])
        .select(
            "event_type",
            "q",
            F.col("n").cast("long").alias("n"),
            F.col("qb").cast("long").alias("bucket"),
            rnd(est, 6).alias("dd_estimate"),
            rnd(F.col("ex"), 6).alias("exact_value"),
            (F.abs(est - F.col("ex")) / F.col("ex") <= 0.011).alias(
                "within_bound"
            ),
        )
    )


sketch_ddsketch_quantiles.__doc__ = sketch_ddsketch_quantiles.__doc__.replace(
    "{g}", str(_DD_GAMMA)
)


# --------------------------------------------------------------------------
# Parquet row-group statistics audit (footer stats vs data)
# --------------------------------------------------------------------------

_RG_AUDIT_COLS = ("l_orderkey", "l_extendedprice")


@query(
    "scan_rowgroup_stats_audit",
    oracle=f"""
    {" UNION ALL ".join(
        f'''SELECT '{c}' AS column_name,
               CAST(min({c}) AS DOUBLE) AS data_min,
               CAST(max({c}) AS DOUBLE) AS data_max,
               CAST(count(*) AS BIGINT) AS n_rows,
               TRUE AS footer_min_matches,
               TRUE AS footer_max_matches,
               TRUE AS footer_rowcount_matches,
               TRUE AS rg_stats_bracketed
        FROM lineitem''' for c in _RG_AUDIT_COLS)}
    """,
)
def scan_rowgroup_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet FOOTER-STATISTICS audit: read the file's row-group
    min/max/num_values from the footer metadata (pyarrow, driver-side
    — kilobytes, the manifest precedent) and verify them against the
    data itself: min-of-rg-mins == true min, max-of-rg-maxes == true
    max, sum of row-group counts == count(*), and every row group's
    stats contained inside the true data range (min-of-rg-mins >=
    data_min, max-of-rg-maxes <= data_max — a corrupt stat outside
    the range fails the verdict). These statistics are what
    min/max scan pruning TRUSTS — a writer bug or bit rot here makes
    pruning silently drop matching rows, which is why table formats
    (Iceberg/Delta) checksum them; this audit is the plain-parquet
    version, the verification sibling of [[scale_zorder_clustering_audit]]
    (which measures how USEFUL the stats are; this one checks they are
    TRUE). Footer facts fold into verdict booleans so the DuckDB
    oracle pins them against pure data aggregates (the sandwich
    pattern).

    Scale shape: footers are metadata — reading a million of them is a
    driver/manifest-service job, not a table scan; the data-side check
    is ONE aggregate per column. At lake scale you audit a sampled or
    recently-written file set with the same plan."""
    import glob
    import os

    import pyarrow.parquet as papq

    path = f"{sf_dir}/lineitem.parquet"
    # a "table" is one file at the test SFs and a DIRECTORY of part
    # files when written by an engine — the realistic lake layout; the
    # footer walk covers every row group of every part either way
    files = (
        sorted(glob.glob(os.path.join(path, "*.parquet")))
        if os.path.isdir(path)
        else [path]
    )
    mds = [papq.ParquetFile(f).metadata for f in files]
    names = mds[0].schema.names
    footer_rows = []
    for col in _RG_AUDIT_COLS:
        ci = names.index(col)
        mins, maxes, nvals = [], [], 0
        for md in mds:
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                mins.append(float(st.min))
                maxes.append(float(st.max))
                nvals += md.row_group(rg).num_rows
        footer_rows.append((col, min(mins), max(maxes), nvals))
    footer = spark.createDataFrame(
        footer_rows,
        "column_name string, f_min double, f_max double, f_rows long",
    )
    t = tables(spark, sf_dir)
    stats = None
    for col in _RG_AUDIT_COLS:
        s = t.lineitem.agg(
            F.lit(col).alias("column_name"),
            F.min(col).cast("double").alias("data_min"),
            F.max(col).cast("double").alias("data_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        stats = s if stats is None else stats.unionAll(s)
    return stats.join(F.broadcast(footer), "column_name").select(
        "column_name",
        "data_min",
        "data_max",
        "n_rows",
        (F.col("f_min") == F.col("data_min")).alias("footer_min_matches"),
        (F.col("f_max") == F.col("data_max")).alias("footer_max_matches"),
        (F.col("f_rows") == F.col("n_rows")).alias("footer_rowcount_matches"),
        # every row group's stats must lie INSIDE the true data range:
        # min-of-rg-mins >= data_min and max-of-rg-maxes <= data_max
        # (ADVICE r6: the old max(mins)/min(maxes) form was trivially
        # true and could never catch a corrupt row-group stat)
        (
            (F.col("f_min") >= F.col("data_min"))
            & (F.col("f_max") <= F.col("data_max"))
        ).alias("rg_stats_bracketed"),
    )


# --------------------------------------------------------------------------
# Compaction bin-packing plan (the OPTIMIZE small-files planner)
# --------------------------------------------------------------------------

_COMPACT_TARGET_BYTES = 8192  # target compacted file size for the fixture


@query(
    "scale_compaction_binpack",
    oracle=f"""
    WITH files AS (
        SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT)
                   AS file_key,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(strlen(props)) + 24 * count(*) AS BIGINT)
                   AS size_bytes
        FROM events
        GROUP BY 1
    ),
    packed AS (
        SELECT file_key, n_rows, size_bytes,
               CAST(floor(
                   (sum(size_bytes) OVER (
                        ORDER BY file_key
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                    ) - size_bytes) * 1.0 / {_COMPACT_TARGET_BYTES}
               ) AS BIGINT) AS bin_id
        FROM files
    )
    SELECT bin_id,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           CAST(sum(size_bytes) AS BIGINT) AS total_bytes,
           min(file_key) AS first_key,
           max(file_key) AS last_key,
           round(sum(size_bytes) * 1.0 / {_COMPACT_TARGET_BYTES}, 6)
               AS fill_ratio
    FROM packed
    GROUP BY bin_id
    """,
    tags=("scale",),
)
def scale_compaction_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning — the OPTIMIZE/auto-compact
    planner every lakehouse table needs: streaming ingest leaves one
    file per micro-batch (here: one manifest row per ingest hour,
    sized from the rows it holds), and the planner packs consecutive
    files into target-sized compaction groups by running-sum binning —
    bin = floor(cum_bytes_before / target) — the same
    sequential-greedy shape Delta/Iceberg compaction uses so each
    output file rewrites a CONTIGUOUS key range (preserving clustering
    and letting each bin rewrite independently). Bins may overshoot
    the target by at most one input file; fill_ratio reports it.

    Scale shape: the manifest is metadata — one row per FILE, not per
    data row (at 100 TB: millions of rows, not trillions), which is
    why the single running-sum window over it is the right plan; the
    per-file stats aggregate is the only corpus-sized pass and it is
    one keyed fold. The rewrite jobs the plan describes are
    embarrassingly parallel per bin.
    """
    t = tables(spark, sf_dir)
    files = t.events.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("file_key")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.sum(F.octet_length("props")) + 24 * F.count(F.lit(1)))
        .cast("long")
        .alias("size_bytes"),
    )
    cum_before = (
        F.sum("size_bytes").over(
            Window.orderBy("file_key").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        - F.col("size_bytes")
    )
    packed = files.withColumn(
        "bin_id",
        F.floor(cum_before * 1.0 / _COMPACT_TARGET_BYTES).cast("long"),
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("size_bytes").cast("long").alias("total_bytes"),
        F.min("file_key").alias("first_key"),
        F.max("file_key").alias("last_key"),
        rnd(
            F.sum("size_bytes") * 1.0 / _COMPACT_TARGET_BYTES, 6
        ).alias("fill_ratio"),
    )
