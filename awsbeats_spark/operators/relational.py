"""Scans, projections, filters, scalar functions, sorts.

Reference parity (SURVEY.md §2): the reference's only per-event
transforms are JSON-encode + project-to-record
(/root/reference/streams/client.go:127-154) and regex/field filters from
its pipeline configs (/root/reference/example/metricbeat/metricbeat.yml:44-46).
Everything else here is the engine extension mandated by BASELINE.json.

Scale notes: all operators below are single-pass, shuffle-free scans —
Catalyst pushes the filters into the parquet reader (PushedFilters) and
prunes columns (ReadSchema), so at 100 TB they read only the needed
bytes. `sort_limit` compiles to TakeOrderedAndProject: per-partition
top-K then a K-row merge on the driver — no global sort shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query


@query(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan with projection pruning: reads 4 of 11 columns."""
    t = tables(spark, sf_dir)
    return t.lineitem.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_extendedprice
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_discount > 0.05
      AND l_returnflag = 'R'
    """,
)
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate — pushed down to the parquet row-group level."""
    t = tables(spark, sf_dir)
    li = t.lineitem
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & (F.col("l_discount") > 0.05)
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_extendedprice")


@query(
    "filter_regex",
    oracle=r"""
    SELECT event_id, event_type, value
    FROM events
    WHERE NOT regexp_matches(event_type, '^(error|view)$')
    """,
)
def filter_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex drop-filter: reference pipeline's `drop_event.when.regexp`
    processor (/root/reference/example/metricbeat/metricbeat.yml:44-46)."""
    t = tables(spark, sf_dir)
    return (
        t.events.filter(~F.col("event_type").rlike(r"^(error|view)$"))
        .select("event_id", "event_type", "value")
    )


@query(
    "project_record",
    oracle="""
    SELECT
        event_id,
        '{"event_id":' || CAST(event_id AS VARCHAR)
            || ',"event_type":"' || event_type
            || '","user_id":' || CAST(user_id AS VARCHAR) || '}'
            || chr(10) AS data,
        json_extract_string(props, '$.k') AS partition_key
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def project_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event -> delivery record {data, partition_key}.

    Mirrors the reference's mapEvent: compact JSON + trailing newline
    (/root/reference/streams/client.go:127-154; the `\\n` contract is
    asserted by its test at streams/client_test.go:76-78) and the field
    partition-key provider (/root/reference/streams/partition_key.go:26-39)
    with its drop-on-missing-key semantics (client.go:109-125).

    JSON is built with string concat (not to_json) so the byte layout is
    engine-independent and oracle-checkable; the streaming sink
    (awsbeats_spark.sinks.kinesis) uses the same projection.

    The drop-on-missing-key filter is expressed as explode(array_compact)
    rather than filter(isNotNull): predicate pushdown would otherwise
    clone the get_json_object call below the scan filter and every row
    would pay the JSON parse twice (once to test, once to project). The
    generator evaluates the path exactly once per row and emits 0 or 1
    rows — same rows out, half the Jackson parses.

    scan_fanout (round 12): the bench-scale events table is ONE parquet
    file, so 100k Jackson parses + concat + generate ran on one core
    (~0.45 s serial — measured: the bare scan is 0.11 s). Same gate as
    the sink's projection; per-row map, order-free. Interleaved A/B
    0.577 -> 0.369 s, rows identical.
    """
    from awsbeats_spark.catalog import scan_fanout

    t = tables(spark, sf_dir)
    pk = F.get_json_object("props", "$.k")
    data = F.concat(
        F.lit('{"event_id":'),
        F.col("event_id").cast("string"),
        F.lit(',"event_type":"'),
        F.col("event_type"),
        F.lit('","user_id":'),
        F.col("user_id").cast("string"),
        F.lit("}\n"),
    )
    return scan_fanout(t.events, sf_dir, "events").select(
        "event_id",
        data.alias("data"),
        F.explode(F.array_compact(F.array(pk))).alias("partition_key"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           json_extract_string(props, '$.missing') AS prop_missing
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction over the dynamic `props` column — the engine
    analog of the reference's schema-less common.MapStr field access
    (/root/reference/streams/partition_key.go:26-38)."""
    t = tables(spark, sf_dir)
    return t.events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.get_json_object("props", "$.missing").alias("prop_missing"),
    )


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           length(c_name) AS name_len,
           c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS seg_nation,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_num,
           substr(c_name, 1, 8) AS name_prefix
    FROM customer
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t.customer.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_num"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS order_month_start,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").cast("date").cast("string").alias("order_month_start"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 2) AS net_price,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 2) AS charged,
           CAST(floor(l_quantity / 10) AS BIGINT) AS qty_bucket,
           abs(l_discount - 0.05) AS disc_dist,
           CAST(l_quantity AS INT) % 7 AS qty_mod
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tables(spark, sf_dir)
    li = t.lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rnd(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias("net_price"),
        rnd(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("charged"),
        F.floor(F.col("l_quantity") / 10).cast("bigint").alias("qty_bucket"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dist"),
        (F.col("l_quantity").cast("int") % 7).alias("qty_mod"),
    )


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K by sort: compiles to TakeOrderedAndProject (per-partition
    heap + driver merge of K rows), never a full global sort shuffle.
    o_orderkey tiebreaks ties deterministically."""
    t = tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@query(
    "q_flagship_revenue_by_nation",
    oracle="""
    SELECT n_name,
           round(CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                                     * 100, 0) AS BIGINT)) AS DOUBLE)
                 / 100.0, 2) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
    tags=("flagship",),
)
def q_flagship_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: revenue by nation for one region (TPC-H Q5 shape).

    Plan shape at scale: lineitem⨝orders shuffles on orderkey and
    orders⨝customer on custkey — the two unavoidable big-big shuffles
    (customer grows with SF, so no hint: AQE broadcasts it at small SF
    and shuffles at large). nation/region are fixed-size dims and get
    explicit broadcast hints; the region filter prunes the broadcast
    before it ships.
    """
    t = tables(spark, sf_dir)
    li, o, c, n, r = t.lineitem, t.orders, t.customer, t.nation, t.region
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            # exact integer-cents revenue (sf1 hardening, round 11: raw
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
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "scalar_hash",
    oracle="""
    SELECT p_partkey,
           md5(p_name) AS name_md5,
           sha256(p_brand || ':' || p_type) AS brand_type_sha,
           CAST(length(md5(p_name)) AS INT) AS md5_len
    FROM part
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash scalar functions (md5/sha256) — the content-
    addressing primitives the dedup operators build on, exposed as
    first-class scalars."""
    t = tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.concat_ws(":", "p_brand", "p_type"), 256).alias("brand_type_sha"),
        F.length(F.md5("p_name")).cast("int").alias("md5_len"),
    )


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT event_id, nullif(value, 0.0) AS v
    FROM events
    ORDER BY v ASC NULLS FIRST, event_id
    LIMIT 50
    """,
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit null-ordering sort (NULLS FIRST) over a derived nullable
    column — nulls sort consistently across engines only when the order
    spells it out; event_id tiebreaks the LIMIT deterministically."""
    t = tables(spark, sf_dir)
    return (
        t.events.select("event_id", F.nullif(F.col("value"), F.lit(0.0)).alias("v"))
        .orderBy(F.asc_nulls_first("v"), F.asc("event_id"))
        .limit(50)
    )


@query(
    "scalar_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           string_split(text, ' ')[1] AS first_token,
           array_to_string(list_sort(string_split(lower(text), ' '))[1:3], ',')
               AS first_sorted,
           list_contains(string_split(lower(text), ' '), 'the') AS has_the
    FROM documents
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar functions (split/element_at/sort/slice/contains) —
    all higher-order JVM expressions inside whole-stage codegen; arrays
    never leave the row, so this stays a pure projection at any scale."""
    t = tables(spark, sf_dir)
    toks = F.split("text", " ", -1)
    ltoks = F.split(F.lower("text"), " ", -1)
    return t.documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_join(F.slice(F.array_sort(ltoks), 1, 3), ",").alias("first_sorted"),
        F.array_contains(ltoks, "the").alias("has_the"),
    )


@query(
    "scan_partition_pruned",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS dt,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) >= DATE '2024-01-25'
    GROUP BY 1, 2
    """,
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned table layout + partition pruning, end to end:
    the events table is written partitioned by day (dt=...) — the
    layout a 100-TB event lake actually uses — then read back with a
    date predicate that must prune at the DIRECTORY level
    (PartitionFilters in the scan, pinned by tests/test_plans.py), so
    five of thirty day-partitions are opened and the rest never touch
    I/O. The write is executor-parallel (repartition by dt, one file
    per day here); the oracle computes the same aggregate from the
    unpartitioned source."""
    from awsbeats_spark.functions.workdirs import work_dir

    t = tables(spark, sf_dir)
    lake = work_dir("events_lake", sf_dir)
    (
        t.events.withColumn("dt", F.col("ts").cast("date").cast("string"))
        .repartition("dt")
        .write.partitionBy("dt")
        .mode("overwrite")
        .parquet(lake)
    )
    import glob
    import os

    if not glob.glob(os.path.join(lake, "dt=*")):
        # zero-row source: the partitioned write emits no directories and
        # the reader cannot infer a schema from nothing — return the
        # operator's (empty) contract shape instead of raising
        return spark.createDataFrame(
            [], "dt string, event_type string, n_events long, sum_value double"
        )
    return (
        spark.read.parquet(lake)
        .filter(F.col("dt") >= "2024-01-25")
        .groupBy("dt", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            rnd(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("dt").cast("string").alias("dt"), "event_type", "n_events", "sum_value")
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT event_type,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN has_v2 THEN 1 ELSE 0 END) AS BIGINT) AS n_v2_rows,
           round(sum(CASE WHEN has_v2 THEN value ELSE 0 END), 2) AS v2_value
    FROM (
        SELECT event_type, value, FALSE AS has_v2 FROM events WHERE event_id % 2 = 0
        UNION ALL
        SELECT event_type, value, TRUE AS has_v2 FROM events WHERE event_id % 2 = 1
    )
    GROUP BY event_type
    """,
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across file generations: generation-1 files lack
    the `source_v2` column, generation-2 files carry it; a mergeSchema
    read unions the physical schemas and fills nulls for old files —
    the exact situation a long-lived 100-TB lake is always in (columns
    are added, history is never rewritten). The aggregate proves rows
    from both generations survive with correct null semantics. Writes
    are executor-parallel; at scale mergeSchema cost is footer-only and
    is paid once per listing (or avoided with a table catalog)."""
    from awsbeats_spark.functions.workdirs import work_dir

    t = tables(spark, sf_dir)
    lake = work_dir("events_evo", sf_dir)
    base = t.events.select("event_id", "event_type", "value")
    base.filter(F.col("event_id") % 2 == 0).write.mode("overwrite").parquet(
        f"{lake}/gen=1"
    )
    base.filter(F.col("event_id") % 2 == 1).withColumn(
        "source_v2", F.lit("ingest-v2")
    ).write.mode("overwrite").parquet(f"{lake}/gen=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{lake}/gen=1", f"{lake}/gen=2"
    )
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("source_v2").isNotNull().cast("long")).alias("n_v2_rows"),
        rnd(
            F.sum(F.when(F.col("source_v2").isNotNull(), F.col("value")).otherwise(0.0)),
            2,
        ).alias("v2_value"),
    )


# --------------------------------------------------------------------------
# Error-safe scalar surface: try_* arithmetic and casts
# --------------------------------------------------------------------------


@query(
    "scalar_try_safe_math",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey,
           CASE WHEN round(l_quantity, 0) - 25 = 0 THEN NULL
                ELSE round(l_extendedprice / (round(l_quantity, 0) - 25), 4)
           END AS price_per_off25,
           TRY_CAST(l_returnflag AS BIGINT) AS flag_as_int,
           TRY_CAST(CASE WHEN l_linenumber % 2 = 0
                          THEN CAST(l_linenumber AS VARCHAR)
                          ELSE l_returnflag END AS BIGINT) AS qty_int,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE round(l_tax / l_discount, 4) END AS tax_per_discount
    FROM lineitem
    """,
)
def scalar_try_safe_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar surface: `try_divide` / `try_cast` return NULL
    where ANSI mode would raise (divide-by-zero, malformed cast) — the
    expressions a 100-TB pipeline needs so ONE bad row degrades to NULL
    instead of killing a 6-hour job. Single-pass projection, all
    codegen; the oracle mirrors try-semantics with CASE/TRY_CAST."""
    li = tables(spark, sf_dir).lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_suppkey",
        rnd(
            F.try_divide(
                F.col("l_extendedprice"), F.round("l_quantity") - 25
            ),
            4,
        ).alias("price_per_off25"),
        F.try_to_number(F.col("l_returnflag"), F.lit("999")).cast("long").alias(
            "flag_as_int"
        ),
        F.when(F.col("l_linenumber") % 2 == 0, F.col("l_linenumber").cast("string"))
        .otherwise(F.col("l_returnflag"))
        .try_cast("long")
        .alias("qty_int"),
        rnd(F.try_divide(F.col("l_tax"), F.col("l_discount")), 4).alias(
            "tax_per_discount"
        ),
    )


# --------------------------------------------------------------------------
# URL parsing surface (parse_url over a derived canonical URL)
# --------------------------------------------------------------------------


@query(
    "scalar_url_parse",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/'
                   || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param
    FROM u
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface: build a canonical URL per document (the
    testdata ships none) and split it into host / path / query-param
    with `parse_url` — the crawl-pipeline normalization step that
    precedes URL-keyed dedup. Single-pass JVM projection; the oracle
    mirrors parse_url with anchored regexes. At 100 TB this is a
    map-only scan whose host column then becomes a partition/dedup
    key."""
    t = tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    return t.documents.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


# --------------------------------------------------------------------------
# Bitmask flag packing / decoding (bitwise function surface)
# --------------------------------------------------------------------------


@query(
    "scalar_bitmask_flags",
    oracle="""
    WITH flags AS (
        SELECT o_orderkey,
               (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
             | (CASE WHEN o_totalprice > 150000 THEN 2 ELSE 0 END)
             | (CASE WHEN o_orderpriority LIKE '1%' THEN 4 ELSE 0 END)
             | (CASE WHEN year(o_orderdate) >= 1998 THEN 8 ELSE 0 END)
                   AS mask
        FROM orders
    )
    SELECT o_orderkey, CAST(mask AS BIGINT) AS mask,
           CAST(bit_count(CAST(mask AS BIGINT)) AS INT) AS n_flags,
           CAST(mask & 1 AS INT) AS is_filled,
           CAST((mask >> 1) & 1 AS INT) AS is_big,
           CAST((mask >> 2) & 1 AS INT) AS is_urgent,
           CAST((mask >> 3) & 1 AS INT) AS is_recent,
           CAST(xor(mask, 15) AS BIGINT) AS inverted
    FROM flags
    """,
)
def scalar_bitmask_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function surface: pack four business flags into one
    integer mask (OR of powers of two), then decode with shifts/AND,
    population count, and XOR — the compact flag-column encoding that
    replaces four boolean columns with one byte at 100 TB (narrower
    scan, cheaper shuffle). Pure map-side projection in both engines."""
    o = tables(spark, sf_dir).orders
    # disjoint powers of two: arithmetic + IS bitwise OR here (Column's
    # `|` operator is logical OR and rejects ints)
    mask = (
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
        + F.when(F.col("o_totalprice") > 150000, 2).otherwise(0)
        + F.when(F.col("o_orderpriority").startswith("1"), 4).otherwise(0)
        + F.when(F.year("o_orderdate") >= 1998, 8).otherwise(0)
    ).cast("long")
    m = F.col("mask")
    return o.select("o_orderkey", mask.alias("mask")).select(
        "o_orderkey",
        "mask",
        F.bit_count(m).alias("n_flags"),
        (m.bitwiseAND(1)).cast("int").alias("is_filled"),
        (F.shiftright(m, 1).bitwiseAND(1)).cast("int").alias("is_big"),
        (F.shiftright(m, 2).bitwiseAND(1)).cast("int").alias("is_urgent"),
        (F.shiftright(m, 3).bitwiseAND(1)).cast("int").alias("is_recent"),
        m.bitwiseXOR(15).alias("inverted"),
    )


# --------------------------------------------------------------------------
# Deterministic surrogate keys (UUIDv5-style from content hash)
# --------------------------------------------------------------------------


@query(
    "scalar_surrogate_key_uuid5",
    oracle="""
    WITH h AS (
        SELECT doc_id, md5('doc:' || CAST(doc_id AS VARCHAR)) AS d
        FROM documents
    )
    SELECT doc_id,
           substring(d, 1, 8) || '-' || substring(d, 9, 4) || '-5'
           || substring(d, 14, 3) || '-'
           || CASE CAST(('0x' || substring(d, 17, 1))::BIGINT % 4 AS INT)
                  WHEN 0 THEN '8' WHEN 1 THEN '9'
                  WHEN 2 THEN 'a' ELSE 'b' END
           || substring(d, 18, 3) || '-' || substring(d, 21, 12)
               AS surrogate_uuid
    FROM h
    """,
)
def scalar_surrogate_key_uuid5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate-key minting — UUIDv5-style identifiers
    derived from a namespaced content hash ('doc:' + natural key →
    md5, with the version nibble pinned to 5 and the variant nibble
    folded into 8/9/a/b per RFC 4122 layout): the ETL primitive that
    gives every entity a STABLE, collision-resistant, join-safe id
    with no sequence generator, no coordination, and no
    run-to-run drift — uuid()/monotonically_increasing_id() keys
    cannot be reproduced, so they break idempotent re-loads and
    cross-engine reconciliation; content-addressed keys are this
    engine's house discipline applied to identity itself. The same
    natural key always mints the same surrogate on Spark, DuckDB, or
    anything with md5.

    Scale shape: pure map-side string expression — whole-stage
    codegen, no UDF, no shuffle, no state."""
    t = tables(spark, sf_dir)
    d = F.md5(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")))
    variant = (
        F.conv(F.substring(d, 17, 1), 16, 10).cast("int") % 4
    )
    uuid = F.concat(
        F.substring(d, 1, 8), F.lit("-"),
        F.substring(d, 9, 4), F.lit("-5"),
        F.substring(d, 14, 3), F.lit("-"),
        F.when(variant == 0, F.lit("8"))
        .when(variant == 1, F.lit("9"))
        .when(variant == 2, F.lit("a"))
        .otherwise(F.lit("b")),
        F.substring(d, 18, 3), F.lit("-"),
        F.substring(d, 21, 12),
    )
    return t.documents.select(
        "doc_id", uuid.alias("surrogate_uuid")
    )
