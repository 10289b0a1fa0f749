"""Graph operators over the event stream: Markov transition matrix and
PageRank on the event-type transition graph.

Engine extension (SURVEY.md §2.C): iterative algorithms done the way
they must be done at 100 TB — the distributed part is the single heavy
pass that reduces the fact table to constant-size graph state (|types|²
weighted edges); the iteration then runs over that tiny state with the
lineage truncated, never rescanning the fact table per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.functions.textfns import words
from awsbeats_spark.registry import query

_DAMPING = 0.85
_PR_ITERS = 10

_TRANS_SQL = """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    cnt AS (
        SELECT prev_type AS src_type, event_type AS dst_type,
               count(*) AS n_trans
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY 1, 2
    )
    SELECT src_type, dst_type, n_trans,
           round(n_trans * 1.0 / sum(n_trans) OVER (PARTITION BY src_type),
                 6) AS prob
    FROM cnt
"""


def _transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    cnt = seq.groupBy(
        F.col("prev_type").alias("src_type"),
        F.col("event_type").alias("dst_type"),
    ).agg(F.count("*").alias("n_trans"))
    return cnt.withColumn(
        "prob",
        rnd(
            F.col("n_trans")
            * 1.0
            / F.sum("n_trans").over(Window.partitionBy("src_type")),
            6,
        ),
    )


@query("events_markov_transitions", oracle=_TRANS_SQL)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types along each
    user's timeline: P(dst | src) with counts. Scale shape: one shuffle
    on user_id for the lag window, then aggregation straight down to
    |types|² rows; the per-src normalization window runs on that tiny
    aggregate."""
    return _transitions(spark, sf_dir)


def _pagerank_oracle() -> str:
    """Unrolled-iteration DuckDB twin of graph_pagerank_transitions."""
    d = _DAMPING
    parts = [
        f"trans AS ({_TRANS_SQL})",
        "nodes AS (SELECT DISTINCT src_type AS node FROM trans)",
        "n AS (SELECT count(*) AS n_nodes FROM nodes)",
        "pr0 AS (SELECT node, 1.0 / n.n_nodes AS pr FROM nodes CROSS JOIN n)",
    ]
    for i in range(1, _PR_ITERS + 1):
        parts.append(
            f"""pr{i} AS (
            SELECT t.dst_type AS node,
                   round((1.0 - {d}) / max(n.n_nodes)
                         + {d} * sum(p.pr * t.prob), 12) AS pr
            FROM trans t
            JOIN pr{i - 1} p ON p.node = t.src_type
            CROSS JOIN n
            GROUP BY t.dst_type
        )"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, round(pr, 6) AS pagerank FROM pr{_PR_ITERS}"
    )


@query("graph_pagerank_transitions", oracle=_pagerank_oracle())
def graph_pagerank_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank (d=0.85, 10 iterations) over the event-type
    transition graph. The 100-TB-correct shape for iterative
    algorithms: ONE distributed pass reduces events to the |types|²
    edge matrix, `localCheckpoint` materializes it and truncates the
    lineage, and the ten update steps are broadcast joins over that
    constant-size state — the fact table is never rescanned per
    iteration. Each iteration rounds at 12 dp so the two engines'
    5-term float sums can't drift; final rank rounds at 6."""
    edges = _transitions(spark, sf_dir).select("src_type", "dst_type", "prob")
    # Materialize the tiny edge matrix once; iterating over the raw
    # lineage would rescan events per iteration.
    edges = edges.localCheckpoint(eager=True)
    nodes = edges.select(F.col("src_type").alias("node")).distinct()
    n_nodes = nodes.count()  # |event types| — constant-size graph state
    if n_nodes == 0:  # empty input: no graph, well-typed empty result
        return nodes.select("node", F.lit(0.0).alias("pagerank")).limit(0)
    pr = nodes.withColumn("pr", F.lit(1.0 / n_nodes))
    for _ in range(_PR_ITERS):
        pr = (
            edges.join(
                F.broadcast(pr), pr["node"] == edges["src_type"], "inner"
            )
            .groupBy(F.col("dst_type").alias("node_next"))
            .agg(
                rnd(
                    F.lit((1.0 - _DAMPING) / n_nodes)
                    + _DAMPING * F.sum(F.col("pr") * F.col("prob")),
                    12,
                ).alias("pr")
            )
            .select(F.col("node_next").alias("node"), "pr")
        )
    return pr.select("node", rnd(F.col("pr"), 6).alias("pagerank"))


@query(
    "events_path_topk",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT event_type || '>' || t1 || '>' || t2 AS path
        FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL
    )
    SELECT path, count(*) AS n_paths
    FROM paths GROUP BY path
    ORDER BY n_paths DESC, path
    LIMIT 10
    """,
)
def events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-step event paths across user timelines
    (order-2 sequence mining; the Markov matrix above is order-1).
    Scale shape: the user_id window shuffle produces path strings that
    aggregate to at most |types|³ rows — map-side partials absorb the
    volume — and the top-10 is a TakeOrdered, not a global sort.
    Ordered by (count DESC, path) for a deterministic set."""
    ev = tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    ).filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "t1", "t2").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(F.desc("n_paths"), F.asc("path"))
        .limit(10)
    )


_COOC_FRAC = 0.2  # an edge = word pair co-occurring in >= 20% of docs


# Shared verbatim by graph_triangle_count and the local clustering
# coefficient composed on the same graph — one edge definition, zero
# drift between the global count and the per-node decomposition.
_COOC_EDGES_SQL = f"""
    tok AS (
        SELECT DISTINCT doc_id, unnest(
            list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
        ) AS w
        FROM documents
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    edges AS (
        SELECT a.w AS wa, b.w AS wb, count(*) AS n_cooc
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.w < b.w
        GROUP BY a.w, b.w
        HAVING count(*) >= (SELECT {_COOC_FRAC} * n_docs FROM n)
    ),
    tris AS (
        SELECT e1.wa AS a, e1.wb AS b, e2.wb AS c
        FROM edges e1
        JOIN edges e2 ON e1.wb = e2.wa
        JOIN edges e3 ON e3.wa = e1.wa AND e3.wb = e2.wb
    )"""


def _cooc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical (wa < wb) co-occurrence edges of the word graph (see
    graph_triangle_count's docstring for the scale argument)."""
    t = tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.explode(F.array_distinct(words())).alias("w")
    )
    n = t.documents.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.w") < F.col("b.w")),
        )
        .groupBy(F.col("a.w").alias("wa"), F.col("b.w").alias("wb"))
        .agg(F.count(F.lit(1)).alias("n_cooc"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("n_cooc") >= _COOC_FRAC * F.col("n_docs"))
        .select("wa", "wb")
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH {_COOC_EDGES_SQL}
    SELECT (SELECT count(*) FROM edges) AS n_edges,
           count(*) AS n_triangles
    FROM tris
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the word co-occurrence graph of `documents`
    (edge = pair co-occurring in >= 20% of docs). Engine extension: the
    canonical distributed triangle algorithm — canonicalize every edge
    a<b, then count paths a->b->c closed by edge (a,c) with two
    equi-joins. The a<b<c ordering counts each triangle exactly once
    AND is the degree-ordering trick that keeps the path join from
    exploding on hub nodes.

    Scale: pairs come from the classic tok-self-join on doc_id over the
    distinct (doc_id, word) relation. The tempting join-free variant —
    nested transform over the word array building (i, j) pairs in-row —
    re-evaluates the sorted-distinct-words pipeline once per ELEMENT
    (CollapseProject inlining; see textfns.shingles) and measured 7x
    slower at sf0.1, so the single-eval explode + equi-join wins even
    with its shuffle. Pair volume is bounded by distinct-words-per-doc
    squared, not corpus size; the (wa, wb) aggregate is map-side
    partial; the triangle joins run on the thresholded edge relation,
    orders of magnitude smaller than the corpus. The co-occurrence
    threshold scales with corpus size (a fraction via a broadcast 1-row
    aggregate, not a driver-side count), so edge density — and plan
    shape — is SF-stable."""
    edges = _cooc_edges(spark, sf_dir)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = e1.join(e2, F.col("e1.wb") == F.col("e2.wa")).join(
        e3,
        (F.col("e3.wa") == F.col("e1.wa")) & (F.col("e3.wb") == F.col("e2.wb")),
    )
    return tris.agg(F.count(F.lit(1)).alias("n_triangles")).crossJoin(
        edges.agg(F.count(F.lit(1)).alias("n_edges"))
    ).select("n_edges", "n_triangles")


@query(
    "events_attribution_last_touch",
    oracle="""
    WITH attributed AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
        FROM events
    )
    SELECT coalesce(touch, '(none)') AS touch_type,
           count(*) AS n_purchases,
           round(sum(value), 2) AS attributed_value
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY coalesce(touch, '(none)')
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase is credited to the user's
    most recent PRIOR non-purchase event type ('(none)' when the
    purchase opens the timeline). One window pass per user timeline —
    a single shuffle on user_id, the natural partition key — then a
    tiny groupBy over |event_types| rows. The (ts, event_id) ordering
    tiebreaker makes attribution deterministic under same-timestamp
    events."""
    ev = tables(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", "value", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce(F.col("touch"), F.lit("(none)")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            rnd(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@query(
    "events_pattern_match",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM events GROUP BY user_id
    )
    SELECT user_id, path
    FROM seq
    WHERE regexp_matches(path, 'view(>[a-z]+)*?>purchase')
    """,
)
def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern over user timelines: users
    whose event path contains a view ... purchase subsequence (any
    events between). The timeline is assembled with ONE sort-based
    aggregate on user_id (array_sort over (ts,event_id,type) structs —
    no window pass needed) and the pattern is a single JVM regex per
    user — the cheap CEP shape: shuffle once on the session key, then
    map-side regex. The deterministic (ts, event_id) ordering makes the
    path string reproducible under equal timestamps."""
    ev = tables(spark, sf_dir).events
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ),
        lambda s: s["event_type"],
    )
    return (
        ev.groupBy("user_id")
        .agg(F.array_join(ordered, ">").alias("path"))
        .filter(F.col("path").rlike("view(>[a-z]+)*?>purchase"))
    )


# --------------------------------------------------------------------------
# Item-item Jaccard over the user-event bipartite graph
# --------------------------------------------------------------------------


@query(
    "graph_type_overlap_jaccard",
    oracle="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    sizes AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
        FROM ut GROUP BY 1
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_shared,
           round(p.n_shared * 1.0
                 / (sa.n_users + sb.n_users - p.n_shared), 6) AS jaccard
    FROM pairs p
    JOIN sizes sa ON p.type_a = sa.event_type
    JOIN sizes sb ON p.type_b = sb.event_type
    """,
)
def graph_type_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item similarity on the user→event_type bipartite graph:
    Jaccard of the audience sets for every type pair, via
    inclusion-exclusion (|A∩B| from a user-keyed self-join, |A∪B| =
    |A|+|B|-|A∩B|). Scale shape: the co-occurrence self-join runs on
    the DISTINCT (user, type) projection — per-user fan-out is bounded
    by |types|² (tiny), so the shuffle carries bucket-level rows, never
    raw events; audience sizes broadcast back onto the pair table. This
    is the item-based-CF shape that survives 10^9 users, where a
    user-user pairing would not."""
    ev = tables(spark, sf_dir).events
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("na")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("nb")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_shared",
            rnd(
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


# --------------------------------------------------------------------------
# Bipartite projection: supplier-supplier co-supply weights, top-k bounded
# --------------------------------------------------------------------------

_PROJ_TOPK = 5


@query(
    "graph_bipartite_projection",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT l_suppkey AS supp, l_partkey AS part FROM lineitem
    ),
    pairs AS (
        SELECT a.supp AS supp_a, b.supp AS supp_b,
               CAST(count(*) AS BIGINT) AS shared_parts
        FROM edges a JOIN edges b
          ON a.part = b.part AND a.supp <> b.supp
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY supp_a
                   ORDER BY shared_parts DESC, supp_b) AS rk
        FROM pairs
    )
    SELECT supp_a, supp_b, shared_parts, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {_PROJ_TOPK}
    """,
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-mode projection of the supplier-part bipartite graph:
    supplier pairs weighted by co-supplied part count, bounded to each
    supplier's top 5 strongest neighbors — the construction
    behind co-purchase, co-authorship, and co-engagement graphs. Scale
    shape: the projection is the textbook explosion risk (a part with
    d suppliers emits d² pairs), and the two levers this operator
    applies are the ones that survive 100 TB: (1) DISTINCT the
    bipartite edges first (multiplicity doesn't change co-occurrence
    membership and shrinks the join input), (2) bound the OUTPUT per
    node with a rank window (like dedup_ngram_topk_bounded). The
    third lever — drop hub parts above a degree cap, exactly
    dedup_ngram_df_capped's move — is documented as the knob to turn
    when part-degree skew appears; the equi-join on part remains a
    plain hash join throughout."""
    li = tables(spark, sf_dir).lineitem
    edges = li.select(
        F.col("l_suppkey").alias("supp"), F.col("l_partkey").alias("part")
    ).distinct()
    a = edges.select(F.col("supp").alias("supp_a"), "part")
    b = edges.select(F.col("supp").alias("supp_b"), "part")
    pairs = (
        a.join(b, "part")
        .filter(F.col("supp_a") != F.col("supp_b"))
        .groupBy("supp_a", "supp_b")
        .agg(F.count(F.lit(1)).alias("shared_parts"))
    )
    rk = F.row_number().over(
        Window.partitionBy("supp_a").orderBy(
            F.desc("shared_parts"), F.asc("supp_b")
        )
    )
    return (
        pairs.withColumn("rk", rk)
        .filter(F.col("rk") <= _PROJ_TOPK)
        .select(
            "supp_a",
            "supp_b",
            F.col("shared_parts").cast("long").alias("shared_parts"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


@query(
    "graph_degree_distribution",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT l_suppkey, l_partkey FROM lineitem
    ),
    deg AS (
        SELECT l_suppkey, CAST(count(*) AS BIGINT) AS degree
        FROM edges GROUP BY l_suppkey
    )
    SELECT degree, CAST(count(*) AS BIGINT) AS n_suppliers
    FROM deg GROUP BY degree
    """,
)
def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the supplier→part bipartite graph — the
    first diagnostic run before any graph algorithm at scale (degree
    skew decides salting/threshold strategy, exactly like
    dq_join_key_skew_profile does for join keys). Two cheap aggregates
    after a DISTINCT edge reduction; output is |distinct degrees| rows,
    effectively constant. The heavy tail this histogram exposes is what
    graph_bipartite_projection's top-k cap defends against."""
    t = tables(spark, sf_dir)
    edges = t.lineitem.select("l_suppkey", "l_partkey").distinct()
    deg = edges.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    return deg.groupBy("degree").agg(
        F.count(F.lit(1)).cast("long").alias("n_suppliers")
    )


@query(
    "graph_assortativity_degree",
    oracle="""
    WITH edges AS (
        SELECT DISTINCT l_suppkey AS supp, l_partkey AS part FROM lineitem
    ),
    ds AS (SELECT supp, count(*) AS deg_s FROM edges GROUP BY supp),
    dp AS (SELECT part, count(*) AS deg_p FROM edges GROUP BY part),
    j AS (
        SELECT e.supp, e.part, ds.deg_s, dp.deg_p
        FROM edges e
        JOIN ds ON ds.supp = e.supp
        JOIN dp ON dp.part = e.part
    )
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           round(avg(deg_s), 4) AS avg_supp_degree,
           round(avg(deg_p), 4) AS avg_part_degree,
           round(corr(deg_s, deg_p), 4) AS assortativity
    FROM j
    """,
)
def graph_assortativity_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite degree assortativity of the supplier-part graph: the
    Pearson correlation, over EDGES, between the supplier's degree and
    the part's degree. Positive = hub suppliers concentrate on hub
    parts (a fragile core-periphery supply network: one hub failure
    cascades); negative = hubs spread across the tail (resilient,
    disassortative — the shape most real procurement graphs have).
    The one-number structural summary that tells you whether the
    bipartite projection (graph_bipartite_projection) will explode:
    assortative graphs produce dense projections.

    Scale shape: distinct edges, two degree aggregates keyed by each
    endpoint, joined back to edges on their own keys (both joins are
    co-partitioned aggregate-to-edge, broadcastable when one side's
    key domain is dimension-sized), and a single corr fold. No pair
    enumeration anywhere — this diagnoses the projection's cost
    without paying it."""
    li = tables(spark, sf_dir).lineitem
    edges = li.select(
        F.col("l_suppkey").alias("supp"), F.col("l_partkey").alias("part")
    ).distinct()
    ds = edges.groupBy("supp").agg(F.count(F.lit(1)).alias("deg_s"))
    dp = edges.groupBy("part").agg(F.count(F.lit(1)).alias("deg_p"))
    j = edges.join(ds, "supp").join(dp, "part")
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        rnd(F.avg("deg_s"), 4).alias("avg_supp_degree"),
        rnd(F.avg("deg_p"), 4).alias("avg_part_degree"),
        rnd(F.corr("deg_s", "deg_p"), 4).alias("assortativity"),
    )


@query(
    "events_attribution_first_touch",
    oracle="""
    WITH attributed AS (
        SELECT event_type, value,
               first_value(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS touch
        FROM events
    )
    SELECT coalesce(touch, '(none)') AS touch_type,
           count(*) AS n_purchases,
           round(sum(value), 2) AS attributed_value
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY coalesce(touch, '(none)')
    """,
)
def events_attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-touch attribution — the acquisition-side mirror of
    events_attribution_last_touch: each purchase is credited to the
    EARLIEST prior non-purchase event type in the user's timeline
    (which channel brought them in, vs which one closed). Running both
    models over the same log and diffing the credit tables is the
    standard way to bound how much the attribution choice itself moves
    budget. Same plan as the last-touch op: one window pass per user
    timeline (first_value ignore-nulls over the preceding frame), one
    shuffle on user_id, then a tiny groupBy over |event_types| rows;
    the (ts, event_id) tiebreaker pins same-timestamp determinism."""
    ev = tables(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.first(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", "value", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("touch"), F.lit("(none)")).alias("touch_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            rnd(F.sum("value"), 2).alias("attributed_value"),
        )
    )


def _trans_entropy_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    return f"""
    WITH trans AS ({QUERIES['events_markov_transitions'].oracle}),
    tot AS (SELECT sum(n_trans) AS n_total FROM trans)
    SELECT CAST(tot.n_total AS BIGINT) AS n_transitions,
           CAST(count(*) AS BIGINT) AS n_edges,
           round(-sum((trans.n_trans / tot.n_total) * ln(trans.prob)), 6)
               AS entropy_rate_nats,
           round(-sum((trans.n_trans / tot.n_total)
                      * ln(trans.n_trans / tot.n_total)), 6)
               AS joint_entropy_nats
    FROM trans CROSS JOIN tot
    GROUP BY tot.n_total
    """


@query("events_transition_entropy_rate", oracle=_trans_entropy_oracle())
def events_transition_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy RATE of the user-behavior Markov chain: the average
    per-step conditional surprise -Σ p(s,t)·ln p(t|s), weighted by the
    empirical joint transition frequency, alongside the joint entropy
    of the (src, dst) pair distribution. Entropy rate near the joint
    entropy minus source entropy means the chain is near-memoryless
    (knowing the previous action barely helps); a much lower rate
    means strong behavioral structure — the one-number justification
    for sequence-aware models (events_markov_transitions is the full
    matrix this summarizes).

    Oracle composition: the transition CTE IS the registered Markov
    operator's own oracle — it consumes that op's ROUNDED conditional
    probabilities, so this summary can never drift from the matrix it
    compresses. Scale shape: arithmetic over |event_types|² aggregate
    rows; the heavy lifting (one per-user window pass) is already paid
    by the transition aggregation."""
    from awsbeats_spark.registry import QUERIES

    trans = QUERIES["events_markov_transitions"].fn(spark, sf_dir)
    tot = trans.agg(F.sum("n_trans").alias("n_total"))
    j = trans.crossJoin(F.broadcast(tot))
    p_joint = F.col("n_trans") / F.col("n_total")
    return j.groupBy("n_total").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        rnd(-F.sum(p_joint * F.log(F.col("prob"))), 6).alias(
            "entropy_rate_nats"
        ),
        rnd(-F.sum(p_joint * F.log(p_joint)), 6).alias(
            "joint_entropy_nats"
        ),
    ).select(
        F.col("n_total").cast("long").alias("n_transitions"),
        "n_edges",
        "entropy_rate_nats",
        "joint_entropy_nats",
    )


# --------------------------------------------------------------------------
# Markov honesty twin: measured top-1 next-event prediction accuracy
# --------------------------------------------------------------------------


def _markov_top1_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    return f"""
    WITH trans AS ({QUERIES['events_markov_transitions'].oracle}),
    ranked AS (
        SELECT src_type, dst_type, n_trans,
               row_number() OVER (
                   PARTITION BY src_type
                   ORDER BY n_trans DESC, dst_type) AS rk
        FROM trans
    ),
    tot AS (SELECT sum(n_trans) AS nt FROM trans),
    modal AS (
        SELECT max(dst_total) AS best_dst_total
        FROM (SELECT dst_type, sum(n_trans) AS dst_total
              FROM trans GROUP BY dst_type)
    )
    SELECT CAST(tot.nt AS BIGINT) AS n_transitions,
           CAST(count(*) AS BIGINT) AS n_states,
           round(sum(r.n_trans) * 1.0 / tot.nt, 6) AS top1_accuracy,
           round(modal.best_dst_total * 1.0 / tot.nt, 6)
               AS baseline_accuracy,
           round(sum(r.n_trans) * 1.0 / tot.nt
                 - modal.best_dst_total * 1.0 / tot.nt, 6) AS lift
    FROM ranked r CROSS JOIN tot CROSS JOIN modal
    WHERE r.rk = 1
    GROUP BY tot.nt, modal.best_dst_total
    """


@query("eval_markov_top1_accuracy", oracle=_markov_top1_oracle())
def eval_markov_top1_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Measured-quality twin of events_markov_transitions (the
    eval-alongside-every-model discipline): if you predict each user's
    next event as the argmax of the fitted transition row, what
    fraction of observed transitions do you get right — and how much
    of that is real signal vs the no-model baseline of always
    predicting the globally most common next event? top1_accuracy is
    in-sample Σ_src max_dst c(src,dst) / Σ c; lift near zero means the
    Markov structure adds nothing over the marginal and downstream
    consumers (events_pattern_match, events_path_topk) should not
    trust per-state predictions. Composed on the registered
    transitions oracle (argmax taken on exact counts, not the rounded
    prob column), so the eval cannot drift from the model it grades.

    Scale shape: everything runs on the |types|^2 transition frame —
    one rank window, two scalar folds, zero additional fact scans."""
    from awsbeats_spark.registry import QUERIES

    trans = QUERIES["events_markov_transitions"].fn(spark, sf_dir)
    rk = F.row_number().over(
        Window.partitionBy("src_type").orderBy(
            F.desc("n_trans"), F.asc("dst_type")
        )
    )
    ranked = trans.withColumn("rk", rk).filter(F.col("rk") == 1)
    tot = trans.agg(F.sum("n_trans").alias("nt"))
    modal = (
        trans.groupBy("dst_type")
        .agg(F.sum("n_trans").alias("dst_total"))
        .agg(F.max("dst_total").alias("best_dst_total"))
    )
    acc = F.sum("n_trans") / F.max("nt")
    base = F.max("best_dst_total") / F.max("nt")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(modal))
        .agg(
            F.max("nt").cast("long").alias("n_transitions"),
            F.count(F.lit(1)).cast("long").alias("n_states"),
            rnd(acc, 6).alias("top1_accuracy"),
            rnd(base, 6).alias("baseline_accuracy"),
            rnd(acc - base, 6).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Local clustering coefficient per node of the co-occurrence graph
# --------------------------------------------------------------------------


@query(
    "graph_clustering_coefficient",
    oracle=f"""
    WITH {_COOC_EDGES_SQL},
    deg AS (
        SELECT w, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT wa AS w FROM edges
              UNION ALL SELECT wb AS w FROM edges)
        GROUP BY w
    ),
    tv AS (
        SELECT w, CAST(count(*) AS BIGINT) AS n_tri
        FROM (SELECT a AS w FROM tris
              UNION ALL SELECT b AS w FROM tris
              UNION ALL SELECT c AS w FROM tris)
        GROUP BY w
    )
    SELECT d.w AS node, d.degree,
           coalesce(tv.n_tri, 0) AS n_triangles,
           round(2.0 * coalesce(tv.n_tri, 0)
                 / (d.degree * (d.degree - 1)), 6) AS lcc
    FROM deg d LEFT JOIN tv ON tv.w = d.w
    WHERE d.degree >= 2
    """,
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient per node of the word co-occurrence
    graph: lcc(v) = 2 T(v) / (deg(v) (deg(v)-1)), where T(v) counts the
    triangles through v — the per-node decomposition of
    graph_triangle_count (whose a<b<c canonical triangles each credit
    their three corners once). High-degree words with low lcc are hub
    connectors; high-lcc nodes sit inside cliques (topic clusters,
    boilerplate blocks). Nodes of degree < 2 are excluded (lcc
    undefined).

    Shares the tok/edges/tris CTEs verbatim with graph_triangle_count —
    one graph definition, zero drift. Scale shape: degrees are one
    aggregate over the thresholded edge relation (orders of magnitude
    smaller than the corpus); the triangle enumeration is the same
    two-equi-join path count; the final join runs at vocabulary grain."""
    edges = _cooc_edges(spark, sf_dir).localCheckpoint(eager=True)
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.wb") == F.col("e2.wa"))
        .join(
            e3,
            (F.col("e3.wa") == F.col("e1.wa"))
            & (F.col("e3.wb") == F.col("e2.wb")),
        )
        .select(
            F.col("e1.wa").alias("a"),
            F.col("e1.wb").alias("b"),
            F.col("e2.wb").alias("c"),
        )
    )
    deg = (
        edges.select(F.col("wa").alias("w"))
        .unionAll(edges.select(F.col("wb").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    tv = (
        tris.select(F.col("a").alias("w"))
        .unionAll(tris.select(F.col("b").alias("w")))
        .unionAll(tris.select(F.col("c").alias("w")))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    return (
        deg.join(tv, "w", "left")
        .filter(F.col("degree") >= 2)
        .select(
            F.col("w").alias("node"),
            "degree",
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            rnd(
                2.0
                * F.coalesce(F.col("n_tri"), F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("lcc"),
        )
    )


# --------------------------------------------------------------------------
# Label-propagation communities (synchronous, fixed 3 rounds)
# --------------------------------------------------------------------------

_LPA_ROUNDS = 3


def _lpa_round_sql(i: int) -> str:
    """One synchronous LPA round as a CTE pair: votes v{i} (neighbor
    label counts) then labels l{i} (mode with the (count DESC, label
    ASC) deterministic tie-break)."""
    return f"""
    v{i} AS (
        SELECT s.u, l.lbl, count(*) AS c
        FROM sym s JOIN l{i - 1} l ON s.v = l.w
        GROUP BY s.u, l.lbl
    ),
    l{i} AS (
        SELECT u AS w, lbl FROM (
            SELECT u, lbl,
                   row_number() OVER (
                       PARTITION BY u ORDER BY c DESC, lbl
                   ) AS rn
            FROM v{i}
        ) WHERE rn = 1
    )"""


@query(
    "graph_lpa_communities",
    oracle=f"""
    WITH {_COOC_EDGES_SQL},
    sym AS (
        SELECT wa AS u, wb AS v FROM edges
        UNION ALL
        SELECT wb AS u, wa AS v FROM edges
    ),
    l0 AS (SELECT DISTINCT u AS w, u AS lbl FROM sym),
    {",".join(_lpa_round_sql(i) for i in range(1, _LPA_ROUNDS + 1))},
    members AS (
        SELECT lbl AS community, count(*) AS n_nodes
        FROM l{_LPA_ROUNDS} GROUP BY lbl
    )
    SELECT l.w AS node, l.lbl AS community, m.n_nodes AS community_size
    FROM l{_LPA_ROUNDS} l JOIN members m ON m.community = l.lbl
    """,
    tags=("graph",),
)
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007) over the word co-occurrence graph — the standard
    near-linear community algorithm and the missing sibling of
    [[dedup_connected_components]]: CC merges anything connected, LPA
    splits a connected hub-and-spoke graph into its dense cores, which
    is what near-dup *family* analysis actually wants. Every node
    starts as its own label; each round every node adopts its
    neighbors' modal label with the (count DESC, label ASC) tie-break,
    all nodes updating simultaneously from the previous round's labels.
    The round count is FIXED at 3, which makes the result exactly
    reproducible in any engine (asynchronous/converged LPA is
    update-order-dependent and unverifiable); the oracle unrolls the
    same 3 rounds as plain GROUP BY CTEs.

    Scale shape: one round = one (node, label) hash aggregate plus one
    top-1 window on the vote relation — both keyed by node, map-side
    partial, no iteration-to-fixpoint driver loop. The edge relation is
    the thresholded co-occurrence graph (vocabulary grain, orders of
    magnitude smaller than the corpus; see graph_triangle_count), and
    labels are strings so the propagation carries no lookup table. At
    100 TB the rounds stay 3 scans of the edge relation regardless of
    corpus size; the final membership count is one more keyed
    aggregate."""
    edges = _cooc_edges(spark, sf_dir).localCheckpoint(eager=True)
    sym = edges.select(
        F.col("wa").alias("u"), F.col("wb").alias("v")
    ).unionAll(edges.select(F.col("wb").alias("u"), F.col("wa").alias("v")))
    labels = sym.select(F.col("u").alias("w")).distinct().withColumn(
        "lbl", F.col("w")
    )
    for _ in range(_LPA_ROUNDS):
        votes = (
            sym.join(labels, sym["v"] == labels["w"])
            .groupBy(sym["u"], labels["lbl"])
            .agg(F.count(F.lit(1)).alias("c"))
        )
        win = Window.partitionBy("u").orderBy(
            F.desc("c"), F.asc("lbl")
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("w"), "lbl")
        )
    members = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    return labels.join(members, "lbl").select(
        F.col("w").alias("node"),
        F.col("lbl").alias("community"),
        F.col("n_nodes").alias("community_size"),
    )


# --------------------------------------------------------------------------
# k-core peeling (bipartite purchase graph, fixed rounds)
# --------------------------------------------------------------------------

_KCORE_K = 20
_KCORE_ROUNDS = 3


def _kcore_round_sql(r: int) -> str:
    """One synchronous peel: degrees of round r-1's edge set, then the
    edge set restricted to endpoints with degree >= k on BOTH sides."""
    return f"""
    dc{r} AS (SELECT c, count(*) AS d FROM e{r - 1} GROUP BY c),
    dp{r} AS (SELECT p, count(*) AS d FROM e{r - 1} GROUP BY p),
    e{r} AS (
        SELECT e.c, e.p FROM e{r - 1} e
        JOIN dc{r} ON dc{r}.c = e.c AND dc{r}.d >= {_KCORE_K}
        JOIN dp{r} ON dp{r}.p = e.p AND dp{r}.d >= {_KCORE_K}
    )"""


@query(
    "graph_kcore_peel",
    oracle=f"""
    WITH e0 AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    {",".join(_kcore_round_sql(r) for r in range(1, _KCORE_ROUNDS + 1))},
    survivors AS (
        SELECT 'cust' AS side, c AS node_id, count(*) AS degree
        FROM e{_KCORE_ROUNDS} GROUP BY c
        UNION ALL
        SELECT 'part' AS side, p AS node_id, count(*) AS degree
        FROM e{_KCORE_ROUNDS} GROUP BY p
    )
    SELECT side, node_id, CAST(degree AS BIGINT) AS degree FROM survivors
    """,
    tags=("graph",),
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (Seidman 1983) on the bipartite customer-part
    purchase graph: repeatedly delete nodes with degree < k — the
    surviving core is the densely-interlocked buyer/product nucleus
    that survives cascade removal (low-degree customers drop, which
    lowers part degrees, which drops parts, ...). The dense-subgraph
    primitive next to [[graph_lpa_communities]] (which partitions) and
    [[graph_triangle_count]] (which counts local density). Rounds are
    FIXED at {_KCORE_ROUNDS}, all nodes peeling simultaneously against
    the previous round's degrees, so the result is exactly reproducible
    in any engine (iterate-to-fixpoint peeling is the limit; the fixed
    prefix is already the standard distributed formulation — each round
    is one superstep). Output: surviving nodes with their degree inside
    the round-{_KCORE_ROUNDS} subgraph.

    Scale shape: a round = two keyed COUNT aggregates (map-side
    partial) + two equi-joins back to the edge list — no windows, no
    global state, and the edge set only shrinks. At 100 TB: k-core on
    a trillion-edge purchase graph is exactly this loop on the
    (cust, part) distinct relation, hash-partitioned by each side in
    turn; peel depth stays a constant number of scans."""
    t = tables(spark, sf_dir)
    edges = (
        t.lineitem.join(
            t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"]
        )
        .select(
            F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p")
        )
        .distinct()
    )
    for _ in range(_KCORE_ROUNDS):
        dc = edges.groupBy("c").agg(F.count(F.lit(1)).alias("dcv"))
        dp = edges.groupBy("p").agg(F.count(F.lit(1)).alias("dpv"))
        edges = (
            edges.join(dc.filter(F.col("dcv") >= _KCORE_K), "c")
            .join(dp.filter(F.col("dpv") >= _KCORE_K), "p")
            .select("c", "p")
        )
    cust = edges.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    ).select(
        F.lit("cust").alias("side"), F.col("c").alias("node_id"), "degree"
    )
    part = edges.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    ).select(
        F.lit("part").alias("side"), F.col("p").alias("node_id"), "degree"
    )
    return cust.unionAll(part)


graph_kcore_peel.__doc__ = graph_kcore_peel.__doc__.replace(
    "{_KCORE_ROUNDS}", str(_KCORE_ROUNDS)
)


# --------------------------------------------------------------------------
# Item-item collaborative filtering (co-purchase cosine, bounded top-k)
# --------------------------------------------------------------------------

_RECO_TOP_K = 5
_RECO_MIN_COOC = 3


@query(
    "reco_item_item_cooccurrence",
    oracle=f"""
    WITH e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    deg AS (SELECT p, count(*) AS d FROM e GROUP BY p),
    cooc AS (
        SELECT a.p AS pa, b.p AS pb, count(*) AS n_common
        FROM e a JOIN e b ON a.c = b.c AND a.p <> b.p
        GROUP BY a.p, b.p
        HAVING count(*) >= {_RECO_MIN_COOC}
    ),
    scored AS (
        SELECT c.pa AS part_id, c.pb AS similar_part,
               CAST(c.n_common AS BIGINT) AS n_common,
               round(c.n_common / sqrt(da.d * db.d), 6) AS cosine
        FROM cooc c
        JOIN deg da ON da.p = c.pa
        JOIN deg db ON db.p = c.pb
    )
    SELECT part_id, similar_part, n_common, cosine FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY part_id
                   ORDER BY cosine DESC, similar_part) AS rn
        FROM scored
    ) WHERE rn <= {_RECO_TOP_K}
    """,
    tags=("graph", "reco"),
)
def reco_item_item_cooccurrence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Item-item collaborative filtering (the Amazon 2003 item-to-item
    shape, Linden et al.): two parts are similar when the same
    customers buy both, scored by co-occurrence cosine
    n_common / sqrt(deg_a * deg_b), keeping the top {k} neighbors per
    part — the recommender primitive on the SAME bipartite purchase
    relation that [[graph_kcore_peel]] densifies and
    [[graph_bipartite_projection]] projects. A minimum-co-occurrence
    floor ({floor} shared customers) plays the hot-bucket/df-cap role:
    singleton coincidences never become candidate pairs, and the
    directed output is rank-capped per anchor (bounded like
    [[dedup_ngram_topk_bounded]]).

    Scale shape: the pair generation is the classic self-join on the
    user key — fan-out bounded by parts-per-customer squared, NOT
    corpus size (a user buys tens of parts, so each contributes a
    bounded pair block; a pathological power-user is exactly the
    df-cap case and would be dropped upstream at 100 TB). The cosine
    join touches the part-degree relation (item grain), and the top-k
    window sorts per-part groups bounded by the co-occurrence floor."""
    t = tables(spark, sf_dir)
    e = (
        t.lineitem.join(
            t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"]
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    deg = e.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    ea, eb = e.alias("ea"), e.alias("eb")
    cooc = (
        ea.join(
            eb,
            (F.col("ea.c") == F.col("eb.c"))
            & (F.col("ea.p") != F.col("eb.p")),
        )
        .groupBy(F.col("ea.p").alias("pa"), F.col("eb.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= _RECO_MIN_COOC)
    )
    da = deg.select(F.col("p").alias("pa"), F.col("d").alias("dav"))
    db = deg.select(F.col("p").alias("pb"), F.col("d").alias("dbv"))
    scored = (
        cooc.join(da, "pa")
        .join(db, "pb")
        .select(
            F.col("pa").alias("part_id"),
            F.col("pb").alias("similar_part"),
            F.col("n_common").cast("long").alias("n_common"),
            rnd(
                F.col("n_common") / F.sqrt(F.col("dav") * F.col("dbv")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("part_id").orderBy(
        F.desc("cosine"), F.asc("similar_part")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECO_TOP_K)
        .select("part_id", "similar_part", "n_common", "cosine")
    )


reco_item_item_cooccurrence.__doc__ = (
    reco_item_item_cooccurrence.__doc__
    .replace("{k}", str(_RECO_TOP_K))
    .replace("{floor}", str(_RECO_MIN_COOC))
)


# --------------------------------------------------------------------------
# User-level recommendations from the item-item model
# --------------------------------------------------------------------------

_RECO_USER_K = 5
_RECO_N_USERS = 20  # bounded demo user set: lowest custkeys


def _reco_user_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    sims = QUERIES["reco_item_item_cooccurrence"].oracle
    return f"""
    WITH sims AS ({sims}),
    e AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    users AS (
        SELECT DISTINCT c FROM e
        ORDER BY c LIMIT {_RECO_N_USERS}
    ),
    hist AS (SELECT e.c, e.p FROM e JOIN users USING (c)),
    scored AS (
        SELECT h.c AS custkey, s.similar_part AS part_id,
               round(sum(s.cosine), 6) AS score,
               CAST(count(*) AS BIGINT) AS n_sources
        FROM hist h
        JOIN sims s ON s.part_id = h.p
        LEFT JOIN hist o ON o.c = h.c AND o.p = s.similar_part
        WHERE o.p IS NULL
        GROUP BY h.c, s.similar_part
    )
    SELECT custkey, part_id, score, n_sources FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY custkey
                   ORDER BY score DESC, part_id) AS rn
        FROM scored
    ) WHERE rn <= {_RECO_USER_K}
    """


@query(
    "reco_user_recommendations",
    oracle=_reco_user_oracle(),
    tags=("graph", "reco"),
)
def reco_user_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level recommendations from the item-item model: a user's
    score for an unseen part is the sum of [[reco_item_item_cooccurrence]]
    similarities from every part they already bought (the truncated
    item-kNN scorer — only each item's top neighbors contribute, which
    is what bounds the work), minus anything already in their history;
    top {k} per user for a bounded {n}-user demo cohort. The oracle
    embeds the registered item-item op's own SQL, so scorer and model
    cannot drift ([[sim_search_cascade_rerank]] composition
    discipline); ranking uses the model's ROUNDED cosines so the
    cross-engine sum is exact.

    Scale shape: scoring is one equi-join of user histories against
    the truncated similarity table — fan-out <= history x k per user,
    independent of catalog size — then a keyed sum and a top-k window.
    The anti-join against own history is the same relation reused. At
    100 TB the similarity table is the small broadcast side (items x
    k rows); user histories stream through it."""
    from awsbeats_spark.registry import QUERIES

    t = tables(spark, sf_dir)
    sims = QUERIES["reco_item_item_cooccurrence"].fn(spark, sf_dir)
    e = (
        t.lineitem.join(
            t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"]
        )
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    users = (
        e.select("c").distinct().orderBy("c").limit(_RECO_N_USERS)
    )
    hist = e.join(F.broadcast(users), "c").localCheckpoint(eager=True)
    scored = (
        hist.join(sims, hist["p"] == sims["part_id"])
        .join(
            hist.select(
                F.col("c").alias("oc"), F.col("p").alias("op")
            ),
            (F.col("c") == F.col("oc"))
            & (F.col("similar_part") == F.col("op")),
            "left_anti",
        )
        .groupBy(
            F.col("c").alias("custkey"),
            F.col("similar_part").alias("part_id"),
        )
        .agg(
            rnd(F.sum("cosine"), 6).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
        )
    )
    w = Window.partitionBy("custkey").orderBy(
        F.desc("score"), F.asc("part_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RECO_USER_K)
        .select("custkey", "part_id", "score", "n_sources")
    )


reco_user_recommendations.__doc__ = (
    reco_user_recommendations.__doc__
    .replace("{k}", str(_RECO_USER_K))
    .replace("{n}", str(_RECO_N_USERS))
)


# --------------------------------------------------------------------------
# Offline recommender evaluation: leave-last-order-out hit rate
# --------------------------------------------------------------------------


@query(
    "eval_reco_holdout_hitrate",
    oracle=f"""
    WITH last_o AS (
        SELECT c, last_key FROM (
            SELECT o_custkey AS c, o_orderkey AS last_key,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate DESC, o_orderkey DESC
                   ) AS rn
            FROM orders
        ) WHERE rn = 1
    ),
    train AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN last_o ON last_o.c = o.o_custkey
        WHERE o.o_orderkey <> last_o.last_key
    ),
    hold AS (
        SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN last_o ON last_o.c = o.o_custkey
        WHERE o.o_orderkey = last_o.last_key
    ),
    eligible AS (
        SELECT DISTINCT t.c FROM train t JOIN hold h ON h.c = t.c
    ),
    deg AS (SELECT p, count(*) AS d FROM train GROUP BY p),
    cooc AS (
        SELECT a.p AS pa, b.p AS pb, count(*) AS n_common
        FROM train a JOIN train b ON a.c = b.c AND a.p <> b.p
        GROUP BY a.p, b.p
        HAVING count(*) >= {_RECO_MIN_COOC}
    ),
    sims AS (
        SELECT pa AS part_id, pb AS similar_part, cosine FROM (
            SELECT c.pa, c.pb,
                   round(c.n_common / sqrt(da.d * db.d), 6) AS cosine,
                   row_number() OVER (
                       PARTITION BY c.pa
                       ORDER BY c.n_common / sqrt(da.d * db.d) DESC, c.pb
                   ) AS rn
            FROM cooc c
            JOIN deg da ON da.p = c.pa
            JOIN deg db ON db.p = c.pb
        ) WHERE rn <= {_RECO_TOP_K}
    ),
    recs AS (
        SELECT custkey, part_id FROM (
            SELECT h.c AS custkey, s.similar_part AS part_id,
                   round(sum(s.cosine), 6) AS score,
                   row_number() OVER (
                       PARTITION BY h.c
                       ORDER BY round(sum(s.cosine), 6) DESC,
                                s.similar_part
                   ) AS rn
            FROM train h
            JOIN sims s ON s.part_id = h.p
            LEFT JOIN train o ON o.c = h.c AND o.p = s.similar_part
            WHERE o.p IS NULL
            GROUP BY h.c, s.similar_part
        ) WHERE rn <= {_RECO_USER_K}
    ),
    pop AS (
        SELECT p FROM deg
        ORDER BY d DESC, p LIMIT {_RECO_USER_K}
    ),
    cf_hits AS (
        SELECT DISTINCT r.custkey AS c
        FROM recs r JOIN hold h ON h.c = r.custkey AND h.p = r.part_id
    ),
    pop_hits AS (
        SELECT DISTINCT h.c
        FROM hold h JOIN pop ON pop.p = h.p
        JOIN eligible e ON e.c = h.c
    )
    SELECT CAST((SELECT count(*) FROM eligible) AS BIGINT) AS n_users,
           CAST((SELECT count(*) FROM cf_hits) AS BIGINT) AS n_hits_cf,
           round((SELECT count(*) FROM cf_hits)
                 / CAST((SELECT count(*) FROM eligible) AS DOUBLE), 6)
               AS hitrate_cf,
           CAST((SELECT count(*) FROM pop_hits) AS BIGINT) AS n_hits_pop,
           round((SELECT count(*) FROM pop_hits)
                 / CAST((SELECT count(*) FROM eligible) AS DOUBLE), 6)
               AS hitrate_pop
    """,
    tags=("graph", "reco", "eval"),
)
def eval_reco_holdout_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline recommender evaluation — leave-last-order-out: the
    item-item model is refit on every customer's history MINUS their
    chronologically last order, top-{k} recommendations are generated
    exactly as [[reco_user_recommendations]] scores them, and a user
    counts as a hit when any recommendation appears in the held-out
    basket. The verdict ships NEXT TO its baseline: the same hit rate
    for recommending the 5 globally most-purchased train parts to
    everyone — a recommender that can't beat popularity is reported,
    not presumed ([[ts_holt_linear_forecast]]'s naive-persistence
    discipline, applied to ranking). Same model constants as the
    registered item-item op (floor {floor}, {topk} neighbors), so the
    eval measures the configuration the engine actually ships.

    Scale shape: the temporal split is one max_by per customer; model
    refit is the item-item pipeline on the train relation (same
    bounded fan-outs); scoring is histories against the truncated
    similarity table; hits are two semi-joins. Everything folds to a
    single output row from keyed partials — the whole evaluation is a
    batch job, no driver loops."""
    t = tables(spark, sf_dir)
    wl = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    last_o = (
        t.orders.withColumn("lrn", F.row_number().over(wl))
        .filter(F.col("lrn") == 1)
        .select(
            F.col("o_custkey").alias("c"),
            F.col("o_orderkey").alias("last_key"),
        )
    )
    edges = (
        t.lineitem.join(
            t.orders, t.lineitem["l_orderkey"] == t.orders["o_orderkey"]
        )
        .join(last_o, t.orders["o_custkey"] == last_o["c"])
        .select(
            F.col("o_custkey").alias("cc"),
            F.col("l_partkey").alias("p"),
            (F.col("o_orderkey") == F.col("last_key")).alias("is_hold"),
        )
    )
    train = (
        edges.filter(~F.col("is_hold"))
        .select(F.col("cc").alias("c"), "p")
        .distinct()
        .localCheckpoint(eager=True)
    )
    hold = (
        edges.filter(F.col("is_hold"))
        .select(F.col("cc").alias("c"), "p")
        .distinct()
        .localCheckpoint(eager=True)
    )
    eligible = train.select("c").distinct().join(
        hold.select("c").distinct(), "c", "left_semi"
    )
    deg = train.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    ta, tb = train.alias("ta"), train.alias("tb")
    cooc = (
        ta.join(
            tb,
            (F.col("ta.c") == F.col("tb.c"))
            & (F.col("ta.p") != F.col("tb.p")),
        )
        .groupBy(F.col("ta.p").alias("pa"), F.col("tb.p").alias("pb"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= _RECO_MIN_COOC)
    )
    da = deg.select(F.col("p").alias("pa"), F.col("d").alias("dav"))
    db = deg.select(F.col("p").alias("pb"), F.col("d").alias("dbv"))
    raw_cos = F.col("n_common") / F.sqrt(F.col("dav") * F.col("dbv"))
    ws = Window.partitionBy("pa").orderBy(raw_cos.desc(), F.asc("pb"))
    sims = (
        cooc.join(da, "pa")
        .join(db, "pb")
        .withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= _RECO_TOP_K)
        .select(
            F.col("pa").alias("part_id"),
            F.col("pb").alias("similar_part"),
            rnd(raw_cos, 6).alias("cosine"),
        )
    )
    scored = (
        train.join(sims, train["p"] == sims["part_id"])
        .join(
            train.select(F.col("c").alias("oc"), F.col("p").alias("op")),
            (F.col("c") == F.col("oc"))
            & (F.col("similar_part") == F.col("op")),
            "left_anti",
        )
        .groupBy(
            F.col("c").alias("custkey"),
            F.col("similar_part").alias("part_id"),
        )
        .agg(rnd(F.sum("cosine"), 6).alias("score"))
    )
    wr = Window.partitionBy("custkey").orderBy(
        F.desc("score"), F.asc("part_id")
    )
    recs = (
        scored.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= _RECO_USER_K)
        .select("custkey", "part_id")
    )
    pop = F.broadcast(
        deg.orderBy(F.desc("d"), F.asc("p")).limit(_RECO_USER_K)
        .select(F.col("p").alias("pop_p"))
    )
    cf_hits = recs.join(
        hold,
        (recs["custkey"] == hold["c"]) & (recs["part_id"] == hold["p"]),
        "left_semi",
    ).select("custkey").distinct()
    pop_hits = (
        hold.join(pop, hold["p"] == pop["pop_p"], "left_semi")
        .select("c")
        .distinct()
        .join(eligible, "c", "left_semi")
    )
    n_users = eligible.count()
    n_cf = cf_hits.count()
    n_pop = pop_hits.count()
    return spark.createDataFrame(
        [(n_users, n_cf, round(n_cf / n_users, 6),
          n_pop, round(n_pop / n_users, 6))],
        "n_users long, n_hits_cf long, hitrate_cf double,"
        " n_hits_pop long, hitrate_pop double",
    )


eval_reco_holdout_hitrate.__doc__ = (
    eval_reco_holdout_hitrate.__doc__
    .replace("{k}", str(_RECO_USER_K))
    .replace("{floor}", str(_RECO_MIN_COOC))
    .replace("{topk}", str(_RECO_TOP_K))
)


# --------------------------------------------------------------------------
# Weighted reciprocity of the event transition graph
# --------------------------------------------------------------------------


def _reciprocity_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    markov = QUERIES["events_markov_transitions"].oracle
    return f"""
    WITH t AS ({markov}),
    pairs AS (
        SELECT a.src_type, a.dst_type, a.n_trans AS w_ab,
               coalesce(b.n_trans, 0) AS w_ba
        FROM t a
        LEFT JOIN t b ON b.src_type = a.dst_type
                     AND b.dst_type = a.src_type
        WHERE a.src_type <> a.dst_type
    )
    SELECT CAST(count(*) AS BIGINT) AS n_directed_edges,
           CAST(count(*) FILTER (w_ba > 0) AS BIGINT) AS n_reciprocated,
           CAST(sum(w_ab) AS BIGINT) AS total_weight,
           round(sum(least(w_ab, w_ba)) / CAST(sum(w_ab) AS DOUBLE), 6)
               AS weighted_reciprocity
    FROM pairs
    """


@query(
    "graph_transition_reciprocity",
    oracle=_reciprocity_oracle(),
    tags=("graph",),
)
def graph_transition_reciprocity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Weighted reciprocity of the event-type transition graph
    (Squartini et al. 2013: sum of min(w_ab, w_ba) over directed
    flow) — does behaviour flow BOTH ways between states (browse <->
    click loops) or is the journey a one-way funnel? Reciprocity near
    1 means oscillation (rage-clicking, retry loops); near 0 means a
    clean directed funnel. Composes the registered
    [[events_markov_transitions]] op's own oracle for the flow matrix
    — zero drift — and complements [[events_transition_entropy_rate]]
    (how RANDOM the walk is) with how SYMMETRIC it is; self-loops are
    excluded (reciprocity is about pairs).

    Scale shape: the transition matrix is |types|^2 rows no matter
    the event count (the markov op's one lag window + fold does the
    data-sized work); the reciprocity join and fold run on that tiny
    matrix."""
    from awsbeats_spark.registry import QUERIES

    t = QUERIES["events_markov_transitions"].fn(spark, sf_dir).select(
        "src_type", "dst_type", "n_trans"
    ).localCheckpoint(eager=True)
    b = t.select(
        F.col("src_type").alias("b_src"),
        F.col("dst_type").alias("b_dst"),
        F.col("n_trans").alias("w_ba"),
    )
    pairs = (
        t.filter(F.col("src_type") != F.col("dst_type"))
        .join(
            b,
            (F.col("b_src") == F.col("dst_type"))
            & (F.col("b_dst") == F.col("src_type")),
            "left",
        )
        .select(
            F.col("n_trans").alias("w_ab"),
            F.coalesce(F.col("w_ba"), F.lit(0)).alias("w_ba"),
        )
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_directed_edges"),
        F.count(F.when(F.col("w_ba") > 0, 1))
        .cast("long")
        .alias("n_reciprocated"),
        F.sum("w_ab").cast("long").alias("total_weight"),
        rnd(
            F.sum(F.least(F.col("w_ab"), F.col("w_ba")))
            / F.sum("w_ab").cast("double"),
            6,
        ).alias("weighted_reciprocity"),
    )


# --------------------------------------------------------------------------
# Process conformance: illegal state transitions
# --------------------------------------------------------------------------

# the sanctioned behaviour model: which event may follow which
_LEGAL_TRANSITIONS = [
    ("signup", "view"), ("signup", "click"),
    ("view", "view"), ("view", "click"), ("view", "error"),
    ("click", "view"), ("click", "click"), ("click", "purchase"),
    ("click", "error"),
    ("purchase", "view"), ("purchase", "signup"),
    ("error", "view"), ("error", "error"),
]

_LEGAL_VALUES = ", ".join(
    f"('{a}', '{b}')" for a, b in _LEGAL_TRANSITIONS
)


def _conformance_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    markov = QUERIES["events_markov_transitions"].oracle
    return f"""
    WITH t AS ({markov}),
    legal AS (
        SELECT * FROM (VALUES {_LEGAL_VALUES}) AS v(src_type, dst_type)
    ),
    tot AS (SELECT sum(n_trans) AS total FROM t)
    SELECT t.src_type, t.dst_type,
           CAST(t.n_trans AS BIGINT) AS n_trans,
           round(t.n_trans / CAST(x.total AS DOUBLE), 6) AS share
    FROM t
    LEFT JOIN legal l ON l.src_type = t.src_type
                     AND l.dst_type = t.dst_type
    CROSS JOIN tot x
    WHERE l.src_type IS NULL
    """


@query(
    "events_conformance_illegal_transitions",
    oracle=_conformance_oracle(),
    tags=("graph", "quality"),
)
def events_conformance_illegal_transitions(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Process conformance checking — the process-mining gate: observed
    behaviour flow ([[events_markov_transitions]]'s matrix, its own
    oracle embedded) is diffed against the SANCTIONED transition model
    (a literal allow-list of which event may follow which), and every
    un-sanctioned transition surfaces with its volume and share of
    all flow. A purchase not preceded by a click, an error leading
    straight to purchase — instrumentation bugs, fraud scripts and
    undocumented product paths all land in exactly this table
    ([[events_pattern_match]] finds a KNOWN sequence;
    [[graph_transition_reciprocity]] measures symmetry; this one
    enumerates everything OFF the map). The allow-list lives with the
    operator as data, versioned like [[dq_schema_contract_check]]'s
    contract.

    Scale shape: the observed matrix is |types|^2 regardless of event
    volume (the markov op does the data-sized lag + fold); the
    conformance diff is an anti-join of that tiny matrix against a
    literal table."""
    from awsbeats_spark.registry import QUERIES

    t = QUERIES["events_markov_transitions"].fn(spark, sf_dir).select(
        "src_type", "dst_type", "n_trans"
    )
    spark_session = spark
    legal = spark_session.createDataFrame(
        _LEGAL_TRANSITIONS, "src_type string, dst_type string"
    )
    tot = t.agg(F.sum("n_trans").alias("total"))
    return (
        t.join(F.broadcast(legal), ["src_type", "dst_type"], "left_anti")
        .crossJoin(F.broadcast(tot))
        .select(
            "src_type",
            "dst_type",
            F.col("n_trans").cast("long").alias("n_trans"),
            rnd(
                F.col("n_trans") / F.col("total").cast("double"), 6
            ).alias("share"),
        )
    )


# --------------------------------------------------------------------------
# Adamic-Adar link prediction (hub-capped candidate generation)
# --------------------------------------------------------------------------

_AA_HUB_CAP = 50  # parts with more suppliers than this are hubs: dropped
_AA_TOPK = 5


@query(
    "graph_adamic_adar_topk",
    oracle=f"""
    WITH edges AS (
        SELECT DISTINCT l_suppkey AS supp, l_partkey AS part FROM lineitem
    ),
    pdeg AS (
        SELECT part, count(*) AS d FROM edges GROUP BY part
        HAVING count(*) BETWEEN 2 AND {_AA_HUB_CAP}
    ),
    contrib AS (
        SELECT a.supp AS supp_a, b.supp AS supp_b,
               1.0 / ln(p.d) AS w
        FROM edges a
        JOIN pdeg p USING (part)
        JOIN edges b USING (part)
        WHERE a.supp < b.supp
    ),
    scored AS (
        SELECT supp_a, supp_b,
               CAST(count(*) AS BIGINT) AS n_common,
               round(sum(w), 6) AS aa_score
        FROM contrib GROUP BY supp_a, supp_b
    )
    SELECT supp_a, supp_b, n_common, aa_score,
           row_number() OVER (
               PARTITION BY supp_a
               ORDER BY aa_score DESC, supp_b) AS rk
    FROM scored
    QUALIFY rk <= {_AA_TOPK}
    """,
    tags=("graph",),
)
def graph_adamic_adar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the supplier-part bipartite
    graph: candidate supplier pairs share at least one part, and each
    shared part contributes 1/ln(degree) — rare parts are strong
    evidence of a link, ubiquitous parts near-none (Adamic & Adar
    2003). Top-{k} predicted partners per supplier.

    This operator APPLIES the hub cap that [[graph_bipartite_projection]]
    only documents: parts with more than {cap} suppliers are dropped
    before the pair join (a hub part with degree d emits d² candidate
    pairs while contributing only 1/ln(d) ≈ nothing to any of them —
    the df-cap economics of [[dedup_ngram_df_capped]], here with a
    principled justification built into the score itself). Degree-1
    parts are also pruned (no pairs). Scores are ROUNDED to 6 decimals
    BEFORE the rank window in both engines so partial-aggregation
    summation order cannot flip a rank tie.

    Scale shape: degree is one keyed aggregate reusing the exchange the
    pair join needs anyway; the join stays a plain hash join on part;
    candidate volume is bounded by cap² per part; the per-source top-k
    is a WindowGroupLimit-pruned rank."""
    li = tables(spark, sf_dir).lineitem
    edges = li.select(
        F.col("l_suppkey").alias("supp"), F.col("l_partkey").alias("part")
    ).distinct()
    pdeg = (
        edges.groupBy("part")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter((F.col("d") >= 2) & (F.col("d") <= _AA_HUB_CAP))
    )
    a = edges.select(F.col("supp").alias("supp_a"), "part")
    b = edges.select(F.col("supp").alias("supp_b"), "part")
    contrib = (
        a.join(pdeg, "part")
        .join(b, "part")
        .filter(F.col("supp_a") < F.col("supp_b"))
        .select("supp_a", "supp_b", (1.0 / F.log(F.col("d"))).alias("w"))
    )
    scored = contrib.groupBy("supp_a", "supp_b").agg(
        F.count(F.lit(1)).alias("n_common"),
        rnd(F.sum("w"), 6).alias("aa_score"),
    )
    rk = F.row_number().over(
        Window.partitionBy("supp_a").orderBy(
            F.desc("aa_score"), F.asc("supp_b")
        )
    )
    return scored.withColumn("rk", rk).filter(F.col("rk") <= _AA_TOPK)


graph_adamic_adar_topk.__doc__ = graph_adamic_adar_topk.__doc__.replace(
    "{k}", str(_AA_TOPK)
).replace("{cap}", str(_AA_HUB_CAP))


# --------------------------------------------------------------------------
# HITS hubs & authorities (fixed rounds, max-normalized, unrolled)
# --------------------------------------------------------------------------

_HITS_ITERS = 3
_HITS_TOPK = 10
_HITS_ROUND = 8


def _hits_round_sql(t: int) -> str:
    """One synchronous HITS round: authority = sum of in-hub scores,
    hub = sum of out-authority scores, each max-normalized and ROUNDED
    (float-portability quantization)."""
    return f"""
    ar{t} AS (
        SELECT e.part, sum(h.h) AS raw
        FROM he e JOIN h{t - 1} h USING (supp) GROUP BY e.part
    ),
    an{t} AS (
        SELECT part, round(raw / (SELECT max(raw) FROM ar{t}),
                           {_HITS_ROUND}) AS a
        FROM ar{t}
    ),
    hr{t} AS (
        SELECT e.supp, sum(an.a) AS raw
        FROM he e JOIN an{t} an USING (part) GROUP BY e.supp
    ),
    h{t} AS (
        SELECT supp, round(raw / (SELECT max(raw) FROM hr{t}),
                           {_HITS_ROUND}) AS h
        FROM hr{t}
    )"""


@query(
    "graph_hits_hubs_authorities",
    oracle=f"""
    WITH he AS (
        SELECT DISTINCT l_suppkey AS supp, l_partkey AS part FROM lineitem
    ),
    h0 AS (SELECT DISTINCT supp, CAST(1.0 AS DOUBLE) AS h FROM he),
    {",".join(_hits_round_sql(t) for t in range(1, _HITS_ITERS + 1))},
    ranked AS (
        SELECT 'hub' AS node_type, supp AS node_id, h AS score,
               row_number() OVER (ORDER BY h DESC, supp) AS rnk
        FROM h{_HITS_ITERS}
        UNION ALL
        SELECT 'authority', part, a,
               row_number() OVER (ORDER BY a DESC, part)
        FROM an{_HITS_ITERS}
    )
    SELECT node_type, CAST(node_id AS BIGINT) AS node_id,
           round(score, 6) AS score, CAST(rnk AS INT) AS rnk
    FROM ranked WHERE rnk <= {_HITS_TOPK}
    """,
    tags=("graph",),
)
def graph_hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg 1999) over the directed supplier→part bipartite
    graph: {it} synchronous rounds of the mutual-reinforcement
    recurrence — a part's AUTHORITY is the sum of the hub scores
    pointing at it; a supplier's HUB score the sum of the authorities
    it points at — each side max-normalized per round. The named
    sibling of [[graph_pagerank_transitions]]: PageRank ranks by random
    walks on ONE score, HITS separates "good source" from "good
    destination", the distinction catalog-quality ranking wants (a
    supplier stocking all the central parts vs a part stocked by all
    the central suppliers). Top-{k} of each side.

    Per-round scores are ROUNDED to {r} decimals in BOTH engines (the
    fixed-rounds float pattern), making the whole power iteration
    hash-checked; final ranks order by the rounded score so summation
    wobble cannot flip a tie. Scale shape: each half-round is one
    keyed aggregate over the edge list (map-side combined) plus a
    1-row max broadcast — identical cost to a pagerank round; {it}
    rounds = {it2} edge scans, no collect."""
    li = tables(spark, sf_dir).lineitem
    he = li.select(
        F.col("l_suppkey").alias("supp"), F.col("l_partkey").alias("part")
    ).distinct()
    h = he.select("supp").distinct().withColumn("h", F.lit(1.0))
    a = None
    for _ in range(_HITS_ITERS):
        ar = he.join(h, "supp").groupBy("part").agg(F.sum("h").alias("raw"))
        amax = ar.agg(F.max("raw").alias("mx"))
        a = ar.crossJoin(F.broadcast(amax)).select(
            "part", rnd(F.col("raw") / F.col("mx"), _HITS_ROUND).alias("a")
        )
        hr = he.join(a, "part").groupBy("supp").agg(F.sum("a").alias("raw"))
        hmax = hr.agg(F.max("raw").alias("mx"))
        h = hr.crossJoin(F.broadcast(hmax)).select(
            "supp", rnd(F.col("raw") / F.col("mx"), _HITS_ROUND).alias("h")
        )
    hubs = h.select(
        F.lit("hub").alias("node_type"),
        F.col("supp").cast("long").alias("node_id"),
        F.col("h").alias("score"),
    )
    auths = a.select(
        F.lit("authority").alias("node_type"),
        F.col("part").cast("long").alias("node_id"),
        F.col("a").alias("score"),
    )
    rnk = F.row_number().over(
        Window.partitionBy("node_type").orderBy(F.desc("score"), F.asc("node_id"))
    )
    return (
        hubs.unionAll(auths)
        .withColumn("rnk", rnk)
        .filter(F.col("rnk") <= _HITS_TOPK)
        .select("node_type", "node_id", rnd("score", 6).alias("score"), "rnk")
    )


graph_hits_hubs_authorities.__doc__ = (
    graph_hits_hubs_authorities.__doc__.replace("{it2}", str(2 * _HITS_ITERS))
    .replace("{it}", str(_HITS_ITERS))
    .replace("{k}", str(_HITS_TOPK))
    .replace("{r}", str(_HITS_ROUND))
)


# --------------------------------------------------------------------------
# Absorbing-chain expected steps to absorption (funnel distance-to-outcome)
# --------------------------------------------------------------------------

_ABSORBING_TYPES = ("purchase", "error")
_ABS_ITERS = 16


def _absorption_oracle() -> str:
    """Unrolled-iteration DuckDB twin of graph_markov_absorption_time."""
    absorbing = ", ".join(f"'{t}'" for t in _ABSORBING_TYPES)
    parts = [
        f"trans AS ({_TRANS_SQL})",
        f"""q AS (
            SELECT src_type, dst_type, prob FROM trans
            WHERE src_type NOT IN ({absorbing})
              AND dst_type NOT IN ({absorbing})
        )""",
        f"""nodes AS (
            SELECT DISTINCT src_type AS node FROM trans
            WHERE src_type NOT IN ({absorbing})
        )""",
        "t0 AS (SELECT node, 0.0 AS t FROM nodes)",
    ]
    for i in range(1, _ABS_ITERS + 1):
        parts.append(
            f"""t{i} AS (
            SELECT n.node,
                   round(1.0 + coalesce(sum(p.t * q.prob), 0.0), 12) AS t
            FROM nodes n
            LEFT JOIN q ON q.src_type = n.node
            LEFT JOIN t{i - 1} p ON p.node = q.dst_type
            GROUP BY n.node
        )"""
        )
    last, prev = f"t{_ABS_ITERS}", f"t{_ABS_ITERS - 1}"
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
        SELECT a.node AS src_type,
               round(a.t, 6) AS expected_steps,
               round(a.t - b.t, 6) AS last_round_delta
        FROM {last} a JOIN {prev} b USING (node)"""
    )


@query("graph_markov_absorption_time", oracle=_absorption_oracle())
def graph_markov_absorption_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected steps to absorption for each transient event type —
    the absorbing-Markov-chain read of the funnel: with
    {abs} as absorbing outcomes, T(s) = 1 + Σ_t Q(s,t)·T(t) over the
    transient block Q of [[events_markov_transitions]], iterated
    {it} rounds from T=0 (the truncated-horizon form of the
    fundamental-matrix solve (I-Q)⁻¹·1 — each round k yields the exact
    expected steps capped at horizon k, so the sequence is monotone
    and its tail increment is the truncation error). The product
    question it answers: "from a click, how many more events until
    this user converts or errors out?" last_round_delta is the
    built-in honesty column — a state with no path to absorption
    diverges at +1/round and says so instead of hiding it.

    Parity & scale: same discipline as [[graph_pagerank_transitions]]
    — ONE distributed pass reduces the fact table to the |types|²
    transition matrix; the iteration is |transient|-sized broadcast
    joins over quantized (12 dp/round) state, never rescanning events;
    outputs round at 6.
    """
    trans = _transitions(spark, sf_dir).select("src_type", "dst_type", "prob")
    trans = trans.localCheckpoint(eager=True)
    absorbing = list(_ABSORBING_TYPES)
    q = trans.filter(
        ~F.col("src_type").isin(absorbing)
        & ~F.col("dst_type").isin(absorbing)
    )
    nodes = (
        trans.filter(~F.col("src_type").isin(absorbing))
        .select(F.col("src_type").alias("node"))
        .distinct()
    )
    t = nodes.withColumn("t", F.lit(0.0))
    prev = None
    for _ in range(_ABS_ITERS):
        prev = t
        t = (
            nodes.join(q, nodes["node"] == q["src_type"], "left")
            .join(
                F.broadcast(prev.select(F.col("node").alias("pn"), F.col("t").alias("pt"))),
                F.col("dst_type") == F.col("pn"),
                "left",
            )
            .groupBy("node")
            .agg(
                rnd(
                    F.lit(1.0)
                    + F.coalesce(F.sum(F.col("pt") * F.col("prob")), F.lit(0.0)),
                    12,
                ).alias("t")
            )
        )
    return (
        t.join(prev.select(F.col("node").alias("node"), F.col("t").alias("t_prev")), "node")
        .select(
            F.col("node").alias("src_type"),
            rnd(F.col("t"), 6).alias("expected_steps"),
            rnd(F.col("t") - F.col("t_prev"), 6).alias("last_round_delta"),
        )
    )


graph_markov_absorption_time.__doc__ = (
    graph_markov_absorption_time.__doc__
    .replace("{abs}", " + ".join(_ABSORBING_TYPES))
    .replace("{it}", str(_ABS_ITERS))
)


# --------------------------------------------------------------------------
# First-passage CDF: P(reach purchase within k steps) per starting type
# --------------------------------------------------------------------------

_FP_TARGET = "purchase"
_FP_MAX_K = 8


def _first_passage_oracle() -> str:
    parts = [
        f"trans AS ({_TRANS_SQL})",
        f"""nodes AS (
            SELECT DISTINCT src_type AS node FROM trans
            WHERE src_type <> '{_FP_TARGET}'
        )""",
        "f0 AS (SELECT node, 0.0 AS p FROM nodes)",
    ]
    for k in range(1, _FP_MAX_K + 1):
        parts.append(
            f"""f{k} AS (
            SELECT n.node,
                   round(coalesce(sum(t.prob * CASE
                       WHEN t.dst_type = '{_FP_TARGET}' THEN 1.0
                       ELSE coalesce(p.p, 0.0) END), 0.0), 12) AS p
            FROM nodes n
            LEFT JOIN trans t ON t.src_type = n.node
            LEFT JOIN f{k - 1} p ON p.node = t.dst_type
            GROUP BY n.node
        )"""
        )
    selects = " UNION ALL ".join(
        f"SELECT node AS src_type, {k} AS k, round(p, 6) AS p_reach FROM f{k}"
        for k in range(1, _FP_MAX_K + 1)
    )
    return "WITH " + ",\n".join(parts) + f"\nSELECT * FROM ({selects})"


@query("graph_first_passage_cdf", oracle=_first_passage_oracle())
def graph_first_passage_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-passage CDF to '{tgt}' on the event-type transition chain:
    for every non-target starting type and horizon k = 1..{mk},
    P(first reach the target within k steps) via the standard
    first-passage recursion f_k(s) = Σ_t P(s,t)·[t = target ? 1 :
    f_{{k-1}}(t)] — the DISTRIBUTION whose mean-time summary
    [[graph_markov_absorption_time]] reports (that op answers "how
    many steps on average"; this one answers "what fraction of users
    convert within k events", the curve a funnel review actually
    plots). Monotone in k by construction — pinned in the twin test.

    Parity & scale: the [[graph_pagerank_transitions]] discipline —
    one pass to the |types|² matrix, then {mk} broadcast-join rounds
    over |types|-sized state quantized at 12 dp/round; output is
    |types| x {mk} rows, rounded at 6.
    """
    trans = _transitions(spark, sf_dir).select("src_type", "dst_type", "prob")
    trans = trans.localCheckpoint(eager=True)
    nodes = (
        trans.filter(F.col("src_type") != _FP_TARGET)
        .select(F.col("src_type").alias("node"))
        .distinct()
    )
    f = nodes.withColumn("p", F.lit(0.0))
    out = []
    for k in range(1, _FP_MAX_K + 1):
        f = (
            nodes.join(trans, nodes["node"] == trans["src_type"], "left")
            .join(
                F.broadcast(
                    f.select(F.col("node").alias("pn"), F.col("p").alias("pp"))
                ),
                F.col("dst_type") == F.col("pn"),
                "left",
            )
            .groupBy("node")
            .agg(
                rnd(
                    F.coalesce(
                        F.sum(
                            F.col("prob")
                            * F.when(
                                F.col("dst_type") == _FP_TARGET, F.lit(1.0)
                            ).otherwise(F.coalesce(F.col("pp"), F.lit(0.0)))
                        ),
                        F.lit(0.0),
                    ),
                    12,
                ).alias("p")
            )
        )
        out.append(
            f.select(
                F.col("node").alias("src_type"),
                F.lit(k).cast("int").alias("k"),
                rnd(F.col("p"), 6).alias("p_reach"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


graph_first_passage_cdf.__doc__ = (
    graph_first_passage_cdf.__doc__
    .replace("{tgt}", _FP_TARGET)
    .replace("{mk}", str(_FP_MAX_K))
)
