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
