"""Sparse/dense retrieval scoring over the `documents` + `embeddings`
tables: BM25, Dirichlet query-likelihood, and hybrid reciprocal-rank
fusion of a dense (cosine) and a sparse (word-set Jaccard) ranking.

Engine extension (BASELINE.json north star) — the reference is a
delivery plugin with no retrieval surface (SURVEY.md §0); these are the
retrieval-side operators a training-data/RAG pipeline runs next to the
dedup/similarity suite. The reference's only "selection" analog is the
top-N metric queries in its example configs (SURVEY.md §2.B).

Scale notes (100 TB):
* Query sets are tiny and BROADCAST; the corpus is scanned once per
  operator and never shuffled on anything but its own aggregate keys.
* BM25/QL corpus statistics (df, avgdl, collection term mass) are
  aggregates over (term) — bounded by |vocab|, not corpus size — and
  re-broadcast to the scoring pass, the standard two-pass sharded-index
  build.
* Scoring math is DOUBLE. Per-term quantities (tf, df, dl, idf) are
  integer-exact, so each term's contribution is bit-identical across
  engines; the final per-(query, doc) score is an F.sum over ≤|q| such
  contributions, whose merge order Spark does NOT pin — the 1e-6 output
  rounding absorbs that (addend sets are tiny and O(1)-magnitude). This
  is deliberately weaker than the vector ops' sequential-F.aggregate
  bit-identity; if a red row ever appears here, suspect a sum that
  landed on a rounding boundary, not the term math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.functions.textfns import WORDS_SQL, words
from awsbeats_spark.functions.vectorfns import (
    as_double,
    cosine_sql,
    dot,
    jl_gauss,
    jl_gauss_sql,
    norm,
)
from awsbeats_spark.registry import query

# Fixed query-term sets (the documents vocabulary is the driver's
# synthetic OLAP word list — TESTDATA.md). Keyed by query_id.
QUERY_TERMS: dict[int, tuple[str, ...]] = {
    0: ("table", "scan", "filter"),
    1: ("vector", "hash", "join"),
    2: ("stream", "batch", "window"),
}
BM25_K1 = 1.2
BM25_B = 0.75
QL_MU = 300.0
RETR_TOP_K = 15
RRF_K = 60
RRF_N_QUERIES = 5  # doc_id/vec_id < 5 are the hybrid query set
RRF_DEPTH = 20  # fuse the top-20 of each ranking


def _query_terms_sql() -> str:
    """DuckDB VALUES list (query_id, term) for QUERY_TERMS."""
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, terms in QUERY_TERMS.items() for t in terms
    )
    return f"(VALUES {rows}) AS qt(query_id, term)"


def _query_terms_df(spark: SparkSession) -> DataFrame:
    rows = [(qid, t) for qid, terms in QUERY_TERMS.items() for t in terms]
    return spark.createDataFrame(rows, "query_id int, term string")


@query(
    "retrieval_bm25_topk",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, w AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    dl AS (SELECT doc_id, len({WORDS_SQL}) AS dl FROM documents),
    stats AS (
        SELECT count(*) AS n_docs, avg(dl) AS avgdl
        FROM dl WHERE dl > 0
    ),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               sum(
                   ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
                   * (tf.tf * ({BM25_K1} + 1.0))
                   / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * dl.dl / stats.avgdl))
               ) AS bm25
        FROM {_query_terms_sql()}
        JOIN tf ON tf.term = qt.term
        JOIN df ON df.term = qt.term
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
        GROUP BY qt.query_id, tf.doc_id
    )
    SELECT query_id, doc_id, round(bm25, 6) AS bm25,
           row_number() OVER (
               PARTITION BY query_id ORDER BY round(bm25, 6) DESC, doc_id
           ) AS rn
    FROM scored
    QUALIFY rn <= {RETR_TOP_K}
    """,
    tags=("retrieval",),
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k for a fixed broadcast query-term set.

    Two-pass sharded-index shape: pass 1 computes corpus statistics —
    per-(doc, term) TF via explode + hash aggregate; doc length,
    document frequency (|vocab|-bounded), and avgdl are all DERIVED
    from that TF table (dl = Σ tf per doc — the tokens ARE the words),
    so no second tokenization logic exists — pass 2 joins the tiny
    (query_id, term) set, the |vocab|-sized df table, and the per-doc
    dl back onto the TF table as broadcasts/equi-joins. Caveat the plan
    pin documents: Catalyst does NOT dedupe shared subtrees, so the
    cold plan re-instantiates the TF pipeline once per derived
    statistic (4 scans of the token projection). At 100 TB you persist
    the TF table — it IS the inverted index, built once, consumed by
    every statistic and every query batch — and this operator's scoring
    pass is exactly the plan that runs against it.
    """
    t = tables(spark, sf_dir)
    w = words()
    toks = t.documents.select("doc_id", F.explode(w).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qt = _query_terms_df(spark)
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + BM25_K1 * (
        1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * (F.col("tf") * (BM25_K1 + 1.0)) / denom
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(contrib).alias("bm25"))
    )
    # rank on the ROUNDED score (sf1 finding, round 11): bm25 is a
    # group-sum whose in-engine accumulation order differs even between
    # byte-identical clone docs, so raw-score ordering flips near-ties
    # both within an engine and across engines; the 6-dp grid (the
    # emitted precision) makes every tie land on doc_id deterministically
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.desc(rnd("bm25", 6)), F.asc("doc_id")
        )
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= RETR_TOP_K)
        .select("query_id", "doc_id", rnd("bm25", 6).alias("bm25"), "rn")
    )


@query(
    "retrieval_query_likelihood",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, w AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    dl AS (SELECT doc_id, len({WORDS_SQL}) AS dl FROM documents WHERE len({WORDS_SQL}) > 0),
    coll AS (SELECT sum(tf) AS coll_len FROM tf),
    ctf AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY term),
    scored AS (
        SELECT qt.query_id, dl.doc_id,
               sum(ln(
                   (coalesce(tf.tf, 0) + {QL_MU} * ctf.ctf / coll.coll_len)
                   / (dl.dl + {QL_MU})
               )) AS ql
        FROM {_query_terms_sql()}
        JOIN ctf ON ctf.term = qt.term
        CROSS JOIN coll
        CROSS JOIN dl
        LEFT JOIN tf ON tf.term = qt.term AND tf.doc_id = dl.doc_id
        GROUP BY qt.query_id, dl.doc_id
    )
    SELECT query_id, doc_id, round(ql, 6) AS ql,
           row_number() OVER (
               PARTITION BY query_id ORDER BY round(ql, 6) DESC, doc_id
           ) AS rn
    FROM scored
    QUALIFY rn <= {RETR_TOP_K}
    """,
    tags=("retrieval",),
)
def retrieval_query_likelihood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood ranking (Zhai & Lafferty 2001):
    score(q, d) = Σ_t∈q ln((tf_{t,d} + μ·p_c(t)) / (dl_d + μ)).

    Smoothing means every document scores against every query term even
    at tf=0, so the plan is (docs × query-terms) — the query side is a
    ~9-row broadcast, the doc side one scan; the per-(doc,term) tf joins
    in as a LEFT join keyed (doc_id, term). Collection stats (ctf per
    query term, total collection length) are |q|-sized / scalar
    broadcasts. No corpus-sized shuffle beyond the TF aggregate; scoring
    is map-side. At 100 TB the tf table would be the pre-built inverted
    index and this operator is a pure broadcast-scoring pass over it.
    """
    t = tables(spark, sf_dir)
    w = words()
    toks = t.documents.select("doc_id", F.explode(w).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # dl derived from tf (Σ tf per doc == word count; docs with zero
    # words have no tf rows, matching the oracle's len > 0 filter) —
    # one corpus scan total, and dl keeps tf's doc_id partitioning.
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    coll = tf.agg(F.sum("tf").alias("coll_len"))
    qt = _query_terms_df(spark)
    ctf = (
        tf.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.sum("tf").alias("ctf"))
    )
    qstats = qt.join(F.broadcast(ctf), "term").crossJoin(F.broadcast(coll))
    pairs = dl.crossJoin(F.broadcast(qstats))
    joined = pairs.join(
        tf.withColumnRenamed("tf", "tf_td"), ["doc_id", "term"], "left"
    )
    term_score = F.log(
        (F.coalesce(F.col("tf_td"), F.lit(0)) + QL_MU * F.col("ctf") / F.col("coll_len"))
        / (F.col("dl") + QL_MU)
    )
    scored = joined.groupBy("query_id", "doc_id").agg(
        F.sum(term_score).alias("ql")
    )
    # rounded-score ranking: the bm25 tie discipline (sf1, round 11)
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.desc(rnd("ql", 6)), F.asc("doc_id")
        )
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= RETR_TOP_K)
        .select("query_id", "doc_id", rnd("ql", 6).alias("ql"), "rn")
    )


@query(
    "retrieval_rrf_hybrid",
    oracle=f"""
    WITH dense AS (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'c.embedding')} DESC, c.vec_id
               ) AS drank
        FROM embeddings q
        JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {RRF_N_QUERIES}
        QUALIFY drank <= {RRF_DEPTH}
    ),
    wsets AS (SELECT doc_id, list_distinct({WORDS_SQL}) AS ws FROM documents),
    sparse AS (
        SELECT q.doc_id AS query_id, c.doc_id,
               row_number() OVER (
                   PARTITION BY q.doc_id
                   ORDER BY len(list_intersect(q.ws, c.ws)) * 1.0
                            / greatest(len(list_distinct(q.ws || c.ws)), 1) DESC,
                            c.doc_id
               ) AS srank
        FROM wsets q
        JOIN wsets c ON c.doc_id <> q.doc_id
        WHERE q.doc_id < {RRF_N_QUERIES}
        QUALIFY srank <= {RRF_DEPTH}
    ),
    fused AS (
        SELECT coalesce(d.query_id, s.query_id) AS query_id,
               coalesce(d.doc_id, s.doc_id) AS doc_id,
               (CASE WHEN d.drank IS NULL THEN 0.0
                     ELSE 1.0 / ({RRF_K} + d.drank) END)
               + (CASE WHEN s.srank IS NULL THEN 0.0
                       ELSE 1.0 / ({RRF_K} + s.srank) END) AS rrf
        FROM dense d
        FULL OUTER JOIN sparse s
          ON s.query_id = d.query_id AND s.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, round(rrf, 6) AS rrf,
           row_number() OVER (
               PARTITION BY query_id ORDER BY rrf DESC, doc_id
           ) AS rn
    FROM fused
    QUALIFY rn <= {RETR_TOP_K}
    """,
    tags=("retrieval",),
)
def retrieval_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid dense+sparse retrieval via reciprocal-rank fusion
    (Cormack et al. 2009): rrf = Σ_modality 1/(60 + rank), fusing a
    cosine ranking over `embeddings` with a word-set-Jaccard ranking
    over `documents` (doc_id ≡ vec_id in the testdata — the two
    modalities of the same corpus).

    Both rankings broadcast the tiny query set against one scan of
    their corpus (same shape as sim_search_topk); the fusion is a
    FULL OUTER join of two ≤(queries × depth)-row rankings — driver-
    trivial and broadcastable at any corpus size, since RRF only ever
    sees the top-`RRF_DEPTH` of each modality. At 100 TB the rankings
    would come from the ANN (sim_search_ivf) and inverted-index
    (retrieval_bm25_topk) paths; the fusion stage is unchanged.
    """
    t = tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < RRF_N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
    )
    q = q.select("query_id", "qv", norm(F.col("qv")).alias("nq"))
    c = emb.select(
        F.col("vec_id").alias("doc_id"), as_double(F.col("embedding")).alias("cv")
    ).select("doc_id", "cv", norm(F.col("cv")).alias("nc"))
    cos = dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))
    dwin = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    dense = (
        F.broadcast(q)
        .join(c, F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id", cos.alias("cos"))
        .withColumn("drank", F.row_number().over(dwin))
        .filter(F.col("drank") <= RRF_DEPTH)
        .select("query_id", "doc_id", "drank")
    )

    wsets = t.documents.select(
        "doc_id", F.array_distinct(words()).alias("ws")
    )
    qs = wsets.filter(F.col("doc_id") < RRF_N_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("ws").alias("qws")
    )
    inter = F.size(F.array_intersect(F.col("qws"), F.col("ws")))
    union = F.greatest(
        F.size(F.array_distinct(F.concat(F.col("qws"), F.col("ws")))), F.lit(1)
    )
    jac = inter * 1.0 / union
    swin = Window.partitionBy("query_id").orderBy(F.desc("jac"), F.asc("doc_id"))
    sparse = (
        F.broadcast(qs)
        .join(wsets, F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id", jac.alias("jac"))
        .withColumn("srank", F.row_number().over(swin))
        .filter(F.col("srank") <= RRF_DEPTH)
        .select("query_id", "doc_id", "srank")
    )

    fused = dense.join(sparse, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.when(F.col("drank").isNull(), F.lit(0.0)).otherwise(
                1.0 / (RRF_K + F.col("drank"))
            )
            + F.when(F.col("srank").isNull(), F.lit(0.0)).otherwise(
                1.0 / (RRF_K + F.col("srank"))
            )
        ).alias("rrf"),
    )
    rn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("doc_id"))
    )
    return (
        fused.withColumn("rn", rn)
        .filter(F.col("rn") <= RETR_TOP_K)
        .select("query_id", "doc_id", rnd("rrf", 6).alias("rrf"), "rn")
    )


@query(
    "text_hashed_bow",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents
    ),
    bucketed AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5(w), 1, 4))::BIGINT % 64 AS BIGINT)
                   AS bucket,
               count(*) AS cnt
        FROM toks GROUP BY 1, 2
    )
    SELECT doc_id, bucket, cnt,
           row_number() OVER (
               PARTITION BY doc_id ORDER BY cnt DESC, bucket
           ) AS rn
    FROM bucketed
    QUALIFY rn <= 8
    """,
    tags=("retrieval", "text"),
)
def text_hashed_bow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed bag-of-words (hashing trick, Weinberger et al.
    2009): words hash into 64 fixed buckets (md5-prefix mod — identical
    bytes in both engines) and each document keeps its top-8 buckets by
    count — the sparse feature vector a downstream classifier consumes.

    Fixed-width feature space means NO vocabulary build pass and no
    |vocab| join: bucketing is a map-side expression, the count is one
    hash aggregate on (doc_id, bucket) ≤ 64 rows/doc, and the top-8 is a
    doc_id-partitioned window Spark prunes per-partition
    (WindowGroupLimit). Embarrassingly parallel at 100 TB.
    """
    t = tables(spark, sf_dir)
    toks = t.documents.select("doc_id", F.explode(words()).alias("w"))
    bucket = F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("bigint") % 64
    counts = (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.asc("bucket"))
    )
    return counts.withColumn("rn", rn).filter(F.col("rn") <= 8)


# --------------------------------------------------------------------------
# Ranking agreement: top-k overlap + Spearman rho between BM25 and QL
# --------------------------------------------------------------------------


def _overlap_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    return f"""
    WITH bm AS ({QUERIES['retrieval_bm25_topk'].oracle}),
    ql AS ({QUERIES['retrieval_query_likelihood'].oracle}),
    inter AS (
        SELECT b.query_id, b.doc_id, b.rn AS rna, q.rn AS rnb
        FROM bm b JOIN ql q USING (query_id, doc_id)
    ),
    rr AS (
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id ORDER BY rna) AS ra,
               row_number() OVER (PARTITION BY query_id ORDER BY rnb) AS rb
        FROM inter
    ),
    per AS (
        SELECT query_id, CAST(count(*) AS BIGINT) AS n_overlap,
               sum((ra - rb) * (ra - rb)) AS d2
        FROM rr GROUP BY 1
    )
    SELECT query_id, CAST({RETR_TOP_K} AS BIGINT) AS k, n_overlap,
           round(n_overlap / {RETR_TOP_K}.0, 6) AS overlap_frac,
           CASE WHEN n_overlap > 1 THEN
               round(1 - 6.0 * d2 / (n_overlap
                     * (n_overlap * n_overlap - 1)), 6)
           END AS spearman_rho
    FROM per
    """


@query("retrieval_overlap_at_k", oracle=_overlap_oracle())
def retrieval_overlap_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-agreement evaluation between the two registered sparse
    retrievers: per query, the top-k set overlap between BM25 and
    Dirichlet query-likelihood plus Spearman's rho over the shared
    docs (re-ranked within the intersection so both rank vectors are
    permutations of 1..n and the classic 1 - 6*sum(d^2)/(n(n^2-1))
    formula applies exactly). This is the retrieval-stack regression
    probe: a scorer change that leaves overlap/rho unchanged is a
    refactor, one that moves them is a semantic change — and at 100 TB
    you compare rankings on the k-row-per-query result tables, never by
    re-scoring the corpus twice more. Composes the REGISTERED operators
    (same DataFrames, same oracles embedded as CTEs), so this eval can
    never drift from the rankers it audits. rho is NULL for n < 2
    (undefined) on both engines."""
    from awsbeats_spark.registry import QUERIES

    bm = QUERIES["retrieval_bm25_topk"].fn(spark, sf_dir)
    ql = QUERIES["retrieval_query_likelihood"].fn(spark, sf_dir)
    inter = bm.select("query_id", "doc_id", F.col("rn").alias("rna")).join(
        ql.select("query_id", "doc_id", F.col("rn").alias("rnb")),
        ["query_id", "doc_id"],
    )
    rr = inter.select(
        "query_id",
        F.row_number()
        .over(Window.partitionBy("query_id").orderBy("rna"))
        .alias("ra"),
        F.row_number()
        .over(Window.partitionBy("query_id").orderBy("rnb"))
        .alias("rb"),
    )
    d = F.col("ra") - F.col("rb")
    per = rr.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        F.sum(d * d).alias("d2"),
    )
    n = F.col("n_overlap")
    return per.select(
        "query_id",
        F.lit(RETR_TOP_K).cast("long").alias("k"),
        n.alias("n_overlap"),
        rnd(n / float(RETR_TOP_K), 6).alias("overlap_frac"),
        F.when(
            n > 1, rnd(1 - 6.0 * F.col("d2") / (n * (n * n - 1)), 6)
        ).alias("spearman_rho"),
    )


# --------------------------------------------------------------------------
# Graded relevance quality of the BM25 ranking: nDCG@k
# --------------------------------------------------------------------------

_NDCG_K = 10


def _ndcg_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    return f"""
    WITH bm_full AS ({QUERIES['retrieval_bm25_topk'].oracle}),
    bm AS (SELECT * FROM bm_full WHERE rn <= {_NDCG_K}),
    rel AS (
        SELECT qt.query_id, d.doc_id, count(*) AS rel
        FROM (SELECT doc_id, {WORDS_SQL} AS ws FROM documents) d
        JOIN {_query_terms_sql()} ON list_contains(d.ws, qt.term)
        GROUP BY qt.query_id, d.doc_id
    ),
    dcg AS (
        SELECT bm.query_id,
               CAST(count(*) AS BIGINT) AS n_ranked,
               sum((pow(2.0, coalesce(rel.rel, 0)) - 1.0)
                   / log2(bm.rn + 1.0)) AS dcg
        FROM bm LEFT JOIN rel
          ON rel.query_id = bm.query_id AND rel.doc_id = bm.doc_id
        GROUP BY bm.query_id
    ),
    ideal AS (
        SELECT query_id, rel,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY rel DESC, doc_id
               ) AS irn
        FROM rel
    ),
    idcg AS (
        SELECT query_id,
               sum((pow(2.0, rel) - 1.0) / log2(irn + 1.0)) AS idcg
        FROM ideal WHERE irn <= {_NDCG_K}
        GROUP BY query_id
    )
    SELECT dcg.query_id, dcg.n_ranked,
           round(dcg.dcg, 6) AS dcg,
           round(idcg.idcg, 6) AS idcg,
           round(dcg.dcg / idcg.idcg, 6) AS ndcg
    FROM dcg JOIN idcg ON idcg.query_id = dcg.query_id
    """


@query("retrieval_ndcg_graded", oracle=_ndcg_oracle())
def retrieval_ndcg_graded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured ranking quality of the registered BM25 operator:
    nDCG@10 with GRADED relevance = how many distinct query terms the
    document actually contains (0-3). The honesty eval for lexical
    retrieval — BM25 should place multi-term-covering docs above
    single-term ones, and nDCG is the standard graded metric for that
    claim; a value near 1 means the idf/tf trade-off is ordering term
    coverage correctly on this corpus, a low value means the ranking is
    being dominated by length normalization or a skewed idf.

    Oracle composition: the BM25 CTE IS the registered operator's own
    oracle SQL (the eval can never drift from what it evaluates); the
    ideal ranking orders by exact integer relevance, so IDCG is
    deterministic even under relevance ties (equal grades contribute
    equal gain at any order). Scale shape: relevance is one semi-join
    of the broadcast 9-term list against the token arrays (no
    vocabulary explode), then DCG/IDCG aggregate |queries| x k rows."""
    from awsbeats_spark.registry import QUERIES

    bm = (
        QUERIES["retrieval_bm25_topk"]
        .fn(spark, sf_dir)
        .filter(F.col("rn") <= _NDCG_K)
    )
    docs = tables(spark, sf_dir).documents.select(
        "doc_id", words().alias("ws")
    )
    qt = F.broadcast(_query_terms_df(spark))
    rel = (
        docs.join(qt, F.array_contains(F.col("ws"), F.col("term")))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("rel"))
    )
    gain = F.pow(F.lit(2.0), F.coalesce(F.col("rel"), F.lit(0))) - 1.0
    dcg = (
        bm.join(rel, ["query_id", "doc_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ranked"),
            F.sum(gain / F.log2(F.col("rn") + 1.0)).alias("dcg"),
        )
    )
    irn = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    )
    idcg = (
        rel.select("query_id", "rel", irn.alias("irn"))
        .filter(F.col("irn") <= _NDCG_K)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("irn") + 1.0)
            ).alias("idcg")
        )
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        "n_ranked",
        rnd("dcg", 6).alias("dcg"),
        rnd("idcg", 6).alias("idcg"),
        rnd(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


# --------------------------------------------------------------------------
# Dense document featurizer: feature hashing composed with JL projection
# --------------------------------------------------------------------------

_DENSE_BUCKETS = 64
_DENSE_K = 4


def _dense_sql(j: int) -> str:
    """Unrounded dense coordinate j: bucket-count-weighted sum of the
    content-addressed Gaussian g(bucket+1, j) over the doc's buckets."""
    return f"sum(cnt * {jl_gauss_sql(j, '(bucket + 1)')})"


@query(
    "text_dense_hashed_embedding",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents
    ),
    bucketed AS (
        SELECT doc_id,
               CAST(('0x' || substring(md5(w), 1, 4))::BIGINT
                    % {_DENSE_BUCKETS} AS BIGINT) AS bucket,
               count(*) AS cnt
        FROM toks GROUP BY 1, 2
    ),
    dense AS (
        SELECT doc_id,
               {_dense_sql(1)} AS d1r, {_dense_sql(2)} AS d2r,
               {_dense_sql(3)} AS d3r, {_dense_sql(4)} AS d4r,
               CAST(sum(cnt) AS BIGINT) AS n_tokens
        FROM bucketed GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           round(d1r / sqrt(d1r * d1r + d2r * d2r + d3r * d3r + d4r * d4r),
                 4) AS d1,
           round(d2r / sqrt(d1r * d1r + d2r * d2r + d3r * d3r + d4r * d4r),
                 4) AS d2,
           round(d3r / sqrt(d1r * d1r + d2r * d2r + d3r * d3r + d4r * d4r),
                 4) AS d3,
           round(d4r / sqrt(d1r * d1r + d2r * d2r + d3r * d3r + d4r * d4r),
                 4) AS d4
    FROM dense
    WHERE d1r * d1r + d2r * d2r + d3r * d3r + d4r * d4r > 0
    """,
    tags=("retrieval", "text"),
)
def text_dense_hashed_embedding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-free dense document vectors: the feature-hashing trick
    (text_hashed_bow's 64 fixed buckets) composed with a content-
    addressed JL Gaussian projection (embed_random_projection_jl's
    matrix trick) and L2 normalization — the classic
    hash-then-project featurizer that gives every document a dense,
    deterministic, model-free vector for clustering / dedup blocking /
    cosine retrieval when no trained embedder is available (or as the
    cheap first pass before one). Because both stages are
    content-addressed (md5 bucket, md5 Box-Muller weight), the output
    is bit-reproducible across engines and runs — no vocabulary build,
    no stored matrix, no RNG state.

    Scale shape: tokenize + bucket is map-side; ONE hash aggregate on
    (doc_id, bucket) (<= 64 rows per doc) then a per-doc fold of <= 64
    weighted Gaussians — the projection costs O(buckets * k) per doc
    independent of vocabulary or document length. Embarrassingly
    parallel at 100 TB; the downstream consumer joins on the dense
    columns exactly like a learned embedding."""
    t = tables(spark, sf_dir)
    toks = t.documents.select("doc_id", F.explode(words()).alias("w"))
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("bigint")
        % _DENSE_BUCKETS
    )
    counts = (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    dense = counts.groupBy("doc_id").agg(
        *[
            F.sum(
                F.col("cnt") * jl_gauss(F.col("bucket") + 1, j)
            ).alias(f"d{j}r")
            for j in (1, 2, 3, 4)
        ],
        F.sum("cnt").cast("long").alias("n_tokens"),
    )
    n2 = (
        F.col("d1r") * F.col("d1r")
        + F.col("d2r") * F.col("d2r")
        + F.col("d3r") * F.col("d3r")
        + F.col("d4r") * F.col("d4r")
    )
    nrm = F.sqrt(n2)
    return dense.filter(n2 > 0).select(
        "doc_id",
        "n_tokens",
        rnd(F.col("d1r") / nrm, 4).alias("d1"),
        rnd(F.col("d2r") / nrm, 4).alias("d2"),
        rnd(F.col("d3r") / nrm, 4).alias("d3"),
        rnd(F.col("d4r") / nrm, 4).alias("d4"),
    )


# --------------------------------------------------------------------------
# ColBERT-style MaxSim late interaction over hashed token embeddings
# --------------------------------------------------------------------------

_MAXSIM_TOP_K = 10

_MAXSIM_E_SQL = ", ".join(
    f"g{j} / sqrt(g1 * g1 + g2 * g2 + g3 * g3 + g4 * g4) AS e{j}"
    for j in (1, 2, 3, 4)
)


@query(
    "retrieval_maxsim_late_interaction",
    oracle=f"""
    WITH g AS (
        SELECT i AS bucket,
               {", ".join(f"{jl_gauss_sql(j, '(i + 1)')} AS g{j}" for j in (1, 2, 3, 4))}
        FROM generate_series(0, {_DENSE_BUCKETS - 1}) t(i)
    ),
    e AS (SELECT bucket, {_MAXSIM_E_SQL} FROM g),
    sim AS (
        SELECT q.bucket AS bq, d.bucket AS bd,
               q.e1 * d.e1 + q.e2 * d.e2 + q.e3 * d.e3 + q.e4 * d.e4 AS s
        FROM e q, e d
    ),
    toks AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substring(md5(w), 1, 4))::BIGINT
                    % {_DENSE_BUCKETS} AS BIGINT) AS bucket
        FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
    ),
    qt AS (SELECT doc_id AS query_id, bucket AS bq FROM toks
           WHERE doc_id < {RRF_N_QUERIES}),
    dt AS (SELECT doc_id, bucket AS bd FROM toks
           WHERE doc_id >= {RRF_N_QUERIES}),
    m AS (
        SELECT qt.query_id, dt.doc_id, qt.bq, max(sim.s) AS ms
        FROM dt JOIN sim ON sim.bd = dt.bd
                JOIN qt ON qt.bq = sim.bq
        GROUP BY qt.query_id, dt.doc_id, qt.bq
    ),
    sc AS (
        SELECT query_id, doc_id, sum(ms) AS score
        FROM m GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, CAST(rn AS INT) AS rank,
           round(score, 4) AS maxsim
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(score, 4) DESC, doc_id
               ) AS rn
        FROM sc
    ) WHERE rn <= {_MAXSIM_TOP_K}
    """,
    tags=("retrieval",),
)
def retrieval_maxsim_late_interaction(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Late-interaction retrieval (the ColBERT MaxSim scoring shape,
    Khattab & Zaharia 2020) over the engine's content-addressed hashed
    token embeddings: every token embeds as the L2-normalized JL
    Gaussian of its 64-way feature-hash bucket (the per-TOKEN
    decomposition of [[text_dense_hashed_embedding]], which pools the
    same vectors per document), and score(q, d) = sum over q's distinct
    token vectors of the max cosine against d's token vectors — the
    interaction is deferred to query time instead of pooled away, which
    is what lets late-interaction models out-rank single-vector dense
    retrieval. Queries are the doc_id < {RRF_N_QUERIES} documents (the
    [[retrieval_rrf_hybrid]] query convention); top-{_MAXSIM_TOP_K}
    docs per query with the (rounded score DESC, doc_id) tie-break.

    Scale shape — the hashed-vocabulary factorization: because a
    token's vector depends only on its bucket, cos(t_q, t_d) depends
    only on (bucket_q, bucket_d), so the whole interaction collapses to
    a 64 x 64 similarity matrix built once from spark.range (4096 rows,
    broadcast) joined against each document's DISTINCT bucket set (<=
    64 rows per doc). Per doc the MaxSim is a keyed max + keyed sum —
    two map-side-partial aggregates; no doc ever meets another doc and
    the corpus shuffles only on (query, doc) at candidate grain. At
    100 TB this is token-level late interaction at the cost of a
    per-doc bounded aggregate, with real (learned) embeddings swapping
    in by replacing the broadcast matrix with a quantized codebook
    product, same plan."""
    t = tables(spark, sf_dir)
    buckets = spark.range(_DENSE_BUCKETS).select(
        F.col("id").alias("bucket"),
        *[jl_gauss(F.col("id") + 1, j).alias(f"g{j}") for j in (1, 2, 3, 4)],
    )
    nrm = F.sqrt(
        sum(F.col(f"g{j}") * F.col(f"g{j}") for j in (1, 2, 3, 4))
    )
    e = buckets.select(
        "bucket",
        *[(F.col(f"g{j}") / nrm).alias(f"e{j}") for j in (1, 2, 3, 4)],
    )
    eq, ed = e.alias("eq"), e.alias("ed")
    sim = F.broadcast(
        eq.crossJoin(ed).select(
            F.col("eq.bucket").alias("bq"),
            F.col("ed.bucket").alias("bd"),
            sum(
                F.col(f"eq.e{j}") * F.col(f"ed.e{j}") for j in (1, 2, 3, 4)
            ).alias("s"),
        )
    )
    toks = (
        t.documents.select("doc_id", F.explode(words()).alias("w"))
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("bigint")
                % _DENSE_BUCKETS
            ).alias("bucket"),
        )
        .distinct()
    )
    qt = F.broadcast(
        toks.filter(F.col("doc_id") < RRF_N_QUERIES).select(
            F.col("doc_id").alias("query_id"), F.col("bucket").alias("bq")
        )
    )
    dt = toks.filter(F.col("doc_id") >= RRF_N_QUERIES).select(
        "doc_id", F.col("bucket").alias("bd")
    )
    m = (
        dt.join(sim, "bd")
        .join(qt, "bq")
        .groupBy("query_id", "doc_id", "bq")
        .agg(F.max("s").alias("ms"))
    )
    sc = m.groupBy("query_id", "doc_id").agg(F.sum("ms").alias("score"))
    win = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 4).desc(), F.col("doc_id")
    )
    return (
        sc.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= _MAXSIM_TOP_K)
        .select(
            "query_id",
            "doc_id",
            F.col("rn").cast("int").alias("rank"),
            rnd(F.col("score"), 4).alias("maxsim"),
        )
    )


retrieval_maxsim_late_interaction.__doc__ = (
    retrieval_maxsim_late_interaction.__doc__
    .replace("{RRF_N_QUERIES}", str(RRF_N_QUERIES))
    .replace("{_MAXSIM_TOP_K}", str(_MAXSIM_TOP_K))
)


# --------------------------------------------------------------------------
# MMR diversification: greedy re-rank of BM25 candidates
# --------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_SELECT = 5


def _mmr_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    bm25 = QUERIES["retrieval_bm25_topk"].oracle
    dense = QUERIES["text_dense_hashed_embedding"].oracle
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    steps = []
    for t in range(2, _MMR_SELECT + 1):
        steps.append(f"""
    m{t} AS (
        SELECT c.query_id, c.doc_id, c.rel,
               max(c.d1 * v.d1 + c.d2 * v.d2 + c.d3 * v.d3 + c.d4 * v.d4)
                   AS msim
        FROM cv c
        JOIN acc{t - 1} a ON a.query_id = c.query_id
        JOIN cv v ON v.query_id = a.query_id AND v.doc_id = a.doc_id
        LEFT JOIN acc{t - 1} x
               ON x.query_id = c.query_id AND x.doc_id = c.doc_id
        WHERE x.doc_id IS NULL
        GROUP BY c.query_id, c.doc_id, c.rel
    ),
    sel{t} AS (
        SELECT query_id, doc_id, mmr, {t} AS srank FROM (
            SELECT query_id, doc_id,
                   {lam} * rel - {mu} * msim AS mmr,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY {lam} * rel - {mu} * msim DESC, doc_id
                   ) AS rn
            FROM m{t}
        ) WHERE rn = 1
    ),
    acc{t} AS (SELECT * FROM acc{t - 1} UNION ALL SELECT * FROM sel{t})""")
    return f"""
    WITH cand AS ({bm25}),
    dense AS ({dense}),
    cv AS (
        SELECT c.query_id, c.doc_id, c.bm25 AS rel,
               d.d1, d.d2, d.d3, d.d4
        FROM cand c JOIN dense d USING (doc_id)
    ),
    acc1 AS (
        SELECT query_id, doc_id, {lam} * rel AS mmr, 1 AS srank FROM (
            SELECT query_id, doc_id, rel,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY rel DESC, doc_id
                   ) AS rn
            FROM cv
        ) WHERE rn = 1
    ),
    {",".join(steps)}
    SELECT query_id, doc_id, CAST(srank AS INT) AS select_rank,
           round(mmr, 6) AS mmr_score
    FROM acc{_MMR_SELECT}
    """


@query("retrieval_mmr_diversify", oracle=_mmr_oracle(), tags=("retrieval",))
def retrieval_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily select {_MMR_SELECT} of BM25's top-{RETR_TOP_K}
    candidates per query, each step taking argmax of
    lambda * relevance - (1 - lambda) * max-similarity-to-already-
    selected (lambda = {_MMR_LAMBDA}) — the diversification pass that
    keeps a retrieval result (or a training-data sample) from being
    five copies of the same near-duplicate document. Composes two
    registered operators with zero drift: relevance IS
    [[retrieval_bm25_topk]]'s rounded score and inter-document
    similarity is the dot product of [[text_dense_hashed_embedding]]'s
    unit vectors; the oracle embeds both ops' own SQL and unrolls the
    {_MMR_SELECT} greedy steps as plain CTEs.

    Scale shape: the greedy recursion runs on the CANDIDATE LIST
    (top-{RETR_TOP_K} per query), never the corpus — each step is a
    keyed max over at most k x selected rows per query, broadcast-
    sized; the corpus-scale work (BM25 scoring, embedding) happens
    once upstream in the composed ops' own scale shapes. Fixed
    {_MMR_SELECT} steps = fixed plan depth; the accumulated selection
    is localCheckpointed per step so lineage stays flat."""
    from awsbeats_spark.registry import QUERIES

    cand = QUERIES["retrieval_bm25_topk"].fn(spark, sf_dir).select(
        "query_id", "doc_id", F.col("bm25").alias("rel")
    )
    dense = QUERIES["text_dense_hashed_embedding"].fn(spark, sf_dir).select(
        "doc_id", "d1", "d2", "d3", "d4"
    )
    cv = cand.join(dense, "doc_id").select(
        "query_id", "doc_id", "rel", "d1", "d2", "d3", "d4"
    ).localCheckpoint(eager=True)
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 10)
    w1 = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    acc = (
        cv.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "query_id",
            "doc_id",
            (F.lit(lam) * F.col("rel")).alias("mmr"),
            F.lit(1).alias("srank"),
        )
    )
    for t in range(2, _MMR_SELECT + 1):
        acc = acc.localCheckpoint(eager=True)
        sel_vecs = cv.join(
            acc.select("query_id", "doc_id"), ["query_id", "doc_id"]
        ).select(
            "query_id",
            F.col("d1").alias("e1"),
            F.col("d2").alias("e2"),
            F.col("d3").alias("e3"),
            F.col("d4").alias("e4"),
        )
        remaining = cv.join(
            acc.select("query_id", "doc_id"), ["query_id", "doc_id"],
            "left_anti",
        )
        sim = (
            F.col("d1") * F.col("e1")
            + F.col("d2") * F.col("e2")
            + F.col("d3") * F.col("e3")
            + F.col("d4") * F.col("e4")
        )
        m = (
            remaining.join(sel_vecs, "query_id")
            .select("query_id", "doc_id", "rel", sim.alias("sim"))
            .groupBy("query_id", "doc_id", "rel")
            .agg(F.max("sim").alias("msim"))
        )
        mmr = F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("msim")
        wt = Window.partitionBy("query_id").orderBy(
            mmr.desc(), F.asc("doc_id")
        )
        pick = (
            m.withColumn("rn", F.row_number().over(wt))
            .filter(F.col("rn") == 1)
            .select(
                "query_id", "doc_id", mmr.alias("mmr"),
                F.lit(t).alias("srank"),
            )
        )
        acc = acc.unionAll(pick)
    return acc.select(
        "query_id",
        "doc_id",
        F.col("srank").cast("int").alias("select_rank"),
        rnd(F.col("mmr"), 6).alias("mmr_score"),
    )


retrieval_mmr_diversify.__doc__ = (
    retrieval_mmr_diversify.__doc__
    .replace("{_MMR_SELECT}", str(_MMR_SELECT))
    .replace("{RETR_TOP_K}", str(RETR_TOP_K))
    .replace("{_MMR_LAMBDA}", str(_MMR_LAMBDA))
)


# --------------------------------------------------------------------------
# Chunking-design eval: overlap vs disjoint windows for retrieval hit
# --------------------------------------------------------------------------


def _chunk_score_sql(stride: int) -> str:
    """Best chunk score (distinct query terms present) per query under a
    chunking of width _OCHUNK_SIZE advancing by ``stride``."""
    from awsbeats_spark.operators.llm.corpus import _OCHUNK_SIZE

    return f"""
        SELECT qt.query_id,
               max(len(list_intersect(
                   list_slice(w.ws, t.i * {stride} + 1,
                              least(t.i * {stride} + {_OCHUNK_SIZE}, w.n)),
                   qt.terms))) AS best
        FROM (
            SELECT doc_id, {WORDS_SQL} AS ws, len({WORDS_SQL}) AS n
            FROM documents
        ) w,
        unnest(generate_series(0,
            CAST(floor((w.n - 1) / {stride}) AS BIGINT))) AS t(i),
        (SELECT query_id, list(term) AS terms
         FROM {_query_terms_sql()} GROUP BY query_id) qt
        WHERE w.n >= 1
        GROUP BY qt.query_id
    """


def _chunk_eval_oracle() -> str:
    from awsbeats_spark.operators.llm.corpus import (
        _OCHUNK_SIZE,
        _OCHUNK_STRIDE,
    )

    return f"""
    WITH ov AS ({_chunk_score_sql(_OCHUNK_STRIDE)}),
    dj AS ({_chunk_score_sql(_OCHUNK_SIZE)})
    SELECT ov.query_id,
           CAST(ov.best AS BIGINT) AS best_overlap,
           CAST(dj.best AS BIGINT) AS best_disjoint,
           CAST(ov.best - dj.best AS BIGINT) AS gain
    FROM ov JOIN dj USING (query_id)
    """


@query(
    "eval_chunk_overlap_vs_disjoint",
    oracle=_chunk_eval_oracle(),
    tags=("retrieval", "eval"),
)
def eval_chunk_overlap_vs_disjoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Chunking-design eval: does [[corpus_chunk_overlap_windows]]'s
    30%-overlap sliding window actually retrieve better than the
    disjoint chunking of [[corpus_doc_chunk]]? For each fixed query,
    score every chunk by how many distinct query terms it contains
    (the integer-exact proxy for retrieval hit quality) and report the
    best chunk score under BOTH chunkings plus the gain — the
    measured-design discipline: overlap costs ~size/stride more
    storage, and this eval is the number that says whether the crack
    coverage pays for it on the actual corpus. Window width and
    strides are imported from the chunker's own constants, so the eval
    can't drift from the op it evaluates.

    Scale shape: two bounded explodes (one per chunking) + one keyed
    max — the same map-side shape as the chunker itself; query terms
    are a broadcast literal list."""
    from awsbeats_spark.operators.llm.corpus import (
        _OCHUNK_SIZE,
        _OCHUNK_STRIDE,
    )

    t = tables(spark, sf_dir)
    qterms = _query_terms_df(spark).groupBy("query_id").agg(
        F.collect_list("term").alias("terms")
    )
    w = t.documents.select("doc_id", words().alias("ws")).withColumn(
        "n", F.size("ws")
    ).filter(F.col("n") >= 1)

    def best(stride: int, alias: str) -> DataFrame:
        chunks = w.select(
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("n") - 1) / stride).cast("int"),
                )
            ).alias("i"),
            F.col("ws"),
            F.col("n"),
        ).select(
            F.slice(
                "ws",
                F.col("i") * stride + 1,
                F.least(
                    F.lit(_OCHUNK_SIZE), F.col("n") - F.col("i") * stride
                ),
            ).alias("cw")
        )
        return (
            chunks.crossJoin(F.broadcast(qterms))
            .select(
                "query_id",
                F.size(F.array_intersect("cw", "terms")).alias("hits"),
            )
            .groupBy("query_id")
            .agg(F.max("hits").cast("long").alias(alias))
        )

    ov = best(_OCHUNK_STRIDE, "best_overlap")
    dj = best(_OCHUNK_SIZE, "best_disjoint")
    return ov.join(dj, "query_id").select(
        "query_id",
        "best_overlap",
        "best_disjoint",
        (F.col("best_overlap") - F.col("best_disjoint"))
        .cast("long")
        .alias("gain"),
    )


# --------------------------------------------------------------------------
# Cross-encoder-style rerank over the BM25 shortlist (hashed interaction
# features — the expensive pairwise scorer runs ONLY on Q x k pairs)
# --------------------------------------------------------------------------

# "Trained" scorer weights, fixed constants (a real cross-encoder's head
# would be a learned MLP; the ENGINE shape — pairwise features computed
# jointly over (query, doc) on the shortlist only — is identical).
_CE_W_COV = 2.0
_CE_W_TF = 1.0
_CE_W_BIGRAM = 0.5
_CE_W_LEN = 0.25
_CE_BUCKETS = 64


def _crossencoder_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    bucket = (
        "CAST(('0x' || substring(md5({w}), 1, 4))::BIGINT"
        f" % {_CE_BUCKETS} AS BIGINT)"
    )
    return f"""
    WITH bm AS ({QUERIES['retrieval_bm25_topk'].oracle}),
    tf AS (
        SELECT doc_id, w AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT avg(dl) AS avgdl FROM dl),
    qb AS (
        SELECT query_id,
               count(*) AS n_terms,
               list(DISTINCT {bucket.format(w='term')}) AS qbl
        FROM {_query_terms_sql()}
        GROUP BY query_id
    ),
    termfeat AS (
        SELECT qt.query_id, tf.doc_id,
               count(*) AS n_present,
               sum(tf.tf) AS tf_sum
        FROM {_query_terms_sql()}
        JOIN tf ON tf.term = qt.term
        GROUP BY qt.query_id, tf.doc_id
    ),
    bl AS (
        SELECT doc_id,
               list_transform({WORDS_SQL}, w -> {bucket.format(w='w')}) AS bl
        FROM documents
    ),
    feats AS (
        SELECT bm.query_id, bm.doc_id, bm.rn AS bm25_rn,
               coalesce(t.n_present, 0) * 1.0 / q.n_terms AS cov,
               ln(1 + coalesce(t.tf_sum, 0)) AS tfsat,
               len(list_filter(
                   generate_series(1, greatest(len(b.bl) - 1, 0)),
                   i -> list_contains(q.qbl, b.bl[i])
                        AND list_contains(q.qbl, b.bl[i + 1])
               )) AS bigram_hits,
               ln(d.dl / s.avgdl) AS len_pen
        FROM bm
        JOIN qb q ON q.query_id = bm.query_id
        LEFT JOIN termfeat t
               ON t.query_id = bm.query_id AND t.doc_id = bm.doc_id
        JOIN bl b ON b.doc_id = bm.doc_id
        JOIN dl d ON d.doc_id = bm.doc_id
        CROSS JOIN stats s
    ),
    scored AS (
        SELECT query_id, doc_id, bm25_rn, bigram_hits,
               {_CE_W_COV} * cov + {_CE_W_TF} * tfsat
                   + {_CE_W_BIGRAM} * ln(1 + bigram_hits)
                   - {_CE_W_LEN} * len_pen AS ce
        FROM feats
    )
    SELECT query_id, doc_id,
           CAST(bm25_rn AS INT) AS bm25_rn,
           CAST(bigram_hits AS BIGINT) AS bigram_hits,
           round(ce, 6) AS ce_score,
           row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(ce, 6) DESC, doc_id) AS rn,
           CAST(bm25_rn AS INT) - CAST(row_number() OVER (
               PARTITION BY query_id
               ORDER BY round(ce, 6) DESC, doc_id) AS INT)
               AS rank_delta
    FROM scored
    """


@query(
    "retrieval_crossencoder_rerank",
    oracle=_crossencoder_oracle(),
    tags=("retrieval",),
)
def retrieval_crossencoder_rerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-encoder-STYLE second-stage rerank (VERDICT r5 item 5): the
    registered BM25 retriever supplies a top-k shortlist per query, and
    an "expensive" PAIRWISE scorer — features computed jointly over
    (query, doc), which a bi-encoder cannot express — re-orders it:
    query-term coverage, saturated TF, a hashed BIGRAM interaction
    (count of adjacent doc-word pairs whose md5 feature-hash buckets
    both fall in the query's bucket set — adjacency is exactly the
    signal dot-product retrieval loses), and a length penalty, combined
    with fixed "trained" weights.

    The architectural point is the CASCADE COST SHAPE (the sparse twin
    of [[sim_search_cascade_rerank]]): the corpus-wide pass is the
    cheap stage-1 scan; the joint scorer touches only Q x k shortlist
    pairs, so its per-pair cost (here a bigram fold over the doc; in
    production a transformer forward pass per pair) never multiplies
    against corpus size. Composes the REGISTERED bm25 operator — same
    DataFrame, same oracle embedded as a CTE — so the shortlist can
    never drift from the ranker it audits.

    Scale shape: stage-2 joins are all shortlist-sized (Q x k rows)
    against broadcast per-query features; the only corpus-scale inputs
    are the tf/dl tables stage 1 already built (at 100 TB: the
    persisted inverted index) and one bucket-array projection of the
    shortlisted docs (semi-join pushdown on doc_id). The bigram fold is
    a JVM higher-order expression, no Python."""
    from awsbeats_spark.registry import QUERIES

    t = tables(spark, sf_dir)
    short = QUERIES["retrieval_bm25_topk"].fn(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rn").alias("bm25_rn")
    )
    w = words()
    toks = t.documents.select("doc_id", F.explode(w).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"))

    def _bucket(c):
        return (
            F.conv(F.substring(F.md5(c), 1, 4), 16, 10).cast("bigint")
            % _CE_BUCKETS
        )

    qt = _query_terms_df(spark)
    qb = qt.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.collect_set(_bucket(F.col("term"))).alias("qbl"),
    )
    termfeat = (
        tf.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum("tf").alias("tf_sum"),
        )
    )
    bl = t.documents.select(
        "doc_id", F.transform(w, _bucket).alias("bl")
    )
    pairs = F.arrays_zip(
        F.slice(F.col("bl"), 1, F.size("bl") - 1).alias("x"),
        F.slice(F.col("bl"), 2, F.size("bl") - 1).alias("y"),
    )
    hits_expr = F.size(
        F.filter(
            pairs,
            lambda s: F.exists(F.col("qbl"), lambda q: q == s["x"])
            & F.exists(F.col("qbl"), lambda q2: q2 == s["y"]),
        )
    )
    feats = (
        short.join(F.broadcast(qb), "query_id")
        .join(termfeat, ["query_id", "doc_id"], "left")
        .join(bl, "doc_id")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            "bm25_rn",
            (
                F.coalesce(F.col("n_present"), F.lit(0))
                / F.col("n_terms")
            ).alias("cov"),
            F.log(1 + F.coalesce(F.col("tf_sum"), F.lit(0))).alias("tfsat"),
            F.when(F.size("bl") >= 2, hits_expr)
            .otherwise(F.lit(0))
            .alias("bigram_hits"),
            F.log(F.col("dl") / F.col("avgdl")).alias("len_pen"),
        )
    )
    ce = (
        _CE_W_COV * F.col("cov")
        + _CE_W_TF * F.col("tfsat")
        + _CE_W_BIGRAM * F.log(1 + F.col("bigram_hits"))
        - _CE_W_LEN * F.col("len_pen")
    )
    # rounded-score ranking: ce folds group-sums AND a global avgdl, so
    # raw ordering is knife-edged both in-engine (clone docs) and
    # cross-engine (sf1 finding, round 11)
    win = Window.partitionBy("query_id").orderBy(
        F.desc(rnd("ce", 6)), F.asc("doc_id")
    )
    return (
        feats.select(
            "query_id", "doc_id", "bm25_rn", "bigram_hits", ce.alias("ce")
        )
        .withColumn("rn", F.row_number().over(win))
        .select(
            "query_id",
            "doc_id",
            F.col("bm25_rn").cast("int").alias("bm25_rn"),
            F.col("bigram_hits").cast("long").alias("bigram_hits"),
            rnd("ce", 6).alias("ce_score"),
            "rn",
            (F.col("bm25_rn").cast("int") - F.col("rn")).alias("rank_delta"),
        )
    )


# --------------------------------------------------------------------------
# RM3 pseudo-relevance feedback (two-round retrieval with query expansion)
# --------------------------------------------------------------------------

PRF_FB_DOCS = 5  # feedback depth: top-k docs of the first round
PRF_FB_TERMS = 8  # expansion width: top-m terms from the feedback docs
PRF_LAMBDA = 0.6  # weight kept on the original query (RM3 interpolation)


def _prf_oracle() -> str:
    return f"""
    WITH qt AS (
        SELECT query_id, term FROM {_query_terms_sql()}
    ),
    tf AS (
        SELECT doc_id, w AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    contrib AS (
        SELECT tf.doc_id, tf.term,
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * (tf.tf * ({BM25_K1} + 1.0))
               / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                  + {BM25_B} * dl.dl / stats.avgdl)) AS c
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
    ),
    base AS (
        SELECT qt.query_id, contrib.doc_id, sum(contrib.c) AS bm25
        FROM qt JOIN contrib USING (term)
        GROUP BY 1, 2
    ),
    fb AS (
        SELECT query_id, doc_id
        FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(bm25, 6) DESC, doc_id
                   ) AS fb_rn
            FROM base
        ) WHERE fb_rn <= {PRF_FB_DOCS}
    ),
    relw AS (
        SELECT fb.query_id, tf.term,
               sum(tf.tf * 1.0 / dl.dl) AS rel_w
        FROM fb
        JOIN tf USING (doc_id)
        JOIN dl USING (doc_id)
        WHERE NOT EXISTS (
            SELECT 1 FROM qt
            WHERE qt.query_id = fb.query_id AND qt.term = tf.term
        )
        GROUP BY 1, 2
    ),
    sel AS (
        SELECT query_id, term, rel_w
        FROM (
            SELECT query_id, term, rel_w,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY round(rel_w, 8) DESC, term
                   ) AS term_rn
            FROM relw
        ) WHERE term_rn <= {PRF_FB_TERMS}
    ),
    wsum AS (SELECT query_id, sum(rel_w) AS wsum FROM sel GROUP BY query_id),
    allw AS (
        SELECT qt.query_id, qt.term,
               {PRF_LAMBDA} / nq.n AS w
        FROM qt
        JOIN (SELECT query_id, count(*) AS n FROM qt GROUP BY query_id) nq
            USING (query_id)
        UNION ALL
        SELECT sel.query_id, sel.term,
               (1.0 - {PRF_LAMBDA}) * sel.rel_w / wsum.wsum AS w
        FROM sel JOIN wsum USING (query_id)
    ),
    rescored AS (
        SELECT allw.query_id, contrib.doc_id,
               sum(allw.w * contrib.c) AS score
        FROM allw JOIN contrib USING (term)
        GROUP BY 1, 2
    )
    SELECT query_id, doc_id, round(score, 6) AS rm3_score, rn
    FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY round(score, 6) DESC, doc_id
               ) AS rn
        FROM rescored
    ) WHERE rn <= {RETR_TOP_K}
    """


@query("retrieval_prf_rm3", oracle=_prf_oracle(), tags=("retrieval",))
def retrieval_prf_rm3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3-style pseudo-relevance feedback: retrieve with BM25, treat
    the top PRF_FB_DOCS results as relevant, mine PRF_FB_TERMS
    expansion terms from them (weight = Σ tf/dl over the feedback set,
    the relevance-model estimate with uniform doc priors), interpolate
    with the original query (λ on the original terms, 1-λ spread over
    the normalized expansion weights), and rescore the corpus with the
    weighted query. The classic two-round retrieval loop (Lavrenko &
    Croft relevance models; Abdul-Jalil et al.'s RM3 variant) that a
    RAG pipeline runs when the first-round recall is thin — no analog
    in the reference (delivery-only, SURVEY.md §0); engine extension.

    Scale shape: both rounds are the BM25 scoring plan — the
    (query_id, term) weight tables are tiny and BROADCAST into the
    per-(doc, term) contribution table; the corpus-statistics
    aggregates (df, dl, avgdl) are |vocab|- or |docs|-bounded; the
    only corpus-sized shuffles are the two per-(query, doc) score
    folds. The feedback mining step runs on PRF_FB_DOCS × |queries|
    rows — driver-scale metadata. As with [[retrieval_bm25_topk]], at
    100 TB the TF table is a persisted inverted index; Catalyst
    re-instantiates it per statistic on the cold plan here.

    Float parity: every per-(doc, term) contribution is a pure
    function of integer-exact (tf, df, dl) and the shared avgdl;
    per-(query, doc) sums have ≤|q| (first round) / ≤|q|+PRF_FB_TERMS
    (second round) addends, and all ranks order by ROUNDED scores with
    id tiebreaks (6 dp for scores, 8 dp for the expansion weights), so
    engine summation order can't reorder a selection except on a
    sub-1e-8 knife edge.
    """
    t = tables(spark, sf_dir)
    toks = t.documents.select("doc_id", F.explode(words()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    c = idf * (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", "tf", "dl", c.alias("c"))
    )
    qt = _query_terms_df(spark)

    base = (
        contrib.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("bm25"))
    )
    fb_win = Window.partitionBy("query_id").orderBy(
        F.desc(rnd("bm25", 6)), F.asc("doc_id")
    )
    fb = (
        base.withColumn("fb_rn", F.row_number().over(fb_win))
        .filter(F.col("fb_rn") <= PRF_FB_DOCS)
        .select("query_id", "doc_id")
    )

    relw = (
        fb.join(tf, "doc_id")
        .join(dl, "doc_id")
        .groupBy("query_id", "term")
        .agg(F.sum(F.col("tf") / F.col("dl")).alias("rel_w"))
        .join(F.broadcast(qt), ["query_id", "term"], "left_anti")
    )
    sel_win = Window.partitionBy("query_id").orderBy(
        F.desc(rnd("rel_w", 8)), F.asc("term")
    )
    sel = (
        relw.withColumn("term_rn", F.row_number().over(sel_win))
        .filter(F.col("term_rn") <= PRF_FB_TERMS)
        .select("query_id", "term", "rel_w")
    )
    wsum = sel.groupBy("query_id").agg(F.sum("rel_w").alias("wsum"))
    nq = qt.groupBy("query_id").agg(F.count(F.lit(1)).alias("n"))
    origw = qt.join(nq, "query_id").select(
        "query_id", "term", (F.lit(PRF_LAMBDA) / F.col("n")).alias("w")
    )
    expw = sel.join(wsum, "query_id").select(
        "query_id",
        "term",
        ((1.0 - PRF_LAMBDA) * F.col("rel_w") / F.col("wsum")).alias("w"),
    )
    allw = origw.unionByName(expw)

    rescored = (
        contrib.join(F.broadcast(allw), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("w") * F.col("c")).alias("score"))
    )
    rn_win = Window.partitionBy("query_id").orderBy(
        F.desc(rnd("score", 6)), F.asc("doc_id")
    )
    return (
        rescored.withColumn("rn", F.row_number().over(rn_win))
        .filter(F.col("rn") <= RETR_TOP_K)
        .select("query_id", "doc_id", rnd("score", 6).alias("rm3_score"), "rn")
    )


def _prf_shift_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    bm25 = QUERIES["retrieval_bm25_topk"].oracle
    rm3 = QUERIES["retrieval_prf_rm3"].oracle
    return f"""
    WITH b AS ({bm25}),
    r AS ({rm3}),
    j AS (
        SELECT coalesce(b.query_id, r.query_id) AS query_id,
               b.rn AS rn_b, r.rn AS rn_r
        FROM b FULL JOIN r
          ON b.query_id = r.query_id AND b.doc_id = r.doc_id
    )
    SELECT query_id,
           CAST(count(*) FILTER (rn_b IS NOT NULL AND rn_r IS NOT NULL)
                AS BIGINT) AS overlap_at_k,
           CAST(count(*) FILTER (rn_b IS NULL) AS BIGINT) AS n_promoted,
           CAST(count(*) FILTER (rn_r IS NULL) AS BIGINT) AS n_dropped,
           round(avg(abs(rn_b - rn_r))
                 FILTER (rn_b IS NOT NULL AND rn_r IS NOT NULL), 4)
               AS mean_abs_rank_shift
    FROM j
    GROUP BY query_id
    """


@query("eval_prf_rank_shift", oracle=_prf_shift_oracle(), tags=("retrieval", "eval"))
def eval_prf_rank_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Honesty twin for [[retrieval_prf_rm3]]: per query, how much did
    pseudo-relevance feedback actually change the top-{RETR_TOP_K}? —
    overlap with the plain-BM25 list, documents promoted INTO the list
    by the expansion (the recall PRF is run for), documents it pushed
    out, and the mean absolute rank shift among survivors. PRF is a
    recall/robustness lever with a known failure mode (query drift:
    expansion terms from off-topic feedback docs); this measures the
    movement so the knob is tuned on evidence, matching the house rule
    that every approximate/second-guess component ships with a
    measured-effect twin ([[eval_minhash_vs_exact]],
    [[eval_ann_recall_ivf]]).

    Scale shape: both input rankings are top-k per query — the join
    and the fold run on |queries| x k rows, driver-scale metadata; the
    corpus-sized work lives in the two operators being compared.
    """
    b = retrieval_bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rn").alias("rn_b")
    )
    r = retrieval_prf_rm3(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rn").alias("rn_r")
    )
    j = b.join(r, ["query_id", "doc_id"], "full_outer")
    both = F.col("rn_b").isNotNull() & F.col("rn_r").isNotNull()
    return j.groupBy("query_id").agg(
        F.count(F.when(both, 1)).cast("long").alias("overlap_at_k"),
        F.count(F.when(F.col("rn_b").isNull(), 1))
        .cast("long")
        .alias("n_promoted"),
        F.count(F.when(F.col("rn_r").isNull(), 1))
        .cast("long")
        .alias("n_dropped"),
        rnd(
            F.avg(F.when(both, F.abs(F.col("rn_b") - F.col("rn_r")))), 4
        ).alias("mean_abs_rank_shift"),
    )


eval_prf_rank_shift.__doc__ = eval_prf_rank_shift.__doc__.replace(
    "{RETR_TOP_K}", str(RETR_TOP_K)
)
