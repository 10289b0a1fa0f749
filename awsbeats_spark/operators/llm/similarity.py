"""Similarity search over the `embeddings` table (64-dim float vectors).

Engine extension (BASELINE.json north star): brute-force cosine top-k as
the correctness baseline, an IVF (inverted-file) variant and a
sign-LSH-bucketed near-dup pass as the 100-TB scale paths.

All cosine math is DOUBLE with sequential accumulation (see
functions/vectorfns.py) so the DuckDB oracle agrees bit-for-bit before
rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import scan_fanout, tables
from awsbeats_spark.functions.vectorfns import (
    _dot_sql,
    as_double,
    cosine,
    cosine_sql,
    dot,
    jl_gauss,
    jl_gauss_sql,
    norm,
    sign_signature,
    sign_signature_sql,
)
from awsbeats_spark.functions.rounding import rnd, rnd_sql
from awsbeats_spark.registry import QUERIES, query

TOP_K = 10
N_QUERIES = 10  # vec_id < 10 are the query set
CENTROID_MOD = 50  # vec_id % 50 == 0 -> centroid (10 cells over 500 vecs)
# The centroid SET is bounded: ids below CENTROID_ID_CAP only. A real
# IVF index trains a FIXED k (set by recall/memory targets) on a sample
# and reuses it as the corpus grows; an uncapped vec_id % 50 rule makes
# k grow linearly with n and turns the O(n*k) assignment quadratic —
# measured alpha 1.6 on the 10x extrapolation dataset before the cap,
# linear after. No-op at the driver's scale factors (max vec_id < cap).
CENTROID_ID_CAP = 5000
N_PROBE = 3
NEAR_DUP_TAU = 0.4  # max pairwise cosine in the testdata is ~0.48


@query(
    "sim_search_topk",
    oracle=f"""
    SELECT q.vec_id AS query_id,
           c.vec_id AS neighbor_id,
           round({cosine_sql('q.embedding', 'c.embedding')}, 6) AS cosine,
           row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {cosine_sql('q.embedding', 'c.embedding')} DESC, c.vec_id
           ) AS rn
    FROM embeddings q
    JOIN embeddings c ON c.vec_id <> q.vec_id
    WHERE q.vec_id < {N_QUERIES}
    QUALIFY rn <= {TOP_K}
    """,
)
def sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against
    the full corpus — one scan of the corpus, no shuffle of it at data
    scale. This is the exact baseline; at 100 TB brute force is still
    the right answer when the query set is small (it's a broadcast-map,
    not a cross shuffle), and the IVF/LSH variants below cut the scan
    itself. scan_fanout spreads the corpus side across cores ONLY when
    the input is a bench-scale unsplittable file (guide §2.5); past the
    256 MB gate it is a no-op and the no-corpus-shuffle shape holds."""
    t = tables(spark, sf_dir)
    emb = t.embeddings
    # Norms once per side (not per pair): sqrt(dot(v,v)) is exactly the
    # oracle's arithmetic, so hoisting it out of the pair loop is free.
    # selectExpr/expr strings (round 11): ~590 py4j roundtrips -> ~40.
    q = (
        emb.where(f"vec_id < {N_QUERIES}")
        .selectExpr("vec_id AS query_id", "cast(embedding AS array<double>) AS qv")
        .selectExpr("query_id", "qv", f"sqrt({_dot_sql('qv', 'qv')}) AS nq")
    )
    c = (
        scan_fanout(emb, sf_dir, "embeddings")
        .selectExpr("vec_id AS neighbor_id", "cast(embedding AS array<double>) AS cv")
        .selectExpr("neighbor_id", "cv", f"sqrt({_dot_sql('cv', 'cv')}) AS nc")
    )
    return (
        F.broadcast(q)
        .join(c, F.expr("neighbor_id != query_id"))
        .selectExpr(
            "query_id", "neighbor_id", f"{_dot_sql('qv', 'cv')} / (nq * nc) AS cos_raw"
        )
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id"
            " ORDER BY cos_raw DESC, neighbor_id ASC) AS rn",
        )
        .where(f"rn <= {TOP_K}")
        .selectExpr(
            "query_id", "neighbor_id", f"{rnd_sql('cos_raw', 6)} AS cosine", "rn"
        )
    )


@query(
    "sim_search_ivf",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cent_id, embedding AS cv
        FROM embeddings
        WHERE vec_id % {CENTROID_MOD} = 0 AND vec_id < {CENTROID_ID_CAP}
    ),
    assign AS (
        SELECT e.vec_id, e.embedding, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {cosine_sql('e.embedding', 'c.cv')} DESC, c.cent_id
               ) AS arn
        FROM embeddings e CROSS JOIN centroids c
        QUALIFY arn = 1
    ),
    probes AS (
        SELECT q.vec_id AS query_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'c.cv')} DESC, c.cent_id
               ) AS prn
        FROM embeddings q CROSS JOIN centroids c
        WHERE q.vec_id < {N_QUERIES}
        QUALIFY prn <= {N_PROBE}
    )
    SELECT p.query_id,
           a.vec_id AS neighbor_id,
           round({cosine_sql('q.embedding', 'a.embedding')}, 6) AS cosine,
           row_number() OVER (
               PARTITION BY p.query_id
               ORDER BY {cosine_sql('q.embedding', 'a.embedding')} DESC, a.vec_id
           ) AS rn
    FROM probes p
    JOIN assign a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
    JOIN embeddings q ON q.vec_id = p.query_id
    QUALIFY rn <= {TOP_K}
    """,
)
def sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbor: partition the corpus into cells
    by nearest centroid (deterministic centroid pick: vec_id % 50 == 0),
    probe the 3 best cells per query, exact top-k within them.

    Scale: assignment is a broadcast map over the corpus (centroids are
    tiny); the probe join touches nprobe/ncells of the data instead of
    all of it. Cells are the unit of partition pruning — at 100 TB,
    partition the corpus files BY cell id so probing reads only those
    files. Recall vs brute force is measured in tests/test_llm_ops.py.
    """
    t = tables(spark, sf_dir)
    emb = t.embeddings
    # Norms are computed ONCE per vector/centroid before any pairing, so
    # each of the ncells-per-vector scores costs a single zip_with dot
    # instead of three. sqrt(dot(v,v)) is the exact arithmetic the oracle
    # uses, so precomputing it changes nothing bit-wise.
    # selectExpr/expr strings throughout (round 11): the Column-API form
    # cost ~1050 py4j roundtrips (~0.37 s) per build; one parsed SQL
    # string per projection yields the identical Catalyst expressions.
    cents = (
        emb.where(f"vec_id % {CENTROID_MOD} = 0 AND vec_id < {CENTROID_ID_CAP}")
        .selectExpr("vec_id AS cent_id", "cast(embedding AS array<double>) AS cv")
        .selectExpr("cent_id", "cv", f"sqrt({_dot_sql('cv', 'cv')}) AS nc")
    )
    vecs = (
        scan_fanout(emb, sf_dir, "embeddings")
        .selectExpr("vec_id", "cast(embedding AS array<double>) AS ev")
        .selectExpr("vec_id", "ev", f"sqrt({_dot_sql('ev', 'ev')}) AS ne")
    )
    # Cell assignment is an argmax, not a top-k: max_by with a
    # (score, -cent_id) ordering struct replaces the row_number window —
    # the 100-cells-per-vector cross product is reduced MAP-SIDE by the
    # partial aggregate instead of being shuffled and sorted whole.
    # Ordering matches the oracle's (cosine DESC, cent_id ASC).
    assign = (
        vecs.crossJoin(F.broadcast(cents))
        .selectExpr(
            "vec_id", "ev", "ne", "cent_id",
            f"{_dot_sql('ev', 'cv')} / (ne * nc) AS c_ac",
        )
        .groupBy("vec_id")
        .agg(
            F.expr("max_by(cent_id, struct(c_ac, -cent_id))").alias("cent_id"),
            F.expr("any_value(ev)").alias("ev"),
            F.expr("any_value(ne)").alias("ne"),
        )
    )
    queries = vecs.where(f"vec_id < {N_QUERIES}").selectExpr(
        "vec_id AS query_id", "ev AS qv", "ne AS nq"
    )
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .selectExpr(
            "query_id", "qv", "nq", "cent_id",
            f"{_dot_sql('qv', 'cv')} / (nq * nc) AS c_qc",
        )
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id"
            " ORDER BY c_qc DESC, cent_id ASC) AS prn",
        )
        .where(f"prn <= {N_PROBE}")
        .select("query_id", "qv", "nq", "cent_id")
    )
    return (
        F.broadcast(probes)
        .join(assign, "cent_id")
        .where("vec_id != query_id")
        .selectExpr(
            "query_id", "vec_id AS neighbor_id",
            f"{_dot_sql('qv', 'ev')} / (nq * ne) AS cos_raw",
        )
        .selectExpr(
            "*",
            "row_number() OVER (PARTITION BY query_id"
            " ORDER BY cos_raw DESC, neighbor_id ASC) AS rn",
        )
        .where(f"rn <= {TOP_K}")
        .selectExpr(
            "query_id", "neighbor_id", f"{rnd_sql('cos_raw', 6)} AS cosine", "rn"
        )
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({cosine_sql('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= {NEAR_DUP_TAU}
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs. Two physical strategies
    behind ONE output contract:

    * corpus <= EXACT_DEDUP_MAX_ROWS: the exact pairwise join — the
      correctness baseline the oracle checks (sf dirs are far below the
      ceiling, so driver comparisons always take this path).
    * larger corpora: banded sign-LSH candidate generation + exact
      cosine rescoring (_dedup_cosine_lsh). 16 bands x 4 bits over the
      64 coordinate signs; only same-band-signature pairs are scored,
      replacing the O(n²) join with 16 hash equi-joins. Recall at
      tau=0.4 is ~1-(1-p^4)^16 with p = 1 - theta/pi — ~0.996 for
      isotropic data; precision is exactly 1.0 (every candidate is
      rescored with the true cosine).

    The registered oracle is the exact pairwise SQL: it governs the
    exact path (always taken at driver-comparison scale). The LSH path
    is the documented sub-1.0-recall approximation, validated instead
    by tests/test_llm_ops.py (forced-path recall/precision bounds).

    The row-count probe reads parquet footer metadata when the dataset
    is a local file/dir (no Spark job); only non-probeable sources pay
    a count().
    """
    t = tables(spark, sf_dir)
    n = _parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    if n is None:
        n = t.embeddings.count()
    if n > EXACT_DEDUP_MAX_ROWS:
        return _dedup_cosine_lsh(t)
    return _dedup_cosine_exact(t)


def _parquet_num_rows(path: str) -> int | None:
    """Footer-metadata row count; None when not locally probeable."""
    import os

    import pyarrow.parquet as pq

    try:
        if os.path.isfile(path):
            return pq.read_metadata(path).num_rows
        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.read_metadata(os.path.join(root, f)).num_rows
            return total
        return None
    except (OSError, ValueError):
        return None


# Exact-path ceiling, ~2e8 scored pairs. The 10x extrapolation run
# (EXTRAPOLATION.md) measured BOTH paths at 20k rows and the exact
# broadcast-NL path won: at tau = 0.4 a random pair survives a 4-bit
# band with p ~ (1/2)^4, so ~1-(15/16)^16 = 64% of ALL pairs remain
# candidates — banding barely prunes at low thresholds and the LSH
# path's candidate shuffle costs more than just scoring every pair in
# codegen. Banded LSH earns its keep when tau >= ~0.9 (production
# near-dup regimes), where per-band survival for random pairs collapses
# but near-dups still collide; the gate keeps the LSH path for beyond-
# ceiling corpora where exact is impossible, and the low-tau caveat is
# documented where the threshold is set.
EXACT_DEDUP_MAX_ROWS = 20_000


def _dedup_cosine_exact(t) -> DataFrame:
    from awsbeats_spark.functions.vectorfns import dot, norm

    # Per-vector norms are computed ONCE per side (500 rows) before the
    # pair join, so each of the n²/2 pairs costs a single zip_with dot
    # instead of three; repartition spreads the nested-loop join across
    # cores (the parquet side arrives as one partition) and is sized to
    # the host, not a local[32] constant. Same arithmetic as cosine():
    # dot/(sqrt(aa)*sqrt(bb)) — oracle-bit-identical.
    a = t.embeddings.select(
        F.col("vec_id").alias("vec_a"), as_double("embedding").alias("va")
    ).select("vec_a", "va", norm("va").alias("na")).repartition(
        t.spark.sparkContext.defaultParallelism
    )
    b = t.embeddings.select(
        F.col("vec_id").alias("vec_b"), as_double("embedding").alias("vb")
    ).select("vec_b", "vb", norm("vb").alias("nb"))
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= NEAR_DUP_TAU)
        .select("vec_a", "vec_b", rnd("cos_raw", 6).alias("cosine"))
    )


def _dedup_cosine_lsh(t, r: int = 4, bands: int = 16) -> DataFrame:
    """Banded sign-LSH candidates, exact rescore. Same columns/semantics
    as the exact path minus the probabilistic recall miss documented in
    dedup_embedding_cosine."""
    from awsbeats_spark.functions.vectorfns import dot, norm

    dim = r * bands  # 64 coordinate signs, one band per 4 consecutive dims
    base = t.embeddings.select("vec_id", as_double("embedding").alias("v"))
    full_sig = F.concat(
        *[
            F.when(F.element_at(F.col("v"), i + 1) > 0, F.lit("1")).otherwise(
                F.lit("0")
            )
            for i in range(dim)
        ]
    )
    sigs = base.select(
        "vec_id", "v", full_sig.alias("sig"), norm("v").alias("nv")
    )
    # Candidate generation joins IDS ONLY: the band self-join's output
    # is |candidate pairs| rows, and dragging two 64-dim double arrays
    # through that shuffle multiplies its volume ~50x (measured: the
    # array-carrying form timed out on the 10x extrapolation dataset
    # where the id-only form finishes in seconds). Vectors re-join for
    # rescoring only AFTER dropDuplicates — two hash joins against the
    # n-row vector table, each moving each vector once.
    banded = sigs.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.substring("sig", k * r + 1, r) for k in range(bands)])
        ).alias("band", "bsig"),
    )
    cand = (
        banded.select(F.col("vec_id").alias("vec_a"), "band", "bsig")
        .join(
            banded.select(F.col("vec_id").alias("vec_b"), "band", "bsig"),
            ["band", "bsig"],
        )
        .filter(F.col("vec_a") < F.col("vec_b"))
        # a pair colliding in several bands must score once
        .dropDuplicates(["vec_a", "vec_b"])
        .select("vec_a", "vec_b")
    )
    va = sigs.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nv").alias("na")
    )
    vb = sigs.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nv").alias("nb")
    )
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .select("vec_a", "vec_b", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= NEAR_DUP_TAU)
        .select("vec_a", "vec_b", rnd("cos_raw", 6).alias("cosine"))
    )


@query(
    "sim_search_lsh_bucketed",
    oracle=f"""
    WITH sigs AS (
        SELECT vec_id, embedding,
               {sign_signature_sql('embedding')} AS sig
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.sig AS bucket,
           round({cosine_sql('a.embedding', 'b.embedding')}, 6) AS cosine
    FROM sigs a
    JOIN sigs b ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE {cosine_sql('a.embedding', 'b.embedding')} >= 0.0
    """,
)
def sim_search_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed candidate pairs: 16-bit coordinate-hyperplane
    signature; only same-bucket pairs are scored (cosine >= 0 keeps all
    scored candidates visible for the oracle).

    Scale: this replaces the O(n²) pair join with an equi-join on the
    signature — candidates per bucket ~ n/2^16 on spread-out data. More
    bits => higher precision / lower recall; band multiple signatures
    (as in dedup_minhash) to recover recall."""
    t = tables(spark, sf_dir)
    sigs = t.embeddings.select(
        "vec_id",
        as_double("embedding").alias("ev"),
        sign_signature(F.col("embedding")).alias("sig"),
    ).select("vec_id", "ev", "sig", norm("ev").alias("nv"))
    a = sigs.select(
        F.col("vec_id").alias("vec_a"),
        F.col("ev").alias("va"),
        F.col("nv").alias("na"),
        F.col("sig").alias("bucket"),
    )
    b = sigs.select(
        F.col("vec_id").alias("vec_b"),
        F.col("ev").alias("vb"),
        F.col("nv").alias("nb"),
        F.col("sig").alias("sig_b"),
    )
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (F.col("bucket") == F.col("sig_b")) & (F.col("vec_a") < F.col("vec_b")))
        .select("vec_a", "vec_b", "bucket", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= 0.0)
        .select("vec_a", "vec_b", "bucket", rnd("cos_raw", 6).alias("cosine"))
    )


KNN_K = 5


@query(
    "embed_knn_classify",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding AS qv, label AS true_label
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    nn AS (
        SELECT q.query_id, q.true_label, e.label AS nn_label,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {cosine_sql('q.qv', 'e.embedding')} DESC, e.vec_id
               ) AS rn
        FROM q CROSS JOIN embeddings e
        WHERE e.vec_id >= {N_QUERIES}
        QUALIFY rn <= {KNN_K}
    ),
    votes AS (
        SELECT query_id, true_label, nn_label, count(*) AS n_votes,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY count(*) DESC, nn_label
               ) AS vrn
        FROM nn GROUP BY 1, 2, 3
    )
    SELECT query_id, nn_label AS pred_label, n_votes, true_label,
           CASE WHEN nn_label = true_label THEN 1 ELSE 0 END AS is_correct
    FROM votes WHERE vrn = 1
    """,
)
def embed_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label prediction (k=5, cosine, majority vote with
    smallest-label tie-break): the retrieval-as-inference pattern of a
    training-data pipeline (label propagation / nearest-class
    auditing). Same scale shape as sim_search_topk — the query set
    broadcasts, the corpus streams through one scan, and only the
    (query, k) vote table shuffles."""
    emb = tables(spark, sf_dir).embeddings
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
        F.col("label").alias("true_label"),
    )
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("cv"),
        F.col("label").alias("nn_label"),
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    nn = (
        F.broadcast(q)
        .crossJoin(c)
        .select(
            "query_id",
            "true_label",
            "nn_label",
            "neighbor_id",
            cosine("qv", "cv").alias("cos_raw"),
        )
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= KNN_K)
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("nn_label")
    )
    return (
        nn.groupBy("query_id", "true_label", "nn_label")
        .agg(F.count("*").alias("n_votes"))
        .withColumn("vrn", F.row_number().over(wv))
        .filter(F.col("vrn") == 1)
        .select(
            "query_id",
            F.col("nn_label").alias("pred_label"),
            "n_votes",
            "true_label",
            (F.col("nn_label") == F.col("true_label")).cast("int").alias("is_correct"),
        )
    )


N_DIMS = 64  # fixed embedding dimensionality across all SFs (FIXTURES.md)


# Shared verbatim by embed_quantize_sq8 and its cosine-preservation
# honesty twin — one quantizer definition, zero drift between the codes
# an index would store and the measured reconstruction quality.
_SQ8_CODED_SQL = f"""
    dims AS (
        SELECT i.dim,
               min(CAST(embedding[i.dim] AS DOUBLE)) AS mn,
               max(CAST(embedding[i.dim] AS DOUBLE)) AS mx
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, {N_DIMS})) AS dim) i
        GROUP BY i.dim
    ),
    coded AS (
        SELECT e.vec_id, d.dim, d.mn, d.mx,
               CAST(e.embedding[d.dim] AS DOUBLE) AS x,
               CASE WHEN d.mx > d.mn
                    THEN CAST(floor((CAST(e.embedding[d.dim] AS DOUBLE) - d.mn)
                                    / (d.mx - d.mn) * 255 + 0.5) AS INT)
                    ELSE 0 END AS code
        FROM embeddings e CROSS JOIN dims d
    )"""


@query(
    "embed_quantize_sq8",
    oracle=f"""
    WITH {_SQ8_CODED_SQL}
    SELECT vec_id,
           string_agg(CAST(code AS VARCHAR), ',' ORDER BY dim) AS codes,
           round(max(abs(x - (mn + (code / 255.0) * (mx - mn)))), 6)
               AS max_abs_err
    FROM coded
    GROUP BY vec_id
    """,
)
def embed_quantize_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization: per-dimension global [min, max] -> each
    vector compressed to 64 uint8 codes (the storage layout an IVF-SQ8
    ANN index actually persists; 4x smaller than float32, 8x than
    float64). Returns the code string plus each vector's max absolute
    reconstruction error. Engine extension — the quantization stage of
    the similarity-search path (SURVEY.md §2.C, LLM-data ops).

    Scale: the stats pass reduces 100 TB of vectors to exactly 64
    (dim, min, max) rows via partial map-side min/max — the shuffle is
    64 rows per partition. The 1-row stats relation then broadcasts
    back (BroadcastNestedLoopJoin over a single row), and encoding is a
    narrow per-row transform: two scans total, no wide exchange of the
    vectors themselves. All arithmetic is DOUBLE with the same op order
    in both engines, so codes match exactly, not just approximately."""
    t = tables(spark, sf_dir)
    stats = (
        t.embeddings.select(
            F.posexplode(as_double(F.col("embedding"))).alias("dim0", "x")
        )
        .groupBy("dim0")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim0", "mn"))),
                lambda s: s.mn,
            ).alias("mns"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim0", "mx"))),
                lambda s: s.mx,
            ).alias("mxs"),
        )
    )

    def _mn(i):
        return F.element_at(F.col("mns"), i + 1)

    def _mx(i):
        return F.element_at(F.col("mxs"), i + 1)

    def _code(x, i):
        return F.when(
            _mx(i) > _mn(i),
            F.floor((x - _mn(i)) / (_mx(i) - _mn(i)) * 255 + 0.5).cast("int"),
        ).otherwise(F.lit(0))

    xd = as_double(F.col("embedding"))
    codes = F.transform(xd, _code)
    err = F.transform(
        xd,
        lambda x, i: F.abs(
            x - (_mn(i) + (_code(x, i) / F.lit(255.0)) * (_mx(i) - _mn(i)))
        ),
    )
    return (
        t.embeddings.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            F.array_join(codes.cast("array<string>"), ",").alias("codes"),
            rnd(F.array_max(err), 6).alias("max_abs_err"),
        )
    )


KMEANS_K = 8  # init centroids: vec_id % 64 == 0 over the 500-vector table
# Bounded-sample rule (see CENTROID_ID_CAP / EXTRAPOLATION.md): init
# centroids and PQ codebook entries come from a FIXED id prefix so the
# model size doesn't grow with the corpus — no-op at the driver SFs
# (max vec_id there < 512), linear-cost beyond.
SAMPLE_ID_CAP = 512
KMEANS_ITERS = 3


def _kmeans_assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroids against the
    corpus and reduce the k candidates per vector MAP-SIDE via min_by —
    the corpus is scanned once and never shuffled whole (the groupBy key
    is vec_id, already unique, so AQE coalesces it to a near-no-op; the
    k-way candidate fan-out collapses in the partial aggregate)."""
    sqdist = F.aggregate(
        F.zip_with(F.col("ev"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "ev", "cent_id", sqdist.alias("d2"))
        .groupBy("vec_id")
        .agg(
            F.min_by(F.col("cent_id"), F.struct(F.col("d2"), F.col("cent_id"))).alias(
                "cluster_id"
            ),
            F.min(F.struct(F.col("d2"), F.col("cent_id"))).getField("d2").alias("d2"),
            F.any_value(F.col("ev")).alias("ev"),
        )
    )


def _kmeans_iter_sql(i: int) -> str:
    """One unrolled Lloyd iteration as DuckDB CTEs: a{i} = nearest-
    centroid assignment against c{i-1} (sequential-fold squared L2,
    (d2, cent_id) tie-break — the exact Spark min_by ordering), then
    c{i} = per-cluster per-dim mean ROUNDED to 6 decimals (the
    quantization that makes the float loop engine-portable, see the
    operator docstring)."""
    return f"""
    a{i} AS (
        SELECT vec_id, ev, cent_id AS cluster_id, d2
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY d2, cent_id) AS rn
            FROM (
                SELECT v.vec_id, v.ev, c.cent_id,
                       list_sum(list_transform(list_zip(v.ev, c.cv),
                                p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d2
                FROM kvecs v CROSS JOIN c{i - 1} c
            )
        ) WHERE rn = 1
    ),
    u{i} AS (
        SELECT cluster_id, unnest(ev) AS x,
               unnest(range(1, 1 + len(ev))) AS pos
        FROM a{i}
    ),
    c{i} AS (
        SELECT cluster_id AS cent_id, list(m ORDER BY pos) AS cv
        FROM (
            SELECT cluster_id, pos, round(avg(x), 6) AS m
            FROM u{i} GROUP BY cluster_id, pos
        ) GROUP BY cluster_id
    )"""


def _kmeans_final_assignments(
    spark: SparkSession, sf_dir: str, capped: bool = True
) -> DataFrame:
    """Run the full quantized Lloyd loop and return the final
    assignment relation (vec_id, cluster_id, d2, ev) — shared by
    embed_kmeans_cluster and embed_semdedup_prune so both pin the SAME
    engine-portable trajectory (see embed_kmeans_cluster docstring).

    ``capped=True`` bounds k at the SAMPLE_ID_CAP prefix (fixed model
    size — the kmeans summary's contract); ``capped=False`` lets k grow
    with the corpus (init = every 64th vec id), which keeps CLUSTER
    SIZES bounded instead — the contract SemDeDup needs, because its
    within-cluster pair cost is sum(cluster_size²)."""
    t = tables(spark, sf_dir)
    vecs = t.embeddings.select("vec_id", as_double(F.col("embedding")).alias("ev"))
    init = F.col("vec_id") % 64 == 0
    if capped:
        init = init & (F.col("vec_id") < SAMPLE_ID_CAP)
    cents = vecs.filter(init).select(
        F.col("vec_id").alias("cent_id"), F.col("ev").alias("cv")
    )
    for _ in range(KMEANS_ITERS):
        assigned = _kmeans_assign(vecs, cents)
        # element-wise mean per cluster; re-key cent_id to the cluster id
        new_cents = (
            assigned.select("cluster_id", F.posexplode("ev").alias("pos", "x"))
            .groupBy("cluster_id", "pos")
            .agg(rnd(F.avg("x"), 6).alias("m"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .select(F.col("cluster_id").alias("cent_id"), "cv")
        )
        # k rows × dim doubles — driver-side materialization by design
        cents = spark.createDataFrame(
            [(r["cent_id"], list(r["cv"])) for r in new_cents.collect()],
            "cent_id long, cv array<double>",
        )
    return _kmeans_assign(vecs, cents)


def _kmeans_oracle_ctes(capped: bool = True) -> str:
    """Shared oracle prelude: the unrolled quantized Lloyd trajectory
    whose final assignment relation is a{KMEANS_ITERS + 1}; ``capped``
    mirrors _kmeans_final_assignments' init rule."""
    cap = f" AND vec_id < {SAMPLE_ID_CAP}" if capped else ""
    return f"""
    WITH kvecs AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ),
    c0 AS (
        SELECT vec_id AS cent_id, ev AS cv FROM kvecs
        WHERE vec_id % 64 = 0{cap}
    ),
    {",".join(_kmeans_iter_sql(i) for i in range(1, KMEANS_ITERS + 2))}
"""


_KMEANS_ORACLE_CTES = _kmeans_oracle_ctes(capped=True)


@query(
    "embed_kmeans_cluster",
    oracle=f"""
    {_KMEANS_ORACLE_CTES}
    SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
           round(sum(d2), 4) AS inertia
    FROM a{KMEANS_ITERS + 1}
    GROUP BY cluster_id
    """,
)
def embed_kmeans_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding corpus (k=8, 3 iterations,
    deterministic init: vec_id % 64 == 0) — the clustering primitive
    behind semantic dedup / corpus mixing; returns per-cluster size and
    inertia.

    Hash-checked since round 6 (rows-only before; VERDICT r5 item 4,
    the graph_lpa_communities fixed-rounds pattern applied to floats):
    the oracle unrolls the SAME 3 synchronous iterations as plain CTEs.
    Float portability comes from two pinned choices: (1) the squared-L2
    is a SEQUENTIAL fold in both engines (F.aggregate/zip_with vs
    list_sum/list_transform/list_zip — the sim_search_pq parity), so
    distances are IEEE-identical; (2) each iteration's centroid means
    are ROUNDED to 6 decimals in both engines, absorbing the ~1e-13
    cross-engine/run-order wobble of a parallel avg before it can feed
    the next assignment (a flip would need two centroids within 1e-6 of
    equidistant — asserted never on this corpus by the NumPy twin).
    Ties break (d2 ASC, cent_id ASC) in both engines: min_by over a
    (d2, cent_id) struct vs a row_number window.

    Scale design: the corpus side is only ever (a) broadcast-joined
    against k centroids and (b) partially aggregated — it is never
    shuffled whole and never collected. Centroid updates compute the
    element-wise mean via posexplode → (cluster, dim) partial aggregate
    (shuffle volume O(k·dim), not O(rows·dim)). Only the k×dim centroid
    matrix crosses to the driver between iterations (the standard
    scalable-k-means step; a few KB at any corpus size), which also
    keeps the lineage flat instead of 3 plans deep. The 6-decimal
    centroid quantization is free at scale — it is driver-side math on
    k×dim values.

    Checked against a NumPy reference implementation in
    tests/test_llm_ops.py (same init, same iteration count).
    """
    final = _kmeans_final_assignments(spark, sf_dir)
    return (
        final.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            rnd(F.sum("d2"), 4).alias("inertia"),
        )
        .orderBy("cluster_id")
    )


_SEMDEDUP_TAU = 0.3


@query(
    "embed_semdedup_prune",
    oracle=f"""
    {_kmeans_oracle_ctes(capped=False)}
    SELECT a.cluster_id,
           a.vec_id AS keep_id,
           b.vec_id AS prune_id,
           round({cosine_sql('a.ev', 'b.ev')}, 6) AS cosine
    FROM a{KMEANS_ITERS + 1} a
    JOIN a{KMEANS_ITERS + 1} b
      ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    WHERE round({cosine_sql('a.ev', 'b.ev')}, 6) >= {_SEMDEDUP_TAU}
    """,
)
def embed_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    WITHIN-CLUSTER cosine — k-means first, then pairwise cosine only
    inside each cluster; pairs above tau={tau} are semantic duplicates
    and the higher vec_id is pruned (keep_id = the min-id canonical,
    the paper's keep-one rule made deterministic). This is the dedup
    layer ABOVE lexical near-dup ([[dedup_minhash]] catches shared
    text; this catches paraphrases that share no shingles), the
    technique measured to cut LAION/C4 30-50% with no quality loss.

    Composes the engine's own machinery: the cluster assignment IS the
    [[embed_kmeans_cluster]] quantized Lloyd trajectory (shared helper
    + shared oracle CTEs, so both operators pin the same clustering),
    cosines are sequential folds (engine-identical), and the threshold
    compares the ROUNDED score (the round-before-compare contract).

    Scale shape: clustering bounds the quadratic — the pair join is an
    equi-join on cluster_id, O(sum of cluster_size²) not O(n²). k must
    GROW with the corpus for that bound to hold (SemDeDup uses ~100k
    clusters for 5B docs), so this operator runs the shared trajectory
    UNCAPPED (init = every 64th vec id → k ∝ n, cluster sizes ~64
    bounded) — the capped k=8 summary contract of
    [[embed_kmeans_cluster]] would make pairs quadratic, the defect the
    10x probe caught at alpha 1.01 (EXTRAPOLATION.md batch 80). The
    between-iteration centroid materialization is k×dim (n/64 doubles —
    ~50 MB at SemDeDup's published scale, still broadcastable); at
    extreme scale the assignment step swaps in the [[sim_search_ivf]]
    cell-pruned path instead of the dense broadcast."""
    final = _kmeans_final_assignments(spark, sf_dir, capped=False).select(
        "cluster_id", "vec_id", "ev"
    )
    a = final.select(
        "cluster_id",
        F.col("vec_id").alias("keep_id"),
        F.col("ev").alias("ea"),
        norm("ev").alias("na"),
    ).hint("shuffle_hash")
    b = final.select(
        "cluster_id",
        F.col("vec_id").alias("prune_id"),
        F.col("ev").alias("eb"),
        norm("ev").alias("nb"),
    ).hint("shuffle_hash")
    cos = rnd(
        dot("ea", "eb") / (F.col("na") * F.col("nb")), 6
    )
    return (
        a.join(
            b,
            (a["cluster_id"] == b["cluster_id"])
            & (F.col("keep_id") < F.col("prune_id")),
        )
        .select(
            a["cluster_id"].alias("cluster_id"),
            "keep_id",
            "prune_id",
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= _SEMDEDUP_TAU)
    )


embed_semdedup_prune.__doc__ = embed_semdedup_prune.__doc__.replace(
    "{tau}", str(_SEMDEDUP_TAU)
)


_SEMDEDUP_FINE_MOD = 64  # same fine-centroid init rule as embed_semdedup_prune

_SEMDEDUP_IVF_ORACLE = f"""
    WITH kvecs AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ),
    coarse AS (
        SELECT vec_id AS cell_id, ev AS cv FROM kvecs
        WHERE vec_id % {CENTROID_MOD} = 0 AND vec_id < {CENTROID_ID_CAP}
    ),
    vcell AS (
        SELECT vec_id, ev, cell_id FROM (
            SELECT v.vec_id, v.ev, c.cell_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY {cosine_sql('v.ev', 'c.cv')} DESC, c.cell_id
                   ) AS rn
            FROM kvecs v CROSS JOIN coarse c
        ) WHERE rn = 1
    ),
    freg AS (
        SELECT cell_id, cent_id, fv FROM (
            SELECT c.cell_id, f.vec_id AS cent_id, f.ev AS fv,
                   row_number() OVER (
                       PARTITION BY f.vec_id
                       ORDER BY {cosine_sql('f.ev', 'c.cv')} DESC, c.cell_id
                   ) AS prn
            FROM kvecs f CROSS JOIN coarse c
            WHERE f.vec_id % {_SEMDEDUP_FINE_MOD} = 0
        ) WHERE prn <= {N_PROBE}
    ),
    assigned AS (
        SELECT vec_id, ev, cluster_id FROM (
            SELECT v.vec_id, v.ev, r.cent_id AS cluster_id,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_sum(list_transform(list_zip(v.ev, r.fv),
                                p -> (p[1] - p[2]) * (p[1] - p[2]))), r.cent_id
                   ) AS arn
            FROM vcell v JOIN freg r USING (cell_id)
        ) WHERE arn = 1
    )
    SELECT a.cluster_id,
           a.vec_id AS keep_id,
           b.vec_id AS prune_id,
           round({cosine_sql('a.ev', 'b.ev')}, 6) AS cosine
    FROM assigned a
    JOIN assigned b
      ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    WHERE round({cosine_sql('a.ev', 'b.ev')}, 6) >= {_SEMDEDUP_TAU}
"""


@query("embed_semdedup_prune_ivf", oracle=_SEMDEDUP_IVF_ORACLE)
def embed_semdedup_prune_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the 100-TB configuration (VERDICT r7 item 5): the
    dense assignment step of [[embed_semdedup_prune]] — every vector
    scored against ALL k fine centroids, n·k·d work with k ∝ n — is
    replaced by the [[sim_search_ivf]] cell-pruned composition, made
    real instead of asserted:

    1. COARSE cells: the sim_search_ivf centroid rule (vec_id %
       {CENTROID_MOD} == 0, capped) — a small FIXED set, broadcast;
       every vector goes to its argmax-cosine cell map-side (max_by,
       no shuffle of the corpus).
    2. FINE centroids (the semdedup init rule, vec_id %
       {_SEMDEDUP_FINE_MOD} == 0, k ∝ n) multi-register into their
       top-{N_PROBE} coarse cells — the probe fan-out rides the SMALL
       side (k rows), not the corpus, which is what makes the layout
       scale: probing vectors into multiple cells would put a top-n
       window on n rows.
    3. Fine assignment scores each vector against only its cell's
       registered centroids (equi-join on cell_id + map-side argmin
       squared-L2, the [[embed_kmeans_cluster]] metric and tie-break),
       so assignment cost drops from n·k to n·(k_coarse +
       nprobe·k/cells) — per-vector work bounded by cell occupancy,
       not corpus size.
    4. Within-cluster prune: identical to embed_semdedup_prune
       (pairwise cosine, round-before-compare, keep the min id).

    A vector whose coarse cell hosts no registered fine centroid drops
    out of the prune — conservatively KEPT, the fail-open direction a
    dedup filter wants (both engines inner-join identically, so the
    oracle pins the same row set).

    Scale shape: one broadcast (coarse cells, fixed size), one
    equi-join shuffle of the corpus on cell_id (linear bytes, bounded
    by cell occupancy — never the all-pairs n·k fan-out), then the
    cluster-bounded pair join. The 10x probe for this operator targets
    the assignment stage staying sublinear while the prune stage stays
    output-driven (EXTRAPOLATION.md)."""
    t = tables(spark, sf_dir)
    vecs = t.embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("ev")
    ).select("vec_id", "ev", norm("ev").alias("ne"))
    coarse = vecs.filter(
        (F.col("vec_id") % CENTROID_MOD == 0) & (F.col("vec_id") < CENTROID_ID_CAP)
    ).select(
        F.col("vec_id").alias("cell_id"),
        F.col("ev").alias("cv"),
        F.col("ne").alias("nc"),
    )
    # 1. vector -> argmax-cosine coarse cell, reduced MAP-SIDE (max_by
    # over the (cosine, -cell_id) struct = the oracle's DESC/ASC window)
    v_score = dot("ev", "cv") / (F.col("ne") * F.col("nc"))
    vcell = (
        vecs.crossJoin(F.broadcast(coarse))
        .select("vec_id", "ev", "ne", "cell_id", v_score.alias("s"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("cell_id"), F.struct(F.col("s"), -F.col("cell_id"))
            ).alias("cell_id"),
            F.any_value(F.col("ev")).alias("ev"),
            F.any_value(F.col("ne")).alias("ne"),
        )
    )
    # 2. fine centroids register into their top-N_PROBE cells (window on
    # the SMALL side only: k rows x coarse cells)
    fine = vecs.filter(F.col("vec_id") % _SEMDEDUP_FINE_MOD == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("ev").alias("fv"),
        F.col("ne").alias("nf"),
    )
    f_score = dot("fv", "cv") / (F.col("nf") * F.col("nc"))
    fw = Window.partitionBy("cent_id").orderBy(F.desc("fs"), F.asc("cell_id"))
    freg = (
        fine.crossJoin(F.broadcast(coarse))
        .select("cent_id", "fv", "cell_id", f_score.alias("fs"))
        .withColumn("prn", F.row_number().over(fw))
        .filter(F.col("prn") <= N_PROBE)
        .select("cell_id", "cent_id", "fv")
    )
    # 3. cell-local argmin-d2 fine assignment (the _kmeans_assign metric)
    d2 = F.aggregate(
        F.zip_with(F.col("ev"), F.col("fv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    assigned = (
        vcell.join(freg, "cell_id")
        .select("vec_id", "ev", "cent_id", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(
            F.min_by(
                F.col("cent_id"), F.struct(F.col("d2"), F.col("cent_id"))
            ).alias("cluster_id"),
            F.any_value(F.col("ev")).alias("ev"),
        )
    )
    # 4. within-cluster prune — the embed_semdedup_prune tail
    a = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("keep_id"),
        F.col("ev").alias("ea"),
        norm("ev").alias("na"),
    ).hint("shuffle_hash")
    b = assigned.select(
        "cluster_id",
        F.col("vec_id").alias("prune_id"),
        F.col("ev").alias("eb"),
        norm("ev").alias("nb"),
    ).hint("shuffle_hash")
    cos = rnd(dot("ea", "eb") / (F.col("na") * F.col("nb")), 6)
    return (
        a.join(
            b,
            (a["cluster_id"] == b["cluster_id"])
            & (F.col("keep_id") < F.col("prune_id")),
        )
        .select(
            a["cluster_id"].alias("cluster_id"),
            "keep_id",
            "prune_id",
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= _SEMDEDUP_TAU)
    )


def _semdedup_lexical_oracle() -> str:
    from awsbeats_spark.operators.llm.dedup import (
        _SHINGLES_SQL,
        JACCARD_THRESHOLD,
    )

    inter = "len(list_intersect(sa.s, sb.s))"
    uni = "len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))"
    return f"""
    {_kmeans_oracle_ctes(capped=False)},
    sd_pairs AS (
        SELECT a.vec_id AS keep_id, b.vec_id AS prune_id,
               round({cosine_sql('a.ev', 'b.ev')}, 6) AS cosine
        FROM a{KMEANS_ITERS + 1} a
        JOIN a{KMEANS_ITERS + 1} b
          ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
        WHERE round({cosine_sql('a.ev', 'b.ev')}, 6) >= {_SEMDEDUP_TAU}
    ),
    shs AS (
        SELECT doc_id, list_distinct({_SHINGLES_SQL}) AS s
        FROM documents
    )
    SELECT p.keep_id, p.prune_id, p.cosine,
           CASE WHEN {uni} > 0
                THEN round({inter} * 1.0 / ({uni}), 6)
                ELSE 0.0 END AS jaccard,
           CASE WHEN {uni} > 0
                THEN round({inter} * 1.0 / ({uni}), 6)
                ELSE 0.0 END >= {JACCARD_THRESHOLD} AS lexical_dup
    FROM sd_pairs p
    JOIN shs sa ON p.keep_id = sa.doc_id
    JOIN shs sb ON p.prune_id = sb.doc_id
    """


@query("eval_semdedup_lexical_overlap", oracle=_semdedup_lexical_oracle())
def eval_semdedup_lexical_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured-honesty twin for [[embed_semdedup_prune]]: every
    semantic-dup pair annotated with its exact shingle JACCARD and a
    ``lexical_dup`` flag (jaccard >= the [[dedup_ngram_jaccard]]
    threshold) — quantifying the question that justifies running
    SemDeDup at all: how many semantic duplicates would the LEXICAL
    dedup stack have missed? Pairs with lexical_dup = false are the
    paraphrase class only the embedding layer catches; if (on a real
    corpus) ~all pairs were lexical too, the cheaper minhash pass
    already covers them and the cluster-pairwise stage is wasted
    compute. Documents join embeddings 1:1 on doc_id = vec_id.

    Scale shape: the pair set is [[embed_semdedup_prune]]'s output
    (bounded by true semantic dups); the shingle arrays join it on the
    pair ids — two hash joins at pair grain, never all-pairs."""
    from awsbeats_spark.operators.llm.dedup import (
        _doc_shingle_sets,
        JACCARD_THRESHOLD,
    )

    pairs = embed_semdedup_prune(spark, sf_dir)
    sets = _doc_shingle_sets(spark, sf_dir)
    sa = sets.select(
        F.col("doc_id").alias("keep_id"),
        F.col("shs").alias("sa"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("prune_id"),
        F.col("shs").alias("sb"),
        F.col("n").alias("nb"),
    )
    shared = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.col("na") + F.col("nb") - shared
    jac = F.when(union > 0, rnd(shared / union, 6)).otherwise(F.lit(0.0))
    return (
        pairs.join(sa, "keep_id")
        .join(sb, "prune_id")
        .select(
            "keep_id",
            "prune_id",
            "cosine",
            jac.alias("jaccard"),
            (jac >= JACCARD_THRESHOLD).alias("lexical_dup"),
        )
    )


PQ_M = 8  # subspaces (64 dims -> 8 sub-vectors of 8)
PQ_SUBDIM = 8
PQ_CODEBOOK_MOD = 16  # vec_id % 16 == 0 -> 32 sampled codebook entries/subspace


def _pq_d2_sql(a: str, b: str) -> str:
    """DuckDB twin of the sequential squared-L2 between two DOUBLE[]."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


_PQ_SUBS = f"""
    SELECT vec_id,
           t.s AS s,
           (embedding::DOUBLE[])[t.s * {PQ_SUBDIM} + 1 : t.s * {PQ_SUBDIM} + {PQ_SUBDIM}]
               AS sub
    FROM embeddings, unnest(generate_series(0, {PQ_M - 1})) AS t(s)
"""


@query(
    "sim_search_pq",
    oracle=f"""
    WITH subs AS ({_PQ_SUBS}),
    cents AS (
        SELECT vec_id AS cid, s, sub AS cv FROM subs
        WHERE vec_id % {PQ_CODEBOOK_MOD} = 0 AND vec_id < {SAMPLE_ID_CAP}
    ),
    codes AS (
        SELECT v.vec_id, v.s,
               min_by(c.cid, {_pq_d2_sql('v.sub', 'c.cv')} + c.cid * 1e-9) AS code
        FROM subs v JOIN cents c USING (s)
        GROUP BY v.vec_id, v.s
    ),
    adc AS (
        SELECT q.vec_id AS query_id,
               k.vec_id AS neighbor_id,
               list_sum(list({_pq_d2_sql('q.sub', 'c.cv')} ORDER BY k.s))
                   AS approx_d2
        FROM codes k
        JOIN cents c ON c.s = k.s AND c.cid = k.code
        JOIN subs q ON q.s = k.s AND q.vec_id < {N_QUERIES}
                    AND q.vec_id <> k.vec_id
        GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           round(approx_d2, 6) AS approx_d2,
           row_number() OVER (
               PARTITION BY query_id ORDER BY approx_d2, neighbor_id) AS rn
    FROM adc
    QUALIFY rn <= {TOP_K}
    """,
)
def sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: split each 64-dim vector into 8
    sub-vectors, quantize each against a 32-entry sampled codebook
    (vec_id % 16 == 0 — PQ with a sampled rather than k-means-trained
    codebook, keeping it deterministic), then score queries against the
    COMPRESSED corpus via asymmetric distance computation (ADC): the
    exact query sub-vector vs the centroid standing in for each corpus
    sub-vector.

    Scale: the corpus is represented by m small integer codes per vector
    (8 bytes here vs 256 for the raw floats) — the scan side of ADC
    reads only the code table + the broadcast codebook; the raw corpus
    is touched once at encode time. The per-pair ADC sum is accumulated
    in FIXED subspace order (collect-sorted fold, list(ORDER BY s) in
    the oracle) so ranking is bit-deterministic across engines.
    Recall vs exact L2 is measured in tests/test_llm_ops.py."""
    t = tables(spark, sf_dir)
    sqd2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    subs = (
        t.embeddings.select("vec_id", as_double(F.col("embedding")).alias("ev"))
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
            "ev",
        )
        .select(
            "vec_id",
            "s",
            F.slice("ev", F.col("s") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sub"),
        )
    )
    cents = subs.filter(
        (F.col("vec_id") % PQ_CODEBOOK_MOD == 0) & (F.col("vec_id") < SAMPLE_ID_CAP)
    ).select(
        F.col("vec_id").alias("cid"), "s", F.col("sub").alias("cv")
    )
    codes = (
        subs.join(F.broadcast(cents), "s")
        .select(
            "vec_id",
            "s",
            "sub",
            "cid",
            sqd2(F.col("sub"), F.col("cv")).alias("d2"),
        )
        .groupBy("vec_id", "s")
        .agg(
            # deterministic argmin: cid * 1e-9 sits far above double ulp at
            # d2 magnitude but below any real distance gap (same idiom as
            # agg_conditional_bools); identical expression on both engines
            F.min_by(
                F.col("cid"), F.col("d2") + F.col("cid") * F.lit(1e-9)
            ).alias("code")
        )
    )
    qsubs = subs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "s", F.col("sub").alias("qsub")
    )
    return (
        codes.join(
            F.broadcast(cents.select(F.col("cid").alias("code"), "s", "cv")),
            ["s", "code"],
        )
        .join(F.broadcast(qsubs), "s")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "s",
            sqd2(F.col("qsub"), F.col("cv")).alias("pd2"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "pd2"))),
                    lambda st: st["pd2"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("approx_d2_raw")
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("approx_d2_raw"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            rnd("approx_d2_raw", 6).alias("approx_d2"),
            "rn",
        )
    )


_PCA_D = 64
_PCA_ITERS = 8
_PCA_COV_ROUND = 6  # covariance/mean quantization (engine portability)
_PCA_V_ROUND = 8  # per-iteration loading quantization


def _pca_fold_sql(a: str, b: str) -> str:
    """DuckDB sequential dot of two DOUBLE lists (== F.aggregate fold)."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
    )


def _pca_iter1_sql(t: int) -> str:
    """Component-1 power-iteration step t: matvec against the quantized
    covariance rows (sequential fold per row), L2-normalize over the
    pos-ordered w list, round loadings to {v} decimals."""
    return f"""
    w1r_{t} AS MATERIALIZED (
        SELECT i, {_pca_fold_sql('crow', f'(SELECT v FROM v1_{t - 1})')} AS w
        FROM crows
    ),
    w1l_{t} AS MATERIALIZED (SELECT list(w ORDER BY i) AS wl FROM w1r_{t}),
    v1_{t} AS MATERIALIZED (
        SELECT list_transform(
            wl, x -> round(x / nm, {_PCA_V_ROUND})
        ) AS v
        FROM (
            SELECT wl, sqrt({_pca_fold_sql('wl', 'wl')}) AS nm
            FROM w1l_{t}
        )
    )"""


def _pca_iter2_sql(t: int) -> str:
    """Component-2 step t: matvec, deflate against the sign-fixed v1
    (w <- w - v1 * <v1, w>), normalize, round."""
    return f"""
    w2r_{t} AS MATERIALIZED (
        SELECT i, {_pca_fold_sql('crow', f'(SELECT v FROM v2_{t - 1})')} AS w
        FROM crows
    ),
    w2l_{t} AS MATERIALIZED (SELECT list(w ORDER BY i) AS wl FROM w2r_{t}),
    w2d_{t} AS MATERIALIZED (
        SELECT list_transform(
            list_zip(wl, u), p -> p[1] - p[2] * dp
        ) AS wl
        FROM (
            SELECT wl, u, {_pca_fold_sql('u', 'wl')} AS dp
            FROM (
                SELECT wl, (SELECT v FROM v1f) AS u FROM w2l_{t}
            )
        )
    ),
    v2_{t} AS MATERIALIZED (
        SELECT list_transform(
            wl, x -> round(x / nm, {_PCA_V_ROUND})
        ) AS v
        FROM (
            SELECT wl, sqrt({_pca_fold_sql('wl', 'wl')}) AS nm
            FROM w2d_{t}
        )
    )"""


def _pca_signfix_sql(src: str, out: str) -> str:
    """Make the first largest-|loading| coordinate positive."""
    return f"""
    {out} AS MATERIALIZED (
        SELECT CASE WHEN v[bi] < 0
                    THEN list_transform(v, x -> -x) ELSE v END AS v
        FROM (
            SELECT v,
                   (SELECT p FROM (
                        SELECT unnest(v) AS el,
                               generate_subscripts(v, 1) AS p)
                    ORDER BY abs(el) DESC, p LIMIT 1) AS bi
            FROM {src}
        )
    )"""


_PCA_PROJ_SQL = (
    "list_sum(list_transform(list_zip(e.x, (SELECT ml FROM ml),"
    " (SELECT v FROM {vf})), p -> (p[1] - p[2]) * p[3]))"
)


@query(
    "embed_pca_project",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding::DOUBLE[] AS x FROM embeddings
    ),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM e),
    pos AS (
        SELECT vec_id, generate_subscripts(x, 1) AS i, unnest(x) AS xi
        FROM e
    ),
    mean AS MATERIALIZED (
        SELECT i, round(sum(xi) / (SELECT n FROM tot), {_PCA_COV_ROUND}) AS m
        FROM pos GROUP BY i
    ),
    ml AS MATERIALIZED (SELECT list(m ORDER BY i) AS ml FROM mean),
    gram AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, sum(a.xi * b.xi) AS g
        FROM pos a JOIN pos b USING (vec_id)
        GROUP BY a.i, b.i
    ),
    cov AS MATERIALIZED (
        SELECT g.i, g.j,
               round(g.g / (SELECT n FROM tot) - ma.m * mb.m,
                     {_PCA_COV_ROUND}) AS c
        FROM gram g
        JOIN mean ma ON ma.i = g.i
        JOIN mean mb ON mb.i = g.j
    ),
    crows AS MATERIALIZED (SELECT i, list(c ORDER BY j) AS crow FROM cov GROUP BY i),
    v1_0 AS (SELECT list_transform(range({_PCA_D}), x -> 0.125) AS v),
    {",".join(_pca_iter1_sql(t) for t in range(1, _PCA_ITERS + 1))},
    {_pca_signfix_sql(f"v1_{_PCA_ITERS}", "v1f")},
    v2_0 AS (SELECT list_transform(range({_PCA_D}), x -> 0.125) AS v),
    {",".join(_pca_iter2_sql(t) for t in range(1, _PCA_ITERS + 1))},
    {_pca_signfix_sql(f"v2_{_PCA_ITERS}", "v2f")}
    SELECT e.vec_id,
           round({_PCA_PROJ_SQL.format(vf='v1f')}, 6) AS pc1,
           round({_PCA_PROJ_SQL.format(vf='v2f')}, 6) AS pc2
    FROM e
    """,
)
def embed_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-style projection of every embedding onto the top-2 directions
    of a FIXED-{t}-round power iteration (with deflation for the second
    component) over the quantized covariance — the dimensionality-
    reduction primitive for corpus visualization / coarse clustering.

    Hash-checked since round 7 (rows-only eigendecomposition before;
    VERDICT r6 item 4 — the [[embed_kmeans_cluster]] float-portability
    pattern applied to an iterative eigensolver): np.linalg.eigh has no
    SQL twin, but T rounds of power iteration ARE expressible in both
    engines, so the estimator is pinned to that trajectory. Float
    portability: (1) covariance and mean entries are quantized to
    {c} decimals (the only parallel, order-dependent sums in the whole
    computation — their ~1e-14 cross-engine wobble dies at the 1e-{c}
    quantum); (2) every matvec, deflation dot, and norm is a SEQUENTIAL
    fold (F.aggregate/zip_with == list_sum/list_transform/list_zip, the
    sim_search_pq parity), IEEE-identical given identical inputs; (3)
    per-iteration loadings round to {v} decimals. Start vector is the
    exact-representable uniform unit 1/8 = 0.125; sign convention makes
    the first largest-|loading| coordinate positive. On spectra with a
    dominant direction the T-round iterate converges to PC1/PC2 at rate
    (lambda2/lambda1)^T; on this near-isotropic synthetic corpus (gap
    ratio ~0.99 — measured) it is a deterministic variance-seeking
    projection whose Rayleigh quotient exceeds the average eigenvalue
    (asserted in tests/test_llm_ops.py, along with a pure-Python twin
    of the exact trajectory).

    100 TB shape: the N×d data never leaves the executors — each
    partition reduces to one (count, sum, d×d Gram) partial via an
    Arrow-batched mapInPandas; partials merge engine-side (posexplode →
    per-cell sum, O(partitions·d²) rows), the 64×64 quantized
    covariance is the ONLY thing collected (32 KB at any corpus size),
    each of the 2·T iteration steps is a local job over that 64-row
    matrix, and the projection pass is one JVM higher-order-function
    scan with the loadings as literal arrays. Two data scans total, no
    shuffle of the corpus.

    Cites reference parity: none (engine extra — the reference has no
    vector analytics)."""
    import pandas as pd

    t = tables(spark, sf_dir)
    emb = t.embeddings.select("vec_id", as_double(F.col("embedding")).alias("x"))
    d = _PCA_D

    def gram_partials(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["x"].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(x)],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    parts = emb.select("x").mapInPandas(
        gram_partials, schema="n long, s array<double>, g array<double>"
    )
    nrow = parts.agg(F.sum("n").alias("n"))
    mean = (
        parts.select(F.posexplode("s").alias("i", "sv"))
        .groupBy("i")
        .agg(F.sum("sv").alias("sv"))
        .crossJoin(F.broadcast(nrow))
        .select("i", rnd(F.col("sv") / F.col("n"), _PCA_COV_ROUND).alias("m"))
    )
    cov = (
        parts.select(F.posexplode("g").alias("ij", "gv"))
        .groupBy("ij")
        .agg(F.sum("gv").alias("gv"))
        .select(F.expr(f"ij DIV {d}").alias("i"), (F.col("ij") % d).alias("j"), "gv")
        .join(mean.select(F.col("i"), F.col("m").alias("mi")), "i")
        .join(mean.select(F.col("i").alias("j"), F.col("m").alias("mj")), "j")
        .crossJoin(F.broadcast(nrow))
        .select(
            "i",
            "j",
            rnd(
                F.col("gv") / F.col("n") - F.col("mi") * F.col("mj"),
                _PCA_COV_ROUND,
            ).alias("c"),
        )
    )
    crow_rows = (
        cov.groupBy("i")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "c"))),
                lambda s: s["c"],
            ).alias("crow")
        )
        .collect()
    )  # d rows × d rounded doubles — bounded 32 KB at any corpus size
    out_schema = "vec_id long, pc1 double, pc2 double"
    if not crow_rows:
        return spark.createDataFrame([], out_schema)
    covdf = spark.createDataFrame(
        [(int(r["i"]), list(r["crow"])) for r in crow_rows],
        "i int, crow array<double>",
    )
    mean_list = [r["m"] for r in mean.orderBy("i").collect()]

    def _arr(vals):
        return F.array(*[F.lit(float(x)) for x in vals])

    def _power(deflate):
        """T quantized power-iteration rounds; all float math JVM-side
        (rnd == the oracle's rewritten round), v crosses the driver as
        pure transport between the tiny 64-row local jobs."""
        v = [0.125] * d
        for _ in range(_PCA_ITERS):
            wl = covdf.select(
                "i", dot(F.col("crow"), _arr(v)).alias("w")
            ).agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda s: s["w"],
                ).alias("wl")
            )
            if deflate is not None:
                dlit = _arr(deflate)
                dp = dot(dlit, F.col("wl"))
                wl = wl.select(
                    F.zip_with(
                        F.col("wl"), dlit, lambda w, u: w - u * dp
                    ).alias("wl")
                )
            nm = F.sqrt(dot("wl", "wl"))
            v = list(
                wl.select(
                    F.transform(
                        F.col("wl"), lambda x: rnd(x / nm, _PCA_V_ROUND)
                    ).alias("v")
                ).collect()[0]["v"]
            )
        bi = max(range(d), key=lambda k: abs(v[k]))  # first max-|v|
        return [-x for x in v] if v[bi] < 0 else v

    v1 = _power(None)
    v2 = _power(v1)
    m_lit = _arr(mean_list)

    def _proj(vlit):
        diff = F.zip_with(F.col("x"), m_lit, lambda a, b: a - b)
        return F.aggregate(
            F.zip_with(diff, vlit, lambda p, c: p * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return emb.select(
        "vec_id",
        rnd(_proj(_arr(v1)), 6).alias("pc1"),
        rnd(_proj(_arr(v2)), 6).alias("pc2"),
    ).orderBy("vec_id")


embed_pca_project.__doc__ = (
    embed_pca_project.__doc__.replace("{t}", str(_PCA_ITERS))
    .replace("{c}", str(_PCA_COV_ROUND))
    .replace("{v}", str(_PCA_V_ROUND))
)


RANGE_TAU = 0.3


@query(
    "sim_search_range",
    oracle=f"""
    SELECT q.vec_id AS query_id,
           c.vec_id AS neighbor_id,
           round({cosine_sql('q.embedding', 'c.embedding')}, 6) AS cosine
    FROM embeddings q
    JOIN embeddings c ON c.vec_id >= {N_QUERIES}
    WHERE q.vec_id < {N_QUERIES}
      AND {cosine_sql('q.embedding', 'c.embedding')} >= {RANGE_TAU}
    """,
)
def sim_search_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search: every corpus vector within
    cosine >= tau of each query — the retrieval mode dedup pipelines
    use when "how many" isn't known up front (vs top-k's fixed cut).
    Same physical shape as sim_search_topk: broadcast query set over
    ONE corpus scan, no shuffle of the corpus, no window needed (the
    radius predicate is a filter, cheaper than ranking)."""
    t = tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), as_double(F.col("embedding")).alias("qv")
    ).select("query_id", "qv", norm("qv").alias("nq"))
    c = emb.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), as_double(F.col("embedding")).alias("cv")
    ).select("neighbor_id", "cv", norm("cv").alias("nc"))
    cos = dot("qv", "cv") / (F.col("nq") * F.col("nc"))
    return (
        F.broadcast(q)
        .crossJoin(c)
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
        .filter(F.col("cos_raw") >= RANGE_TAU)
        .select("query_id", "neighbor_id", rnd("cos_raw", 6).alias("cosine"))
    )


MRL_DIMS = (8, 16, 32, 64)


@query(
    "embed_matryoshka_energy",
    oracle=f"""
    SELECT vec_id, d AS dim,
           round(list_dot_product(embedding[1:d]::DOUBLE[], embedding[1:d]::DOUBLE[])
                 / list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6)
               AS energy_ratio
    FROM embeddings
    CROSS JOIN (SELECT unnest({list(MRL_DIMS)}) AS d)
    """,
)
def embed_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) truncation audit: the fraction of each vector's
    L2 energy retained by its first 8/16/32/64 dims — the number that
    decides how far an MRL-trained embedding can be truncated before
    retrieval quality drops. Pure projection: all four prefix energies
    come from ONE pass over the vector (posexplode of a 4-entry array),
    no shuffle, no join — at 100 TB this is a map-only scan."""
    emb = tables(spark, sf_dir).embeddings
    base = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("ev")
    ).select("vec_id", "ev", dot("ev", "ev").alias("full_e"))
    ratios = F.array(
        *[
            dot(F.slice("ev", 1, d), F.slice("ev", 1, d)) / F.col("full_e")
            for d in MRL_DIMS
        ]
    )
    return (
        base.select("vec_id", F.posexplode(ratios).alias("pos", "er"))
        .select(
            "vec_id",
            F.element_at(
                F.array(*[F.lit(d) for d in MRL_DIMS]), F.col("pos") + 1
            ).alias("dim"),
            rnd("er", 6).alias("energy_ratio"),
        )
    )


@query(
    "embed_outlier_topk",
    oracle="""
    WITH dims AS (
        SELECT vec_id, d, embedding[d]::DOUBLE AS x
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d)
    ),
    center AS (SELECT d, avg(x) AS mu FROM dims GROUP BY d),
    dist AS (
        SELECT vec_id, sqrt(sum((x - mu) * (x - mu))) AS dist
        FROM dims JOIN center USING (d) GROUP BY vec_id
    )
    SELECT vec_id, round(dist, 6) AS dist_to_center, rn
    FROM (SELECT vec_id, dist,
                 row_number() OVER (ORDER BY dist DESC, vec_id) AS rn
          FROM dist)
    WHERE rn <= 20
    """,
)
def embed_outlier_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QC: the 20 vectors farthest from the corpus centroid —
    the pre-training outlier sweep that catches corrupt/degenerate
    embeddings before they poison contrastive batches. The centroid is
    a 64-row aggregate broadcast back over one dims pass; the top-k is
    TakeOrdered (no global sort). At 100 TB the same two aggregates are
    map-side combined; nothing materializes beyond 64 rows + k."""
    emb = tables(spark, sf_dir).embeddings
    dims = emb.select(
        "vec_id",
        F.posexplode(as_double(F.col("embedding"))).alias("d0", "x"),
    ).select("vec_id", (F.col("d0") + 1).alias("d"), "x")
    center = dims.groupBy("d").agg(F.avg("x").alias("mu"))
    dist = (
        dims.join(F.broadcast(center), "d")
        .groupBy("vec_id")
        .agg(F.sqrt(F.sum((F.col("x") - F.col("mu")) * (F.col("x") - F.col("mu")))).alias("dist"))
    )
    # global top-k as TakeOrderedAndProject (per-partition heap + driver
    # merge of k rows), not a single-partition row_number window; the
    # rank is then numbered over the surviving 20 rows only
    top = dist.orderBy(F.desc("dist"), F.asc("vec_id")).limit(20)
    w = Window.orderBy(F.desc("dist"), F.asc("vec_id"))
    return top.withColumn("rn", F.row_number().over(w)).select(
        "vec_id", rnd("dist", 6).alias("dist_to_center"), "rn"
    )


# --------------------------------------------------------------------------
# Embedding distribution drift between two cohorts
# --------------------------------------------------------------------------


@query(
    "embed_drift_centroid",
    oracle="""
    WITH exploded AS (
        SELECT vec_id % 2 AS cohort, i.dim AS dim,
               embedding[i.dim + 1] AS v
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS dim) i
    ),
    means AS (
        SELECT cohort, dim, avg(v) AS mu, CAST(count(*) AS BIGINT) AS n
        FROM exploded GROUP BY 1, 2
    )
    SELECT a.dim,
           round(a.mu, 6) AS mean_ref,
           round(b.mu, 6) AS mean_cur,
           round(abs(a.mu - b.mu), 6) AS abs_shift,
           a.n AS n_ref, b.n AS n_cur
    FROM means a JOIN means b ON a.dim = b.dim
    WHERE a.cohort = 0 AND b.cohort = 1
    """,
)
def embed_drift_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: split the corpus into two cohorts
    (even/odd vec_id standing in for before/after a model or data
    change) and compare per-dimension centroid means — the cheapest
    early-warning signal that an embedding distribution moved. Scale
    shape: posexplode is a per-row flatMap (64 rows out per vector);
    the means are ONE mergeable (cohort, dim) aggregate — 128 groups
    regardless of corpus size — and the cohort self-join runs on that
    128-row table. At 100 TB this is a single pass with constant-size
    state; the alternative per-dim `aggregate()` over array columns
    avoids even the explode if shuffle volume ever mattered."""
    emb = tables(spark, sf_dir).embeddings
    exploded = emb.select(
        (F.col("vec_id") % 2).alias("cohort"),
        F.posexplode("embedding").alias("dim", "v"),
    )
    means = exploded.groupBy("cohort", "dim").agg(
        F.avg("v").alias("mu"), F.count(F.lit(1)).alias("n")
    )
    a = means.filter(F.col("cohort") == 0).select(
        "dim", F.col("mu").alias("mu_a"), F.col("n").alias("n_ref")
    )
    b = means.filter(F.col("cohort") == 1).select(
        "dim", F.col("mu").alias("mu_b"), F.col("n").alias("n_cur")
    )
    return a.join(b, "dim").select(
        "dim",
        rnd("mu_a", 6).alias("mean_ref"),
        rnd("mu_b", 6).alias("mean_cur"),
        rnd(F.abs(F.col("mu_a") - F.col("mu_b")), 6).alias("abs_shift"),
        "n_ref",
        "n_cur",
    )


# --------------------------------------------------------------------------
# ANN quality evaluation: recall@k of IVF vs the exact baseline
# --------------------------------------------------------------------------

_BF_ORACLE = QUERIES["sim_search_topk"].oracle
_IVF_ORACLE = QUERIES["sim_search_ivf"].oracle


@query(
    "eval_ann_recall_ivf",
    oracle=f"""
    WITH bf AS ({_BF_ORACLE}),
    ivf AS ({_IVF_ORACLE})
    SELECT bf.query_id,
           CAST(count(ivf.neighbor_id) AS BIGINT) AS n_hits,
           round(count(ivf.neighbor_id) * 1.0 / {TOP_K}, 4) AS recall_at_k
    FROM bf
    LEFT JOIN ivf ON bf.query_id = ivf.query_id
                 AND bf.neighbor_id = ivf.neighbor_id
    GROUP BY bf.query_id
    """,
)
def eval_ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index quality harness: recall@k of the IVF index against the
    exact brute-force baseline, per query — the number that decides
    whether nprobe/centroid-count are tuned right BEFORE an index ships.
    Composes the two registered operators (same DataFrames, same
    oracles) and reduces their overlap with one (query, neighbor)
    left join + per-query count. Scale shape: both inputs are top-k
    tables (|queries|·k rows), so the evaluation join is trivially
    broadcastable regardless of corpus size — evaluation cost is
    decoupled from the 100-TB scan that produced the candidates."""
    bf = QUERIES["sim_search_topk"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    ivf = (
        QUERIES["sim_search_ivf"].fn(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        bf.join(F.broadcast(ivf), ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.sum(F.coalesce("hit", F.lit(0))).cast("long").alias("n_hits"),
            rnd(
                F.sum(F.coalesce("hit", F.lit(0))) / float(TOP_K), 4
            ).alias("recall_at_k"),
        )
    )


# --------------------------------------------------------------------------
# Cluster purity: label mix inside each IVF cell
# --------------------------------------------------------------------------


@query(
    "embed_cluster_purity",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cent_id, embedding AS cv
        FROM embeddings
        WHERE vec_id % {CENTROID_MOD} = 0 AND vec_id < {CENTROID_ID_CAP}
    ),
    assign AS (
        SELECT e.vec_id, e.label, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {cosine_sql('e.embedding', 'c.cv')} DESC, c.cent_id
               ) AS arn
        FROM embeddings e CROSS JOIN centroids c
        QUALIFY arn = 1
    ),
    lab AS (
        SELECT cent_id, label, CAST(count(*) AS BIGINT) AS n
        FROM assign GROUP BY 1, 2
    ),
    cell AS (
        SELECT cent_id, sum(n) AS total,
               max(n) AS top_n,
               sum(n * n) AS sq
        FROM lab GROUP BY 1
    )
    SELECT cent_id,
           CAST(total AS BIGINT) AS n_members,
           CAST(top_n AS BIGINT) AS n_majority,
           round(top_n * 1.0 / total, 6) AS purity,
           round(1.0 - sq * 1.0 / (total * total), 6) AS simpson_diversity
    FROM cell
    """,
)
def embed_cluster_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality audit: per IVF cell, the majority-label share
    (purity) and Simpson diversity (1 - Σp²) of member labels — the
    quick check that an ANN partitioning respects semantic structure
    before it ships as a routing index. Reuses the registered IVF
    assignment shape (broadcast centroids, map-side argmax); the label
    mix is one (cell, label) aggregate and the purity algebra runs on
    |cells|·|labels| rows. At 100 TB only the single assignment scan
    touches the corpus."""
    t = tables(spark, sf_dir)
    emb = t.embeddings
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_MOD == 0)
        & (F.col("vec_id") < CENTROID_ID_CAP)
    ).select(
        F.col("vec_id").alias("cent_id"),
        as_double(F.col("embedding")).alias("cv"),
    ).select("cent_id", "cv", norm("cv").alias("nc"))
    vecs = emb.select(
        "vec_id", "label", as_double(F.col("embedding")).alias("ev")
    ).select("vec_id", "label", "ev", norm("ev").alias("ne"))
    score = dot("ev", "cv") / (F.col("ne") * F.col("nc"))
    assign = (
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "label", "cent_id", score.alias("c_ac"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("cent_id"), F.struct(F.col("c_ac"), -F.col("cent_id"))
            ).alias("cent_id"),
            F.any_value("label").alias("label"),
        )
    )
    lab = assign.groupBy("cent_id", "label").agg(
        F.count(F.lit(1)).alias("n")
    )
    cell = lab.groupBy("cent_id").agg(
        F.sum("n").alias("total"),
        F.max("n").alias("top_n"),
        F.sum(F.col("n") * F.col("n")).alias("sq"),
    )
    return cell.select(
        "cent_id",
        F.col("total").cast("long").alias("n_members"),
        F.col("top_n").cast("long").alias("n_majority"),
        rnd(F.col("top_n") / F.col("total"), 6).alias("purity"),
        rnd(
            1.0 - F.col("sq") / (F.col("total") * F.col("total")), 6
        ).alias("simpson_diversity"),
    )


# --------------------------------------------------------------------------
# Bit-packed Hamming ANN: sign binarization -> 2x32-bit words -> popcount
# --------------------------------------------------------------------------

_HAM_TOP_K = 10


@query(
    "sim_search_hamming_packed",
    oracle=f"""
    WITH bits AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS b
        FROM embeddings
    ),
    packed AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(generate_series(1, 32),
                    i -> b[i] * CAST(power(2, 32 - i) AS BIGINT))) AS BIGINT) AS w0,
               CAST(list_sum(list_transform(generate_series(33, 64),
                    i -> b[i] * CAST(power(2, 64 - i) AS BIGINT))) AS BIGINT) AS w1
        FROM bits
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) AS hamming,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY bit_count(xor(q.w0, c.w0))
                            + bit_count(xor(q.w1, c.w1)), c.vec_id
               ) AS rn
        FROM packed q JOIN packed c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, CAST(hamming AS BIGINT) AS hamming,
           CAST(rn AS BIGINT) AS rn
    FROM scored WHERE rn <= {_HAM_TOP_K}
    """,
)
def sim_search_hamming_packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantized ANN: each 64-dim float vector collapses to its
    64 sign bits packed into two 32-bit words (stored in BIGINTs), and
    neighbor ranking becomes XOR + popcount — the classic memory lever
    for web-scale search (256 bytes of floats -> 8 bytes, a 32x corpus
    shrink, and Hamming strongly correlates with cosine for mean-
    centered data). Scale shape: the pack is one map over the corpus
    (done ONCE and cacheable as a materialized index); the query side
    broadcasts like sim_search_topk, so the corpus never shuffles and
    the per-pair cost drops from 64 FMAs to 2 XOR+popcounts — the scan
    is bandwidth-bound at ~8 bytes/vector. Packing into two half-words
    rather than one 64-bit word keeps the arithmetic in non-negative
    range on BOTH engines (no sign-bit/overflow edge cases in the
    oracle's power()-based packing).

    Recall probe: eval_ann_recall_ivf measures IVF the same way; this
    operator is exact in HAMMING space (rank window, deterministic
    tiebreak), and the sign quantization is the approximation."""
    t = tables(spark, sf_dir)
    bits = F.transform(
        as_double(F.col("embedding")),
        lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    pack = lambda arr, start: F.aggregate(  # noqa: E731
        F.slice(arr, start, 32),
        F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b,
    )
    packed = t.embeddings.select(
        "vec_id",
        pack(bits, 1).alias("w0"),
        pack(bits, 33).alias("w1"),
    )
    q = packed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    c = packed.select(
        F.col("vec_id").alias("neighbor_id"), "w0", "w1"
    )
    ham = F.bit_count(F.expr("q0 ^ w0")) + F.bit_count(F.expr("q1 ^ w1"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", ham.cast("long").alias("hamming"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _HAM_TOP_K)
    )


# --------------------------------------------------------------------------
# Cascade ANN: coarse Hamming prefilter -> exact cosine rerank + recall
# --------------------------------------------------------------------------

_CASCADE_SHORTLIST = 50  # Hamming candidates kept per query before rerank


def _cascade_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    coarse = QUERIES["sim_search_hamming_packed"].oracle
    widened = coarse.replace(
        f"rn <= {_HAM_TOP_K}", f"rn <= {_CASCADE_SHORTLIST}"
    )
    if widened == coarse:  # oracle drifted away from the rn-cap pattern
        raise AssertionError(
            "hamming oracle no longer embeds 'rn <= _HAM_TOP_K'; "
            "cascade shortlist widening would silently no-op"
        )
    return f"""
    WITH coarse_all AS ({widened}),
    rerank AS (
        SELECT s.query_id, s.neighbor_id,
               round({cosine_sql('q.embedding', 'c.embedding')}, 6) AS cosine,
               row_number() OVER (
                   PARTITION BY s.query_id
                   ORDER BY {cosine_sql('q.embedding', 'c.embedding')} DESC,
                            s.neighbor_id
               ) AS rn
        FROM coarse_all s
        JOIN embeddings q ON q.vec_id = s.query_id
        JOIN embeddings c ON c.vec_id = s.neighbor_id
    ),
    cascade AS (SELECT * FROM rerank WHERE rn <= {TOP_K}),
    exact AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'c.embedding')} DESC,
                            c.vec_id
               ) AS rn
        FROM embeddings q
        JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        QUALIFY rn <= {TOP_K}
    ),
    hits AS (
        SELECT c.query_id,
               CAST(count(e.neighbor_id) AS BIGINT) AS n_hits
        FROM cascade c
        LEFT JOIN exact e USING (query_id, neighbor_id)
        GROUP BY c.query_id
    )
    SELECT c.query_id, c.neighbor_id, c.cosine,
           CAST(c.rn AS BIGINT) AS rn,
           round(h.n_hits / {TOP_K}.0, 6) AS recall_at_k
    FROM cascade c JOIN hits h USING (query_id)
    """


@query("sim_search_cascade_rerank", oracle=_cascade_oracle())
def sim_search_cascade_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage cascade ANN — the production retrieval shape: stage 1
    scans the corpus in 8-byte bit-packed Hamming space and keeps a
    50-candidate shortlist per query (bandwidth-bound,
    no float math); stage 2 re-scores ONLY the shortlist with exact
    cosine and keeps the top 10, and each row carries the
    measured recall@k of the cascade against exact brute-force cosine
    — the number that justifies the cascade's existence (IVF gets the
    same treatment in eval_ann_recall_ivf). At 100 TB the economics:
    the full-precision vectors are fetched for shortlist x queries
    rows only (a semi-join against the vector store), while the scan
    touches 32x less memory than float vectors; recall is tunable by
    shortlist size alone. Composes the registered Hamming operator —
    its oracle is embedded with the shortlist depth swapped in."""
    from awsbeats_spark.registry import QUERIES

    # stage 1: coarse Hamming shortlist, built directly (the registered
    # op caps at 10; the cascade needs 50): same pack
    # + broadcast join, deeper group limit.
    t = tables(spark, sf_dir)
    emb = t.embeddings
    bits = F.transform(
        as_double(F.col("embedding")),
        lambda x: F.when(x >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
    )
    pack = lambda arr, start: F.aggregate(  # noqa: E731
        F.slice(arr, start, 32),
        F.lit(0).cast("long"),
        lambda acc, b: acc * 2 + b,
    )
    packed = emb.select(
        "vec_id", pack(bits, 1).alias("w0"), pack(bits, 33).alias("w1")
    )
    q = packed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("q0"),
        F.col("w1").alias("q1"),
    )
    c = packed.select(F.col("vec_id").alias("neighbor_id"), "w0", "w1")
    ham = F.bit_count(F.expr("q0 ^ w0")) + F.bit_count(F.expr("q1 ^ w1"))
    wh = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    shortlist = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", ham.cast("long").alias("hamming"))
        .withColumn("srn", F.row_number().over(wh))
        .filter(F.col("srn") <= _CASCADE_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    # stage 2: exact cosine on shortlist rows only
    qv = emb.select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
    ).select("query_id", "qv", norm("qv").alias("nq"))
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("cv"),
    ).select("neighbor_id", "cv", norm("cv").alias("nc"))
    cos = dot("qv", "cv") / (F.col("nq") * F.col("nc"))
    wr = Window.partitionBy("query_id").orderBy(
        F.desc("cos_raw"), F.asc("neighbor_id")
    )
    cascade = (
        shortlist.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= TOP_K)
    )
    exact = QUERIES["sim_search_topk"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        cascade.join(
            exact.withColumn("hit", F.lit(1)), ["query_id", "neighbor_id"], "left"
        )
        .groupBy("query_id")
        .agg(F.count("hit").alias("n_hits"))
    )
    return (
        cascade.join(hits, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            rnd("cos_raw", 6).alias("cosine"),
            F.col("rn").cast("long").alias("rn"),
            rnd(F.col("n_hits") / float(TOP_K), 6).alias("recall_at_k"),
        )
    )


# --------------------------------------------------------------------------
# Embedding-space QA: per-dimension variance ranking (dead/dominant dims)
# --------------------------------------------------------------------------

_DIMVAR_TOP_K = 8


@query(
    "embed_dim_variance_topk",
    oracle=f"""
    WITH per_dim AS (
        SELECT d AS dim,
               avg(embedding[d]::DOUBLE) AS mean_val,
               var_pop(embedding[d]::DOUBLE) AS var_val
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS d)
        GROUP BY d
    ),
    ranked AS (
        SELECT dim, mean_val, var_val,
               row_number() OVER (ORDER BY var_val DESC, dim) AS rk
        FROM per_dim
    )
    SELECT CAST(dim AS INT) AS dim, CAST(rk AS INT) AS var_rank,
           round(mean_val, 6) AS mean_val, round(var_val, 6) AS var_val
    FROM ranked WHERE rk <= {_DIMVAR_TOP_K}
    """,
)
def embed_dim_variance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space QA: per-dimension mean and population variance,
    keeping the top-k highest-variance dimensions. The two failure
    modes this catches before an index build: dead dimensions (variance
    ~0 — a truncated projection or a stuck encoder head) and dominant
    dimensions (one coordinate carrying most of the energy, which
    wrecks cosine separability and IVF cell balance).

    Scale shape: posexplode fans each vector into (dim, value) rows —
    64x the row count but tiny rows — then ONE hash aggregation with
    map-side partial moment sums; the rank runs over exactly 64
    aggregate rows. No vector leaves its partition before being reduced
    to per-dim partials. At 100 TB this is the cheapest full-corpus
    statistic there is; the same plan serves any per-dim moment."""
    e = tables(spark, sf_dir).embeddings
    per_dim = (
        e.select(F.posexplode("embedding").alias("pos", "val"))
        .select((F.col("pos") + 1).alias("dim"), F.col("val").cast("double"))
        .groupBy("dim")
        .agg(
            F.avg("val").alias("mean_val"),
            F.var_pop("val").alias("var_val"),
        )
    )
    rk = F.row_number().over(Window.orderBy(F.desc("var_val"), F.asc("dim")))
    return (
        per_dim.select("dim", "mean_val", "var_val", rk.alias("var_rank"))
        .filter(F.col("var_rank") <= _DIMVAR_TOP_K)
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.col("var_rank").cast("int").alias("var_rank"),
            rnd("mean_val", 6).alias("mean_val"),
            rnd("var_val", 6).alias("var_val"),
        )
    )


# --------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection with content-addressed Gaussians
# --------------------------------------------------------------------------

_JL_DIM = 64  # source dimensionality (embeddings table contract)
_JL_K = 4  # target dimensionality of the demo projection


def _jl_proj_sql(j: int) -> str:
    """Unrounded projected coordinate j (rounding happens once, in the
    outer SELECT, off the same double both engines computed)."""
    return (
        f"list_sum(list_transform(generate_series(1, {_JL_DIM}), i -> "
        f"embedding[i]::DOUBLE * {jl_gauss_sql(j, 'i')}))"
    )


def _jl_proj_col(j: int):
    """Spark twin of _jl_proj_sql: unrounded projected coordinate j of
    the ``embedding`` column (strictly sequential accumulation, so the
    double agrees with DuckDB's list_sum to the last bit)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(_JL_DIM)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(F.col("embedding"), i).cast("double")
        * jl_gauss(i, j),
    )


@query(
    "embed_random_projection_jl",
    oracle=f"""
    WITH p AS (
        SELECT vec_id,
               {_jl_proj_sql(1)} AS p1r,
               {_jl_proj_sql(2)} AS p2r,
               {_jl_proj_sql(3)} AS p3r,
               {_jl_proj_sql(4)} AS p4r,
               list_sum(list_transform(embedding,
                   x -> x::DOUBLE * x::DOUBLE)) AS e2
        FROM embeddings
        WHERE len(embedding) = {_JL_DIM}
    )
    SELECT vec_id,
           round(p1r, 4) AS p1, round(p2r, 4) AS p2,
           round(p3r, 4) AS p3, round(p4r, 4) AS p4,
           round((p1r * p1r + p2r * p2r + p3r * p3r + p4r * p4r)
                 / {_JL_K}.0 / e2, 4) AS norm_ratio
    FROM p
    """,
)
def embed_random_projection_jl(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Johnson-Lindenstrauss random projection of the 64-dim embedding
    column down to k=4 using a Gaussian matrix that is never stored:
    weight g(i, j) is Box-Muller over two md5-derived uniforms keyed by
    the (source, target) index pair, so every executor regenerates the
    identical matrix locally and the projection is deterministic enough
    to hash-check cross-engine — the same content-addressed-randomness
    trick that made the KMV sketch estimates oracle-checkable. Emits
    the projected coordinates plus the per-row JL norm estimator
    (||p||^2 / k) / ||e||^2, whose concentration around 1.0 is the
    lemma's whole point — the honesty column showing how faithful this
    k is (k=4 is the demo setting; production sketches use k=64..128
    where the ratio tightens as exp(-k*eps^2/4)).

    Scale shape: pure map-side whole-stage-codegen expression work
    (aggregate over a sequence of md5 + trig calls, no UDF, no
    shuffle, no stored matrix to broadcast) — O(d*k) per row. At
    100 TB this is the standard pre-LSH dimensionality cut: downstream
    bucket joins (sim_search_lsh_bucketed) run on 16x narrower
    vectors while pairwise distances survive within 1+/-eps."""
    proj = _jl_proj_col
    emb = tables(spark, sf_dir).embeddings.filter(
        F.size("embedding") == _JL_DIM
    )
    e_norm2 = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    ps = [proj(j) for j in (1, 2, 3, 4)]
    p_norm2 = ps[0] * ps[0] + ps[1] * ps[1] + ps[2] * ps[2] + ps[3] * ps[3]
    return emb.select(
        "vec_id",
        rnd(ps[0], 4).alias("p1"),
        rnd(ps[1], 4).alias("p2"),
        rnd(ps[2], 4).alias("p3"),
        rnd(ps[3], 4).alias("p4"),
        rnd((p_norm2 / float(_JL_K)) / e_norm2, 4).alias("norm_ratio"),
    )


# --------------------------------------------------------------------------
# JL honesty twin: measured pairwise-distance distortion of the projection
# --------------------------------------------------------------------------


@query(
    "eval_jl_distance_distortion",
    oracle=f"""
    WITH p AS (
        SELECT vec_id,
               {_jl_proj_sql(1)} AS p1r,
               {_jl_proj_sql(2)} AS p2r,
               {_jl_proj_sql(3)} AS p3r,
               {_jl_proj_sql(4)} AS p4r,
               embedding
        FROM embeddings
        WHERE len(embedding) = {_JL_DIM}
    ),
    pairs AS (
        SELECT a.p1r - b.p1r AS d1, a.p2r - b.p2r AS d2,
               a.p3r - b.p3r AS d3, a.p4r - b.p4r AS d4,
               list_sum(list_transform(
                   generate_series(1, {_JL_DIM}),
                   i -> pow(a.embedding[i]::DOUBLE
                            - b.embedding[i]::DOUBLE, 2))) AS ed2
        FROM p a JOIN p b ON b.vec_id = a.vec_id + 1
    ),
    r AS (
        SELECT (d1 * d1 + d2 * d2 + d3 * d3 + d4 * d4) / {_JL_K}.0 / ed2
                   AS ratio
        FROM pairs WHERE ed2 > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(ratio), 4) AS mean_ratio,
           round(min(ratio), 4) AS min_ratio,
           round(max(ratio), 4) AS max_ratio,
           round(avg(CASE WHEN ratio BETWEEN 0.5 AND 2.0
                          THEN 1.0 ELSE 0.0 END), 4) AS frac_within_2x
    FROM r
    """,
)
def eval_jl_distance_distortion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Measured-quality twin of embed_random_projection_jl (the
    eval_*-alongside-every-approximation discipline): pairs adjacent
    vec_ids (id, id+1 — content-independent, so effectively random
    pairs) and measures the squared-distance distortion ratio
    (||pa - pb||^2 / k) / ||ea - eb||^2 that the JL lemma promises
    concentrates near 1. Emits the pair count, the mean/min/max ratio,
    and the fraction of pairs within [0.5, 2.0] — at k=4 that fraction
    is the honest (and deliberately unflattering) picture of what a
    4-dim sketch buys; rerunning at production k shows it converging
    to 1.0. The projection is recomputed from the same shared
    content-addressed Gaussian helpers the operator uses, so this eval
    cannot drift from what it evaluates.

    Scale shape: the projection is map-side; the pairing is ONE
    equi-join on a numeric key (id+1), so the eval is linear in rows
    with a single co-partitioned shuffle; the summary is a scalar
    fold. At 100 TB you'd sample the id space first — the join shape
    is unchanged."""
    proj = _jl_proj_col
    emb = tables(spark, sf_dir).embeddings.filter(
        F.size("embedding") == _JL_DIM
    )
    p = emb.select(
        "vec_id",
        proj(1).alias("p1r"),
        proj(2).alias("p2r"),
        proj(3).alias("p3r"),
        proj(4).alias("p4r"),
        "embedding",
    )
    a = p.alias("a")
    b = p.select(
        (F.col("vec_id") - 1).alias("join_id"),
        F.col("p1r").alias("q1"),
        F.col("p2r").alias("q2"),
        F.col("p3r").alias("q3"),
        F.col("p4r").alias("q4"),
        F.col("embedding").alias("emb_b"),
    ).alias("b")
    ed2 = F.aggregate(
        F.zip_with(
            F.col("a.embedding").cast("array<double>"),
            F.col("emb_b").cast("array<double>"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(b, F.col("a.vec_id") == F.col("join_id")).select(
        (F.col("p1r") - F.col("q1")).alias("d1"),
        (F.col("p2r") - F.col("q2")).alias("d2"),
        (F.col("p3r") - F.col("q3")).alias("d3"),
        (F.col("p4r") - F.col("q4")).alias("d4"),
        ed2.alias("ed2"),
    )
    ratio = (
        F.col("d1") * F.col("d1")
        + F.col("d2") * F.col("d2")
        + F.col("d3") * F.col("d3")
        + F.col("d4") * F.col("d4")
    ) / float(_JL_K) / F.col("ed2")
    r = pairs.filter(F.col("ed2") > 0).select(ratio.alias("ratio"))
    return r.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        rnd(F.avg("ratio"), 4).alias("mean_ratio"),
        rnd(F.min("ratio"), 4).alias("min_ratio"),
        rnd(F.max("ratio"), 4).alias("max_ratio"),
        rnd(
            F.avg(
                F.when(
                    (F.col("ratio") >= 0.5) & (F.col("ratio") <= 2.0), 1.0
                ).otherwise(0.0)
            ),
            4,
        ).alias("frac_within_2x"),
    )


# --------------------------------------------------------------------------
# SQ8 honesty twin: measured cosine preservation of the quantizer
# --------------------------------------------------------------------------


@query(
    "eval_sq8_cosine_preservation",
    oracle=f"""
    WITH {_SQ8_CODED_SQL},
    recon AS (
        SELECT vec_id, dim, x,
               mn + (code / 255.0) * (mx - mn) AS r
        FROM coded
    ),
    per_vec AS (
        SELECT vec_id,
               round(sum(x * r) / (sqrt(sum(x * x)) * sqrt(sum(r * r))),
                     6) AS cos_sim,
               round(max(abs(x - r)), 6) AS max_abs_err
        FROM recon
        GROUP BY vec_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(cos_sim), 6) AS mean_cosine,
           min(cos_sim) AS min_cosine,
           round(avg(max_abs_err), 6) AS mean_max_abs_err,
           max(max_abs_err) AS worst_abs_err
    FROM per_vec
    """,
)
def eval_sq8_cosine_preservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured quality of the SQ8 scalar quantizer: reconstruct every
    vector from its codes and report corpus-level cosine preservation
    (mean and worst per-vector cosine between original and
    reconstruction) plus reconstruction-error summary. The honesty twin
    of [[embed_quantize_sq8]] — if 8-bit codes cannot hold cosine above
    ~0.99 on this corpus, the ANN index built on them inherits that
    ceiling, and this eval says so with a number instead of a docstring
    claim (the eval-twin discipline every approximate key follows).

    Oracle composition: the dims/coded CTEs are embed_quantize_sq8's
    registered SQL verbatim. Scale shape: identical to the quantizer —
    one 64-row stats broadcast, one narrow per-vector pass; per-vector
    cosines round before the corpus fold so both engines average
    identical values."""
    t = tables(spark, sf_dir)
    stats = (
        t.embeddings.select(
            F.posexplode(as_double(F.col("embedding"))).alias("dim0", "x")
        )
        .groupBy("dim0")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim0", "mn"))),
                lambda s: s.mn,
            ).alias("mns"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim0", "mx"))),
                lambda s: s.mx,
            ).alias("mxs"),
        )
    )

    def _mn(i):
        return F.element_at(F.col("mns"), i + 1)

    def _mx(i):
        return F.element_at(F.col("mxs"), i + 1)

    def _code(x, i):
        return F.when(
            _mx(i) > _mn(i),
            F.floor((x - _mn(i)) / (_mx(i) - _mn(i)) * 255 + 0.5).cast("int"),
        ).otherwise(F.lit(0))

    xd = as_double(F.col("embedding"))
    recon = F.transform(
        xd, lambda x, i: _mn(i) + (_code(x, i) / F.lit(255.0)) * (_mx(i) - _mn(i))
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    per_vec = t.embeddings.crossJoin(F.broadcast(stats)).select(
        "vec_id",
        rnd(
            _dot(xd, recon)
            / (F.sqrt(_dot(xd, xd)) * F.sqrt(_dot(recon, recon))),
            6,
        ).alias("cos_sim"),
        rnd(
            F.array_max(
                F.zip_with(xd, recon, lambda x, r: F.abs(x - r))
            ),
            6,
        ).alias("max_abs_err"),
    )
    return per_vec.agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        rnd(F.avg("cos_sim"), 6).alias("mean_cosine"),
        F.min("cos_sim").alias("min_cosine"),
        rnd(F.avg("max_abs_err"), 6).alias("mean_max_abs_err"),
        F.max("max_abs_err").alias("worst_abs_err"),
    )


# --------------------------------------------------------------------------
# Label-centroid cosine matrix: class separability audit
# --------------------------------------------------------------------------


@query(
    "embed_label_centroid_cosine",
    oracle=f"""
    WITH exploded AS (
        SELECT label, i.dim AS dim,
               CAST(embedding[i.dim] AS DOUBLE) AS v
        FROM embeddings
        CROSS JOIN (SELECT unnest(generate_series(1, {N_DIMS})) AS dim) i
    ),
    cent AS (
        SELECT label, dim, avg(v) AS mu,
               CAST(count(*) AS BIGINT) AS n_vecs
        FROM exploded GROUP BY 1, 2
    ),
    pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               max(a.n_vecs) AS n_a, max(b.n_vecs) AS n_b,
               sum(a.mu * b.mu) AS dot,
               sqrt(sum(a.mu * a.mu)) AS na,
               sqrt(sum(b.mu * b.mu)) AS nb
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        GROUP BY a.label, b.label
    )
    SELECT label_a, label_b, CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           round(dot / (na * nb), 6) AS centroid_cosine
    FROM pairs
    """,
)
def embed_label_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separability audit: cosine similarity between every pair
    of label centroids. Labels whose centroids sit at cosine ~1 are
    indistinguishable at the class level — a supervised head trained on
    these embeddings cannot separate what the geometry has already
    merged, and a kNN classifier ([[embed_knn_classify]]) will confuse
    exactly these pairs. The canonical a<b pair ordering emits each
    pair once.

    Scale shape: the corpus collapses to |labels| x 64 centroid cells
    in one mergeable aggregate (constant-size state at any corpus
    size); the pair matrix is a self-join on the dim key over that tiny
    frame — |labels|^2 x 64 rows, never the vectors themselves."""
    emb = tables(spark, sf_dir).embeddings
    exploded = emb.select(
        "label", F.posexplode(as_double(F.col("embedding"))).alias("dim", "v")
    )
    cent = exploded.groupBy("label", "dim").agg(
        F.avg("v").alias("mu"), F.count(F.lit(1)).alias("n_vecs")
    )
    a = cent.select(
        F.col("label").alias("label_a"),
        "dim",
        F.col("mu").alias("mu_a"),
        F.col("n_vecs").alias("na_raw"),
    )
    b = cent.select(
        F.col("label").alias("label_b"),
        "dim",
        F.col("mu").alias("mu_b"),
        F.col("n_vecs").alias("nb_raw"),
    )
    pairs = (
        a.join(b, ["dim"])
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.max("na_raw").cast("long").alias("n_a"),
            F.max("nb_raw").cast("long").alias("n_b"),
            F.sum(F.col("mu_a") * F.col("mu_b")).alias("dot"),
            F.sqrt(F.sum(F.col("mu_a") * F.col("mu_a"))).alias("na"),
            F.sqrt(F.sum(F.col("mu_b") * F.col("mu_b"))).alias("nb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        "n_a",
        "n_b",
        rnd(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias(
            "centroid_cosine"
        ),
    )


# --------------------------------------------------------------------------
# IVF-PQ: coarse cell pruning + product-quantized ADC, measured recall
# --------------------------------------------------------------------------


@query(
    "sim_search_ivfpq",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cent_id, embedding AS cv
        FROM embeddings
        WHERE vec_id % {CENTROID_MOD} = 0 AND vec_id < {CENTROID_ID_CAP}
    ),
    assign AS (
        SELECT e.vec_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {cosine_sql('e.embedding', 'c.cv')} DESC, c.cent_id
               ) AS arn
        FROM embeddings e CROSS JOIN centroids c
        QUALIFY arn = 1
    ),
    probes AS (
        SELECT q.vec_id AS query_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'c.cv')} DESC, c.cent_id
               ) AS prn
        FROM embeddings q CROSS JOIN centroids c
        WHERE q.vec_id < {N_QUERIES}
        QUALIFY prn <= {N_PROBE}
    ),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id
        FROM probes p
        JOIN assign a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
    ),
    subs AS ({_PQ_SUBS}),
    pqcents AS (
        SELECT vec_id AS cid, s, sub AS pcv FROM subs
        WHERE vec_id % {PQ_CODEBOOK_MOD} = 0 AND vec_id < {SAMPLE_ID_CAP}
    ),
    codes AS (
        SELECT v.vec_id, v.s,
               min_by(c.cid, {_pq_d2_sql('v.sub', 'c.pcv')} + c.cid * 1e-9)
                   AS code
        FROM subs v JOIN pqcents c USING (s)
        GROUP BY v.vec_id, v.s
    ),
    adc AS (
        SELECT cd.query_id, cd.neighbor_id,
               list_sum(list({_pq_d2_sql('q.sub', 'c.pcv')} ORDER BY k.s))
                   AS approx_d2
        FROM cand cd
        JOIN codes k ON k.vec_id = cd.neighbor_id
        JOIN pqcents c ON c.s = k.s AND c.cid = k.code
        JOIN subs q ON q.s = k.s AND q.vec_id = cd.query_id
        GROUP BY 1, 2
    ),
    top AS (
        SELECT query_id, neighbor_id,
               round(approx_d2, 6) AS approx_d2,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY approx_d2, neighbor_id
               ) AS rn
        FROM adc
        QUALIFY rn <= {TOP_K}
    ),
    exact AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'c.embedding')} DESC,
                            c.vec_id
               ) AS ern
        FROM embeddings q
        JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        QUALIFY ern <= {TOP_K}
    ),
    hits AS (
        SELECT t.query_id,
               CAST(count(e.neighbor_id) AS BIGINT) AS n_hits
        FROM top t
        LEFT JOIN exact e USING (query_id, neighbor_id)
        GROUP BY t.query_id
    )
    SELECT t.query_id, t.neighbor_id, t.approx_d2,
           CAST(t.rn AS BIGINT) AS rn,
           round(h.n_hits / {TOP_K}.0, 6) AS recall_at_k
    FROM top t JOIN hits h USING (query_id)
    """,
)
def sim_search_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the production-scale ANN index shape (Jegou et al.
    2011, the FAISS default): coarse IVF cells prune WHICH vectors a
    query touches ([[sim_search_ivf]]'s nprobe-of-ncells scan), and
    product quantization compresses HOW each touched vector is scored
    ([[sim_search_pq]]'s 8-byte codes + asymmetric distance). The two
    approximations compose multiplicatively on cost — scan fraction
    nprobe/ncells TIMES 32x code compression — which is why this is
    the layout a 100 TB vector store actually ships. Every output row
    carries the measured recall@{TOP_K} of the composed index against
    exact brute-force cosine (the [[sim_search_cascade_rerank]]
    honesty discipline: the approximation's quality is a column, not a
    docstring claim). Codebooks stay deterministic (sampled coarse
    centroids, sampled PQ codebook) so the index is content-addressed
    and the oracle reproduces it bit-for-bit.

    Scale shape: cell assignment and PQ encoding are one broadcast
    map + one keyed argmin over the corpus (build-side, embarrassingly
    parallel); the query side touches only probed cells' code rows —
    the raw vectors are NEVER read at query time (the ADC join reads
    the broadcast codebook instead). At 100 TB: partition corpus files
    by cent_id so the probe join prunes at the file level, exactly as
    [[sim_search_ivf]] documents; the code table is 32x smaller than
    the vectors, so even a full-corpus fallback scan stays
    bandwidth-feasible."""
    t = tables(spark, sf_dir)
    emb = t.embeddings
    sqd2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # --- coarse IVF: cells, assignment, probes (sim_search_ivf shape)
    cents = (
        emb.filter(
            (F.col("vec_id") % CENTROID_MOD == 0)
            & (F.col("vec_id") < CENTROID_ID_CAP)
        )
        .select(
            F.col("vec_id").alias("cent_id"),
            as_double(F.col("embedding")).alias("cv"),
        )
        .select("cent_id", "cv", norm("cv").alias("nc"))
    )
    vecs = emb.select(
        "vec_id", as_double(F.col("embedding")).alias("ev")
    ).select("vec_id", "ev", norm("ev").alias("ne"))
    score = dot("ev", "cv") / (F.col("ne") * F.col("nc"))
    assign = (
        vecs.crossJoin(F.broadcast(cents))
        .select("vec_id", "cent_id", score.alias("c_ac"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                F.col("cent_id"), F.struct(F.col("c_ac"), -F.col("cent_id"))
            ).alias("cent_id")
        )
    )
    queries = vecs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("ev").alias("qv"),
        F.col("ne").alias("nq"),
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.desc("c_qc"), F.asc("cent_id")
    )
    q_score = dot("qv", "cv") / (F.col("nq") * F.col("nc"))
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select("query_id", "cent_id", q_score.alias("c_qc"))
        .withColumn("prn", F.row_number().over(pw))
        .filter(F.col("prn") <= N_PROBE)
        .select("query_id", "cent_id")
    )
    cand = (
        F.broadcast(probes)
        .join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    # --- PQ codes + ADC (sim_search_pq shape), restricted to candidates
    subs = (
        emb.select("vec_id", as_double(F.col("embedding")).alias("ev"))
        .select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("s"),
            "ev",
        )
        .select(
            "vec_id",
            "s",
            F.slice("ev", F.col("s") * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sub"),
        )
    )
    pqcents = subs.filter(
        (F.col("vec_id") % PQ_CODEBOOK_MOD == 0)
        & (F.col("vec_id") < SAMPLE_ID_CAP)
    ).select(F.col("vec_id").alias("cid"), "s", F.col("sub").alias("pcv"))
    codes = (
        subs.join(F.broadcast(pqcents), "s")
        .select(
            "vec_id", "s", sqd2(F.col("sub"), F.col("pcv")).alias("d2"),
            "cid",
        )
        .groupBy("vec_id", "s")
        .agg(
            F.min_by(
                F.col("cid"), F.col("d2") + F.col("cid") * F.lit(1e-9)
            ).alias("code")
        )
    )
    qsubs = subs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "s", F.col("sub").alias("qsub")
    )
    adc = (
        cand.join(codes, F.col("vec_id") == F.col("neighbor_id"))
        .join(
            F.broadcast(pqcents.select(F.col("cid").alias("code"), "s", "pcv")),
            ["s", "code"],
        )
        .join(F.broadcast(qsubs), ["query_id", "s"])
        .select(
            "query_id",
            "neighbor_id",
            "s",
            sqd2(F.col("qsub"), F.col("pcv")).alias("pd2"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("s", "pd2"))),
                    lambda st: st["pd2"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("approx_d2_raw")
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.asc("approx_d2_raw"), F.asc("neighbor_id")
    )
    top = (
        adc.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= TOP_K)
    )
    from awsbeats_spark.registry import QUERIES

    exact = QUERIES["sim_search_topk"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hits = (
        top.join(
            exact.withColumn("hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(F.count("hit").alias("n_hits"))
    )
    return top.join(hits, "query_id").select(
        "query_id",
        "neighbor_id",
        rnd("approx_d2_raw", 6).alias("approx_d2"),
        F.col("rn").cast("long").alias("rn"),
        rnd(F.col("n_hits") / float(TOP_K), 6).alias("recall_at_k"),
    )


# --------------------------------------------------------------------------
# PQ quality eval: ADC ranking vs exact L2 ranking
# --------------------------------------------------------------------------


def _pq_quality_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    pq = QUERIES["sim_search_pq"].oracle
    return f"""
    WITH pq_top AS ({pq}),
    exact AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_pq_d2_sql('q.embedding::DOUBLE[]',
                                        'c.embedding::DOUBLE[]')},
                            c.vec_id
               ) AS ern
        FROM embeddings q
        JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
        QUALIFY ern <= {TOP_K}
    ),
    joined AS (
        SELECT p.query_id,
               count(e.neighbor_id) AS n_hits,
               coalesce(
                   round(avg(abs(p.rn - e.ern)), 4), 0.0
               ) AS mean_rank_shift
        FROM pq_top p
        LEFT JOIN exact e
               ON e.query_id = p.query_id
              AND e.neighbor_id = p.neighbor_id
        GROUP BY p.query_id
    )
    SELECT query_id,
           CAST(n_hits AS BIGINT) AS n_hits,
           round(n_hits / {TOP_K}.0, 6) AS recall_at_k,
           mean_rank_shift
    FROM joined
    """


@query(
    "eval_pq_rank_quality",
    oracle=_pq_quality_oracle(),
    tags=("similarity", "eval"),
)
def eval_pq_rank_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured ranking quality of [[sim_search_pq]] — the quality twin
    the product quantizer was missing (every other approximate index
    here already carries one: IVF via [[eval_ann_recall_ivf]], the
    Hamming cascade and IVF-PQ inline, ahash banding via
    [[eval_ahash_band_recall]]): the ADC top-{k} per query is compared
    against the exact squared-L2 top-{k} on the raw vectors, reporting
    recall@{k} and the mean rank displacement of the hits (a code that
    finds the right neighbors in the wrong order shows displacement;
    one that misses them shows recall). The PQ side embeds the
    registered op's own oracle — zero spec drift.

    Scale shape: the eval's exact side is the {n_q}-query brute-force
    scan (constant queries x corpus, linear); the PQ side reuses the
    compressed-code join under test. Verdict columns per query, not
    docstring claims."""
    from awsbeats_spark.registry import QUERIES

    t = tables(spark, sf_dir)
    pq_top = QUERIES["sim_search_pq"].fn(spark, sf_dir).select(
        "query_id", "neighbor_id", "rn"
    )
    emb = t.embeddings
    sqd2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("cv"),
    )
    we = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    exact = (
        F.broadcast(qv)
        .join(cv, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            sqd2(F.col("qv"), F.col("cv")).alias("d2"),
        )
        .withColumn("ern", F.row_number().over(we))
        .filter(F.col("ern") <= TOP_K)
        .select("query_id", "neighbor_id", "ern")
    )
    joined = (
        pq_top.join(exact, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("ern").cast("long").alias("n_hits"),
            F.coalesce(
                rnd(F.avg(F.abs(F.col("rn") - F.col("ern"))), 4),
                F.lit(0.0),
            ).alias("mean_rank_shift"),
        )
    )
    return joined.select(
        "query_id",
        "n_hits",
        rnd(F.col("n_hits") / float(TOP_K), 6).alias("recall_at_k"),
        "mean_rank_shift",
    )


eval_pq_rank_quality.__doc__ = (
    eval_pq_rank_quality.__doc__
    .replace("{k}", str(TOP_K))
    .replace("{n_q}", str(N_QUERIES))
)


# --------------------------------------------------------------------------
# Embedding isotropy audit (moment identities, one pass)
# --------------------------------------------------------------------------


@query(
    "embed_isotropy_audit",
    oracle="""
    WITH v AS (SELECT embedding::DOUBLE[] AS ev FROM embeddings),
    dims AS (
        SELECT unnest(ev) AS x, unnest(range(1, 1 + len(ev))) AS d
        FROM v
    ),
    per_dim AS (SELECT d, avg(x) AS mu, avg(x * x) AS m2 FROM dims GROUP BY d),
    agg AS (
        SELECT sum(mu * mu) AS norm_mean_sq,
               sum(m2) AS mean_sq_norm,
               max(m2 - mu * mu) AS top_var,
               sum(m2 - mu * mu) AS tot_var,
               count(*) AS dim
        FROM per_dim
    ),
    n AS (SELECT count(*) AS n_vectors FROM v)
    SELECT CAST(n_vectors AS BIGINT) AS n_vectors,
           CAST(dim AS BIGINT) AS dim,
           round(mean_sq_norm, 6) AS mean_sq_norm,
           round(norm_mean_sq, 6) AS norm_mean_sq,
           round(norm_mean_sq / mean_sq_norm, 6) AS isotropy_proxy,
           round(top_var / tot_var, 6) AS top_var_share
    FROM agg CROSS JOIN n
    """,
)
def embed_isotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space ISOTROPY audit (Ethayarajh 2019 / Mu & Viswanath
    2018 — "all-but-the-top"): anisotropic embeddings (a dominant
    common direction) inflate every cosine similarity and poison ANN
    thresholds, so this is the health gate run BEFORE trusting
    [[dedup_embedding_cosine]] or [[sim_search_topk]] cutoffs. The
    expected pairwise cosine is estimated WITHOUT sampling pairs via
    the moment identity E[<x,y>] = ||E[x]||² (independent x, y):
    ``isotropy_proxy`` = ||μ||² / E||x||² ≈ mean pairwise cosine for
    unit-ish norms (0 = perfectly isotropic, 1 = all vectors
    identical), and ``top_var_share`` = the largest per-dimension
    variance share flags a rogue coordinate. A mean-centering fix
    ("all-but-the-top") drives the proxy to ~0; re-running this audit
    after it is the verification.

    Scale shape: ONE pass — per-dimension first/second moments via
    posexplode + (dim) aggregate (shuffle volume O(dim), not
    O(rows·dim)), then driver-free scalar algebra on the dim-grain
    table. No pair sampling, no cross join, exact at any corpus
    size."""
    t = tables(spark, sf_dir)
    v = t.embeddings.select(as_double(F.col("embedding")).alias("ev"))
    dims = v.select(F.posexplode("ev").alias("d", "x"))
    per_dim = dims.groupBy("d").agg(
        F.avg("x").alias("mu"), F.avg(F.col("x") * F.col("x")).alias("m2")
    )
    agg = per_dim.agg(
        F.sum(F.col("mu") * F.col("mu")).alias("norm_mean_sq"),
        F.sum("m2").alias("mean_sq_norm"),
        F.max(F.col("m2") - F.col("mu") * F.col("mu")).alias("top_var"),
        F.sum(F.col("m2") - F.col("mu") * F.col("mu")).alias("tot_var"),
        F.count(F.lit(1)).alias("dim"),
    )
    n = v.agg(F.count(F.lit(1)).alias("n_vectors"))
    return agg.crossJoin(F.broadcast(n)).select(
        F.col("n_vectors").cast("long").alias("n_vectors"),
        F.col("dim").cast("long").alias("dim"),
        rnd("mean_sq_norm", 6).alias("mean_sq_norm"),
        rnd("norm_mean_sq", 6).alias("norm_mean_sq"),
        rnd(F.col("norm_mean_sq") / F.col("mean_sq_norm"), 6).alias(
            "isotropy_proxy"
        ),
        rnd(F.col("top_var") / F.col("tot_var"), 6).alias("top_var_share"),
    )


# --------------------------------------------------------------------------
# Greedy k-center coreset selection (fixed rounds, unrolled oracle)
# --------------------------------------------------------------------------

_KC_K = 8  # selected coreset size

_KC_D2 = (
    "list_sum(list_transform(list_zip(v.ev, s.ev), "
    "p -> (p[1] - p[2]) * (p[1] - p[2])))"
)


def _kc_round_sql(r: int) -> str:
    """One greedy round: every point's min squared distance to the
    current selection, argmax picks the farthest point ((d2 DESC,
    vec_id ASC) tie-break — distances are sequential folds, so the
    comparison is bit-identical cross-engine)."""
    return f"""
    cand{r} AS (
        SELECT v.vec_id, min({_KC_D2}) AS d2
        FROM kcv v JOIN kcv s ON s.vec_id IN (SELECT vec_id FROM sel{r - 1})
        WHERE v.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
        GROUP BY v.vec_id
    ),
    pick{r} AS (
        SELECT {r} AS ord, vec_id, d2 FROM cand{r}
        ORDER BY d2 DESC, vec_id LIMIT 1
    ),
    sel{r} AS (
        SELECT vec_id FROM sel{r - 1} UNION ALL SELECT vec_id FROM pick{r}
    )"""


@query(
    "embed_kcenter_coreset",
    oracle=f"""
    WITH kcv AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
    ),
    sel1 AS (SELECT min(vec_id) AS vec_id FROM kcv),
    {",".join(_kc_round_sql(r) for r in range(2, _KC_K + 1))},
    picks AS (
        SELECT 1 AS ord, vec_id, 0.0 AS d2 FROM sel1
        {" ".join(f"UNION ALL SELECT ord, vec_id, d2 FROM pick{r}"
                  for r in range(2, _KC_K + 1))}
    ),
    cover AS (
        SELECT max(md) AS radius FROM (
            SELECT v.vec_id, min({_KC_D2}) AS md
            FROM kcv v JOIN kcv s
              ON s.vec_id IN (SELECT vec_id FROM sel{_KC_K})
            GROUP BY v.vec_id
        )
    )
    SELECT CAST(ord AS INT) AS ord, CAST(vec_id AS BIGINT) AS vec_id,
           round(d2, 6) AS d2_at_pick,
           round(cover.radius, 6) AS coverage_radius_sq
    FROM picks CROSS JOIN cover
    """,
)
def embed_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-CENTER coreset selection (Gonzalez 1985; Sener &
    Savarese 2018's active-learning coreset): start from the min-id
    point, then {k}-1 times pick the point FARTHEST from the current
    selection — the classic 2-approximation to the k-center cover, and
    the diversity-first data-pruning rule ("cover the embedding space,
    don't oversample dense modes") used to curate training subsets.
    Emits the selection order, each pick's distance-at-selection (a
    monotone non-increasing sequence — pinned in tests), and the final
    coverage radius (max over the corpus of distance to the selected
    set — THE quantity k-center bounds within 2x of optimal).

    Fully hash-checked: the greedy loop is deterministic (min-id seed;
    (d2 DESC, vec_id ASC) tie-break) and every distance is the
    sequential zip-fold both engines compute bit-identically (the
    sim_search_pq parity), so the unrolled {k}-round DuckDB oracle
    walks the same trajectory with NO quantization needed.

    Scale shape: each round is one broadcast join of the (<= {k}-row)
    selection against the corpus + a 1-row argmax reduce — k scans
    total, the canonical distributed greedy-k-center cost (an
    incremental running-min column trades the rescans for state at
    larger k). Nothing ever pairs corpus with corpus; the coverage
    audit is one more broadcast pass."""
    t = tables(spark, sf_dir)
    vecs = t.embeddings.select(
        "vec_id", as_double(F.col("embedding")).alias("ev")
    )
    first = vecs.agg(F.min("vec_id").alias("vec_id")).collect()[0]["vec_id"]
    picks = [(1, first, 0.0)]
    sel_ids = [first]
    d2 = F.aggregate(
        F.zip_with(F.col("ev"), F.col("sv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    for r in range(2, _KC_K + 1):
        sel = vecs.filter(F.col("vec_id").isin(sel_ids)).select(
            F.col("ev").alias("sv")
        )
        cand = (
            vecs.filter(~F.col("vec_id").isin(sel_ids))
            .crossJoin(F.broadcast(sel))
            .select("vec_id", d2.alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("d2"))
        )
        # 1-row argmax reduce to the driver — the selection IS driver
        # state in greedy k-center (k rows total, like the k-means
        # centroid step)
        top = cand.orderBy(F.desc("d2"), F.asc("vec_id")).limit(1).collect()[0]
        picks.append((r, top["vec_id"], float(top["d2"])))
        sel_ids.append(top["vec_id"])
    sel = vecs.filter(F.col("vec_id").isin(sel_ids)).select(
        F.col("ev").alias("sv")
    )
    cover = (
        vecs.crossJoin(F.broadcast(sel))
        .select("vec_id", d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min("d2").alias("md"))
        .agg(F.max("md").alias("radius"))
    )
    picks_df = spark.createDataFrame(
        picks, "ord int, vec_id long, d2_at_pick double"
    )
    return picks_df.crossJoin(F.broadcast(cover)).select(
        "ord",
        "vec_id",
        rnd("d2_at_pick", 6).alias("d2_at_pick"),
        rnd("radius", 6).alias("coverage_radius_sq"),
    )


embed_kcenter_coreset.__doc__ = embed_kcenter_coreset.__doc__.replace(
    "{k}", str(_KC_K)
)


# --------------------------------------------------------------------------
# Cosine-similarity calibration histogram over a deterministic pair sample
# --------------------------------------------------------------------------

_CAL_SAMPLE_FRAC = 0.2  # ceiling on the md5-deterministic vector sample
_CAL_TARGET_VECS = 400.0  # audit budget: expected sample size cap
_CAL_N_BINS = 20  # histogram bins over [-1, 1]


@query(
    "embed_cosine_pair_histogram",
    oracle=f"""
    WITH frac AS (
        SELECT least({_CAL_SAMPLE_FRAC},
                     {_CAL_TARGET_VECS} / greatest(count(*), 1)) AS f
        FROM embeddings
    ),
    sampled AS (
        SELECT vec_id, embedding
        FROM embeddings CROSS JOIN frac
        WHERE ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                  ::BIGINT / 4294967296.0 < frac.f
    ),
    pairs AS (
        SELECT least({_CAL_N_BINS - 1}, CAST(floor(
                   (round({cosine_sql('a.embedding', 'b.embedding')}, 6)
                    + 1.0) * {_CAL_N_BINS / 2.0}) AS BIGINT)) AS bin
        FROM sampled a JOIN sampled b ON a.vec_id < b.vec_id
    ),
    tot AS (SELECT count(*) AS n FROM pairs)
    SELECT bin,
           round(bin * {2.0 / _CAL_N_BINS} - 1.0, 6) AS lo,
           round((bin + 1) * {2.0 / _CAL_N_BINS} - 1.0, 6) AS hi,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(count(*) * 1.0 / max(tot.n), 6) AS share
    FROM pairs CROSS JOIN tot
    GROUP BY bin
    """,
    tags=("similarity", "eval"),
)
def embed_cosine_pair_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine calibration histogram — the distribution every
    similarity THRESHOLD in this engine ([[dedup_embedding_cosine]]'s
    cutoff, [[embed_semdedup_prune]]'s epsilon, [[sim_search_lsh_bucketed]]'s
    band design) should be picked against: sample vectors with the
    content-addressed md5 predicate ([[sample_md5_threshold]] — same
    rows on every engine/run), compute all pairwise cosines WITHIN the
    sample, and bin them over [-1, 1]. A threshold chosen without this
    curve is a guess; the histogram shows where the background mass
    ends and the near-dup tail begins.

    Scale shape: the quadratic lives on the SAMPLE, and the sample is
    BUDGETED, not proportional — frac = min(0.2, 400/n), so the
    expected pair count plateaus at ~400²/2 regardless of corpus size
    (the curve's
    fidelity depends on pair count, not corpus coverage; the
    first probe of the proportional version measured alpha 1.94 at
    10x, which is exactly the blowup the cap removes). The sampled set
    broadcasts to one scan of itself; the cosine is the house
    sequential fold (bit-identical engines), and binning rounds at
    6 dp before the floor so a boundary cosine can't straddle engines.
    """
    t = tables(spark, sf_dir)
    unif = (
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / 4294967296.0
    )
    frac = t.embeddings.agg(
        F.least(
            F.lit(_CAL_SAMPLE_FRAC),
            # greatest(n, 1): ANSI mode makes n=0 a DIVIDE_BY_ZERO error
            # on an empty table instead of an empty result
            F.lit(_CAL_TARGET_VECS) / F.greatest(F.count(F.lit(1)), F.lit(1)),
        ).alias("f")
    )
    sampled = (
        t.embeddings.crossJoin(F.broadcast(frac))
        .filter(unif < F.col("f"))
        .select("vec_id", as_double("embedding").alias("v"))
    )
    a = sampled.alias("a")
    b = sampled.alias("b")
    cos = cosine("a.v", "b.v")
    pairs = a.join(
        F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id")
    ).select(
        F.least(
            F.lit(_CAL_N_BINS - 1),
            F.floor((rnd(cos, 6) + 1.0) * (_CAL_N_BINS / 2.0)).cast("long"),
        ).alias("bin")
    )
    tot = pairs.agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            rnd(F.col("bin") * (2.0 / _CAL_N_BINS) - 1.0, 6).alias("lo"),
            rnd((F.col("bin") + 1) * (2.0 / _CAL_N_BINS) - 1.0, 6).alias(
                "hi"
            ),
            "n_pairs",
            rnd(F.col("n_pairs") * 1.0 / F.col("n"), 6).alias("share"),
        )
    )


# --------------------------------------------------------------------------
# IVF nprobe response curve (recall vs probed cells, one assignment pass)
# --------------------------------------------------------------------------

_NPROBE_MAX = 4

#: exact-truth CTE — the registered sim_search_topk oracle verbatim
_TOPK_ORACLE = QUERIES["sim_search_topk"].oracle


@query(
    "eval_ivf_nprobe_curve",
    oracle=f"""
    WITH centroids AS (
        SELECT vec_id AS cent_id, embedding AS cv
        FROM embeddings
        WHERE vec_id % {CENTROID_MOD} = 0 AND vec_id < {CENTROID_ID_CAP}
    ),
    assign AS (
        SELECT e.vec_id, e.embedding, c.cent_id,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY {cosine_sql('e.embedding', 'c.cv')} DESC, c.cent_id
               ) AS arn
        FROM embeddings e CROSS JOIN centroids c
        QUALIFY arn = 1
    ),
    proberanks AS (
        SELECT q.vec_id AS query_id, c.cent_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {cosine_sql('q.embedding', 'c.cv')} DESC, c.cent_id
               ) AS prn
        FROM embeddings q CROSS JOIN centroids c
        WHERE q.vec_id < {N_QUERIES}
    ),
    cand AS (
        SELECT p.query_id, a.vec_id AS neighbor_id, p.prn,
               round({cosine_sql('q.embedding', 'a.embedding')}, 6) AS cosine
        FROM proberanks p
        JOIN assign a ON a.cent_id = p.cent_id AND a.vec_id <> p.query_id
        JOIN embeddings q ON q.vec_id = p.query_id
        WHERE p.prn <= {_NPROBE_MAX}
    ),
    cfg AS (SELECT unnest(generate_series(1, {_NPROBE_MAX})) AS n_probe),
    ranked AS (
        SELECT cfg.n_probe, c.query_id, c.neighbor_id, c.prn,
               row_number() OVER (
                   PARTITION BY cfg.n_probe, c.query_id
                   ORDER BY c.cosine DESC, c.neighbor_id
               ) AS rn
        FROM cand c JOIN cfg ON c.prn <= cfg.n_probe
    ),
    truth AS (
        SELECT query_id, neighbor_id
        FROM ({_TOPK_ORACLE}) x
    ),
    counts AS (
        SELECT n_probe,
               CAST(count(*) AS BIGINT) AS n_candidates
        FROM (SELECT cfg.n_probe, c.query_id, c.neighbor_id
              FROM cand c JOIN cfg ON c.prn <= cfg.n_probe)
        GROUP BY n_probe
    ),
    hits AS (
        SELECT r.n_probe, CAST(count(*) AS BIGINT) AS n_hits
        FROM ranked r
        JOIN truth t
          ON t.query_id = r.query_id AND t.neighbor_id = r.neighbor_id
        WHERE r.rn <= {TOP_K}
        GROUP BY r.n_probe
    ),
    nq AS (SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS q FROM truth)
    SELECT counts.n_probe, counts.n_candidates,
           coalesce(hits.n_hits, 0) AS n_hits,
           round(coalesce(hits.n_hits, 0) * 1.0 / (nq.q * {TOP_K}), 6)
               AS recall_at_k
    FROM counts
    LEFT JOIN hits ON hits.n_probe = counts.n_probe
    CROSS JOIN nq
    """,
    tags=("similarity", "eval"),
)
def eval_ivf_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF nprobe response curve — recall@{k} and candidate volume
    for every probe depth 1..{np}, from ONE cell-assignment pass: each
    candidate carries the rank of its cell in the query's probe order
    (the [[eval_lsh_band_tradeoff]] min-first-band move applied to
    IVF), so config p's candidate set is `prn <= p` and the whole
    curve is filtered ranks over one candidate table.
    [[eval_ann_recall_ivf]] scores only the shipped nprobe={np0}; this
    is the knob's full response surface against the exact
    [[sim_search_topk]] truth — the recall-vs-scan-cost evidence an
    IVF deployment tunes against (each +1 probe buys recall and pays
    ~1/cells more corpus scanned).

    Scale shape: assignment and probe ranking are broadcast-centroid
    scans (|cells| per row); the config expansion multiplies the
    CANDIDATE table (post-pruning, not the corpus) by {np}; truth is
    |queries| x k. Same production caveat as every recall eval here:
    at 100 TB the exact truth is computed on a sampled query shard.
    """
    t = tables(spark, sf_dir)
    emb = t.embeddings
    cents = emb.filter(
        (F.col("vec_id") % CENTROID_MOD == 0)
        & (F.col("vec_id") < CENTROID_ID_CAP)
    ).select(
        F.col("vec_id").alias("cent_id"), as_double("embedding").alias("cv")
    )
    e = emb.select("vec_id", as_double("embedding").alias("ev"))
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.desc("acos"), F.asc("cent_id")
    )
    assign = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "ev",
            "cent_id",
            cosine("ev", "cv").alias("acos"),
        )
        .withColumn("arn", F.row_number().over(assign_w))
        .filter(F.col("arn") == 1)
        .select("vec_id", F.col("ev").alias("av"), "cent_id")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ev").alias("qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("pcos"), F.asc("cent_id")
    )
    proberanks = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "qv",
            "cent_id",
            cosine("qv", "cv").alias("pcos"),
        )
        .withColumn("prn", F.row_number().over(probe_w))
        .filter(F.col("prn") <= _NPROBE_MAX)
        .select("query_id", "qv", "cent_id", "prn")
    )
    cand = (
        proberanks.join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "prn",
            rnd(cosine("qv", "av"), 6).alias("cosine"),
        )
    )
    cfg = spark.range(1, _NPROBE_MAX + 1).select(
        F.col("id").cast("int").alias("n_probe")
    )
    expanded = cand.join(
        F.broadcast(cfg), F.col("prn") <= F.col("n_probe")
    )
    rank_w = Window.partitionBy("n_probe", "query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    ranked = expanded.withColumn("rn", F.row_number().over(rank_w))
    truth = sim_search_topk(spark, sf_dir).select("query_id", "neighbor_id")
    counts = expanded.groupBy("n_probe").agg(
        F.count(F.lit(1)).cast("long").alias("n_candidates")
    )
    hits = (
        ranked.filter(F.col("rn") <= TOP_K)
        .join(F.broadcast(truth), ["query_id", "neighbor_id"])
        .groupBy("n_probe")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    nq = truth.agg(
        F.countDistinct("query_id").cast("long").alias("q")
    )
    return (
        counts.join(hits, "n_probe", "left")
        .crossJoin(F.broadcast(nq))
        .select(
            "n_probe",
            "n_candidates",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            rnd(
                F.coalesce("n_hits", F.lit(0))
                / (F.col("q") * float(TOP_K)),
                6,
            ).alias("recall_at_k"),
        )
    )


eval_ivf_nprobe_curve.__doc__ = (
    eval_ivf_nprobe_curve.__doc__
    .replace("{k}", str(TOP_K))
    .replace("{np0}", str(N_PROBE))
    .replace("{np}", str(_NPROBE_MAX))
)


# --------------------------------------------------------------------------
# Matryoshka truncation vs retrieval quality (rank preservation)
# --------------------------------------------------------------------------

_MRL_COS = "(list_dot_product(qv[1:d], cv[1:d]) / (sqrt(list_dot_product(qv[1:d], qv[1:d])) * sqrt(list_dot_product(cv[1:d], cv[1:d]))))"


@query(
    "eval_matryoshka_recall_curve",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}
    ),
    c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        FROM embeddings
    ),
    pairs AS (
        SELECT query_id, neighbor_id, qv, cv
        FROM q CROSS JOIN c WHERE neighbor_id <> query_id
    ),
    truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY {cosine_sql('qv', 'cv')} DESC, neighbor_id
                   ) AS rn
            FROM pairs
        ) WHERE rn <= {TOP_K}
    ),
    trunc AS (
        SELECT dim, query_id, neighbor_id FROM (
            SELECT d AS dim, query_id, neighbor_id,
                   row_number() OVER (
                       PARTITION BY d, query_id
                       ORDER BY {_MRL_COS} DESC, neighbor_id
                   ) AS rn
            FROM pairs CROSS JOIN (SELECT unnest({list(MRL_DIMS)}) AS d)
        ) WHERE rn <= {TOP_K}
    )
    SELECT dim,
           CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS hits,
           round(avg(CASE WHEN t.neighbor_id IS NOT NULL
                          THEN 1.0 ELSE 0.0 END), 6) AS recall_at_k
    FROM trunc tr
    LEFT JOIN truth t USING (query_id, neighbor_id)
    GROUP BY dim
    """,
)
def eval_matryoshka_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation vs RETRIEVAL quality: recall@k of
    truncated-dim cosine top-k against the full-dim ground truth, one
    row per MRL prefix dim. [[embed_matryoshka_energy]] measures how
    much ENERGY a prefix retains; this one measures what actually
    decides the production truncation knob — whether the prefix
    preserves NEIGHBOR RANKINGS (MRL's promise is that it does; a
    non-MRL-trained embedding typically fails this curve while passing
    the energy one). The honesty twin of [[sim_search_topk]]'s exact
    baseline, in the same eval_* pattern as [[eval_ivf_nprobe_curve]]:
    every design knob ships with its measured quality curve.

    Plan shape: ONE broadcast of the query set against the corpus
    computes the full-dim AND all prefix cosines per pair in a single
    scan (the prefix dot products are slices of the same arrays — no
    extra scan per dim); per-dim ranking is a window over the
    pair-bounded Q x N rows, and recall is an equi-join of two
    K-bounded shortlists. At 100 TB the corpus is never shuffled —
    same contract as sim_search_topk; sample queries per the standing
    recall-eval caveat."""
    t = tables(spark, sf_dir)
    emb = t.embeddings
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double(F.col("embedding")).alias("cv"),
    )
    def _cos(qc, cc):
        return dot(qc, cc) / (norm(qc) * norm(cc))

    pairs = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cos(F.col("qv"), F.col("cv")).alias("cos_full"),
            F.array(
                *[
                    _cos(F.slice("qv", 1, d), F.slice("cv", 1, d))
                    for d in MRL_DIMS
                ]
            ).alias("cos_dims"),
        )
    )
    wt = Window.partitionBy("query_id").orderBy(
        F.desc("cos_full"), F.asc("neighbor_id")
    )
    truth = (
        pairs.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", F.lit(True).alias("in_truth"))
    )
    dims_arr = F.array(*[F.lit(d) for d in MRL_DIMS])
    wd = Window.partitionBy("dim", "query_id").orderBy(
        F.desc("cos_d"), F.asc("neighbor_id")
    )
    trunc = (
        pairs.select(
            "query_id",
            "neighbor_id",
            F.posexplode("cos_dims").alias("pos", "cos_d"),
        )
        .withColumn("dim", F.element_at(dims_arr, F.col("pos") + 1))
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= TOP_K)
    )
    return (
        trunc.join(truth, ["query_id", "neighbor_id"], "left")
        .groupBy("dim")
        .agg(
            F.sum(F.col("in_truth").isNotNull().cast("long")).alias("hits"),
            rnd(
                F.avg(F.col("in_truth").isNotNull().cast("double")), 6
            ).alias("recall_at_k"),
        )
    )


# --------------------------------------------------------------------------
# Alignment & uniformity of the embedding space (Wang & Isola 2020)
# --------------------------------------------------------------------------

_AU_SAMPLE_FRAC = 0.25  # ceiling on the md5-deterministic vector sample
_AU_TARGET_VECS = 400.0  # audit budget: expected sample size cap
_AU_GRID = 1e9  # integer grid for order-independent pair sums


@query(
    "embed_alignment_uniformity",
    oracle=f"""
    WITH frac AS (
        SELECT least({_AU_SAMPLE_FRAC},
                     {_AU_TARGET_VECS} / greatest(count(*), 1)) AS f
        FROM embeddings
    ),
    sampled AS (
        SELECT vec_id, label, embedding
        FROM embeddings CROSS JOIN frac
        WHERE ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                  ::BIGINT / 4294967296.0 < frac.f
    ),
    pairs AS (
        SELECT a.label = b.label AS pos,
               CAST(round((2.0 - 2.0 *
                   {cosine_sql('a.embedding', 'b.embedding')})
                   * {_AU_GRID}, 0) AS BIGINT) AS d2q
        FROM sampled a JOIN sampled b ON a.vec_id < b.vec_id
    ),
    q AS (
        SELECT pos, d2q,
               CAST(round(exp(-2.0 * (d2q / {_AU_GRID})) * {_AU_GRID}, 0)
                   AS BIGINT) AS eq
        FROM pairs
    ),
    tot AS (
        SELECT count(*) AS n_pairs,
               sum(CASE WHEN pos THEN 1 ELSE 0 END) AS n_pos,
               sum(CASE WHEN pos THEN d2q ELSE 0 END) AS pos_d2,
               sum(eq) AS sum_eq
        FROM q
    )
    SELECT (SELECT count(*) FROM sampled) AS n_sampled,
           CAST(coalesce(n_pos, 0) AS BIGINT) AS n_pos_pairs,
           CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
           CASE WHEN coalesce(n_pos, 0) > 0
                THEN round((CAST(pos_d2 AS DOUBLE) / n_pos)
                           / {_AU_GRID}, 6) END AS alignment,
           CASE WHEN coalesce(n_pairs, 0) > 0
                THEN round(ln((CAST(sum_eq AS DOUBLE) / n_pairs)
                              / {_AU_GRID}), 6) END AS uniformity
    FROM tot
    """,
    tags=("similarity", "eval"),
)
def embed_alignment_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALIGNMENT and UNIFORMITY of the embedding space (Wang & Isola,
    ICML 2020): alignment = E||z_x - z_y||^2 over positive pairs
    (same-label vectors — closer is better), uniformity =
    log E exp(-2||z_x - z_y||^2) over all pairs (more negative = mass
    spread evenly on the hypersphere). The two-number health check run
    on every contrastive-embedding refresh: collapsed spaces score
    great on alignment and terrible on uniformity, anisotropic ones
    the reverse — thresholds like [[embed_semdedup_prune]]'s epsilon
    and [[dedup_embedding_cosine]]'s cutoff silently break under
    either failure mode, and [[embed_isotropy_audit]] sees only the
    second. Squared distance on the unit sphere is 2 - 2*cosine, so
    both metrics ride the house bit-exact sequential cosine fold.

    Parity: each pair's d^2 is bit-identical cross-engine (house
    cosine), then quantized to an integer 1e-9 grid BEFORE summing —
    pair sums are exact BIGINT arithmetic, so the means are
    order-independent by construction (the Page-Hinkley integer-cents
    pattern), not merely within rounding of each other; exp() is
    re-quantized to the same grid because JVM Math.exp and libm may
    legitimately differ in the last ulp.

    Scale shape: the quadratic lives on a BUDGETED sample
    (frac = min({_AU_SAMPLE_FRAC}, {_AU_TARGET_VECS:.0f}/n), the
    embed_cosine_pair_histogram precedent — constant pair count at any
    corpus size); the sampled set broadcasts to one scan of itself and
    the final reduce is a 1-row aggregate."""
    t = tables(spark, sf_dir)
    unif = (
        F.conv(
            F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10
        ).cast("double")
        / 4294967296.0
    )
    frac = t.embeddings.agg(
        F.least(
            F.lit(_AU_SAMPLE_FRAC),
            # greatest(n, 1): ANSI mode makes n=0 a DIVIDE_BY_ZERO error
            # on an empty table instead of an empty result
            F.lit(_AU_TARGET_VECS) / F.greatest(F.count(F.lit(1)), F.lit(1)),
        ).alias("f")
    )
    sampled = (
        t.embeddings.crossJoin(F.broadcast(frac))
        .filter(unif < F.col("f"))
        .select("vec_id", "label", as_double("embedding").alias("v"))
    )
    a, b = sampled.alias("a"), sampled.alias("b")
    d2 = 2.0 - 2.0 * cosine("a.v", "b.v")
    pairs = a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id")).select(
        (F.col("a.label") == F.col("b.label")).alias("pos"),
        F.round(d2 * _AU_GRID, 0).cast("long").alias("d2q"),
    )
    q = pairs.withColumn(
        "eq",
        F.round(F.exp(-2.0 * (F.col("d2q") / _AU_GRID)) * _AU_GRID, 0).cast(
            "long"
        ),
    )
    tot = q.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("pos").cast("int")).alias("n_pos"),
        F.sum(F.when(F.col("pos"), F.col("d2q")).otherwise(F.lit(0))).alias(
            "pos_d2"
        ),
        F.sum("eq").alias("sum_eq"),
    )
    n_samp = sampled.agg(F.count(F.lit(1)).alias("n_sampled"))
    n_pos = F.coalesce(F.col("n_pos"), F.lit(0))
    n_pairs = F.coalesce(F.col("n_pairs"), F.lit(0))
    return tot.crossJoin(F.broadcast(n_samp)).select(
        "n_sampled",
        n_pos.cast("long").alias("n_pos_pairs"),
        n_pairs.cast("long").alias("n_pairs"),
        F.when(
            n_pos > 0,
            rnd(
                (F.col("pos_d2").cast("double") / F.col("n_pos")) / _AU_GRID,
                6,
            ),
        ).alias("alignment"),
        F.when(
            n_pairs > 0,
            rnd(
                F.log(
                    (F.col("sum_eq").cast("double") / F.col("n_pairs"))
                    / _AU_GRID
                ),
                6,
            ),
        ).alias("uniformity"),
    )
