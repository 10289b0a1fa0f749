"""Corpus-level training-data pipeline operators over `documents`:
TF-IDF keyword extraction, sliding-window chunking, PII scrubbing,
token-budget packing, train/eval decontamination, stratified splits.

Engine extension (BASELINE.json north star): the reference has no query
engine at all (SURVEY.md §0); these are the corpus-preparation stages a
100-TB LLM-data pipeline runs between raw scan and tokenizer. All
per-document stages are shuffle-free projections; the corpus-wide
stages (document frequency, contaminated-id set) aggregate to small
intermediates before touching the fact scan again, so at 1000
executors the heavy table is read once and shuffled at aggregate
cardinality only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.functions.textfns import WORDS_SQL, shingles, shingles_sql, words
from awsbeats_spark.registry import query

# --------------------------------------------------------------------------
# TF-IDF keywords
# --------------------------------------------------------------------------


@query(
    "corpus_tfidf_topk",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({WORDS_SQL}) AS token FROM documents
    ),
    tf AS (
        SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    withdf AS (
        SELECT doc_id, token, tf,
               count(*) OVER (PARTITION BY token) AS df
        FROM tf
    ),
    scored AS (
        SELECT doc_id, token, tf, df,
               round(tf * ln(n.n_docs * 1.0 / df), 4) AS tfidf,
               row_number() OVER (
                   PARTITION BY doc_id
                   ORDER BY tf DESC, df ASC, token ASC
               ) AS rk
        FROM withdf CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, tfidf, rk FROM scored WHERE rk <= 5
    """,
)
def corpus_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF keywords per document. Keywords rank by the integer
    key (tf DESC, df ASC, token ASC) — monotone in tf·ln(N/df) per doc
    and float-free, so the selected set is deterministic across
    engines; the float tfidf score is reported but never compared
    unrounded. Scale shape: document frequency is a window count over
    the tf aggregate ((doc, token) rows are already distinct), not a
    self-join — the 100-TB scan + explode happens ONCE (asserted in
    test_plans.py) and the pipeline is three shuffles at strictly
    shrinking cardinality: (doc, token) agg → token window → doc_id
    rank."""
    t = tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(words()).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    n_docs = t.documents.agg(F.count("*").alias("n_docs"))
    withdf = tf.withColumn("df", F.count("*").over(Window.partitionBy("token")))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        withdf.crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", rnd(F.col("tf") * F.log(F.col("n_docs") * 1.0 / F.col("df")), 4))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("doc_id", "token", "tf", "df", "tfidf", "rk")
    )


# --------------------------------------------------------------------------
# Sliding-window chunking
# --------------------------------------------------------------------------

_CHUNK = 64
_STRIDE = 48


@query(
    "corpus_doc_chunk",
    oracle=f"""
    WITH w AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
    starts AS (
        SELECT doc_id, ws,
               unnest(generate_series(1, greatest(len(ws), 1), {_STRIDE})) AS start
        FROM w
    )
    SELECT doc_id,
           CAST((start - 1) / {_STRIDE} AS BIGINT) AS chunk_id,
           len(list_slice(ws, start, start + {_CHUNK - 1})) AS n_chunk_words,
           array_to_string(list_slice(ws, start, start + {_CHUNK - 1}), ' ')
               AS chunk_text
    FROM starts
    """,
)
def corpus_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping {CHUNK}-word windows with
    stride {STRIDE} (context-window preparation for training). Spec:
    chunks start at word 1, 1+stride, … while start ≤ n_words; an empty
    document yields one empty chunk. Pure per-row explode — no shuffle,
    embarrassingly parallel at 100 TB; output rows ≈ n_words/stride per
    doc, so downstream partition sizing sees ~1.3× the input token
    volume."""
    t = tables(spark, sf_dir)
    # tokenize once: the inline form ran the split pipeline twice per
    # row (array + the generator's size bound) — round 11
    starts = F.sequence(
        F.lit(1), F.greatest(F.size("ws"), F.lit(1)), F.lit(_STRIDE)
    )
    exploded = t.documents.select("doc_id", words("text").alias("ws")).select(
        "doc_id", "ws", F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("ws"), F.col("start"), _CHUNK)
    return exploded.select(
        "doc_id",
        ((F.col("start") - 1) / _STRIDE).cast("bigint").alias("chunk_id"),
        F.size(chunk).alias("n_chunk_words"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# --------------------------------------------------------------------------
# PII scrubbing
# --------------------------------------------------------------------------

# Patterns valid in BOTH Java regex (Spark) and RE2 (DuckDB).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "idnum": r"\b\d{9,}\b",
}


def scrub_expr(col):
    """Redact every PII pattern in order, returning the clean Column."""
    out = col
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def _scrub_sql(expr: str) -> str:
    for name, pat in PII_PATTERNS.items():
        expr = f"regexp_replace({expr}, '{pat}', '<{name.upper()}>', 'g')"
    return expr


@query(
    "corpus_pii_scrub",
    oracle=f"""
    SELECT doc_id,
           {" + ".join(f"len(regexp_extract_all(text, '{p}'))" for p in PII_PATTERNS.values())}
               AS n_pii,
           {_scrub_sql("text")} AS clean_text
    FROM documents
    """,
)
def corpus_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails / IPv4s / phone-shaped / long-id-number substrings
    with typed placeholder tokens and count the hits (compliance stage
    of a training-data pipeline). Chained JVM regexp_replace — single
    codegen'd pass, no shuffle. The pattern table is shared with the
    DuckDB oracle, restricted to the Java∩RE2 regex dialect."""
    t = tables(spark, sf_dir)
    n_pii = None
    for pat in PII_PATTERNS.values():
        c = F.regexp_count(F.col("text"), F.lit(pat))
        n_pii = c if n_pii is None else n_pii + c
    return t.documents.select(
        "doc_id", n_pii.alias("n_pii"), scrub_expr(F.col("text")).alias("clean_text")
    )


# --------------------------------------------------------------------------
# Token-budget packing
# --------------------------------------------------------------------------

_PACK_BUDGET = 2048


@query(
    "corpus_token_pack",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, source, len({WORDS_SQL}) AS n_tokens FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor(coalesce(sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {_PACK_BUDGET}) AS BIGINT) AS pack_id
    FROM sized
    """,
)
def corpus_token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to a fixed-budget training pack: pack_id =
    floor(tokens-before-me / {_PACK_BUDGET}) in deterministic doc_id
    order within each source shard. This is the offset-based packing
    spec (a pack may overflow by at most one document), chosen over
    greedy first-fit because it is expressible as ONE window cumsum —
    a single shuffle on `source` — instead of a sequential scan, so it
    parallelizes per shard at 100 TB."""
    t = tables(spark, sf_dir)
    sized = t.documents.select(
        "doc_id", "source", F.size(words()).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return sized.withColumn(
        "pack_id", F.floor(before / _PACK_BUDGET).cast("bigint")
    )


# --------------------------------------------------------------------------
# Train/eval decontamination
# --------------------------------------------------------------------------

_EVAL_BUCKETS = ("0", "1")  # md5 first hex digit => ~1/8 of docs are "eval"
_DECON_N = 5  # shingle width for contamination matching


def _bucket_sql() -> str:
    return "substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)"


def _bucket_col():
    return F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)


@query(
    "corpus_decontaminate",
    oracle=f"""
    WITH ev AS (
        SELECT DISTINCT unnest({shingles_sql(WORDS_SQL, _DECON_N)}) AS sh
        FROM documents
        WHERE {_bucket_sql()} IN {_EVAL_BUCKETS}
    ),
    train AS (
        SELECT doc_id, source, {shingles_sql(WORDS_SQL, _DECON_N)} AS shs
        FROM documents
        WHERE {_bucket_sql()} NOT IN {_EVAL_BUCKETS}
    ),
    contaminated AS (
        SELECT DISTINCT t.doc_id
        FROM (SELECT doc_id, unnest(shs) AS sh FROM train) t
        JOIN ev USING (sh)
    )
    SELECT doc_id, source FROM train
    WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
)
def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: drop every train document sharing any
    word {_DECON_N}-gram with the held-out eval split (deterministic
    md5-bucket split, same idiom as sample_hash_deterministic). Scale
    shape: the eval shingle set is eval-corpus-sized (small — here 1/8,
    in practice benchmark-sized), so it broadcasts; the train side is
    explode → semi-join → distinct ids → left_anti, i.e. the 100-TB
    train scan never shuffles on shingle text, only the contaminated-id
    set (≤ one id per train doc) does."""
    t = tables(spark, sf_dir)
    is_eval = _bucket_col().isin(*_EVAL_BUCKETS)
    # tokenize once per side: the inline shingles(words()) re-ran the
    # split pipeline per slice/size reference (11x per row) — round 11
    ev = (
        t.documents.filter(is_eval)
        .select(words("text").alias("w"))
        .select(F.explode(shingles("w", _DECON_N)).alias("sh"))
        .distinct()
    )
    train = (
        t.documents.filter(~is_eval)
        .select("doc_id", "source", words("text").alias("w"))
        .select("doc_id", "source", shingles("w", _DECON_N).alias("shs"))
    )
    contaminated = (
        train.select("doc_id", F.explode("shs").alias("sh"))
        .join(F.broadcast(ev), "sh", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return train.join(contaminated, "doc_id", "left_anti").select("doc_id", "source")


# --------------------------------------------------------------------------
# Stratified split
# --------------------------------------------------------------------------


@query(
    "corpus_stratified_split",
    oracle=f"""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN {_bucket_sql()} BETWEEN '0' AND 'b' THEN 'train'
                    WHEN {_bucket_sql()} BETWEEN 'c' AND 'd' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT lang, split, count(*) AS n_docs
    FROM assigned GROUP BY lang, split
    """,
)
def corpus_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 12/2/2-sixteenths train/val/test assignment by
    content-addressed md5 bucket, audited per language stratum. The
    same document lands in the same split on every engine, rerun, and
    partitioning — rand()-based splits can't be reproduced or
    oracle-checked. One map-side-combined groupBy at (lang, split)
    cardinality; no other shuffle."""
    t = tables(spark, sf_dir)
    # bucket digest once per row: the CASE's range tests re-ran the
    # doc_id md5 up to 4x per row when inlined — round 11
    b = F.col("b")
    split = (
        F.when(b.between("0", "b"), F.lit("train"))
        .when(b.between("c", "d"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        t.documents.select("lang", _bucket_col().alias("b"))
        .select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
    )


# --------------------------------------------------------------------------
# Quality-filter funnel
# --------------------------------------------------------------------------

_MIN_WORDS = 30


@query(
    "corpus_filter_funnel",
    oracle=f"""
    WITH f AS (
        SELECT text,
               trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm
        FROM documents
    ),
    flags AS (
        SELECT text, norm <> '' AS ok_nonempty,
               norm <> '' AND len(string_split(norm, ' ')) >= {_MIN_WORDS}
                   AS ok_minlen
        FROM f
    ),
    wide AS (
        SELECT count(*) AS n_raw,
               CAST(sum(CASE WHEN ok_nonempty THEN 1 ELSE 0 END) AS BIGINT) AS n_nonempty,
               CAST(sum(CASE WHEN ok_minlen THEN 1 ELSE 0 END) AS BIGINT) AS n_minlen,
               count(DISTINCT CASE WHEN ok_minlen THEN text END) AS n_dedup
        FROM flags
    )
    SELECT 0 AS stage_id, 'raw' AS stage, n_raw AS n_docs FROM wide
    UNION ALL SELECT 1, 'non_empty', n_nonempty FROM wide
    UNION ALL SELECT 2, 'min_len_{_MIN_WORDS}', n_minlen FROM wide
    UNION ALL SELECT 3, 'dedup_exact', n_dedup FROM wide
    """,
)
def corpus_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor counts through the canonical corpus-cleaning funnel
    (raw -> normalized non-empty -> min-length -> exact-dedup) computed
    in ONE pass: per-doc flags, then a single wide aggregate unpivoted
    with `stack`. At 100 TB this is the pipeline-health dashboard
    query; the only exact-distinct is over surviving text (flip to
    approx_count_distinct when survivors exceed memory)."""
    docs = tables(spark, sf_dir).documents
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    flags = docs.select(
        "text",
        (norm != "").alias("ok_nonempty"),
        ((norm != "") & (F.size(F.split(norm, " ")) >= _MIN_WORDS)).alias(
            "ok_minlen"
        ),
    )
    wide = flags.agg(
        F.count("*").alias("n_raw"),
        F.sum(F.col("ok_nonempty").cast("long")).alias("n_nonempty"),
        F.sum(F.col("ok_minlen").cast("long")).alias("n_minlen"),
        F.count_distinct(
            F.when(F.col("ok_minlen"), F.col("text"))
        ).alias("n_dedup"),
    )
    return wide.select(
        F.expr(
            "stack(4, 0, 'raw', n_raw, 1, 'non_empty', n_nonempty, "
            f"2, 'min_len_{_MIN_WORDS}', n_minlen, 3, 'dedup_exact', n_dedup) "
            "AS (stage_id, stage, n_docs)"
        )
    )


# --------------------------------------------------------------------------
# Bigram language-model quality score
# --------------------------------------------------------------------------


@query(
    "corpus_lm_score",
    oracle=f"""
    WITH w AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
    bi AS (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
    ),
    bcnt AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2),
    ucnt AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY 1),
    v AS (SELECT count(DISTINCT unnest.w) AS vocab
          FROM (SELECT unnest(ws) AS w FROM w) AS unnest),
    scored AS (
        SELECT b.doc_id,
               ln((bc.c2 + 1.0) / (uc.c1 + v.vocab)) AS logp
        FROM bi b
        JOIN bcnt bc ON b.w1 = bc.w1 AND b.w2 = bc.w2
        JOIN ucnt uc ON b.w1 = uc.w1
        CROSS JOIN v
    )
    SELECT doc_id, count(*) AS n_bigrams,
           round(avg(logp), 4) AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def corpus_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram language-model score (add-one smoothing,
    trained on the corpus itself): avg ln P(w2|w1) — the classic
    statistical quality signal for corpus filtering (low scores =
    unnatural token sequences). Scale shape: the LM tables (bigram and
    unigram counts) are aggregates of ONE explode pass; the scoring
    join hash-partitions on the bigram key at token cardinality, never
    on documents. At 100 TB the vocabulary would be capped top-K and
    broadcast; here the exact model is the oracle contract. Rounded at
    4 so the two engines' summation orders over a doc's logs cannot
    flip low bits."""
    docs = tables(spark, sf_dir).documents
    # materialize the token array before slicing: the inline words()
    # re-ran the split pipeline per size/slice reference (5x) — round 11
    w = F.col("w")
    bi = (
        docs.select("doc_id", words("text").alias("w"))
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.size(w) >= 2,
                    F.zip_with(
                        F.slice(w, 1, F.size(w) - 1),
                        F.slice(w, 2, F.size(w) - 1),
                        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    bcnt = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    ucnt = bi.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = docs.select(F.explode(words("text")).alias("t")).agg(
        F.countDistinct("t").alias("vocab")
    )
    scored = (
        bi.join(bcnt, ["w1", "w2"])
        .join(ucnt, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("vocab"))).alias(
                "logp"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"), rnd(F.avg("logp"), 4).alias("avg_logp")
    )


# --------------------------------------------------------------------------
# Deterministic global shuffle (training-order randomization)
# --------------------------------------------------------------------------


@query(
    "corpus_global_shuffle",
    oracle="""
    SELECT doc_id,
           md5(doc_id || ':seed42') AS skey,
           CAST(('0x' || substr(md5(doc_id || ':seed42'), 1, 2))::INTEGER % 16
                AS BIGINT) AS shard,
           row_number() OVER (ORDER BY md5(doc_id || ':seed42')) AS pos
    FROM documents
    """,
)
def corpus_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle for training-order randomization:
    every doc gets a seeded md5 shuffle key (reproducible across runs
    and engines, unlike rand()), a shard id from the key's top byte for
    partitioned output, and its global position in shuffled order.
    Scale: sorting by skey is Spark's sample-based RANGE partitioning —
    the standard way to materialize a shuffled 100-TB corpus (each
    output file is one contiguous key range, no single-point
    bottleneck). The global row_number here runs in one window for
    oracle comparability; at scale you'd keep only the range-sorted
    order (or zipWithIndex per partition + offset) and let the shard
    column drive the partitioned write."""
    docs = tables(spark, sf_dir).documents
    skey = F.md5(F.concat(F.col("doc_id"), F.lit(":seed42")))
    return (
        docs.select("doc_id", skey.alias("skey"))
        .withColumn(
            "shard",
            (F.conv(F.substring("skey", 1, 2), 16, 10).cast("bigint") % 16),
        )
        .withColumn("pos", F.row_number().over(Window.orderBy("skey")))
    )


@query(
    "corpus_dup_span_detect",
    oracle=f"""
    WITH spans AS (
        SELECT doc_id, unnest({shingles_sql(n=5)}) AS span FROM documents
    ),
    agg AS (
        SELECT span,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_occ
        FROM spans GROUP BY span
    )
    SELECT span, n_docs, n_occ
    FROM agg WHERE n_docs >= 2
    ORDER BY n_docs DESC, n_occ DESC, span
    LIMIT 100
    """,
)
def corpus_dup_span_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicated-span detection (Raffel et al. 2020 §2.2
    adapted to unpunctuated text): word 5-grams that recur across >=2
    distinct documents, ranked by spread — the candidate boilerplate /
    contamination spans a cleanup pass would excise.

    Scale: explode inflates the scan by ~words-per-doc, but both
    aggregate levels partial-aggregate map-side before their shuffle.
    The distinct-doc count is an explicit two-level aggregate —
    (span, doc_id) occurrences, then span — NOT countDistinct mixed
    with count, which Catalyst plans as an Expand that doubles every
    shuffled row. Span keys are near-unique (no skew); the >=2 filter
    plus top-100 TakeOrderedAndProject means only the tiny ranked head
    ever reaches the driver. Ties at the limit boundary break on the
    unique span string, so the cutoff is deterministic."""
    t = tables(spark, sf_dir)
    # tokenize once: inline shingles(words(), 5) re-ran the split
    # pipeline per slice reference (11x per row) — round 11
    return (
        t.documents.select("doc_id", words("text").alias("w"))
        .select("doc_id", F.explode(shingles("w", 5)).alias("span"))
        .groupBy("span", "doc_id")
        .agg(F.count(F.lit(1)).alias("occ"))
        .groupBy("span")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "span")
        .limit(100)
    )


#: Per-language keep-rates for the deterministic mixture sampler, in
#: sixteenths (one hex digit of the doc_id md5): a doc survives when its
#: first hash nibble is lexicographically below the threshold char.
#: 'g' sorts above every hex digit -> keep all.
_MIX_THRESHOLDS: dict[str, str] = {
    "en": "g",  # 16/16
    "zh": "8",  # 8/16
    "de": "8",  # 8/16
    "fr": "4",  # 4/16
    "es": "2",  # 2/16
}
_MIX_DEFAULT = "1"  # 1/16 for any other language


@query(
    "corpus_mix_sample",
    oracle=f"""
    SELECT doc_id, lang, source FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <
          CASE lang
               WHEN 'en' THEN 'g' WHEN 'zh' THEN '8' WHEN 'de' THEN '8'
               WHEN 'fr' THEN '4' WHEN 'es' THEN '2' ELSE '1' END
    """,
)
def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language mixture sampling — the domain/language
    re-weighting stage of a pretraining data recipe (keep all English,
    half zh/de, a quarter fr, an eighth es). Content-addressed via the
    doc_id md5 nibble instead of rand(), so the SAME documents survive
    on every engine, rerun, and partitioning — reproducible mixtures
    are the only kind a 100-TB pipeline can debug or decontaminate
    against. Fixed-width lowercase-hex strings compare identically
    (lexicographic == numeric) in Spark and DuckDB.

    Scale: pure narrow filter, no shuffle, no driver state; the hash
    predicate pushes into the scan stage and composes with partition
    pruning on a lang-partitioned layout."""
    t = tables(spark, sf_dir)
    thr = F.lit(_MIX_DEFAULT)
    for lang, ch in _MIX_THRESHOLDS.items():
        thr = F.when(F.col("lang") == lang, ch).otherwise(thr)
    nibble = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    return t.documents.filter(nibble < thr).select("doc_id", "lang", "source")


_K_PER_GROUP = 20


@query(
    "corpus_sample_k_per_group",
    oracle=f"""
    SELECT doc_id, lang, rk FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents)
    WHERE rk <= {_K_PER_GROUP}
    """,
)
def corpus_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-language balanced subset (k=20): rank docs inside
    each language by content-addressed hash order and keep the first k —
    the deterministic replacement for reservoir sampling when building
    eval slices or annotation batches (same docs on every engine, rerun,
    and partitioning; reservoir/rand() sampling can't be oracle-checked
    or reproduced). Complements [corpus_mix_sample], which keeps a RATE
    per group; this keeps a COUNT.

    Scale: one hash-partitioned window on lang. Group count is small
    (languages), so a 100-TB run would hit window-partition skew: the
    production shape for huge groups is a per-partition top-k
    (partial TakeOrdered) before the global rank — here rows-per-group
    are bounded and the single window is the right plan."""
    t = tables(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        t.documents.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _K_PER_GROUP)
    )


@query(
    "corpus_forget_users",
    oracle="""
    WITH forget AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
    )
    SELECT e.event_type,
           count(*) FILTER (WHERE f.user_id IS NULL) AS rows_kept,
           count(*) FILTER (WHERE f.user_id IS NOT NULL) AS rows_purged,
           count(DISTINCT CASE WHEN f.user_id IS NOT NULL
                               THEN e.user_id END) AS users_purged
    FROM events e
    LEFT JOIN forget f ON e.user_id = f.user_id
    GROUP BY e.event_type
    """,
)
def corpus_forget_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten audit: given an erasure-request list (here
    derived deterministically as user_id % 97 == 0), report per
    event_type how many rows survive, how many are purged, and how many
    distinct requesters had data — the accounting a GDPR/CCPA delete
    pass over a training corpus must emit.

    Scale shape: erasure lists are tiny next to the corpus, so the
    membership test is a BROADCAST left join marking rows — one scan of
    the fact table, no shuffle of it. The actual delete is the same
    join as left_anti + partition rewrite (write_zordered /
    compact_small_files handle the layout); this operator returns the
    audit so the driver can hash-check the bookkeeping."""
    ev = tables(spark, sf_dir).events
    forget = (
        ev.filter((F.col("user_id") % 97) == 0)
        .select("user_id")
        .distinct()
        .withColumn("f_marker", F.lit(1))
    )
    return (
        ev.join(F.broadcast(forget), "user_id", "left")
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("f_marker").isNull(), 1)).alias("rows_kept"),
            F.count(F.when(F.col("f_marker").isNotNull(), 1)).alias("rows_purged"),
            F.countDistinct(
                F.when(F.col("f_marker").isNotNull(), F.col("user_id"))
            ).alias("users_purged"),
        )
    )


# --------------------------------------------------------------------------
# Quality-quantile filtering + source-mix entropy
# --------------------------------------------------------------------------


@query(
    "corpus_quantile_filter",
    oracle="""
    SELECT doc_id, lang, n_chars,
           round(pr, 6) AS len_pctile
    FROM (
        SELECT doc_id, lang, n_chars,
               percent_rank() OVER (
                   PARTITION BY lang ORDER BY n_chars, doc_id
               ) AS pr
        FROM documents
    )
    WHERE pr >= 0.75
    """,
)
def corpus_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quantile gate: keep documents at or above the 75th
    length percentile OF THEIR LANGUAGE — the standard 'top-quartile
    per stratum' quality filter (absolute thresholds starve low-resource
    languages). percent_rank is one window per lang partition — a single
    shuffle on lang; the doc_id tiebreaker makes the cut deterministic.
    At 100 TB swap the exact window for approx_percentile per lang
    broadcast back (sketch pass + map filter, no big shuffle)."""
    docs = tables(spark, sf_dir).documents
    w = Window.partitionBy("lang").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (
        docs.select(
            "doc_id", "lang", "n_chars", F.percent_rank().over(w).alias("pr")
        )
        .filter(F.col("pr") >= 0.75)
        .select("doc_id", "lang", "n_chars", rnd("pr", 6).alias("len_pctile"))
    )


@query(
    "corpus_source_mix",
    oracle=f"""
    WITH per_source AS (
        SELECT source,
               count(*) AS n_docs,
               sum(len({WORDS_SQL})) AS n_tokens
        FROM documents GROUP BY source
    ), tot AS (SELECT sum(n_tokens) AS all_tokens FROM per_source)
    SELECT s.source, s.n_docs,
           round(s.n_tokens * 1.0 / t.all_tokens, 6) AS token_share,
           round(-(s.n_tokens * 1.0 / t.all_tokens)
                 * ln(s.n_tokens * 1.0 / t.all_tokens), 6) AS entropy_term
    FROM per_source s CROSS JOIN tot t
    WHERE s.n_tokens > 0
    """,
)
def corpus_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix audit: per-source token share and its Shannon
    entropy contribution (sum of entropy_term = mix entropy — the
    number mixture designers tune against). One groupBy(source) with
    map-side combine; the grand total is a one-row broadcast back over
    the tiny per-source aggregate, so the documents scan happens
    exactly once."""
    docs = tables(spark, sf_dir).documents
    # n_tokens > 0 guard on BOTH sides: a source whose docs all tokenize
    # empty has share 0, where ln(0) is NULL in Spark but a hard error
    # in DuckDB — dropping zero-token sources makes the contract total
    # (their entropy contribution is the limit 0 anyway).
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words())).alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    # grand total as an unpartitioned window over the |sources|-row
    # aggregate — no second scan of documents (a separate .agg() branch
    # would re-run the tokenize pipeline over the whole table), and the
    # single-partition window only ever sees |sources| rows.
    share = F.col("n_tokens") / F.sum("n_tokens").over(
        Window.partitionBy(F.lit(1))
    )
    return per_source.select(
        "source",
        "n_docs",
        rnd(share, 6).alias("token_share"),
        rnd(-share * F.log(share), 6).alias("entropy_term"),
    )


_TEMP_T = 2.0  # mixture temperature: w_i ~ p_i^(1/T); T=2 -> sqrt flattening


@query(
    "corpus_temperature_resample",
    oracle=f"""
    WITH per_source AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len({WORDS_SQL})) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY source
        HAVING sum(len({WORDS_SQL})) > 0
    ),
    with_p AS (
        SELECT *, n_tokens * 1.0 / sum(n_tokens) OVER () AS p
        FROM per_source
    ),
    shared AS (
        SELECT *, sqrt(p) / sum(sqrt(p)) OVER () AS w
        FROM with_p
    )
    SELECT source, n_docs, n_tokens,
           round(p, 6) AS nat_share,
           round(w, 6) AS temp_weight,
           round(w / p, 4) AS eff_epochs
    FROM shared
    """,
)
def corpus_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights per source (T=2): the
    multilingual/multi-domain re-balancing rule w_i = p_i^(1/T) /
    sum_j p_j^(1/T) that upsamples small sources without letting any
    source dominate — `eff_epochs` (= w_i / p_i) is how many passes
    over source i the sampled mixture implies, the number capacity
    planners check against the repetition budget.

    sqrt() is IEEE-correctly-rounded on both engines, so the weights
    are bit-identical; zero-token sources are dropped on both sides
    (their weight is the limit 0).

    Scale shape: ONE documents scan reduced to |sources| rows with
    map-side combine; all mixture math runs in unpartitioned windows
    over that tiny aggregate. At 100 TB this is one exchange of a
    handful of counter rows — the same shape a mixture re-weighting
    job needs before it writes the sampled output."""
    docs = tables(spark, sf_dir).documents
    per_source = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(words())).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    wall = Window.partitionBy(F.lit(1))
    p = F.col("n_tokens") / F.sum("n_tokens").over(wall)
    with_p = per_source.select("source", "n_docs", "n_tokens", p.alias("p"))
    w = F.sqrt(F.col("p")) / F.sum(F.sqrt(F.col("p"))).over(wall)
    return with_p.select(
        "source",
        "n_docs",
        "n_tokens",
        rnd(F.col("p"), 6).alias("nat_share"),
        rnd(w, 6).alias("temp_weight"),
        rnd(w / F.col("p"), 4).alias("eff_epochs"),
    )


_BPE_TOPN = 20


@query(
    "corpus_bpe_pair_stats",
    oracle=f"""
    WITH vocab AS (
        SELECT w, count(*) AS freq
        FROM (SELECT unnest({WORDS_SQL}) AS w FROM documents)
        GROUP BY w
        HAVING length(w) >= 2
    ),
    pairs AS (
        SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                     i -> substring(w, i, 2))) AS pair,
               freq
        FROM vocab
    )
    SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count
    FROM pairs
    GROUP BY pair
    ORDER BY pair_count DESC, pair
    LIMIT {_BPE_TOPN}
    """,
)
def corpus_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counting core of BPE tokenizer training: corpus-weighted
    frequencies of adjacent character pairs, i.e. the candidates for
    the FIRST merge (a full trainer repeats this count after each
    merge; one iteration is the engine-shaped primitive worth owning).

    Scale shape: the classic two-level reduction — the 100-TB corpus
    first collapses to its VOCABULARY (groupBy word with map-side
    combine; this is why real BPE trainers count words, not tokens),
    then pair generation and the pair aggregate run on the vocab-
    bounded table; top-k is TakeOrderedAndProject. Nothing downstream
    of the first exchange scales with corpus size."""
    docs = tables(spark, sf_dir).documents
    vocab = (
        docs.select(F.explode(words()).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.length("w") >= 2)
    )
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "freq",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(_BPE_TOPN)
    )


# --------------------------------------------------------------------------
# BPE apply/encode: tokenize the vocabulary with the learned merge table
# --------------------------------------------------------------------------


@query(
    "corpus_bpe_encode",
    oracle=f"""
    WITH bvocab AS (
        SELECT w, CAST(count(*) AS BIGINT) AS freq
        FROM (SELECT unnest({WORDS_SQL}) AS w FROM documents)
        GROUP BY w
    ),
    bpairs AS (
        SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                     i -> substring(w, i, 2))) AS pair,
               freq
        FROM bvocab WHERE length(w) >= 2
    ),
    rules_ranked AS (
        SELECT pair, row_number() OVER (
                   ORDER BY sum(freq) DESC, pair) AS rk
        FROM bpairs GROUP BY pair
        QUALIFY rk <= {_BPE_TOPN}
    ),
    rules AS (SELECT list(pair ORDER BY rk) AS rules FROM rules_ranked),
    encoded AS (
        SELECT w, freq,
               string_split(list_reduce(
                   list_prepend(
                       array_to_string(
                           list_transform(generate_series(1, length(w)),
                                          i -> substring(w, i, 1)), '|'),
                       rules.rules),
                   (acc, p) -> list_reduce(
                       string_split(acc, '|'),
                       (t, x) -> CASE
                           WHEN (t = p[1] OR right(t, 2) = '|' || p[1])
                                AND x = p[2]
                           THEN t || x
                           ELSE t || '|' || x
                       END)
               ), '|') AS toks
        FROM bvocab, rules
    ),
    tok_vocab AS (
        SELECT tok, row_number() OVER (ORDER BY tok) AS token_id
        FROM (SELECT DISTINCT unnest(toks) AS tok FROM encoded)
    ),
    ex AS (
        SELECT w, freq, unnest(toks) AS tok,
               unnest(range(1, 1 + len(toks))) AS pos
        FROM encoded
    )
    SELECT e.w, e.freq,
           CAST(count(*) AS BIGINT) AS n_tokens,
           array_to_string(list(e.tok ORDER BY e.pos), '|') AS tokens,
           array_to_string(
               list(CAST(v.token_id AS VARCHAR) ORDER BY e.pos), ','
           ) AS token_ids
    FROM ex e JOIN tok_vocab v USING (tok)
    GROUP BY e.w, e.freq
    """,
)
def corpus_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE APPLY: encode every vocabulary word into merge tokens + token
    ids using the merge table [[corpus_bpe_pair_stats]] learns (top-20
    character pairs by corpus-weighted frequency, rank order = merge
    priority) — the other half of the tokenizer: pair_stats trains,
    this encodes (VERDICT r5 item 5).

    Semantics (single-level BPE, deterministic): a word starts as its
    character sequence; merge rules apply in rank order, each merging
    adjacent SINGLE-char tokens (a,b) leftmost-first non-overlapping —
    "aaa" under rule "aa" gives [aa, a]; a char consumed by an earlier
    rule never feeds a later one (the "abc" + [ab, bc] → [ab, c] case).
    Token ids are the alphabetical rank over the final token
    vocabulary. Both engines run the IDENTICAL fold: Spark as nested
    higher-order F.aggregate (rules outer, tokens inner — pure JVM
    codegen, zero Python), DuckDB as nested list_reduce over a
    '|'-separated token string (list_reduce has no init accumulator, so
    the initial char-split string is PREPENDED to the rules list).

    Scale shape: the corpus collapses to its VOCABULARY first (the same
    two-level reduction as pair_stats — real tokenizers encode the
    vocab, then map words→tokens by broadcast join at stream time), the
    merge table arrives as a broadcast 1-row array (scalar-broadcast
    idiom), and the fold is a map-side expression over vocab rows.
    Token-id assignment joins the |tokens|-bounded vocabulary back as a
    broadcast. Nothing downstream of the first exchange scales with
    corpus size."""
    docs = tables(spark, sf_dir).documents
    vocab = (
        docs.select(F.explode(words()).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = (
        vocab.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> substring(w, i, 2))"
                )
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
    )
    rk = F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(F.desc("pair_count"), F.asc("pair"))
    )
    rules_row = (
        pairs.withColumn("rk", rk)
        .filter(F.col("rk") <= _BPE_TOPN)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rk", "pair"))),
                lambda s: s["pair"],
            ).alias("rules")
        )
    )
    chars = F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")

    def _apply_rule(ts, p):
        a, b = F.substring(p, 1, 1), F.substring(p, 2, 1)

        def _step(acc, x):
            # ANSI-safe last element: element_at(-1) on an empty array
            # raises under ANSI mode and `&` does not short-circuit, so
            # the empty case must be carved out by a conditional branch
            last = F.when(F.size(acc) > 0, F.element_at(acc, -1)).otherwise(
                F.lit("")
            )
            return F.when(
                (last == a) & (x == b),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(p)),
            ).otherwise(F.concat(acc, F.array(x)))

        return F.aggregate(ts, F.array().cast("array<string>"), _step)

    encoded = vocab.crossJoin(F.broadcast(rules_row)).select(
        "w",
        "freq",
        F.aggregate(F.col("rules"), chars, _apply_rule).alias("toks"),
    )
    tok_vocab = (
        encoded.select(F.explode("toks").alias("tok"))
        .distinct()
        .withColumn(
            "token_id",
            F.row_number().over(Window.partitionBy(F.lit(1)).orderBy("tok")),
        )
    )
    ex = encoded.select("w", "freq", F.posexplode("toks").alias("pos", "tok"))
    return (
        ex.join(F.broadcast(tok_vocab), "tok")
        .groupBy("w", "freq")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                "|",
            ).alias("tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "token_id"))
                    ),
                    lambda s: s["token_id"].cast("string"),
                ),
                ",",
            ).alias("token_ids"),
        )
    )


# --------------------------------------------------------------------------
# N-gram novelty: how much of each doc is unseen in earlier docs
# --------------------------------------------------------------------------


@query(
    "corpus_ngram_novelty",
    oracle=f"""
    WITH shs AS (
        SELECT doc_id, unnest(list_distinct({shingles_sql(WORDS_SQL)})) AS sh
        FROM documents
    ),
    first_seen AS (
        SELECT sh, min(doc_id) AS first_doc FROM shs GROUP BY sh
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS novelty
    FROM shs s JOIN first_seen f ON s.sh = f.sh
    GROUP BY s.doc_id
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty against the corpus ingestion order:
    the fraction of a doc's distinct 3-gram shingles whose FIRST
    occurrence (min doc_id) is this doc — the streaming-dedup signal
    ("how much new text does this doc add?") used to drop
    boilerplate-heavy crawls. Scale shape: explode distinct shingles
    once, min-aggregate per shingle (mergeable, one shuffle on the
    shingle hash), join back on the same key — the exchange is reused
    across both sides, and nothing ever pairs docs with docs. At
    100 TB, shingles would be hashed to int64 before the shuffle."""
    t = tables(spark, sf_dir)
    # tokenize once: inline shingles(words()) re-ran the split pipeline
    # per slice reference (7x per row) — round 11
    shs = t.documents.select("doc_id", words("text").alias("w")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles("w"))).alias("sh"),
    )
    first_seen = shs.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    return (
        shs.join(first_seen, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
            .cast("long")
            .alias("n_novel"),
            rnd(
                F.sum((F.col("first_doc") == F.col("doc_id")).cast("int"))
                / F.count(F.lit(1)),
                6,
            ).alias("novelty"),
        )
    )


# --------------------------------------------------------------------------
# T5-style deterministic span corruption (mask 2/16 of tokens)
# --------------------------------------------------------------------------

_MASK_SENTINEL = "<extra_id>"


@query(
    "corpus_span_mask_t5",
    oracle=f"""
    WITH w AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
    tok AS (
        SELECT doc_id, i, ws[i] AS tok,
               substring(md5(CAST(doc_id AS VARCHAR) || ':' ||
                             CAST(i AS VARCHAR) || ':' || ws[i]), 1, 1)
                   IN ('0', '1') AS masked
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i)
    ),
    spans AS (
        SELECT doc_id, i, tok, masked,
               CASE WHEN masked AND NOT coalesce(
                        lag(masked) OVER (PARTITION BY doc_id ORDER BY i),
                        FALSE)
                    THEN 1 ELSE 0 END AS span_start
        FROM tok
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
               AS n_masked,
           CAST(sum(span_start) AS BIGINT) AS n_spans,
           string_agg(CASE WHEN masked THEN '{_MASK_SENTINEL}' ELSE tok END,
                      ' ' ORDER BY i) AS masked_text
    FROM spans GROUP BY doc_id
    """,
)
def corpus_span_mask_t5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption for pretraining data prep: each token is
    masked by a deterministic content-addressed coin (md5 of
    doc:index:token, 2/16 ≈ 12.5% rate — reproducible across runs and
    engines, unlike rand()), adjacent masked tokens merge into spans,
    and the masked text plus token/span counts are emitted. Scale
    shape: tokenize + posexplode are per-row; the lag that detects span
    starts and the ordered re-assembly both run in ONE window/aggregate
    partitioned by doc_id (bounded partitions = document length). At
    100 TB this is the map-heavy shape that saturates CPUs without any
    cross-doc shuffle."""
    t = tables(spark, sf_dir)
    tok = t.documents.select(
        "doc_id", F.posexplode(words()).alias("i0", "tok")
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),
        "tok",
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    (F.col("i0") + 1).cast("string"),
                    F.col("tok"),
                )
            ),
            1,
            1,
        )
        .isin("0", "1")
        .alias("masked"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    spans = tok.withColumn(
        "span_start",
        (
            F.col("masked")
            & ~F.coalesce(F.lag("masked").over(w), F.lit(False))
        ).cast("int"),
    ).withColumn(
        "out_tok",
        F.when(F.col("masked"), F.lit(_MASK_SENTINEL)).otherwise(F.col("tok")),
    )
    return (
        spans.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("masked").cast("int")).cast("long").alias("n_masked"),
            F.sum("span_start").cast("long").alias("n_spans"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("i", "out_tok"))
                    ),
                    lambda s: s["out_tok"],
                ),
                " ",
            ).alias("masked_text"),
        )
    )


# --------------------------------------------------------------------------
# CCNet-style sentence-level dedup ratio
# --------------------------------------------------------------------------


@query(
    "corpus_line_dedup_ccnet",
    oracle="""
    WITH sent AS (
        SELECT doc_id, trim(s) AS sent
        FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[.!?]+')) AS s
            FROM documents
        ) WHERE trim(s) <> ''
    ),
    freq AS (
        SELECT md5(sent) AS h, CAST(count(*) AS BIGINT) AS f
        FROM sent GROUP BY 1
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_sentences,
           CAST(sum(CASE WHEN f.f > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dup_sentences,
           round(sum(CASE WHEN f.f > 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 6) AS dup_ratio
    FROM sent s JOIN freq f ON md5(s.sent) = f.h
    GROUP BY s.doc_id
    """,
)
def corpus_line_dedup_ccnet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style sentence-level dedup signal: split each document
    into sentences, hash-count every sentence corpus-wide, and report
    per-doc how many of its sentences also occur elsewhere (boilerplate
    ratio) — the pre-filter that strips nav bars and cookie banners
    before paragraph-level quality scoring. Scale shape: ONE mergeable
    aggregate on the sentence hash (never the sentence text at 100 TB —
    md5 here already), joined back on the same key; per-doc rollup
    partitions on doc_id. Identical shape to exact dedup, one level
    below the document."""
    t = tables(spark, sf_dir)
    sent = (
        t.documents.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.col("text")), r"[.!?]+")
            ).alias("s"),
        )
        .select("doc_id", F.trim(F.col("s")).alias("sent"))
        .filter(F.col("sent") != "")
        .select("doc_id", F.md5("sent").alias("h"))
    )
    freq = sent.groupBy("h").agg(F.count(F.lit(1)).alias("f"))
    dup = (F.col("f") > 1).cast("int")
    return (
        sent.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum(dup).cast("long").alias("n_dup_sentences"),
            rnd(F.sum(dup) / F.count(F.lit(1)), 6).alias("dup_ratio"),
        )
    )


# --------------------------------------------------------------------------
# Token-budget allocation across sources (largest-remainder method)
# --------------------------------------------------------------------------

_BUDGET_TOKENS = 100_000


@query(
    "corpus_budget_allocate_lrm",
    oracle=f"""
    WITH src AS (
        SELECT source,
               CAST(sum(len({WORDS_SQL})) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(tokens) AS total FROM src),
    quota AS (
        SELECT s.source, s.tokens,
               s.tokens * {_BUDGET_TOKENS}.0 / t.total AS exact_quota,
               CAST(floor(s.tokens * {_BUDGET_TOKENS}.0 / t.total) AS BIGINT)
                   AS floor_alloc,
               s.tokens * {_BUDGET_TOKENS}.0 / t.total
                   - floor(s.tokens * {_BUDGET_TOKENS}.0 / t.total)
                   AS remainder
        FROM src s CROSS JOIN tot t
    ),
    leftover AS (
        SELECT CAST({_BUDGET_TOKENS} - sum(floor_alloc) AS BIGINT) AS k
        FROM quota
    )
    SELECT q.source, q.tokens,
           round(q.exact_quota, 4) AS exact_quota,
           q.floor_alloc + CASE WHEN row_number() OVER (
               ORDER BY q.remainder DESC, q.source) <= l.k
               THEN 1 ELSE 0 END AS alloc_tokens
    FROM quota q CROSS JOIN leftover l
    """,
)
def corpus_budget_allocate_lrm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget allocator: split a fixed 100k-token training budget
    across sources proportionally to their token mass, with
    largest-remainder rounding so the allocations are integers that sum
    EXACTLY to the budget (floor everyone, hand the k leftover tokens
    to the k largest fractional remainders, source name tiebreak) —
    the arithmetic every data-mixture config ultimately needs. Scale
    shape: one per-source token aggregate (mergeable); the quota math
    and the ranking window run on the |sources| row table, so the
    global window is safe by construction."""
    t = tables(spark, sf_dir)
    src = t.documents.groupBy("source").agg(
        F.sum(F.size(words())).cast("long").alias("tokens")
    )
    tot = src.agg(F.sum("tokens").alias("total"))
    quota = src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        (F.col("tokens") * float(_BUDGET_TOKENS) / F.col("total")).alias(
            "exact_quota"
        ),
    ).select(
        "source",
        "tokens",
        "exact_quota",
        F.floor("exact_quota").cast("long").alias("floor_alloc"),
        (F.col("exact_quota") - F.floor("exact_quota")).alias("remainder"),
    )
    leftover = quota.agg(
        (F.lit(_BUDGET_TOKENS) - F.sum("floor_alloc"))
        .cast("long")
        .alias("k")
    )
    w = Window.orderBy(F.desc("remainder"), F.asc("source"))
    return (
        quota.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(leftover))
        .select(
            "source",
            "tokens",
            rnd("exact_quota", 4).alias("exact_quota"),
            (
                F.col("floor_alloc")
                + F.when(F.col("rn") <= F.col("k"), 1).otherwise(0)
            ).alias("alloc_tokens"),
        )
    )


# --------------------------------------------------------------------------
# SFT pair synthesis: word-prefix prompt, remainder as completion
# --------------------------------------------------------------------------

_SFT_PROMPT_WORDS = 8
_SFT_MIN_COMPLETION_WORDS = 16


@query(
    "corpus_sft_pair_synth",
    oracle=f"""
    WITH w AS (SELECT doc_id, source, {WORDS_SQL} AS ws FROM documents)
    SELECT doc_id, source,
           array_to_string(ws[1:{_SFT_PROMPT_WORDS}], ' ') AS prompt,
           array_to_string(ws[{_SFT_PROMPT_WORDS + 1}:len(ws)], ' ')
               AS completion,
           CAST({_SFT_PROMPT_WORDS} AS BIGINT) AS prompt_words,
           CAST(len(ws) - {_SFT_PROMPT_WORDS} AS BIGINT) AS completion_words
    FROM w
    WHERE len(ws) >= {_SFT_PROMPT_WORDS + _SFT_MIN_COMPLETION_WORDS}
    """,
)
def corpus_sft_pair_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-supervised SFT pair synthesis: the first 8 words become the
    prompt and the remainder the completion (prefix-completion
    pretraining pairs), dropping documents too short to yield a
    trainable completion — the cheapest way to mint
    instruction-shaped data from raw text. Single-pass tokenize +
    slice projection, no shuffle; at 100 TB this is a map-only scan
    whose output feeds corpus_token_pack."""
    t = tables(spark, sf_dir)
    # the min-length gate rides a generator (project_record idiom): a
    # plain filter(size(ws) >= k) is pushed below the projection and
    # re-inlines the tokenizer into the scan filter (2x/row) — round 11
    return (
        t.documents.select("doc_id", "source", words("text").alias("ws"))
        .select(
            "doc_id",
            "source",
            "ws",
            F.explode(
                F.array_compact(
                    F.array(
                        F.when(
                            F.size("ws")
                            >= _SFT_PROMPT_WORDS + _SFT_MIN_COMPLETION_WORDS,
                            F.lit(1),
                        )
                    )
                )
            ).alias("_keep"),
        )
        .select(
            "doc_id",
            "source",
            F.array_join(
                F.slice("ws", 1, _SFT_PROMPT_WORDS), " "
            ).alias("prompt"),
            F.array_join(
                F.slice(
                    "ws",
                    _SFT_PROMPT_WORDS + 1,
                    F.size("ws") - _SFT_PROMPT_WORDS,
                ),
                " ",
            ).alias("completion"),
            F.lit(_SFT_PROMPT_WORDS).cast("long").alias("prompt_words"),
            (F.size("ws") - _SFT_PROMPT_WORDS)
            .cast("long")
            .alias("completion_words"),
        )
    )


# --------------------------------------------------------------------------
# Heaps'-law vocabulary growth at document-count checkpoints
# --------------------------------------------------------------------------

_HEAPS_CHECKPOINTS = [50, 100, 200, 300, 400, 500, 1000, 2000, 5000]


@query(
    "corpus_vocab_growth_heaps",
    oracle=f"""
    WITH firsts AS (
        SELECT w, min(doc_id) AS first_doc
        FROM (
            SELECT doc_id, unnest(list_distinct({WORDS_SQL})) AS w
            FROM documents
        ) GROUP BY w
    ),
    toks AS (
        SELECT doc_id, len({WORDS_SQL}) AS n_toks FROM documents
    ),
    cps AS (
        SELECT unnest({_HEAPS_CHECKPOINTS}) AS cp
    )
    SELECT c.cp AS n_docs,
           CAST((SELECT count(*) FROM firsts f WHERE f.first_doc < c.cp)
                AS BIGINT) AS vocab,
           CAST((SELECT coalesce(sum(n_toks), 0) FROM toks t
                 WHERE t.doc_id < c.cp) AS BIGINT) AS n_tokens
    FROM cps c
    WHERE c.cp <= (SELECT count(*) FROM documents)
    """,
)
def corpus_vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct-word vocabulary size and
    token count after the first N documents (doc_id order), at fixed
    checkpoints — the curve whose log-log slope (beta ≈ 0.5) predicts
    how vocabulary scales to the full crawl. Key trick: a running
    distinct count distributes as `min(doc_id) per word` + one count
    per checkpoint — the cumulative-distinct window that would not —
    so the corpus is exploded ONCE, aggregated on the word hash, and
    the checkpoint counts run on |vocab| rows with a broadcast
    checkpoint spine. Token prefix sums come from one per-doc
    projection the same way."""
    t = tables(spark, sf_dir)
    # Checkpoint spine stays LAZY: instead of an eager .count() at
    # plan-build time (a full scan just to construct the DataFrame),
    # cross-join the one-row count aggregate and filter at execution.
    total = t.documents.agg(F.count(F.lit(1)).alias("total_docs"))
    cp_df = (
        spark.createDataFrame(
            [(c,) for c in _HEAPS_CHECKPOINTS], "n_docs long"
        )
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_docs") <= F.col("total_docs"))
        .select("n_docs")
    )
    firsts = (
        t.documents.select(
            "doc_id", F.explode(F.array_distinct(words())).alias("w")
        )
        .groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    vocab = (
        F.broadcast(cp_df)
        .join(firsts, F.col("first_doc") < F.col("n_docs"))
        .groupBy("n_docs")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    toks = t.documents.select("doc_id", F.size(words()).alias("n_toks"))
    tok_counts = (
        F.broadcast(cp_df)
        .join(toks, F.col("doc_id") < F.col("n_docs"))
        .groupBy("n_docs")
        .agg(F.sum("n_toks").cast("long").alias("n_tokens"))
    )
    # LEFT-join both (≤|checkpoints|-row) aggregates back onto the spine
    # and coalesce to 0, so a degenerate checkpoint (no word first seen
    # before it / no tokens before it) still emits a row — matching the
    # oracle's scalar-subquery + coalesce semantics on degenerate corpora.
    return (
        cp_df.join(vocab, "n_docs", "left")
        .join(tok_counts, "n_docs", "left")
        .select(
            "n_docs",
            F.coalesce("vocab", F.lit(0)).cast("long").alias("vocab"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Corpus bigram entropy rate H(w2 | w1)
# --------------------------------------------------------------------------


@query(
    "corpus_bigram_entropy_rate",
    oracle=f"""
    WITH w AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
    bi AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
    ),
    pair AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY 1, 2),
    uni AS (SELECT w1, sum(n) AS n1 FROM pair GROUP BY 1),
    tot AS (SELECT sum(n) AS nt FROM pair)
    SELECT CAST(tot.nt AS BIGINT) AS n_bigrams,
           CAST((SELECT count(*) FROM pair) AS BIGINT) AS n_distinct_bigrams,
           round(-sum((p.n * 1.0 / tot.nt) * ln(p.n * 1.0 / u.n1)), 4)
               AS entropy_rate_nats,
           round(-sum((p.n * 1.0 / tot.nt) * ln(p.n * 1.0 / tot.nt)), 4)
               AS joint_entropy_nats
    FROM pair p JOIN uni u USING (w1) CROSS JOIN tot
    GROUP BY tot.nt
    """,
)
def corpus_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level conditional bigram entropy H(w2|w1) in nats (the
    entropy rate of a first-order word model) plus the joint bigram
    entropy — the information-theoretic temperature of a corpus:
    crawled spam scores far lower than natural prose, and the delta
    to unigram entropy measures how much structure a 1-gram model
    already captures. Scale shape: one bigram explode + (w1, w2)
    aggregate; the w1 marginal derives from the pair table (exchange
    reuse on w1); the entropy reduction is a single scalar aggregate.
    At 100 TB the bigrams would be hashed to int64 pre-shuffle."""
    t = tables(spark, sf_dir)
    ws = t.documents.select("doc_id", words().alias("ws"))
    # Guard: Spark's sequence(1, size-1) counts DOWN for size < 2
    # (sequence(1, 0) = [1, 0], unlike DuckDB's empty generate_series),
    # so a 0/1-word doc would index ws out of bounds and, under the
    # default ANSI mode, raise INVALID_ARRAY_INDEX and kill the job.
    # Docs with < 2 words contribute no bigrams in the oracle either,
    # so pre-filtering them is the exact semantic match (see shingles()).
    bi = ws.filter(F.size("ws") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1), "
                "i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2").filter(F.col("w1").isNotNull())
    pair = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    uni = pair.groupBy("w1").agg(F.sum("n").alias("n1"))
    tot = pair.agg(F.sum("n").alias("nt"))
    n_distinct = pair.agg(F.count(F.lit(1)).alias("nd"))
    joined = pair.join(uni, "w1").crossJoin(F.broadcast(tot))
    p_joint = F.col("n") / F.col("nt")
    return (
        joined.groupBy("nt")
        .agg(
            rnd(
                -F.sum(p_joint * F.log(F.col("n") / F.col("n1"))), 4
            ).alias("entropy_rate_nats"),
            rnd(
                -F.sum(p_joint * F.log(p_joint)), 4
            ).alias("joint_entropy_nats"),
        )
        .crossJoin(F.broadcast(n_distinct))
        .select(
            F.col("nt").cast("long").alias("n_bigrams"),
            F.col("nd").cast("long").alias("n_distinct_bigrams"),
            "entropy_rate_nats",
            "joint_entropy_nats",
        )
    )


# --------------------------------------------------------------------------
# Source-mix KL divergence against the target mixture spec
# --------------------------------------------------------------------------


@query(
    "corpus_mix_kl_to_target",
    oracle=f"""
    WITH src AS (
        SELECT source, CAST(sum(len({WORDS_SQL})) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(tokens) AS nt, count(*) AS k FROM src)
    SELECT s.source, s.tokens,
           round(s.tokens * 1.0 / t.nt, 6) AS actual_share,
           round(1.0 / t.k, 6) AS target_share,
           round((s.tokens * 1.0 / t.nt) / (1.0 / t.k), 4) AS weight_ratio,
           round((s.tokens * 1.0 / t.nt)
                 * ln((s.tokens * 1.0 / t.nt) / (1.0 / t.k)), 6)
               AS kl_term
    FROM src s CROSS JOIN tot t
    """,
)
def corpus_mix_kl_to_target(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-spec compliance: each source's actual token share vs the
    target mixture (uniform here — swap in any spec table), the
    over/under-sampling ratio a rebalancer must apply, and the
    per-source KL term whose sum is the total divergence from spec —
    the number a data-mixture dashboard alarms on. Scale shape: one
    per-source token aggregate plus a one-row broadcast total; pure
    algebra on |sources| rows after the single corpus pass."""
    t = tables(spark, sf_dir)
    src = t.documents.groupBy("source").agg(
        F.sum(F.size(words())).cast("long").alias("tokens")
    )
    tot = src.agg(
        F.sum("tokens").alias("nt"), F.count(F.lit(1)).alias("k")
    )
    share = F.col("tokens") / F.col("nt")
    target = 1.0 / F.col("k")
    return src.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        rnd(share, 6).alias("actual_share"),
        rnd(target, 6).alias("target_share"),
        rnd(share / target, 4).alias("weight_ratio"),
        rnd(share * F.log(share / target), 6).alias("kl_term"),
    )


# --------------------------------------------------------------------------
# Dedup impact report: what exact dedup would remove, per source
# --------------------------------------------------------------------------


@query(
    "corpus_dedup_impact_report",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, md5(text) AS h, len({WORDS_SQL}) AS toks,
               octet_length(encode(text)) AS bytes,
               row_number() OVER (
                   PARTITION BY md5(text) ORDER BY doc_id
               ) AS copy_rank
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS docs_in,
           CAST(count(*) FILTER (WHERE copy_rank > 1) AS BIGINT)
               AS docs_removed,
           CAST(sum(toks) AS BIGINT) AS tokens_in,
           CAST(coalesce(sum(toks) FILTER (WHERE copy_rank > 1), 0)
               AS BIGINT) AS tokens_removed,
           CAST(coalesce(sum(bytes) FILTER (WHERE copy_rank > 1), 0)
               AS BIGINT) AS bytes_removed,
           round(count(*) FILTER (WHERE copy_rank > 1) * 1.0
                 / count(*), 6) AS doc_dup_rate
    FROM ranked GROUP BY source
    """,
)
def corpus_dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The report every dedup run ships before anything is deleted:
    per source, how many docs/tokens/bytes exact content dedup would
    remove (survivor = smallest doc_id per content hash, matching
    dedup_exact's canonical rule) and the duplication rate — the
    numbers that decide whether a source's crawl is worth re-fetching
    and that audit a vendor's 'deduplicated' claim. Scale shape: one
    hash + rank over the content-hash partition (shuffle on md5, never
    on text), then a per-source aggregate; at 100 TB this is exactly
    dedup_exact's plan plus a rollup, and the report is |sources| rows."""
    t = tables(spark, sf_dir)
    rk = F.row_number().over(
        Window.partitionBy("h").orderBy("doc_id")
    )
    ranked = t.documents.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(words()).alias("toks"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("bytes"),
    ).withColumn("copy_rank", rk)
    dup = F.col("copy_rank") > 1
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.count_if(dup).alias("docs_removed"),
        F.sum("toks").alias("tokens_in"),
        F.coalesce(F.sum(F.when(dup, F.col("toks"))), F.lit(0)).alias(
            "tokens_removed"
        ),
        F.coalesce(F.sum(F.when(dup, F.col("bytes"))), F.lit(0)).alias(
            "bytes_removed"
        ),
        rnd(F.count_if(dup) / F.count(F.lit(1)), 6).alias("doc_dup_rate"),
    )


# --------------------------------------------------------------------------
# Kneser-Ney smoothed bigram probabilities (the serious LM baseline)
# --------------------------------------------------------------------------

_KN_D = 0.75  # absolute discount
_KN_TOPK = 20


@query(
    "corpus_bigram_kneser_ney",
    oracle=f"""
    WITH w AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
    bi AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
    ),
    pair AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM bi GROUP BY 1, 2
    ),
    ctx AS (
        SELECT w1, sum(n) AS c1, count(*) AS fanout FROM pair GROUP BY w1
    ),
    cont AS (SELECT w2, count(*) AS n_hist FROM pair GROUP BY w2),
    types AS (SELECT count(*) AS n_types FROM pair),
    scored AS (
        SELECT p.w1, p.w2, p.n,
               (greatest(p.n - {_KN_D}, 0) / ctx.c1)
               + ({_KN_D} * ctx.fanout / ctx.c1)
                 * (cont.n_hist * 1.0 / types.n_types) AS p_kn,
               p.n * 1.0 / ctx.c1 AS p_mle
        FROM pair p
        JOIN ctx ON ctx.w1 = p.w1
        JOIN cont ON cont.w2 = p.w2
        CROSS JOIN types
    )
    SELECT w1, w2, n,
           round(p_kn, 6) AS p_kn,
           round(p_mle, 6) AS p_mle,
           row_number() OVER (ORDER BY n DESC, w1, w2) AS rn
    FROM scored
    QUALIFY rn <= {_KN_TOPK}
    """,
)
def corpus_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995,
    the pre-neural LM state of the art and still the right statistical
    baseline a data pipeline scores corpora against): P(w2|w1) =
    max(c(w1,w2) - d, 0)/c(w1) + lambda(w1) * Pcont(w2), with the
    absolute discount d = 0.75, lambda(w1) = d * |{{w: c(w1,w) > 0}}| /
    c(w1), and the continuation probability Pcont(w2) = |{{w1: c(w1,w2)
    > 0}}| / |bigram types| — the famous "San Francisco" fix where a
    word's probability after a novel context reflects how many DISTINCT
    contexts it follows, not its raw frequency. Emitted next to the MLE
    estimate for the top-20 bigrams so the discount's redistribution is
    directly visible; corpus_lm_score's add-one model is the naive
    rival this replaces.

    Scale shape: one bigram explode + (w1, w2) hash aggregate is the
    only corpus-sized shuffle; the context (c1, fanout) and
    continuation (n_hist) tables both DERIVE from the pair table by
    one further aggregate each (vocabulary-bounded), and the type
    count is a one-row broadcast. Joins are pair-to-marginal on their
    own keys. The top-k single-partition window runs on 20-ish
    surviving rows after a WindowGroupLimit prune."""
    t = tables(spark, sf_dir)
    ws = t.documents.select("doc_id", words().alias("ws"))
    bi = ws.filter(F.size("ws") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(ws) - 1),"
                " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    pair = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    ctx = pair.groupBy("w1").agg(
        F.sum("n").alias("c1"), F.count(F.lit(1)).alias("fanout")
    )
    cont = pair.groupBy("w2").agg(F.count(F.lit(1)).alias("n_hist"))
    types = pair.agg(F.count(F.lit(1)).alias("n_types"))
    p_kn = (
        F.greatest(F.col("n") - _KN_D, F.lit(0.0)) / F.col("c1")
        + (_KN_D * F.col("fanout") / F.col("c1"))
        * (F.col("n_hist") / F.col("n_types"))
    )
    scored = (
        pair.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n"),
            p_kn.alias("p_kn_raw"),
            (F.col("n") / F.col("c1")).alias("p_mle_raw"),
        )
    )
    rn = F.row_number().over(
        Window.orderBy(F.desc("n"), F.asc("w1"), F.asc("w2"))
    )
    return (
        scored.withColumn("rn", rn)
        .filter(F.col("rn") <= _KN_TOPK)
        .select(
            "w1",
            "w2",
            "n",
            rnd("p_kn_raw", 6).alias("p_kn"),
            rnd("p_mle_raw", 6).alias("p_mle"),
            "rn",
        )
    )


# --------------------------------------------------------------------------
# SFT pair lint: data-quality gate over the synthesized training pairs
# --------------------------------------------------------------------------

_SFT_LINT_MIN_COMPLETION = 16  # words a useful completion needs


def _sft_lint_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    return f"""
    WITH pairs AS ({QUERIES['corpus_sft_pair_synth'].oracle}),
    dup AS (
        SELECT source, prompt, count(*) AS c
        FROM pairs GROUP BY source, prompt
    ),
    flagged AS (
        SELECT p.source,
               CASE WHEN p.completion_words < {_SFT_LINT_MIN_COMPLETION}
                    THEN 1 ELSE 0 END AS short_c,
               CASE WHEN strpos(p.completion, p.prompt) > 0
                    THEN 1 ELSE 0 END AS leak,
               CASE WHEN d.c > 1 THEN 1 ELSE 0 END AS dup_p
        FROM pairs p
        JOIN dup d ON d.source = p.source AND d.prompt = p.prompt
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(short_c) AS BIGINT) AS n_short_completion,
           CAST(sum(leak) AS BIGINT) AS n_prompt_leak,
           CAST(sum(dup_p) AS BIGINT) AS n_dup_prompt,
           round(avg(CASE WHEN short_c + leak + dup_p = 0
                          THEN 1.0 ELSE 0.0 END), 6) AS clean_rate
    FROM flagged
    GROUP BY source
    """


@query("corpus_sft_lint", oracle=_sft_lint_oracle())
def corpus_sft_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pair lint over the registered SFT synthesis — the
    data-quality gate every instruction-tuning pipeline runs before a
    single gradient step: per source, how many pairs have a completion
    too short to teach anything (< 16 words), how many leak the full
    prompt inside the completion (the model learns to parrot), and how
    many share a duplicated prompt (boilerplate prefixes that
    overweight one instruction — the SFT analog of
    corpus_line_dedup_ccnet's repeated lines). clean_rate is the
    fraction violating NOTHING. Composed on corpus_sft_pair_synth's
    registered oracle and DataFrame, so the lint can never drift from
    the pairs it audits (the eval-twin discipline).

    Scale shape: one pass over the synthesized pairs plus a
    (source, prompt) aggregate for the dup check joined back on its
    own key — both shuffles keyed identically, output one row per
    source."""
    from awsbeats_spark.registry import QUERIES

    pairs = QUERIES["corpus_sft_pair_synth"].fn(spark, sf_dir)
    dup = pairs.groupBy("source", "prompt").agg(
        F.count(F.lit(1)).alias("c")
    )
    flagged = pairs.join(dup, ["source", "prompt"]).select(
        "source",
        (F.col("completion_words") < _SFT_LINT_MIN_COMPLETION)
        .cast("int")
        .alias("short_c"),
        (F.instr("completion", F.col("prompt")) > 0)  # type: ignore[arg-type]
        .cast("int")
        .alias("leak"),
        (F.col("c") > 1).cast("int").alias("dup_p"),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("short_c").cast("long").alias("n_short_completion"),
        F.sum("leak").cast("long").alias("n_prompt_leak"),
        F.sum("dup_p").cast("long").alias("n_dup_prompt"),
        rnd(
            F.avg(
                F.when(
                    F.col("short_c") + F.col("leak") + F.col("dup_p") == 0,
                    1.0,
                ).otherwise(0.0)
            ),
            6,
        ).alias("clean_rate"),
    )


# --------------------------------------------------------------------------
# Tokenizer-efficiency audit: tokens-per-character by language and source
# --------------------------------------------------------------------------


@query(
    "corpus_token_efficiency_by_lang",
    oracle=f"""
    WITH w AS (
        SELECT lang, source,
               len({WORDS_SQL}) AS n_tokens,
               length(text) AS n_chars
        FROM documents WHERE length(text) > 0
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(sum(n_tokens) * 1.0 / sum(n_chars), 6)
               AS tokens_per_char,
           round(sum(n_chars) * 1.0 / sum(n_tokens), 4)
               AS chars_per_token
    FROM w
    GROUP BY lang, source
    """,
)
def corpus_token_efficiency_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer-efficiency audit: tokens-per-character (and its
    reciprocal) per (language, source) — the number every multilingual
    training-budget discussion turns on, because a tokenizer that
    spends 3x the tokens per character on one language silently
    triples that language's compute cost and shrinks its effective
    context window ("token inflation"). Run before corpus_source_mix /
    corpus_budget_allocate_lrm so budget shares are set in TOKENS, not
    documents; a drifting ratio per source also flags encoding
    corruption (mojibake inflates chars, not tokens).

    Scale shape: a map-side tokenize + length projection folded by one
    (lang, source) hash aggregate — four counters per group, no joins,
    output bounded by the language x source grid."""
    t = tables(spark, sf_dir)
    w = t.documents.filter(F.length("text") > 0).select(
        "lang",
        "source",
        F.size(words()).alias("n_tokens"),
        F.length("text").alias("n_chars"),
    )
    return w.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        rnd(F.sum("n_tokens") / F.sum("n_chars"), 6).alias(
            "tokens_per_char"
        ),
        rnd(F.sum("n_chars") / F.sum("n_tokens"), 4).alias(
            "chars_per_token"
        ),
    )


# --------------------------------------------------------------------------
# MSTTR lexical diversity: mean segmental type-token ratio per source
# --------------------------------------------------------------------------

_MSTTR_SEG = 50


@query(
    "corpus_msttr_diversity",
    oracle=f"""
    WITH w AS (
        SELECT source, doc_id, {WORDS_SQL} AS ws FROM documents
    ),
    tok AS (
        SELECT source, doc_id, u.j, ws[u.j] AS tok
        FROM w, unnest(generate_series(1, len(ws))) AS u(j)
    ),
    pos AS (
        SELECT source, tok,
               (row_number() OVER (PARTITION BY source
                                   ORDER BY doc_id, j) - 1)
                   // {_MSTTR_SEG} AS seg
        FROM tok
    ),
    seg_tf AS (
        SELECT source, seg, tok, count(*) AS c
        FROM pos GROUP BY 1, 2, 3
    ),
    seg_stats AS (
        SELECT source, seg, count(*) AS vocab, sum(c) AS n
        FROM seg_tf GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_segments,
           round(avg(vocab * 1.0 / {_MSTTR_SEG}), 6) AS msttr
    FROM seg_stats WHERE n = {_MSTTR_SEG}
    GROUP BY source
    """,
)
def corpus_msttr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Segmental Type-Token Ratio (MSTTR-50) per source: the
    token stream (document order, then token order — deterministic) is
    chopped into 50-token segments, each complete segment contributes
    its type count / 50, and the mean is the diversity score. Unlike
    the raw TTR (which shrinks mechanically as a corpus grows), MSTTR
    is length-invariant, so sources of wildly different sizes compare
    honestly — the lexical-diversity column for the corpus mix report.

    Scale shape: the positional explode is per-row; the only big sort
    is the per-source position window (rank within source), which at
    cluster scale would be replaced by per-document segment IDs (doc
    boundaries almost never straddle segments at 50 tokens) — the
    cross-doc stitching here keeps the textbook definition exact. Two
    stacked hash aggregates finish on segment-grain rows."""
    t = tables(spark, sf_dir)
    tok = t.documents.select(
        "source", "doc_id", F.posexplode(words()).alias("j", "tok")
    )
    wpos = Window.partitionBy("source").orderBy("doc_id", "j")
    pos = tok.select(
        "source",
        "tok",
        ((F.row_number().over(wpos) - 1) / _MSTTR_SEG)
        .cast("long")
        .alias("seg"),
    )
    seg_stats = (
        pos.groupBy("source", "seg", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source", "seg")
        .agg(F.count(F.lit(1)).alias("vocab"), F.sum("c").alias("n"))
    )
    return (
        seg_stats.filter(F.col("n") == _MSTTR_SEG)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            rnd(F.avg(F.col("vocab") / float(_MSTTR_SEG)), 6).alias("msttr"),
        )
    )


# --------------------------------------------------------------------------
# OOV-rate audit against the global top-K vocabulary
# --------------------------------------------------------------------------

_OOV_VOCAB_K = 2000


@query(
    "corpus_oov_rate_topk_vocab",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({WORDS_SQL}) AS tok FROM documents
    ),
    gtf AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS rn
            FROM gtf
        ) WHERE rn <= {_OOV_VOCAB_K}
    ),
    stf AS (
        SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT s.source,
           CAST(sum(s.c) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.tok IS NULL THEN s.c ELSE 0 END)
                AS BIGINT) AS n_oov,
           round(sum(CASE WHEN v.tok IS NULL THEN s.c ELSE 0 END) * 1.0
                 / sum(s.c), 6) AS oov_rate
    FROM stf s LEFT JOIN vocab v ON s.tok = v.tok
    GROUP BY s.source
    """,
)
def corpus_oov_rate_topk_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the global top-2000
    token vocabulary (ties at the cutoff break on the token string, so
    the vocabulary is a deterministic set). The tokenizer-coverage
    audit run before freezing a word-level vocab: a source whose OOV
    mass is high will fragment into UNK (or into byte-fallback pieces)
    and train poorly — and a *drifting* OOV rate per ingestion batch is
    an early encoding-corruption alarm, the token-level cousin of
    [[corpus_token_efficiency_by_lang]].

    Scale shape: one tokenize-explode feeding two hash aggregates
    (global term counts, per-source term counts — both partial
    map-side); the vocabulary is a bounded top-K TakeOrdered that
    broadcasts to the per-source join. Nothing wider than term-grain
    ever shuffles."""
    t = tables(spark, sf_dir)
    tok = t.documents.select("source", F.explode(words()).alias("tok"))
    gtf = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    vocab = (
        gtf.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") <= _OOV_VOCAB_K)
        .select(F.col("tok").alias("vtok"))
    )
    stf = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    joined = stf.join(
        F.broadcast(vocab), stf["tok"] == vocab["vtok"], "left"
    )
    oov_c = F.when(F.col("vtok").isNull(), F.col("c")).otherwise(F.lit(0))
    return joined.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum(oov_c).cast("long").alias("n_oov"),
        rnd(F.sum(oov_c) / F.sum("c"), 6).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# Train/val/test leakage audit: exact content crossing the split boundary
# --------------------------------------------------------------------------


_LEAK_FP_SQL = (
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
)


@query(
    "corpus_split_leakage_audit",
    oracle=f"""
    WITH tagged AS (
        SELECT source,
               CASE WHEN {_bucket_sql()} BETWEEN '0' AND 'b' THEN 'train'
                    WHEN {_bucket_sql()} BETWEEN 'c' AND 'd' THEN 'val'
                    ELSE 'test' END AS split,
               {_LEAK_FP_SQL} AS fp
        FROM documents
    ),
    train_fps AS (SELECT DISTINCT fp FROM tagged WHERE split = 'train'),
    held AS (
        SELECT t.split, t.source, t.fp,
               CASE WHEN tf.fp IS NOT NULL THEN 1 ELSE 0 END AS leaked
        FROM tagged t LEFT JOIN train_fps tf ON tf.fp = t.fp
        WHERE t.split <> 'train'
    )
    SELECT split, source,
           count(*) AS n_docs,
           CAST(sum(leaked) AS BIGINT) AS n_leaked,
           round(sum(leaked) / count(*), 6) AS leak_rate
    FROM held GROUP BY split, source
    """,
)
def corpus_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit — the check every training
    pipeline must run AFTER splitting and BEFORE training: a val/test
    document whose normalized content (lowercase, whitespace-collapsed,
    md5-fingerprinted) also appears in train is leaked, and every
    eval number computed on it is fiction. Reuses the EXACT split rule
    of [[corpus_stratified_split]] (md5(doc_id) sixteenths: 12 train /
    2 val / 2 test) so the audit can never drift from the split it
    audits, and reports per (split, source): held-out count, leaked
    count, leak rate. [[corpus_decontaminate]] removes eval shingles
    from train; this op measures the opposite direction — exact
    held-out content that survived into train via duplicate documents
    landing in different split buckets (dedup-before-split is the fix;
    this is the regression gate proving it happened).

    Scale shape: fingerprinting is map-side; the audit is ONE
    semi-join-shaped left join on the fingerprint hash (at 100 TB:
    hash-partition both sides by fp — the train fingerprint set is a
    one-column relation, a fraction of corpus bytes) followed by a
    (split, source)-grain aggregate. No windows, no all-pairs."""
    t = tables(spark, sf_dir)
    # bucket digest once per row: the CASE's range tests re-ran the
    # doc_id md5 up to 4x per row when inlined — round 11
    b = F.col("b")
    split = (
        F.when(b.between("0", "b"), F.lit("train"))
        .when(b.between("c", "d"), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    tagged = t.documents.select(
        "source", _bucket_col().alias("b"), fp.alias("fp")
    ).select("source", split.alias("split"), "fp")
    train_fps = (
        tagged.filter(F.col("split") == "train").select("fp").distinct()
    )
    held = tagged.filter(F.col("split") != "train").join(
        train_fps.withColumn("leaked", F.lit(1)), "fp", "left"
    )
    return held.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(F.col("leaked"), F.lit(0)))
        .cast("long")
        .alias("n_leaked"),
        rnd(
            F.sum(F.coalesce(F.col("leaked"), F.lit(0)))
            / F.count(F.lit(1)),
            6,
        ).alias("leak_rate"),
    )


# --------------------------------------------------------------------------
# Overlapping sliding-window chunking (RAG-style, stride < size)
# --------------------------------------------------------------------------

_OCHUNK_SIZE = 50
_OCHUNK_STRIDE = 35


@query(
    "corpus_chunk_overlap_windows",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {WORDS_SQL} AS ws, len({WORDS_SQL}) AS n
        FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               CAST(t.i AS INT) AS chunk_idx,
               list_slice(ws, t.i * {_OCHUNK_STRIDE} + 1,
                          least(t.i * {_OCHUNK_STRIDE} + {_OCHUNK_SIZE}, n))
                   AS cw
        FROM w,
             unnest(generate_series(0, CAST(floor((n - 1) / {_OCHUNK_STRIDE})
                                        AS BIGINT))) AS t(i)
        WHERE n >= 1
    )
    SELECT doc_id, chunk_idx,
           CAST(len(cw) AS BIGINT) AS n_words,
           md5(array_to_string(cw, ' ')) AS chunk_fp
    FROM chunks
    """,
)
def corpus_chunk_overlap_windows(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Overlapping sliding-window chunking — the RAG/retrieval chunker:
    windows of {_OCHUNK_SIZE} words advancing by {_OCHUNK_STRIDE}
    (30% overlap), so content near a boundary appears in two chunks
    and no retrieval query can fall into a crack.
    [[corpus_doc_chunk]] is the disjoint variant for training packing;
    overlap is the retrieval-side contract. Each chunk emits its word
    count and an md5 fingerprint of its text — the fingerprint (not
    the text) is what downstream dedup/indexing joins on, and it makes
    every chunk's CONTENT hash-checked against the oracle, not just
    the counts.

    Scale shape: pure map-side — one tokenize, one bounded explode
    (ceil(n/stride) rows per doc), no shuffle; at 100 TB chunking
    streams through mapPartitions-equivalent projections and the
    output is ~n/stride of the corpus rows."""
    t = tables(spark, sf_dir)
    w = t.documents.select(
        "doc_id", words().alias("ws")
    ).withColumn("n", F.size("ws")).filter(F.col("n") >= 1)
    chunks = w.select(
        "doc_id",
        "n",
        "ws",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.col("n") - 1) / _OCHUNK_STRIDE).cast("int"),
            )
        ).alias("chunk_idx"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.slice(
            "ws",
            F.col("chunk_idx") * _OCHUNK_STRIDE + 1,
            F.least(
                F.lit(_OCHUNK_SIZE),
                F.col("n") - F.col("chunk_idx") * _OCHUNK_STRIDE,
            ),
        ).alias("cw"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.size("cw").cast("long").alias("n_words"),
        F.md5(F.array_join("cw", " ")).alias("chunk_fp"),
    )


corpus_chunk_overlap_windows.__doc__ = (
    corpus_chunk_overlap_windows.__doc__
    .replace("{_OCHUNK_SIZE}", str(_OCHUNK_SIZE))
    .replace("{_OCHUNK_STRIDE}", str(_OCHUNK_STRIDE))
)


# --------------------------------------------------------------------------
# Length-bucketed batching efficiency audit (padding waste)
# --------------------------------------------------------------------------

_LENBUCKET_EDGE = 64  # tokens per bucket edge


@query(
    "corpus_length_bucket_batching",
    oracle=f"""
    WITH lens AS (
        SELECT doc_id, len({WORDS_SQL}) AS n_tokens FROM documents
        WHERE len({WORDS_SQL}) >= 1
    ),
    gmax AS (SELECT max(n_tokens) AS global_max FROM lens),
    b AS (
        SELECT CAST(n_tokens // {_LENBUCKET_EDGE} AS BIGINT) AS bucket,
               count(*) AS n_docs,
               sum(n_tokens) AS sum_tokens,
               max(n_tokens) AS max_tokens
        FROM lens GROUP BY 1
    )
    SELECT b.bucket, CAST(b.n_docs AS BIGINT) AS n_docs,
           CAST(b.max_tokens AS BIGINT) AS max_tokens,
           round(1.0 - b.sum_tokens
                 / CAST(b.n_docs * b.max_tokens AS DOUBLE), 6)
               AS pad_waste_bucketed,
           round(1.0 - b.sum_tokens
                 / CAST(b.n_docs * g.global_max AS DOUBLE), 6)
               AS pad_waste_global
    FROM b, gmax g
    """,
)
def corpus_length_bucket_batching(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-bucketed batching audit — the padding-efficiency number
    that decides a training run's real throughput: documents batch by
    length bucket ({edge}-token edges), and every bucket reports the
    padding waste under bucketed batching (pad to the bucket's own
    max) next to the waste the SAME docs would suffer padded to the
    global max — the measured gain of dynamic batching. Padding waste
    is 1 - sum(len) / (n * pad_len): real tokens over allocated slots.
    [[corpus_token_pack]] eliminates padding by concatenation
    (pretraining); bucketing is the regime for SFT/inference where
    documents must stay intact, and this op is its design audit
    ([[eval_chunk_overlap_vs_disjoint]] discipline: the configuration
    choice ships with its measured consequence).

    Scale shape: one tokenize + one bucket-grain aggregate (map-side
    partial), one broadcast one-row global max — the audit costs one
    scan regardless of corpus size."""
    t = tables(spark, sf_dir)
    lens = t.documents.select(
        F.size(words()).alias("n_tokens")
    ).filter(F.col("n_tokens") >= 1)
    glob = lens.agg(F.max("n_tokens").alias("global_max"))
    b = lens.groupBy(
        F.floor(F.col("n_tokens") / _LENBUCKET_EDGE)
        .cast("long")
        .alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
    )
    return b.crossJoin(F.broadcast(glob)).select(
        "bucket",
        "n_docs",
        "max_tokens",
        rnd(
            1.0
            - F.col("sum_tokens")
            / (F.col("n_docs") * F.col("max_tokens")).cast("double"),
            6,
        ).alias("pad_waste_bucketed"),
        rnd(
            1.0
            - F.col("sum_tokens")
            / (F.col("n_docs") * F.col("global_max")).cast("double"),
            6,
        ).alias("pad_waste_global"),
    )


corpus_length_bucket_batching.__doc__ = (
    corpus_length_bucket_batching.__doc__.replace(
        "{edge}", str(_LENBUCKET_EDGE)
    )
)


# --------------------------------------------------------------------------
# Packing efficiency audit of the registered token packer
# --------------------------------------------------------------------------


def _pack_eff_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    pack = QUERIES["corpus_token_pack"].oracle
    return f"""
    WITH packed AS ({pack}),
    per_pack AS (
        SELECT source, pack_id, sum(n_tokens) AS pack_tokens
        FROM packed GROUP BY source, pack_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_packs,
           round(avg(pack_tokens / {_PACK_BUDGET}.0), 6) AS mean_fill,
           round(avg(greatest(pack_tokens - {_PACK_BUDGET}, 0)), 4)
               AS mean_overflow_tokens,
           CAST(max(greatest(pack_tokens - {_PACK_BUDGET}, 0)) AS BIGINT)
               AS max_overflow_tokens
    FROM per_pack GROUP BY source
    """


@query(
    "eval_token_pack_efficiency",
    oracle=_pack_eff_oracle(),
    tags=("corpus", "eval"),
)
def eval_token_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured packing efficiency of [[corpus_token_pack]] — the
    design-audit twin for the offset-based packer: per source, the
    mean fill ratio against the {budget}-token budget and the mean /
    max overflow (offset packing lets the last document of a pack
    spill past the budget by construction; this op MEASURES how much
    that costs on the real corpus instead of asserting 'at most one
    document'). A mean fill near 1.0 with small overflow vindicates
    the single-window-cumsum design over sequential first-fit; a fat
    overflow tail would argue for the chunker upstream. Composes the
    registered packer's own oracle — zero drift
    ([[eval_chunk_overlap_vs_disjoint]] discipline).

    Scale shape: the packer's one cumsum window, then a (source,
    pack) fold and a source-grain reshape — same single shuffle as
    the op under audit."""
    from awsbeats_spark.registry import QUERIES

    packed = QUERIES["corpus_token_pack"].fn(spark, sf_dir)
    per_pack = packed.groupBy("source", "pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens")
    )
    over = F.greatest(
        F.col("pack_tokens") - _PACK_BUDGET, F.lit(0)
    )
    return per_pack.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_packs"),
        rnd(F.avg(F.col("pack_tokens") / float(_PACK_BUDGET)), 6).alias(
            "mean_fill"
        ),
        rnd(F.avg(over), 4).alias("mean_overflow_tokens"),
        F.max(over).cast("long").alias("max_overflow_tokens"),
    )


eval_token_pack_efficiency.__doc__ = (
    eval_token_pack_efficiency.__doc__.replace(
        "{budget}", str(_PACK_BUDGET)
    )
)



# --------------------------------------------------------------------------
# Prefix boilerplate mining (templated-document detection)
# --------------------------------------------------------------------------

_PREFIX_WORDS = 5
_PREFIX_TOP_K = 10


@query(
    "corpus_prefix_boilerplate_topk",
    oracle=f"""
    WITH pfx AS (
        SELECT doc_id,
               array_to_string(
                   list_slice({WORDS_SQL}, 1, {_PREFIX_WORDS}), ' '
               ) AS prefix,
               len({WORDS_SQL}) AS n_words
        FROM documents
        WHERE len({WORDS_SQL}) >= {_PREFIX_WORDS}
    ),
    tot AS (SELECT count(*) AS n_docs FROM pfx)
    SELECT prefix,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(count(*) / CAST(t.n_docs AS DOUBLE), 6) AS share
    FROM pfx, tot t
    GROUP BY prefix, t.n_docs
    ORDER BY count(*) DESC, prefix
    LIMIT {_PREFIX_TOP_K}
    """,
)
def corpus_prefix_boilerplate_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Templated-prefix mining — the boilerplate detector that catches
    what near-dup misses: documents opening with the SAME
    {n}-word prefix but diverging bodies (scraped page chrome, prompt
    templates, license headers) sit below any Jaccard threshold yet
    poison training data with repeated spans. The top-{k} prefixes by
    document count with their corpus share are the removal worklist
    ([[corpus_dup_span_detect]] finds repeated spans ANYWHERE; the
    prefix position is where templates live and where a cheap
    group-by finds them; [[corpus_line_dedup_ccnet]] then dedups the
    confirmed lines). Documents shorter than the prefix are excluded
    — their 'prefix' is just the document.

    Scale shape: prefix extraction is map-side; one hash fold at
    prefix grain (vocabulary-bounded), a bounded top-k sort, one-row
    total broadcast."""
    t = tables(spark, sf_dir)
    # tokenize once (the inline form ran the split twice per row), and
    # ride the min-length gate on a generator so pushdown cannot
    # re-inline the tokenizer into the scan filter — round 11
    pfx = (
        t.documents.select(words("text").alias("ws"))
        .select(
            F.array_join(F.slice("ws", 1, _PREFIX_WORDS), " ").alias("prefix"),
            F.size("ws").alias("n_words"),
        )
        .select(
            "prefix",
            "n_words",
            F.explode(
                F.array_compact(
                    F.array(F.when(F.col("n_words") >= _PREFIX_WORDS, F.lit(1)))
                )
            ).alias("_keep"),
        )
        .drop("_keep")
    )
    tot = pfx.agg(F.count(F.lit(1)).alias("n_total"))
    w = Window.orderBy(F.desc("n_docs"), F.asc("prefix"))
    return (
        pfx.groupBy("prefix")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "prefix",
            "n_docs",
            rnd(F.col("n_docs") / F.col("n_total").cast("double"), 6)
            .alias("share"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PREFIX_TOP_K)
        .drop("rn")
    )


corpus_prefix_boilerplate_topk.__doc__ = (
    corpus_prefix_boilerplate_topk.__doc__
    .replace("{n}", str(_PREFIX_WORDS))
    .replace("{k}", str(_PREFIX_TOP_K))
)


# --------------------------------------------------------------------------
# Bradley-Terry source strength from synthesized pairwise preferences
# --------------------------------------------------------------------------

_BT_ITERS = 3
_BT_ROUND = 8  # per-iteration strength rounding (engine portability)


def _bt_iter_sql(t: int) -> str:
    """One unrolled Bradley-Terry MM iteration as CTEs: raw{t} applies
    the minorize-maximize update s_i = W_i / sum_j n_ij/(s_i + s_j),
    bt{t} renormalizes to sum = |items| and ROUNDS to 8 decimals (the
    quantization that makes the float loop engine-portable — the
    embed_kmeans_cluster pattern)."""
    return f"""
    raw{t} AS (
        SELECT m.i,
               any_value(w.wins) / sum(m.n / (si.s + sj.s)) AS s_raw
        FROM mat m
        JOIN bt{t - 1} si ON si.i = m.i
        JOIN bt{t - 1} sj ON sj.i = m.j
        JOIN wintot w ON w.i = m.i
        GROUP BY m.i
    ),
    bt{t} AS (
        SELECT i,
               round(s_raw * (SELECT count(*) FROM items)
                     / sum(s_raw) OVER (), {_BT_ROUND}) AS s
        FROM raw{t}
    )"""


@query(
    "corpus_bt_source_strength",
    oracle=f"""
    WITH d1 AS (
        SELECT doc_id, source, n_chars FROM documents
    ),
    comp AS (
        SELECT a.source AS sa, b.source AS sb,
               CASE WHEN a.n_chars > b.n_chars THEN a.source
                    ELSE b.source END AS winner
        FROM d1 a JOIN d1 b ON b.doc_id = a.doc_id + 1
        WHERE a.source <> b.source AND a.n_chars <> b.n_chars
    ),
    mat0 AS (
        SELECT winner AS i,
               CASE WHEN winner = sa THEN sb ELSE sa END AS j,
               count(*) AS wins_ij
        FROM comp GROUP BY 1, 2
    ),
    mat AS (
        SELECT coalesce(a.i, b.j) AS i, coalesce(a.j, b.i) AS j,
               coalesce(a.wins_ij, 0) + coalesce(b.wins_ij, 0) AS n
        FROM mat0 a FULL JOIN mat0 b ON a.i = b.j AND a.j = b.i
        WHERE coalesce(a.i, b.j) IS NOT NULL
    ),
    items AS (SELECT DISTINCT i FROM mat),
    wintot AS (
        SELECT i, CAST(sum(coalesce(w.wins_ij, 0)) AS DOUBLE) AS wins
        FROM items LEFT JOIN mat0 w USING (i) GROUP BY i
    ),
    bt0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS s FROM items),
    {",".join(_bt_iter_sql(t) for t in range(1, _BT_ITERS + 1))},
    compn AS (
        SELECT i, CAST(sum(n) AS BIGINT) AS n_comparisons
        FROM (SELECT i, n FROM mat) GROUP BY i
    )
    SELECT b.i AS source,
           CAST(w.wins AS BIGINT) AS n_wins,
           c.n_comparisons,
           round(b.s, 6) AS bt_strength,
           row_number() OVER (ORDER BY b.s DESC, b.i) AS rank
    FROM bt{_BT_ITERS} b
    JOIN wintot w ON w.i = b.i
    JOIN compn c ON c.i = b.i
    """,
)
def corpus_bt_source_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strength per SOURCE fitted to synthesized pairwise
    preferences — the preference-data primitive behind RLHF reward
    modeling and arena-style rankings (Elo's batch cousin), engine-
    shaped: comparisons are adjacent-doc_id cross-source pairs with the
    longer document winning (a deterministic stand-in for a judge;
    equal lengths abstain), and the MM fixed-point update s_i = W_i /
    sum_j n_ij/(s_i+s_j) (Hunter 2004) runs THREE unrolled iterations,
    renormalized to sum=|sources| and ROUNDED to 8 decimals per
    iteration — the [[embed_kmeans_cluster]] float-portability pattern,
    so both engines walk identical trajectories and the whole fit is
    hash-checked (no rows-only escape hatch for iterative numerics).

    Scale shape: the corpus-scale work is ONE self-join on adjacent
    doc_id (sort-merge on the same key both sides — at 100 TB this is
    the window lead() formulation, zero extra shuffle) reduced to a
    |sources|^2 win matrix; all three MM iterations run on that tiny
    matrix via keyed joins (no collect — the fit is a DataFrame plan,
    so it composes with checkpointing like any other operator)."""
    docs = tables(spark, sf_dir).documents
    d = docs.select("doc_id", "source", "n_chars")
    x = d.select(
        "doc_id", F.col("source").alias("sa"), F.col("n_chars").alias("ca")
    )
    y = d.select(
        (F.col("doc_id") - 1).alias("doc_id"),
        F.col("source").alias("sb"),
        F.col("n_chars").alias("cb"),
    )
    # adjacent-pair join on the shifted key: a parallel hash/sort-merge
    # join, NOT a global-ordered lead() window (which would funnel the
    # corpus through one partition)
    adj = x.join(y, "doc_id").filter(
        (F.col("sa") != F.col("sb")) & (F.col("ca") != F.col("cb"))
    )
    comp = adj.select(
        "sa",
        "sb",
        F.when(F.col("ca") > F.col("cb"), F.col("sa"))
        .otherwise(F.col("sb"))
        .alias("winner"),
    )
    mat0 = comp.select(
        F.col("winner").alias("i"),
        F.when(F.col("winner") == F.col("sa"), F.col("sb"))
        .otherwise(F.col("sa"))
        .alias("j"),
    ).groupBy("i", "j").agg(F.count(F.lit(1)).alias("wins_ij"))
    m_a, m_b = mat0.alias("ma"), mat0.alias("mb")
    mat = (
        m_a.join(
            m_b,
            (F.col("ma.i") == F.col("mb.j")) & (F.col("ma.j") == F.col("mb.i")),
            "full",
        )
        .select(
            F.coalesce(F.col("ma.i"), F.col("mb.j")).alias("i"),
            F.coalesce(F.col("ma.j"), F.col("mb.i")).alias("j"),
            (
                F.coalesce(F.col("ma.wins_ij"), F.lit(0))
                + F.coalesce(F.col("mb.wins_ij"), F.lit(0))
            ).alias("n"),
        )
        .filter(F.col("i").isNotNull())
    )
    items = mat.select("i").distinct()
    wintot = (
        items.join(mat0, "i", "left")
        .groupBy("i")
        .agg(
            F.sum(F.coalesce(F.col("wins_ij"), F.lit(0)))
            .cast("double")
            .alias("wins")
        )
    )
    n_items = items.count()  # |sources|: tiny, bounds the fit, not the data
    bt = items.select("i", F.lit(1.0).alias("s"))
    for _ in range(_BT_ITERS):
        si = bt.select(F.col("i").alias("si_i"), F.col("s").alias("s_i"))
        sj = bt.select(F.col("i").alias("sj_i"), F.col("s").alias("s_j"))
        raw = (
            mat.join(si, F.col("i") == F.col("si_i"))
            .join(sj, F.col("j") == F.col("sj_i"))
            .join(wintot.select(F.col("i").alias("w_i"), "wins"),
                  F.col("i") == F.col("w_i"))
            .groupBy("i")
            .agg(
                (
                    F.any_value("wins")
                    / F.sum(F.col("n") / (F.col("s_i") + F.col("s_j")))
                ).alias("s_raw")
            )
        )
        tot = Window.partitionBy(F.lit(1))
        bt = raw.select(
            "i",
            rnd(
                F.col("s_raw") * n_items / F.sum("s_raw").over(tot),
                _BT_ROUND,
            ).alias("s"),
        )
    # per-source sum(n) over the symmetrized matrix counts each of i's
    # comparisons exactly once (ADVICE r6: the old /2 halved it and hit
    # the Spark-truncate vs DuckDB-round-half-even integer-division trap)
    compn = mat.groupBy("i").agg(F.sum("n").cast("long").alias("n_comparisons"))
    rank = F.row_number().over(
        Window.partitionBy(F.lit(1)).orderBy(F.desc("s"), F.asc("i"))
    )
    return (
        bt.join(wintot, "i")
        .join(compn, "i")
        .select(
            F.col("i").alias("source"),
            F.col("wins").cast("long").alias("n_wins"),
            "n_comparisons",
            rnd(F.col("s"), 6).alias("bt_strength"),
            rank.alias("rank"),
        )
    )


# --------------------------------------------------------------------------
# DoReMi-style mixture reweighting (multiplicative weights, fixed rounds)
# --------------------------------------------------------------------------

_MW_ETA = 1.0
_MW_ITERS = 3
_MW_ROUND = 8


def _mw_iter_sql(t: int) -> str:
    """One unrolled multiplicative-weights round: the reference loss is
    re-weighted by the CURRENT mixture (so the loop is genuinely
    iterative even with static per-source losses), each weight moves by
    exp(eta * excess), and the simplex projection is a normalize +
    8-decimal round (the float-portability quantization)."""
    return f"""
    mean{t} AS (
        SELECT sum(w.w * l.loss) AS mloss
        FROM mw{t - 1} w JOIN losses l USING (source)
    ),
    up{t} AS (
        SELECT w.source,
               w.w * exp({_MW_ETA} * (l.loss - m.mloss)) AS w_raw
        FROM mw{t - 1} w
        JOIN losses l USING (source)
        CROSS JOIN mean{t} m
    ),
    mw{t} AS (
        SELECT source,
               round(w_raw / sum(w_raw) OVER (), {_MW_ROUND}) AS w
        FROM up{t}
    )"""


@query(
    "corpus_mix_reweight_mw",
    oracle=f"""
    WITH toks AS (
        SELECT source, unnest({WORDS_SQL}) AS w FROM documents
    ),
    sw AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
    stot AS (SELECT source, sum(c) AS tot_s FROM sw GROUP BY source),
    cw AS (SELECT w, sum(c) AS cw FROM sw GROUP BY w),
    ctot AS (SELECT sum(c) AS tot FROM sw),
    losses AS (
        SELECT s.source,
               round(-sum((s.c * 1.0 / st.tot_s)
                          * ln(c.cw * 1.0 / ct.tot)), {_MW_ROUND}) AS loss
        FROM sw s
        JOIN stot st USING (source)
        JOIN cw c USING (w)
        CROSS JOIN ctot ct
        GROUP BY s.source
    ),
    mw0 AS (
        SELECT source,
               round(1.0 / (SELECT count(*) FROM losses), {_MW_ROUND}) AS w
        FROM losses
    ),
    {",".join(_mw_iter_sql(t) for t in range(1, _MW_ITERS + 1))}
    SELECT l.source,
           CAST(st.tot_s AS BIGINT) AS n_tokens,
           round(st.tot_s * 1.0 / ct.tot, 6) AS nat_share,
           round(l.loss, 6) AS xent_loss,
           round(f.w, 6) AS mix_weight,
           round(f.w / (st.tot_s * 1.0 / ct.tot), 4) AS eff_upweight
    FROM mw{_MW_ITERS} f
    JOIN losses l USING (source)
    JOIN stot st USING (source)
    CROSS JOIN ctot ct
    """,
)
def corpus_mix_reweight_mw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-shaped mixture reweighting (Xie et al. 2023, the
    multiplicative-weights skeleton): each source's "excess loss" —
    here the unigram cross-entropy of the source's token distribution
    against the corpus distribution, the deterministic stand-in for a
    proxy-model loss — drives exp(eta * excess) updates of the domain
    weights over {iters} fixed rounds, renormalized onto the simplex
    and ROUNDED to 8 decimals per round ([[embed_kmeans_cluster]]'s
    float-portability pattern; the loop is genuinely iterative because
    the excess is measured against the CURRENT mixture's mean loss).
    `eff_upweight` (= final weight / natural share) is the number a
    capacity planner reads: how hard the mixture leans into each
    source. Fully hash-checked — the oracle unrolls the same rounds.

    Scale shape: the corpus collapses to the (source, word) grain in
    one exploded aggregate (map-side combine; vocab-bounded); the
    cross-entropy is one more keyed aggregate over that table with the
    word-marginal joined back on the same key; all MW rounds run on
    |sources| rows. At 100 TB exactly one shuffle touches token-scale
    data."""
    docs = tables(spark, sf_dir).documents
    toks = docs.select("source", F.explode(words()).alias("w"))
    sw = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    stot = sw.groupBy("source").agg(F.sum("c").alias("tot_s"))
    cw = sw.groupBy("w").agg(F.sum("c").alias("cw"))
    ctot = sw.agg(F.sum("c").alias("tot"))
    losses = (
        sw.join(stot, "source")
        .join(cw, "w")
        .crossJoin(F.broadcast(ctot))
        .groupBy("source")
        .agg(
            rnd(
                -F.sum(
                    (F.col("c") / F.col("tot_s"))
                    * F.log(F.col("cw") / F.col("tot"))
                ),
                _MW_ROUND,
            ).alias("loss")
        )
    )
    # |sources|: tiny, bounds the fit only. max(.., 1) keeps the
    # constant-folded uniform weight from dividing by zero on an empty
    # corpus (the select below is then empty anyway).
    n_sources = max(losses.count(), 1)
    mw = losses.select(
        "source", rnd(F.lit(1.0) / n_sources, _MW_ROUND).alias("w")
    )
    for _ in range(_MW_ITERS):
        mean_t = (
            mw.join(losses, "source")
            .agg(F.sum(F.col("w") * F.col("loss")).alias("mloss"))
        )
        up = (
            mw.join(losses, "source")
            .crossJoin(F.broadcast(mean_t))
            .select(
                "source",
                (
                    F.col("w")
                    * F.exp(_MW_ETA * (F.col("loss") - F.col("mloss")))
                ).alias("w_raw"),
            )
        )
        tot_w = Window.partitionBy(F.lit(1))
        mw = up.select(
            "source",
            rnd(F.col("w_raw") / F.sum("w_raw").over(tot_w), _MW_ROUND).alias(
                "w"
            ),
        )
    return (
        mw.join(losses, "source")
        .join(stot, "source")
        .crossJoin(F.broadcast(ctot))
        .select(
            "source",
            F.col("tot_s").cast("long").alias("n_tokens"),
            rnd(F.col("tot_s") / F.col("tot"), 6).alias("nat_share"),
            rnd(F.col("loss"), 6).alias("xent_loss"),
            rnd(F.col("w"), 6).alias("mix_weight"),
            rnd(F.col("w") / (F.col("tot_s") / F.col("tot")), 4).alias(
                "eff_upweight"
            ),
        )
    )


corpus_mix_reweight_mw.__doc__ = corpus_mix_reweight_mw.__doc__.replace(
    "{iters}", str(_MW_ITERS)
)


# --------------------------------------------------------------------------
# DSIR importance weights (hashed-feature log-likelihood ratio)
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 64
_DSIR_TARGET_LANG = "en"
_DSIR_BUCKET_SQL = (
    f"CAST(('0x' || substring(md5(w), 1, 4))::BIGINT % {_DSIR_BUCKETS}"
    " AS BIGINT)"
)


@query(
    "corpus_dsir_importance",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS b
        FROM (SELECT doc_id, lang, unnest({WORDS_SQL}) AS w FROM documents)
    ),
    db AS (
        SELECT doc_id, any_value(lang) AS lang, b, count(*) AS c
        FROM toks GROUP BY doc_id, b
    ),
    tcnt AS (
        SELECT b, count(*) AS ct FROM toks
        WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b
    ),
    rcnt AS (SELECT b, count(*) AS cr FROM toks GROUP BY b),
    tot AS (
        SELECT (SELECT count(*) FROM toks
                WHERE lang = '{_DSIR_TARGET_LANG}') AS nt,
               (SELECT count(*) FROM toks) AS nr
    ),
    ratio AS (
        SELECT r.b,
               ln((coalesce(t.ct, 0) + 1.0) / (tot.nt + {_DSIR_BUCKETS}))
               - ln((r.cr + 1.0) / (tot.nr + {_DSIR_BUCKETS})) AS lr
        FROM rcnt r LEFT JOIN tcnt t USING (b) CROSS JOIN tot
    ),
    docw AS (
        SELECT d.doc_id, any_value(d.lang) AS lang,
               round(sum(d.c * ratio.lr), 8) AS logw
        FROM db d JOIN ratio USING (b)
        GROUP BY d.doc_id
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(logw), 4) AS mean_logw,
           round(avg(CASE WHEN logw > 0 THEN 1.0 ELSE 0.0 END), 6)
               AS pos_share
    FROM docw GROUP BY lang
    """,
)
def corpus_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, "Data Selection via
    Importance Resampling"), the hashed-n-gram form: every document
    gets a log importance weight = sum over its hashed word features of
    ln p_target(bucket) - ln p_raw(bucket), where the target is the
    '{tl}' slice and raw is the whole corpus (add-1 smoothed, {nb}
    md5 buckets — engine-identical bytes). Positive logw = "looks like
    the target distribution"; resampling by exp(logw) is the published
    recipe for tilting a 100-TB crawl toward a curated target. Reported
    at the language grain: mean logw and the positive share — target-
    language docs must upweight (pinned in tests), which is the whole
    point of the method. Per-doc logw rounds to 8 decimals before the
    sign test and the mean (float-portability quantization).

    Scale shape: two passes over the token projection — one (doc, b)
    aggregate (the per-doc feature vector, map-side combined) and one
    bucket-marginal aggregate ({nb} rows, broadcast back). The log-
    ratio table is model-as-data: at serving time these {nb} numbers
    ARE the trained importance model, joined onto any corpus."""
    docs = tables(spark, sf_dir).documents
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("bigint")
        % _DSIR_BUCKETS
    )
    toks = docs.select(
        "doc_id", "lang", F.explode(words()).alias("w")
    ).select("doc_id", "lang", bucket.alias("b"))
    db = toks.groupBy("doc_id", "b").agg(
        F.any_value("lang").alias("lang"), F.count(F.lit(1)).alias("c")
    )
    tcnt = (
        toks.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    rcnt = toks.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tot = toks.agg(
        F.count(F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)).alias("nt"),
        F.count(F.lit(1)).alias("nr"),
    )
    ratio = (
        rcnt.join(tcnt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    / (F.col("nt") + _DSIR_BUCKETS)
                )
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + _DSIR_BUCKETS))
            ).alias("lr"),
        )
    )
    docw = (
        db.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            rnd(F.sum(F.col("c") * F.col("lr")), 8).alias("logw"),
        )
    )
    return docw.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("logw"), 4).alias("mean_logw"),
        rnd(F.avg(F.when(F.col("logw") > 0, 1.0).otherwise(0.0)), 6).alias(
            "pos_share"
        ),
    )


corpus_dsir_importance.__doc__ = corpus_dsir_importance.__doc__.replace(
    "{tl}", _DSIR_TARGET_LANG
).replace("{nb}", str(_DSIR_BUCKETS))


# --------------------------------------------------------------------------
# Model-based quality filter (hashed logistic scorer, weights as data)
# --------------------------------------------------------------------------

_QLF_BUCKETS = 64
_QLF_THRESHOLD = 0.5

# shared scored-docs pipeline (doc_id, source, p) — the classifier's
# serving plan, reused verbatim by eval_quality_calibration_ece so the
# two oracles cannot drift
_QLF_SCORED_SQL = f"""
    toks AS (
        SELECT doc_id, source, lang,
               CAST(('0x' || substring(md5(w), 1, 4))::BIGINT
                    % {_QLF_BUCKETS} AS BIGINT) AS b
        FROM (SELECT doc_id, source, lang, unnest({WORDS_SQL}) AS w
              FROM documents)
    ),
    feats AS (
        SELECT doc_id, any_value(source) AS source,
               any_value(lang) AS lang, b,
               ln(1 + count(*)) AS x
        FROM toks GROUP BY doc_id, b
    ),
    wts AS (
        SELECT b,
               (('0x' || substring(md5('w:' || CAST(b AS VARCHAR)), 1, 4))
                    ::BIGINT % 2001 - 1000) / 1000.0 AS wt
        FROM (SELECT unnest(generate_series(0, {_QLF_BUCKETS - 1})) AS b)
    ),
    scored AS (
        SELECT f.doc_id, any_value(f.source) AS source,
               any_value(f.lang) AS lang,
               round(1.0 / (1.0 + exp(-sum(f.x * w.wt))), 8) AS p
        FROM feats f JOIN wts w USING (b)
        GROUP BY f.doc_id
    )"""




def _qlf_scored_df(spark: SparkSession, sf_dir: str):
    """Spark side of _QLF_SCORED_SQL: (doc_id, source, p) — the hashed
    logistic scorer's serving plan, shared by the filter and its
    calibration eval."""
    docs = tables(spark, sf_dir).documents
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("bigint")
        % _QLF_BUCKETS
    )
    toks = docs.select(
        "doc_id", "source", "lang", F.explode(words()).alias("w")
    ).select("doc_id", "source", "lang", bucket.alias("b"))
    feats = toks.groupBy("doc_id", "b").agg(
        F.any_value("source").alias("source"),
        F.any_value("lang").alias("lang"),
        F.log(1 + F.count(F.lit(1))).alias("x"),
    )
    wts = spark.range(_QLF_BUCKETS).select(
        F.col("id").alias("b"),
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("w:"), F.col("id").cast("string"))),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 2001
                - 1000
            )
            / 1000.0
        ).alias("wt"),
    )
    return (
        feats.join(F.broadcast(wts), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.any_value("lang").alias("lang"),
            rnd(
                1.0 / (1.0 + F.exp(-F.sum(F.col("x") * F.col("wt")))), 8
            ).alias("p"),
        )
    )


@query(
    "corpus_quality_classifier_filter",
    oracle=f"""
    WITH {_QLF_SCORED_SQL}
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(p), 4) AS mean_score,
           round(avg(CASE WHEN p >= {_QLF_THRESHOLD} THEN 1.0 ELSE 0.0 END),
                 6) AS pass_rate
    FROM scored GROUP BY source
    """,
)
def corpus_quality_classifier_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Model-based quality filtering, the DCLM/FineWeb-edu engine
    shape: a (fasttext/logistic-style) linear scorer over hashed
    bag-of-words features gates every document, and the pipeline
    reports per-source score mass and pass rate at the threshold. The
    weight VECTOR here is a deterministic md5-derived stand-in (each
    bucket's weight in [-1, 1]) — in production the trained weights
    load from the model registry — but the serving plan is the real
    thing and is what this operator pins: **weights are DATA**, a
    {nb}-row broadcast table joined onto the per-doc feature vector,
    so shipping a retrained model is a table swap, not a code change.
    Sigmoid output rounds to 8 decimals before thresholding
    (float-portability quantization over exp()).

    Scale shape: one token-scale exploded aggregate builds the sparse
    (doc, bucket, log(1+tf)) features map-side; the dot product is a
    per-doc keyed aggregate after a broadcast join with the weight
    table; the report is a |sources|-grain rollup. Exactly one
    exchange touches corpus-scale rows."""
    scored = _qlf_scored_df(spark, sf_dir)
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("p"), 4).alias("mean_score"),
        rnd(
            F.avg(
                F.when(F.col("p") >= _QLF_THRESHOLD, 1.0).otherwise(0.0)
            ),
            6,
        ).alias("pass_rate"),
    )


corpus_quality_classifier_filter.__doc__ = (
    corpus_quality_classifier_filter.__doc__.replace("{nb}", str(_QLF_BUCKETS))
)


@query(
    "eval_quality_calibration_ece",
    oracle=f"""
    WITH {_QLF_SCORED_SQL},
    binned AS (
        SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin,
               p, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        FROM scored
    ),
    per_bin AS (
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(p), 4) AS mean_score,
               round(sum(y) * 1.0 / count(*), 6) AS label_rate
        FROM binned GROUP BY bin
    ),
    gapped AS (
        SELECT *, round(abs(mean_score - label_rate), 6) AS gap
        FROM per_bin
    )
    SELECT bin, n_docs, mean_score, label_rate, gap,
           round(sum(n_docs * gap) OVER () / sum(n_docs) OVER (), 6)
               AS ece
    FROM gapped
    """,
)
def eval_quality_calibration_ece(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calibration audit of the quality classifier — the reliability
    diagram plus Expected Calibration Error that decides whether
    [[corpus_quality_classifier_filter]]'s scores can be used as
    PROBABILITIES (sampling weights, soft thresholds, mixture targets)
    or only as a ranking: scores land in 10 equal-width bins, each bin
    compares its mean predicted score against the empirical rate of a
    reference label (here ``lang = 'en'``, the deterministic stand-in
    for the held-out gold label a production calibration set carries),
    and ECE is the doc-weighted mean absolute gap (Guo et al. 2017,
    "On Calibration of Modern Neural Networks" — the standard
    formulation). A filter that is miscalibrated but well-ranked needs
    Platt/temperature scaling before its scores feed a sampler; this
    is the operator that tells you.

    Determinism: label_rate is an exact integer ratio; mean_score
    rounds at 4 decimals before the gap (the classifier's own avg
    quantization); gaps and ECE derive from already-rounded values, so
    both engines agree bit-for-bit. Scale shape: reuses the scorer's
    single corpus-scale exchange, then a 10-row bin aggregate; the ECE
    window runs over 10 rows."""
    scored = _qlf_scored_df(spark, sf_dir)
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        "p",
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        rnd(F.avg("p"), 4).alias("mean_score"),
        rnd(F.sum("y") / F.count(F.lit(1)), 6).alias("label_rate"),
    )
    gapped = per_bin.withColumn(
        "gap", rnd(F.abs(F.col("mean_score") - F.col("label_rate")), 6)
    )
    w = Window.partitionBy()
    return gapped.select(
        "bin",
        "n_docs",
        "mean_score",
        "label_rate",
        "gap",
        rnd(
            F.sum(F.col("n_docs") * F.col("gap")).over(w)
            / F.sum("n_docs").over(w),
            6,
        ).alias("ece"),
    )


# --------------------------------------------------------------------------
# BPE compression audit by language (composes the registered encoder)
# --------------------------------------------------------------------------


def _bpe_compression_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    return f"""
    WITH enc AS ({QUERIES['corpus_bpe_encode'].oracle}),
    cw AS (
        SELECT lang, w, count(*) AS cnt
        FROM (SELECT lang, unnest({WORDS_SQL}) AS w FROM documents)
        GROUP BY lang, w
    )
    SELECT cw.lang,
           CAST(sum(cw.cnt) AS BIGINT) AS n_words,
           CAST(sum(cw.cnt * length(cw.w)) AS BIGINT) AS n_chars,
           CAST(sum(cw.cnt * enc.n_tokens) AS BIGINT) AS n_bpe_tokens,
           round(sum(cw.cnt * enc.n_tokens) * 1.0 / sum(cw.cnt), 6)
               AS tokens_per_word,
           round(sum(cw.cnt * length(cw.w)) * 1.0
                 / sum(cw.cnt * enc.n_tokens), 6) AS chars_per_token
    FROM cw JOIN enc ON enc.w = cw.w
    GROUP BY cw.lang
    """


@query("corpus_bpe_compression_by_lang", oracle=_bpe_compression_oracle())
def corpus_bpe_compression_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer compression audit: corpus-weighted tokens-per-word and
    chars-per-token under the [[corpus_bpe_encode]] merge table, by
    language — the fertility number that decides whether a tokenizer
    is fair to a language (high tokens-per-word = that lang pays more
    sequence length per content; the auditable form of the
    token-inflation problem [[corpus_token_efficiency_by_lang]] reports
    for whitespace tokens). COMPOSES the registered encoder — same
    DataFrame, same oracle embedded as a CTE (the retrieval_overlap_at_k
    pattern), so the audit can never drift from the tokenizer it
    grades.

    Scale shape: encoding happens at VOCAB grain (the whole point of
    word-level BPE application); the corpus contributes one
    (lang, word) count aggregate that broadcast-joins the encoded
    vocab. Token-scale data crosses one exchange."""
    from awsbeats_spark.registry import QUERIES

    docs = tables(spark, sf_dir).documents
    enc = QUERIES["corpus_bpe_encode"].fn(spark, sf_dir).select(
        "w", "n_tokens"
    )
    cw = (
        docs.select("lang", F.explode(words()).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cw.join(F.broadcast(enc), "w")
        .groupBy("lang")
        .agg(
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.length("w")).cast("long").alias("n_chars"),
            F.sum(F.col("cnt") * F.col("n_tokens"))
            .cast("long")
            .alias("n_bpe_tokens"),
            rnd(
                F.sum(F.col("cnt") * F.col("n_tokens")) / F.sum("cnt"), 6
            ).alias("tokens_per_word"),
            rnd(
                F.sum(F.col("cnt") * F.length("w"))
                / F.sum(F.col("cnt") * F.col("n_tokens")),
                6,
            ).alias("chars_per_token"),
        )
    )


# --------------------------------------------------------------------------
# Epoch shard plan: the deterministic global shuffle a data loader consumes
# --------------------------------------------------------------------------

_SHARD_N_EPOCHS = 2
_SHARD_N_SHARDS = 8


@query(
    "corpus_epoch_shard_plan",
    oracle=f"""
    WITH keyed AS (
        SELECT e.epoch, d.doc_id, d.n_chars,
               ('0x' || substring(md5(
                    CAST(d.doc_id AS VARCHAR) || ':' || CAST(e.epoch AS VARCHAR)
               ), 1, 8))::BIGINT AS h
        FROM documents d
        CROSS JOIN (
            SELECT unnest(generate_series(0, {_SHARD_N_EPOCHS - 1})) AS epoch
        ) e
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           h % {_SHARD_N_SHARDS} AS shard,
           doc_id,
           n_chars,
           CAST(row_number() OVER (
               PARTITION BY epoch, h % {_SHARD_N_SHARDS}
               ORDER BY h, doc_id
           ) AS BIGINT) AS position
    FROM keyed
    """,
    tags=("corpus", "scale"),
)
def corpus_epoch_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch training shard plan — the deterministic global shuffle
    a multi-epoch data loader consumes: every (doc, epoch) gets a
    content-addressed md5 key, shard = key mod N, and a within-shard
    position ordered by the key, so epoch 0 and epoch 1 see the corpus
    in independent pseudo-random orders WITHOUT any RNG state, seed
    file, or driver-side permutation. Re-running the plan on any
    engine, any partitioning, any day reproduces the same manifest —
    the property that makes training jobs resumable and shard files
    cacheable. Same hash idiom as [[sample_hash_deterministic]] /
    [[sample_md5_threshold]]; this is their epoch/order completion.

    Scale shape: the key and shard are row-local (map-side, no
    shuffle); the position is a row_number per (epoch, shard) — on a
    cluster that is exactly `repartition(epoch, shard) +
    sortWithinPartitions(h)`, i.e. one shuffle whose reduce side IS
    the shard files being written, parallel in the number of shards
    (you'd size N_SHARDS to the cluster, not 8). No global sort, no
    driver collect, no skew (md5 is uniform).
    """
    t = tables(spark, sf_dir)
    epochs = F.explode(
        F.sequence(F.lit(0), F.lit(_SHARD_N_EPOCHS - 1))
    ).alias("epoch")
    keyed = t.documents.select("doc_id", "n_chars", epochs).select(
        F.col("epoch").cast("long").alias("epoch"),
        "doc_id",
        "n_chars",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("epoch").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h"),
    )
    shard = (F.col("h") % _SHARD_N_SHARDS).alias("shard")
    w = Window.partitionBy("epoch", F.col("h") % _SHARD_N_SHARDS).orderBy(
        "h", "doc_id"
    )
    return keyed.select(
        "epoch",
        shard,
        "doc_id",
        "n_chars",
        F.row_number().over(w).cast("long").alias("position"),
    )


# --------------------------------------------------------------------------
# Effective sample size of the DSIR importance weights
# --------------------------------------------------------------------------


@query(
    "corpus_dsir_ess",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, {_DSIR_BUCKET_SQL} AS b
        FROM (SELECT doc_id, lang, unnest({WORDS_SQL}) AS w FROM documents)
    ),
    db AS (
        SELECT doc_id, any_value(lang) AS lang, b, count(*) AS c
        FROM toks GROUP BY doc_id, b
    ),
    tcnt AS (
        SELECT b, count(*) AS ct FROM toks
        WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b
    ),
    rcnt AS (SELECT b, count(*) AS cr FROM toks GROUP BY b),
    tot AS (
        SELECT (SELECT count(*) FROM toks
                WHERE lang = '{_DSIR_TARGET_LANG}') AS nt,
               (SELECT count(*) FROM toks) AS nr
    ),
    ratio AS (
        SELECT r.b,
               ln((coalesce(t.ct, 0) + 1.0) / (tot.nt + {_DSIR_BUCKETS}))
               - ln((r.cr + 1.0) / (tot.nr + {_DSIR_BUCKETS})) AS lr
        FROM rcnt r LEFT JOIN tcnt t USING (b) CROSS JOIN tot
    ),
    docw AS (
        SELECT d.doc_id, any_value(d.lang) AS lang,
               round(sum(d.c * ratio.lr), 8) AS logw
        FROM db d JOIN ratio USING (b)
        GROUP BY d.doc_id
    ),
    shifted AS (
        SELECT lang,
               exp(logw - max(logw) OVER (PARTITION BY lang)) AS w
        FROM docw
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(pow(sum(w), 2) / sum(w * w), 4) AS ess,
           round(pow(sum(w), 2) / sum(w * w) / count(*), 6) AS ess_share,
           round(max(w) / sum(w), 6) AS max_w_share
    FROM shifted GROUP BY lang
    """,
)
def corpus_dsir_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the [[corpus_dsir_importance]] weights,
    per language: ESS = (Σw)²/Σw² with w = exp(logw) — the honesty
    metric every importance-resampling pipeline must report before
    trusting its tilted sample (Kong 1992's classic diagnostic; DSIR's
    own paper resamples by these weights). A language slice whose ESS
    collapses toward 1 is dominated by a handful of documents — the
    resample would be those documents repeated, not a distribution
    shift — and max_w_share names the dominance directly. Shares the
    per-doc logw computation (8-dp quantized, identical CTE chain)
    with the importance op it audits.

    Scale shape: identical to the DSIR op — two token-projection
    passes, a bucket-marginal broadcast, then one keyed fold per
    language; the ESS arithmetic is three aggregates over the same
    per-doc rows. Exp-sums are order-dependent doubles over ≤n_docs
    O(1)-magnitude addends; outputs round at 4/6 dp and nothing
    selects on them.

    Numerical contract (round-9 fix, same failure family as
    ts_ewma_time_decay): logw scales with DOCUMENT LENGTH (a token-
    bucket sum), so a long-enough document overflows exp(logw) to inf
    and ESS becomes inf/inf = NaN. ESS, ess_share, and max_w_share are
    all INVARIANT to scaling w by a per-group constant, so both engines
    apply the log-sum-exp shift — w = exp(logw - max(logw) over the
    language) — which bounds every exponent at <= 0 (underflow to an
    honest 0 for negligibly-weighted docs) without changing any
    reported value.
    """
    docs = tables(spark, sf_dir).documents
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("bigint")
        % _DSIR_BUCKETS
    )
    toks = docs.select(
        "doc_id", "lang", F.explode(words()).alias("w")
    ).select("doc_id", "lang", bucket.alias("b"))
    db = toks.groupBy("doc_id", "b").agg(
        F.any_value("lang").alias("lang"), F.count(F.lit(1)).alias("c")
    )
    tcnt = (
        toks.filter(F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    rcnt = toks.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tot = toks.agg(
        F.count(F.when(F.col("lang") == _DSIR_TARGET_LANG, 1)).alias("nt"),
        F.count(F.lit(1)).alias("nr"),
    )
    ratio = (
        rcnt.join(tcnt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    / (F.col("nt") + _DSIR_BUCKETS)
                )
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + _DSIR_BUCKETS))
            ).alias("lr"),
        )
    )
    docw = (
        db.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.any_value("lang").alias("lang"),
            rnd(F.sum(F.col("c") * F.col("lr")), 8).alias("logw"),
        )
    )
    shifted = docw.withColumn(
        "w",
        F.exp(
            F.col("logw") - F.max("logw").over(Window.partitionBy("lang"))
        ),
    )
    w = F.col("w")
    return shifted.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        rnd(F.pow(F.sum(w), 2) / F.sum(w * w), 4).alias("ess"),
        rnd(
            F.pow(F.sum(w), 2) / F.sum(w * w) / F.count(F.lit(1)), 6
        ).alias("ess_share"),
        rnd(F.max(w) / F.sum(w), 6).alias("max_w_share"),
    )


# --------------------------------------------------------------------------
# Round-robin source interleave (balanced multi-source training order)
# --------------------------------------------------------------------------


@query(
    "corpus_interleave_sources_roundrobin",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                            doc_id
               ) AS r
        FROM documents
    ),
    counts AS (SELECT source AS s2, count(*) AS n FROM ranked GROUP BY source)
    SELECT source, doc_id, n_chars,
           CAST(r AS BIGINT) AS rank_in_source,
           CAST(sum(least(n, r - 1))
                + sum(CASE WHEN s2 < source AND n >= r THEN 1 ELSE 0 END)
                + 1 AS BIGINT) AS position
    FROM ranked CROSS JOIN counts
    GROUP BY source, doc_id, n_chars, r
    """,
)
def corpus_interleave_sources_roundrobin(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Balanced round-robin interleave of sources — the training order a
    multi-source mix actually streams (one doc per source per cycle,
    so no source ever monopolizes a contiguous window of steps; the
    within-source order is the content-addressed md5 shuffle of
    [[corpus_epoch_shard_plan]]): every doc gets its global position
    in the interleaved sequence. The interleave complements the epoch
    plan's uniform global shuffle with the BALANCED policy (uniform
    shuffle leaves source runs of geometric length; round-robin bounds
    every source's gap at the source count).

    Scale shape — the reason this is closed-form, not a sort: the
    global position of (rank r, source s) is computable from the
    per-source COUNTS alone — docs from earlier cycles contribute
    Σ min(n_s', r-1), same-cycle earlier sources contribute
    |{s' < s : n_s' ≥ r}| — so the plan is one per-source rank window
    (parallel by source) plus a k-row broadcast and a doc-grain fold.
    No global row_number, no single-partition funnel; exhausted
    sources drop out of later cycles exactly as the formula's min()
    encodes.
    """
    t = tables(spark, sf_dir)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = t.documents.select(
        "source", "doc_id", "n_chars", F.row_number().over(w).alias("r")
    )
    counts = ranked.groupBy(F.col("source").alias("s2")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        ranked.crossJoin(F.broadcast(counts))
        .groupBy("source", "doc_id", "n_chars", "r")
        .agg(
            (
                F.sum(F.least(F.col("n"), F.col("r") - 1))
                + F.sum(
                    F.when(
                        (F.col("s2") < F.col("source"))
                        & (F.col("n") >= F.col("r")),
                        1,
                    ).otherwise(0)
                )
                + 1
            )
            .cast("long")
            .alias("position")
        )
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.col("r").cast("long").alias("rank_in_source"),
            "position",
        )
    )


# --------------------------------------------------------------------------
# Canary-string scan (memorization audit: exact planted-sequence hits)
# --------------------------------------------------------------------------

# Fixed canary phrases (word 3-grams in the synthetic OLAP vocabulary —
# TESTDATA.md): the audit is the MECHANISM; real deployments broadcast
# their secret canary table instead.
_CANARIES = (
    "table scan filter",
    "stream batch window",
    "hash join merge",
    "query plan cost",
)


def _canaries_sql() -> str:
    rows = ", ".join(f"({i}, '{c}')" for i, c in enumerate(_CANARIES))
    return f"(VALUES {rows}) AS canary(canary_id, phrase)"


@query(
    "corpus_canary_scan",
    oracle=f"""
    WITH shs AS (
        SELECT doc_id, unnest(list_distinct({shingles_sql(WORDS_SQL, 3)})) AS sh
        FROM documents
    ),
    hits AS (
        SELECT canary.canary_id, canary.phrase, s.doc_id
        FROM {_canaries_sql()}
        JOIN shs s ON s.sh = canary.phrase
    ),
    c2 AS (SELECT * FROM {_canaries_sql().replace("canary(", "canary2(")})
    SELECT c2.canary_id, c2.phrase,
           CAST(coalesce(count(h.doc_id), 0) AS BIGINT) AS n_docs,
           coalesce(min(h.doc_id), -1) AS first_doc_id
    FROM c2
    LEFT JOIN hits h ON h.canary_id = c2.canary_id
    GROUP BY c2.canary_id, c2.phrase
    """,
)
def corpus_canary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canary-string scan — the memorization audit (Carlini et al.'s
    secret-sharer protocol): a broadcast table of planted canary
    phrases is matched EXACTLY against every document's word 3-gram
    set, reporting how many training docs contain each canary and
    where it first appears. [[corpus_decontaminate]] removes overlap
    with an eval SLICE of the corpus itself; this scans for a known
    EXTERNAL list — the before-training check that canaries are
    where you planted them (and nowhere else), and the
    incident-response query when a secret leaks into a crawl.

    Scale shape: the canary table is tiny and BROADCAST into one
    corpus scan's exploded distinct-shingle stream (the same shingle
    layout the dedup family shares); every canary reports a row even
    at zero hits (LEFT JOIN — silence must be a measured zero, not a
    missing row). Match is exact string equality on the normalized
    3-gram, so there is no float surface at all.
    """
    t = tables(spark, sf_dir)
    canaries = spark.createDataFrame(
        list(enumerate(_CANARIES)), "canary_id int, phrase string"
    )
    # tokenize once: inline shingles(words()) re-ran the split pipeline
    # per slice reference (7x per row) — round 11
    shs = t.documents.select("doc_id", words("text").alias("w")).select(
        "doc_id",
        F.explode(F.array_distinct(shingles("w"))).alias("sh"),
    )
    hits = shs.join(
        F.broadcast(canaries), F.col("sh") == F.col("phrase")
    ).groupBy("canary_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").alias("first_doc_id"),
    )
    return (
        canaries.join(F.broadcast(hits), "canary_id", "left")
        .select(
            "canary_id",
            "phrase",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("first_doc_id", F.lit(-1)).alias("first_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# Temperature-scaled source sampling plan (mT5/UniMax-style mixing)
# --------------------------------------------------------------------------

_MIX_TAUS = (0.3, 0.7, 1.0)


@query(
    "corpus_temperature_sampling_plan",
    oracle=f"""
    WITH tok AS (
        SELECT source,
               CAST(sum(len({WORDS_SQL})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_tokens) AS total FROM tok),
    plan AS (
        SELECT tau, source, n_tokens,
               pow(n_tokens, tau)
                   / sum(pow(n_tokens, tau)) OVER (PARTITION BY tau)
                   AS weight
        FROM tok CROSS JOIN (SELECT unnest({list(_MIX_TAUS)}) AS tau)
    )
    SELECT tau, source, n_tokens,
           round(weight, 6) AS weight,
           round(weight * total / n_tokens, 6) AS effective_epochs
    FROM plan CROSS JOIN tot
    """,
)
def corpus_temperature_sampling_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-scaled source-mixing plan (the mT5/UniMax move):
    per-source sampling weight w_i = n_i^tau / sum_j n_j^tau for
    tau in {0.3, 0.7, 1.0}, plus the EFFECTIVE EPOCHS each source
    sustains when one total-corpus-sized token budget is drawn under
    those weights (weight * total / n_i) — the number that exposes
    low-resource over-repetition BEFORE training (tau=0.3 upsamples a
    tiny source into many epochs; epochs >> 4 is the canonical
    memorization flag). Pure closed form from per-source token counts
    — the static-plan sibling of [[corpus_doremi_reweight]] (learned
    weights) and the input [[corpus_interleave_sources_roundrobin]]
    realizes as an actual row order.

    Scale shape: one keyed aggregate over the corpus (token counts per
    source — map-side combinable sums), then arithmetic over
    |sources| x |taus| rows on a broadcast scalar total. Nothing after
    the first groupBy grows with corpus size."""
    t = tables(spark, sf_dir)
    tok = t.documents.groupBy("source").agg(
        F.sum(F.size(words())).cast("long").alias("n_tokens")
    )
    taus = F.explode(F.array(*[F.lit(x) for x in _MIX_TAUS])).alias("tau")
    plan = tok.select("source", "n_tokens", taus).withColumn(
        "weight",
        F.pow("n_tokens", F.col("tau"))
        / F.sum(F.pow("n_tokens", F.col("tau"))).over(
            Window.partitionBy("tau")
        ),
    )
    total = tok.agg(F.sum("n_tokens").alias("total"))
    return plan.crossJoin(F.broadcast(total)).select(
        "tau",
        "source",
        "n_tokens",
        rnd("weight", 6).alias("weight"),
        rnd(F.col("weight") * F.col("total") / F.col("n_tokens"), 6).alias(
            "effective_epochs"
        ),
    )


# --------------------------------------------------------------------------
# Excess-loss data selection (RHO-style): reference LM vs contextual LM
# --------------------------------------------------------------------------

_RHO_KN_D = 0.75  # absolute discount, shared with corpus_bigram_kneser_ney
_RHO_SELECT_DEN = 4  # keep the top 1/4 by excess loss


@query(
    "corpus_rho_excess_loss",
    oracle=f"""
    WITH w AS (SELECT doc_id, {WORDS_SQL} AS ws FROM documents),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(ws) AS term FROM w)
        GROUP BY 1, 2
    ),
    ctf AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY term),
    coll AS (SELECT sum(ctf) AS coll_len FROM ctf),
    h_uni AS (
        SELECT tf.doc_id,
               CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
               -sum(tf.tf * ln(ctf.ctf * 1.0 / coll.coll_len))
                   / sum(tf.tf) AS h_ref
        FROM tf JOIN ctf USING (term) CROSS JOIN coll
        GROUP BY tf.doc_id
    ),
    bi AS (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2,
               CAST(count(*) AS BIGINT) AS n_occ
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
        GROUP BY 1, 2, 3
    ),
    pair AS (
        SELECT w1, w2, CAST(sum(n_occ) AS BIGINT) AS n FROM bi GROUP BY 1, 2
    ),
    ctx AS (
        SELECT w1, sum(n) AS c1, count(*) AS fanout FROM pair GROUP BY w1
    ),
    cont AS (SELECT w2, count(*) AS n_hist FROM pair GROUP BY w2),
    types AS (SELECT count(*) AS n_types FROM pair),
    h_bi AS (
        SELECT bi.doc_id,
               -sum(bi.n_occ * ln(
                    (greatest(pair.n - {_RHO_KN_D}, 0) / ctx.c1)
                    + ({_RHO_KN_D} * ctx.fanout / ctx.c1)
                      * (cont.n_hist * 1.0 / types.n_types)))
                   / sum(bi.n_occ) AS h_model
        FROM bi
        JOIN pair ON pair.w1 = bi.w1 AND pair.w2 = bi.w2
        JOIN ctx ON ctx.w1 = bi.w1
        JOIN cont ON cont.w2 = bi.w2
        CROSS JOIN types
        GROUP BY bi.doc_id
    ),
    scored AS (
        SELECT u.doc_id, u.n_tokens,
               round(u.h_ref, 6) AS h_ref,
               round(b.h_model, 6) AS h_model,
               round(u.h_ref - b.h_model, 6) AS excess_loss
        FROM h_uni u JOIN h_bi b USING (doc_id)
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY excess_loss DESC, doc_id) AS r,
               count(*) OVER () AS n
        FROM scored
    )
    SELECT doc_id, n_tokens, h_ref, h_model, excess_loss,
           r * {_RHO_SELECT_DEN} <= n AS selected
    FROM ranked
    """,
)
def corpus_rho_excess_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-loss data selection — the SQL-expressible proxy for
    RHO-loss / reducible-holdout selection (Mindermann et al. 2022) and
    the perplexity-delta filters production corpora use (DCLM, DSIR's
    cousin): score every document by how much BETTER a context-aware
    model explains it than a context-free reference, excess(d) =
    H_ref(d) - H_model(d), where H_ref is cross-entropy under the
    corpus unigram MLE ([[text_unigram_perplexity]]'s model, in nats)
    and H_model under the interpolated Kneser-Ney bigram LM
    ([[corpus_bigram_kneser_ney]]'s exact formula, applied corpus-wide
    rather than top-k). High excess = documents with real sequential
    structure the stronger model exploits (learnable signal); excess
    near zero = bag-of-words noise whose ordering teaches nothing —
    exactly RHO's "learnable, worth training on" quadrant once noise
    is filtered. The top 1/{den} by excess (ties by doc_id) are marked
    selected. Documents without a bigram (< 2 tokens) are unscorable
    and excluded by construction.

    Scale shape: two corpus-scale explodes (unigram tf, per-doc bigram
    counts) each partial-aggregated map-side before ONE shuffle; the
    LM tables (ctf, pair, ctx, cont) are vocabulary- resp.
    bigram-type-bounded and join the doc-grain relations on their own
    keys; both per-doc folds run over DISTINCT terms / bigram types
    (<= |doc vocab| addends, the bounded-summation discipline that
    keeps double sums order-stable before the 6-dp round). The global
    selection rank is fixture-exact; at 100 TB the threshold comes
    from a [[sample_md5_threshold]] sample broadcast back, with the
    per-doc scores unchanged."""
    t = tables(spark, sf_dir)
    ws = t.documents.select("doc_id", words().alias("ws"))
    # ---- reference: unigram cross-entropy (nats/token) ----
    tf = (
        ws.select("doc_id", F.explode("ws").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    ctf = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    coll = ctf.agg(F.sum("ctf").alias("coll_len"))
    h_uni = (
        tf.join(ctf, "term")
        .crossJoin(F.broadcast(coll))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                -F.sum(
                    F.col("tf") * F.log(F.col("ctf") / F.col("coll_len"))
                )
                / F.sum("tf")
            ).alias("h_ref"),
        )
    )
    # ---- model: Kneser-Ney bigram cross-entropy (nats/bigram) ----
    bi = (
        ws.filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(ws) - 1),"
                    " i -> struct(ws[i - 1] AS w1, ws[i] AS w2))"
                )
            ).alias("b"),
        )
        .groupBy("doc_id", "b.w1", "b.w2")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    pair = bi.groupBy("w1", "w2").agg(F.sum("n_occ").alias("n"))
    ctx = pair.groupBy("w1").agg(
        F.sum("n").alias("c1"), F.count(F.lit(1)).alias("fanout")
    )
    cont = pair.groupBy("w2").agg(F.count(F.lit(1)).alias("n_hist"))
    types = pair.agg(F.count(F.lit(1)).alias("n_types"))
    p_kn = (
        F.greatest(F.col("n") - _RHO_KN_D, F.lit(0.0)) / F.col("c1")
        + (_RHO_KN_D * F.col("fanout") / F.col("c1"))
        * (F.col("n_hist") / F.col("n_types"))
    )
    h_bi = (
        bi.join(pair, ["w1", "w2"])
        .join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .groupBy("doc_id")
        .agg(
            (-F.sum(F.col("n_occ") * F.log(p_kn)) / F.sum("n_occ")).alias(
                "h_model"
            )
        )
    )
    scored = h_uni.join(h_bi, "doc_id").select(
        "doc_id",
        "n_tokens",
        rnd("h_ref", 6).alias("h_ref"),
        rnd("h_model", 6).alias("h_model"),
        rnd(F.col("h_ref") - F.col("h_model"), 6).alias("excess_loss"),
    )
    w = Window.orderBy(F.desc("excess_loss"), F.asc("doc_id"))
    return scored.select(
        "*",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    ).select(
        "doc_id",
        "n_tokens",
        "h_ref",
        "h_model",
        "excess_loss",
        (F.col("r") * _RHO_SELECT_DEN <= F.col("n")).alias("selected"),
    )


corpus_rho_excess_loss.__doc__ = corpus_rho_excess_loss.__doc__.replace(
    "{den}", str(_RHO_SELECT_DEN)
)


# --------------------------------------------------------------------------
# Eval-side contamination measurement (per-doc n-gram overlap with train)
# --------------------------------------------------------------------------


@query(
    "eval_contamination_ngram_overlap",
    oracle=f"""
    WITH evsh AS (
        SELECT DISTINCT doc_id, unnest({shingles_sql(WORDS_SQL, _DECON_N)})
                   AS sh
        FROM documents
        WHERE {_bucket_sql()} IN {_EVAL_BUCKETS}
    ),
    evset AS (SELECT DISTINCT sh FROM evsh),
    trainsh AS (
        SELECT DISTINCT t.sh
        FROM (SELECT unnest({shingles_sql(WORDS_SQL, _DECON_N)}) AS sh
              FROM documents
              WHERE {_bucket_sql()} NOT IN {_EVAL_BUCKETS}) t
        JOIN evset USING (sh)
    ),
    agg AS (
        SELECT e.doc_id,
               count(*) AS n_sh,
               sum(CASE WHEN m.sh IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        FROM evsh e LEFT JOIN trainsh m ON e.sh = m.sh
        GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(a.n_sh, 0) AS BIGINT) AS n_shingles,
           CAST(coalesce(a.n_hit, 0) AS BIGINT) AS n_contaminated,
           CASE WHEN coalesce(a.n_sh, 0) > 0
                THEN round(a.n_hit * 1.0 / a.n_sh, 6)
           END AS contamination_frac,
           CASE WHEN coalesce(a.n_sh, 0) = 0 THEN 'no_ngrams'
                WHEN a.n_hit = 0 THEN 'clean'
                WHEN 2 * a.n_hit < a.n_sh THEN 'partial'
                ELSE 'dirty' END AS severity
    FROM (SELECT doc_id FROM documents
          WHERE {_bucket_sql()} IN {_EVAL_BUCKETS}) d
    LEFT JOIN agg a USING (doc_id)
    """,
    tags=("corpus", "eval"),
)
def eval_contamination_ngram_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Eval-side contamination MEASUREMENT (Brown et al. 2020 Appendix C;
    the "clean vs dirty" analysis every frontier-model card reports):
    for each held-out eval document, the fraction of its distinct word
    {_DECON_N}-grams that appear anywhere in the train split, with a
    severity bucket (clean = zero overlap, partial < 50%, dirty >= 50%,
    no_ngrams = too short to carry a {_DECON_N}-gram).
    [[corpus_decontaminate]] is the train-side binary DROP; this is the
    complementary eval-side audit that quantifies how much benchmark
    signal survives for the documents a pipeline chooses NOT to drop —
    the number that decides whether an eval score is trustworthy.

    Parity: the hit ratio divides two exact integers (bit-identical
    double), and the 50% severity threshold compares 2*n_hit against
    n_shingles in INTEGER arithmetic — no float crosses a branch.

    Scale shape: the eval split is benchmark-sized by construction, so
    its distinct shingle set broadcasts; the 100-TB train scan is
    explode -> broadcast semi-join -> distinct at matched-shingle
    cardinality (bounded by the EVAL shingle count, not train size).
    Per-doc tallies then join eval-sized relations only — the train
    fact never shuffles on shingle text, the same one-pass shape
    [[corpus_decontaminate]] proves out."""
    t = tables(spark, sf_dir)
    is_eval = _bucket_col().isin(*_EVAL_BUCKETS)
    # tokenize once per side: the inline shingles(words()) re-ran the
    # split pipeline per slice reference (11x per row) — round 11
    ev_doc_sh = (
        t.documents.filter(is_eval)
        .select("doc_id", words("text").alias("w"))
        .select("doc_id", F.explode(shingles("w", _DECON_N)).alias("sh"))
        .distinct()
    )
    ev_set = ev_doc_sh.select("sh").distinct()
    matched = (
        t.documents.filter(~is_eval)
        .select(words("text").alias("w"))
        .select(F.explode(shingles("w", _DECON_N)).alias("sh"))
        .join(F.broadcast(ev_set), "sh", "left_semi")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    agg = (
        ev_doc_sh.join(F.broadcast(matched), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
    )
    base = t.documents.filter(is_eval).select("doc_id")
    n_sh = F.coalesce(F.col("n_sh"), F.lit(0))
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0))
    severity = (
        F.when(n_sh == 0, F.lit("no_ngrams"))
        .when(n_hit == 0, F.lit("clean"))
        .when(2 * n_hit < n_sh, F.lit("partial"))
        .otherwise(F.lit("dirty"))
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        n_sh.cast("long").alias("n_shingles"),
        n_hit.cast("long").alias("n_contaminated"),
        F.when(n_sh > 0, rnd(F.col("n_hit") * 1.0 / F.col("n_sh"), 6)).alias(
            "contamination_frac"
        ),
        severity.alias("severity"),
    )
