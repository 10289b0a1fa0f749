"""Text-analysis operators over the `documents` table: statistics,
language ID, quality scoring, token counting, fingerprinting.

Engine extension (BASELINE.json north star). Every operator is a
single-pass, shuffle-free projection (or one groupBy) built from
JVM-side functions — the per-document work parallelizes embarrassingly
at 100 TB.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import scan_fanout, tables
from awsbeats_spark.functions.textfns import (
    LANG_MARKERS,
    WORDS_SQL,
    marker_hits,
    marker_hits_expr,
    marker_hits_sql,
    shingles,
    shingles_sql,
    words,
    words_expr,
)
from awsbeats_spark.functions.rounding import rnd, rnd_sql
from awsbeats_spark.registry import query

_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "text_stats",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars_calc,
           len({WORDS_SQL}) AS n_words,
           len(list_distinct({WORDS_SQL})) AS n_distinct_words,
           round(list_sum(list_transform({WORDS_SQL}, x -> length(x))) * 1.0
                 / greatest(len({WORDS_SQL}), 1), 4) AS avg_word_len,
           round(len(list_distinct({WORDS_SQL})) * 1.0
                 / greatest(len({WORDS_SQL}), 1), 4) AS type_token_ratio
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (length, vocab size, TTR).

    Staged projections (round 11): the single-select form re-evaluated
    the inline ``words()`` split pipeline 6x per row (once per feature
    reference in the final plan). Materializing the token array, then
    the integer features, leaves one tokenize per row; the arithmetic is
    expression-identical, so the rounded doubles are bit-identical."""
    t = tables(spark, sf_dir)
    feat = t.documents.select(
        "doc_id", F.length("text").alias("n_chars_calc"), words("text").alias("w")
    ).select(
        "doc_id",
        "n_chars_calc",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct_words"),
        F.aggregate("w", F.lit(0), lambda acc, x: acc + F.length(x)).alias("sum_len"),
    )
    denom = F.greatest(F.col("n_words"), F.lit(1))
    return feat.select(
        "doc_id",
        "n_chars_calc",
        "n_words",
        "n_distinct_words",
        rnd(F.col("sum_len") * 1.0 / denom, 4).alias("avg_word_len"),
        rnd(F.col("n_distinct_words") * 1.0 / denom, 4).alias("type_token_ratio"),
    )


_LANG_SCORES_SQL = ",\n           ".join(
    f"{marker_hits_sql(WORDS_SQL, m)} AS score_{lang}" for lang, m in LANG_MARKERS.items()
)


@query(
    "text_lang_id",
    oracle=rf"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_LANG_SCORES_SQL},
               length(text) - length(regexp_replace(text, '[\x{{4e00}}-\x{{9fff}}]', '', 'g'))
                   AS score_zh
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           score_en, score_de, score_fr, score_es, score_zh,
           CASE
             WHEN score_zh > 0 THEN 'zh'
             WHEN score_en >= greatest(score_de, score_fr, score_es) THEN 'en'
             WHEN score_de >= greatest(score_fr, score_es) THEN 'de'
             WHEN score_fr >= score_es THEN 'fr'
             ELSE 'es'
           END AS predicted_lang
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/n-gram language heuristic: count marker-stopword hits per
    language (CJK by codepoint class), pick the max with a fixed
    priority order (en > de > fr > es) for determinism."""
    t = tables(spark, sf_dir)
    # tokenize ONCE: the per-language marker counts over an inline
    # words() re-ran the split pipeline once per language (round 11)
    base = t.documents.select("doc_id", "lang", "text", words("text").alias("w"))
    scores = {
        lang: marker_hits(F.col("w"), markers).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    zh = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"[一-鿿]", ""))
    ).alias("score_zh")
    scored = base.select(
        "doc_id", F.col("lang").alias("labeled_lang"), *scores.values(), zh
    )
    pred = (
        F.when(F.col("score_zh") > 0, F.lit("zh"))
        .when(
            F.col("score_en") >= F.greatest("score_de", "score_fr", "score_es"), F.lit("en")
        )
        .when(F.col("score_de") >= F.greatest("score_fr", "score_es"), F.lit("de"))
        .when(F.col("score_fr") >= F.col("score_es"), F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return scored.withColumn("predicted_lang", pred)


@query(
    "text_quality_score",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id,
               length(text) AS n_chars,
               len({WORDS_SQL}) AS n_words,
               len(list_distinct({WORDS_SQL})) AS n_distinct,
               list_sum(list_transform({WORDS_SQL}, x -> length(x))) AS sum_wl,
               {marker_hits_sql(WORDS_SQL, LANG_MARKERS["en"])} AS stop_hits
        FROM documents
    )
    SELECT doc_id,
           round(least(n_chars / 400.0, 1.0), 4) AS len_score,
           round(least(stop_hits * 5.0 / greatest(n_words, 1), 1.0), 4) AS stopword_score,
           round(n_distinct * 1.0 / greatest(n_words, 1), 4) AS uniq_score,
           round(1.0 - least(abs(sum_wl * 1.0 / greatest(n_words, 1) - 5.0) / 5.0, 1.0), 4)
               AS wordlen_score,
           round(0.25 * least(n_chars / 400.0, 1.0)
               + 0.25 * least(stop_hits * 5.0 / greatest(n_words, 1), 1.0)
               + 0.25 * (n_distinct * 1.0 / greatest(n_words, 1))
               + 0.25 * (1.0 - least(abs(sum_wl * 1.0 / greatest(n_words, 1) - 5.0) / 5.0, 1.0)),
               4) AS quality
    FROM feat
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score in [0,1]: length saturation, stopword
    density, vocabulary uniqueness, mean-word-length plausibility —
    the classic cheap pre-filters for LLM training corpora.

    Staged projections (round 11, guide §4.4 class): building every
    sub-score over the inline ``words()`` expression made Catalyst
    evaluate ``split(lower(text))`` 12x per row in the final plan (each
    score AND the composite re-derived the token array). Materializing
    the token array once, then the integer features once, leaves exactly
    one tokenize per row — CollapseProject keeps the stages separate
    because the non-cheap expressions are referenced more than once.
    The score arithmetic is expression-for-expression the same, so the
    doubles are bit-identical to the single-select form. scan_fanout
    spreads the one-file bench-scale scan (guide §2.5); the math is
    per-row, so row order cannot matter."""
    t = tables(spark, sf_dir)
    from awsbeats_spark.catalog import scan_fanout

    # selectExpr strings throughout (round 11): the Column-API build
    # cost ~1100 py4j roundtrips (~0.25 s); every literal carries the D
    # suffix so the arithmetic stays in DOUBLE exactly as the F.lit
    # forms did (a bare 400.0 parses as DECIMAL in Spark SQL and would
    # change the division's type and low bits).
    feat = (
        scan_fanout(t.documents, sf_dir, "documents")
        .selectExpr("doc_id", "length(text) AS n_chars", f"{words_expr('text')} AS w")
        .selectExpr(
            "doc_id",
            "n_chars",
            "size(w) AS n_words",
            "size(array_distinct(w)) AS n_distinct",
            "aggregate(w, 0, (acc, x) -> acc + length(x)) AS sum_wl",
            f"{marker_hits_expr('w', LANG_MARKERS['en'])} AS stop_hits",
        )
    )
    denom = "greatest(n_words, 1)"
    len_score = "least(n_chars / 400.0D, 1.0D)"
    stop_score = f"least(stop_hits * 5.0D / {denom}, 1.0D)"
    uniq_score = f"n_distinct * 1.0D / {denom}"
    wl_score = f"1.0D - least(abs(sum_wl * 1.0D / {denom} - 5.0D) / 5.0D, 1.0D)"
    quality = (
        f"0.25D * ({len_score}) + 0.25D * ({stop_score})"
        f" + 0.25D * ({uniq_score}) + 0.25D * ({wl_score})"
    )
    return feat.selectExpr(
        "doc_id",
        f"{rnd_sql(len_score, 4)} AS len_score",
        f"{rnd_sql(stop_score, 4)} AS stopword_score",
        f"{rnd_sql(uniq_score, 4)} AS uniq_score",
        f"{rnd_sql(wl_score, 4)} AS wordlen_score",
        f"{rnd_sql(quality, 4)} AS quality",
    )


@query(
    "text_token_count",
    oracle=f"""
    SELECT doc_id,
           len({WORDS_SQL}) AS n_ws_tokens,
           len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n_re_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace tokens, BPE-ish regex
    pre-tokenizer matches (letters|digits|punct), and the chars/4
    heuristic LLM budget estimate."""
    t = tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.size(words()).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0)).alias("n_re_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("est_bpe_tokens"),
    )


_SHINGLES_SQL = shingles_sql(WORDS_SQL)


@query(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(text) AS full_hash,
           -- coalesce: DuckDB array_to_string([]) is NULL where Spark
           -- array_join([]) is '' — bites on docs with < 3 words (no
           -- shingles); same class the sf0.1 sweep caught on
           -- scalar_array_setops in round 10
           coalesce(array_to_string(
               list_sort(list_distinct(list_transform({_SHINGLES_SQL}, s -> md5(s))))[1:5],
               '|'), '') AS winnow_fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: full-content md5 plus a winnowing-style
    fingerprint (5 smallest distinct shingle hashes — a rolling-hash
    sketch stable under small edits). Docs sharing winnow_fp prefixes
    are near-dup candidates via equi-join at scale."""
    t = tables(spark, sf_dir)
    return (
        scan_fanout(t.documents, sf_dir, "documents")
        .select("doc_id", F.md5("text").alias("full_hash"), words().alias("w"))
        .select(
            "doc_id",
            "full_hash",
            F.transform(shingles("w"), lambda s: F.md5(s)).alias("shm"),
        )
        .select(
            "doc_id",
            "full_hash",
            F.array_join(
                F.slice(F.array_sort(F.array_distinct(F.col("shm"))), 1, 5), "|"
            ).alias("winnow_fp"),
        )
    )


@query(
    "text_ngram_freq",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {WORDS_SQL} AS ws FROM documents
    ),
    bigrams AS (
        SELECT ws[i] || ' ' || ws[i + 1] AS bigram
        FROM w, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
    )
    SELECT bigram, count(*) AS freq
    FROM bigrams
    GROUP BY bigram
    ORDER BY freq DESC, bigram
    LIMIT 20
    """,
)
def text_ngram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigram frequencies: per-doc bigram arrays
    (zip the word array with its own tail — no self-join), one explode,
    one count. The corpus-frequency table is what doc-frequency caps and
    stopword lists are built from at 100 TB; bigram ordered by (freq,
    bigram) for a deterministic top-20."""
    t = tables(spark, sf_dir)
    # materialize the token array first: the inline form re-ran the
    # split pipeline once per slice/size reference (4x) — round 11
    w = F.col("w")
    bigrams = F.zip_with(
        F.slice(w, 1, F.greatest(F.size(w) - 1, F.lit(0))),
        F.slice(w, 2, F.greatest(F.size(w) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        t.documents.select(words("text").alias("w"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(20)
    )


@query(
    "text_normalize",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm_text,
           CASE WHEN trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) = ''
                THEN 0
                ELSE len(string_split(
                    trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '))
           END AS n_words_norm
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization (the pre-tokenizer cleanup stage):
    lowercase, collapse every non-alphanumeric run to a single space,
    trim; plus the normalized word count. Pure narrow projection —
    no shuffle, scales embarrassingly; Spark regexp_replace is
    replace-all by default (DuckDB needs the 'g' flag)."""
    t = tables(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    )
    return t.documents.select(
        "doc_id",
        norm.alias("norm_text"),
        F.when(norm == "", 0)
        .otherwise(F.size(F.split(norm, " ")))
        .alias("n_words_norm"),
    )


@query(
    "text_repetition_gopher",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               len({WORDS_SQL}) AS n_words,
               len(list_distinct({WORDS_SQL})) AS n_distinct
        FROM documents
    ),
    bg AS (
        SELECT doc_id, unnest({shingles_sql(n=2)}) AS bigram FROM documents
    ),
    bgc AS (
        SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY doc_id, bigram
    ),
    bga AS (
        SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_bigrams
        FROM bgc GROUP BY doc_id
    )
    SELECT base.doc_id, n_words,
           round(CASE WHEN n_words > 0
                      THEN 1.0 - n_distinct * 1.0 / n_words
                      ELSE 0.0 END, 4) AS dup_word_frac,
           round(CASE WHEN coalesce(n_bigrams, 0) > 0
                      THEN top_cnt * 1.0 / n_bigrams
                      ELSE 0.0 END, 4) AS top_bigram_frac,
           (CASE WHEN n_words > 0
                 THEN 1.0 - n_distinct * 1.0 / n_words
                 ELSE 0.0 END) > 0.6 AS flag_repetitive
    FROM base LEFT JOIN bga ON base.doc_id = bga.doc_id
    """,
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1): per-doc
    duplicate-word fraction and most-frequent-bigram mass, plus the
    repetition filter flag a pretraining pipeline gates on. Engine
    extension — the reference has no text analytics (SURVEY.md §2.C).

    Scale: vocab stats are a shuffle-free projection (array_distinct
    inside the row); the bigram mode needs a real distributed mode —
    explode -> partial-agg on (doc_id, bigram) -> per-doc max — because
    a per-row O(k^2) in-array mode would blow up on long documents.
    Both aggregates and the final join hash on doc_id-derived keys, so
    the stage parallelizes evenly at 100 TB (doc_id is unique; no skew)."""
    t = tables(spark, sf_dir)
    # both sides materialize the token array before deriving from it:
    # the inline words() re-ran the split pipeline per reference (round 11)
    base = t.documents.select("doc_id", words("text").alias("w")).select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
    )
    bga = (
        t.documents.select("doc_id", words("text").alias("w"))
        .select("doc_id", F.explode(shingles("w", 2)).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("n_bigrams"))
    )
    dup = F.when(
        F.col("n_words") > 0, 1.0 - F.col("n_distinct") / F.col("n_words")
    ).otherwise(F.lit(0.0))
    top = F.when(
        F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
        F.col("top_cnt") / F.col("n_bigrams"),
    ).otherwise(F.lit(0.0))
    return base.join(bga, "doc_id", "left").select(
        "doc_id",
        "n_words",
        rnd(dup, 4).alias("dup_word_frac"),
        rnd(top, 4).alias("top_bigram_frac"),
        (dup > 0.6).alias("flag_repetitive"),
    )


@query(
    "text_entropy_char",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(list_transform(generate_series(1, length(text)),
                                             i -> substring(text, i, 1))) AS ch
        FROM documents
    ),
    freq AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2),
    withn AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM freq)
    SELECT doc_id, round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 6) AS char_entropy
    FROM withn GROUP BY doc_id
    """,
)
def text_entropy_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the CCNet/Gopher
    gibberish gate (too-low entropy = repeated chars/boilerplate,
    too-high = random bytes). The char explode stays JVM-side via a
    substring transform over a sequence (no Python, no regex); the
    per-doc distribution is two hash aggregates partitioned by doc_id —
    at 100 TB this shuffles (doc_id, ch) pairs once, bounded by
    |alphabet| per doc."""
    t = tables(spark, sf_dir)
    # length(text) > 0 guard: Spark's sequence(1, 0) yields [1, 0]
    # (negative default step), which would fabricate char rows for an
    # empty document; DuckDB's generate_series(1, 0) is empty, so the
    # oracle simply omits such docs — the filter makes both agree.
    chars = t.documents.filter(F.length("text") > 0).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))")
        ).alias("ch"),
    )
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    p = F.col("c") / F.col("n")
    return (
        freq.select("doc_id", "c", n.alias("n"))
        .groupBy("doc_id")
        .agg(rnd(-F.sum(p * F.log(p)), 6).alias("char_entropy"))
    )


# --------------------------------------------------------------------------
# Readability (Flesch) and corpus Zipf fit — round-3 additions
# --------------------------------------------------------------------------

_SENT_RE = r"[.!?]+"
_SYLL_RE = r"[aeiouy]+"


@query(
    "text_readability_flesch",
    oracle=f"""
    WITH counts AS (
        SELECT doc_id,
               len({WORDS_SQL}) AS n_words,
               greatest(len(regexp_extract_all(text, '{_SENT_RE}')), 1)
                   AS n_sentences,
               len(regexp_extract_all(lower(text), '{_SYLL_RE}'))
                   AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           round(206.835
                 - 1.015 * (n_words * 1.0 / n_sentences)
                 - 84.6 * (n_syllables * 1.0 / greatest(n_words, 1)), 4)
               AS flesch_ease,
           round(0.39 * (n_words * 1.0 / n_sentences)
                 + 11.8 * (n_syllables * 1.0 / greatest(n_words, 1))
                 - 15.59, 4) AS fk_grade
    FROM counts
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease + Flesch-Kincaid grade per document — the
    classic curriculum/difficulty score for training-data selection
    (syllables approximated as vowel-group runs, the standard
    dictionary-free proxy). Pure narrow projection of three regexp
    counts — shuffle-free, embarrassingly parallel at 100 TB, and the
    regexes ([.!?]+ / [aeiouy]+) have identical semantics in Java regex
    and RE2 so both engines count the same runs."""
    t = tables(spark, sf_dir)
    # stage the three counts once: the single-select form re-ran the
    # tokenizer/regex scans per score reference (5x split + 6x
    # regexp_extract_all per row in the final plan) — round 11
    counts = t.documents.select(
        "doc_id",
        F.size(words("text")).alias("n_words"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit(_SENT_RE), F.lit(0))), F.lit(1)
        ).alias("n_sentences"),
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(_SYLL_RE), F.lit(0))
        ).alias("n_syllables"),
    )
    n_words, n_sent, n_syll = (
        F.col("n_words"),
        F.col("n_sentences"),
        F.col("n_syllables"),
    )
    wps = n_words * F.lit(1.0) / n_sent
    spw = n_syll * F.lit(1.0) / F.greatest(n_words, F.lit(1))
    return counts.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        rnd(F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 4).alias(
            "flesch_ease"
        ),
        rnd(F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 4).alias(
            "fk_grade"
        ),
    )


_ZIPF_TOPN = 200


@query(
    "text_zipf_slope",
    oracle=f"""
    WITH tf AS (
        SELECT w AS term, count(*) AS freq
        FROM (SELECT unnest({WORDS_SQL}) AS w FROM documents)
        GROUP BY w
    ),
    top AS (
        SELECT term, freq,
               row_number() OVER (ORDER BY freq DESC, term) AS rnk
        FROM tf
        QUALIFY rnk <= {_ZIPF_TOPN}
    )
    SELECT round(regr_slope(ln(freq), ln(rnk)), 4) AS zipf_slope,
           round(regr_intercept(ln(freq), ln(rnk)), 4) AS zipf_intercept,
           round(regr_r2(ln(freq), ln(rnk)), 4) AS zipf_r2,
           count(*) AS n_terms
    FROM top
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus Zipf fit: OLS slope/intercept/R^2 of ln(freq) on ln(rank)
    over the top-200 terms — the standard corpus-health diagnostic
    (natural text fits slope ~ -1; a boilerplate-heavy or synthetic
    corpus bends away). Scale shape: ONE term-frequency aggregation
    (explode -> groupBy term, map-side combined, bounded by |vocab|),
    then global top-200 via TakeOrderedAndProject — the 200-row window
    and regression run on a single tiny partition; the 100-TB scan
    never feeds a global sort."""
    t = tables(spark, sf_dir)
    tf = (
        t.documents.select(F.explode(words()).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = (
        tf.orderBy(F.desc("freq"), F.asc("term"))
        .limit(_ZIPF_TOPN)
        .withColumn(
            "rnk",
            F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("term"))),
        )
    )
    lf, lr = F.log("freq"), F.log("rnk")
    return top.agg(
        rnd(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        rnd(F.regr_intercept(lf, lr), 4).alias("zipf_intercept"),
        rnd(F.regr_r2(lf, lr), 4).alias("zipf_r2"),
        F.count(F.lit(1)).alias("n_terms"),
    )


_PMI_MIN_COUNT = 5
_PMI_TOPN = 20

_BIGRAMS_SQL = f"""
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM (SELECT {WORDS_SQL} AS ws FROM documents),
             LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
"""


@query(
    "text_pmi_collocations",
    oracle=f"""
    WITH bi AS ({_BIGRAMS_SQL}),
    bc AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY 1, 2),
    marg AS (
        SELECT w1, w2, c,
               sum(c) OVER (PARTITION BY w1) AS c1,
               sum(c) OVER (PARTITION BY w2) AS c2,
               sum(c) OVER () AS n
        FROM bc
    )
    SELECT w1, w2, CAST(c AS BIGINT) AS pair_count,
           round(ln(c * 1.0 * n / (c1 * c2)), 4) AS pmi
    FROM marg
    WHERE c >= {_PMI_MIN_COUNT}
    ORDER BY pmi DESC, w1, w2
    LIMIT {_PMI_TOPN}
    """,
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by pointwise mutual information over
    adjacent word pairs (min pair count 5): PMI = ln(P(w1,w2) /
    P(w1·)P(·w2)) — the classic multiword-expression detector that
    finds 'new york'-style units a whitespace tokenizer splits (feeds
    tokenizer vocab curation and phrase-aware dedup).

    Scale shape: ONE explode pass aggregates to bigram counts; both
    marginals are window sums over that aggregate (no re-scan, no
    self-join) and the min-count filter prunes the long tail before
    ranking; top-k is TakeOrderedAndProject."""
    docs = tables(spark, sf_dir).documents
    # materialize the token array first: the inline form re-ran the
    # split pipeline once per size/slice reference (5x) — round 11
    w = F.col("w")
    bi = docs.select(words("text").alias("w")).select(
        F.explode(
            F.when(
                F.size(w) >= 2,
                F.zip_with(
                    F.slice(w, 1, F.size(w) - 1),
                    F.slice(w, 2, F.size(w) - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    bc = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    marg = bc.select(
        "w1",
        "w2",
        "c",
        F.sum("c").over(Window.partitionBy("w1")).alias("c1"),
        F.sum("c").over(Window.partitionBy("w2")).alias("c2"),
        F.sum("c").over(Window.partitionBy(F.lit(1))).alias("n"),
    )
    return (
        marg.filter(F.col("c") >= _PMI_MIN_COUNT)
        .select(
            "w1",
            "w2",
            F.col("c").alias("pair_count"),
            rnd(
                F.log(F.col("c") * 1.0 * F.col("n") / (F.col("c1") * F.col("c2"))),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(_PMI_TOPN)
    )


# --------------------------------------------------------------------------
# Code-vs-prose detection heuristics
# --------------------------------------------------------------------------

_CODE_SYM_RE = r"[{}();=<>\[\]]"
_CODE_DIGIT_RE = r"[0-9]"
_CODE_CAMEL_RE = r"[a-z][A-Z]"
_CODE_THRESHOLD = 0.05


@query(
    "text_code_detect",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               length(text) AS n,
               len(regexp_extract_all(text, '{_CODE_SYM_RE.replace("'", "''")}')) AS n_sym,
               len(regexp_extract_all(text, '{_CODE_DIGIT_RE}')) AS n_digit,
               len(regexp_extract_all(text, '{_CODE_CAMEL_RE}')) AS n_camel
        FROM documents
    )
    SELECT doc_id,
           round(n_sym * 1.0 / greatest(n, 1), 6) AS sym_ratio,
           round(n_digit * 1.0 / greatest(n, 1), 6) AS digit_ratio,
           round(n_camel * 1.0 / greatest(n, 1), 6) AS camel_ratio,
           round((3.0 * n_sym + 1.0 * n_digit + 2.0 * n_camel)
                 / greatest(n, 1), 6) AS code_score,
           CAST((3.0 * n_sym + 1.0 * n_digit + 2.0 * n_camel)
                 / greatest(n, 1) > {_CODE_THRESHOLD} AS INT) AS is_code
    FROM feats
    """,
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic code-vs-prose classifier: density of code-ish symbols
    (braces/semicolons/operators), digits, and camelCase boundaries,
    combined into a weighted score with a fixed threshold — the cheap
    first-stage router that decides which quality pipeline (code vs
    natural language) a crawled document enters. Single-pass projection
    of JVM `regexp_count` expressions; embarrassingly parallel, no
    shuffle, fully codegen'd."""
    t = tables(spark, sf_dir)
    # stage the regex counts once: the single-select form re-ran each
    # regexp scan per ratio/score reference (9x per row) — round 11
    feats = t.documents.select(
        "doc_id",
        F.greatest(F.length("text"), F.lit(1)).alias("n"),
        F.regexp_count("text", F.lit(_CODE_SYM_RE)).alias("n_sym"),
        F.regexp_count("text", F.lit(_CODE_DIGIT_RE)).alias("n_digit"),
        F.regexp_count("text", F.lit(_CODE_CAMEL_RE)).alias("n_camel"),
    )
    n, n_sym, n_digit, n_camel = (
        F.col("n"),
        F.col("n_sym"),
        F.col("n_digit"),
        F.col("n_camel"),
    )
    score = (3.0 * n_sym + 1.0 * n_digit + 2.0 * n_camel) / n
    return feats.select(
        "doc_id",
        rnd(n_sym / n, 6).alias("sym_ratio"),
        rnd(n_digit / n, 6).alias("digit_ratio"),
        rnd(n_camel / n, 6).alias("camel_ratio"),
        rnd(score, 6).alias("code_score"),
        (score > _CODE_THRESHOLD).cast("int").alias("is_code"),
    )


# --------------------------------------------------------------------------
# RAKE-style keyword extraction (degree/frequency over stopword phrases)
# --------------------------------------------------------------------------

_RAKE_STOP_RE = (
    r"\b(a|an|the|and|or|of|in|on|to|is|are|was|were|for|with|as|at|by|"
    r"it|this|that|be|from|not|but|has|have|had|its|their|they|we|you)\b"
    r"|[^a-z0-9\s]+"
)
_RAKE_TOPK = 3


@query(
    "text_keyword_rake_topk",
    oracle=f"""
    WITH phrases AS (
        SELECT doc_id, p
        FROM (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text),
                          '{_RAKE_STOP_RE}')) AS p
            FROM documents
        )
    ),
    pw AS (
        SELECT doc_id,
               list_filter(string_split_regex(p, '\\s+'), x -> x <> '') AS ws
        FROM phrases
    ),
    exploded AS (
        SELECT doc_id, unnest(ws) AS word, len(ws) AS phrase_len
        FROM pw WHERE len(ws) > 0
    ),
    scored AS (
        SELECT doc_id, word,
               CAST(count(*) AS BIGINT) AS freq,
               CAST(sum(phrase_len) AS BIGINT) AS degree,
               round(sum(phrase_len) * 1.0 / count(*), 6) AS rake_score
        FROM exploded GROUP BY doc_id, word
    )
    SELECT doc_id, word, freq, degree, rake_score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id
            ORDER BY rake_score DESC, freq DESC, word
        ) AS rn
        FROM scored
    ) WHERE rn <= {_RAKE_TOPK}
    """,
)
def text_keyword_rake_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE-lite keyword extraction: split each document into candidate
    phrases at stopwords/punctuation, score every word by
    degree/frequency (degree = summed length of the phrases it appears
    in — rewards words that anchor long content phrases), keep the
    top-3 per document with a deterministic (score, freq, word)
    tiebreaker. Scale shape: phrase split + word explode are per-row
    JVM expressions; the score is one (doc, word) aggregate and the
    top-k window partitions BY DOC (bounded partitions, WindowGroupLimit
    prunes to k per doc before the final sort) — nothing global, no
    Python."""
    t = tables(spark, sf_dir)
    phrases = t.documents.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.col("text")), _RAKE_STOP_RE)
        ).alias("p"),
    )
    pw = phrases.select(
        "doc_id",
        F.filter(
            F.split(F.col("p"), r"\s+"), lambda x: x != ""
        ).alias("ws"),
    ).filter(F.size("ws") > 0)
    exploded = pw.select(
        "doc_id", F.explode("ws").alias("word"), F.size("ws").alias("phrase_len")
    )
    scored = exploded.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("phrase_len").alias("degree"),
        rnd(F.sum("phrase_len") / F.count(F.lit(1)), 6).alias("rake_score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("rake_score"), F.desc("freq"), F.asc("word")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _RAKE_TOPK)
        .select("doc_id", "word", "freq", "degree", "rake_score")
    )


# --------------------------------------------------------------------------
# Compression-ratio quality signal (Arrow-batched zlib UDF)
# --------------------------------------------------------------------------


@query("text_compression_ratio", oracle=None)
def text_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality proxy (Gopher/FineWeb-style): highly
    compressible text is repetitive boilerplate, incompressible text is
    often noise; the sweet spot predicts natural prose. zlib lives in
    Python, so this is the documented Arrow-batched slow path — ONE
    vectorized pandas UDF over the text column, no per-row Python call
    through py4j, no shuffle; at 100 TB the decode cost parallelizes
    embarrassingly exactly like the multimodal decoders. Deterministic
    (zlib level 6), but no SQL engine can replicate it, so this is a
    rows-only key (driver records a rows-only check — the semantic
    pins live in tests/test_round3l_ops.py)."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def comp_ratio(texts: pd.Series) -> pd.Series:
        def ratio(s: str) -> float:
            raw = s.encode("utf-8")
            if not raw:
                return 1.0
            return round(len(zlib.compress(raw, 6)) / len(raw), 6)

        # na_action='ignore': NULL text rows pass through as null
        # instead of crashing the task on None.encode
        return texts.map(ratio, na_action="ignore")

    t = tables(spark, sf_dir)
    ratio_col = comp_ratio(F.col("text"))
    return t.documents.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("raw_bytes"),
        ratio_col.alias("compression_ratio"),
        (ratio_col < 0.35).cast("int").alias("too_repetitive"),
        (ratio_col > 0.95).cast("int").alias("too_random"),
    )


# --------------------------------------------------------------------------
# Per-source Jensen-Shannon divergence from the corpus word distribution
# --------------------------------------------------------------------------


@query(
    "text_source_js_divergence",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({WORDS_SQL}) AS w FROM documents
    ),
    src AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS n
        FROM tok GROUP BY 1, 2
    ),
    src_tot AS (SELECT source, sum(n) AS st FROM src GROUP BY 1),
    corp AS (SELECT w, sum(n) AS cn FROM src GROUP BY 1),
    corp_tot AS (SELECT sum(cn) AS ct FROM corp),
    terms AS (
        SELECT s.source,
               s.n * 1.0 / t.st AS p,
               c.cn * 1.0 / ct.ct AS q
        FROM src s
        JOIN src_tot t USING (source)
        JOIN corp c USING (w)
        CROSS JOIN corp_tot ct
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_vocab,
           round(sum(0.5 * p * ln(2.0 * p / (p + q))
                     + 0.5 * q * ln(2.0 * q / (p + q)))
                 + 0.5 * (1.0 - sum(q)) * ln(2.0), 6) AS js_divergence
    FROM terms GROUP BY source
    """,
)
def text_source_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift for text: Jensen-Shannon divergence (nats)
    between each source's unigram distribution and the corpus-wide
    one — the source-mix health check that flags a crawler gone off
    the rails. Since every source word also exists in the corpus
    distribution, only the q-mass of words ABSENT from the source
    needs the closed-form correction 0.5·(1-Σq)·ln2 (for those words
    p=0, so their JS term is 0.5·q·ln2) — no outer join against the
    full vocabulary required. Scale shape: one (source, word)
    aggregate, corpus marginals derived from it (exchange reuse on
    the word key), broadcast totals; everything is bucket-level after
    the single tokenize pass."""
    t = tables(spark, sf_dir)
    tok = t.documents.select("source", F.explode(words()).alias("w"))
    src = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("n"))
    src_tot = src.groupBy("source").agg(F.sum("n").alias("st"))
    corp = src.groupBy("w").agg(F.sum("n").alias("cn"))
    corp_tot = corp.agg(F.sum("cn").alias("ct"))
    terms = (
        src.join(src_tot, "source")
        .join(corp, "w")
        .crossJoin(F.broadcast(corp_tot))
        .select(
            "source",
            (F.col("n") / F.col("st")).alias("p"),
            (F.col("cn") / F.col("ct")).alias("q"),
        )
    )
    p, q = F.col("p"), F.col("q")
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_vocab"),
        rnd(
            F.sum(
                0.5 * p * F.log(2.0 * p / (p + q))
                + 0.5 * q * F.log(2.0 * q / (p + q))
            )
            # absent-word correction: ln(2) as a literal so Spark and
            # DuckDB use the identical constant
            + 0.5 * (1.0 - F.sum(q)) * F.lit(0.6931471805599453),
            6,
        ).alias("js_divergence"),
    )


# --------------------------------------------------------------------------
# Word burstiness (Church-Gale cf/df) for the top collection terms
# --------------------------------------------------------------------------

_BURST_TOPN = 50


@query(
    "text_word_burstiness",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents
    ),
    stats AS (
        SELECT w,
               CAST(count(*) AS BIGINT) AS cf,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY w
    )
    SELECT w AS word, cf, df,
           round(cf * 1.0 / df, 6) AS burstiness
    FROM stats
    ORDER BY cf DESC, w
    LIMIT {_BURST_TOPN}
    """,
)
def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale word burstiness for the top-50 collection terms:
    collection frequency over document frequency — 1.0 means a word
    appears once wherever it appears (function-word behavior), high
    values mean it clumps into few documents (topical/bursty terms,
    and in crawl data, spam markers). Scale shape: ONE (word)
    aggregate computing cf and df together from a single tokenize
    pass; the top-k is TakeOrdered on |vocab| rows. At 100 TB the
    word would be hashed for the shuffle and re-joined for display."""
    t = tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(words()).alias("w"))
    stats = tok.groupBy("w").agg(
        F.count(F.lit(1)).alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    )
    return (
        stats.orderBy(F.desc("cf"), F.asc("w"))
        .limit(_BURST_TOPN)
        .select(
            F.col("w").alias("word"),
            "cf",
            "df",
            rnd(F.col("cf") / F.col("df"), 6).alias("burstiness"),
        )
    )


# --------------------------------------------------------------------------
# Language-ID evaluation: confusion matrix + per-class precision/recall
# --------------------------------------------------------------------------


def _langid_eval_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    return f"""
    WITH pred AS ({QUERIES['text_lang_id'].oracle}),
    cells AS (
        SELECT labeled_lang AS gold, predicted_lang AS predicted,
               CAST(count(*) AS BIGINT) AS n
        FROM pred GROUP BY 1, 2
    ),
    gold_tot AS (SELECT gold, sum(n) AS ng FROM cells GROUP BY 1),
    pred_tot AS (SELECT predicted, sum(n) AS np FROM cells GROUP BY 1)
    SELECT c.gold, c.predicted, c.n,
           round(c.n * 1.0 / g.ng, 6) AS recall_share,
           round(c.n * 1.0 / p.np, 6) AS precision_share
    FROM cells c
    JOIN gold_tot g USING (gold)
    JOIN pred_tot p USING (predicted)
    """


@query("eval_langid_confusion", oracle=_langid_eval_oracle())
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a first-class operator: the confusion
    matrix of the text_lang_id heuristic against the corpus's gold
    `lang` labels, each (gold, predicted) cell carrying its share of
    the gold class (row-normalized = recall contribution) and of the
    predicted class (column-normalized = precision contribution). The
    diagonal's recall_share IS per-class recall; the diagonal's
    precision_share IS per-class precision — the quality gate an
    LLM-data pipeline puts on its language router before mixing
    corpora. Composes the REGISTERED lang-id operator (same DataFrame,
    same oracle embedded as a CTE), so the eval can never drift from
    the thing it evaluates. Scale shape: one classify pass, one
    (gold, predicted) aggregate — at most |langs|^2 cells regardless
    of corpus size; the share joins run on that tiny cell table."""
    from awsbeats_spark.registry import QUERIES

    pred = QUERIES["text_lang_id"].fn(spark, sf_dir)
    cells = (
        pred.groupBy(
            F.col("labeled_lang").alias("gold"),
            F.col("predicted_lang").alias("predicted"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    gold_tot = cells.groupBy("gold").agg(F.sum("n").alias("ng"))
    pred_tot = cells.groupBy("predicted").agg(F.sum("n").alias("np"))
    return (
        cells.join(gold_tot, "gold")
        .join(pred_tot, "predicted")
        .select(
            "gold",
            "predicted",
            "n",
            rnd(F.col("n") / F.col("ng"), 6).alias("recall_share"),
            rnd(F.col("n") / F.col("np"), 6).alias("precision_share"),
        )
    )


# --------------------------------------------------------------------------
# Cross-source vocabulary overlap: word-set Jaccard between source pairs
# --------------------------------------------------------------------------


@query(
    "text_source_vocab_overlap",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT source, unnest({WORDS_SQL}) AS w
        FROM documents
    ),
    sizes AS (SELECT source, count(*) AS nv FROM vocab GROUP BY source),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b,
               count(*) AS n_common
        FROM vocab a JOIN vocab b
          ON a.w = b.w AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT p.source_a, p.source_b,
           CAST(sa.nv AS BIGINT) AS vocab_a,
           CAST(sb.nv AS BIGINT) AS vocab_b,
           CAST(p.n_common AS BIGINT) AS n_common,
           round(p.n_common
                 / CAST(sa.nv + sb.nv - p.n_common AS DOUBLE), 6)
               AS jaccard
    FROM pairs p
    JOIN sizes sa ON sa.source = p.source_a
    JOIN sizes sb ON sb.source = p.source_b
    """,
)
def text_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary Jaccard between every pair of corpus sources: how
    much lexical ground two ingest streams share. The mix-design
    companion to text_source_js_divergence (which weighs FREQUENCIES)
    — set overlap answers the coarser question first: are these
    sources even writing about the same things? Near-1 pairs are
    redundancy candidates for the mixer; near-0 pairs are where a
    tokenizer trained on one source will shatter the other.

    Scale shape: the corpus explodes once to DISTINCT (source, word)
    rows — vocabulary-sized, not token-sized — and the pair join runs
    on the word key at vocabulary cardinality with source<source
    halving; counts fold map-side. |sources| is small, |vocab| is the
    scale axis, and nothing ever joins token-level rows."""
    docs = tables(spark, sf_dir).documents
    vocab = (
        docs.select("source", F.explode(words()).alias("w")).distinct()
    )
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("nv"))
    a = vocab.select(F.col("source").alias("source_a"), "w")
    b = vocab.select(F.col("source").alias("source_b"), "w")
    pairs = (
        a.join(b, "w")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("nv").alias("vocab_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("nv").alias("vocab_b")
    )
    j = pairs.join(sa, "source_a").join(sb, "source_b")
    return j.select(
        "source_a",
        "source_b",
        F.col("vocab_a").cast("long").alias("vocab_a"),
        F.col("vocab_b").cast("long").alias("vocab_b"),
        F.col("n_common").cast("long").alias("n_common"),
        rnd(
            F.col("n_common")
            / (
                F.col("vocab_a") + F.col("vocab_b") - F.col("n_common")
            ).cast("double"),
            6,
        ).alias("jaccard"),
    )


# --------------------------------------------------------------------------
# Hapax legomena ratio: vocabulary richness per source
# --------------------------------------------------------------------------


@query(
    "text_hapax_ratio",
    oracle=f"""
    WITH tok AS (
        SELECT source, unnest({WORDS_SQL}) AS tok FROM documents
    ),
    tf AS (
        SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS vocab,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (c = 1) AS BIGINT) AS n_hapax,
           round(count(*) FILTER (c = 1) * 1.0 / count(*), 6)
               AS hapax_ratio,
           round(count(*) * 1.0 / sum(c), 6) AS type_token_ratio
    FROM tf GROUP BY source
    """,
)
def text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-richness audit per source: hapax legomena (terms
    occurring exactly once) as a share of the vocabulary, plus the raw
    type-token ratio. A natural corpus keeps a large hapax share
    (Zipf's tail); a templated or heavily duplicated source shows a
    collapsing hapax ratio long before exact dedup finds the copies —
    the cheap screening complement to [[corpus_vocab_growth_heaps]]'s
    growth-curve fit.

    Scale shape: tokenize-explode, then two stacked hash aggregates —
    (source, term) partial-aggregates map-side before its shuffle, and
    the per-source fold runs on vocabulary-grain rows. No windows, no
    joins; term keys are near-unique so no skew."""
    t = tables(spark, sf_dir)
    tf = (
        t.documents.select("source", F.explode(words()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum("c").cast("long").alias("n_tokens"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n_hapax"),
        rnd(
            F.sum((F.col("c") == 1).cast("long")) / F.count(F.lit(1)), 6
        ).alias("hapax_ratio"),
        rnd(F.count(F.lit(1)) / F.sum("c"), 6).alias("type_token_ratio"),
    )


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer et al. 2003 — the MOSS algorithm)
# --------------------------------------------------------------------------

_WINNOW_W = 4  # window size over the k-gram hash sequence


@query(
    "text_winnowing_fingerprints",
    oracle=f"""
    WITH shs AS (
        SELECT doc_id, {shingles_sql(WORDS_SQL)} AS arr FROM documents
    ),
    pos AS (
        SELECT doc_id, len(arr) AS L, unnest(arr) AS sh,
               unnest(range(1, 1 + len(arr))) AS p
        FROM shs WHERE len(arr) >= {_WINNOW_W}
    ),
    hv AS (
        SELECT doc_id, L, p,
               CAST(('0x' || substring(md5(sh), 1, 8))::BIGINT AS BIGINT)
                   AS h
        FROM pos
    ),
    wins AS (
        SELECT doc_id, L, p, h,
               unnest(generate_series(greatest(1, p - {_WINNOW_W - 1}),
                                      least(p, L - {_WINNOW_W - 1}))) AS j
        FROM hv
    ),
    sel AS (
        SELECT doc_id, L, j, p, h,
               row_number() OVER (
                   PARTITION BY doc_id, j ORDER BY h, p DESC) AS rn
        FROM wins
    ),
    fps AS (
        SELECT DISTINCT doc_id, L, p, h FROM sel WHERE rn = 1
    )
    SELECT doc_id,
           CAST(max(L) AS BIGINT) AS n_grams,
           CAST(max(L) - {_WINNOW_W - 1} AS BIGINT) AS n_windows,
           CAST(count(*) AS BIGINT) AS n_fingerprints,
           round(count(*) * 1.0 / max(L), 6) AS density,
           md5(string_agg(CAST(p AS VARCHAR) || ':' || CAST(h AS VARCHAR),
                          '|' ORDER BY p)) AS fp_digest
    FROM fps GROUP BY doc_id
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE winnowing (Schleimer, Wilkerson & Aiken 2003 — the MOSS
    plagiarism-detector selection rule), not the bottom-k sketch
    [[text_fingerprint]] ships: slide a w={w} window over the doc's
    k-gram hash sequence and record each window's MINIMUM hash
    (rightmost on ties), deduped. Winnowing's guarantee — any shared
    substring of >= w+k-1 words yields at least one shared fingerprint,
    with expected density 2/(w+1) — is what makes it the local
    fingerprinting standard: unlike bottom-k it is POSITIONAL, so
    matches localize to regions, and density is bounded per document
    regardless of length. Emits per-doc fingerprint count, density,
    and a digest of the (position, hash) set; at 100 TB the exploded
    (doc, p, h) fingerprint rows would feed an equi-join on h for
    local-overlap candidate pairs.

    Engine parity: hashes are 32-bit md5-prefix integers; selection is
    pure integer argmin with a pinned (h ASC, p DESC) tie-break —
    min_by over a (h, -p) struct in Spark, a row_number window in
    DuckDB. Scale shape: every stage is map-side or keyed by
    (doc_id, window) — the window explode is a bounded x{w} fan-out of
    narrow integer rows, the argmin is one hash aggregate with
    map-side combine, and nothing pairs docs with docs."""
    t = tables(spark, sf_dir)
    # tokenize once, then shingle over the materialized attribute: the
    # inline shingles(words()) re-ran the split pipeline per slice/size
    # reference. The min-length gate rides a generator (the
    # project_record idiom) because a plain filter(size(arr) >= w) gets
    # pushed below both projections and re-inlines the whole tokenize+
    # shingle pipeline into the scan filter (5x per row) — round 11.
    shs = (
        t.documents.select("doc_id", words("text").alias("w"))
        .select("doc_id", shingles("w").alias("arr"))
        .select(
            "doc_id",
            "arr",
            F.explode(
                F.array_compact(
                    F.array(F.when(F.size("arr") >= _WINNOW_W, F.lit(1)))
                )
            ).alias("_keep"),
        )
        .drop("_keep")
    )
    pos = shs.select(
        "doc_id",
        F.size("arr").alias("L"),
        F.posexplode("arr").alias("p0", "sh"),
    ).select(
        "doc_id",
        "L",
        (F.col("p0") + 1).alias("p"),
        F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    wins = pos.select(
        "doc_id",
        "L",
        "p",
        "h",
        F.explode(
            F.sequence(
                F.greatest(F.lit(1), F.col("p") - (_WINNOW_W - 1)),
                F.least(F.col("p"), F.col("L") - (_WINNOW_W - 1)),
            )
        ).alias("j"),
    )
    sel = wins.groupBy("doc_id", "j").agg(
        F.any_value("L").alias("L"),
        F.min_by(
            F.struct("p", "h"), F.struct(F.col("h"), -F.col("p"))
        ).alias("m"),
    )
    fps = sel.select(
        "doc_id", "L", F.col("m.p").alias("p"), F.col("m.h").alias("h")
    ).distinct()
    return fps.groupBy("doc_id").agg(
        F.max("L").cast("long").alias("n_grams"),
        (F.max("L") - (_WINNOW_W - 1)).cast("long").alias("n_windows"),
        F.count(F.lit(1)).alias("n_fingerprints"),
        rnd(F.count(F.lit(1)) / F.max("L"), 6).alias("density"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "h"))),
                    lambda s: F.concat(
                        s["p"].cast("string"),
                        F.lit(":"),
                        s["h"].cast("string"),
                    ),
                ),
                "|",
            )
        ).alias("fp_digest"),
    )


text_winnowing_fingerprints.__doc__ = (
    text_winnowing_fingerprints.__doc__.replace("{w}", str(_WINNOW_W))
)


# --------------------------------------------------------------------------
# Unigram LM perplexity filter (CCNet-style head/middle/tail buckets)
# --------------------------------------------------------------------------


@query(
    "text_unigram_perplexity",
    oracle=f"""
    WITH tf AS (
        SELECT doc_id, w AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest({WORDS_SQL}) AS w FROM documents)
        GROUP BY doc_id, w
    ),
    ctf AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY term),
    coll AS (SELECT sum(ctf) AS coll_len FROM ctf),
    perdoc AS (
        SELECT tf.doc_id,
               CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
               round(exp(-sum(tf.tf * ln(ctf.ctf * 1.0 / coll.coll_len))
                         / sum(tf.tf)), 6) AS ppl
        FROM tf JOIN ctf USING (term) CROSS JOIN coll
        GROUP BY tf.doc_id
    ),
    ranked AS (
        SELECT doc_id, n_tokens, ppl,
               row_number() OVER (ORDER BY ppl, doc_id) AS r,
               count(*) OVER () AS n
        FROM perdoc
    )
    SELECT doc_id, n_tokens, ppl,
           CASE WHEN r * 3 <= n THEN 'head'
                WHEN r * 3 <= 2 * n THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM ranked
    """,
    tags=("text", "quality"),
)
def text_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under the corpus unigram language model —
    the SQL-expressible proxy for CCNet's KenLM perplexity filter
    (Wenzek et al. 2020): ppl(d) = exp(-(1/|d|) Σ_w tf(w,d)·ln p(w)),
    p(w) the corpus MLE, then docs split into head/middle/tail
    perplexity terciles exactly as CCNet shards its output. Low-ppl
    docs look like the corpus (keep), high-ppl docs are outliers
    (review/drop). No reference analog (delivery-only); engine
    extension in the brief's text-quality lane alongside
    [[text_quality_score]] and [[text_repetition_gopher]].

    Scale shape: two |vocab|-bounded aggregates (ctf, coll_len,
    broadcast back) and one per-doc fold over its DISTINCT terms —
    the sum has ≤|vocab ∩ doc| addends, not |d|, because tf·ln(p)
    groups repeated tokens. The tercile split here is a global rank
    window (fixture-exact); at 100 TB you'd take CCNet's own route —
    fit thresholds on a [[sample_md5_threshold]] sample, broadcast the
    two cut values, and bucket map-side — the per-doc ppl column this
    op computes is unchanged by that swap.

    Float parity: ln/exp on identical doubles, ≤|vocab| addends per
    doc, 6-dp round before both output and the tercile ranking (ties
    broken by doc_id in both engines).
    """
    t = tables(spark, sf_dir)
    toks = t.documents.select("doc_id", F.explode(words()).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    ctf = tf.groupBy("term").agg(F.sum("tf").alias("ctf"))
    coll = ctf.agg(F.sum("ctf").alias("coll_len"))
    perdoc = (
        tf.join(F.broadcast(ctf), "term")
        .crossJoin(F.broadcast(coll))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            rnd(
                F.exp(
                    -F.sum(
                        F.col("tf")
                        * F.log(F.col("ctf") / F.col("coll_len"))
                    )
                    / F.sum("tf")
                ),
                6,
            ).alias("ppl"),
        )
    )
    w = Window.orderBy(F.asc("ppl"), F.asc("doc_id"))
    ranked = perdoc.select(
        "doc_id",
        "n_tokens",
        "ppl",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    bucket = (
        F.when(F.col("r") * 3 <= F.col("n"), F.lit("head"))
        .when(F.col("r") * 3 <= 2 * F.col("n"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        "doc_id", "n_tokens", "ppl", bucket.alias("ppl_bucket")
    )
