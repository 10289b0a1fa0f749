"""Python UDTF (user-defined table function) surface — Spark 4's
row-to-rows extension seam, exercised as a first-class operator.

The reference has no extension API at all (static Go plugin); the
engine's UDTF key shows where a custom tokenizer / parser / expander
plugs in when no built-in generator expresses it. The scale rule from
the north star applies: a UDTF is Python in the row loop, so anything
expressible as split+posexplode (like this demo's sentence split)
should use built-ins in the hot path — the UDTF exists for the cases
that genuinely can't (stateful parsers, external tokenizers), and this
key keeps the seam tested end-to-end including SQL LATERAL invocation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from awsbeats_spark.catalog import tables
from awsbeats_spark.registry import query


@query(
    "udtf_sentence_split",
    oracle=r"""
    WITH s AS (
        SELECT doc_id,
               list_filter(
                   list_transform(string_split_regex(text, '[.!?]+'),
                                  x -> trim(x)),
                   x -> x <> '') AS sents
        FROM documents
    )
    SELECT doc_id, i - 1 AS sent_idx, sents[i] AS sentence,
           length(sents[i]) AS n_chars
    FROM s, unnest(generate_series(1, len(sents))) AS t(i)
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation as a Python UDTF invoked through SQL
    LATERAL: each (doc_id, text) row yields one row per sentence with
    its position and length. The UDTF eval is pure per-row (no state,
    no partition assumptions), so Spark parallelizes it like any
    projection; the LATERAL join is the UDTF's native call form."""
    from pyspark.sql.functions import udtf

    t = tables(spark, sf_dir)
    t.documents.createOrReplaceTempView("documents")

    @udtf(returnType="doc_id bigint, sent_idx int, sentence string, n_chars int")
    class SentenceSplit:
        def eval(self, doc_id: int, text: str):
            import re

            idx = 0
            for raw in re.split(r"[.!?]+", text or ""):
                sent = raw.strip()
                if not sent:
                    continue
                yield doc_id, idx, sent, len(sent)
                idx += 1

    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM documents d, LATERAL sentence_split(d.doc_id, d.text) s
        """
    )
