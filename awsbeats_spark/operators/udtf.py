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


@query(
    "udtf_json_flatten",
    oracle="""
    SELECT event_id, k AS key,
           json_extract_string(props::JSON, '$.' || k) AS value_str,
           CASE json_type(json_extract(props::JSON, '$.' || k))
                WHEN 'VARCHAR' THEN 'string'
                WHEN 'BOOLEAN' THEN 'boolean'
                WHEN 'NULL' THEN 'null'
                WHEN 'OBJECT' THEN 'json'
                WHEN 'ARRAY' THEN 'json'
                ELSE 'number' END AS value_type
    FROM (
        SELECT event_id, props, unnest(json_keys(props::JSON)) AS k
        FROM events
    )
    """,
)
def udtf_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic JSON flattener as the second Python UDTF: every event's
    props object becomes one row per key with the stringified value and
    a coarse type tag — the schema-on-read primitive a lake pipeline
    runs to DISCOVER what's inside a semi-structured column before
    promoting fields ([[json_parse_promote]] promotes a KNOWN schema;
    this one enumerates an unknown one). A UDTF rather than built-ins
    because the row fan-out depends on runtime VALUES (the key set of
    each object), which no static json_tuple/from_json schema can
    express; the eval is stateless per row, so Spark parallelizes it
    like a projection and the LATERAL join is the native call form.

    Scale shape: map-side only — no shuffle, no state; output is
    bounded by total key occurrences. The oracle replays the same
    enumeration via DuckDB's json_keys."""
    import json

    from pyspark.sql.functions import udtf

    t = tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events_udtf_src")

    @udtf(
        returnType="event_id bigint, key string, value_str string,"
        " value_type string"
    )
    class JsonFlatten:
        def eval(self, event_id: int, props: str):
            try:
                obj = json.loads(props) if props else {}
            except ValueError:
                return
            if not isinstance(obj, dict):
                return
            for k, v in obj.items():
                if v is None:
                    yield event_id, k, None, "null"
                elif isinstance(v, bool):
                    yield event_id, k, "true" if v else "false", "boolean"
                elif isinstance(v, (int, float)):
                    yield event_id, k, str(v), "number"
                elif isinstance(v, str):
                    yield event_id, k, v, "string"
                else:
                    yield event_id, k, json.dumps(
                        v, separators=(",", ":")
                    ), "json"

    spark.udtf.register("json_flatten", JsonFlatten)
    return spark.sql(
        """
        SELECT f.event_id, f.key, f.value_str, f.value_type
        FROM events_udtf_src e,
             LATERAL json_flatten(e.event_id, e.props) f
        """
    )
