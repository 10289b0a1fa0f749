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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.functions.textfns import WORDS_SQL, words
from awsbeats_spark.registry import query


def _sentence_split_cls():
    """Module-level so the hypothesis properties drive the identical
    class the operator registers (same pattern as NdjsonRepair)."""
    from pyspark.sql.functions import udtf

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

    return SentenceSplit


SentenceSplit = _sentence_split_cls()


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
    t = tables(spark, sf_dir)
    t.documents.createOrReplaceTempView("documents")

    spark.udtf.register("sentence_split", SentenceSplit)
    return spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM documents d, LATERAL sentence_split(d.doc_id, d.text) s
        """
    )


def _json_flatten_cls():
    """Module-level so the hypothesis properties drive the identical
    class the operator registers (same pattern as NdjsonRepair)."""
    import json

    from pyspark.sql.functions import udtf

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

    return JsonFlatten


JsonFlatten = _json_flatten_cls()


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
    t = tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events_udtf_src")

    spark.udtf.register("json_flatten", JsonFlatten)
    return spark.sql(
        """
        SELECT f.event_id, f.key, f.value_str, f.value_type
        FROM events_udtf_src e,
             LATERAL json_flatten(e.event_id, e.props) f
        """
    )


# --------------------------------------------------------------------------
# PCM frame parser UDTF: binary container walk -> per-frame rows
# --------------------------------------------------------------------------

_PCM_FRAME = 256  # samples per frame
_PCM_MAX_FRAMES = 4  # prefix frames probed per payload


def _pcm_frames_oracle() -> str:
    from awsbeats_spark.operators.llm.multimodal import _BYTE_SQL

    byte_k = _BYTE_SQL.format(k=f"frame_id * {_PCM_FRAME} + j - 1")
    return f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               600 + octet_length(encode(text)) % 500 AS ns
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 1
    ),
    fr AS (
        SELECT doc_id, h, n, ns,
               unnest(generate_series(
                   0,
                   least(CAST(ceil(ns / {_PCM_FRAME}.0) AS BIGINT),
                         {_PCM_MAX_FRAMES}) - 1)) AS frame_id
        FROM p
    ),
    vals AS (
        SELECT doc_id, frame_id,
               least(ns - frame_id * {_PCM_FRAME}, {_PCM_FRAME}) AS n_samples,
               list_transform(
                   generate_series(1, CAST(least(ns - frame_id * {_PCM_FRAME},
                                                 {_PCM_FRAME}) AS INT)),
                   j -> {byte_k}) AS xs
        FROM fr
    )
    SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(list_min(xs) AS BIGINT) AS smin,
           CAST(list_max(xs) AS BIGINT) AS smax,
           CAST(coalesce(list_sum(list_transform(
               generate_series(2, CAST(n_samples AS INT)),
               j -> CASE WHEN (xs[j - 1] < 128) <> (xs[j] < 128)
                    THEN 1 ELSE 0 END)), 0) AS BIGINT) AS n_zero_cross,
           CAST(list_position(
               list_transform(xs, x -> abs(x - 128.0)),
               list_max(list_transform(xs, x -> abs(x - 128.0)))) - 1
               AS BIGINT) AS peak_off
    FROM vals
    """


def _pcm_frames_cls():
    """Module-level so the hypothesis properties drive the identical
    class the operator registers (same pattern as NdjsonRepair)."""
    import struct

    import numpy as np
    from pyspark.sql.functions import udtf

    from awsbeats_spark.operators.llm.multimodal import synthesize_wav

    @udtf(
        returnType="doc_id bigint, frame_id bigint, n_samples bigint,"
        " smin bigint, smax bigint, n_zero_cross bigint, peak_off bigint"
    )
    class PcmFrames:
        def eval(self, doc_id: int, payload: bytes):
            wav = synthesize_wav(bytes(payload))
            data_off = wav.index(b"data") + 8
            data_size = struct.unpack_from("<I", wav, data_off - 4)[0]
            arr = np.frombuffer(
                wav, dtype=np.uint8, count=data_size, offset=data_off
            ).astype(np.int64)
            n_frames = min(-(-len(arr) // _PCM_FRAME), _PCM_MAX_FRAMES)
            for f in range(n_frames):
                seg = arr[f * _PCM_FRAME : (f + 1) * _PCM_FRAME]
                below = seg < 128
                zc = int(np.sum(below[:-1] != below[1:]))
                peak = int(np.argmax(np.abs(seg - 128)))
                yield (
                    doc_id,
                    f,
                    len(seg),
                    int(seg.min()),
                    int(seg.max()),
                    zc,
                    peak,
                )

    return PcmFrames


PcmFrames = _pcm_frames_cls()


@query("udtf_pcm_frames", oracle=_pcm_frames_oracle())
def udtf_pcm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV PCM frame parser as the third Python UDTF — the case a UDTF
    genuinely exists for: a STATEFUL BINARY walk (RIFF chunk scan,
    little-endian size field, numpy PCM view) whose row fan-out depends
    on the decoded payload, which no built-in generator can express.
    Each audio document yields one row per {frame}-sample frame (prefix
    {maxf} frames) with integer frame stats: min/max sample, zero
    crossings of the 128 center (the cheap pitch/silence feature), and
    the first-peak offset (argmax |x-128|).

    All emitted stats are INTEGER arithmetic on the PCM bytes, so the
    DuckDB oracle replays them bit-exactly from the hex-nibble byte
    decode (the [[multimodal_audio_energy]] machinery) — a UDTF whose
    Python parse drifts from the container spec goes hash-red, not
    quietly wrong. Scale shape: the UDTF eval is per-row Python over
    Arrow batches with no state across rows — embarrassingly parallel,
    no shuffle, output bounded at {maxf} rows/doc; the WAV subset
    filter prunes the scan before Python ever runs."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    wav_docs = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") % 3 == 1)
    wav_docs.createOrReplaceTempView("pcm_udtf_src")

    spark.udtf.register("pcm_frames", PcmFrames)
    return spark.sql(
        """
        SELECT s.doc_id, s.frame_id, s.n_samples, s.smin, s.smax,
               s.n_zero_cross, s.peak_off
        FROM pcm_udtf_src d, LATERAL pcm_frames(d.doc_id, d.payload) s
        """
    )


udtf_pcm_frames.__doc__ = udtf_pcm_frames.__doc__.replace(
    "{frame}", str(_PCM_FRAME)
).replace("{maxf}", str(_PCM_MAX_FRAMES))


# --------------------------------------------------------------------------
# Markdown section splitter UDTF: header-aware RAG chunking
# --------------------------------------------------------------------------

_MD_WORDS = r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"


def _markdown_sections_cls():
    """Module-level so the hypothesis properties drive the identical
    header-stack parser the operator registers."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, section_idx bigint, h1 string,"
        " h2 string, n_words bigint, first_word string, last_word string"
    )
    class MarkdownSections:
        def eval(self, doc_id: int, md: str):
            h1 = h2 = None
            cur: list[str] = []
            idx = 0

            def flush():
                nonlocal idx
                if cur:
                    yield (
                        doc_id,
                        idx,
                        h1,
                        h2,
                        len(cur),
                        cur[0],
                        cur[-1],
                    )
                    idx += 1
                    cur.clear()

            for line in (md or "").split("\n"):
                if line.startswith("## "):
                    yield from flush()
                    h2 = line[3:]
                elif line.startswith("# "):
                    yield from flush()
                    h1, h2 = line[2:], None
                elif line:
                    cur.append(line)
            yield from flush()

    return MarkdownSections


MarkdownSections = _markdown_sections_cls()


@query(
    "udtf_markdown_sections",
    oracle=f"""
    WITH wl AS (
        SELECT doc_id, {_MD_WORDS} AS ws FROM documents
    ),
    wd AS (
        SELECT doc_id, generate_subscripts(ws, 1) AS i, unnest(ws) AS w
        FROM wl
    ),
    kinds AS (
        SELECT doc_id, i, w,
               CASE WHEN length(w) % 7 = 0 THEN 'h1'
                    WHEN length(w) % 7 = 3 THEN 'h2'
                    ELSE 'b' END AS kind
        FROM wd
    ),
    g1 AS (
        SELECT *,
               sum(CASE WHEN kind = 'h1' THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS h1g
        FROM kinds
    ),
    g2 AS (
        SELECT *,
               sum(CASE WHEN kind = 'h2' THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id, h1g ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS h2g
        FROM g1
    ),
    h1v AS (SELECT doc_id, h1g, w AS h1 FROM g2 WHERE kind = 'h1'),
    h2v AS (
        SELECT doc_id, h1g, h2g, w AS h2 FROM g2 WHERE kind = 'h2'
    ),
    body AS (
        SELECT doc_id, h1g, h2g,
               CAST(count(*) AS BIGINT) AS n_words,
               arg_min(w, i) AS first_word,
               arg_max(w, i) AS last_word,
               min(i) AS start_i
        FROM g2 WHERE kind = 'b'
        GROUP BY 1, 2, 3
    )
    SELECT b.doc_id,
           CAST(row_number() OVER (
               PARTITION BY b.doc_id ORDER BY b.start_i) - 1 AS BIGINT)
               AS section_idx,
           h1v.h1, h2v.h2, b.n_words, b.first_word, b.last_word
    FROM body b
    LEFT JOIN h1v USING (doc_id, h1g)
    LEFT JOIN h2v USING (doc_id, h1g, h2g)
    """,
)
def udtf_markdown_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structure-aware markdown section splitter as the fourth Python
    UDTF — the RAG chunker that cuts documents at HEADER boundaries
    instead of fixed windows (the chunking that keeps retrieval context
    coherent; the fixed-window sibling is corpus_chunk_overlap_windows).
    The parse is genuinely STATEFUL — a header stack where an `# h1`
    resets the current `## h2` — which no built-in generator expresses.

    The corpus is plain words, so a deterministic markdown view is
    synthesized JVM-side first (word length % 7 == 0 -> `# w` line,
    % 7 == 3 -> `## w` line, else a body line), the UDTF then parses
    the REAL markdown string: splits lines, classifies by `# `/`## `
    prefix, maintains the header stack, and emits one row per maximal
    body run with its (h1, h2) path, word count, and first/last word
    (preamble sections carry NULL headers). The DuckDB oracle replays
    the same segmentation relationally (cumulative header-count
    grouping windows), so a parser drift — a dropped reset, an
    off-by-one at a section boundary — goes hash-red.

    Scale shape: the UDTF eval is per-row Python over Arrow batches,
    stateful only WITHIN a document — embarrassingly parallel, no
    shuffle; output is bounded by header count + 1 per doc."""
    from pyspark.sql import functions as F

    t = tables(spark, sf_dir)
    w = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    lines = F.transform(
        w,
        lambda x: F.when(F.length(x) % 7 == 0, F.concat(F.lit("# "), x))
        .when(F.length(x) % 7 == 3, F.concat(F.lit("## "), x))
        .otherwise(x),
    )
    t.documents.select(
        "doc_id", F.array_join(lines, "\n").alias("md")
    ).createOrReplaceTempView("md_udtf_src")

    spark.udtf.register("markdown_sections", MarkdownSections)
    return spark.sql(
        """
        SELECT s.doc_id, s.section_idx, s.h1, s.h2, s.n_words,
               s.first_word, s.last_word
        FROM md_udtf_src d, LATERAL markdown_sections(d.doc_id, d.md) s
        """
    )


def _run_length_encode_cls():
    """Module-level so the hypothesis properties drive the identical
    run accumulator the operator registers."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, run_idx int, word string,"
        " run_len int, start_pos int"
    )
    class RunLengthEncode:
        def eval(self, doc_id: int, text: str):
            import re

            words = [w for w in re.split(r"\s+", (text or "").lower()) if w]
            run_idx = 0
            i = 0
            n = len(words)
            while i < n:
                j = i
                while j < n and words[j] == words[i]:
                    j += 1
                if j - i >= 2:
                    yield doc_id, run_idx, words[i], j - i, i + 1
                run_idx += 1
                i = j

    return RunLengthEncode


RunLengthEncode = _run_length_encode_cls()


@query(
    "udtf_run_length_encode",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, i AS pos, words[i] AS word
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               x -> x <> '') AS words
            FROM documents
        ), unnest(generate_series(1, len(words))) AS t(i)
    ),
    flagged AS (
        SELECT doc_id, pos, word,
               CASE WHEN lag(word) OVER (PARTITION BY doc_id ORDER BY pos)
                         IS DISTINCT FROM word
                    THEN 1 ELSE 0 END AS is_new
        FROM w
    ),
    runs AS (
        SELECT doc_id, pos, word,
               sum(is_new) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS run_id
        FROM flagged
    )
    SELECT doc_id,
           CAST(run_id - 1 AS INT) AS run_idx,
           word,
           CAST(count(*) AS INT) AS run_len,
           CAST(min(pos) AS INT) AS start_pos
    FROM runs
    GROUP BY doc_id, run_id, word
    HAVING count(*) >= 2
    """,
)
def udtf_run_length_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of each document's token stream as the 5th
    Python UDTF — emits every run of >= 2 consecutive identical tokens
    with its position, the primitive behind stutter/boilerplate
    repetition detection ([[text_repetition_gopher]] scores repetition
    in aggregate; this one LOCATES the runs) and the simplest honest
    example of a genuinely STATEFUL row parser: the run accumulator
    carries across tokens inside eval, which no posexplode/window-free
    built-in chain expresses in one pass. The oracle replays the
    semantics relationally (gaps-and-islands: change flag -> running
    sum -> group), which is also the plan you'd prefer at scale where
    the tokens are already exploded — the UDTF form wins when the
    parse state is richer than equality-of-neighbor (real tokenizers,
    escape sequences), and this key keeps that seam tested end-to-end.

    Scale shape: map-side only — the UDTF eval is per document row, no
    shuffle, no cross-row state; output is bounded by the number of
    runs. 1-indexed positions, matching the oracle's generate_series.
    """
    t = tables(spark, sf_dir)
    t.documents.createOrReplaceTempView("documents_rle_src")

    spark.udtf.register("run_length_encode", RunLengthEncode)
    return spark.sql(
        """
        SELECT r.doc_id, r.run_idx, r.word, r.run_len, r.start_pos
        FROM documents_rle_src d,
             LATERAL run_length_encode(d.doc_id, d.text) r
        """
    )


_NDJSON_W = 16  # transport line width the corruption model splits records at

# Poison-record guard (ADVICE r8): a record whose JSON can never parse
# (e.g. an unescaped quote) would otherwise coalesce every subsequent
# line into one ever-growing buffer and silently swallow the stream's
# tail. Once the buffer exceeds this bound it is flushed as
# ``complete=false`` (B2's error-key contract) and parsing restarts at
# the next line. Far above any legal record in the corruption model
# (compact event JSON is < 100 bytes), so the oracle is unaffected.
_NDJSON_MAX_BUF = 1 << 20


def _ndjson_repair_cls():
    """Module-level so the hypothesis properties can drive the same
    class the operator registers (hidden state: buffer + counters)."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="user_id bigint, rec_idx int, repaired string,"
        " n_lines int, complete boolean"
    )
    class NdjsonRepair:
        MAX_BUF = _NDJSON_MAX_BUF

        def __init__(self) -> None:
            self.uid = None
            self.buf = ""
            self.nlines = 0
            self.idx = 0

        def eval(self, row):
            import json

            self.uid = row["user_id"]
            self.buf += row["line"]
            self.nlines += 1
            try:
                json.loads(self.buf)
            except ValueError:
                if len(self.buf) > self.MAX_BUF:
                    # poison record: flush incomplete instead of letting
                    # one bad record swallow the rest of the stream
                    yield self.uid, self.idx, self.buf, self.nlines, False
                    self.buf = ""
                    self.nlines = 0
                    self.idx += 1
                return
            yield self.uid, self.idx, self.buf, self.nlines, True
            self.buf = ""
            self.nlines = 0
            self.idx += 1

        def terminate(self):
            if self.buf:
                yield self.uid, self.idx, self.buf, self.nlines, False

    return NdjsonRepair


NdjsonRepair = _ndjson_repair_cls()


@query(
    "udtf_ndjson_repair",
    oracle=f"""
    WITH recs AS (
        SELECT user_id, event_id,
               '{{"event_id":' || CAST(event_id AS VARCHAR)
                   || ',"event_type":"' || event_type
                   || '","user_id":' || CAST(user_id AS VARCHAR) || '}}' AS rec
        FROM events
    ),
    sized AS (
        SELECT user_id, rec,
               CAST((length(rec) + {_NDJSON_W - 1}) // {_NDJSON_W} AS INT)
                   AS n_lines,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id)
                    - 1 AS INT) AS rec_idx,
               event_id = max(event_id) OVER (PARTITION BY user_id) AS is_last
        FROM recs
    )
    SELECT user_id, rec_idx,
           CASE WHEN is_last AND n_lines >= 2
                THEN substring(rec, 1, (n_lines - 1) * {_NDJSON_W})
                ELSE rec END AS repaired,
           CAST(CASE WHEN is_last AND n_lines >= 2
                     THEN n_lines - 1 ELSE n_lines END AS INT) AS n_lines,
           NOT (is_last AND n_lines >= 2) AS complete
    FROM sized
    """,
)
def udtf_ndjson_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful truncated-line NDJSON repairer — the corrupt-record twin
    of [[json_parse_promote]] (B2 parses well-formed records and routes
    bad ones to an error key; this one RECOVERS records a line-oriented
    transport broke apart). The corruption model is deterministic so the
    oracle can replay it relationally: each event's compact JSON record
    (the [[project_record]] byte layout) is split into fixed-width
    16-char transport lines, and each stream's (user_id's) final record
    loses its last line when it spans >= 2 — the classic tail truncation
    a file rotation leaves behind (the reference's filebeat source ships
    exactly such partial lines; harvester behavior in its example
    configs). The repairer is a Python UDTF over
    ``TABLE(...) PARTITION BY user_id ORDER BY (event_id, line_idx)``:
    it buffers lines until the accumulator parses as complete JSON
    (``json.loads`` — a proper prefix of a flat JSON object never
    parses), emits the repaired record with its consumed line count,
    and ``terminate`` flushes the unfinished tail as ``complete=false``
    — B2's error-key contract, not a silent drop. Genuinely stateful
    across rows (buffer + record counter), which no built-in
    generator/window chain expresses in one pass: THE case the UDTF
    seam exists for.

    Scale shape: one shuffle on the stream key (the PARTITION BY), then
    a linear single-pass parse per stream; output is record-bounded.
    At 100 TB the stream key is (file, rotation epoch), so partitions
    stay small and the parse state never crosses executors."""
    W = _NDJSON_W
    t = tables(spark, sf_dir)
    rec = F.concat(
        F.lit('{"event_id":'),
        F.col("event_id").cast("string"),
        F.lit(',"event_type":"'),
        F.col("event_type"),
        F.lit('","user_id":'),
        F.col("user_id").cast("string"),
        F.lit("}"),
    )
    sized = t.events.select(
        "user_id",
        "event_id",
        rec.alias("rec"),
    ).withColumn("n_lines", F.expr(f"CAST((length(rec) + {W - 1}) DIV {W} AS INT)"))
    is_last = F.col("event_id") == F.max("event_id").over(
        Window.partitionBy("user_id")
    )
    lines = (
        sized.withColumn("is_last", is_last)
        .select(
            "user_id",
            "event_id",
            "rec",
            "n_lines",
            "is_last",
            F.explode(F.sequence(F.lit(0), F.col("n_lines") - 1)).alias("ci"),
        )
        # tail truncation: the stream's last record loses its final line
        .filter(
            ~(
                F.col("is_last")
                & (F.col("n_lines") >= 2)
                & (F.col("ci") == F.col("n_lines") - 1)
            )
        )
        .select(
            "user_id",
            "event_id",
            "ci",
            F.expr(f"substring(rec, ci * {W} + 1, {W})").alias("line"),
        )
    )
    lines.createOrReplaceTempView("ndjson_lines_src")

    spark.udtf.register("ndjson_repair", NdjsonRepair)
    return spark.sql(
        """
        SELECT r.user_id, r.rec_idx, r.repaired, r.n_lines, r.complete
        FROM ndjson_repair(TABLE(ndjson_lines_src)
                           PARTITION BY user_id ORDER BY (event_id, ci)) r
        """
    )


_PACK_L = 2048  # bin capacity, matching corpus_token_pack's budget


def _nextfit_pack_cls():
    """Module-level for the same reason as NdjsonRepair: the hypothesis
    properties replay the identical class on generated shards."""
    from pyspark.sql.functions import udtf

    @udtf(
        returnType="doc_id bigint, source string, n_tokens bigint,"
        " bin_id bigint, fill_after bigint"
    )
    class NextFitPack:
        def __init__(self) -> None:
            self.bin_id = 0
            self.fill = 0
            self.first = True

        def eval(self, row):
            n = row["n_tokens"]
            if self.first:
                self.first = False
                self.fill = n
            elif self.fill + n <= _PACK_L:
                self.fill += n
            else:
                self.bin_id += 1
                self.fill = n
            yield row["doc_id"], row["source"], n, self.bin_id, self.fill

    return NextFitPack


NextFitPack = _nextfit_pack_cls()


@query(
    "udtf_seq_pack_nextfit",
    oracle=f"""
    WITH RECURSIVE sized AS (
        SELECT doc_id, source,
               CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens,
               row_number() OVER (PARTITION BY source ORDER BY doc_id)
                   AS rn
        FROM documents
    ),
    packed AS (
        SELECT doc_id, source, n_tokens, rn,
               CAST(0 AS BIGINT) AS bin_id,
               n_tokens AS fill_after
        FROM sized WHERE rn = 1
        UNION ALL
        SELECT s.doc_id, s.source, s.n_tokens, s.rn,
               CASE WHEN p.fill_after + s.n_tokens <= {_PACK_L}
                    THEN p.bin_id ELSE p.bin_id + 1 END,
               CASE WHEN p.fill_after + s.n_tokens <= {_PACK_L}
                    THEN p.fill_after + s.n_tokens ELSE s.n_tokens END
        FROM packed p
        JOIN sized s ON s.source = p.source AND s.rn = p.rn + 1
    )
    SELECT doc_id, source, n_tokens, bin_id, fill_after FROM packed
    """,
)
def udtf_seq_pack_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREEDY next-fit sequence packing — the exact semantics
    [[corpus_token_pack]]'s docstring deliberately trades away (its
    offset spec is one window cumsum but lets a pack overflow by one
    document; next-fit never overflows a bin, at the cost of a
    sequential scan). The scan state (current bin, current fill) is a
    true cross-row recurrence with a data-dependent reset, which no
    window/prefix closed form expresses — THE stateful-parser case the
    UDTF seam exists for, same shape as [[udtf_ndjson_repair]]:
    ``TABLE(...) PARTITION BY source ORDER BY doc_id``, one instance
    per shard. The DuckDB oracle replays the recurrence as a
    recursive CTE (one row per step per shard), pinning every bin
    assignment exactly — not just aggregate bin counts.

    Scale shape: one shuffle on the shard key, then a linear
    single-pass scan per shard — at 100 TB packing always runs
    per-shard anyway (a global greedy order would serialize the
    corpus), so the parallelism unit matches production. Docs longer
    than the budget occupy a bin alone; both engines agree by the same
    arithmetic."""
    t = tables(spark, sf_dir)
    sized = t.documents.select(
        "doc_id", "source", F.size(words()).cast("long").alias("n_tokens")
    )
    sized.createOrReplaceTempView("seq_pack_src")

    spark.udtf.register("seq_pack_nextfit", NextFitPack)
    return spark.sql(
        """
        SELECT p.doc_id, p.source, p.n_tokens, p.bin_id, p.fill_after
        FROM seq_pack_nextfit(TABLE(seq_pack_src)
                              PARTITION BY source ORDER BY doc_id) p
        """
    )


def _pack_efficiency_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    nextfit = QUERIES["udtf_seq_pack_nextfit"].oracle
    return f"""
    WITH nf AS (
        SELECT source,
               CAST(max(bin_id) + 1 AS BIGINT) AS n_bins_nextfit,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM ({nextfit}) x GROUP BY source
    ),
    sized AS (
        SELECT doc_id, source,
               CAST(len({WORDS_SQL}) AS BIGINT) AS n
        FROM documents
    ),
    cum AS (
        SELECT source, n,
               coalesce(sum(n) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS before
        FROM sized
    ),
    packsum AS (
        SELECT source, CAST(floor(before / {_PACK_L}) AS BIGINT) AS pack_id,
               sum(n) AS s
        FROM cum GROUP BY 1, 2
    ),
    off AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_packs_offset,
               CAST(sum(CASE WHEN s > {_PACK_L} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_overflow_offset
        FROM packsum GROUP BY source
    )
    SELECT source, n_tokens, n_bins_nextfit,
           round(n_tokens * 1.0 / (n_bins_nextfit * {_PACK_L}), 6)
               AS fill_nextfit,
           n_packs_offset, n_overflow_offset,
           round(n_tokens * 1.0 / (n_packs_offset * {_PACK_L}), 6)
               AS fill_offset
    FROM nf JOIN off USING (source)
    """


@query("eval_seq_pack_efficiency", oracle=_pack_efficiency_oracle())
def eval_seq_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packing pair's honesty twin: per source shard, next-fit
    ([[udtf_seq_pack_nextfit]] — never overflows, may open more bins)
    versus the offset spec ([[corpus_token_pack]] — one window cumsum,
    may overflow a pack by one document), reported as bin counts, fill
    ratios, and the offset spec's actual overflow count. This is the
    table that justifies choosing one spec per corpus: if overflow
    packs are rare and fill ratios match, the windowed spec wins on
    cost; if overflow is common (long-doc corpora) the stateful scan
    earns its shuffle — measured, not asserted, in the same
    design-curve contract as [[eval_lsh_band_tradeoff]].

    Scale shape: both sides are per-shard aggregates of layouts this
    module already computes — one UDTF scan + one window cumsum — then
    a |sources|-row join."""
    from awsbeats_spark.registry import QUERIES

    nf = (
        udtf_seq_pack_nextfit(spark, sf_dir)
        .groupBy("source")
        .agg(
            (F.max("bin_id") + 1).alias("n_bins_nextfit"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    packs = QUERIES["corpus_token_pack"].fn(spark, sf_dir)
    off = (
        packs.groupBy("source", "pack_id")
        .agg(F.sum("n_tokens").alias("s"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_packs_offset"),
            F.sum((F.col("s") > _PACK_L).cast("long")).alias(
                "n_overflow_offset"
            ),
        )
    )
    fill_nf = F.col("n_tokens") / (F.col("n_bins_nextfit") * _PACK_L)
    fill_off = F.col("n_tokens") / (F.col("n_packs_offset") * _PACK_L)
    return nf.join(off, "source").select(
        "source",
        "n_tokens",
        "n_bins_nextfit",
        rnd(fill_nf, 6).alias("fill_nextfit"),
        "n_packs_offset",
        "n_overflow_offset",
        rnd(fill_off, 6).alias("fill_offset"),
    )


# --------------------------------------------------------------------------
# Cross-document attention contamination of packed sequences
# --------------------------------------------------------------------------


def _pack_attention_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    nextfit = QUERIES["udtf_seq_pack_nextfit"].oracle
    return f"""
    WITH bins AS (
        SELECT source, bin_id,
               CAST(sum(n_tokens) AS BIGINT) AS s,
               CAST(sum(n_tokens * n_tokens) AS BIGINT) AS sq,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM ({nextfit}) x GROUP BY source, bin_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(n_docs) AS BIGINT) AS n_docs,
           CAST(sum(s * (s + 1) // 2) AS BIGINT) AS total_pairs,
           CAST(sum((s * s - sq) // 2) AS BIGINT) AS cross_pairs,
           round(sum((s * s - sq) // 2) * 1.0
                 / sum(s * (s + 1) // 2), 6) AS contamination_rate
    FROM bins GROUP BY source
    """


@query("eval_pack_attention_contamination", oracle=_pack_attention_oracle())
def eval_pack_attention_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """What sequence packing COSTS the model: when k documents share one
    packed training sequence without attention masking, every token
    attends tokens of other documents — the cross-contamination the
    block-diagonal attention mask exists to remove (and the number that
    says whether you need it). Per source shard, over the next-fit bins
    of [[udtf_seq_pack_nextfit]]: causal attention pairs in a bin of
    length S are S(S+1)/2 (self included); same-document pairs are
    sum n_i(n_i+1)/2; the cross-document remainder is exactly
    (S^2 - sum n_i^2)/2. Reported as exact integer pair counts plus the
    contamination rate — all from the bin layout's (sum, sum-of-
    squares, count) per bin, no token-level work.

    Scale shape: one aggregate over the pack output (which is one
    shuffle + linear scan per shard), then a |sources|-row rollup; the
    quadratic quantities are closed-form in per-bin moments, so nothing
    token-scale is ever materialized."""
    packed = udtf_seq_pack_nextfit(spark, sf_dir)
    bins = packed.groupBy("source", "bin_id").agg(
        F.sum("n_tokens").alias("s"),
        F.sum(F.col("n_tokens") * F.col("n_tokens")).alias("sq"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    total = F.sum((F.col("s") * (F.col("s") + 1) / 2).cast("long"))
    cross = F.sum(((F.col("s") * F.col("s") - F.col("sq")) / 2).cast("long"))
    return bins.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        total.alias("total_pairs"),
        cross.alias("cross_pairs"),
        rnd(cross / total, 6).alias("contamination_rate"),
    )
