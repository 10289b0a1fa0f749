"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the actual decode is a
clearly-marked stub (`decode_media` raises NotImplementedError unless
the deterministic fake is requested) — but everything Spark-side is
real and tested: binary columns, metadata extraction, the mapInPandas
batch shape for decoders, and frame-index explosion for sampling.

Binary payloads are derived from `documents.text` (UTF-8 bytes) since
the testdata ships no media; the schema/plumbing is payload-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query

DECODE_SCHEMA = "doc_id bigint, width int, height int, n_frames int, decode_status string"


def decode_media(payload: bytes, fake: bool = False) -> dict:
    """Decode one media payload to (width, height, n_frames).

    STUB: real decoding needs image/audio libraries not present in this
    environment. With ``fake=True`` returns a deterministic synthetic
    geometry derived from the payload bytes (used by tests and the
    oracle-checked operators below); otherwise raises.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "pass fake=True for the deterministic test geometry"
        )
    n = len(payload)
    return {
        "width": 64 + n % 193,
        "height": 64 + (n * 7) % 129,
        "n_frames": 1 + n % 24,
        "decode_status": "fake-decoded",
    }


def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decoder: Arrow batches in, metadata batches out.

    This is the real production shape for a decoder UDF: per-batch
    columnar transfer, no per-row Python call overhead beyond the loop,
    output schema = DECODE_SCHEMA. The decode itself is the stub above.
    """
    for pdf in batches:
        out = pd.DataFrame(
            [decode_media(b, fake=True) for b in pdf["payload"]],
        )
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           substring(hex(encode(text)), 1, 8) AS magic_hex,
           CASE CAST(octet_length(encode(text)) % 3 AS INT)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS modality
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: payload size, magic
    bytes (hex of the first 4), and a deterministic modality tag. At
    100 TB the binary column stays in parquet as BYTE_ARRAY and this
    projection never materializes more than the prefix it slices."""
    t = tables(spark, sf_dir)
    payload = F.encode(F.col("text"), "UTF-8")
    return t.documents.select(
        "doc_id",
        F.octet_length(payload).alias("byte_len"),
        F.substring(F.hex(payload), 1, 8).alias("magic_hex"),
        F.when(F.octet_length(payload) % 3 == 0, F.lit("image"))
        .when(F.octet_length(payload) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("modality"),
    )


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(64 + octet_length(encode(text)) % 193 AS INT) AS width,
           CAST(64 + (octet_length(encode(text)) * 7) % 129 AS INT) AS height,
           CAST(1 + octet_length(encode(text)) % 24 AS INT) AS n_frames,
           'fake-decoded' AS decode_status
    FROM documents
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode via mapInPandas (Arrow-batched Python, the pattern a real
    codec would use): binary payload in, typed geometry out. The decode
    itself is the deterministic stub (decode_media); the oracle
    recomputes its formula in SQL, proving schema, batch shape and
    row alignment of the Python path."""
    t = tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, out_width int, out_height int, scale double"
TARGET_EDGE = 224  # classic vision-model input edge


def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas resizer: compute the aspect-preserving scale that fits
    the (fake-decoded) geometry into TARGET_EDGE x TARGET_EDGE. A real
    implementation would also transform pixels (PIL/opencv — not in this
    container, same stub policy as decode_media); the geometry math and
    the Arrow batch plumbing are the real, tested parts."""
    for pdf in batches:
        meta = pd.DataFrame([decode_media(b, fake=True) for b in pdf["payload"]])
        long_edge = meta[["width", "height"]].max(axis=1)
        scale = TARGET_EDGE / long_edge
        # raw scale out; the operator rounds Spark-side with the shared
        # half-up formula (pandas .round is half-even — oracle mismatch)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "out_width": (meta["width"] * scale).astype(int),
                "out_height": (meta["height"] * scale).astype(int),
                "scale": scale,
            }
        )


@query(
    "multimodal_resize",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               64 + octet_length(encode(text)) % 193 AS w,
               64 + (octet_length(encode(text)) * 7) % 129 AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(trunc(w * ({TARGET_EDGE}.0 / greatest(w, h))) AS INT) AS out_width,
           CAST(trunc(h * ({TARGET_EDGE}.0 / greatest(w, h))) AS INT) AS out_height,
           round({TARGET_EDGE}.0 / greatest(w, h), 6) AS scale
    FROM g
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning over binary media payloads via
    mapInPandas (decode geometry -> scale to fit 224px). The oracle
    recomputes the geometry formula in SQL, pinning schema, batch shape
    and the rounding of the scale factor."""
    t = tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    out = payloads.mapInPandas(resize_batches, schema=RESIZE_SCHEMA)
    return out.select(
        "doc_id", "out_width", "out_height", rnd("scale", 6).alias("scale")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, unnest(generate_series(0, CAST(octet_length(encode(text)) % 24 AS INT), 5))
               AS frame_idx
    FROM documents
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: explode every 5th frame index of each (fake)
    video — n_frames = 1 + byte_len % 24, indices 0..n_frames-1 step 5.
    The explode is the scalable pattern: one output row per sampled
    frame, no driver-side loop."""
    t = tables(spark, sf_dir)
    n_frames = F.lit(1) + F.octet_length(F.encode(F.col("text"), "UTF-8")) % 24
    return t.documents.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(5))).alias("frame_idx"),
    )


_AUDIO_WIN = 256  # samples (bytes) per energy window
_AUDIO_MAX_WIN = 4  # prefix windows probed per payload

_NIB = "0123456789ABCDEF"
# byte k (0-based) of payload from its hex string h, as a DOUBLE in SQL:
# 16*high_nibble + low_nibble via strpos on the uppercase hex alphabet —
# the same spec the numpy side implements with frombuffer(uint8).
_BYTE_SQL = (
    f"(16.0 * (strpos('{_NIB}', substring(h, ({{k}}) * 2 + 1, 1)) - 1)"
    f" + (strpos('{_NIB}', substring(h, ({{k}}) * 2 + 2, 1)) - 1))"
)


@query(
    "multimodal_audio_energy",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n
        FROM documents
        WHERE octet_length(encode(text)) > 0
    ),
    wins AS (
        SELECT doc_id, h, n,
               unnest(generate_series(
                   0,
                   least(CAST(ceil(n / {_AUDIO_WIN}.0) AS BIGINT),
                         {_AUDIO_MAX_WIN}) - 1)) AS window_id
        FROM p
    ),
    scored AS (
        SELECT doc_id, window_id,
               least(n - window_id * {_AUDIO_WIN}, {_AUDIO_WIN}) AS n_samples,
               list_sum(list_transform(
                   generate_series(1, least(n - window_id * {_AUDIO_WIN},
                                            {_AUDIO_WIN})),
                   j -> pow({_BYTE_SQL.format(k=f"window_id * {_AUDIO_WIN} + j - 1")}
                            - 128.0, 2))) AS ss
        FROM wins
    )
    SELECT doc_id, window_id,
           CAST(n_samples AS BIGINT) AS n_samples,
           round(sqrt(ss / n_samples), 4) AS rms
    FROM scored
    """,
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over an audio payload's first 4 x 256-sample
    windows — the silence/clipping probe a speech-data pipeline runs
    before paying for transcription. The payload is read as unsigned
    8-bit PCM centered at 128 (the deterministic stand-in codec: real
    PCM decode swaps in here without touching the plumbing).

    Spark side is the production decoder shape: Arrow-batched
    mapInPandas, numpy vectorized per batch, output schema declared up
    front. Sums of squares are exact integers on both engines (<= 256
    terms of <= 128^2), so double division + IEEE sqrt round-trips
    bit-identically against the oracle's hex-nibble SQL decode.

    Scale shape: embarrassingly parallel per payload, no shuffle; the
    prefix cap bounds output at 4 rows per document regardless of
    payload size."""
    import numpy as np

    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") > 0)

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n_win = min(
                    -(-len(arr) // _AUDIO_WIN), _AUDIO_MAX_WIN
                )  # ceil div, capped
                for w in range(n_win):
                    seg = arr[w * _AUDIO_WIN : (w + 1) * _AUDIO_WIN] - 128
                    ss = float(np.dot(seg, seg))
                    rows.append((doc_id, w, len(seg), ss))
            out = pd.DataFrame(
                rows, columns=["doc_id", "window_id", "n_samples", "ss"]
            )
            yield out

    scored = src.mapInPandas(
        energy, "doc_id bigint, window_id bigint, n_samples bigint, ss double"
    )
    return scored.select(
        "doc_id",
        "window_id",
        "n_samples",
        rnd(F.sqrt(F.col("ss") / F.col("n_samples")), 4).alias("rms"),
    )


# --------------------------------------------------------------------------
# Balanced shard assignment for media payloads (LPT-style round robin)
# --------------------------------------------------------------------------

_N_SHARDS = 8


@query(
    "multimodal_shard_balance_lpt",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, octet_length(encode(text)) AS bytes,
               row_number() OVER (
                   ORDER BY octet_length(encode(text)) DESC, doc_id
               ) AS rnk
        FROM documents
    ),
    assigned AS (
        SELECT doc_id, bytes,
               CAST((rnk - 1) % {_N_SHARDS} AS INT) AS shard
        FROM sized
    ),
    shards AS (
        SELECT shard, CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(bytes) AS BIGINT) AS total_bytes
        FROM assigned GROUP BY shard
    ),
    ideal AS (SELECT avg(total_bytes) AS mean_bytes FROM shards)
    SELECT s.shard, s.n_items, s.total_bytes,
           round(s.total_bytes / i.mean_bytes, 6) AS balance_ratio
    FROM shards s CROSS JOIN ideal i
    """,
)
def multimodal_shard_balance_lpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced media-shard builder: assign payloads to 8 training
    shards by size-ranked round robin (the deterministic cousin of
    longest-processing-time bin packing — sort by bytes descending,
    deal like cards), reporting per-shard item count, byte total, and
    balance ratio vs the ideal mean. The shard manifest every
    multimodal loader needs so no worker drags a fat-tail batch. Scale
    shape: the size rank is ONE global sort of (doc_id, bytes) pairs —
    at 100 TB that is a range-partitioned sort of an 16-byte-per-row
    projection, not of payloads; assignment and the shard rollup are
    map-side after it."""
    t = tables(spark, sf_dir)
    payload_bytes = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    w = Window.orderBy(F.desc("bytes"), F.asc("doc_id"))
    sized = t.documents.select(
        "doc_id", payload_bytes.alias("bytes")
    ).withColumn("shard", ((F.row_number().over(w) - 1) % _N_SHARDS).cast("int"))
    shards = sized.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("bytes").cast("long").alias("total_bytes"),
    )
    ideal = shards.agg(F.avg("total_bytes").alias("mean_bytes"))
    return shards.crossJoin(F.broadcast(ideal)).select(
        "shard",
        "n_items",
        "total_bytes",
        rnd(F.col("total_bytes") / F.col("mean_bytes"), 6).alias(
            "balance_ratio"
        ),
    )
