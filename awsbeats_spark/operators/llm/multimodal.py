"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The payloads are REAL container formats synthesized with pure stdlib
struct-packing (the testdata ships no media): 24-bpp BMP images, 8-bit
PCM WAV audio, and YUV4MPEG2 (y4m) 4:2:0 video. ``decode_media`` then
parses those containers' actual headers/chunks byte-by-byte — no codec
libraries needed, no stub branch. Everything Spark-side is the
production decoder shape: binary columns, Arrow-batched ``mapInPandas``,
frame-index explosion for sampling.

Deterministic geometry spec (n = octet_length of the source text; the
DuckDB oracles recompute container sizes/geometry from the same spec):

* modality = n % 3 -> 0 image (BMP), 1 audio (WAV), 2 video (Y4M)
* BMP:  w = 4 + n % 29, h = 4 + (7n) % 17, 24 bpp,
        stride = ((3w + 3) // 4) * 4, file size = 54 + h * stride
* WAV:  mono 8-bit PCM @ 8 kHz, n_samples = 600 + n % 500,
        file size = 44 + n_samples
* Y4M:  w = 10 + 2*(n % 7), h = 10 + 2*((7n) % 5)  (even, 2-digit),
        frames = 1 + n % 24, header 37 bytes,
        file size = 37 + frames * (6 + w*h*3//2)

Pixel/sample payload bytes are the UTF-8 text bytes cycled to length, so
containers are fully deterministic and content-carrying.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from awsbeats_spark.catalog import scan_fanout, tables
from awsbeats_spark.functions.rounding import rnd
from awsbeats_spark.registry import query

# --------------------------------------------------------------------------
# Container synthesis (pure stdlib struct packing -> REAL file formats)
# --------------------------------------------------------------------------


# Worker-side synth/decode functions live in the LEAF module
# awsbeats_spark.mediacodec (round 12): unpickling them in a fresh
# Python worker must not drag in operators/__init__'s full catalog
# import (~0.2 s/worker, paid per bench run under worker churn).
# Re-exported here so driver-side importers and tests are unchanged.
from awsbeats_spark.mediacodec import (  # noqa: F401
    DECODE_SCHEMA,
    _cycle_bytes,
    decode_batches,
    decode_media,
    synth_decode_arrow,
    synth_decode_batches,
    synthesize_bmp,
    synthesize_media,
    synthesize_wav,
    synthesize_y4m,
)


# n = octet_length(encode(text)) in SQL; geometry CASEs per module spec
_W_SQL = """CASE CAST(n % 3 AS INT)
    WHEN 0 THEN 4 + n % 29
    WHEN 1 THEN 600 + n % 500
    ELSE 10 + 2 * (n % 7) END"""
_H_SQL = """CASE CAST(n % 3 AS INT)
    WHEN 0 THEN 4 + (7 * n) % 17
    WHEN 1 THEN 1
    ELSE 10 + 2 * ((7 * n) % 5) END"""
_FRAMES_SQL = "CASE WHEN CAST(n % 3 AS INT) = 2 THEN 1 + n % 24 ELSE 1 END"
_STATUS_SQL = """CASE CAST(n % 3 AS INT)
    WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav' ELSE 'y4m' END"""


@query(
    "multimodal_decode",
    oracle=f"""
    WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id,
           CAST({_W_SQL} AS INT) AS width,
           CAST({_H_SQL} AS INT) AS height,
           CAST({_FRAMES_SQL} AS INT) AS n_frames,
           {_STATUS_SQL} AS decode_status
    FROM p
    """,
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode real media containers via mapInPandas (Arrow-batched
    Python, the production codec pattern): BMP/WAV/Y4M bytes in, typed
    geometry out, parsed from the containers' actual headers with
    stdlib struct — no codec libraries, no stub. The oracle recomputes
    the synthesis spec's geometry in SQL, proving the decode inverted
    the container correctly for every row. Scale shape: embarrassingly
    parallel per payload, no shuffle.

    Round 12: the decode is ~11 us/row (measured 54 ms single-threaded
    for the whole sf0.1 table), so the round-11 unconditional fan-out
    LOST 0.2 s of exchange + 32-task dispatch to save 0.05 s of serial
    work — the 8->32-core PERF ratio of 0.95 was this latency floor,
    not an Arrow batching limit. The fan-out is now work-gated
    (min_rows=20_000 ≈ where per-row decode work crosses the exchange
    cost; measured win on both sides of the gate), and the boundary is
    mapInArrow with columnar output — no pandas construction per batch.
    """
    t = tables(spark, sf_dir)
    payloads = scan_fanout(t.documents, sf_dir, "documents", min_rows=20_000).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return payloads.mapInArrow(synth_decode_arrow, DECODE_SCHEMA)


# container byte length per the synthesis spec (w/h/frames CASEs above)
_LEN_SQL = f"""CASE CAST(n % 3 AS INT)
    WHEN 0 THEN 54 + ({_H_SQL}) * (((3 * ({_W_SQL}) + 3) // 4) * 4)
    WHEN 1 THEN 44 + ({_W_SQL})
    ELSE 37 + ({_FRAMES_SQL}) * (6 + ({_W_SQL}) * ({_H_SQL}) * 3 // 2)
    END"""


@query(
    "multimodal_meta",
    oracle=f"""
    WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id,
           CAST({_LEN_SQL} AS BIGINT) AS byte_len,
           {_STATUS_SQL} AS container,
           CASE CAST(n % 3 AS INT)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
           END AS modality
    FROM p
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque media columns: container byte length,
    container kind (sniffed from the actual magic bytes — 'BM', RIFF/
    WAVE, YUV4MPEG2), and the modality tag a router partitions on. At
    100 TB the binary column stays in parquet as BYTE_ARRAY; sniffing
    reads a fixed-size prefix per row."""
    t = tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sniff = {b"BM": ("bmp", "image"), b"RI": ("wav", "audio"), b"YU": ("y4m", "video")}
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                payload = synthesize_media(raw)
                container, modality = sniff[payload[:2]]
                rows.append((doc_id, len(payload), container, modality))
            yield pd.DataFrame(
                rows, columns=["doc_id", "byte_len", "container", "modality"]
            )

    return payloads.mapInPandas(
        meta, "doc_id bigint, byte_len bigint, container string, modality string"
    )


RESIZE_SCHEMA = "doc_id bigint, out_width int, out_height int, scale double"
TARGET_EDGE = 224  # classic vision-model input edge


@query(
    "multimodal_resize",
    oracle=f"""
    WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
    g AS (
        SELECT doc_id, {_W_SQL} AS w, {_H_SQL} AS h
        FROM p WHERE CAST(n % 3 AS INT) <> 1
    )
    SELECT doc_id,
           CAST(trunc(w * ({TARGET_EDGE}.0 / greatest(w, h))) AS INT) AS out_width,
           CAST(trunc(h * ({TARGET_EDGE}.0 / greatest(w, h))) AS INT) AS out_height,
           round({TARGET_EDGE}.0 / greatest(w, h), 6) AS scale
    FROM g
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning for the visual modalities
    (images + video; audio has no pixel geometry): decode the real
    container headers, compute the scale that fits the frame into
    224x224. A real pixel resampler slots into the same mapInPandas
    after the geometry math."""
    t = tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    meta = payloads.mapInPandas(synth_decode_batches, schema=DECODE_SCHEMA)
    visual = meta.filter(F.col("decode_status") != "wav")
    long_edge = F.greatest("width", "height")
    scale = F.lit(float(TARGET_EDGE)) / long_edge
    return visual.select(
        "doc_id",
        F.floor(F.col("width") * scale).cast("int").alias("out_width"),
        F.floor(F.col("height") * scale).cast("int").alias("out_height"),
        rnd(scale, 6).alias("scale"),
    )


@query(
    "multimodal_frame_sample",
    oracle=f"""
    WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id,
           unnest(generate_series(0, CAST(({_FRAMES_SQL}) - 1 AS BIGINT), 5))
               AS frame_idx
    FROM p
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: decode each container's real frame count (y4m
    FRAME markers; stills/audio decode to 1) and explode every 5th
    frame index. The explode is the scalable pattern: one output row
    per sampled frame, no driver-side loop."""
    t = tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    meta = payloads.mapInPandas(synth_decode_batches, schema=DECODE_SCHEMA)
    return meta.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(5))
        ).alias("frame_idx"),
    )


_AUDIO_WIN = 256  # samples per energy window
_AUDIO_MAX_WIN = 4  # prefix windows probed per payload

_NIB = "0123456789ABCDEF"
# byte k (0-based) of the CYCLED text stream from its hex string h, as a
# DOUBLE in SQL: 16*high_nibble + low_nibble via strpos on the uppercase
# hex alphabet — the same bytes numpy reads out of the WAV data chunk.
_BYTE_SQL = (
    f"(16.0 * (strpos('{_NIB}', substring(h, (({{k}}) % n) * 2 + 1, 1)) - 1)"
    f" + (strpos('{_NIB}', substring(h, (({{k}}) % n) * 2 + 2, 1)) - 1))"
)


@query(
    "multimodal_audio_energy",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               600 + octet_length(encode(text)) % 500 AS ns
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 1
    ),
    wins AS (
        SELECT doc_id, h, n, ns,
               unnest(generate_series(
                   0,
                   least(CAST(ceil(ns / {_AUDIO_WIN}.0) AS BIGINT),
                         {_AUDIO_MAX_WIN}) - 1)) AS window_id
        FROM p
    ),
    scored AS (
        SELECT doc_id, window_id,
               least(ns - window_id * {_AUDIO_WIN}, {_AUDIO_WIN}) AS n_samples,
               list_sum(list_transform(
                   generate_series(1, least(ns - window_id * {_AUDIO_WIN},
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
    """Windowed RMS energy over each audio document's WAV payload —
    the silence/clipping probe a speech pipeline runs before paying for
    transcription. The WAV container is synthesized then REALLY parsed:
    the chunk walk locates the data chunk and numpy reads its unsigned
    8-bit PCM (centered at 128); only the first 4 x 256-sample windows
    are probed. Sums of squares are exact integers on both engines
    (<= 256 terms of <= 128^2), so double division + IEEE sqrt
    round-trips bit-identically against the oracle's hex-nibble SQL
    decode of the same cycled byte stream.

    Scale shape: embarrassingly parallel per payload, no shuffle; the
    prefix cap bounds output at 4 rows per document."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") % 3 == 1)

    def energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                wav = synthesize_wav(raw)
                # real chunk walk (decode_media validates WAVE layout)
                assert decode_media(wav)["decode_status"] == "wav"
                data_off = wav.index(b"data") + 8
                data_size = struct.unpack_from("<I", wav, data_off - 4)[0]
                arr = np.frombuffer(
                    wav, dtype=np.uint8, count=data_size, offset=data_off
                ).astype(np.int64)
                n_win = min(-(-len(arr) // _AUDIO_WIN), _AUDIO_MAX_WIN)
                for w in range(n_win):
                    seg = arr[w * _AUDIO_WIN : (w + 1) * _AUDIO_WIN] - 128
                    ss = float(np.dot(seg, seg))
                    rows.append((doc_id, w, len(seg), ss))
            yield pd.DataFrame(
                rows, columns=["doc_id", "window_id", "n_samples", "ss"]
            )

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
    map-side after it. (Sizes here are the raw payload bytes — the
    operator is container-agnostic by design.)"""
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


# --------------------------------------------------------------------------
# Decode with quarantine: corrupt containers must not kill the job
# --------------------------------------------------------------------------

_CORRUPT_MOD = 17  # payloads with n % 17 == 0 are truncated mid-header


@query(
    "multimodal_decode_quarantine",
    oracle=f"""
    WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id,
           CASE WHEN CAST(n % {_CORRUPT_MOD} AS INT) = 0 THEN NULL
                ELSE CAST({_W_SQL} AS INT) END AS width,
           CASE WHEN CAST(n % {_CORRUPT_MOD} AS INT) = 0 THEN NULL
                ELSE CAST({_H_SQL} AS INT) END AS height,
           CASE WHEN CAST(n % {_CORRUPT_MOD} AS INT) = 0 THEN NULL
                ELSE CAST({_FRAMES_SQL} AS INT) END AS n_frames,
           CASE WHEN CAST(n % {_CORRUPT_MOD} AS INT) = 0 THEN 'quarantined'
                ELSE {_STATUS_SQL} END AS decode_status
    FROM p
    """,
)
def multimodal_decode_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode with a quarantine lane: a deterministic subset of payloads
    (n % 17 == 0) is TRUNCATED mid-container before decode
    — real corruption, not a flag — and the decoder catches the parse
    failure per row, emitting decode_status='quarantined' with null
    geometry instead of killing the task. This is the error contract a
    100 TB media pipeline must have: one rotted object out of billions
    cannot fail the job (the reference's sink drops-and-counts encode
    failures the same way — mapEvents' drop-not-retry policy,
    streams/client.go:109-125). Rows stay in the output so the
    quarantine rate is measurable downstream; the happy path is
    bit-identical to multimodal_decode. Scale shape: unchanged —
    embarrassingly parallel mapInPandas, no shuffle."""
    t = tables(spark, sf_dir)
    payloads = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )

    def decode_or_quarantine(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                payload = synthesize_media(raw)
                if len(raw) % _CORRUPT_MOD == 0:
                    payload = payload[: max(len(payload) // 3, 3)]
                try:
                    d = decode_media(payload)
                    rows.append(
                        (doc_id, d["width"], d["height"], d["n_frames"],
                         d["decode_status"])
                    )
                except (ValueError, struct.error, IndexError):
                    rows.append((doc_id, None, None, None, "quarantined"))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_frames", "decode_status"
                ],
            )

    return payloads.mapInPandas(decode_or_quarantine, schema=DECODE_SCHEMA)


# --------------------------------------------------------------------------
# Perceptual image hash (aHash) over genuinely decoded BMP pixels
# --------------------------------------------------------------------------


def bmp_ahash(payload: bytes) -> tuple[int, int, int]:
    """(width, height, ahash) from a 24-bpp BMP's actual pixel bytes.

    Average hash: sample an 8x8 grid of grayscale pixels (nearest
    neighbor, so any geometry works), threshold each sample against the
    grid mean, pack the 64 booleans row-major into a SIGNED int64
    (Spark has no unsigned type). Parses the real container: pixel data
    offset from the file header, bottom-up rows, 4-byte row stride —
    not the synthesis spec."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24 or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} w={w} h={h}")
    top_down = h < 0
    h = abs(h)
    stride = ((3 * w + 3) // 4) * 4
    if len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel array")
    px = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    rows = px if top_down else px[::-1]  # normalize to top-down
    ys = ((np.arange(8) + 0.5) * h / 8).astype(np.int64)
    xs = ((np.arange(8) + 0.5) * w / 8).astype(np.int64)
    # grayscale = integer mean of the B,G,R bytes at each sampled pixel
    sub = rows[ys][:, (3 * xs)[:, None] + np.arange(3)].astype(np.int64)
    gray = sub.sum(axis=2) // 3
    bits = (gray > gray.mean()).flatten()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    if val >= 1 << 63:
        val -= 1 << 64
    return int(w), int(h), val


AHASH_SCHEMA = "doc_id bigint, width int, height int, ahash bigint"


def _ahash_oracle() -> str:
    """Bit-exact DuckDB replay of bmp_ahash over the synthesis spec
    (VERDICT r8 item 6 — the former rows-only blocker was the signed
    64-bit packing, solved the way sim_search_hamming_packed's oracle
    packs sign bits): geometry is closed-form in n, every sampled pixel
    byte is the cycled text byte at its bottom-up offset, grayscale is
    integer (B+G+R)//3, the threshold gray > mean(gray) is exact as
    64*gray > sum(gray) (64 samples, power of two), and the row-major
    bit pack handles the sign bit as an explicit -2^63 term."""
    byte = lambda k: f"CAST({_BYTE_SQL.format(k=k)} AS BIGINT)"  # noqa: E731
    off = (
        "((ht - 1 - ((2 * (t // 8) + 1) * ht) // 16) * stride"
        " + 3 * (((2 * (t % 8) + 1) * w) // 16))"
    )
    gray = f"({byte(off)} + {byte(off + ' + 1')} + {byte(off + ' + 2')}) // 3"
    return f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               4 + octet_length(encode(text)) % 29 AS w,
               4 + (7 * octet_length(encode(text))) % 17 AS ht
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 0
    ),
    g AS (SELECT *, ((3 * w + 3) // 4) * 4 AS stride FROM p),
    grays AS (
        SELECT doc_id, w, ht,
               list_transform(generate_series(0, 63), t -> {gray}) AS gv
        FROM g
    ),
    bits AS (
        SELECT doc_id, w, ht,
               list_transform(gv, x -> CASE WHEN 64 * x > list_sum(gv)
                                            THEN 1 ELSE 0 END) AS b
        FROM grays
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(ht AS INT) AS height,
           CAST(CASE WHEN b[1] = 1 THEN -9223372036854775807 - 1 ELSE 0 END
                + CAST(list_sum(list_transform(generate_series(2, 64),
                      i -> b[i] * CAST(power(2, 64 - i) AS BIGINT)))
                      AS BIGINT)
                AS BIGINT) AS ahash
    FROM bits
    """


@query("multimodal_image_ahash", oracle=_ahash_oracle())
def multimodal_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-level perceptual hash for the image modality: synthesize
    the BMP container from each image-modality document, decode its
    REAL pixel bytes, and emit the 64-bit average hash — the
    image-side analog of text_fingerprint (identical content -> equal
    hash; near-identical content -> small Hamming distance, so
    sim_search_hamming_packed's XOR+popcount ranking applies to images
    unchanged). HASH-CHECKED since round 9: the oracle replays the
    whole pipeline — cycled-byte pixel array, bottom-up row order, 8x8
    nearest-neighbor sample grid, integer grayscale, exact mean
    threshold, signed int64 pack — so a drift in bmp_ahash's container
    parse goes hash-red; eval_ahash_decode_parity remains the
    independent double-decode determinism check. Scale shape:
    embarrassingly parallel Arrow mapInPandas, no shuffle."""
    t = tables(spark, sf_dir)
    payloads = t.documents.filter(
        F.octet_length("text") % 3 == 0
    ).select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def hash_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                w, h, val = bmp_ahash(synthesize_bmp(bytes(raw)))
                rows.append((doc_id, w, h, val))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "ahash"]
            )

    return payloads.mapInPandas(hash_batches, schema=AHASH_SCHEMA)


@query(
    "eval_ahash_decode_parity",
    oracle="""
    SELECT doc_id,
           CAST(4 + octet_length(encode(text)) % 29 AS INT) AS width,
           CAST(4 + (7 * octet_length(encode(text))) % 17 AS INT)
               AS height,
           TRUE AS clone_consistent
    FROM documents WHERE octet_length(encode(text)) % 3 = 0
    """,
)
def eval_ahash_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable honesty twin of multimodal_image_ahash, per image
    doc: (1) the geometry the aHash parser reads out of the REAL BMP
    header must equal the synthesis spec the oracle recomputes in SQL —
    this pins bmp_ahash's independent header-parsing path (offset 10
    data_off, offset 18 dims), not decode_media's; (2)
    ``clone_consistent`` = the 64-bit hash from a SECOND, physically
    separate decode+hash execution of the same payload is bit-identical
    — a nondeterministic sampling grid, byte-order bug, or
    uninitialized-buffer read flips it and turns the driver row red.
    (An exact-text-duplicate census was rejected as the twin: the image
    modality has zero exact dup groups at test SFs, which would make
    the eval vacuous.)"""
    a = multimodal_image_ahash(spark, sf_dir).alias("a")
    b = (
        multimodal_image_ahash(spark, sf_dir)
        .select(
            F.col("doc_id").alias("doc_id_b"),
            F.col("ahash").alias("ahash_b"),
        )
        .alias("b")
    )
    return a.join(b, F.col("a.doc_id") == F.col("doc_id_b")).select(
        F.col("a.doc_id").alias("doc_id"),
        "width",
        "height",
        (F.col("a.ahash") == F.col("ahash_b")).alias("clone_consistent"),
    )


# --------------------------------------------------------------------------
# Video exposure QA: frame-0 luma mean/contrast from the real Y plane
# --------------------------------------------------------------------------


@query(
    "multimodal_video_luma_stats",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               10 + 2 * (octet_length(encode(text)) % 7) AS wd,
               10 + 2 * ((7 * octet_length(encode(text))) % 5) AS ht,
               1 + octet_length(encode(text)) % 24 AS n_frames
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 2
    ),
    sums AS (
        SELECT doc_id, wd, ht, n_frames,
               list_sum(list_transform(
                   generate_series(1, wd * ht),
                   j -> {_BYTE_SQL.format(k="j - 1")})) AS s,
               list_sum(list_transform(
                   generate_series(1, wd * ht),
                   j -> pow({_BYTE_SQL.format(k="j - 1")}, 2))) AS ss
        FROM p
    )
    SELECT doc_id, CAST(wd AS INT) AS width, CAST(ht AS INT) AS height,
           CAST(n_frames AS BIGINT) AS n_frames,
           round(s / (wd * ht), 4) AS mean_luma,
           round(sqrt(ss / (wd * ht) - pow(s / (wd * ht), 2)), 4)
               AS luma_contrast
    FROM sums
    """,
)
def multimodal_video_luma_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure/contrast QA over each video document's first frame: the
    Y (luma) plane's mean and population std, read from the REAL
    YUV4MPEG2 stream — header parsed for geometry, first FRAME marker
    walked, width*height luma bytes decoded. A vision pipeline runs
    exactly this gate to drop black/blown-out/flat clips before paying
    for frame embedding; contrast ~0 is the classic dead-camera signal.

    Parity: luma sums and sums-of-squares are exact integers (<= 396
    bytes of <= 255), so mean and sqrt-of-moments contrast are
    bit-identical to the oracle's hex-nibble recomputation of the same
    cycled byte stream. Scale shape: embarrassingly parallel
    mapInPandas per payload, no shuffle, one output row per video; only
    the first frame is decoded (all the gate needs), so cost is
    O(width*height) per clip regardless of duration."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") % 3 == 2)

    def luma(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                y4m = synthesize_y4m(raw)
                meta = decode_media(y4m)  # real header parse + frame walk
                wd, ht = meta["width"], meta["height"]
                plane = np.frombuffer(
                    y4m, dtype=np.uint8, count=wd * ht, offset=37 + 6
                ).astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        wd,
                        ht,
                        meta["n_frames"],
                        float(plane.sum()),
                        float(np.dot(plane, plane)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_frames", "s", "ss"],
            )

    sums = src.mapInPandas(
        luma,
        "doc_id bigint, width int, height int, n_frames bigint,"
        " s double, ss double",
    )
    area = (F.col("width") * F.col("height")).cast("double")
    mean = F.col("s") / area
    return sums.select(
        "doc_id",
        "width",
        "height",
        "n_frames",
        rnd(mean, 4).alias("mean_luma"),
        rnd(F.sqrt(F.col("ss") / area - mean * mean), 4).alias(
            "luma_contrast"
        ),
    )


# --------------------------------------------------------------------------
# Image sharpness QA: mean horizontal gradient of the green channel
# --------------------------------------------------------------------------


@query(
    "multimodal_image_edge_density",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               4 + octet_length(encode(text)) % 29 AS wd,
               4 + (7 * octet_length(encode(text))) % 17 AS ht,
               ((3 * (4 + octet_length(encode(text)) % 29) + 3) // 4) * 4
                   AS stride
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 0
          AND octet_length(encode(text)) > 0
    ),
    sums AS (
        SELECT doc_id, wd, ht,
               list_sum(list_transform(
                   generate_series(0, ht - 1),
                   r -> list_sum(list_transform(
                       generate_series(0, wd - 2),
                       c -> abs({_BYTE_SQL.format(k="r * stride + 3 * c + 4")}
                              - {_BYTE_SQL.format(k="r * stride + 3 * c + 1")})
                   ))
               )) AS grad_sum
        FROM p
    )
    SELECT doc_id, CAST(wd AS INT) AS width, CAST(ht AS INT) AS height,
           round(grad_sum / (ht * (wd - 1)), 4) AS edge_density
    FROM sums
    """,
)
def multimodal_image_edge_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image sharpness QA: mean absolute horizontal gradient of the
    green channel over the REAL decoded BMP pixel grid — the classic
    cheap blur/flat detector a vision pipeline runs before paying for
    embedding (a defocused or synthetic-flat image has near-zero
    gradient energy; ahash alone can't see that). The BMP is actually
    parsed: header offsets locate the pixel array, the row stride
    (4-byte aligned, exactly what the oracle recomputes) frames each
    row, and the green byte lane is differenced column-to-column.
    Empty payloads are excluded in both engines (a zero-length source
    has no pixel stream to grade — the quarantine lane owns it).

    Parity: gradient sums are exact integers (≤ 255 per term), so the
    density division is bit-identical to the oracle's hex-nibble
    recompute. Scale shape: Arrow mapInPandas per payload, no shuffle,
    one row per image, O(w·h) per image."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(
        (F.octet_length("payload") % 3 == 0) & (F.octet_length("payload") > 0)
    )

    def grad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                bmp = synthesize_bmp(raw)
                meta = decode_media(bmp)  # real header parse
                w, h = meta["width"], meta["height"]
                stride = ((3 * w + 3) // 4) * 4
                px = np.frombuffer(
                    bmp, dtype=np.uint8, count=stride * h, offset=54
                ).reshape(h, stride)
                green = px[:, 1 : 3 * w : 3].astype(np.int64)
                gsum = int(np.abs(np.diff(green, axis=1)).sum())
                rows.append((doc_id, w, h, float(gsum)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "grad_sum"]
            )

    sums = src.mapInPandas(
        grad, "doc_id bigint, width int, height int, grad_sum double"
    )
    return sums.select(
        "doc_id",
        "width",
        "height",
        rnd(
            F.col("grad_sum")
            / (F.col("height") * (F.col("width") - 1)).cast("double"),
            4,
        ).alias("edge_density"),
    )


# --------------------------------------------------------------------------
# Audio silence/clipping gate over the real PCM stream
# --------------------------------------------------------------------------

_SIL_EPS = 8  # |sample - 128| <= eps counts as silence (8-bit unsigned PCM)


@query(
    "multimodal_audio_silence_gate",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               600 + octet_length(encode(text)) % 500 AS ns
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 1
          AND octet_length(encode(text)) > 0
    ),
    scored AS (
        SELECT doc_id, ns,
               list_sum(list_transform(
                   generate_series(1, ns),
                   j -> CASE WHEN abs({_BYTE_SQL.format(k="j - 1")} - 128.0)
                                  <= {_SIL_EPS} THEN 1 ELSE 0 END)) AS n_sil,
               list_sum(list_transform(
                   generate_series(1, ns),
                   j -> CASE WHEN {_BYTE_SQL.format(k="j - 1")} = 0.0
                               OR {_BYTE_SQL.format(k="j - 1")} = 255.0
                             THEN 1 ELSE 0 END)) AS n_clip
        FROM p
    )
    SELECT doc_id, CAST(ns AS BIGINT) AS n_samples,
           round(n_sil / CAST(ns AS DOUBLE), 6) AS silence_ratio,
           round(n_clip / CAST(ns AS DOUBLE), 6) AS clip_ratio,
           n_sil / CAST(ns AS DOUBLE) <= 0.98
               AND n_clip / CAST(ns AS DOUBLE) <= 0.10 AS gate_pass
    FROM scored
    """,
)
def multimodal_audio_silence_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence/clipping admission gate over each audio document's FULL
    PCM stream (multimodal_audio_energy probes windowed RMS; this is
    the pass/fail decision): the fraction of samples within ±8 of the
    8-bit midpoint (silence) and at the rails 0/255 (clipping), with
    the gate verdict a speech pipeline uses to drop dead-mic and
    overdriven captures before transcription. The WAV container is
    really parsed — chunk walk to the data chunk, numpy over the
    unsigned PCM — and counts are exact integers, so both ratios and
    the boolean verdict are bit-identical to the oracle's hex-nibble
    recompute. Empty payloads are excluded on both sides (no stream to
    grade — the quarantine lane owns them).

    Scale shape: Arrow mapInPandas per payload, no shuffle, one output
    row per clip, O(n_samples) per clip."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(
        (F.octet_length("payload") % 3 == 1) & (F.octet_length("payload") > 0)
    )

    def gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                wav = synthesize_wav(raw)
                data_off = wav.index(b"data") + 8
                data_size = struct.unpack_from("<I", wav, data_off - 4)[0]
                arr = np.frombuffer(
                    wav, dtype=np.uint8, count=data_size, offset=data_off
                ).astype(np.int64)
                n_sil = int((np.abs(arr - 128) <= _SIL_EPS).sum())
                n_clip = int(((arr == 0) | (arr == 255)).sum())
                rows.append((doc_id, len(arr), float(n_sil), float(n_clip)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "n_sil", "n_clip"]
            )

    scored = src.mapInPandas(
        gate, "doc_id bigint, n_samples bigint, n_sil double, n_clip double"
    )
    ns = F.col("n_samples").cast("double")
    sil = F.col("n_sil") / ns
    clip = F.col("n_clip") / ns
    return scored.select(
        "doc_id",
        "n_samples",
        rnd(sil, 6).alias("silence_ratio"),
        rnd(clip, 6).alias("clip_ratio"),
        ((sil <= 0.98) & (clip <= 0.10)).alias("gate_pass"),
    )


# --------------------------------------------------------------------------
# Audio zero-crossing rate: cheap noise-vs-tone probe over the full stream
# --------------------------------------------------------------------------


@query(
    "multimodal_audio_zero_crossing",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               600 + octet_length(encode(text)) % 500 AS ns
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 1
    ),
    z AS (
        SELECT doc_id, ns,
               list_sum(list_transform(
                   generate_series(1, ns - 1),
                   j -> CASE WHEN ({_BYTE_SQL.format(k="j - 1")} >= 128)
                             <> ({_BYTE_SQL.format(k="j")} >= 128)
                        THEN 1 ELSE 0 END)) AS zc
        FROM p
    )
    SELECT doc_id,
           CAST(ns AS BIGINT) AS n_samples,
           CAST(zc AS BIGINT) AS zcr_count,
           round(zc / (ns - 1.0), 6) AS zcr_rate
    FROM z
    """,
)
def multimodal_audio_zero_crossing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zero-crossing rate over each audio document's FULL PCM stream:
    the fraction of adjacent sample pairs that cross the unsigned-8-bit
    midline (128). ZCR is the classic O(n) voiced/unvoiced + noise
    discriminator — high ZCR flags hiss/static, near-zero ZCR flags DC
    or dead silence — and a speech pipeline runs it right next to the
    RMS gate (multimodal_audio_energy / multimodal_audio_silence_gate)
    because the two together separate silence, tone, speech, and noise
    with no model call. The WAV container is synthesized then REALLY
    parsed (chunk walk via decode_media, numpy over the data chunk).

    Parity: crossing counts are exact integers, so count and the one
    division round-trip bit-identically against the oracle's hex-nibble
    recomputation of the same cycled byte stream. Scale shape:
    embarrassingly parallel mapInPandas per payload, O(n_samples) per
    clip, no shuffle, one output row per audio document."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") % 3 == 1)

    def zcr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                wav = synthesize_wav(raw)
                assert decode_media(wav)["decode_status"] == "wav"
                data_off = wav.index(b"data") + 8
                data_size = struct.unpack_from("<I", wav, data_off - 4)[0]
                arr = np.frombuffer(
                    wav, dtype=np.uint8, count=data_size, offset=data_off
                )
                hi = arr >= 128
                zc = int(np.count_nonzero(hi[:-1] != hi[1:]))
                rows.append((doc_id, len(arr), zc))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "zcr_count"]
            )

    counted = src.mapInPandas(
        zcr, "doc_id bigint, n_samples bigint, zcr_count bigint"
    )
    return counted.select(
        "doc_id",
        "n_samples",
        "zcr_count",
        rnd(
            F.col("zcr_count") / (F.col("n_samples") - F.lit(1.0)), 6
        ).alias("zcr_rate"),
    )


# --------------------------------------------------------------------------
# Per-channel color moments: the cheap color-signature feature for images
# --------------------------------------------------------------------------


def _channel_sums_sql(ch: int, power: int) -> str:
    """Oracle sum of channel ``ch`` (0=B, 1=G, 2=R) bytes (power 1) or
    their squares (power 2) over the stride-framed pixel grid."""
    byte = _BYTE_SQL.format(k=f"r * stride + 3 * c + {ch}")
    term = byte if power == 1 else f"pow({byte}, 2)"
    return (
        "list_sum(list_transform(generate_series(0, ht - 1),"
        " r -> list_sum(list_transform(generate_series(0, wd - 1),"
        f" c -> {term}))))"
    )


@query(
    "multimodal_bmp_color_moments",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               4 + octet_length(encode(text)) % 29 AS wd,
               4 + (7 * octet_length(encode(text))) % 17 AS ht,
               ((3 * (4 + octet_length(encode(text)) % 29) + 3) // 4) * 4
                   AS stride
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 0
          AND octet_length(encode(text)) > 0
    ),
    sums AS (
        SELECT doc_id, wd, ht,
               {_channel_sums_sql(0, 1)} AS sb,
               {_channel_sums_sql(0, 2)} AS ssb,
               {_channel_sums_sql(1, 1)} AS sg,
               {_channel_sums_sql(1, 2)} AS ssg,
               {_channel_sums_sql(2, 1)} AS sr,
               {_channel_sums_sql(2, 2)} AS ssr
        FROM p
    )
    SELECT doc_id, CAST(wd AS INT) AS width, CAST(ht AS INT) AS height,
           round(sb / (wd * ht), 4) AS b_mean,
           round(sqrt(ssb / (wd * ht) - pow(sb / (wd * ht), 2)), 4)
               AS b_std,
           round(sg / (wd * ht), 4) AS g_mean,
           round(sqrt(ssg / (wd * ht) - pow(sg / (wd * ht), 2)), 4)
               AS g_std,
           round(sr / (wd * ht), 4) AS r_mean,
           round(sqrt(ssr / (wd * ht) - pow(sr / (wd * ht), 2)), 4)
               AS r_std
    FROM sums
    """,
)
def multimodal_bmp_color_moments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First two color moments (mean, population std) per BGR channel
    over each image document's REAL decoded BMP pixel grid — the
    classic 6-number color signature (Stricker & Orengo) used for
    near-duplicate blocking, palette drift detection, and
    flat/synthetic-image gating: a screenshot corpus and a photo corpus
    separate on channel std alone, and ahash + edge_density + color
    moments together form the standard cheap pre-embedding image
    triage. The BMP container is parsed for real (header offsets,
    4-byte-aligned row stride — padding bytes excluded from every sum).

    Parity: per-channel sums and sums-of-squares are exact integers,
    so mean and sqrt-of-moments std round-trip bit-identically against
    the oracle's hex-nibble recompute of the same cycled byte stream.
    Scale shape: Arrow mapInPandas per payload, O(w*h) per image, no
    shuffle, one row per image document."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(
        (F.octet_length("payload") % 3 == 0)
        & (F.octet_length("payload") > 0)
    )

    def moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                bmp = synthesize_bmp(raw)
                meta = decode_media(bmp)  # real header parse
                wd, ht = meta["width"], meta["height"]
                stride = ((3 * wd + 3) // 4) * 4
                grid = (
                    np.frombuffer(
                        bmp, dtype=np.uint8, count=stride * ht, offset=54
                    )
                    .reshape(ht, stride)[:, : 3 * wd]
                    .reshape(ht, wd, 3)
                    .astype(np.int64)
                )
                out = [doc_id, wd, ht]
                for ch in range(3):
                    plane = grid[:, :, ch]
                    out.append(float(plane.sum()))
                    out.append(float((plane * plane).sum()))
                rows.append(tuple(out))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height",
                    "sb", "ssb", "sg", "ssg", "sr", "ssr",
                ],
            )

    sums = src.mapInPandas(
        moments,
        "doc_id bigint, width int, height int, sb double, ssb double,"
        " sg double, ssg double, sr double, ssr double",
    )
    area = (F.col("width") * F.col("height")).cast("double")

    def mom(s: str, ss: str):
        mean = F.col(s) / area
        return mean, F.sqrt(F.col(ss) / area - mean * mean)

    bm, bs = mom("sb", "ssb")
    gm, gs = mom("sg", "ssg")
    rm, rs = mom("sr", "ssr")
    return sums.select(
        "doc_id",
        "width",
        "height",
        rnd(bm, 4).alias("b_mean"),
        rnd(bs, 4).alias("b_std"),
        rnd(gm, 4).alias("g_mean"),
        rnd(gs, 4).alias("g_std"),
        rnd(rm, 4).alias("r_mean"),
        rnd(rs, 4).alias("r_std"),
    )


# --------------------------------------------------------------------------
# Audio content fingerprint: rolling hash over the decimated PCM stream
# --------------------------------------------------------------------------

_FP_STEP = 8  # decimation: every 8th sample
_FP_BASE = 131
_FP_MOD = 2147483647  # 2^31 - 1 keeps every product within BIGINT


@query(
    "multimodal_audio_fingerprint",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               600 + octet_length(encode(text)) % 500 AS ns
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 1
    ),
    fp AS (
        SELECT doc_id, ns,
               ((ns - 1) // {_FP_STEP}) + 1 AS n_sampled,
               list_reduce(
                   list_prepend(
                       CAST(0 AS BIGINT),
                       list_transform(
                           generate_series(0, (ns - 1) // {_FP_STEP}),
                           j -> CAST({_BYTE_SQL.format(k=f"j * {_FP_STEP}")}
                                     AS BIGINT))),
                   (acc, b) -> (acc * {_FP_BASE} + b) % {_FP_MOD}) AS fp
        FROM p
    )
    SELECT doc_id,
           CAST(ns AS BIGINT) AS n_samples,
           CAST(n_sampled AS BIGINT) AS n_sampled,
           CAST(fp AS BIGINT) AS fingerprint
    FROM fp
    """,
)
def multimodal_audio_fingerprint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Content-addressed audio fingerprint: a polynomial rolling hash
    (base 131 mod 2^31-1, the classic Rabin-Karp family) over every 8th
    PCM sample of each audio document's REAL decoded WAV stream. This
    is the exact-duplicate detector for audio the way dedup_exact's
    text hash is for documents: identical recordings collide by
    construction, any sample change anywhere reshuffles the hash, and
    the 8x decimation makes it robustly cheap while still covering the
    whole stream (not just a prefix). Downstream: groupBy(fingerprint)
    is the audio dedup pass, exactly dedup_latest_per_key's shape.

    Parity: the fold is exact BIGINT arithmetic — every intermediate
    stays under 2^39 — and the oracle replays the identical
    left-to-right recurrence with DuckDB's list_reduce over the
    hex-nibble decoded bytes, so the fingerprints match bit-for-bit
    (the same determinism contract as the KMV md5 trick, with zero
    floating point anywhere). Scale shape: embarrassingly parallel
    mapInPandas per payload, O(n_samples/8) per clip, no shuffle, one
    row per audio document."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") % 3 == 1)

    def fingerprint(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                wav = synthesize_wav(raw)
                assert decode_media(wav)["decode_status"] == "wav"
                data_off = wav.index(b"data") + 8
                data_size = struct.unpack_from("<I", wav, data_off - 4)[0]
                arr = np.frombuffer(
                    wav, dtype=np.uint8, count=data_size, offset=data_off
                )
                sampled = arr[:: _FP_STEP]
                acc = 0
                for b in sampled.tolist():
                    acc = (acc * _FP_BASE + b) % _FP_MOD
                rows.append((doc_id, len(arr), len(sampled), acc))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_samples", "n_sampled", "fingerprint"],
            )

    return src.mapInPandas(
        fingerprint,
        "doc_id bigint, n_samples bigint, n_sampled bigint,"
        " fingerprint bigint",
    )


# --------------------------------------------------------------------------
# Corpus modality mix: the one-page inventory a multimodal pipeline opens with
# --------------------------------------------------------------------------


@query(
    "multimodal_corpus_mix",
    oracle="""
    WITH p AS (
        SELECT CASE CAST(octet_length(encode(text)) % 3 AS INT)
                    WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    tot AS (SELECT count(*) AS nd, sum(n_bytes) AS nb FROM p)
    SELECT p.modality,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(p.n_bytes) AS BIGINT) AS total_bytes,
           round(count(*) * 1.0 / tot.nd, 6) AS doc_share,
           round(sum(p.n_bytes) * 1.0 / tot.nb, 6) AS byte_share,
           round(avg(p.n_bytes), 2) AS avg_bytes
    FROM p CROSS JOIN tot
    GROUP BY p.modality, tot.nd, tot.nb
    """,
)
def multimodal_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus modality inventory: per modality (the deterministic
    len%3 dispatch synthesize_media uses), document count, raw bytes,
    and both shares — the first number a multimodal training run pins
    down, because compute budgets follow BYTES (decode + embed cost)
    while sampling policies follow DOCUMENTS, and the two shares
    diverge exactly when one modality's payloads run long. The same
    doc-vs-byte-share split corpus_source_mix gives text sources,
    lifted to modalities; downstream, multimodal_shard_balance_lpt
    consumes the byte sizes this summarizes.

    Scale shape: one map-side modality/byte projection folded by a
    3-group hash aggregate with a one-row broadcast total — no
    payload decode at all (the container headers aren't needed for
    byte accounting), so this runs at scan speed."""
    t = tables(spark, sf_dir)
    p = t.documents.select(
        F.when(F.octet_length(F.encode("text", "UTF-8")) % 3 == 0, "image")
        .when(F.octet_length(F.encode("text", "UTF-8")) % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
    )
    tot = p.agg(
        F.count(F.lit(1)).alias("nd"), F.sum("n_bytes").alias("nb")
    )
    return p.crossJoin(F.broadcast(tot)).groupBy(
        "modality", "nd", "nb"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_bytes").cast("long").alias("total_bytes"),
        rnd(F.count(F.lit(1)) / F.col("nd"), 6).alias("doc_share"),
        rnd(F.sum("n_bytes") / F.col("nb"), 6).alias("byte_share"),
        rnd(F.avg("n_bytes"), 2).alias("avg_bytes"),
    ).drop("nd", "nb")


# --------------------------------------------------------------------------
# Audio dynamic range / crest factor over the windowed RMS profile
# --------------------------------------------------------------------------


def _audio_dynrange_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    return f"""
    WITH e AS ({QUERIES['multimodal_audio_energy'].oracle})
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           max(rms) AS rms_max,
           min(rms) AS rms_min,
           round(avg(rms), 4) AS rms_mean,
           CASE WHEN min(rms) > 0
                THEN round(20.0 * log10(max(rms) / min(rms)), 4)
           END AS dynamic_range_db,
           CASE WHEN avg(rms) > 0
                THEN round(20.0 * log10(max(rms) / avg(rms)), 4)
           END AS crest_db
    FROM e GROUP BY doc_id
    """


@query("multimodal_audio_dynamic_range", oracle=_audio_dynrange_oracle())
def multimodal_audio_dynamic_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip dynamic range and crest factor from the windowed RMS
    profile: 20 log10(rms_max / rms_min) and 20 log10(rms_max /
    rms_mean) in dB — the loudness-variation gate a speech pipeline
    uses to separate compressed/limited audio (flat profile, ~0 dB
    range) from natural speech (pauses vs peaks). Windows with zero
    energy leave the dB columns NULL rather than -inf.

    Oracle composition: the windowed-RMS CTE IS
    multimodal_audio_energy's registered oracle — the real-parsed WAV
    PCM on the Spark side vs the hex-nibble byte decode on the DuckDB
    side — so this op inherits the bit-exact window energies and adds
    only per-doc fold arithmetic on the ROUNDED rms values. Scale
    shape: one (doc_id) hash aggregate over the bounded (<= 4 windows
    per clip) RMS frame; the decode itself never re-runs."""
    from awsbeats_spark.registry import QUERIES

    e = QUERIES["multimodal_audio_energy"].fn(spark, sf_dir)
    return e.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        F.max("rms").alias("rms_max"),
        F.min("rms").alias("rms_min"),
        rnd(F.avg("rms"), 4).alias("rms_mean"),
        F.when(
            F.min("rms") > 0,
            rnd(20.0 * F.log10(F.max("rms") / F.min("rms")), 4),
        ).alias("dynamic_range_db"),
        F.when(
            F.avg("rms") > 0,
            rnd(20.0 * F.log10(F.max("rms") / F.avg("rms")), 4),
        ).alias("crest_db"),
    )


# --------------------------------------------------------------------------
# Image histogram entropy: tonal-complexity gate over real BMP pixels
# --------------------------------------------------------------------------


@query(
    "multimodal_image_histogram_entropy",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               4 + octet_length(encode(text)) % 29 AS wd,
               4 + (7 * octet_length(encode(text))) % 17 AS ht,
               ((3 * (4 + octet_length(encode(text)) % 29) + 3) // 4) * 4
                   AS stride
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 0
          AND octet_length(encode(text)) > 0
    ),
    px AS (
        SELECT doc_id, wd, ht,
               CAST({_BYTE_SQL.format(k="r.r * stride + 3 * c.c + 1")}
                    AS BIGINT) // 16 AS bin
        FROM p,
             unnest(generate_series(0, ht - 1)) AS r(r),
             unnest(generate_series(0, wd - 1)) AS c(c)
    ),
    hist AS (
        SELECT doc_id, wd, ht, bin, count(*) AS cnt
        FROM px GROUP BY 1, 2, 3, 4
    )
    SELECT doc_id, CAST(wd AS INT) AS width, CAST(ht AS INT) AS height,
           CAST(count(*) AS BIGINT) AS n_bins_used,
           round(-sum((cnt * 1.0 / (wd * ht))
                      * log2(cnt * 1.0 / (wd * ht))), 6) AS entropy_bits
    FROM hist
    GROUP BY doc_id, wd, ht
    """,
)
def multimodal_image_histogram_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Shannon entropy of each image's 16-bin green-channel histogram
    over the REAL decoded BMP pixel grid (stride-framed, padding
    excluded) — the tonal-complexity gate that separates flat/synthetic
    frames (entropy near 0: screenshots, solid fills, corrupt decodes)
    from natural images (entropy near the 4-bit ceiling). The cheap
    companion to [[multimodal_bmp_color_moments]]: std measures spread,
    entropy measures how evenly the tonal mass is used.

    Parity: bin counts are exact integers from the same cycled byte
    stream the oracle re-derives per hex nibble, so the <= 16-term
    entropy sum is bit-stable under rounding. Scale shape: Arrow
    mapInPandas emits (doc, bin, count) — at most 16 rows per image —
    and the entropy fold is one hash aggregate at image grain."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(
        (F.octet_length("payload") % 3 == 0)
        & (F.octet_length("payload") > 0)
    )

    def hist(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                bmp = synthesize_bmp(raw)
                meta = decode_media(bmp)
                wd, ht = meta["width"], meta["height"]
                stride = ((3 * wd + 3) // 4) * 4
                green = (
                    np.frombuffer(
                        bmp, dtype=np.uint8, count=stride * ht, offset=54
                    )
                    .reshape(ht, stride)[:, : 3 * wd]
                    .reshape(ht, wd, 3)[:, :, 1]
                )
                counts = np.bincount(green.ravel() >> 4, minlength=16)
                for b in range(16):
                    if counts[b]:
                        rows.append((doc_id, wd, ht, b, int(counts[b])))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "bin", "cnt"]
            )

    h = src.mapInPandas(
        hist,
        "doc_id bigint, width int, height int, bin int, cnt bigint",
    )
    area = (F.col("width") * F.col("height")).cast("double")
    pb = F.col("cnt") / area
    return h.groupBy("doc_id", "width", "height").agg(
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        rnd(-F.sum(pb * F.log2(pb)), 6).alias("entropy_bits"),
    )


# --------------------------------------------------------------------------
# Image near-duplicate pairs: ahash over the REAL decoded pixel grid,
# banded 16-bit Hamming join, bounded top-k output
# --------------------------------------------------------------------------

_AHASH_TOP_K = 5
# hot-bucket cap: a band bucket holding more docs than this is a
# degenerate (uninformative) bit pattern — skip it, exactly like the
# document-frequency cap in dedup_ngram_df_capped. Bounds candidate
# fan-out to cap * bands per doc regardless of corpus degeneracy.
_AHASH_BUCKET_CAP = 32
_AHASH_EVAL_ANCHORS = 64

# nearest-neighbor 8x8 green sample for logical cell i (row-major):
# r = ((i//8)*ht)//8, c = ((i%8)*wd)//8, green byte = r*stride + 3c + 1
_AHASH_K = (
    "((((i // 8) * ht) // 8) * stride + 3 * ((((i % 8)) * wd) // 8) + 1)"
)

_AHASH_N_BANDS = 8   # 8 bands x 8 bits: pigeonhole-guaranteed recall
_AHASH_BAND_BITS = 8  # through Hamming 7; eval_ahash_band_recall measures
                      # the realized recall beyond the bound

_AHASH_BAND_SQL = ", ".join(
    f"""CAST(list_sum(list_transform(
        generate_series(0, {_AHASH_BAND_BITS - 1}),
        o -> bits[{_AHASH_BAND_BITS * j} + o + 1] * (1::BIGINT << o)
    )) AS BIGINT) AS b{j}"""
    for j in range(8)
)


_AHASH_HASHES_SQL = """
    p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               4 + octet_length(encode(text)) % 29 AS wd,
               4 + (7 * octet_length(encode(text))) % 17 AS ht,
               ((3 * (4 + octet_length(encode(text)) % 29) + 3) // 4) * 4
                   AS stride
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 0
          AND octet_length(encode(text)) > 0
    ),
    sampled AS (
        SELECT doc_id,
               list_transform(
                   generate_series(0, 63),
                   i -> CAST({byte} AS BIGINT)
               ) AS s
        FROM p
    ),
    bitted AS (
        SELECT doc_id,
               list_transform(
                   s, x -> CASE WHEN 64 * x > list_sum(s)
                                THEN 1::BIGINT ELSE 0::BIGINT END
               ) AS bits
        FROM sampled
    ),
    hashes AS (SELECT doc_id, {bands} FROM bitted)
""".replace("{byte}", _BYTE_SQL.format(k=_AHASH_K)).replace(
    "{bands}", _AHASH_BAND_SQL
)

_AHASH_HAMMING_SQL = (
    "CAST("
    + " + ".join(f"bit_count(xor(ha.b{j}, hb.b{j}))" for j in range(8))
    + " AS INT)"
)


def _ahash_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image 64-bit ahash as four 16-bit band words, from the REAL
    decoded BMP grid (shared by dedup_image_ahash_pairs and
    eval_ahash_band_recall — one hash definition, zero drift).
    localCheckpointed: every consumer branches off the materialized
    hash table instead of re-decoding."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(
        (F.octet_length("payload") % 3 == 0) & (F.octet_length("payload") > 0)
    )

    def ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                bmp = synthesize_bmp(raw)
                meta = decode_media(bmp)  # real header parse
                w, h = meta["width"], meta["height"]
                stride = ((3 * w + 3) // 4) * 4
                px = np.frombuffer(
                    bmp, dtype=np.uint8, count=stride * h, offset=54
                ).reshape(h, stride)
                green = px[:, 1 : 3 * w : 3].astype(np.int64)
                r_idx = (np.arange(8) * h) // 8
                c_idx = (np.arange(8) * w) // 8
                grid = green[np.ix_(r_idx, c_idx)].ravel()  # row-major
                bits = (64 * grid > grid.sum()).astype(np.int64)
                bands = [
                    int((bits[8 * j : 8 * j + 8] << np.arange(8)).sum())
                    for j in range(8)
                ]
                rows.append((doc_id, *bands))
            yield pd.DataFrame(
                rows, columns=["doc_id"] + [f"b{j}" for j in range(8)]
            )

    return src.mapInPandas(
        ahash,
        "doc_id bigint, " + ", ".join(f"b{j} bigint" for j in range(8)),
    ).localCheckpoint(eager=True)


@query(
    "dedup_image_ahash_pairs",
    oracle=f"""
    WITH {_AHASH_HASHES_SQL},
    bands0 AS (
        SELECT doc_id, t.j AS band_idx,
               CASE t.j WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2
                        WHEN 3 THEN b3 WHEN 4 THEN b4 WHEN 5 THEN b5
                        WHEN 6 THEN b6 ELSE b7 END AS band_val
        FROM hashes, generate_series(0, 7) t(j)
    ),
    bucket_sizes AS (
        SELECT band_idx, band_val, count(*) AS bsz
        FROM bands0 GROUP BY band_idx, band_val
    ),
    bands AS (
        SELECT b.doc_id, b.band_idx, b.band_val
        FROM bands0 b JOIN bucket_sizes z
          ON z.band_idx = b.band_idx AND z.band_val = b.band_val
        WHERE z.bsz <= {_AHASH_BUCKET_CAP}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.band_val = b.band_val
         AND a.doc_id < b.doc_id
    ),
    scored AS (
        SELECT c.doc_a, c.doc_b, {_AHASH_HAMMING_SQL} AS hamming
        FROM cand c
        JOIN hashes ha ON ha.doc_id = c.doc_a
        JOIN hashes hb ON hb.doc_id = c.doc_b
    )
    SELECT doc_a, doc_b, hamming FROM (
        SELECT doc_a, doc_b, hamming,
               row_number() OVER (
                   PARTITION BY doc_a ORDER BY hamming, doc_b
               ) AS rn
        FROM scored
    ) WHERE rn <= {_AHASH_TOP_K}
    """.replace("{byte}", _BYTE_SQL.format(k=_AHASH_K)),
    tags=("multimodal", "dedup"),
)
def dedup_image_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs — the visual twin of [[dedup_simhash]]
    and the op a multimodal training pipeline runs before paying for
    image embeddings: average-hash (ahash) each REALLY-decoded BMP
    (header parse, stride framing, green lane; nearest-neighbor 8x8
    grid, bit = 64*sample > sum, integer-exact so no float mean can
    drift between engines), split the 64-bit hash into eight 8-bit
    bands and equi-join on any shared band, SKIPPING hot buckets
    (band values held by more than the bucket cap of docs) — the
    hot-bucket skip is this module's instance of the
    [[dedup_ngram_df_capped]] discipline: a band byte shared by a
    large fraction of the corpus is an uninformative bit pattern
    (flat images all hash near 0x00/0xFF), and dropping it bounds the
    candidate fan-out to cap x bands per doc no matter how degenerate
    the corpus. Pigeonhole still guarantees pairs within Hamming 7
    share a band (recall guaranteed when the shared band is cool);
    realized recall is measured by [[eval_ahash_band_recall]].
    Candidate pairs verify exact Hamming
    via XOR+popcount and each anchor keeps only its {top_k} nearest
    banded neighbors with the distance as the score (the
    [[dedup_ngram_topk_bounded]] discipline: O(k * images) output, no
    absolute cutoff the operator can't know up front — the consumer
    thresholds the reported hamming).

    Scale shape: decode + hash is one Arrow mapInPandas pass, one row
    per image, localCheckpointed so the band/anchor branches don't
    re-decode; candidates come from a 4-band equi-join (never all
    pairs); the verify is 8 integer XORs on the joined row. At 100 TB
    the capped band join is the only shuffle. Banding history, all
    eval-measured on this corpus (true neighbors sit at Hamming 9-14):
    4x16 single bands = recall 0.06 (too selective); uncapped 8x8 =
    recall 0.58 but alpha 1.5 (hot 256-value buckets go quadratic);
    28-pair compound = alpha 0.66 but recall 0.13 (too selective
    again); capped 8x8 = the one that keeps both, because the
    quadratic term lived entirely in the hot buckets."""
    hashes = _ahash_hashes(spark, sf_dir)
    bands0 = hashes.select(
        "doc_id",
        F.posexplode(F.array(*[f"b{j}" for j in range(8)])).alias(
            "band_idx", "band_val"
        ),
    )
    bucket_sizes = bands0.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("bsz")
    )
    bands = bands0.join(
        bucket_sizes.filter(F.col("bsz") <= _AHASH_BUCKET_CAP),
        ["band_idx", "band_val"],
    ).select("doc_id", "band_idx", "band_val")
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band_idx") == F.col("bb.band_idx"))
            & (F.col("ba.band_val") == F.col("bb.band_val"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc_a"),
            F.col("bb.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    ha, hb = hashes.alias("ha"), hashes.alias("hb")
    hamming = sum(
        F.bit_count(
            F.col(f"ha.b{j}").bitwiseXOR(F.col(f"hb.b{j}"))
        )
        for j in range(8)
    ).cast("int")
    scored = (
        cand.join(ha, F.col("ha.doc_id") == F.col("doc_a"))
        .join(hb, F.col("hb.doc_id") == F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
    )
    win = Window.partitionBy("doc_a").orderBy("hamming", "doc_b")
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= _AHASH_TOP_K)
        .select("doc_a", "doc_b", "hamming")
    )


dedup_image_ahash_pairs.__doc__ = dedup_image_ahash_pairs.__doc__.replace(
    "{top_k}", str(_AHASH_TOP_K)
)


# --------------------------------------------------------------------------
# Banding recall eval: banded ahash pairs vs exact all-pairs Hamming
# --------------------------------------------------------------------------


def _ahash_recall_oracle() -> str:
    from awsbeats_spark.registry import QUERIES

    banded = QUERIES["dedup_image_ahash_pairs"].oracle
    return f"""
    WITH banded AS ({banded}),
    {_AHASH_HASHES_SQL},
    anchors AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
            ) AS arn
            FROM hashes
        ) WHERE arn <= {_AHASH_EVAL_ANCHORS}
    ),
    exact AS (
        SELECT ha.doc_id AS doc_a, hb.doc_id AS doc_b,
               {_AHASH_HAMMING_SQL} AS hamming,
               row_number() OVER (
                   PARTITION BY ha.doc_id
                   ORDER BY {_AHASH_HAMMING_SQL}, hb.doc_id
               ) AS rn
        FROM anchors ha JOIN hashes hb ON ha.doc_id < hb.doc_id
        QUALIFY rn <= {_AHASH_TOP_K}
    ),
    per_anchor AS (
        SELECT e.doc_a,
               count(*) AS n_exact,
               CAST(count(b.doc_b) AS BIGINT) AS n_hit
        FROM exact e
        LEFT JOIN banded b
               ON b.doc_a = e.doc_a AND b.doc_b = e.doc_b
        GROUP BY e.doc_a
    )
    SELECT doc_a, CAST(n_exact AS BIGINT) AS n_exact, n_hit,
           round(n_hit / n_exact, 4) AS recall
    FROM per_anchor
    """


@query(
    "eval_ahash_band_recall",
    oracle=_ahash_recall_oracle(),
    tags=("multimodal", "eval"),
)
def eval_ahash_band_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured banding recall for [[dedup_image_ahash_pairs]] — the
    honesty twin the engine pairs with every approximate operator: the
    banded op's top-{k} neighbors per anchor are compared against the
    EXACT top-{k} from brute-force all-pairs Hamming over the same
    hash table, and each anchor reports hits/expected. Pigeonhole
    guarantees recall 1.0 for pairs within Hamming 7; this measures
    what the 8x8 banding actually achieves on the real corpus beyond
    that bound (the [[eval_minhash_vs_exact]] /
    [[eval_ann_recall_ivf]] pattern). The banded side embeds the
    registered op's own oracle, so the eval can never drift from what
    it evaluates.

    Scale shape: the exact side uses a FIXED-SIZE anchor set — the
    {n_anchors} md5-first images — so the brute-force side is
    O(anchors x corpus), genuinely linear in the corpus (a fractional
    sample would still be quadratic; this is the constant-times-n
    eval lane), while the banded op under test stays fully linear.
    Hashes come from the shared localCheckpointed decode (one pass),
    and the join carries eight ints per row."""
    hashes = _ahash_hashes(spark, sf_dir)
    wa = Window.orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    anchors = (
        hashes.withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") <= _AHASH_EVAL_ANCHORS)
        .drop("arn")
    )
    ha, hb = anchors.alias("ha"), hashes.alias("hb")
    hamming = sum(
        F.bit_count(F.col(f"ha.b{j}").bitwiseXOR(F.col(f"hb.b{j}")))
        for j in range(8)
    ).cast("int")
    we = Window.partitionBy("doc_a").orderBy("hamming", "doc_b")
    exact = (
        ha.join(hb, F.col("ha.doc_id") < F.col("hb.doc_id"))
        .select(
            F.col("ha.doc_id").alias("doc_a"),
            F.col("hb.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .withColumn("rn", F.row_number().over(we))
        .filter(F.col("rn") <= _AHASH_TOP_K)
    )
    from awsbeats_spark.registry import QUERIES

    banded = QUERIES["dedup_image_ahash_pairs"].fn(spark, sf_dir).select(
        "doc_a", F.col("doc_b").alias("bb"), F.lit(1).alias("hit")
    )
    per_anchor = (
        exact.join(
            banded,
            (exact["doc_a"] == banded["doc_a"])
            & (exact["doc_b"] == banded["bb"]),
            "left",
        )
        .select(exact["doc_a"].alias("doc_a"), "hit")
        .groupBy("doc_a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("n_hit"),
        )
    )
    return per_anchor.select(
        "doc_a",
        "n_exact",
        "n_hit",
        rnd(F.col("n_hit") / F.col("n_exact"), 4).alias("recall"),
    )


eval_ahash_band_recall.__doc__ = (
    eval_ahash_band_recall.__doc__
    .replace("{k}", str(_AHASH_TOP_K))
    .replace("{n_anchors}", str(_AHASH_EVAL_ANCHORS))
)


# --------------------------------------------------------------------------
# Voice-activity-style segmentation: islands of active RMS windows
# --------------------------------------------------------------------------

# integer-exact activity rule: a 256-sample window is ACTIVE when its
# mean absolute deviation from the 8-bit midpoint exceeds 33.5, i.e.
# 2 * sum|x-128| > 67 * n — no float compare can drift cross-engine.
_VAD_NUM = 67


@query(
    "multimodal_audio_active_segments",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               600 + octet_length(encode(text)) % 500 AS ns
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 1
          AND octet_length(encode(text)) > 0
    ),
    w AS (
        SELECT doc_id,
               unnest(list_transform(
                   generate_series(0,
                       CAST(ceil(ns / {_AUDIO_WIN}.0) AS BIGINT) - 1),
                   w -> {{
                       'w': w,
                       'cnt': least(ns - w * {_AUDIO_WIN}, {_AUDIO_WIN}),
                       'sd': list_sum(list_transform(
                           generate_series(1,
                               least(ns - w * {_AUDIO_WIN}, {_AUDIO_WIN})),
                           j -> abs(CAST({_BYTE_SQL.format(
                               k=f"w * {_AUDIO_WIN} + j - 1")} AS BIGINT)
                               - 128)))
                   }})) AS u
        FROM p
    ),
    act AS (
        SELECT doc_id, u.w AS window_id, u.sd AS sd, u.cnt AS cnt
        FROM w WHERE 2 * u.sd > {_VAD_NUM} * u.cnt
    ),
    isl AS (
        SELECT doc_id, window_id, sd, cnt,
               window_id - row_number() OVER (
                   PARTITION BY doc_id ORDER BY window_id) AS grp
        FROM act
    )
    SELECT doc_id,
           CAST(min(window_id) AS BIGINT) AS seg_start,
           CAST(max(window_id) AS BIGINT) AS seg_end,
           CAST(count(*) AS BIGINT) AS n_windows,
           round(sum(sd) / CAST(sum(cnt) AS DOUBLE), 4) AS mean_activity
    FROM isl GROUP BY doc_id, grp
    """,
    tags=("multimodal",),
)
def multimodal_audio_active_segments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Voice-activity-style segmentation over the REAL decoded PCM
    stream: {win}-sample windows are ACTIVE when their mean absolute
    deviation from the 8-bit midpoint exceeds 33.5 (the integer-exact
    2*sum > 67*n rule — the threshold sits at this corpus's median
    window activity so segmentation actually splits), and consecutive
    active windows merge into segments via the gaps-and-islands trick
    ([[window_sessionize_gap]]'s id-minus-rank grouping, applied to
    window ids instead of timestamps). Each segment reports its span
    and mean activity — the structure a speech pipeline extracts
    before paying for transcription, and the temporal sibling of the
    scalar [[multimodal_audio_silence_gate]] verdict.

    Scale shape: decode emits one row per window (bounded: ns/{win}
    per clip) from one Arrow mapInPandas pass; the island window and
    the segment fold shuffle on doc_id only. Window-grain activity is
    exact integer arithmetic, so the float appears only in the final
    rounded per-segment ratio."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(
        (F.octet_length("payload") % 3 == 1) & (F.octet_length("payload") > 0)
    )

    def winrows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                wav = synthesize_wav(raw)
                meta = decode_media(wav)  # real chunk walk
                ns = meta["width"]  # WAV decode reports samples as width
                data_off = wav.index(b"data") + 8
                pcm = np.frombuffer(
                    wav, dtype=np.uint8, count=ns, offset=data_off
                ).astype(np.int64)
                dev = np.abs(pcm - 128)
                for w in range(-(-ns // _AUDIO_WIN)):
                    chunk = dev[w * _AUDIO_WIN : (w + 1) * _AUDIO_WIN]
                    rows.append(
                        (doc_id, w, int(chunk.sum()), len(chunk))
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "window_id", "sd", "cnt"]
            )

    wins = src.mapInPandas(
        winrows, "doc_id bigint, window_id bigint, sd bigint, cnt bigint"
    )
    act = wins.filter(2 * F.col("sd") > _VAD_NUM * F.col("cnt"))
    iw = Window.partitionBy("doc_id").orderBy("window_id")
    isl = act.withColumn(
        "grp", F.col("window_id") - F.row_number().over(iw)
    )
    return isl.groupBy("doc_id", "grp").agg(
        F.min("window_id").cast("long").alias("seg_start"),
        F.max("window_id").cast("long").alias("seg_end"),
        F.count(F.lit(1)).cast("long").alias("n_windows"),
        rnd(
            F.sum("sd") / F.sum("cnt").cast("double"), 4
        ).alias("mean_activity"),
    ).drop("grp")


multimodal_audio_active_segments.__doc__ = (
    multimodal_audio_active_segments.__doc__.replace(
        "{win}", str(_AUDIO_WIN)
    )
)


# --------------------------------------------------------------------------
# Spatial autocorrelation (Moran's I, rook adjacency) on decoded pixels
# --------------------------------------------------------------------------

_GREEN_K = "((j - 1) // wd) * stride + 3 * ((j - 1) % wd) + 1"


@query(
    "multimodal_bmp_spatial_autocorr",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               4 + octet_length(encode(text)) % 29 AS wd,
               4 + (7 * octet_length(encode(text))) % 17 AS ht,
               ((3 * (4 + octet_length(encode(text)) % 29) + 3) // 4) * 4
                   AS stride
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 0
          AND octet_length(encode(text)) > 0
    ),
    sums AS (
        SELECT doc_id, wd, ht,
               CAST(ht * (wd - 1) + (ht - 1) * wd AS BIGINT) AS n_pairs,
               list_sum(list_transform(generate_series(1, wd * ht), j ->
                   {_BYTE_SQL.format(k=_GREEN_K)})) AS s,
               list_sum(list_transform(generate_series(1, wd * ht), j ->
                   pow({_BYTE_SQL.format(k=_GREEN_K)}, 2))) AS ss,
               list_sum(list_transform(generate_series(0, ht - 1),
                   r -> list_sum(list_transform(generate_series(0, wd - 2),
                       c -> {_BYTE_SQL.format(k="r * stride + 3 * c + 1")}
                          * {_BYTE_SQL.format(k="r * stride + 3 * c + 4")}
                   )))) AS ph,
               list_sum(list_transform(generate_series(0, ht - 2),
                   r -> list_sum(list_transform(generate_series(0, wd - 1),
                       c -> {_BYTE_SQL.format(k="r * stride + 3 * c + 1")}
                          * {_BYTE_SQL.format(k="(r + 1) * stride + 3 * c + 1")}
                   )))) AS pv,
               list_sum(list_transform(generate_series(0, ht - 1),
                   r -> list_sum(list_transform(generate_series(0, wd - 2),
                       c -> {_BYTE_SQL.format(k="r * stride + 3 * c + 1")}
                          + {_BYTE_SQL.format(k="r * stride + 3 * c + 4")}
                   )))) AS th,
               list_sum(list_transform(generate_series(0, ht - 2),
                   r -> list_sum(list_transform(generate_series(0, wd - 1),
                       c -> {_BYTE_SQL.format(k="r * stride + 3 * c + 1")}
                          + {_BYTE_SQL.format(k="(r + 1) * stride + 3 * c + 1")}
                   )))) AS tv
        FROM p
    )
    SELECT doc_id, CAST(wd AS INT) AS width, CAST(ht AS INT) AS height,
           round(
               (CAST(wd * ht AS DOUBLE) / n_pairs)
               * ((ph + pv)
                  - (s / CAST(wd * ht AS DOUBLE)) * (th + tv)
                  + n_pairs * (s / CAST(wd * ht AS DOUBLE))
                            * (s / CAST(wd * ht AS DOUBLE)))
               / (ss - s * s / CAST(wd * ht AS DOUBLE)),
           6) AS morans_i
    FROM sums
    WHERE ss - s * s / CAST(wd * ht AS DOUBLE) > 0
    """,
    tags=("multimodal",),
)
def multimodal_bmp_spatial_autocorr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spatial autocorrelation of each REALLY-decoded image's green
    channel — Moran's I under rook (4-neighbor) adjacency, the classic
    texture/smoothness statistic: I near +1 means neighboring pixels
    agree (smooth gradients, real photographs), near 0 means spatial
    noise (synthetic or encrypted payloads masquerading as images —
    this op is a steganography/garbage screen), negative means
    checkerboarding. Complements [[multimodal_image_edge_density]]
    (gradient energy) and [[multimodal_image_histogram_entropy]]
    (tonal diversity) with the SPATIAL-structure axis. All five
    component sums (value, square, horizontal/vertical neighbor
    products and endpoint sums) are exact integers over the pixel
    grid, so the closed-form I — (N/W) * [P - m*T + W*m^2] / (SS -
    S^2/N) — is bit-identical to the oracle's hex-nibble recompute;
    constant images (zero variance) are excluded, I being undefined.

    Scale shape: one Arrow mapInPandas decode pass, numpy does the
    O(w*h) products per image, one row out per image — embarrassingly
    parallel, no shuffle."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(
        (F.octet_length("payload") % 3 == 0) & (F.octet_length("payload") > 0)
    )

    def moran(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                bmp = synthesize_bmp(raw)
                meta = decode_media(bmp)  # real header parse
                w, h = meta["width"], meta["height"]
                stride = ((3 * w + 3) // 4) * 4
                px = np.frombuffer(
                    bmp, dtype=np.uint8, count=stride * h, offset=54
                ).reshape(h, stride)
                g = px[:, 1 : 3 * w : 3].astype(np.int64)
                n = w * h
                n_pairs = h * (w - 1) + (h - 1) * w
                s = int(g.sum())
                ss = int((g * g).sum())
                ph = int((g[:, :-1] * g[:, 1:]).sum())
                pv = int((g[:-1, :] * g[1:, :]).sum())
                th = int((g[:, :-1] + g[:, 1:]).sum())
                tv = int((g[:-1, :] + g[1:, :]).sum())
                rows.append(
                    (doc_id, w, h, n, n_pairs, s, ss, ph, pv, th, tv)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n", "n_pairs",
                    "s", "ss", "ph", "pv", "th", "tv",
                ],
            )

    sums = src.mapInPandas(
        moran,
        "doc_id bigint, width int, height int, n bigint, n_pairs bigint,"
        " s bigint, ss bigint, ph bigint, pv bigint, th bigint, tv bigint",
    )
    m = F.col("s") / F.col("n").cast("double")
    denom = F.col("ss") - F.col("s") * F.col("s") / F.col("n").cast(
        "double"
    )
    num = (
        (F.col("ph") + F.col("pv"))
        - m * (F.col("th") + F.col("tv"))
        + F.col("n_pairs") * m * m
    )
    return sums.filter(denom > 0).select(
        "doc_id",
        "width",
        "height",
        rnd(
            (F.col("n").cast("double") / F.col("n_pairs")) * num / denom, 6
        ).alias("morans_i"),
    )


# --------------------------------------------------------------------------
# RGB channel correlation (grayscale-likeness / channel-shift screen)
# --------------------------------------------------------------------------

_CH_OFF = {"b": 0, "g": 1, "r": 2}  # BMP stores BGR


def _chan_sum_sql(off: int, power_pair: str) -> str:
    """SQL integer sum over pixels of one channel (or product of two).
    power_pair: 'x' -> sum c, 'xx' -> sum c*c, with {o2} for pairs."""
    base = _BYTE_SQL.format(
        k=f"((j - 1) // wd) * stride + 3 * ((j - 1) % wd) + {off}"
    )
    if power_pair == "x":
        return f"list_sum(list_transform(generate_series(1, wd * ht), j -> {base}))"
    return (
        f"list_sum(list_transform(generate_series(1, wd * ht), j -> "
        f"{base} * {{other}}))"
    )


@query(
    "multimodal_rgb_channel_correlation",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               4 + octet_length(encode(text)) % 29 AS wd,
               4 + (7 * octet_length(encode(text))) % 17 AS ht,
               ((3 * (4 + octet_length(encode(text)) % 29) + 3) // 4) * 4
                   AS stride
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 0
          AND octet_length(encode(text)) > 0
    ),
    sums AS (
        SELECT doc_id, wd * ht AS npx,
               {_chan_sum_sql(0, 'x')} AS sb,
               {_chan_sum_sql(1, 'x')} AS sg,
               {_chan_sum_sql(2, 'x')} AS sr,
               {_chan_sum_sql(0, 'xx').format(other=_BYTE_SQL.format(k="((j - 1) // wd) * stride + 3 * ((j - 1) % wd) + 0"))} AS sbb,
               {_chan_sum_sql(1, 'xx').format(other=_BYTE_SQL.format(k="((j - 1) // wd) * stride + 3 * ((j - 1) % wd) + 1"))} AS sgg,
               {_chan_sum_sql(2, 'xx').format(other=_BYTE_SQL.format(k="((j - 1) // wd) * stride + 3 * ((j - 1) % wd) + 2"))} AS srr,
               {_chan_sum_sql(2, 'xx').format(other=_BYTE_SQL.format(k="((j - 1) // wd) * stride + 3 * ((j - 1) % wd) + 1"))} AS srg,
               {_chan_sum_sql(1, 'xx').format(other=_BYTE_SQL.format(k="((j - 1) // wd) * stride + 3 * ((j - 1) % wd) + 0"))} AS sgb
        FROM p
    )
    SELECT doc_id,
           round((srg / npx - (sr / CAST(npx AS DOUBLE)) * (sg / npx))
                 / (sqrt(srr / npx - pow(sr / CAST(npx AS DOUBLE), 2))
                    * sqrt(sgg / npx - pow(sg / CAST(npx AS DOUBLE), 2))),
                 6) AS corr_rg,
           round((sgb / npx - (sg / CAST(npx AS DOUBLE)) * (sb / npx))
                 / (sqrt(sgg / npx - pow(sg / CAST(npx AS DOUBLE), 2))
                    * sqrt(sbb / npx - pow(sb / CAST(npx AS DOUBLE), 2))),
                 6) AS corr_gb
    FROM sums
    WHERE srr / CAST(npx AS DOUBLE) - pow(sr / CAST(npx AS DOUBLE), 2) > 0
      AND sgg / CAST(npx AS DOUBLE) - pow(sg / CAST(npx AS DOUBLE), 2) > 0
      AND sbb / CAST(npx AS DOUBLE) - pow(sb / CAST(npx AS DOUBLE), 2) > 0
    """,
    tags=("multimodal",),
)
def multimodal_rgb_channel_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-channel correlation of each REALLY-decoded image —
    Pearson r between the red/green and green/blue pixel lanes: a
    grayscale image re-encoded as color shows r ~ 1.0 on both pairs
    (the wasted-channels signal a vision pipeline uses to route into
    single-channel processing), natural photos sit high-but-below-1,
    and channel-shifted/synthetic payloads decorrelate. Completes the
    image-QA battery on its third axis (edges = sharpness, histogram
    = tonal diversity, Moran = spatial structure, this = spectral
    redundancy). All sums are exact integers over the BGR byte lanes
    so the correlations are bit-identical to the oracle's hex-nibble
    recompute; constant channels are excluded (r undefined).

    Scale shape: one Arrow mapInPandas decode, numpy channel moments
    per image, one row out — embarrassingly parallel."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(
        (F.octet_length("payload") % 3 == 0) & (F.octet_length("payload") > 0)
    )

    def chan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                bmp = synthesize_bmp(raw)
                meta = decode_media(bmp)
                w, h = meta["width"], meta["height"]
                stride = ((3 * w + 3) // 4) * 4
                px = np.frombuffer(
                    bmp, dtype=np.uint8, count=stride * h, offset=54
                ).reshape(h, stride)
                b = px[:, 0 : 3 * w : 3].astype(np.int64).ravel()
                g = px[:, 1 : 3 * w : 3].astype(np.int64).ravel()
                r = px[:, 2 : 3 * w : 3].astype(np.int64).ravel()
                npx = w * h
                rows.append(
                    (
                        doc_id, npx,
                        int(b.sum()), int(g.sum()), int(r.sum()),
                        int((b * b).sum()), int((g * g).sum()),
                        int((r * r).sum()),
                        int((r * g).sum()), int((g * b).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "npx", "sb", "sg", "sr",
                    "sbb", "sgg", "srr", "srg", "sgb",
                ],
            )

    sums = src.mapInPandas(
        chan,
        "doc_id bigint, npx bigint, sb bigint, sg bigint, sr bigint,"
        " sbb bigint, sgg bigint, srr bigint, srg bigint, sgb bigint",
    )
    npx = F.col("npx").cast("double")
    mr, mg, mb = (
        F.col("sr") / npx, F.col("sg") / npx, F.col("sb") / npx
    )
    vr = F.col("srr") / npx - mr * mr
    vg = F.col("sgg") / npx - mg * mg
    vb = F.col("sbb") / npx - mb * mb
    corr_rg = (F.col("srg") / npx - mr * mg) / (F.sqrt(vr) * F.sqrt(vg))
    corr_gb = (F.col("sgb") / npx - mg * mb) / (F.sqrt(vg) * F.sqrt(vb))
    return sums.filter((vr > 0) & (vg > 0) & (vb > 0)).select(
        "doc_id",
        rnd(corr_rg, 6).alias("corr_rg"),
        rnd(corr_gb, 6).alias("corr_gb"),
    )


# --------------------------------------------------------------------------
# Video scene cuts: per-frame luma deltas over a motion Y4M stream
# --------------------------------------------------------------------------

_CUT_MAX_FRAMES = 8  # prefix frames probed per clip
_CUT_ROTATE = 17  # per-frame byte rotation of the source stream
_CUT_THRESHOLD = 8.0  # mean-luma jump that counts as a cut


def synthesize_y4m_motion(data: bytes) -> bytes:
    """A valid YUV4MPEG2 stream with SHOT structure: frame i's bytes
    are the source stream rotated left by i*{rot} (mod n) — smooth
    "motion" within a shot — and every 4th frame (i % 4 == 3) is
    luma-INVERTED (255 - b), a hard scene change. Byte j of frame i is
    therefore data[(i*{rot} + j) % n], inverted on cut frames — the
    property the scene-cut oracle replays nibble-exactly. Same
    geometry rules as :func:`synthesize_y4m` (and the same 37-byte
    header), so :func:`decode_media` parses it as a normal video."""
    n = len(data)
    w = 10 + 2 * (n % 7)
    h = 10 + 2 * ((7 * n) % 5)
    frames = 1 + n % 24
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode("ascii")
    frame_bytes = w * h * 3 // 2
    parts = []
    for i in range(frames):
        off = (i * _CUT_ROTATE) % n
        rot = data[off:] + data[:off]
        body = _cycle_bytes(rot, frame_bytes)
        if i % 4 == 3:
            body = bytes(255 - b for b in body)
        parts.append(b"FRAME\n" + body)
    return header + b"".join(parts)


synthesize_y4m_motion.__doc__ = synthesize_y4m_motion.__doc__.replace(
    "{rot}", str(_CUT_ROTATE)
)


@query(
    "multimodal_video_scene_cuts",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               10 + 2 * (octet_length(encode(text)) % 7) AS wd,
               10 + 2 * ((7 * octet_length(encode(text))) % 5) AS ht,
               1 + octet_length(encode(text)) % 24 AS n_frames
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 2
    ),
    fr AS (
        SELECT doc_id, h, n, wd, ht, n_frames,
               unnest(generate_series(
                   0, least(n_frames, {_CUT_MAX_FRAMES}) - 1)) AS f
        FROM p
    ),
    sums AS (
        SELECT doc_id, wd, ht, n_frames, f,
               list_sum(list_transform(
                   generate_series(1, wd * ht),
                   j -> CASE WHEN f % 4 = 3
                        THEN 255.0 - {_BYTE_SQL.format(k=f"f * {_CUT_ROTATE} + j - 1")}
                        ELSE {_BYTE_SQL.format(k=f"f * {_CUT_ROTATE} + j - 1")}
                        END))
                   AS s
        FROM fr
    ),
    deltas AS (
        SELECT doc_id, wd, ht, n_frames, f, s,
               abs(s - lag(s) OVER (PARTITION BY doc_id ORDER BY f))
                   / (wd * ht) AS d
        FROM sums
    )
    SELECT doc_id,
           CAST(any_value(n_frames) AS BIGINT) AS n_frames,
           CAST(count(*) AS BIGINT) AS n_probed,
           CAST(coalesce(sum(CASE WHEN d > {_CUT_THRESHOLD} THEN 1 END), 0)
                AS BIGINT) AS n_cuts,
           CAST(coalesce(min(CASE WHEN d > {_CUT_THRESHOLD} THEN f END), 0)
                AS BIGINT) AS first_cut_frame,
           round(coalesce(max(d), 0.0), 4) AS max_luma_delta
    FROM deltas GROUP BY doc_id
    """,
)
def multimodal_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over each video document's frame sequence —
    the shot-boundary primitive a video-training pipeline runs before
    sampling frames (one frame per SHOT, not per fixed stride, is what
    keeps clips from contributing 24 near-identical images): mean-luma
    jump between consecutive frames above {th} levels = a cut. Probes
    the first {mf} frames of the REAL container (FRAME-marker walk over
    the motion Y4M stream, whose frames genuinely differ — see
    :func:`synthesize_y4m_motion`).

    Parity: per-frame luma sums are exact integers and the cut
    predicate compares an exact rational (delta-sum / area) against the
    threshold, so cut counts, first-cut frame, and the rounded max
    delta are bit-identical to the oracle's hex-nibble replay of the
    rotated byte stream. Scale shape: embarrassingly parallel
    mapInPandas per payload, no shuffle; one output row per clip; cost
    is O(probed_frames x width x height) regardless of clip length."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") % 3 == 2)

    def cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                y4m = synthesize_y4m_motion(bytes(raw))
                meta = decode_media(y4m)  # real header parse + frame walk
                wd, ht = meta["width"], meta["height"]
                frame_bytes = wd * ht * 3 // 2
                n_frames = meta["n_frames"]
                probed = min(n_frames, _CUT_MAX_FRAMES)
                area = wd * ht
                sums = []
                for i in range(probed):
                    off = 37 + i * (6 + frame_bytes) + 6
                    plane = np.frombuffer(
                        y4m, dtype=np.uint8, count=area, offset=off
                    ).astype(np.int64)
                    sums.append(int(plane.sum()))
                deltas = [
                    abs(sums[i] - sums[i - 1]) / area
                    for i in range(1, probed)
                ]
                cut_frames = [
                    i + 1
                    for i, d in enumerate(deltas)
                    if d > _CUT_THRESHOLD
                ]
                rows.append(
                    (
                        doc_id,
                        n_frames,
                        probed,
                        len(cut_frames),
                        cut_frames[0] if cut_frames else 0,
                        max(deltas) if deltas else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_frames",
                    "n_probed",
                    "n_cuts",
                    "first_cut_frame",
                    "max_luma_delta",
                ],
            )

    raw = src.mapInPandas(
        cuts,
        "doc_id bigint, n_frames bigint, n_probed bigint, n_cuts bigint,"
        " first_cut_frame bigint, max_luma_delta double",
    )
    # round JVM-side (HALF_UP, matching DuckDB) — python round() is
    # banker's and can diverge on exact .00005 rationals
    return raw.select(
        "doc_id",
        "n_frames",
        "n_probed",
        "n_cuts",
        "first_cut_frame",
        rnd("max_luma_delta", 4).alias("max_luma_delta"),
    )


multimodal_video_scene_cuts.__doc__ = (
    multimodal_video_scene_cuts.__doc__.replace("{th}", str(_CUT_THRESHOLD))
    .replace("{mf}", str(_CUT_MAX_FRAMES))
)


# --------------------------------------------------------------------------
# Keyframe selection: one representative frame per detected shot
# --------------------------------------------------------------------------


@query(
    "multimodal_video_keyframe_per_shot",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               10 + 2 * (octet_length(encode(text)) % 7) AS wd,
               10 + 2 * ((7 * octet_length(encode(text))) % 5) AS ht,
               1 + octet_length(encode(text)) % 24 AS n_frames
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 2
    ),
    fr AS (
        SELECT doc_id, h, n, wd, ht, n_frames,
               unnest(generate_series(
                   0, least(n_frames, {_CUT_MAX_FRAMES}) - 1)) AS f
        FROM p
    ),
    sums AS (
        SELECT doc_id, wd, ht, f,
               CAST(list_sum(list_transform(
                   generate_series(1, wd * ht),
                   j -> CASE WHEN f % 4 = 3
                        THEN 255 - CAST({_BYTE_SQL.format(k=f"f * {_CUT_ROTATE} + j - 1")} AS BIGINT)
                        ELSE CAST({_BYTE_SQL.format(k=f"f * {_CUT_ROTATE} + j - 1")} AS BIGINT)
                        END)) AS BIGINT)
                   AS s
        FROM fr
    ),
    shots AS (
        SELECT doc_id, wd, ht, f, s,
               sum(CASE WHEN d IS NOT NULL AND d > {_CUT_THRESHOLD}
                        THEN 1 ELSE 0 END) OVER (
                   PARTITION BY doc_id ORDER BY f
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS shot_idx
        FROM (
            SELECT *, abs(s - lag(s) OVER (PARTITION BY doc_id ORDER BY f))
                          * 1.0 / (wd * ht) AS d
            FROM sums
        )
    ),
    stats AS (
        SELECT doc_id, shot_idx, wd, ht, f, s,
               count(*) OVER w AS len_shot,
               sum(s) OVER w AS tot_s,
               min(f) OVER w AS start_f,
               max(f) OVER w AS end_f
        FROM shots
        WINDOW w AS (PARTITION BY doc_id, shot_idx)
    )
    SELECT doc_id, CAST(shot_idx AS BIGINT) AS shot_idx,
           CAST(start_f AS BIGINT) AS start_frame,
           CAST(end_f AS BIGINT) AS end_frame,
           CAST(len_shot AS BIGINT) AS n_frames_shot,
           CAST(f AS BIGINT) AS keyframe,
           round(s * 1.0 / (wd * ht), 4) AS keyframe_mean_luma
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY doc_id, shot_idx
                   ORDER BY abs(s * len_shot - tot_s), f
               ) AS pick
        FROM stats
    ) WHERE pick = 1
    """,
)
def multimodal_video_keyframe_per_shot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keyframe selection — one REPRESENTATIVE frame per detected shot,
    the sampling policy [[multimodal_video_scene_cuts]]'s docstring
    argues for (a frame per shot, not per fixed stride, is what stops
    a 24-frame clip contributing 24 near-identical training images):
    frames segment into shots at the same mean-luma-jump cuts, and
    each shot's keyframe is the frame whose luma mass is closest to
    the shot's own mean — the medoid-style pick, computed EXACTLY as
    argmin |s_f * len_shot - Σ s| over integers (no division, no
    float), frame-index tiebreak.

    Parity: per-frame luma sums are exact BIGINTs from the hex-nibble
    replay; the shot segmentation reuses the integer-exact cut
    predicate; the argmin compares integers — the only float in the
    row is the final reported mean luma, rounded at 4 dp.

    Scale shape: identical to the cut detector — embarrassingly
    parallel mapInPandas per clip, no shuffle (the oracle's windows
    replay the same per-clip logic relationally); output is one row
    per shot, bounded by probed frames per clip."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") % 3 == 2)

    def keyframes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                y4m = synthesize_y4m_motion(bytes(raw))
                meta = decode_media(y4m)
                wd, ht = meta["width"], meta["height"]
                frame_bytes = wd * ht * 3 // 2
                probed = min(meta["n_frames"], _CUT_MAX_FRAMES)
                area = wd * ht
                sums = []
                for i in range(probed):
                    off = 37 + i * (6 + frame_bytes) + 6
                    plane = np.frombuffer(
                        y4m, dtype=np.uint8, count=area, offset=off
                    ).astype(np.int64)
                    sums.append(int(plane.sum()))
                # integer-exact cut predicate: |ds| / area > thr
                shot_of = [0] * probed
                shot = 0
                for i in range(1, probed):
                    if abs(sums[i] - sums[i - 1]) / area > _CUT_THRESHOLD:
                        shot += 1
                    shot_of[i] = shot
                for sh in range(shot + 1):
                    fs = [i for i in range(probed) if shot_of[i] == sh]
                    tot = sum(sums[i] for i in fs)
                    key = min(
                        fs, key=lambda i: (abs(sums[i] * len(fs) - tot), i)
                    )
                    rows.append(
                        (
                            doc_id,
                            sh,
                            fs[0],
                            fs[-1],
                            len(fs),
                            key,
                            sums[key] / area,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "shot_idx", "start_frame", "end_frame",
                    "n_frames_shot", "keyframe", "keyframe_mean_luma",
                ],
            )

    raw = src.mapInPandas(
        keyframes,
        "doc_id bigint, shot_idx bigint, start_frame bigint,"
        " end_frame bigint, n_frames_shot bigint, keyframe bigint,"
        " keyframe_mean_luma double",
    )
    return raw.select(
        "doc_id",
        "shot_idx",
        "start_frame",
        "end_frame",
        "n_frames_shot",
        "keyframe",
        rnd("keyframe_mean_luma", 4).alias("keyframe_mean_luma"),
    )


# --------------------------------------------------------------------------
# Clipping detection over real PCM samples (rail-proximity QA gate)
# --------------------------------------------------------------------------

_CLIP_DEV = 90  # clipped when |sample - 128| >= this (8-bit midpoint PCM)


@query(
    "multimodal_audio_clipping_detect",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               600 + octet_length(encode(text)) % 500 AS ns
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 1
    ),
    s AS (
        SELECT doc_id, ns, j,
               CASE WHEN abs({_BYTE_SQL.format(k="j - 1")} - 128)
                         >= {_CLIP_DEV}
                    THEN 1 ELSE 0 END AS c
        FROM p, unnest(generate_series(1, CAST(ns AS INT))) AS t(j)
    ),
    isl AS (
        SELECT doc_id, ns, j, c,
               j - row_number() OVER (PARTITION BY doc_id, c ORDER BY j)
                   AS grp
        FROM s
    ),
    runs AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS run_len
        FROM isl WHERE c = 1 GROUP BY doc_id, grp
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(coalesce(count(*), 0) AS BIGINT) AS n_runs,
               CAST(coalesce(max(run_len), 0) AS BIGINT) AS max_run,
               CAST(coalesce(sum(run_len), 0) AS BIGINT) AS n_clipped
        FROM runs GROUP BY doc_id
    )
    SELECT p.doc_id, CAST(p.ns AS BIGINT) AS n_samples,
           coalesce(d.n_clipped, 0) AS n_clipped,
           round(coalesce(d.n_clipped, 0) * 1.0 / p.ns, 6) AS clip_rate,
           coalesce(d.max_run, 0) AS max_run,
           coalesce(d.n_runs, 0) AS n_clip_runs
    FROM p LEFT JOIN per_doc d USING (doc_id)
    """,
)
def multimodal_audio_clipping_detect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Clipping QA gate over each audio document's REAL PCM bytes: the
    fraction of samples pinned near the 8-bit rails (|x - 128| >=
    {dev}) plus the run structure of the clipped regions — count of
    maximal clipped runs and the longest one. Rate alone can't
    distinguish benign transient peaks from a sustained overdriven
    segment; the longest-run statistic is what an audio ingest
    pipeline actually gates on before paying for transcription
    ([[multimodal_audio_dynamic_range]] measures headroom,
    [[multimodal_audio_silence_gate]] the floor; this is the ceiling).
    The container is parsed for real (RIFF data-chunk offset + size),
    and every statistic is integer arithmetic on the sample bytes, so
    the DuckDB oracle replays them exactly from the hex-nibble byte
    decode with a gaps-and-islands run grouping.

    Scale shape: embarrassingly parallel Arrow ``mapInPandas``, no
    shuffle, one output row per clip; runs are found with one
    vectorized numpy pass per payload, never a Python per-sample
    loop."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") % 3 == 1)

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                wav = synthesize_wav(bytes(raw))
                data_off = wav.index(b"data") + 8
                data_size = struct.unpack_from("<I", wav, data_off - 4)[0]
                arr = np.frombuffer(
                    wav, dtype=np.uint8, count=data_size, offset=data_off
                ).astype(np.int64)
                c = (np.abs(arr - 128) >= _CLIP_DEV).astype(np.int8)
                n_clipped = int(c.sum())
                # maximal runs of 1s: boundaries where the flag changes
                d = np.diff(np.concatenate(([0], c, [0])))
                starts = np.flatnonzero(d == 1)
                ends = np.flatnonzero(d == -1)
                lens = ends - starts
                rows.append(
                    (
                        doc_id,
                        len(arr),
                        n_clipped,
                        int(lens.max()) if lens.size else 0,
                        int(lens.size),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "n_clipped",
                    "max_run",
                    "n_clip_runs",
                ],
            )

    raw = src.mapInPandas(
        detect,
        "doc_id bigint, n_samples bigint, n_clipped bigint,"
        " max_run bigint, n_clip_runs bigint",
    )
    # rate rounds JVM-side with the shared half-up rnd (Python round()
    # is banker's — a tie at the 6th decimal would diverge from the
    # oracle)
    return raw.select(
        "doc_id",
        "n_samples",
        "n_clipped",
        rnd(F.col("n_clipped") / F.col("n_samples"), 6).alias("clip_rate"),
        "max_run",
        "n_clip_runs",
    )


multimodal_audio_clipping_detect.__doc__ = (
    multimodal_audio_clipping_detect.__doc__.replace("{dev}", str(_CLIP_DEV))
)


# --------------------------------------------------------------------------
# Spectral centroid / bandwidth / rolloff: frequency-domain audio gate
# --------------------------------------------------------------------------

_SPEC_N = 64  # DFT length (prefix samples; every WAV has >= 600)
_SPEC_K = 32  # positive-frequency bins probed (N/2, DC excluded)
_SPEC_ROLL = 0.85  # rolloff energy fraction
_SPEC_FLOOR = 1e-6  # below this total power the clip is silent/constant


@query(
    "multimodal_audio_spectral_centroid",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 1
    ),
    spec AS (
        SELECT doc_id,
               list_transform(generate_series(1, {_SPEC_K}), k ->
                   pow(list_sum(list_transform(
                       generate_series(0, {_SPEC_N} - 1), j ->
                       ({_BYTE_SQL.format(k="j")} - 128.0)
                       * cos(2 * pi() * j * k / {_SPEC_N}.0))), 2)
                 + pow(list_sum(list_transform(
                       generate_series(0, {_SPEC_N} - 1), j ->
                       ({_BYTE_SQL.format(k="j")} - 128.0)
                       * sin(2 * pi() * j * k / {_SPEC_N}.0))), 2)) AS pw
        FROM p
    ),
    mom AS (
        SELECT doc_id, pw,
               list_sum(pw) AS tp,
               list_sum(list_transform(generate_series(1, {_SPEC_K}),
                                       k -> k * pw[k])) AS m1,
               list_sum(list_transform(generate_series(1, {_SPEC_K}),
                                       k -> k * k * pw[k])) AS m2
        FROM spec
    )
    SELECT doc_id,
           CASE WHEN tp >= {_SPEC_FLOOR}
                THEN round(10.0 * log10(tp), 4) END AS power_db,
           CASE WHEN tp >= {_SPEC_FLOOR}
                THEN round(m1 / tp, 4) END AS centroid_bin,
           CASE WHEN tp >= {_SPEC_FLOOR}
                THEN round(sqrt(greatest(m2 / tp - (m1 / tp) * (m1 / tp),
                                         0)), 4) END AS bandwidth_bin,
           CASE WHEN tp >= {_SPEC_FLOOR}
                THEN list_min(list_transform(
                         generate_series(1, {_SPEC_K}), k ->
                         CASE WHEN round(list_sum(pw[1:k]) / tp, 9)
                                   >= {_SPEC_ROLL}
                              THEN k ELSE {_SPEC_K + 1} END))
           END AS rolloff_bin
    FROM mom
    """,
)
def multimodal_audio_spectral_centroid(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Spectral centroid, bandwidth, and {roll}-rolloff of each audio
    document's decoded PCM — the frequency-domain brightness features a
    speech/music pipeline gates on before transcription routing
    (centroid high = sibilant/noisy, low = voiced/hum; rolloff = the
    bin below which {roll} of the energy lives), complementing the
    time-domain [[multimodal_audio_energy]] / [[ts_spectral_peak_dft]]
    pair. A {n}-point DFT over the clip's first {n} REAL-parsed WAV
    samples (every synthesized clip has >= 600) yields power
    P_k = Re^2 + Im^2 for bins k = 1..{kk}; centroid = sum k*P_k / sum
    P_k (bin units), bandwidth = the power-weighted standard deviation
    around it, power_db = 10 log10(sum P_k). Constant/silent clips
    (total power under {floor}) emit NULL features rather than the
    floating noise floor — the fp-zero spectrum of a constant signal is
    engine-dependent garbage no threshold should read.

    Parity: both engines evaluate the identical cos/sin moment sums on
    the identical cycled byte stream (numpy matrix product vs the
    oracle's hex-nibble nested list folds); sums are {n}-term doubles
    agreeing to ~1e-12 relative, rounded to 4 dp, with ratios (never
    raw exact-integer-scale powers) emitted so the round is
    knife-edge-safe — including rolloff_bin, whose cumulative-energy
    ratio is quantized to a 9-dp grid on BOTH engines before the
    {roll} threshold test. Scale shape: embarrassingly parallel Arrow
    mapInPandas, one row per audio clip, no shuffle; the DFT work is a
    fixed {n}x{kk} matrix product per clip regardless of clip length."""
    t = tables(spark, sf_dir)
    src = t.documents.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    ).filter(F.octet_length("payload") % 3 == 1)

    jj = np.arange(_SPEC_N)
    kk = np.arange(1, _SPEC_K + 1)
    cos_m = np.cos(2.0 * np.pi * np.outer(jj, kk) / _SPEC_N)
    sin_m = np.sin(2.0 * np.pi * np.outer(jj, kk) / _SPEC_N)

    def spectra(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                wav = synthesize_wav(raw)
                assert decode_media(wav)["decode_status"] == "wav"
                data_off = wav.index(b"data") + 8
                arr = np.frombuffer(
                    wav, dtype=np.uint8, count=_SPEC_N, offset=data_off
                ).astype(np.float64)
                x = arr - 128.0
                re, im = x @ cos_m, x @ sin_m
                pw = re * re + im * im
                tp = float(pw.sum())
                if tp < _SPEC_FLOOR:
                    rows.append((doc_id, tp, None, None, None))
                    continue
                m1 = float((kk * pw).sum())
                m2 = float((kk * kk * pw).sum())
                # Quantize the cumulative-energy RATIO to a shared 9-dp
                # grid before thresholding (ADVICE r10): raw
                # cumsum >= 0.85*tp compares two ~1e-12-divergent
                # summation orders (numpy matmul cumsum vs the oracle's
                # sequential prefix folds) and can flip the bin on a
                # knife edge — the same class as gap_h/Page-Hinkley.
                ratio = np.round(np.cumsum(pw) / tp, 9)
                roll = int(kk[ratio >= _SPEC_ROLL][0])
                rows.append((doc_id, tp, m1, m2, roll))
            yield pd.DataFrame(
                rows, columns=["doc_id", "tp", "m1", "m2", "roll"]
            )

    mom = src.mapInPandas(
        spectra,
        "doc_id bigint, tp double, m1 double, m2 double, roll int",
    )
    live = F.col("tp") >= _SPEC_FLOOR
    c = F.col("m1") / F.col("tp")
    return mom.select(
        "doc_id",
        F.when(live, rnd(10.0 * F.log10(F.col("tp")), 4)).alias("power_db"),
        F.when(live, rnd(c, 4)).alias("centroid_bin"),
        F.when(
            live,
            rnd(
                F.sqrt(
                    F.greatest(
                        F.col("m2") / F.col("tp") - c * c, F.lit(0.0)
                    )
                ),
                4,
            ),
        ).alias("bandwidth_bin"),
        F.when(live, F.col("roll")).alias("rolloff_bin"),
    )


multimodal_audio_spectral_centroid.__doc__ = (
    multimodal_audio_spectral_centroid.__doc__.replace("{n}", str(_SPEC_N))
    .replace("{kk}", str(_SPEC_K))
    .replace("{roll}", str(_SPEC_ROLL))
    .replace("{floor}", str(_SPEC_FLOOR))
)


# --------------------------------------------------------------------------
# Perceptual image hash (pHash: 2D DCT low-frequency signature)
# --------------------------------------------------------------------------

_PHASH_G = 16  # grayscale sample grid (G x G)
_PHASH_K = 4  # low-frequency DCT block kept (K x K, DC dropped -> 15 bits)


def bmp_phash(payload: bytes) -> tuple[int, int, int]:
    """(width, height, phash) from a 24-bpp BMP's actual pixel bytes.

    DCT perceptual hash: sample a {G}x{G} grayscale grid (nearest
    neighbor, same container walk as bmp_ahash: data offset from the
    file header, bottom-up rows, 4-byte stride), take the 2D DCT-II of
    the grid, keep the {K}x{K} lowest-frequency block, drop the DC
    term, and set bit i iff coefficient i exceeds the MEDIAN of the 15
    remaining coefficients — 15 bits packed row-major (u-major) into a
    non-negative int. The cosine tables are quantized to 12 dp and
    each stage's sums to 6 dp so the oracle's sequential list folds
    land on the same grid as numpy's blocked matmuls (the
    spectral-centroid parity discipline).
    """
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24 or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} w={w} h={h}")
    top_down = h < 0
    h = abs(h)
    stride = ((3 * w + 3) // 4) * 4
    if len(payload) < data_off + stride * h:
        raise ValueError("truncated BMP pixel array")
    px = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)
    rows = px if top_down else px[::-1]  # normalize to top-down
    g = _PHASH_G
    ys = ((2 * np.arange(g) + 1) * h // (2 * g)).astype(np.int64)
    xs = ((2 * np.arange(g) + 1) * w // (2 * g)).astype(np.int64)
    sub = rows[ys][:, (3 * xs)[:, None] + np.arange(3)].astype(np.int64)
    gray = sub.sum(axis=2) // 3
    # 12-dp-quantized DCT basis, applied in two 6-dp-quantized stages
    # (rowsums then coefficients) mirrored exactly by the oracle
    basis = np.round(
        np.cos(
            np.pi
            * (2 * np.arange(g)[None, :] + 1)
            * np.arange(_PHASH_K)[:, None]
            / (2 * g)
        ),
        12,
    )
    rs = np.round(gray.astype(np.float64) @ basis.T, 6)  # (G, K)
    coef = np.round(basis @ rs, 6).flatten()[1:]  # drop DC -> 15
    med = np.sort(coef)[len(coef) // 2]
    bits = coef > med
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    return int(w), int(h), int(val)


PHASH_SCHEMA = "doc_id bigint, width int, height int, phash int"


def _phash_oracle() -> str:
    """Bit-exact DuckDB replay of bmp_phash over the synthesis spec —
    the _ahash_oracle closed-form pixel walk at a 16-grid, then the
    same two-stage quantized DCT fold as the numpy path."""
    g, k = _PHASH_G, _PHASH_K
    byte = lambda kk: f"CAST({_BYTE_SQL.format(k=kk)} AS BIGINT)"  # noqa: E731
    off = (
        f"((ht - 1 - ((2 * (t // {g}) + 1) * ht) // {2 * g}) * stride"
        f" + 3 * (((2 * (t % {g}) + 1) * w) // {2 * g}))"
    )
    gray = f"({byte(off)} + {byte(off + ' + 1')} + {byte(off + ' + 2')}) // 3"
    cosx = f"round(cos(pi() * (2 * x + 1) * (s % {k}) / {2 * g}.0), 12)"
    cosy = f"round(cos(pi() * (2 * y + 1) * (uv // {k}) / {2 * g}.0), 12)"
    return f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS h,
               octet_length(encode(text)) AS n,
               4 + octet_length(encode(text)) % 29 AS w,
               4 + (7 * octet_length(encode(text))) % 17 AS ht
        FROM documents
        WHERE CAST(octet_length(encode(text)) % 3 AS INT) = 0
    ),
    geo AS (SELECT *, ((3 * w + 3) // 4) * 4 AS stride FROM p),
    grays AS (
        SELECT doc_id, w, ht,
               list_transform(generate_series(0, {g * g - 1}),
                              t -> {gray}) AS gv
        FROM geo
    ),
    rowsums AS (
        SELECT doc_id, w, ht,
               list_transform(generate_series(0, {g * k - 1}), s ->
                   round(list_sum(list_transform(
                       generate_series(0, {g - 1}), x ->
                       gv[{g} * (s // {k}) + x + 1] * {cosx})), 6)) AS rs
        FROM grays
    ),
    coefs AS (
        SELECT doc_id, w, ht,
               list_transform(generate_series(1, {k * k - 1}), uv ->
                   round(list_sum(list_transform(
                       generate_series(0, {g - 1}), y ->
                       {cosy} * rs[{k} * y + (uv % {k}) + 1])), 6)) AS cf
        FROM rowsums
    ),
    med AS (
        SELECT doc_id, w, ht, cf,
               list_sort(cf)[{(k * k - 1) // 2 + 1}] AS med
        FROM coefs
    )
    SELECT doc_id, CAST(w AS INT) AS width, CAST(ht AS INT) AS height,
           CAST(list_sum(list_transform(generate_series(1, {k * k - 1}),
                i -> CASE WHEN cf[i] > med
                          THEN CAST(power(2, {k * k - 1} - i) AS BIGINT)
                          ELSE 0 END)) AS INT) AS phash
    FROM med
    """


@query("multimodal_image_dct_phash", oracle=_phash_oracle())
def multimodal_image_dct_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCT perceptual hash (pHash) for the image modality — the
    frequency-domain sibling of [[multimodal_image_ahash]] and the
    standard near-dup image signature in web-scale image-corpus
    pipelines (LAION-style dedup): aHash thresholds raw luma samples,
    so it flips under smooth brightness gradients; pHash thresholds
    the {kk} lowest 2D-DCT-II coefficients (DC dropped) of a
    {g}x{g} grayscale grid against their own median, capturing the
    image's coarse STRUCTURE — robust to the global-level shifts that
    break aHash, and still a Hamming-space signature
    [[sim_search_hamming_packed]]'s XOR+popcount ranking consumes
    unchanged. 15 bits, median-split: at most 7 set bits by
    construction (exactly 7 when the 15 coefficients are distinct;
    coefficients TIED at the median — e.g. a constant image, where
    all non-DC terms quantize to 0 — contribute 0 bits, because the
    threshold is a strict >).

    Parity: the container walk, geometry, and integer grayscale are
    the proven _ahash_oracle closed forms at a {g}-grid; the DCT
    runs as TWO quantized stages (12-dp cosine basis; rowsums and
    coefficients each rounded to 6 dp) so numpy's blocked matmul and
    the oracle's sequential folds meet on a shared grid before the
    median compare — the knife-edge discipline from
    multimodal_audio_spectral_centroid's rolloff. The median of an
    ODD count (15) is an order statistic, never an average, so no
    new float is created at the threshold.

    Scale shape: embarrassingly parallel Arrow mapInPandas, one row
    per image, fixed {g}x{g}+DCT work per image regardless of image
    size; no shuffle."""
    t = tables(spark, sf_dir)
    payloads = t.documents.filter(
        F.octet_length("text") % 3 == 0
    ).select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))

    def hash_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                w, h, val = bmp_phash(synthesize_bmp(bytes(raw)))
                rows.append((doc_id, w, h, val))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "phash"]
            )

    return payloads.mapInPandas(hash_batches, schema=PHASH_SCHEMA)


bmp_phash.__doc__ = bmp_phash.__doc__.replace("{G}", str(_PHASH_G)).replace(
    "{K}", str(_PHASH_K)
)
multimodal_image_dct_phash.__doc__ = (
    multimodal_image_dct_phash.__doc__.replace("{g}", str(_PHASH_G))
    .replace("{kk}", f"{_PHASH_K}x{_PHASH_K}")
)
