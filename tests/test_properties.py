"""Property-based invariants (hypothesis) for the engine's algebraic
claims — the guarantees the scale patterns rely on:

- salted two-phase aggregation == direct aggregation (any data, any salt)
- the union-and-carry as-of join == the brute-force per-row definition
- the shared rounding formula is exact half-up on representable inputs
- MinHash banding candidates are a superset of identical-set pairs

Each test generates small random inputs and compares Spark against a
pure-Python brute-force model (one Spark job per example; examples kept
small so the suite stays fast).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from awsbeats_spark.functions.rounding import rnd

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=4)
vals = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)


@given(rows=st.lists(st.tuples(keys, vals), min_size=1, max_size=40))
@SET
def test_salted_agg_equals_direct(spark, rows):
    df = spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(rows)], "id long, k int, v double"
    )
    direct = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("s")).collect()
    }
    salted = (
        df.withColumn("salt", F.pmod(F.hash("id"), F.lit(4)))
        .groupBy("k", "salt")
        .agg(F.count("*").alias("pn"), F.sum("v").alias("ps"))
        .groupBy("k")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
    )
    got = {r["k"]: (r["n"], r["s"]) for r in salted.collect()}
    assert got.keys() == direct.keys()
    for k in direct:
        assert got[k][0] == direct[k][0]
        assert math.isclose(got[k][1], direct[k][1], rel_tol=1e-9, abs_tol=1e-9)


ts_vals = st.integers(min_value=0, max_value=100)


@given(
    clicks=st.lists(st.tuples(keys, ts_vals), max_size=15),
    purchases=st.lists(st.tuples(keys, ts_vals), min_size=1, max_size=15),
)
@SET
def test_asof_union_carry_equals_bruteforce(spark, clicks, purchases):
    """The union-and-carry as-of join returns, per purchase, the latest
    click at-or-before it (ties on ts broken by larger click id, the
    union order's last-wins) — compare against the brute-force scan."""
    cdf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(clicks)], "cid long, k int, t long"
    )
    pdf = spark.createDataFrame(
        [(1000 + i, k, t) for i, (k, t) in enumerate(purchases)], "pid long, k int, t long"
    )
    from pyspark.sql import Window

    c = cdf.select("k", "t", F.lit(0).alias("kind"), "cid", F.lit(None).cast("long").alias("pid"))
    p = pdf.select("k", "t", F.lit(1).alias("kind"), F.lit(None).cast("long").alias("cid"), "pid")
    w = (
        Window.partitionBy("k")
        .orderBy("t", "kind", "cid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r["pid"]: r["last_cid"]
        for r in c.unionByName(p)
        .withColumn("last_cid", F.last("cid", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select("pid", "last_cid")
        .collect()
    }
    for i, (k, t) in enumerate(purchases):
        cand = [(ct, ci) for ci, (ck, ct) in enumerate(clicks) if ck == k and ct <= t]
        expect = max(cand)[1] if cand else None
        assert got[1000 + i] == expect, (k, t, cand)


@given(
    x=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
    n=st.integers(min_value=0, max_value=6),
)
@SET
def test_rnd_is_exact_halfup_floor_formula(spark, x, n):
    got = spark.range(1).select(rnd(F.lit(x), n).alias("r")).collect()[0]["r"]
    expect = math.floor(x * 10**n + 0.5) / 10**n
    assert got == expect


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=8), min_size=2, max_size=6
    )
)
@SET
def test_minhash_bands_catch_identical_sets(spark, docs):
    """Any two docs with IDENTICAL shingle sets must share every band —
    banding may miss similar pairs (probabilistic) but never identical
    ones. Build docs from letter sequences; identical sequences =>
    identical sets."""
    from awsbeats_spark.operators.llm.dedup import (
        N_BANDS,
        N_MINHASH,
        minhash_signature,
    )

    df = spark.createDataFrame(
        [(i, [f"w{c}" for c in doc]) for i, doc in enumerate(docs)],
        "doc_id long, shs array<string>",
    )
    sig = df.select(
        "doc_id", minhash_signature(F.array_distinct("shs")).alias("sig")
    )
    bands = {r["doc_id"]: tuple(r["sig"]) for r in sig.collect()}
    for i, a in enumerate(docs):
        for j, b in enumerate(docs):
            if i < j and set(a) == set(b):
                assert bands[i] == bands[j]
    assert N_BANDS * 2 == N_MINHASH  # banding layout the operator assumes


adversarial_text = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters="\x00"
    ),
    max_size=30,
)


@given(s=adversarial_text, v=vals)
@SET
def test_json_codec_roundtrip_any_string(spark, s, v):
    """The NDJSON wire format (A9) must round-trip ANY utf-8 payload —
    quotes, backslashes, newlines, emoji, CJK — through to_json/from_json."""
    df = spark.createDataFrame([(1, s, float(v))], "id long, s string, v double")
    out = (
        df.select(F.to_json(F.struct("id", "s", "v")).alias("line"))
        .select(F.from_json("line", "id long, s string, v double").alias("e"))
        .select("e.id", "e.s", "e.v")
        .collect()[0]
    )
    assert out["id"] == 1 and out["s"] == s and out["v"] == float(v)


@given(s=adversarial_text, v=vals)
@SET
def test_csv_codec_roundtrip_any_string(spark, s, v):
    """CSV round-trip with quoting: separators, quotes, newlines AND
    whitespace-only payloads must survive to_csv/from_csv. Requires the
    engine's CSV_LOSSLESS_OPTS — the default codec trims unquoted
    whitespace (this property found that)."""
    from awsbeats_spark.operators.scale import CSV_LOSSLESS_OPTS

    df = spark.createDataFrame([(1, s, float(v))], "id long, s string, v double")
    out = (
        df.select(F.to_csv(F.struct("id", "s", "v"), CSV_LOSSLESS_OPTS).alias("line"))
        .select(
            F.from_csv(
                "line", F.lit("id long, s string, v double"), CSV_LOSSLESS_OPTS
            ).alias("e")
        )
        .select("e.id", "e.s", "e.v")
        .collect()[0]
    )
    got = out["s"] if out["s"] is not None else ""
    assert out["id"] == 1 and got == s and out["v"] == float(v)


pii_free_words = st.lists(
    st.text(alphabet="abcdefghij ", min_size=1, max_size=12), min_size=1, max_size=8
)


@given(
    words=pii_free_words,
    email_local=st.text(alphabet="abcdef", min_size=1, max_size=8),
    inject=st.booleans(),
)
@SET
def test_pii_scrub_redacts_injected_email_exactly(
    spark, tmp_path_factory, words, email_local, inject
):
    """For any pii-free filler text: injecting an email yields exactly
    one <EMAIL> redaction and the address never survives; without
    injection the text passes through unchanged with n_pii == 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from awsbeats_spark.registry import load_all

    filler = " ".join(words)
    email = f"{email_local}@example.com"
    text = f"{filler} {email} {filler}" if inject else filler
    d = tmp_path_factory.mktemp("pii")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": pa.array([text], pa.string()),
                "lang": pa.array(["en"], pa.string()),
                "source": pa.array(["h"], pa.string()),
                "n_chars": pa.array([len(text)], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    row = load_all()["corpus_pii_scrub"].fn(spark, str(d)).collect()[0]
    if inject:
        assert row["n_pii"] == 1
        assert "<EMAIL>" in row["clean_text"]
        assert email not in row["clean_text"]
    else:
        assert row["n_pii"] == 0
        assert row["clean_text"] == text


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab c\t\nxy")), min_size=0, max_size=60
        ),
        min_size=1,
        max_size=8,
    ),
    n=st.integers(min_value=2, max_value=5),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_shingles_zip_impl_matches_naive(spark, texts, n):
    """The shifted-arrays_zip shingle builder (textfns.shingles) must
    produce exactly the naive per-index n-grams for ANY whitespace mess
    — pins the O(L^2)->O(L) rewrite against a Python reference."""
    import re

    from awsbeats_spark.functions.textfns import shingles, words

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["sh"]
        for r in df.select(shingles(words(), n).alias("sh")).collect()
    ]
    for t, g in zip(texts, got):
        ws = [w for w in re.split(r"\s+", t.lower()) if w != ""]
        expected = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        assert g == expected, (t, n, g, expected)


def test_hll_sketch_union_accuracy_vs_exact(spark, sf_dir):
    """Day-sketches unioned per (event_type, month) must carry exact
    distinct-user / row counts and a TRUE within_bound verdict (the
    merged HLL estimate inside its ~4-sigma envelope)."""
    from awsbeats_spark.operators.aggregates import agg_hll_sketch_union
    from awsbeats_spark.catalog import tables
    from pyspark.sql import functions as F

    got = {
        (r["event_type"], r["month"]): r
        for r in agg_hll_sketch_union(spark, sf_dir).collect()
    }
    exact = {
        (r["event_type"], r["month"]): r
        for r in tables(spark, sf_dir)
        .events.groupBy(
            "event_type",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM").alias("month"),
        )
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for key, row in got.items():
        ex = exact[key]
        assert row["n_events"] == ex["n_events"]
        assert row["exact_users"] == ex["exact_users"]
        assert row["within_bound"] is True, key


@given(
    x=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    m=st.integers(min_value=0, max_value=6),
    n=st.integers(min_value=0, max_value=6),
)
@settings(max_examples=60, deadline=None)
def test_rewrite_round_sql_nested_matches_python_formula(x, m, n):
    """rewrite_round_sql must rewrite NESTED round() calls into the
    deterministic floor formula such that DuckDB evaluates exactly the
    Python-side arithmetic — the guarantee every oracle leans on."""
    import duckdb
    import math

    from awsbeats_spark.functions.rounding import rewrite_round_sql

    def pyrnd(v: float, d: int) -> float:
        p = float(10**d)
        return math.floor(v * p + 0.5) / p

    # CAST: a bare float literal parses as DECIMAL in DuckDB (overflows
    # under the formula's multiply); oracle inputs are DOUBLE columns
    sql = rewrite_round_sql(
        f"SELECT round(round(CAST({x!r} AS DOUBLE), {m}) + 0.125, {n}) AS v"
    )
    assert "round(" not in sql.lower()
    got = duckdb.sql(sql).fetchone()[0]
    want = pyrnd(pyrnd(x, m) + 0.125, n)
    assert got == want or (math.isnan(got) and math.isnan(want)), (sql, got, want)


# ---------------------------------------------------------------------------
# Round-8 stateful UDTFs: repair round-trip and next-fit invariants
# ---------------------------------------------------------------------------

_rec_vals = st.integers(min_value=0, max_value=10**6)


@given(
    streams=st.dictionaries(
        st.integers(min_value=0, max_value=3),
        st.lists(_rec_vals, min_size=1, max_size=6),
        min_size=1,
        max_size=3,
    ),
    width=st.integers(min_value=4, max_value=20),
    drop_tail=st.booleans(),
)
@SET
def test_ndjson_repair_roundtrip_property(spark, streams, width, drop_tail):
    """repair(split(records)) round-trips: every complete output record
    equals its input record, byte conservation holds (the repairer never
    drops or invents characters), and a truncated tail — and only it —
    comes back incomplete."""
    import json

    from awsbeats_spark.operators.udtf import NdjsonRepair

    rows = []
    expected = {}
    for sid, vals in streams.items():
        recs = [json.dumps({"v": v}, separators=(",", ":")) for v in vals]
        lines_of = [
            [r[i : i + width] for i in range(0, len(r), width)] for r in recs
        ]
        truncated = drop_tail and len(lines_of[-1]) >= 2
        if truncated:
            lines_of[-1] = lines_of[-1][:-1]
        seq = 0
        for ri, lines in enumerate(lines_of):
            for ci, line in enumerate(lines):
                rows.append((sid, ri, ci, line))
                seq += 1
        for ri, rec in enumerate(recs):
            if truncated and ri == len(recs) - 1:
                expected[(sid, ri)] = ("".join(lines_of[-1]), False)
            else:
                expected[(sid, ri)] = (rec, True)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ci int, line string"
    )
    df.createOrReplaceTempView("prop_ndjson_lines")
    spark.udtf.register("prop_ndjson_repair", NdjsonRepair)
    got = spark.sql(
        """
        SELECT r.user_id, r.rec_idx, r.repaired, r.complete
        FROM prop_ndjson_repair(TABLE(prop_ndjson_lines)
                                PARTITION BY user_id
                                ORDER BY (event_id, ci)) r
        """
    ).collect()
    assert len(got) == len(expected)
    for r in got:
        rec, complete = expected[(r["user_id"], r["rec_idx"])]
        assert r["repaired"] == rec
        assert r["complete"] == complete
    # byte conservation per stream
    fed = {sid: "" for sid, *_ in rows}
    for sid, _ri, _ci, line in rows:
        fed[sid] += line
    out = {sid: "" for sid in fed}
    for r in sorted(got, key=lambda r: (r["user_id"], r["rec_idx"])):
        out[r["user_id"]] += r["repaired"]
    assert out == fed


@given(
    shards=st.dictionaries(
        st.sampled_from(["a", "b"]),
        st.lists(st.integers(min_value=1, max_value=3000), min_size=1, max_size=12),
        min_size=1,
        max_size=2,
    ),
)
@SET
def test_nextfit_pack_property(spark, shards):
    """The Spark next-fit UDTF equals the literal greedy recurrence on
    any shard contents, never overfills a bin except for an oversized
    singleton, and meets the ceil(total/L) lower bound."""
    import math

    from awsbeats_spark.operators.udtf import _PACK_L, NextFitPack

    rows = []
    did = 0
    for src, toks in sorted(shards.items()):
        for n in toks:
            rows.append((did, src, n))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    df.createOrReplaceTempView("prop_pack_src")
    spark.udtf.register("prop_seq_pack", NextFitPack)
    got = {
        r["doc_id"]: (r["bin_id"], r["fill_after"])
        for r in spark.sql(
            """
            SELECT p.doc_id, p.bin_id, p.fill_after
            FROM prop_seq_pack(TABLE(prop_pack_src)
                               PARTITION BY source ORDER BY doc_id) p
            """
        ).collect()
    }
    assert len(got) == len(rows)
    for src, toks in sorted(shards.items()):
        ids = [d for d, s, _ in rows if s == src]
        bin_id, fill, first = 0, 0, True
        fills = {}
        for d, n in zip(ids, toks):
            if first:
                first, fill = False, n
            elif fill + n <= _PACK_L:
                fill += n
            else:
                bin_id, fill = bin_id + 1, n
            assert got[d] == (bin_id, fill)
            fills.setdefault(bin_id, []).append(n)
        for b, ns in fills.items():
            assert sum(ns) <= _PACK_L or len(ns) == 1
        # lower bound on CAPPED mass: a bin holds at most L of
        # min(n, L) (an oversized singleton contributes exactly L)
        assert len(fills) >= math.ceil(
            sum(min(n, _PACK_L) for n in toks) / _PACK_L
        )


def test_ndjson_repair_poison_record_is_bounded():
    """ADVICE r8: a record whose JSON can never parse must not swallow
    the rest of the stream. Once the buffer exceeds MAX_BUF the repairer
    flushes it as complete=false and parsing resumes at the next line —
    the later clean record still comes back complete=true."""
    from awsbeats_spark.operators.udtf import NdjsonRepair

    inst = NdjsonRepair.func()
    inst.MAX_BUF = 8  # tiny bound so the guard fires in-test
    out = []
    for line in ['{"a": "broke', "n and more junk", '{"v":1}']:
        out.extend(inst.eval({"user_id": 1, "line": line}) or [])
    out.extend(inst.terminate() or [])
    assert out == [
        (1, 0, '{"a": "broke', 1, False),
        (1, 1, "n and more junk", 1, False),
        (1, 2, '{"v":1}', 1, True),
    ]


def test_ndjson_repair_default_bound_never_fires_on_legal_records():
    """The production MAX_BUF (1 MiB) is far above any record the
    corruption model emits, so the oracle's complete/incomplete split is
    untouched: a two-line legal record parses normally."""
    from awsbeats_spark.operators.udtf import NdjsonRepair, _NDJSON_MAX_BUF

    assert NdjsonRepair.func.MAX_BUF == _NDJSON_MAX_BUF == 1 << 20
    inst = NdjsonRepair.func()
    out = []
    for line in ['{"event_id":1,"e', 'vent_type":"x"}']:
        out.extend(inst.eval({"user_id": 7, "line": line}) or [])
    assert out == [(7, 0, '{"event_id":1,"event_type":"x"}', 2, True)]
    assert list(inst.terminate() or []) == []


# --------------------------------------------------------------------------
# Pre-r8 stateful UDTF properties (VERDICT r8 item 5): drive the exact
# module-level classes the operators register, pure-Python (no Spark job
# per example), against independent relational replays of each oracle.
# --------------------------------------------------------------------------

_pcm_payloads = st.binary(min_size=1, max_size=700)


@given(payload=_pcm_payloads)
@settings(max_examples=60, deadline=None)
def test_pcm_frames_matches_cycled_byte_model(payload):
    """Frame partition + every emitted stat must equal a direct replay of
    the synthesis contract (payload cycled to 600 + n % 500 samples) —
    independent of the UDTF's RIFF/struct/numpy walk."""
    from awsbeats_spark.operators.udtf import (
        _PCM_FRAME,
        _PCM_MAX_FRAMES,
        PcmFrames,
    )

    ns = 600 + len(payload) % 500
    samples = [payload[i % len(payload)] for i in range(ns)]
    rows = list(PcmFrames.func().eval(7, payload))
    assert len(rows) == min(math.ceil(ns / _PCM_FRAME), _PCM_MAX_FRAMES)
    # byte conservation over the probed prefix
    assert sum(r[2] for r in rows) == min(ns, _PCM_FRAME * _PCM_MAX_FRAMES)
    for f, row in enumerate(rows):
        seg = samples[f * _PCM_FRAME : (f + 1) * _PCM_FRAME]
        below = [x < 128 for x in seg]
        zc = sum(1 for a, b in zip(below, below[1:]) if a != b)
        dev = [abs(x - 128) for x in seg]
        assert row == (7, f, len(seg), min(seg), max(seg), zc, dev.index(max(dev)))


_md_words = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=15),
    min_size=0,
    max_size=40,
)


@given(words=_md_words)
@settings(max_examples=60, deadline=None)
def test_markdown_sections_matches_relational_grouping(words):
    """Header-stack well-formedness: the line parser's sections must equal
    the oracle's relational formulation — group body words by cumulative
    (h1-count, h2-count-within-h1) and attach the group's header words —
    plus body-word conservation."""
    from awsbeats_spark.operators.udtf import MarkdownSections

    # the operator's JVM-side synthesis rule: len % 7 == 0 -> h1, == 3 -> h2
    lines, kinds = [], []
    for w in words:
        if len(w) % 7 == 0:
            lines.append("# " + w)
            kinds.append("h1")
        elif len(w) % 7 == 3:
            lines.append("## " + w)
            kinds.append("h2")
        else:
            lines.append(w)
            kinds.append("b")
    md = "\n".join(lines)

    # independent relational replay (the DuckDB oracle's shape)
    h1g = h2g = 0
    h1_of, h2_of, groups, order = {}, {}, {}, []
    for w, k in zip(words, kinds):
        if k == "h1":
            h1g, h2g = h1g + 1, 0
            h1_of[h1g] = w
        elif k == "h2":
            h2g += 1
            h2_of[(h1g, h2g)] = w
        else:
            key = (h1g, h2g)
            if key not in groups:
                groups[key] = []
                order.append(key)
            groups[key].append(w)
    expected = [
        (
            3,
            i,
            h1_of.get(k[0]),
            h2_of.get(k),
            len(groups[k]),
            groups[k][0],
            groups[k][-1],
        )
        for i, k in enumerate(order)
    ]
    got = list(MarkdownSections.func().eval(3, md))
    assert got == expected
    assert sum(r[4] for r in got) == sum(1 for k in kinds if k == "b")


_rle_words = st.lists(
    st.sampled_from(["a", "b", "ab", "ba"]), min_size=0, max_size=50
)


@given(words=_rle_words)
@settings(max_examples=60, deadline=None)
def test_run_length_encode_round_trips(words):
    """RLE round-trip: emitted runs must equal itertools.groupby's maximal
    runs (>= 2 only), cover exactly their positions in the original token
    stream, and never overlap."""
    import itertools

    from awsbeats_spark.operators.udtf import RunLengthEncode

    got = list(RunLengthEncode.func().eval(5, " ".join(words)))
    expected, pos, run_idx = [], 1, 0
    for w, grp in itertools.groupby(words):
        n = len(list(grp))
        if n >= 2:
            expected.append((5, run_idx, w, n, pos))
        run_idx += 1
        pos += n
    assert got == expected
    for _, _, w, n, start in got:
        # positions are 1-indexed; the run's span is all equal to w and
        # maximal (neighbors differ or are stream edges)
        assert words[start - 1 : start - 1 + n] == [w] * n
        assert start == 1 or words[start - 2] != w
        assert start - 1 + n == len(words) or words[start - 1 + n] != w


@given(payload=st.binary(min_size=1, max_size=800))
@settings(max_examples=60, deadline=None)
def test_bmp_ahash_matches_cycled_byte_model(payload):
    """The round-9 oracle conversion's claim, generalized to arbitrary
    payloads: bmp_ahash's real container parse (header offsets,
    bottom-up rows, numpy grid sample) must equal a direct integer
    replay of the synthesis spec — geometry closed-form in n, sampled
    pixel bytes read straight from the cycled payload, 64*gray > sum
    threshold, signed row-major pack."""
    from awsbeats_spark.operators.llm.multimodal import (
        bmp_ahash,
        synthesize_bmp,
    )

    n = len(payload)
    w, h = 4 + n % 29, 4 + (7 * n) % 17
    stride = ((3 * w + 3) // 4) * 4
    grays = []
    for t in range(64):
        yi = ((2 * (t // 8) + 1) * h) // 16
        xj = ((2 * (t % 8) + 1) * w) // 16
        off = (h - 1 - yi) * stride + 3 * xj
        grays.append(sum(payload[(off + c) % n] for c in range(3)) // 3)
    total = sum(grays)
    val = 0
    for g in grays:
        val = (val << 1) | (1 if 64 * g > total else 0)
    if val >= 1 << 63:
        val -= 1 << 64
    assert bmp_ahash(synthesize_bmp(payload)) == (w, h, val)


@given(payload=st.binary(min_size=1, max_size=800))
@settings(max_examples=40, deadline=None)
def test_bmp_phash_matches_cycled_byte_model(payload):
    """bmp_phash generalized to arbitrary payloads: the real container
    parse + numpy two-stage quantized DCT must equal a sequential
    pure-Python replay of the synthesis spec (cycled bytes, closed-form
    geometry, 12-dp basis, 6-dp stage rounds, strict > median split) —
    and the hash must stay in [0, 2^15) with at most 7 set bits."""
    import math

    from awsbeats_spark.operators.llm.multimodal import (
        _PHASH_G,
        _PHASH_K,
        bmp_phash,
        synthesize_bmp,
    )

    g, k = _PHASH_G, _PHASH_K
    n = len(payload)
    w, h = 4 + n % 29, 4 + (7 * n) % 17
    stride = ((3 * w + 3) // 4) * 4
    gray = [
        [
            sum(
                payload[
                    ((h - 1 - ((2 * gy + 1) * h) // (2 * g)) * stride
                     + 3 * (((2 * gx + 1) * w) // (2 * g)) + c) % n
                ]
                for c in range(3)
            )
            // 3
            for gx in range(g)
        ]
        for gy in range(g)
    ]
    basis = [
        [round(math.cos(math.pi * (2 * i + 1) * u / (2 * g)), 12) for i in range(g)]
        for u in range(k)
    ]
    rs = [
        [round(sum(gray[y][x] * basis[v][x] for x in range(g)), 6) for v in range(k)]
        for y in range(g)
    ]
    coef = [
        round(sum(basis[u][y] * rs[y][v] for y in range(g)), 6)
        for u in range(k)
        for v in range(k)
    ][1:]
    med = sorted(coef)[len(coef) // 2]
    val = 0
    for c in coef:
        val = (val << 1) | (1 if c > med else 0)
    got = bmp_phash(synthesize_bmp(payload))
    assert got == (w, h, val)
    assert 0 <= got[2] < (1 << 15)
    assert bin(got[2]).count("1") <= 7


_decay_streams = st.dictionaries(
    st.integers(min_value=1, max_value=3),  # user_id
    st.lists(
        st.tuples(
            # gap to the next event, in days — spans several 120-day
            # blocks and lands exactly on block boundaries sometimes
            st.sampled_from([0.0, 0.5, 1.0, 7.25, 119.0, 120.0, 240.0, 365.0]),
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=3,
)


@given(streams=_decay_streams)
@SET
def test_ewma_time_decay_blocked_form_property(spark, tmp_path_factory, streams):
    """The block-reanchored closed form must equal the naive O(n^2)
    definition for arbitrary irregular streams, including events exactly
    ON 120-day block boundaries and empty blocks between events."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from awsbeats_spark.catalog import TABLE_NAMES
    from awsbeats_spark.operators.timeseries import _DECAY_PER_DAY
    from awsbeats_spark.registry import load_all

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("decay_prop")
    for t in TABLE_NAMES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        if t != "events":
            pq.write_table(schema.empty_table(), str(d / f"{t}.parquet"))
    rows = {"event_id": [], "ts": [], "user_id": [], "event_type": [],
            "value": [], "props": []}
    eid = 0
    truth = {}
    for uid, evs in sorted(streams.items()):
        td = 0.0
        tds, vals, eids = [], [], []
        for gap, v in evs:
            td += gap
            eid += 1
            rows["event_id"].append(eid)
            rows["ts"].append(int(td * 86400 * 10**6))  # schema unit: us
            rows["user_id"].append(uid)
            rows["event_type"].append("a")
            rows["value"].append(float(v))
            rows["props"].append("{}")
            tds.append(td)
            vals.append(float(v))
            eids.append(eid)
        for i in range(len(tds)):
            truth[eids[i]] = sum(
                vals[j] * math.exp(-_DECAY_PER_DAY * (tds[i] - tds[j]))
                for j in range(i + 1)
            )
    schema = pq.read_schema(f"{src}/events.parquet")
    table = pa.Table.from_pydict(
        {k: rows[k] for k in schema.names}
    ).cast(schema)
    pq.write_table(table, str(d / "events.parquet"))

    got = (
        load_all()["ts_ewma_time_decay"]
        .fn(spark, str(d))
        .toPandas()
        .set_index("event_id")["decayed_sum"]
    )
    assert len(got) == len(truth)
    for e, s in truth.items():
        assert math.isclose(got[e], s, rel_tol=1e-6, abs_tol=1e-5), e


_pack_shards = st.dictionaries(
    st.sampled_from(["web", "wiki", "code"]),
    st.lists(
        # mostly small docs + an occasional oversized singleton (> _PACK_L)
        st.one_of(
            st.integers(min_value=1, max_value=300), st.just(2500)
        ),
        min_size=1,
        max_size=20,
    ),
    min_size=1,
    max_size=3,
)


@given(shards=_pack_shards)
@settings(max_examples=25, deadline=None)
def test_pack_attention_moment_formula_matches_enumeration(shards):
    """The per-bin moment identities behind
    eval_pack_attention_contamination — total = S(S+1)/2 and
    cross = (S^2 - sum n_i^2)/2 — must equal brute-force causal-pair
    enumeration over next-fit layouts of arbitrary shards (including
    oversized singleton docs that exceed the bin budget)."""
    from awsbeats_spark.operators.udtf import _PACK_L, NextFitPack

    for src, toks in sorted(shards.items()):
        inst = NextFitPack.func()
        bins: dict[int, list[int]] = {}
        for i, n in enumerate(toks):
            for row in inst.eval({"doc_id": i, "source": src, "n_tokens": n}):
                bins.setdefault(row[3], []).append(row[2])
        for ns in bins.values():
            S = sum(ns)
            total_f = S * (S + 1) // 2
            cross_f = (S * S - sum(n * n for n in ns)) // 2
            # brute force: tokens labeled by doc, causal pairs (i <= j)
            labels = [d for d, n in enumerate(ns) for _ in range(n)]
            total_e = sum(1 for j in range(S) for i in range(j + 1))
            cross_e = sum(
                1
                for j in range(S)
                for i in range(j + 1)
                if labels[i] != labels[j]
            )
            assert total_f == total_e
            assert cross_f == cross_e
            # next-fit never overflows except oversized singletons
            assert S <= _PACK_L or len(ns) == 1


# --------------------------------------------------------------------------
# The last two UDTFs without properties (VERDICT r9 item 7): sentence
# split and JSON flatten, driven as the exact module-level classes the
# operators register, against independent character-walk / type-walk
# models (not the regex/json calls the implementations use).
# --------------------------------------------------------------------------

_sentence_texts = st.text(
    alphabet=st.sampled_from(list("ab .!?\t\né世'\"")),
    min_size=0,
    max_size=120,
)


@given(text=_sentence_texts)
@settings(max_examples=60, deadline=None)
def test_sentence_split_matches_character_walk(text):
    """The regex-split UDTF must equal an independent single-pass
    character walk (accumulate until a terminator, strip, drop empties)
    plus structural invariants: contiguous 0-based indices, n_chars
    consistency, no terminator inside a sentence, and in-order
    non-overlapping occurrence in the source text."""
    from awsbeats_spark.operators.udtf import SentenceSplit

    # independent model: explicit char scan, no re.split
    frags, cur = [], []
    for ch in text:
        if ch in ".!?":
            frags.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    frags.append("".join(cur))
    expected = []
    for frag in frags:
        sent = frag.strip()
        if sent:
            expected.append((9, len(expected), sent, len(sent)))

    got = list(SentenceSplit.func().eval(9, text))
    assert got == expected
    # structural invariants, independent of the model above
    pos = 0
    for i, (_, idx, sent, n_chars) in enumerate(got):
        assert idx == i
        assert n_chars == len(sent) > 0
        assert not any(c in ".!?" for c in sent)
        pos = text.index(sent, pos) + len(sent)  # in order, no overlap


_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=12),
)
_json_values = st.recursive(
    _json_scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=8), inner, max_size=4),
    ),
    max_leaves=8,
)
_json_objects = st.dictionaries(st.text(max_size=8), _json_values, max_size=6)


@given(obj=_json_objects)
@settings(max_examples=60, deadline=None)
def test_json_flatten_matches_type_walk(obj):
    """Flattening json.dumps(obj) must yield exactly one row per
    top-level key in insertion order, with a type tag matching Python's
    type lattice and a value_str that round-trips back to the original
    value (parse for json-typed, exact equality for scalars)."""
    import json

    from awsbeats_spark.operators.udtf import JsonFlatten

    props = json.dumps(obj)
    got = list(JsonFlatten.func().eval(3, props))
    assert [r[1] for r in got] == list(obj.keys())
    for _, k, value_str, value_type in got:
        v = obj[k]
        if v is None:
            assert (value_str, value_type) == (None, "null")
        elif isinstance(v, bool):
            assert value_type == "boolean"
            assert value_str == ("true" if v else "false")
        elif isinstance(v, (int, float)):
            assert value_type == "number"
            # round-trip through the emitted string is exact: json
            # preserved the value and str() is shortest-repr faithful
            assert float(value_str) == float(v)
        elif isinstance(v, str):
            assert (value_str, value_type) == (v, "string")
        else:
            assert value_type == "json"
            assert json.loads(value_str) == v


@given(junk=st.text(max_size=30))
@settings(max_examples=30, deadline=None)
def test_json_flatten_non_objects_yield_nothing(junk):
    """Invalid JSON and valid non-object JSON (arrays, scalars) must
    produce zero rows — the quarantine contract, never an exception."""
    import json

    from awsbeats_spark.operators.udtf import JsonFlatten

    inst = JsonFlatten.func()
    assert list(inst.eval(1, junk) or []) in ([],) or isinstance(
        json.loads(junk), dict
    )
    for payload in ("[1,2]", '"s"', "3", "true", "null", "", None):
        assert list(inst.eval(1, payload) or []) == []
