"""Local replica of the driver's correctness gate.

Runs every registered operator on Spark AND its DuckDB oracle over the
same parquet, compares row count, column names, and values
(order-insensitive: columns sorted by name, rows sorted by all columns).
Floats compare exactly by default (the engine rounds both sides), with a
1e-9 isclose fallback reported as WEAK so drift is visible before the
driver's hash compare fails.

Usage: python tools/verify_local.py [--bare] [sf_dir] [name ...]

``--bare`` runs against a plain ``SparkSession.builder.getOrCreate()``
with none of the engine's session configs — the driver's harness builds
its own session, so operators must be correct without relying on
``session.get_spark()`` (catalog.tables() pins TZ/readers per-call).
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from awsbeats_spark.catalog import TABLE_NAMES  # noqa: E402
from awsbeats_spark.registry import load_all  # noqa: E402
from awsbeats_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Bound DuckDB's spill: a pathological oracle at replica scale (the
    # unrolled MMR CTEs at sf1) otherwise writes an unbounded
    # .tmp/duckdb_temp_storage into the CWD until the root disk fills
    # (round 11: 57 GB before the kill). Cap it and keep it off the
    # repo tree; past the cap the oracle errors instead of taking the
    # host down.
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql("SET max_temp_directory_size='20GiB'")
    for t in TABLE_NAMES:
        path = f"{sf_dir}/{t}.parquet"
        # Spark-written replicas (tools/build_sf1.py) are DIRECTORIES of
        # part files; the driver's testdata are flat files. Glob the dir
        # so oracle sweeps run against sf1 too.
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype kind as the driver's hasher sees it. DuckDB HUGEINT
    surfaces via pandas as float64 (or object), so an int-kind Spark
    column vs a float-kind oracle column hash-mismatches even when the
    values are numerically equal — normalize() used to mask exactly
    that, which is how round-2's 4 red driver rows passed locally."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    return "object"


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> tuple[str, str]:
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return "FAIL", f"columns differ: spark={s_cols} oracle={o_cols}"
    if len(spark_pdf) != len(oracle_pdf):
        return "FAIL", f"rowcount differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    # Pre-coercion dtype-kind gate: the driver hashes raw values, so an
    # int-vs-float (or bool-vs-int, ...) kind mismatch is a driver-hash
    # FAIL regardless of numeric equality. Check BEFORE normalize().
    for c in s_cols if len(spark_pdf) else []:
        sk, ok = _dtype_kind(spark_pdf[c]), _dtype_kind(oracle_pdf[c])
        if sk != ok:
            return "FAIL", (
                f"dtype-kind mismatch on {c!r}: spark={sk}({spark_pdf[c].dtype}) "
                f"oracle={ok}({oracle_pdf[c].dtype}) — driver hash would differ "
                f"(HUGEINT oracle? cast to BIGINT)"
            )
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    weak = []
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv):
            exact = ((sv == ov) | (sv.isna() & ov.isna())).all()
            if not exact:
                close = np.isclose(
                    sv.fillna(0), ov.fillna(0), rtol=1e-9, atol=1e-9
                ).all() and (sv.isna() == ov.isna()).all()
                if close:
                    weak.append(c)
                else:
                    bad = (~((sv == ov) | (sv.isna() & ov.isna()))).idxmax()
                    return "FAIL", (
                        f"col {c!r} differs at row {bad}: "
                        f"spark={sv[bad]!r} oracle={ov[bad]!r}"
                    )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                return "FAIL", (
                    f"col {c!r} differs at row {bad}: spark={sv[bad]!r} oracle={ov[bad]!r}"
                )
    if weak:
        return "WEAK", f"float cols only isclose (hash may fail!): {weak}"
    return "OK", f"{len(s)} rows"


def main() -> int:
    args = [a for a in sys.argv[1:]]
    bare = "--bare" in args
    if bare:
        args.remove("--bare")
    # --oracle-budget N: interrupt a DuckDB oracle after N seconds and
    # report BUDG instead of hanging the sweep (replica-scale oracles
    # like the unrolled MMR CTEs are oracle-cost ceilings, not
    # correctness signals — round-11 sweep hygiene).
    oracle_budget = None
    if "--oracle-budget" in args:
        i = args.index("--oracle-budget")
        oracle_budget = float(args[i + 1])
        del args[i : i + 2]
    sf_dir = args.pop(0) if args and args[0].startswith("/") else "/root/testdata/sf0.01"
    specs = load_all()
    names = args or list(specs)
    if bare:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark("verify-local")
    con = duck_con(sf_dir)
    failures = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name:32s} spark error: {exc}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"SKIP  {name:32s} rows-only ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            continue
        timer = None
        timed_out = []
        if oracle_budget:
            import threading

            def _interrupt():
                timed_out.append(True)
                con.interrupt()

            timer = threading.Timer(oracle_budget, _interrupt)
            timer.start()
        try:
            oracle_pdf = con.sql(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            if timed_out:
                print(
                    f"BUDG  {name:32s} oracle exceeded "
                    f"{oracle_budget:.0f}s budget ({time.time()-t0:.1f}s)"
                )
                continue
            print(f"FAIL  {name:32s} oracle error: {exc}")
            failures += 1
            continue
        finally:
            if timer:
                timer.cancel()
        status, msg = compare(name, spark_pdf, oracle_pdf)
        if status == "FAIL":
            failures += 1
        print(f"{status:5s} {name:32s} {msg} ({time.time()-t0:.1f}s)")
    print(f"\n{len(names)} checked, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
