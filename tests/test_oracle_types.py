"""Every registered oracle must bind in DuckDB to driver-hashable column
types.

The driver compares Spark vs DuckDB output by value hash after a pandas
round-trip. Two DuckDB type families break that hash even when values
are numerically identical:

* HUGEINT / UHUGEINT — DuckDB widens ``sum()`` over integer columns to
  int128, whose pandas bridge emits float64; the driver then hashes
  ``7.0`` against Spark's bigint ``7`` and fails (round-2's 4 red rows).
* LIST / STRUCT / MAP — nested values hash unstably across the bridge
  (round-1's ``agg_percentile_approx`` failure).

Binding (``relation.types``) needs no execution, so this sweeps all
registered oracles in seconds and catches the bug class before the
driver ever scores a key.
"""

from __future__ import annotations

import duckdb
import pytest

from awsbeats_spark.catalog import TABLE_NAMES
from awsbeats_spark.registry import load_all

SF_DIR = "/root/testdata/sf0.001"

_BANNED_EXACT = {"HUGEINT", "UHUGEINT"}
_BANNED_PREFIX = ("STRUCT", "MAP")
# LIST renders as e.g. VARCHAR[] / BIGINT[]
_BANNED_SUFFIX = ("[]",)


def _oracle_specs():
    return [(name, spec.oracle) for name, spec in load_all().items() if spec.oracle]


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name,oracle", _oracle_specs(), ids=lambda v: v if isinstance(v, str) and "\n" not in v else "")
def test_oracle_binds_to_hashable_types(con, name, oracle):
    rel = con.sql(oracle)
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if (
            t in _BANNED_EXACT
            or t.startswith(_BANNED_PREFIX)
            or t.endswith(_BANNED_SUFFIX)
        ):
            bad.append(f"{col}: {t}")
    assert not bad, (
        f"oracle for {name!r} yields driver-unhashable column types {bad} — "
        "wrap integer sum() in CAST(... AS BIGINT) / flatten nested output"
    )
