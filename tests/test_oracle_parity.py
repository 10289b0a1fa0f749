"""Oracle parity: every registered operator matches its DuckDB twin at
sf0.001 (the driver re-checks at sf0.01; tools/verify_local.py runs the
same comparison standalone at any sf).

This is the engine's analog of the reference's stub-driven unit tests
(SURVEY.md §5): instead of asserting hand-written expected bytes, we
assert equivalence against an independent engine on the same input.
"""

from __future__ import annotations

import pytest

from awsbeats_spark.registry import load_all
from tools.verify_local import compare, duck_con

SPECS = load_all()


@pytest.fixture(scope="module")
def con(sf_dir):
    return duck_con(sf_dir)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_operator_matches_oracle(name, spark, sf_dir, con):
    spec = SPECS[name]
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    if spec.oracle is None:
        assert len(spark_pdf) > 0, f"{name}: rows-only operator returned no rows"
        return
    oracle_pdf = con.sql(spec.oracle).df()
    status, msg = compare(name, spark_pdf, oracle_pdf)
    assert status == "OK", f"{name}: {msg}"
