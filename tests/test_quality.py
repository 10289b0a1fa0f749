"""Behavioral tests for the data-quality gate operators: beyond the
DuckDB parity (which proves Spark==SQL on the clean testdata, where
most violation counts are zero), these corrupt a copy of the tables and
assert each rule actually fires on the rows it should."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def corrupt_dir(tmp_path_factory):
    """sf0.001 copy with seeded violations: 3 out-of-range lineitem rows,
    2 orphaned orders, 1 duplicated customer key."""
    dst = tmp_path_factory.mktemp("sf_corrupt")
    for t in TABLES:
        shutil.copy(f"{SRC}/{t}.parquet", str(dst / f"{t}.parquet"))

    li = pq.read_table(f"{SRC}/lineitem.parquet")
    bad = li.slice(0, 3).to_pydict()
    bad["l_quantity"] = [99.0, -1.0, 75.0]  # 3x quantity_out_of_range
    bad["l_discount"] = [0.9, 0.0, 0.0]  # 1x discount_out_of_range
    bad["l_returnflag"] = ["Z", "A", "N"]  # 1x returnflag_invalid
    pq.write_table(
        pa.concat_tables([li, pa.Table.from_pydict(bad, schema=li.schema)]),
        str(dst / "lineitem.parquet"),
    )

    orders = pq.read_table(f"{SRC}/orders.parquet")
    orphan = orders.slice(0, 2).to_pydict()
    orphan["o_orderkey"] = [99999801, 99999802]  # fresh PKs (no dup noise)
    orphan["o_custkey"] = [99999901, 99999902]  # no such customers
    pq.write_table(
        pa.concat_tables([orders, pa.Table.from_pydict(orphan, schema=orders.schema)]),
        str(dst / "orders.parquet"),
    )

    cust = pq.read_table(f"{SRC}/customer.parquet")
    dup = cust.slice(0, 1)
    pq.write_table(pa.concat_tables([cust, dup]), str(dst / "customer.parquet"))
    return str(dst)


def test_constraint_rules_fire_on_seeded_violations(spark, corrupt_dir):
    rows = {
        r["rule_name"]: r["n_violations"]
        for r in SPECS["dq_constraint_violations"].fn(spark, corrupt_dir).collect()
    }
    assert rows["quantity_out_of_range"] == 3
    assert rows["discount_out_of_range"] == 1
    assert rows["returnflag_invalid"] == 1
    assert rows["orderkey_null"] == 0


def test_orphans_detected_per_edge(spark, corrupt_dir):
    rows = {
        r["fk_edge"]: r["n_orphans"]
        for r in SPECS["dq_referential_orphans"].fn(spark, corrupt_dir).collect()
    }
    assert rows["orders->customer"] == 2
    assert rows["customer->nation"] == 0
    assert rows["supplier->nation"] == 0


def test_duplicate_keys_detected(spark, corrupt_dir):
    rows = {
        r["table_name"]: (r["n_dup_keys"], r["n_dup_rows"])
        for r in SPECS["dq_duplicate_keys"].fn(spark, corrupt_dir).collect()
    }
    assert rows["customer"] == (1, 2)
    assert rows["orders"] == (0, 0)
    assert rows["part"] == (0, 0)


def test_clean_testdata_is_clean(spark, sf_dir):
    viol = SPECS["dq_constraint_violations"].fn(spark, sf_dir)
    assert all(r["n_violations"] == 0 for r in viol.collect())
    orph = SPECS["dq_referential_orphans"].fn(spark, sf_dir)
    assert all(r["n_orphans"] == 0 for r in orph.collect())
