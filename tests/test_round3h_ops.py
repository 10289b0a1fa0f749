"""Semantic checks for the round-3h operators (recursive CTE hierarchy
walk, URL parsing surface).
"""

from __future__ import annotations

import pandas as pd
import pytest

from awsbeats_spark.registry import load_all

SPECS = load_all()


@pytest.fixture(scope="module")
def run(spark, sf_dir):
    def _run(name):
        return SPECS[name].fn(spark, sf_dir).toPandas()

    return _run


def test_recursive_cte_chain_is_bit_length(run, sf_dir):
    out = run("sql_recursive_cte").set_index("user_id")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    users = ev["user_id"].unique()
    assert len(out) == len(users)
    for uid in users:
        # halving chain: uid, uid//2, ..., down to 1 (or just uid for 0/1)
        chain = [int(uid)]
        while chain[-1] > 1:
            chain.append(chain[-1] // 2)
        assert out.loc[uid, "chain_len"] == len(chain) - 1
        assert out.loc[uid, "n_chain_nodes"] == len(chain)
        assert out.loc[uid, "root_node"] == min(chain)


def test_url_parse_components(run):
    out = run("scalar_url_parse")
    for r in out.itertuples():
        assert r.url.startswith("https://") and "?lang=" in r.url
        host = r.url.split("https://")[1].split("/")[0]
        assert r.host == host
        assert r.path == "/docs/" + str(r.doc_id)
        assert r.url.endswith("?lang=" + r.lang_param)
