"""Round-12 single-parse build conversions: the selectExpr forms must be
behavior-identical to the Column-API forms they replaced (the oracle
hash-compares raw values, so bit-wise equality is the bar).

Inputs deliberately include duplicate (user, ts) click rows — the tie
the DESC click_id ordering exists for — and a purchase with no prior
click (NULL carry)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from awsbeats_spark.functions.rounding import rnd


EVENTS = [
    # (event_id, user_id, event_type, ts, value)
    (1, 10, "click", "2024-01-01 10:00:00", 1.115),
    (2, 10, "click", "2024-01-01 10:00:00", 2.225),  # tie with event 1
    (3, 10, "purchase", "2024-01-01 10:00:00", 5.0),  # same ts as clicks
    (4, 10, "purchase", "2024-01-01 11:00:00", 6.0),
    (5, 20, "purchase", "2024-01-01 09:00:00", 7.0),  # no prior click
    (6, 20, "click", "2024-01-01 09:30:00", 8.0),
    (7, 20, "purchase", "2024-01-01 09:45:00", 9.0),
    (8, 30, "view", "2024-01-01 08:00:00", 0.5),  # neither kind
]


def _events_df(spark):
    return spark.createDataFrame(
        EVENTS, "event_id long, user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _asof_column_form(ev):
    """The pre-round-12 Column-API build of join_asof, verbatim."""
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("kind"),
        F.col("event_id").alias("click_id"),
        F.col("value").alias("click_value"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("kind"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", F.col("click_id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_id", F.last("click_id", ignorenulls=True).over(w))
        .withColumn("last_click_value", F.last("click_value", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            F.col("purchase_id"),
            F.col("user_id"),
            F.col("last_click_id"),
            rnd("last_click_value", 2).alias("last_click_value"),
        )
    )


def _asof_sql_form(ev):
    """The round-12 single-parse build — mirror of operators/joins.py."""
    from awsbeats_spark.functions.rounding import rnd_sql

    clicks = ev.where("event_type = 'click'").selectExpr(
        "user_id", "ts", "0 AS kind", "event_id AS click_id",
        "value AS click_value", "CAST(NULL AS BIGINT) AS purchase_id",
    )
    purchases = ev.where("event_type = 'purchase'").selectExpr(
        "user_id", "ts", "1 AS kind", "CAST(NULL AS BIGINT) AS click_id",
        "CAST(NULL AS DOUBLE) AS click_value", "event_id AS purchase_id",
    )
    over = (
        "OVER (PARTITION BY user_id ORDER BY ts, kind, click_id DESC "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    return (
        clicks.unionByName(purchases)
        .selectExpr(
            "purchase_id", "user_id", "kind",
            f"last(click_id, true) {over} AS last_click_id",
            f"last(click_value, true) {over} AS last_click_value",
        )
        .where("kind = 1")
        .selectExpr(
            "purchase_id", "user_id", "last_click_id",
            f"{rnd_sql('last_click_value', 2)} AS last_click_value",
        )
    )


def test_join_asof_sql_build_matches_column_form_bitwise(spark):
    ev = _events_df(spark)
    old = sorted(tuple(r) for r in _asof_column_form(ev).collect())
    new = sorted(tuple(r) for r in _asof_sql_form(ev).collect())
    assert old == new
    # the tie rule survives: the 10:00 purchase sees the MIN click id
    by_pid = {r[0]: r for r in new}
    assert by_pid[3][2] == 1 and by_pid[3][3] == 1.12  # min id, its value
    assert by_pid[5][2] is None  # purchase before any click carries NULL


def test_join_asof_operator_schema_unchanged(spark):
    from awsbeats_spark.registry import load_all

    df = load_all()["join_asof"].fn(spark, "/root/testdata/sf0.001")
    assert [f.name for f in df.schema.fields] == [
        "purchase_id", "user_id", "last_click_id", "last_click_value",
    ]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "bigint", "bigint", "bigint", "double",
    ]
