"""Stream-stream interval join: correlate two event streams within a
time window (click→purchase attribution, request→response pairing).

Absent in the reference (a one-way delivery sink); a core Structured
Streaming capability the engine exposes. Both sides carry watermarks so
the join state store can evict rows once the interval can no longer
match — without the watermark + time-bound condition the state grows
unboundedly, which is the 100-TB failure mode this module exists to
avoid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_clicks_to_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "10 minutes",
    max_gap: str = "30 minutes",
) -> DataFrame:
    """Join each purchase to the same user's click that preceded it by
    at most `max_gap`. State eviction: clicks older than the watermark
    plus the gap bound are dropped from the join state store."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("amount"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")),
    ).select("p_user", "click_id", "purchase_id", "click_ts", "purchase_ts", "amount")


def interval_join_attribution_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "10 minutes",
    max_gap: str = "30 minutes",
) -> DataFrame:
    """Purchase-preserved LEFT OUTER variant: every purchase emits
    exactly once — joined to a qualifying click when one exists, with
    NULL click columns otherwise. The null-side rows can only be
    emitted once the watermark proves no matching click can still
    arrive (event time past click_ts + max_gap), so emission latency is
    bounded by the watermark delay — the streaming twin of a batch
    left join that a 100-TB attribution pipeline runs incrementally
    instead of re-scanning history."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("amount"),
    )
    return p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {max_gap}")),
        "leftOuter",
    ).select("p_user", "click_id", "purchase_id", "purchase_ts", "amount")
