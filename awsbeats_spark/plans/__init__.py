"""Physical-plan introspection utilities."""

from awsbeats_spark.plans.inspect import (  # noqa: F401
    executed_plan,
    has_broadcast_join,
    has_pushed_filters,
    plan_counts,
    read_schema_columns,
)
