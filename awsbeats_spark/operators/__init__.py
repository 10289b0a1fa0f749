"""Operator modules. Importing this package registers every operator
into ``awsbeats_spark.registry.QUERIES``."""

from awsbeats_spark.operators import (  # noqa: F401
    aggregates,
    extended,
    graph,
    joins,
    pipeline,
    profiling,
    relational,
    scale,
    setops,
    sqlfuncs,
    streaming_batch,
    timeseries,
    tpch_more,
    windows,
)
from awsbeats_spark.operators.llm import (  # noqa: F401
    corpus,
    dedup,
    multimodal,
    similarity,
    text,
)
