"""awsbeats_spark — a PySpark-native log-analytics engine.

Re-expresses the capabilities of the reference system (s12v/awsbeats, a
Go libbeat output plugin delivering NDJSON event batches to AWS Kinesis /
Firehose with partial-failure retry — see SURVEY.md) as an idiomatic
Spark engine:

* ``sinks/`` — Kinesis/Firehose-style ``foreachBatch`` sink with <=500
  record chunking, per-record failure collection, capped exponential
  backoff and at-least-once acks (reference: streams/client.go,
  firehose/client.go).
* ``operators/`` — the batch analytics catalog (joins, aggregations,
  window functions, set ops, scalar functions) plus the LLM-data ops
  (dedup, similarity search, text analysis, multimodal plumbing).
* ``streaming/`` — Structured Streaming pipeline surface (tumbling /
  sliding / session windows, watermark dedup) mirroring the libbeat
  pipeline configs the reference ships (SURVEY.md §2.B).
* ``functions/`` — scalar/column helper functions shared by operators.

Every batch operator is registered in ``registry.QUERIES`` together with
an ANSI-SQL oracle twin that DuckDB can run on the same parquet files;
``__spark_entry__.py`` exposes that registry to the driver.
"""

__version__ = "0.1.0"
