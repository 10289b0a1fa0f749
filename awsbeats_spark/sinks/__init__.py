"""Delivery sinks (Kinesis Data Streams / Firehose style)."""
