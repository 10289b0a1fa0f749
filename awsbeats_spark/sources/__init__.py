"""Streaming sources (file-tail NDJSON, rate heartbeat, events stream)."""
