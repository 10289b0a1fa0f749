"""Structured Streaming wiring for the reference's delivery pipeline."""
