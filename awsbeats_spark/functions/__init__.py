"""Shared column-builder functions (all JVM-side built-ins — no UDFs)."""
