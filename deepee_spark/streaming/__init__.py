"""Structured Streaming ingest (micro-batch incremental extraction)."""
