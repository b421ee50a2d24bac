"""Structured Streaming ingest (the reference's Kafka ingest analog)."""
