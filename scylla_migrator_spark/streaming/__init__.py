"""Structured Streaming surface: CDC replication (SURVEY §2.12)."""
