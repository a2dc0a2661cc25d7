"""Structured Streaming ingest (SURVEY.md §2.10, §3 entry-point 1)."""
