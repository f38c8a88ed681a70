"""Structured Streaming equivalents of the reference's incremental batch
pattern (SURVEY.md §2.11)."""
