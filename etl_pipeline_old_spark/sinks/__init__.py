"""Sinks (SURVEY.md §2.2 K1-K6): overwrite + incremental high-watermark."""
