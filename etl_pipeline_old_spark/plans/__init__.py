"""End-to-end pipelines re-expressing the reference notebooks as single
lazy Catalyst plans (SURVEY.md §3.3)."""
