"""Structured Streaming paths (optional per SURVEY.md §2.9 — the
reference is pure batch; this is the incremental-ingest extension)."""
