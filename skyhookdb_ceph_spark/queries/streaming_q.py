"""Streaming queries (SURVEY.md §2.10) — filled in Phase 6."""
