"""LLM-data-pipeline operators (SURVEY.md §2.12) — filled in Phase 5."""
