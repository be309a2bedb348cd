"""UDF / UDAF / UDTF surface (SURVEY.md §2.9) — filled in Phase 3."""
