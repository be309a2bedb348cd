"""Structured Streaming support (SURVEY.md §2.10).

The reference has no streaming; the `events` fixture exists for the
north-star extension.  Design: every windowed aggregation is written
against the batch/streaming-shared API (`window`, `session_window`), so
the exact same transformation runs under `readStream`; replay.py turns
a parquet fixture into a file-source stream and drains it with
Trigger.AvailableNow into a memory sink for deterministic, testable
results.
"""
