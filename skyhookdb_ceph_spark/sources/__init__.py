"""Sources/sinks: format plurality (SURVEY.md §2.1).

The reference reads FLATBUF/ARROW/CSV/JSON/PG object formats behind one
dispatch [U: cls_tabular_utils.h — SFT_* enum] and loads CSV through
fbwriter.  Spark equivalents live in formats.py: explicit-schema
readers for csv/json/parquet and the ingest job (read anything ->
write partitioned Parquet) that replaces fbwriter + transform.
"""
