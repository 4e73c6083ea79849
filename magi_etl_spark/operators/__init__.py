"""Distributed operators the built-in DataFrame API doesn't ship directly:
dedup family, similarity search, text analysis, top-k, sessionization,
upsert.  Each is a ``DataFrame -> DataFrame`` composition of built-in ops
(SURVEY.md §2 + the LLM-pipeline extensions)."""
