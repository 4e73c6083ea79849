"""Distributed operators the built-in DataFrame API doesn't ship directly:
dedup family, similarity search, text analysis, recommendation scoring,
enrichment/multimodal stages, upsert, skew-aware aggregation.  Each is a
``DataFrame -> DataFrame`` composition of built-in ops (SURVEY.md §2 +
the LLM-pipeline extensions)."""
