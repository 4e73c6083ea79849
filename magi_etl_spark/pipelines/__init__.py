"""End-product dataflow pipelines (SURVEY.md §2.13): trending wikis,
wiki metadata, monetization monitor — parameterized batch jobs with
injectable anchor dates (no wall-clock reads)."""
