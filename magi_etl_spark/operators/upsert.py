"""Upsert as a batch set-operation (reference U1: new records + anti-
filtered old records, ``dash_app/tasks.py:971-972``).  On Delta-capable
storage this becomes MERGE; the unionByName/left_anti form is
storage-agnostic and shuffle-minimal (one hash join on the key)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def upsert(new: DataFrame, old: DataFrame, keys: list[str]) -> DataFrame:
    """All rows of ``new`` + rows of ``old`` whose key is absent from
    ``new``.  Column sets must match by name."""
    survivors = old.join(new.select(*keys).distinct(), keys, "left_anti")
    return new.unionByName(survivors)
