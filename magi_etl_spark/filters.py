"""Recursive filter-group tree -> ``Column`` compiler.

Replaces the reference's WHERE-string assembly (``build_group_sql``,
reference ``dash_app/dash_app.py:1141-1159``) with Column-expression
composition — structurally injection-proof, so the reference's
``sanitize_value`` allow-list (``1161-1181``) is unnecessary here.

Semantics mirrored exactly:
- scalar leaf:   ``lower(attr) = lower(value)``
- array leaf:    ``cardinality(array_intersect(attr, transform(array[value],
                 x -> lower(x)))) > 0``  (filter value lowercased, column
                 values compared as-is — the reference's asymmetry kept)
- values joined by the group's or/and; ``exclude`` negates that clause;
  subgroups combine with the same operator and AND onto the value clause
  when both exist; top-level groups AND together; empty groups skipped.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

from magi_etl_spark.config import FilterGroup
from magi_etl_spark.metrics import AttributeSpec


def _leaf(spec: AttributeSpec, value: str) -> Column:
    col = spec.col()
    if spec.unnest:
        return F.size(F.array_intersect(col, F.array(F.lower(F.lit(value))))) > 0
    return F.lower(col) == F.lower(F.lit(value))


def _join(conds: list[Column], op: str) -> Column:
    combine = (lambda a, b: a | b) if op == "or" else (lambda a, b: a & b)
    return reduce(combine, conds)


def compile_group(group: FilterGroup, attrs: dict[str, AttributeSpec]) -> Column:
    """One filter-group node -> Column (reference ``build_group_sql``)."""
    clause: Column | None = None
    if group.values:
        if group.attribute not in attrs:
            raise ValueError(f"unknown filter attribute: {group.attribute!r}")
        spec = attrs[group.attribute]
        clause = _join([_leaf(spec, v) for v in group.values], group.logical_operator)
        if group.exclude:
            clause = ~clause
    if group.subgroups:
        sub = _join(
            [compile_group(s, attrs) for s in group.subgroups], group.logical_operator
        )
        clause = (clause & sub) if clause is not None else sub
    if clause is None:
        return F.lit(True)
    return clause


def compile_filter_tree(
    groups: list[FilterGroup], attrs: dict[str, AttributeSpec]
) -> Column:
    """Top-level groups AND together; empty/degenerate groups are skipped
    (reference ``dash_app/dash_app.py:1247-1248``)."""
    live = [g for g in groups if not g.is_empty()]
    if not live:
        return F.lit(True)
    return _join([compile_group(g, attrs) for g in live], "and")
