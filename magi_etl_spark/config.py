"""Query configuration model.

Mirrors the reference's query-builder config surface (HelixQueryBuilder
``to_dict``/``from_dict``/``generate_cache_key``, reference
``dash_app/dash_app.py:1087-1138``) as typed dataclasses: a canonical dict
round-trip and an md5-of-sorted-JSON cache key, so identical configs hit
the same materialized result (SURVEY.md §4.3.1).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import asdict, dataclass, field


@dataclass
class FilterGroup:
    """One node of the recursive filter tree (reference ``add_filter_group``,
    ``dash_app/dash_app.py:1076-1085``).

    ``values`` are OR'd or AND'd per ``logical_operator``; ``exclude``
    negates the node's own value-condition; ``subgroups`` combine with the
    same operator and AND with the value-condition when both are present.
    """

    attribute: str | None = None
    values: list[str] = field(default_factory=list)
    logical_operator: str = "or"  # 'or' | 'and'
    exclude: bool = False
    subgroups: list["FilterGroup"] = field(default_factory=list)

    def is_empty(self) -> bool:
        # reference skips groups with no values and no subgroups
        # (dash_app/dash_app.py:1247)
        return not self.values and not self.subgroups

    @classmethod
    def from_dict(cls, d: dict) -> "FilterGroup":
        return cls(
            attribute=d.get("attribute"),
            values=list(d.get("values", [])),
            logical_operator=d.get("logical_operator", "or"),
            exclude=bool(d.get("exclude", False)),
            subgroups=[cls.from_dict(s) for s in d.get("subgroups", [])],
        )


@dataclass
class MetricQueryConfig:
    """Dynamic dims/metrics/filters query config (reference
    HelixQueryBuilder ctor surface, ``dash_app/dash_app.py:272-425``)."""

    dataset: str = "events"
    dimensions: list[str] = field(default_factory=list)
    metrics: list[str] = field(default_factory=list)
    filter_groups: list[FilterGroup] = field(default_factory=list)
    min_metric: str | None = None
    min_count: int | None = None
    limit: int | None = None

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "MetricQueryConfig":
        return cls(
            dataset=d.get("dataset", "events"),
            dimensions=list(d.get("dimensions", [])),
            metrics=list(d.get("metrics", [])),
            filter_groups=[FilterGroup.from_dict(g) for g in d.get("filter_groups", [])],
            min_metric=d.get("min_metric"),
            min_count=d.get("min_count"),
            limit=d.get("limit"),
        )

    def cache_key(self) -> str:
        """md5 of the sorted-keys JSON of the full config (reference
        ``generate_cache_key``, ``dash_app/dash_app.py:1134-1138``)."""
        return hashlib.md5(
            json.dumps(self.to_dict(), sort_keys=True).encode("utf-8")
        ).hexdigest()
