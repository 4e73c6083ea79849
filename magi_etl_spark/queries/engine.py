"""Engine-layer query inventory: MetricQuery (dynamic dims/metrics/filter
trees) demonstrated over the generic tables.  Populated as the engine core
(filters.py / metrics.py / query.py) lands."""

from __future__ import annotations
