"""Fellegi-Sunter probabilistic record-linkage scoring.

Candidate GENERATION lives in ``operators/joins.py`` (salted/blocked/
fuzzy-prefix joins, sorted-neighborhood pairs); this module holds the
probabilistic SCORING layer on top — separated so the scoring can
evolve without touching the join module's verified surface.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fs_linkage_score(
    pairs: DataFrame,
    agreement_params: dict[str, tuple[float, float]],
    score_col: str = "fs_score",
    decimals: int = 4,
) -> DataFrame:
    """Fellegi-Sunter probabilistic record-linkage scoring: given a
    candidate-pair frame carrying one BOOLEAN agreement column per
    compared field, append the log2 match weight ``score_col`` =
    sum over fields of log2(m/u) when the field agrees and
    log2((1-m)/(1-u)) when it disagrees, where (m, u) are the field's
    match/unmatch probabilities.  A NULL agreement (field missing on
    either side) contributes weight 0, the standard FS treatment.

    Pure map over the candidate frame — the scale story lives in the
    candidate generation (blocking / sorted-neighborhood / fuzzy
    prefix, ``operators/joins.py``); scoring adds no shuffle.  Weights
    are Python-computed doubles, so a SQL oracle can embed the
    identical constants.
    """
    total = None
    for col_name, (m, u) in agreement_params.items():
        if not (0.0 < m < 1.0 and 0.0 < u < 1.0):
            raise ValueError(f"{col_name}: m, u must be in (0, 1)")
        w_agree = math.log2(m / u)
        w_disagree = math.log2((1.0 - m) / (1.0 - u))
        term = (
            F.when(F.col(col_name).isNull(), F.lit(0.0))
            .when(F.col(col_name), F.lit(w_agree))
            .otherwise(F.lit(w_disagree))
        )
        total = term if total is None else total + term
    return pairs.withColumn(score_col, F.round(total, decimals))
