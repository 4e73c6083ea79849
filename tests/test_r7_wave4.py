"""Invariant tests for weighted Jaccard and token PMI."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_weighted_jaccard_reduces_to_scaled_jaccard(spark):
    """Constant weights w: w_inter = w * |A∩B|, w_union = w * |A∪B|."""
    from magi_etl_spark.operators.setjoin import weighted_jaccard_scores

    sets_rows = [(1, t, 3) for t in "abcd"] + [(2, t, 3) for t in "cdef"]
    sets = spark.createDataFrame(sets_rows, "doc_id long, tok string, w int")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = weighted_jaccard_scores(pairs, sets).collect()[0]
    assert r.w_inter == 3 * 2 and r.w_union == 3 * 6


def test_weighted_jaccard_min_semantics(spark):
    from magi_etl_spark.operators.setjoin import weighted_jaccard_scores

    sets_rows = [(1, "x", 4), (1, "y", 1), (2, "x", 2), (2, "z", 5)]
    sets = spark.createDataFrame(sets_rows, "doc_id long, tok string, w int")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    r = weighted_jaccard_scores(pairs, sets).collect()[0]
    # shared: x -> min(4, 2) = 2; W1 = 5, W2 = 7
    assert r.w_inter == 2 and r.w_union == 5 + 7 - 2


def test_token_pmi_matches_python_reference(spark, sf_dir):
    from magi_etl_spark.operators.pmi import token_pmi
    from magi_etl_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(150)
    got = {
        (r.tok_a, r.tok_b): (r.n_a, r.n_b, r.n_ab, r.pmi)
        for r in token_pmi(docs, top_k=10, min_pairs=3).collect()
    }
    rows = docs.select("doc_id", F.lower("text").alias("t")).collect()
    import re

    doc_toks = {r.doc_id: set(re.findall(r"[a-z0-9]+", r.t)) for r in rows}
    n_docs = len(rows)
    df: dict[str, int] = {}
    for toks in doc_toks.values():
        for t in toks:
            df[t] = df.get(t, 0) + 1
    top = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    top_set = dict(top)
    want = {}
    names = sorted(top_set)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            n_ab = sum(
                1 for toks in doc_toks.values() if a in toks and b in toks
            )
            if n_ab >= 3:
                pmi = round(
                    math.log(n_ab * n_docs / (top_set[a] * top_set[b])), 4
                )
                want[(a, b)] = (top_set[a], top_set[b], n_ab, pmi)
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3]
        assert got[k][3] == pytest.approx(want[k][3], abs=2e-4)
