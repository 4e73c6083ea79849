"""MinHash-LSH recall characterization: banded candidate generation must
recover most true near-dup pairs, with recall improving as bands shrink
(more, smaller bands => more candidate collisions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from magi_etl_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from magi_etl_spark.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def truth(docs):
    # exact pairs at jaccard >= 0.5 (the target the LSH approximates)
    return {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()
    }


def _recall(docs, truth, n_hashes, band_size):
    sigs = minhash_signatures(docs, "doc_id", "text", n=3, n_hashes=n_hashes)
    bands = [
        [f"m{j}" for j in range(i, min(i + band_size, n_hashes))]
        for i in range(0, n_hashes, band_size)
    ]
    cands = {
        (r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs, bands).collect()
    }
    return len(truth & cands) / len(truth) if truth else 1.0


def test_lsh_recall_reasonable_and_monotone(docs, truth):
    assert truth, "fixture should contain true near-dup pairs"
    # 4 hashes in 2-hash bands: the production default
    default = _recall(docs, truth, n_hashes=4, band_size=2)
    assert default >= 0.6, f"default recall too low: {default}"
    # single-hash bands collide more: recall must not decrease
    loose = _recall(docs, truth, n_hashes=4, band_size=1)
    assert loose >= default
    assert loose >= 0.9, f"loose-band recall too low: {loose}"
