"""Property-based tests for the round-9 operator wave: random inputs
evaluated by the Spark operators must agree with single-threaded Python
references (the test_r5_property.py discipline applied to weighted
quantiles, token dispersion, greedy max-coverage, and the Hill tail
index)."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# --- weighted quantiles ------------------------------------------------------

_wq_rows = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(min_value=-50, max_value=50),
        st.integers(min_value=1, max_value=9),
    ),
    min_size=1,
    max_size=25,
)


def _ref_weighted_quantile(rows, group, q):
    """Smallest v whose cumulative weight reaches q * W (mass rule,
    duplicates collapsed — collapsing never changes the running sum)."""
    per_val = Counter()
    for g, v, w in rows:
        if g == group:
            per_val[v] += w
    total = sum(per_val.values())
    cum = 0
    for v in sorted(per_val):
        cum += per_val[v]
        if cum >= q * total:
            return v
    return None


@given(rows=_wq_rows)
@settings(**_SETTINGS)
def test_weighted_quantiles_match_python_reference(spark, rows):
    from magi_etl_spark.operators.wquantile import weighted_quantiles

    df = spark.createDataFrame(rows, "g string, v long, w long")
    qs = [0.25, 0.5, 0.75, 1.0]
    got = {
        (r.g, r.q): r.wq
        for r in weighted_quantiles(df, ["g"], "v", "w", qs).collect()
    }
    groups = {g for g, _, _ in rows}
    for g in groups:
        for q in qs:
            assert got[(g, q)] == _ref_weighted_quantile(rows, g, q), (
                g,
                q,
                rows,
            )
    # no rows for absent groups
    assert len(got) == len(groups) * len(qs)


# --- token dispersion --------------------------------------------------------

_disp_texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "bb", "cc"]), min_size=0, max_size=8
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


@given(texts=_disp_texts)
@settings(**_SETTINGS)
def test_dispersion_matches_zero_inclusive_reference(spark, texts):
    """The zero-free closed form equals the naive variance/mean with
    zero cells materialized, for every token."""
    from magi_etl_spark.operators.dispersion import token_dispersion

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.tok: r.dispersion
        for r in token_dispersion(df, min_df=1, top_n=100).collect()
    }
    d_docs = len(texts)
    counts: dict[str, list[int]] = {}
    for t in texts:
        seen = Counter(t.split())
        for tok in ("aa", "bb", "cc"):
            counts.setdefault(tok, []).append(seen.get(tok, 0))
    for tok, cs in counts.items():
        tot = sum(cs)
        if tot == 0:
            assert tok not in got
            continue
        mean = tot / d_docs
        var = sum(c * c for c in cs) / d_docs - mean * mean
        import pytest

        assert got[tok] == pytest.approx(
            var / mean, rel=1e-9, abs=1e-9
        ), (tok, texts)


# --- greedy max coverage -----------------------------------------------------

_cover_docs = st.lists(
    st.lists(
        st.sampled_from(list("abcde")), min_size=0, max_size=6
    ).map(" ".join),
    min_size=1,
    max_size=6,
)


def _ref_greedy_cover(texts, k):
    units = {
        i: set(t.split()) for i, t in enumerate(texts) if t.split()
    }
    covered: set[str] = set()
    trace = []
    for rank in range(1, k + 1):
        best = None
        for doc in sorted(units):
            gain = len(units[doc] - covered)
            if best is None or gain > best[1]:
                best = (doc, gain)
        if best is None or best[1] == 0:
            break
        covered |= units[best[0]]
        trace.append((rank, best[0], best[1], len(covered)))
    return trace


@given(texts=_cover_docs)
@settings(**_SETTINGS)
def test_vocab_cover_matches_greedy_reference(spark, texts):
    from magi_etl_spark.operators.maxcover import vocab_cover_trace

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.sel_rank, r.doc_id, r.new_tokens, r.cum_tokens)
        for r in vocab_cover_trace(df, k=3, ngram=1)
        .orderBy("sel_rank")
        .collect()
    ]
    assert got == _ref_greedy_cover(texts, 3), texts


# --- Hill tail index ---------------------------------------------------------

_hill_texts = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
    min_size=6,
    max_size=40,
)


@given(toks=_hill_texts)
@settings(**_SETTINGS)
def test_hill_matches_python_reference(spark, toks):
    from magi_etl_spark.operators.tailindex import hill_tail_index

    df = spark.createDataFrame(
        [(1, " ".join(toks))], "doc_id long, text string"
    )
    freqs = sorted(Counter(toks).values(), reverse=True)
    ks = [k for k in (1, 2) if k + 1 <= len(freqs)]
    if not ks:
        return
    import pytest

    got = {r.k: r for r in hill_tail_index(df, ks=ks).collect()}
    for k in ks:
        f_k1 = freqs[k]
        h = sum(math.log(freqs[i] / f_k1) for i in range(k)) / k
        assert got[k].f_k1 == f_k1, (k, toks)
        assert got[k].hill_h == pytest.approx(round(h, 6), abs=1e-6), (k, toks)
        if h == 0.0:
            assert got[k].alpha is None, (k, toks)
        else:
            assert got[k].alpha == pytest.approx(
                round(1 / h, 6), abs=1e-6
            ), (k, toks)
