"""Property-based tests for the round-5 operators: random inputs
evaluated by the Spark operators must agree with single-threaded
Python references (the test_etl_property.py discipline applied to BPE
training, MERGE INTO, and the out-of-time split)."""

from __future__ import annotations

import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# tiny alphabet makes pair collisions (and tie-breaks) likely
_words = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=5),
    min_size=1,
    max_size=10,
)


def _ref_bpe(texts, n_merges):
    vocab: Counter = Counter()
    for t in texts:
        for w in re.findall(r"[a-z]+", t.lower()):
            vocab[tuple(w)] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += freq
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, cnt))
        new_vocab: Counter = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


@given(words=_words)
@settings(**_SETTINGS)
def test_bpe_train_matches_reference_on_random_corpora(spark, words):
    from magi_etl_spark.operators.bpe import bpe_train

    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "doc_id int, text string")
    got = [
        (r["merge_rank"], r["l"], r["r"], r["merged"], r["pair_freq"])
        for r in bpe_train(df, n_merges=3).orderBy("merge_rank").collect()
    ]
    assert got == _ref_bpe([text], 3)


_merge_target = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 9)),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)
_merge_source = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 9), st.booleans()),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(tgt=_merge_target, src=_merge_source)
@settings(**_SETTINGS)
def test_merge_into_matches_dict_model(spark, tgt, src):
    from magi_etl_spark.operators.merge import merge_into

    target = spark.createDataFrame(tgt or [(99, 0)], "k int, v int")
    source = spark.createDataFrame(
        src or [(98, 0, False)], "k int, v int, del boolean"
    )
    tgt_eff = tgt or [(99, 0)]
    src_eff = src or [(98, 0, False)]
    model = {k: v for k, v in tgt_eff}
    for k, v, dele in src_eff:
        if dele:
            model.pop(k, None)  # matched delete or absent-key no-op
        else:
            model[k] = v  # update or insert
    got = {
        r["k"]: r["v"]
        for r in merge_into(target, source, ["k"], delete_col="del").collect()
    }
    assert got == model


_groups = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),
    min_size=1,
    max_size=30,
    unique_by=lambda t: (t[0], t[1]),
)


@given(rows=_groups, pct=st.integers(0, 100))
@settings(**_SETTINGS)
def test_oot_split_train_counts_are_exact(spark, rows, pct):
    """Per group of size n, exactly floor(n * pct / 100) earliest rows
    are train — the integer-exact boundary contract."""
    from pyspark.sql import functions as F

    from magi_etl_spark.operators.splits import out_of_time_split

    df = spark.createDataFrame(rows, "g int, ts int")
    out = out_of_time_split(df, ["g"], "ts", "ts", train_pct=pct)
    got = {
        (r["g"], r["split"]): r["n"]
        for r in out.groupBy("g", "split").agg(F.count("*").alias("n")).collect()
    }
    sizes: dict[int, int] = {}
    for g, _ in rows:
        sizes[g] = sizes.get(g, 0) + 1
    for g, n in sizes.items():
        train = n * pct // 100
        assert got.get((g, "train"), 0) == train
        assert got.get((g, "test"), 0) == n - train
    # and the train rows are exactly the earliest ones
    per_group: dict[int, list[int]] = {}
    for g, ts in rows:
        per_group.setdefault(g, []).append(ts)
    marked = {
        (r["g"], r["ts"]): r["split"] for r in out.collect()
    }
    for g, tss in per_group.items():
        tss.sort()
        cut = len(tss) * pct // 100
        for i, ts in enumerate(tss):
            assert marked[(g, ts)] == ("train" if i < cut else "test")
