"""DSIR importance scoring and n-gram novelty vs exact Python
replications on hand fixtures."""

from __future__ import annotations

import hashlib
import math
import re

import pytest


def _bucket(tok: str, n: int = 256) -> int:
    h = hashlib.md5(tok.encode()).hexdigest()
    return (int(h[0], 16) * 16 + int(h[1], 16)) % n


def test_dsir_scores_match_python_replication(spark):
    from magi_etl_spark.operators.importance import dsir_scores

    texts = {
        0: "the cat sat on the mat",
        1: "le chat est sur le tapis",
        2: "the dog ate the cat food",
    }
    rows = [(i, t, "en" if i != 1 else "fr") for i, t in texts.items()]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    out = {
        r["doc_id"]: r
        for r in dsir_scores(df, df.where("lang = 'en'"), n_buckets=256).collect()
    }
    # exact replication
    tok = {i: re.findall(r"[a-z]+", t.lower()) for i, t in texts.items()}
    c_t: dict[int, int] = {}
    c_r: dict[int, int] = {}
    for i, ts in tok.items():
        for w in ts:
            b = _bucket(w)
            c_r[b] = c_r.get(b, 0) + 1
            if i != 1:
                c_t[b] = c_t.get(b, 0) + 1
    n_t, n_r = sum(c_t.values()), sum(c_r.values())
    s = 0.5

    def w_of(b: int) -> float:
        return math.log((c_t.get(b, 0) + s) / (n_t + s * 256)) - math.log(
            (c_r.get(b, 0) + s) / (n_r + s * 256)
        )

    for i, ts in tok.items():
        want = sum(w_of(_bucket(w)) for w in ts) / len(ts)
        assert out[i]["n_tokens"] == len(ts)
        assert out[i]["dsir_score"] == pytest.approx(want)
    # the French doc reads as off-target, the English ones on-target
    assert out[1]["dsir_score"] < out[0]["dsir_score"]
    assert out[1]["dsir_score"] < 0 < out[0]["dsir_score"]


def test_ngram_novelty_fractions(spark):
    from magi_etl_spark.operators.importance import ngram_novelty

    df = spark.createDataFrame(
        [
            (0, "a b c d"),       # grams: "a b c", "b c d"
            (1, "a b c x y"),     # grams: "a b c", "b c x", "c x y"
            (2, "zz"),            # too short: dropped
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in ngram_novelty(df, n=3).collect()}
    assert out[0]["n_distinct_grams"] == 2
    assert out[0]["novel_frac"] == pytest.approx(1 / 2)  # "a b c" is shared
    assert out[1]["n_distinct_grams"] == 3
    assert out[1]["novel_frac"] == pytest.approx(2 / 3)
    assert 2 not in out


def test_duplicated_spans_hand_fixture(spark):
    from magi_etl_spark.operators.importance import duplicated_spans

    # doc 0 and 1 share the 7-token prefix "a b c d e f g" -> shingle
    # starts 0..2 duplicated (3-run); doc 0's tail is unique.
    df = spark.createDataFrame(
        [
            (0, "a b c d e f g h i j"),
            (1, "a b c d e f g z z z"),
            (2, "totally different words here now"),
            (3, "tiny doc"),  # < 5 tokens: dropped
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in duplicated_spans(df, n=5).collect()}
    assert out[0]["n_shingles"] == 6 and out[1]["n_shingles"] == 6
    assert out[0]["n_dup"] == 3 and out[0]["max_dup_run"] == 3
    assert out[1]["n_dup"] == 3 and out[1]["max_dup_run"] == 3
    assert out[2]["n_dup"] == 0 and out[2]["max_dup_run"] == 0
    assert 3 not in out


def test_merge_into_clauses(spark):
    """All four merge branches on a hand fixture: update, conditional
    delete, insert, pass-through — plus insert=False and the
    delete-of-absent-key no-op."""
    from magi_etl_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, s string, v int"
    )
    source = spark.createDataFrame(
        [
            (1, "A", 11, False),   # matched update
            (2, "B", 22, True),    # matched delete
            (4, "d", 40, False),   # insert
            (5, "e", 50, True),    # delete of absent key: no-op
        ],
        "k int, s string, v int, del boolean",
    )
    out = {
        r["k"]: (r["s"], r["v"])
        for r in merge_into(target, source, ["k"], delete_col="del").collect()
    }
    assert out == {1: ("A", 11), 3: ("c", 30), 4: ("d", 40)}
    # insert disabled: only update + passthrough remain
    no_ins = {
        r["k"]
        for r in merge_into(
            target, source, ["k"], delete_col="del", insert=False
        ).collect()
    }
    assert no_ins == {1, 3}
    # partial update: only v from source, s retained on matches
    part = {
        r["k"]: (r["s"], r["v"])
        for r in merge_into(
            target, source, ["k"], update_cols=["v"], delete_col="del"
        ).collect()
    }
    assert part[1] == ("a", 11)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        merge_into(target, source, ["k"], update_cols=["nope"])


def test_merge_into_insert_takes_all_shared_columns(spark):
    """With a PARTIAL update set, inserted rows still take every shared
    column from the source (the Delta INSERT-all clause) — only
    matched updates are restricted to update_cols."""
    from magi_etl_spark.operators.merge import merge_into

    target = spark.createDataFrame([(1, "a", 10)], "k int, s string, v int")
    source = spark.createDataFrame(
        [(1, "A", 11, False), (4, "d", 40, False)],
        "k int, s string, v int, del boolean",
    )
    out = {
        r["k"]: (r["s"], r["v"])
        for r in merge_into(
            target, source, ["k"], update_cols=["v"], delete_col="del"
        ).collect()
    }
    assert out == {1: ("a", 11), 4: ("d", 40)}


def test_merge_into_null_key_rows_pass_through(spark):
    """Delta MERGE semantics: a NULL join key never matches, so a
    NULL-key target row is an UNMATCHED target row and must pass
    through unchanged; a NULL-key source row is an unmatched source
    row (inserted unless flagged for delete).  r5 ADVICE item 1: the
    key-null presence test silently dropped the target row."""
    from magi_etl_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10), (None, "nullkey", 99)], "k int, s string, v int"
    )
    source = spark.createDataFrame(
        [(1, "A", 11, False), (None, "srcnull", 77, False)],
        "k int, s string, v int, del boolean",
    )
    rows = merge_into(target, source, ["k"], delete_col="del").collect()
    by_s = {r["s"]: (r["k"], r["v"]) for r in rows}
    assert by_s["nullkey"] == (None, 99)  # target passthrough, not dropped
    assert by_s["A"] == (1, 11)  # matched update untouched by the fix
    assert by_s["srcnull"] == (None, 77)  # unmatched source insert
    assert len(rows) == 3
    # and with insert=False the NULL-key source row stays out while the
    # NULL-key target row still survives
    no_ins = {r["s"] for r in merge_into(
        target, source, ["k"], delete_col="del", insert=False
    ).collect()}
    assert no_ins == {"nullkey", "A"}


def test_weighted_sample_matches_python_es_replication(spark):
    import hashlib
    import math

    from magi_etl_spark.operators.sampling import weighted_sample_n_per_group

    rows = [(i, "g%d" % (i % 2), float(1 + i % 10)) for i in range(40)]
    rows.append((100, "g0", 0.0))   # zero weight: never sampled
    rows.append((101, "g1", None))  # null weight: never sampled
    df = spark.createDataFrame(rows, "id int, g string, w double")
    got = {
        (r["g"], r["id"])
        for r in weighted_sample_n_per_group(
            df, ["g"], "w", n=3, id_col="id", seed="wsample"
        ).collect()
    }

    def es_key(i: int, w: float) -> float:
        h = hashlib.md5(f"wsample|{i}".encode()).hexdigest()
        u = (int(h[:8], 16) + 1) / 2 ** 32
        return math.log(u) / w

    want = set()
    for g in ("g0", "g1"):
        cands = [
            (es_key(i, w), -i, i)
            for i, gg, w in rows
            if gg == g and w is not None and w > 0
        ]
        cands.sort(reverse=True)
        want |= {(g, i) for _, _, i in cands[:3]}
    assert got == want
    assert ("g0", 100) not in got and ("g1", 101) not in got
