"""BPE trainer vs an independent pure-Python reference, greedy-merge
semantics, and the apply path; plus the temporal split and bigram-LM
operators on hand fixtures."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F


# --- independent reference implementation (classic dict-of-tuples BPE) ---
def _ref_bpe(texts: list[str], n_merges: int):
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
        # max count, ties lexicographic on (l, r)
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
    return merges, vocab


_TEXTS = [
    "low low low low low lower lower",
    "newest newest newest newest newest newest",
    "widest widest widest the the the the",
]


def test_bpe_train_matches_reference(spark):
    from magi_etl_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(i, t) for i, t in enumerate(_TEXTS)], "doc_id int, text string")
    got = [
        (r["merge_rank"], r["l"], r["r"], r["merged"], r["pair_freq"])
        for r in bpe_train(df, n_merges=8).orderBy("merge_rank").collect()
    ]
    want, _ = _ref_bpe(_TEXTS, 8)
    assert got == want


def test_bpe_train_local_matches_distributed(spark, sf_dir):
    """r5 VERDICT item 5: the driver-side merge loop (2 Spark jobs
    total, independent of n_merges) produces the IDENTICAL merge table
    to the distributed oracle-parity loop — on the hand fixture AND on
    the sf documents corpus, deep enough that early merges feed later
    ones."""
    from magi_etl_spark.operators.bpe import bpe_train, bpe_train_local
    from magi_etl_spark.tables import load_table

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id int, text string"
    )
    for frame, n in ((df, 8), (load_table(spark, sf_dir, "documents"), 12)):
        dist = [tuple(r) for r in bpe_train(frame, n).orderBy("merge_rank").collect()]
        local = [
            tuple(r) for r in bpe_train_local(frame, n).orderBy("merge_rank").collect()
        ]
        assert local == dist and len(local) > 0


def test_bpe_train_local_vocab_guard(spark):
    from magi_etl_spark.operators.bpe import bpe_train_local

    df = spark.createDataFrame([(0, "a few distinct words here")], "doc_id int, text string")
    with pytest.raises(ValueError, match="max_vocab_rows"):
        bpe_train_local(df, n_merges=2, max_vocab_rows=1)


def test_bpe_greedy_nonoverlapping_merge(spark):
    """[a,a,a,a] must become [aa,aa] in ONE merge round — the
    double-space encoding exists precisely so adjacent matches do not
    share a boundary character."""
    from magi_etl_spark.operators.bpe import bpe_train_and_segment

    df = spark.createDataFrame([(0, "aaaa aaaa aa")], "doc_id int, text string")
    seg = {
        r["word"]: r["segmented"]
        for r in bpe_train_and_segment(df, n_merges=1).collect()
    }
    assert seg["aaaa"] == "aa aa"
    assert seg["aa"] == "aa"


def test_bpe_segment_matches_reference_vocab(spark):
    from magi_etl_spark.operators.bpe import bpe_train_and_segment

    df = spark.createDataFrame([(i, t) for i, t in enumerate(_TEXTS)], "doc_id int, text string")
    got = {
        r["word"]: (r["freq"], tuple(r["segmented"].split(" ")))
        for r in bpe_train_and_segment(df, n_merges=8).collect()
    }
    _, ref_vocab = _ref_bpe(_TEXTS, 8)
    want = {"".join(s): (f, s) for s, f in ref_vocab.items()}
    assert got == want


def test_bpe_early_stop_on_exhausted_pairs(spark):
    from magi_etl_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(0, "a b c")], "doc_id int, text string")
    # single-char words have no pairs at all
    assert bpe_train(df, n_merges=5).count() == 0


def test_out_of_time_split_boundaries(spark):
    from magi_etl_spark.operators.splits import out_of_time_split

    rows = [("u1", i, float(i)) for i in range(5)] + [("u2", 10, 1.0)]
    df = spark.createDataFrame(rows, "user string, ts long, v double")
    out = out_of_time_split(df, ["user"], "ts", "ts", train_pct=80)
    got = {(r["user"], r["ts"]): r["split"] for r in out.collect()}
    # u1: 5 rows -> rn*100 <= 5*80=400 -> rn<=4 train, rn=5 test
    assert [got[("u1", i)] for i in range(5)] == ["train"] * 4 + ["test"]
    # 1-row group: rn=1 -> 100 <= 80 false ... 1*100 <= 1*80 is False -> test?
    # No: the earliest 80 pct of a 1-row group is empty; the row is test.
    assert got[("u2", 10)] == "test"
    with pytest.raises(ValueError):
        out_of_time_split(df, ["user"], "ts", "ts", train_pct=101)


def test_bigram_logprob_hand_fixture(spark):
    from magi_etl_spark.operators.ngram_lm import bigram_logprob_scores

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "x")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob_scores(df, smoothing=0.5).collect()}
    # corpus bigrams: (a,b) x3, (b,a) x1; left totals: a->3, b->1; V=3
    p_ab = (3 + 0.5) / (3 + 0.5 * 3)
    p_ba = (1 + 0.5) / (1 + 0.5 * 3)
    assert out[0]["n_bigrams"] == 3
    assert out[0]["mean_logprob"] == pytest.approx(
        (2 * math.log(p_ab) + math.log(p_ba)) / 3
    )
    assert out[1]["mean_logprob"] == pytest.approx(math.log(p_ab))
    assert 2 not in out  # <2 tokens -> dropped


def test_top_ngrams_counts_and_cut(spark):
    from magi_etl_spark.operators.ngram_lm import top_ngrams

    df = spark.createDataFrame(
        [(0, "the quick fox the quick fox"), (1, "the quick fox jumps")],
        "doc_id int, text string",
    )
    rows = top_ngrams(df, n=3, k=2).collect()
    assert (rows[0]["ngram"], rows[0]["n_occurrences"], rows[0]["doc_freq"]) == (
        "the quick fox", 3, 2,
    )
    assert rows[1]["n_occurrences"] <= 3


def test_bpe_iteration_plan_shape(spark):
    """The merge loop's per-iteration plans, not the tiny output frame:
    the pair-count aggregate is a keyed shuffle (lint-clean) and the
    argmax compiles to a distributed TakeOrderedAndProject — never a
    global sort through one partition."""
    from magi_etl_spark.operators.bpe import _pair_counts, bpe_word_freqs
    from magi_etl_spark.plans import lint

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id int, text string"
    )
    pc = _pair_counts(bpe_word_freqs(df))
    assert not [f for f in lint(pc) if f.severity == "error"]
    argmax = pc.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1)
    plan = argmax._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert not [f for f in lint(argmax) if f.severity == "error"]


def test_bpe_encode_docs_matches_reference(spark):
    from magi_etl_spark.operators.bpe import bpe_encode_docs

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_TEXTS)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in bpe_encode_docs(df, n_merges=4).collect()}
    _, ref_vocab = _ref_bpe(_TEXTS, 4)
    seg = {"".join(s): list(s) for s in ref_vocab}
    symbols = sorted({x for s in ref_vocab for x in s})
    sid = {s: i for i, s in enumerate(symbols)}
    for doc_id, text in enumerate(_TEXTS):
        words = re.findall(r"[a-z]+", text.lower())
        want_ids = [sid[x] for w in words for x in seg[w]]
        r = got[doc_id]
        assert r["n_words"] == len(words)
        assert r["n_tokens"] == len(want_ids)
        assert list(r["token_ids"]) == want_ids


def test_synthesized_pngs_roundtrip_the_real_codec(spark):
    """The q123 synthesis helper emits REAL PNGs: decode one locally
    and check the pixel law, then confirm the distributed feature path
    agrees."""
    from magi_etl_spark.operators.multimodal import (
        extract_features,
        png_decode,
        synthesize_test_images,
    )

    ids = spark.createDataFrame([(7,), (12,)], "doc_id long")
    rows = {r["media_id"]: r for r in synthesize_test_images(ids).collect()}
    w, h, ch, samples = png_decode(bytes(rows[7]["payload"]))
    assert (w, h, ch) == (4 + 7 % 5, 3 + 7 % 4, 1)
    assert list(samples) == [(7 * 31 + k * 7) % 256 for k in range(w * h)]
    feats = {
        r["media_id"]: r["features"]
        for r in extract_features(
            synthesize_test_images(ids), on_error="raise"
        ).collect()
    }
    assert feats[7][:4] == [float(w), float(h), 1.0, float(w * h)]
    assert feats[7][4] == pytest.approx(sum(samples) / len(samples) / 255.0)
