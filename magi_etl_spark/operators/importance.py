"""Data-selection scoring: DSIR-style importance weights and n-gram
novelty.

``dsir_scores`` implements the hashed n-gram importance-resampling
estimator (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): features are words hashed into ``n_buckets``
buckets, a target corpus and the raw corpus each induce a smoothed
bucket distribution, and a document's score is the mean log-likelihood
ratio of its tokens — high scores mean "looks like the target domain".
Selection is then a threshold or weighted sample over the scores.

Scale shape: two bucket histograms (map-side-combined aggregates over
exploded tokens; the bucket table is ``n_buckets`` rows — broadcast by
construction), the token stream joined to the 256-row ratio table on
the bucket key, one per-document mean.  Nothing collected; the hash is
md5-prefix arithmetic so a SQL oracle reproduces it digit by digit.

``ngram_novelty`` scores how much of a document is corpus-unique: the
fraction of its distinct n-grams appearing in no other document — the
complement of the boilerplate signal (q120's top n-grams), useful as a
diversity objective during selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_RE = "[a-z]+"
_HEX = "0123456789abcdef"


def _tokens(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(_WORD_RE), 0)


def _bucket(col: Column, n_buckets: int = 256) -> Column:
    """Hash a string into [0, n_buckets): the first two md5 hex digits
    read positionally (engine-portable — no hex-cast differences),
    modulo ``n_buckets``."""
    h = F.md5(col)
    d1 = F.instr(F.lit(_HEX), F.substring(h, 1, 1)) - 1
    d2 = F.instr(F.lit(_HEX), F.substring(h, 2, 1)) - 1
    return (d1 * 16 + d2) % n_buckets


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
    smoothing: float = 0.5,
) -> DataFrame:
    """``(id_col, n_tokens, dsir_score)`` for every document of ``raw``
    with at least one token: the mean over tokens of
    ``ln(p_target(bucket) / p_raw(bucket))`` under add-``smoothing``
    bucket distributions.  Positive = target-like."""
    def hist(df: DataFrame, name: str) -> DataFrame:
        toks = df.select(
            F.explode(_tokens(F.col(text_col))).alias("tok")
        ).select(_bucket(F.col("tok"), n_buckets).alias("bucket"))
        return toks.groupBy("bucket").agg(F.count(F.lit(1)).alias(name))

    t = hist(target, "c_t")
    r = hist(raw, "c_r")
    # outer join over the bucket domain: absent buckets get count 0
    spark = raw.sparkSession
    domain = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    ratio = (
        domain.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("c_t"), F.lit(0)).alias("c_t"),
            F.coalesce(F.col("c_r"), F.lit(0)).alias("c_r"),
        )
    )
    tot = ratio.agg(
        F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r")
    )
    w = ratio.join(F.broadcast(tot)).select(
        "bucket",
        (
            F.log(
                (F.col("c_t") + F.lit(smoothing))
                / (F.col("n_t") + F.lit(smoothing) * F.lit(float(n_buckets)))
            )
            - F.log(
                (F.col("c_r") + F.lit(smoothing))
                / (F.col("n_r") + F.lit(smoothing) * F.lit(float(n_buckets)))
            )
        ).alias("w"),
    )
    stream = raw.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    ).select(id_col, _bucket(F.col("tok"), n_buckets).alias("bucket"))
    return (
        stream.join(F.broadcast(w), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("w").alias("dsir_score"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """``(id_col, n_distinct_grams, novel_frac)``: the fraction of the
    document's DISTINCT word n-grams that appear in no other document
    (document frequency 1).  Documents with fewer than ``n`` tokens
    are dropped.  Shape: one (doc, gram)-distinct frame feeds both the
    gram document-frequency aggregate and the per-doc rollup — a keyed
    self-agg, no pair joins."""
    toks = _tokens(F.col(text_col))
    size = F.size(toks)
    grams = F.transform(
        F.slice(toks, 1, F.greatest(size - F.lit(n - 1), F.lit(0))),
        lambda x, i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    dg = (
        df.select(F.col(id_col), F.explode(grams).alias("gram"))
        .distinct()
    )
    # join only the SHARED grams back (df > 1): a gram that misses the
    # join is novel by definition.  The shared-gram frame is typically
    # a small fraction of the vocabulary, so the join's build side
    # shrinks accordingly (AQE turns it into a broadcast when it fits)
    # — same integer sums, same division, identical output.
    shared = (
        dg.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > 1)
        .select("gram", F.lit(True).alias("_shared"))
    )
    return (
        dg.join(shared, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_grams"),
            (
                F.sum(F.when(F.col("_shared").isNull(), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("novel_frac"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span profile — the bounded, shingle-based
    variant of exact substring deduplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    token position is *duplicated* when the ``n``-token shingle
    starting there occurs in more than one document, and consecutive
    duplicated positions form a span.  Output ``(id_col, n_shingles,
    n_dup, max_dup_run)`` — ``max_dup_run + n - 1`` bounds the longest
    copied token span, the quantity span-removal filters threshold on.

    Shape: positional shingles (array expressions, no joins), one
    shingle-keyed document-frequency aggregate joined back on the
    shingle, then a per-document gaps-and-islands window (keyed
    shuffle) for the longest run.  All-integer output."""
    toks = _tokens(F.col(text_col))
    size = F.size(toks)
    shingles = F.transform(
        F.slice(toks, 1, F.greatest(size - F.lit(n - 1), F.lit(0))),
        lambda x, i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    pos = df.select(
        F.col(id_col), F.posexplode(shingles).alias("k", "shingle")
    )
    # distinct docs per shingle; a shingle repeated WITHIN one document
    # does not make that document a copy of another.  Only the SHARED
    # shingles (doc-frequency > 1) join back — a position whose shingle
    # misses the join is not duplicated, so the join's build side is
    # the (small) copied-shingle set, not the whole vocabulary, and AQE
    # broadcasts it when it fits.
    shared = (
        pos.select(id_col, "shingle")
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > 1)
        .select("shingle", F.lit(True).alias("_shared"))
    )
    flagged = pos.join(shared, "shingle", "left").select(
        id_col, "k", F.col("_shared").isNotNull().alias("dup")
    )
    from pyspark.sql import Window as W

    w = W.partitionBy(id_col).orderBy("k")
    runs = (
        flagged.where("dup")
        .withColumn("island", F.col("k") - F.row_number().over(w))
        .groupBy(id_col, "island")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy(id_col)
        .agg(F.max("run").alias("max_dup_run"))
    )
    base = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("dup"), 1).otherwise(0)).alias("n_dup"),
    )
    return base.join(runs, id_col, "left").select(
        id_col,
        "n_shingles",
        F.col("n_dup").cast("long").alias("n_dup"),
        F.coalesce(F.col("max_dup_run"), F.lit(0)).cast("long").alias("max_dup_run"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The TRANSFORM complement of ``duplicated_spans`` — Lee et al.'s
    span removal at shingle granularity: every token covered by a
    cross-document-duplicated ``n``-token shingle is dropped, and the
    survivors are reassembled in reading order.  Output ``(id_col,
    n_tokens, n_kept, cleaned_text)`` for every document with at least
    one token; fully-copied documents come back with ``n_kept = 0``
    and an empty string (removal, not deletion — dropping them is the
    caller's thresholding decision).

    Shape: the same shared-shingle left join as the profile, one
    ``sequence``-explode to expand dup positions into covered token
    indices (bounded by n x dup-positions), an anti-join on (doc,
    position), and one per-document ordered re-aggregation — the
    ``bpe_encode_docs`` re-assembly idiom."""
    toks = _tokens(F.col(text_col))
    size = F.size(toks)
    shingles = F.transform(
        F.slice(toks, 1, F.greatest(size - F.lit(n - 1), F.lit(0))),
        lambda x, i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    pos = df.select(
        F.col(id_col), F.posexplode(shingles).alias("k", "shingle")
    )
    shared = (
        pos.select(id_col, "shingle")
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") > 1)
        .select("shingle")
    )
    covered = (
        pos.join(shared, "shingle")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("k"), F.col("k") + F.lit(n - 1))
            ).alias("t"),
        )
        .distinct()
    )
    stream = df.select(
        F.col(id_col), F.posexplode(toks).alias("t", "tok")
    )
    kept = stream.join(covered, [id_col, "t"], "left_anti")
    kept_agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("cleaned_text"),
    )
    totals = stream.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    return totals.join(kept_agg, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
    )
