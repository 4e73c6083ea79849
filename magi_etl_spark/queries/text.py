"""Text-analysis query inventory over the ``documents`` table.

Oracles replicate the exact expression trees (same op order, same md5-based
hashing) so double results are bit-identical per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magi_etl_spark.operators import text as T
from magi_etl_spark.queries import query
from magi_etl_spark.tables import load_table

_TOKS = r"list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')"


@query(
    "q20_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT)
               AS n_tokens_bpe,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) / len(toks), 6)
               AS avg_token_len
    FROM t
    """,
)
def q20_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting — whitespace tokenizer plus a BPE-ish regex count
    (letter runs / digit runs / single punctuation, the pre-tokenization
    split BPE vocabularies assume)."""
    d = load_table(spark, sf_dir, "documents")
    out = T.token_stats(d, "doc_id", "text")
    bpe = F.size(F.regexp_extract_all("text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0))
    return out.join(load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        bpe.cast("long").alias("n_tokens_bpe"),
        F.col("n_chars_measured").cast("long").alias("n_chars_measured"),
        "avg_token_len",
    )


@query(
    "q21_quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    m AS (
        SELECT doc_id,
               len(toks) AS n,
               len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) / len(toks)
                   AS stop_ratio,
               len(list_distinct(toks)) / len(toks) AS diversity
        FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           ROUND(stop_ratio, 6) AS stopword_ratio,
           ROUND(diversity, 6) AS lexical_diversity,
           ROUND(least(n / 50.0, 1.0) * 0.4 + least(stop_ratio * 5.0, 1.0) * 0.3
                 + diversity * 0.3, 6) AS quality_score
    FROM m
    """,
)
def q21_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring for corpus filtering (length, stopword
    ratio, lexical diversity)."""
    d = load_table(spark, sf_dir, "documents")
    out = T.quality_scores(d, "doc_id", "text")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "stopword_ratio",
        "lexical_diversity",
        "quality_score",
    )


@query(
    "q22_language_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    h AS (
        SELECT doc_id,
               len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS en_h,
               len(list_filter(toks, x -> x IN ('el','la','de','y','que','los'))) AS es_h,
               len(list_filter(toks, x -> x IN ('der','die','das','und','ist','nicht'))) AS de_h,
               len(list_filter(toks, x -> x IN ('le','les','des','et','est','une'))) AS fr_h
        FROM t
    )
    SELECT doc_id,
           CASE WHEN greatest(en_h, es_h, de_h, fr_h) = 0 THEN 'und'
                WHEN en_h = greatest(en_h, es_h, de_h, fr_h) THEN 'en'
                WHEN es_h = greatest(en_h, es_h, de_h, fr_h) THEN 'es'
                WHEN de_h = greatest(en_h, es_h, de_h, fr_h) THEN 'de'
                ELSE 'fr' END AS pred_lang
    FROM h
    """,
)
def q22_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID heuristic (deterministic tie-break)."""
    d = load_table(spark, sf_dir, "documents")
    return T.language_id(d, "doc_id", "text")


@query(
    "q49_chunking",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    nonempty AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
    grid AS (
        SELECT doc_id, toks,
               generate_subscripts(range(1, len(toks) + 1, 48), 1) - 1 AS chunk_idx,
               unnest(range(1, len(toks) + 1, 48)) AS start
        FROM nonempty
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
           array_to_string(toks[start : start + 63], ' ') AS chunk_text,
           CAST(len(toks[start : start + 63]) AS INTEGER) AS n_chunk_tokens
    FROM grid
    WHERE len(toks[start : start + 63]) >= 16
    """,
)
def q49_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token windows, stride 48) —
    the sequence-packing primitive that turns long documents into
    training-sized samples."""
    from magi_etl_spark.operators.chunking import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, "doc_id", "text", chunk_tokens=64, stride=48,
                           min_chunk_tokens=16)


@query(
    "q26_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(text) AS content_md5,
           CASE WHEN length(text) >= 8
                THEN list_min(list_transform(range(1, length(text) - 6),
                                             i -> md5(substr(text, i, 8))))
                ELSE md5(text) END AS kgram_fingerprint
    FROM documents
    """,
)
def q26_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint (min md5 over char 8-grams) +
    exact content digest."""
    d = load_table(spark, sf_dir, "documents")
    return T.fingerprints(d, "doc_id", "text", k=8)


@query(
    "q56_dataset_mix",
    oracle="""
    WITH w(lang, whole, thr) AS (VALUES
        ('en', 2, '80000000'), ('de', 1, '00000000'), ('fr', 0, '80000000'),
        ('es', 0, '40000000'), ('zh', 0, '00000000')),
    d AS (SELECT doc_id, lang,
                 substr(md5(concat('mix|', CAST(doc_id AS VARCHAR))), 1, 8) AS u
          FROM documents),
    n AS (SELECT d.doc_id, d.lang,
                 w.whole + CASE WHEN d.u < w.thr THEN 1 ELSE 0 END AS copies
          FROM d JOIN w USING (lang))
    SELECT doc_id, lang, CAST(unnest(range(1, copies + 1)) AS BIGINT) AS copy_idx
    FROM n WHERE copies > 0
    """,
)
def q56_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted training-mixture resample of the documents corpus:
    en 2.5x (two copies + a hash-chosen half), de 1.0, fr 0.5, es 0.25,
    zh dropped.  The draw is md5(seed|doc_id) — identical expression in
    the DuckDB oracle, so the sample itself is verified, not just its
    size.  Plan is project+filter+explode: zero shuffles at any scale."""
    from magi_etl_spark.operators.mixing import weighted_mix

    d = load_table(spark, sf_dir, "documents")
    mixed = weighted_mix(
        d,
        {"en": 2.5, "de": 1.0, "fr": 0.5, "es": 0.25, "zh": 0.0},
        source_col="lang",
        key_col="doc_id",
        seed="mix",
    )
    return mixed.select(
        "doc_id", "lang", F.col("copy_idx").cast("long").alias("copy_idx")
    )


@query(
    "q84_dataset_split",
    oracle="""
    WITH u AS (
        SELECT doc_id, lang,
               substr(md5(concat('split|', CAST(doc_id AS VARCHAR))), 1, 8) AS u
        FROM documents
    )
    SELECT CASE WHEN u < 'cccccccc' THEN 'train'
                WHEN u < 'e6666666' THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM u GROUP BY 1
    """,
)
def q84_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment of the corpus:
    each doc's md5 draw picks exactly one sub-interval of [0,1), so the
    splits are disjoint, exhaustive, and stable across runs, engines,
    partitionings, and task retries (``operators/mixing.split_assign``).
    The oracle recomputes the same draw and thresholds in DuckDB —
    0.8 * 16^8 = 0xcccccccc, 0.9 * 16^8 = 0xe6666666 — so the ASSIGNMENT
    is verified, not just the split sizes.  Project + aggregate: the
    assignment itself adds no shuffle."""
    from magi_etl_spark.operators.mixing import split_assign

    d = load_table(spark, sf_dir, "documents")
    assigned = split_assign(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="split"
    )
    return assigned.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
    )


@query(
    "q57_sequence_packing",
    oracle=f"""
    WITH RECURSIVE t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    nonempty AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
    grid AS (
        SELECT doc_id, toks,
               generate_subscripts(range(1, len(toks) + 1, 48), 1) - 1 AS chunk_idx,
               unnest(range(1, len(toks) + 1, 48)) AS start
        FROM nonempty
    ),
    ch AS (
        SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
               CAST(len(toks[start : start + 63]) AS INTEGER) AS n_chunk_tokens,
               CAST(doc_id % 16 AS INTEGER) AS bucket
        FROM grid
        WHERE len(toks[start : start + 63]) >= 16
    ),
    ordered AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY bucket ORDER BY doc_id, chunk_idx) AS rn
        FROM ch
    ),
    pack AS (
        SELECT bucket, rn, doc_id, chunk_idx, n_chunk_tokens,
               0 AS seq_id, 0 AS seq_pos, n_chunk_tokens AS fill
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.bucket, o.rn, o.doc_id, o.chunk_idx, o.n_chunk_tokens,
               CASE WHEN p.fill + o.n_chunk_tokens <= 256
                    THEN p.seq_id ELSE p.seq_id + 1 END,
               CASE WHEN p.fill + o.n_chunk_tokens <= 256
                    THEN p.seq_pos + 1 ELSE 0 END,
               CASE WHEN p.fill + o.n_chunk_tokens <= 256
                    THEN p.fill + o.n_chunk_tokens ELSE o.n_chunk_tokens END
        FROM pack p JOIN ordered o ON o.bucket = p.bucket AND o.rn = p.rn + 1
    )
    SELECT bucket, doc_id, chunk_idx, n_chunk_tokens,
           CAST(seq_id AS INTEGER) AS seq_id, CAST(seq_pos AS INTEGER) AS seq_pos
    FROM pack
    """,
)
def q57_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-fit sequence packing of the q49 chunks into 256-token
    training sequences, bucketed by doc_id % 16 (the modulo form so the
    DuckDB oracle — a recursive CTE running the identical greedy
    recursion — can verify every (seq_id, seq_pos) assignment).  The
    Spark side is one applyInPandas pass per bucket: the only shuffle is
    the bucket co-location exchange."""
    from magi_etl_spark.operators.chunking import chunk_documents
    from magi_etl_spark.operators.packing import pack_chunks

    d = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        d, "doc_id", "text", chunk_tokens=64, stride=48, min_chunk_tokens=16
    ).select("doc_id", "chunk_idx", "n_chunk_tokens")
    packed = pack_chunks(
        chunks,
        budget=256,
        n_buckets=16,
        bucket_expr=F.col("doc_id") % 16,
    )
    return packed.select(
        "bucket", "doc_id", "chunk_idx", "n_chunk_tokens", "seq_id", "seq_pos"
    )


@query(
    "q61_corpus_percentiles",
    oracle=f"""
    WITH t AS (SELECT lang, len({_TOKS}) AS n_toks, n_chars FROM documents)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(quantile_cont(n_toks, 0.5), 6) AS toks_p50,
           ROUND(quantile_cont(n_toks, 0.9), 6) AS toks_p90,
           ROUND(quantile_cont(n_toks, 0.99), 6) AS toks_p99,
           ROUND(quantile_cont(n_chars, 0.5), 6) AS chars_p50,
           CAST(MAX(n_toks) AS BIGINT) AS toks_max
    FROM t GROUP BY lang
    """,
)
def q61_corpus_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus length distribution: exact interpolated
    percentiles of token and char counts — the cut-points a corpus
    filter derives its length gates from.  Spark's exact ``percentile``
    and DuckDB's ``quantile_cont`` share the (n-1)*p linear-interpolation
    definition, so values match to the 6-dp grid.  At 100 TB swap in
    ``percentile_approx`` (t-digest, single pass, mergeable) — the exact
    form sorts each group and is the small-N parity variant."""
    from magi_etl_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang", F.size(tokens(F.col("text"))).alias("n_toks"), "n_chars"
    )
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.expr("percentile(n_toks, 0.5)"), 6).alias("toks_p50"),
        F.round(F.expr("percentile(n_toks, 0.9)"), 6).alias("toks_p90"),
        F.round(F.expr("percentile(n_toks, 0.99)"), 6).alias("toks_p99"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("chars_p50"),
        F.max("n_toks").cast("long").alias("toks_max"),
    )


@query(
    "q63_vocab_coverage",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    counts AS (SELECT token, COUNT(*) AS n FROM t GROUP BY token),
    tot AS (SELECT SUM(n) AS total FROM counts),
    ranked AS (
        SELECT token, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank,
               SUM(n) OVER (ORDER BY n DESC, token
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM counts
    )
    SELECT r.token, CAST(r.n AS BIGINT) AS n, CAST(r.rank AS BIGINT) AS rank,
           ROUND(r.cum * 1.0 / t.total, 6) AS cum_share
    FROM ranked r, tot t
    WHERE (r.cum - r.n) * 1.0 / t.total < 0.99
    """,
)
def q63_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction cut: the smallest count-ranked token set
    covering 99% of corpus occurrences (the candidate list a tokenizer
    trainer starts from).  A token is kept when coverage WITHOUT it is
    still under the cutoff, so the first token crossing 99% is included
    and the tail is dropped.

    Scale: token counts are one map-side-combined shuffle; the global
    cumulative sum is the two-pass range-partitioned prefix sum of
    ``operators/prefix.ranked_prefix_sum`` — never a single-partition
    window.  (n, token) is unique per row, so range boundaries can never
    split a tie and the output is partitioning-independent."""
    from magi_etl_spark.functions.text import tokens
    from magi_etl_spark.operators.prefix import ranked_prefix_sum

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    ranked = ranked_prefix_sum(
        counts, [F.col("n").desc(), F.col("token")], "n", include_total=True
    )
    return (
        ranked.where((F.col("cum") - F.col("n")) / F.col("total") < 0.99)
        .select(
            "token",
            "n",
            F.col("rank").cast("long").alias("rank"),
            F.round(F.col("cum") / F.col("total"), 6).alias("cum_share"),
        )
    )


@query(
    "q64_stratified_sample",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY substr(md5(concat('strat|',
                       CAST(doc_id AS VARCHAR))), 1, 8), doc_id) AS pick
        FROM documents
    )
    SELECT doc_id, lang, source, n_chars, CAST(pick AS INTEGER) AS pick
    FROM ranked WHERE pick <= 20
    """,
)
def q64_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: exactly 20 documents per
    language, chosen by md5-hash order (+doc_id tie-break) so the
    selection is reproducible across runs, partitionings, and engines —
    the eval-set carving primitive.  One shuffle on the stratum key;
    the window ranks within strata only."""
    from magi_etl_spark.operators.mixing import uniform_hex
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(uniform_hex(F.col("doc_id"), "strat"), "doc_id")
    return (
        d.select(
            "doc_id", "lang", "source", "n_chars",
            F.row_number().over(w).alias("pick"),
        )
        .where(F.col("pick") <= 20)
    )


@query(
    "q65_normalize_text",
    oracle=r"""
    WITH n AS (
        SELECT doc_id,
               trim(regexp_replace(
                   regexp_replace(
                       lower(regexp_replace(text,
                             '[\x00-\x08\x0b-\x1f\x7f]', '', 'g')),
                       '[!-/:-@\[-`{-~]', ' ', 'g'),
                   '\s+', ' ', 'g')) AS norm
        FROM documents
    )
    SELECT doc_id, norm, md5(norm) AS norm_md5,
           CAST(length(norm) AS INTEGER) AS n_norm_chars
    FROM n
    """,
)
def q65_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalized text (lowercase, punctuation stripped, whitespace
    collapsed, control chars removed) with a content digest — the
    pre-dedup normalization pass.  Identical explicit-ASCII regexes run
    on both engines; the md5 digest makes the comparison byte-exact."""
    from magi_etl_spark.operators.text import normalize_text

    d = load_table(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"), strip_punct=True)
    return d.select(
        "doc_id",
        norm.alias("norm"),
        F.md5(norm).alias("norm_md5"),
        F.length(norm).alias("n_norm_chars"),
    )


@query(
    "q69_repetition_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
                 CASE WHEN len(toks) >= 3
                      THEN list_transform(range(1, len(toks) - 1),
                           i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
                      ELSE CAST([] AS VARCHAR[]) END AS sh
          FROM t)
    SELECT doc_id,
           CAST(len(sh) AS INTEGER) AS n_shingles,
           CAST(len(list_distinct(sh)) AS INTEGER) AS n_distinct,
           ROUND(1.0 - len(list_distinct(sh)) * 1.0 / len(sh), 6) AS repetition
    FROM s WHERE len(sh) > 0
    """,
)
def q69_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition: 1 - distinct/total word-3-grams — the
    boilerplate/loop-generation quality signal corpus filters threshold
    on (high repetition = templated or degenerate text).  Pure array
    Columns over non-distinct shingles; zero shuffles."""
    from magi_etl_spark.operators.dedup import with_shingles

    d = load_table(spark, sf_dir, "documents")
    s = with_shingles(d, "doc_id", "text", n=3, distinct=False).where(
        F.size("shingles") > 0
    )
    return s.select(
        "doc_id",
        F.size("shingles").alias("n_shingles"),
        F.size(F.array_distinct("shingles")).alias("n_distinct"),
        F.round(
            1.0 - F.size(F.array_distinct("shingles")) / F.size("shingles"), 6
        ).alias("repetition"),
    )


@query(
    "q70_pii_scan",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS INTEGER)
               AS n_emails,
           CAST(len(regexp_extract_all(text,
               '[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+')) AS INTEGER) AS n_ipish,
           CAST(len(regexp_extract_all(text, '[0-9][0-9][0-9]+')) AS INTEGER)
               AS n_digit_runs
    FROM documents
    """,
)
def q70_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-pattern scan: per-document counts of email-shaped, IPv4-shaped
    and long-digit-run substrings — the compliance pre-filter that
    routes documents to redaction.  Identical explicit regexes run on
    both engines (no \\d or bounded quantifiers, which differ between
    Java regex and RE2); zero shuffles."""
    d = load_table(spark, sf_dir, "documents")

    def n(pat):
        return F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))

    return d.select(
        "doc_id",
        n(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+").alias("n_emails"),
        n(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+").alias("n_ipish"),
        n(r"[0-9][0-9][0-9]+").alias("n_digit_runs"),
    )
