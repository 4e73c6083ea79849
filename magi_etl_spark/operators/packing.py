"""Sequence packing: fill fixed token budgets with document chunks so
training batches waste minimal padding (LLM-data-pipeline extension; no
counterpart in the tabular-only reference).

Packing is inherently sequential (each bin decision depends on the
running fill), so it cannot be a pure window expression; the scalable
shape is bucketed next-fit: hash items into independent buckets, pack
each bucket with a deterministic greedy pass.  Buckets are the
parallelism unit — the default DERIVES the bucket count from the chunk
count (~4096 chunks per bucket, so 100 TB means millions of buckets,
each still O(1) work) and every bucket packs independently in one
``applyInPandas`` group (Arrow batch in, Arrow batch out, no driver
involvement); the only shuffle is the one groupBy-key exchange that
co-locates a bucket.

Next-fit (close the bin when the next item doesn't fit, never reopen)
rather than best-fit: it is O(n), stateless beyond the running bin, and
its decisions depend only on the bucket-local item order — which is
pinned to (doc_id, chunk_idx) — so output is deterministic under any
partitioning and task retry, and the identical recursion runs as a
DuckDB recursive CTE, giving the operator a full value-level oracle.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_bucket_count(n_rows: int, target: int = 4096) -> int:
    """Bucket count for ~``target`` chunks per bucket: the next power of
    two of ``n_rows / target``, floored at 16.  A FIXED bucket count
    makes each ``applyInPandas`` group grow linearly with the corpus
    (the q211 negative-sampling class of defect: per-bucket work must
    stay O(1) as data scales); ~4096 rows keeps the per-bucket greedy
    pass trivially cheap while one Arrow batch still amortizes well.
    Mirrors ``negatives.auto_bucket_count``."""
    return max(16, 1 << max(0, math.ceil(math.log2(max(n_rows, 1) / target))))


def pack_chunks(
    chunks: DataFrame,
    token_col: str = "n_chunk_tokens",
    budget: int = 256,
    n_buckets: int | None = None,
    id_cols: tuple[str, str] = ("doc_id", "chunk_idx"),
    bucket_expr=None,
) -> DataFrame:
    """Assign every chunk a (bucket, seq_id, seq_pos): sequences are
    next-fit bins of at most ``budget`` tokens, packed per hash bucket in
    (doc_id, chunk_idx) order.  Chunks larger than ``budget`` get a bin
    of their own (they should have been split upstream; packing must not
    drop data).  Input columns pass through unchanged.

    ``n_buckets=None`` (the default) derives the bucket count from the
    chunk count so buckets hold ~4096 chunks each (power of two, floor
    16; one 1-row aggregate) — per-bucket packing work stays O(1) at any
    corpus scale instead of growing with it.  An explicit ``n_buckets``
    is honored verbatim (oracles pin it).

    ``bucket_expr`` overrides the default xxhash64 bucketing (e.g. a
    plain modulo when the assignment must be reproducible outside
    Spark)."""
    doc_col, idx_col = id_cols
    if bucket_expr is None:
        if n_buckets is None:
            # one 1-row aggregate (the negatives.auto_bucket_count idiom)
            n_buckets = auto_bucket_count(chunks.count())
        bucket_expr = F.pmod(F.xxhash64(F.col(doc_col)), F.lit(n_buckets))
    bucketed = chunks.withColumn("bucket", bucket_expr.cast("int"))
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in bucketed.schema)
    out_schema = f"{fields}, seq_id int, seq_pos int"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([doc_col, idx_col], kind="mergesort").reset_index(
            drop=True
        )
        seq_ids, seq_pos = [], []
        cur_seq, cur_fill, cur_len = 0, 0, 0
        for n in pdf[token_col]:
            n = int(n)
            if cur_len > 0 and cur_fill + n > budget:
                cur_seq, cur_fill, cur_len = cur_seq + 1, 0, 0
            seq_ids.append(cur_seq)
            seq_pos.append(cur_len)
            cur_fill += n
            cur_len += 1
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int32")
        pdf["seq_pos"] = pd.Series(seq_pos, dtype="int32")
        return pdf

    return bucketed.groupBy("bucket").applyInPandas(pack, schema=out_schema)


def packing_efficiency(
    packed: DataFrame, token_col: str = "n_chunk_tokens", budget: int = 256
) -> DataFrame:
    """Fill-rate diagnostics per bucket: sequences, mean fill fraction,
    and the padding tokens a fixed-length batch would waste."""
    per_seq = packed.groupBy("bucket", "seq_id").agg(
        F.sum(token_col).alias("fill"), F.count("*").alias("n_chunks")
    )
    return per_seq.groupBy("bucket").agg(
        F.count("*").alias("n_sequences"),
        F.avg(F.col("fill") / F.lit(budget)).alias("mean_fill"),
        F.sum(F.lit(budget) - F.col("fill")).alias("padding_tokens"),
    )
