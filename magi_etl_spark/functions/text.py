"""Text Column helpers: tokenization, shingling, hashing, fingerprints.

All expressions are deterministic and engine-portable: hashes are built
from ``md5`` (identical across Spark / DuckDB / Presto) rather than
engine-private hash functions, so oracle queries can mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization with empty-token filtering.

    Mirrors the reference's ``split(all_themes, ',')``-style array building
    (reference ``dash_app/tasks.py:779-784``) generalized to whitespace.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), r"\s+"), lambda x: x != "")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Contiguous word n-grams as space-joined strings; empty array when the
    document has fewer than ``n`` tokens.

    Guard note: Spark ``sequence(1, 0)`` yields a *descending* sequence, so
    the short-document case must be branched, not clamped.
    """
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j) for j in range(n)]
    )
    return F.when(F.size(toks) >= n, F.transform(idx, gram)).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(text: Column, k: int = 8) -> Column:
    """Character k-grams (for fingerprinting / rolling-hash style dedup)."""
    idx = F.sequence(F.lit(1), F.length(text) - (k - 1))
    return F.when(
        F.length(text) >= k, F.transform(idx, lambda i: F.substring(text, i, k))
    ).otherwise(F.array().cast("array<string>"))


def md5_long(c: Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex digits of md5.

    Portable: DuckDB's ``CAST(CONCAT('0x', SUBSTR(MD5(x),1,15)) AS BIGINT)``
    produces the identical value, so oracles can replicate bucket joins.
    """
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def salted_min_hashes(shingle_arr: Column, n_hashes: int) -> list[Column]:
    """MinHash signature: for each salt j, min over shingles of
    ``md5(j || '|' || shingle)``.  String mins over hex digests — exact and
    portable (no engine-specific permutation hashing).
    """
    # NB: the hash lambda must take exactly ONE parameter — PySpark treats a
    # two-parameter lambda as (element, index), which would silently turn
    # the salt into the array index.
    def salted(j: int):
        prefix = F.lit(f"{j}|")
        return lambda x: F.md5(F.concat(prefix, x))

    return [
        F.array_min(F.transform(shingle_arr, salted(j))).alias(f"m{j}")
        for j in range(n_hashes)
    ]
