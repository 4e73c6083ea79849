"""Random-projection (Johnson-Lindenstrauss) dimensionality reduction
for embedding columns.

Sign random projections preserve pairwise distances within (1 ± eps)
with output dimension O(log n / eps^2) (Achlioptas 2003's database-
friendly ±1 projections), and are the standard pre-step that makes
downstream ANN / clustering cheap: a 64-dim float corpus projected to 8
dims is an 8x I/O and compute cut for every later pass.  The repo's
SRP-LSH (operators/similarity.py) keeps only the SIGN of each
projection; this operator keeps the VALUE, so the output is still a
metric embedding.

Determinism: the projection matrix is never materialized — entry
(j, i) is derived from md5("<salt>|j|i"), the repo-standard portable
draw, so the identical matrix is reproducible in any engine (the DuckDB
oracle rebuilds it with a list comprehension).  The fold over
dimensions is an ordered left fold both here (``F.aggregate``) and in
the oracle (``list_dot_product``), so the float arithmetic matches
bit-for-bit at matching element order.

Scale shape: pure map — one narrow projection per row, no shuffle, no
state.  ``out_dim * dim`` md5 calls per row are JVM-side codegen;
for very wide inputs precompute the sign matrix once and broadcast it
(the md5 inputs don't depend on the row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EVEN_HEX = ("0", "2", "4", "6", "8", "a", "c", "e")


def _sign(salt: str, j: int, i: Column) -> Column:
    """±1 from the first hex digit of md5("salt|j|i") — +1 on even
    digits, so exactly half the hash space each way."""
    digit = F.substring(
        F.md5(F.concat(F.lit(f"{salt}|{j}|"), i.cast("string"))), 1, 1
    )
    return F.when(digit.isin(*_EVEN_HEX), F.lit(1.0)).otherwise(F.lit(-1.0))


def random_projection(
    df: DataFrame,
    vec_col: str = "embedding",
    out_dim: int = 8,
    salt: str = "rp",
    scale: bool = True,
    decimals: int = 3,
) -> DataFrame:
    """Append ``p0 .. p{out_dim-1}`` double columns: signed random
    projections of ``vec_col``, each rounded to ``decimals``.

    With ``scale`` the projections are divided by sqrt(out_dim), making
    E[||p||^2] = ||v||^2 (the JL-normalized form).
    """
    vec = F.col(vec_col).cast("array<double>")
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    out = df
    norm = float(out_dim) ** 0.5 if scale else 1.0

    def signs_for(j: int):
        # NB: a single-parameter callable — pyspark dispatches on lambda
        # arity, so `lambda i, j=j: ...` would receive the ARRAY INDEX
        # as its second argument and silently clobber j
        def one(i: Column) -> Column:
            return _sign(salt, j, i)

        return F.transform(idx, one)

    for j in range(out_dim):
        prods = F.zip_with(vec, signs_for(j), lambda x, s: x * s)
        acc = F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)
        # + 0.0 canonicalizes IEEE -0.0 so hashed comparisons are stable
        out = out.withColumn(
            f"p{j}", F.round(acc / F.lit(norm), decimals) + F.lit(0.0)
        )
    return out


def projection_sign_list_sql(salt: str, j: int, dim: int) -> str:
    """The DuckDB expression rebuilding projection row ``j`` — kept next
    to the Spark implementation so the two derivations can't drift."""
    return (
        "[CAST(CASE WHEN substr(md5('"
        + f"{salt}|{j}|"
        + "' || CAST(i AS VARCHAR)), 1, 1) IN "
        + "('0','2','4','6','8','a','c','e') THEN 1.0 ELSE -1.0 END AS DOUBLE) "
        + f"for i in range({dim})]"
    )
