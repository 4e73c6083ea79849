"""Scale probe: run the shuffle-heavy operator families at Nx the bench
scale and report the runtime ratio vs 1x.

The bench tables are small enough that fixed job overhead dominates; this
probe is the evidence that the PLANS scale — runtime should grow roughly
linearly with input for the LSH/dedup/text family (banded joins, map-side
combined aggs) rather than quadratically (all-pairs) or worse (driver
loops).  Data is synthesized by unioning the sf0.1 tables against
themselves with shifted ids, which preserves value distributions (and for
documents keeps duplicate families duplicated, so dedup has real work at
every scale).

Usage: python tools/scale_probe.py [N]   (default 8)
Writes one JSON line: {"probe": ..., "scale": N, "timings": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from magi_etl_spark.session import get_spark  # noqa: E402
from magi_etl_spark.tables import load_table  # noqa: E402


def replicate(df: DataFrame, id_cols: list[str], n: int, stride: int) -> DataFrame:
    """n shifted copies of ``df``: copy k adds ``k * stride`` to every id
    column, keeping join relationships intact within each copy."""
    copies = F.explode(F.array(*[F.lit(k) for k in range(n)])).alias("_k")
    rep = df.select("*", copies)
    for c in id_cols:
        rep = rep.withColumn(c, F.col(c) + F.col("_k").cast("long") * stride)
    return rep.drop("_k")


def timed(label: str, fn, timings: dict) -> None:
    t0 = time.perf_counter()
    fn().write.format("noop").mode("overwrite").save()
    timings[label] = round(time.perf_counter() - t0, 3)
    print(f"# {label}: {timings[label]:.3f}s", file=sys.stderr)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="magi-scale-probe")

    docs1 = load_table(spark, sf, "documents")
    events1 = load_table(spark, sf, "events")
    emb1 = load_table(spark, sf, "embeddings")
    docsN = replicate(docs1, ["doc_id"], n, 10_000_000).persist()
    eventsN = replicate(events1, ["event_id", "user_id"], n, 10_000_000).persist()
    embN = replicate(emb1, ["vec_id"], n, 10_000_000).persist()
    print(
        f"# docs {docs1.count()} -> {docsN.count()}, "
        f"events {events1.count()} -> {eventsN.count()}, "
        f"embeddings {emb1.count()} -> {embN.count()}",
        file=sys.stderr,
    )

    from magi_etl_spark.operators import dedup as D
    from magi_etl_spark.operators.components import connected_components
    from magi_etl_spark.operators.skew import key_skew_profile

    def lsh(d):
        return lambda: D.minhash_lsh_dedup(
            d, "doc_id", "text", n=3, n_hashes=4, band_size=2, threshold=0.5
        )

    def clusters(d):
        def run():
            pairs = D.minhash_lsh_dedup(
                d, "doc_id", "text", n=3, n_hashes=4, band_size=2, threshold=0.5
            ).select("doc_a", "doc_b")
            return connected_components(pairs)

        return run

    def funnel(e):
        def run():
            first = lambda t: F.min(  # noqa: E731
                F.when(F.col("event_type") == t, F.unix_micros("ts"))
            )
            stages = e.groupBy("user_id").agg(
                first("signup").alias("s"),
                first("click").alias("c"),
                first("purchase").alias("p"),
            )
            stage = (
                F.when(F.col("s").isNull(), 0)
                .when(F.col("c").isNull() | (F.col("c") <= F.col("s")), 1)
                .when(F.col("p").isNull() | (F.col("p") <= F.col("c")), 2)
                .otherwise(3)
            )
            return (
                stages.select(stage.alias("stage"))
                .groupBy("stage")
                .agg(F.count("*").alias("users"))
            )

        return run

    def skew(e):
        return lambda: key_skew_profile(e, ["user_id"], top_k=20)

    def emb_neardup(em):
        from magi_etl_spark.operators.similarity import (
            blocked_neardup_pairs,
            srp_lsh_buckets,
        )
        from magi_etl_spark.queries.similarity import _dedup_planes

        # replicated copies are exact duplicates of each other, so the
        # blocked pair space grows quadratically in n WITHIN each bucket —
        # the probe shows salting+blocking keeps even that contained
        def run():
            buckets = srp_lsh_buckets(em, seed_planes=_dedup_planes())
            blocked = em.join(buckets, "vec_id")
            return blocked_neardup_pairs(blocked, "bucket", threshold=0.95)

        return run

    timings: dict[str, float] = {}
    for label, d1, dn in (
        ("lsh_dedup", lsh(docs1), lsh(docsN)),
        ("dedup_clusters", clusters(docs1), clusters(docsN)),
        ("funnel", funnel(events1), funnel(eventsN)),
        ("skew_profile", skew(events1), skew(eventsN)),
        ("embedding_neardup", emb_neardup(emb1), emb_neardup(embN)),
    ):
        timed(f"{label}_x1", d1, timings)
        timed(f"{label}_x{n}", dn, timings)
        ratio = timings[f"{label}_x{n}"] / max(timings[f"{label}_x1"], 1e-9)
        timings[f"{label}_ratio"] = round(ratio, 2)
        print(f"# {label}: x{n} / x1 = {ratio:.2f}", file=sys.stderr)

    print(json.dumps({"probe": "scale", "scale": n, "timings": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
