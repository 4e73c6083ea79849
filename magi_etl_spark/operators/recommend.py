"""TaxonomyRelationships recommendation engine, Spark-first (reference
``dash_app/tasks.py:105-563``).

The reference builds per-field scipy sparse matrices (vocabulary
``{col}:{value}``, cell = confidence, L2 row-normalized, weighted, then
hstacked) and a full cosine-similarity matrix (``build_feature_matrix`` /
``calculate_similarity``, ``tasks.py:384-464``).  Here the same math is a
sparse dot-product join — (id, feature, value) triples self-joined on
feature — which is how it survives 100 TB: no dense matrix, no driver
memory, shuffle keyed on the shared-feature axis, frequency-pruned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def taxonomy_features(
    df: DataFrame, id_col: str, field_weights: dict[str, float]
) -> DataFrame:
    """(id, feature, value) triples from array<struct<confidence,value>>
    columns.

    Per reference semantics: feature name = ``{col}:{value}``; cell value =
    confidence (duplicate (id, feature) entries collapse via max — the
    lil_matrix's last-write is order-dependent, max is the deterministic
    reading); each field L2-normalized per row, then scaled by the field's
    weight (``tasks.py:414-449``).
    """
    parts = []
    for col, weight in field_weights.items():
        exploded = (
            df.select(F.col(id_col).alias("id"), F.explode(col).alias("e"))
            .select(
                "id",
                F.concat(F.lit(f"{col}:"), F.col("e.value")).alias("feature"),
                F.col("e.confidence").alias("conf"),
            )
            .groupBy("id", "feature")
            .agg(F.max("conf").alias("conf"))
        )
        norm = W.partitionBy("id")
        normalized = exploded.withColumn(
            "value",
            F.lit(float(weight))
            * F.col("conf")
            / F.sqrt(F.sum(F.col("conf") * F.col("conf")).over(norm)),
        ).select("id", "feature", "value")
        parts.append(normalized)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cosine_similarity_pairs(
    features: DataFrame,
    min_similarity: float = 0.0,
    max_feature_doc_freq: int | float | None = None,
) -> DataFrame:
    """Pairwise cosine similarity over sparse feature triples.

    sim(a,b) = Σ_f a_f·b_f / (‖a‖·‖b‖), computed as a feature-keyed
    self-join + sum — sparse matrix product, never a dense cross join.

    ``max_feature_doc_freq`` drops stop-features before the join and is
    the REQUIRED scale lever for large corpora: the join's intermediate
    size is Σ_f df(f)², so a single popular feature dominates cost
    quadratically.  An ``int`` is an absolute document-frequency cap; a
    ``float`` in (0, 1) is a fraction of the corpus (portable across
    scale factors — prefer it).  Norms are recomputed over the kept
    features, so the result is exact cosine in the pruned subspace
    (classic stop-word removal).  Pass ``None`` only for small,
    bounded inputs. Emits both (a,b) and (b,a) like the reference's
    full matrix.
    """
    feats = features
    if max_feature_doc_freq is not None:
        dfreq = feats.groupBy("feature").agg(F.count("*").alias("df"))
        if isinstance(max_feature_doc_freq, float) and max_feature_doc_freq < 1.0:
            ndocs = feats.agg(F.countDistinct("id").alias("_nd"))
            rare = (
                dfreq.crossJoin(F.broadcast(ndocs))
                .where(F.col("df") <= F.col("_nd") * F.lit(max_feature_doc_freq))
                .select("feature")
            )
        else:
            rare = dfreq.where(F.col("df") <= int(max_feature_doc_freq)).select(
                "feature"
            )
        feats = feats.join(rare, "feature")
    norms = feats.groupBy("id").agg(
        F.sqrt(F.sum(F.col("value") * F.col("value"))).alias("norm")
    )
    a = feats.select(F.col("id").alias("id_a"), "feature", F.col("value").alias("va"))
    b = feats.select(F.col("id").alias("id_b"), "feature", F.col("value").alias("vb"))
    dots = (
        a.join(b, "feature")
        .where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("id").alias("id_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("id").alias("id_b"), F.col("norm").alias("norm_b"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("dot") / (F.col("norm_a") * F.col("norm_b"))).alias("similarity"),
        )
        .where(F.col("similarity") >= F.lit(min_similarity))
    )


def similar_content(
    sims: DataFrame,
    traffic: DataFrame,
    query_ids: DataFrame,
    n: int = 10,
    alpha: float = 0.7,
) -> DataFrame:
    """Blended recommendation scoring (reference ``get_similar_content``,
    ``tasks.py:480-538``): score = alpha·sim + (1-alpha)·minmax(users);
    self excluded (already), zero-traffic candidates dropped, top-n per
    query id.  All query ids score in ONE join pass (the reference loops
    driver-side per id, ``tasks.py:540-563``)."""
    stats = traffic.agg(
        F.min("users").alias("mn"), F.max("users").alias("mx")
    )
    pop = traffic.crossJoin(F.broadcast(stats)).select(
        F.col("id").alias("id_b"),
        F.col("users").alias("users_b"),
        F.when(F.col("mx") == F.col("mn"), F.lit(0.0))
        .otherwise((F.col("users") - F.col("mn")) / (F.col("mx") - F.col("mn")))
        .alias("popularity"),
    )
    scored = (
        sims.join(query_ids.select(F.col("id").alias("id_a")), "id_a", "left_semi")
        .join(pop, "id_b")
        .where(F.col("users_b") > 0)
        .withColumn(
            "combined_score",
            F.lit(alpha) * F.col("similarity") + F.lit(1.0 - alpha) * F.col("popularity"),
        )
    )
    w = W.partitionBy("id_a").orderBy(
        F.desc("combined_score"), F.desc("users_b"), F.asc("id_b")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= n)
        .select("id_a", "id_b", "similarity", "popularity", "combined_score", "rn")
    )


def scale_and_cluster(
    traffic: DataFrame,
    feature_cols: list[str],
    k: int = 3,
    seed: int = 42,
) -> tuple[DataFrame, float]:
    """StandardScaler(withMean=False) + KMeans + silhouette (reference
    ``apply_scaler``/``create_clusters``, ``tasks.py:466-478``) via
    pyspark.ml — the distributed counterpart of the sklearn calls."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    assembled = VectorAssembler(inputCols=feature_cols, outputCol="_raw").transform(
        traffic
    )
    scaler = StandardScaler(
        inputCol="_raw", outputCol="features", withMean=False, withStd=True
    ).fit(assembled)
    scaled = scaler.transform(assembled)
    model = KMeans(k=k, seed=seed, featuresCol="features", predictionCol="cluster").fit(
        scaled
    )
    clustered = model.transform(scaled).drop("_raw", "features")
    silhouette = ClusteringEvaluator(
        featuresCol="features", predictionCol="cluster", metricName="silhouette"
    ).evaluate(model.transform(scaled))
    return clustered, silhouette
