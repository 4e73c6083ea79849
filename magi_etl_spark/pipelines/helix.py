"""Helix — the reference's interactive events⟗taxonomy analysis surface
(base query ``dash_app/dash_app.py:426-534``), Spark-first.

``helix_dataset`` builds the flat joined relation: taxonomy arrays
confidence-filtered at the configured threshold (site- or page-level
granularity per attribute), lower-cased value projections with
``main_*`` first-element picks, events filtered to brand/platform and the
selected month, dimension + country-map broadcast joins.

``helix_metric_dataset`` wraps it as a MetricDataset so the generic
``metric_query`` engine (dims/metrics/filter trees) runs on it — the
composition the reference reaches via SQL-string assembly.

Documented intent-deviations (SURVEY.md §7.4):
- franchises: the reference's ``zip(array[1], array[site_all_franchises])``
  is type-broken Presto; the evident intent — every franchise at
  confidence 1.0 — is implemented.
- join keys: raw ``cast(double AS varchar)`` can never equal the
  taxonomy's integer-string ids; keys are floor-normalized
  (``cast(cast(floor(wiki_id) as bigint) as varchar)``, the chain the
  reference itself uses in its select list) on every join.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from magi_etl_spark.functions.strings import split_part
from magi_etl_spark.metrics import AttributeSpec, MetricDataset, MetricSpec

TAX_ATTRS = ("vertical", "genre", "subgenre", "theme", "franchise")


@dataclass
class HelixConfig:
    year: str
    month: str
    confidence: float = 0.6
    # per-attribute site|page granularity (dash_app/dash_app.py:415-421)
    granularity: dict[str, str] = field(
        default_factory=lambda: {a: "site" for a in ("vertical", "genre", "subgenre", "theme")}
    )
    brand: str = "acme"
    platform: str = "Web"
    user_id_col: str = "analytics_id"


def _norm_key(c: Column) -> Column:
    """``cast(cast(floor(x) as bigint) as varchar)`` float-pollution guard
    (reference ``dash_app/dash_app.py:511``)."""
    return F.floor(c).cast("bigint").cast("string")


def helix_dataset(
    events: DataFrame,
    taxonomy: DataFrame,
    dim_wikis: DataFrame,
    country_map: DataFrame,
    cfg: HelixConfig,
) -> DataFrame:
    conf = F.lit(float(cfg.confidence))

    def filtered(attr: str) -> Column:
        if attr == "franchise":
            src = F.transform(
                F.col("site_all_franchises"),
                lambda v: F.struct(F.lit(1.0).alias("confidence"), v.alias("value")),
            )
        else:
            gran = cfg.granularity.get(attr, "site")
            src = F.col(f"{gran}_all_{attr}s")
        return F.filter(src, lambda x: x["confidence"] >= conf)

    tax_cols = [
        F.col("content_ids").getItem("article_id").alias("article_id"),
        F.col("content_ids").getItem("wiki_id").alias("tax_wiki_id"),
    ]
    for attr in TAX_ATTRS:
        f = filtered(attr)
        vals = F.transform(f, lambda x: F.lower(x["value"]))
        cons = F.transform(f, lambda x: x["confidence"])
        tax_cols += [
            vals.alias(f"all_{attr}s"),
            cons.alias(f"all_{attr}s_con"),
            F.when(F.size(f) > 0, F.try_element_at(vals, F.lit(1))).alias(f"main_{attr}"),
        ]
    tax = taxonomy.select(*tax_cols)

    amp = events.where(
        (F.col("brand") == cfg.brand) & (F.col("platform") == cfg.platform)
    ).select(
        "year", "month", "wiki_id", "content_id", "page_url", "pageviews",
        "country", F.col(cfg.user_id_col).alias("amplitude_id"),
        _norm_key(F.col("wiki_id")).alias("j_wiki"),
        F.col("content_id").cast("string").alias("j_article"),
    )

    joined = amp.join(
        tax,
        (amp.j_wiki == tax.tax_wiki_id) & (amp.j_article == tax.article_id.cast("string")),
        "full",
    )

    dim = dim_wikis.select(
        _norm_key(F.col("wiki_id")).alias("d_wiki"), "vertical_name"
    )
    cmap = country_map.select(
        "amplitude_country", "acme_country", "acme_sales_region",
        "sales_insights_subcontinent",
    )
    out = (
        joined.join(F.broadcast(dim), joined.j_wiki == dim.d_wiki, "left")
        .join(
            F.broadcast(cmap),
            joined.country.cast("string") == cmap.amplitude_country.cast("string"),
            "left",
        )
        .where(
            (F.col("year") == cfg.year) & (F.col("month") == cfg.month)
        )
    )
    keep = ["year", "month"]
    for attr in TAX_ATTRS:
        keep += [f"all_{attr}s", f"all_{attr}s_con", f"main_{attr}"]
    return out.select(
        *keep,
        "pageviews",
        "amplitude_id",
        F.col("content_id").alias("article_id"),
        _norm_key(F.col("wiki_id")).alias("wiki_id"),
        "page_url",
        F.lower(split_part(split_part(F.col("page_url"), "://", 2), "/", 1)).alias("wiki"),
        F.lower(F.col("vertical_name")).alias("vertical"),
        F.concat(F.col("wiki_id").cast("string"), F.lit("-"), F.col("content_id")).alias(
            "wiki_article_id"
        ),
        F.lower(F.col("acme_country")).alias("country"),
        F.lower(F.col("acme_sales_region")).alias("region"),
        F.lower(F.col("sales_insights_subcontinent")).alias("subcontinent"),
    )


def helix_metric_dataset(
    events: DataFrame,
    taxonomy: DataFrame,
    dim_wikis: DataFrame,
    country_map: DataFrame,
    cfg: HelixConfig,
) -> MetricDataset:
    """The Helix relation as a MetricDataset: unnest attributes over the
    confidence-filtered taxonomy arrays, the reference's three metrics
    (``metric_info``, ``dash_app/dash_app.py:384-409``)."""
    base = helix_dataset(events, taxonomy, dim_wikis, country_map, cfg)
    attrs: dict[str, AttributeSpec] = {}
    for attr in TAX_ATTRS:
        attrs[attr] = AttributeSpec(attr, lambda a=attr: F.col(f"all_{a}s"), unnest=True)
        attrs[f"main_{attr}"] = AttributeSpec(
            f"main_{attr}", lambda a=attr: F.col(f"main_{a}")
        )
    for scalar in ("wiki", "vertical", "country", "region", "subcontinent", "wiki_id"):
        attrs[scalar] = AttributeSpec(scalar, lambda s=scalar: F.col(s))
    metrics = {
        "users": MetricSpec("users", lambda: F.countDistinct("amplitude_id")),
        "pageviews": MetricSpec("pageviews", lambda: F.sum("pageviews")),
        "page_count": MetricSpec(
            "page_count", lambda: F.countDistinct("wiki_article_id")
        ),
    }
    return MetricDataset(
        name="helix", load=lambda spark, sf_dir: base, attributes=attrs, metrics=metrics
    )
