"""Aggregation operators: caption explode + salted group-by + pivot.

Reference: group_df_by_tag_values / group_city_tags (make_dataset.py:
143-172) — one-hot pivot + groupby('h3').sum(). At scale the engine
keeps the **narrow form** (h3, feature, count) (SURVEY.md §1.1: a
726-wide mostly-zero matrix is an anti-pattern at 10^12 rows) and
pivots only bounded vocabularies on demand.

Skew (north_rule "salted group-by with explicit skew handling"): hot
cells concentrate 20%+ of rows in a handful of (h3, feature) groups.
``salted_count`` runs a two-phase aggregation with an explicit salt so
the heavy groups are split across ``n_salt`` reducers before the final
(tiny) re-sum. Spark's partial aggregation already map-side-combines,
so salting matters when upstream stages leave hot keys co-partitioned —
the salted path is the scale-safe default and is asserted equal to the
plain path in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def explode_caption_tags(df: DataFrame, col: str = "caption") -> DataFrame:
    """Multi-value split -> explode -> trim (P3; load_data.py:42-44)."""
    return df.withColumn(
        "feature", F.explode(F.split(F.col(col), ";"))
    ).withColumn("feature", F.trim(F.col("feature"))).where(F.col("feature") != "")


def salted_count(
    df: DataFrame,
    keys: list[str],
    salt_src: str = "image_id",
    n_salt: int = 16,
    count_alias: str = "count",
) -> DataFrame:
    """Two-phase skew-safe count: groupBy(keys + salt) partial count,
    then groupBy(keys) final sum. Salt = hash of a high-cardinality
    column so hot groups split evenly."""
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt)).alias("_salt")
    partial = df.groupBy(*keys, salt).agg(F.count(F.lit(1)).alias("_partial"))
    return partial.groupBy(*keys).agg(F.sum("_partial").cast("double").alias(count_alias))


def plain_count(df: DataFrame, keys: list[str], count_alias: str = "count") -> DataFrame:
    return df.groupBy(*keys).agg(F.count(F.lit(1)).cast("double").alias(count_alias))


def hex_features(
    assignments: DataFrame, n_salt: int = 16, salted: bool = True
) -> DataFrame:
    """The A1/A2 aggregation: per-(h3, feature) counts over the spatial
    join output. Narrow-form equivalent of the reference's pivot +
    groupby('h3').sum() (make_dataset.py:143-172)."""
    tags = explode_caption_tags(assignments)
    fn = salted_count if salted else plain_count
    return fn(tags, ["h3", "feature"]) if salted else plain_count(tags, ["h3", "feature"])


def pivot_wide(features: DataFrame, vocab: list[str]) -> DataFrame:
    """Bounded-vocabulary pivot to the reference's wide matrix layout
    (missing columns back-filled with 0 — make_dataset.py:161-163)."""
    return (
        features.groupBy("h3")
        .pivot("feature", vocab)
        .agg(F.first("count"))
        .na.fill(0.0)
    )


def top_level_presence(assignments: DataFrame, cols: list[str]) -> DataFrame:
    """A3: per-hex presence counts of non-null top-level attributes
    (group_city_top_level_tags, make_dataset.py:174-190)."""
    aggs = [
        F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)).cast("double").alias(f"n_{c}")
        for c in cols
    ]
    return assignments.groupBy("h3").agg(*aggs)
