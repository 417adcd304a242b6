"""Pre-clustering normalization operators.

Reference: src/models/clustering.py:20-35 — TfidfEmbedder
(sklearn TfidfTransformer: smooth idf ln((1+N)/(1+df))+1, L2 row norm)
and NormalizingEmbedder (StandardScaler / MinMaxScaler) run over the
collected wide matrix before KMeans (cluster-word2vec.ipynb cell 28).

Spark-first shape: the engine keeps features NARROW — (key, feature,
value) — so every normalization is a two-pass aggregate: per-feature
(or per-key) stats via groupBy, joined back onto the fact rows. Stats
tables carry one row per distinct feature; Spark's size statistics
pick broadcast for the dimension-like cases (no forced hint — feature
cardinality is unbounded for free-text tokens). Everything is pure JVM
expressions — whole-stage codegen, SQL-expressible, DuckDB-oracled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def tfidf(
    df: DataFrame,
    key_col: str = "h3",
    feature_col: str = "feature",
    value_col: str = "cnt",
    l2_normalize: bool = True,
) -> DataFrame:
    """Narrow tf-idf with sklearn TfidfTransformer semantics:
    idf = ln((1 + N) / (1 + df)) + 1 (smooth), tfidf = value * idf,
    then per-key L2 normalization. N = distinct keys (documents),
    df = distinct keys containing the feature."""
    n_docs = df.select(F.countDistinct(key_col).alias("_n_docs"))
    feat_df = df.groupBy(feature_col).agg(
        F.countDistinct(key_col).alias("_df")
    )
    # NO broadcast hint on the per-feature stats tables anywhere in this
    # module: they are FEATURE-CARDINALITY-sized (one row per distinct
    # feature — unbounded when features are free-text tokens), so the
    # join strategy is left to Spark's size statistics, which still
    # broadcasts the small dimension-like cases automatically (round-2
    # review; a forced broadcast OOMs at large vocabularies)
    out = (
        df.join(feat_df, feature_col)
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col(value_col)
            * (
                F.log((F.lit(1.0) + F.col("_n_docs")) / (F.lit(1.0) + F.col("_df")))
                + F.lit(1.0)
            ),
        )
        .drop("_df", "_n_docs")
    )
    if l2_normalize:
        w = Window.partitionBy(key_col)
        out = out.withColumn(
            "tfidf", F.col("tfidf") / F.sqrt(F.sum(F.col("tfidf") ** 2).over(w))
        )
    return out


def standardize(
    df: DataFrame,
    feature_col: str = "feature",
    value_col: str = "cnt",
) -> DataFrame:
    """Per-feature z-score with sklearn StandardScaler semantics:
    (x - mean) / std, POPULATION std (ddof=0), and a zero-variance
    feature divides by 1 (sklearn's scale_ fallback) rather than NaN."""
    stats = df.groupBy(feature_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_pop(value_col).alias("_sd"),
    )
    return (
        df.join(stats, feature_col)  # no broadcast hint: see tfidf note
        .withColumn(
            "z",
            (F.col(value_col) - F.col("_mu"))
            / F.when(F.col("_sd") > 0, F.col("_sd")).otherwise(F.lit(1.0)),
        )
        .drop("_mu", "_sd")
    )


def minmax_scale(
    df: DataFrame,
    feature_col: str = "feature",
    value_col: str = "cnt",
) -> DataFrame:
    """Per-feature min-max to [0, 1] (sklearn MinMaxScaler): a
    zero-range feature maps to 0 (x - min == 0, scale falls back to 1)."""
    stats = df.groupBy(feature_col).agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    rng = F.col("_hi") - F.col("_lo")
    return (
        df.join(stats, feature_col)  # no broadcast hint: see tfidf note
        .withColumn(
            "scaled",
            (F.col(value_col) - F.col("_lo"))
            / F.when(rng > 0, rng).otherwise(F.lit(1.0)),
        )
        .drop("_lo", "_hi")
    )
