"""K-ring neighbor operators: context pairs (J5) + negative exclusion (J6).

Reference: H3NeighborDataset (h3_neighbor_dataset.py:21-43) iterates rows
and intersects k_ring sets with the corpus index. Re-expressed as one
DataFrame program: explode k_ring(h3, k) -> equi self-join on cell id.
One shuffle; k_ring is pure arithmetic inside an Arrow UDF
(SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.h3_fns import h3_kring_udf


def context_pairs(
    corpus: DataFrame, h3_col: str = "h3", k: int = 1, materialize: bool = True
) -> DataFrame:
    """(input_h3, context_h3) for every k_ring(k) neighbor present in the
    corpus, input itself excluded (h3_neighbor_dataset.py:21-26).

    ``corpus`` must have one row per distinct cell (the reference's
    processed-matrix index). Self-join keys are near-unique so there is
    no key skew; AQE handles residual partition imbalance. ``materialize``
    localCheckpoints the distinct cell set once — the self-join would
    otherwise recompute the corpus lineage (often a Python-UDF encode)
    on both sides.
    """
    cells = corpus.select(F.col(h3_col).alias("input_h3")).distinct()
    if materialize:
        cells = cells.localCheckpoint(eager=False)
    exploded = cells.select(
        "input_h3",
        F.explode(h3_kring_udf(k=k, include_self=False)(F.col("input_h3"))).alias("context_h3"),
    )
    present = cells.select(F.col("input_h3").alias("context_h3"))
    return exploded.join(present, "context_h3", "inner").select("input_h3", "context_h3")


def negative_exclusion(corpus: DataFrame, h3_col: str = "h3", k_excl: int = 2) -> DataFrame:
    """Candidate negatives per input cell: corpus cells NOT within
    k_ring(k_excl) of the input (h3_neighbor_dataset.py:28-34,61-66).

    Returned as the exclusion pair set (input_h3, excluded_h3); callers
    anti-join their candidate samples against it — materializing the full
    complement (n^2) is intentionally avoided."""
    cells = corpus.select(F.col(h3_col).alias("input_h3")).distinct()
    excl = cells.select(
        "input_h3",
        F.explode(h3_kring_udf(k=k_excl, include_self=True)(F.col("input_h3"))).alias(
            "excluded_h3"
        ),
    )
    present = corpus.select(F.col(h3_col).alias("excluded_h3")).distinct()
    return excl.join(present, "excluded_h3", "inner").select("input_h3", "excluded_h3")


def sample_negatives(
    corpus: DataFrame,
    n_per_input: int = 4,
    k_excl: int = 2,
    h3_col: str = "h3",
    seed: int = 42,
    pool_cap: int = 4096,
    materialize: bool = True,
) -> DataFrame:
    """Deterministic negative sampling: cross candidate pool anti-joined
    against the k_ring(k_excl) exclusion set, then top-n per input by a
    seeded hash key (rejection sampling re-expressed as anti-join +
    window; h3_neighbor_dataset.py:48-66).

    The candidate pool is a seeded pseudo-random subset of at most
    ``pool_cap`` corpus cells (bounds the broadcast crossJoin; negatives
    are drawn from that subset, not the full corpus). Selected by hash
    ORDER — an unordered limit() would be partition-order-dependent and
    break run-to-run determinism."""
    from pyspark.sql import Window

    cells = corpus.select(F.col(h3_col).alias("input_h3")).distinct()
    if materialize:
        cells = cells.localCheckpoint(eager=False)
    pool = (
        cells.select(F.col("input_h3").alias("neg_h3"))
        .orderBy(F.xxhash64(F.col("neg_h3"), F.lit(seed)), F.col("neg_h3"))
        .limit(pool_cap)
    )
    cand = (
        cells.crossJoin(F.broadcast(pool))
        .withColumn("_r", F.xxhash64(F.col("input_h3"), F.col("neg_h3"), F.lit(seed)))
    )
    excl = negative_exclusion(
        cells.select(F.col("input_h3").alias(h3_col)), h3_col, k_excl
    ).withColumnRenamed("excluded_h3", "neg_h3")
    w = Window.partitionBy("input_h3").orderBy("_r")
    return (
        cand.join(excl, ["input_h3", "neg_h3"], "left_anti")
        .withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= n_per_input)
        .select("input_h3", "neg_h3")
    )
