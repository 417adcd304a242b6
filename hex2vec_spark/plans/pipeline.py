"""End-to-end dataset-build pipeline — the engine's public equivalent of
the reference's driver notebook (entry point A, SURVEY.md §3.1:
make-dataset-multiple-cities.ipynb cells 5->15->18->21):

    download_whole_city      -> ingest (the images table already exists)
    add_h3_indices_to_city   -> stage 'assign': h3 encode + tiling join,
                                resumable per-bucket (iceberg_lite.run_stage)
    group_city_tags          -> stage 'features': explode + salted count
    group_cities             -> regions united in one table (region_id col)
    9.feather                -> versioned snapshot commit, partitioned by
                                h3 parent (iceberg_lite.commit_table)

plus the S7 read-back (load_processed_dataset, load_data.py:87-98):
region in/out filters, feature prefix selection; the all-zero row drop
is inherent to the narrow (h3, feature, count) form.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _tiling_parquet(spark: SparkSession, regions_pdf: pd.DataFrame, res: int, path: str) -> DataFrame:
    """Persist the tiling once under the dataset root (the reference
    caches the same artifact as GeoJSON, make_dataset.py:84-93); scanning
    parquet keeps the broadcast build JVM-only on every downstream job."""
    from ..operators.spatial import build_tiling_cached, write_tiling_parquet

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_tiling_parquet(build_tiling_cached(regions_pdf, res=res), path)
    return spark.read.parquet(path)


def build_dataset(
    spark: SparkSession,
    images: DataFrame,
    regions_pdf: pd.DataFrame,
    out_root: str,
    res: int = 9,
    n_buckets: int = 8,
    input_fingerprint: str = "",
    adaptive_salt: bool = False,
) -> dict:
    """Run the full build: tiling -> resumable spatial-join stage ->
    feature aggregation -> versioned snapshot commit. Returns the
    snapshot dict. Re-running with the same ``input_fingerprint`` skips
    completed join buckets (kill-and-resume semantics, SURVEY.md §5.5).

    Layout under ``out_root``:
      tiling/           res-R cell -> region dimension (parquet)
      assign/bucket=K   spatial-join output, per-bucket lineage manifest
      features/         (region_id, h3, feature, count) snapshots,
                        partitioned by h3_p4, time-travelable
    """
    from ..operators.agg import adaptive_salted_count, explode_caption_tags, salted_count
    from ..operators.spatial import spatial_join
    from ..sources.iceberg_lite import commit_table, read_stage, run_stage

    tiling_sdf = _tiling_parquet(spark, regions_pdf, res, os.path.join(out_root, "tiling"))

    def assign(batch: DataFrame) -> DataFrame:
        return spatial_join(batch, tiling_sdf, res=res).select(
            "image_id", "caption", "h3", "region_id"
        )

    assign_path = os.path.join(out_root, "assign")
    manifest = run_stage(
        spark, images, assign_path, assign,
        bucket_col="image_id", n_buckets=n_buckets,
        input_fingerprint=input_fingerprint,
    )

    tags = explode_caption_tags(read_stage(spark, assign_path))
    keys = ["region_id", "h3", "feature"]
    feats = (
        adaptive_salted_count(tags, keys, salt_src="image_id")
        if adaptive_salt
        else salted_count(tags, keys)
    )
    snap = commit_table(
        feats, os.path.join(out_root, "features"), mode="overwrite",
        partition_res=max(res - 5, 0),
        snapshot_extra={"stage_manifest_buckets": len(manifest["buckets"]), "res": res},
    )
    return snap


def build_neighbor_dataset(
    spark: SparkSession,
    out_root: str,
    k: int = 1,
    k_excl: int = 2,
    n_negatives: int = 4,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Entry point B (SURVEY.md §3.2, cluster-word2vec.ipynb cells 5->19):
    read the committed features table -> distinct cell corpus -> k-ring
    context pairs (J5) + k_ring(k_excl)-excluded negative samples (J6),
    returned as one (input_h3, context_h3, neg_h3s) training table.
    Deterministic: negatives come from seeded hash ordering."""
    from ..operators.neighbors import context_pairs, sample_negatives

    corpus = load_processed(spark, out_root, snapshot_id=snapshot_id).select("h3").distinct()
    corpus = corpus.localCheckpoint(eager=False)  # two consumers below
    pairs = context_pairs(corpus, k=k)
    negs = (
        sample_negatives(corpus, n_per_input=n_negatives, k_excl=k_excl)
        .groupBy("input_h3")
        .agg(F.sort_array(F.collect_list("neg_h3")).alias("neg_h3s"))
    )
    return pairs.join(negs, "input_h3", "left")


def load_processed(
    spark: SparkSession,
    out_root: str,
    snapshot_id: int | None = None,
    select_regions: list[str] | None = None,
    drop_regions: list[str] | None = None,
    feature_prefixes: list[str] | None = None,
) -> DataFrame:
    """S7 read-back (load_processed_dataset, load_data.py:87-98): region
    membership in/out filters (P5) and feature-prefix selection (P6) over
    the committed features table; predicates push into the parquet scan."""
    from ..sources.iceberg_lite import read_table

    df = read_table(spark, os.path.join(out_root, "features"), snapshot_id=snapshot_id)
    if select_regions:
        df = df.where(F.col("region_id").isin(select_regions))
    if drop_regions:
        df = df.where(~F.col("region_id").isin(drop_regions))
    if feature_prefixes:
        cond = None
        for p in feature_prefixes:
            c = F.col("feature").startswith(p)
            cond = c if cond is None else (cond | c)
        df = df.where(cond)
    return df
