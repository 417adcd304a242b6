"""Streaming ingestion tests: availableNow over image drops, checkpoint
resume (new files only), streaming result == batch result."""

import os

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from hex2vec_spark.operators.agg import hex_features
from hex2vec_spark.operators.spatial import build_tiling, spatial_join
from hex2vec_spark.sources.synth import images_pandas, regions_pandas
from hex2vec_spark.streaming.ingest import run_available_now

RES = 7


def _write_chunk(spark, pdf: pd.DataFrame, path: str, name: str) -> None:
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(1).write.mode("append").parquet(path)


def test_stateful_dedup_exactly_once_across_restarts(spark, tmp_path):
    from hex2vec_spark.streaming.ingest import run_dedup_available_now

    inp = str(tmp_path / "drops")
    out = str(tmp_path / "uniq")
    ck = str(tmp_path / "ck")
    all_pdf = images_pandas(500)

    # drop 1
    _write_chunk(spark, all_pdf.iloc[:300], inp, "c1")
    run_dedup_available_now(spark, inp, out, ck)
    got1 = spark.read.parquet(out).toPandas()
    want1 = set(all_pdf.iloc[:300]["caption"])
    assert set(got1["key"]) == want1
    assert len(got1) == len(want1)  # each key exactly once

    # drop 2: new rows PLUS a replay of the first 100 (guaranteed
    # caption overlap); restart from checkpointed state
    drop2 = pd.concat([all_pdf.iloc[300:], all_pdf.iloc[:100]], ignore_index=True)
    _write_chunk(spark, drop2, inp, "c2")
    run_dedup_available_now(spark, inp, out, ck)
    got2 = spark.read.parquet(out).toPandas()
    assert set(got2["key"]) == set(all_pdf["caption"])
    # keys already seen in drop 1 were NOT re-emitted after the restart
    assert len(got2) == len(set(all_pdf["caption"]))
    assert len(want1 & set(drop2["caption"])) > 0


def test_available_now_resume_matches_batch(spark, tmp_path):
    tiling = build_tiling(regions_pandas(), res=RES)
    tiling_sdf = spark.createDataFrame(tiling)
    inp = str(tmp_path / "drops")
    out = str(tmp_path / "agg")
    ck = str(tmp_path / "ck")
    all_pdf = images_pandas(600)

    # drop 1: first 400 rows -> run
    _write_chunk(spark, all_pdf.iloc[:400], inp, "c1")
    run_available_now(spark, inp, out, ck, tiling_sdf, res=RES)
    n1 = spark.read.parquet(out).agg(F.sum("count")).first()[0]

    # drop 2: remaining rows -> resume from checkpoint
    _write_chunk(spark, all_pdf.iloc[400:], inp, "c2")
    run_available_now(spark, inp, out, ck, tiling_sdf, res=RES)
    stream_pdf = spark.read.parquet(out).toPandas()

    # batch reference over the full table
    batch = hex_features(
        spatial_join(spark.createDataFrame(all_pdf), tiling_sdf, res=RES), salted=False
    ).toPandas()
    merged = (
        stream_pdf.groupby(["h3", "feature"])["count"].sum().reset_index()
    )
    key = lambda d: sorted(map(tuple, d[["h3", "feature", "count"]].to_numpy()))
    assert key(merged) == key(batch)
    assert n1 is not None and n1 > 0
