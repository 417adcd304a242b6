"""Minimal cluster-style job for the spark-submit --py-files smoke test:
imports the engine ONLY from the shipped zip (no repo on sys.path),
runs the flagship tile+join+agg on 2k synthetic images, prints a row count.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def main() -> int:
    spark = SparkSession.builder.appName("submit-smoke").getOrCreate()
    # imports resolve from --py-files zip on the executors AND driver
    from hex2vec_spark.operators.agg import hex_features
    from hex2vec_spark.operators.spatial import build_tiling, spatial_join
    from hex2vec_spark.sources.synth import images_table, regions_pandas

    tiling = spark.createDataFrame(build_tiling(regions_pandas(), res=7))
    joined = spatial_join(images_table(spark, 2000), tiling, res=7)
    n = hex_features(joined).count()
    print(f"SUBMIT_SMOKE_ROWS={n}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
