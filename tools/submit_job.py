"""Minimal cluster-style job for the spark-submit --py-files smoke test:
imports the engine ONLY from the shipped zip (no repo on sys.path),
runs the flagship tile+join+agg on 2k synthetic images, prints a row count.
"""

from __future__ import annotations

from pyspark import SparkConf


def main() -> int:
    # imports resolve from --py-files zip on the executors AND driver.
    # The job applies the ENGINE's session profile (plans/session.py) —
    # a bare SparkSession.builder leaves dynamic partition pruning on,
    # and DPP's alias-substitution planning walk is exponential through
    # the JVM H3 encode chain (documented in plans/session.py: observed
    # driver heap OOM even on a 2k-row smoke). Profile keys are applied
    # ONLY where the user did not pass --conf: Builder.config overrides
    # the submit conf, so blanket-applying the profile would silently
    # swallow cluster tuning flags (review finding).
    from pyspark.sql import SparkSession

    from hex2vec_spark.plans.session import profile_conf

    submit_conf = SparkConf()  # loaded from spark-submit's properties
    b = SparkSession.builder.appName("submit-smoke")
    for k, v in profile_conf().items():
        if not submit_conf.contains(k):
            b = b.config(k, v)
    spark = b.getOrCreate()
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
