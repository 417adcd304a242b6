"""SparkSession builder with the engine's config profile.

Scale posture (SURVEY.md §4): AQE on (runtime re-plan + skew-join +
partition coalescing), Arrow batches capped so decoded-pixel UDF batches
fit executor memory, shuffle partitions sized for local[32] testing but
overridable for cluster runs via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hex2vec-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 20_000,
    extra: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # one shuffle partition per core: AQE coalescing handles small
        # stages, and measured local runs lose ~25% on the aggregation
        # with 2x-core partitions (scheduling + final-stage overhead).
        # Cluster runs override via spark-submit --conf.
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)
    mem = os.environ.get("SPARK_GRAFT_MEM", "48g")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode: the JVM starts at getOrCreate, so driver memory set
        # here does apply; binary image columns push netty direct buffers
        # past the 1g default
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", "-XX:MaxDirectMemorySize=8g")
        # UTC pin: timestamp literals and date_format render in the
        # session zone; the DuckDB oracle prints raw stored values, so
        # any host TZ other than UTC would shift every rendered/compared
        # timestamp
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Dynamic partition pruning OFF: its planning rule
        # (PartitionPruning.trimAliases) substitutes alias trees through
        # Project stacks while merely EXAMINING join keys; through the
        # res+2-level JVM H3 encode chain (functions/h3_expr) that walk
        # is exponential (~6x/level — observed OOM at res 8; re-measured
        # round 3: a 4,000-row chain join with DPP on did not finish
        # optimizing in 180 s). Scoping the conf around chain-bearing
        # queries is NOT sound: optimization runs at ACTION time, after
        # any build-time set/restore, and Spark has no non-materializing
        # optimizer barrier (localCheckpoint would cache the 10^12-row
        # fact). DPP is inert for this engine's plan shapes anyway: the
        # big fact side is scanned in full and dimensions are broadcast;
        # table layouts prune STATICALLY via h3_p4 partition predicates
        # (sources/iceberg_lite.write_table + test_plans). Cluster jobs
        # joining runtime-filtered partitioned facts without the JVM
        # encode chain can re-enable via --conf or extra={...: "true"}.
        .config("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
        # headroom for the lateral-column-alias H3 encode chain
        # (functions/h3_expr): resolution peels one alias rank per
        # fixed-point iteration, ~2 ranks per aperture-7 level
        .config("spark.sql.analyzer.maxIterations", "300")
        # PySpark 4 captures a Python call-site string (inspect.stack
        # walk) on EVERY DataFrame/Column API call when this is on;
        # measured 0.5+ s of pure driver overhead per complex query's
        # plan construction. It only enriches error messages — off.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.maxResultSize", "4g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
