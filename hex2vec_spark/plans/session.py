"""SparkSession builder with the engine's config profile.

Scale posture (SURVEY.md §4): AQE on (runtime re-plan + skew-join +
partition coalescing), Arrow batches capped so decoded-pixel UDF batches
fit executor memory, shuffle partitions sized for local[32] testing but
overridable for cluster runs via spark-submit --conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def profile_conf(
    shuffle_partitions: int | None = None, arrow_batch: int = 20_000
) -> dict[str, str]:
    """The engine's config profile as a plain dict — get_spark applies
    all of it; spark-submit jobs (tools/submit_job.py) apply only the
    keys the user did NOT pass via --conf, so cluster tuning flags keep
    precedence (Builder.config would silently override them)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        # one shuffle partition per core: AQE coalescing handles small
        # stages, and measured local runs lose ~25% on the aggregation
        # with 2x-core partitions (scheduling + final-stage overhead).
        # Cluster runs override via spark-submit --conf (respected by
        # submit_job's missing-keys-only application).
        shuffle_partitions = max(int(cpus) if cpus.isdigit() else 32, 8)
    return {
        "spark.sql.session.timeZone": "UTC",
        # guide §6/§9: big sequential scans want large splits — the 25 GB
        # flagship input at the 128 MB default fragments into ~208 tasks
        # whose per-task footer/open cost dominates a 3-column read
        # (measured 0.27 s -> 0.16 s at 1g). Small tables keep full scan
        # parallelism via the files.minPartitionNum floor
        # (totalBytes/minPartitionNum caps the split size first).
        "spark.sql.files.maxPartitionBytes": "1g",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": str(arrow_batch),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.optimizer.dynamicPartitionPruning.enabled": "false",
        "spark.sql.analyzer.maxIterations": "300",
        "spark.python.sql.dataFrameDebugging.enabled": "false",
        "spark.driver.maxResultSize": "4g",
    }


def get_spark(
    app_name: str = "hex2vec-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 20_000,
    extra: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    mem = os.environ.get("SPARK_GRAFT_MEM", "48g")
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode: the JVM starts at getOrCreate, so driver memory set
        # here does apply; binary image columns push netty direct buffers
        # past the 1g default
        .config("spark.driver.memory", mem)
        .config("spark.driver.extraJavaOptions", "-XX:MaxDirectMemorySize=8g")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
    )
    # the shared profile (see profile_conf). Rationale for the two
    # non-obvious entries:
    # * UTC pin — timestamp literals and date_format render in the
    #   session zone; the DuckDB oracle prints raw stored values, so any
    #   host TZ other than UTC would shift every compared timestamp.
    # * Dynamic partition pruning OFF — its planning rule
    #   (PartitionPruning.trimAliases) substitutes alias trees through
    #   Project stacks while merely EXAMINING join keys; through the
    #   res+2-level JVM H3 encode chain (functions/h3_expr) that walk is
    #   exponential (~6x/level — observed OOM at res 8; re-measured
    #   round 3: a 4,000-row chain join with DPP on did not finish
    #   optimizing in 180 s). Scoping the conf around chain-bearing
    #   queries is NOT sound: optimization runs at ACTION time, after
    #   any build-time set/restore, and Spark has no non-materializing
    #   optimizer barrier (localCheckpoint would cache the 10^12-row
    #   fact). DPP is inert for this engine's plan shapes anyway: the
    #   big fact side is scanned in full and dimensions are broadcast;
    #   table layouts prune STATICALLY via h3_p4 partition predicates
    #   (sources/iceberg_lite.write_table + test_plans). Cluster jobs
    #   joining runtime-filtered partitioned facts without the JVM
    #   encode chain can re-enable via --conf or extra={...: "true"}.
    # Also: analyzer.maxIterations=300 gives the lateral-alias encode
    # chain headroom (~2 alias ranks per aperture-7 level), and
    # dataFrameDebugging off removes PySpark 4's per-API-call
    # inspect.stack walk (0.5+ s per complex plan construction).
    for k, v in profile_conf(shuffle_partitions, arrow_batch).items():
        b = b.config(k, v)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
