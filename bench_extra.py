"""Round-6 optimization measurement harness (guide §1: measure first).

NOT the driver bench — bench.py is frozen. This tool isolates each
headline query with the noop sink, splits plan-construction time from
execution time, and dumps .explain("formatted") for every query to
plans/r06/<query>_<tag>.txt.

Usage:
  python bench_extra.py [--sf-dir DIR] [--tag before|after] [--queries a,b,c]
  python bench_extra.py --flagship          # flagship phase breakdown
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary", "explode_trim", "group_pivot", "salted_agg",
    "topk", "per_group_topk", "self_join", "knn_bruteforce",
    "dedup_exact", "hex_features", "context_pairs", "tile_hex_bins",
    "polygon_assign", "distance_pairs", "knn_join_pairs", "path_length",
    "distance_pairs_broadcast", "pip_join_holes",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--tag", default=None, help="if set, dump plans to plans/r06/<q>_<tag>.txt")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--flagship", action="store_true")
    args = ap.parse_args()

    from hex2vec_spark.plans.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # same session shape as bench.py (shuffle_partitions=8) so numbers compare
    spark = get_spark("bench-extra", master=f"local[{cpus}]", shuffle_partitions=8)
    import __spark_entry__ as entrymod

    if args.flagship:
        from bench import cached_flagship_input, materialize_tiling, run_flagship

        n_images = int(os.environ.get("BENCH_N_IMAGES", "6000000"))
        res = int(os.environ.get("BENCH_RES", "9"))
        input_path, gen_s = cached_flagship_input(spark, n_images)
        tiling_sdf, tiling_s = materialize_tiling(spark, res)
        run_flagship(spark, input_path, tiling_sdf, res)
        run_flagship(spark, input_path, tiling_sdf, res)
        passes = []
        for _ in range(args.passes):
            t0 = time.time()
            run_flagship(spark, input_path, tiling_sdf, res)
            passes.append(round(time.time() - t0, 3))
        print(json.dumps({"flagship_passes": passes, "gen": round(gen_s, 3), "tiling": round(tiling_s, 3)}))
        spark.stop()
        return 0

    qs = entrymod.queries()
    names = args.queries.split(",") if args.queries else HEADLINE
    plandir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plandir, exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        builds, execs = [], []
        for i in range(args.passes):
            t0 = time.time()
            df = qs[name](spark, args.sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
            if i == 0 and args.tag:
                try:
                    plan = df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    )
                    with open(os.path.join(plandir, f"{name}_{args.tag}.txt"), "w") as f:
                        f.write(plan)
                except Exception as e:  # pragma: no cover
                    print(f"plan dump failed for {name}: {e}", file=sys.stderr)
        out[name] = {
            "build": builds, "exec": execs,
            "total_min": round(min(b + e for b, e in zip(builds, execs)), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"summary": {k: v["total_min"] for k, v in out.items()}}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
