"""North_rule scaling-efficiency evidence: the same tile+join+agg job at
two parallelism levels (local[8] vs local[32] — the sandbox stand-in for
N vs 4N executors, per the driver instruction), identical input,
throughput at both + per-core-normalized efficiency.

efficiency = (T_8 / T_32) / 4   (>= 0.8 required)

Writes BENCH/BASELINE.md and prints a JSON line. Run:
  python BENCH/scaling.py [n_images]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from hex2vec_spark.plans.session import get_spark
from hex2vec_spark.operators.spatial import build_tiling
from hex2vec_spark.sources.synth import regions_pandas
import bench

cpus = int(sys.argv[1]); input_path = sys.argv[2]; res = int(sys.argv[3])
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(cpus * 2, 8))
tiling_sdf = spark.createDataFrame(build_tiling(regions_pandas(), res=res))
bench.run_flagship(spark, input_path, tiling_sdf, res)   # warmup
best = None
for _ in range(2):
    t0 = time.time()
    bench.run_flagship(spark, input_path, tiling_sdf, res)
    el = time.time() - t0
    best = el if best is None else min(best, el)
print(json.dumps({{"cpus": cpus, "seconds": best}}))
spark.stop()
"""


def main() -> int:
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("BENCH_N_IMAGES", "400000"))
    res = int(os.environ.get("BENCH_RES", "9"))
    tmp = tempfile.mkdtemp(prefix="hexscale_")
    input_path = os.path.join(tmp, "images")

    from hex2vec_spark.plans.session import get_spark
    import bench

    spark = get_spark("scaling-gen", master="local[32]")
    bench.build_flagship_input(spark, n_images, input_path)
    spark.stop()

    runner = RUNNER.format(repo=REPO)
    results = {}
    for cpus in (8, 32):  # fresh JVM per level so executors don't carry over
        out = subprocess.run(
            [sys.executable, "-c", runner, str(cpus), input_path, str(res)],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)["seconds"]

    t8, t32 = results[8], results[32]
    eff = (t8 / t32) / 4.0
    thr8, thr32 = n_images / t8, n_images / t32
    summary = {
        "n_images": n_images, "res": res,
        "local8_sec": round(t8, 2), "local32_sec": round(t32, 2),
        "throughput_8": round(thr8, 1), "throughput_32": round(thr32, 1),
        "scaling_efficiency": round(eff, 3), "target": 0.8,
    }
    print(json.dumps(summary))

    md = f"""# BENCH/BASELINE.md — measured engine numbers

Flagship job: scan {n_images:,} synthetic images (input_hint schema) ->
h3_encode(res {res}) Arrow UDF -> broadcast tiling join (10 regions,
res-{res} hex tiling) -> caption explode -> salted group-by -> noop sink.
Input parquet materialized up front; tiling built once (dimension).

North_rule two-cluster-size criterion, sandboxed per driver instruction
as the same job at two parallelism levels on identical input:

| config | wall s | images tiled+joined/sec |
| --- | --- | --- |
| local[8]  (N cores)  | {t8:.2f} | {thr8:,.0f} |
| local[32] (4N cores) | {t32:.2f} | {thr32:,.0f} |

**Scaling efficiency (T8/T32)/4 = {eff:.3f}** (target >= 0.8).

Caveats: single-JVM local mode shares one driver; numbers move with the
sandbox VM's memory behavior (first-touch page faults). Fresh JVM per
level; best of 2 timed passes after 1 warmup.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
