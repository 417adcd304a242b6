"""distance_join at data scale: N uniform points in a ~550x750 km box,
self-joined at radius_m, at two parallelism levels (north_rule
two-cluster-size evidence for the round-4 geo join family).

Coordinates are a pure hash of the row id (NOT rand(), which depends on
the partition layout and would give each parallelism level different
data), and the point table is localCheckpointed once per JVM so the
timed job is the JOIN over identical materialized input — the 100 TB
shape, where the table comes off parquet, not out of a generator.

Run:  python BENCH/geojoin_bench.py [n_points] [radius_m]
Prints one JSON line; numbers quoted in BENCH/GEOJOIN.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from hex2vec_spark.plans.session import get_spark
from hex2vec_spark.operators.geo_join import distance_join

cpus = int(sys.argv[1]); n = int(sys.argv[2]); radius = float(sys.argv[3])
spark = get_spark("geojoin-bench", master=f"local[{{cpus}}]", shuffle_partitions=32)

def u(col, salt):                  # pure per-id uniform in [0,1)
    return (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000_007)).cast("double")
            / F.lit(1_000_000_007.0))

pts = (
    spark.range(n)
    .select(
        F.col("id"),
        (F.lit(45.0) + u(F.col("id"), 7) * 5.0).alias("lat"),
        (F.lit(10.0) + u(F.col("id"), 11) * 10.0).alias("lng"),
    )
    .localCheckpoint()             # materialize: time the JOIN, not the generator
)

def build():
    right = pts.select(
        F.col("id").alias("id2"), F.col("lat").alias("lat2"), F.col("lng").alias("lng2")
    )
    out = distance_join(pts, right, radius, right_lat_col="lat2", right_lng_col="lng2")
    return out.where(F.col("id") < F.col("id2"))

pairs = build().count()            # warmup (JIT + code cache)
best = None
for _ in range(3):
    t0 = time.time()
    build().count()
    el = time.time() - t0
    best = el if best is None else min(best, el)
print(json.dumps({{"cpus": cpus, "seconds": best, "pairs": pairs}}))
spark.stop()
"""


def run_level(cpus: int, n: int, radius: float) -> dict:
    code = RUNNER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n), str(radius)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    radius = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    res = {}
    for cpus in (8, 32):
        r = run_level(cpus, n, radius)
        r["points_per_sec"] = round(n / r["seconds"], 1)
        res[f"local[{cpus}]"] = r
        print(json.dumps(r), file=sys.stderr)
    eff = (res["local[8]"]["seconds"] / res["local[32]"]["seconds"]) / 4.0
    print(json.dumps({"n": n, "radius_m": radius, "levels": res, "efficiency_8_32": round(eff, 3)}))


if __name__ == "__main__":
    main()
