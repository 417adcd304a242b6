"""distance_join broadcast_right at data scale: N fact points x M sites
radius join, shuffle path vs broadcast path (round-5 variant). The fact
table is localCheckpointed once so both timed jobs consume identical
materialized input; counts are asserted equal.

Run:  python BENCH/broadcast_bench.py [n_points] [n_sites] [radius_m]
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

cpus = int(sys.argv[1]); n = int(sys.argv[2]); m = int(sys.argv[3]); radius = float(sys.argv[4])
spark = get_spark("bc-bench", master=f"local[{{cpus}}]", shuffle_partitions=32)

def u(col, salt):
    return (F.pmod(F.xxhash64(col, F.lit(salt)), F.lit(1_000_000_007)).cast("double")
            / F.lit(1_000_000_007.0))

pts = (
    spark.range(n)
    .select(
        F.col("id"),
        (F.lit(45.0) + u(F.col("id"), 7) * 5.0).alias("lat"),
        (F.lit(10.0) + u(F.col("id"), 11) * 10.0).alias("lng"),
    )
    .localCheckpoint()
)
sites = (
    spark.range(m)
    .select(
        F.col("id").alias("site_id"),
        (F.lit(45.0) + u(F.col("id"), 13) * 5.0).alias("slat"),
        (F.lit(10.0) + u(F.col("id"), 17) * 10.0).alias("slng"),
    )
    .localCheckpoint()
)

def build(bc):
    return distance_join(
        pts, sites, radius, right_lat_col="slat", right_lng_col="slng",
        broadcast_right=bc,
    )

out = {{}}
counts = {{}}
for name, bc in (("shuffle", False), ("broadcast", True)):
    counts[name] = build(bc).count()      # warmup
    best = None
    for _ in range(3):
        t0 = time.time()
        build(bc).count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    out[name] = round(best, 3)
assert counts["shuffle"] == counts["broadcast"], counts
print(json.dumps({{"cpus": cpus, "n": n, "m": m, "radius_m": radius,
                  "pairs": counts["shuffle"], "sec": out,
                  "speedup": round(out["shuffle"] / out["broadcast"], 2)}}))
"""


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    radius = float(sys.argv[3]) if len(sys.argv) > 3 else 250.0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    code = RUNNER.format(repo=REPO)
    r = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n), str(m), str(radius)],
        capture_output=True, text=True,
    )
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
