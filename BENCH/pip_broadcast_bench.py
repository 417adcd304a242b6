"""pip_join_broadcast vs cogrouped pip_join at data scale: N points x M
dim-sized polygons (irregular convex rings). Identical containment
counts asserted.

Run:  python BENCH/pip_broadcast_bench.py [n_points] [n_polys]
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
import numpy as np, pandas as pd
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from hex2vec_spark.plans.session import get_spark
from hex2vec_spark.operators.geo_join import pip_join, pip_join_broadcast

cpus = int(sys.argv[1]); n = int(sys.argv[2]); m = int(sys.argv[3])
spark = get_spark("pipbc-bench", master=f"local[{{cpus}}]", shuffle_partitions=32)

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
rng = np.random.default_rng(3)
rows = []
for p in range(m):
    nv = int(rng.integers(5, 10))
    ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
    rad = rng.uniform(0.02, 0.08)
    cla = rng.uniform(45.2, 49.8); clg = rng.uniform(10.3, 19.7)
    rows.append({{"obj_id": f"p{{p:05d}}",
                 "ring_lat": (cla + rad * np.sin(ang)).tolist(),
                 "ring_lng": (clg + rad * np.cos(ang)).tolist()}})
polys = spark.createDataFrame(pd.DataFrame(rows)).localCheckpoint()

out = {{}}
counts = {{}}
for name, fn in (("cogroup", pip_join), ("broadcast", pip_join_broadcast)):
    counts[name] = fn(pts, polys, cell_deg=0.1).count()   # warmup
    best = None
    for _ in range(3):
        t0 = time.time()
        fn(pts, polys, cell_deg=0.1).count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
    out[name] = round(best, 3)
assert counts["cogroup"] == counts["broadcast"], counts
print(json.dumps({{"cpus": cpus, "n": n, "m": m,
                  "containments": counts["cogroup"], "sec": out,
                  "speedup": round(out["cogroup"] / out["broadcast"], 2)}}))
"""


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    code = RUNNER.format(repo=REPO)
    r = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n), str(m)],
        capture_output=True, text=True,
    )
    lines = [l for l in r.stdout.splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(r.stderr[-2000:])
        return 1
    print(lines[-1])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
