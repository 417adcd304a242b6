"""Round-6 audit: time EVERY registry query once (2 passes, min) with the
noop sink at $SPARK_GRAFT_SF_DIR. Not a driver artifact — evidence for
OPTIMIZATION_r06.md's per-operator checklist.

Usage: python tools/sweep_registry.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_registry.json"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from hex2vec_spark.plans.session import get_spark

    spark = get_spark("sweep", master=f"local[{cpus}]", shuffle_partitions=8)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    res: dict[str, object] = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        runs = []
        try:
            for _ in range(2):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            res[name] = min(runs)
        except Exception as e:  # keep sweeping
            res[name] = f"ERR: {type(e).__name__}: {e}"[:200]
            traceback.print_exc(file=sys.stderr)
        print(json.dumps({name: res[name]}), flush=True)
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1, sort_keys=True)
    slow = sorted(
        ((v, k) for k, v in res.items() if isinstance(v, float)), reverse=True
    )[:20]
    print("SLOWEST:", json.dumps(slow))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
