"""Dense vs sharded SGNS trainer measurement (round 4).

The dense path (driver-resident V x dim weights, broadcast per
iteration) and the sharded path (weights as a (m, key, vec) DataFrame,
join-based steps) trade a broadcast for one pairs-scale shuffle per
iteration. This measures both at a mid-size synthetic config so the
crossover argument in BENCH/TRAINER.md is a number, not a guess.

Run: python BENCH/trainer_bench.py [n_pairs] [vocab] [dim] [iters]
Prints one JSON line; writes nothing.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from pyspark.sql import functions as F

    from hex2vec_spark.operators.embed import skipgram_fit, skipgram_fit_sharded
    from hex2vec_spark.plans.session import get_spark

    spark = get_spark("trainer-bench")
    # deterministic synthetic pairs: t/c/negs drawn from [0, vocab)
    pairs = (
        spark.range(n_pairs)
        .select(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(vocab)).alias("input_h3"),
            F.pmod(F.xxhash64("id", F.lit(2)), F.lit(vocab)).alias("context_h3"),
            F.array(
                F.pmod(F.xxhash64("id", F.lit(3)), F.lit(vocab)),
                F.pmod(F.xxhash64("id", F.lit(4)), F.lit(vocab)),
            ).alias("neg_h3s"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )

    t0 = time.time()
    _, _, l_dense = skipgram_fit(
        pairs, dim=dim, n_iter=iters, lr=1.0, seed=3, init="hash"
    )
    dense_s = time.time() - t0

    t0 = time.time()
    wdf, l_sh = skipgram_fit_sharded(pairs, dim=dim, n_iter=iters, lr=1.0, seed=3)
    sharded_s = time.time() - t0

    t0 = time.time()
    _, l_mb = skipgram_fit_sharded(
        pairs, dim=dim, n_iter=iters, lr=1.0, seed=3, batch_fraction=0.25
    )
    sharded_mb_s = time.time() - t0

    import numpy as np

    out = {
        "n_pairs": n_pairs,
        "vocab": vocab,
        "dim": dim,
        "iters": iters,
        "dense_sec": round(dense_s, 2),
        "sharded_sec": round(sharded_s, 2),
        "sharded_minibatch25_sec": round(sharded_mb_s, 2),
        "dense_sec_per_iter": round(dense_s / iters, 2),
        "sharded_sec_per_iter": round(sharded_s / iters, 2),
        "loss_delta_max": float(np.max(np.abs(np.array(l_dense) - np.array(l_sh)))),
        "weights_rows": wdf.count(),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
