"""Skew-safe shuffled equi-join (north_rule 'explicit skew handling',
join side).

The spatial join never needs this — its build side is a broadcast
dimension (operators/spatial.py). This operator covers the OTHER join
shape a 100 TB pipeline hits: big ⋈ big on a skewed key (e.g. a fact
table joined to per-key aggregates where a few keys hold 10%+ of rows).
A plain shuffle hash/sort-merge join sends every row of a hot key to one
reducer; AQE's skew-join split helps but only rebalances existing
shuffle blocks. Explicit salting re-keys the shuffle itself:

    left  (probe, skewed): salt = pmod(xxhash64(salt_src), S)
    right (build):         exploded S times, one copy per salt value
    join on (key, salt)    -> every reducer sees ~1/S of each hot key

Row-for-row identical to the plain join (the salt only splits work);
asserted in tests and the DuckDB oracle. Cost: S x replication of the
build side — use the smaller input as ``right`` and keep S modest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_src: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (large, skewed on ``on``) with ``right``
    (smaller but above broadcast size) on (on, salt). ``salt_src`` is a
    high-cardinality left column so a hot key's rows spread evenly.
    Supported how: inner / left (semantics preserved because every left
    row gets exactly one salt and every right row exists for all salts).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how}")
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt)).cast("int")
    )
    # sequence of int literals explodes to int elements (a cast around a
    # generator is not allowed)
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = salted_left.join(salted_right, [on, "_salt"], how)
    return out.drop("_salt")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
    closed: str = "left",
) -> DataFrame:
    """Big x big range join (point-in-interval) as a shuffle EQUI-join.

    Spark executes a raw non-equi join as BroadcastNestedLoopJoin (only
    if one side fits in memory) or a cartesian product — both dead at
    100 TB when *neither* side broadcasts. Standard bucketization fixes
    the shape: points key by ``floor(p / w)``; intervals explode one
    copy per covered bucket; the join becomes an equi-join on the bucket
    (shuffle hash / sort-merge, partial-aggregatable downstream) with
    the exact range predicate applied as a residual filter. A matching
    (point, interval) pair shares exactly ONE bucket — the point's — so
    no post-join dedup is needed, and ``how="left"`` keeps its
    semantics (the predicate rides in the join condition).

    Cost model: interval replication = ``ceil(len / w) + 1`` copies per
    interval, so pick ``w`` near the median interval length (w too small
    -> replication blow-up; w too large -> residual filter does the work
    and hot buckets skew the shuffle). Buckets inherit AQE skew-join
    splitting since they are plain shuffle keys; for pathological point
    pile-ups compose with ``salted_equi_join``'s technique on ``_bkt``.

    ``closed``: "left" (lo <= p < hi, default — half-open tiling),
    "both", "right", or "neither". Numeric columns only; join
    timestamps via ``unix_micros`` first (exact int64).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how}")
    preds = {
        "left": lambda p, lo, hi: (p >= lo) & (p < hi),
        "both": lambda p, lo, hi: (p >= lo) & (p <= hi),
        "right": lambda p, lo, hi: (p > lo) & (p <= hi),
        "neither": lambda p, lo, hi: (p > lo) & (p < hi),
    }
    if closed not in preds:
        raise ValueError(f"closed must be one of {sorted(preds)}, got {closed!r}")
    w = F.lit(bucket_width)
    pb = points.withColumn("_bkt", F.floor(F.col(point_col) / w).cast("long"))
    ib = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    pred = preds[closed](pb[point_col], ib[lo_col], ib[hi_col])
    out = pb.join(ib, (pb["_bkt"] == ib["_bkt"]) & pred, how)
    # two _bkt columns exist (one per side); drop each by reference
    return out.drop(pb["_bkt"]).drop(ib["_bkt"])
