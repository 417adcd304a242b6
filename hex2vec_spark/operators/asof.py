"""As-of (most-recent-prior) join — a core time-series operator Spark
has no built-in for (graft axis: the temporal side of the events table;
the reference engine's pipelines are batch-spatial, so this is an
engine-native addition per the build brief's custom-operator list).

Semantics: for every left row, attach the right row with the LARGEST
right_time <= left_time within the same ``by`` key (DuckDB/kdb ASOF
LEFT JOIN). Left rows with no prior right row keep NULLs.

Physical strategy — the union-timeline trick, NOT an inequality join:

    tag left rows side=1, right rows side=0
    union -> ONE shuffle on the `by` key
    window partitionBy(by) orderBy(time, side)
    carry = last(right payload struct, ignorenulls=True) over
            rowsBetween(unboundedPreceding, currentRow)
    keep side=1 rows

An inequality-join formulation (l.t >= r.t) explodes to O(|L| x |R|)
per key before aggregation and cannot broadcast at scale; the union
trick is O((|L|+|R|) log) for the sort with exactly one shuffle, and
AQE handles skewed keys like any other window. At 10^12 rows the sort
is the same per-partition sort every window query pays — this is the
scale-correct shape.

Tie rule: a right row at EXACTLY left_time qualifies (<=), hence right
sorts before left at equal times (side 0 < 1). Duplicate right rows at
the same (key, time) are resolved by last-in-sort-order — pass a
deduplicated right side (e.g. groupBy(key, time).agg(...)) when the
choice must be deterministic, as the oracle query does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_time: str = "ts",
    right_time: str = "ts",
    right_payload: list[str] | None = None,
    prefix: str = "asof_",
    direction: str = "backward",
    allow_exact_matches: bool = True,
) -> DataFrame:
    """ASOF LEFT JOIN: left rows + most-recent-prior right payload.

    Output columns: all of ``left``'s, plus ``{prefix}{right_time}``
    (the matched right timestamp) and ``{prefix}{c}`` for each payload
    column (NULL when no prior right row exists).

    ``direction``/``allow_exact_matches`` span the full pandas
    ``merge_asof`` surface (round-4 addition; DuckDB expresses the same
    four variants as ASOF JOIN ON ``>=``, ``>``, ``<=``, ``<``):

    * ``backward`` (default): largest right_time <= left_time
      (< when ``allow_exact_matches=False``)
    * ``forward``: smallest right_time >= left_time (> when not exact)
    * ``nearest``: whichever of those two candidates is closest in
      absolute time distance; an exact tie picks the BACKWARD one
      (pandas' rule)

    All reuse the SAME union-timeline plan — only the sort direction
    and the right rows' tie rank change: the timeline is scanned in
    match order (asc for backward, desc for forward), and right rows
    sort before left rows at equal timestamps exactly when an equal
    timestamp qualifies (side 0 < 1), after them when it must not
    (side 2 > 1). ``nearest`` carries BOTH directions over the same
    partitioning — Spark reuses the single Exchange for the two window
    sorts — then picks per row. Still one shuffle, zero Join nodes.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (by, right_time)]

    pay_struct = F.struct(
        F.col(right_time).alias(f"{prefix}{right_time}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_payload],
    )
    # NULL right timestamps never match (DuckDB ASOF / pandas
    # merge_asof semantics). Without this filter they sort FIRST
    # (asc = NULLS FIRST, side 0) and their payload carries forward
    # into left rows that have no true prior match. Left rows with a
    # NULL timestamp also sort first and therefore correctly get a
    # NULL payload — no filter needed on that side.
    right = right.where(F.col(right_time).isNotNull())
    r = right.select(
        F.col(by).alias(by),
        F.col(right_time).alias("_asof_t"),
        F.lit(0 if allow_exact_matches else 2).alias("_asof_side"),
        pay_struct.alias("_asof_pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != by],
    )
    l = left.select(
        F.col(by),
        F.col(left_time).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        F.lit(None).cast(r.schema["_asof_pay"].dataType).alias("_asof_pay"),
        *[c for c in left.columns if c != by],
    )
    u = l.unionByName(r)
    # NULLS FIRST in BOTH directions (desc defaults to NULLS LAST):
    # a left row with a NULL timestamp must scan before any right row
    # so its carry is NULL — under desc_nulls_last it would sort after
    # everything and match the smallest right timestamp.
    def _w(order):
        return (
            Window.partitionBy(by)
            .orderBy(order, F.col("_asof_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )

    w_back = _w(F.col("_asof_t").asc_nulls_first())
    w_fwd = _w(F.col("_asof_t").desc_nulls_first())
    if direction == "nearest":
        # both carries over ONE hash partitioning (Spark reuses the
        # Exchange across the two window sorts), then a per-row pick:
        # closest absolute distance, exact tie -> backward (pandas).
        # Distances are computed in the column's NATIVE arithmetic type
        # (timestamps/dates -> exact int64 microseconds, integers stay
        # integers): a cast to double would round long-epoch values
        # above 2^53 before subtracting and could pick the wrong side
        # on close calls, and DATE isn't castable to double at all.
        def _tnum(c):
            t = u.schema["_asof_t"].dataType.simpleString()
            if "timestamp" in t or t == "date":
                return F.unix_micros(c.cast("timestamp"))
            return c

        carried = (
            u.withColumn("_hb", F.last("_asof_pay", ignorenulls=True).over(w_back))
            .withColumn("_hf", F.last("_asof_pay", ignorenulls=True).over(w_fwd))
        )
        lt = _tnum(F.col("_asof_t"))
        bt = _tnum(F.col(f"_hb.{prefix}{right_time}"))
        ft = _tnum(F.col(f"_hf.{prefix}{right_time}"))
        hit = (
            F.when(F.col("_hb").isNull(), F.col("_hf"))
            .when(F.col("_hf").isNull(), F.col("_hb"))
            .when(lt - bt <= ft - lt, F.col("_hb"))
            .otherwise(F.col("_hf"))
        )
        carried = carried.withColumn("_asof_hit", hit)
    else:
        w = w_back if direction == "backward" else w_fwd
        carried = u.withColumn(
            "_asof_hit", F.last("_asof_pay", ignorenulls=True).over(w)
        )
    out_cols = list(left.columns) + [
        F.col(f"_asof_hit.{prefix}{right_time}").alias(f"{prefix}{right_time}")
    ] + [F.col(f"_asof_hit.{prefix}{c}").alias(f"{prefix}{c}") for c in right_payload]
    return carried.where(F.col("_asof_side") == 1).select(*out_cols)
