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
