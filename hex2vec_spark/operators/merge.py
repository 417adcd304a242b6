"""MERGE INTO (upsert) as a DataFrame operator + versioned-table commit.

Iceberg's MERGE INTO is the canonical maintenance op for a mutable
10^12-row image corpus (re-ingested captions, re-geocoded points,
quality-score refreshes). Spark without a lakehouse catalog has no
MERGE statement, so this engine expresses the copy-on-write subset as
pure DataFrame algebra:

    WHEN MATCHED     THEN UPDATE SET <cols>   (or DELETE)
    WHEN NOT MATCHED THEN INSERT *

* ``merge_into(target, source, on)``  — the relational core: ONE
  left join on the merge keys (matched rows coalesce source values)
  unioned with ONE anti-join (unmatched source rows become inserts).
  Both joins shuffle on the same keys, so AQE plans them off a shared
  exchange; a small source side broadcasts and the target never
  shuffles at all — the 100 TB shape (updates are normally << table).
* ``merge_table(spark, path, source, on)`` — reads the latest
  :mod:`iceberg_lite` snapshot, merges, and commits the result as a
  new ``overwrite`` snapshot: prior snapshots stay readable (time
  travel), mirroring Iceberg's copy-on-write MERGE semantics.

Like Iceberg/Delta, a source row matching multiple target rows is fine
(each target row updates), but multiple SOURCE rows per key would make
the update non-deterministic — Iceberg raises; so does this operator
(``check_unique``, a cheap key-level agg relative to the merge itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MATCH = "__merge_match__"


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str | list[str],
    update_cols: list[str] | None = None,
    when_matched: str = "update",
    insert_unmatched: bool = True,
    check_unique: bool = True,
) -> DataFrame:
    """Upsert ``source`` into ``target`` on key column(s) ``on``.

    ``when_matched``: ``'update'`` (coalesce source values over target
    for ``update_cols``, default = every shared non-key column) or
    ``'delete'`` (matched target rows drop). ``insert_unmatched``:
    source rows with no target match append, projected onto the target
    schema (missing columns NULL of the target's type).

    Returns a DataFrame with exactly the target's schema.
    """
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in target.columns or k not in source.columns:
            raise ValueError(f"merge key {k!r} missing from target or source")
    if when_matched not in ("update", "delete"):
        raise ValueError(f"when_matched must be update|delete, got {when_matched!r}")
    shared = [c for c in target.columns if c in source.columns and c not in keys]
    if update_cols is None:
        update_cols = shared
    else:
        missing = [c for c in update_cols if c not in shared]
        if missing:
            raise ValueError(f"update_cols not shared non-key columns: {missing}")

    if check_unique:
        dup = (
            source.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > 1)
            .take(1)
        )
        if dup:
            raise ValueError(
                f"merge source has multiple rows for key {dict(zip(keys, dup[0][:-1]))}"
                " — non-deterministic merge (Iceberg raises here too)"
            )

    t = target.alias("t")
    s = source.withColumn(_MATCH, F.lit(1)).alias("s")
    # plain SQL equality, like MERGE ... ON t.k = s.k: NULL keys never
    # match (matches the anti-join below and Iceberg/ANSI semantics)
    cond = None
    for k in keys:
        c = F.col(f"t.{k}") == F.col(f"s.{k}")
        cond = c if cond is None else (cond & c)

    if when_matched == "delete":
        kept = target.join(source.select(*keys).distinct(), keys, "left_anti")
    else:
        joined = t.join(s, cond, "left")
        proj = []
        for c in target.columns:
            if c in update_cols:
                proj.append(
                    F.when(F.col(f"s.{_MATCH}") == 1, F.col(f"s.{c}"))
                    .otherwise(F.col(f"t.{c}"))
                    .alias(c)
                )
            else:
                proj.append(F.col(f"t.{c}").alias(c))
        kept = joined.select(*proj)

    if not insert_unmatched:
        return kept
    inserts_raw = source.alias("s2").join(
        target.select(*keys).distinct(), keys, "left_anti"
    )
    tgt_types = dict(target.dtypes)
    ins_proj = [
        (F.col(c) if c in source.columns else F.lit(None)).cast(tgt_types[c]).alias(c)
        for c in target.columns
    ]
    return kept.unionByName(inserts_raw.select(*ins_proj))


def merge_table(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    on: str | list[str],
    update_cols: list[str] | None = None,
    when_matched: str = "update",
    insert_unmatched: bool = True,
    partition_res: int | None = 4,
    h3_col: str = "h3",
    snapshot_extra: dict | None = None,
) -> dict:
    """Copy-on-write MERGE against an iceberg_lite table: latest
    snapshot -> :func:`merge_into` -> new ``overwrite`` snapshot (old
    snapshots remain time-travel readable). Returns the new snapshot
    record (with the merge keys noted in the snapshot extra)."""
    from ..sources.iceberg_lite import commit_table, read_table

    merged = merge_into(
        read_table(spark, path),
        source,
        on,
        update_cols=update_cols,
        when_matched=when_matched,
        insert_unmatched=insert_unmatched,
    )
    return commit_table(
        merged,
        path,
        mode="overwrite",
        partition_res=partition_res,
        h3_col=h3_col,
        snapshot_extra={
            "merge_on": [on] if isinstance(on, str) else list(on),
            **(snapshot_extra or {}),
        },
    )
