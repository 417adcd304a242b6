"""H3 hierarchy operators: parent/children/rollup/compact/uncompact.

The reference consumes the h3 lib's flat res-``r`` grids
(make_dataset.py:96-123 encodes at one resolution and never walks the
hierarchy), but a multi-resolution corpus at 10^12-image scale needs
the aperture-7 hierarchy as first-class DataFrame operators: coarse
rollups for global views, `compact` to store full-coverage regions in
O(boundary) cells instead of O(area), `uncompact` to re-materialize.

All of these are PURE BIT ARITHMETIC on the public H3 index layout
(hexlib/h3core.py:1-16 — res nibble at bits 55..52, digit ``r`` at bits
``3*(15-r)..3*(15-r)+2``, unused digits = 7), so every operator here is
emitted as Catalyst expressions — whole-stage codegen, zero Python in
the hot path, usable inside any JVM plan:

* ``parent_col(h, p)``       — truncate digits, O(1) per row, narrow.
* ``children_col(h, r, c)``  — explode to the 7^(c-r) descendants.
* ``rollup(df, ...)``        — groupBy(parent): ONE shuffle, partial
  aggregation map-side; the natural "res 9 -> res 7 global view" job.
* ``compact_cells(df)``      — iterative bottom-up merge: one
  groupBy(parent) per resolution level present (<= 15 rounds, each
  shuffle-bounded on a set that only shrinks), lineage-truncated per
  round via :class:`~hex2vec_spark.operators.ckpt.Checkpointer`.
* ``uncompact_cells(df, r)`` — children explode of mixed-res input.

Pentagon caveat (documented, conservative): this engine's ids do not
mark pentagon cells (hexlib approximates the 12 pentagon footprints),
so ``compact_cells`` merges a parent only when ALL SEVEN children are
present. True-H3 pentagon parents have 6 children and would stay
unmerged here — compaction is then merely suboptimal, never wrong:
``uncompact(compact(S), r) == S`` holds for every full-coverage S of
hexagon children, and no cell is ever invented.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_RES = 15
_RES_CLEAR = ~(0xF << 52)  # AND-mask: zero the resolution nibble


def _fill_mask(parent_res: int) -> int:
    """All-ones over the digit fields below ``parent_res`` (the 7s)."""
    return (1 << (3 * (MAX_RES - parent_res))) - 1


def resolution_col(h: Column | str) -> Column:
    """Resolution nibble as int (pure JVM; h3core.get_resolution)."""
    return F.shiftright(F.col(h) if isinstance(h, str) else h, 52).bitwiseAND(
        F.lit(0xF)
    )


def parent_col(h: Column | str, parent_res: int, check: bool = True) -> Column:
    """Ancestor cell id at ``parent_res`` (h3core.cell_to_parent, JVM).

    Truncation = set the res nibble to ``parent_res`` and refill the
    now-unused digit fields with 7s. With ``check`` (default) a cell
    already coarser than ``parent_res`` raises instead of silently
    producing a malformed id (mirrors the NumPy kernel's ValueError).
    """
    if not 0 <= parent_res <= MAX_RES:
        raise ValueError(f"parent_res must be in [0, 15], got {parent_res}")
    col = F.col(h) if isinstance(h, str) else h
    out = (
        col.bitwiseAND(F.lit(_RES_CLEAR))
        .bitwiseOR(F.lit(parent_res << 52))
        .bitwiseOR(F.lit(_fill_mask(parent_res)))
    )
    if not check:
        return out
    return F.when(resolution_col(col) >= F.lit(parent_res), out).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"cell_to_parent: cell res < parent_res {parent_res}: "),
                F.conv(col.cast("string"), 10, 16),
            )
        )
    )


def children_col(h: Column | str, res: int, child_res: int) -> Column:
    """Array of ALL 7^(child_res-res) descendant ids at ``child_res``.

    One ``transform(sequence(...))`` — the combo index k expands base-7
    into the digit fields ``res+1..child_res`` (digit j gets
    ``k / 7^(child_res-j) % 7``), everything else is constant masks.
    Pair with ``explode`` for a row per child. Callers supply ``res``
    (the input's resolution) so the expression stays fully constant-
    folded; mixed-res frames go through :func:`uncompact_cells`.
    """
    if not 0 <= res <= child_res <= MAX_RES:
        raise ValueError(f"need 0 <= res <= child_res <= 15, got {res}, {child_res}")
    col = F.col(h) if isinstance(h, str) else h
    n = child_res - res
    if n == 0:
        return F.array(col)
    # zero out: res nibble + the digit fields being assigned (res+1..child_res)
    digit_clear = ~(_fill_mask(res) ^ _fill_mask(child_res))
    base = (
        col.bitwiseAND(F.lit(_RES_CLEAR))
        .bitwiseAND(F.lit(digit_clear))
        .bitwiseOR(F.lit(child_res << 52))
    )
    shift0 = 3 * (MAX_RES - child_res)  # bit offset of the LOWEST new digit

    def _child(k: Column) -> Column:
        out = base
        for i in range(n):  # i-th new digit from the bottom
            d = (k / F.lit(7**i)).cast("long") % F.lit(7)
            out = out.bitwiseOR(F.shiftleft(d, shift0 + 3 * i))
        return out

    return F.transform(F.sequence(F.lit(0), F.lit(7**n - 1)), _child)


def rollup(
    df: DataFrame,
    parent_res: int,
    h3_col: str = "h3",
    aggs: list[Column] | None = None,
    parent_col_name: str = "parent",
) -> DataFrame:
    """Aggregate a res-r frame to its res-``parent_res`` ancestors.

    ONE shuffle (groupBy on the truncated key) with map-side partial
    aggregation; the parent key is computed inside the scan stage, so
    at 10^12 rows this is exactly a count/sum job, nothing more.
    Default agg: ``count(*) AS n`` per parent.
    """
    keyed = df.withColumn(parent_col_name, parent_col(h3_col, parent_res))
    return keyed.groupBy(parent_col_name).agg(
        *(aggs if aggs is not None else [F.count(F.lit(1)).alias("n")])
    )


def uncompact_cells(df: DataFrame, res: int, h3_col: str = "h3") -> DataFrame:
    """Explode every cell to its descendants at ``res`` (mixed-res ok).

    Planned as a UNION of per-input-resolution branches (each branch's
    children expression constant-folds); a finer-than-``res`` input
    cell raises, matching h3's uncompact contract. Row growth is the
    inherent 7^(res-r) — callers own the blow-up budget. Non-cell
    columns ride along unchanged (so a per-region compact cover
    uncompacts back to a per-region flat cover).
    """
    spark = df.sparkSession
    present = [
        r[0]
        for r in df.select(resolution_col(h3_col).alias("r")).distinct().collect()
    ]
    bad = [r for r in present if r > res]
    if bad:
        raise ValueError(f"uncompact to res {res}: finer input cells exist: {bad}")
    if not present:
        return df
    others = [c for c in df.columns if c != h3_col]
    parts = []
    for r in sorted(present):
        branch = df.where(resolution_col(h3_col) == F.lit(r)).select(
            *others, F.explode(children_col(h3_col, r, res)).alias(h3_col)
        )
        parts.append(branch)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def compact_cells(
    df: DataFrame,
    h3_col: str = "h3",
    group_cols: list[str] | tuple = (),
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Replace every complete 7-child set by its parent, recursively.

    Bottom-up sweep over the resolutions actually present (collected
    once — <= 16 rows): at each level, ``groupBy(parent)`` counts
    distinct children; parents with all 7 promote and re-enter the
    pool one level up, the rest emit. Each round is one shuffle over a
    set that only shrinks; lineage is truncated per round (reliable
    checkpoints every ``checkpoint_every`` rounds when a dir is given
    — same fault-tolerance contract as connected_components). At most
    15 rounds regardless of input size: scale-safe by construction.

    ``group_cols``: compact each group independently in the SAME
    sweep (e.g. a per-region compacted tiling cover) — the parent
    groupBy and anti-join just carry the group key, so one pass over
    all regions, not a loop.

    Input is treated as a SET (deduped per group); like h3's compact
    it requires a VALID cover — no cell may be an ancestor of another
    (h3's own contract; such input makes the merge ill-defined).
    Output is the minimal hexagon-conservative cover (see module
    docstring for the pentagon caveat).
    """
    from .ckpt import Checkpointer

    spark = df.sparkSession
    gcols = list(group_cols)
    ckpt = Checkpointer(spark, checkpoint_dir, checkpoint_every)
    pool = ckpt(
        df.select(*gcols, F.col(h3_col).alias(h3_col)).distinct(), eager=True
    )
    emitted: DataFrame | None = None
    while True:
        # process the FINEST level still pooled (skips empty levels; a
        # cheap max over data the previous round materialized)
        m = pool.agg(F.max(resolution_col(h3_col)).alias("m")).collect()[0]["m"]
        if m is None or m == 0:
            break  # empty pool / only res-0 cells (which cannot merge)
        r = int(m)
        cur = pool.where(resolution_col(h3_col) == F.lit(r))
        rest = pool.where(resolution_col(h3_col) != F.lit(r))
        # materialize the (small: <= |cur|/7) promoted-parent set ONCE per
        # round — it feeds the anti-join, the next pool, AND the broadcast
        # decision, so without this it would be recomputed three times
        promoted = (
            cur.withColumn("_p", parent_col(h3_col, r - 1))
            .groupBy(*gcols, "_p")
            .agg(F.count(F.lit(1)).alias("_n"))  # pool is distinct: count==distinct
            .where(F.col("_n") == 7)
            .select(*gcols, F.col("_p").alias(h3_col))
            .localCheckpoint(eager=True)
        )
        n_prom = promoted.count()
        prom_key = promoted.withColumnRenamed(h3_col, "_p")
        keep = (
            cur.withColumn("_p", parent_col(h3_col, r - 1))
            .join(
                F.broadcast(prom_key) if n_prom <= 100_000 else prom_key,
                [*gcols, "_p"],
                "left_anti",
            )
            .select(*gcols, h3_col)
        )
        emitted = keep if emitted is None else emitted.unionAll(keep)
        # zero promotions: rest is one filter off already-materialized
        # data — skip the checkpoint and let the max-probe fall through
        pool = rest if n_prom == 0 else ckpt(rest.unionAll(promoted), eager=True)
    if not pool.isEmpty():
        emitted = pool if emitted is None else emitted.unionAll(pool)
    return emitted if emitted is not None else pool


# ------------------------------------------------------- python oracle

def compact_py(cells: set[int]) -> set[int]:
    """Pure-Python reference for tests (same 7-child-conservative rule)."""
    pool = set(cells)
    out: set[int] = set()
    while pool:
        r = max((c >> 52) & 0xF for c in pool)
        if r == 0:
            out |= pool
            break
        cur = {c for c in pool if (c >> 52) & 0xF == r}
        pool -= cur
        groups: dict[int, int] = {}
        for c in cur:
            p = (c & _RES_CLEAR) | ((r - 1) << 52) | _fill_mask(r - 1)
            groups[p] = groups.get(p, 0) + 1
        for c in cur:
            p = (c & _RES_CLEAR) | ((r - 1) << 52) | _fill_mask(r - 1)
            if groups[p] == 7:
                pool.add(p)  # set-add dedupes the 7 promotions
            else:
                out.add(c)
    return out


def uncompact_py(cells: set[int], res: int) -> set[int]:
    """Pure-Python reference for tests."""
    out: set[int] = set()
    for c in cells:
        r = (c >> 52) & 0xF
        if r > res:
            raise ValueError("finer than target")
        n = res - r
        digit_clear = ~(_fill_mask(r) ^ _fill_mask(res))
        base = (c & _RES_CLEAR & digit_clear) | (res << 52)
        shift0 = 3 * (MAX_RES - res)
        for k in range(7**n):
            child = base
            kk = k
            for i in range(n):
                child |= (kk % 7) << (shift0 + 3 * i)
                kk //= 7
            out.add(child)
    return out
