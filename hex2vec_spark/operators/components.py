"""Connected components over near-dup pair lists — dedup GROUPS.

The dedup family (operators/dedup) emits candidate PAIRS; a training
pipeline needs GROUPS ("these 17 documents are all the same article")
so it can keep one canonical row per group. Pairs -> groups is
connected components on the pair graph.

Spark-first shape: the alternating LARGE-STAR / SMALL-STAR algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond" — the
published shuffle-bounded method): each round is one groupBy + one
join over the edge list, no driver-side graph, edges monotonically
flatten toward a star per component, converging in O(log^2 n) rounds
even for adversarial chains (plain min-label propagation needs
diameter rounds). Per round the edge list's lineage is truncated
(operators/ckpt.Checkpointer: localCheckpoint by default, reliable
``df.checkpoint`` every k rounds when a ``checkpoint_dir`` is given —
the fault-tolerant shape for multi-hour cluster runs) and convergence
is detected by an order-insensitive edge-set hash (one tiny agg row
per round, no driver collect of edges).

At 100 TB scale: the edge list is the only shuffled state, bounded by
the candidate-pair output of the bucketed dedup joins (never all-pairs
by construction); each round's shuffle is O(|E|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    return (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("u"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .where(F.col("u") < F.col("v"))
        .distinct()
    )


def _edge_hash(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive over the DISTINCT edge set and immune
    # to the ANSI-mode long-overflow a sum of hashes hits
    row = edges.select(
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    return (int(row["h"]), int(row["n"]))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(id, component) for every id appearing in ``pairs``; component is
    the MIN id of the connected group (deterministic canonical root).

    Raises after ``max_iter`` rounds without convergence. Rounds grow
    ~log2(diameter): a measured 1M-node pure CHAIN (the pathological
    diameter case) needs 21 rounds, so the default ceiling is 50 —
    enough for a 10^15-diameter chain — while convergence (edge-set
    hash fixpoint) exits real dedup graphs in single digits (7 rounds
    on a 2M-node chain+star+random mix; BENCH/COMPONENTS.md). Pass a
    dict as ``stats`` to receive {"rounds": n}.

    Fault tolerance (round-4): by default rounds truncate lineage with
    ``localCheckpoint`` — fastest, but blocks live only on executors,
    so on a multi-executor cluster ONE lost executor kills a
    multi-hour 100 TB run. Pass ``checkpoint_dir`` (a DFS path on a
    cluster) to write a RELIABLE ``df.checkpoint()`` every
    ``checkpoint_every``-th lineage cut instead: executor loss then
    recomputes from the last reliable round (re-do window <=
    ``checkpoint_every`` rounds) at the cost of one FS write per
    reliable round. Results are identical either way
    (tests/test_components.py::test_reliable_checkpoint_identical).
    """
    from .ckpt import Checkpointer

    ckpt = Checkpointer(pairs.sparkSession, checkpoint_dir, checkpoint_every)
    edges = _canonical(pairs, id_a, id_b)
    nodes = ckpt.reliable(  # scanned again after the loop — keep it durable
        edges.select(F.col("u").alias("id"))
        .unionByName(edges.select(F.col("v").alias("id")))
        .distinct(),
        eager=False,
    )
    edges = ckpt(edges, eager=False)

    def _undirected(e: DataFrame) -> DataFrame:
        return e.select(F.col("u").alias("x"), F.col("v").alias("y")).unionByName(
            e.select(F.col("v").alias("x"), F.col("u").alias("y"))
        )

    def _dedup(e: DataFrame) -> DataFrame:
        return ckpt(
            e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
            .where(F.col("u") < F.col("v"))
            .distinct(),
            eager=False,
        )

    def _large_star(e: DataFrame) -> DataFrame:
        nbrs = _undirected(e)
        mins = (
            nbrs.groupBy("x").agg(F.min("y").alias("_my"))
            .select("x", F.least("_my", F.col("x")).alias("m"))
        )
        wm = nbrs.join(mins, "x")
        out = wm.where(F.col("y") > F.col("x")).select(
            F.col("y").alias("u"), F.col("m").alias("v")
        ).unionByName(mins.select(F.col("x").alias("u"), F.col("m").alias("v")))
        return _dedup(out)

    def _small_star(e: DataFrame) -> DataFrame:
        small_n = _undirected(e).where(F.col("y") < F.col("x"))
        mins = (
            small_n.groupBy("x").agg(F.min("y").alias("_my"))
            .select("x", F.col("_my").alias("m"))
        )
        wm = small_n.join(mins, "x")
        out = wm.select(F.col("y").alias("u"), F.col("m").alias("v")).unionByName(
            mins.select(F.col("x").alias("u"), F.col("m").alias("v"))
        )
        return _dedup(out)

    prev = None
    for rounds in range(max_iter):
        edges = _small_star(_large_star(edges))
        h = _edge_hash(edges)
        if h == prev:
            if stats is not None:
                stats["rounds"] = rounds + 1
            break
        prev = h
    else:
        raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")
    # star edges: v -> root u; roots (and isolated-after-folding nodes)
    # map to themselves
    member = edges.select(F.col("v").alias("id"), F.col("u").alias("component"))
    roots = nodes.join(member, "id", "left_anti").select(
        "id", F.col("id").alias("component")
    )
    return member.unionByName(roots)


def keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Dedup application: keep ONE row per connected near-dup group (the
    min id — same deterministic winner rule as exact_dedup) plus every
    row that appears in no pair. One broadcast-size join against the
    non-canonical member list when components are few; falls back to a
    shuffle join otherwise (Spark decides by stats)."""
    comp = connected_components(pairs, pair_a, pair_b)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
