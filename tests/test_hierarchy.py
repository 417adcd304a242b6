"""H3 hierarchy operators (operators/hierarchy.py) vs the NumPy kernel
and pure-Python compact/uncompact references."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hex2vec_spark.hexlib import h3core
from hex2vec_spark.operators.hierarchy import (
    children_col,
    compact_cells,
    compact_py,
    parent_col,
    resolution_col,
    rollup,
    uncompact_cells,
    uncompact_py,
)


def _sample_cells(res: int, n: int = 500, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    lat = rng.uniform(48.0, 54.0, n)
    lng = rng.uniform(14.0, 24.0, n)
    return h3core.encode(lat, lng, res)


class TestParentChildren:
    def test_parent_matches_numpy_kernel(self, spark):
        cells = _sample_cells(9)
        df = spark.createDataFrame(
            [(int(np.int64(c)),) for c in cells], "h3 long"
        )
        for pres in (8, 7, 5, 0):
            got = [
                r[0]
                for r in df.select(parent_col("h3", pres).alias("p")).collect()
            ]
            want = h3core.cell_to_parent(cells, pres).astype(np.int64)
            assert got == [int(w) for w in want]

    def test_parent_is_pure_jvm(self, spark):
        df = spark.range(1).select(
            F.lit(1 << 59).bitwiseOR(F.lit(9 << 52)).alias("h3")
        )
        plan = df.select(parent_col("h3", 7))._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_parent_res_violation_raises(self, spark):
        cells = _sample_cells(5, n=3)
        df = spark.createDataFrame([(int(np.int64(c)),) for c in cells], "h3 long")
        with pytest.raises(Exception, match="cell_to_parent"):
            df.select(parent_col("h3", 9)).collect()

    def test_children_roundtrip_parent(self, spark):
        cells = _sample_cells(7, n=50)
        df = spark.createDataFrame([(int(np.int64(c)),) for c in cells], "h3 long")
        kids = df.select(
            F.col("h3").alias("orig"),
            F.explode(children_col("h3", 7, 9)).alias("h3"),
        )
        n = kids.count()
        assert n == 50 * 49
        # every child's parent (bit-truncated) is its origin cell
        bad = kids.where(parent_col("h3", 7) != F.col("orig")).count()
        assert bad == 0
        # children are distinct and carry the child resolution
        assert kids.select("h3").distinct().count() == n
        assert (
            kids.select(resolution_col("h3").alias("r")).distinct().collect()[0][0]
            == 9
        )

    def test_children_identity_at_same_res(self, spark):
        cells = _sample_cells(8, n=5)
        df = spark.createDataFrame([(int(np.int64(c)),) for c in cells], "h3 long")
        got = sorted(
            r[0]
            for r in df.select(F.explode(children_col("h3", 8, 8)).alias("c")).collect()
        )
        assert got == sorted(int(np.int64(c)) for c in cells)


class TestRollup:
    def test_rollup_counts_match_pandas(self, spark):
        cells = _sample_cells(9, n=2000)
        df = spark.createDataFrame([(int(np.int64(c)),) for c in cells], "h3 long")
        got = {
            r["parent"]: r["n"] for r in rollup(df, 7, "h3").collect()
        }
        parents = h3core.cell_to_parent(cells, 7).astype(np.int64)
        want: dict = {}
        for p in parents:
            want[int(p)] = want.get(int(p), 0) + 1
        assert got == want

    def test_rollup_single_shuffle(self, spark):
        cells = _sample_cells(9, n=100)
        df = spark.createDataFrame([(int(np.int64(c)),) for c in cells], "h3 long")
        plan = rollup(df, 7, "h3")._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1


class TestCompactUncompact:
    def test_uncompact_matches_python(self, spark):
        cells = {int(np.int64(c)) for c in _sample_cells(6, n=40)}
        df = spark.createDataFrame([(c,) for c in cells], "h3 long")
        got = sorted(r[0] for r in uncompact_cells(df, 8, "h3").collect())
        assert got == sorted(uncompact_py(cells, 8))

    def test_uncompact_finer_input_raises(self, spark):
        cells = _sample_cells(9, n=3)
        df = spark.createDataFrame([(int(np.int64(c)),) for c in cells], "h3 long")
        with pytest.raises(ValueError, match="finer input"):
            uncompact_cells(df, 8, "h3")

    def test_compact_full_coverage_collapses(self, spark):
        # full 2-level uncompact of distinct res-6 cells must compact
        # back to exactly those cells
        base = {int(np.int64(c)) for c in _sample_cells(6, n=25)}
        kids = uncompact_py(base, 8)
        df = spark.createDataFrame([(c,) for c in kids], "h3 long")
        got = sorted(r[0] for r in compact_cells(df, "h3").collect())
        assert got == sorted(base)

    def test_compact_partial_sets_survive(self, spark):
        # drop one child per parent: nothing may merge
        base = {int(np.int64(c)) for c in _sample_cells(7, n=10)}
        kids = sorted(uncompact_py(base, 8))
        holed = [c for i, c in enumerate(kids) if i % 7 != 3]
        df = spark.createDataFrame([(c,) for c in holed], "h3 long")
        got = sorted(r[0] for r in compact_cells(df, "h3").collect())
        assert got == sorted(compact_py(set(holed)))
        assert got == sorted(holed)  # conservative: no merge without all 7

    def test_compact_mixed_resolutions_vs_python(self, spark):
        rng = np.random.default_rng(11)
        base = {int(np.int64(c)) for c in _sample_cells(6, n=12)}
        cells: set = set()
        for c in base:
            r = int(rng.integers(0, 3))
            if r == 0:
                cells.add(c)
            else:
                kids = uncompact_py({c}, 6 + r)
                # randomly keep most children (some full sets, some holed)
                keep = {k for k in kids if rng.random() > 0.05}
                cells |= keep
        df = spark.createDataFrame([(c,) for c in cells], "h3 long")
        got = sorted(r[0] for r in compact_cells(df, "h3").collect())
        assert got == sorted(compact_py(cells))

    def test_compact_then_uncompact_is_identity_on_coverage(self, spark):
        base = {int(np.int64(c)) for c in _sample_cells(5, n=8)}
        full = uncompact_py(base, 7)
        df = spark.createDataFrame([(c,) for c in full], "h3 long")
        compacted = compact_cells(df, "h3")
        back = sorted(r[0] for r in uncompact_cells(compacted, 7, "h3").collect())
        assert back == sorted(full)


class TestPerGroupCompact:
    def test_groups_compact_independently(self, spark):
        # group A holds a FULL 7-child set, group B the same set minus
        # one child: A merges, B must not — in one sweep
        parent = int(np.int64(_sample_cells(6, n=1)[0]))
        kids = sorted(uncompact_py({parent}, 7))
        rows = [("A", c) for c in kids] + [("B", c) for c in kids[:-1]]
        df = spark.createDataFrame(rows, "g string, h3 long")
        got = sorted(
            (r["g"], r["h3"])
            for r in compact_cells(df, "h3", group_cols=["g"]).collect()
        )
        want = sorted([("A", parent)] + [("B", c) for c in kids[:-1]])
        assert got == want

    def test_per_group_matches_python_per_group(self, spark):
        rng = np.random.default_rng(23)
        groups = {}
        for gi, g in enumerate(["r1", "r2", "r3"]):
            base = {int(np.int64(c)) for c in _sample_cells(6, n=6, seed=50 + gi)}
            cells = set()
            for c in base:
                kids = uncompact_py({c}, 8)
                cells |= {k for k in kids if rng.random() > 0.02}
            groups[g] = cells
        rows = [(g, c) for g, cs in groups.items() for c in cs]
        df = spark.createDataFrame(rows, "g string, h3 long")
        got = {}
        for r in compact_cells(df, "h3", group_cols=["g"]).collect():
            got.setdefault(r["g"], set()).add(r["h3"])
        for g, cs in groups.items():
            assert got[g] == compact_py(cs), g

    def test_uncompact_carries_group_columns(self, spark):
        parent = int(np.int64(_sample_cells(5, n=1)[0]))
        df = spark.createDataFrame([("A", parent), ("B", parent)], "g string, h3 long")
        out = uncompact_cells(df, 6, "h3")
        got = {}
        for r in out.collect():
            got.setdefault(r["g"], set()).add(r["h3"])
        want = uncompact_py({parent}, 6)
        assert got == {"A": want, "B": want}
