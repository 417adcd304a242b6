"""JVM (Catalyst-expression) H3 encode vs the Arrow/NumPy kernel.

The whole value of functions/h3_expr is the bit-identity claim: wherever
``jvm_encode_support`` accepts a (bbox, res), the codegen'd expression
must equal ``h3core.encode`` exactly — not approximately — because the
cell id is a JOIN KEY (operators/spatial.spatial_join) and a single
flipped cell silently moves rows across regions.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hex2vec_spark.functions import h3_expr as hx
from hex2vec_spark.functions.h3_fns import DEFAULT_BBOX, geotag_np, h3_from_phash_np
from hex2vec_spark.hexlib import h3core


def _phash_df(spark, n, seed=7):
    rng = np.random.default_rng(seed)
    ph = rng.integers(0, 2**63, size=n, dtype=np.int64)
    return ph, spark.createDataFrame(pd.DataFrame({"phash": ph}))


class TestBitIdentity:
    @pytest.mark.parametrize("res", [8, 9, 10])
    def test_phash_distribution_exact(self, spark, res):
        # the real input distribution (geotag convention over the active
        # bbox), 200k rows per res — 0 mismatches allowed
        ph, df = _phash_df(spark, 200_000, seed=res)
        expected = h3_from_phash_np(ph, res, DEFAULT_BBOX)
        got = (
            hx.attach_h3_from_phash_jvm(df, res, DEFAULT_BBOX)
            .toPandas()["h3"]
            .to_numpy()
        )
        assert (got != expected).sum() == 0

    def test_dense_grid_exact_including_bbox_edges(self, spark):
        # deterministic dense grid INCLUDING the exact bbox corners and
        # edges (linspace endpoints) — the worst case for the anchor-
        # window validation
        lat0, lat1, lng0, lng1 = DEFAULT_BBOX
        glat, glng = np.meshgrid(
            np.linspace(lat0, lat1, 301), np.linspace(lng0, lng1, 301), indexing="ij"
        )
        lat, lng = glat.ravel(), glng.ravel()
        expected = h3core.encode(lat, lng, 9)
        pdf = pd.DataFrame({"lat": lat, "lng": lng})
        got = (
            hx.attach_h3_jvm(
                spark.createDataFrame(pdf), 9, DEFAULT_BBOX,
                lat=F.col("lat"), lng=F.col("lng"),
            )
            .toPandas()["h3"]
            .to_numpy()
        )
        assert (got != expected).sum() == 0

    def test_boundary_adjacent_points_exact(self, spark):
        # points jittered to within ~1e-9 deg of hex boundaries (where a
        # 1-ulp trig disagreement would flip the cell): take cell
        # boundary vertices of encoded cells and nudge inward/outward
        rng = np.random.default_rng(3)
        lat = rng.uniform(DEFAULT_BBOX[0] + 0.05, DEFAULT_BBOX[1] - 0.05, 2000)
        lng = rng.uniform(DEFAULT_BBOX[2] + 0.05, DEFAULT_BBOX[3] - 0.05, 2000)
        cells = h3core.encode(lat, lng, 9)
        bnd = h3core.cell_boundary(cells)  # (n, 6, 2) (lat, lng) vertices
        blat, blng = bnd[..., 0], bnd[..., 1]
        eps = rng.uniform(-1e-9, 1e-9, blat.shape)
        plat = np.clip(blat + eps, DEFAULT_BBOX[0], DEFAULT_BBOX[1]).ravel()
        plng = np.clip(blng + eps, DEFAULT_BBOX[2], DEFAULT_BBOX[3]).ravel()
        expected = h3core.encode(plat, plng, 9)
        pdf = pd.DataFrame({"lat": plat, "lng": plng})
        got = (
            hx.attach_h3_jvm(
                spark.createDataFrame(pdf), 9, DEFAULT_BBOX,
                lat=F.col("lat"), lng=F.col("lng"),
            )
            .toPandas()["h3"]
            .to_numpy()
            .astype(np.uint64)
        )
        # JVM Math.cos/sin and libm may differ by 1-2 ulp; at a
        # three-cell corner whose tie locus runs along the jitter
        # direction that can flip the tie-fix branch. The contract
        # (h3_expr docstring): such flips are (a) vanishingly rare even
        # on this adversarial vertex-hugging fixture, (b) always to a
        # cell ADJACENT to the expected one (the corner's other cells) —
        # never a teleport.
        bad = np.nonzero(got != expected)[0]
        assert len(bad) <= len(got) * 1e-3, len(bad)
        for i in bad:
            ring = h3core.kring(np.array([expected[i]], dtype=np.uint64), 1)
            assert got[i] in np.asarray(ring).ravel()


class TestRandomBboxes:
    def test_bit_identity_on_random_supported_bboxes(self, spark):
        # the support gate + chain are exercised on ONE bbox elsewhere;
        # here: random small bboxes across the globe. Wherever
        # supports_bbox accepts, the chain must be bit-identical to the
        # kernel on points INSIDE that bbox; rejected bboxes must fall
        # back (assign_h3 auto) and still match the kernel.
        rng = np.random.default_rng(17)
        accepted = rejected = 0
        for _ in range(14):
            lat0 = float(rng.uniform(-65, 60))
            lng0 = float(rng.uniform(-175, 170))
            bbox = (lat0, lat0 + float(rng.uniform(1, 5)),
                    lng0, lng0 + float(rng.uniform(1, 5)))
            res = int(rng.integers(8, 11))
            lat = rng.uniform(bbox[0], bbox[1], 4000)
            lng = rng.uniform(bbox[2], bbox[3], 4000)
            expected = h3core.encode(lat, lng, res)
            if not hx.supports_bbox(bbox, res):
                rejected += 1
                continue
            accepted += 1
            pdf = pd.DataFrame({"lat": lat, "lng": lng})
            got = (
                hx.attach_h3_jvm(
                    spark.createDataFrame(pdf), res, bbox,
                    lat=F.col("lat"), lng=F.col("lng"),
                )
                .toPandas()["h3"].to_numpy()
            )
            assert (got != expected).sum() == 0, (bbox, res)
        # the sample must actually exercise the fast path; mid-latitude
        # small bboxes are mostly face-interior
        assert accepted >= 5, (accepted, rejected)


class TestGlobalHybrid:
    def test_global_hybrid_exact_and_mostly_jvm(self, spark):
        # round 3: seam-spanning bboxes no longer send 100% of rows to
        # the Arrow kernel. The global per-row-face chain must (a) be
        # BIT-IDENTICAL to the kernel on every row it claims, (b) claim
        # the large majority of an area-uniform global sample, and
        # (c) via assign_h3 produce kernel-exact values for ALL rows
        # (NULL residue routed through Arrow).
        from hex2vec_spark.operators.spatial import assign_h3

        bbox = (-60.0, 60.0, -170.0, 170.0)
        ph, df = _phash_df(spark, 30_000, seed=5)
        expected = h3_from_phash_np(ph, 9, bbox)

        jvm_part = hx.attach_h3_from_phash_jvm_global(df, 9, bbox)
        rows = jvm_part.collect()
        got = {r["phash"]: r["h3"] for r in rows}
        n_jvm = sum(1 for v in got.values() if v is not None)
        assert n_jvm / len(rows) > 0.7, n_jvm / len(rows)
        exp_of = dict(zip(ph.tolist(), expected.astype(np.int64).tolist()))
        for p, v in got.items():
            if v is not None:
                assert v == exp_of[p], (p, v, exp_of[p])

        full = assign_h3(df, res=9, bbox=bbox)
        gf = {r["phash"]: r["h3"] for r in full.collect()}
        assert len(gf) == len(rows)
        for p, v in gf.items():
            assert v == exp_of[p]

    def test_home_pass_claims_foreign_residue_exactly(self, spark):
        # round-3 second JVM pass: the kernel's FOREIGN branch (home
        # re-chain + HOME_AXIAL consistency). On the global residue it
        # must claim the large majority (foreign-homed slots are ~19%
        # of global rows; the unclaimable rest is the kernel's own
        # seam-scan fraction ~3%) and be BIT-IDENTICAL on every claim.
        rng = np.random.default_rng(29)
        n = 40_000
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
        lng = rng.uniform(-180, 180, n)
        from hex2vec_spark.hexlib import h3core

        expected = h3core.encode(lat, lng, 9).astype(np.int64)
        pdf = pd.DataFrame({"i": np.arange(n), "lat": lat, "lng": lng})
        g1 = hx.attach_h3_jvm_global(spark.createDataFrame(pdf), 9)
        resid = g1.where("h3 is null").drop("h3")
        rows = hx.attach_h3_jvm_home(resid, 9).collect()
        claimed = [(r["i"], r["h3"]) for r in rows if r["h3"] is not None]
        assert len(claimed) >= 0.7 * len(rows), (len(claimed), len(rows))
        assert all(v == expected[i] for i, v in claimed)
        # combined python residue must be the kernel's seam-scan band
        assert (len(rows) - len(claimed)) / n < 0.05

    def test_global_hybrid_good_branch_has_no_python(self, spark):
        _, df = _phash_df(spark, 100)
        enc = hx.attach_h3_from_phash_jvm_global(df, 9, (-60.0, 60.0, -170.0, 170.0))
        good = enc.where(F.col("h3").isNotNull())
        plan = good._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestSupportGate:
    def test_global_bbox_rejected(self):
        assert not hx.supports_bbox((-60.0, 60.0, -170.0, 170.0), 8)

    def test_active_bbox_supported(self):
        assert hx.supports_bbox(DEFAULT_BBOX, 8)
        assert hx.supports_bbox(DEFAULT_BBOX, 9)

    def test_force_raises_on_unsupported(self, spark):
        from hex2vec_spark.operators.spatial import assign_h3

        _, df = _phash_df(spark, 10)
        with pytest.raises(ValueError):
            assign_h3(df, res=8, bbox=(-60.0, 60.0, -170.0, 170.0), jvm="force")

    def test_auto_falls_back_to_arrow_on_unsupported(self, spark):
        from hex2vec_spark.operators.spatial import assign_h3

        _, df = _phash_df(spark, 100)
        out = assign_h3(df, res=8, bbox=(-60.0, 60.0, -170.0, 170.0))
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted"
        )
        assert "ArrowEvalPython" in plan  # fell back to the kernel
        # and values match the kernel for the same bbox
        ph = np.array([r["phash"] for r in df.select("phash").collect()], dtype=np.int64)
        expected = h3_from_phash_np(ph, 8, (-60.0, 60.0, -170.0, 170.0))
        got = out.toPandas().set_index("phash")["h3"]
        assert (got.loc[ph].to_numpy() != expected).sum() == 0

    def test_unmapped_anchor_slot_raises_not_corrupts(self, spark):
        # round-3 advisor fix: a point landing in a res-0 slot the
        # sampled-grid validation never saw must RAISE at runtime, not
        # pack shiftleft(-1, 45) garbage into the cell id. Simulate the
        # gap by poisoning the support memo with an empty slot map.
        _, df = _phash_df(spark, 50)
        key = (tuple(DEFAULT_BBOX), 9)
        hx.jvm_encode_support(DEFAULT_BBOX, 9)
        face, bc_map = hx._SUPPORT_MEMO[key]
        try:
            hx._SUPPORT_MEMO[key] = (face, {})
            out = hx.attach_h3_from_phash_jvm(df, 9, DEFAULT_BBOX)
            with pytest.raises(Exception, match="anchor slot|USER_RAISED"):
                out.collect()
        finally:
            hx._SUPPORT_MEMO[key] = (face, bc_map)

    def test_temp_column_collision_raises(self, spark):
        _, df = _phash_df(spark, 5)
        with pytest.raises(ValueError):
            hx.attach_h3_jvm(
                df.withColumn("__h3e_a", F.lit(1.0)), 9, DEFAULT_BBOX,
                lat=F.lit(41.0), lng=F.lit(15.0),
            )

    def test_output_keeps_input_columns_only_plus_out(self, spark):
        _, df = _phash_df(spark, 5)
        out = hx.attach_h3_from_phash_jvm(df, 9, DEFAULT_BBOX, out="cell")
        assert out.columns == ["phash", "cell"]


class TestRound4AdvisorFixes:
    def _window_aks(self, lat, lng, res=9):
        # replicate the chain's anchor-key derivation on FACE f's frame
        # (the chain uses the validated face regardless of the point)
        from hex2vec_spark.hexlib import hexmath as hm
        from hex2vec_spark.hexlib import icosa as ic

        f, bc_map = hx.jvm_encode_support(DEFAULT_BBOX, res)
        lat = np.asarray(lat, dtype=np.float64)
        lng = np.asarray(lng, dtype=np.float64)
        xyz = ic.geo_to_xyz(lat, lng)
        xh, yh = ic.project(np.full(len(lat), f), xyz)
        xr, yr = hm.res0_to_res_xy(xh, yh, res)
        a, b = hm.hex2d_to_axial(xr, yr)
        a0, b0, _ = hm.chain_up_digits_axial(a, b, res)
        return f, bc_map, (a0 + 2) * 5 + (b0 + 2)

    def test_below_window_anchor_key_raises_not_wraps(self, spark):
        # round-4 advisor fix (medium): with ANSI off, element_at on a
        # NEGATIVE index reads from the array END, so a point whose
        # res-0 anchor key falls BELOW the window (ak in [-25,-2]) used
        # to resolve to the slot at dense[25+ak] on the opposite window
        # edge — if that slot was mapped, a silently WRONG base cell was
        # packed. Build exactly that scenario: find an out-of-window
        # point with a numerically stable negative ak, poison the
        # support memo so its wrap target IS mapped, and require the
        # encode to RAISE (the old code returned a corrupt id here).
        res = 9
        # ring of points outside but near the bbox (stable projections)
        la0, la1, lo0, lo1 = DEFAULT_BBOX
        cand_lat, cand_lng = [], []
        for dla in np.linspace(-40.0, 40.0, 41):
            for dlo in np.linspace(-40.0, 40.0, 41):
                la, lo = (la0 + la1) / 2 + dla, (lo0 + lo1) / 2 + dlo
                if not (la0 <= la <= la1 and lo0 <= lo <= lo1):
                    cand_lat.append(la)
                    cand_lng.append(lo)
        f, bc_map, ak = self._window_aks(cand_lat, cand_lng, res)
        # stability: same ak under 1e-5-degree perturbation
        _, _, ak_p = self._window_aks(
            np.array(cand_lat) + 1e-5, np.array(cand_lng) + 1e-5, res
        )
        pick = np.nonzero((ak >= -23) & (ak <= -2) & (ak == ak_p))[0]
        assert len(pick) > 0, "no below-window candidate point found"
        i = int(pick[0])
        wrap_slot = int(25 + ak[i])          # 0-based slot old code read
        key = (tuple(DEFAULT_BBOX), res)
        hx.jvm_encode_support(DEFAULT_BBOX, res)
        face, orig = hx._SUPPORT_MEMO[key]
        poisoned = dict(orig)
        poisoned[wrap_slot] = next(iter(orig.values()))  # wrap target mapped
        try:
            hx._SUPPORT_MEMO[key] = (face, poisoned)
            # lat/lng as COLUMNS, not literals: constant inputs make
            # every chain step foldable-cheap, so CollapseProject
            # merges the whole Project stack with exponential alias
            # substitution (observed: optimizer pinned >13 min on this
            # one-row plan). Column inputs match the production shape,
            # where the multiply-referenced steps stay attributes.
            df = spark.createDataFrame(
                [(float(cand_lat[i]), float(cand_lng[i]))], "lat double, lng double"
            )
            out = hx.attach_h3_jvm(df, res, DEFAULT_BBOX, lat="lat", lng="lng")
            with pytest.raises(Exception, match="anchor slot|USER_RAISED"):
                out.collect()
        finally:
            hx._SUPPORT_MEMO[key] = (face, orig)

    def test_face_tie_gate_null_routes(self, spark):
        # round-4 advisor fix: an EXACT two-way tie at the max face dot
        # must fail the `safe` gate (the f32 kernel argmax may pick the
        # other face). (a) wiring: the emitted global chain carries the
        # unique-max SIZE(FILTER(...)) = 1 term; (b) semantics: the
        # predicate template is FALSE on a tie, where the old
        # margin-only form measured against the THIRD-largest dot and
        # passed.
        _, df = _phash_df(spark, 3)
        g = hx.attach_h3_from_phash_jvm_global(df, 9, (-60.0, 60.0, -170.0, 170.0))
        s = g._jdf.queryExecution().analyzed().toString().lower()
        assert "size(filter" in s
        row = spark.sql(
            "SELECT (((mx - ARRAY_MAX(FILTER(d, v -> v < mx))) > 1e-5D)"
            "  AND SIZE(FILTER(d, v -> v = mx)) = 1) AS safe "
            "FROM (SELECT ARRAY(0.9D, 0.9D, 0.1D) AS d, 0.9D AS mx)"
        ).collect()[0]
        assert row["safe"] is False


class TestEncodeMemoHygiene:
    # round-4 advisor fix: the encode-plan memo must not pin entries for
    # the process lifetime — weak keying, stopped-session eviction, LRU cap
    class _SC:
        def __init__(self):
            self._jsc = object()

    class _Sess:
        def __init__(self):
            self.sparkContext = TestEncodeMemoHygiene._SC()

    def test_cap_lru_and_stopped_session_eviction(self):
        from hex2vec_spark.operators import spatial as sp

        s = self._Sess()
        cap = sp._ENCODE_MEMO_CAP
        for i in range(cap + 5):
            sp._memo_put(s, ("k", i), f"plan{i}")
        assert len(sp._ENCODE_MEMO[s]) == cap
        assert sp._memo_get(s, ("k", 0)) is None           # LRU-evicted
        assert sp._memo_get(s, ("k", cap + 4)) == f"plan{cap + 4}"
        # LRU refresh: touching an old key keeps it through new puts
        assert sp._memo_get(s, ("k", 5)) == "plan5"
        sp._memo_put(s, ("k", cap + 5), "plannew")
        assert sp._memo_get(s, ("k", 5)) == "plan5"
        # stopped session: entries dropped on next access
        s.sparkContext._jsc = None
        assert sp._memo_get(s, ("k", cap + 4)) is None
        assert s not in sp._ENCODE_MEMO

    def test_weak_keying_releases_dead_sessions(self):
        import gc

        from hex2vec_spark.operators import spatial as sp

        s = self._Sess()
        sp._memo_put(s, "k", "plan")
        assert sp._memo_get(s, "k") == "plan"
        ref = __import__("weakref").ref(s)
        del s
        gc.collect()
        assert ref() is None  # the memo held no strong reference
