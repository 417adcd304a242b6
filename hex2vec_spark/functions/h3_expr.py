"""JVM-side (whole-stage-codegen) H3 encode for face-interior regions.

The general encode path is an Arrow pandas UDF over the NumPy kernel
(functions/h3_fns.py) — needed for icosahedron seam handling on global
data. But for a FACE-INTERIOR bbox (the engine's active region, and the
natural shape of a per-city job like the reference's,
make_dataset.py:96-99) the kernel reduces to

    gnomonic projection onto ONE face -> hex rounding -> aperture-7
    digit chain -> bit packing

every step closed-form float64/int64 arithmetic. This module emits that
arithmetic as Catalyst expressions (pyspark.sql built-ins only), so the
hot path runs inside whole-stage codegen with NO Python workers. The
Arrow-UDF flagship pays a JVM task thread + a Python worker per task —
~64 runnable threads on this 32-core host, measured 0.44 scaling
efficiency local[8]->local[32]; the JVM expression removes the Python
side entirely, which is what the north_rule's >=0.8 two-cluster-size
scaling criterion needs.

Structure note: the digit chain is emitted as one ``select`` PER
RESOLUTION STEP, each step reading the previous step's *attributes*.
Column objects share subtrees as a Python DAG, but converting to Catalyst
serializes a TREE — inlining 9 chained axial-rounds into one Column
multiplies subtree copies ~8x per level (~8^9 nodes: measured
driver OOM). Per-level projections keep the total plan linear in res;
Catalyst's CollapseProject keeps multi-referenced non-cheap aliases as
separate projects, so no re-explosion happens at optimization time.

Exactness: the expressions replicate the NumPy kernel's float64
operation ORDER (same association, same literals), so results are
bit-identical to ``h3core.encode`` wherever encode's face-interior fast
path applies; ``jvm_encode_support`` validates that precondition on a
dense grid before the expression is used, and tests/test_jvm_encode.py
asserts 0 mismatches against the Arrow kernel on the real input
distribution (600k rows across res 8/9/10). The one FP caveat is trig:
JVM Math.cos/sin and libm both claim <=1 ulp but differ, leaving xr/yr
1-2 ulp apart (measured). That flips a cell only inside an
O(ulp)-width band (~1e-12 cube units ~ 4e-16 deg at res 9) around the
three-cell corner-tie locus where the axial tie-fix comparison
(dq >= dy) sits exactly at equality — and the flip is always to one of
the corner's OTHER cells, never a teleport. tests/test_jvm_encode.py
pins both properties on an adversarial vertex-hugging fixture.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from ..hexlib import hexmath as hm
from ..hexlib import icosa as ic

_SQRT3 = float(np.sqrt(3.0))
_D = F.lit


# ------------------------------------------------------------- validation

_SUPPORT_MEMO: dict[tuple, tuple[int, dict[int, int]]] = {}


def jvm_encode_support(bbox: tuple[float, float, float, float], res: int,
                       n_grid: int = 400) -> tuple[int, dict[int, int]]:
    """Validate that every point of ``bbox`` takes encode()'s face-interior
    fast path on a single face, i.e. the JVM expression is exact there.

    Checks on a dense (n_grid x n_grid) grid:
      * one nearest face for the whole bbox (float32 argmax, matching
        h3core.encode);
      * every chain lands in the res-0 anchor window with a known base
        cell;
      * every such base cell is HOMED on that face (encode's `same`
        branch — no foreign re-chain, no seam scan).

    Returns (face, {anchor_key: base_cell}); raises ValueError if any
    check fails (callers fall back to the Arrow-UDF kernel).
    """
    key = (tuple(bbox), res)
    if key in _SUPPORT_MEMO:
        return _SUPPORT_MEMO[key]
    lat0, lat1, lng0, lng1 = bbox
    glat, glng = np.meshgrid(
        np.linspace(lat0, lat1, n_grid), np.linspace(lng0, lng1, n_grid), indexing="ij"
    )
    lat, lng = glat.ravel(), glng.ravel()
    xyz = ic.geo_to_xyz(lat, lng)
    face = np.argmax(xyz.astype(np.float32) @ ic.FACE_CENTER.astype(np.float32).T, axis=1)
    faces = np.unique(face)
    if len(faces) != 1:
        raise ValueError(f"bbox spans faces {faces.tolist()} — JVM encode needs one face")
    f = int(faces[0])
    xh, yh = ic.project(np.full(len(lat), f), xyz)
    xr, yr = hm.res0_to_res_xy(xh, yh, res)
    a, b = hm.hex2d_to_axial(xr, yr)
    a0, b0, _ = hm.chain_up_digits_axial(a, b, res)
    if not (np.all(np.abs(a0) <= 2) and np.all(np.abs(b0) <= 2)):
        raise ValueError("bbox chain leaves the res-0 anchor window")
    keys = (a0 + 2) * 5 + (b0 + 2)
    bc_map: dict[int, int] = {}
    for k in np.unique(keys):
        bc = int(ic.ANCHOR_KEY_BC[f, int(k)])
        if bc < 0:
            raise ValueError("bbox touches a res-0 slot with no base cell")
        if int(ic.HOME_FACE[bc]) != f:
            raise ValueError(
                f"base cell {bc} homed on face {int(ic.HOME_FACE[bc])} != {f} "
                "(seam region — JVM fast path not exact)"
            )
        bc_map[int(k)] = bc
    _SUPPORT_MEMO[key] = (f, bc_map)
    return f, bc_map


def supports_bbox(bbox: tuple[float, float, float, float], res: int) -> bool:
    """True if the JVM fast path is exact for (bbox, res)."""
    try:
        jvm_encode_support(bbox, res)
        return True
    except ValueError:
        return False


# ------------------------------------------------------------- expression

def _axial_round_cols(fa: Column, fb: Column) -> tuple[Column, Column]:
    """Catalyst replica of hexmath.axial_round (same op order: q=fa-fb,
    r=fb, y=-q-r, rint, tie-fix). Integer-valued doubles in/out;
    F.rint == Math.rint == np.rint (half-to-even)."""
    q = fa - fb
    r = fb
    y = (-q) - r
    rq, ry, rr = F.rint(q), F.rint(y), F.rint(r)
    dq, dy, dr = F.abs(rq - q), F.abs(ry - y), F.abs(rr - r)
    fix_q = (dq >= dy) & (dq >= dr)
    fix_y = (~fix_q) & (dy >= dr)
    rq2 = F.when(fix_q, -(ry + rr)).otherwise(rq)
    rr2 = F.when(~(fix_q | fix_y), -(rq2 + ry)).otherwise(rr)
    return rq2 + rr2, rr2


# --- integer coset form of the aperture-7 digit chain.
#
# A res-r lattice point c relates to its parent p as c = M p + d, where
# M is the (det-7) down_b/down_a matrix and d one of the 7 axial digit
# offsets. The offsets are the 7 distinct cosets of the M-lattice, so d
# is identified by a LINEAR residue: alpha.(M z) == 0 (mod 7) for all z
# with alpha = (1,-3) for M_b (odd levels) and (1,2) for M_a (even), so
#
#   odd:  digit = LUT_b[(a - 3b) mod 7] ;  even: digit = LUT_a[(a + 2b) mod 7]
#
# and the parent is then an EXACT integer division by 7 — no float
# rounding, no tie-fix CASE. hexmath.chain_up_digits_axial's float chain
# necessarily finds the same (p, d): if its rounded parent differed from
# the coset parent, c - M p would fall outside the 7 offset cosets and
# the digit lookup would be invalid (its round-trip property tests prove
# it never is). _coset_luts() additionally asserts the equivalence on
# every residue at build time.
_AX_OFF = [(int(v[0]), int(v[1])) for v in hm._AXIAL_OF_DIGIT]  # digit -> (da, db)


def _coset_luts() -> tuple[list[int], list[int]]:
    lut_b = [-1] * 7
    lut_a = [-1] * 7
    for d, (da, db) in enumerate(_AX_OFF):
        lut_b[(da - 3 * db) % 7] = d
        lut_a[(da + 2 * db) % 7] = d
    assert sorted(lut_b) == list(range(7)) and sorted(lut_a) == list(range(7)), (
        "digit offsets are not a full residue system — coset chain invalid"
    )
    return lut_b, lut_a


_LUT_B, _LUT_A = _coset_luts()

# temp column names (reserved __h3e_ prefix; dropped before returning)
_TA, _TB = "__h3e_a", "__h3e_b"


def attach_h3_jvm(
    df: DataFrame,
    res: int,
    bbox: tuple[float, float, float, float],
    lat: Column | None = None,
    lng: Column | None = None,
    out: str = "h3",
) -> DataFrame:
    """Append ``out`` = full H3 cell id (LongType) computed entirely
    JVM-side from degree columns ``lat``/``lng``. ``bbox`` must pass
    :func:`jvm_encode_support` (raises ValueError otherwise; callers fall
    back to the Arrow kernel).

    Reference semantics: h3.geo_to_h3 (kraina-ai/hex2vec
    src/data/make_dataset.py:96-99) — here as ~room 200 codegen'd scalar
    ops across res+2 collapsible projections.
    """
    if lat is None:
        lat = F.col("lat")
    if lng is None:
        lng = F.col("lng")
    face, bc_map = jvm_encode_support(bbox, res)
    base_cols = list(df.columns)
    # per-level digit temps are generated as __h3e_d{r}; guard the whole
    # reserved prefix, not just the fixed names (round-2 review: a
    # colliding input column would otherwise surface later as an opaque
    # ambiguous-reference AnalysisException)
    for t in base_cols:
        if t.startswith("__h3e_"):
            raise ValueError(
                f"column {t} collides with the encode temps (reserved prefix __h3e_)"
            )

    d2r = float(np.pi / 180.0)  # np.radians(x) == x * (pi/180) (verified)
    lat_r = lat * _D(d2r)
    lng_r = lng * _D(d2r)
    cl = F.cos(lat_r)
    x3 = cl * F.cos(lng_r)
    y3 = cl * F.sin(lng_r)
    z3 = F.sin(lat_r)

    cx, cy, cz = (float(v) for v in ic.FACE_CENTER[face])
    t1x, t1y, t1z = (float(v) for v in ic.FACE_T1[face])
    t2x, t2y, t2z = (float(v) for v in ic.FACE_T2[face])
    # icosa.project: d = xyz . c ; p = xyz / d ; rel = p - c ;
    # x = (rel . t1) / RES0_U (einsum sums k=0,1,2 left-to-right)
    d = x3 * _D(cx) + y3 * _D(cy) + z3 * _D(cz)
    px = x3 / d - _D(cx)
    py = y3 / d - _D(cy)
    pz = z3 / d - _D(cz)
    u0 = float(ic.RES0_U)
    xh = (px * _D(t1x) + py * _D(t1y) + pz * _D(t1z)) / _D(u0)
    yh = (px * _D(t2x) + py * _D(t2y) + pz * _D(t2z)) / _D(u0)

    # hexmath.res0_to_res_xy
    s = float(hm.SQRT7 ** res)
    rot = hm.class_rotation(res)
    if rot == 0.0:
        xr, yr = xh * _D(s), yh * _D(s)
    else:
        c_, sn = float(np.cos(rot)), float(np.sin(rot))
        xr = _D(s) * (_D(c_) * xh - _D(sn) * yh)
        yr = _D(s) * (_D(sn) * xh + _D(c_) * yh)

    # project xr/yr to ATTRIBUTES before the first axial_round: the
    # tie-fix CASE references its inputs ~20x, and inlining the trig tree
    # there makes every row evaluate cos/sin dozens of times (measured
    # 4.1s vs 0.26s per 10^6 rows).
    #
    cur = df.select("*", xr.alias("__h3e_xr"), yr.alias("__h3e_yr"))
    xr, yr = F.col("__h3e_xr"), F.col("__h3e_yr")

    # hexmath.hex2d_to_axial -> res-level axial coords, projected so the
    # chain below reads attributes (see module docstring)
    a0c, b0c = _axial_round_cols(xr + yr / _D(_SQRT3), (_D(2.0) * yr) / _D(_SQRT3))
    cur = cur.select(*base_cols, a0c.alias(_TA), b0c.alias(_TB))

    # hexmath.chain_up_digits_axial in COSET form (see block comment at
    # _coset_luts): digit from a linear residue mod 7, parent via EXACT
    # integer division — integer-valued doubles throughout, so every op
    # here is exact float64 arithmetic (x/7.0 of an exact multiple of 7
    # is exact by correctly-rounded division) and the result equals the
    # float tie-fix chain by the coset-uniqueness argument. One
    # projection per aperture-7 step keeps the Catalyst plan linear in
    # res (see module docstring); digits land straight in their 3-bit
    # slots.
    _RS = "__h3e_rs"
    dig_cols: list[str] = []
    for r in range(res, 0, -1):
        a, b = F.col(_TA), F.col(_TB)
        if r % 2 == 1:  # inverse of down_b: M_b^-1 = 1/7 [[2,1],[-1,3]]
            resid = F.pmod(a - _D(3.0) * b, _D(7.0)).cast("int")
            lut = _LUT_B
        else:  # inverse of down_a: M_a^-1 = 1/7 [[3,-1],[1,2]]
            resid = F.pmod(a + _D(2.0) * b, _D(7.0)).cast("int")
            lut = _LUT_A
        dig_of = F.array(*[F.lit(d) for d in lut])
        da_of = F.array(*[_D(float(_AX_OFF[d][0])) for d in lut])
        db_of = F.array(*[_D(float(_AX_OFF[d][1])) for d in lut])
        cur = cur.select("*", resid.alias(_RS))
        a, b, rs = F.col(_TA), F.col(_TB), F.col(_RS) + F.lit(1)
        ra = a - F.element_at(da_of, rs)  # a - da: the parent-lattice point
        rb = b - F.element_at(db_of, rs)
        if r % 2 == 1:
            pa = (_D(2.0) * ra + rb) / _D(7.0)
            pb = ((-ra) + _D(3.0) * rb) / _D(7.0)
        else:
            pa = (_D(3.0) * ra - rb) / _D(7.0)
            pb = (ra + _D(2.0) * rb) / _D(7.0)
        dig = F.shiftleft(
            F.element_at(dig_of, rs).cast("long"), 3 * (15 - r)
        )
        dname = f"__h3e_d{r}"
        dig_cols.append(dname)
        cur = cur.select(*base_cols, *dig_cols[:-1], dig.alias(dname),
                         pa.alias(_TA), pb.alias(_TB))

    # base cell from the res-0 anchor key (validated closed set): a
    # dense 25-slot literal-array lookup — non-nullable (no IsNotNull
    # materializes on the join key) and a single small tree, vs nested
    # whens that would duplicate the anchor_key expression per entry
    a, b = F.col(_TA), F.col(_TB)
    anchor_key = ((a + _D(2.0)) * _D(5.0) + b + _D(2.0)).cast("int")
    dense = [-1] * 25
    for k, v in bc_map.items():
        dense[k] = v
    bc: Column = F.element_at(
        F.array(*[F.lit(v).cast("long") for v in dense]), anchor_key + F.lit(1)
    )

    # h3core.pack: mode 1, res bits, 7-fill for unused digit slots
    n_fill = 15 - res
    fill = (1 << (3 * n_fill)) - 1 if n_fill else 0
    const = (1 << 59) | (res << 52) | fill
    h = F.lit(const).cast("long").bitwiseOR(F.shiftleft(bc, 45))
    for dname in dig_cols:
        h = h.bitwiseOR(F.col(dname))
    # PUSHDOWN FENCE on the OUTPUT projection: the spark_partition_id()
    # guard (always true; the kernel never yields null) makes this alias
    # NON-DETERMINISTIC, so PushPredicateThroughNonJoin cannot move any
    # predicate above it (a join's IsNotNull, a user filter on h3) into
    # the chain below. Without the fence the rule SUBSTITUTES each
    # level's alias trees into the predicate — ~3x growth per level, so
    # the optimizer hangs/OOMs at res 8-9 (observed live: trimAliases
    # spinning, then Java heap exhaustion). Notes from the debugging:
    #   * the fence must sit at the TOP — fencing a lower level still
    #     lets the predicate explode through the levels above it;
    #   * rand() does NOT work as the guard: Spark 4's OptimizeRand
    #     folds `rand() >= -1` to TRUE and the fence dissolves;
    #   * explode(array(h)) does NOT work either: InferFiltersFromGenerate
    #     plants a `size(_t) > 0` filter BELOW the Generate, right on
    #     top of the chain — same explosion.
    # Filters above still evaluate (same rows, linear cost) — they just
    # stay above the chain; pipelines should filter source columns
    # BEFORE assign_h3, as the engine's own plans do. coalesce makes the
    # key non-nullable, so joins don't even materialize an IsNotNull.
    fenced = F.coalesce(
        F.when(F.spark_partition_id() >= F.lit(-1), h), F.lit(-1)
    )
    return cur.select(*base_cols, fenced.alias(out))


def attach_h3_from_phash_jvm(
    df: DataFrame, res: int, bbox: tuple[float, float, float, float], out: str = "h3"
) -> DataFrame:
    """phash -> H3 cell id, fully JVM-side: the documented geotag
    convention (functions/h3_fns.geotag_np, FIXTURES.md §1) as exact
    integer/double arithmetic feeding :func:`attach_h3_jvm`."""
    lat0, lat1, lng0, lng1 = bbox
    ph = F.col("phash")
    u_hi = F.shiftrightunsigned(ph, 32).cast("double")
    u_lo = ph.bitwiseAND(F.lit(0xFFFFFFFF)).cast("double")
    two32 = float(2 ** 32)
    lat = _D(float(lat0)) + (u_hi / _D(two32)) * _D(float(lat1 - lat0))
    lng = _D(float(lng0)) + (u_lo / _D(two32)) * _D(float(lng1 - lng0))
    return attach_h3_jvm(df, res, bbox, lat=lat, lng=lng, out=out)
