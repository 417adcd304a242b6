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

Structure note (round 3): the whole chain is ONE ``selectExpr`` whose
intermediates are LATERAL COLUMN ALIASES; the analyzer rewrites them
into nested Projects where every multiply-referenced step stays an
attribute (inlining 9 chained axial-rounds into one expression would
multiply subtree copies ~8x per level — ~8^9 nodes, measured driver
OOM in round 1). Per-level alias ranks keep the plan linear in res;
Catalyst's CollapseProject keeps multi-referenced non-cheap aliases as
separate projects, so no re-explosion happens at optimization time.
Two sizing constraints, both learned the hard way, are encoded in
``attach_h3_jvm``: the analyzer's fixed-point iteration cap (one
lateral rank resolved per pass) and the fused-stage JIT bytecode
budget (see the OPERATOR-COUNT BUDGET comment).

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
from pyspark.sql import Column, DataFrame

from ..hexlib import hexmath as hm
from ..hexlib import icosa as ic

_SQRT3 = float(np.sqrt(3.0))


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


def _dlit(v: float) -> str:
    """Exact double literal as SQL text. ``repr`` is the shortest
    round-trip form (float(repr(x)) == x) and Java's parseDouble is
    correctly rounded, so the cast reproduces the identical bits; the
    cast of a literal is constant-folded, so no runtime cost."""
    return f"CAST('{v!r}' AS DOUBLE)"


def attach_h3_jvm(
    df: DataFrame,
    res: int,
    bbox: tuple[float, float, float, float],
    lat: Column | str | None = None,
    lng: Column | str | None = None,
    out: str = "h3",
) -> DataFrame:
    """Append ``out`` = full H3 cell id (LongType) computed entirely
    JVM-side from degree columns ``lat``/``lng``. ``bbox`` must pass
    :func:`jvm_encode_support` (raises ValueError otherwise; callers fall
    back to the Arrow kernel).

    Reference semantics: h3.geo_to_h3 (kraina-ai/hex2vec
    src/data/make_dataset.py:96-99) — here as ~200 codegen'd scalar ops.

    Emission strategy (round 3): the whole chain is ONE ``selectExpr``
    whose intermediate steps are LATERAL COLUMN ALIASES. The analyzer's
    lateral-alias rule rewrites them into the same nested-Project
    structure the round-2 code built by hand with ~20 chained
    ``select`` calls — every multiply-referenced step stays an
    attribute, so no subtree duplication — but plan construction is one
    py4j round-trip + one analysis pass instead of ~5,800 Column-op
    round-trips + 21 eager analyses (measured 1.7-2.5 s per query,
    BENCH_r02 hex_features/context_pairs regression; now ~0.2 s).
    """
    face, bc_map = jvm_encode_support(bbox, res)
    base_cols = list(df.columns)
    # temps are generated under the reserved __h3e_ prefix; guard the
    # whole prefix (round-2 review: a colliding input column would
    # otherwise surface later as an opaque ambiguous-reference error)
    for t in base_cols:
        if t.startswith("__h3e_"):
            raise ValueError(
                f"column {t} collides with the encode temps (reserved prefix __h3e_)"
            )
    # accept arbitrary lat/lng Columns by projecting them to attributes
    # first (one cheap extra select); None means the default columns,
    # str args are SQL fragments used verbatim
    if lat is None:
        lat = "`lat`"
    if lng is None:
        lng = "`lng`"
    if isinstance(lat, str) and isinstance(lng, str):
        lat_sql, lng_sql = lat, lng
        cur = df
    else:
        cur = df.select("*", lat.alias("__h3e_lat"), lng.alias("__h3e_lng"))
        lat_sql, lng_sql = "`__h3e_lat`", "`__h3e_lng`"

    ex: list[str] = []

    def step(name: str, sql: str) -> str:
        ex.append(f"({sql}) AS `{name}`")
        return f"`{name}`"

    # dense base-cell slot map with the RUNTIME GUARD (round-3 advisor
    # fix): jvm_encode_support validates the bbox on a sampled grid, so
    # a sub-grid-spacing sliver could in principle land in an
    # UNVALIDATED slot at runtime; the old code packed
    # shiftleft(-1, 45) garbage silently. Now: an in-window but
    # unmapped slot (-1) raises via RAISE_ERROR, and an out-of-window
    # anchor key raises via ANSI ELEMENT_AT bounds (with ANSI off,
    # element_at yields NULL, `NULL >= 0` is not true, and the same
    # RAISE_ERROR branch fires) — corrupt ids can never escape.
    dense = [-1] * 25
    for k, v in bc_map.items():
        dense[k] = v
    bc_arr = "ARRAY(" + ", ".join(f"CAST({v} AS BIGINT)" for v in dense) + ")"
    err = ("h3 jvm encode: point maps to a res-0 anchor slot outside the "
           "validated bbox support (sampled-grid gap) - widen the bbox or "
           "use the Arrow kernel path")

    def bc_of(ak: str) -> str:
        # BOUND-CHECK before ELEMENT_AT (round-4 advisor fix): with ANSI
        # off, element_at on a NEGATIVE index reads from the array END,
        # so an anchor key in [-25,-2] would silently resolve to a slot
        # on the opposite window edge; if that slot were mapped (>=0)
        # the guard below would pass and a WRONG base cell escape. The
        # explicit range gate routes every out-of-window key to -1 so
        # the RAISE_ERROR branch fires, matching the guard's contract.
        raw = (f"(CASE WHEN ({ak}) >= 0 AND ({ak}) <= 24 "
               f"THEN ELEMENT_AT({bc_arr}, ({ak}) + 1) "
               f"ELSE CAST(-1 AS BIGINT) END)")
        return (f"CASE WHEN {raw} >= 0 THEN {raw} "
                f"ELSE CAST(RAISE_ERROR('{err}') AS BIGINT) END")

    cx, cy, cz = (_dlit(float(v)) for v in ic.FACE_CENTER[face])
    t1x, t1y, t1z = (_dlit(float(v)) for v in ic.FACE_T1[face])
    t2x, t2y, t2z = (_dlit(float(v)) for v in ic.FACE_T2[face])
    hh = _emit_h3_chain(
        step, res, lat_sql, lng_sql,
        (cx, cy, cz, t1x, t1y, t1z, t2x, t2y, t2z), bc_of,
    )
    # PUSHDOWN FENCE on the OUTPUT alias: the spark_partition_id()
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
    fence = (f"COALESCE(CASE WHEN SPARK_PARTITION_ID() >= -1 THEN {hh} END, "
             f"CAST(-1 AS BIGINT))")
    quoted_base = [f"`{c}`" for c in base_cols]
    full = cur.selectExpr(*quoted_base, *ex, f"({fence}) AS `{out}`")
    return full.select(*base_cols, out)


def _emit_h3_chain(
    step,
    res: int,
    lat_sql: str,
    lng_sql: str,
    consts: tuple[str, str, str, str, str, str, str, str, str],
    bc_of,
    pre: str = "",
    xyz: tuple[str, str, str] | None = None,
) -> str:
    """Emit the encode arithmetic as lateral-alias SQL via ``step``;
    returns the reference to the packed (unfenced) cell-id alias.

    ``consts`` are SQL fragments for the face frame (literals on the
    bbox path, per-row ELEMENT_AT lookups on the global path); ``bc_of``
    maps the anchor-key fragment to the base-cell fragment (raise-guard
    vs NULL-route); ``pre`` suffixes temp names so two chains can
    coexist in one query if ever needed; ``xyz`` supplies precomputed
    unit-sphere coordinate fragments (the global path shares them with
    its face argmax instead of re-deriving trig here).
    """

    def sub(sql: str) -> str:
        # inline subexpression (textual duplication is fine: codegen's
        # subexpression elimination dedupes at runtime, and keeping
        # these OUT of the alias list keeps the fused stage's operator
        # count low — see the JIT note below)
        return f"({sql})"

    cx, cy, cz, t1x, t1y, t1z, t2x, t2y, t2z = consts
    # OPERATOR-COUNT BUDGET: every lateral-alias rank below becomes one
    # Project operator in the SAME whole-stage-codegen stage as the
    # downstream join/explode/aggregate. Past ~25 operators the stage's
    # generated aggregate method crosses HotSpot's 8,000-byte JIT limit
    # and the WHOLE stage runs interpreted (observed: 37 ranks -> a
    # 9,980-byte method, "too long to be JIT compiled", flagship 3.4 s
    # -> 9.6 s). So the trig/projection prologue and the axial round
    # are emitted as TWO dense ranks (inline subtrees, CSE'd at
    # runtime) and only the aperture-7 chain gets per-level ranks.
    d2r = float(np.pi / 180.0)  # np.radians(x) == x * (pi/180) (verified)
    if xyz is None:
        latr = sub(f"({lat_sql}) * {_dlit(d2r)}")
        lngr = sub(f"({lng_sql}) * {_dlit(d2r)}")
        cl = sub(f"COS({latr})")
        x3 = sub(f"{cl} * COS({lngr})")
        y3 = sub(f"{cl} * SIN({lngr})")
        z3 = sub(f"SIN({latr})")
    else:
        x3, y3, z3 = xyz

    # icosa.project: d = xyz . c ; p = xyz / d ; rel = p - c ;
    # x = (rel . t1) / RES0_U (einsum sums k=0,1,2 left-to-right)
    d = sub(f"{x3} * {cx} + {y3} * {cy} + {z3} * {cz}")
    px = sub(f"{x3} / {d} - {cx}")
    py = sub(f"{y3} / {d} - {cy}")
    pz = sub(f"{z3} / {d} - {cz}")
    u0 = float(ic.RES0_U)
    xh = sub(f"({px} * {t1x} + {py} * {t1y} + {pz} * {t1z}) / {_dlit(u0)}")
    yh = sub(f"({px} * {t2x} + {py} * {t2y} + {pz} * {t2z}) / {_dlit(u0)}")

    # hexmath.res0_to_res_xy — rank 1: xr/yr become ATTRIBUTES here, so
    # the axial round below never re-evaluates the trig tree
    s = float(hm.SQRT7 ** res)
    rot = hm.class_rotation(res)
    if rot == 0.0:
        xr = step(f"__h3e_xr{pre}", f"{xh} * {_dlit(s)}")
        yr = step(f"__h3e_yr{pre}", f"{yh} * {_dlit(s)}")
    else:
        c_, sn = float(np.cos(rot)), float(np.sin(rot))
        xr = step(f"__h3e_xr{pre}", f"{_dlit(s)} * ({_dlit(c_)} * {xh} - {_dlit(sn)} * {yh})")
        yr = step(f"__h3e_yr{pre}", f"{_dlit(s)} * ({_dlit(sn)} * {xh} + {_dlit(c_)} * {yh})")

    # hexmath.hex2d_to_axial + axial_round (same op order: q=fa-fb,
    # r=fb, y=-q-r, rint, tie-fix; RINT == Math.rint == np.rint,
    # half-to-even) — rank 2: one dense pair of aliases; every inline
    # subtree bottoms out at the xr/yr attributes.
    sq3 = _dlit(_SQRT3)
    fa = sub(f"{xr} + {yr} / {sq3}")
    fb = sub(f"({_dlit(2.0)} * {yr}) / {sq3}")
    q = sub(f"{fa} - {fb}")
    rv = sub(f"{fb}")
    yv = sub(f"(- {q}) - {rv}")
    rq = sub(f"RINT({q})")
    ry = sub(f"RINT({yv})")
    rr = sub(f"RINT({rv})")
    dq = sub(f"ABS({rq} - {q})")
    dy = sub(f"ABS({ry} - {yv})")
    dr = sub(f"ABS({rr} - {rv})")
    fixq = sub(f"({dq} >= {dy}) AND ({dq} >= {dr})")
    fixy = sub(f"(NOT {fixq}) AND ({dy} >= {dr})")
    rq2 = sub(f"CASE WHEN {fixq} THEN -({ry} + {rr}) ELSE {rq} END")
    rr2 = sub(f"CASE WHEN NOT ({fixq} OR {fixy}) THEN -({rq2} + {ry}) ELSE {rr} END")
    a_cur = step(f"__h3e_a{res}{pre}", f"{rq2} + {rr2}")
    b_cur = step(f"__h3e_b{res}{pre}", f"{rr2}")

    # hexmath.chain_up_digits_axial in COSET form (see block comment at
    # _coset_luts): digit from a linear residue mod 7, parent via EXACT
    # integer division — integer-valued doubles throughout, so every op
    # here is exact float64 arithmetic (x/7.0 of an exact multiple of 7
    # is exact by correctly-rounded division) and the result equals the
    # float tie-fix chain by the coset-uniqueness argument. Digits land
    # straight in their 3-bit slots.
    dig_names: list[str] = []
    for r in range(res, 0, -1):
        if r % 2 == 1:  # inverse of down_b: M_b^-1 = 1/7 [[2,1],[-1,3]]
            resid = f"CAST(PMOD({a_cur} - {_dlit(3.0)} * {b_cur}, {_dlit(7.0)}) AS INT)"
            lut = _LUT_B
        else:  # inverse of down_a: M_a^-1 = 1/7 [[3,-1],[1,2]]
            resid = f"CAST(PMOD({a_cur} + {_dlit(2.0)} * {b_cur}, {_dlit(7.0)}) AS INT)"
            lut = _LUT_A
        dig_of = "ARRAY(" + ", ".join(str(dv) for dv in lut) + ")"
        da_of = "ARRAY(" + ", ".join(_dlit(float(_AX_OFF[dv][0])) for dv in lut) + ")"
        db_of = "ARRAY(" + ", ".join(_dlit(float(_AX_OFF[dv][1])) for dv in lut) + ")"
        # lateral-alias resolution peels ONE dependency rank per analyzer
        # fixed-point iteration; the Resolution batch caps at
        # spark.sql.analyzer.maxIterations (default 100). Keep this loop
        # at TWO ranks per level (rs, then {d, a, b}) by inlining the
        # once-referenced ra/rb parent-lattice coordinates — at res 10
        # the original 4-rank version blew past the cap.
        rs = step(f"__h3e_rs{r}{pre}", f"({resid}) + 1")
        ra = f"({a_cur} - ELEMENT_AT({da_of}, {rs}))"
        rb = f"({b_cur} - ELEMENT_AT({db_of}, {rs}))"
        if r % 2 == 1:
            pa = f"({_dlit(2.0)} * {ra} + {rb}) / {_dlit(7.0)}"
            pb = f"((- {ra}) + {_dlit(3.0)} * {rb}) / {_dlit(7.0)}"
        else:
            pa = f"({_dlit(3.0)} * {ra} - {rb}) / {_dlit(7.0)}"
            pb = f"({ra} + {_dlit(2.0)} * {rb}) / {_dlit(7.0)}"
        dig_names.append(step(
            f"__h3e_d{r}{pre}",
            f"SHIFTLEFT(CAST(ELEMENT_AT({dig_of}, {rs}) AS BIGINT), {3 * (15 - r)})",
        ))
        a_cur = step(f"__h3e_a{r - 1}{pre}", pa)
        b_cur = step(f"__h3e_b{r - 1}{pre}", pb)

    # base cell from the res-0 anchor key: dense-slot lookup, shape
    # decided by the caller's bc_of (literal 25-slot array + raise
    # guard on the validated-bbox path; 20x25 flat per-face array +
    # NULL routing on the global path)
    ak = step(f"__h3e_ak{pre}",
              f"CAST(({a_cur} + {_dlit(2.0)}) * {_dlit(5.0)} + {b_cur} + {_dlit(2.0)} AS INT)")
    bc = step(f"__h3e_bc{pre}", bc_of(ak))

    # h3core.pack: mode 1, res bits, 7-fill for unused digit slots
    n_fill = 15 - res
    fill = (1 << (3 * n_fill)) - 1 if n_fill else 0
    const = (1 << 59) | (res << 52) | fill
    h_sql = f"CAST({const} AS BIGINT) | SHIFTLEFT({bc}, 45)"
    for dn in dig_names:
        h_sql = f"{h_sql} | {dn}"
    return step(f"__h3e_h{pre}", h_sql)


def _f32(v: float) -> float:
    return float(np.float32(v))


def attach_h3_jvm_global(
    df: DataFrame,
    res: int,
    lat: Column | str | None = None,
    lng: Column | str | None = None,
    out: str = "h3",
    margin: float = 1e-5,
) -> DataFrame:
    """GLOBAL JVM encode: per-row face selection + the encode chain with
    per-row face constants; ``out`` is NULLABLE — NULL marks rows the
    JVM path cannot encode exactly (callers route those through the
    Arrow kernel; operators/spatial.assign_h3 does).

    A row is JVM-encoded iff BOTH hold, and is then BIT-IDENTICAL to
    ``h3core.encode``:

    * the float32 nearest-face argmax is UNAMBIGUOUS by ``margin``:
      the SQL dot products are f64 sums over f32-rounded operands,
      within ~4e-7 of the kernel's pure-f32 dots, so a winner by 1e-5
      is provably the kernel's winner too;
    * the aperture-7 chain (identical f64 arithmetic to the kernel's,
      given the same face) lands in the res-0 anchor window on a slot
      whose base cell is HOMED on that face — exactly the kernel's
      fast-path (`same` branch, h3core.encode) condition, so the
      kernel computes the very same digits and base cell.

    Everything else — seam slivers, foreign-homed slots, ambiguous
    faces — is a thin band around icosahedron edges (measured ~3-8% of
    an area-uniform global sample) and returns NULL. This is what makes
    GLOBAL 10^12-row data mostly-JVM: the round-2 engine ran the whole
    input through the Arrow kernel (a Python worker per task) whenever
    the bbox wasn't face-interior.
    """
    base_cols = list(df.columns)
    for t in base_cols:
        if t.startswith("__h3e_"):
            raise ValueError(
                f"column {t} collides with the encode temps (reserved prefix __h3e_)"
            )
    if lat is None:
        lat = "`lat`"
    if lng is None:
        lng = "`lng`"
    if isinstance(lat, str) and isinstance(lng, str):
        lat_sql, lng_sql = lat, lng
        cur = df
    else:
        cur = df.select("*", lat.alias("__h3e_lat"), lng.alias("__h3e_lng"))
        lat_sql, lng_sql = "`__h3e_lat`", "`__h3e_lng`"

    ex: list[str] = []

    def step(name: str, sql: str) -> str:
        ex.append(f"({sql}) AS `{name}`")
        return f"`{name}`"

    # rank 0: unit-sphere xyz as ATTRIBUTES (shared by the 20-face
    # argmax and the chain — no recomputed trig)
    d2r = float(np.pi / 180.0)
    latr = f"(({lat_sql}) * {_dlit(d2r)})"
    lngr = f"(({lng_sql}) * {_dlit(d2r)})"
    x3 = step("__h3e_gX", f"COS({latr}) * COS({lngr})")
    y3 = step("__h3e_gY", f"COS({latr}) * SIN({lngr})")
    z3 = step("__h3e_gZ", f"SIN({latr})")

    # rank 1: the 20 face dots, f64 arithmetic over f32-rounded
    # operands (see docstring margin argument)
    xf = f"CAST(CAST({x3} AS FLOAT) AS DOUBLE)"
    yf = f"CAST(CAST({y3} AS FLOAT) AS DOUBLE)"
    zf = f"CAST(CAST({z3} AS FLOAT) AS DOUBLE)"
    dots_entries = ", ".join(
        f"{xf} * {_dlit(_f32(c[0]))} + {yf} * {_dlit(_f32(c[1]))} + {zf} * {_dlit(_f32(c[2]))}"
        for c in ic.FACE_CENTER
    )
    dots = step("__h3e_gdots", f"ARRAY({dots_entries})")
    # rank 2: winner + 1-based face index; rank 3: unambiguity gate
    mx = step("__h3e_gmx", f"ARRAY_MAX({dots})")
    fidx = step("__h3e_gfidx", f"CAST(ARRAY_POSITION({dots}, {mx}) AS INT)")
    # safe = unique maximum AND margin above the runner-up. The SIZE
    # term (round-4 advisor fix) catches an EXACT two-way tie at the
    # max: FILTER(v < mx) would drop both maxima and measure the margin
    # against the third-largest dot, passing `safe` on a point whose
    # face pick is genuinely ambiguous (the f32 kernel argmax may pick
    # the other face). Measure-zero, but the bit-identity claim must
    # hold on every row the chain CLAIMS — ties now NULL-route.
    safe = step(
        "__h3e_gsafe",
        f"(({mx} - ARRAY_MAX(FILTER({dots}, v -> v < {mx}))) > {_dlit(float(margin))})"
        f" AND SIZE(FILTER({dots}, v -> v = {mx})) = 1",
    )

    def arr20(vals) -> str:
        return "ARRAY(" + ", ".join(_dlit(float(v)) for v in vals) + ")"

    consts = tuple(
        f"ELEMENT_AT({arr20(tbl[:, i])}, {fidx})"
        for tbl in (ic.FACE_CENTER, ic.FACE_T1, ic.FACE_T2)
        for i in range(3)
    )
    # flattened 20x25 slot map: base cell if present AND homed on the
    # face, else -1 (NULL-route; the kernel handles those rows via its
    # foreign re-chain / seam scan — Arrow fallback here)
    flat = []
    for f in range(20):
        for k in range(25):
            b = int(ic.ANCHOR_KEY_BC[f, k])
            flat.append(b if (b >= 0 and int(ic.HOME_FACE[b]) == f) else -1)
    flat_arr = "ARRAY(" + ", ".join(f"CAST({v} AS BIGINT)" for v in flat) + ")"

    def bc_of(ak: str) -> str:
        return (f"CASE WHEN {ak} >= 0 AND {ak} <= 24 "
                f"THEN ELEMENT_AT({flat_arr}, ({fidx} - 1) * 25 + {ak} + 1) "
                f"ELSE CAST(-1 AS BIGINT) END")

    hh = _emit_h3_chain(
        step, res, lat_sql, lng_sql, consts, bc_of, pre="g", xyz=(x3, y3, z3)
    )
    # nullable fence (same pushdown rationale as attach_h3_jvm; NULL =
    # route to the Arrow kernel)
    fence = (
        f"CASE WHEN SPARK_PARTITION_ID() >= -1 THEN "
        f"(CASE WHEN {safe} AND `__h3e_bcg` >= 0 THEN {hh} END) END"
    )
    quoted_base = [f"`{c}`" for c in base_cols]
    full = cur.selectExpr(*quoted_base, *ex, f"({fence}) AS `{out}`")
    return full.select(*base_cols, out)


def attach_h3_jvm_home(
    df: DataFrame,
    res: int,
    lat: Column | str | None = None,
    lng: Column | str | None = None,
    out: str = "h3",
    margin: float = 1e-5,
) -> DataFrame:
    """SECOND-pass global JVM encode, replicating the kernel's FOREIGN
    branch (h3core.encode + _chain_in_home): chain in the point's own
    face to find the claiming base cell (RAW slot map — homed or not),
    re-chain the point EXACTLY in that cell's HOME face, accept iff the
    home chain's res-0 anchor equals the cell's HOME_AXIAL slot (the
    kernel's `consistent` condition). NULL marks rows only the kernel's
    seam scan can place (Arrow fallback).

    Bit-identity: with the same face pick (argmax margin as
    attach_h3_jvm_global) this computes the kernel's foreign branch
    verbatim — same f64 projection and chain in both frames, same
    consistency test, digits from the home chain, base cell unchanged —
    and the SAME-homed case degenerates to the kernel's fast path
    (the home chain IS the own-face chain then). Intended for the
    RESIDUE of :func:`attach_h3_jvm_global` (operators/spatial.assign_h3
    wires it that way): the two stacked chains (~50 Project ranks) sit
    past the fused-stage JIT budget, so this pass runs interpreted —
    fine for the ~19% residue scan, still far cheaper than per-row
    Python — while the 81% fast pass keeps its compiled 28-rank chain.
    """
    base_cols = list(df.columns)
    for t in base_cols:
        if t.startswith("__h3e_"):
            raise ValueError(
                f"column {t} collides with the encode temps (reserved prefix __h3e_)"
            )
    if lat is None:
        lat = "`lat`"
    if lng is None:
        lng = "`lng`"
    if isinstance(lat, str) and isinstance(lng, str):
        lat_sql, lng_sql = lat, lng
        cur = df
    else:
        cur = df.select("*", lat.alias("__h3e_lat"), lng.alias("__h3e_lng"))
        lat_sql, lng_sql = "`__h3e_lat`", "`__h3e_lng`"

    ex: list[str] = []

    def step(name: str, sql: str) -> str:
        ex.append(f"({sql}) AS `{name}`")
        return f"`{name}`"

    d2r = float(np.pi / 180.0)
    latr = f"(({lat_sql}) * {_dlit(d2r)})"
    lngr = f"(({lng_sql}) * {_dlit(d2r)})"
    x3 = step("__h3e_hX", f"COS({latr}) * COS({lngr})")
    y3 = step("__h3e_hY", f"COS({latr}) * SIN({lngr})")
    z3 = step("__h3e_hZ", f"SIN({latr})")

    xf = f"CAST(CAST({x3} AS FLOAT) AS DOUBLE)"
    yf = f"CAST(CAST({y3} AS FLOAT) AS DOUBLE)"
    zf = f"CAST(CAST({z3} AS FLOAT) AS DOUBLE)"
    dots_entries = ", ".join(
        f"{xf} * {_dlit(_f32(c[0]))} + {yf} * {_dlit(_f32(c[1]))} + {zf} * {_dlit(_f32(c[2]))}"
        for c in ic.FACE_CENTER
    )
    dots = step("__h3e_hdots", f"ARRAY({dots_entries})")
    mx = step("__h3e_hmx", f"ARRAY_MAX({dots})")
    fidx = step("__h3e_hfidx", f"CAST(ARRAY_POSITION({dots}, {mx}) AS INT)")
    # unique-max + margin gate (same tie rationale as the global chain)
    safe = step(
        "__h3e_hsafe",
        f"(({mx} - ARRAY_MAX(FILTER({dots}, v -> v < {mx}))) > {_dlit(float(margin))})"
        f" AND SIZE(FILTER({dots}, v -> v = {mx})) = 1",
    )

    def arr20(vals) -> str:
        return "ARRAY(" + ", ".join(_dlit(float(v)) for v in vals) + ")"

    consts1 = tuple(
        f"ELEMENT_AT({arr20(tbl[:, i])}, {fidx})"
        for tbl in (ic.FACE_CENTER, ic.FACE_T1, ic.FACE_T2)
        for i in range(3)
    )
    # RAW slot map: any claimed base cell, homed or foreign
    flat_raw = []
    for f in range(20):
        for k in range(25):
            flat_raw.append(int(ic.ANCHOR_KEY_BC[f, k]))
    flat_arr = "ARRAY(" + ", ".join(f"CAST({v} AS BIGINT)" for v in flat_raw) + ")"

    def bc1_of(ak: str) -> str:
        return (f"CASE WHEN {ak} >= 0 AND {ak} <= 24 "
                f"THEN ELEMENT_AT({flat_arr}, ({fidx} - 1) * 25 + {ak} + 1) "
                f"ELSE CAST(-1 AS BIGINT) END")

    _emit_h3_chain(
        step, res, lat_sql, lng_sql, consts1, bc1_of, pre="h1", xyz=(x3, y3, z3)
    )
    bc1 = "`__h3e_bch1`"
    # home face of the claiming cell, 1-based; dummy 1 when unclaimed
    # (result discarded by the final CASE — ANSI element_at needs a
    # valid index either way)
    hf_arr = "ARRAY(" + ", ".join(str(int(v) + 1) for v in ic.HOME_FACE) + ")"
    hidx = step(
        "__h3e_hhidx",
        f"CASE WHEN {bc1} >= 0 THEN ELEMENT_AT({hf_arr}, CAST({bc1} AS INT) + 1) "
        f"ELSE 1 END",
    )
    consts2 = tuple(
        f"ELEMENT_AT({arr20(tbl[:, i])}, {hidx})"
        for tbl in (ic.FACE_CENTER, ic.FACE_T1, ic.FACE_T2)
        for i in range(3)
    )
    hh2 = _emit_h3_chain(
        step, res, lat_sql, lng_sql, consts2, lambda ak: bc1, pre="h2",
        xyz=(x3, y3, z3),
    )
    # kernel `consistent`: the home chain's res-0 anchor must be the
    # cell's own home slot (exact integer-valued-double comparison)
    ha_arr = "ARRAY(" + ", ".join(_dlit(float(v[0])) for v in ic.HOME_AXIAL) + ")"
    hb_arr = "ARRAY(" + ", ".join(_dlit(float(v[1])) for v in ic.HOME_AXIAL) + ")"
    consistent = (
        f"(`__h3e_a0h2` = ELEMENT_AT({ha_arr}, CAST({bc1} AS INT) + 1)) AND "
        f"(`__h3e_b0h2` = ELEMENT_AT({hb_arr}, CAST({bc1} AS INT) + 1))"
    )
    fence = (
        f"CASE WHEN SPARK_PARTITION_ID() >= -1 THEN "
        f"(CASE WHEN {safe} AND {bc1} >= 0 AND ({consistent}) THEN {hh2} END) END"
    )
    quoted_base = [f"`{c}`" for c in base_cols]
    full = cur.selectExpr(*quoted_base, *ex, f"({fence}) AS `{out}`")
    return full.select(*base_cols, out)


def _phash_latlng_sql(bbox: tuple[float, float, float, float]) -> tuple[str, str]:
    """The documented geotag convention (functions/h3_fns.geotag_np,
    FIXTURES.md §1) as exact integer/double SQL fragments."""
    lat0, lat1, lng0, lng1 = bbox
    two32 = _dlit(float(2 ** 32))
    u_hi = "CAST(SHIFTRIGHTUNSIGNED(`phash`, 32) AS DOUBLE)"
    u_lo = f"CAST(`phash` & {0xFFFFFFFF} AS DOUBLE)"
    lat = f"{_dlit(float(lat0))} + ({u_hi} / {two32}) * {_dlit(float(lat1 - lat0))}"
    lng = f"{_dlit(float(lng0))} + ({u_lo} / {two32}) * {_dlit(float(lng1 - lng0))}"
    return lat, lng


def attach_h3_from_phash_jvm(
    df: DataFrame, res: int, bbox: tuple[float, float, float, float], out: str = "h3"
) -> DataFrame:
    """phash -> H3 cell id, fully JVM-side, exact for face-interior
    bboxes (see :func:`attach_h3_jvm`)."""
    lat, lng = _phash_latlng_sql(bbox)
    return attach_h3_jvm(df, res, bbox, lat=lat, lng=lng, out=out)


def attach_h3_from_phash_jvm_global(
    df: DataFrame, res: int, bbox: tuple[float, float, float, float], out: str = "h3"
) -> DataFrame:
    """phash -> NULLABLE H3 cell id via the global per-row-face chain
    (see :func:`attach_h3_jvm_global`); NULL rows need the Arrow
    kernel."""
    lat, lng = _phash_latlng_sql(bbox)
    return attach_h3_jvm_global(df, res, lat=lat, lng=lng, out=out)
