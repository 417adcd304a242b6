"""Icosahedral face geometry + derived res-0 (base cell) tables.

The H3 grid lives on a gnomonic projection of each of the 20 icosahedron
faces. The sandbox has no ``h3`` package and no network, so instead of
copying upstream lookup tables we *derive* the face/base-cell structure
geometrically at import time:

  * 20 face-center unit vectors. We first try the published H3 face-center
    coordinates (public Apache-2.0 spec constants, reproduced from the
    spec); a numeric validator checks they form a true icosahedron
    (pairwise-dot spectrum). If validation fails we fall back to a
    canonical golden-ratio icosahedron, which yields an equally valid,
    deterministic (but upstream-rotated) grid.
  * 12 vertex unit vectors, clustered from adjacent face triples.
  * per-face tangent frames with the i-axis anchored at a face vertex
    (vertices are exact res-0 lattice points at IJK distance 2, which
    makes the 20 per-face lattices agree exactly along shared edges).
  * the 122 res-0 cells (= base cells: 20 face centers + 60 interior
    points + 30 edge midpoints + 12 vertices/pentagons), clustered from
    per-face anchor lattice points, numbered deterministically north ->
    south. FACE_IJK_BC is our derived analog of the spec's
    faceIjkBaseCells table.

Cell numbering is therefore deterministic and H3-*format* compatible
(bit layout, hierarchy, aperture-7 semantics) but not bit-identical to
upstream's base-cell numbering (impossible to calibrate without the h3
lib). All engine + oracle code shares this module, so results are
consistent end to end.
"""

from __future__ import annotations

import numpy as np

from . import hexmath as hm

NUM_FACES = 20
NUM_BASE_CELLS = 122

# Published H3 face center lat/lng (radians) — public spec constants.
_H3_FACE_CENTER_GEO = np.array(
    [
        [0.803582649718989942, 1.248397419617396099],
        [1.307747883455638156, 2.536945009877921159],
        [1.054751253523952054, -1.347517358900396623],
        [0.600191595538186799, -0.450603909469755746],
        [0.491715428198773866, 0.401988202911306943],
        [0.172745327415618701, 1.678146885280433686],
        [0.605929321571350690, 2.953923329812411617],
        [0.427370518328979641, -1.888876200336285401],
        [-0.079066118549212831, -0.733429513380867741],
        [-0.230961644455383637, 0.506495587332349035],
        [0.079066118549212831, 2.408163140208925497],
        [0.230961644455383637, -2.635097066257444203],
        [-0.172745327415618701, -1.463445768309359553],
        [-0.605929321571350690, -0.187669323777381622],
        [-0.427370518328979641, 1.252716453253507838],
        [-0.600191595538186799, 2.690988744120037492],
        [-0.491715428198773866, -2.739604450678486295],
        [-0.803582649718989942, -1.893195233972397139],
        [-1.307747883455638156, -0.604647643711872080],
        [-1.054751253523952054, 1.794075294689396615],
    ]
)


def _geo_to_xyz(lat: np.ndarray, lng: np.ndarray) -> np.ndarray:
    cl = np.cos(lat)
    return np.stack([cl * np.cos(lng), cl * np.sin(lng), np.sin(lat)], axis=-1)


def _is_icosahedron(fc: np.ndarray, tol: float = 1e-9) -> bool:
    """20 unit vectors are icosahedron face centers iff each has exactly 3
    neighbors at the edge-adjacency dot value and the dot spectrum matches."""
    if fc.shape != (20, 3):
        return False
    if not np.allclose(np.linalg.norm(fc, axis=1), 1.0, atol=1e-7):
        return False
    dots = fc @ fc.T
    adj = np.cos(np.arccos(np.sqrt(5.0) / 3.0))  # adjacent face-center dot = sqrt(5)/3
    n_adj = ((np.abs(dots - adj) < 1e-6).sum(axis=1)).astype(int)
    return bool(np.all(n_adj == 3))


def _golden_icosahedron() -> np.ndarray:
    """Canonical fallback icosahedron (deterministic orientation)."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts.append((0.0, a, b))
            verts.append((a, b, 0.0))
            verts.append((b, 0.0, a))
    v = np.array(verts)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # faces = triples of mutually-adjacent vertices (vertex-dot = 1/sqrt(5))
    vdots = v @ v.T
    adj = np.abs(vdots - 1.0 / np.sqrt(5.0)) < 1e-9
    faces = []
    for i in range(12):
        for j in range(i + 1, 12):
            if not adj[i, j]:
                continue
            for k in range(j + 1, 12):
                if adj[i, k] and adj[j, k]:
                    faces.append((i, j, k))
    fc = np.array([v[list(f)].sum(axis=0) for f in faces])
    fc /= np.linalg.norm(fc, axis=1, keepdims=True)
    order = np.lexsort((np.round(fc[:, 1], 9), np.round(fc[:, 0], 9), -np.round(fc[:, 2], 9)))
    return fc[order]


def _build() -> dict:
    fc = _geo_to_xyz(_H3_FACE_CENTER_GEO[:, 0], _H3_FACE_CENTER_GEO[:, 1])
    fc /= np.linalg.norm(fc, axis=1, keepdims=True)
    used_spec_orientation = _is_icosahedron(fc)
    if not used_spec_orientation:
        fc = _golden_icosahedron()
        assert _is_icosahedron(fc), "fallback icosahedron invalid"

    dots = fc @ fc.T
    adj_dot = np.sqrt(5.0) / 3.0

    # --- vertices. Faces f,g share a vertex iff dot in {sqrt(5)/3 (edge-
    # adjacent) or 1/3 (vertex-only)}. A vertex is surrounded by 5 faces;
    # candidate = normalized sum of any pairwise vertex-sharing face triple,
    # validated by "the 5 nearest face centers are equidistant" (rejects
    # triples that share three *different* vertices).
    shares_v = (np.abs(dots - adj_dot) < 1e-6) | (np.abs(dots - 1.0 / 3.0) < 1e-6)
    verts: list[np.ndarray] = []
    for f in range(20):
        for g in range(f + 1, 20):
            if not shares_v[f, g]:
                continue
            for h in range(g + 1, 20):
                if not (shares_v[f, h] and shares_v[g, h]):
                    continue
                s = fc[f] + fc[g] + fc[h]
                c = s / np.linalg.norm(s)
                dd = fc @ c
                order = np.argsort(-dd)
                if dd[order[4]] - dd[order[5]] < 0.05:  # no clear 5-face ring
                    continue
                v5 = fc[order[:5]].sum(axis=0)  # symmetric -> exact vertex dir
                c = v5 / np.linalg.norm(v5)
                d = np.sort(fc @ c)[::-1]
                if d[0] - d[4] > 1e-9:
                    continue
                if not any(c @ v > 1.0 - 1e-9 for v in verts):
                    verts.append(c)
    vertices = np.array(verts)
    assert vertices.shape == (12, 3), f"expected 12 vertices, got {vertices.shape}"

    # --- per-face tangent frames; i-axis anchored at a deterministic vertex
    vdot = fc @ vertices.T  # (20, 12)
    t1 = np.zeros((20, 3))
    t2 = np.zeros((20, 3))
    face_verts = np.zeros((20, 3), dtype=np.int64)
    for f in range(20):
        vids = np.argsort(-vdot[f])[:3]  # this face's 3 vertices
        key = np.round(vertices[vids], 9)
        pick = vids[np.lexsort((key[:, 1], key[:, 0], -key[:, 2]))[0]]
        face_verts[f] = sorted(vids)
        a = vertices[pick] - (vertices[pick] @ fc[f]) * fc[f]
        t1[f] = a / np.linalg.norm(a)
        t2[f] = np.cross(fc[f], t1[f])

    # res-0 unit distance in gnomonic tan-units: vertex sits at u = 2
    cv_dot = float(vdot.max())  # cos(center->vertex angle), same for all faces
    theta_cv = np.arccos(np.clip(cv_dot, -1.0, 1.0))
    res0_u = np.tan(theta_cv) / 2.0

    # --- res-0 anchor lattice points per face (all coords in 0..2)
    on_face = [
        (0, 0, 0),
        (1, 0, 0), (0, 1, 0), (0, 0, 1),
        (1, 1, 0), (0, 1, 1), (1, 0, 1),
        (2, 0, 0), (0, 2, 0), (0, 0, 2),
    ]
    outside = [(2, 1, 0), (1, 2, 0), (0, 2, 1), (0, 1, 2), (1, 0, 2), (2, 0, 1)]
    anchors = np.array(on_face + outside, dtype=np.int64)  # (16, 3)
    ax, ay = hm.ijk_to_hex2d(anchors)

    # anchor directions per face (gnomonic inverse, vectorized)
    dirs = (
        fc[:, None, :]
        + res0_u * (ax[None, :, None] * t1[:, None, :] + ay[None, :, None] * t2[:, None, :])
    )
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)  # (20, 16, 3)

    # cluster ON-face anchors exactly (centers, interior, edge midpoints and
    # vertices coincide across faces in exact math; tol covers fp noise)
    n_on = len(on_face)
    flat_on = dirs[:, :n_on, :].reshape(-1, 3)
    centers: list[np.ndarray] = []
    labels_on = np.full(flat_on.shape[0], -1, dtype=np.int64)
    for idx, d in enumerate(flat_on):
        for ci, c in enumerate(centers):
            if d @ c > 1.0 - 1e-9:
                labels_on[idx] = ci
                break
        else:
            labels_on[idx] = len(centers)
            centers.append(d)
    centers_arr = np.array(centers)
    assert centers_arr.shape[0] == NUM_BASE_CELLS, f"got {centers_arr.shape[0]} base cells"

    # OUTSIDE-ring anchors (gnomonic extension beyond the face edge) drift
    # O(eps^2) ~ 0.13 u0 from the true adjacent-face centers: snap each to
    # the nearest base cell (margin to the next center is ~0.9 u0).
    flat_out = dirs[:, n_on:, :].reshape(-1, 3)
    d_out = flat_out @ centers_arr.T
    labels_out = np.argmax(d_out, axis=1)
    worst = np.arccos(np.clip(d_out[np.arange(len(labels_out)), labels_out], -1, 1)).max()
    assert worst < 0.15, f"outside-ring snap ambiguous: {worst:.3f} rad"
    labels = np.concatenate(
        [labels_on.reshape(20, n_on), labels_out.reshape(20, len(outside))], axis=1
    ).reshape(-1)

    # pentagon = res-0 cell centered on an icosahedron vertex
    pent = (centers_arr @ vertices.T).max(axis=1) > 1.0 - 1e-9
    assert int(pent.sum()) == 12

    # deterministic numbering: north -> south, then by longitude
    lat = np.arcsin(np.clip(centers_arr[:, 2], -1, 1))
    lng = np.arctan2(centers_arr[:, 1], centers_arr[:, 0])
    order = np.lexsort((np.round(lng, 9), -np.round(lat, 9)))
    remap = np.empty(NUM_BASE_CELLS, dtype=np.int64)
    remap[order] = np.arange(NUM_BASE_CELLS)
    bc_center = centers_arr[order]
    bc_pent = pent[order]
    labels = remap[labels].reshape(20, 16)

    # FACE_IJK_BC[face, i, j, k] -> base cell (or -1)
    face_ijk_bc = np.full((20, 3, 3, 3), -1, dtype=np.int64)
    for f in range(20):
        for a_idx, (i, j, k) in enumerate(anchors):
            face_ijk_bc[f, i, j, k] = labels[f, a_idx]
            # same cell under any IJK gauge shift that stays in 0..2
            for g in (1, 2):
                ii, jj, kk = i + g, j + g, k + g
                if max(ii, jj, kk) <= 2:
                    face_ijk_bc[f, ii, jj, kk] = labels[f, a_idx]

    # home face / home anchor per base cell: lowest face id where the cell
    # is an ON-face anchor (first 10 anchor slots)
    home_face = np.full(NUM_BASE_CELLS, -1, dtype=np.int64)
    home_ijk = np.zeros((NUM_BASE_CELLS, 3), dtype=np.int64)
    for f in range(20):
        for a_idx in range(len(on_face)):
            bc = labels[f, a_idx]
            if home_face[bc] < 0:
                home_face[bc] = f
                home_ijk[bc] = anchors[a_idx]
    assert np.all(home_face >= 0)

    # axial (a, b) = (i - k, j - k) forms for the fast encode/decode path
    anchor_axial = np.stack(
        [anchors[:, 0] - anchors[:, 2], anchors[:, 1] - anchors[:, 2]], axis=1
    )
    home_axial = np.stack(
        [home_ijk[:, 0] - home_ijk[:, 2], home_ijk[:, 1] - home_ijk[:, 2]], axis=1
    )
    # per-face LUT keyed by (a+2)*5 + (b+2) -> base cell (or -1)
    anchor_key_bc = np.full((20, 25), -1, dtype=np.int64)
    for f in range(20):
        for a_idx in range(16):
            a, b = anchor_axial[a_idx]
            anchor_key_bc[f, (a + 2) * 5 + (b + 2)] = labels.reshape(20, 16)[f, a_idx]

    return dict(
        FACE_CENTER=fc,
        FACE_T1=t1,
        FACE_T2=t2,
        VERTICES=vertices,
        FACE_VERTS=face_verts,
        RES0_U=res0_u,
        FACE_IJK_BC=face_ijk_bc,
        FACE_ANCHOR_BC=labels.reshape(20, 16),
        ANCHOR_AXIAL=anchor_axial,
        ANCHOR_KEY_BC=anchor_key_bc,
        BC_CENTER=bc_center,
        BC_PENTAGON=bc_pent,
        HOME_FACE=home_face,
        HOME_IJK=home_ijk,
        HOME_AXIAL=home_axial,
        USED_SPEC_ORIENTATION=used_spec_orientation,
    )


_T = _build()

FACE_CENTER: np.ndarray = _T["FACE_CENTER"]
FACE_T1: np.ndarray = _T["FACE_T1"]
FACE_T2: np.ndarray = _T["FACE_T2"]
VERTICES: np.ndarray = _T["VERTICES"]
RES0_U: float = float(_T["RES0_U"])
FACE_IJK_BC: np.ndarray = _T["FACE_IJK_BC"]
FACE_ANCHOR_BC: np.ndarray = _T["FACE_ANCHOR_BC"]
ANCHOR_AXIAL: np.ndarray = _T["ANCHOR_AXIAL"]
ANCHOR_KEY_BC: np.ndarray = _T["ANCHOR_KEY_BC"]
BC_CENTER: np.ndarray = _T["BC_CENTER"]
BC_PENTAGON: np.ndarray = _T["BC_PENTAGON"]
HOME_FACE: np.ndarray = _T["HOME_FACE"]
HOME_IJK: np.ndarray = _T["HOME_IJK"]
HOME_AXIAL: np.ndarray = _T["HOME_AXIAL"]
USED_SPEC_ORIENTATION: bool = bool(_T["USED_SPEC_ORIENTATION"])


def geo_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray) -> np.ndarray:
    return _geo_to_xyz(np.radians(lat_deg), np.radians(lng_deg))


def xyz_to_geo(xyz: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lat = np.degrees(np.arcsin(np.clip(xyz[..., 2], -1.0, 1.0)))
    lng = np.degrees(np.arctan2(xyz[..., 1], xyz[..., 0]))
    return lat, lng


def nearest_face(xyz: np.ndarray) -> np.ndarray:
    return np.argmax(xyz @ FACE_CENTER.T, axis=-1)


def project(face: np.ndarray, xyz: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Gnomonic projection onto ``face``'s tangent plane, in res-0 u units.

    Valid for any point with positive dot against the face center
    (extension beyond the face triangle is used deliberately for
    home-frame cell definitions; see h3core docstring). A non-positive
    dot would silently alias the antipode onto plausible coordinates, so
    it is rejected loudly.
    """
    c = FACE_CENTER[face]
    d = np.einsum("...k,...k->...", xyz, c)
    if d.size and float(np.min(d)) <= 1e-9:
        raise ValueError("gnomonic projection requires positive dot with the face center")
    p = xyz / d[..., None]  # onto tangent plane
    rel = p - c
    x = np.einsum("...k,...k->...", rel, FACE_T1[face]) / RES0_U
    y = np.einsum("...k,...k->...", rel, FACE_T2[face]) / RES0_U
    return x, y


def unproject(face: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Inverse gnomonic: res-0 u coords on ``face`` -> unit xyz."""
    p = (
        FACE_CENTER[face]
        + RES0_U * (np.asarray(x)[..., None] * FACE_T1[face] + np.asarray(y)[..., None] * FACE_T2[face])
    )
    return p / np.linalg.norm(p, axis=-1, keepdims=True)
