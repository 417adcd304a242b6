"""Vector -> raster: render per-hexagon values back into pixel images.

Completes the north-star "raster <-> vector operators" pair:
``functions.image_fns.tile_hex_bins_udf`` goes raster -> hexagon;
this goes hexagon -> raster.  The reference renders its per-hex
aggregates as matplotlib choropleths (visualize.py:33-46); a cluster
engine renders to *data* instead — one grayscale PNG per group row,
written through the same from-scratch codec the decode path uses
(hexlib/image.py), so the output is immediately consumable by every
image operator in the engine (pHash, SSIM, stats, augment).

Scale shape: one shuffle on the group key, then an Arrow-batched
applyInPandas kernel per group.  Each task's working set is bounded by
``width x height`` pixels + the group's cell table — independent of
total table size, so 10^6 regions render as 10^6 independent tasks.
The pixel->cell assignment is one vectorized ``h3core.encode`` of the
pixel-center lattice + a searchsorted join against the group's sorted
cell ids; no Python loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..hexlib import h3core
from ..hexlib.image import png_encode


def _render_group(
    pdf: pd.DataFrame,
    value_col: str,
    h3_col: str,
    width: int,
    height: int,
    bbox,
    vmin,
    vmax,
    background: int,
) -> tuple[bytes, float, float, float, float, float, float]:
    cells = pdf[h3_col].to_numpy().astype(np.int64).view(np.uint64)
    vals = pdf[value_col].to_numpy(dtype=np.float64)
    # resolution must be uniform within the group (round-4 advisor):
    # cells at any other resolution would silently render as background
    # (searchsorted on re-encoded pixel cells never matches them)
    res_all = h3core.get_resolution(cells)
    if not np.all(res_all == res_all[0]):
        raise ValueError(
            "rasterize: group mixes H3 resolutions "
            f"{sorted(set(res_all.tolist()))}; pre-aggregate to one resolution"
        )
    res = int(res_all[0])
    if bbox is None:
        clat, clng = h3core.cell_center(cells)
        pad = np.degrees(h3core.edge_length_m(res) * 2.0 / 6_371_008.8)
        lat0, lat1 = float(clat.min() - pad), float(clat.max() + pad)
        lng0, lng1 = float(clng.min() - pad), float(clng.max() + pad)
    else:
        lat0, lat1, lng0, lng1 = (float(x) for x in bbox)
    lo = float(vals.min()) if vmin is None else float(vmin)
    hi = float(vals.max()) if vmax is None else float(vmax)

    # north-up pixel-center lattice, row 0 at lat1
    py = lat1 - (np.arange(height, dtype=np.float64) + 0.5) * (lat1 - lat0) / height
    px = lng0 + (np.arange(width, dtype=np.float64) + 0.5) * (lng1 - lng0) / width
    glat = np.repeat(py, width)
    glng = np.tile(px, height)
    pix_cells = h3core.encode(glat, glng, res)

    order = np.argsort(cells, kind="stable")
    sc, sv = cells[order], vals[order]
    # duplicate (h3) rows: searchsorted(side='left') + stable sort keeps
    # the FIRST occurrence in input order (deterministic); callers
    # should pass one row per (group, cell) — pre-aggregate upstream if
    # last-wins or summed semantics are wanted
    pos = np.searchsorted(sc, pix_cells)
    pos_c = np.clip(pos, 0, len(sc) - 1)
    hit = sc[pos_c] == pix_cells
    span = max(hi - lo, np.finfo(np.float64).tiny)
    level = np.clip(np.rint((sv[pos_c] - lo) / span * 255.0), 0, 255).astype(np.uint8)
    gray = np.where(hit, level, np.uint8(background)).reshape(height, width)
    rgb = np.repeat(gray[:, :, None], 3, axis=2)
    return png_encode(rgb), lo, hi, lat0, lat1, lng0, lng1


def rasterize_hex(
    cells: DataFrame,
    value_col: str,
    h3_col: str = "h3",
    group_cols: list[str] | None = None,
    width: int = 256,
    height: int = 256,
    bbox: tuple[float, float, float, float] | None = None,
    vmin: float | None = None,
    vmax: float | None = None,
    background: int = 0,
) -> DataFrame:
    """Render ``(group?, h3, value)`` rows to one grayscale PNG per group.

    Pixel centers are geocoded and assigned to their containing cell at
    the input's resolution (the exact inverse of the engine's encode),
    values min-max scaled to 0..255 (``vmin``/``vmax`` pin the scale
    across groups for comparable frames; default is per-group min/max);
    pixels whose cell has no row get ``background``.  ``bbox=None``
    frames each group on its own cells padded by two edge lengths.

    Returns ``(group_cols..., bytes, fmt, w, h, vmin, vmax, lat0, lat1,
    lng0, lng1)`` — the bbox columns make the raster georeferenced, so
    a roundtrip through ``tile_hex_bins``/decode is lossless up to the
    0..255 quantization (pinned in tests/test_raster.py).
    """
    gcols = list(group_cols) if group_cols else []
    src = cells if gcols else cells.withColumn("_g", F.lit(0))
    keys = gcols or ["_g"]

    schema_prefix = ", ".join(
        f"`{c}` {src.schema[c].dataType.simpleString()}" for c in keys
    )
    out_schema = (
        f"{schema_prefix}, bytes binary, fmt string, w int, h int, "
        "vmin double, vmax double, lat0 double, lat1 double, lng0 double, lng1 double"
    )

    def fn(key, pdf):
        data, lo, hi, lat0, lat1, lng0, lng1 = _render_group(
            pdf, value_col, h3_col, width, height, bbox, vmin, vmax, background
        )
        row = {k: key[i] for i, k in enumerate(keys)}
        row.update(
            bytes=data, fmt="png", w=width, h=height, vmin=lo, vmax=hi,
            lat0=lat0, lat1=lat1, lng0=lng0, lng1=lng1,
        )
        return pd.DataFrame([row])

    out = src.groupBy(*keys).applyInPandas(fn, schema=out_schema)
    return out.drop("_g") if not gcols else out
