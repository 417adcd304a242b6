"""Presentation edge: hex-string cell ids + GeoJSON export.

Reference surface: the engine-side analog of `visualization/visualize.py`
(kepler choropleths over hex polygons) and the GeoJSON tiling cache
(make_dataset.py:82-93). Heavy lifting happens in the engine; these
helpers run on *aggregated* results — driver-side pandas or one narrow
UDF — never on the fact table.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..hexlib import h3core
from .h3_fns import h3_to_str


def with_h3_str(df: DataFrame, h3_col: str = "h3", out_col: str = "h3_str") -> DataFrame:
    """Attach the 15-char lowercase hex cell id (the reference's string
    representation, e.g. '891f7248233ffff' — cluster-word2vec.ipynb cell
    33). Kept at the presentation edge only; cells shuffle as longs."""
    return df.withColumn(out_col, h3_to_str(F.col(h3_col)))


def cells_to_geojson(pdf: pd.DataFrame, h3_col: str = "h3") -> str:
    """Aggregated (h3, properties...) pandas frame -> GeoJSON
    FeatureCollection of hexagon polygons (lng,lat order per spec), one
    feature per cell, all non-cell columns as properties. The engine-side
    analog of the reference's hexagon choropleth inputs."""
    cells = pdf[h3_col].to_numpy().astype(np.int64).view(np.uint64)
    verts = h3core.cell_boundary(cells)  # (n, 6, 2) lat,lng
    strs = h3core.h3_to_string(cells)
    prop_cols = [c for c in pdf.columns if c != h3_col]
    feats = []
    for i in range(len(pdf)):
        ring = [[float(verts[i, j, 1]), float(verts[i, j, 0])] for j in range(verts.shape[1])]
        ring.append(ring[0])  # closed ring per GeoJSON spec
        props = {c: _jsonable(pdf.iloc[i][c]) for c in prop_cols}
        props["h3"] = str(strs[i])
        feats.append(
            {
                "type": "Feature",
                "geometry": {"type": "Polygon", "coordinates": [ring]},
                "properties": props,
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def _jsonable(v):
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return float(v)
    return v


# ----------------------------------------------------- kepler.gl configs

# ColorBrewer qualitative ramps by class count (the palettes the
# reference's saved configs use, e.g. config/tfidf_kmeans_5.json)
_SET1 = ["#e41a1c", "#377eb8", "#4daf4a", "#984ea3", "#ff7f00",
         "#ffff33", "#a65628", "#f781bf", "#999999"]


def kepler_hex_config(
    data_id: str = "data",
    h3_field: str = "h3",
    color_field: str = "label",
    n_classes: int = 5,
    center: tuple[float, float] = (41.0, 15.5),
    zoom: float = 9.9,
    style: str = "satellite",
) -> dict:
    """kepler.gl map config for a hexagonId choropleth — the structure
    the reference SAVES and RELOADS around every cluster map
    (src/visualization/config.py:8-19 + the 26 artifacts under
    config/*.json, e.g. tfidf_kmeans_5.json: one `hexagonId` layer
    keyed on the h3 string column, quantize color scale over the label
    field, satellite base map). Driver-side presentation only — no
    cluster semantics; the engine's aggregates feed it via
    :func:`with_h3_str` / :func:`kepler_bundle`."""
    n = max(3, min(n_classes, len(_SET1)))
    return {
        "version": "v1",
        "config": {
            "visState": {
                "filters": [],
                "layers": [
                    {
                        "id": "hexlayer",
                        "type": "hexagonId",
                        "config": {
                            "dataId": data_id,
                            "label": h3_field,
                            "color": [137, 218, 193],
                            "columns": {"hex_id": h3_field},
                            "isVisible": True,
                            "visConfig": {
                                "opacity": 0.2,
                                "colorRange": {
                                    "name": f"ColorBrewer Set1-{n}",
                                    "type": "qualitative",
                                    "category": "ColorBrewer",
                                    "colors": _SET1[:n],
                                },
                                "coverage": 1,
                                "enable3d": False,
                                "sizeRange": [0, 500],
                                "coverageRange": [0, 1],
                                "elevationScale": 5,
                            },
                            "hidden": False,
                            "textLabel": [],
                        },
                        "visualChannels": {
                            "colorField": {"name": color_field, "type": "integer"},
                            "colorScale": "quantize",
                            "sizeField": None,
                            "sizeScale": "linear",
                            "coverageField": None,
                            "coverageScale": "linear",
                        },
                    }
                ],
                "layerBlending": "normal",
                "splitMaps": [],
            },
            "mapState": {
                "bearing": 0,
                "dragRotate": False,
                "latitude": float(center[0]),
                "longitude": float(center[1]),
                "pitch": 0,
                "zoom": float(zoom),
                "isSplit": False,
            },
            "mapStyle": {"styleType": style},
        },
    }


def kepler_bundle(pdf: pd.DataFrame, data_id: str = "data", config: dict | None = None) -> str:
    """Aggregated pandas frame + config -> a kepler.gl-loadable JSON
    bundle ({datasets, config} — the document kepler.gl's web app and
    the KeplerGl widget both accept). The engine-side stand-in for
    `visualize_kepler` (visualize.py:21-26): no keplergl/selenium ships
    here, so the artifact is the portable map document itself. Centers
    the mapState on the cells when the config wasn't given."""
    if config is None:
        if "h3" in pdf.columns:
            cells = pdf["h3"].to_numpy().astype(np.int64).view(np.uint64)
            lat, lng = h3core.cell_center(cells)
            center = (float(np.mean(lat)), float(np.mean(lng)))
        else:
            center = (41.0, 15.5)
        color_field = next(
            (c for c in ("label", "cluster", "count") if c in pdf.columns), "label"
        )
        config = kepler_hex_config(data_id, color_field=color_field, center=center)
    fields = [{"name": c, "type": _kepler_type(pdf[c])} for c in pdf.columns]
    rows = [[_jsonable(v) for v in row] for row in pdf.itertuples(index=False)]
    return json.dumps(
        {
            "datasets": [{"info": {"id": data_id, "label": data_id},
                          "data": {"fields": fields, "rows": rows}}],
            "config": config,
        }
    )


def _kepler_type(s: pd.Series) -> str:
    if pd.api.types.is_integer_dtype(s):
        return "integer"
    if pd.api.types.is_float_dtype(s):
        return "real"
    return "string"


def save_config(config: dict, path: str) -> None:
    """JSON config save (reference config.py:8-12)."""
    with open(path, "w") as f:
        json.dump(config, f)


def load_config(path: str) -> dict | None:
    """JSON config load; None when absent (reference config.py:14-19)."""
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


# ------------------------------------------------- SVG choropleth render

# 16-stop sample of the viridis colormap (the reference's GeoPandas
# default ramp; the underlying viridis data is published CC0)
_VIRIDIS16 = [
    (68, 1, 84), (72, 26, 108), (71, 47, 125), (65, 68, 135),
    (57, 86, 140), (49, 104, 142), (42, 120, 142), (35, 136, 142),
    (31, 152, 139), (34, 168, 132), (53, 183, 121), (84, 197, 104),
    (122, 209, 81), (165, 219, 54), (210, 226, 27), (253, 231, 37),
]

# qualitative palette for categorical columns (reference visualize_df
# plots `label` categories; 10 well-separated hues)
_QUAL10 = [
    "#4c78a8", "#f58518", "#54a24b", "#e45756", "#72b7b2",
    "#b279a2", "#eeca3b", "#9d755d", "#bab0ac", "#d67195",
]


def _viridis_hex(frac: float) -> str:
    """Piecewise-linear interpolation through the 16 viridis stops."""
    f = min(max(float(frac), 0.0), 1.0) * (len(_VIRIDIS16) - 1)
    i = int(f)
    j = min(i + 1, len(_VIRIDIS16) - 1)
    t = f - i
    rgb = tuple(
        int(round(_VIRIDIS16[i][k] + t * (_VIRIDIS16[j][k] - _VIRIDIS16[i][k])))
        for k in range(3)
    )
    return "#%02x%02x%02x" % rgb


def choropleth_svg(
    pdf: pd.DataFrame,
    value_col: str = "label",
    h3_col: str = "h3",
    width: int = 800,
    alpha: float = 0.6,
    legend: bool = True,
) -> str:
    """Aggregated (h3, value) pandas frame -> a self-contained SVG
    choropleth of hexagon polygons in EPSG:3857 — the dependency-free
    analog of the reference's `visualize_df` (visualize.py:33-46:
    GeoPandas `.to_crs(epsg=3857).plot(column=..., legend=True,
    alpha=0.6)`; no matplotlib/contextily ships in a cluster engine, so
    the figure is emitted as SVG markup instead of an Axes).

    Numeric value columns get the viridis ramp + a min/max gradient
    legend; non-numeric columns get a qualitative palette + swatch
    legend. Runs driver-side on AGGREGATED results only (one row per
    cell — vocabulary-sized), like every helper in this module.
    """
    from ..hexlib.geom import lonlat_to_mercator_3857

    if len(pdf) == 0:
        raise ValueError("choropleth_svg needs at least one cell row")
    cells = pdf[h3_col].to_numpy().astype(np.int64).view(np.uint64)
    verts = h3core.cell_boundary(cells)  # (n, 6, 2) lat,lng
    n, k, _ = verts.shape
    mx, my = lonlat_to_mercator_3857(
        verts[:, :, 1].ravel(), verts[:, :, 0].ravel()
    )
    mx = mx.reshape(n, k)
    my = my.reshape(n, k)

    vals = pdf[value_col]
    numeric = pd.api.types.is_numeric_dtype(vals)
    if numeric:
        v = vals.to_numpy(dtype=np.float64)
        if np.all(np.isnan(v)):
            raise ValueError(f"choropleth_svg: {value_col!r} is all-NaN")
        lo, hi = float(np.nanmin(v)), float(np.nanmax(v))
        span = (hi - lo) or 1.0
        # NaN cells (NULL aggregates) render neutral gray, like
        # GeoPandas' missing_kwds — they must not crash the figure
        fills = [
            "#cccccc" if np.isnan(x) else _viridis_hex((x - lo) / span)
            for x in v
        ]
    else:
        cats = sorted(map(str, vals.dropna().unique()))
        cmap = {c: _QUAL10[i % len(_QUAL10)] for i, c in enumerate(cats)}
        fills = [
            "#cccccc" if pd.isna(x) else cmap.get(str(x), "#cccccc")
            for x in vals
        ]

    # fit: mercator bbox -> viewport (SVG y grows downward -> flip)
    x0, x1 = float(mx.min()), float(mx.max())
    y0, y1 = float(my.min()), float(my.max())
    pad = 0.02 * max(x1 - x0, y1 - y0, 1.0)
    x0, x1, y0, y1 = x0 - pad, x1 + pad, y0 - pad, y1 + pad
    scale = width / (x1 - x0)
    height = max(int(round((y1 - y0) * scale)), 1)
    legend_h = 46 if legend else 0

    def _pt(xm: float, ym: float) -> str:
        return f"{(xm - x0) * scale:.2f},{(y1 - ym) * scale:.2f}"

    polys = []
    for i in range(n):
        pts = " ".join(_pt(float(mx[i, j]), float(my[i, j])) for j in range(k))
        polys.append(
            f'<polygon points="{pts}" fill="{fills[i]}" '
            f'fill-opacity="{alpha}" stroke="none"/>'
        )

    leg = []
    if legend and numeric:
        stops = "".join(
            f'<stop offset="{p:.0%}" stop-color="{_viridis_hex(p)}"/>'
            for p in np.linspace(0.0, 1.0, 8)
        )
        leg = [
            f'<defs><linearGradient id="ramp">{stops}</linearGradient></defs>',
            f'<rect x="10" y="{height + 10}" width="220" height="12" fill="url(#ramp)"/>',
            f'<text x="10" y="{height + 38}" font-size="12" font-family="sans-serif">{lo:g}</text>',
            f'<text x="230" y="{height + 38}" font-size="12" font-family="sans-serif" text-anchor="end">{hi:g}</text>',
        ]
    elif legend:
        from xml.sax.saxutils import escape

        for i, c in enumerate(cats[:10]):
            # category labels are arbitrary strings — escape them or a
            # '&'/'<' in a label yields malformed SVG
            leg.append(
                f'<rect x="{10 + i * 78}" y="{height + 10}" width="12" height="12" fill="{cmap[c]}"/>'
                f'<text x="{26 + i * 78}" y="{height + 21}" font-size="12" font-family="sans-serif">{escape(c[:8])}</text>'
            )

    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height + legend_h}" viewBox="0 0 {width} {height + legend_h}">'
        + "".join(polys)
        + "".join(leg)
        + "</svg>"
    )
