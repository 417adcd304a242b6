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
