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
