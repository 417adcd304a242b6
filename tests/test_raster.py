"""rasterize_hex: exact pixel oracle (encode lattice + value lookup in
NumPy), quantization roundtrip, pinned-scale groups, background fill."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hex2vec_spark.hexlib import h3core
from hex2vec_spark.hexlib.image import png_decode
from hex2vec_spark.operators.raster import rasterize_hex

BBOX = (41.0, 41.05, 15.0, 15.06)  # inside DEFAULT_BBOX, single face
RES = 8


def _cells_with_values(seed=4, n=60):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(BBOX[0], BBOX[1], n)
    lng = rng.uniform(BBOX[2], BBOX[3], n)
    cells = np.unique(h3core.encode(lat, lng, RES))
    vals = rng.uniform(-3.0, 7.0, len(cells))
    return pd.DataFrame({"h3": cells.view(np.int64), "value": vals})


def _oracle_gray(pdf, width, height, bbox, vmin=None, vmax=None, background=0):
    cells = pdf["h3"].to_numpy().view(np.uint64)
    vals = pdf["value"].to_numpy()
    lat0, lat1, lng0, lng1 = bbox
    py = lat1 - (np.arange(height) + 0.5) * (lat1 - lat0) / height
    px = lng0 + (np.arange(width) + 0.5) * (lng1 - lng0) / width
    pc = h3core.encode(np.repeat(py, width), np.tile(px, height), RES)
    lut = dict(zip(cells.tolist(), vals.tolist()))
    lo = min(vals) if vmin is None else vmin
    hi = max(vals) if vmax is None else vmax
    out = np.full(width * height, background, dtype=np.uint8)
    for i, c in enumerate(pc.tolist()):
        if c in lut:
            out[i] = np.clip(np.rint((lut[c] - lo) / max(hi - lo, 1e-300) * 255.0), 0, 255)
    return out.reshape(height, width)


class TestRasterizeHex:
    def test_pixels_match_numpy_oracle(self, spark):
        pdf = _cells_with_values()
        df = spark.createDataFrame(pdf)
        out = rasterize_hex(df, "value", width=96, height=64, bbox=BBOX).toPandas()
        assert len(out) == 1
        row = out.iloc[0]
        assert row["fmt"] == "png" and row["w"] == 96 and row["h"] == 64
        rgb = png_decode(bytes(row["bytes"]))
        assert rgb.shape == (64, 96, 3)
        want = _oracle_gray(pdf, 96, 64, BBOX)
        np.testing.assert_array_equal(rgb[:, :, 0], want)
        np.testing.assert_array_equal(rgb[:, :, 0], rgb[:, :, 1])
        # scale columns reflect the data
        assert row["vmin"] == pytest.approx(pdf["value"].min())
        assert row["vmax"] == pytest.approx(pdf["value"].max())

    def test_quantization_roundtrip(self, spark):
        # every rendered hex's pixel level decodes back to its value
        # within half a quantization step
        pdf = _cells_with_values(seed=9)
        df = spark.createDataFrame(pdf)
        row = rasterize_hex(df, "value", width=128, height=128, bbox=BBOX).toPandas().iloc[0]
        gray = png_decode(bytes(row["bytes"]))[:, :, 0]
        lo, hi = row["vmin"], row["vmax"]
        step = (hi - lo) / 255.0
        py = BBOX[1] - (np.arange(128) + 0.5) * (BBOX[1] - BBOX[0]) / 128
        px = BBOX[2] + (np.arange(128) + 0.5) * (BBOX[3] - BBOX[2]) / 128
        pc = h3core.encode(np.repeat(py, 128), np.tile(px, 128), RES).reshape(128, 128)
        lut = dict(zip(pdf["h3"].to_numpy().view(np.uint64).tolist(), pdf["value"].tolist()))
        checked = 0
        for i in range(0, 128, 7):
            for j in range(0, 128, 7):
                v = lut.get(int(pc[i, j]))
                if v is not None:
                    back = lo + gray[i, j] * step
                    assert abs(back - v) <= step / 2 + 1e-9
                    checked += 1
        assert checked > 50

    def test_groups_pinned_scale_and_background(self, spark):
        pdf = _cells_with_values(seed=2)
        a = pdf.assign(region_id="a")
        b = pdf.assign(region_id="b", value=pdf["value"] * 2.0)
        df = spark.createDataFrame(pd.concat([a, b]))
        out = (
            rasterize_hex(
                df, "value", group_cols=["region_id"], width=64, height=64,
                bbox=BBOX, vmin=-10.0, vmax=20.0, background=7,
            )
            .orderBy("region_id")
            .toPandas()
        )
        assert list(out["region_id"]) == ["a", "b"]
        assert (out["vmin"] == -10.0).all() and (out["vmax"] == 20.0).all()
        ga = png_decode(bytes(out.iloc[0]["bytes"]))[:, :, 0]
        gb = png_decode(bytes(out.iloc[1]["bytes"]))[:, :, 0]
        # same geometry, doubled values: covered pixels differ, empty agree
        want_a = _oracle_gray(a, 64, 64, BBOX, vmin=-10.0, vmax=20.0, background=7)
        want_b = _oracle_gray(b, 64, 64, BBOX, vmin=-10.0, vmax=20.0, background=7)
        np.testing.assert_array_equal(ga, want_a)
        np.testing.assert_array_equal(gb, want_b)
        assert (ga == 7).any()  # background present

    def test_auto_bbox_covers_all_cells(self, spark):
        pdf = _cells_with_values(seed=5)
        df = spark.createDataFrame(pdf)
        row = rasterize_hex(df, "value", width=128, height=128).toPandas().iloc[0]
        clat, clng = h3core.cell_center(pdf["h3"].to_numpy().view(np.uint64))
        assert row["lat0"] < clat.min() and row["lat1"] > clat.max()
        assert row["lng0"] < clng.min() and row["lng1"] > clng.max()
        gray = png_decode(bytes(row["bytes"]))[:, :, 0]
        assert gray.max() > 0  # something rendered


class TestMixedResolutionGuard:
    def test_group_mixing_resolutions_raises(self, spark):
        """Cells at a foreign resolution must raise, not silently render
        as background (round-5 advisor fix)."""
        pdf = _cells_with_values(n=20)
        coarse = h3core.encode(np.array([41.02]), np.array([15.03]), RES - 1)
        pdf = pd.concat(
            [pdf, pd.DataFrame({"h3": coarse.view(np.int64), "value": [1.0]})],
            ignore_index=True,
        )
        sdf = spark.createDataFrame(pdf).withColumn("g", F.lit(0))
        out = rasterize_hex(sdf, "value", group_cols=["g"], width=32, height=32)
        with pytest.raises(Exception, match="mixes H3 resolutions"):
            out.collect()
