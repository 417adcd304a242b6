"""Deterministic synthetic input tables (FIXTURES.md §1-§2).

The images table is generated *distributed* (mapInPandas over
spark.range) so the bench can build 500k+ rows without a driver-side
bottleneck; every value is a pure function of the row id ``i`` (seeded
rng per row), so any two runs — and the pandas oracle — produce
byte-identical tables regardless of partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hexlib import image as im
from ..functions.h3_fns import DEFAULT_BBOX

VOCAB = [
    "castle", "river", "cafe", "museum", "bridge", "park", "station", "tower",
    "market", "harbor", "forest", "beach", "temple", "cinema", "school", "library",
    "bakery", "fountain", "garden", "windmill", "street", "plaza", "gallery", "arch",
    "canal", "chapel", "farm", "quay", "ruins", "spire", "vineyard", "wall",
    "gate", "mill", "dock", "barn", "shrine", "well", "yard", "lighthouse",
]

W_CYCLE = [16, 32, 64]
H_CYCLE = [16, 32, 48]

# three Zipfian hot cells (FIXTURES: ~20% of rows collapse here for skew
# realism); values are (lat_unit, lng_unit) high-bit prefixes
HOT_UNITS = [(0.31543, 0.42881), (0.58203, 0.61426), (0.74219, 0.23145)]
HOT_WEIGHTS = [0.60, 0.28, 0.12]
HOT_FRACTION = 0.20


def _phash_for_units(lat_unit: float, lng_unit: float, jitter_i: int) -> np.int64:
    """Compose a phash whose geotag lands at (lat_unit, lng_unit) with a
    deterministic sub-cell jitter in the low 15 bits of each half."""
    rng = np.random.default_rng(jitter_i * 2654435761 % (2**32))
    hi = (np.uint64(int(lat_unit * 2**32)) & np.uint64(0xFFFF8000)) | np.uint64(
        int(rng.integers(0, 1 << 15))
    )
    lo = (np.uint64(int(lng_unit * 2**32)) & np.uint64(0xFFFF8000)) | np.uint64(
        int(rng.integers(0, 1 << 15))
    )
    return ((hi << np.uint64(32)) | lo).astype(np.int64)


def make_image_row(i: int) -> dict:
    """Pure function row-id -> full row (shared with the pandas oracle)."""
    rng = np.random.default_rng(i)
    w = W_CYCLE[i % 3]
    h = H_CYCLE[i % 3]
    fmt = "png" if i % 4 == 0 else "ppm"
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            255 * xx / max(w - 1, 1),
            255 * yy / max(h - 1, 1),
            (xx + yy) * 255 / max(w + h - 2, 1),
        ],
        axis=-1,
    )
    px = np.clip(base + rng.integers(0, 32, (h, w, 3)), 0, 255).astype(np.uint8)
    data = im.png_encode(px) if fmt == "png" else im.ppm_encode(px)
    n_tok = 2 + i % 5
    toks = [VOCAB[int(v)] for v in rng.integers(0, len(VOCAB), n_tok)]
    caption = ";".join(toks)
    # phash: consistent with pixels, except ~20% "hot" rows rewritten to
    # collapse their geotags into 3 Zipfian cells (skew realism)
    if (i * 2654435761 % 100) < int(HOT_FRACTION * 100):
        r = (i * 40503 % 100) / 100.0
        hot = 0 if r < HOT_WEIGHTS[0] else (1 if r < HOT_WEIGHTS[0] + HOT_WEIGHTS[1] else 2)
        phash = _phash_for_units(*HOT_UNITS[hot], jitter_i=i)
    else:
        phash = np.int64(im.phash64(px))
    return {
        "image_id": f"img{i:010d}",
        "bytes": data,
        "w": np.int32(w),
        "h": np.int32(h),
        "fmt": fmt,
        "caption": caption,
        "phash": phash,
    }


IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def images_pandas(n: int, start: int = 0) -> pd.DataFrame:
    rows = [make_image_row(i) for i in range(start, start + n)]
    pdf = pd.DataFrame(rows)
    pdf["w"] = pdf["w"].astype("int32")
    pdf["h"] = pdf["h"].astype("int32")
    pdf["phash"] = pdf["phash"].astype("int64")
    return pdf


def images_table(spark, n: int, num_partitions: int | None = None):
    """Distributed deterministic generation of the input table."""
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pd.DataFrame([make_image_row(int(i)) for i in pdf["id"]])
            out["w"] = out["w"].astype("int32")
            out["h"] = out["h"].astype("int32")
            out["phash"] = out["phash"].astype("int64")
            yield out

    return (
        spark.range(0, n, numPartitions=num_partitions)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
    )


# ------------------------------------------------------------------ regions

def regions_pandas(bbox=DEFAULT_BBOX) -> pd.DataFrame:
    """10 deterministic region polygons tiling the bbox (FIXTURES.md §2):
    a 2 x 5 grid of jittered convex quads; region r09 is a MultiPolygon
    (two rings / two rows) to exercise the explode path
    (make_dataset.py:88-89)."""
    lat0, lat1, lng0, lng1 = bbox
    rng = np.random.default_rng(42)
    rows = []
    n_lat, n_lng = 2, 5
    dlat = (lat1 - lat0) / n_lat
    dlng = (lng1 - lng0) / n_lng
    rid = 0
    for a in range(n_lat):
        for b in range(n_lng):
            la, lb = lat0 + a * dlat, lng0 + b * dlng
            jit = lambda: float(rng.uniform(0.02, 0.10))
            ring_lat = [la + jit() * dlat, la + jit() * dlat,
                        la + dlat - jit() * dlat, la + dlat - jit() * dlat]
            ring_lng = [lb + jit() * dlng, lb + dlng - jit() * dlng,
                        lb + dlng - jit() * dlng, lb + jit() * dlng]
            if rid == 9:  # multipolygon: split into two disjoint rings
                mid = lb + dlng / 2
                rows.append({"region_id": "r09", "part": 0,
                             "ring_lat": ring_lat, "ring_lng": [ring_lng[0], mid - 0.02 * dlng, mid - 0.02 * dlng, ring_lng[3]]})
                rows.append({"region_id": "r09", "part": 1,
                             "ring_lat": ring_lat, "ring_lng": [mid + 0.02 * dlng, ring_lng[1], ring_lng[2], mid + 0.02 * dlng]})
            else:
                rows.append({"region_id": f"r{rid:02d}", "part": 0,
                             "ring_lat": ring_lat, "ring_lng": ring_lng})
            rid += 1
    return pd.DataFrame(rows)
