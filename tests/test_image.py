"""Image codec + pHash tests (input_hint invariants: decoded-pixel
allclose / PSNR >= 40 dB, caption byte-equality is exercised in the
pipeline tests)."""

import numpy as np
import pytest

from hex2vec_spark.hexlib import image as im


def _pattern(i: int, w: int, h: int) -> np.ndarray:
    """Deterministic gradient+noise RGB pattern (FIXTURES.md §1)."""
    rng = np.random.default_rng(i)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (255 * xx / max(w - 1, 1)),
            (255 * yy / max(h - 1, 1)),
            ((xx + yy) * 255 / max(w + h - 2, 1)),
        ],
        axis=-1,
    )
    noise = rng.integers(0, 32, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


class TestPng:
    @pytest.mark.parametrize("i,w,h", [(0, 16, 16), (1, 32, 32), (2, 64, 48), (3, 7, 5)])
    def test_roundtrip_lossless(self, i, w, h):
        px = _pattern(i, w, h)
        data = im.png_encode(px)
        back = im.png_decode(data)
        assert np.array_equal(px, back)
        assert im.psnr(px, back) == float("inf")

    def test_decode_all_filters(self):
        """Hand-build a PNG per filter type and check recon vs filter-0."""
        import struct, zlib

        px = _pattern(9, 8, 8)
        ref = im.png_decode(im.png_encode(px))
        h, w, _ = px.shape
        for ft in [1, 2, 3, 4]:
            rows = []
            prev = np.zeros(w * 3, dtype=np.int64)
            for r in range(h):
                line = px[r].reshape(-1).astype(np.int64)
                filt = np.zeros_like(line)
                for x in range(w * 3):
                    a = line[x - 3] if x >= 3 else 0
                    b = prev[x]
                    c = prev[x - 3] if x >= 3 else 0
                    if ft == 1:
                        pred = a
                    elif ft == 2:
                        pred = b
                    elif ft == 3:
                        pred = (a + b) >> 1
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    filt[x] = (line[x] - pred) & 0xFF
                rows.append(bytes([ft]) + bytes(filt.astype(np.uint8)))
                prev = line
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            sig = b"\x89PNG\r\n\x1a\n"

            def chunk(tag, payload):
                return (
                    struct.pack(">I", len(payload))
                    + tag + payload
                    + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
                )

            data = (
                sig
                + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"".join(rows)))
                + chunk(b"IEND", b"")
            )
            assert np.array_equal(im.png_decode(data), ref), f"filter {ft}"


class TestPpm:
    def test_roundtrip(self):
        px = _pattern(4, 32, 16)
        assert np.array_equal(im.ppm_decode(im.ppm_encode(px)), px)

    def test_unknown_format_raises(self):
        with pytest.raises(NotImplementedError):
            im.decode_image(b"xxxx", "jpeg")


class TestPhash:
    def test_deterministic_and_robust(self):
        px = _pattern(5, 64, 64)
        h1 = im.phash64(px)
        assert h1 == im.phash64(px.copy())
        # mild quantization should flip few bits
        q = (px // 8 * 8).astype(np.uint8)
        h2 = im.phash64(q)
        dist = bin(np.int64(h1).view(np.uint64) ^ np.int64(h2).view(np.uint64)).count("1")
        assert dist <= 10
        # a very different image should differ a lot
        h3 = im.phash64(255 - _pattern(77, 64, 64)[:, ::-1])
        assert bin(np.int64(h1).view(np.uint64) ^ np.int64(h3).view(np.uint64)).count("1") >= 16

    def test_psnr_quantization_over_40db(self):
        """input_hint invariant: lossy round-trips keep PSNR >= 40 dB."""
        px = _pattern(6, 64, 64)
        noisy = np.clip(px.astype(np.int32) + np.random.default_rng(0).integers(-2, 3, px.shape), 0, 255).astype(np.uint8)
        assert im.psnr(px, noisy) >= 40.0


class TestSsim:
    def test_identical_is_one(self):
        x = _pattern(3, 40, 32)
        assert im.ssim(x, x) == 1.0

    def test_monotone_with_noise(self):
        rng = np.random.default_rng(5)
        x = _pattern(7, 48, 48)
        low = np.clip(x.astype(int) + rng.normal(0, 5, x.shape), 0, 255).astype(np.uint8)
        high = np.clip(x.astype(int) + rng.normal(0, 40, x.shape), 0, 255).astype(np.uint8)
        s_low, s_high = im.ssim(x, low), im.ssim(x, high)
        assert 1.0 > s_low > s_high

    def test_unrelated_images_near_zero(self):
        rng = np.random.default_rng(6)
        a = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        b = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        assert im.ssim(a, b) < 0.2

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError, match="shape"):
            im.ssim(np.zeros((8, 8, 3), np.uint8), np.zeros((8, 9, 3), np.uint8))

    def test_tiny_image_single_window(self):
        x = _pattern(1, 5, 5)
        assert im.ssim(x, x) == 1.0


class TestAugments:
    def test_involutions_and_rotations(self):
        x = _pattern(2, 33, 21)
        assert np.array_equal(im.hflip(im.hflip(x)), x)
        assert np.array_equal(im.vflip(im.vflip(x)), x)
        assert np.array_equal(im.rot90(im.rot90(x, 2), 2), x)
        assert im.rot90(x, 1).shape == (33, 21, 3)

    def test_center_crop_dims_and_content(self):
        x = _pattern(4, 40, 20)
        c = im.center_crop(x, 0.5)
        assert c.shape == (10, 20, 3)
        assert np.array_equal(c, x[5:15, 10:30])

    def test_brightness_clips(self):
        x = np.full((4, 4, 3), 200, np.uint8)
        assert im.adjust_brightness(x, 2.0).max() == 255
        assert im.adjust_brightness(x, 0.5).max() == 100


class TestAugmentUdfs:
    def test_augment_images_matches_numpy(self, spark):
        from hex2vec_spark.functions.augment import augment_images
        from hex2vec_spark.sources.synth import images_table

        img = images_table(spark, 20)
        out = augment_images(img, ("hflip", "crop:0.5")).orderBy("image_id")
        rows = out.collect()
        src = {r["image_id"]: r for r in img.collect()}
        assert len(rows) == 20
        for r in rows:
            px = im.decode_image(bytes(src[r["image_id"]]["bytes"]), src[r["image_id"]]["fmt"])
            want = im.center_crop(im.hflip(px), 0.5)
            assert (r["h"], r["w"]) == want.shape[:2]
            assert r["phash"] == im.phash64(want)
            got_px = im.png_decode(bytes(r["bytes"]))
            assert np.array_equal(got_px, want)  # PNG is lossless
            assert r["fmt"] == "png" and r["aug_ops"] == "hflip,crop:0.5"

    def test_augment_unknown_op_raises_eagerly(self):
        from hex2vec_spark.functions.augment import augment_udf

        with pytest.raises(ValueError, match="unknown augment op"):
            augment_udf(("spin",))

    def test_ssim_roundtrip_bounds(self, spark):
        from hex2vec_spark.functions.augment import ssim_roundtrip
        from hex2vec_spark.sources.synth import images_table
        from pyspark.sql import functions as F

        img = images_table(spark, 12)
        vals = [
            r["s"]
            for r in img.select(
                ssim_roundtrip(F.col("bytes"), F.col("fmt")).alias("s")
            ).collect()
        ]
        assert all(-1.0 <= v <= 1.0 for v in vals)
        assert any(v < 1.0 for v in vals)  # downsample loses detail somewhere

    def test_ssim_pairs_self_is_one(self, spark):
        from hex2vec_spark.functions.augment import ssim_pairs
        from hex2vec_spark.sources.synth import images_table
        from pyspark.sql import functions as F

        img = images_table(spark, 8)
        out = img.select(
            ssim_pairs(
                F.col("bytes"), F.col("fmt"), F.col("bytes"), F.col("fmt")
            ).alias("s")
        ).collect()
        assert all(r["s"] == 1.0 for r in out)
