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
