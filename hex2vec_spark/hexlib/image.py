"""Pure-NumPy image codecs + perceptual hashing.

The container ships no image libraries (PIL/cv2 absent), so the engine
carries its own minimal codecs built on stdlib ``zlib``/``struct``:

  * PNG: 8-bit RGB, non-interlaced; encoder emits filter-0 scanlines,
    decoder handles all five standard filters.
  * PPM (P6): trivial raw RGB, used for bulk-throughput paths where PNG
    deflate cost is not the thing under test.
  * pHash: 64-bit DCT perceptual hash (32x32 grayscale -> 8x8 low-freq
    block vs median) — the ``phash:int64`` column of the input table.
  * PSNR: the >=40 dB decoded-pixel invariant from BASELINE.json.

These run inside Arrow pandas UDFs on binary columns; pixels exist only
transiently as ndarray batches, never as a Spark column.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(rgb: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8)."""
    if rgb.dtype != np.uint8 or rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = rgb.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = rgb.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Supports 8-bit RGB/RGBA (alpha
    dropped), grayscale broadcast to RGB; filters 0-4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    bit_depth = color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bit_depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = 1 + w * channels
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    out = np.zeros((h, w * channels), dtype=np.uint8)
    bpp = channels
    for row in range(h):
        line = raw[row, 1:].astype(np.int64)
        ft = filters[row]
        prev = out[row - 1].astype(np.int64) if row > 0 else np.zeros(w * channels, np.int64)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need sequential left-recon
            rec = np.zeros_like(line)
            for x in range(w * channels):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ft == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif ft == 3:
                    rec[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ft == 4:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad filter {ft}")
        out[row] = rec.astype(np.uint8)
    px = out.reshape(h, w, channels)
    if channels == 1:
        return np.repeat(px, 3, axis=2)
    if channels == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()


def ppm_encode(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


def ppm_decode(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts = []
    pos = 2
    while len(parts) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while data[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while not data[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        # maxval > 255 means 2 bytes/sample — reading uint8 would return
        # garbage silently; fail loudly like png_decode does
        raise ValueError(f"P6 maxval {maxval} unsupported (only 255)")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return png_decode(data)
    if fmt == "ppm":
        return ppm_decode(data)
    raise NotImplementedError(
        f"decoder for fmt={fmt!r} not available in this container (jpeg/webp "
        "would require libs not installed); Spark-side plumbing is format-"
        "agnostic over the binary column"
    )


# ----------------------------------------------------------------- pHash

def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * i + 1) * k / (2.0 * n))
    m[0] = np.sqrt(1.0 / n)
    return m


_DCT32 = _dct_matrix(32)


def _resize_mean(gray: np.ndarray, size: int = 32) -> np.ndarray:
    """Deterministic area-average resize to (size, size). Bins cover at
    least one source pixel: upscaling (source < size) replicates the
    nearest pixel instead of emitting zero rows (no-op on downscale).
    MUST stay bit-identical to sources/synth._phash_batch — bump
    synth.GEN_VERSION with any change here."""
    h, w = gray.shape
    lo_y = (np.arange(size) * h) // size
    hi_y = np.maximum((np.arange(1, size + 1) * h) // size, lo_y + 1)
    lo_x = (np.arange(size) * w) // size
    hi_x = np.maximum((np.arange(1, size + 1) * w) // size, lo_x + 1)
    csum = np.zeros((h + 1, w + 1))
    csum[1:, 1:] = gray.cumsum(0).cumsum(1)
    out = (
        csum[hi_y, :][:, hi_x]
        - csum[lo_y, :][:, hi_x]
        - csum[hi_y, :][:, lo_x]
        + csum[lo_y, :][:, lo_x]
    )
    area = (hi_y - lo_y)[:, None] * (hi_x - lo_x)[None, :]
    return out / area


def phash64(rgb: np.ndarray) -> int:
    """64-bit DCT perceptual hash (signed int64 to match the phash column)."""
    gray = rgb.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = _resize_mean(gray, 32)
    d = _DCT32 @ small @ _DCT32.T
    block = d[:8, :8].copy()
    flat = block.ravel()
    med = np.median(flat[1:])  # exclude DC term from the median
    bits = (flat > med).astype(np.uint64)
    val = np.uint64(0)
    for b in bits:
        val = (val << np.uint64(1)) | b
    return int(val.astype(np.int64))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def _win_means(x: np.ndarray, win: int) -> np.ndarray:
    """Mean over every non-overlapping win x win block (trailing partial
    rows/cols dropped) via one reshape — O(n), no Python loops."""
    h, w = x.shape
    bh, bw = h // win, w // win
    if bh == 0 or bw == 0:  # tiny image: single global window
        return np.array([[x.mean()]])
    return x[: bh * win, : bw * win].reshape(bh, win, bw, win).mean(axis=(1, 3))


def ssim(a: np.ndarray, b: np.ndarray, win: int = 8) -> float:
    """Structural similarity index (Wang et al. 2004) on the luma plane.

    Block implementation: statistics over non-overlapping ``win``-sized
    windows (the fast tile variant of the original sliding window —
    deterministic, vectorized, dependency-free), averaged over tiles.
    1.0 iff identical; monotonically degrades with noise/blur.
    """
    if a.shape != b.shape:
        raise ValueError(f"ssim shape mismatch: {a.shape} vs {b.shape}")
    lw = np.array([0.299, 0.587, 0.114])
    ga = (a.astype(np.float64) @ lw) if a.ndim == 3 else a.astype(np.float64)
    gb = (b.astype(np.float64) @ lw) if b.ndim == 3 else b.astype(np.float64)
    c1, c2 = (0.01 * 255.0) ** 2, (0.03 * 255.0) ** 2
    mu_a, mu_b = _win_means(ga, win), _win_means(gb, win)
    mu_aa, mu_bb = _win_means(ga * ga, win), _win_means(gb * gb, win)
    mu_ab = _win_means(ga * gb, win)
    va = mu_aa - mu_a * mu_a
    vb = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a * mu_a + mu_b * mu_b + c1) * (va + vb + c2)
    )
    return float(s.mean())


# ---------------------------------------------------- deterministic augments

def hflip(rgb: np.ndarray) -> np.ndarray:
    return rgb[:, ::-1]


def vflip(rgb: np.ndarray) -> np.ndarray:
    return rgb[::-1, :]


def rot90(rgb: np.ndarray, k: int = 1) -> np.ndarray:
    return np.rot90(rgb, k=k, axes=(0, 1))


def center_crop(rgb: np.ndarray, frac: float = 0.75) -> np.ndarray:
    """Central ``frac`` of each side (at least 1 px)."""
    if not 0.0 < frac <= 1.0:
        raise ValueError(f"crop frac must be in (0, 1], got {frac}")
    h, w = rgb.shape[:2]
    ch, cw = max(1, int(round(h * frac))), max(1, int(round(w * frac)))
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    return rgb[y0 : y0 + ch, x0 : x0 + cw]


def adjust_brightness(rgb: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(rgb.astype(np.float64) * factor, 0, 255).astype(np.uint8)
