"""Y4M (YUV4MPEG2) video codec in pure NumPy — the REAL video-decode
path for the multimodal operators.

The reference (kraina-ai/hex2vec) has no video pipeline; this module is
a graft addition from the training-data-pipeline brief (multimodal
columns: decode / frame-sample over binary payloads). Y4M is the one
mainstream video container that is fully decodable without an av
library: an ASCII stream header ``YUV4MPEG2 W<w> H<h> F<num>:<den>
[I<ilace>] [A<num>:<den>] [C<colorspace>]\\n`` followed, per frame, by
``FRAME[ <params>]\\n`` + raw planar YUV — the format produced by
``ffmpeg -f yuv4mpegpipe`` and consumed by every codec's reference
encoder (format per the public mjpegtools/yuv4mpeg spec).

Because frames are uncompressed and fixed-size, frame *offsets* are
computable from the header alone, so sampling k frames from an n-frame
payload reads and converts only those k frames — the property the
100 TB frame-sampling path needs (decode cost scales with frames
*kept*, not frames *stored*).

Colorspaces: C444 (full-res planes, lossless chroma — round-trip error
is only the BT.601 uint8 quantization, PSNR > 49 dB), C422, C420 and
its tag aliases (C420jpeg/C420mpeg2/C420paldv — all the same plane
layout; the tags differ only in *siting* of the chroma samples, which a
2x2-mean downsample + nearest upsample treats identically), and Cmono.
Compressed containers (mp4/webm/mkv) still need a real demuxer+codec
and raise ``ValueError`` — documented, not silently faked.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"

# colorspace tag -> (chroma x-subsample, y-subsample); None = no chroma
_CS: dict[str, tuple[int, int] | None] = {
    "C444": (1, 1),
    "C422": (2, 1),
    "C420": (2, 2),
    "C420jpeg": (2, 2),
    "C420mpeg2": (2, 2),
    "C420paldv": (2, 2),
    "Cmono": None,
}


def _plane_bytes(w: int, h: int, cs: str) -> int:
    sub = _CS[cs]
    if sub is None:
        return w * h
    sx, sy = sub
    return w * h + 2 * ((w // sx) * (h // sy))


# ------------------------------------------------------------- RGB <-> YUV
# BT.601 full-range ("JPEG") matrix — the convention C420jpeg implies and
# the one every software decoder defaults to for Y4M.

def _rgb_to_yuv(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    f = lambda p: np.clip(np.round(p), 0, 255).astype(np.uint8)
    return f(y), f(u), f(v)


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    uf = u.astype(np.float64) - 128.0
    vf = v.astype(np.float64) - 128.0
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _down(plane: np.ndarray, sx: int, sy: int) -> np.ndarray:
    """Box (mean) chroma downsample by (sy, sx) — h, w must divide."""
    h, w = plane.shape
    return (
        plane.astype(np.float64)
        .reshape(h // sy, sy, w // sx, sx)
        .mean(axis=(1, 3))
        .round()
        .clip(0, 255)
        .astype(np.uint8)
    )


def _up(plane: np.ndarray, sx: int, sy: int) -> np.ndarray:
    """Nearest-neighbor chroma upsample (inverse of the box mean)."""
    return np.repeat(np.repeat(plane, sy, axis=0), sx, axis=1)


# ------------------------------------------------------------------ encode

def y4m_encode(
    frames: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C444",
) -> bytes:
    """Encode (n, h, w, 3) uint8 RGB frames (or (n, h, w) for Cmono)
    into a Y4M byte stream. Subsampled colorspaces need even dims along
    the subsampled axes."""
    if colorspace not in _CS:
        raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")
    frames = np.asarray(frames)
    mono = _CS[colorspace] is None
    if mono and frames.ndim == 4:  # luma of RGB input
        frames = _rgb_to_yuv(frames)[0]
    if (mono and frames.ndim != 3) or (not mono and frames.ndim != 4):
        raise ValueError(f"frames shape {frames.shape} unusable for {colorspace}")
    n, h, w = frames.shape[:3]
    sub = _CS[colorspace]
    if sub is not None and (h % sub[1] or w % sub[0]):
        raise ValueError(f"{colorspace} needs dims divisible by {sub}; got {w}x{h}")
    out = [b"%s W%d H%d F%d:%d Ip A1:1 %s\n"
           % (_MAGIC, w, h, fps[0], fps[1], colorspace.encode())]
    for i in range(n):
        out.append(b"FRAME\n")
        if mono:
            out.append(np.ascontiguousarray(frames[i], dtype=np.uint8).tobytes())
        else:
            y, u, v = _rgb_to_yuv(frames[i])
            if sub != (1, 1):
                u, v = _down(u, *sub), _down(v, *sub)
            out.append(y.tobytes() + u.tobytes() + v.tobytes())
    return b"".join(out)


# ------------------------------------------------------------------ decode

def y4m_probe(data: bytes) -> dict:
    """Parse the stream header and index every frame WITHOUT converting
    any pixels: returns ``{w, h, fps_num, fps_den, colorspace, n_frames,
    frame_offsets}`` where ``frame_offsets[i]`` is the byte offset of
    frame i's plane data. O(n_frames) offset arithmetic, O(1) pixels."""
    if not data.startswith(_MAGIC):
        head = bytes(data[:12])
        raise ValueError(
            f"not a YUV4MPEG2 stream (starts {head!r}); compressed containers "
            "(mp4/webm/mkv) need an av library and are not supported"
        )
    nl = data.index(b"\n")
    w = h = 0
    fn, fd = 25, 1
    cs = "C420jpeg"  # spec default when no C tag present
    for tok in data[len(_MAGIC):nl].split(b" "):
        if not tok:
            continue
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            fn, fd = (int(x) for x in t[1:].split(":"))
        elif t[0] == "C":
            if t not in _CS:
                raise ValueError(f"unsupported Y4M colorspace tag {t!r}")
            cs = t
        # I (interlacing) and A (aspect) don't affect plane layout
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    fsize = _plane_bytes(w, h, cs)
    offsets: list[int] = []
    pos = nl + 1
    total = len(data)
    while pos < total:
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = data.index(b"\n", pos) + 1  # frame params (if any) end at \n
        if pos + fsize > total:
            raise ValueError(f"truncated frame at byte {pos}")
        offsets.append(pos)
        pos += fsize
    return {
        "w": w, "h": h, "fps_num": fn, "fps_den": fd,
        "colorspace": cs, "n_frames": len(offsets), "frame_offsets": offsets,
    }


def y4m_decode(data: bytes, indices=None) -> np.ndarray:
    """Decode frames to (k, h, w, 3) uint8 RGB. ``indices=None`` decodes
    all frames; otherwise only the requested frames are read/converted
    (constant cost per *kept* frame — the frame-sampling fast path)."""
    info = y4m_probe(data)
    w, h, cs = info["w"], info["h"], info["colorspace"]
    offs = info["frame_offsets"]
    indices = list(range(len(offs))) if indices is None else list(indices)
    sub = _CS[cs]
    buf = np.frombuffer(data, dtype=np.uint8)
    out = np.empty((len(indices), h, w, 3), dtype=np.uint8)
    for k, i in enumerate(indices):
        if not 0 <= i < len(offs):
            raise IndexError(f"frame {i} out of range (n_frames={len(offs)})")
        p = offs[i]
        y = buf[p:p + w * h].reshape(h, w)
        if sub is None:
            out[k] = np.repeat(y[:, :, None], 3, axis=2)
            continue
        sx, sy = sub
        cw, ch = w // sx, h // sy
        q = p + w * h
        u = buf[q:q + cw * ch].reshape(ch, cw)
        v = buf[q + cw * ch:q + 2 * cw * ch].reshape(ch, cw)
        if sub != (1, 1):
            u, v = _up(u, sx, sy), _up(v, sx, sy)
        out[k] = _yuv_to_rgb(y, u, v)
    return out


# ----------------------------------------------------------------- fixture

def synth_y4m_bytes(
    video_id: int,
    n_frames: int = 8,
    w: int = 32,
    h: int = 24,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C444",
) -> bytes:
    """Deterministic Y4M fixture: a gradient whose phase pans with the
    frame index and whose palette is a pure function of ``video_id`` —
    frames within a clip are visually distinct (distinct pHashes) and
    clips are distinct from each other. Test/bench input for the real
    decode path; no external data, per the driver contract."""
    xs = np.arange(w)[None, None, :]
    ys = np.arange(h)[None, :, None]
    fr = np.arange(n_frames)[:, None, None]
    a = 37 + (video_id % 13) * 8
    b = 11 + (video_id % 7) * 4
    r = (xs * a + fr * 29) % 256
    g = (ys * b + fr * 53) % 256
    bl = ((xs + ys) * (3 + video_id % 5) + fr * 17) % 256
    frames = np.stack(
        [np.broadcast_to(c, (n_frames, h, w)) for c in (r, g, bl)], axis=-1
    ).astype(np.uint8)
    return y4m_encode(frames, fps=fps, colorspace=colorspace)
