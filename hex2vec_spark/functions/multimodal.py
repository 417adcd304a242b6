"""Multimodal-column operators: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched UDFs (`mapInPandas` / `pandas_udf`).

Design (per the training-data-pipeline brief): image/audio/video travel
as `binary` columns with typed metadata columns; pixels/samples/frames
exist only transiently inside UDF batches. All three modalities decode
for REAL without external libraries: images via the hexlib PNG/PPM
codecs + NumPy area resize, audio via stdlib ``wave`` PCM + NumPy MFCC
(round 2), video via the pure-NumPy Y4M/YUV4MPEG2 codec in
``hexlib.video`` (round 4) — uncompressed formats only; compressed
codecs (jpeg/mp3/mp4) would need av libraries this container doesn't
ship and raise a documented error. ``fake=True`` keeps the round-1
deterministic pseudo-feature stubs for opaque payloads (plumbing tests
over arbitrary bytes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StructField, StructType,
)

from ..hexlib import image as im
from ..hexlib.hexmath import splitmix64 as _mix64  # shared mixer

_U = np.uint64


def _bytes_seed(data: pd.Series) -> np.ndarray:
    """Deterministic 64-bit seed per binary payload (FNV-1a over a
    bounded prefix — O(1) per row regardless of payload size)."""
    out = np.empty(len(data), dtype=np.uint64)
    for i, b in enumerate(data.to_numpy()):
        h = 0xCBF29CE484222325
        for ch in bytes(b)[:64]:
            h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[i] = h
    return out


# ------------------------------------------------------------------ image

def resize_image_udf(out_w: int = 16, out_h: int = 16):
    """REAL decode -> area-average resize -> PNG re-encode. Returns
    struct(bytes, w, h). Batch memory bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch x image size."""
    schema = StructType([
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
    ])

    @F.pandas_udf(schema)
    def _udf(data: pd.Series, fmt: pd.Series) -> pd.DataFrame:
        enc, ws, hs = [], [], []
        for b, f in zip(data.to_numpy(), fmt.to_numpy()):
            px = im.decode_image(bytes(b), str(f)).astype(np.float64)
            h, w, _ = px.shape
            # integral-image area resize per channel. Bins are forced to
            # cover >= 1 source pixel: when upscaling (out > source) the
            # floor edges produce zero-width bins, which would emit black
            # stripes; clamping hi to lo+1 replicates the nearest pixel
            # instead (no-op when downscaling).
            lo_y = (np.arange(out_h) * h) // out_h
            hi_y = np.maximum((np.arange(1, out_h + 1) * h) // out_h, lo_y + 1)
            lo_x = (np.arange(out_w) * w) // out_w
            hi_x = np.maximum((np.arange(1, out_w + 1) * w) // out_w, lo_x + 1)
            cs = np.zeros((h + 1, w + 1, 3))
            cs[1:, 1:, :] = px.cumsum(0).cumsum(1)
            s = (cs[hi_y, :, :][:, hi_x, :] - cs[lo_y, :, :][:, hi_x, :]
                 - cs[hi_y, :, :][:, lo_x, :] + cs[lo_y, :, :][:, lo_x, :])
            area = ((hi_y - lo_y)[:, None] * (hi_x - lo_x)[None, :])[:, :, None]
            small = np.clip(s / area, 0, 255).astype(np.uint8)
            enc.append(im.png_encode(small, level=1))
            ws.append(out_w)
            hs.append(out_h)
        return pd.DataFrame({"bytes": enc, "w": np.asarray(ws, np.int32), "h": np.asarray(hs, np.int32)})

    return _udf


def resize_images(df: DataFrame, out_w: int = 16, out_h: int = 16) -> DataFrame:
    r = df.withColumn("_r", resize_image_udf(out_w, out_h)(F.col("bytes"), F.col("fmt")))
    return r.select(
        "image_id", F.col("_r.bytes").alias("bytes_small"),
        F.col("_r.w").alias("w"), F.col("_r.h").alias("h"),
    ).withColumn("fmt", F.lit("png"))


# ------------------------------------------------------------------ video

FRAME_SCHEMA = ArrayType(StructType([
    StructField("frame_idx", IntegerType()),
    StructField("t_ms", IntegerType()),
    StructField("frame_phash", LongType()),
]))


def _sample_indices(n_avail: int, n_want: int) -> np.ndarray:
    """n_want uniformly-spaced frame indices over [0, n_avail) —
    distinct whenever n_want <= n_avail (stride >= 1)."""
    k = min(n_want, n_avail)
    return (np.arange(k, dtype=np.int64) * n_avail) // max(k, 1)


def frame_sample_udf(n_frames: int = 4, fps: float = 25.0, fake: bool = False):
    """Video frame sampling: binary payload -> n uniformly-spaced frames
    -> per-frame pHash.

    ``fake=False`` (default since round 4) is the REAL path for Y4M
    (YUV4MPEG2) payloads: ``hexlib.video.y4m_probe`` indexes every frame
    from the header alone (fixed raw frame size), so only the *sampled*
    frames are read and YUV->RGB converted — decode cost scales with
    frames kept, not frames stored. Timestamps come from the stream's
    own F<num>:<den> rate; pHashes are the same DCT ``phash64`` the
    image path uses, so frame-level dedup composes with image dedup.
    Compressed containers raise ``ValueError`` (documented; no av libs).
    ``fake=True`` keeps the round-1 deterministic pseudo-phash stub for
    opaque payloads (plumbing tests over image bytes); ``fps`` is only
    used by that path (the real path reads the rate from the header)."""

    @F.pandas_udf(FRAME_SCHEMA)
    def _udf(data: pd.Series) -> pd.Series:
        if not fake:
            from ..hexlib import video as vid

            out = []
            for b in data.to_numpy():
                b = bytes(b)
                info = vid.y4m_probe(b)
                idx = _sample_indices(info["n_frames"], n_frames)
                frames = vid.y4m_decode(b, indices=idx)
                ms = 1000.0 * info["fps_den"] / info["fps_num"]
                out.append([
                    {
                        "frame_idx": int(i),
                        "t_ms": int(round(i * ms)),
                        "frame_phash": int(im.phash64(frames[j])),
                    }
                    for j, i in enumerate(idx)
                ])
            return pd.Series(out)
        seeds = _bytes_seed(data)
        out = []
        for s in seeds:
            idx = np.arange(n_frames, dtype=np.uint64)
            ph = _mix64(np.uint64(s) ^ (idx * _U(0x9E3779B97F4A7C15))).astype(np.int64)
            out.append([
                {"frame_idx": int(i), "t_ms": int(i * 1000.0 / fps), "frame_phash": int(p)}
                for i, p in enumerate(ph)
            ])
        return pd.Series(out)

    return _udf


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    payload_col: str = "bytes",
    fake: bool = False,
) -> DataFrame:
    """Explode sampled frames to one row per (video, frame) — the narrow
    form every downstream operator (dedup, binning) consumes."""
    frames = frame_sample_udf(n_frames, fake=fake)(F.col(payload_col)).alias("frames")
    return df.select("image_id", F.explode(frames).alias("fr")).select(
        "image_id",
        F.col("fr.frame_idx").alias("frame_idx"),
        F.col("fr.t_ms").alias("t_ms"),
        F.col("fr.frame_phash").alias("frame_phash"),
    )


def extract_frames(
    df: DataFrame,
    n_frames: int = 4,
    payload_col: str = "bytes",
    id_col: str = "image_id",
) -> DataFrame:
    """REAL video -> image bridge: uniformly sample ``n_frames`` from
    each Y4M payload and emit one row per frame with the frame
    re-encoded as PNG — the exact (bytes, w, h, fmt) shape the whole
    image pipeline (resize, pHash, stats, tile-hex binning) consumes,
    so every image operator composes onto video for free.

    ``mapInPandas`` (not a scalar UDF): output cardinality differs from
    input (1 video -> k frames), and one input batch can legally emit
    multiple output chunks, keeping peak memory at batch x frame size."""
    from pyspark.sql.types import StringType, StructType

    out_schema = StructType([
        df.schema[id_col],
        StructField("frame_idx", IntegerType()),
        StructField("t_ms", IntegerType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ])

    def gen(batches):
        from ..hexlib import video as vid

        for pdf in batches:
            rows: list[dict] = []
            for vid_id, b in zip(pdf[id_col].to_numpy(), pdf[payload_col].to_numpy()):
                b = bytes(b)
                info = vid.y4m_probe(b)
                idx = _sample_indices(info["n_frames"], n_frames)
                frames = vid.y4m_decode(b, indices=idx)
                ms = 1000.0 * info["fps_den"] / info["fps_num"]
                for j, i in enumerate(idx):
                    rows.append({
                        id_col: vid_id,
                        "frame_idx": int(i),
                        "t_ms": int(round(i * ms)),
                        "bytes": im.png_encode(frames[j], level=1),
                        "w": int(info["w"]),
                        "h": int(info["h"]),
                        "fmt": "png",
                    })
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)


# ------------------------------------------------------------------ audio

AUDIO_FEAT_SCHEMA = StructType([
    StructField("duration_s", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("mfcc", ArrayType(DoubleType())),
])


def _wav_parse(b: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (mono float64 signal in [-1, 1], sample rate). Pure
    stdlib ``wave`` + NumPy — no external audio lib (round-2: the real
    path the round-1 stub deferred; only compressed codecs stay out)."""
    import io
    import wave

    with wave.open(io.BytesIO(b)) as w:
        rate = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, "u1").astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, rate


def _mfcc(x: np.ndarray, rate: int, n_mfcc: int, n_mels: int = 26) -> np.ndarray:
    """Per-clip mean MFCC, real DSP in plain NumPy: 25 ms Hann frames /
    10 ms hop -> power rFFT -> triangular mel filterbank -> log ->
    orthonormal DCT-II -> first ``n_mfcc`` coefficients, frame-averaged."""
    nwin, nhop = max(int(rate * 0.025), 2), max(int(rate * 0.010), 1)
    if len(x) < nwin:
        x = np.pad(x, (0, nwin - len(x)))
    n_frames = 1 + (len(x) - nwin) // nhop
    idx = np.arange(nwin)[None, :] + nhop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(nwin)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # (F, nwin//2+1)
    # mel filterbank
    def mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def imel(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    pts = imel(np.linspace(mel(0.0), mel(rate / 2.0), n_mels + 2))
    bins = np.fft.rfftfreq(nwin, 1.0 / rate)
    fb = np.zeros((n_mels, len(bins)))
    for m in range(n_mels):
        lo, mid, hi = pts[m], pts[m + 1], pts[m + 2]
        up = (bins - lo) / max(mid - lo, 1e-9)
        down = (hi - bins) / max(hi - mid, 1e-9)
        fb[m] = np.clip(np.minimum(up, down), 0.0, None)
    logmel = np.log(power @ fb.T + 1e-10)  # (F, n_mels)
    # orthonormal DCT-II
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(n_mels)[None, :]
    dct = np.cos(np.pi * k * (2 * n + 1) / (2.0 * n_mels)) * np.sqrt(2.0 / n_mels)
    dct[0] /= np.sqrt(2.0)
    return (logmel @ dct.T).mean(axis=0)  # (n_mfcc,)


def synth_wav_bytes(clip_id: int, rate: int = 8000, seconds: float = 0.5) -> bytes:
    """Deterministic PCM WAV fixture: a two-tone sine whose frequencies
    and gain are pure functions of ``clip_id`` (test/bench input for the
    real decode path — no external data, per the driver contract)."""
    import io
    import wave

    t = np.arange(int(rate * seconds)) / rate
    f1 = 200.0 + (clip_id % 17) * 60.0
    f2 = 500.0 + (clip_id % 29) * 40.0
    g = 0.3 + 0.4 * ((clip_id % 7) / 6.0)
    x = g * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    pcm = np.round(np.clip(x, -1.0, 1.0) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_features_udf(n_mfcc: int = 8, fake: bool = False):
    """Audio feature extraction: binary payload -> (duration, rms,
    mfcc[n]).

    ``fake=False`` (default since round 2) is the REAL path for PCM WAV
    payloads: stdlib ``wave`` parse + NumPy MFCC (no external audio lib
    needed — compressed codecs would need one and stay unsupported).
    ``fake=True`` keeps the round-1 deterministic pseudo-feature stub
    for opaque non-WAV payloads (plumbing tests over image bytes)."""

    @F.pandas_udf(AUDIO_FEAT_SCHEMA)
    def _udf(data: pd.Series) -> pd.DataFrame:
        if not fake:
            rows = []
            for b in data:
                x, rate = _wav_parse(bytes(b))
                dur = len(x) / float(rate)
                rms = float(np.sqrt(np.mean(x**2))) if len(x) else 0.0
                rows.append(
                    {
                        "duration_s": dur,
                        "rms": rms,
                        "mfcc": _mfcc(x, rate, n_mfcc).tolist(),
                    }
                )
            return pd.DataFrame(rows, columns=["duration_s", "rms", "mfcc"])
        seeds = _bytes_seed(data)
        n = len(seeds)
        lens = np.array([len(bytes(b)) for b in data.to_numpy()], dtype=np.float64)
        dur = lens / 16000.0  # opaque payload: pretend 16 kHz mono s16
        rms = ((_mix64(seeds) & _U(0xFFFF)).astype(np.float64) / 65535.0)
        ks = np.arange(1, n_mfcc + 1, dtype=np.uint64)
        mf = ((_mix64(seeds[:, None] * ks[None, :]) & _U(0xFFFF)).astype(np.float64)
              / 32768.0 - 1.0)
        return pd.DataFrame({
            "duration_s": dur, "rms": rms,
            "mfcc": [mf[i].tolist() for i in range(n)],
        })

    return _udf
