"""Deduplication operators (graft extensions for training-data pipelines):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup,
and pHash near-dup for images.

Shapes chosen for 100 TB scale: every pipeline is
(narrow per-row signature) -> (band/bucket key) -> (self-join only within
buckets) -> (pair verify). The candidate self-join joins on bucket keys,
never all-pairs; bucket skew is bounded by band width.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

# deterministic 64-bit mix (splitmix64-style) used by several signatures
_MIX = 0xFF51AFD7ED558CCD


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: md5 of normalized text, keep the min id per group
    (deterministic winner)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return (
        df.withColumn("fp", F.md5(norm))
        .groupBy("fp")
        .agg(F.min(F.col(id_col)).alias(id_col), F.count(F.lit(1)).alias("n_dupes"))
    )


def _shingle_hashes_udf(shingle: int = 3, n_hashes: int = 32):
    """words -> n_hashes MinHash values over word shingles.

    Shingle base hashes use a deterministic FNV-1a (NOT python's ``hash``,
    which is seed-randomized per process and would differ across
    executors); per-function values h_i(x) = mix(x ^ seed_i), vectorized.
    """
    seeds = (np.arange(1, n_hashes + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))

    @F.pandas_udf(ArrayType(LongType()))
    def _udf(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            words = str(t).lower().split()
            if len(words) < shingle:
                shingles = [" ".join(words)] if words else [""]
            else:
                shingles = [" ".join(words[i : i + shingle]) for i in range(len(words) - shingle + 1)]
            base = np.array([_stable_hash(s) for s in shingles], dtype=np.uint64)
            vals = base[:, None] ^ seeds[None, :]
            vals ^= vals >> np.uint64(33)
            vals *= np.uint64(_MIX)
            vals ^= vals >> np.uint64(33)
            out.append(vals.min(axis=0).astype(np.int64).tolist())
        return pd.Series(out)

    return _udf


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    bands: int = 8,
    shingle: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """MinHash + banded LSH near-dup candidate pairs: signature ->
    band keys -> self-join per band bucket -> distinct pairs.

    ``materialize`` localCheckpoints the banded signatures before the
    self-join: a self-join recomputes its input lineage on BOTH sides,
    so without it the MinHash UDF (the dominant cost at scale) runs
    twice over the corpus.

    Shingle hashing uses _stable_hash (FNV-1a), never python's ``hash``,
    which is seed-randomized per process and differs across executors.
    """
    sig = _shingle_hashes_udf(shingle, n_hashes)
    rows_per_band = n_hashes // bands
    with_sig = df.select(F.col(id_col), sig(F.col(text_col)).alias("_sig"))
    band_cols = [
        F.xxhash64(
            F.lit(b), *[F.col("_sig")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        ).alias(f"_band{b}")
        for b in range(bands)
    ]
    banded = with_sig.select(id_col, *band_cols)
    stacked = banded.select(
        id_col,
        F.explode(F.array(*[F.struct(F.lit(b).alias("band"), F.col(f"_band{b}").alias("key")) for b in range(bands)])).alias("bk"),
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if materialize:
        stacked = stacked.localCheckpoint(eager=False)
    left = stacked.alias("l")
    right = stacked.alias("r")
    return (
        left.join(right, ["band", "key"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def simhash_udf():
    """64-bit SimHash over word tokens (sign of per-bit vote sums)."""

    @F.pandas_udf(LongType())
    def _udf(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for r, t in enumerate(text):
            acc = np.zeros(64, dtype=np.int64)
            for w in str(t).lower().split():
                hv = _stable_hash(w)
                bits = (hv >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            val = np.uint64(0)
            for b in range(64):
                if acc[b] > 0:
                    val |= np.uint64(1) << np.uint64(b)
            out[r] = np.int64(val.astype(np.int64))
        return pd.Series(out)

    return _udf


def _stable_hash(s: str) -> np.uint64:
    """Deterministic cross-process 64-bit string hash (FNV-1a)."""
    h = np.uint64(0xCBF29CE484222325)
    for ch in s.encode("utf-8"):
        h = np.uint64((int(h) ^ ch) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
    return h


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    materialize: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs via explode + join + count
    algebra (SQL-expressible; the oracle computes the same thing).
    |A ∩ B| from a shingle equi-join, |A ∪ B| = |A| + |B| - |A ∩ B|.
    Quadratic only within shared-shingle groups. ``materialize``
    localCheckpoints the gram table, which is otherwise recomputed three
    times (both self-join sides + the size table)."""
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
            )
        ).alias("gram"),
    ).distinct()
    if materialize:
        grams = grams.localCheckpoint(eager=False)
    sizes = grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    g1 = grams.alias("g1")
    g2 = grams.alias("g2")
    inter = (
        g1.join(g2, "gram")
        .where(F.col(f"g1.{id_col}") < F.col(f"g2.{id_col}"))
        .groupBy(F.col(f"g1.{id_col}").alias("id_a"), F.col(f"g2.{id_col}").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.col("n_inter") / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def phash_near_dup(images: DataFrame, max_hamming: int = 6, id_col: str = "image_id") -> DataFrame:
    """Image near-dup via pHash hamming distance, bucketed by the top
    16 bits (near-dups share the low-frequency DCT prefix) so the
    self-join never goes all-pairs."""
    bucket = F.shiftrightunsigned(F.col("phash"), 48).alias("bucket")
    sig = images.select(F.col(id_col), F.col("phash"), bucket)
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
    return (
        a.join(b, "bucket")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .where(ham <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
    )


def embedding_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-dup: LSH-bucket (random hyperplanes), join
    within buckets, verify cosine >= threshold. Shares the dot/norm
    expression kernels with operators/knn (same LSH bucketing there)."""
    from .knn import _dot, _norm, _sniff_dim

    dim = _sniff_dim(emb, vec_col)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    vc = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = F.shiftleft(bucket, 1) + F.when(_dot(vc, planes[p].tolist()) >= 0, 1).otherwise(0)
    norm = _norm(vc)
    sig = emb.select(F.col(id_col), vc.alias("v"), bucket.alias("bucket"), norm.alias("nrm"))
    # self-join: materialize the signatures once (n_planes dot products
    # per row would otherwise run on both sides)
    sig = sig.localCheckpoint(eager=False)
    a, b = sig.alias("a"), sig.alias("b")
    dot_ab = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        a.join(b, "bucket")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("cosine", dot_ab / (F.col("a.nrm") * F.col("b.nrm")))
        .where(F.col("cosine") >= threshold)
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"), "cosine")
    )
