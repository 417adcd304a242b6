"""Distributed KMeans (Lloyd's) over an embedding column.

Reference: cluster-word2vec.ipynb cells 28-49 fit sklearn KMeans on the
collected embedding matrix and explain clusters by per-label means (A6).
Here the same computation is Spark-first: centroids live driver-side
(k x dim — tiny), assignment is one vectorized Arrow UDF pass (broadcast
centroids in the closure, batched GEMM argmin), and the update step is
per-partition partial sums (mapInPandas: one (k, dim) accumulator per
partition) combined driver-side — per iteration the cluster sees
n_partitions * k tiny rows, never a shuffle of the vectors themselves.
Deterministic: seeded hash-ordered init, movement tolerance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _assign_udf(cents: np.ndarray):
    cents = np.asarray(cents, dtype=np.float64)

    @F.pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        # argmin ||x - c||^2 = argmax 2 x.c - ||c||^2 (one GEMM per batch)
        scores = 2.0 * (mat @ cents.T) - (cents * cents).sum(axis=1)[None, :]
        return pd.Series(np.argmax(scores, axis=1).astype(np.int32))

    return _assign


def _cluster_partials(labeled: DataFrame, k: int, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """(counts (k,), sums (k, dim)) of the labeled vectors: per-partition
    accumulators via mapInPandas, combined driver-side (n_partitions * k
    tiny rows cross the wire — the vectors never shuffle)."""

    def part(batches):
        n_acc = np.zeros(k, dtype=np.int64)
        s_acc = np.zeros((k, dim), dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["_v"]])
            c = pdf["_c"].to_numpy()
            n_acc += np.bincount(c, minlength=k)
            np.add.at(s_acc, c, mat)
        yield pd.DataFrame(
            {"c": np.arange(k), "n": n_acc, "s": [row.tolist() for row in s_acc]}
        )

    rows = labeled.mapInPandas(part, "c int, n long, s array<double>").collect()
    counts = np.zeros(k, dtype=np.int64)
    sums = np.zeros((k, dim), dtype=np.float64)
    for r in rows:
        counts[r["c"]] += r["n"]
        sums[r["c"]] += np.asarray(r["s"])
    return counts, sums


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    max_iter: int = 10,
    tol: float = 1e-5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 29,
) -> tuple[np.ndarray, int]:
    """Fit k centroids; returns (centroids (k, dim), iterations run).

    Init: the k rows with the smallest xxhash64(id, seed) — a seeded
    pseudo-random deterministic sample independent of partitioning
    (kmeans++ would add one pass per centroid; hash-init keeps the plan
    one job per iteration and is reproducible)."""
    from .knn import _sniff_dim

    dim = _sniff_dim(emb, vec_col)
    init = (
        emb.select(vec_col)
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col))
        .limit(k)
        .collect()
    )
    cents = np.asarray([[float(x) for x in r[vec_col]] for r in init])
    if len(cents) < k:
        raise ValueError(f"need >= {k} rows to init {k} centroids")

    vc = F.col(vec_col).cast("array<double>")
    it = 0
    for it in range(1, max_iter + 1):
        labeled = emb.select(_assign_udf(cents)(vc).alias("_c"), vc.alias("_v"))
        counts, sums = _cluster_partials(labeled, k, dim)
        new = cents.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        move = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
        cents = new
        if move < tol:
            break
    return cents, it


def kmeans_transform(
    emb: DataFrame, cents: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Attach the cluster label column (one Arrow pass)."""
    return emb.withColumn(
        "cluster", _assign_udf(cents)(F.col(vec_col).cast("array<double>"))
    )


def kmeans_cluster_means(
    labeled: DataFrame, k: int, vec_col: str = "embedding"
) -> pd.DataFrame:
    """A6: per-cluster counts + mean vectors (the reference's cluster
    explanation, cluster-word2vec.ipynb cells 32/40) — same partial-sum
    pass, returned as a tiny pandas frame."""
    from .knn import _sniff_dim

    dim = _sniff_dim(labeled, vec_col)
    sel = labeled.select(
        F.col("cluster").alias("_c"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    counts, sums = _cluster_partials(sel, k, dim)
    means = np.where(counts[:, None] > 0, sums / np.maximum(counts[:, None], 1), 0.0)
    return pd.DataFrame(
        {"cluster": np.arange(k), "n": counts, "mean_vec": [m.tolist() for m in means]}
    )
