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


# ------------------------------------------------- agglomerative (Ward)

def ward_linkage(X: np.ndarray) -> np.ndarray:
    """Ward hierarchical linkage, SciPy-format matrix (n-1, 4): merged
    cluster indices (originals 0..n-1, merges n..2n-2), merge distance,
    member count.

    The reference clusters embeddings with sklearn AgglomerativeClustering
    and plots its dendrogram (visualize.py:48-64; 21 of the saved map
    configs are agglomerative_*); neither sklearn nor scipy ship here, so
    this is the Lance-Williams update on squared Euclidean distances
    (d2(k, i+j) = ((ni+nk) d2(ki) + (nj+nk) d2(kj) - nk d2(ij)) / (ni+nj+nk)),
    reported as sqrt — Ward's classic formulation. Driver-side O(n^2)
    memory, same operating point as the reference (it collects the
    cell-embedding matrix to fit); the engine feeds it vocabulary-sized
    inputs (distinct cells), not fact rows.
    """
    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    if n < 2:
        return np.zeros((0, 4))
    # pairwise squared distances via the gram identity: peak memory is
    # the (n, n) matrix itself. The broadcast form
    # ((X[:,None,:]-X[None,:,:])**2).sum(2) allocates an (n, n, dim)
    # intermediate — ~51 GB at the advertised max_rows=20000/dim=16,
    # OOMing far below the documented cap (round-3 advisor fix).
    nrm = (X * X).sum(axis=1)
    sq = nrm[:, None] + nrm[None, :] - 2.0 * (X @ X.T)
    np.maximum(sq, 0.0, out=sq)  # FP cancellation can dip below zero
    np.fill_diagonal(sq, np.inf)
    size = np.ones(n)
    active = np.ones(n, dtype=bool)
    # cluster slot i holds the cluster most recently merged INTO slot i;
    # labels[] maps slots to scipy cluster ids
    labels = np.arange(n)
    out = np.zeros((n - 1, 4))
    # cached per-row minima: the O(n^2)-per-step masked-matrix argmin of
    # the first implementation made the whole fit O(n^3) TIME with two
    # O(n^2) ALLOCATIONS per step (round-2 review) — infeasible at the
    # max_rows cap. Rows are inf'd out IN PLACE on deactivation and only
    # rows whose cached minimum pointed at a merged slot are rescanned.
    row_min_val = sq.min(axis=1)
    row_min_idx = sq.argmin(axis=1)
    for step in range(n - 1):
        masked = np.where(active, row_min_val, np.inf)
        i = int(np.argmin(masked))
        j = int(row_min_idx[i])
        d2 = float(row_min_val[i])
        if i > j:
            i, j = j, i
        out[step] = (labels[i], labels[j], np.sqrt(d2), size[i] + size[j])
        # Lance-Williams update into slot i; slot j deactivates
        ni, nj, nk = size[i], size[j], size
        upd = ((ni + nk) * sq[i] + (nj + nk) * sq[j] - nk * d2) / (ni + nj + nk)
        upd[i] = np.inf
        upd[~active] = np.inf
        upd[j] = np.inf
        sq[i] = upd
        sq[:, i] = upd
        sq[j, :] = np.inf
        sq[:, j] = np.inf
        active[j] = False
        size[i] = ni + nj
        labels[i] = n + step
        # cheap minima refresh: rows improved by the new column i...
        better = upd < row_min_val
        row_min_val = np.where(better, upd, row_min_val)
        row_min_idx = np.where(better, i, row_min_idx)
        # ...and rows whose cached minimum is gone (pointed at i or j)
        stale = np.nonzero(active & ~better & ((row_min_idx == i) | (row_min_idx == j)))[0]
        if len(stale):
            row_min_val[stale] = sq[stale].min(axis=1)
            row_min_idx[stale] = sq[stale].argmin(axis=1)
        row_min_val[i] = sq[i].min()
        row_min_idx[i] = sq[i].argmin()
        row_min_val[j] = np.inf
    return out


def linkage_labels(link: np.ndarray, n: int, n_clusters: int) -> np.ndarray:
    """Cut a linkage matrix into ``n_clusters`` flat labels (0-based,
    relabeled by first occurrence — deterministic)."""
    import collections

    parent = np.arange(2 * n - 1)
    stop = (n - 1) - max(n_clusters - 1, 0)  # apply the first n-k merges
    for step in range(stop):
        a, b = int(link[step, 0]), int(link[step, 1])
        parent[a] = n + step
        parent[b] = n + step

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    roots = [find(i) for i in range(n)]
    remap: dict[int, int] = collections.OrderedDict()
    for r in roots:
        if r not in remap:
            remap[r] = len(remap)
    return np.array([remap[r] for r in roots], dtype=np.int64)


def agglomerative_fit(
    emb: DataFrame,
    n_clusters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_rows: int = 20_000,
) -> tuple[pd.DataFrame, np.ndarray]:
    """Agglomerative (Ward) clustering of an embedding table: collects
    the (id, vector) matrix driver-side (hard-capped at ``max_rows`` —
    O(n^2) distance state; raise the cap consciously), links, cuts.
    Returns (pandas (id, cluster), linkage matrix for dendrograms —
    the visualize_dendrogram surface)."""
    rows = (
        emb.select(id_col, F.col(vec_col).cast("array<double>").alias("_v"))
        .orderBy(id_col)
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"agglomerative_fit collects the matrix driver-side; input exceeds "
            f"max_rows={max_rows} (use kmeans_fit for larger inputs)"
        )
    ids = [r[id_col] for r in rows]
    X = np.asarray([r["_v"] for r in rows], dtype=np.float64)
    link = ward_linkage(X)
    lab = linkage_labels(link, len(X), n_clusters)
    return pd.DataFrame({id_col: ids, "cluster": lab}), link
