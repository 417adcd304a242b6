"""Distributed cell-embedding trainer — the "2vec" in hex2vec.

Reference: src/models/combined.py:1-74 trains an encoder so that
k-ring context pairs score high (dot product + sigmoid) and excluded
negatives score low (binary skip-gram objective, cluster-word2vec.ipynb
cells 20-27), over the H3NeighborDataset this engine rebuilds as
``plans.pipeline.build_neighbor_dataset`` (input_h3, context_h3,
neg_h3s). No torch ships here, so the model is the classic SGNS
factorization (two V x dim matrices) trained with full-batch synchronous
gradient descent in the engine's own mapInPandas partial-aggregate shape
(operators/cluster.py:34-59 is the same pattern for KMeans):

  * weights are driver-side (V x dim x 2, float64) and broadcast per
    iteration — the vocabulary is the distinct-cell dimension, orders of
    magnitude smaller than the training pairs;
  * each partition computes its LOCAL gradient over its pairs
    (vectorized sigmoid/GEMM over index arrays) and emits only the
    SPARSE touched rows (word_idx, grad) — shuffle volume is
    O(touched_words x dim) per partition, never O(V x dim), and the
    pairs table itself never shuffles;
  * the driver sums partials (sorted first: deterministic for a fixed
    partitioning up to float addition order) and applies one step.

Full-batch GD is deterministic and embarrassingly data-parallel — the
right first trainer for a 10^12-row cluster job (hogwild-style async
SGD trades determinism for faster convergence; noted, not built).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # clipped for overflow-free exp; gradients saturate anyway
    return 1.0 / (1.0 + np.exp(-np.clip(x, -30.0, 30.0)))


def skipgram_fit(
    pairs: DataFrame,
    dim: int = 16,
    n_iter: int = 10,
    lr: float = 1.0,
    seed: int = 13,
    input_col: str = "input_h3",
    context_col: str = "context_h3",
    negs_col: str = "neg_h3s",
) -> tuple[np.ndarray, np.ndarray, list[float]]:
    """Train SGNS embeddings over a (input, context, negatives) table.

    Returns (vocab cell ids (V,), input embeddings (V, dim) float64,
    per-iteration mean losses). Negatives may be null/empty (rows then
    contribute only the positive term, like the reference's dataset
    rows whose exclusion ring ate all candidates).
    """
    spark = pairs.sparkSession
    # vocabulary = distinct cells on either side (dimension-sized)
    vocab_rows = (
        pairs.select(F.col(input_col).alias("h3"))
        .unionByName(pairs.select(F.col(context_col).alias("h3")))
        .unionByName(
            pairs.select(F.explode_outer(F.col(negs_col)).alias("h3")).where(
                F.col("h3").isNotNull()
            )
        )
        .distinct()
        .orderBy("h3")
        .collect()
    )
    vocab = np.array([r["h3"] for r in vocab_rows], dtype=np.int64)
    V = len(vocab)
    if V == 0:
        return vocab, np.zeros((0, dim)), []
    idx_of = {int(h): i for i, h in enumerate(vocab)}

    # index-encode once (broadcast map; narrow projection), cache the
    # tiny (t, c, negs) index table — it is scanned every iteration
    b_idx = spark.sparkContext.broadcast(idx_of)

    def to_idx(batches):
        m = b_idx.value
        for pdf in batches:
            t = pdf[input_col].map(lambda h: m[int(h)]).astype(np.int64)
            c = pdf[context_col].map(lambda h: m[int(h)]).astype(np.int64)
            n = pdf[negs_col].map(
                lambda xs: [m[int(x)] for x in xs] if xs is not None else []
            )
            yield pd.DataFrame({"t": t, "c": c, "n": n})

    data = pairs.mapInPandas(to_idx, "t long, c long, n array<long>")
    data = data.localCheckpoint(eager=True)  # scanned n_iter times

    rng = np.random.default_rng(seed)
    w_in = (rng.standard_normal((V, dim)) / np.sqrt(dim)) * 0.1
    w_out = np.zeros((V, dim))
    losses: list[float] = []
    n_rows = data.count()

    for _ in range(n_iter):
        b_w = spark.sparkContext.broadcast((w_in, w_out))

        def grad_part(batches):
            wi, wo = b_w.value
            gi: dict[int, np.ndarray] = {}
            go: dict[int, np.ndarray] = {}
            loss_sum = 0.0
            for pdf in batches:
                if not len(pdf):
                    continue
                t = pdf["t"].to_numpy()
                c = pdf["c"].to_numpy()
                ut, vc = wi[t], wo[c]
                s_pos = _sigmoid((ut * vc).sum(axis=1))
                loss_sum += float(-np.log(np.maximum(s_pos, 1e-12)).sum())
                coef = (s_pos - 1.0)[:, None]
                _acc(gi, t, coef * vc)
                _acc(go, c, coef * ut)
                # negatives: flatten the ragged lists
                lens = pdf["n"].map(len).to_numpy()
                if lens.sum():
                    nn = np.concatenate([np.asarray(x, dtype=np.int64) for x in pdf["n"]])
                    tt = np.repeat(t, lens)
                    utn, vn = wi[tt], wo[nn]
                    s_neg = _sigmoid((utn * vn).sum(axis=1))
                    loss_sum += float(-np.log(np.maximum(1.0 - s_neg, 1e-12)).sum())
                    coef_n = s_neg[:, None]
                    _acc(gi, tt, coef_n * vn)
                    _acc(go, nn, coef_n * utn)
            rows = [
                {"m": 0, "i": int(k), "g": v.tolist()} for k, v in gi.items()
            ] + [{"m": 1, "i": int(k), "g": v.tolist()} for k, v in go.items()]
            rows.append({"m": 2, "i": 0, "g": [loss_sum] + [0.0] * (dim - 1)})
            yield pd.DataFrame(rows, columns=["m", "i", "g"])

        parts = sorted(
            data.mapInPandas(grad_part, "m int, i long, g array<double>").collect(),
            key=lambda r: (r["m"], r["i"], tuple(r["g"])),
        )
        g_in = np.zeros_like(w_in)
        g_out = np.zeros_like(w_out)
        loss = 0.0
        for r in parts:
            if r["m"] == 0:
                g_in[r["i"]] += np.asarray(r["g"])
            elif r["m"] == 1:
                g_out[r["i"]] += np.asarray(r["g"])
            else:
                loss += r["g"][0]
        b_w.destroy()
        w_in -= (lr / n_rows) * g_in
        w_out -= (lr / n_rows) * g_out
        losses.append(loss / n_rows)
    return vocab, w_in, losses


def _acc(d: dict, idx: np.ndarray, grads: np.ndarray) -> None:
    """Sparse accumulate: sum gradient rows per word index."""
    uniq, inv = np.unique(idx, return_inverse=True)
    summed = np.zeros((len(uniq), grads.shape[1]))
    np.add.at(summed, inv, grads)
    for k, row in zip(uniq, summed):
        cur = d.get(int(k))
        if cur is None:
            d[int(k)] = row.copy()
        else:
            cur += row


def embeddings_table(
    spark: SparkSession, vocab: np.ndarray, w: np.ndarray, h3_col: str = "h3"
) -> DataFrame:
    """Materialize trained embeddings as a (h3, embedding) DataFrame —
    the table every downstream reference query (kNN probes, KMeans,
    interpolation) consumes (cluster-word2vec.ipynb cells 28+)."""
    pdf = pd.DataFrame(
        {h3_col: vocab.astype(np.int64), "embedding": [r.tolist() for r in np.asarray(w, dtype=np.float64)]}
    )
    return spark.createDataFrame(pdf)
