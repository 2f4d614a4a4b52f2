"""Embedding-matrix operators: distributed PCA training and
projection — the dimensionality-reduction step a production semantic
pipeline runs before clustering/dedup over embeddings (SemDeDup-style
recipes PCA-reduce before the quadratic-in-cell work; public method:
Pearson 1901 / the standard covariance-eigendecomposition PCA).

Scale design: training is the classic one-pass sufficient-statistics
scheme — each partition reduces its vectors to ``(n, sum_x, X^T X)``
partials inside ONE Arrow ``mapInPandas`` sweep (numpy matmul per
batch), the partials collapse through a single index-keyed shuffle of
``partitions x dim^2`` scalar rows, and only the ``dim x dim``
covariance (a few MB even at dim 1024) ever reaches the driver, where
``numpy.linalg.eigh`` finishes the job. No row data collects; adding
executors divides the sweep.

Projection is pure JVM expression algebra: ``proj_j = dot(x, w_j) -
dot(mean, w_j)`` where the second term is a Python constant — no
centered intermediate array, no UDF, fully codegen'd, and column
pruning still reaches the scan.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from .._litarr import lit_double_array
from pyspark.sql import Column, DataFrame, functions as F


def pca_train(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
) -> dict:
    """Fit a PCA model on an ``array<float/double>`` column.

    Returns ``{"mean": [dim], "components": [k][dim] (rows = principal
    axes, descending variance), "explained_variance": [k], "dim": d,
    "n": rows}`` — plain lists, JSON-serializable, consumed by
    ``pca_project``.

    Determinism: component SIGN is fixed by making each axis's
    largest-|coefficient| entry positive (eigenvectors are only
    defined up to sign). Values are float sums over a shuffle, so
    they are reproducible to float tolerance, not bit-exactly, across
    partitionings — this is a spectral estimate, not an exact query.
    """
    out_schema = "part array<double>"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, xtx = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += len(X)
            cs = X.sum(axis=0)
            cx = X.T @ X
            s = cs if s is None else s + cs
            xtx = cx if xtx is None else xtx + cx
        if n:
            # one flat partial per partition: [n, sum_x..., xtx...]
            yield pd.DataFrame(
                {"part": [[float(n)] + list(s) + list(xtx.ravel())]}
            )

    summed = (
        df.select(vec_col)
        .mapInPandas(partials, out_schema)
        .select(F.posexplode("part").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    if not summed:
        raise ValueError("pca_train needs >= 2 rows, saw 0")
    flat = np.zeros(max(r["i"] for r in summed) + 1)
    for r in summed:
        flat[r["i"]] = r["v"]
    n = flat[0]
    if n < 2:
        raise ValueError(f"pca_train needs >= 2 rows, saw {int(n)}")
    dim = int(round((len(flat) - 1 + 0.25) ** 0.5 - 0.5))  # d^2 + d = len-1
    if dim * dim + dim != len(flat) - 1:
        raise ValueError("inconsistent partial length (ragged vectors?)")
    s = flat[1 : 1 + dim]
    xtx = flat[1 + dim :].reshape(dim, dim)
    if not 0 < k <= dim:
        raise ValueError(f"k must be in [1, dim={dim}], got {k}")
    mean = s / n
    cov = (xtx - np.outer(mean, s)) / (n - 1.0)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x dim
    ev = np.maximum(evals[order], 0.0)
    # sign convention: largest-|coeff| entry of each axis positive
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return {
        "mean": [float(x) for x in mean],
        "components": [[float(x) for x in row] for row in comps],
        "explained_variance": [float(x) for x in ev],
        "dim": dim,
        "n": int(n),
    }


def pca_project_expr(
    vec: Column, model: dict, whiten: bool = False
) -> Column:
    """``array<double>`` of the k PCA coordinates of ``vec`` — pure
    JVM expressions: each coordinate is one literal-array dot product
    minus a precomputed constant (``dot(mean, w_j)`` folds to a
    Python float at plan build), optionally scaled by
    ``1/sqrt(explained_variance)`` for whitening."""
    coords = []
    for j, comp in enumerate(model["components"]):
        w = lit_double_array(comp)
        offset = float(np.dot(model["mean"], comp))
        d = F.aggregate(
            F.zip_with(vec, w, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ) - F.lit(offset)
        if whiten:
            d = d / F.lit(float(model["explained_variance"][j]) ** 0.5 or 1.0)
        coords.append(d)
    return F.array(*coords)


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    drop_input: bool = False,
) -> DataFrame:
    """Attach the PCA coordinates of ``vec_col`` as ``out_col``.
    ``drop_input=True`` replaces the wide embedding with the k-dim
    projection — the at-rest form for downstream clustering/dedup
    (a k=32 projection of a 768-dim corpus is a 24x scan-size cut
    for every consumer that doesn't need raw vectors)."""
    out = df.withColumn(out_col, pca_project_expr(F.col(vec_col), model, whiten))
    return out.drop(vec_col) if drop_input else out


def pool_embeddings(
    df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    weight_col: str | None = None,
    normalize: bool = False,
) -> DataFrame:
    """Pool per-chunk embeddings into one document vector — the
    long-document retrieval recipe (chunk -> embed -> POOL -> index):
    elementwise (optionally weighted) mean over each document's chunk
    vectors, optionally L2-normalized for cosine indexes.

    Plan: ONE shuffle keyed by ``id_col`` (collect_list of the
    document's chunk vectors — bounded by chunks-per-doc, not corpus
    size), then the mean is a row-local ``aggregate``/``zip_with``
    reduction in the JVM; no posexplode to (doc, dim) rows, which
    would shuffle dim x chunks rows per document instead of chunks.
    Weighted mode (``weight_col``, e.g. chunk token counts) computes
    sum(w_i * v_i) / sum(w_i); zero total weight yields NULL rather
    than a fake zero vector. Chunks with a NULL vector (or NULL
    weight in weighted mode) are EXCLUDED from the pool instead of
    silently nulling the whole document vector; ``n_chunks`` counts
    all chunks seen, ``n_pooled`` the ones that contributed — an
    all-NULL document pools to NULL with ``n_pooled = 0``. Returns
    ``(id_col, vec_col, n_chunks, n_pooled)``.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    valid = F.col(vec_col).isNotNull()
    if weight_col:
        valid = valid & F.col(weight_col).isNotNull()
    pairs = df.select(
        F.col(id_col),
        valid.alias("__ok"),
        F.when(
            valid,
            F.struct(
                F.transform(
                    F.col(vec_col), lambda x: x.cast("double") * w
                ).alias("wv"),
                w.alias("w"),
            ),
        ).alias("__p"),
    )
    # collect_list skips NULL entries, so only valid chunks pool
    g = pairs.groupBy(id_col).agg(
        F.collect_list("__p").alias("__ps"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col("__ok").cast("int")).alias("n_pooled"),
    )
    total_w = F.aggregate(
        "__ps", F.lit(0.0), lambda acc, p: acc + p["w"]
    )
    vsum = F.aggregate(
        F.col("__ps"),
        F.transform(
            F.element_at(F.col("__ps"), 1)["wv"], lambda _: F.lit(0.0)
        ),
        lambda acc, p: F.zip_with(acc, p["wv"], lambda a, b: a + b),
    )
    mean = F.when(
        total_w > 0,
        F.transform(vsum, lambda x: x / total_w),
    )
    if normalize:
        nrm = F.sqrt(
            F.aggregate(mean, F.lit(0.0), lambda a, x: a + x * x)
        )
        mean = F.when(nrm > 0, F.transform(mean, lambda x: x / nrm))
    return g.select(id_col, mean.alias(vec_col), "n_chunks", "n_pooled")
