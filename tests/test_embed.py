"""Distributed PCA vs the numpy oracle."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opencosmo_spark.pipeline.embed import (
    pca_project,
    pca_train,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _numpy_pca(X, k):
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return mean, comps, np.maximum(evals[order], 0.0)


def test_pca_train_matches_numpy(spark, emb):
    X = np.stack(emb.toPandas().embedding.to_numpy()).astype(np.float64)
    k = 4
    model = pca_train(emb, k)
    mean, comps, ev = _numpy_pca(X, k)
    assert model["dim"] == X.shape[1]
    assert model["n"] == len(X)
    np.testing.assert_allclose(model["mean"], mean, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(
        model["explained_variance"], ev, rtol=1e-8, atol=1e-12
    )
    # eigenvectors match up to numerical tolerance (sign already fixed)
    np.testing.assert_allclose(
        np.abs(np.asarray(model["components"])), np.abs(comps), atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(model["components"]), comps, atol=1e-8
    )


def test_pca_project_matches_numpy(spark, emb):
    X = np.stack(emb.toPandas().embedding.to_numpy()).astype(np.float64)
    ids = emb.toPandas().vec_id.to_numpy()
    k = 3
    model = pca_train(emb, k)
    out = (
        pca_project(emb, model)
        .select("vec_id", "pca")
        .toPandas()
        .set_index("vec_id")
    )
    mean = np.asarray(model["mean"])
    W = np.asarray(model["components"])
    want = (X - mean) @ W.T
    got = np.stack(out.loc[ids].pca.to_numpy())
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_pca_whiten_unit_variance(spark, emb):
    """Whitened coordinates must have ~unit sample variance along
    every kept axis (that is the definition of whitening)."""
    model = pca_train(emb, 3)
    out = pca_project(emb, model, whiten=True).select("pca").toPandas()
    P = np.stack(out.pca.to_numpy())
    np.testing.assert_allclose(P.var(axis=0, ddof=1), 1.0, rtol=1e-6)


def test_pca_partition_tolerance(spark, emb):
    """Training is float-sum based: models fit under different
    partitionings must agree to tight tolerance (documented contract:
    tolerance, not bit-exact)."""
    m2 = pca_train(emb.repartition(2), 3)
    m16 = pca_train(emb.repartition(16), 3)
    np.testing.assert_allclose(m2["mean"], m16["mean"], rtol=1e-12)
    np.testing.assert_allclose(
        m2["components"], m16["components"], atol=1e-9
    )


def test_pca_project_stays_jvm(spark, emb):
    """Projection must be expression-only (no Python eval in the
    plan) and column pruning must still reach the scan."""
    model = pca_train(emb, 2)
    plan = (
        pca_project(emb, model, drop_input=True)
        .select("vec_id", "pca")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pca_validates_inputs(spark, emb):
    with pytest.raises(ValueError, match="k must be"):
        pca_train(emb, 10_000)
    one = emb.limit(1)
    with pytest.raises(ValueError, match=">= 2 rows"):
        pca_train(one, 2)


def test_pca_then_semantic_dedup_composition(spark, emb):
    """The at-scale recipe: PCA-reduce (drop the wide vectors), then
    SemDeDup over the k-dim coordinates. Planted exact duplicates
    must still be caught in the reduced space (cosine 1.0 survives
    any linear projection of identical vectors)."""
    from opencosmo_spark.pipeline.similarity import semantic_dedup

    dup = emb.limit(10).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    corpus = emb.unionByName(dup)
    model = pca_train(corpus, 4)
    reduced = pca_project(corpus, model, drop_input=True)
    out = semantic_dedup(
        reduced, threshold=0.999, nlist=4, vec_col="pca"
    ).toPandas()
    planted = out[out.vec_id >= 1_000_000]
    assert len(planted) == 10
    # every planted copy is flagged against some earlier vector
    assert planted.dup_of.notna().all()


def test_pool_embeddings_matches_numpy_twin(spark):
    """Plain, weighted, and normalized pooling vs numpy; zero-weight
    docs yield NULL vectors; n_chunks exact; partition-invariant."""
    import numpy as np

    from opencosmo_spark.pipeline.embed import pool_embeddings

    rng = np.random.default_rng(31)
    rows = []
    vecs = {}
    wts = {}
    for doc in range(12):
        k = int(rng.integers(1, 6))
        vecs[doc] = rng.normal(size=(k, 8))
        wts[doc] = rng.integers(0, 5, size=k).astype(float)
        for i in range(k):
            rows.append(
                (doc, i, [float(x) for x in vecs[doc][i]], float(wts[doc][i]))
            )
    df = spark.createDataFrame(
        rows, ["doc_id", "chunk", "embedding", "w"]
    ).repartition(7)

    plain = {
        r["doc_id"]: (r["embedding"], r["n_chunks"])
        for r in pool_embeddings(df).collect()
    }
    for doc, m in vecs.items():
        got, n = plain[doc]
        assert n == len(m)
        np.testing.assert_allclose(got, m.mean(axis=0), rtol=1e-12)

    weighted = {
        r["doc_id"]: r["embedding"]
        for r in pool_embeddings(df, weight_col="w").collect()
    }
    for doc, m in vecs.items():
        w = wts[doc]
        if w.sum() == 0:
            assert weighted[doc] is None
        else:
            np.testing.assert_allclose(
                weighted[doc], (m * w[:, None]).sum(0) / w.sum(), rtol=1e-12
            )

    unit = {
        r["doc_id"]: r["embedding"]
        for r in pool_embeddings(df, normalize=True).collect()
    }
    for doc, m in vecs.items():
        v = m.mean(axis=0)
        np.testing.assert_allclose(
            unit[doc], v / np.linalg.norm(v), rtol=1e-9
        )


def test_pool_embeddings_null_chunks_excluded(spark):
    """A NULL chunk vector (or NULL weight) no longer nulls the whole
    document: invalid chunks are excluded, n_pooled counts the
    contributors, and an all-NULL document pools to NULL."""
    import numpy as np

    from opencosmo_spark.pipeline.embed import pool_embeddings

    rows = [
        (1, [1.0, 2.0], 2.0),
        (1, None, 1.0),            # NULL vector: excluded
        (1, [3.0, 4.0], None),     # NULL weight: excluded in weighted mode
        (2, None, 1.0),            # all-NULL doc
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, embedding array<double>, w double"
    )
    got = {
        r["doc_id"]: r
        for r in pool_embeddings(df, weight_col="w").collect()
    }
    assert got[1]["n_chunks"] == 3 and got[1]["n_pooled"] == 1
    np.testing.assert_allclose(got[1]["embedding"], [1.0, 2.0])
    assert got[2]["embedding"] is None and got[2]["n_pooled"] == 0

    # unweighted mode: NULL weight column is irrelevant, NULL vec still skips
    got_u = {
        r["doc_id"]: r for r in pool_embeddings(df).collect()
    }
    assert got_u[1]["n_pooled"] == 2
    np.testing.assert_allclose(got_u[1]["embedding"], [2.0, 3.0])
