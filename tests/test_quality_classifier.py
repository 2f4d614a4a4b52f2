"""Hashed-n-gram logistic regression (the Wikipedia-vs-CommonCrawl
quality classifier of the GPT-3/LLaMA data recipes) vs an exact numpy
reimplementation, plus separation and partition-invariance checks."""

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

from opencosmo_spark.pipeline.classify import (
    quality_classifier_score,
    train_quality_classifier,
)

CLEAN_VOCAB = [
    "the", "cat", "sat", "on", "mat", "dog", "ran", "to", "house",
    "garden", "tree", "river", "walked", "slowly", "bright", "morning",
]
JUNK_VOCAB = [
    "zqx", "wvv", "kjj", "pqq", "mnn", "zzz", "yyx", "xxw", "wwu",
    "uut", "ttr", "rre", "eew", "qqa", "aas", "ssd",
]


def _docs(rng, vocab, n, start, label, length=20):
    return [
        (start + i, " ".join(rng.choice(vocab, length)), label)
        for i in range(n)
    ]


# ---------------------------------------------------------------- numpy twin
def _tokens(text, bigrams):
    ws = re.findall(r"[a-z0-9]+", text.lower())
    toks = list(ws)
    if bigrams:
        toks += [f"{a}_{b}" for a, b in zip(ws, ws[1:])]
    return toks


def _feat(tok, nf):
    # md5_lane: first 15 hex digits of md5, base-16 -> base-10, mod nf
    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % nf


def _micro_sum(products):
    # mirror Spark's F.round(x*1e6, 0) HALF_UP then exact long sum
    q = [float(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5)) for x in products]
    return sum(q) / 1e6


def _np_train(rows, nf, iters, lr, reg, bigrams):
    feats = []  # (doc_idx, y, {feat: val})
    for _, text, y in rows:
        toks = _tokens(text, bigrams)
        if not toks:
            continue
        fv = {}
        for t in toks:
            f = _feat(t, nf)
            fv[f] = fv.get(f, 0) + 1
        fv = {f: c / len(toks) for f, c in fv.items()}
        fv[nf] = 1.0  # intercept
        feats.append((float(y), fv))
    nd = len(feats)
    w = np.zeros(nf + 1)
    for _ in range(iters):
        g = np.zeros(nf + 1)
        errs = []
        for y, fv in feats:
            m = _micro_sum([v * w[f] for f, v in fv.items()])
            p = 1.0 / (1.0 + np.exp(-m))
            errs.append((p - y, fv))
        by_feat: dict = {}
        for e, fv in errs:
            for f, v in fv.items():
                by_feat.setdefault(f, []).append(v * e)
        for f, prods in by_feat.items():
            g[f] = _micro_sum(prods)
        g /= nd
        g[:nf] += reg * w[:nf]
        w = w - lr * g
    return w


def test_quality_classifier_matches_numpy_exactly(spark):
    """Same hashing, same tf normalization, same micro-quantized sums,
    same GD trajectory: final weights must match the numpy twin to
    float-op noise (the distributed sums themselves are exact)."""
    rng = np.random.default_rng(67)
    rows = _docs(rng, CLEAN_VOCAB, 8, 0, 1, 12) + _docs(
        rng, JUNK_VOCAB, 8, 100, 0, 12
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    nf, iters, lr, reg = 64, 5, 0.5, 1e-3
    model = train_quality_classifier(
        df, num_features=nf, iters=iters, lr=lr, reg=reg
    )
    w_np = _np_train(rows, nf, iters, lr, reg, bigrams=True)
    np.testing.assert_allclose(model["weights"], w_np[:nf], atol=1e-12)
    assert model["bias"] == pytest.approx(w_np[nf], abs=1e-12)

    # scoring matches the numpy margin too
    scored = (
        quality_classifier_score(df, model).toPandas().set_index("doc_id")
    )
    for doc_id, text, _ in rows[:3]:
        toks = _tokens(text, True)
        fv: dict = {}
        for t in toks:
            f = _feat(t, nf)
            fv[f] = fv.get(f, 0) + 1
        prods = [c / len(toks) * w_np[f] for f, c in fv.items()]
        prods.append(w_np[nf])
        m = _micro_sum(prods)
        assert scored.loc[doc_id, "margin"] == pytest.approx(m, abs=1e-6)


def test_quality_classifier_separates_and_is_partition_invariant(spark):
    """Clean vs junk training must produce full separation on held-out
    docs from the same distributions, and retraining on a different
    partitioning must give bit-identical weights (the integer-micro
    guarantee)."""
    rng = np.random.default_rng(71)
    train_rows = _docs(rng, CLEAN_VOCAB, 30, 0, 1) + _docs(
        rng, JUNK_VOCAB, 30, 1000, 0
    )
    df = spark.createDataFrame(train_rows, ["doc_id", "text", "label"])
    model = train_quality_classifier(df, num_features=1024, iters=15)

    held = _docs(rng, CLEAN_VOCAB, 10, 5000, 1) + _docs(
        rng, JUNK_VOCAB, 10, 6000, 0
    )
    scored = (
        quality_classifier_score(
            spark.createDataFrame(held, ["doc_id", "text", "label"]), model
        )
        .toPandas()
        .set_index("doc_id")
    )
    clean = scored[scored.index < 6000].quality_prob
    junk = scored[scored.index >= 6000].quality_prob
    assert clean.min() > 0.5 > junk.max()
    assert clean.min() > junk.max()  # full separation on disjoint vocab

    model2 = train_quality_classifier(
        df.repartition(7), num_features=1024, iters=15
    )
    np.testing.assert_array_equal(model["weights"], model2["weights"])
    assert model["bias"] == model2["bias"]


def test_quality_classifier_validates_inputs(spark):
    rows = [(0, "some text here", 2)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "label"])
    with pytest.raises(ValueError, match="0/1"):
        train_quality_classifier(df, num_features=32, iters=1)
    empty = spark.createDataFrame(
        [(0, "!!!", 1)], ["doc_id", "text", "label"]
    )
    with pytest.raises(ValueError, match="no documents"):
        train_quality_classifier(empty, num_features=32, iters=1)
    ok = spark.createDataFrame(
        [(0, "a b", 1), (1, "c d", 0)], ["doc_id", "text", "label"]
    )
    with pytest.raises(ValueError, match="iters"):
        train_quality_classifier(ok, num_features=32, iters=0)
    # NULL labels must be rejected, not silently poison the gradient
    nullish = spark.createDataFrame(
        [(0, "a b", 1), (1, "c d", None)],
        "doc_id LONG, text STRING, label INT",
    )
    with pytest.raises(ValueError, match="0/1"):
        train_quality_classifier(nullish, num_features=32, iters=1)


def test_quality_classifier_feeds_importance_sampling(spark):
    """The composition the recipe exists for: classifier probability
    as the importance weight — high-quality docs survive the budgeted
    sample at a visibly higher rate than junk."""
    from opencosmo_spark.pipeline.sample import importance_sample

    rng = np.random.default_rng(73)
    train_rows = _docs(rng, CLEAN_VOCAB, 25, 0, 1) + _docs(
        rng, JUNK_VOCAB, 25, 1000, 0
    )
    # enough steps at a hot learning rate to push the (separable)
    # margins out of the soft zone — importance weights need contrast
    model = train_quality_classifier(
        spark.createDataFrame(train_rows, ["doc_id", "text", "label"]),
        num_features=1024,
        iters=60,
        lr=2.0,
    )
    corpus = _docs(rng, CLEAN_VOCAB, 100, 0, 1) + _docs(
        rng, JUNK_VOCAB, 100, 5000, 0
    )
    cdf = spark.createDataFrame(corpus, ["doc_id", "text", "label"])
    # sharpen the probability into the importance weight (the recipes
    # do the same — GPT-3 thresholds a pareto draw against the score
    # rather than sampling by raw probability): prob^4 turns a ~1.6x
    # per-doc ratio into ~6x while preserving the ordering
    from pyspark.sql import functions as F

    scored = quality_classifier_score(cdf, model).select(
        "doc_id", F.pow("quality_prob", 4).alias("w_quality")
    )
    kept = importance_sample(
        cdf.join(scored, "doc_id"), "w_quality", target_frac=0.4
    ).toPandas()
    n_clean = (kept.doc_id < 5000).sum()
    n_junk = (kept.doc_id >= 5000).sum()
    assert n_clean > 2 * n_junk
    assert abs(len(kept) - 80) < 25  # budget ~40% of 200


def test_calibration_report_matches_pandas_twin(spark):
    """Reliability table vs an exact pandas recomputation on scores
    with known calibration structure: a perfectly-calibrated band and
    a deliberately overconfident one."""
    import numpy as np
    import pandas as pd

    from opencosmo_spark.pipeline.classify import calibration_report

    rng = np.random.default_rng(17)
    rows = []
    # band A: predictions ~0.25, true rate 0.25 (calibrated)
    for i in range(400):
        p = float(np.round(rng.uniform(0.2, 0.3), 4))
        rows.append((i, p, int(rng.random() < 0.25)))
    # band B: predictions ~0.9, true rate 0.5 (overconfident)
    for i in range(400, 800):
        p = float(np.round(rng.uniform(0.85, 0.95), 4))
        rows.append((i, p, int(rng.random() < 0.5)))
    # boundary: prob exactly 1.0 must land in the top bin
    rows.append((800, 1.0, 1))
    scored = spark.createDataFrame(
        [(i, p) for i, p, y in rows], ["doc_id", "quality_prob"]
    )
    labels = spark.createDataFrame(
        [(i, y) for i, p, y in rows], ["doc_id", "label"]
    )
    rep = calibration_report(scored, labels, bins=10).toPandas()

    pdf = pd.DataFrame(rows, columns=["doc_id", "p", "y"])
    pdf["bin"] = np.minimum((pdf.p * 10).astype(int), 9)
    twin = pdf.groupby("bin").agg(
        n=("p", "size"), mean_pred=("p", "mean"), frac_pos=("y", "mean")
    )
    assert sorted(rep.bin) == sorted(twin.index)
    for _, r in rep.iterrows():
        t = twin.loc[r.bin]
        assert r.n == t.n
        assert abs(r.mean_pred - round(t.mean_pred, 6)) < 1e-9
        assert abs(r.frac_pos - round(t.frac_pos, 6)) < 1e-9
        assert abs(r.abs_gap - abs(r.mean_pred - r.frac_pos)) < 5e-6
    gaps = (rep.set_index("bin").abs_gap * rep.set_index("bin").n)
    ece_twin = round(gaps.sum() / rep.n.sum(), 6)
    assert abs(rep.ece.iloc[0] - ece_twin) < 5e-6
    assert (rep.ece == rep.ece.iloc[0]).all()
    # structure: the ~0.25 band is calibrated, the ~0.9 band is not
    lo = rep[rep.bin == 2].iloc[0]
    hi = rep[(rep.bin == 8) | (rep.bin == 9)].sort_values("n").iloc[-1]
    assert lo.abs_gap < 0.1 and hi.abs_gap > 0.25
    assert rep[rep.bin == 9].n.iloc[0] >= 1  # the p=1.0 row


def test_calibration_report_clamps_and_drops_null_probs(spark):
    """Out-of-range probs clamp into the edge bins (no bin -1 or
    bins rows) and NULL-prob rows are dropped before binning, so
    neither pollutes the table or the ECE weighting."""
    from opencosmo_spark.pipeline.classify import calibration_report

    scored = spark.createDataFrame(
        [(1, -0.2), (2, 0.05), (3, 1.4), (4, None), (5, 0.95)],
        "doc_id long, quality_prob double",
    )
    labels = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1), (5, 1)], ["doc_id", "label"]
    )
    rep = calibration_report(scored, labels, bins=10).toPandas()
    assert set(rep.bin) <= set(range(10))
    assert rep.n.sum() == 4  # the NULL-prob row is gone
    bot = rep.set_index("bin").loc[0]
    top = rep.set_index("bin").loc[9]
    assert bot["n"] == 2  # -0.2 clamped down into bin 0 with 0.05
    assert top["n"] == 2  # 1.4 clamped into the top bin with 0.95
