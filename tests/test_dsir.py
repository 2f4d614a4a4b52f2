"""DSIR importance weighting: exact python-twin differential for the
hashed-n-gram log ratio, domain-separation behavior (target-like raw
docs outrank off-domain ones), and the end-to-end resample."""

import hashlib
import math
import re

import pytest

from opencosmo_spark.pipeline.dsir import (
    dsir_resample,
    dsir_weights,
    train_dsir_model,
)

B = 512  # small bucket space so collisions actually occur in-test

SPORTS = [
    "the team won the game with a late goal in the second half",
    "the coach praised the players after the match and the fans cheered",
    "a striker scored twice and the keeper saved a penalty kick",
]
COOKING = [
    "simmer the onions in butter then add garlic and fresh thyme",
    "whisk the eggs with cream and fold into the warm sauce slowly",
    "roast the vegetables with olive oil salt and cracked pepper",
]
RAW = [(i, t) for i, t in enumerate(SPORTS + COOKING)]


def _feats(text):
    words = re.findall(r"[a-z0-9]+", text.lower())
    feats = list(words)
    feats += [f"{a} {b}" for a, b in zip(words, words[1:])]
    out = {}
    for f in feats:
        b = int(hashlib.md5(f.encode()).hexdigest()[:15], 16) % B
        out[b] = out.get(b, 0) + 1
    return out


def _model(texts, alpha=1.0):
    counts = {}
    for t in texts:
        for b, c in _feats(t).items():
            counts[b] = counts.get(b, 0) + c
    total = sum(counts.values())
    denom = total + alpha * B
    return (
        {b: math.log((n + alpha) / denom) for b, n in counts.items()},
        math.log(alpha / denom),
    )


def _twin_logw(text, tgt, raw):
    (tp, tf), (rp, rf) = tgt, raw
    return sum(
        c * (tp.get(b, tf) - rp.get(b, rf))
        for b, c in _feats(text).items()
    )


@pytest.fixture(scope="module")
def frames(spark):
    target = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SPORTS)], ["doc_id", "text"]
    )
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    return target, raw


def test_dsir_weights_match_python_twin(spark, frames):
    target, raw = frames
    tm = train_dsir_model(target, n_buckets=B, hasher="md5")
    rm = train_dsir_model(raw, n_buckets=B, hasher="md5")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(raw, tm, rm).collect()
    }
    tgt_twin = _model(SPORTS)
    raw_twin = _model(SPORTS + COOKING)
    for i, t in RAW:
        assert got[i] == pytest.approx(
            _twin_logw(t, tgt_twin, raw_twin), rel=1e-12, abs=1e-9
        )
    # domain separation: every sports doc outweighs every cooking doc
    sports_w = [got[i] for i in range(3)]
    cooking_w = [got[i] for i in range(3, 6)]
    assert min(sports_w) > max(cooking_w)


def test_dsir_resample_prefers_target_domain(spark, frames):
    target, raw = frames
    tm = train_dsir_model(target, n_buckets=B)
    rm = train_dsir_model(raw, n_buckets=B)
    kept = dsir_resample(raw, tm, rm, target_frac=0.5).collect()
    ids = {r["doc_id"] for r in kept}
    # the weight gap is orders of magnitude: only sports docs survive
    assert ids and ids <= {0, 1, 2}
    assert all("log_weight" in r.asDict() for r in kept)
    # determinism: same call, same survivors
    again = {
        r["doc_id"]
        for r in dsir_resample(raw, tm, rm, target_frac=0.5).collect()
    }
    assert again == ids


def test_dsir_bucket_mismatch_is_loud(spark, frames):
    target, raw = frames
    tm = train_dsir_model(target, n_buckets=B)
    rm = train_dsir_model(raw, n_buckets=2 * B)
    with pytest.raises(ValueError, match="n_buckets"):
        dsir_weights(raw, tm, rm)


def test_empty_text_gets_zero_log_weight(spark, frames):
    target, _ = frames
    tm = train_dsir_model(target, n_buckets=B)
    df = target.sparkSession.createDataFrame(
        [(0, ""), (1, "the team won")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(df, tm, tm).collect()
    }
    assert got[0] == 0.0
    assert got[1] == 0.0  # same model both sides -> ratio 1 everywhere


def test_curate_corpus_dsir_stage(spark, frames):
    from opencosmo_spark.pipeline import curate_corpus

    target, raw = frames
    curated, counts = curate_corpus(
        raw,
        min_quality=0.0,
        min_tokens=2,
        dsir_target_df=target,
        dsir_buckets=B,
        mix_target_frac=0.5,
    )
    ids = {r["doc_id"] for r in curated.collect()}
    assert counts["mix"] == len(ids)
    assert ids and ids <= {0, 1, 2}  # only target-domain docs survive
    assert "log_weight" not in curated.columns
    # mutually exclusive with the other mix modes
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly ONE"):
        curate_corpus(
            raw, dsir_target_df=target, mix_alpha=0.7, mix_col="text"
        )
