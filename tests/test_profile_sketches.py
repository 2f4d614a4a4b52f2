"""Mergeable sketch artifacts: corpus_profile/merge_corpus_profiles
(HLL + KLL dataset-card shards) and corpus_overlap_sketch (Theta
overlap estimate) — each differentially checked against the exact
computation it replaces at scale."""

import numpy as np
import pandas as pd
import pytest

from opencosmo_spark.pipeline.decontaminate import (
    corpus_overlap,
    corpus_overlap_sketch,
)
from opencosmo_spark.pipeline.report import (
    corpus_profile,
    corpus_report,
    merge_corpus_profiles,
)

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]


def _doc(rng, n):
    return " ".join(rng.choice(WORDS, size=n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(9)
    rows = []
    for i in range(400):
        shard = f"s{i % 4}"
        text = _doc(rng, int(rng.integers(5, 60)))
        if i % 10 == 0:  # planted exact duplicates across shards
            text = "the quick brown fox jumps over the lazy dog"
        rows.append((f"d{i}", shard, text))
    return spark.createDataFrame(rows, ["doc_id", "shard", "text"])


def test_profile_merge_matches_direct_report(spark, corpus):
    """merge(all shard profiles) reproduces corpus_report on the whole
    corpus: exact fields equal, HLL estimates equal (same sketch family
    both sides up to precision), KLL quantiles within rank error."""
    prof = corpus_profile(corpus, shard_col="shard")
    assert prof.count() == 4
    card = merge_corpus_profiles(prof).toPandas().iloc[0]
    direct = corpus_report(corpus).toPandas().iloc[0]
    for c in ["docs", "total_tokens", "total_chars", "total_bytes"]:
        assert card[c] == direct[c], c
    assert abs(card["mean_quality"] - direct["mean_quality"]) < 1e-6
    # HLL at lgk=14 on ~360 distinct texts: exact in practice; allow
    # the documented ~1% envelope rather than pinning internals
    exact_distinct = (
        corpus.select("text").distinct().count()
    )
    assert abs(card["approx_distinct_texts"] - exact_distinct) <= max(
        2, 0.02 * exact_distinct
    )
    assert abs(card["distinct_ids"] - 400) <= 8
    assert card["lang_top"] == direct["lang_top"]
    assert abs(card["lang_top_frac"] - direct["lang_top_frac"]) < 1e-6
    # KLL rank error at k=200 is ~1.65%: the merged p50 must sit
    # within that rank band of the exact median
    toks = (
        corpus.selectExpr("size(split(trim(text), '\\\\s+')) t")
        .toPandas()["t"]
        .sort_values()
        .to_numpy()
    )
    lo, hi = (
        toks[int(0.47 * len(toks))],
        toks[min(len(toks) - 1, int(0.53 * len(toks)))],
    )
    assert lo <= card["tokens_p50"] <= hi


def test_profile_hll_merge_equals_whole(spark, corpus):
    """The HLL union of per-shard sketches is IDENTICAL to sketching
    the whole corpus in one pass — the invariant that makes the
    artifact trustworthy for incremental growth."""
    prof = corpus_profile(corpus, shard_col="shard")
    merged = merge_corpus_profiles(prof).toPandas().iloc[0]
    whole = merge_corpus_profiles(
        corpus_profile(corpus)  # single __all__ shard
    ).toPandas().iloc[0]
    assert merged["approx_distinct_texts"] == whole["approx_distinct_texts"]
    assert merged["distinct_ids"] == whole["distinct_ids"]


def test_profile_incremental_append(spark, corpus, tmp_path):
    """The 100 TB usage: profile shards as they land, append rows to a
    parquet artifact, merge ANY subset later — sketch binaries round-
    trip through parquet and a later merge over old+new rows equals
    profiling the union directly (exact fields) without rescanning."""
    path = str(tmp_path / "profile")
    old = corpus.filter("shard in ('s0','s1')")
    new = corpus.filter("shard in ('s2','s3')")
    corpus_profile(old, shard_col="shard").write.parquet(path)
    corpus_profile(new, shard_col="shard").write.mode("append").parquet(path)
    stored = spark.read.parquet(path)
    assert stored.count() == 4
    card = merge_corpus_profiles(stored).toPandas().iloc[0]
    direct = merge_corpus_profiles(
        corpus_profile(corpus, shard_col="shard")
    ).toPandas().iloc[0]
    for c in [
        "docs",
        "total_tokens",
        "total_bytes",
        "approx_distinct_texts",
        "distinct_ids",
        "tokens_p50",
        "lang_top",
    ]:
        assert card[c] == direct[c], c
    # per-period card: merging a filtered subset matches profiling
    # just those shards
    sub = merge_corpus_profiles(
        stored.filter("shard in ('s0','s1')")
    ).toPandas().iloc[0]
    only = merge_corpus_profiles(
        corpus_profile(old, shard_col="shard")
    ).toPandas().iloc[0]
    assert sub["docs"] == only["docs"]
    assert sub["approx_distinct_texts"] == only["approx_distinct_texts"]


def test_profile_without_ids_or_language(spark, corpus):
    prof = corpus_profile(
        corpus, id_col=None, with_language=False, shard_col="shard"
    )
    assert "lang_counts" not in prof.columns
    card = merge_corpus_profiles(prof).toPandas().iloc[0]
    assert card["docs"] == 400
    assert pd.isna(card["distinct_ids"])
    assert "lang_top" not in card.index


def test_theta_overlap_tracks_exact(spark):
    """corpus_overlap_sketch vs the exact corpus_overlap on corpora
    with a planted overlap fraction: every gram-level estimate within
    5% relative, and the containment asymmetry is preserved."""
    rng = np.random.default_rng(21)
    shared = [_doc(rng, 30) for _ in range(40)]
    only_a = [_doc(rng, 30) for _ in range(120)]
    only_b = [_doc(rng, 30) for _ in range(40)]
    a = spark.createDataFrame(
        [(f"a{i}", t) for i, t in enumerate(shared + only_a)],
        ["doc_id", "text"],
    )
    b = spark.createDataFrame(
        [(f"b{i}", t) for i, t in enumerate(shared + only_b)],
        ["doc_id", "text"],
    )
    exact = corpus_overlap(a, b, k=5)
    est = corpus_overlap_sketch(a, b, k=5)
    for key in ["grams_a", "grams_b", "shared_grams"]:
        assert exact[key] > 0
        rel = abs(est[key] - exact[key]) / exact[key]
        assert rel < 0.05, (key, est[key], exact[key])
    assert abs(est["jaccard"] - exact["jaccard"]) < 0.05
    # a is the bigger corpus: containment of a in b < b in a, on both
    assert est["containment_a_in_b"] < est["containment_b_in_a"]
    assert est["docs_a"] == 160 and est["docs_b"] == 80


def test_theta_overlap_disjoint_and_identical(spark):
    rng = np.random.default_rng(5)
    ta = [(f"a{i}", _doc(rng, 25)) for i in range(50)]
    tb = [(f"b{i}", _doc(rng, 25)) for i in range(50)]
    a = spark.createDataFrame(ta, ["doc_id", "text"])
    b = spark.createDataFrame(tb, ["doc_id", "text"])
    same = corpus_overlap_sketch(a, a, k=5)
    assert same["jaccard"] == pytest.approx(1.0, abs=1e-6)
    assert same["containment_a_in_b"] == pytest.approx(1.0, abs=1e-6)
    disj = corpus_overlap_sketch(a, b, k=8)
    # 8-gram collisions across independent random docs: essentially 0
    assert disj["jaccard"] < 0.01


def test_decontamination_index_roundtrip(spark, tmp_path):
    """Index-probed decontamination == eval_df-probed decontamination
    on the same benchmark; k mismatch fails loudly; missing eval
    inputs fail loudly."""
    from opencosmo_spark.pipeline.decontaminate import (
        decontaminate,
        ngram_overlap,
        read_decontamination_index,
        write_decontamination_index,
    )

    rng = np.random.default_rng(33)
    bench_texts = [_doc(rng, 20) for _ in range(10)]
    bench = spark.createDataFrame(
        [(i, t) for i, t in enumerate(bench_texts)], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [(f"c{i}", _doc(rng, 20)) for i in range(40)]
        + [(f"x{i}", bench_texts[i]) for i in range(4)],  # contaminated
        ["doc_id", "text"],
    )
    path = str(tmp_path / "decon_idx")
    params = write_decontamination_index(bench, path, k=5)
    idx, stored = read_decontamination_index(spark, path)
    assert stored == params == {"k": 5}

    via_df = decontaminate(corpus, bench, k=5).select("doc_id").toPandas()
    via_idx = decontaminate(
        corpus, None, k=5, eval_index=idx, index_params=stored
    ).select("doc_id").toPandas()
    assert sorted(via_df.doc_id) == sorted(via_idx.doc_id)
    assert not any(d.startswith("x") for d in via_idx.doc_id)

    with pytest.raises(ValueError, match="k=5"):
        ngram_overlap(corpus, None, k=8, eval_index=idx, index_params=stored)
    with pytest.raises(ValueError, match="eval_df"):
        ngram_overlap(corpus, None, k=5)


def test_corpus_churn_exact_and_sketch(spark):
    """Planted churn: old = 70 kept + 30 dropped, new = 70 kept + 50
    added (plus a reformatted copy that must NOT count as churn).
    Exact mode matches the plant exactly; sketch mode within 5%."""
    from opencosmo_spark.pipeline.report import corpus_churn

    rng = np.random.default_rng(11)
    kept = [_doc(rng, 25) for _ in range(70)]
    dropped = [_doc(rng, 25) for _ in range(30)]
    added = [_doc(rng, 25) for _ in range(50)]
    old = spark.createDataFrame(
        [(f"o{i}", t) for i, t in enumerate(kept + dropped)],
        ["doc_id", "text"],
    )
    # kept[0] reappears reformatted: extra whitespace + case changes
    new_rows = [(f"n{i}", t) for i, t in enumerate(kept[1:] + added)]
    new_rows.append(("n_reformat", "  " + kept[0].upper() + "  "))
    new = spark.createDataFrame(new_rows, ["doc_id", "text"])

    ex = corpus_churn(old, new)
    assert ex["docs_old"] == 100 and ex["docs_new"] == 120
    assert ex["distinct_old"] == 100 and ex["distinct_new"] == 120
    assert ex["common"] == 70 and ex["added"] == 50 and ex["removed"] == 30
    assert ex["churn"] == round(80 / 150, 6)

    est = corpus_churn(old, new, exact=False)
    for key in ["distinct_old", "distinct_new", "added", "removed", "common"]:
        assert abs(est[key] - ex[key]) <= max(2, 0.05 * ex[key]), key


def test_merge_profiles_group_by(spark, corpus):
    """Per-group cards straight off the artifact: merging with
    group_by over shard equals merging each shard's rows separately."""
    prof = corpus_profile(corpus, shard_col="shard")
    per = (
        merge_corpus_profiles(prof, group_by="shard")
        .toPandas()
        .set_index("group")
        .sort_index()
    )
    assert list(per.index) == ["s0", "s1", "s2", "s3"]
    for s in ["s0", "s3"]:
        single = merge_corpus_profiles(
            prof.filter(f"shard = '{s}'")
        ).toPandas().iloc[0]
        for c in ["docs", "total_tokens", "approx_distinct_texts",
                  "tokens_p50", "lang_top", "lang_top_frac"]:
            assert per.loc[s][c] == single[c], (s, c)


def test_profile_overlap_artifact_to_artifact(spark, corpus):
    """Overlap between two corpora estimated purely from their stored
    profile rows: within theta error of the exact fingerprint
    overlap; disjoint corpora ~0; a corpus against itself = 1; rows
    without fp_theta refuse loudly."""
    from opencosmo_spark.pipeline.report import profile_overlap

    a = corpus.filter("shard in ('s0','s1','s2')")  # shares dups
    b = corpus.filter("shard in ('s2','s3')")
    pa = corpus_profile(a, shard_col="shard")
    pb = corpus_profile(b, shard_col="shard")
    est = profile_overlap(pa, pb)

    # corpus_profile fingerprints raw text (md5(text)); recompute the
    # same convention for the exact side
    fa = a.selectExpr("md5(text) fp").distinct()
    fb = b.selectExpr("md5(text) fp").distinct()
    na, nb = fa.count(), fb.count()
    common = fa.join(fb, "fp").count()
    assert abs(est["distinct_a"] - na) <= max(2, 0.03 * na)
    assert abs(est["distinct_b"] - nb) <= max(2, 0.03 * nb)
    assert abs(est["common"] - common) <= max(2, 0.05 * common)

    same = profile_overlap(pa, pa)
    assert same["jaccard"] == pytest.approx(1.0, abs=1e-6)

    with pytest.raises(ValueError, match="fp_theta"):
        profile_overlap(pa.drop("fp_theta"), pb)


def test_merge_profiles_mixed_id_coverage(spark, corpus):
    """Merging a table whose rows mix id-sketched and id-less
    profiles: null sketches are skipped, distinct_ids reflects only
    the covered shards, exact fields still total."""
    with_ids = corpus_profile(
        corpus.filter("shard = 's0'"), shard_col="shard"
    )
    without = corpus_profile(
        corpus.filter("shard = 's1'"), id_col=None, shard_col="shard"
    )
    mixed = with_ids.unionByName(without)
    card = merge_corpus_profiles(mixed).toPandas().iloc[0]
    assert card["docs"] == 200
    only_s0 = merge_corpus_profiles(with_ids).toPandas().iloc[0]
    assert card["distinct_ids"] == only_s0["distinct_ids"]
