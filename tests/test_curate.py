

def test_curate_return_dropped_attribution(spark):
    """Every dropped doc is attributed to exactly the stage that
    dropped it; survivors never appear in the audit."""
    from opencosmo_spark.pipeline import curate_corpus

    good = "This is a perfectly reasonable document with plenty of words."
    rows = [
        (1, "https://ok.org/a", good + " one"),
        (2, "https://spam.biz/x", good + " two"),     # url_gate
        (3, "https://ok.org/b", "tiny"),              # quality gate
        (4, "https://ok.org/c", good + " one"),       # dup of 1? no — text differs by suffix
        (5, "https://ok.org/d", good + " one"),       # exact dup of 1... and 4
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    curated, counts, dropped = curate_corpus(
        df,
        min_quality=0.0,
        min_tokens=3,
        url_block_domains=["spam.biz"],
        return_dropped=True,
    )
    audit = {r["doc_id"]: r["stage"] for r in dropped.collect()}
    survivors = {r["doc_id"] for r in curated.collect()}
    assert audit[2] == "url_gate"
    assert audit[3] == "quality_gate"
    # docs 1/4/5: 1 and 4 and 5 — 4 and 5 share 1's text ("... one"):
    # exact dedup keeps min id 1, drops 4 and 5
    assert audit[4] == "exact_dedup" and audit[5] == "exact_dedup"
    assert survivors == {1}
    assert set(audit) | survivors == {1, 2, 3, 4, 5}
    assert not (set(audit) & survivors)
    # requires report mode
    import pytest as _pytest

    with _pytest.raises(ValueError, match="report"):
        curate_corpus(df, return_dropped=True, report=False)


def test_curate_corpus_decontam_excise_mode(spark):
    """decontam_excise=True keeps contaminated rows but cuts the
    benchmark spans out; the drop path removes them entirely."""
    from pyspark.sql import functions as F

    from opencosmo_spark.pipeline import curate_corpus

    bench = "what is the capital of france answer paris exactly here"
    long_doc = (
        "a long original essay full of novel words and arguments "
        + bench
        + " followed by more completely original closing text indeed"
    )
    clean = "another clean document with plenty of original words okay"
    df = spark.createDataFrame(
        [(0, long_doc), (1, clean)], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(9, bench)], ["doc_id", "text"])

    dropped, c1 = curate_corpus(
        df, eval_df=ev, min_quality=0.0, min_tokens=1, decontam_k=6
    )
    assert {r["doc_id"] for r in dropped.collect()} == {1}
    assert c1["decontaminate"] == 1

    kept, c2 = curate_corpus(
        df, eval_df=ev, min_quality=0.0, min_tokens=1,
        decontam_k=6, decontam_excise=True,
    )
    texts = {r["doc_id"]: r["text"] for r in kept.collect()}
    assert set(texts) == {0, 1}
    assert "decontaminate" not in c2  # rewrite, not attrition
    assert "capital" not in texts[0]
    assert texts[0].startswith("a long original essay")
    assert texts[0].endswith("closing text indeed")
    assert texts[1] == clean


def test_curate_corpus_reservoir_budget_mode(spark):
    """budget_docs + budget_weight_col: exactly k survivors, heavy
    weights overrepresented, attrition row present, exclusive with
    the other mix modes."""
    import numpy as np
    import pytest
    from pyspark.sql import Row

    from opencosmo_spark.pipeline import curate_corpus

    rng = np.random.default_rng(83)
    words = ["red", "blue", "green", "gold", "grey", "teal"]
    # 40 heavy docs (w=50) vs 160 light docs (w=1): weight share
    # 2000/2160 ≈ 0.93 — a k=60 reservoir should be heavy-dominated
    rows = [
        Row(
            doc_id=i,
            text=" ".join(rng.choice(words, 20)) + f" tail {i}",
            w=50.0 if i < 40 else 1.0,
        )
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    out, counts = curate_corpus(
        df,
        budget_docs=60,
        budget_weight_col="w",
        min_quality=0.0,
        min_tokens=1,
        jaccard_threshold=0.95,
    )
    got = out.collect()
    assert len(got) == 60  # EXACTLY the budget
    assert counts["mix"] == 60  # attrition report row
    heavy = sum(1 for r in got if r["doc_id"] < 40)
    # all 40 heavy docs carry ~93% of the weight; require clear
    # overrepresentation vs their 20% population share
    assert heavy >= 30
    # determinism: same lane, same survivors
    again, _ = curate_corpus(
        df,
        budget_docs=60,
        budget_weight_col="w",
        min_quality=0.0,
        min_tokens=1,
        jaccard_threshold=0.95,
    )
    assert {r["doc_id"] for r in got} == {
        r["doc_id"] for r in again.collect()
    }

    with pytest.raises(ValueError, match="budget_weight_col"):
        curate_corpus(df, budget_docs=10)
    with pytest.raises(ValueError, match="exactly ONE"):
        curate_corpus(
            df, budget_docs=10, budget_weight_col="w",
            importance_col="w",
        )


def test_curate_corpus_publishes_profile(spark, tmp_path):
    """profile_path appends the survivors' card shard(s) to the
    artifact; a second release appends more rows and the merged card
    over each release's rows matches that release's survivor count."""
    from opencosmo_spark.pipeline.curate import curate_corpus
    from opencosmo_spark.pipeline.report import merge_corpus_profiles

    docs = spark.createDataFrame(
        [
            (i, "clean document text about spark tables rows " * 3 + str(i))
            for i in range(40)
        ],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "release_profiles")
    out1, c1 = curate_corpus(
        docs, min_quality=0.0, min_tokens=1, n_shards=2,
        profile_path=path,
    )
    n1 = out1.count()
    prof = spark.read.parquet(path)
    assert prof.count() == 2  # one row per shard
    assert merge_corpus_profiles(prof).collect()[0]["docs"] == n1

    out2, c2 = curate_corpus(
        docs.withColumn("doc_id", docs.doc_id + 1000),
        min_quality=0.0, min_tokens=1, profile_path=path,
    )
    prof2 = spark.read.parquet(path)
    assert prof2.count() == 3  # unsharded release adds one __all__ row
    merged = merge_corpus_profiles(prof2).collect()[0]
    assert merged["docs"] == n1 + out2.count()


def test_curate_publishes_decontam_index_roundtrip(spark, tmp_path):
    """decontam_index_path: curate writes the benchmark gram universe
    next to the release, the in-call drop stage probes that very
    artifact, and an index-probed RERUN from the published path drops
    exactly the same documents — the release ships its own
    reproducible decontamination."""
    import pytest

    from opencosmo_spark.pipeline import curate_corpus
    from opencosmo_spark.pipeline.decontaminate import (
        decontaminate,
        read_decontamination_index,
    )

    bench = "what is the capital of france answer paris exactly here"
    long_doc = (
        "a long original essay full of novel words and arguments "
        + bench
        + " followed by more completely original closing text indeed"
    )
    clean = "another clean document with plenty of original words okay"
    df = spark.createDataFrame(
        [(0, long_doc), (1, clean)], ["doc_id", "text"]
    )
    ev = spark.createDataFrame([(9, bench)], ["doc_id", "text"])
    idx_path = str(tmp_path / "release_decon_idx")

    curated, counts = curate_corpus(
        df, eval_df=ev, min_quality=0.0, min_tokens=1,
        decontam_k=6, decontam_index_path=idx_path,
    )
    survivors = {r["doc_id"] for r in curated.collect()}
    assert survivors == {1}
    assert counts["decontaminate"] == 1

    # the artifact is a real index: params sidecar + rerun parity
    idx, params = read_decontamination_index(spark, idx_path)
    assert params == {"k": 6}
    rerun = {
        r["doc_id"]
        for r in decontaminate(
            df, None, k=6, eval_index=idx, index_params=params
        ).collect()
    }
    assert rerun == {1}

    # publishing without a benchmark set is a loud error
    with pytest.raises(ValueError, match="eval_df"):
        curate_corpus(df, decontam_index_path=idx_path)


def test_curate_corpus_incremental_dedup_index(spark, tmp_path):
    """dedup_index_path turns stages 4+5 into one incremental probe
    of a previous release's persisted index: exact and near dups of
    the INDEXED corpus drop, the batch still collapses within itself,
    survivors equal a direct incremental_dedup of the post-gate
    batch, and attrition reports the merged stage."""
    from opencosmo_spark.pipeline import curate_corpus
    from opencosmo_spark.pipeline.dedup import (
        incremental_dedup,
        read_dedup_index,
        write_dedup_index,
    )

    import numpy as np

    rng = np.random.default_rng(47)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "kappa"]

    def doc(n=40):
        return " ".join(rng.choice(words, size=n))

    def perturb(t):
        toks = t.split()
        toks[-1] = "PERTURBED"
        return " ".join(toks)

    release = [doc() for _ in range(10)]
    rel_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(release)], ["doc_id", "text"]
    )
    idx_path = str(tmp_path / "release_idx")
    write_dedup_index(rel_df, idx_path, num_hashes=16, shingle_k=3)

    within = doc()
    batch = (
        [doc() for _ in range(6)]       # 100-105 fresh
        + [release[0]]                  # 106 exact dup of the release
        + [perturb(release[1])]         # 107 near dup of the release
        + [within, perturb(within)]     # 108/109 within-batch pair
    )
    batch_df = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch)], ["doc_id", "text"]
    )

    curated, counts = curate_corpus(
        batch_df,
        min_quality=0.0,
        min_tokens=1,
        dedup_index_path=idx_path,
        jaccard_threshold=0.5,
    )
    got = sorted(r["doc_id"] for r in curated.collect())
    assert 106 not in got and 107 not in got      # index dups died
    assert not {108, 109} <= set(got)             # pair collapsed to one
    assert set(range(100, 106)) <= set(got)       # fresh docs survive
    assert "incremental_dedup" in counts
    assert "exact_dedup" not in counts and "near_dedup" not in counts

    # equality with the bare operator on the same post-gate input
    base_idx, params = read_dedup_index(spark, idx_path)
    want = sorted(
        r["doc_id"]
        for r in incremental_dedup(
            None,
            batch_df,
            existing_index=base_idx,
            index_params=params,
            jaccard_threshold=0.5,
        ).collect()
    )
    assert got == want

    # loud mismatch: an index built under a different id column
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different parameters"):
        curate_corpus(
            batch_df.withColumnRenamed("doc_id", "docno"),
            id_col="docno",
            min_quality=0.0,
            min_tokens=1,
            dedup_index_path=idx_path,
        )


def test_curate_release_chain_publishes_dedup_index(spark, tmp_path):
    """Release-over-release loop: release 1 publishes idx1; release 2
    probes idx1 and publishes idx2 (old rows copied + its own);
    release 3 probed against idx2 drops duplicates of BOTH earlier
    releases. Parameters ride the chain unchanged."""
    from opencosmo_spark.pipeline import curate_corpus
    from opencosmo_spark.pipeline.dedup import (
        extend_dedup_index,
        read_dedup_index,
    )

    import numpy as np
    import pytest as _pytest

    rng = np.random.default_rng(53)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "theta", "kappa"]

    def doc(n=40):
        return " ".join(rng.choice(words, size=n))

    r1_texts = [doc() for _ in range(6)]
    r1 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(r1_texts)], ["doc_id", "text"]
    )
    idx1 = str(tmp_path / "idx1")
    _, c1 = curate_corpus(
        r1, min_quality=0.0, min_tokens=1,
        publish_dedup_index_path=idx1,
    )
    base1, p1 = read_dedup_index(spark, idx1)
    assert base1.count() == c1["near_dedup"]  # one row per release doc

    r2_texts = [doc() for _ in range(5)]
    r2 = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(r2_texts + [r1_texts[0]])],
        ["doc_id", "text"],
    )
    idx2 = str(tmp_path / "idx2")
    cur2, c2 = curate_corpus(
        r2, min_quality=0.0, min_tokens=1,
        dedup_index_path=idx1,
        publish_dedup_index_path=idx2,
        jaccard_threshold=0.5,
    )
    kept2 = {r["doc_id"] for r in cur2.collect()}
    assert 105 not in kept2  # the r1 exact dup died on the idx1 probe
    base2, p2 = read_dedup_index(spark, idx2)
    assert p2 == p1  # parameters ride the chain
    assert base2.count() == base1.count() + len(kept2)

    # release 3: dups of r1 AND r2 both drop against idx2
    def perturb(t):
        toks = t.split()
        toks[-1] = "PERTURBED"
        return " ".join(toks)

    r3 = spark.createDataFrame(
        [
            (200, doc()),                 # fresh
            (201, r1_texts[1]),           # exact dup of release 1
            (202, perturb(r2_texts[0])),  # near dup of release 2
        ],
        ["doc_id", "text"],
    )
    cur3, _ = curate_corpus(
        r3, min_quality=0.0, min_tokens=1,
        dedup_index_path=idx2, jaccard_threshold=0.5,
    )
    assert {r["doc_id"] for r in cur3.collect()} == {200}

    # overwrite-in-place is refused loudly
    with _pytest.raises(ValueError, match="versioned"):
        extend_dedup_index(idx2, r3, idx2)


def test_curate_publishes_tokenizer_roundtrip(spark, tmp_path):
    """tokenizer_path: curate trains and publishes _tokenizer.json
    beside the other release artifacts; read_tokenizer +
    bpe_encode_ids reproduces the release's token ids from the
    artifact alone (no retraining), and byte mode round-trips the
    release text exactly."""
    from opencosmo_spark.pipeline.bpe import (
        bpe_encode_ids,
        decode_bpe_ids,
        read_tokenizer,
    )
    from opencosmo_spark.pipeline.curate import curate_corpus

    docs = spark.createDataFrame(
        [
            (i, f"Document {i}: spark tables hold rows of data " * 2)
            for i in range(20)
        ],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "release_tok")
    out, _ = curate_corpus(
        docs,
        min_quality=0.0,
        min_tokens=1,
        tokenizer_path=path,
        tokenizer_merges=30,
    )
    tok = read_tokenizer(spark, path)
    assert tok["mode"] == "byte"
    assert len(tok["vocab"]) >= 256
    ids = bpe_encode_ids(
        out.select("doc_id", "text"),
        tok["merges"],
        tok["vocab"],
        mode=tok["mode"],
    )
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    rows = ids.collect()
    assert rows
    for r in rows:
        got = decode_bpe_ids(list(r["input_ids"]), tok["vocab"], mode="byte")
        assert got == texts[r["doc_id"]]
    # a second encode from a fresh read is id-for-id identical
    tok2 = read_tokenizer(spark, path)
    again = {
        r["doc_id"]: list(r["input_ids"])
        for r in bpe_encode_ids(
            out.select("doc_id", "text"),
            tok2["merges"],
            tok2["vocab"],
            mode=tok2["mode"],
        ).collect()
    }
    assert again == {r["doc_id"]: list(r["input_ids"]) for r in rows}


def test_curate_url_canonical_dedup(spark):
    """Stage 0b2: tracked/reordered/default-port URL variants are
    refetches of one resource — exactly one (smallest-id) survivor per
    canonical key; unparseable URLs never collapse; the stage shows up
    in the attrition counts; loud error without a url column."""
    import pytest as _pytest

    from opencosmo_spark.pipeline.curate import curate_corpus

    base = "plenty of clean document words here for the quality gate "
    docs = spark.createDataFrame(
        [
            (1, base + "a", "https://ex.com/p?a=1&b=2"),
            (2, base + "b", "https://EX.com/p?b=2&a=1&utm_source=tw"),
            (3, base + "c", "https://ex.com:443/p?a=1&b=2#frag"),
            (4, base + "d", "https://ex.com/q"),
            (5, base + "e", "not a url"),
            (6, base + "f", "also not a url"),
        ],
        ["doc_id", "text", "url"],
    )
    out, counts = curate_corpus(
        docs, min_quality=0.0, min_tokens=1, url_canonical_dedup=True,
        jaccard_threshold=1.01,  # disable near-dedup: texts are similar
    )
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 1 survives its variant group {1,2,3}; 4 unique; 5,6 unparseable
    assert ids == [1, 4, 5, 6]
    assert counts["url_canonical_dedup"] == 4

    with _pytest.raises(ValueError, match="url_canonical_dedup"):
        curate_corpus(
            docs.drop("url"), min_quality=0.0, min_tokens=1,
            url_canonical_dedup=True,
        )
