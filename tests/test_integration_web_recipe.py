"""The round-7 web-corpus layer composed end-to-end: JSONL source ->
URL gate -> per-domain cap -> unicode normalization -> dedup -> DSIR
domain matching -> deterministic split -> WebDataset tar handoff.
Every planted defect must be handled by exactly its stage."""

import json

import pytest

from opencosmo_spark.pipeline import (
    curate_corpus,
    read_jsonl,
    read_tar_shards,
    split_corpus,
    train_dsir_model,
    write_tar_shards,
)

SPORT = (
    "the team won the match and the coach praised the players while "
    "the fans cheered the final goal of the season"
)
# lexically DISJOINT from the sports target: every unigram/bigram is
# unseen by the target model, so its DSIR log-ratio is decisively
# negative (shared stopwords would soften the separation)
COOK = (
    "simmer onions slowly butter whisk cream sauce season dish thyme "
    "garlic roast pepper olive oil salt vinegar knead dough proof "
    "yeast glaze pastry caramel sugar zest citrus braise stock reduce"
)


def _corpus_rows():
    rows = []
    # 6 in-domain docs on distinct domains
    for i in range(6):
        rows.append(
            {
                "id": f"good{i}",
                "url": f"https://site{i}.org/a/{i}",
                "text": SPORT + f" extra token {i}",
            }
        )
    # spam domain (url_gate)
    rows.append(
        {"id": "spam0", "url": "https://bad.casino.biz/x", "text": SPORT}
    )
    # domain domination: 5 docs on one registered domain (cap keeps 2)
    for i in range(5):
        rows.append(
            {
                "id": f"dom{i}",
                "url": f"https://sub{i}.bighost.com/p/{i}",
                "text": SPORT + f" host variant {i} with words",
            }
        )
    # typography twin of good0 (normalize + exact dedup drops one)
    rows.append(
        {
            "id": "twin0",
            "url": "https://twin.net/t",
            "text": (SPORT + " extra token 0").replace("the team", "the team")
            .replace(" ", " ", 1)
            .replace("'", "’"),
        }
    )
    # off-domain doc (DSIR drops it)
    rows.append(
        {"id": "cook0", "url": "https://food.example.org/r", "text": COOK}
    )
    return rows


def test_web_recipe_end_to_end(spark, tmp_path):
    src = tmp_path / "jsonl"
    src.mkdir()
    (src / "part-0.jsonl").write_text(
        "\n".join(json.dumps(r) for r in _corpus_rows())
    )
    docs = read_jsonl(spark, str(src))
    assert sorted(docs.columns) == ["doc_id", "text", "url"]

    target = spark.createDataFrame(
        [(f"t{i}", SPORT + f" target {i}") for i in range(3)],
        ["doc_id", "text"],
    )
    curated, counts, dropped = curate_corpus(
        docs,
        min_quality=0.0,
        min_tokens=5,
        url_block_domains=["casino.biz"],
        cap_per_domain=2,
        normalize_unicode=True,
        jaccard_threshold=0.95,
        dsir_target_df=target,
        dsir_buckets=512,
        # small corpora need small smoothing: alpha=1 over 512 buckets
        # floods the per-gram ratios and softens domain separation
        dsir_alpha=0.01,
        mix_target_frac=0.6,
        return_dropped=True,
    )
    audit = {r["doc_id"]: r["stage"] for r in dropped.collect()}
    survivors = {r["doc_id"] for r in curated.collect()}

    assert audit["spam0"] == "url_gate"
    # 5 bighost docs -> cap 2: exactly 3 attributed to domain_cap
    dom_dropped = [d for d, s in audit.items() if s == "domain_cap"]
    assert len(dom_dropped) == 3 and all(d.startswith("dom") for d in dom_dropped)
    # the typography twin normalizes to good0's text: exact dedup
    # keeps the smaller id ('good0' < 'twin0' lexicographically)
    assert audit["twin0"] == "exact_dedup"
    assert "good0" in survivors
    # the cooking doc dies in the DSIR mix stage
    assert audit["cook0"] == "mix"
    # audit + survivors partition the input
    assert not (set(audit) & survivors)
    assert len(audit) + len(survivors) == len(_corpus_rows())

    # handoff: deterministic split, train shard written + read back
    splits = split_corpus(
        curated, {"train": 0.8, "val": 0.2}, id_col="doc_id"
    )
    n_train = splits["train"].count()
    n_val = splits["val"].count()
    assert n_train + n_val == len(survivors)
    out = tmp_path / "shards"
    manifest = write_tar_shards(
        curated.select("doc_id", "text"),
        str(out),
        columns={"text": "txt"},
        n_shards=2,
    ).collect()
    assert sum(m["n_samples"] for m in manifest) == len(survivors)
    back = read_tar_shards(spark, str(out)).count()
    assert back == len(survivors)
