"""End-to-end example: instruction-tuning data preparation — build
conversations, render them with a configurable chat template, compute
exact loss-mask spans (character AND token offsets), pack into
fixed-token training sequences, and verify the mask survives packing.

Run against the synthetic fixtures:

    python examples/sft_pipeline.py [sf_dir]

Everything here is the public package API; each step prints what it
did. At real scale the same calls run unchanged on a cluster — the
chat chain is row-local JVM expressions, and packing parallelizes per
shard.
"""

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from opencosmo_spark import get_spark  # noqa: E402
from opencosmo_spark.pipeline.chat import (  # noqa: E402
    CHATML,
    chat_sft_rows,
    conversation_turns,
    pack_sft_rows,
    render_chat,
)
from opencosmo_spark.pipeline.text import packing_report  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main():
    spark = get_spark("sft-example")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # 1. synthesize ShareGPT-shaped conversations from the documents
    #    table: system turn + user question (text prefix) + assistant
    #    answer (text middle) — the interchange shape chat JSONL lands
    #    in. Real pipelines read this with jsonl.read_jsonl.
    convs = docs.select(
        F.col("doc_id").alias("conv_id"),
        F.array(
            F.struct(
                F.lit("system").alias("role"),
                F.lit("You are a concise assistant.").alias("content"),
            ),
            F.struct(
                F.lit("user").alias("role"),
                F.substring("text", 1, 80).alias("content"),
            ),
            F.struct(
                F.lit("assistant").alias("role"),
                F.substring("text", 81, 160).alias("content"),
            ),
        ).alias("messages"),
    )
    n_turns = conversation_turns(convs).count()
    print(f"conversations: {convs.count()} ({n_turns} turns)")

    # 2. render with the ChatML template, token offsets included:
    #    supervised_spans carries (start, end, tok_start, tok_end) for
    #    every assistant turn, computed by the SAME expressions that
    #    render — the loss mask can never desync from the text.
    sft = chat_sft_rows(convs, token_mode="whitespace", template=CHATML)
    row = sft.orderBy("conv_id").first()
    sp = row["supervised_spans"][0]
    sliced = row["text"][sp["start"] : sp["end"]]
    print(
        f"rendered: {sft.count()} rows with supervised content; "
        f"first span chars [{sp['start']}:{sp['end']}] tokens "
        f"[{sp['tok_start']}:{sp['tok_end']}]"
    )
    print(f"mask check: span slices assistant content = {len(sliced) > 0}")

    # 3. pack into 256-token training sequences, binning by the
    #    render-consistent n_tokens column; spans re-base to pack
    #    coordinates (char and token offsets shift in lockstep)
    packs = pack_sft_rows(
        sft, budget=256, token_count_col="n_tokens"
    )
    rep = packing_report(packs, budget=256)
    print(
        f"packed: {rep['packs']} packs, {rep['tokens']} tokens, "
        f"waste_frac={rep['waste_frac']:.3f}, "
        f"oversize={rep['oversize_packs']}"
    )

    # 4. the invariant a trainer depends on: every re-based span still
    #    slices exactly one assistant turn's content out of the PACK
    first_pack = packs.orderBy("pack_id").first()
    ok = all(
        0 <= s["start"] < s["end"] <= len(first_pack["text"])
        for s in first_pack["supervised_spans"]
    )
    print(
        f"pack 0: {first_pack['n_docs']} conversations, "
        f"{len(first_pack['supervised_spans'])} supervised spans, "
        f"all in-bounds = {ok}"
    )

    # 5. default-template render for comparison (token coordinates
    #    equal whole-text whitespace tokenization for this template)
    plain = render_chat(convs, token_mode="whitespace")
    tot = plain.agg(F.sum("n_tokens")).first()[0]
    print(f"default template total tokens: {tot}")

    # 6. preference pairs (DPO): shared prompt, two completions —
    #    chosen/rejected share the rendered prompt prefix exactly,
    #    spans cover ONLY the completion, and the hygiene gate drops
    #    identical / empty / length-confounded pairs with per-rule
    #    flags
    from opencosmo_spark.pipeline.preference import (
        filter_preference_pairs,
        render_preference_pairs,
    )

    def msg(role, content):
        return F.struct(F.lit(role).alias("role"), content.alias("content"))

    triples = docs.select(
        F.col("doc_id").alias("pair_id"),
        F.array(
            msg("user", F.substring("text", 1, 60))
        ).alias("prompt"),
        F.array(
            msg("assistant", F.substring("text", 61, 80))
        ).alias("chosen"),
        F.array(
            msg("assistant", F.substring("text", 141, 40))
        ).alias("rejected"),
    )
    from opencosmo_spark.pipeline.preference import preference_report

    rendered_pairs = render_preference_pairs(
        triples, token_mode="whitespace"
    )
    rep_pp = preference_report(rendered_pairs, max_len_ratio=4.0)
    print(
        f"pair hygiene: {rep_pp['pairs']} pairs, "
        f"{rep_pp['identical']} identical, "
        f"{rep_pp['ratio_dropped']} ratio-dropped, "
        f"{rep_pp['kept']} kept"
    )
    pairs = filter_preference_pairs(rendered_pairs, max_len_ratio=4.0)
    n_pairs = pairs.count()
    p0 = pairs.orderBy("pair_id").first()
    shared = p0["chosen_text"][: p0["prompt_chars"]] == p0[
        "rejected_text"
    ][: p0["prompt_chars"]]
    print(
        f"DPO pairs kept: {n_pairs}; pair {p0['pair_id']}: shared "
        f"prompt prefix = {shared}, chosen span = "
        f"{(p0['chosen_spans'][0]['start'], p0['chosen_spans'][0]['end'])}, "
        f"len_ratio = {p0['pp_len_ratio']}"
    )

    # 7. the PRETRAINING counterpart: real BPE token ids through the
    #    concat-and-chunk block packer — fixed 128-token blocks,
    #    documents split at block boundaries, doc_spans carrying the
    #    provenance a position-id-resetting loader needs
    from opencosmo_spark.pipeline.bpe import (
        apply_bpe,
        bpe_encode_ids,
        bpe_vocab,
        train_bpe_merges,
    )
    from opencosmo_spark.pipeline.text import block_pack_ids

    merges = train_bpe_merges(docs, n_merges=50)
    v = bpe_vocab(apply_bpe(docs, merges, method="pandas")).toPandas()
    vocab = dict(zip(v.token, v.token_id.astype(int)))

    # the tokenizer ships as a release artifact — ids are only
    # reproducible with the EXACT merges/vocab that produced them
    import tempfile as _tf

    from opencosmo_spark.pipeline.bpe import read_tokenizer, write_tokenizer

    tok_dir = _tf.mkdtemp(prefix="tokenizer_")
    write_tokenizer(spark, tok_dir, merges, vocab)
    tok = read_tokenizer(spark, tok_dir)
    print(f"tokenizer artifact: {len(tok['vocab'])} tokens, "
          f"{len(tok['merges'])} merges round-tripped")

    ids = bpe_encode_ids(
        docs.select("doc_id", "text"), tok["merges"], tok["vocab"]
    )
    blocks = block_pack_ids(
        ids, block_size=128, eos_id=len(vocab), drop_last=True
    )
    nb = blocks.count()
    b0 = blocks.orderBy("block_id").first()
    print(
        f"pretraining blocks: {nb} x 128 tokens, block 0 holds "
        f"{len(b0['doc_spans'])} doc slices"
    )

    # epoch 2 of the same corpus: a SEEDED document shuffle before
    # chunking (xxhash64 order key — zero extra shuffles), the way
    # every real pretraining run varies block composition per epoch
    epoch2 = block_pack_ids(
        ids, block_size=128, eos_id=len(vocab), drop_last=True,
        shuffle_seed=2,
    )
    print(f"epoch-2 shuffle: {epoch2.count()} blocks, new composition")

    # 8. byte-level (GPT-2 style) tokenizer: lossless on ANY text —
    #    OOV structurally impossible, ids decode back to the exact
    #    input bytes (crawl-safe: case, whitespace, emoji, unseen
    #    scripts all round-trip)
    from opencosmo_spark.pipeline.bpe import decode_bpe_ids

    bmerges = train_bpe_merges(docs, n_merges=40, mode="byte")
    bv = bpe_vocab(
        apply_bpe(docs, bmerges, mode="byte", method="pandas"),
        include_byte_alphabet=True,
        merges=bmerges,
    ).toPandas()
    bvocab = dict(zip(bv.token, bv.token_id.astype(int)))
    sample = docs.select("doc_id", "text").limit(1)
    brow = bpe_encode_ids(
        sample, bmerges, bvocab, mode="byte"
    ).first()
    orig = sample.first()["text"]
    assert decode_bpe_ids(list(brow["input_ids"]), bvocab) == orig
    print(
        f"byte-level tokenizer: {len(bvocab)} tokens "
        f"(256-byte alphabet + merges), lossless round-trip OK"
    )

    spark.stop()


if __name__ == "__main__":
    main()
