"""Preference-pair (DPO) preparation: shared-prompt-prefix guarantee,
completion-only span masking against an exact python twin, token
offsets, and the pair-hygiene filter."""

import pytest
from pyspark.sql import functions as F

from opencosmo_spark.pipeline.chat import CHATML, ChatTemplate
from opencosmo_spark.pipeline.preference import (
    filter_preference_pairs,
    render_preference_pairs,
)

# (pair_id, prompt_msgs, chosen_msgs, rejected_msgs)
PAIRS = [
    (
        0,
        [
            ("system", "You are terse."),
            ("user", "What is 2+2?"),
            ("assistant", "4"),  # context assistant turn: stays masked
            ("user", "And 3+3?"),
        ],
        [("assistant", "6, naturally.")],
        [("assistant", "seven")],
    ),
    (
        1,
        [("user", "name a prime")],
        [("assistant", "7"), ("user", "why?"), ("assistant", "odd, indivisible")],
        [("assistant", "7")],
    ),
    # multi-byte content on both sides of the boundary
    (
        2,
        [("user", "übersetze: café")],
        [("assistant", "café → Kaffeehaus")],
        [("assistant", "")],  # empty completion: zero-length span dropped
    ),
    (3, [("user", "hi")], None, [("assistant", "yo")]),  # NULL chosen
    (4, [("user", "same")], [("assistant", "tie")], [("assistant", "tie")]),
]

SCHEMA = (
    "pair_id long,"
    " prompt array<struct<role:string,content:string>>,"
    " chosen array<struct<role:string,content:string>>,"
    " rejected array<struct<role:string,content:string>>"
)


def _render(msgs, tpl):
    text, pos, spans = "", 0, []
    for r, c in msgs or []:
        h, f = tpl.header(r), tpl.footer_of(r)
        if r == "assistant":
            spans.append((pos + len(h), pos + len(h) + len(c)))
        text += h + c + f
        pos = len(text)
    return text, spans


def _twin(prompt, comp, tpl):
    """Exact python reference: render prompt++comp, keep assistant
    spans that end past the rendered-prompt length."""
    ptext, _ = _render(prompt, tpl)
    text, spans = _render((prompt or []) + (comp or []), tpl)
    keep = [s for s in spans if s[1] > len(ptext) and s[1] > s[0]]
    return ptext, text, keep


@pytest.fixture(scope="module")
def pairs_df(spark):
    return spark.createDataFrame(PAIRS, SCHEMA)


@pytest.mark.parametrize(
    "tpl",
    [ChatTemplate(), CHATML],
    ids=["default", "chatml"],
)
def test_render_matches_twin_across_templates(spark, pairs_df, tpl):
    got = {
        r["pair_id"]: r
        for r in render_preference_pairs(pairs_df, template=tpl).collect()
    }
    for pid, prompt, chosen, rejected in PAIRS:
        row = got[pid]
        for comp, name in ((chosen, "chosen"), (rejected, "rejected")):
            ptext, text, spans = _twin(prompt, comp, tpl)
            assert row["prompt_text"] == ptext, (pid, name)
            assert row["prompt_chars"] == len(ptext)
            assert row[f"{name}_text"] == text, (pid, name)
            assert [
                (s["start"], s["end"]) for s in row[f"{name}_spans"]
            ] == spans, (pid, name)
            # the invariants the trainer depends on
            assert text.startswith(ptext)
            for s, e in spans:
                assert s >= len(ptext) and e > s


def test_shared_prefix_and_slice_invariant(pairs_df):
    for row in render_preference_pairs(pairs_df).collect():
        p = row["prompt_chars"]
        assert row["chosen_text"][:p] == row["rejected_text"][:p]
        assert row["chosen_text"][:p] == row["prompt_text"]
        for name in ("chosen", "rejected"):
            text = row[f"{name}_text"]
            for sp in row[f"{name}_spans"]:
                # every span slices completion content (non-prompt)
                assert sp["start"] >= p and sp["end"] > sp["start"]
                assert text[sp["start"] : sp["end"]] != ""


def test_context_assistant_turn_stays_masked(pairs_df):
    row = (
        render_preference_pairs(pairs_df)
        .filter(F.col("pair_id") == 0)
        .collect()[0]
    )
    # prompt holds one assistant turn ("4") — it must NOT appear in
    # either branch's spans; each branch supervises exactly its one
    # completion turn
    assert len(row["chosen_spans"]) == 1
    assert len(row["rejected_spans"]) == 1
    sp = row["chosen_spans"][0]
    assert row["chosen_text"][sp["start"] : sp["end"]] == "6, naturally."
    sp = row["rejected_spans"][0]
    assert row["rejected_text"][sp["start"] : sp["end"]] == "seven"


def test_token_offsets_slice_whole_string_tokenization(pairs_df):
    out = render_preference_pairs(pairs_df, token_mode="whitespace")
    for row in out.collect():
        ptoks = row["prompt_tokens"]
        assert ptoks == len(row["prompt_text"].split())
        for name in ("chosen", "rejected"):
            toks = row[f"{name}_text"].split()
            assert row[f"{name}_tokens"] == len(toks)
            for sp in row[f"{name}_spans"]:
                content = row[f"{name}_text"][sp["start"] : sp["end"]]
                assert toks[sp["tok_start"] : sp["tok_end"]] == content.split()
                assert sp["tok_start"] >= ptoks


def test_null_completion_renders_bare_prompt(pairs_df):
    row = (
        render_preference_pairs(pairs_df)
        .filter(F.col("pair_id") == 3)
        .collect()[0]
    )
    assert row["chosen_text"] == row["prompt_text"]
    assert row["chosen_spans"] == []
    assert len(row["rejected_spans"]) == 1


def test_preexisting_text_column_survives(spark):
    df = spark.createDataFrame(PAIRS, SCHEMA).withColumn(
        "text", F.lit("original-doc-text")
    )
    out = render_preference_pairs(df)
    assert out.filter(F.col("text") != "original-doc-text").count() == 0
    assert "chosen_text" in out.columns


def test_filter_preference_pairs(pairs_df):
    rendered = render_preference_pairs(pairs_df)
    kept = filter_preference_pairs(rendered)
    ids = {r["pair_id"] for r in kept.select("pair_id").collect()}
    # 2 drops (empty rejected), 3 drops (NULL chosen), 4 drops
    # (identical); 0 and 1 survive
    assert ids == {0, 1}
    flags = {
        r["pair_id"]: r
        for r in filter_preference_pairs(
            rendered, min_completion_chars=0, drop_identical=False
        ).collect()
    }
    assert flags[4]["pp_identical"] is True
    assert flags[0]["pp_identical"] is False
    assert flags[0]["pp_chosen_chars"] == len("6, naturally.")
    assert flags[0]["pp_rejected_chars"] == len("seven")
    # len-ratio gate: pair 1's chosen has 17 supervised chars vs the
    # rejected's 1 (ratio 17); pair 0 is 13 vs 5 (ratio 2.6)
    strict = filter_preference_pairs(rendered, max_len_ratio=3.0)
    sids = {r["pair_id"] for r in strict.select("pair_id").collect()}
    assert sids == {0}


def test_len_ratio_value(pairs_df):
    flags = {
        r["pair_id"]: r
        for r in filter_preference_pairs(
            render_preference_pairs(pairs_df),
            min_completion_chars=0,
            drop_identical=False,
        ).collect()
    }
    c = flags[0]["pp_chosen_chars"]
    r = flags[0]["pp_rejected_chars"]
    assert flags[0]["pp_len_ratio"] == round(max(c, r) / min(c, r), 6)
    # empty side -> NULL ratio
    assert flags[2]["pp_len_ratio"] is None


def test_null_len_ratio_not_dropped_by_ratio_rule(pairs_df):
    """A NULL ratio (zero-char side, reachable at
    min_completion_chars=0) must not NULL-out the keep predicate:
    the ratio rule only drops pairs ABOVE max_len_ratio, matching
    preference_report's ratio_dropped accounting exactly."""
    from opencosmo_spark.pipeline.preference import preference_report

    rendered = render_preference_pairs(pairs_df)
    loose = filter_preference_pairs(
        rendered,
        min_completion_chars=0,
        drop_identical=False,
        max_len_ratio=100.0,
    )
    rows = {r["pair_id"]: r for r in loose.collect()}
    # pairs 2 (empty rejected) and 3 (NULL chosen) have NULL ratio —
    # they must SURVIVE the ratio-only gate
    assert 2 in rows and rows[2]["pp_len_ratio"] is None
    assert 3 in rows and rows[3]["pp_len_ratio"] is None
    # and the report's kept equals the filter's survivors under the
    # report's own rule set (identical dropped, min chars applied)
    rep = preference_report(rendered, max_len_ratio=100.0)
    assert rep["ratio_dropped"] == 0
    assert rep["kept"] == filter_preference_pairs(
        rendered, max_len_ratio=100.0
    ).count()


def test_preference_to_kto_unpairs_with_sft_schema(spark, pairs_df):
    from opencosmo_spark.pipeline.chat import pack_sft_rows
    from opencosmo_spark.pipeline.preference import (
        preference_to_kto,
        render_preference_pairs,
    )

    rendered = render_preference_pairs(pairs_df, token_mode="whitespace")
    kto = preference_to_kto(rendered)
    rows = {r["example_id"]: r for r in kto.collect()}
    # pair 3's chosen is NULL -> no span -> dropped; its rejected kept
    assert "3:chosen" not in rows and "3:rejected" in rows
    # pair 2's rejected is empty -> dropped
    assert "2:rejected" not in rows and "2:chosen" in rows
    r0c, r0r = rows["0:chosen"], rows["0:rejected"]
    assert r0c["desirable"] is True and r0r["desirable"] is False
    # text/span payloads are the branch's own
    sp = r0c["supervised_spans"][0]
    assert r0c["text"][sp["start"] : sp["end"]] == "6, naturally."
    assert r0c["n_tokens"] == len(r0c["text"].split())
    # keep-empty mode keeps both sides of every pair
    all_rows = preference_to_kto(rendered, drop_empty=False)
    assert all_rows.count() == pairs_df.count() * 2

    # the schema contract: KTO rows feed pack_sft_rows directly
    packs = pack_sft_rows(
        kto, budget=64, id_col="example_id",
        token_count_col="n_tokens",
    )
    p = packs.collect()
    assert sum(r["n_docs"] for r in p) == len(rows)
    for pk in p:
        for s in pk["supervised_spans"]:
            assert 0 <= s["start"] < s["end"] <= len(pk["text"])


def test_render_preference_randomized_unicode_twin(spark):
    """Seeded-random triples with adversarial content (unicode,
    newlines, template-lookalike '<|' strings, empty completions,
    assistant turns inside the prompt) against the python twin — one
    batched comparison."""
    import random

    rng = random.Random(173)
    alphabet = "ab \n<|>é漢🙂|"

    def content():
        return "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 25))
        )

    rows = []
    for pid in range(50):
        prompt = [
            (rng.choice(["system", "user", "assistant"]), content())
            for _ in range(rng.randrange(1, 5))
        ]
        chosen = [("assistant", content())]
        rejected = [
            ("assistant", content())
            for _ in range(rng.randrange(1, 3))
        ]
        rows.append((pid, prompt, chosen, rejected))
    df = spark.createDataFrame(rows, SCHEMA.replace("pair_id", "pair_id"))
    tpl = ChatTemplate()
    got = {r["pair_id"]: r for r in render_preference_pairs(df).collect()}
    for pid, prompt, chosen, rejected in rows:
        row = got[pid]
        for comp, name in ((chosen, "chosen"), (rejected, "rejected")):
            ptext, text, spans = _twin(prompt, comp, tpl)
            assert row[f"{name}_text"] == text, pid
            assert [
                (s["start"], s["end"]) for s in row[f"{name}_spans"]
            ] == spans, pid
            for a, b in spans:
                assert text[a:b] != "" and a >= len(ptext)
        assert (
            row["chosen_text"][: row["prompt_chars"]]
            == row["rejected_text"][: row["prompt_chars"]]
        )


def test_preference_on_long_truncate_flags(spark):
    """on_long='truncate' slices each branch at max_turns and renames
    the flag per branch; the default errors loudly on a long prompt."""
    long_prompt = [("user", f"m{i}") for i in range(6)]
    df = spark.createDataFrame(
        [(0, long_prompt, [("assistant", "ok")], [("assistant", "no")])],
        SCHEMA,
    )
    out = render_preference_pairs(
        df, max_turns=4, on_long="truncate"
    ).collect()[0]
    assert out["prompt_turns_truncated"] is True
    assert out["chosen_turns_truncated"] is True
    assert out["rejected_turns_truncated"] is True
    # the sliced prompt renders only the first 4 turns
    assert out["prompt_text"].count("<|user|>") == 4
    # completions fell off the slice -> no spans
    assert out["chosen_spans"] == [] and out["rejected_spans"] == []

    with pytest.raises(Exception, match="max_turns"):
        render_preference_pairs(df, max_turns=4).collect()


def test_preference_report_counts_each_rule(spark, pairs_df):
    """One-job accounting equals the filter's survivors and the
    fixture's known per-rule incidences."""
    from opencosmo_spark.pipeline.preference import preference_report

    rendered = render_preference_pairs(pairs_df)
    rep = preference_report(rendered)
    assert rep["pairs"] == 5
    assert rep["identical"] == 1          # pair 4
    assert rep["chosen_empty"] == 1       # pair 3 (NULL chosen)
    assert rep["rejected_empty"] == 1     # pair 2 (empty rejected)
    assert rep["ratio_dropped"] == 0      # no ratio gate
    assert rep["kept"] == filter_preference_pairs(rendered).count()

    strict = preference_report(rendered, max_len_ratio=3.0)
    assert strict["ratio_dropped"] == 1   # pair 1 (ratio 17)
    assert strict["kept"] == filter_preference_pairs(
        rendered, max_len_ratio=3.0
    ).count()
