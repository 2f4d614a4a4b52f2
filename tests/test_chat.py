"""Chat/SFT preparation: rendering + supervised-span offsets against
an exact python twin, and the substring invariant the loss mask
depends on."""

import pytest
from pyspark.sql import functions as F

from opencosmo_spark.pipeline.chat import (
    chat_sft_rows,
    conversation_turns,
    render_chat,
)

CONVS = [
    (
        0,
        [
            ("system", "You are a helpful assistant."),
            ("user", "What is 2+2?"),
            ("assistant", "4"),
            ("user", "And 3+3?"),
            ("assistant", "6, naturally."),
        ],
    ),
    (1, [("user", "no reply here")]),
    (2, [("assistant", ""), ("user", "x"), ("assistant", "ok")]),
    (3, None),
    (4, []),
]


def _twin(msgs, role="assistant"):
    """Exact python reference for the documented template."""
    text, spans, pos = "", [], 0
    for r, c in msgs or []:
        part = f"<|{r}|>\n{c}\n"
        if r == role:
            start = pos + len(r) + 5
            spans.append((start, start + len(c)))
        text += part
        pos += len(part)
    return text, spans


@pytest.fixture(scope="module")
def convs(spark):
    return spark.createDataFrame(
        CONVS,
        "conv_id long, messages array<struct<role:string,content:string>>",
    )


def test_render_chat_matches_twin_and_substring_invariant(spark, convs):
    got = {
        r["conv_id"]: r
        for r in render_chat(convs).collect()
    }
    for cid, msgs in CONVS:
        text, spans = _twin(msgs)
        assert got[cid]["text"] == text, cid
        got_spans = [
            (s["start"], s["end"]) for s in got[cid]["supervised_spans"]
        ]
        assert got_spans == spans, cid
        # the loss-mask invariant: the span slices out exactly the
        # assistant content
        contents = [c for r, c in (msgs or []) if r == "assistant"]
        assert [text[a:b] for a, b in got_spans] == contents, cid


def test_conversation_turns_flatten(spark, convs):
    t = conversation_turns(convs).toPandas()
    assert len(t) == 5 + 1 + 3  # null/empty arrays yield no rows
    c0 = t[t.conv_id == 0].sort_values("turn")
    assert list(c0.turn) == [0, 1, 2, 3, 4]
    assert list(c0.role) == ["system", "user", "assistant", "user", "assistant"]
    assert c0.iloc[2].content == "4"


def test_chat_sft_rows_filters_unsupervised(spark, convs):
    rows = {r["conv_id"]: r for r in chat_sft_rows(convs).collect()}
    # conv 1 (no assistant), 3 (null), 4 (empty) drop; conv 2 keeps
    # (one empty + one nonempty assistant turn = 2 chars)
    assert set(rows) == {0, 2}
    assert rows[0]["n_supervised_chars"] == len("4") + len("6, naturally.")
    assert rows[2]["n_supervised_chars"] == 2
    # composes with the packer: token counts over the rendered text
    from opencosmo_spark.pipeline.text import token_count

    df = chat_sft_rows(convs).withColumn(
        "n_tokens", token_count(F.col("text"))
    )
    assert df.filter("n_tokens <= 0").count() == 0


def test_render_chat_custom_supervised_role(spark, convs):
    got = {
        r["conv_id"]: r
        for r in render_chat(convs, supervised_role="user").collect()
    }
    text, spans = _twin(CONVS[0][1], role="user")
    assert [
        (s["start"], s["end"]) for s in got[0]["supervised_spans"]
    ] == spans


def test_render_chat_null_content_renders_empty(spark):
    """NULL content/role render as empty strings — the part is still
    present in the text and the spans stay aligned."""
    df = spark.createDataFrame(
        [
            (
                9,
                [
                    ("user", None),
                    ("assistant", "fine"),
                    (None, "orphan"),
                ],
            )
        ],
        "conv_id long, messages array<struct<role:string,content:string>>",
    )
    r = render_chat(df).collect()[0]
    assert r["text"] == "<|user|>\n\n<|assistant|>\nfine\n<||>\norphan\n"
    (sp,) = r["supervised_spans"]
    assert r["text"][sp["start"] : sp["end"]] == "fine"


def test_render_chat_randomized_unicode_twin(spark):
    """Seeded-random conversations with adversarial content (unicode,
    newlines, template-lookalike '<|' strings, empties) against the
    python twin — one batched comparison, not per-example spark
    rounds."""
    import random

    rng = random.Random(99)
    alphabet = "ab \n<|>é漢🙂|"
    rows = []
    for cid in range(60):
        msgs = [
            (
                rng.choice(["system", "user", "assistant", "tool"]),
                "".join(
                    rng.choice(alphabet)
                    for _ in range(rng.randrange(0, 30))
                ),
            )
            for _ in range(rng.randrange(1, 7))
        ]
        rows.append((cid, msgs))
    df = spark.createDataFrame(
        rows,
        "conv_id long, messages array<struct<role:string,content:string>>",
    )
    got = {r["conv_id"]: r for r in render_chat(df).collect()}
    for cid, msgs in rows:
        text, spans = _twin(msgs)
        assert got[cid]["text"] == text, cid
        got_spans = [
            (s["start"], s["end"]) for s in got[cid]["supervised_spans"]
        ]
        assert got_spans == spans, cid
        for (a, b), c in zip(
            got_spans, [c for r, c in msgs if r == "assistant"]
        ):
            assert text[a:b] == c, cid


def test_chat_jsonl_round_trip(spark, tmp_path):
    """The real interchange: conversations written as JSONL, read back
    with an explicit schema, rendered — end-to-end SFT ingestion."""
    from opencosmo_spark.pipeline.jsonl import read_jsonl, write_jsonl

    df = spark.createDataFrame(
        CONVS[:3],
        "conv_id long, messages array<struct<role:string,content:string>>",
    )
    p = str(tmp_path / "chat_jsonl")
    write_jsonl(df.withColumn("text", F.lit("")), p, compress=False)
    back = read_jsonl(
        spark,
        p,
        id_field="conv_id",
        schema=(
            "conv_id long, text string, "
            "messages array<struct<role:string,content:string>>"
        ),
    )
    rows = {
        r["doc_id"]: r
        for r in chat_sft_rows(back, id_col="doc_id").collect()
    }
    text0, spans0 = _twin(CONVS[0][1])
    # read_jsonl normalizes doc_id to string
    assert rows["0"]["text"] == text0
    assert [
        (s["start"], s["end"]) for s in rows["0"]["supervised_spans"]
    ] == spans0


def test_pack_sft_rows_rebases_spans(spark):
    """Packed SFT sequences: every conversation appears exactly once,
    no pack exceeds the budget (absent oversize), and every re-based
    span still slices exactly its assistant content out of the PACK
    text — the loss mask survives packing."""
    import random

    from opencosmo_spark.pipeline.chat import pack_sft_rows

    rng = random.Random(7)
    convs = []
    for cid in range(30):
        msgs = []
        for _ in range(rng.randrange(1, 4)):
            msgs.append(("user", " ".join(
                rng.choice(["ask", "tell", "why", "how"])
                for _ in range(rng.randrange(2, 8))
            )))
            msgs.append(("assistant", " ".join(
                rng.choice(["yes", "no", "maybe", "because", "so"])
                for _ in range(rng.randrange(2, 10))
            )))
        convs.append((cid, msgs))
    df = spark.createDataFrame(
        convs,
        "conv_id long, messages array<struct<role:string,content:string>>",
    )
    sft = chat_sft_rows(df)
    packs = pack_sft_rows(sft, budget=60).collect()

    expected = {}
    for cid, msgs in convs:
        text, spans = _twin(msgs)
        expected[cid] = [text[a:b] for a, b in spans]
    all_sliced = []
    seen_docs = 0
    for p in packs:
        assert p["oversize"] or p["pack_tokens"] <= 60
        seen_docs += p["n_docs"]
        for s in p["supervised_spans"]:
            all_sliced.append(p["text"][s["start"] : s["end"]])
    assert seen_docs == 30
    want = sorted(c for v in expected.values() for c in v)
    assert sorted(all_sliced) == want
    # determinism: same input -> identical assignment
    again = pack_sft_rows(sft, budget=60).collect()
    assert sorted(r["text"] for r in again) == sorted(
        r["text"] for r in packs
    )
