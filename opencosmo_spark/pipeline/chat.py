"""Instruction-tuning data preparation: conversation tables
(``array<struct<role, content>>`` message columns — the ShareGPT /
chat-JSONL interchange shape) rendered into training strings with
EXACT assistant-span character offsets for loss masking.

The loss-masking contract is the part pipelines get wrong: the
trainer must know which character (then token) ranges of the rendered
string are assistant content (supervised) vs prompt scaffolding
(masked). Computing those offsets anywhere but at render time —
regex-recovering them later, or re-rendering in the loader — breaks
the moment the template changes. Here the offsets are computed by the
SAME expression that renders, so ``rendered[start:end] == content``
holds by construction (differentially tested per turn).

Everything is JVM higher-order functions over the messages array —
per-row, shuffle-free, linear in conversation length; at 100 TB the
operator is embarrassingly row-parallel and composes with
``pack_chunks_bfd`` for boundary-respecting sequence packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def conversation_turns(
    df: DataFrame,
    messages_col: str = "messages",
    id_col: str = "conv_id",
) -> DataFrame:
    """Flatten conversations to one row per turn:
    ``(id_col, turn, role, content)`` with ``turn`` the 0-based
    position. One posexplode projection — the per-turn view for
    filtering (drop system turns, cap turn counts, per-turn quality
    gates) before re-rendering."""
    return df.select(
        F.col(id_col),
        F.posexplode(messages_col).alias("turn", "__m"),
    ).select(
        id_col,
        "turn",
        F.col("__m.role").alias("role"),
        F.col("__m.content").alias("content"),
    )


def _part_expr(m: Column) -> Column:
    """One rendered message part: ``<|role|>\\ncontent\\n``. NULL
    role/content render as empty strings — a NULL would otherwise null
    the whole concat, silently dropping the part from the rendered
    text while the span arithmetic still counted it."""
    return F.concat(
        F.lit("<|"),
        F.coalesce(m["role"], F.lit("")),
        F.lit("|>\n"),
        F.coalesce(m["content"], F.lit("")),
        F.lit("\n"),
    )


def render_chat(
    df: DataFrame,
    messages_col: str = "messages",
    supervised_role: str = "assistant",
) -> DataFrame:
    """Append ``text`` (the rendered training string) and
    ``supervised_spans`` (``array<struct<start, end>>`` — 0-based
    character offsets, end-exclusive, of each ``supervised_role``
    turn's CONTENT within ``text``).

    Template: each message renders as ``<|role|>\\ncontent\\n``,
    concatenated in turn order. Span arithmetic is pure expression
    algebra over the same parts that build the string: a running-sum
    aggregate gives each part's start, the header length
    (``len(role) + 5``) offsets to the content, so
    ``substring(text, start+1, end-start) == content`` for every
    supervised turn — the invariant the loss mask depends on and the
    test asserts. NULL message arrays yield empty text and no spans.
    """
    msgs = F.coalesce(
        F.col(messages_col),
        F.array().cast(df.schema[messages_col].dataType),
    )
    parts = F.transform(msgs, _part_expr)
    # starts[i] = sum of part lengths before i (running-sum aggregate:
    # conversations are short arrays, the quadratic array-append is
    # driver-irrelevant and row-local)
    starts = F.aggregate(
        F.transform(parts, lambda p: F.length(p)),
        F.array(F.lit(0)),
        lambda acc, x: F.concat(
            acc, F.array(F.element_at(acc, -1) + x)
        ),
    )
    spans = F.filter(
        F.zip_with(
            msgs,
            F.slice(starts, 1, F.size(msgs)),
            lambda m, s: F.struct(
                (
                    s + F.length(F.coalesce(m["role"], F.lit(""))) + 5
                ).alias("start"),
                (
                    s
                    + F.length(F.coalesce(m["role"], F.lit("")))
                    + 5
                    + F.length(F.coalesce(m["content"], F.lit("")))
                ).alias("end"),
                m["role"].alias("__role"),
            ),
        ),
        lambda sp: sp["__role"] == F.lit(supervised_role),
    )
    return df.withColumn(
        "text", F.concat_ws("", parts)
    ).withColumn(
        "supervised_spans",
        F.transform(
            spans,
            lambda sp: F.struct(
                sp["start"].alias("start"), sp["end"].alias("end")
            ),
        ),
    )


def chat_sft_rows(
    df: DataFrame,
    messages_col: str = "messages",
    id_col: str = "conv_id",
    supervised_role: str = "assistant",
    min_supervised_chars: int = 1,
) -> DataFrame:
    """The standard SFT preparation in one call: render conversations,
    drop those with no (or too little) supervised content — a
    conversation whose every turn is masked contributes nothing but
    padding — and return ``(id_col, text, supervised_spans,
    n_supervised_chars)`` ready for token counting and
    ``pack_chunks_bfd``."""
    r = render_chat(df, messages_col, supervised_role)
    sup = F.aggregate(
        F.transform(
            F.col("supervised_spans"), lambda s: s["end"] - s["start"]
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        r.withColumn("n_supervised_chars", sup)
        .filter(F.col("n_supervised_chars") >= int(min_supervised_chars))
        .select(id_col, "text", "supervised_spans", "n_supervised_chars")
    )


def pack_sft_rows(
    sft: DataFrame,
    budget: int = 2048,
    id_col: str = "conv_id",
    text_col: str = "text",
    spans_col: str = "supervised_spans",
    shard_col: str | None = None,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Pack rendered SFT rows into fixed-token training sequences with
    the supervised spans RE-BASED to pack coordinates — the step that
    actually completes the chat chain: packing that drops or desyncs
    the loss mask silently trains on prompt scaffolding.

    Composition: token counts via ``token_count(token_mode)``,
    boundary-respecting assignment via ``pack_chunks_bfd`` (no
    conversation ever splits), then per pack the member texts
    concatenate in ascending ``id_col`` order and every span shifts by
    its member's character offset — computed by the same running-sum
    algebra ``render_chat`` uses, so ``pack_text[start:end]`` still
    slices exactly the supervised content (asserted per span in the
    test). Returns one row per pack: ``(shard?, pack_id, text,``
    ``supervised_spans, n_docs, pack_tokens, oversize)``.

    Scale shape: the pack step inherits ``pack_chunks_bfd``'s
    per-shard parallelism; the assembly is one groupBy(pack) whose
    state is the pack's own members (budget-bounded), and all offset
    arithmetic is row-local JVM.
    """
    from .text import pack_chunks_bfd, token_count

    with_tok = sft.withColumn(
        "__nt", token_count(F.col(text_col), token_mode)
    ).withColumn("__ci", F.lit(0))
    packed = pack_chunks_bfd(
        with_tok,
        budget,
        id_col=id_col,
        idx_col="__ci",
        tokens_col="__nt",
        shard_col=shard_col,
        keep_cols=(text_col, spans_col),
    )
    gb = ([shard_col] if shard_col else []) + ["pack_id"]
    rows = packed.groupBy(*gb).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(id_col).alias("id"),
                    F.col(text_col).alias("t"),
                    F.col(spans_col).alias("sp"),
                )
            )
        ).alias("__items"),
        F.first("pack_tokens").alias("pack_tokens"),
        (F.max(F.col("oversize").cast("int")) == 1).alias("oversize"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    starts = F.aggregate(
        F.transform("__items", lambda it: F.length(it["t"])),
        F.array(F.lit(0)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x)),
    )
    text = F.array_join(
        F.transform("__items", lambda it: it["t"]), ""
    )
    spans = F.flatten(
        F.zip_with(
            F.col("__items"),
            F.slice(starts, 1, F.size("__items")),
            lambda it, off: F.transform(
                it["sp"],
                lambda s: F.struct(
                    (s["start"] + off).alias("start"),
                    (s["end"] + off).alias("end"),
                ),
            ),
        )
    )
    return rows.select(
        *gb,
        text.alias(text_col),
        spans.alias(spans_col),
        "n_docs",
        "pack_tokens",
        "oversize",
    )
