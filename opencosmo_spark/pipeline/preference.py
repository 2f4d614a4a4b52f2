"""Preference-pair (DPO / RLHF reward-model) data preparation:
``(prompt, chosen, rejected)`` conversation triples rendered into
training strings with exact completion-span offsets and a
shared-prompt-prefix guarantee.

The contract a DPO trainer needs and generic chat rendering doesn't
give: (1) chosen and rejected strings must share the rendered prompt
as an EXACT character (and token) prefix, because the policy/reference
log-prob difference is computed only over completion positions; (2)
the supervised spans must cover ONLY the completion's assistant turns
— an assistant turn inside the prompt context is scaffolding for both
branches and must stay masked. Both fall out by construction here:
each branch renders ``concat(prompt_msgs, completion_msgs)`` through
the SAME :func:`~opencosmo_spark.pipeline.chat.render_chat` expression
algebra, so the prompt prefix is shared bit-for-bit, and spans are
kept only when they lie past the rendered prompt length.

Everything is row-local JVM expression work (three renders per row,
each linear in turn count under the ``max_turns`` guard); at 100 TB
the operator is embarrassingly row-parallel, and the pair-hygiene
filter is a projection + filter with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .chat import DEFAULT_TEMPLATE, ChatTemplate, render_chat


def render_preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    supervised_role: str = "assistant",
    template: ChatTemplate = DEFAULT_TEMPLATE,
    token_mode: str | None = None,
    max_turns: int = 4096,
    on_long: str = "error",
) -> DataFrame:
    """Render conversational preference triples — ``prompt_col``
    (shared context messages), ``chosen_col`` / ``rejected_col``
    (completion messages, usually a single assistant turn), all
    ``array<struct<role, content>>`` — into:

    - ``prompt_text`` and ``prompt_chars`` (its length; with
      ``token_mode`` also ``prompt_tokens``): the masking boundary.
    - ``chosen_text`` / ``rejected_text``: the full rendered strings
      ``render(prompt ++ completion)``. Because both concatenate the
      same prompt array under the same template expressions,
      ``chosen_text[:prompt_chars] == rejected_text[:prompt_chars]
      == prompt_text`` holds exactly (tested, including multi-byte
      content).
    - ``chosen_spans`` / ``rejected_spans``: supervised spans
      (``render_chat`` schema — char offsets, plus token offsets
      under ``token_mode``) restricted to COMPLETION assistant turns:
      a span survives only if it is non-empty AND ends past
      ``prompt_chars``, so prompt-context assistant turns stay masked
      and zero-length completion spans (empty content) are dropped —
      they contribute nothing to a loss mask.

    NULL completion arrays render as the bare prompt with no spans
    (``render_chat``'s NULL-array convention); downstream,
    :func:`filter_preference_pairs` drops such degenerate pairs.
    Pre-existing ``text`` / ``supervised_spans`` / ``n_tokens`` /
    ``turns_truncated`` columns survive untouched (``render_chat``
    would overwrite them; they are stashed around the renders).
    """
    mtype = df.schema[prompt_col].dataType
    # render_chat writes fixed column names — stash collisions
    stash = [
        c
        for c in ("text", "supervised_spans", "n_tokens", "turns_truncated")
        if c in df.columns
    ]
    for c in stash:
        df = df.withColumnRenamed(c, f"__pp_keep_{c}")

    def branch(out: DataFrame, comp_col: str, name: str) -> DataFrame:
        merged = F.concat(
            F.coalesce(F.col(prompt_col), F.array().cast(mtype)),
            F.coalesce(F.col(comp_col), F.array().cast(mtype)),
        )
        r = render_chat(
            out.withColumn("__pp_msgs", merged),
            "__pp_msgs",
            supervised_role,
            template=template,
            token_mode=token_mode,
            max_turns=max_turns,
            on_long=on_long,
        )
        # parsed SQL text — the Column lambda cost a ~20 ms HOF
        # registration per branch (the _litarr idiom, r15)
        spans = F.expr(
            "filter(supervised_spans, sp -> sp.`end` > prompt_chars"
            " AND sp.`end` > sp.start)"
        )
        r = r.withColumn(f"{name}_spans", spans).withColumnRenamed(
            "text", f"{name}_text"
        )
        if token_mode is not None:
            r = r.withColumnRenamed("n_tokens", f"{name}_tokens")
        drop = ["__pp_msgs", "supervised_spans"]
        if on_long == "truncate":
            r = r.withColumnRenamed(
                "turns_truncated", f"{name}_turns_truncated"
            )
        return r.drop(*drop)

    # prompt render: the sentinel role matches no real role, so the
    # span filter yields an empty array and the render gives the exact
    # prefix length both branches share
    p = render_chat(
        df,
        prompt_col,
        supervised_role="\x00__none__",
        template=template,
        token_mode=token_mode,
        max_turns=max_turns,
        on_long=on_long,
    )
    p = (
        p.withColumnRenamed("text", "prompt_text")
        .withColumn("prompt_chars", F.length("prompt_text"))
        .drop("supervised_spans")
    )
    if on_long == "truncate":
        p = p.withColumnRenamed("turns_truncated", "prompt_turns_truncated")
    if token_mode is not None:
        p = p.withColumnRenamed("n_tokens", "prompt_tokens")
    out = branch(p, chosen_col, "chosen")
    out = branch(out, rejected_col, "rejected")
    for c in stash:
        out = out.withColumnRenamed(f"__pp_keep_{c}", c)
    return out


def preference_report(
    pairs: DataFrame,
    min_completion_chars: int = 1,
    max_len_ratio: float | None = None,
) -> dict:
    """Pair-hygiene accounting in ONE aggregation job: how many pairs
    each :func:`filter_preference_pairs` rule would drop (rules
    overlap — a pair can be both identical and short — so the counts
    are per-rule incidence, and ``kept`` is the conjunction, exactly
    the filter's survivors). Keys: ``pairs``, ``identical``,
    ``chosen_empty``/``rejected_empty`` (below min chars),
    ``ratio_dropped`` (NULL-ratio pairs never trip it), ``kept``.
    Driver result is six longs — safe at any scale."""
    flags = filter_preference_pairs(
        pairs, min_completion_chars=0, drop_identical=False
    )
    mc = int(min_completion_chars)
    c_ok = F.col("pp_chosen_chars") >= mc
    r_ok = F.col("pp_rejected_chars") >= mc
    keep = c_ok & r_ok & ~F.col("pp_identical")
    if max_len_ratio is not None:
        ratio_bad = F.col("pp_len_ratio") > float(max_len_ratio)
        keep = keep & ~F.coalesce(ratio_bad, F.lit(False))
    else:
        ratio_bad = F.lit(False)
    row = flags.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(F.col("pp_identical").cast("long")).alias("identical"),
        F.sum((~c_ok).cast("long")).alias("chosen_empty"),
        F.sum((~r_ok).cast("long")).alias("rejected_empty"),
        F.sum(F.coalesce(ratio_bad, F.lit(False)).cast("long")).alias(
            "ratio_dropped"
        ),
        F.sum(keep.cast("long")).alias("kept"),
    ).first()
    return {k: int(row[k] or 0) for k in row.asDict()}


def preference_to_kto(
    pairs: DataFrame,
    id_col: str = "pair_id",
    drop_empty: bool = True,
) -> DataFrame:
    """Unpair rendered preference triples into KTO-style rows
    (Ethayarajh et al. 2024: binary desirable/undesirable feedback
    instead of paired comparison) — one row per (pair, side):
    ``(example_id, <id_col>, side, desirable, text,
    supervised_spans[, n_tokens])``, with ``example_id`` =
    ``"<id>:chosen"`` / ``"<id>:rejected"`` so rows stay unique and
    traceable to their pair.

    The schema deliberately matches ``chat_sft_rows`` output (text +
    supervised_spans [+ n_tokens]), so KTO rows feed straight into
    ``pack_sft_rows`` and the rest of the SFT chain. ``drop_empty``
    removes sides with no supervised span (NULL or empty completions
    render as the bare prompt — zero training signal). Two
    projections + a union: no shuffle, row-parallel at any scale.
    """
    has_tok = "chosen_tokens" in pairs.columns

    def side(name: str, desirable: bool) -> DataFrame:
        cols = [
            F.concat(
                F.col(id_col).cast("string"), F.lit(f":{name}")
            ).alias("example_id"),
            F.col(id_col),
            F.lit(name).alias("side"),
            F.lit(desirable).alias("desirable"),
            F.col(f"{name}_text").alias("text"),
            F.col(f"{name}_spans").alias("supervised_spans"),
        ]
        if has_tok:
            cols.append(F.col(f"{name}_tokens").alias("n_tokens"))
        out = pairs.select(*cols)
        if drop_empty:
            out = out.filter(F.size("supervised_spans") > 0)
        return out

    return side("chosen", True).unionByName(side("rejected", False))


def filter_preference_pairs(
    pairs: DataFrame,
    min_completion_chars: int = 1,
    max_len_ratio: float | None = None,
    drop_identical: bool = True,
) -> DataFrame:
    """Pair-hygiene gate over :func:`render_preference_pairs` output —
    the standard DPO data checks, each a documented flag column plus a
    final filter (flags kept so a report can count per-rule drops):

    - ``pp_identical``: chosen and rejected completions render
      identically (``chosen_text == rejected_text``; the prompt prefix
      is shared by construction, so this compares completions). Such
      a pair carries zero preference signal and its gradient is pure
      noise. Dropped when ``drop_identical``.
    - ``pp_chosen_chars`` / ``pp_rejected_chars``: supervised
      completion content length (sum of span widths). Either side
      below ``min_completion_chars`` drops the pair — an empty
      completion makes the logistic loss degenerate.
    - ``pp_len_ratio``: longer/shorter completion-char ratio (NULL
      when a side is empty). Pairs above ``max_len_ratio`` (when set)
      are dropped — gross length mismatch is the classic reward-hack
      confound (the model learns "longer wins", not quality). A NULL
      ratio is NOT dropped by this rule (it matches
      ``preference_report``'s ``ratio_dropped`` accounting exactly);
      a zero-char side is the ``min_completion_chars`` rule's job,
      and at ``min_completion_chars=0`` such pairs survive here too.
    """
    # parsed SQL text (the _litarr idiom, r15): the Column form
    # registered two HOF aggregate lambdas per call; same expressions
    def span_chars(col: str) -> str:
        return (
            f"aggregate(transform({col}, s -> s.`end` - s.start), 0,"
            " (acc, x) -> acc + x)"
        )

    out = pairs.withColumns(
        {
            "pp_chosen_chars": F.expr(span_chars("chosen_spans")),
            "pp_rejected_chars": F.expr(span_chars("rejected_spans")),
            "pp_identical": F.expr("(chosen_text = rejected_text)"),
        }
    ).withColumn(
        "pp_len_ratio",
        F.expr(
            "CASE WHEN pp_chosen_chars > 0 AND pp_rejected_chars > 0"
            " THEN round(cast(greatest(pp_chosen_chars,"
            " pp_rejected_chars) as double) / least(pp_chosen_chars,"
            " pp_rejected_chars), 6) END"
        ),
    )
    keep = (F.col("pp_chosen_chars") >= int(min_completion_chars)) & (
        F.col("pp_rejected_chars") >= int(min_completion_chars)
    )
    if drop_identical:
        keep = keep & ~F.col("pp_identical")
    if max_len_ratio is not None:
        # NULL ratio (zero-char side) must not NULL-out the whole
        # predicate: coalesce to "not ratio-dropped", mirroring
        # preference_report's ratio_dropped accounting.
        keep = keep & ~F.coalesce(
            F.col("pp_len_ratio") > float(max_len_ratio), F.lit(False)
        )
    return out.filter(keep)
