"""Custom join operators Spark lacks as built-ins.

``asof_join`` is the time-series "most recent matching row" join
(reference has no theta/as-of joins — SURVEY.md §2.6 "join types NOT
present" — but a training-data pipeline joining event streams to
slowly-changing dimensions needs it).

Scale design: the naive formulation is a range join (``l.key = r.key
AND r.t <= l.t`` + window max) whose candidate set explodes with time
span. Instead we use the union + ordered-window plan: tag both sides,
union them, and run ``last(payload, ignorenulls)`` over a window
partitioned by key and ordered by time. One shuffle + sort keyed by
(key), zero row blowup, no broadcast requirement — survives 100 TB on
both sides. Skewed keys behave like any window (AQE handles the
shuffle; a hot key serializes its own partition only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def point_in_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    on: str | list[str] | None = None,
    include_end: bool = False,
) -> DataFrame:
    """Range join: each left row pairs with every right row whose
    interval ``[right_start, right_end)`` (or ``[..., ...]`` with
    ``include_end``) contains ``left_point``; optional extra equi-keys
    via ``on``.

    Scale path: a bare inequality join plans as BroadcastNestedLoop /
    cartesian — O(n*m). Instead both sides are bucketed into time bins
    of ``bin_width`` (same unit as the point/bounds columns): a right
    interval is exploded to the bins it spans, the join is an EQUI-join
    on bin (+ keys), and the exact containment predicate filters the
    bin-collisions. Shuffle volume is O(left + right * avg_span/width);
    pick ``bin_width`` ≈ the typical interval length so intervals span
    ~2 bins. Each (left, right) pair meets in exactly one bin (the
    left point's), so no post-join dedup is needed.
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    lp = F.col(left_point)
    rs, re_ = F.col(right_start), F.col(right_end)
    w = F.lit(int(bin_width))

    def _bin(c):
        # decimal division, not double: nanosecond epoch longs exceed
        # double's exact-integer range and a lossy floor mis-bins
        # boundary rows
        return F.floor(c.cast("decimal(38,9)") / w).cast("long")

    lb = left.withColumn("__bin", _bin(lp))
    rb = right.withColumn(
        "__bin", F.explode(F.sequence(_bin(rs), _bin(re_)))
    )
    exact = (rs <= lp) & ((lp <= re_) if include_end else (lp < re_))
    return lb.join(rb, ["__bin", *keys]).filter(exact).drop("__bin")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str | Column,
    right_time: str | Column,
    direction: str = "backward",
    suffix: str = "",
    tiebreak: str | None = None,
    tolerance: int | float | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    ``right_time <= left_time`` (direction="backward") or smallest
    ``right_time >= left_time`` ("forward") within the same ``on`` key.

    Left rows with no match keep nulls for the right columns (left
    outer semantics, like DuckDB/pandas ASOF). A right row whose time
    equals the left time DOES match.

    Right-side payload = every right column except the key(s); name
    collisions with left columns get ``suffix`` appended. When several
    right rows share the winning time, ``tiebreak`` (a right column
    name) makes the choice deterministic: backward picks the max
    tiebreak, forward the min; without it the winner among exact
    time-ties is plan-dependent.

    ``tolerance`` (same units as the time axis) nulls out a match
    whose time gap exceeds it — pandas ``merge_asof(tolerance=...)``
    semantics; the match is rejected, not replaced by an older one.
    Evaluated post-window from the carried match time, so it adds no
    shuffle.
    """
    # decimal(38,9), not double: nanosecond epoch longs (~1.7e18)
    # exceed double's 2^53 exact-integer range; a lossy cast can flip
    # >=/< at exact-boundary matches. decimal holds any int64 and any
    # microsecond timestamp exactly and stays orderable.
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = [on] if isinstance(on, str) else list(on)
    lt = F.col(left_time) if isinstance(left_time, str) else left_time
    rt = F.col(right_time) if isinstance(right_time, str) else right_time

    payload = [c for c in right.columns if c not in keys]
    renames = {
        c: c + suffix if c in left.columns and c not in keys else c
        for c in payload
    }

    l_tag = left.select(
        *[F.col(k) for k in keys],
        lt.cast("decimal(38,9)").alias("__t"),
        F.lit(None).cast("decimal(38,9)").alias("__tb"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c).alias(renames[c]) for c in payload]).alias(
                    "s"
                )
            ).schema["s"].dataType
        ).alias("__rrow"),
    )
    r_tag = right.select(
        *[F.col(k) for k in keys],
        rt.cast("decimal(38,9)").alias("__t"),
        (
            F.col(tiebreak).cast("decimal(38,9)")
            if tiebreak
            else F.lit(None).cast("decimal(38,9)")
        ).alias("__tb"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType
        ).alias("__lrow"),
        F.struct(*[F.col(c).alias(renames[c]) for c in payload]).alias(
            "__rrow"
        ),
    )
    u = l_tag.unionByName(r_tag)

    # Backward: order ascending; at equal times right rows sort FIRST
    # (__is_left asc) so an exactly-simultaneous right row is visible.
    # Forward: mirror by descending time, right still first.
    if direction == "backward":
        order = [
            F.col("__t").asc(),
            F.col("__is_left").asc(),
            F.col("__tb").asc_nulls_first(),
        ]
    else:
        order = [
            F.col("__t").desc(),
            F.col("__is_left").asc(),
            F.col("__tb").desc_nulls_first(),
        ]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win_cols = {"__m": F.last(F.col("__rrow"), ignorenulls=True).over(w)}
    if tolerance is not None:
        # matched right row's time, carried through the SAME window
        # spec (one sort, both expressions in one window pass)
        win_cols["__mt"] = F.last(
            F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True
        ).over(w)
    matched = u.withColumns(win_cols).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        matched = matched.withColumn(
            "__m",
            F.when(
                F.abs(F.col("__t") - F.col("__mt")) <= F.lit(tolerance),
                F.col("__m"),
            ),
        )

    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__m.{renames[c]}").alias(renames[c]) for c in payload
    ]
    return matched.select(*out_cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with explicit key salting for EXTREME skew — the
    fallback when AQE's skew-join splitting is not enough (one key
    holding a double-digit percentage of a 100 TB fact table still
    lands its post-split shuffle blocks on few reducers, and skew
    splitting only applies to sort-merge joins).

    The skewed LEFT side gets a random salt in [0, salt); the RIGHT
    side is replicated ``salt`` times via an inline explode so every
    (key, salt) bucket finds its match. Join cardinality and result
    are unchanged; the hot key's rows spread over ``salt`` reducers.
    Replication multiplies the right side — use for dimension-sized
    right tables (if both sides are huge AND skewed, range-partition
    the hot keys out instead).

    The salt is a DETERMINISTIC hash of the left row's columns — never
    ``rand()``: a nondeterministic shuffle key makes the map stage
    indeterminate under task retry (recomputed rows land in different
    reduce partitions than already-fetched outputs, forcing full-stage
    rollback at best). Rows identical in every column share a salt,
    which only matters if the hot key's rows are also byte-identical.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        # right/full-outer would emit `salt` copies of unmatched
        # right rows — salt the other side instead
        raise ValueError(f"salted_join does not support how={how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    l_salted = left.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
        ).cast("int"),
    )
    r_rep = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l_salted.join(r_rep, keys + ["__salt"], how)
    return out.drop("__salt")
