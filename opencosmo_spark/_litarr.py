"""Fast literal double-array construction.

``F.array(*[F.lit(float(x)) for x in xs])`` costs one py4j round-trip
per element (~1 ms each): an operator that embeds a few 64-dim
centroid/hyperplane vectors spends SECONDS of pure driver time just
building its expression tree (measured ~68 ms per 64-element array vs
0.7 ms via one parsed SQL literal — ~95x). Every query re-pays this on
every run, and it is serial driver work that no cluster size hides
(guide §5: the driver should do almost no data work — including
expression-building busywork).

``lit_double_array`` builds the identical Column (non-null
array<double> literal) with ONE py4j call by rendering the SQL
``array(...)`` literal as text. ``repr(float)`` is the shortest
round-trip decimal form, and Java's ``Double.parseDouble`` of that
form recovers the identical IEEE-754 bits, so values are bit-equal to
the ``F.lit`` path (cross-checked in tests). Non-finite values have no
SQL literal form and fall back to the per-element path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F


def lit_double_array(values) -> Column:
    """A literal ``array<double>`` Column, bit-identical to
    ``F.array(*[F.lit(float(v)) for v in values])`` but built with one
    py4j round-trip instead of one per element."""
    vals = [float(v) for v in values]
    if not vals or not all(math.isfinite(v) for v in vals):
        return F.array(*[F.lit(v) for v in vals])
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def lit_long_array(values) -> Column:
    """A literal ``array<bigint>`` Column in one py4j round-trip (the
    integer twin of ``lit_double_array``; every element is rendered
    with the SQL ``L`` suffix so the array type never depends on
    element magnitudes)."""
    vals = [int(v) for v in values]
    if not vals:
        return F.array().cast("array<bigint>")
    return F.expr("array(" + ",".join(f"{v}L" for v in vals) + ")")
