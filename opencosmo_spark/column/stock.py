"""Stock derived-column builders.

Parity target: reference ``python/opencosmo/column/stock.py``
(norm_cols :121-152, offset_3d :28-74, add_mag_cols :77-118). Pure
expression composition — no UDFs, fully codegen'd by Catalyst.
"""

from __future__ import annotations

from .expr import ColumnExpr, col, wrap


def norm_cols(*columns: str | ColumnExpr) -> ColumnExpr:
    """Euclidean norm of N columns: sqrt(sum(c_i^2))."""
    if not columns:
        raise ValueError("norm_cols needs at least one column")
    exprs = [col(c) if isinstance(c, str) else wrap(c) for c in columns]
    acc = exprs[0] * exprs[0]
    for e in exprs[1:]:
        acc = acc + e * e
    return acc.sqrt()


def offset_3d(
    a: tuple[str, str, str] | list[str],
    b: tuple[str, str, str] | list[str],
) -> ColumnExpr:
    """Distance between two 3-D coordinate triples: ||A - B||."""
    if len(a) != len(b):
        raise ValueError("coordinate triples must have equal length")
    diffs = [col(x) - col(y) for x, y in zip(a, b)]
    return norm_cols(*diffs)


def add_mag_cols(*mags: str | ColumnExpr) -> ColumnExpr:
    """Astronomical magnitude addition via flux space:
    -2.5*log10(sum(10^(-0.4*m_i)))."""
    if not mags:
        raise ValueError("add_mag_cols needs at least one column")
    exprs = [col(m) if isinstance(m, str) else wrap(m) for m in mags]
    flux = (exprs[0] * -0.4).exp10()
    for e in exprs[1:]:
        flux = flux + (e * -0.4).exp10()
    return flux.log10() * -2.5
