"""PII detection and redaction for training corpora.

Regex-based scrubbing of the classic identifier families (emails, IPv4
addresses, US-style SSNs, phone numbers) — the pre-training
privacy pass (e.g. the BigScience ROOTS / StarCoder pipelines).

Scale design: pure JVM ``regexp_count`` / ``regexp_replace`` — no
Python in the row path, embarrassingly parallel, no shuffle; the
patterns are deliberately RE2-compatible (no backreferences or
lookaround) so the same semantics hold in Java's engine, RE2-based
engines, and the DuckDB oracle, and so the scan stays linear-time on
adversarial inputs (Java backtracking can go exponential; RE2-safe
patterns cannot).

Redaction order is part of the contract: emails first (so their
digits cannot later match number patterns), then IPs, then SSNs, then
phones — the same fixed order every engine applies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (name, pattern, replacement) in application order. \b is ASCII word
# boundary in both Java regex and RE2. SSN must precede phone: both
# are hyphenated digit runs, but the group shapes (3-2-4 vs 3-3-4)
# are disjoint, so order between those two is cosmetic; email MUST
# come first (an address's local part can contain digit runs).
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ip",
        r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b\d{3}-\d{2}-\d{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b\d{3}[- ]\d{3}[- ]\d{4}\b",
        "<PHONE>",
    ),
]


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-family match counts (``n_email``, ``n_ip``, ``n_ssn``,
    ``n_phone``) for one text column. Counts are taken on the
    progressively-redacted text exactly as redaction would see it, so
    ``n_phone`` never double-counts an SSN and no count includes text
    inside an already-redacted earlier family.
    """
    c = F.col(text) if isinstance(text, str) else text
    out: dict[str, Column] = {}
    for name, pat, repl in PII_PATTERNS:
        out[f"n_{name}"] = F.regexp_count(c, F.lit(pat))
        c = F.regexp_replace(c, pat, repl)
    return out


def redact_pii(text: Column | str) -> Column:
    """The redacted text: every PII family replaced by its
    ``<TOKEN>`` in the fixed application order."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    keep_original: bool = False,
) -> DataFrame:
    """Attach per-family counts and overwrite ``text_col`` with the
    redacted text (set ``keep_original`` to keep it as
    ``<text_col>_raw``)."""
    counts = pii_counts(F.col(text_col))
    out = df.withColumns(counts)
    if keep_original:
        out = out.withColumn(f"{text_col}_raw", F.col(text_col))
    return out.withColumn(text_col, redact_pii(F.col(text_col)))


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    salt: str,
    keep_bits: int = 60,
) -> DataFrame:
    """Replace identifier columns with salted one-way hashes — the
    pseudonymization step privacy reviews require before user-keyed
    data enters a training corpus. Same input + salt always maps to
    the same token (joins and groupBys on the pseudonym still work,
    across tables and runs); without the salt the mapping is not
    reversible by rainbow table.

    Each column becomes ``md5(value || ':' || salt)`` truncated to
    ``keep_bits`` as a BIGINT (the md5-lane idiom — engine-portable
    and join-friendly). NULLs stay NULL. Pure projection: no shuffle,
    no UDF, pushes through column pruning.
    """
    from .dedup import md5_lane

    if not salt:
        raise ValueError("a non-empty salt is required")
    hexlen = max(1, min(15, keep_bits // 4))
    out = df
    for c in cols:
        lane = md5_lane(
            F.concat(F.col(c).cast("string"), F.lit(":" + salt)),
            hex_digits=hexlen,
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNull(), F.lit(None).cast("long")).otherwise(lane)
        )
    return out
