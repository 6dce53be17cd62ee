"""PII detection and redaction over text columns.

Pre-training corpora are routinely scrubbed of emails / IPs / phone
numbers before release (C4, The Pile, RefinedWeb all document this step).
Everything here is JVM-side ``regexp_extract_all`` / ``regexp_replace``
column expressions — a 100 TB scrub pass stays in whole-stage codegen
with zero shuffles (it's a pure projection; write back out partitioned
exactly as read).

Pattern discipline: RE2-compatible syntax only (no lookarounds, no
backrefs) so the same pattern string runs identically on Spark (Java
regex), DuckDB (RE2), and most other engines an oracle might use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered: emails first (contain dots + digits), then IPv4 (dots), then
# bare phone patterns — later patterns can't match inside an earlier
# pattern's replacement token
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}-\d{4}\b",
}


def pii_count_exprs(col: Column | str) -> dict[str, Column]:
    """Occurrence counts per PII class: ``{"email": Column, ...}``."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("bigint")
            for name, pat in PII_PATTERNS.items()}


def pii_redact_expr(col: Column | str) -> Column:
    """Text with every PII match replaced by its ``<CLASS>`` token, applied
    in ``PII_PATTERNS`` order."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return c


def scrub_pii(df, text_col: str = "text"):
    """``df`` with ``text_col`` redacted in place plus per-class
    ``n_<class>`` count columns (counted before redaction)."""
    counts = pii_count_exprs(text_col)
    out = df
    for name, expr in counts.items():
        out = out.withColumn(f"n_{name}", expr)
    return out.withColumn(text_col, pii_redact_expr(text_col))
