"""PII detection and redaction for training-data pipelines.

Pre-training corpora are scrubbed of obvious personally-identifiable
strings before use (the C4 / Dolma / RefinedWeb pipelines all carry a
regex-based PII pass): emails, IPv4 addresses, and phone-shaped digit
runs are counted per document and replaced with placeholder tokens.
Counts are detections on the RAW text, each pattern independently, while
redaction applies the patterns sequentially — so overlapping matches
(e.g. a digit run inside an email's local part) can count under two
patterns yet yield a single placeholder. Counts answer "what did we
detect", not "how many placeholders were emitted"; the driver oracle
replays both with the same convention.

The patterns are deliberately engine-portable — ASCII classes, bounded
quantifiers, no lookaround — so the SAME pattern string runs under
Spark's Java regex and an external SQL engine's RE2 (the driver oracle
replays counts AND the scrubbed text verbatim). Everything is a pure
column expression: JVM-side, codegen-friendly, zero shuffle, scans once.

Redaction order is part of the contract (email -> ip -> phone): a
pattern must never match inside an earlier placeholder, and the
placeholders contain no digits or '@' so they cannot.

No reference analogue (the reference has no text surface); this extends
the LLM-pipeline operator family in operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, placeholder) in REDACTION ORDER. Patterns are RE2- and
#: Java-regex compatible; keep them lookaround-free and ASCII-only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ()]{6,}\d", "<PHONE>"),
)


def scrub_text(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder, applied in
    ``PII_PATTERNS`` order."""
    out = text
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return out


def pii_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str,
    scrubbed_col: str = "scrubbed_text",
) -> DataFrame:
    """Count and redact PII per document.

    Output: ``id_col``, ``n_email``/``n_ip``/``n_phone`` (long; NULL for
    NULL text), ``n_pii_total``, and ``scrubbed_col`` (the redacted text;
    NULL text stays NULL). Documents with ``n_pii_total = 0`` carry their
    text unchanged — byte-identical, so the scrub is safe to apply
    unconditionally and idempotently (placeholders contain nothing any
    pattern can match).
    """
    raw = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        for _, pat, _ in PII_PATTERNS
    ]
    total = raw[0]
    for c in raw[1:]:
        total = total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for c, (name, _, _) in zip(raw, PII_PATTERNS)],
        total.alias("n_pii_total"),
        scrub_text(F.col(text_col)).alias(scrubbed_col),
    )
