"""PII detection + redaction (north-star extension).

The scrub pass every training-data pipeline runs before release
(Dolma, RedPajama, BigScience ROOTS all ship one): find personally-
identifying spans — emails, IP addresses, long digit runs (phone /
account / SSN-shaped) — count them, and rewrite the text with typed
placeholder tags so downstream stages keep sentence structure.

Pure column expressions — regexp_extract_all for counts,
regexp_replace for rewrite — whole-stage codegen, map-only, no
shuffle, no UDF. The patterns stay inside the syntax subset shared by
Java regex (Spark) and RE2 (DuckDB) so the oracle twin is a literal
transcription: character classes, bounded repeats, ``\\b`` word
boundaries; no lookaround, no backreferences.

Redaction order is fixed (email -> ip -> digit-run) and matters only
for nested matches: emails may contain digit runs, so emails are
rewritten first; IPv4 octet groups are 1-3 digits and cannot trigger
the >=6 digit-run rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement tag), applied in order.
PII_RULES = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("digits", r"\b\d{6,}\b", "<NUM>"),
]


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_count(text: Column | str, rule: str) -> Column:
    """Match count for one rule name, on the ORIGINAL text."""
    pat = {n: p for n, p, _ in PII_RULES}[rule]
    return F.size(F.regexp_extract_all(_col(text), F.lit(pat), F.lit(0))).cast("long")


def pii_redact(text: Column | str) -> Column:
    """Text with every rule's matches replaced by its tag, in rule
    order (each replace is global; Spark regexp_replace replaces all
    occurrences — the oracle twin needs DuckDB's 'g' flag)."""
    c = _col(text)
    for _, pat, tag in PII_RULES:
        c = F.regexp_replace(c, pat, tag)
    return c
