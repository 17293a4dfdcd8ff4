"""PII redaction — scrub emails / IPs / phone numbers / SSNs / card
numbers from a text corpus before training.

Every production pretraining pipeline (C4, Dolma, RefinedWeb) runs a
regex-scrub pass; the reference has no redaction operator, so this
extends the training-data surface the same way the dedup/quality
modules do. Design constraints:

- **Codegen-only**: a chain of ``regexp_replace`` calls — no Python
  workers, no shuffle, a pure scan-level map that fuses into whatever
  stage reads the text. At 100 TB this runs at scan speed.
- **Engine-portable patterns**: every built-in rule is written in the
  common subset of Java regex (Spark) and RE2 (DuckDB/Go) — no
  backreferences, no lookaround — so oracles can replay the exact
  rule chain with ``regexp_replace(..., 'g')``.
- **Order matters** and is part of the contract: structured long
  patterns first (card, SSN, phone) so a card number is never
  half-eaten by the shorter phone rule, then email, then IPv4.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RedactRule:
    name: str
    pattern: str
    replacement: str


# The default rule chain, applied in listed order.
DEFAULT_RULES: tuple[RedactRule, ...] = (
    RedactRule(
        "credit_card", r"\b(?:\d{4}[- ]){3}\d{4}\b", "<CREDIT_CARD>"
    ),
    RedactRule("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    RedactRule("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    RedactRule(
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    RedactRule("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def redact_pii(
    text: Column, rules: tuple[RedactRule, ...] = DEFAULT_RULES
) -> Column:
    """Apply the rule chain to ``text``; returns the scrubbed column.

    Spark's ``regexp_replace`` is replace-all, so one call per rule.
    """
    out = text
    for r in rules:
        out = F.regexp_replace(out, r.pattern, r.replacement)
    return out


def pii_counts(
    text: Column, rules: tuple[RedactRule, ...] = DEFAULT_RULES
) -> list[Column]:
    """Per-rule match-count columns (named ``n_<rule>``): the audit
    signal a scrub pass reports. Counts are taken against the
    *partially scrubbed* text in chain order — identical semantics to
    what :func:`redact_pii` actually removes (an SSN already swallowed
    by the card rule is not double-counted by the SSN rule)."""
    cols = []
    cur = text
    for r in rules:
        cols.append(F.regexp_count(cur, F.lit(r.pattern)).alias(f"n_{r.name}"))
        cur = F.regexp_replace(cur, r.pattern, r.replacement)
    return cols


def redact_corpus(
    df: DataFrame,
    text_col: str,
    rules: tuple[RedactRule, ...] = DEFAULT_RULES,
    with_counts: bool = True,
) -> DataFrame:
    """Scrub ``text_col`` in place, optionally appending per-rule
    ``n_<rule>`` audit counts. Pure projection — no shuffle."""
    cols = [c for c in df.columns if c != text_col]
    out = [
        *[F.col(c) for c in cols],
        redact_pii(F.col(text_col), rules).alias(text_col),
    ]
    if with_counts:
        out.extend(pii_counts(F.col(text_col), rules))
    return df.select(*out)


# --- markup stripping (C4/Dolma-style HTML -> text cleaning) --------
#
# Same design constraints as the PII chain: codegen-only
# regexp_replace cascade in the Java-regex ∩ RE2 subset (inline (?s)
# and non-greedy quantifiers are in both; no lookaround), so the
# exact chain replays in DuckDB with the 'g' flag. Order is part of
# the contract: container blocks (script/style) go first so their
# contents never leak as text, then comments, then block tags to
# newline, then every remaining tag, then entities, then whitespace.

STRIP_MARKUP_RULES: tuple[tuple[str, str], ...] = (
    (r"(?s)<script\b.*?</script\s*>", " "),
    (r"(?s)<style\b.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)</?(?:p|div|br|li|tr|h[1-6])\b[^>]*>", "\n"),
    (r"(?s)<[^>]*>", " "),
    (r"&nbsp;", " "),
    (r"&amp;", "&"),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", "\""),
    (r"&#39;", "'"),
    (r"[ \t\r\f]+", " "),
    (r" ?\n[ \n]*", "\n"),
)


def strip_markup(text: Column) -> Column:
    """HTML/markup -> plain text: the boilerplate-removal first pass
    of a web-corpus pipeline (C4 keeps text, drops tags/scripts).
    A fixed ``regexp_replace`` cascade — scan-speed codegen, no UDF;
    heuristic by design (a full HTML5 parser is not expressible as
    regex and not needed for corpus text extraction)."""
    out = text
    for pat, repl in STRIP_MARKUP_RULES:
        out = F.regexp_replace(out, pat, repl)
    return F.trim(out)


def strip_markup_sql(col: str) -> str:
    """The identical cascade as one nested DuckDB expression."""
    out = col
    for pat, repl in STRIP_MARKUP_RULES:
        sq = pat.replace("'", "''")
        rq = repl.replace("'", "''").replace("\n", "' || chr(10) || '")
        out = f"regexp_replace({out}, '{sq}', '{rq}', 'gs')"
    return f"trim({out})"
