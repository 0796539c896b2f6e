"""Text-analysis column functions: tokenization, quality ratios, language ID.

All built from ``pyspark.sql.functions`` (JVM-side, codegen-friendly) —
the UDF-free fast path. The reference's scalar surface (SURVEY §2.9,
``simpleOpenEncoding.scala:451-499``) covers concat/contains/case/regex;
these extend it with the training-pipeline vocabulary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: small closed-class stopword list shared with oracles — keep in sync with
#: queries/text.py oracle SQL.
STOPWORDS = ["the", "a", "an", "of", "to", "in", "and", "is", "it", "for"]

_PUNCT_CLASS = "[.,;:!?'\"]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (empty strings preserved;
    filter downstream)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Number of non-empty whitespace tokens."""
    return F.size(F.filter(tokens(text), lambda t: t != ""))


def punct_chars(text: Column) -> Column:
    """Exact count of punctuation characters — the integer numerator of
    ``punct_ratio``. Preferred in hashed/gated output: integer arithmetic
    is bit-identical across engines where rounded doubles are not."""
    stripped = F.regexp_replace(text, _PUNCT_CLASS, "")
    return F.length(text) - F.length(stripped)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    return punct_chars(text).cast("double") / F.length(text)


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords (lowercased match)."""
    toks = F.filter(tokens(F.lower(text)), lambda t: t != "")
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return stop.cast("double") / F.greatest(F.size(toks), F.lit(1))


#: marker-token tables for the n-gram/marker language-ID heuristic.
#: Deterministic and oracle-expressible (no model, no UDF).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "es": ["el", "la", "que", "es"],
    "fr": ["le", "la", "et", "est"],
    "zh": ["de", "shi", "le", "zai"],
}


def marker_hits(text: Column, markers: list[str]) -> Column:
    """Count of tokens matching any marker word."""
    toks = F.filter(tokens(F.lower(text)), lambda t: t != "")
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


#: GPT-2-style pre-tokenization classes: alpha runs, digit runs, single
#: non-space symbols — the deterministic, oracle-expressible core of BPE
#: tokenizers (the learned merges happen downstream on these chunks).
BPE_PRETOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_pretokens(text: Column) -> Column:
    """array<string> of BPE-style pre-token chunks."""
    return F.regexp_extract_all(text, F.lit(BPE_PRETOKEN_PATTERN), F.lit(0))


def rolling_hash(text: Column, width: int = 16) -> Column:
    """Deterministic document fingerprint over normalized content."""
    normalized = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(normalized), 1, width)
