"""Text-analysis column functions — all JVM-side Catalyst expressions.

Every function here returns a Column built from pyspark.sql.functions only
(no Python UDFs), so they vectorize inside whole-stage codegen and each has
an exactly-equivalent ANSI-SQL twin for the DuckDB oracle (see
``__spark_entry__.py``): language-ID and quality scoring are deterministic
arithmetic over regexp match counts, fingerprinting is sha256 over
whitespace-normalized text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker words per language, priority order breaks ties deterministically.
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", r"\b(the|and|of|to|is|in|that|it)\b"),
    ("de", r"\b(der|die|das|und|ist|nicht|ein|zu)\b"),
    ("fr", r"\b(le|la|les|et|est|une|que|pour)\b"),
    ("es", r"\b(el|los|las|es|una|que|por|para)\b"),
    ("zh", r"[一-鿿]"),
]

STOPWORD_RE = r"\b(the|a|an|and|or|of|to|is|in|on|that|it|as|for|with)\b"
PUNCT_RE = r"[\.,;:!\?\"'\(\)\[\]\{\}-]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed, lowercased text."""
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_count(col: Column | str) -> Column:
    c = F.trim(col)
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(F.size(F.split(c, r"\s+")))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: splits on word/number/punct boundaries the
    way byte-pair tokenizers roughly segment — a cheap, deterministic proxy
    for LLM token budgeting over 100 TB of text."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))


def _marker_count(col: Column | str, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), 0))


def lang_scores(col: Column | str) -> dict[str, Column]:
    return {lang: _marker_count(col, pat) for lang, pat in LANG_MARKERS}


def lang_id(col: Column | str) -> Column:
    """Argmax language by marker-word count; priority-ordered WHEN chain so
    ties resolve to the earlier language in LANG_MARKERS; no markers → 'und'.
    """
    scores = lang_scores(col)
    langs = [lang for lang, _ in LANG_MARKERS]
    total = None
    for c in scores.values():
        total = c if total is None else total + c
    # Priority CASE chain: lang_i wins if it ties-or-beats every LATER
    # language (falling past lang_j implies some later language strictly
    # beats lang_j, so the eventual winner is the global argmax with ties
    # to the earliest language).
    expr = F.when(total == 0, F.lit("und"))
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for other in langs[i + 1 :]:
            ge = scores[lang] >= scores[other]
            cond = ge if cond is None else cond & ge
        expr = expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(langs[-1]))


def stopword_ratio(col: Column | str) -> Column:
    n = token_count(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        _marker_count(col, STOPWORD_RE).cast("double") / n
    )


def punct_ratio(col: Column | str) -> Column:
    ln = F.length(col)
    return F.when(ln == 0, F.lit(0.0)).otherwise(
        F.size(F.regexp_extract_all(col, F.lit(PUNCT_RE), 0)).cast("double") / ln
    )


def mean_token_len(col: Column | str) -> Column:
    n = token_count(col)
    compact = F.length(F.regexp_replace(F.trim(col), r"\s+", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(compact.cast("double") / n)


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1]-ish quality heuristic: favors mid-length docs with
    real-word structure, penalizes punctuation soup.  Weights are arbitrary
    but FIXED — the DuckDB oracle reproduces them digit-for-digit."""
    n = token_count(col).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    mtl = mean_token_len(col)
    word_term = F.when((mtl >= 3.0) & (mtl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        F.lit(0.4) * length_term
        + F.lit(0.3) * word_term
        + F.lit(0.2) * stopword_ratio(col)
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio(col) * 5.0, F.lit(1.0))),
        6,
    )


def fingerprint(col: Column | str) -> Column:
    """Normalization fingerprint: sha256 of lowercased, whitespace-collapsed
    text — the exact-dedup key."""
    return F.sha2(F.regexp_replace(F.trim(F.lower(col)), r"\s+", " "), 256)
