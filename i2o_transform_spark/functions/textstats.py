"""Text analysis for training-data pipelines: tokenization, language ID,
quality scoring, fingerprinting.

These extend the reference's scalar-function surface (SURVEY.md §2.7) to the
operations a web-scale corpus pipeline needs.  All pure built-in column
expressions (whole-stage codegen); the oracle SQL mirrors each formula.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker sets for the n-gram/stopword language heuristic.
# Frozen; the oracle SQL embeds the same lists.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "un"),
    "de": ("der", "die", "und", "das", "ein"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (empty-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.trim(c), r"\s+"), lambda t: F.length(t) > 0)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: count of word / punctuation units via
    regexp_extract_all — the standard cheap proxy for LLM token counts.
    (Extraction, not lookaround splitting: RE2-based engines — incl. the
    DuckDB oracle — have no lookbehind.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"\w+|[^\w\s]"), F.lit(0)))


def language_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts over whitespace tokens (lowercased)."""
    toks = F.transform(tokens(col), F.lower)

    def _hits(markers: tuple[str, ...]):
        return lambda t: t.isin(*markers)

    return {
        lang: F.size(F.filter(toks, _hits(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(col: Column | str, default: str = "en") -> Column:
    """Argmax language by marker hits; deterministic alphabetical tie-break;
    ``default`` when no marker hits at all."""
    scores = language_scores(col)
    langs = sorted(scores)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    # iterate in reverse-alphabetical order so that on ties the
    # alphabetically-first language wins (strict > comparison).
    for lang in reversed(langs):
        cond = scores[lang] > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best_lang


def quality_columns(col: Column | str) -> dict[str, Column]:
    """Quality-scoring features: length, token count, punctuation ratio,
    stopword ratio, mean word length.  Formulae mirrored in oracle SQL."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_stop = F.size(F.filter(F.transform(toks, F.lower), lambda t: t.isin(*STOPWORDS)))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6),
        "mean_word_len": F.round(
            (n_chars - (n_tokens - 1)) / F.greatest(n_tokens, F.lit(1)), 6
        ),
    }


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalized,
    lowercased text.  (md5 rather than xxhash64 so the DuckDB oracle can
    reproduce it bit-for-bit.)"""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))
    return F.md5(normalized)
