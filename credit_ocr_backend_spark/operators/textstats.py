"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting — the per-document text metrics a
training-data pipeline filters on. Pure built-ins, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram heuristic.
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "en": ["the", "and", "is", "of", "to", "in", "that"],
    "es": ["el", "la", "los", "que", "de", "es", "una"],
    "fr": ["le", "la", "les", "et", "est", "une", "que"],
}

BPE_ISH_RE = r"[A-Za-zÀ-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÿ0-9]"


def _marker_hits(text: Column, lang: str) -> Column:
    pattern = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), 0))


def lang_scores(text: Column | str) -> dict[str, Column]:
    c = F.col(text) if isinstance(text, str) else text
    return {lang: _marker_hits(c, lang) for lang in LANG_MARKERS}


def predicted_lang(text: Column | str) -> Column:
    """argmax over marker-hit counts; deterministic tie-break by the
    fixed language order; 'unknown' when nothing matches."""
    expr = F.lit("unknown")
    best_score = F.lit(0)
    for lang, score in lang_scores(text).items():
        expr = F.when(score > best_score, F.lit(lang)).otherwise(expr)
        best_score = F.greatest(best_score, score)
    return expr


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.split(F.trim(c), r"\s+"))


def token_count_bpeish(text: Column | str) -> Column:
    """BPE-ish regex token count: letter runs, digit runs, single
    punctuation marks."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0))


def quality_features(text: Column | str) -> dict[str, Column]:
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    n_tokens = token_count_ws(c)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[.,;:!?]"), 0))
    n_stop = _marker_hits(c, "en") + _marker_hits(c, "de")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 4),
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6),
    }


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score from length/punct/stopword
    features (monotone, deterministic; weights are engine policy)."""
    f = quality_features(text)
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(f["stopword_ratio"] * 5, F.lit(1.0))
    punct_pen = F.when(f["punct_ratio"] > 0.2, F.lit(0.5)).otherwise(F.lit(1.0))
    return F.round((0.6 * length_term + 0.4 * stop_term) * punct_pen, 6)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text (stable under formatting jitter)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


def document_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    feats = quality_features(text_col)
    return df.select(
        F.col(id_col),
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        token_count_bpeish(text_col).alias("n_bpe_tokens"),
        predicted_lang(text_col).alias("pred_lang"),
        quality_score(text_col).alias("quality"),
        fingerprint(text_col).alias("fp"),
    )
