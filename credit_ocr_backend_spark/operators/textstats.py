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


# ---------------------------------------------------------------------------
# Corpus-frequent line removal (CCNet/RefinedWeb-style boilerplate strip)
# ---------------------------------------------------------------------------


def line_hash(line: Column) -> Column:
    """Normalization + hash under which two lines count as 'the same
    boilerplate': lowercase, whitespace-collapsed, md5. Shared by the
    counting and the filtering pass so they can never disagree."""
    return F.md5(F.regexp_replace(F.trim(F.lower(line)), r"\s+", " "))


def frequent_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    scope_col: str | None = None,
) -> DataFrame:
    """Lines (newline-split) that appear in ≥ ``min_docs`` DISTINCT
    documents — navigation chrome, cookie banners, footers: the
    line-level boilerplate a Common-Crawl pipeline strips before
    training (CCNet's paragraph-dedup idea at line granularity).

    ``scope_col`` (e.g. a host column) counts within that scope —
    at 10^12 docs per-host scoping keeps the groupBy key space
    partitionable and matches how boilerplate actually repeats.

    Returns (scope?, lhash, n_docs). Plan shape: one explode + one
    distinct + one partial-aggregated groupBy on (scope, lhash) —
    no joins, corpus scanned once."""
    scope = [F.col(scope_col)] if scope_col else []
    exploded = docs.select(
        *scope,
        F.col(id_col).alias("_doc"),
        F.explode(F.split(F.col(text_col), "\n")).alias("_line"),
    ).where(F.trim(F.col("_line")) != "")
    return (
        exploded.select(*scope, "_doc", line_hash(F.col("_line")).alias("lhash"))
        .distinct()  # count DOCUMENTS, not occurrences within one doc
        .groupBy(*scope, "lhash")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    scope_col: str | None = None,
) -> DataFrame:
    """Strip corpus-frequent lines from every document and reassemble
    the text in original line order. Returns
    (id, cleaned_text, n_lines_kept, n_lines_dropped).

    Plan shape at scale: posexplode (line order key) → left-anti-ish
    membership via a join against the (small relative to the corpus)
    frequent-line set on (scope?, lhash) → per-doc ordered
    re-assembly with array_sort(collect_list(struct(pos, line))) —
    one explode, one equi-join that AQE can broadcast when the
    frequent set is small, one groupBy(doc). A dropped-to-empty
    document yields cleaned_text = '' (kept, so downstream quality
    filters see it rather than the row silently vanishing)."""
    freq = frequent_lines(docs, id_col, text_col, min_docs, scope_col)
    scope = [F.col(scope_col)] if scope_col else []
    lines = docs.select(
        *scope,
        F.col(id_col).alias("_doc"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("lhash", line_hash(F.col("_line")))
    join_keys = ([scope_col] if scope_col else []) + ["lhash"]
    marked = lines.join(
        freq.withColumn("_freq", F.lit(True)).select(*join_keys, "_freq"),
        on=join_keys,
        how="left",
    )
    kept = F.sum(F.when(F.col("_freq").isNull(), 1).otherwise(0))
    dropped = F.sum(F.when(F.col("_freq").isNotNull(), 1).otherwise(0))
    return (
        marked.groupBy("_doc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_freq").isNull(),
                                F.struct(F.col("_pos"), F.col("_line")),
                            )
                        )
                    ),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("cleaned_text"),
            kept.cast("int").alias("n_lines_kept"),
            dropped.cast("int").alias("n_lines_dropped"),
        )
        .select(
            F.col("_doc").alias(id_col),
            "cleaned_text",
            "n_lines_kept",
            "n_lines_dropped",
        )
    )
