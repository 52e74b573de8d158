"""Text-analysis functions for web-scale training-data pipelines.

All hot-path functions are JVM-side Column expressions (regexp /
aggregate built-ins — whole-stage codegen, no Python).  Where a SQL
fragment is given it runs identically in Spark SQL and DuckDB so the
driver's oracle can verify it.

* token_count   — whitespace tokenization count
* word_count / char stats
* quality_score — length / alpha-ratio / stopword-ratio heuristic
* lang_id       — stopword-hit n-gram heuristic over {en,de,fr,es,pt}
* fingerprint   — 64-bit FNV-1a rolling document fingerprint
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Tiny per-language stopword marker sets for the heuristic language id.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "und", "die", "nicht", "das"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "que", "los", "una", "por"],
    "pt": ["que", "não", "uma", "os", "das"],
}

EN_STOPWORDS = ["the", "and", "of", "to", "in", "a", "is", "it", "for", "on"]


def token_count_sql(col: str) -> str:
    """Whitespace token count; identical in Spark SQL and DuckDB."""
    return (
        f"(CASE WHEN LENGTH(TRIM({col})) = 0 THEN 0 ELSE "
        f"LENGTH(REGEXP_REPLACE(TRIM({col}), '\\s+', ' ')) - "
        f"LENGTH(REPLACE(REGEXP_REPLACE(TRIM({col}), '\\s+', ' '), ' ', ''))"
        f" + 1 END)"
    )


def token_count(col: str) -> Column:
    return F.expr(token_count_sql(col)).cast("long")


def alpha_ratio_sql(col: str) -> str:
    """Fraction of alphabetic chars — a quality-score component."""
    return (
        f"(CASE WHEN LENGTH({col}) = 0 THEN 0.0 ELSE "
        f"CAST(LENGTH(REGEXP_REPLACE({col}, '[^a-zA-Z]', '')) AS DOUBLE)"
        f" / LENGTH({col}) END)"
    )


def quality_score_sql(col: str) -> str:
    """Composite quality in [0,1]: alpha ratio x length saturation.

    length saturation = min(1, n_chars / 200).
    """
    return (
        f"(({alpha_ratio_sql(col)}) * "
        f"LEAST(1.0, CAST(LENGTH({col}) AS DOUBLE) / 200.0))"
    )


def quality_score(col: str) -> Column:
    return F.expr(quality_score_sql(col))


def lang_id(col: str) -> Column:
    """Heuristic language id: language with most stopword-marker hits
    (ties broken by fixed language order, 'und' = undetermined)."""
    lowered = F.lower(F.col(col))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        score = None
        for m in markers:
            hit = (
                F.length(lowered)
                - F.length(F.regexp_replace(lowered, f"\\b{m}\\b", ""))
            ) / max(len(m), 1)
            score = hit if score is None else score + hit
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint64(col: str) -> Column:
    """64-bit document fingerprint: xxhash64 of the normalized text
    (whitespace-collapsed, lowercased) — the rolling-hash document
    identity used by dedup."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(col))), "\\s+", " ")
    return F.xxhash64(norm)
