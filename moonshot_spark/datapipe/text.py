"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting.

All pure Column expressions (split/filter/aggregate higher-order functions)
— no UDFs, so a 100 TB documents scan stays entirely in codegen with the
parquet reader feeding string batches.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic; deterministic and SQL-expressible for the oracle
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}


def tokens_expr(col: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization as an array column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, sep)


def token_count_expr(col: Column | str) -> Column:
    return F.size(tokens_expr(col))


def quality_exprs(col: Column | str) -> dict[str, Column]:
    """Quality-scoring signals: length, token stats, stopword ratio,
    punctuation ratio, uppercase ratio.  The classic pre-training quality
    filters (C4/Gopher-style rules) as cheap column math."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens_expr(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(LANG_STOPWORDS["en"])))
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[.,!?;:]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "mean_token_len": (F.aggregate(toks, F.lit(0).cast("bigint"),
                                       lambda acc, t: acc + F.length(t)).cast("double")
                           / n_tokens),
        "stopword_ratio": n_stop.cast("double") / n_tokens,
        "punct_ratio": n_punct.cast("double") / n_chars,
        "upper_ratio": n_upper.cast("double") / n_chars,
    }


def lang_scores_expr(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID heuristic's
    evidence).  ``lang_id`` = argmax over these scores."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens_expr(c)

    def _member_of(sw):
        # NB: the lambda must be single-arg — a second parameter would be
        # interpreted by F.filter as the element *index*
        return lambda t: t.isin(sw)

    return {lang: F.size(F.filter(toks, _member_of(sw)))
            for lang, sw in LANG_STOPWORDS.items()}


def lang_id_expr(col: Column | str) -> Column:
    """Predicted language = argmax of stopword scores, ties broken by
    language-code order; 'und' (undetermined) when all scores are 0."""
    scores = lang_scores_expr(col)
    langs = sorted(scores)
    best_score = F.greatest(*[scores[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):     # earlier langs win ties → apply last
        pred = F.when(scores[lang] == best_score, F.lit(lang)).otherwise(pred)
    return F.when(best_score > 0, pred).otherwise(F.lit("und"))


def fingerprint_expr(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (lowercased,
    whitespace-collapsed).  md5 is available and bit-identical in every
    engine, making fingerprints portable across systems."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.md5(F.encode(normalized, "UTF-8"))
