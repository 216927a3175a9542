"""Text analysis for training-data curation: language ID, quality
scoring, token counting, document fingerprinting.

Everything here is pure column SQL (JVM-side, codegen'd) so it runs at
scan speed and is reproducible in ANSI SQL for the oracle gate.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE = 2_147_483_647

# tiny per-language stopword marker sets for the n-gram/stopword
# heuristic (deterministic, not a trained model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "des"],
    "es": ["el", "la", "los", "y", "es", "una", "que"],
    "it": ["il", "la", "gli", "e", "che", "una", "per"],
}


def words_col(text: Column) -> Column:
    return F.split(text, " ")


def token_count_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace word count, char count, and a BPE-ish token estimate
    (chars/4 heuristic + punctuation breaks) — the standard curation
    counters."""
    words = words_col(F.col(text_col))
    n_punct = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    return (
        df.withColumn("n_words", F.size(words))
        .withColumn("n_chars", F.length(text_col))
        .withColumn("n_punct", n_punct)
        .withColumn(
            "n_tokens_est",
            F.ceil(F.length(text_col) / 4.0).cast("long") + n_punct)
    )


def quality_score_col(text: Column) -> Column:
    """Deterministic [0,1] quality score from length, punctuation
    ratio, mean word length, and repetition (distinct-word ratio)."""
    words = words_col(text)
    n_words = F.size(words).cast("double")
    n_chars = F.length(text).cast("double")
    mean_wlen = F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n_words > 0,
        F.size(F.array_distinct(words)).cast("double") / n_words
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_words / 100.0, F.lit(1.0))
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 1.0) \
                  .otherwise(0.5)
    return F.round(
        0.4 * len_score + 0.3 * distinct_ratio + 0.3 * wlen_score, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio."""
    words = words_col(F.lower(text))
    n = F.greatest(F.size(words).cast("double"), F.lit(1.0))
    out = {}
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(
            words, lambda w: w.isin(markers)))  # noqa: B023
        out[lang] = hits.cast("double") / n
    return out


def lang_id_col(text: Column) -> Column:
    """Argmax language by marker ratio, ties broken alphabetically,
    'und' (undetermined) when no marker hits at all."""
    scores = lang_scores(text)
    best = None
    for lang in sorted(scores):           # alphabetical tiebreak
        s = scores[lang]
        if best is None:
            best = F.struct(s.alias("score"), F.lit(lang).alias("lang"))
        else:
            best = F.when(s > best.getField("score"),
                          F.struct(s.alias("score"), F.lit(lang).alias("lang"))
                          ).otherwise(best)
    return F.when(best.getField("score") > 0,
                  best.getField("lang")).otherwise(F.lit("und"))


def fingerprint_col(arr: Column) -> Column:
    """Rolling polynomial hash over an int array (order-sensitive
    document fingerprint): fold acc -> (acc*31 + x + 1) mod (2^31-1)."""
    return F.aggregate(
        arr, F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x.cast("long") + 1) % MERSENNE)


def text_profile(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Full curation profile per document."""
    out = token_count_cols(documents, text_col)
    return (
        out.withColumn("quality", quality_score_col(F.col(text_col)))
        .withColumn("lang_pred", lang_id_col(F.col(text_col)))
    )


# PII / URL scrubbing (C4/RefinedWeb-style cleaning). Patterns are
# deliberately RE2-compatible (no lookaround, no backrefs) so the same
# strings run identically under Java regex (Spark, codegen'd) and
# DuckDB/RE2 — parity is pinned by tests/test_textstats.py.
# Replacement order matters: full URLs (including mailto: and
# userinfo-bearing https://user@host/... forms) before bare emails —
# else the email pattern eats `user@example.com` out of the middle of
# a URL and leaves scheme/path fragments unmasked with n_url=0 —
# and URLs before bare IPs / digit runs (so host digits aren't
# double-masked).
SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"(?:https?://|mailto:)[^\s<>]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # 7+ consecutive digits (phone / account / card fragments)
    ("digits", r"\d{7,}", "<NUM>"),
]


def scrub_cols(text: Column) -> tuple[Column, dict[str, Column]]:
    """(scrubbed text, {kind: match count}) — one chained
    regexp_replace per PII kind plus a regexp_count per kind, all
    JVM-side codegen'd expressions (no UDF)."""
    counts: dict[str, Column] = {}
    scrubbed = text
    for kind, pat, repl in SCRUB_PATTERNS:
        counts[f"n_{kind}"] = F.regexp_count(scrubbed, F.lit(pat))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return scrubbed, counts


def scrub_text(documents: DataFrame, text_col: str = "text",
               out_col: str = "text_scrubbed") -> DataFrame:
    """Mask emails / URLs / IPv4s / long digit runs with typed
    placeholder tokens and attach per-kind match counts
    (n_url, n_email, n_ip, n_digits) for downstream filter decisions.
    Counts are taken on the progressively scrubbed string, so an email
    inside a mailto: or userinfo URL counts once as URL, not again as
    email."""
    scrubbed, counts = scrub_cols(F.col(text_col))
    out = documents.withColumn(out_col, scrubbed)
    for name, col in counts.items():
        out = out.withColumn(name, col)
    return out
