"""Text analysis for a training-data pipeline: token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All pure Catalyst expressions (split/regexp/aggregate) — no Python in
the hot path, so they run JVM-side at 100 TB. Each has an ANSI-SQL
oracle in __spark_entry__.oracle_sql.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword seeds for the n-gram/stopword heuristic
LANG_STOPWORDS = {
    "en": ("the", "and", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "und", "das"),
    "fr": ("le", "la", "et"),
}


def token_count(
    df: DataFrame, text_col: str = "text", out: str = "n_tokens"
) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate
    (words + punctuation runs counted separately)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    subword = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    )
    return df.withColumn(out, ws).withColumn(f"{out}_bpeish", subword)


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features and a
    composite [0,1] score (heuristics in the C4/Gopher style)."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    n_words = F.size(F.split(F.trim(txt), r"\s+"))
    n_punct = F.length(txt) - F.length(F.regexp_replace(txt, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_hits = sum(
        (
            F.size(
                F.regexp_extract_all(
                    F.lower(txt), F.lit(rf"\b{w}\b"), F.lit(0)
                )
            )
            for ws in LANG_STOPWORDS.values()
            for w in ws
        ),
        start=F.lit(0),
    )
    stop_ratio = F.when(n_words > 0, stop_hits / n_words).otherwise(F.lit(0.0))
    mean_word_len = F.when(n_words > 0, (n_chars - n_words + 1) / n_words).otherwise(F.lit(0.0))
    score = (
        F.least(n_words / F.lit(20.0), F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.3
    )
    return (
        df.withColumn("q_n_chars", n_chars.cast("long"))
        .withColumn("q_n_words", n_words.cast("long"))
        .withColumn("q_punct_ratio", punct_ratio.cast("double"))
        .withColumn("q_stopword_ratio", stop_ratio.cast("double"))
        .withColumn("q_mean_word_len", mean_word_len.cast("double"))
        .withColumn("q_score", score.cast("double"))
    )


def langid_heuristic(
    df: DataFrame, text_col: str = "text", out: str = "lang_pred"
) -> DataFrame:
    """Stopword-vote language ID: argmax language by seed-stopword hits,
    'und' when nothing matches. Deterministic tie-break by language code
    order (en < es < de < fr by vote, then alphabetical)."""
    txt = F.lower(F.col(text_col))
    votes = {
        lang: sum(
            (F.size(F.regexp_extract_all(txt, F.lit(rf"\b{w}\b"), F.lit(0))) for w in ws),
            start=F.lit(0),
        )
        for lang, ws in LANG_STOPWORDS.items()
    }
    pairs = F.array(
        *[
            F.struct(v.cast("long").alias("votes"), F.lit(lang).alias("lang"))
            for lang, v in sorted(votes.items())
        ]
    )
    best = F.array_max(pairs)
    return df.withColumn(
        out, F.when(best["votes"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def fingerprint(
    df: DataFrame, text_col: str = "text", out: str = "doc_fingerprint"
) -> DataFrame:
    """Normalized-content fingerprint: lowercase, collapse whitespace,
    strip punctuation, md5. Robust to formatting-only edits."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), r"[^\w\s]", ""), r"\s+", " "
        )
    )
    return df.withColumn(out, F.md5(norm.cast("binary")))
