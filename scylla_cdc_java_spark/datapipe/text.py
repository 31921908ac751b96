"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting. All four are pure JVM expressions
(whole-stage codegen) — no Python on any path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .fanout import fan_out

# tiny stopword marker sets per language (heuristic n-gram language ID)
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
}


def _count_occurrences(col, needle: str):
    # occurrences = (len(s) - len(replace(s, needle, ''))) / len(needle)
    return (
        F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + distinct-char-class counts; all JVM."""
    t = F.col(text_col)
    return fan_out(docs, id_col).select(
        id_col,
        F.length(t).alias("n_chars"),
        (F.length(F.trim(t)) - F.length(F.replace(F.trim(t), F.lit(" "), F.lit("")))
         + F.lit(1)).alias("n_tokens"),
    ).orderBy(id_col)


def quality_metrics(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Length / word / alpha-ratio quality features (the usual cheap
    pre-training filters), rounded for stable comparison."""
    t = F.col(text_col)
    alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    words = (
        F.length(F.trim(t)) - F.length(F.replace(F.trim(t), F.lit(" "), F.lit("")))
        + F.lit(1)
    )
    return fan_out(docs, id_col).select(
        id_col,
        F.length(t).alias("n_chars"),
        words.alias("n_words"),
        F.round(alpha / F.greatest(F.length(t), F.lit(1)), 4).alias("alpha_ratio"),
        F.round(F.length(t) / F.greatest(words, F.lit(1)), 4).alias("avg_word_len"),
    ).orderBy(id_col)


def lang_id_heuristic(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Stopword-marker scoring over a padded lowercase body; argmax of
    per-language scores (ties -> 'en' > 'de' > 'fr' by check order)."""
    body = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(
            (_count_occurrences(body, m) for m in markers), F.lit(0.0)
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }
    df = fan_out(docs, id_col).select(id_col, *scores.values())
    best = F.greatest(*[F.col(f"score_{l}") for l in LANG_MARKERS])
    pred = F.when(best <= 0, F.lit("unknown"))
    for lang in LANG_MARKERS:  # first language reaching the max wins
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return df.select(
        id_col,
        *[F.col(f"score_{l}").cast("double").alias(f"score_{l}") for l in LANG_MARKERS],
        pred.alias("pred_lang"),
    ).orderBy(id_col)


def doc_fingerprints(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", window: int = 8) -> DataFrame:
    """Winnowing-style fingerprints, entirely JVM-side (no Python UDF):
    md5 over each ``window``-token shingle, then keep the minimum hash
    per non-overlapping block of ``window`` positions — a compact,
    shift-tolerant document signature. Documents shorter than one
    window fingerprint their whole (whitespace-normalized) body; empty
    documents yield no rows.

    Returns EXPLODED rows ``(doc_id, fingerprint string)`` — one row per
    distinct kept hash — so the result is a flat relation (joinable,
    SQL-oracle-checkable; an array column would also break value-level
    comparison downstream)."""
    # SCALE NOTE: expressions referenced inside a higher-order-function
    # lambda are re-evaluated PER ELEMENT — the round-3 shape computed
    # split() and the full shingle-hash array inside the lambdas, going
    # O(n_tokens^2) per document (measured: the sf1 gate timed out on
    # exactly this query). Materialize tokens as a real column
    # (attribute references are cheap per element) and compute each
    # shingle hash exactly once by partitioning positions by block.
    base = (
        fan_out(docs, id_col).where(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            id_col, F.split(F.trim(F.col(text_col)), r"\s+").alias("_toks")
        )
        .withColumn(
            "_maxpos",
            F.greatest(F.size("_toks") - F.lit(window - 1), F.lit(1)),
        )
    )
    toks, maxpos = F.col("_toks"), F.col("_maxpos")
    nblocks = F.ceil(maxpos / F.lit(float(window))).cast("int")
    # block b owns shingle positions [b*window+1, min((b+1)*window,
    # maxpos)] — disjoint cover, so every shingle is hashed ONCE; for
    # n < window the single position 1 covers the whole document (slice
    # clamps at the array end)
    blocks = F.transform(
        F.sequence(F.lit(0), nblocks - F.lit(1)),
        lambda b: F.array_min(
            F.transform(
                F.sequence(
                    b * window + F.lit(1),
                    F.least((b + F.lit(1)) * window, maxpos),
                ),
                lambda i: F.md5(F.array_join(F.slice(toks, i, window), " ")),
            )
        ),
    )
    return (
        base.select(
            id_col,
            F.explode(F.array_distinct(blocks)).alias("fingerprint"),
        )
        .orderBy(id_col, "fingerprint")
    )
