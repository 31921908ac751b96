"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting. Quality/token/lang paths are pure
JVM expressions (whole-stage codegen); fingerprinting is an Arrow pass.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

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
    return docs.select(
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
    return docs.select(
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
    df = docs.select(id_col, *scores.values())
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
    """Winnowing-style fingerprints: rolling crc32 over token windows,
    keep the min hash per window position block — a compact, shift-
    tolerant document signature (Arrow-batched numpy)."""

    @pandas_udf("array<long>")
    def _fp(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = (t or "").split()
            if len(toks) < window:
                out.append(
                    [np.int64(zlib.crc32(" ".join(toks).encode()))] if toks else []
                )
                continue
            hs = np.fromiter(
                (
                    zlib.crc32(" ".join(toks[i : i + window]).encode())
                    for i in range(len(toks) - window + 1)
                ),
                dtype=np.int64,
            )
            # winnow: min per non-overlapping block of `window` positions
            nblocks = int(np.ceil(len(hs) / window))
            pads = nblocks * window - len(hs)
            padded = np.pad(hs, (0, pads), constant_values=np.iinfo(np.int64).max)
            out.append(np.unique(padded.reshape(nblocks, window).min(axis=1)).tolist())
        return pd.Series(out)

    return docs.select(id_col, _fp(F.col(text_col)).alias("fingerprints"))
