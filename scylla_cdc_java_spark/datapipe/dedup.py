"""Deduplication operators.

Scale posture (100 TB corpus):
- exact: one hash-groupBy shuffle; map-side partial agg makes duplicate
  hot-hashes harmless.
- MinHash+LSH: signatures via one Arrow-batched pandas UDF pass (numpy
  vectorized over each batch), then EXPLODE band buckets and self-join
  on (band, bucket) — the join key is the bucket id, so candidate
  generation is an equi-join Catalyst can shuffle-hash, never an O(n^2)
  cross join. Bucket skew (a degenerate bucket holding thousands of
  docs) is bounded by ``max_bucket`` pruning, the standard trick in
  web-dedup pipelines.
- SimHash: 64-bit signature per doc, grouped by band prefixes.
- verification: n-gram Jaccard on candidate PAIRS only (tiny relative
  to the corpus).

All hashing is deterministic (crc32 + seeded affine permutations) so
results are reproducible across runs/clusters.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

MERSENNE = (1 << 61) - 1


def exact_dedup_groups(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text, with the
    surviving (min) id and the duplicate count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
        .orderBy("text_md5")
    )


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    return np.unique(
        np.fromiter(
            (zlib.crc32(" ".join(toks[i : i + k]).encode()) for i in range(max(1, len(toks) - k + 1))),
            dtype=np.uint64,
        )
    )


def _perm_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=num_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id", num_hashes: int = 64,
                       shingle_k: int = 3, seed: int = 42) -> DataFrame:
    """doc_id -> array<bigint> MinHash signature (Arrow-batched)."""
    a, b = _perm_params(num_hashes, seed)

    @pandas_udf("array<long>")
    def _sig(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            sh = _shingle_hashes(t or "", shingle_k)
            # (a*h + b) mod p, min over shingles, vectorized (H x S)
            vals = (a[:, None] * sh[None, :] + b[:, None]) % MERSENNE
            out.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return docs.select(F.col(id_col), _sig(F.col(text_col)).alias("sig"))


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 64,
                           bands: int = 16, shingle_k: int = 3,
                           seed: int = 42, max_bucket: int = 64) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH: equal band-hash =>
    candidate. Returns (id_a, id_b, n_shared_bands)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, text_col, id_col, num_hashes, shingle_k, seed)
    banded = sig.select(
        id_col,
        F.posexplode(
            F.array(*[
                F.xxhash64(F.slice("sig", i * rows_per_band + 1, rows_per_band))
                for i in range(bands)
            ])
        ).alias("band", "bucket"),
    )
    # prune degenerate buckets (skew guard)
    ok = (
        banded.groupBy("band", "bucket").count()
        .where(F.col("count") <= max_bucket)
        .drop("count")
    )
    banded = banded.join(ok, ["band", "bucket"], "left_semi")
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .groupBy(
            F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


def simhash_buckets(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", prefix_bits: int = 16) -> DataFrame:
    """64-bit SimHash per doc + a band prefix for bucketing: docs whose
    prefix matches are near-dup candidates under Hamming distance."""

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                continue
            hs = np.fromiter((zlib.crc32(w.encode()) for w in toks), dtype=np.uint64)
            # widen to 64 bits deterministically
            hs = hs * np.uint64(0x9E3779B97F4A7C15)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1)
            score = (2 * bits.astype(np.int64) - 1).sum(axis=0)
            sig = np.uint64(0)
            for bit in range(64):
                if score[bit] > 0:
                    sig |= np.uint64(1) << np.uint64(bit)
            out[i] = np.int64(sig.astype(np.int64))
        return pd.Series(out)

    # compute the UDF once; derive the bucket from the column (Catalyst
    # does not dedupe repeated Python UDF calls)
    return docs.select(
        id_col, _simhash(F.col(text_col)).alias("simhash")
    ).withColumn(
        "bucket", F.shiftrightunsigned(F.col("simhash"), 64 - prefix_bits)
    )


def ngram_jaccard_pairs(docs: DataFrame, pairs: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 3) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage of
    the dedup pipeline). pairs: (id_a, id_b). Joins text in twice
    (candidates are few; the joins are broadcast-able), computes exact
    Jaccard in an Arrow-batched UDF."""

    @pandas_udf("double")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta))
        for i in range(len(ta)):
            sa = set(_shingle_hashes(ta.iloc[i] or "", shingle_k).tolist())
            sb = set(_shingle_hashes(tb.iloc[i] or "", shingle_k).tolist())
            u = len(sa | sb)
            out[i] = (len(sa & sb) / u) if u else 0.0
        return pd.Series(out)

    a = docs.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    b = docs.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", _jac("_ta", "_tb").alias("jaccard"))
    )
