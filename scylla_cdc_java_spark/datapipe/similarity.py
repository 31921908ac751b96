"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk_bruteforce``: the correctness baseline. Dot products are
  computed JVM-side with ``F.zip_with`` + ``F.aggregate`` (no Python at
  all); queries are broadcast so the scan of the corpus side stays
  shuffle-free; top-k via a window over the (small) query dimension.
- ``cosine_topk_lsh``: the scale path — random-hyperplane LSH buckets
  (one Arrow pass to sign-hash each vector against R seeded
  hyperplanes), equi-join query buckets to corpus buckets, exact rerank
  inside buckets only. At 10^9 vectors the bucket join replaces the
  O(Q*N) cross product with O(Q*N/2^R)-ish work; recall is tunable via
  multiple tables (``n_tables``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk_bruteforce(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           qid_col: str = "query_id") -> DataFrame:
    """queries: (query_id, embedding). Returns (query_id, neighbor_id,
    cosine, rank) excluding self-matches."""
    q = queries.select(
        F.col(qid_col), F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col(qid_col) != F.col("neighbor_id"))
        .select(
            qid_col,
            "neighbor_id",
            (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(qid_col, "rank")
    )


def _hyperplane_bucket_udf(dim: int, n_planes: int, seed: int):
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @pandas_udf("long")
    def _bucket(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (m @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(signs @ weights)

    return _bucket


def cosine_topk_lsh(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id", n_planes: int = 4,
                    n_tables: int = 12, seed: int = 7) -> DataFrame:
    """Bucketed ANN: candidates = vectors sharing any LSH bucket with the
    query across n_tables hash tables; exact cosine rerank inside."""
    dim = len(embeddings.select(vec_col).first()[0])
    cand = None
    for t in range(n_tables):
        bu = _hyperplane_bucket_udf(dim, n_planes, seed + t)
        qb = queries.select(qid_col, F.col(vec_col).alias("_qv"),
                            bu(F.col(vec_col)).alias("_b"))
        cb = embeddings.select(F.col(id_col).alias("neighbor_id"),
                               F.col(vec_col).alias("_cv"),
                               bu(F.col(vec_col)).alias("_b"))
        pairs = F.broadcast(qb).join(cb, "_b").drop("_b")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates([qid_col, "neighbor_id"]).where(
        F.col(qid_col) != F.col("neighbor_id")
    )
    scored = cand.select(
        qid_col,
        "neighbor_id",
        (
            _dot(F.col("_qv"), F.col("_cv"))
            / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
        ).alias("cosine"),
    )
    w = Window.partitionBy(qid_col).orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(qid_col, "rank")
    )
