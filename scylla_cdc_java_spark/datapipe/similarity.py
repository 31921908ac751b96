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
- ``cosine_topk_ivf``: the other scale path — IVF coarse quantizer:
  k-means centroids trained on a driver-side sample (standard practice;
  the sample is tiny relative to the corpus), broadcast; every corpus
  vector is assigned to its nearest centroid in one Arrow pass
  (partition-prunable list assignment), queries probe the ``nprobe``
  nearest lists and rerank exactly inside them.
- ``embedding_neardup_*``: near-duplicate detection by embedding cosine
  >= threshold — bruteforce (oracle-checkable) and LSH-blocked (scale).
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


def embedding_neardup_bruteforce(embeddings: DataFrame, threshold: float = 0.95,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding") -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, cosine >= threshold) by exact
    all-pairs cosine — the correctness baseline (O(N^2); fine for the
    oracle gate, replaced by ``embedding_neardup_lsh`` at scale)."""
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
        _norm(F.col(vec_col)).alias("_na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
        _norm(F.col(vec_col)).alias("_nb"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).alias(
                "cosine"
            ),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def embedding_neardup_lsh(embeddings: DataFrame, threshold: float = 0.95,
                          id_col: str = "vec_id", vec_col: str = "embedding",
                          n_planes: int = 6, n_tables: int = 8,
                          seed: int = 11) -> DataFrame:
    """Scale path: block by random-hyperplane LSH signature (vectors at
    cosine >= threshold collide with high probability across n_tables
    tables), self-join only within buckets, exact-cosine verify. The
    self-join is on the bucket key so Spark shuffles each table once by
    bucket — no cross product. Output schema matches the brute-force
    variant; recall < 1 is the documented LSH trade-off."""
    dim = len(embeddings.select(vec_col).first()[0])
    ids = embeddings.select(F.col(id_col).alias("_id"),
                            F.col(vec_col).alias("_v"))
    cand = None
    for t in range(n_tables):
        bu = _hyperplane_bucket_udf(dim, n_planes, seed + t)
        bk = ids.withColumn("_b", bu(F.col("_v")))
        left = bk.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
                         "_b")
        right = bk.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
                          "_b")
        pairs = left.join(right, "_b").where(F.col("id_a") < F.col("id_b")).drop("_b")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["id_a", "id_b"])
    return (
        cand.select(
            "id_a", "id_b",
            (
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb")))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .orderBy("id_a", "id_b")
    )


def _kmeans_centroids(sample: np.ndarray, n_lists: int, seed: int,
                      n_iter: int = 8) -> np.ndarray:
    """Tiny deterministic k-means on a driver-side sample (the standard
    IVF recipe: the quantizer trains on ~10^5 sampled vectors even when
    the corpus is 10^10). Pure numpy; seeded init."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cent = sample[np.sort(idx)].astype(np.float64)
    for _ in range(n_iter):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(len(cent)):
            m = assign == j
            if m.any():
                cent[j] = sample[m].mean(0)
    return cent


def cosine_topk_ivf(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id", n_lists: int = 16,
                    nprobe: int = 4, sample_size: int = 4096,
                    seed: int = 13) -> DataFrame:
    """IVF ANN: assign corpus vectors to their nearest of ``n_lists``
    k-means centroids (one Arrow pass, centroids broadcast in the UDF
    closure); each query probes its ``nprobe`` nearest lists; exact
    cosine rerank inside the probed lists only. At 10^10 vectors the
    list id becomes the table's partition column, so a probe prunes
    (n_lists - nprobe)/n_lists of the corpus scan."""
    sample = np.stack(
        [np.asarray(r[0], dtype=np.float64)
         for r in embeddings.select(vec_col).limit(sample_size).collect()]
    )
    cent = _kmeans_centroids(sample, n_lists, seed)
    cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cn.T).argmax(1).astype(np.int32))

    @pandas_udf("array<int>")
    def _probe(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cn.T), axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order))

    corpus = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        _assign(F.col(vec_col)).alias("_list"),
    )
    q = queries.select(
        qid_col, F.col(vec_col).alias("_qv"),
        F.explode(_probe(F.col(vec_col))).alias("_list"),
    )
    cand = F.broadcast(q).join(corpus, "_list").where(
        F.col(qid_col) != F.col("neighbor_id")
    )
    scored = cand.select(
        qid_col,
        "neighbor_id",
        (
            _dot(F.col("_qv"), F.col("_cv"))
            / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
        ).alias("cosine"),
    ).dropDuplicates([qid_col, "neighbor_id"])
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
