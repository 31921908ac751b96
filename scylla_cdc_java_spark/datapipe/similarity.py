"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk_bruteforce``: the correctness baseline. Dot products are
  computed JVM-side with ``F.zip_with`` + ``F.aggregate`` (no Python at
  all); queries are broadcast so the scan of the corpus side stays
  shuffle-free; top-k via a window over the (small) query dimension.
- ``cosine_topk_lsh``: the scale path — random-hyperplane LSH buckets.
  The seeded plane matrix is embedded as LITERAL arrays, so the bucket
  of every vector is a pure JVM expression (sign of sequential-fold dot
  products): one corpus scan computes ALL tables' buckets, explodes to
  (table, bucket) and equi-joins query buckets — no Python UDF, no
  per-table rescans. At 10^9 vectors the bucket join replaces the
  O(Q*N) cross product with O(Q*N/2^R)-ish work; recall is tunable via
  ``n_tables``. Deterministic given the seed (and reproducible outside
  Spark: all arithmetic is sequential IEEE-754 f64 — see
  datapipe/golden.py).
- ``cosine_topk_ivf``: the other scale path — IVF coarse quantizer:
  k-means centroids trained on a deterministic md5-ordered driver-side
  sample (standard practice; the sample is tiny relative to the
  corpus), embedded as literals; every corpus vector is assigned to its
  max-dot centroid by a JVM expression (partition-prunable list
  assignment), queries probe the ``nprobe`` best lists and rerank
  exactly inside them.
- ``embedding_neardup_*``: near-duplicate detection by embedding cosine
  >= threshold — bruteforce (oracle-checkable) and LSH-blocked (scale).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F

from .fanout import fan_out


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


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Seeded random hyperplanes, shape (n_planes, dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).T.copy()


def _vec_literal(vec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in vec])


def _bucket_expr(vec_col, planes: np.ndarray):
    """LSH bucket id = Σ_p (v · plane_p > 0) << p — all JVM, sequential
    f64 folds (bit-reproducible outside Spark)."""
    b = F.lit(0).cast("long")
    for p in range(planes.shape[0]):
        d = _dot(vec_col, _vec_literal(planes[p]))
        b = b + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
    return b


def _all_buckets_expr(vec_col, dim: int, n_planes: int, n_tables: int,
                      seed: int):
    """Array of all n_tables bucket ids — ONE corpus pass for every
    hash table."""
    return F.array(
        *[_bucket_expr(vec_col, _planes(dim, n_planes, seed + t))
          for t in range(n_tables)]
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
    # fan_out: the per-pair dot product is an interpreted higher-order
    # fold evaluated on the CORPUS scan's partitioning — a single-row-
    # group embeddings file would run every query x corpus pair on one
    # core (datapipe/fanout.py)
    c = fan_out(embeddings, id_col).select(
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
    embeddings = fan_out(embeddings, id_col)
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
    tables), self-join only within (table, bucket), exact-cosine verify.
    ONE pass computes every table's bucket; the self-join shuffles once
    on the (table, bucket) key — no cross product, no Python. Output
    schema matches the brute-force variant; recall < 1 is the
    documented LSH trade-off."""
    dim = len(embeddings.select(vec_col).first()[0])
    bk = fan_out(embeddings, id_col).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
        F.posexplode(
            _all_buckets_expr(F.col(vec_col), dim, n_planes, n_tables, seed)
        ).alias("_t", "_b"),
    )
    left = bk.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
                     "_t", "_b")
    right = bk.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
                      "_t", "_b")
    cand = (
        left.join(right, ["_t", "_b"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
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


def train_ivf_centroids(embeddings: DataFrame, n_lists: int,
                        sample_size: int, seed: int,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> np.ndarray:
    """Quantizer training sample: md5-ordered prefix — a deterministic,
    insertion-order-free pseudo-random sample (a bare .limit() over the
    raw scan takes the first partitions and biases the centroids on
    ordered corpora; .sample() is seed-stable only per partitioning).
    Returns row-normalized centroids (n_lists, dim)."""
    rows = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    if not rows:
        raise ValueError("train_ivf_centroids: embeddings DataFrame is "
                         "empty — cannot train the IVF quantizer")
    sample = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    cent = _kmeans_centroids(sample, n_lists, seed)
    return cent / np.linalg.norm(cent, axis=1, keepdims=True)


def _centroid_dots_expr(vec_col, cn: np.ndarray):
    return F.array(*[_dot(vec_col, _vec_literal(cn[j])) for j in range(len(cn))])


def argmax_expr(arr) -> "F.Column":
    """Index of the FIRST maximum element (``array_position`` returns
    the first match) — the IVF list-assignment tie rule, mirrored by
    ``list.index(max(list))`` in the pure-Python golden."""
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def probe_lists_expr(dots, n_lists: int, nprobe: int) -> "F.Column":
    """The ``nprobe`` list indices with the highest centroid dots —
    dot desc, tie by list index asc — as an ``array<int>``."""
    zipped = F.arrays_zip(
        dots.alias("d"),
        F.sequence(F.lit(0), F.lit(n_lists - 1)).alias("i"),
    )
    ordered = F.array_sort(
        zipped,
        lambda a, b: F.when(a["d"] > b["d"], F.lit(-1))
        .when(a["d"] < b["d"], F.lit(1))
        .otherwise((a["i"] - b["i"]).cast("int")),
    )
    return F.transform(F.slice(ordered, 1, nprobe),
                       lambda s: s["i"].cast("int"))


def seeded_centroids(dim: int, n_lists: int, seed: int) -> np.ndarray:
    """Data-independent row-normalized centroids from a seeded rng —
    the quantizer used where BOTH sides of a check must derive the
    centroids with zero shared state (the ``ivf_incremental`` contract
    entry's pure-Python golden re-creates these from the same seed).
    Trained centroids (``train_ivf_centroids``) give better list
    balance and are the default everywhere else."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_lists, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def hashed_embeddings(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", dim: int = 16,
                      shingle_k: int = 3) -> DataFrame:
    """Feature-hashed bag-of-shingles embedding ``(id_col, emb
    array<double>)`` — the deterministic text->vector bridge that lets
    embedding-space operators (IVF lists, cosine near-dup) run over a
    table that has no embedding column, e.g. the CDC-maintained
    ``(repo, path, ..., content)`` table (datapipe/incremental.py).

    Per distinct shingle hash h (crc32, as ``shingle_array_expr``):
    ``emb[h % dim] += +1 if ((h >> log2(dim)) & 1) == 0 else -1`` — the
    standard signed feature-hashing trick (Weinberger et al. 2009),
    with the sign drawn from the bit just above the index bits so both
    are mirrored exactly by integer arithmetic in the Python golden.
    Execution shape is the same skew-immune explode -> hash-aggregate
    with ``dim`` fixed-width LONG slots as ``minhash_signatures``;
    components are integral (sums of +-1), so the double array is
    exact and order-independent. NULL text must be coalesced by the
    caller (same contract as ``minhash_signatures``)."""
    from .dedup import shingle_array_expr

    if dim & (dim - 1):
        raise ValueError(f"dim must be a power of two, got {dim}")
    bits = dim.bit_length() - 1
    sh = shingle_array_expr(F.col(text_col), shingle_k)
    exploded = fan_out(docs, id_col).select(F.col(id_col), F.explode(sh).alias("_h"))
    sign = F.when(
        F.pmod(F.shiftright(F.col("_h"), bits), F.lit(2)) == 0, F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    sums = [
        F.sum(F.when(F.pmod(F.col("_h"), F.lit(dim)) == d, sign)
              .otherwise(F.lit(0.0))).alias(f"_e{d}")
        for d in range(dim)
    ]
    return (
        exploded.groupBy(id_col)
        .agg(*sums)
        .select(
            F.col(id_col),
            F.array(*[F.col(f"_e{d}") for d in range(dim)]).alias("emb"),
        )
    )


def cosine_topk_ivf(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id", n_lists: int = 16,
                    nprobe: int = 4, sample_size: int = 4096,
                    seed: int = 13) -> DataFrame:
    """IVF ANN: assign corpus vectors to their max-dot centroid (JVM
    expression over literal normalized centroids — dot ordering equals
    cosine ordering, so no per-vector normalization is needed); each
    query probes its ``nprobe`` best lists; exact cosine rerank inside
    the probed lists only. At 10^10 vectors the list id becomes the
    table's partition column, so a probe prunes (n_lists - nprobe)/
    n_lists of the corpus scan."""
    cn = train_ivf_centroids(embeddings, n_lists, sample_size, seed,
                             id_col, vec_col)

    corpus = (
        fan_out(embeddings, id_col).select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
        )
        .withColumn("_dots", _centroid_dots_expr(F.col("_cv"), cn))
        .withColumn("_list", argmax_expr(F.col("_dots")))
        .drop("_dots")
    )

    # probe order: dot desc, tie by list index asc
    probe = probe_lists_expr(F.col("_dots"), n_lists, nprobe)
    q = (
        queries.select(qid_col, F.col(vec_col).alias("_qv"))
        .withColumn("_dots", _centroid_dots_expr(F.col("_qv"), cn))
        .select(qid_col, "_qv", F.explode(probe).alias("_list"))
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


def cosine_topk_lsh(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id", n_planes: int = 4,
                    n_tables: int = 12, seed: int = 7) -> DataFrame:
    """Bucketed ANN: candidates = vectors sharing any (table, bucket)
    with the query; exact cosine rerank inside. One corpus pass computes
    all tables' buckets (posexplode), one equi-join on (table, bucket)."""
    dim = len(embeddings.select(vec_col).first()[0])
    qb = queries.select(
        qid_col, F.col(vec_col).alias("_qv"),
        F.posexplode(
            _all_buckets_expr(F.col(vec_col), dim, n_planes, n_tables, seed)
        ).alias("_t", "_b"),
    )
    cb = fan_out(embeddings, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        F.posexplode(
            _all_buckets_expr(F.col(vec_col), dim, n_planes, n_tables, seed)
        ).alias("_t", "_b"),
    )
    cand = (
        F.broadcast(qb).join(cb, ["_t", "_b"]).drop("_t", "_b")
        .dropDuplicates([qid_col, "neighbor_id"])
        .where(F.col(qid_col) != F.col("neighbor_id"))
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
