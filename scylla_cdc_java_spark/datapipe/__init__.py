"""Large-scale training-data pipeline operators over the engine's lake
tables (documents / embeddings) — the data-processing surface a 100 TB
CDC-ingested corpus needs downstream: deduplication, similarity search,
text analysis, multimodal column plumbing.

All hot paths are either pure ``pyspark.sql.functions`` (JVM,
whole-stage codegen) or Arrow-batched pandas UDFs over numpy — never
per-row Python.
"""

from .dedup import (
    dedup_clusters,
    dedup_keep_list,
    exact_dedup_groups,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_buckets,
)
from .similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_neardup_bruteforce,
    embedding_neardup_lsh,
)
from .text import doc_fingerprints, lang_id_heuristic, quality_metrics, token_counts
from .multimodal import (
    decode_real,
    decode_stub_metadata,
    feature_extract_stub,
    frame_sample_stub,
    to_png_assets,
    resize_stub,
)

__all__ = [
    "exact_dedup_groups",
    "dedup_clusters",
    "dedup_keep_list",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_buckets",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "embedding_neardup_bruteforce",
    "embedding_neardup_lsh",
    "doc_fingerprints",
    "lang_id_heuristic",
    "quality_metrics",
    "token_counts",
    "decode_real",
    "decode_stub_metadata",
    "feature_extract_stub",
    "frame_sample_stub",
    "to_png_assets",
    "resize_stub",
]
