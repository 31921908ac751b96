"""Training-data pipeline operators: determinism + semantic sanity on
the driver testdata (sf0.001)."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


@pytest.fixture(scope="module")
def emb(spark):
    from pyspark.sql import functions as F

    return spark.read.parquet(os.path.join(SF, "embeddings.parquet")).withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )


def test_exact_dedup_finds_planted_duplicate(spark, docs):
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.datapipe import exact_dedup_groups

    dup = docs.limit(1).withColumn("doc_id", F.col("doc_id") + 100000)
    out = exact_dedup_groups(docs.unionByName(dup)).where(F.col("n_dups") > 1)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["n_dups"] == 2


def test_minhash_lsh_detects_near_duplicate(spark, docs):
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.datapipe import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    # plant a near-dup: copy of doc 0 with a one-token prefix change
    base = docs.where(F.col("doc_id") == 0)
    near = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("zzz "), F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(near)
    cand = minhash_lsh_candidates(corpus, bands=16)
    planted = cand.where(
        (F.col("id_a") == 0) & (F.col("id_b") == 100000)
    ).collect()
    assert planted, "planted near-duplicate not found by LSH"
    jac = ngram_jaccard_pairs(corpus, cand.select("id_a", "id_b"))
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jac.collect()}
    assert j[(0, 100000)] > 0.8


def test_simhash_deterministic_and_close_for_near_dups(spark, docs):
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.datapipe import simhash_buckets

    a = {r["doc_id"]: r["simhash"] for r in simhash_buckets(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_buckets(docs).collect()}
    assert a == b  # deterministic
    near = docs.where(F.col("doc_id") == 1).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    s2 = {
        r["doc_id"]: r["simhash"]
        for r in simhash_buckets(docs.unionByName(near)).collect()
    }
    ham = bin(s2[1] ^ s2[100001] if 100001 in s2 else s2[1] ^ s2[100000]).count("1")
    assert ham <= 12  # near-dup -> small Hamming distance


def test_ann_lsh_recall_vs_bruteforce(spark, emb):
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.datapipe import (
        cosine_topk_bruteforce,
        cosine_topk_lsh,
    )

    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = cosine_topk_bruteforce(emb, queries, k=5).collect()
    approx = cosine_topk_lsh(emb, queries, k=5).collect()
    bf_set = {(r["query_id"], r["neighbor_id"]) for r in bf}
    ap_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(bf_set & ap_set) / len(bf_set)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_quality_and_tokens_consistent(spark, docs):
    from scylla_cdc_java_spark.datapipe import quality_metrics, token_counts

    q = {r["doc_id"]: r for r in quality_metrics(docs).collect()}
    t = {r["doc_id"]: r for r in token_counts(docs).collect()}
    for i, row in q.items():
        assert row["n_words"] == t[i]["n_tokens"]
        assert 0.0 <= row["alpha_ratio"] <= 1.0


def test_multimodal_plumbing_schema_and_determinism(spark, docs):
    from scylla_cdc_java_spark.datapipe import decode_stub_metadata
    from scylla_cdc_java_spark.datapipe.multimodal import to_binary_assets

    assets = to_binary_assets(docs)
    assert dict(assets.dtypes)["asset"] == "binary"
    m1 = sorted(decode_stub_metadata(assets).collect(), key=lambda r: r["doc_id"])
    m2 = sorted(decode_stub_metadata(assets).collect(), key=lambda r: r["doc_id"])
    assert m1 == m2
    assert all(r["width"] >= 64 and r["n_frames"] >= 1 for r in m1)


def test_fingerprints_shift_tolerant(spark, docs):
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.datapipe import doc_fingerprints

    near = docs.where(F.col("doc_id") == 2).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("prefix "), F.col("text")).alias("text"),
        "lang", "source", "n_chars",
    )
    fp: dict = {}
    for r in doc_fingerprints(docs.unionByName(near)).collect():
        fp.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    a, b = fp[2], fp[100002 if 100002 in fp else 100000]
    overlap = len(a & b) / max(1, len(a | b))
    assert overlap > 0.5, f"fingerprint overlap too low: {overlap}"


def test_embedding_neardup_lsh_subset_of_bruteforce(spark, emb):
    from scylla_cdc_java_spark.datapipe import (
        embedding_neardup_bruteforce,
        embedding_neardup_lsh,
    )

    bf = {(r["id_a"], r["id_b"]) for r in
          embedding_neardup_bruteforce(emb, threshold=0.3).collect()}
    assert bf, "no near-dup pairs at threshold 0.3"
    lsh = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_lsh(emb, threshold=0.3, n_planes=4).collect()}
    assert lsh <= bf  # exact-verify step => no false positives
    assert len(lsh) / len(bf) >= 0.3, "LSH recall collapsed"


def test_ann_ivf_recall_vs_bruteforce(spark, emb):
    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.datapipe import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = cosine_topk_bruteforce(emb, queries, k=5).collect()
    ivf = cosine_topk_ivf(emb, queries, k=5, n_lists=8, nprobe=4).collect()
    bf_set = {(r["query_id"], r["neighbor_id"]) for r in bf}
    iv_set = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(bf_set & iv_set) / len(bf_set)
    assert recall >= 0.6, f"IVF recall too low: {recall}"


def test_multimodal_resize_and_frames_and_features(spark, docs):
    from scylla_cdc_java_spark.datapipe import (
        feature_extract_stub,
        frame_sample_stub,
        resize_stub,
    )
    from scylla_cdc_java_spark.datapipe.multimodal import to_binary_assets

    assets = to_binary_assets(docs.limit(50))
    rs = resize_stub(assets, target_w=64, target_h=64).collect()
    assert all(r["width"] == 64 and r["height"] == 64 for r in rs)
    assert all(r["n_bytes"] == len(bytes(r["asset"])) for r in rs)

    fr = frame_sample_stub(assets, every_n=4)
    per_doc = fr.groupBy("doc_id").count().collect()
    assert len(per_doc) == 50  # every asset yields >=1 frame row
    one = fr.where("doc_id = 0").collect()
    assert all(r["frame_idx"] % 4 == 0 for r in one)

    ft = feature_extract_stub(assets).collect()
    assert all(len(r["features"]) == 16 for r in ft)
    assert all(abs(sum(r["features"]) - 1.0) < 1e-3 for r in ft)


def test_dedup_clusters_connected_components(spark):
    """Min-label propagation must find true connected components:
    a 4-chain (non-transitive pairs), a triangle, an isolated pair —
    cluster id = min member, keep only the canonical doc."""
    from scylla_cdc_java_spark.datapipe import dedup_clusters, dedup_keep_list

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain: {1,2,3,4}
         (10, 11), (11, 12), (10, 12),    # triangle: {10,11,12}
         (20, 21)],                       # pair: {20,21}
        schema="id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}
    keep = {
        r["doc_id"]: r["keep"] for r in dedup_keep_list(pairs).collect()
    }
    assert [d for d, k in sorted(keep.items()) if k] == [1, 10, 20]


def test_dedup_clusters_string_ids(spark):
    """Non-numeric doc ids (URL-ish corpus keys): ids keep their native
    type — the old cast("long") turned these into NULLs that merged
    everything into one bogus component. Cluster id = lexicographic min
    member; NULL ids raise instead of silently mis-clustering."""
    import pytest as _pytest

    from scylla_cdc_java_spark.datapipe import dedup_clusters, dedup_keep_list

    pairs = spark.createDataFrame(
        [("doc/b", "doc/a"), ("doc/b", "doc/c"),   # {a,b,c} -> doc/a
         ("www/x", "www/y")],                      # {x,y}   -> www/x
        schema="id_a string, id_b string",
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup_clusters(pairs).collect()}
    assert got == {"doc/a": "doc/a", "doc/b": "doc/a", "doc/c": "doc/a",
                   "www/x": "www/x", "www/y": "www/x"}
    keep = {r["doc_id"]: r["keep"]
            for r in dedup_keep_list(pairs).collect()}
    assert sorted(d for d, k in keep.items() if k) == ["doc/a", "www/x"]

    bad = spark.createDataFrame(
        [("doc/a", None), ("doc/b", "doc/c")],
        schema="id_a string, id_b string",
    )
    with _pytest.raises(ValueError, match="NULL doc ids"):
        dedup_clusters(bad)


def test_dedup_clusters_long_chain_converges(spark):
    """A 30-node path is the adversarial diameter case: min-label moves
    one hop per round, so it needs ~30 rounds — convergence with a
    generous max_iter must be exact, and an INSUFFICIENT max_iter must
    raise rather than silently return truncated (wrong) clusters."""
    import pytest as _pytest

    from scylla_cdc_java_spark.datapipe import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], schema="id_a long, id_b long"
    )
    got = dedup_clusters(pairs, max_iter=40).collect()
    assert all(r["cluster_id"] == 0 for r in got) and len(got) == 31
    with _pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(pairs, max_iter=3)
