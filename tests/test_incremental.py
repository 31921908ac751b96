"""Incremental datapipe maintenance (datapipe/incremental.py): a
MinHash signature index kept in lockstep with the CDC-maintained table,
synced after every window, must (a) rescan only the buckets each window
touched, and (b) end value-identical to a full recompute over the final
table — including rows that were updated or deleted along the way and
buckets reshaped by compaction.
"""

import json
import os
import subprocess
import sys
import threading
import time

from pyspark.sql import functions as F

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.datapipe.dedup import minhash_signatures
from scylla_cdc_java_spark.datapipe.incremental import IncrementalMinHashIndex
from scylla_cdc_java_spark.model import EngineConfig

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPEC = GenSpec(seed=88, n_events=1500, n_repos=40, paths_per_repo=6,
               n_generations=2, streams_per_generation=4,
               gen_span_ms=120_000)


def _full_recompute(sink):
    docs = sink.read().select(
        F.concat_ws("\x1f", "repo", "path").alias("_doc_key"),
        F.coalesce("content", F.lit("")).alias("_text"),
    )
    return minhash_signatures(docs, text_col="_text", id_col="_doc_key")


def _collect_sigs(df, key_col="_doc_key"):
    return sorted((r[key_col], tuple(r["sig"])) for r in df.collect())


def _inc_view(idx):
    return idx.signatures().select(
        F.concat_ws("\x1f", "repo", "path").alias("_doc_key"), "sig")


def test_incremental_sync_matches_full_recompute(spark, tmp_root):
    world = generate_world(SPEC)
    info = write_world(world, f"{tmp_root}/inc_world")
    target = f"{tmp_root}/inc_target"
    cfg = EngineConfig(window_length_limit_ms=30_000, num_buckets=64,
                       compact_threshold=4)
    eng = Engine(spark, info["log_dir"], info["generations_path"], target,
                 cfg=cfg)
    idx = IncrementalMinHashIndex(spark, f"{tmp_root}/inc_index",
                                  text_col="content")

    sync_log = []
    real_merge = eng.sink.merge

    def merge_and_sync(*a, **kw):
        stats = real_merge(*a, **kw)
        sync_log.append(idx.sync(eng.sink))
        return stats

    eng.sink.merge = merge_and_sync
    stats = eng.replay()
    assert stats.windows >= 2 and len(sync_log) >= 2

    # (a) incrementality: after the first sync, later windows rescan
    # only their touched buckets — strictly fewer than the index holds
    total_buckets = len(eng.sink._load_root()["bucket_index"])
    later = sync_log[1:]
    assert any(0 < len(s["changed"]) < total_buckets for s in later), (
        [len(s["changed"]) for s in sync_log], total_buckets)

    # (b) equality with a full recompute over the final table
    eng.sink.merge = real_merge
    assert _collect_sigs(_inc_view(idx)) == _collect_sigs(
        _full_recompute(eng.sink))

    # idle sync: nothing changed -> nothing rescanned
    s = idx.sync(eng.sink)
    assert s["changed"] == [] and s["removed"] == []

    # compaction reshapes every touched bucket's manifest entry; the
    # fingerprints change, the sync rescans, equality holds
    eng.sink.compact()
    s = idx.sync(eng.sink)
    assert len(s["changed"]) > 0
    assert _collect_sigs(_inc_view(idx)) == _collect_sigs(
        _full_recompute(eng.sink))

    # the maintained index answers LSH candidate queries directly
    pairs = idx.lsh_candidates(id_cols=["repo", "path"]).collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)


def test_sync_drops_deleted_buckets(spark, tmp_root):
    """A bucket whose rows are ALL deleted (then compacted away) must
    leave the index entirely — the emptied/removed paths."""
    from scylla_cdc_java_spark.model import (
        OP_PARTITION_DELETE,
        OP_ROW_INSERT,
        TableConfig,
    )
    from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    tbl = TableConfig()
    cols = ["repo", "path", "commit", "lang", "content"]
    sid = b"\x0d" * 16

    def batch(rows):
        data = [
            (sid, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
             *[r.get(c) for c in cols])
            for r in rows
        ]
        ddl = (
            "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
            "`cdc$operation` tinyint, "
            + ", ".join(f"`{c}` string" for c in cols)
        )
        return normalize_log(spark.createDataFrame(data, schema=ddl))

    sink = ParquetMergeSink(spark, f"{tmp_root}/del_idx_tbl", table=tbl,
                            num_buckets=8, compact_threshold=1)
    sink.merge(fold_batch(batch([
        {"op": OP_ROW_INSERT, "ms": 1000, "seq": 0, "repo": "r1",
         "path": "a", "commit": "c1", "lang": "py",
         "content": "alpha beta gamma"},
        {"op": OP_ROW_INSERT, "ms": 1000, "seq": 1, "repo": "r2",
         "path": "b", "commit": "c2", "lang": "py",
         "content": "delta epsilon zeta"},
    ]), tbl))
    idx = IncrementalMinHashIndex(spark, f"{tmp_root}/del_idx",
                                  text_col="content")
    idx.sync(sink)
    assert len(_collect_sigs(_inc_view(idx))) == 2

    sink.merge(fold_batch(batch([
        {"op": OP_PARTITION_DELETE, "ms": 2000, "seq": 0, "repo": "r2",
         "path": None},
    ]), tbl))
    sink.compact()
    s = idx.sync(sink)
    got = _collect_sigs(_inc_view(idx))
    assert len(got) == 1 and got[0][0].startswith("r1")
    assert s["changed"] or s["removed"]

    # delete the LAST surviving row too: a fully-empty index is a valid
    # state — data() serves zero rows off the persisted schema instead
    # of claiming the index was never synced
    sink.merge(fold_batch(batch([
        {"op": OP_PARTITION_DELETE, "ms": 3000, "seq": 0, "repo": "r1",
         "path": None},
    ]), tbl))
    sink.compact()
    idx.sync(sink)
    empty = idx.data()
    assert empty.count() == 0
    assert "sig" in empty.columns


def test_external_index_maintainer_during_replay(spark, tmp_root):
    """The real deployment shape: ``tools/index_maintainer.py`` in a
    SEPARATE OS process keeps a MinHash index in lockstep while the
    engine replays a multi-window world (with the writer's own
    piggyback compaction racing it). No coordination between the two
    processes exists or is needed — each sync reads one atomically-
    published root, and a sync racing a commit is caught up exactly by
    the next fingerprint diff. The final index must equal a full
    recompute over the final table.

    Determinism: the engine's watermark clock is HELD at mid-log until
    the maintainer's out-file proves a live data-bearing sync, then
    released — the writer cannot finish before the maintainer has
    demonstrably tracked it mid-replay, no matter how loaded the host
    is (the previous load-sensitive form of this test flaked when the
    maintainer's JVM boot outlasted the whole replay)."""
    spec = GenSpec(seed=33, n_events=2500, n_repos=25, paths_per_repo=8,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=300_000, p_range_delete=0.05)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/im_world")
    target = f"{tmp_root}/im_target"
    index_dir = f"{tmp_root}/im_index"
    out = f"{tmp_root}/maintainer.jsonl"
    t0 = spec.gen0_start_ms
    gate = {"ms": t0 + 150_000}  # watermark mid-gen-0: ONE commit lands

    def read_rounds():
        if not os.path.exists(out):
            return []
        with open(out) as fh:
            return [json.loads(line) for line in fh if line.strip()]

    proc = subprocess.Popen(
        [sys.executable,
         os.path.join(REPO_ROOT, "tools", "index_maintainer.py"),
         target, index_dir, "--kind", "minhash", "--interval", "0.3",
         "--until-done", "--max-rounds", "400", "--cores", "2",
         "--out", out],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        eng = Engine(
            spark, info["log_dir"], info["generations_path"], target,
            clock=lambda: gate["ms"],
            # many small windows; piggyback compaction ON so external
            # syncs also race compaction-reshaped manifests
            cfg=EngineConfig(window_length_limit_ms=20_000,
                             compact_threshold=8, sleep_scale=0.01),
        )
        res: dict = {}

        def run_replay():
            try:
                res["stats"] = eng.replay()
            except BaseException as exc:  # surfaced after join
                res["exc"] = exc

        th = threading.Thread(target=run_replay, daemon=True)
        th.start()
        # hold until the maintainer has synced the mid-log commit while
        # the writer is provably still running (gate held => not done)
        deadline = time.time() + 240
        saw_live = False
        while time.time() < deadline and proc.poll() is None:
            if any(r["changed"] and not r["writer_done"]
                   for r in read_rounds()):
                saw_live = True
                break
            time.sleep(0.2)
        # release: watermark passes the whole log (+ late-writes slack)
        gate["ms"] = t0 + 2 * spec.gen_span_ms + 100_000
        th.join(timeout=300)
        assert not th.is_alive(), "replay did not finish after release"
        if "exc" in res:
            raise res["exc"]
        assert saw_live, read_rounds()
        stats = res["stats"]
        assert stats.windows >= 10, stats.windows
        proc.wait(timeout=300)
    finally:
        gate["ms"] = t0 + 2 * spec.gen_span_ms + 100_000
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert proc.returncode == 0

    rounds = read_rounds()
    # exit is the FIXPOINT: done observed AND nothing left to rescan
    assert rounds and rounds[-1]["writer_done"]
    assert rounds[-1]["changed"] == 0 and rounds[-1]["removed"] == 0
    # the maintainer tracked a MOVING table: a data-bearing sync landed
    # while the writer was live (guaranteed by the clock gate), and the
    # post-release catch-up synced at least one LATER table version
    live = [r for r in rounds if r["changed"] and not r["writer_done"]]
    assert live, [(r["changed"], r["writer_done"]) for r in rounds]
    versions = {r["table_version"] for r in rounds if r["changed"]}
    assert len(versions) >= 2, rounds

    # the externally-maintained index equals a full recompute; an
    # in-process catch-up sync over the same state dir is a no-op
    idx = IncrementalMinHashIndex(spark, index_dir, text_col="content")
    s = idx.sync(eng.sink)
    assert s["changed"] == [] and s["removed"] == []
    assert _collect_sigs(_inc_view(idx)) == _collect_sigs(
        _full_recompute(eng.sink))


def test_writer_compactor_and_maintainer_trio(spark, tmp_root):
    """The full concurrent stack, three OS processes, zero
    coordination: the engine replays (writer) while an external
    compactor compacts AND vacuums (files are actually reaped:
    retain-snapshots 1, short grace) and an external index maintainer
    syncs a MinHash index. The maintainer's bucket reads survive the
    vacuum because readers drop cross-process lease files the vacuum
    honors. Final table must be oracle-exact and the final index must
    equal a full recompute."""
    from scylla_cdc_java_spark.oracle import final_state, replay

    spec = GenSpec(seed=35, n_events=2500, n_repos=25, paths_per_repo=8,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=300_000, p_range_delete=0.05)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/trio_world")
    target = f"{tmp_root}/trio_target"
    index_dir = f"{tmp_root}/trio_index"
    m_out = f"{tmp_root}/trio_maintainer.jsonl"
    c_out = f"{tmp_root}/trio_compactor.jsonl"

    compactor = subprocess.Popen(
        [sys.executable, os.path.join(REPO_ROOT, "tools", "compactor.py"),
         target, "--interval", "1", "--max-rounds", "200", "--until-done",
         "--grace", "10", "--retain-snapshots", "1", "--cores", "2",
         "--out", c_out],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    maintainer = subprocess.Popen(
        [sys.executable,
         os.path.join(REPO_ROOT, "tools", "index_maintainer.py"),
         target, index_dir, "--kind", "minhash", "--interval", "0.3",
         "--until-done", "--max-rounds", "400", "--cores", "2",
         "--out", m_out],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        eng = Engine(
            spark, info["log_dir"], info["generations_path"], target,
            # piggyback compaction OFF: every compaction/vacuum is the
            # external compactor's, racing the maintainer's reads
            cfg=EngineConfig(window_length_limit_ms=20_000,
                             compact_threshold=10**6),
        )
        stats = eng.replay()
        assert stats.windows >= 10, stats.windows
        maintainer.wait(timeout=240)
        compactor.wait(timeout=240)
    finally:
        for p in (maintainer, compactor):
            if p.poll() is None:
                p.kill()
                p.wait()
    assert maintainer.returncode == 0
    assert compactor.returncode == 0

    c_rounds = [json.loads(line) for line in open(c_out)]
    assert any(r["compacted"] for r in c_rounds), \
        "external compactor never landed a compaction"
    # mid-replay syncs happened (incrementality-under-quiet-compaction
    # is asserted by test_external_index_maintainer_during_replay; here
    # the per-second whole-table compactor legitimately invalidates
    # every bucket's fingerprint between syncs — the claim under test
    # is survival + exactness, not touch-scoping)
    m_rounds = [json.loads(line) for line in open(m_out)]
    assert any(r["changed"] > 0 and not r["writer_done"]
               for r in m_rounds), m_rounds

    # final table oracle-exact
    want = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in final_state(replay(world["events"]))
    )
    got = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in eng.sink.read().collect()
    )
    assert got == want

    # final index == full recompute over the final table
    idx = IncrementalMinHashIndex(spark, index_dir, text_col="content")
    assert _collect_sigs(_inc_view(idx)) == _collect_sigs(
        _full_recompute(eng.sink))


# ---------------------------------------------------------------------------
# SimHash incremental index
# ---------------------------------------------------------------------------

def test_incremental_simhash_matches_full_recompute(spark, tmp_root):
    from scylla_cdc_java_spark.datapipe.dedup import simhash_buckets
    from scylla_cdc_java_spark.datapipe.incremental import (
        IncrementalSimHashIndex,
    )

    def full_recompute(sink):
        docs = sink.read().select(
            F.concat_ws("\x1f", "repo", "path").alias("_doc_key"),
            F.coalesce("content", F.lit("")).alias("_text"),
        )
        return sorted(
            (r["_doc_key"], r["simhash"])
            for r in simhash_buckets(
                docs, text_col="_text", id_col="_doc_key").collect()
        )

    def inc_view(idx):
        return sorted(
            (r["_doc_key"], r["simhash"])
            for r in idx.signatures().select(
                F.concat_ws("\x1f", "repo", "path").alias("_doc_key"),
                "simhash").collect()
        )

    world = generate_world(SPEC)
    info = write_world(world, f"{tmp_root}/sh_world")
    target = f"{tmp_root}/sh_target"
    cfg = EngineConfig(window_length_limit_ms=30_000, num_buckets=64,
                       compact_threshold=4)
    eng = Engine(spark, info["log_dir"], info["generations_path"], target,
                 cfg=cfg)
    idx = IncrementalSimHashIndex(spark, f"{tmp_root}/sh_index",
                                  text_col="content")

    sync_log = []
    real_merge = eng.sink.merge

    def merge_and_sync(*a, **kw):
        stats = real_merge(*a, **kw)
        sync_log.append(idx.sync(eng.sink))
        return stats

    eng.sink.merge = merge_and_sync
    stats = eng.replay()
    eng.sink.merge = real_merge
    assert stats.windows >= 2 and len(sync_log) >= 2

    # (a) incrementality: later windows rescan only their touched buckets
    total_buckets = len(eng.sink._load_root()["bucket_index"])
    assert any(0 < len(s["changed"]) < total_buckets for s in sync_log[1:]), (
        [len(s["changed"]) for s in sync_log], total_buckets)

    # (b) equality with a full recompute over the final table
    assert inc_view(idx) == full_recompute(eng.sink)

    # idle sync: nothing changed -> nothing rescanned
    s = idx.sync(eng.sink)
    assert s["changed"] == [] and s["removed"] == []

    # compaction reshapes manifests; resync rescans; equality holds
    eng.sink.compact()
    s = idx.sync(eng.sink)
    assert len(s["changed"]) > 0
    assert inc_view(idx) == full_recompute(eng.sink)

    # the maintained index answers prefix-bucket candidate queries
    # directly; pairs are ordered and consistent with the signatures:
    # a candidate pair shares the top prefix_bits of its simhashes
    pairs = idx.candidates(id_cols=["repo", "path"]).collect()
    assert all(r["id_a"] < r["id_b"] for r in pairs)
    sigs = dict(inc_view(idx))
    for r in pairs:
        pa = (sigs[r["id_a"]] & ((1 << 64) - 1)) >> (64 - idx.prefix_bits)
        pb = (sigs[r["id_b"]] & ((1 << 64) - 1)) >> (64 - idx.prefix_bits)
        assert pa == pb, (r, pa, pb)


def test_sync_across_schema_evolution(spark, tmp_root):
    """Schema evolution must be invisible to a bucket-synced index: a
    batch ADDING a column (and one omitting ``content`` entirely)
    changes the table's union schema mid-maintenance, while the index
    keeps its own stable (pk, sig) shape and stays equal to a full
    recompute — the read path serves registry columns as NULL where
    unwritten and the index only consumes pk + text_col."""
    from scylla_cdc_java_spark.model import OP_ROW_INSERT, OP_ROW_UPDATE, TableConfig
    from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    tbl = TableConfig()
    sid = b"\x0e" * 16

    def batch(rows, cols):
        data = [
            (sid, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
             *[r.get(c) for c in cols])
            for r in rows
        ]
        ddl = (
            "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
            "`cdc$operation` tinyint, "
            + ", ".join(f"`{c}` string" for c in cols)
        )
        return normalize_log(spark.createDataFrame(data, schema=ddl))

    sink = ParquetMergeSink(spark, f"{tmp_root}/evo_idx_tbl", table=tbl,
                            num_buckets=8)
    idx = IncrementalMinHashIndex(spark, f"{tmp_root}/evo_idx",
                                  text_col="content")

    # batch 1: original schema
    sink.merge(fold_batch(batch([
        {"op": OP_ROW_INSERT, "ms": 10, "seq": 0, "repo": "r1", "path": "a",
         "commit": "c1", "lang": "py", "content": "alpha beta gamma"},
        {"op": OP_ROW_INSERT, "ms": 11, "seq": 1, "repo": "r2", "path": "b",
         "commit": "c2", "lang": "py", "content": "delta epsilon"},
    ], ["repo", "path", "commit", "lang", "content"]), tbl))
    idx.sync(sink)

    # batch 2: size_bytes ADDED, content updated through the NEW schema
    sink.merge(fold_batch(batch([
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "r1", "path": "a",
         "content": "alpha beta gamma zeta", "size_bytes": "21"},
    ], ["repo", "path", "content", "size_bytes"]), tbl))
    idx.sync(sink)

    # batch 3: content ABSENT from the log schema entirely — the row's
    # stored content must survive and the index must not see churn in
    # the untouched doc's signature
    sink.merge(fold_batch(batch([
        {"op": OP_ROW_UPDATE, "ms": 30, "seq": 0, "repo": "r2", "path": "b",
         "size_bytes": "13"},
    ], ["repo", "path", "size_bytes"]), tbl))
    idx.sync(sink)

    assert _collect_sigs(_inc_view(idx)) == _collect_sigs(
        _full_recompute(sink))
    # the evolved column is really in the table (evolution happened)
    assert "size_bytes" in sink.read().columns
    # and really NOT in the index (stable index schema)
    assert "size_bytes" not in idx.signatures().columns


# ---------------------------------------------------------------------------
# IVF incremental index
# ---------------------------------------------------------------------------

def _full_ivf(sink, idx):
    """Full recompute of (key, list, emb) over the sink's CURRENT state
    with the index's fixed quantizer — what the maintained index must
    equal."""
    from scylla_cdc_java_spark.datapipe.similarity import (
        _centroid_dots_expr,
        argmax_expr,
        hashed_embeddings,
    )

    docs = sink.read().select(
        F.concat_ws("\x1f", "repo", "path").alias("_doc_key"),
        F.coalesce("content", F.lit("")).alias("_text"),
    )
    emb = hashed_embeddings(docs, text_col="_text", id_col="_doc_key",
                            dim=idx.dim, shingle_k=idx.shingle_k)
    out = emb.withColumn(
        "list", argmax_expr(_centroid_dots_expr(F.col("emb"),
                                                idx.centroids())))
    return sorted((r["_doc_key"], r["list"], tuple(r["emb"]))
                  for r in out.collect())


def _collect_ivf(idx):
    return sorted(
        (r["_doc_key"], r["list"], tuple(r["emb"]))
        for r in idx.assignments().select(
            F.concat_ws("\x1f", "repo", "path").alias("_doc_key"),
            "list", "emb").collect()
    )


def test_incremental_ivf_matches_full_recompute(spark, tmp_root):
    from scylla_cdc_java_spark.datapipe.incremental import IncrementalIVFIndex

    world = generate_world(SPEC)
    info = write_world(world, f"{tmp_root}/ivf_world")
    target = f"{tmp_root}/ivf_target"
    cfg = EngineConfig(window_length_limit_ms=30_000, num_buckets=64,
                       compact_threshold=4)
    eng = Engine(spark, info["log_dir"], info["generations_path"], target,
                 cfg=cfg)
    idx = IncrementalIVFIndex(spark, f"{tmp_root}/ivf_index",
                              text_col="content", dim=16, n_lists=4)

    sync_log = []
    real_merge = eng.sink.merge

    def merge_and_sync(*a, **kw):
        stats = real_merge(*a, **kw)
        sync_log.append(idx.sync(eng.sink))
        return stats

    eng.sink.merge = merge_and_sync
    stats = eng.replay()
    eng.sink.merge = real_merge
    assert stats.windows >= 2 and len(sync_log) >= 2

    # (a) incrementality: later windows rescan only their touched buckets
    total_buckets = len(eng.sink._load_root()["bucket_index"])
    assert any(0 < len(s["changed"]) < total_buckets for s in sync_log[1:]), (
        [len(s["changed"]) for s in sync_log], total_buckets)

    # (b) the quantizer trained once (first data-bearing sync) and the
    # maintained assignments equal a full recompute over the final table
    assert idx.centroids() is not None
    assert _collect_ivf(idx) == _full_ivf(eng.sink, idx)

    # idle sync: nothing changed -> nothing rescanned
    s = idx.sync(eng.sink)
    assert s["changed"] == [] and s["removed"] == []

    # compaction reshapes manifests; resync rescans; equality holds and
    # the quantizer did NOT retrain (membership-only maintenance)
    cn_before = idx.centroids().tolist()
    eng.sink.compact()
    s = idx.sync(eng.sink)
    assert len(s["changed"]) > 0
    assert idx.centroids().tolist() == cn_before
    assert _collect_ivf(idx) == _full_ivf(eng.sink, idx)

    # a fresh process (new instance, same path) loads the persisted
    # quantizer and assigns identically
    idx2 = IncrementalIVFIndex(spark, f"{tmp_root}/ivf_index",
                               text_col="content", dim=16, n_lists=4)
    assert idx2.centroids().tolist() == cn_before
    assert idx2.sync(eng.sink)["changed"] == []

    # ANN off the maintained index: querying a doc's own content must
    # surface that doc among the top hits at cosine ~1
    row = eng.sink.read().where(F.col("content").isNotNull()) \
        .orderBy("repo", "path").first()
    qdf = spark.createDataFrame([(0, row["content"])], "qid int, text string")
    hits = idx.search(qdf, k=5, nprobe=2).collect()
    assert hits and all(h["rank"] <= 5 for h in hits)
    want_key = f"{row['repo']}\x1f{row['path']}"
    assert any(h["doc_key"] == want_key and h["cosine"] > 0.999
               for h in hits), hits


def test_hashed_embeddings_match_python_mirror(spark):
    from scylla_cdc_java_spark.datapipe.golden import _hashed_embedding
    from scylla_cdc_java_spark.datapipe.similarity import hashed_embeddings

    texts = ["alpha beta gamma delta", "x", "", "one two one two one",
             "  spaced   out   tokens  "]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id int, text string")
    got = {r["doc_id"]: list(r["emb"])
           for r in hashed_embeddings(df, dim=16, shingle_k=3).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _hashed_embedding(t, 3, 16), (i, t)


def test_ivf_centroid_training_partition_order_invariant(spark, tmp_root):
    """The trained quantizer must not depend on Spark partitioning: the
    md5 orderBy selects WHICH docs train it, but hashed_embeddings'
    group-by destroys row order, and _kmeans_centroids' seeded init
    indexes into the collected array — without the driver-side re-sort
    two maintainers with different --cores would train different
    centroids over the identical table."""
    import numpy as np

    from scylla_cdc_java_spark.datapipe.incremental import IncrementalIVFIndex

    docs = spark.createDataFrame(
        [(f"k{i}", f"alpha beta {i % 7} gamma delta {i}")
         for i in range(60)],
        "_doc_key string, _text string")
    cn1 = IncrementalIVFIndex(
        spark, f"{tmp_root}/ivf_det1", dim=16, n_lists=4
    )._ensure_centroids(docs.repartition(1))
    cn2 = IncrementalIVFIndex(
        spark, f"{tmp_root}/ivf_det2", dim=16, n_lists=4
    )._ensure_centroids(docs.repartition(7))
    assert np.array_equal(cn1, cn2), "centroids depend on partitioning"


def test_ivf_index_files_sorted_by_list(spark, tmp_root):
    """Each written IVF index FILE must be sorted by `list` so parquet
    row-group min/max stats prune by-list ANN probes — the sort has to
    ride the write path AFTER the bucket repartition (a sort applied
    before it is shuffled away, the round-5-initial bug)."""
    import glob as _glob

    from scylla_cdc_java_spark.datapipe.incremental import IncrementalIVFIndex
    from scylla_cdc_java_spark.model import OP_ROW_INSERT, TableConfig
    from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    tbl = TableConfig()
    cols = ["repo", "path", "commit", "lang", "content"]
    sid = b"\x0e" * 16
    rows = [
        {"op": OP_ROW_INSERT, "ms": 1000, "seq": i, "repo": f"r{i % 6}",
         "path": f"p{i}", "commit": "c", "lang": "py",
         "content": f"word{i % 11} alpha {i} beta {i % 5} gamma"}
        for i in range(48)
    ]
    data = [
        (sid, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
         *[r.get(c) for c in cols])
        for r in rows
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, "
        + ", ".join(f"`{c}` string" for c in cols)
    )
    batch = normalize_log(spark.createDataFrame(data, schema=ddl))
    sink = ParquetMergeSink(spark, f"{tmp_root}/ivfsort_tbl", table=tbl,
                            num_buckets=4)
    sink.merge(fold_batch(batch, tbl), {"step": 1})
    idx = IncrementalIVFIndex(spark, f"{tmp_root}/ivfsort_idx",
                              text_col="content", dim=16, n_lists=4)
    idx.sync(sink)
    files = _glob.glob(f"{tmp_root}/ivfsort_idx/ivf/**/*.parquet",
                       recursive=True)
    assert files
    checked = 0
    for f in files:
        lists = [r["list"] for r in spark.read.parquet(f)
                 .select("list").collect()]
        assert lists == sorted(lists), (f, lists)
        checked += len(lists)
    assert checked == 48
