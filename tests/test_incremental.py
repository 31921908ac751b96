"""Incremental datapipe maintenance (datapipe/incremental.py): a
MinHash signature index kept in lockstep with the CDC-maintained table,
synced after every window, must (a) rescan only the buckets each window
touched, and (b) end value-identical to a full recompute over the final
table — including rows that were updated or deleted along the way and
buckets reshaped by compaction.
"""

from pyspark.sql import functions as F

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.datapipe.dedup import minhash_signatures
from scylla_cdc_java_spark.datapipe.incremental import IncrementalMinHashIndex
from scylla_cdc_java_spark.model import EngineConfig

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
