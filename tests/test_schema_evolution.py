"""Schema evolution across batches (SURVEY.md section 7 rule 5; the
reference adapts per-row via row.getColumnDefinitions(), replicator
Main.java:141 — add/drop column needs no code path). Our batch engine
derives the active column set from each batch's schema; the sink's
manifest unions value columns over time."""

from pyspark.sql import functions as F

from scylla_cdc_java_spark.model import (
    EngineConfig,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableConfig,
    pack_time,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

SID = b"\x07" * 16


def _mk_batch(spark, rows, columns):
    """rows: list of dicts with op, ms, seq, repo, path + value cols."""
    data = []
    for r in rows:
        data.append(
            (
                SID,
                {"ms": r["ms"], "seq": r["seq"]},
                r["op"],
                *[r.get(c) for c in columns],
            )
        )
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, "
        + ", ".join(f"`{c}` string" for c in columns)
    )
    return normalize_log(spark.createDataFrame(data, schema=ddl))


def test_add_and_drop_column_across_batches(spark, tmp_root):
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/evo_target", table, num_buckets=4)

    # batch 1: original schema
    b1 = _mk_batch(
        spark,
        [
            {"op": OP_ROW_INSERT, "ms": 10, "seq": 0, "repo": "o/r1",
             "path": "a.py", "commit": "c1", "lang": "py", "content": "x1"},
            {"op": OP_ROW_INSERT, "ms": 11, "seq": 1, "repo": "o/r1",
             "path": "b.py", "commit": "c2", "lang": "py", "content": "x2"},
        ],
        ["repo", "path", "commit", "lang", "content"],
    )
    sink.merge(fold_batch(b1, table), {"step": 1})

    # batch 2: `size_bytes` ADDED, `lang` DROPPED from the log schema
    b2 = _mk_batch(
        spark,
        [
            {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
             "path": "a.py", "size_bytes": "1234"},
            {"op": OP_ROW_INSERT, "ms": 21, "seq": 1, "repo": "o/r1",
             "path": "c.py", "commit": "c3", "content": "x3",
             "size_bytes": "99"},
        ],
        ["repo", "path", "commit", "content", "size_bytes"],
    )
    sink.merge(fold_batch(b2, table), {"step": 2})

    rows = {r["path"]: r.asDict() for r in sink.read().collect()}
    assert set(rows) == {"a.py", "b.py", "c.py"}
    # added column: backfilled NULL for untouched rows, set where written
    assert rows["a.py"]["size_bytes"] == "1234"
    assert rows["b.py"]["size_bytes"] is None
    assert rows["c.py"]["size_bytes"] == "99"
    # dropped column: prior values preserved, absent in new writes
    assert rows["a.py"]["lang"] == "py"
    assert rows["c.py"]["lang"] is None
    # untouched cells keep values across the evolution
    assert rows["a.py"]["commit"] == "c1" and rows["a.py"]["content"] == "x1"

    # batch 3: lang REAPPEARS (re-add) — cell-level LWW still holds
    b3 = _mk_batch(
        spark,
        [{"op": OP_ROW_UPDATE, "ms": 30, "seq": 0, "repo": "o/r1",
          "path": "c.py", "lang": "rs"}],
        ["repo", "path", "lang"],
    )
    sink.merge(fold_batch(b3, table), {"step": 3})
    rows = {r["path"]: r.asDict() for r in sink.read().collect()}
    assert rows["c.py"]["lang"] == "rs"
    assert rows["c.py"]["size_bytes"] == "99"
    assert sink.manifest()["value_columns"] == [
        "commit", "lang", "content", "size_bytes"
    ]


def test_collection_column_added_mid_log(spark, tmp_root):
    """A non-frozen collection column appearing mid-log (the reference's
    per-row column enumeration adapts to ANY new column, Main.java:141):
    batches before the evolution merged without `tags`; a sink restarted
    with the evolved TableConfig reads the old segments with NULL tags
    and merges new element writes on top. The manifest carries
    collection_columns like value_columns (schema registry)."""
    # phase 1: world has no tags column at all
    t1 = TableConfig()
    sink1 = ParquetMergeSink(spark, f"{tmp_root}/cevo_target", t1, num_buckets=4)
    b1 = _mk_batch(
        spark,
        [{"op": OP_ROW_INSERT, "ms": 10, "seq": 0, "repo": "o/r1",
          "path": "a.py", "commit": "c1", "lang": "py", "content": "x1"}],
        ["repo", "path", "commit", "lang", "content"],
    )
    sink1.merge(fold_batch(b1, t1), {"step": 1})
    assert sink1.manifest()["collection_columns"] == []

    # phase 2: restart with the evolved schema; log now carries tags
    t2 = TableConfig(collection_columns=("tags",))
    sink2 = ParquetMergeSink(spark, f"{tmp_root}/cevo_target", t2, num_buckets=4)
    data = [
        (SID, {"ms": 20, "seq": 0}, OP_ROW_UPDATE, "o/r1", "a.py",
         {"k1": "v1"}, None, None),
        (SID, {"ms": 21, "seq": 1}, OP_ROW_INSERT, "o/r1", "b.py",
         {"k2": "v2"}, None, None),
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, repo string, path string, "
        "tags map<string,string>, `cdc$deleted_tags` boolean, "
        "`cdc$deleted_elements_tags` array<string>"
    )
    b2 = normalize_log(spark.createDataFrame(data, schema=ddl))
    sink2.merge(fold_batch(b2, t2), {"step": 2})
    assert sink2.manifest()["collection_columns"] == ["tags"]

    rows = {r["path"]: r.asDict() for r in sink2.read().collect()}
    assert dict(rows["a.py"]["tags"]) == {"k1": "v1"}
    assert dict(rows["b.py"]["tags"]) == {"k2": "v2"}
    # pre-evolution cells survive next to the new column
    assert rows["a.py"]["commit"] == "c1" and rows["a.py"]["content"] == "x1"

    # phase 3: compaction folds old+new segments under the evolved schema
    sink2.compact()
    rows = {r["path"]: r.asDict() for r in sink2.read().collect()}
    assert dict(rows["a.py"]["tags"]) == {"k1": "v1"}
    assert rows["a.py"]["lang"] == "py"

    # a sink restarted with the OLD config still sees the evolved schema
    # (manifest wins over TableConfig — the registry property)
    sink3 = ParquetMergeSink(spark, f"{tmp_root}/cevo_target", t1, num_buckets=4)
    assert sink3.manifest()["collection_columns"] == ["tags"]
    rows = {r["path"]: r.asDict() for r in sink3.read().collect()}
    assert dict(rows["b.py"]["tags"]) == {"k2": "v2"}
