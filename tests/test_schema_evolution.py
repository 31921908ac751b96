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
