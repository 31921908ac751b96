"""Point-lookup serving path: ``sink.lookup(pk)`` resolves the key's
bucket driver-side and reads ONLY that bucket's segments — O(one
bucket) regardless of table size — and on a compacted bucket the pk
equality reaches the parquet scan as a pushed filter."""

from pyspark.sql import functions as F

from scylla_cdc_java_spark.model import (
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    TableConfig,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

SID = b"\x0d" * 16
COLS = ["repo", "path", "commit", "lang", "content"]


def _batch(spark, rows):
    data = [
        (SID, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
         *[r.get(c) for c in COLS])
        for r in rows
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, "
        + ", ".join(f"`{c}` string" for c in COLS)
    )
    return normalize_log(spark.createDataFrame(data, schema=ddl))


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted")
    )


def test_point_lookup_prunes_and_pushes_down(spark, tmp_root):
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/lk_target", table,
                            num_buckets=16)
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}
    rows = [
        {**ins, "ms": 10, "seq": i, "repo": f"o/r{i}", "path": "a.py",
         "content": f"v{i}"}
        for i in range(8)
    ] + [
        {**ins, "ms": 11, "seq": 8, "repo": "o/r1", "path": "b.py",
         "content": "v1b"},
    ]
    sink.merge(fold_batch(_batch(spark, rows), table), {"step": 1})

    # whole-partition lookup: both clustering rows of o/r1, nothing else
    part = sorted(
        (r["path"], r["content"]) for r in sink.lookup("o/r1").collect())
    assert part == [("a.py", "v1"), ("b.py", "v1b")]

    # single-row lookup
    one = sink.lookup("o/r1", "b.py").collect()
    assert len(one) == 1 and one[0]["content"] == "v1b"

    # absent key: empty, same schema as read()
    assert sink.lookup("o/zzz").count() == 0

    # loud misuse: extra clustering values would silently truncate via
    # zip; a non-string key value would hash to the WRONG bucket
    import pytest
    with pytest.raises(ValueError, match="clustering"):
        sink.lookup("o/r1", ("a.py", "extra"))
    with pytest.raises(TypeError, match="must be str"):
        sink.lookup(123)
    # clustering PREFIX (fewer values) stays a valid slice-style read
    assert sink.lookup("o/r1", ()).count() == 2

    # the scan opened ONLY the key's bucket
    b = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit("o/r1")), F.lit(16)).cast("int").alias("b")
    ).collect()[0]["b"]
    files = sink.lookup("o/r1").inputFiles()
    assert files and all(f"__bucket={b}/" in f for f in files)

    # after compaction the bucket is a single resolved base segment:
    # the raw-scan fast path restores filter pushdown, so the pk
    # equality prunes row groups INSIDE the bucket too
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 0, "repo": "o/r2",
         "path": "a.py"},
    ]), table), {"step": 2})
    sink.compact()
    plan = _explain(sink.lookup("o/r1", "a.py"))
    assert "PushedFilters" in plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("repo" in ln and "path" in ln for ln in pushed), pushed
    assert sink.lookup("o/r1", "a.py").collect()[0]["content"] == "v1"
    assert sink.lookup("o/r2").count() == 0  # deleted partition

    # compacted base files are pk-sorted, so parquet row-group min/max
    # stats form tight key ranges (what makes the pushed pk filter
    # actually skip row groups inside the bucket)
    import glob

    import pyarrow.parquet as pq

    base_files = glob.glob(
        f"{tmp_root}/lk_target/data/*/base/__bucket=*/*.parquet")
    assert base_files
    for f in base_files:
        t = pq.read_table(f, columns=["repo", "path"])
        keys = list(zip(t["repo"].to_pylist(), t["path"].to_pylist()))
        assert keys == sorted(keys), f
