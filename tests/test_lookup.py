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


def test_driver_side_routing_parity(spark):
    """Round 6: lookup() routes its bucket driver-side via the
    pure-Python XXH64 (sinks/bloom.py). Pin bit-parity of the
    composite-key chain against the JVM's xxhash64 on randomized
    multi-part string keys, and pmod parity on the signed residue."""
    import random
    import string

    from pyspark.sql import functions as F

    from scylla_cdc_java_spark.sinks.bloom import (
        bucket_for_key,
        xxhash64_strings,
    )

    rng = random.Random(20260821)
    cases = [("",), ("a",), ("repo", "path"), ("org1/r", "src/müller.py"),
             ("中文", "路径/子路径"), ("a" * 100, "b" * 37, "c")]
    for _ in range(40):
        n = rng.randint(1, 3)
        cases.append(tuple(
            "".join(rng.choice(string.printable[:94])
                    for _ in range(rng.randint(0, 40)))
            for _ in range(n)
        ))
    rows = []
    for vals in cases:
        nb = rng.choice([1, 2, 8, 32, 131072])
        jvm = spark.range(1).select(
            F.xxhash64(*[F.lit(v) for v in vals]).alias("h"),
            F.pmod(F.xxhash64(*[F.lit(v) for v in vals]),
                   F.lit(nb)).cast("int").alias("b"),
        ).collect()[0]
        py_h = xxhash64_strings(vals)
        py_signed = py_h - (1 << 64) if py_h >= 1 << 63 else py_h
        assert py_signed == jvm["h"], vals
        assert bucket_for_key(list(vals), nb) == jvm["b"], (vals, nb)
        rows.append(vals)
    assert len(rows) == len(cases)


def test_lookup_runs_zero_routing_jobs(spark, tmp_root):
    """Constructing a lookup() DataFrame must launch NO Spark job —
    routing is driver-side; the only job is the pruned read the caller
    executes. (The pre-round-6 code ran a 1-row job per lookup.)"""
    import os

    from scylla_cdc_java_spark import Engine, EngineConfig, generate_to_dir
    from scylla_cdc_java_spark.generator import GenSpec

    spec = GenSpec(seed=91, n_events=800, n_repos=10, paths_per_repo=4,
                   n_generations=1, streams_per_generation=2,
                   gen_span_ms=30_000)
    info = generate_to_dir(spec, os.path.join(tmp_root, "lk0w"))
    eng = Engine(spark, info["log_dir"], info["generations_path"],
                 os.path.join(tmp_root, "lk0t"),
                 cfg=EngineConfig(window_length_limit_ms=30_000))
    eng.replay()
    row = eng.sink.read().select("repo", "path").first()
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    df = eng.sink.lookup((row["repo"],), row["path"])  # no action yet
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "lookup() construction launched a Spark job"
    got = df.collect()
    assert any(r["repo"] == row["repo"] and r["path"] == row["path"]
               for r in got)
