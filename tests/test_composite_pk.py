"""Composite (multi-column) partition keys — the reference binds EVERY
partition-key column on every statement (replicator Main.java:176-198).
Round 2 hashed/joined only the first partition column (latent mis-join
of partition tombstones); round 3 generalizes the bucket hash, the
partition-tombstone ledger, and the oracle to the full column tuple.

The hazard this pins: a PARTITION_DELETE for (org1, repoA) must kill
exactly that partition — not every repo of org1 (first-column join) and
not repoA under a different org."""

from scylla_cdc_java_spark import Engine
from scylla_cdc_java_spark.model import EngineConfig, TableConfig
from scylla_cdc_java_spark.oracle import OracleState, apply_event, final_state

TBL = TableConfig(
    name="org_repo_content",
    partition_key=("org", "repo"),
    clustering_key=("path",),
    value_columns=("content",),
)

GEN0 = 1_700_000_000_000
SID_A = b"A" * 16
SID_B = b"B" * 16


def _events():
    seq = [0]

    def ev(op, ms_off, sid=SID_A, org="o1", repo="rA", path=None,
           content=None, del_content=None):
        seq[0] += 1
        return {
            "op": op, "ms": GEN0 + ms_off, "seq": seq[0], "stream_id": sid,
            "org": org, "repo": repo, "path": path,
            "content": content, "del_content": del_content, "ttl": None,
        }

    evs = []
    t = 0
    # same repo name under two orgs; two repos under one org
    for org, repo in (("o1", "rA"), ("o1", "rB"), ("o2", "rA")):
        for p in ("f0", "f1", "f2", "f3"):
            t += 10
            evs.append(ev(2, t, org=org, repo=repo, path=p,
                          content=f"{org}/{repo}/{p}"))
    # partition delete of EXACTLY (o1, rA)
    evs.append(ev(4, 200, org="o1", repo="rA"))
    # range delete inside (o2, rA): [f1, f2]
    evs.append(ev(5, 300, sid=SID_B, org="o2", repo="rA", path="f1"))
    evs.append(ev(7, 300, sid=SID_B, org="o2", repo="rA", path="f2"))
    # row delete in (o1, rB)
    evs.append(ev(3, 400, org="o1", repo="rB", path="f3"))
    # resurrect one (o1, rA) row after its partition delete
    evs.append(ev(1, 500, org="o1", repo="rA", path="f0", content="back"))
    # late lower-ts write into the deleted partition: must STAY dead
    # (tombstone shadows by timestamp — oracle covering_tomb semantics)
    evs.append(ev(1, 150, org="o1", repo="rA", path="f1", content="late"))
    return evs


def _write_log(spark, evs, out_dir):
    gens = [(GEN0, [SID_A, SID_B])]
    rows = [
        (
            e["stream_id"], {"ms": e["ms"], "seq": e["seq"]}, e["op"],
            e["ttl"], e["org"], e["repo"], e["path"], e["content"],
            e["del_content"], GEN0,
            0 if e["stream_id"] == SID_A else 1, e["ms"] // 600_000,
        )
        for e in evs
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, `cdc$ttl` long, "
        "org string, repo string, path string, content string, "
        "`cdc$deleted_content` boolean, "
        "generation long, stream_group int, time_bucket long"
    )
    df = spark.createDataFrame(rows, schema=ddl)
    log_dir = f"{out_dir}/cdc_log"
    (df.write.mode("overwrite")
       .partitionBy("generation", "stream_group", "time_bucket")
       .parquet(log_dir))
    gdf = spark.createDataFrame(gens, schema="time long, streams array<binary>")
    gpath = f"{out_dir}/generations.parquet"
    gdf.coalesce(1).write.mode("overwrite").parquet(gpath)
    return log_dir, gpath


def test_composite_partition_key_end_to_end(spark, tmp_root):
    evs = _events()
    log_dir, gpath = _write_log(spark, evs, f"{tmp_root}/cpk")
    eng = Engine(
        spark, log_dir, gpath, f"{tmp_root}/cpk_target",
        table=TBL, cfg=EngineConfig(num_buckets=4),
    )
    eng.replay()

    st = OracleState(table=TBL)
    for e in sorted(evs, key=lambda e: (e["ms"], e["seq"])):
        apply_event(st, e)
    want = final_state(st)
    for r in want:
        r.pop("content_sha256", None)

    got = [
        {c: r[c] for c in ("org", "repo", "path", "content")}
        for r in sorted(
            eng.sink.read().collect(),
            key=lambda r: (r["org"], r["repo"], r["path"]),
        )
    ]
    assert got == want, f"engine={got}\noracle={want}"

    keys = {(r["org"], r["repo"], r["path"]) for r in got}
    # the partition delete hit ONLY (o1, rA): sibling repo and same-name
    # repo under the other org survive in full
    assert {p for o, r, p in keys if (o, r) == ("o1", "rB")} == {
        "f0", "f1", "f2"}  # f3 row-deleted
    assert {p for o, r, p in keys if (o, r) == ("o2", "rA")} == {
        "f0", "f3"}  # f1/f2 range-deleted
    # inside (o1, rA): only the post-tombstone resurrection is visible;
    # the late lower-ts write stayed shadowed
    assert {p for o, r, p in keys if (o, r) == ("o1", "rA")} == {"f0"}
    assert [r["content"] for r in got
            if (r["org"], r["repo"], r["path"]) == ("o1", "rA", "f0")] == ["back"]


def test_composite_partition_key_bucket_colocation(spark, tmp_root):
    """All rows of one composite partition land in ONE bucket (the hash
    covers every partition column), so partition/range deletes touch
    exactly one bucket at 100 TB too."""
    import pyspark.sql.functions as F

    from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

    sink = ParquetMergeSink(spark, f"{tmp_root}/cpk_b", TBL, num_buckets=8)
    df = spark.createDataFrame(
        [("o1", "rA", f"p{i}") for i in range(50)]
        + [("o1", "rB", f"p{i}") for i in range(50)],
        schema="org string, repo string, path string",
    )
    per_key = (
        df.withColumn("b", sink._bucket_expr())
        .groupBy("org", "repo")
        .agg(F.countDistinct("b").alias("nb"))
        .collect()
    )
    assert all(r["nb"] == 1 for r in per_key)
    # and the two partitions are NOT forced into the same bucket by a
    # first-column-only hash (org alone would collide them)
    buckets = {
        (r["org"], r["repo"]): r["b"]
        for r in df.withColumn("b", sink._bucket_expr())
        .select("org", "repo", "b").distinct().collect()
    }
    assert buckets[("o1", "rA")] != buckets[("o1", "rB")]
