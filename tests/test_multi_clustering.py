"""Multi-column clustering keys (reference: the replicator prepares a
ranged DELETE per clustering-prefix length x inclusivity,
Main.java:394-416). The engine's range tombstones carry prefix bounds
(arrays over the clustering columns, NULL past the prefix) and the merge
applies prefix-lexicographic coverage; verified end-to-end against the
generalized Python oracle on a 2-column clustering table."""

import pyspark.sql.functions as F  # noqa: F401 (parity with sibling tests)

from scylla_cdc_java_spark import Engine
from scylla_cdc_java_spark.model import EngineConfig, TableConfig
from scylla_cdc_java_spark.oracle import OracleState, apply_event, final_state

TBL = TableConfig(
    name="doc_sections",
    partition_key=("repo",),
    clustering_key=("chapter", "section"),
    value_columns=("title", "body"),
)

GEN0 = 1_700_000_000_000
SID_A = b"A" * 16
SID_B = b"B" * 16


def _events():
    """Hand-built event list: writes across (chapter, section), full
    2-column range bounds, a 1-column PREFIX range bound, row/partition
    deletes, resurrecting writes."""
    seq = [0]

    def ev(op, ms_off, sid=SID_A, repo="r/x", chapter=None, section=None,
           title=None, body=None, del_title=None, del_body=None):
        seq[0] += 1
        return {
            "op": op, "ms": GEN0 + ms_off, "seq": seq[0], "stream_id": sid,
            "repo": repo, "chapter": chapter, "section": section,
            "title": title, "body": body,
            "del_title": del_title, "del_body": del_body, "ttl": None,
        }

    evs = []
    # seed rows: chapters c1..c3, sections s0..s4
    t = 0
    for ch in ("c1", "c2", "c3"):
        for sec in ("s0", "s1", "s2", "s3", "s4"):
            t += 10
            evs.append(ev(2, t, chapter=ch, section=sec,
                          title=f"T-{ch}-{sec}", body=f"B-{ch}-{sec}"))
    # full 2-column range delete: (c1, s1) inclusive .. (c1, s3) exclusive
    evs.append(ev(5, 200, chapter="c1", section="s1"))
    evs.append(ev(7 + 1, 200, chapter="c1", section="s3"))  # op 8 exclusive
    # PREFIX range delete: whole chapter c2 (length-1 bounds)
    evs.append(ev(5, 300, sid=SID_B, chapter="c2", section=None))
    evs.append(ev(7, 300, sid=SID_B, chapter="c2", section=None))
    # row delete by full key + partition delete on another repo
    evs.append(ev(3, 400, chapter="c3", section="s4"))
    evs.append(ev(2, 410, repo="r/y", chapter="c9", section="s9",
                  title="yt", body="yb"))
    evs.append(ev(4, 420, repo="r/y"))
    # resurrect one deleted row and one whole-chapter victim
    evs.append(ev(1, 500, chapter="c1", section="s2", body="resurrected"))
    evs.append(ev(2, 510, chapter="c2", section="s0", title="back"))
    # partial update with explicit NULL write
    evs.append(ev(1, 520, chapter="c3", section="s0", del_title=True))
    return evs


def _write_log(spark, evs, out_dir, gens=None):
    gens = gens or [(GEN0, [SID_A, SID_B])]
    gstarts = [g for g, _ in gens]

    def gen_of(ms):
        return max(g for g in gstarts if g <= ms)

    rows = [
        (
            e["stream_id"], {"ms": e["ms"], "seq": e["seq"]}, e["op"], e["ttl"],
            e["repo"], e["chapter"], e["section"], e["title"], e["body"],
            e["del_title"], e["del_body"],
            gen_of(e["ms"]), 0 if e["stream_id"] == SID_A else 1,
            e["ms"] // 600_000,
        )
        for e in evs
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, `cdc$ttl` long, "
        "repo string, chapter string, section string, "
        "title string, body string, "
        "`cdc$deleted_title` boolean, `cdc$deleted_body` boolean, "
        "generation long, stream_group int, time_bucket long"
    )
    df = spark.createDataFrame(rows, schema=ddl)
    log_dir = f"{out_dir}/cdc_log"
    (df.write.mode("overwrite")
       .partitionBy("generation", "stream_group", "time_bucket")
       .parquet(log_dir))
    gdf = spark.createDataFrame(
        gens, schema="time long, streams array<binary>"
    )
    gpath = f"{out_dir}/generations.parquet"
    gdf.coalesce(1).write.mode("overwrite").parquet(gpath)
    return log_dir, gpath


def test_two_column_clustering_range_deletes(spark, tmp_root):
    evs = _events()
    log_dir, gpath = _write_log(spark, evs, f"{tmp_root}/mck")

    eng = Engine(
        spark, log_dir, gpath, f"{tmp_root}/mck_target",
        table=TBL, cfg=EngineConfig(),
    )
    eng.replay()

    st = OracleState(table=TBL)
    for e in evs:
        apply_event(st, e)
    want = final_state(st)

    got = [
        {c: r[c] for c in ("repo", "chapter", "section", "title", "body")}
        for r in sorted(
            eng.sink.read().collect(),
            key=lambda r: (r["repo"], r["chapter"], r["section"]),
        )
    ]
    assert got == want, (
        f"engine={got}\noracle={want}"
    )
    # semantic spot checks: the full-bound range killed (c1,s1) and
    # (c1,s2) (hi exclusive spared s3); the prefix bound killed all of
    # c2; resurrections are visible
    keys = {(r["chapter"], r["section"]) for r in got if r["repo"] == "r/x"}
    assert ("c1", "s1") not in keys
    assert ("c1", "s3") in keys
    assert ("c1", "s2") in keys  # resurrected at t=500
    assert not any(ch == "c2" and s != "s0" for ch, s in keys)
    assert ("c2", "s0") in keys  # resurrected at t=510
    assert not any(r["repo"] == "r/y" for r in got)  # partition delete


def test_windowed_multi_ck_carryover(spark, tmp_root):
    """Force the range pair to split across fetch windows so the prefix
    bound travels through the checkpoint (pending_ranges) as an array.
    The epoch-0 backfill window is crop-exempt, so the split must happen
    inside generation 2 where the 30s cap applies."""
    gen1 = GEN0 + 600_000
    seq = [0]

    def ev(op, ms, chapter=None, section=None, title=None):
        seq[0] += 1
        return {
            "op": op, "ms": ms, "seq": seq[0], "stream_id": SID_A,
            "repo": "r/x", "chapter": chapter, "section": section,
            "title": title, "body": None,
            "del_title": None, "del_body": None, "ttl": None,
        }

    evs = [
        ev(2, GEN0 + 10, "c1", "s0", "t0"),
        ev(2, GEN0 + 20, "c1", "s1", "t1"),
        ev(2, GEN0 + 30, "c2", "s0", "t2"),
        # generation 2: start in window 1 (prefix bound over chapter c1)
        ev(5, gen1 + 25_000, "c1", None),
        # ...end lands in window 2 (window cap 30s)
        ev(7, gen1 + 35_000, "c1", None),
        ev(2, gen1 + 40_000, "c1", "s1", "alive-again"),
    ]
    log_dir, gpath = _write_log(spark, evs, f"{tmp_root}/mckw",
                                gens=[(GEN0, [SID_A]), (gen1, [SID_A])])
    eng = Engine(
        spark, log_dir, gpath, f"{tmp_root}/mckw_target",
        table=TBL, cfg=EngineConfig(window_length_limit_ms=30_000),
    )
    stats = eng.replay()
    assert stats.windows >= 3  # gen1 backfill + >=2 capped gen2 windows

    st = OracleState(table=TBL)
    for e in evs:
        apply_event(st, e)
    want = final_state(st)
    got = [
        {c: r[c] for c in ("repo", "chapter", "section", "title", "body")}
        for r in sorted(
            eng.sink.read().collect(),
            key=lambda r: (r["repo"], r["chapter"], r["section"]),
        )
    ]
    assert got == want
    keys = {(r["chapter"], r["section"]) for r in got}
    assert ("c1", "s0") not in keys  # killed by the cross-window range
    assert ("c1", "s1") in keys  # resurrected after the range ts
    assert ("c2", "s0") in keys  # outside the prefix bound


def test_clustering_in_range_expr_matches_oracle_comparator(spark):
    """Bulk cross-check of the JVM prefix-range expression against the
    oracle's pure-Python prefix comparator over randomized rows/bounds
    (full-length and prefix bounds, all inclusivity combinations)."""
    import random

    from scylla_cdc_java_spark.operators.tombstones import clustering_in_range
    from scylla_cdc_java_spark.oracle import _prefix_cmp

    rng = random.Random(77)
    vals = ["a", "b", "c", "d", "e"]
    cases = []
    for _ in range(600):
        row = (rng.choice(vals), rng.choice(vals))
        lo_len = rng.randint(1, 2)
        hi_len = rng.randint(1, 2)
        lo = [rng.choice(vals) for _ in range(lo_len)] + [None] * (2 - lo_len)
        hi = [rng.choice(vals) for _ in range(hi_len)] + [None] * (2 - hi_len)
        cases.append((row[0], row[1], lo, rng.random() < 0.5,
                      hi, rng.random() < 0.5))

    df = spark.createDataFrame(
        cases,
        "c1 string, c2 string, lo array<string>, lo_incl boolean, "
        "hi array<string>, hi_incl boolean",
    )
    got = [
        r["in_range"]
        for r in df.select(
            clustering_in_range(
                [F.col("c1"), F.col("c2")],
                F.struct("lo", "lo_incl", "hi", "hi_incl"),
            ).alias("in_range")
        ).collect()
    ]
    for (c1, c2, lo, lo_incl, hi, hi_incl), g in zip(cases, got):
        clo = _prefix_cmp((c1, c2), tuple(lo))
        chi = _prefix_cmp((c1, c2), tuple(hi))
        want = (clo > 0 or (clo == 0 and lo_incl)) and (
            chi < 0 or (chi == 0 and hi_incl)
        )
        assert g == want, (c1, c2, lo, lo_incl, hi, hi_incl, g, want)
