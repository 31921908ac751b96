"""Change feed (CDC-out) between table snapshots — sinks/changefeed.py.

The engine ingests CDC; ``sink.changes(v_from, v_to)`` emits it back
out as a row-level net diff (insert / delete / update_preimage /
update_postimage), pruned to the buckets whose manifest fingerprint
moved. Checked three ways: direct classification on hand-built
batches, consumer-side reconstruction (old snapshot + feed == new
snapshot), and an engine-replay diff against the pure-Python oracle
replayed to the same window boundary (collections included)."""

import os

from pyspark.sql import functions as F

from scylla_cdc_java_spark import Engine, GenSpec, generate_world, write_world
from scylla_cdc_java_spark.model import (
    EngineConfig,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    TableConfig,
    pack_time,
)
from scylla_cdc_java_spark.operators.fold import fold_batch, normalize_log
from scylla_cdc_java_spark.oracle import final_state, replay
from scylla_cdc_java_spark.sinks.changefeed import (
    CHANGE_TYPE_COL,
    CT_UPDATE_POST,
    CT_UPDATE_PRE,
    apply_changes,
    changed_buckets,
)
from scylla_cdc_java_spark.sinks.parquet_merge import ParquetMergeSink

SID = b"\x0c" * 16
COLS = ["repo", "path", "commit", "lang", "content"]


def _batch(spark, rows, columns=COLS):
    data = [
        (SID, {"ms": r["ms"], "seq": r["seq"]}, r["op"],
         *[r.get(c) for c in columns])
        for r in rows
    ]
    ddl = (
        "`cdc$stream_id` binary, `cdc$time` struct<ms:long,seq:long>, "
        "`cdc$operation` tinyint, "
        + ", ".join(f"`{c}` string" for c in columns)
    )
    return normalize_log(spark.createDataFrame(data, schema=ddl))


def _feed_rows(sink, v_from, v_to=None):
    return sorted(
        (
            (r["repo"], r["path"], r[CHANGE_TYPE_COL], r["commit"],
             r["lang"], r["content"])
            for r in sink.changes(v_from, v_to).collect()
        )
    )


def _bucket_of(spark, sink, repo: str) -> int:
    return (
        spark.createDataFrame([(repo,)], "repo string")
        .select(sink._bucket_expr().alias("b"))
        .collect()[0]["b"]
    )


def test_insert_update_delete_and_pruning(spark, tmp_root):
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/cf_target", table,
                            num_buckets=16)
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}
    b1 = _batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "v1"},
        {**ins, "ms": 10, "seq": 1, "repo": "o/r2", "path": "a.py",
         "content": "w1"},
        {**ins, "ms": 10, "seq": 2, "repo": "o/r3", "path": "a.py",
         "content": "x1"},
    ])
    sink.merge(fold_batch(b1, table), {"step": 1})
    v1 = sink.manifest()["version"]

    b2 = _batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py", "content": "v2"},
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 1, "repo": "o/r2",
         "path": "a.py"},
        {**ins, "ms": 20, "seq": 2, "repo": "o/r4", "path": "a.py",
         "content": "y1"},
    ])
    sink.merge(fold_batch(b2, table), {"step": 2})
    v2 = sink.manifest()["version"]

    got = _feed_rows(sink, v1, v2)
    assert got == sorted([
        ("o/r1", "a.py", "update_preimage", "c0", "py", "v1"),
        ("o/r1", "a.py", "update_postimage", "c0", "py", "v2"),
        ("o/r2", "a.py", "delete", "c0", "py", "w1"),
        ("o/r4", "a.py", "insert", "c0", "py", "y1"),
    ])

    # pruning: only the buckets batch 2 touched are diffed — o/r3's
    # bucket must not be in the changed set (its fingerprint is stable)
    changed = set(changed_buckets(sink, v1, v2))
    touched = {_bucket_of(spark, sink, r) for r in ("o/r1", "o/r2", "o/r4")}
    untouched = _bucket_of(spark, sink, "o/r3")
    assert changed == touched
    assert untouched not in changed

    # consumer-side reconstruction: v1 snapshot + feed == v2 snapshot
    vals = ["commit", "lang", "content"]
    rebuilt = apply_changes(
        sink.read(version=v1), sink.changes(v1, v2),
        pk=["repo", "path"], vals=vals,
    )
    key = lambda r: (r["repo"], r["path"])
    assert sorted(map(tuple, rebuilt.collect()), key=str) == sorted(
        map(tuple, sink.read(version=v2).select(
            "repo", "path", *vals).collect()), key=str)

    # same-version feed: empty, with the public schema + change type
    same = sink.changes(v2, v2)
    assert same.count() == 0
    assert same.columns == ["repo", "path", *vals, CHANGE_TYPE_COL]

    # compaction is value-neutral: a feed spanning only a compaction
    # commit is empty even though every touched fingerprint moved
    sink.compact()
    v3 = sink.manifest()["version"]
    assert v3 > v2
    assert sink.changes(v2, v3).count() == 0

    # a reversed version pair would emit a plausible INVERTED feed —
    # it must raise instead
    import pytest
    with pytest.raises(ValueError, match="newer than"):
        sink.changes(v2, v1)


def test_schema_evolution_across_feed(spark, tmp_root):
    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/cf_evo", table,
                            num_buckets=4)
    b1 = _batch(spark, [
        {"op": OP_ROW_INSERT, "ms": 10, "seq": 0, "repo": "o/r1",
         "path": "a.py", "commit": "c1", "lang": "py", "content": "x1"},
    ])
    sink.merge(fold_batch(b1, table), {"step": 1})
    v1 = sink.manifest()["version"]

    # batch 2 ADDS size_bytes (and updates the existing row through it)
    b2 = _batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py", "size_bytes": "123"},
        {"op": OP_ROW_INSERT, "ms": 20, "seq": 1, "repo": "o/r2",
         "path": "b.py", "commit": "c2", "size_bytes": "456"},
    ], columns=["repo", "path", "commit", "size_bytes"])
    sink.merge(fold_batch(b2, table), {"step": 2})
    v2 = sink.manifest()["version"]

    feed = {
        (r["repo"], r["path"], r[CHANGE_TYPE_COL]):
            (r["commit"], r["lang"], r["content"], r["size_bytes"])
        for r in sink.changes(v1, v2).collect()
    }
    # the added column rides post-images; the pre-image (written before
    # the evolution) reports it as NULL — the union-schema alignment
    assert feed[("o/r1", "a.py", "update_preimage")] == (
        "c1", "py", "x1", None)
    assert feed[("o/r1", "a.py", "update_postimage")] == (
        "c1", "py", "x1", "123")
    assert feed[("o/r2", "b.py", "insert")] == ("c2", None, None, "456")
    assert len(feed) == 3


def test_cursor_resumable_consumption(spark, tmp_root):
    """ChangeFeedCursor: bootstrap-as-inserts, poll/commit advance,
    crash redelivery (poll without commit re-delivers the same span),
    and an idempotent consumer-side mirror staying equal to the table
    at every commit point."""
    from scylla_cdc_java_spark.sinks.changefeed import ChangeFeedCursor

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/cur_target", table,
                            num_buckets=8)
    cur = ChangeFeedCursor(sink, f"{tmp_root}/cursor.json")
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}

    # polling a table with NO commits yet must not crash (no v0
    # snapshot exists) — and blindly committing that token is a no-op
    feed0, tok0 = cur.poll()
    assert feed0 is None
    cur.commit(tok0)
    assert cur.position() is None

    def consume(mirror, feed_rows):
        # idempotent consumer apply: delete/preimage removes, insert/
        # postimage upserts — applying the same batch twice is a no-op
        for r in feed_rows:
            k = (r["repo"], r["path"])
            if r[CHANGE_TYPE_COL] in ("delete", "update_preimage"):
                mirror.pop(k, None)
        for r in feed_rows:
            k = (r["repo"], r["path"])
            if r[CHANGE_TYPE_COL] in ("insert", "update_postimage"):
                mirror[k] = r["content"]
        return mirror

    def table_state():
        return {(r["repo"], r["path"]): r["content"]
                for r in sink.read().collect()}

    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "v1"},
        {**ins, "ms": 10, "seq": 1, "repo": "o/r2", "path": "a.py",
         "content": "w1"},
    ]), table), {"step": 1})

    # bootstrap: whole snapshot as inserts
    feed, tok = cur.poll()
    rows = feed.collect()
    assert {r[CHANGE_TYPE_COL] for r in rows} == {"insert"}
    mirror = consume({}, rows)
    cur.commit(tok)
    assert mirror == table_state()
    assert cur.poll()[0] is None  # caught up

    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py", "content": "v2"},
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 1, "repo": "o/r2",
         "path": "a.py"},
    ]), table), {"step": 2})

    # crash between poll and commit: the span is re-delivered intact
    feed1, tok1 = cur.poll()
    rows1 = sorted(map(tuple, feed1.collect()))
    feed2, tok2 = cur.poll()
    assert sorted(map(tuple, feed2.collect())) == rows1
    assert tok1 == tok2
    # double-apply (redelivery) is a no-op on the mirror
    mirror = consume(mirror, feed1.collect())
    mirror = consume(mirror, feed2.collect())
    cur.commit(tok2)
    assert mirror == table_state()
    assert cur.poll()[0] is None
    assert cur.position() == sink.manifest()["version"]

    # checkpoint-only commits (idle windows) bump the version counter
    # WITHOUT writing a snapshot; the cursor anchors on snapshots and
    # must neither crash on the snapshot-less head nor move
    sink.commit_checkpoint({"idle": True})
    assert sink.manifest()["version"] > cur.position()
    feed3, tok3 = cur.poll()
    assert feed3 is None
    cur.commit(tok3)
    assert cur.position() < sink.manifest()["version"]


def test_cursor_lagging_past_retention_fails_loudly(spark, tmp_root):
    """The retention contract: a cursor whose committed snapshot was
    vacuumed must get a FileNotFoundError naming the missing version —
    never a silently-wrong diff."""
    import pytest

    from scylla_cdc_java_spark.sinks.changefeed import ChangeFeedCursor

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/lag_target", table,
                            num_buckets=4, reader_lease_s=0)
    cur = ChangeFeedCursor(sink, f"{tmp_root}/lag_cursor.json")
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "v1"},
    ]), table), {"step": 1})
    feed, tok = cur.poll()
    feed.count()
    cur.commit(tok)
    for i in range(3):
        sink.merge(fold_batch(_batch(spark, [
            {"op": OP_ROW_UPDATE, "ms": 20 + i, "seq": 0, "repo": "o/r1",
             "path": "a.py", "content": f"v{2 + i}"},
        ]), table), {"step": 2 + i})
    sink.vacuum(retain_snapshots=1)
    with pytest.raises(FileNotFoundError, match="vacuumed|not found"):
        cur.poll()[0].count()


def test_cursor_lease_protects_snapshot_from_vacuum(spark, tmp_root):
    """A LIVE cursor's committed snapshot survives an aggressive
    ``vacuum(retain_snapshots=1)`` via its cursor lease (the consumer
    doesn't depend on the operator guessing the retention count right);
    an ABANDONED consumer's expired lease is reaped by the same vacuum,
    restoring the count-based contract and its loud failure mode."""
    import time as _time

    import pytest

    from scylla_cdc_java_spark.sinks.changefeed import ChangeFeedCursor

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/cl_target", table,
                            num_buckets=4)
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "v1"},
    ]), table), {"step": 1})
    cur = ChangeFeedCursor(sink, f"{tmp_root}/cl_cursor.json")
    feed, tok = cur.poll()
    feed.count()
    cur.commit(tok)
    committed = cur.position()
    for i in range(3):
        sink.merge(fold_batch(_batch(spark, [
            {"op": OP_ROW_UPDATE, "ms": 20 + i, "seq": 0, "repo": "o/r1",
             "path": "a.py", "content": f"v{2 + i}"},
        ]), table), {"step": 2 + i})
    # count-based retention alone would reap the cursor's snapshot
    # (test_cursor_lagging_past_retention_fails_loudly proves exactly
    # that with leases disabled via reader_lease_s=0)
    sink.vacuum(retain_snapshots=1)
    assert committed in sink.snapshots()
    feed, tok = cur.poll()  # resumes across the vacuum: correct net span
    got = {(r["content"], r[CHANGE_TYPE_COL]) for r in feed.collect()}
    assert got == {("v1", CT_UPDATE_PRE), ("v4", CT_UPDATE_POST)}
    cur.commit(tok)

    # abandoned consumer (own table, so the live cursor above can't
    # shield it): tiny TTL, then more writes + vacuum after expiry —
    # the lease file is reaped, the snapshot goes with it, and the
    # lagging cursor fails loudly instead of diffing wrong. The tiny
    # reader_lease_s also shrinks the publication grace (young
    # snapshots are retained for one lease interval on tables with
    # live cursors) so the vacuum is prompt here.
    sink2 = ParquetMergeSink(spark, f"{tmp_root}/cl_target2", table,
                             num_buckets=4, reader_lease_s=0.05)
    sink2.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "v1"},
    ]), table), {"step": 1})
    cur2 = ChangeFeedCursor(sink2, f"{tmp_root}/cl_cursor2.json",
                            lease_ttl_s=0.05)
    feed, tok = cur2.poll()
    feed.count()
    cur2.commit(tok)
    stale_v = cur2.position()
    for i in range(3):
        sink2.merge(fold_batch(_batch(spark, [
            {"op": OP_ROW_UPDATE, "ms": 40 + i, "seq": 0, "repo": "o/r1",
             "path": "a.py", "content": f"w{i}"},
        ]), table), {"step": 10 + i})
    _time.sleep(0.1)
    sink2.vacuum(retain_snapshots=1)
    assert stale_v not in sink2.snapshots()
    with pytest.raises(FileNotFoundError, match="vacuumed|not found"):
        cur2.poll()[0].count()


def test_bootstrap_poll_leases_target_and_commit_refuses_reaped(
        spark, tmp_root):
    """The BOOTSTRAP poll (no committed position) leases its target
    head the instant it is chosen, so a long first batch cannot have
    the target's manifest vacuumed out from under the later
    ``commit()`` — the quad campaign's second observed failure mode:
    file-level read leases pin a snapshot's DATA files but not its
    manifest, so a bootstrap job stalled past the publication grace
    used to succeed and then commit a version whose manifest was
    already reaped, poisoning the cursor into a next-poll retention
    lapse. Also pins the defense-in-depth: ``commit()`` of a version
    whose manifest IS gone (leases disabled / TTL exceeded) raises the
    tagged error and leaves the cursor at its previous position
    instead of recording a dead version."""
    import json as _json
    import os as _os

    import pytest

    from scylla_cdc_java_spark.sinks.changefeed import ChangeFeedCursor

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/bl_target", table,
                            num_buckets=4)
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "v1"},
    ]), table), {"step": 1})
    cur = ChangeFeedCursor(sink, f"{tmp_root}/bl_cursor.json")
    feed, tok = cur.poll()  # bootstrap: leases the target BEFORE reading
    target_v = tok["version"]

    # the lease landed at poll time, under the id persisted in the
    # (pre-first-commit) state file — one lease file per consumer
    st = _json.load(open(f"{tmp_root}/bl_cursor.json"))
    assert st["version"] is None and st["id"]
    lease = _json.load(
        open(_os.path.join(sink.path, "cursors", f"{st['id']}.json")))
    assert target_v in lease["versions"]

    # writer races ahead + max vacuum pressure DURING the bootstrap
    # batch: the leased target must survive for the later commit
    for i in range(3):
        sink.merge(fold_batch(_batch(spark, [
            {"op": OP_ROW_UPDATE, "ms": 20 + i, "seq": 0, "repo": "o/r1",
             "path": "a.py", "content": f"v{2 + i}"},
        ]), table), {"step": 2 + i})
    sink.vacuum(retain_snapshots=1)
    assert target_v in sink.snapshots()
    assert feed.count() == 1  # the batch still executes
    cur.commit(tok)  # and records a live version
    assert cur.position() == target_v

    # defense-in-depth: commit() of a reaped version raises the tagged
    # error and does NOT move the cursor (the caller's retry loop then
    # re-polls a live head; the idempotent apply reconverges)
    feed2, tok2 = cur.poll()
    _os.remove(_os.path.join(
        sink.path, "manifests", f"v{tok2['version']}.json"))
    with pytest.raises(FileNotFoundError, match="not found"):
        cur.commit(tok2)
    assert cur.position() == target_v


def test_mirror_crash_recovery_rebuilds_staged_buckets(
        spark, tmp_root, monkeypatch):
    """A crash between the mirror's partition write and its cursor
    commit makes the next span a strict SUPERSET — whose net diff
    never mentions a key whose value REVERTED across it, so the diff
    path alone would leave the crashed write's intermediate image in
    the mirror forever. The staged-bucket sidecar marks the touched
    buckets untrusted; the recovering sync rebuilds them from the
    target snapshot."""
    import pytest

    from scylla_cdc_java_spark.sinks.changefeed import (
        ChangeFeedCursor,
        ParquetMirror,
    )

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/sr_target", table,
                            num_buckets=4)
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "X"},
    ]), table), {"step": 1})
    mirror = ParquetMirror(spark, f"{tmp_root}/sr_mirror")
    mirror.sync(sink)  # clean bootstrap at content=X

    # crashed sync: partitions absorb content=Y, cursor never moves
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py", "content": "Y"},
    ]), table), {"step": 2})
    real_commit = ChangeFeedCursor.commit
    monkeypatch.setattr(ChangeFeedCursor, "commit",
                        lambda self, tok: (_ for _ in ()).throw(
                            RuntimeError("crash before cursor commit")))
    with pytest.raises(RuntimeError, match="crash"):
        mirror.sync(sink)
    monkeypatch.setattr(ChangeFeedCursor, "commit", real_commit)
    assert mirror._load_staged(mirror.position()), \
        "crash window must leave staged buckets"
    got = {r["content"] for r in mirror.read().collect()}
    assert got == {"Y"}, "precondition: the crashed write landed"

    # the value REVERTS to X: the recovery span's net diff is empty
    # for this key, so only the staged snapshot-rebuild can repair it
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 30, "seq": 0, "repo": "o/r1",
         "path": "a.py", "content": "X"},
    ]), table), {"step": 3})
    import os as _os
    res = mirror.sync(sink)
    assert not _os.path.exists(mirror._staged_path)
    assert mirror.position() == res["version"]
    got = {(r["repo"], r["path"], r["content"])
           for r in mirror.read().collect()}
    assert got == {("o/r1", "a.py", "X")}, \
        "staged bucket must be rebuilt from the snapshot, not diffed"

    # crash AFTER the cursor commit but before the staged clear: the
    # leftover names an already-committed version — discarded on the
    # next load instead of forcing a pointless snapshot rebuild
    mirror._write_staged([0, 1], res["version"])
    assert mirror._load_staged(mirror.position()) == set()
    assert not _os.path.exists(mirror._staged_path)

    # torn staged file (power loss mid-write): the touched set is
    # unknown, so every bucket the mirror holds becomes untrusted
    with open(mirror._staged_path, "w") as f:
        f.write("{ torn")
    on_disk = {
        int(d.split("=", 1)[1])
        for d in _os.listdir(mirror._data_dir)
        if d.startswith(mirror.BUCKET_COL + "=")
    }
    assert mirror._load_staged(mirror.position()) == on_disk
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 40, "seq": 0, "repo": "o/r1",
         "path": "a.py", "content": "Z"},
    ]), table), {"step": 4})
    mirror.sync(sink)  # full rebuild of untrusted buckets, then clear
    assert not _os.path.exists(mirror._staged_path)
    assert {r["content"] for r in mirror.read().collect()} == {"Z"}


def test_mirror_crashed_bootstrap_drops_ghost_rows(
        spark, tmp_root, monkeypatch):
    """A crashed BOOTSTRAP's leftover partitions may hold keys the
    table has since deleted; the restarted bootstrap's feed (the new
    head as inserts) never mentions them, so using those partitions as
    the apply base would keep ghost rows forever. The bootstrap apply
    uses an empty base — leftovers are only overwritten or dropped."""
    import pytest

    from scylla_cdc_java_spark.sinks.changefeed import (
        ChangeFeedCursor,
        ParquetMirror,
    )

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/gb_target", table,
                            num_buckets=4)
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "keep"},
        {**ins, "ms": 10, "seq": 1, "repo": "o/r2", "path": "b.py",
         "content": "ghost"},
    ]), table), {"step": 1})

    mirror = ParquetMirror(spark, f"{tmp_root}/gb_mirror")
    real_commit = ChangeFeedCursor.commit
    monkeypatch.setattr(ChangeFeedCursor, "commit",
                        lambda self, tok: (_ for _ in ()).throw(
                            RuntimeError("crash before cursor commit")))
    with pytest.raises(RuntimeError, match="crash"):
        mirror.sync(sink)
    monkeypatch.setattr(ChangeFeedCursor, "commit", real_commit)
    assert mirror.position() is None
    assert {r["repo"] for r in mirror.read().collect()} == \
        {"o/r1", "o/r2"}, "precondition: the crashed bootstrap landed"

    # the ghost key is deleted from the table before the re-bootstrap
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 0, "repo": "o/r2",
         "path": "b.py"},
    ]), table), {"step": 2})
    mirror.sync(sink)
    got = {(r["repo"], r["content"]) for r in mirror.read().collect()}
    assert got == {("o/r1", "keep")}, \
        "re-bootstrap must not resurrect deleted keys from leftovers"


def test_parquet_mirror_sync(spark, tmp_root):
    """ParquetMirror: a downstream table maintained ONLY from the
    change feed stays equal to the source after inserts, updates,
    deletes, a schema evolution, and a bucket emptied by deletes —
    with each sync rewriting only the changed buckets' partitions."""
    from scylla_cdc_java_spark.sinks.changefeed import ParquetMirror

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/mir_target", table,
                            num_buckets=8)
    mirror = ParquetMirror(spark, f"{tmp_root}/mir")
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}

    def src_state(cols=("commit", "lang", "content")):
        return sorted(
            (r["repo"], r["path"], *[r[c] for c in cols])
            for r in sink.read().collect()
        )

    def mir_state(cols=("commit", "lang", "content")):
        return sorted(
            (r["repo"], r["path"], *[r[c] for c in cols])
            for r in mirror.read().collect()
        )

    # bootstrap
    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "v1"},
        {**ins, "ms": 10, "seq": 1, "repo": "o/r2", "path": "a.py",
         "content": "w1"},
        {**ins, "ms": 10, "seq": 2, "repo": "o/r3", "path": "a.py",
         "content": "x1"},
    ]), table), {"step": 1})
    s1 = mirror.sync(sink)
    assert s1["applied_rows"] == 3
    assert mir_state() == src_state()
    assert mirror.sync(sink)["applied_rows"] == 0  # caught up

    # update + delete: only the touched buckets are rewritten
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py", "content": "v2"},
        {"op": OP_ROW_DELETE, "ms": 20, "seq": 1, "repo": "o/r2",
         "path": "a.py"},
    ]), table), {"step": 2})
    s2 = mirror.sync(sink)
    touched = {_bucket_of(spark, sink, r) for r in ("o/r1", "o/r2")}
    assert set(s2["changed"]) == touched
    assert mir_state() == src_state()
    # o/r2's bucket emptied (if it held only o/r2) -> partition dropped
    b2 = _bucket_of(spark, sink, "o/r2")
    alone = b2 not in {_bucket_of(spark, sink, r) for r in ("o/r1", "o/r3")}
    if alone:
        assert str(b2) in s2["removed"]

    # schema evolution flows through the feed into the mirror
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_INSERT, "ms": 30, "seq": 0, "repo": "o/r4",
         "path": "b.py", "commit": "c4", "size_bytes": "77"},
    ], columns=["repo", "path", "commit", "size_bytes"]), table),
        {"step": 3})
    mirror.sync(sink)
    cols = ("commit", "lang", "content", "size_bytes")
    assert mir_state(cols) == src_state(cols)

    # redelivery: wipe the cursor back one span and re-sync — the
    # net-diff apply is idempotent, the mirror converges to the same
    import json as _json
    with open(f"{tmp_root}/mir/_cursor.json", "w") as f:
        _json.dump({"version": s2["version"]}, f)
    mirror.sync(sink)
    assert mir_state(cols) == src_state(cols)

    # compaction-only span: value-neutral, so the mirror skips the
    # partition rewrite entirely and just advances its cursor
    sink.compact()
    sc = mirror.sync(sink)
    assert sc["applied_rows"] == 0 and sc["changed"] == []
    assert mirror.position() == sink.manifest()["version"]
    assert mir_state(cols) == src_state(cols)

    # delete EVERYTHING: a fully-synced empty mirror reads as an empty
    # frame (schema registry), not as "never built"
    remaining = [(r["repo"], r["path"])
                 for r in sink.read().select("repo", "path").collect()]
    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_DELETE, "ms": 40, "seq": i, "repo": rp, "path": p}
        for i, (rp, p) in enumerate(remaining)
    ]), table), {"step": 9})
    mirror.sync(sink)
    assert sink.read().count() == 0
    assert mirror.read().count() == 0


def test_external_mirror_consumer_during_replay(spark, tmp_root):
    """tools/mirror_consumer.py in a separate OS process tracks a live
    multi-window replay (piggyback compaction on) with zero
    coordination; at the fixpoint the mirror equals the table exactly."""
    import os
    import subprocess
    import sys as _sys

    from scylla_cdc_java_spark import generate_world, write_world
    from scylla_cdc_java_spark.sinks.changefeed import ParquetMirror

    REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = GenSpec(seed=34, n_events=2500, n_repos=25, paths_per_repo=8,
                   n_generations=2, streams_per_generation=4,
                   gen_span_ms=300_000, p_range_delete=0.05)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/mc_world")
    target = f"{tmp_root}/mc_target"
    mirror_dir = f"{tmp_root}/mc_mirror"
    out = f"{tmp_root}/consumer.jsonl"

    proc = subprocess.Popen(
        [_sys.executable,
         os.path.join(REPO_ROOT, "tools", "mirror_consumer.py"),
         target, mirror_dir, "--interval", "0.3", "--until-done",
         "--max-rounds", "400", "--cores", "2", "--out", out],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    try:
        eng = Engine(
            spark, info["log_dir"], info["generations_path"], target,
            cfg=EngineConfig(window_length_limit_ms=20_000,
                             compact_threshold=8),
        )
        stats = eng.replay()
        assert stats.windows >= 10, stats.windows
        proc.wait(timeout=240)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert proc.returncode == 0

    import json as _json
    rounds = [_json.loads(line) for line in open(out)]
    assert rounds and rounds[-1]["writer_done"]
    assert rounds[-1]["changed"] == 0
    # it consumed the stream as it moved: multiple appliying syncs
    # while the writer was live, or at least one strictly-partial span
    live = sum(1 for r in rounds
               if r["applied_rows"] and not r["writer_done"])
    total = len(eng.sink._load_root()["bucket_index"])
    partial = any(0 < r["changed"] < total for r in rounds)
    assert partial or live >= 2, [(r["changed"], r["applied_rows"],
                                   r["writer_done"]) for r in rounds]

    mirror = ParquetMirror(spark, mirror_dir)
    got = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in mirror.read().collect()
    )
    want = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in eng.sink.read().collect()
    )
    assert got == want and len(got) > 0


TAGS_TABLE = TableConfig(collection_columns=("tags",))


def _canon_rows(rows, ccols=("tags",)):
    out = set()
    for r in rows:
        vals = []
        for c in ("commit", "lang", "content"):
            vals.append(r[c])
        for c in ccols:
            v = r[c]
            vals.append(tuple(sorted(v.items())) if v else None)
        out.add((r["repo"], r["path"], r[CHANGE_TYPE_COL], *vals))
    return out


def test_feed_matches_oracle_prefix_diff(spark, tmp_root):
    """Replay a 2-generation world with collections, recording the
    snapshot version after every window merge; for each boundary, the
    Spark change feed (boundary snapshot -> final) must equal the diff
    of two independent pure-Python oracle replays — one over the event
    prefix up to the boundary's packed timestamp, one over the full
    log."""
    spec = GenSpec(seed=11, n_events=1500, n_repos=25, paths_per_repo=6,
                   n_generations=2, streams_per_generation=8,
                   gen_span_ms=60_000, with_collections=True,
                   ttl_fraction=0.0)
    world = generate_world(spec)
    info = write_world(world, f"{tmp_root}/cf_world")
    eng = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/cf_oracle_target", table=TAGS_TABLE,
        cfg=EngineConfig(window_length_limit_ms=20_000),
    )
    marks = []  # (committed version, window end packed ts)
    real_merge = eng.sink.merge

    def record_merge(fold, ckpt=None, **kw):
        stats = real_merge(fold, ckpt, **kw)
        marks.append((eng.sink.manifest()["version"], ckpt["last_ts"]))
        return stats

    eng.sink.merge = record_merge
    eng.replay()
    eng.sink.merge = real_merge
    assert len(marks) >= 3, "need multiple windows to exercise boundaries"

    events = world["events"]
    n = len(events["ms"])

    def oracle_state(limit_ts):
        idx = n
        for i in range(n):
            if pack_time(events["ms"][i], events["seq"][i]) > limit_ts:
                idx = i
                break
        prefix = {
            k: v[:idx] if hasattr(v, "__len__") and len(v) == n else v
            for k, v in events.items()
        }
        rows = final_state(replay(prefix, table=TAGS_TABLE))
        return {(r["repo"], r["path"]): r for r in rows}

    after = oracle_state(pack_time(10**15, 0))

    def row_vals(r):
        return (
            r["commit"], r["lang"], r["content"],
            tuple(sorted(r["tags"].items())) if r["tags"] else None,
        )

    checked_updates = 0
    for v_mid, end_ts in marks[:-1]:
        before = oracle_state(end_ts)
        expected = set()
        for k, r in after.items():
            if k not in before:
                expected.add((*k, "insert", *row_vals(r)))
            elif row_vals(before[k]) != row_vals(r):
                expected.add((*k, "update_preimage", *row_vals(before[k])))
                expected.add((*k, "update_postimage", *row_vals(r)))
        for k, r in before.items():
            if k not in after:
                expected.add((*k, "delete", *row_vals(r)))
        got = _canon_rows(eng.sink.changes(v_mid).collect())
        assert got == expected, (
            f"boundary v{v_mid}: {len(got)} feed rows != "
            f"{len(expected)} oracle rows"
        )
        checked_updates += sum(
            1 for e in expected if e[2] == "update_postimage")
    # teeth: at least one boundary must have produced genuine updates
    # and deletes, or the classification was never exercised
    assert checked_updates > 0


def test_two_mirrors_consume_one_table_independently(spark, tmp_root):
    """Two downstream consumers (separate cursor state, distinct lease
    ids) track one table at different paces: the lagging consumer's
    lease must protect ITS resume snapshot across an aggressive vacuum
    even while the fast consumer keeps committing newer positions —
    multi-consumer retention is per-cursor, not last-writer-wins."""
    from scylla_cdc_java_spark.sinks.changefeed import ParquetMirror

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/mm_target", table,
                            num_buckets=8)
    fast = ParquetMirror(spark, f"{tmp_root}/mm_fast")
    slow = ParquetMirror(spark, f"{tmp_root}/mm_slow")
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}

    def state(m):
        return sorted(
            (r["repo"], r["path"], r["content"])
            for r in m.read().collect()
        )

    def src():
        return sorted(
            (r["repo"], r["path"], r["content"])
            for r in sink.read().collect()
        )

    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": i, "repo": f"o/r{i}", "path": "a.py",
         "content": f"v{i}"} for i in range(4)
    ]), table), {"step": 1})
    assert fast.sync(sink)["applied_rows"] == 4
    assert slow.sync(sink)["applied_rows"] == 4

    # both consumers hold leases under cursors/ with distinct ids
    leases = os.listdir(os.path.join(sink.path, "cursors"))
    assert len(leases) == 2, leases

    # the table moves on; only the fast consumer follows
    for step, ms in ((2, 20), (3, 30), (4, 40)):
        sink.merge(fold_batch(_batch(spark, [
            {"op": OP_ROW_UPDATE, "ms": ms, "seq": 0, "repo": "o/r1",
             "path": "a.py", "content": f"u{step}"},
        ]), table), {"step": step})
        fast.sync(sink)
    assert state(fast) == src()
    slow_pos = slow.position()
    assert slow_pos < fast.position()

    # aggressive vacuum: the slow consumer's snapshot survives via its
    # lease even though retain_snapshots=1 would reap it
    sink.vacuum(retain_snapshots=1)
    sink._load_root(slow_pos)  # still readable
    # and the slow consumer catches up to the exact table state
    slow.sync(sink)
    assert state(slow) == src()
    assert slow.position() == fast.position()


def test_mirror_follows_rollback_as_forward_diff(spark, tmp_root):
    """rollback() commits the OLD snapshot as a NEW version, so a feed
    consumer sees the revert as an ordinary forward span — updates
    back to the old values, deletes of rows that postdate the rollback
    point — and a mirror converges to the rolled-back table without
    any special casing (a counter-rewind design would instead stall
    every consumer at 'caught up' forever)."""
    from scylla_cdc_java_spark.sinks.changefeed import ParquetMirror

    table = TableConfig()
    sink = ParquetMergeSink(spark, f"{tmp_root}/cfrb_target", table,
                            num_buckets=8)
    mirror = ParquetMirror(spark, f"{tmp_root}/cfrb_mirror")
    ins = {"op": OP_ROW_INSERT, "commit": "c0", "lang": "py"}

    sink.merge(fold_batch(_batch(spark, [
        {**ins, "ms": 10, "seq": 0, "repo": "o/r1", "path": "a.py",
         "content": "old"},
    ]), table), {"step": 1})
    v_good = sink.manifest()["version"]

    sink.merge(fold_batch(_batch(spark, [
        {"op": OP_ROW_UPDATE, "ms": 20, "seq": 0, "repo": "o/r1",
         "path": "a.py", "content": "bad"},
        {**ins, "ms": 20, "seq": 1, "repo": "o/r2", "path": "b.py",
         "content": "junk"},
    ]), table), {"step": 2})
    mirror.sync(sink)
    assert sorted(
        (r["repo"], r["content"]) for r in mirror.read().collect()
    ) == [("o/r1", "bad"), ("o/r2", "junk")]
    v_bad = mirror.position()

    sink.rollback(v_good)
    # the revert is an ordinary forward feed span...
    feed = _feed_rows(sink, v_bad)
    kinds = {(r[0], r[2]) for r in feed}
    assert ("o/r1", CT_UPDATE_POST) in kinds  # back to "old"
    assert ("o/r2", "delete") in kinds        # postdated row removed
    # ...and the mirror converges to the rolled-back table
    mirror.sync(sink)
    assert sorted(
        (r["repo"], r["content"]) for r in mirror.read().collect()
    ) == [("o/r1", "old")]
    assert mirror.sync(sink)["applied_rows"] == 0  # caught up, no stall
