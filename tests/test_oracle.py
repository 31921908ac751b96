"""Oracle self-consistency: hand-built micro-scenarios pinning the
reference's apply semantics (three-valued cells Main.java:143-144,
LWW USING TIMESTAMP Main.java:124-128, tombstone shadowing, INSERT row
marker vs UPDATE, partition/range deletes)."""

from scylla_cdc_java_spark.model import (
    OP_PARTITION_DELETE,
    OP_RANGE_DELETE_END_INCLUSIVE,
    OP_RANGE_DELETE_START_INCLUSIVE,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
)
from scylla_cdc_java_spark.oracle import OracleState, apply_event

SID = b"\x01" * 16


def ev(op, ts, repo="r/a", path="p1", **kw):
    d = {"op": op, "ts": ts, "stream_id": SID, "repo": repo, "path": path}
    d.update(kw)
    return d


def test_partial_update_leaves_untouched_columns():
    st = OracleState()
    apply_event(st, ev(OP_ROW_INSERT, 10, commit="c1", lang="py", content="x"))
    apply_event(st, ev(OP_ROW_UPDATE, 20, commit="c2"))  # lang/content untouched
    row = st.visible_row("r/a", "p1")
    assert row["commit"] == "c2" and row["lang"] == "py" and row["content"] == "x"


def test_explicit_null_write_vs_untouched():
    st = OracleState()
    apply_event(st, ev(OP_ROW_INSERT, 10, commit="c1", lang="py", content="x"))
    apply_event(st, ev(OP_ROW_UPDATE, 20, del_lang=True))
    row = st.visible_row("r/a", "p1")
    assert row["lang"] is None and row["commit"] == "c1"


def test_lww_out_of_order_delivery():
    st = OracleState()
    apply_event(st, ev(OP_ROW_UPDATE, 30, content="new"))
    apply_event(st, ev(OP_ROW_UPDATE, 20, content="old"))  # late, loses
    assert st.visible_row("r/a", "p1")["content"] == "new"


def test_row_delete_then_later_update_resurrects():
    st = OracleState()
    apply_event(st, ev(OP_ROW_INSERT, 10, commit="c1", lang="py", content="x"))
    apply_event(st, ev(OP_ROW_DELETE, 20))
    assert st.visible_row("r/a", "p1") is None
    apply_event(st, ev(OP_ROW_UPDATE, 30, content="back"))
    row = st.visible_row("r/a", "p1")
    assert row["content"] == "back"
    assert row["commit"] is None  # ts10 cell stays shadowed by ts20 tomb


def test_update_only_row_dies_when_cells_shadowed_insert_survives():
    st = OracleState()
    apply_event(st, ev(OP_ROW_UPDATE, 10, path="u", content="x"))
    apply_event(st, ev(OP_ROW_INSERT, 10, path="i", content="x"))
    apply_event(st, ev(OP_ROW_DELETE, 20, path="u"))
    apply_event(st, ev(OP_ROW_DELETE, 20, path="i"))
    apply_event(st, ev(OP_ROW_INSERT, 30, path="i"))  # PK-only insert
    assert st.visible_row("r/a", "u") is None
    row = st.visible_row("r/a", "i")  # row marker keeps it alive
    assert row is not None and row["content"] is None


def test_partition_delete_covers_all_paths():
    st = OracleState()
    apply_event(st, ev(OP_ROW_INSERT, 10, path="p1", content="a"))
    apply_event(st, ev(OP_ROW_INSERT, 11, path="p2", content="b"))
    apply_event(st, ev(OP_ROW_INSERT, 12, repo="r/b", path="p1", content="c"))
    apply_event(st, ev(OP_PARTITION_DELETE, 20, path=None))
    assert st.visible_row("r/a", "p1") is None
    assert st.visible_row("r/a", "p2") is None
    assert st.visible_row("r/b", "p1")["content"] == "c"


def test_range_delete_inclusive_bounds_and_timestamp():
    st = OracleState()
    for i, p in enumerate(["a", "b", "c", "d"]):
        apply_event(st, ev(OP_ROW_INSERT, 10 + i, path=p, content=p))
    apply_event(st, ev(OP_RANGE_DELETE_START_INCLUSIVE, 20, path="b"))
    apply_event(st, ev(OP_RANGE_DELETE_END_INCLUSIVE, 21, path="c"))
    assert st.visible_row("r/a", "a") is not None
    assert st.visible_row("r/a", "b") is None
    assert st.visible_row("r/a", "c") is None
    assert st.visible_row("r/a", "d") is not None
    # write after the range ts resurrects
    apply_event(st, ev(OP_ROW_UPDATE, 30, path="b", content="new"))
    assert st.visible_row("r/a", "b")["content"] == "new"


def test_duplicate_delivery_idempotent():
    st = OracleState()
    e = ev(OP_ROW_INSERT, 10, commit="c", lang="py", content="x")
    apply_event(st, e)
    snap1 = st.visible_row("r/a", "p1")
    apply_event(st, dict(e))
    assert st.visible_row("r/a", "p1") == snap1
