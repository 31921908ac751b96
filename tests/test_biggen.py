"""The slab-chunked vectorized generator (biggen) must produce a world
the engine replays to EXACTLY the pure-Python oracle's final state —
the same end-to-end gate the loop-based generator's worlds pass. This
validates every vectorization detail (range-pair expansion, dup
deliveries, del-marker nullability, content gather, stream affinity)
against the independent oracle rather than against generate_world."""

import pyarrow.dataset as pads
import pytest

from scylla_cdc_java_spark import Engine, GenSpec
from scylla_cdc_java_spark.biggen import generate_to_dir_sharded
from scylla_cdc_java_spark.model import EngineConfig
from scylla_cdc_java_spark.oracle import final_state, replay


def _events_from_log(log_dir: str) -> dict:
    """Read the WRITTEN log back into the oracle's event-dict shape —
    the oracle consumes the files, so the generator is validated
    end-to-end."""
    tbl = pads.dataset(log_dir, format="parquet",
                       partitioning="hive").to_table()
    pdf = tbl.to_pandas()
    pdf["ms"] = pdf["cdc$time"].map(lambda t: t["ms"])
    pdf["seq"] = pdf["cdc$time"].map(lambda t: t["seq"])
    pdf = pdf.sort_values(["ms", "seq"], kind="mergesort").reset_index(
        drop=True)
    ev = {
        "op": pdf["cdc$operation"].tolist(),
        "ms": pdf["ms"].tolist(),
        "seq": pdf["seq"].tolist(),
        "stream_id": [bytes(s) for s in pdf["cdc$stream_id"]],
        "repo": pdf["repo"].tolist(),
        "path": pdf["path"].tolist(),
        "commit": pdf["commit"].tolist(),
        "lang": pdf["lang"].tolist(),
        "content": pdf["content"].tolist(),
    }

    def _opt_int(v):
        try:
            return None if v is None or v != v else int(v)
        except TypeError:
            return None

    def _opt_bool(v):
        try:
            return None if v is None or v != v else bool(v)
        except TypeError:
            return None

    ev["ttl"] = [_opt_int(v) for v in pdf["cdc$ttl"]]
    for c in ("commit", "lang", "content"):
        ev["del_" + c] = [_opt_bool(v) for v in pdf[f"cdc$deleted_{c}"]]
    # pandas turns string None into NaN on object cols with numerics? be safe
    for c in ("repo", "path", "commit", "lang", "content"):
        ev[c] = [None if v is None or v != v else v for v in ev[c]]
    return ev


@pytest.mark.parametrize("n_slabs", [1, 4])
def test_biggen_replay_matches_oracle(spark, tmp_root, n_slabs):
    spec = GenSpec(seed=11, n_events=30_000, n_repos=60,
                   paths_per_repo=16, n_generations=2,
                   streams_per_generation=8, gen_span_ms=60_000,
                   zipf_a=1.2, content_min=16, content_max=48)
    info = generate_to_dir_sharded(
        spec, f"{tmp_root}/biggen{n_slabs}", n_slabs)
    assert info["n_rows"] >= spec.n_events  # ranges add a row, dups more
    eng = Engine(
        spark, info["log_dir"], info["generations_path"],
        f"{tmp_root}/biggen_target{n_slabs}",
        cfg=EngineConfig(window_length_limit_ms=60_000),
    )
    stats = eng.replay()
    assert stats.generations == 2
    want = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in final_state(replay(_events_from_log(info["log_dir"])))
    )
    got = sorted(
        (r["repo"], r["path"], r["commit"], r["lang"], r["content"])
        for r in eng.sink.read().collect()
    )
    assert len(got) > 0
    if got != want:
        diff = set(got) ^ set(want)
        raise AssertionError(
            f"{len(diff)} differing rows, sample: {list(diff)[:4]}")


def test_biggen_slabs_partition_time(tmp_root):
    """Slab time ranges are disjoint: (ms, seq) never collides across
    slabs, so the global log stays tie-free without a global counter."""
    spec = GenSpec(seed=5, n_events=8_000, n_repos=40, paths_per_repo=8,
                   n_generations=1, streams_per_generation=4,
                   gen_span_ms=40_000, dup_fraction=0.0,
                   content_min=16, content_max=32)
    info = generate_to_dir_sharded(spec, f"{tmp_root}/biggen_tf", 4)
    tbl = pads.dataset(info["log_dir"], format="parquet",
                       partitioning="hive").to_table()
    pdf = tbl.to_pandas()
    keys = [(t["ms"], t["seq"]) for t in pdf["cdc$time"]]
    assert len(keys) == len(set(keys))
