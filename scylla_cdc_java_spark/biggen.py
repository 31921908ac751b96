"""Slab-chunked, fully-vectorized world generation for 10^9-event
campaigns.

``generator.generate_world`` is deliberately frozen (its per-event
Python loop and rng draw order define the bit-identical cached worlds
rounds 2-5 benchmark against), but it tops out around ~3e5 events/s and
holds the whole world in driver memory — at 10^9 events that is hours
of generation and >100 GB of Python objects. This module generates the
SAME log shape (schema, hive layout, op mix, stream affinity, range
pairs, duplicate deliveries) a different way:

- the total time span is split into ``n_slabs`` contiguous slices;
  each slab draws its own events (own seed) over the SAME generations/
  streams, so memory is O(slab) and slabs parallelize;
- inside a slab everything is numpy/arrow-vectorized — the content
  column is materialized directly as an Arrow large_string from a
  (starts, lengths) gather over the token blob, never as Python str
  objects (~30-60x faster than the loop);
- slabs write into one hive-partitioned ``cdc_log`` with unique file
  basenames (slab time ranges are disjoint, so (ms, seq) stays tie-free
  globally without a global seq counter).

The generated world is NOT bit-identical to ``generate_world`` for the
same spec (different rng consumption order) — it is a different world
with the same statistics, which is all the bigworld protocol needs: its
correctness check replays a repo subset of the WRITTEN log through the
independent Python oracle, so the generator is validated end-to-end
regardless of which path produced the files.

Reference shape being mirrored: log columns per scylla-cdc-lib
driver/Reader.java:105-111 / Change.java:11-43; range pairs per
replicator Main.java:491-531 (start op then end op, same stream,
batch_seq 0/1).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from .generator import GenSpec, _make_streams, _token_pool
from .model import (
    OP_PARTITION_DELETE,
    OP_RANGE_DELETE_END_EXCLUSIVE,
    OP_RANGE_DELETE_END_INCLUSIVE,
    OP_RANGE_DELETE_START_EXCLUSIVE,
    OP_RANGE_DELETE_START_INCLUSIVE,
    OP_ROW_DELETE,
    OP_ROW_INSERT,
    OP_ROW_UPDATE,
    SEQ_MOD,
)

LANGS = ["py", "java", "c", "cpp", "go", "rs", "js", "ts", "rb", "scala", "kt", "sh"]


def _universe(spec: GenSpec):
    """Key pools + generations, drawn from the BASE seed only — every
    slab must see identical streams or the generations metadata would
    not cover the log."""
    rng = np.random.default_rng([spec.seed, 0x51EA])
    tokens = _token_pool(rng)
    gens = [
        (spec.gen0_start_ms + g * spec.gen_span_ms,
         _make_streams(rng, spec.streams_per_generation))
        for g in range(spec.n_generations)
    ]
    repos = np.array(
        [f"org{i % spec.n_orgs}/repo{i}" for i in range(spec.n_repos)],
        dtype=object,
    )
    path_j = np.arange(spec.paths_per_repo)
    langs_by_path = np.array(
        [LANGS[int(j) % len(LANGS)] for j in path_j], dtype=object)
    paths_u = np.array(
        [f"src/dir{int(j) // 16}/file{int(j)}.{langs_by_path[j]}"
         for j in path_j])  # dtype=U for vectorized string compare
    import hashlib

    repo_hash = np.array(
        [int.from_bytes(
            hashlib.blake2b(r.encode(), digest_size=8).digest(), "big")
         for r in repos], dtype=np.uint64)
    commit_pool = np.array(
        [hashlib.sha1(f"{spec.seed}:{i}".encode()).hexdigest()
         for i in range(4096)], dtype=object)
    blob = " ".join(tokens.tolist())
    spg = spec.streams_per_generation
    return {
        "gens": gens, "repos": repos, "paths_u": paths_u,
        "langs": langs_by_path, "repo_hash": repo_hash,
        "commit_pool": commit_pool,
        "blob": np.frombuffer(blob.encode(), dtype=np.uint8),
        # Arrow-side pools for C++ gathers in _slab_table (the row
        # columns are built as pool indices, never Python strings)
        "repos_pa": pa.array(repos, pa.string()),
        "paths_pa": pa.array(paths_u.astype(object), pa.string()),
        "langs_pa": pa.array(langs_by_path, pa.string()),
        "commit_pa": pa.array(commit_pool, pa.string()),
        "sid_pool_pa": pa.array(
            [s for _g, streams in gens for s in streams], pa.binary()),
    }


def _content_arrow(blob: np.ndarray, starts: np.ndarray,
                   lengths: np.ndarray) -> pa.Array:
    """Arrow large_string of ``blob[starts[i]:starts[i]+lengths[i]]``
    built from buffers — no per-row Python strings.

    The gather index is built with scatter+cumsum run-length expansion,
    NOT ``np.repeat(values, counts)``: this environment's numpy takes
    ~90 s per 5M variable-count repeats (measured), while one cumsum
    over the expanded length is sub-second."""
    k = len(starts)
    offsets = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    total = int(offsets[-1])
    # flat[p] = starts[i] + (p - offsets[i]) for p in run i: step is +1
    # inside a run; at each run start, jump to the run's start index.
    # int32 throughout (blob indices are tiny) — the expanded arrays are
    # the slab's biggest allocations and this VM is fault/bandwidth-bound
    starts32 = starts.astype(np.int32)
    len32 = lengths.astype(np.int32)
    step = np.ones(total, dtype=np.int32)
    step[0] = starts32[0]
    step[offsets[1:-1]] = starts32[1:] - (starts32[:-1] + len32[:-1] - 1)
    flat = np.cumsum(step, dtype=np.int32)
    data = blob[flat]
    return pa.Array.from_buffers(
        pa.large_utf8(), k,
        [None, pa.py_buffer(offsets), pa.py_buffer(data)],  # zero-copy
    )


def _slab_table(spec: GenSpec, uni: dict, slab: int, n_slabs: int) -> pa.Table:
    """One slab's rows as an Arrow table (log schema + hive partition
    columns), vectorized end-to-end. ``BIGGEN_TRACE=1`` prints per-stage
    wall times (this VM's first-touch page faults make usually-free ops
    expensive; the trace is how we keep the 10^9 path honest)."""
    import time as _time

    trace = bool(os.environ.get("BIGGEN_TRACE"))
    _t = [_time.time()]

    def _tick(label: str) -> None:
        if trace:
            now = _time.time()
            print(f"  biggen[{slab}] {label}: {now - _t[0]:.1f}s",
                  flush=True)
            _t[0] = now

    rng = np.random.default_rng([spec.seed, 1 + slab])
    n = spec.n_events // n_slabs
    total_span = spec.n_generations * spec.gen_span_ms
    off_lo = (total_span * slab) // n_slabs
    off_hi = max((total_span * (slab + 1)) // n_slabs, off_lo + 1)

    # --- event-level draws (mirror generate_world's distributions) ---
    z = rng.zipf(spec.zipf_a, size=n)
    repo_idx = (z - 1) % spec.n_repos
    path_idx = rng.integers(0, spec.paths_per_repo, size=n)
    u = rng.random(n)
    ops = np.full(n, OP_ROW_UPDATE, dtype=np.int8)
    c = spec.p_update
    ops[u >= c] = OP_ROW_INSERT
    c += spec.p_insert
    ops[u >= c] = OP_ROW_DELETE
    c += spec.p_row_delete
    ops[u >= c] = OP_PARTITION_DELETE
    c += spec.p_partition_delete
    is_range = u >= c
    offs = np.sort(rng.integers(off_lo, off_hi, size=n))
    ms = spec.gen0_start_ms + offs
    gen_idx = np.minimum(offs // spec.gen_span_ms, spec.n_generations - 1)
    stream_of = (uni["repo_hash"][repo_idx]
                 % np.uint64(spec.streams_per_generation)).astype(np.int64)

    commits_i = rng.integers(0, len(uni["commit_pool"]), size=n)
    lengths = rng.integers(spec.content_min, spec.content_max + 1, size=n)
    blob_len = len(uni["blob"])
    starts = rng.integers(0, blob_len - spec.content_max - 1, size=n)
    wr_commit = rng.random(n) < 0.8
    wr_lang = rng.random(n) < 0.5
    wr_content = rng.random(n) < 0.9
    del_commit = rng.random(n) < 0.02
    del_lang = rng.random(n) < 0.02
    del_content = rng.random(n) < 0.01
    ttl = np.where(rng.random(n) < spec.ttl_fraction,
                   rng.integers(60, 86_400, size=n), -1)
    range_excl = rng.random(n) < 0.5
    range_off = rng.integers(1, 8, size=n)

    _tick('draws')
    m_upd = ops == OP_ROW_UPDATE
    m_ins = ops == OP_ROW_INSERT
    m_pdel = ops == OP_PARTITION_DELETE

    # --- expand events -> rows (range pairs contribute 2 rows) ------
    counts = np.where(is_range, 2, 1).astype(np.int64)
    pos = np.cumsum(counts) - counts
    n_rows = int(counts.sum())
    # run-length expand arange(n) by counts via scatter+cumsum (see
    # _content_arrow for why np.repeat is unusable here)
    step = np.zeros(n_rows, dtype=np.int64)
    step[pos[1:]] = 1
    ev = np.cumsum(step)
    is_second = np.arange(n_rows, dtype=np.int64) != pos[ev]

    _tick('expand')
    ms_r = ms[ev]
    seq_r = np.arange(n_rows, dtype=np.int64) % SEQ_MOD
    bseq_r = is_second.astype(np.int32)

    op_r = ops[ev].copy()
    r_first = is_range[ev] & ~is_second
    op_r[r_first & range_excl[ev]] = OP_RANGE_DELETE_START_EXCLUSIVE
    op_r[r_first & ~range_excl[ev]] = OP_RANGE_DELETE_START_INCLUSIVE
    op_r[is_second & range_excl[ev]] = OP_RANGE_DELETE_END_EXCLUSIVE
    op_r[is_second & ~range_excl[ev]] = OP_RANGE_DELETE_END_INCLUSIVE

    _tick('rowmeta_pre')
    # --- key columns as POOL INDICES (no Python strings) -------------
    # The old path materialized object-dtype string arrays per row
    # (.astype(object) = tens of millions of PyStr allocations: 296 s
    # per 25M-event slab on this VM). Every string/binary column is now
    # an (index, null-mask) pair gathered from a small Arrow pool with
    # pc.take AFTER the final sort — C++-side, zero Python objects.
    paths_u = uni["paths_u"]
    # lexicographic min/max of the range pair via a precomputed rank
    # (comparing 25M U-dtype strings would allocate ~2.5 GB)
    rank = np.empty(len(paths_u), dtype=np.int64)
    rank[np.argsort(paths_u)] = np.arange(len(paths_u))
    lo_j = path_idx
    hi_j = np.minimum(lo_j + range_off, spec.paths_per_repo - 1)
    swap = rank[lo_j] > rank[hi_j]
    lo_idx = np.where(swap, hi_j, lo_j)
    hi_idx = np.where(swap, lo_j, hi_j)

    repo_i = repo_idx[ev]
    path_i = path_idx[ev]
    path_i[r_first] = lo_idx[ev[r_first]]
    path_i[is_second] = hi_idx[ev[is_second]]
    path_null = m_pdel[ev]

    _tick('keys')
    # --- payload columns: (index | value, null-mask) ------------------
    set_commit = m_ins | (m_upd & wr_commit & ~del_commit)
    set_lang = m_ins | (m_upd & wr_lang & ~del_lang)
    commit_i = commits_i[ev]
    commit_null = ~(set_commit[ev] & ~is_second)
    lang_i = path_idx[ev]
    lang_null = ~(set_lang[ev] & ~is_second)

    dc_set = (m_upd & del_commit)[ev] & ~is_second
    dl_set = (m_upd & del_lang)[ev] & ~is_second
    dx_set = (m_upd & del_content)[ev] & ~is_second

    ttl_v = ttl[ev]
    ttl_null = ~(((m_upd | m_ins) & (ttl >= 0))[ev] & ~is_second)

    _tick('payload')
    # content: arrow values for events that write it; row-level index
    need_c = m_ins | (m_upd & wr_content & ~del_content)
    sel = np.flatnonzero(need_c)
    content_vals = _content_arrow(uni["blob"], starts[sel], lengths[sel])
    c_idx_ev = np.full(n, -1, dtype=np.int64)
    c_idx_ev[sel] = np.arange(len(sel), dtype=np.int64)
    c_idx_r = np.where(is_second, -1, c_idx_ev[ev])

    _tick('content')
    # stream ids / generation / grouping (index-stable, matching
    # write_world's default grouping so fleet sharding behaves the same)
    spg = spec.streams_per_generation
    sid_i = gen_idx[ev] * spg + stream_of[ev]
    gen_start = np.array([g for g, _s in uni["gens"]], dtype=np.int64)
    gen_r = gen_start[gen_idx[ev]]
    group_r = (stream_of[ev] % max(1, spg // 2)).astype(np.int32)

    _tick('streams')
    # --- duplicate deliveries (never a bare range row) --------------
    n_dup = int(n_rows * spec.dup_fraction)
    order_src = np.arange(n_rows, dtype=np.int64)
    if n_dup:
        safe = np.flatnonzero(~is_range[ev])
        dup_idx = rng.choice(safe, size=min(n_dup, len(safe)), replace=False)
        order_src = np.concatenate([order_src, dup_idx])

    _tick('dups')
    # --- final (ms, seq) order over originals + dups ----------------
    order = order_src[np.lexsort((seq_r[order_src], ms_r[order_src]))]

    _tick('sort')
    import pyarrow.compute as pc

    take = lambda arr: arr[order]  # noqa: E731

    def _pool_col(pool: pa.Array, idx: np.ndarray,
                  null: np.ndarray | None = None) -> pa.Array:
        """Gather ``pool[idx[order]]`` (null where masked) in Arrow C++."""
        idx_f = idx[order]
        mask_f = null[order] if null is not None else None
        return pc.take(pool, pa.array(idx_f, pa.int64(), mask=mask_f))

    c_idx_f = c_idx_r[order]
    # null indices -> null strings through pc.take
    content_col = pa.array(c_idx_f, type=pa.int64(), mask=c_idx_f < 0)
    content_f = pc.take(content_vals, content_col)

    def _flag_col(set_mask: np.ndarray) -> pa.Array:
        m = set_mask[order]
        return pa.array(m, pa.bool_(), mask=~m)  # True where set, else null

    ttl_f = ttl_v[order]
    _tick('take_content')
    return pa.table({
        "cdc$stream_id": _pool_col(uni["sid_pool_pa"], sid_i),
        "cdc$time": pa.StructArray.from_arrays(
            [pa.array(take(ms_r), pa.int64()),
             pa.array(take(seq_r), pa.int64())],
            names=["ms", "seq"]),
        "cdc$operation": pa.array(take(op_r), pa.int8()),
        "cdc$ttl": pa.array(ttl_f, pa.int64(), mask=ttl_null[order]),
        "cdc$batch_seq_no": pa.array(take(bseq_r), pa.int32()),
        "repo": _pool_col(uni["repos_pa"], repo_i),
        "path": _pool_col(uni["paths_pa"], path_i, path_null),
        "commit": _pool_col(uni["commit_pa"], commit_i, commit_null),
        "lang": _pool_col(uni["langs_pa"], lang_i, lang_null),
        "content": content_f.cast(pa.string()),
        "cdc$deleted_commit": _flag_col(dc_set),
        "cdc$deleted_lang": _flag_col(dl_set),
        "cdc$deleted_content": _flag_col(dx_set),
        "generation": pa.array(take(gen_r), pa.int64()),
        "stream_group": pa.array(take(group_r), pa.int32()),
        "time_bucket": pa.array(take(ms_r) // spec.time_bucket_ms,
                                pa.int64()),
    })


def generate_to_dir_sharded(spec: GenSpec, base_dir: str, n_slabs: int,
                            force: bool = False,
                            progress=None) -> dict:
    """Cached slab-chunked generate+write; same return contract as
    ``generator.generate_to_dir``. Memory is O(n_events / n_slabs)."""
    out_dir = os.path.join(
        base_dir, f"cdcworld_big_{spec.cache_key()}_{n_slabs}")
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker) and not force:
        with open(marker) as f:
            return json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    uni = _universe(spec)
    gen_tbl = pa.table({
        "time": pa.array([g for g, _s in uni["gens"]], pa.int64()),
        "streams": pa.array([list(s) for _g, s in uni["gens"]],
                            pa.list_(pa.binary())),
    })
    pq.write_table(gen_tbl, os.path.join(out_dir, "generations.parquet"))
    log_dir = os.path.join(out_dir, "cdc_log")
    part = pads.partitioning(
        pa.schema([("generation", pa.int64()), ("stream_group", pa.int32()),
                   ("time_bucket", pa.int64())]), flavor="hive")
    n_rows = 0
    for slab in range(n_slabs):
        tbl = _slab_table(spec, uni, slab, n_slabs)
        n_rows += tbl.num_rows
        pads.write_dataset(
            tbl, log_dir, format="parquet", partitioning=part,
            existing_data_behavior="overwrite_or_ignore",
            basename_template=f"slab{slab}-{{i}}.parquet",
            max_rows_per_file=1 << 22, min_rows_per_group=1 << 16,
            max_rows_per_group=1 << 20,
        )
        del tbl
        if progress:
            progress(slab + 1, n_slabs, n_rows)
    info = {
        "log_dir": log_dir,
        "generations_path": os.path.join(out_dir, "generations.parquet"),
        "n_rows": n_rows, "out_dir": out_dir,
    }
    with open(marker, "w") as f:
        json.dump(info, f)
    return info
