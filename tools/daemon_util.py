"""Shared plumbing for the maintenance daemons (tools/compactor.py,
tools/index_maintainer.py): wait for a live writer's first commit and
aggregate its done flag across sharded fleets."""

from __future__ import annotations

import os
import time


def wait_for_manifest(target: str, poll_s: float = 0.2) -> None:
    """Block until the writer's first commit publishes a manifest."""
    mpath = os.path.join(target, "MANIFEST.json")
    while not os.path.exists(mpath):
        time.sleep(poll_s)


def writer_done(ckpt: dict | None, expect_shards: int = 1) -> bool:
    """True iff the writer(s) checkpointed done. Sharded fleets: shards
    that start late have NO checkpoint entry yet, and the manifest's
    top-level done only aggregates shards that HAVE checkpointed —
    honor done only once ``expect_shards`` shard entries exist
    (default 1 keeps single-writer behavior)."""
    ckpt = ckpt or {}
    n_shards = len(ckpt.get("shards") or {}) if "shards" in ckpt else 1
    return bool(ckpt.get("done")) and n_shards >= expect_shards
