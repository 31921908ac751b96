"""Host-weather probe: fresh-page fault throughput.

This VM's dominant noise source is NOT CPU steal (steal ticks stay ~0
during stalls) but the anonymous-page fault path: first-touch of fresh
mmap'd memory has been measured anywhere from ~30 MB/s to ~5 GB/s
depending on host state, while already-faulted memory always streams at
full speed. Any benchmark attempt that allocates working memory (a
fresh JVM heap, a numpy temp, an Arrow buffer) is silently inflated
when the window is bad.

``fault_gb_s()`` measures it directly: mmap a fresh anonymous region,
write one byte per 4 KiB page, time it. The region is unmapped after,
so repeated calls keep measuring the *fresh* path regardless of malloc
tunables. Use alongside steal_frac when screening attempts:

    clean window ~ fault_gb_s() >= 1.0  (good host state is ~4-6)

Usage: python tools/weather.py [size_mb]   # prints one JSON line
"""

from __future__ import annotations

import json
import mmap
import sys
import time


def fault_gb_s(size_mb: int = 512) -> float:
    """GB/s of first-touch write faults over a fresh anonymous mapping."""
    n = size_mb << 20
    m = mmap.mmap(-1, n)
    try:
        t0 = time.time()
        step = 4096
        one = b"\x01"
        for off in range(0, n, step):
            m[off:off + 1] = one
        dt = time.time() - t0
    finally:
        m.close()
    return (n / 2**30) / dt if dt > 0 else float("inf")


def main() -> None:
    size_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    print(json.dumps({"fault_gb_s": round(fault_gb_s(size_mb), 2),
                      "size_mb": size_mb}))


if __name__ == "__main__":
    main()
