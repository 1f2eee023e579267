"""Allocator tuning for page-fault-hostile hosts.

Large numpy temporaries (decode buffers, concatenated posting arrays)
default to glibc's mmap/munmap path: every allocation above the mmap
threshold returns its pages to the OS on free, so the *next* allocation
pays first-touch page-backing again. On bare metal that costs ~0.3 ms
per 24 MB; on the virtualized benchmark host it was measured at
1.3-1.8 s per 24 MB (~17 MB/s page backing, ~100x slow) — and the cost
recurs for every alloc/free cycle because the pages never stay with the
process. glibc's dynamic threshold self-heals only for same-size blocks
below its 32 MB cap, which the engine's varied-size buffers regularly
exceed.

Raising M_MMAP_THRESHOLD / M_TRIM_THRESHOLD keeps big blocks on the brk
heap where freed pages are recycled: first touch is paid once per
process high-water mark instead of once per allocation. The same
reasoning applies to pyarrow's jemalloc pool, which purges dirty pages
after a decay interval; disabling the purge keeps Arrow batch buffers
resident.

The dominant cost turned out to be transparent hugepages: numpy
madvises MADV_HUGEPAGE on every buffer >= 4 MB, and with THP
defrag=madvise each fault then synchronously allocates a 2 MB hugepage
— measured at ~170 ms PER HUGEPAGE on this host (1.9-3.0 s to
first-touch a 24 MB array vs 20 ms with the madvise disabled; the same
region is fast on second touch, so it is the hugepage allocation, not
page backing). Disabled via numpy's runtime switch in-process and
NUMPY_MADVISE_HUGEPAGE=0 for child processes.

Applied in three places so every process in the job sees it:
- `tune_allocator()` at package import (driver + any python worker that
  unpickles an engine UDF closure),
- `MALLOC_*` env vars on executors (`session.get_spark`), so pyspark
  daemons/workers are covered from exec() time, before any allocation,
- inherited by forked python workers automatically.

Set MARLIN_NO_ALLOC_TUNE=1 to disable (A/B measurement hook).
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_ONE_GB = 1 << 30

#: env var -> value shipped to executor JVMs (and inherited by python
#: workers); glibc parses these at process start.
EXECUTOR_ENV = {
    "MALLOC_MMAP_THRESHOLD_": str(_ONE_GB),
    "MALLOC_TRIM_THRESHOLD_": str(_ONE_GB),
    "NUMPY_MADVISE_HUGEPAGE": "0",
}

_done = False


def tune_allocator() -> bool:
    """Idempotently raise glibc's mmap/trim thresholds in THIS process
    and disable jemalloc decay in pyarrow. Returns True if applied."""
    global _done
    if _done or os.environ.get("MARLIN_NO_ALLOC_TUNE"):
        return _done
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(_M_MMAP_THRESHOLD, _ONE_GB)
        libc.mallopt(_M_TRIM_THRESHOLD, _ONE_GB)
    except Exception:
        return False  # non-glibc platform: nothing to tune
    try:
        import pyarrow as pa

        pa.jemalloc_set_decay_ms(-1)  # -1 = never purge freed pages
    except Exception:
        pass  # system/mimalloc pool or old pyarrow: fine
    os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")  # children
    try:  # runtime switch for this process (env is read at numpy import)
        import numpy.core.multiarray as _ma

        _ma._set_madvise_hugepage(False)
    except Exception:
        try:  # numpy 2.x module layout
            import numpy._core.multiarray as _ma

            _ma._set_madvise_hugepage(False)
        except Exception:
            pass
    _done = True
    return True
