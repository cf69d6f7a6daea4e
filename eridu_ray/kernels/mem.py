"""Per-process glibc malloc tuning for allocation-heavy batch kernels.

The vectorized verify/candidate group kernels allocate tens of MB of
short-lived numpy buffers per call (concatenated shingle keys, tag
arrays, searchsorted output).  glibc serves allocations above
M_MMAP_THRESHOLD (128 KB default) with fresh ``mmap`` regions that are
unmapped on free, so EVERY call pays kernel page-zeroing on first touch.
Measured on the 158k-page bench corpus: the same group verify call runs
3-4x slower on cold pages than warm (1.3 s vs 0.37 s), and with 32
concurrent tasks the zero-fill serializes on the memory subsystem —
the 8->32 CPU scaling collapse of the verify stage.

``ensure_malloc_pool()`` raises M_MMAP_THRESHOLD and M_TRIM_THRESHOLD so
large buffers come from the sbrk heap and freed space is RETAINED for
the next call: each Ray worker process reaches steady state after one
group call and stops touching the kernel.  Worker heap high-water is
bounded by the largest single group (~0.3 GB on the bench corpus); the
pool is per worker process, sized far below a worker's share of node
memory.  No-op (returns False) on non-glibc platforms.
"""

from __future__ import annotations

_done = False

#: keep single allocations up to this size on the reusable heap
_POOL_BYTES = 256 * 1024 * 1024

# glibc malloc.h parameter ids
_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def ensure_malloc_pool() -> bool:
    """Idempotent per-process mallopt tuning; True if applied."""
    global _done
    if _done:
        return True
    try:
        import ctypes
        import ctypes.util

        libc = ctypes.CDLL(ctypes.util.find_library("c") or "libc.so.6",
                           use_errno=True)
        ok = (libc.mallopt(_M_MMAP_THRESHOLD, _POOL_BYTES) == 1
              and libc.mallopt(_M_TRIM_THRESHOLD, _POOL_BYTES) == 1)
        _done = bool(ok)
        return _done
    except Exception:
        return False
