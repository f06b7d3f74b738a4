"""Host allocation helpers for this environment's episodic page-fault
slow path (docs/KNOWN_ISSUES.md #12).

Measured 2026-08-19: while a device session is active, first-touch
minor faults on fresh anonymous memory intermittently cost ~375 us per
fault-around block (~170 MB/s effective fill rate, ~40x normal) — the
root cause of the round-2 "host-side pass-time inflation 3-15x"
mystery (pass 4 at 0.09 s standalone vs 1.5-8 s mid-bench).  glibc
frees >=32 MB blocks back to the OS via munmap, so every large numpy
temp re-pays the fault storm.

MADV_HUGEPAGE on the backing pages (THP is madvise-mode here) cuts the
fault count ~500x (2 MB pages): the same mid-run fill measured 0.569 s
-> 0.013 s.  `hugepage_empty` is np.empty + that madvise; use it for
every large host buffer on a hot path.
"""

from __future__ import annotations

import ctypes

import numpy as np

_MADV_HUGEPAGE = 14
_HP = 2 << 20                     # THP size
try:
    _libc = ctypes.CDLL("libc.so.6", use_errno=True)
except OSError:                   # non-glibc platform: plain empty
    _libc = None


def madvise_hugepage(arr: np.ndarray) -> None:
    """Best-effort MADV_HUGEPAGE over an array's backing pages."""
    if _libc is None or arr.nbytes < (4 << 20):
        return
    addr = arr.ctypes.data
    base = addr & ~(_HP - 1)
    _libc.madvise(ctypes.c_void_p(base),
                  ctypes.c_size_t(arr.nbytes + (addr - base)),
                  _MADV_HUGEPAGE)


def hugepage_empty(shape, dtype) -> np.ndarray:
    """np.empty whose first touch faults 2 MB pages instead of 4 KB."""
    a = np.empty(shape, dtype)
    madvise_hugepage(a)
    return a
