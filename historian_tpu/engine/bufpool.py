"""Grow-only, role-keyed host buffer pool for the big DP cell tensors.

The progressive reconstruction allocates a few hundred MB of fresh cell
storage per merge (dense [Sx, Sy, 5] float64 forward + backward
tensors).  First-touch page faults on freshly mapped memory are very
slow on some hosts (measured ~13 s/GB here vs ~0.1 s/GB warm), so
repeatedly allocating and freeing these tensors can dominate wall
clock.  Merges run sequentially, so one buffer per *role* ("fwd-cells",
"bwd-cells") is reused across merges: the pool hands out reshaped views
of a grow-only flat arena, paying the fault cost once per high-water
mark instead of once per merge.

Safety: each arena remembers (a weak reference to) the object it was
last lent to.  If that owner is still alive at the next request -- e.g.
a test holding two ForwardMatrix objects at once -- the pool returns a
fresh unpooled allocation instead, so no live matrix is ever clobbered.
Callers that want pooling (the recon merge loop) drop their references
before building the next matrix.

Contents are NOT zeroed between uses -- every caller either fills the
whole tensor itself (the native fill pins masked cells) or explicitly
.fill()s it first, exactly as the previous np.full/np.empty code did,
so results are bit-identical to unpooled allocation.
"""

from __future__ import annotations

import mmap
import weakref

import numpy as np

_arenas: dict[str, np.ndarray] = {}
_owners: dict[str, "weakref.ref | None"] = {}


def _alloc_arena(n: int) -> np.ndarray:
    """Anonymous mmap arena, huge-page hinted: on hosts with slow fault
    paths (observed up to ~175 us/page under neighbor load) 2MB THP
    faults cut the first-touch count 512x."""
    try:
        mm = mmap.mmap(-1, n)
        try:
            mm.madvise(mmap.MADV_HUGEPAGE)
        except (AttributeError, OSError):
            pass
        return np.frombuffer(mm, dtype=np.uint8)
    except (OSError, ValueError):
        return np.empty(n, dtype=np.uint8)


def get(role: str, shape: tuple[int, ...], owner, dtype=np.float64) -> np.ndarray:
    """An uninitialized array of `shape`, pooled per role when safe."""
    n = int(np.prod(shape)) * np.dtype(dtype).itemsize
    prev = _owners.get(role)
    if prev is not None and prev() is not None and prev() is not owner:
        return np.empty(shape, dtype=dtype)  # previous borrower still alive
    arena = _arenas.get(role)
    if arena is None or arena.nbytes < n:
        arena = _alloc_arena(n)
        _arenas[role] = arena
    _owners[role] = weakref.ref(owner)
    return arena[:n].view(dtype).reshape(shape)


def clear() -> None:
    """Release all arenas (tests / memory pressure)."""
    _arenas.clear()
    _owners.clear()
