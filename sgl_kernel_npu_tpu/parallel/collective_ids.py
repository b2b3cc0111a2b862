"""Central collective-id allocator for Pallas communication kernels.

Every Pallas kernel that performs cross-chip DMA needs a ``collective_id`` —
Mosaic's handle for the barrier semaphore that orders the kernel against other
collectives in the same XLA program.  Two *different* collectives sharing an id
inside one program can be reordered independently by XLA's scheduler on
different ranks, which deadlocks the mesh (the failure mode the reference
avoids by construction: each aclnn op gets its own HCCL tag).

Round 1 used hand-picked constants (7/9/24/25/26 + per-call counters), which
collide the first time two ``Buffer`` objects or a dispatch + fused-kernel pair
co-exist in one jitted program.  This module replaces them with a process-wide
trace-time allocator:

- ``next_collective_id(n)`` reserves ``n`` consecutive ids and advances a
  global cursor.  Allocation happens at *trace* time (ids are static Python
  ints), so every call site in one traced program gets distinct ids, and all
  ranks — traced from the same single-controller program — agree on them.
- Ids wrap modulo ``POOL_SIZE`` (4096).  Reuse across separately-compiled
  programs is safe (barrier semaphores are program-scoped); a wrap *inside*
  one program would need >4096 communication kernels in a single jit, far
  beyond any real model step.

Reference analogue: the per-op HCCL comm tags and the fixed window offsets of
``sync_collectives.h`` (each op class owns a distinct flag region).
"""

from __future__ import annotations

import threading

POOL_SIZE = 4096

_lock = threading.Lock()
_cursor = 0


def next_collective_id(n: int = 1) -> int:
    """Reserve ``n`` consecutive collective ids; returns the first.

    The block never straddles the wrap point, so ``base + i`` for ``i < n`` is
    always valid.
    """
    global _cursor
    if not 0 < n <= 64:
        raise ValueError(f"reservation size must be in [1, 64], got {n}")
    with _lock:
        base = _cursor
        if base + n > POOL_SIZE:  # don't straddle the wrap
            base = 0
        _cursor = base + n
        return base


def reset_collective_ids(value: int = 0) -> None:
    """Test hook: rewind the cursor (ids are program-scoped, so this is safe
    between independently-compiled programs)."""
    global _cursor
    with _lock:
        _cursor = value


def current_cursor() -> int:
    return _cursor
