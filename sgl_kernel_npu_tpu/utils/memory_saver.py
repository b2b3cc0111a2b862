"""Pause/resume of device memory regions (torch_memory_saver analogue).

Capability parity with reference ``contrib/torch_memory_saver``: tagged regions
whose physical device memory can be released (``pause``) and restored (``resume``)
— used for RL weight swapping and KV-cache eviction (README.md:1-24 there).

TPU/JAX design: arrays are immutable handles, so the mechanism is a registry.
``pause(tag)`` optionally snapshots tagged arrays to host then deletes the device
buffers (freeing HBM immediately — JAX's ``Array.delete`` is the analogue of
releasing physical pages while the registry keeps the "virtual address": the name).
``resume(tag)`` re-materializes them with ``device_put`` and hands back fresh
arrays under the same names.  ``cpu_backup=False`` mirrors the reference's
discard-and-recompute mode (contents are NOT restored — caller re-fills).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


@dataclasses.dataclass
class _Region:
    tag: str
    value: Any            # live jax.Array, or host snapshot / placeholder when paused
    paused: bool
    cpu_backup: bool
    shape: tuple
    dtype: Any
    sharding: Any


class MemorySaver:
    """Registry of pauseable device arrays."""

    def __init__(self):
        self._regions: dict[str, _Region] = {}

    def register(self, name: str, array: jax.Array, *, tag: str = "default",
                 cpu_backup: bool = True) -> jax.Array:
        self._regions[name] = _Region(
            tag, array, False, cpu_backup, array.shape, array.dtype, array.sharding
        )
        return array

    def get(self, name: str) -> jax.Array:
        r = self._regions[name]
        if r.paused:
            raise RuntimeError(f"region {name!r} is paused")
        return r.value

    def pause(self, tag: str = "default") -> int:
        """Release device memory of all regions with ``tag``; returns bytes freed."""
        freed = 0
        for r in self._regions.values():
            if r.tag != tag or r.paused:
                continue
            freed += r.value.nbytes
            snapshot = np.asarray(r.value) if r.cpu_backup else None
            r.value.delete()
            r.value = snapshot
            r.paused = True
        return freed

    def resume(self, tag: str = "default") -> None:
        """Re-materialize paused regions (zeros when ``cpu_backup=False``)."""
        for r in self._regions.values():
            if r.tag != tag or not r.paused:
                continue
            host = r.value if r.value is not None else np.zeros(r.shape, r.dtype)
            r.value = jax.device_put(host, r.sharding)
            r.paused = False

    def device_bytes(self) -> int:
        return sum(r.value.nbytes for r in self._regions.values() if not r.paused)
