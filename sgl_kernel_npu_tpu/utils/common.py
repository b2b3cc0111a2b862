"""Shared helpers for kernel modules.

TPU analogue of the reference's ``utils/triton_utils.py`` (grid sizing from device
properties): on TPU the Mosaic compiler owns core scheduling, so the helpers here
are about tiling alignment and interpret-mode selection instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Minimal sublane tile (second-to-last dim) per dtype; lane dim is always 128.
LANE = 128
_SUBLANE = {
    jnp.float32.dtype: 8,
    jnp.bfloat16.dtype: 16,
    jnp.int8.dtype: 32,
    jnp.float8_e4m3fn.dtype: 32,
    jnp.int32.dtype: 8,
}


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def sublane(dtype) -> int:
    return _SUBLANE.get(jnp.dtype(dtype), 8)


@functools.cache
def interpret_default() -> bool:
    """Run Pallas kernels in interpreter mode on CPU test meshes.

    Any non-CPU backend (``tpu`` locally, ``axon``-tunnelled TPU) compiles with Mosaic.
    """
    return jax.default_backend() == "cpu"


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()
