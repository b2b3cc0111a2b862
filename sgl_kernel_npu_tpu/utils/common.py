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


_logger = None


def get_logger():
    """Package logger (reference: OPS_LOG_* macros + deep_ep DEBUG logging)."""
    global _logger
    if _logger is None:
        import logging

        _logger = logging.getLogger("sgl_kernel_npu_tpu")
    return _logger


def log_parameters(fn):
    """Log every call's parameters at DEBUG level — the reference's
    ``@log_parameters`` (python/deep_ep/deep_ep/utils.py:48-113), TPU-native:
    arrays are described by shape/dtype/sharding, never fetched (fetching a
    value would force a device sync inside the serving loop).
    """
    import functools as _ft
    import inspect
    import logging

    sig = inspect.signature(fn)

    def describe(v):
        if isinstance(v, jax.Array):
            sh = getattr(v, "sharding", None)
            return f"Array{tuple(v.shape)}:{v.dtype}{'@' + str(sh.spec) if hasattr(sh, 'spec') else ''}"
        if isinstance(v, (list, tuple)) and len(v) > 4:
            return f"{type(v).__name__}(len={len(v)})"
        return repr(v)

    @_ft.wraps(fn)
    def wrapped(*args, **kwargs):
        logger = get_logger()
        if logger.isEnabledFor(logging.DEBUG):
            try:
                bound = sig.bind(*args, **kwargs)
                params = ", ".join(
                    f"{k}={describe(v)}" for k, v in bound.arguments.items()
                    if k != "self"
                )
                logger.debug("%s(%s)", fn.__qualname__, params)
            except TypeError:
                logger.debug("%s(<unbindable args>)", fn.__qualname__)
        return fn(*args, **kwargs)

    return wrapped
