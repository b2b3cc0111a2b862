"""Per-token dynamic INT8 quantization.

Capability parity with the reference's quant paths:
- per-token dynamic symmetric INT8 (scale = max|row| / 127, saturating cast) as used by
  the EP dispatch comm-quant (reference: csrc/deepep/ops/op_kernel/moe_distribute_dispatch_v2.h:994
  ``QuantProcess``) and SwiGLU requant (python/sgl_kernel_npu/.../activation/swiglu_quant.py:50-61);
- per-channel static INT8 (value * scale + offset, saturate) as used by the RMSNorm+quant
  fusions (python/sgl_kernel_npu/.../norm/add_rmsnorm_bias.py:47-72).

Each op has a pure-jnp reference (``*_ref``) and a Pallas kernel; jnp versions are also
what larger fused kernels inline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.utils.common import cdiv, interpret_default

INT8_MAX = 127.0


def saturate_int8(x: jax.Array) -> jax.Array:
    """Round-to-nearest-even then clamp to int8 range (AscendC saturating cast)."""
    return jnp.clip(jnp.round(x), -128.0, INT8_MAX).astype(jnp.int8)


def quant_per_token_ref(x: jax.Array, eps: float = 1e-12):
    """Per-row symmetric dynamic quant: returns (int8 values, float32 scales [rows])."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / INT8_MAX
    scale = jnp.maximum(scale, eps)
    q = saturate_int8(xf / scale[..., None])
    return q, scale


def dequant_per_token(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def _quant_kernel(x_ref, out_ref, scale_ref):
    xf = x_ref[...].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / INT8_MAX, 1e-12)
    out_ref[...] = saturate_int8(xf / scale)
    scale_ref[...] = scale


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def quant_per_token(
    x: jax.Array,
    *,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Pallas per-token dynamic INT8 quant for 2D ``x [rows, hidden]``.

    Returns ``(values int8 [rows, hidden], scales float32 [rows])``.
    """
    if interpret is None:
        interpret = interpret_default()
    rows, hidden = x.shape
    bn = min(block_rows, rows)
    grid = (cdiv(rows, bn),)
    q, scale = pl.pallas_call(
        _quant_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((bn, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((bn, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, hidden), jnp.int8),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ),
        interpret=interpret,
    )(x)
    return q, scale[:, 0]


def wire_quant(x: jax.Array, *, interpret: bool | None = None):
    """Deterministic per-row INT8 wire quant for EP dispatch/combine payloads.

    Routed through the Pallas kernel so every caller — the fused single-kernel
    MoE wrapper, ``dispatch_core``, the combine comm-quant — quantizes with
    the SAME compiled code.  Two separately-jitted XLA programs may compile
    the jnp ``round(x / scale)`` with different excess-precision choices
    (division vs reciprocal-multiply), flipping boundary values by ±1 int8
    step; that broke fused-vs-unfused comparisons at the reference's 4e-4 bar
    (tests/python/deepep/test_fused_deep_moe.py:469).  Mosaic compiles the
    kernel body identically in any enclosing program.

    Accepts ``[..., H]``; returns ``(int8 [..., H], f32 scales [...])``.
    """
    lead = x.shape[:-1]
    h = x.shape[-1]
    q, s = quant_per_token(x.reshape(-1, h), interpret=interpret)
    return q.reshape(*lead, h), s.reshape(lead)


def quant_static_per_channel_ref(
    x: jax.Array, scale: jax.Array, offset: jax.Array
) -> jax.Array:
    """Static per-channel quant: saturate(x * scale + offset) → int8."""
    return saturate_int8(x.astype(jnp.float32) * scale.astype(jnp.float32) + offset.astype(jnp.float32))
