"""SwiGLU activations (+ per-token dynamic INT8 quant) — Pallas + jnp references.

Capability parity with reference ``python/sgl_kernel_npu/sgl_kernel_npu/activation/``:
- ``swiglu_quant`` — SwiGLU over grouped expert rows with per-row dynamic INT8 quant
  and a fp32 scale output (swiglu_quant.py:76).  The input last dim is split in half:
  gate = x[:, :H/2] (silu), up = x[:, H/2:].  ``group_list`` bounds the number of valid
  rows (cusum mode 0 / count mode 1); rows beyond are zeroed (the reference leaves them
  uninitialized — zero is the JAX-friendly, deterministic choice).
- ``swiglu_oai`` — GPT-OSS clamped variant with interleaved gate/up and
  ``(up + 1) * gate * sigmoid(gate * alpha)`` (swiglu_oai.py:85-95).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.quant import INT8_MAX, saturate_int8
from sgl_kernel_npu_tpu.utils.common import cdiv, interpret_default


def swiglu_ref(x: jax.Array) -> jax.Array:
    """Plain SwiGLU: silu(x1) * x2 with x split in half on the last dim."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    x1f = x1.astype(jnp.float32)
    return (x1f * jax.nn.sigmoid(x1f) * x2.astype(jnp.float32)).astype(x.dtype)


def _valid_rows_from_group_list(group_list, group_list_type: int):
    if group_list is None:
        return None
    if group_list_type == 0:  # cumulative sums; last entry = total rows
        return group_list[-1].astype(jnp.int32)
    return jnp.sum(group_list).astype(jnp.int32)  # per-group counts


def swiglu_quant_ref(x, group_list=None, group_list_type: int = 1, need_quant: bool = True):
    """Golden twin of :func:`swiglu_quant` (activation/swiglu_quant.py:76)."""
    rows, h = x.shape
    x1, x2 = x[:, : h // 2], x[:, h // 2 :]
    x1f = x1.astype(jnp.float32)
    out = x1f * jax.nn.sigmoid(x1f) * x2.astype(jnp.float32)
    total = _valid_rows_from_group_list(group_list, group_list_type)
    if total is not None:
        mask = (jnp.arange(rows) < total)[:, None]
        out = jnp.where(mask, out, 0.0)
    if not need_quant:
        return out.astype(x.dtype), jnp.zeros((rows,), jnp.float32)
    scale = jnp.max(jnp.abs(out), axis=-1) / INT8_MAX
    safe = jnp.maximum(scale, 1e-12)
    q = saturate_int8(out / safe[:, None])
    return q, scale


def _swiglu_quant_kernel(total_ref, x_ref, out_ref, scale_ref, *, need_quant, block_rows):
    i = pl.program_id(0)
    rows_before = i * block_rows
    total = total_ref[0]
    x = x_ref[...]
    h2 = x.shape[-1] // 2
    x1 = x[:, :h2].astype(jnp.float32)
    x2 = x[:, h2:].astype(jnp.float32)
    out = x1 * jax.nn.sigmoid(x1) * x2
    row_ids = rows_before + jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    out = jnp.where(row_ids < total, out, 0.0)
    if need_quant:
        scale = jnp.max(jnp.abs(out), axis=-1, keepdims=True) / INT8_MAX
        scale_ref[...] = scale
        out_ref[...] = saturate_int8(out / jnp.maximum(scale, 1e-12))
    else:
        scale_ref[...] = jnp.zeros_like(scale_ref)
        out_ref[...] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group_list_type", "need_quant", "block_rows", "interpret")
)
def swiglu_quant(
    x,
    group_list=None,
    group_list_type: int = 1,
    need_quant: bool = True,
    *,
    block_rows: int = 128,
    interpret=None,
):
    """Fused SwiGLU + per-row dynamic INT8 quant over grouped (MoE expert) rows.

    Args:
        x: ``[rows, 2*H]`` activations (gate | up concatenated on last dim).
        group_list: per-expert row counts (type 1) or cumulative sums (type 0);
            bounds valid rows.  ``None`` processes every row.
        need_quant: emit int8 + scales when True, else ``x.dtype`` output.

    Returns:
        ``(out [rows, H], scale [rows] float32)``.
    """
    if group_list_type not in (0, 1):
        raise ValueError(f"group_list_type must be 0 or 1, got {group_list_type}")
    if interpret is None:
        interpret = interpret_default()
    rows, h = x.shape
    total = _valid_rows_from_group_list(group_list, group_list_type)
    if total is None:
        total = jnp.int32(rows)
    bn = min(block_rows, rows)
    out_dtype = jnp.int8 if need_quant else x.dtype
    out, scale = pl.pallas_call(
        functools.partial(_swiglu_quant_kernel, need_quant=need_quant, block_rows=bn),
        grid=(cdiv(rows, bn),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bn, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bn, h // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, h // 2), out_dtype),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ),
        interpret=interpret,
    )(total.reshape(1), x)
    return out, scale[:, 0]


def swiglu_oai_ref(gate_up, alpha: float = 1.702, limit: float = 7.0):
    """GPT-OSS SwiGLU: interleaved gate/up, clamped (swiglu_oai.py:85-95)."""
    gate = gate_up[..., ::2].astype(jnp.float32)
    up = gate_up[..., 1::2].astype(jnp.float32)
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    glu = gate * jax.nn.sigmoid(gate * alpha)
    return ((up + 1.0) * glu).astype(gate_up.dtype)


def _swiglu_oai_kernel(gate_ref, up_ref, o_ref, *, alpha, limit):
    gate = jnp.minimum(gate_ref[...].astype(jnp.float32), limit)
    up = jnp.clip(up_ref[...].astype(jnp.float32), -limit, limit)
    glu = gate * jax.nn.sigmoid(gate * alpha)
    o_ref[...] = ((up + 1.0) * glu).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("alpha", "limit", "block_rows", "interpret"))
def swiglu_oai(
    gate_up, alpha: float = 1.702, limit: float = 7.0, *, block_rows: int = 128, interpret=None
):
    """Pallas GPT-OSS SwiGLU (clamped, interleaved)."""
    if interpret is None:
        interpret = interpret_default()
    rows, h = gate_up.shape
    bn = min(block_rows, rows)
    # De-interleave with XLA (Mosaic rejects stride-2 shape casts); kernel does the
    # clamped GLU math on contiguous gate/up blocks.
    gate, up = gate_up[:, ::2], gate_up[:, 1::2]
    row_spec = pl.BlockSpec((bn, h // 2), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_swiglu_oai_kernel, alpha=alpha, limit=limit),
        grid=(cdiv(rows, bn),),
        in_specs=[row_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, h // 2), gate_up.dtype),
        interpret=interpret,
    )(gate, up)
