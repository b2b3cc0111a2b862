"""RMSNorm fusions (Pallas) + pure-jnp references.

Capability parity with reference ``python/sgl_kernel_npu/sgl_kernel_npu/norm/``:
- ``add_rms_norm_bias``   — residual-add + RMSNorm + bias, optional static per-channel
  INT8 quant; also returns the pre-norm sum (add_rmsnorm_bias.py:82).
- ``add_gemma_rms_norm``  — residual-add + Gemma-style RMSNorm (weight + 1)
  (add_rmsnorm_bias.py:189).
- ``rms_norm``            — plain RMSNorm (building block used by mla_preprocess,
  csrc/mla_preprocess rmsnorm+quant stages).
- ``l1_norm``             — row sum normalization (l1_norm.py:28). NOTE: the reference
  divides by the *signed sum* (not sum of |x|); we reproduce that behavior.

All math is fp32 internally, outputs cast back to input dtype (bf16-safe).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.quant import quant_static_per_channel_ref, saturate_int8
from sgl_kernel_npu_tpu.utils.common import cdiv, interpret_default


# ---------------------------------------------------------------------------
# references (golden)
# ---------------------------------------------------------------------------

def rms_norm_ref(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def add_rms_norm_bias_ref(
    x, residual, norm_weight, norm_bias, eps, quant_scale=None, quant_offset=None
):
    added = (x + residual).astype(x.dtype)
    af = added.astype(jnp.float32)
    var = jnp.mean(af * af, axis=-1, keepdims=True)
    normed = af * jax.lax.rsqrt(var + eps) * norm_weight.astype(jnp.float32)
    normed = normed + norm_bias.astype(jnp.float32)
    if quant_scale is not None:
        out = quant_static_per_channel_ref(normed, quant_scale, quant_offset)
    else:
        out = normed.astype(x.dtype)
    return out, added


def add_gemma_rms_norm_ref(hidden_state, weight, residual, eps):
    added = (hidden_state + residual).astype(hidden_state.dtype)
    af = added.astype(jnp.float32)
    var = jnp.mean(af * af, axis=-1, keepdims=True)
    normed = af * jax.lax.rsqrt(var + eps) * (weight.astype(jnp.float32) + 1.0)
    return normed.astype(hidden_state.dtype), added


def l1_norm_ref(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return xf / jnp.sum(xf, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _rms_norm_kernel(x_ref, w_ref, o_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    o_ref[...] = (xf * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)).astype(
        o_ref.dtype
    )


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def rms_norm(x, weight, eps: float = 1e-6, *, block_rows: int = 256, interpret=None):
    """RMSNorm over the last dim of 2D ``x [rows, hidden]``."""
    if interpret is None:
        interpret = interpret_default()
    rows, hidden = x.shape
    bn = min(block_rows, rows)
    return pl.pallas_call(
        functools.partial(_rms_norm_kernel, eps=eps),
        grid=(cdiv(rows, bn),),
        in_specs=[
            pl.BlockSpec((bn, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, hidden), x.dtype),
        interpret=interpret,
    )(x, weight.reshape(1, hidden))


def _add_rms_norm_bias_kernel(
    x_ref, r_ref, w_ref, b_ref, qs_ref, qo_ref, out_ref, added_ref, *, eps, quantize
):
    added = (x_ref[...] + r_ref[...]).astype(added_ref.dtype)
    added_ref[...] = added
    af = added.astype(jnp.float32)
    var = jnp.mean(af * af, axis=-1, keepdims=True)
    normed = af * jax.lax.rsqrt(var + eps) * w_ref[...].astype(jnp.float32)
    normed = normed + b_ref[...].astype(jnp.float32)
    if quantize:
        out_ref[...] = saturate_int8(
            normed * qs_ref[...].astype(jnp.float32) + qo_ref[...].astype(jnp.float32)
        )
    else:
        out_ref[...] = normed.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_rows", "interpret")
)
def add_rms_norm_bias(
    x,
    residual,
    norm_weight,
    norm_bias,
    eps: float = 1e-6,
    quant_scale=None,
    quant_offset=None,
    *,
    block_rows: int = 128,
    interpret=None,
):
    """Fused residual-add + RMSNorm + bias (+ optional static INT8 quant).

    Returns ``(out, x_plus_residual)``; ``out`` is int8 when ``quant_scale`` is given.
    Reference behavior: norm/add_rmsnorm_bias.py:82-146.
    """
    if interpret is None:
        interpret = interpret_default()
    rows, hidden = x.shape
    bn = min(block_rows, rows)
    quantize = quant_scale is not None
    if not quantize:
        # Dummy operands keep a single kernel signature.
        quant_scale = jnp.ones((hidden,), jnp.float32)
        quant_offset = jnp.zeros((hidden,), jnp.float32)
    out_dtype = jnp.int8 if quantize else x.dtype
    row_spec = pl.BlockSpec((bn, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out, added = pl.pallas_call(
        functools.partial(_add_rms_norm_bias_kernel, eps=eps, quantize=quantize),
        grid=(cdiv(rows, bn),),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, hidden), out_dtype),
            jax.ShapeDtypeStruct((rows, hidden), x.dtype),
        ),
        interpret=interpret,
    )(
        x,
        residual,
        norm_weight.reshape(1, hidden),
        norm_bias.reshape(1, hidden),
        quant_scale.reshape(1, hidden),
        quant_offset.reshape(1, hidden),
    )
    return out, added


def _add_gemma_kernel(x_ref, w_ref, r_ref, norm_ref, added_ref, *, eps):
    added = (x_ref[...] + r_ref[...]).astype(added_ref.dtype)
    added_ref[...] = added
    af = added.astype(jnp.float32)
    var = jnp.mean(af * af, axis=-1, keepdims=True)
    normed = af * jax.lax.rsqrt(var + eps) * (w_ref[...].astype(jnp.float32) + 1.0)
    norm_ref[...] = normed.astype(norm_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "block_rows", "interpret"))
def add_gemma_rms_norm(
    hidden_state, weight, residual, eps: float = 1e-6, *, block_rows: int = 128, interpret=None
):
    """Fused residual-add + Gemma RMSNorm (scale = weight + 1).

    Returns ``(norm_output, add_output)``.  Reference: norm/add_rmsnorm_bias.py:189-222.
    """
    if interpret is None:
        interpret = interpret_default()
    rows, hidden = hidden_state.shape
    bn = min(block_rows, rows)
    row_spec = pl.BlockSpec((bn, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM)
    norm_out, add_out = pl.pallas_call(
        functools.partial(_add_gemma_kernel, eps=eps),
        grid=(cdiv(rows, bn),),
        in_specs=[row_spec, vec_spec, row_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, hidden), hidden_state.dtype),
            jax.ShapeDtypeStruct((rows, hidden), hidden_state.dtype),
        ),
        interpret=interpret,
    )(hidden_state, weight.reshape(1, hidden), residual)
    return norm_out, add_out


def split_qkv_rmsnorm_rope(
    x: jax.Array,
    sin: jax.Array,
    cos: jax.Array,
    q_hidden_size: int,
    kv_hidden_size: int,
    head_dim: int,
    eps: float | None = None,
    q_weight: jax.Array | None = None,
    k_weight: jax.Array | None = None,
    q_bias: jax.Array | None = None,
    k_bias: jax.Array | None = None,
):
    """Fused QKV split + per-head RMSNorm + rotate-half RoPE on q/k.

    Parity: norm/split_qkv_rmsnorm_rope.py:202 — input ``[B, q_hidden + 2·kv_hidden]``
    is split into q/k/v; q and k get per-head RMSNorm (``q_weight``/``k_weight``
    over ``head_dim``, optional bias) then RoPE (``sin``/``cos`` are ``[B, head_dim]``);
    v passes through.  Returns ``(q, k, v)``.

    Pure per-head VPU math — under jit XLA emits one fused pass, so no Pallas
    kernel is warranted (house rule: docs/adding_a_kernel.md §6).
    """
    b = x.shape[0]
    q, k, v = jnp.split(x, [q_hidden_size, q_hidden_size + kv_hidden_size], axis=-1)

    def headwise(t, w, bias):
        th = t.reshape(b, -1, head_dim).astype(jnp.float32)
        if eps is not None:
            var = jnp.mean(th * th, axis=-1, keepdims=True)
            th = th * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
            if bias is not None:
                th = th + bias.astype(jnp.float32)
        return th

    def rope(th):
        half = head_dim // 2
        rot = jnp.concatenate([-th[..., half:], th[..., :half]], axis=-1)
        out = th * cos.astype(jnp.float32)[:, None, :] + rot * sin.astype(jnp.float32)[:, None, :]
        return out.astype(x.dtype).reshape(b, -1)

    q_out = rope(headwise(q, q_weight, q_bias))
    k_out = rope(headwise(k, k_weight, k_bias))
    return q_out, k_out, v


def _l1_norm_kernel(x_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    o_ref[...] = xf / jnp.sum(xf, axis=-1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def l1_norm(x, *, block_rows: int = 256, interpret=None):
    """Row-normalize by the signed row sum; fp32 output (l1_norm.py:28)."""
    if interpret is None:
        interpret = interpret_default()
    rows, hidden = x.shape
    bn = min(block_rows, rows)
    return pl.pallas_call(
        _l1_norm_kernel,
        grid=(cdiv(rows, bn),),
        in_specs=[pl.BlockSpec((bn, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bn, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, hidden), jnp.float32),
        interpret=interpret,
    )(x)
