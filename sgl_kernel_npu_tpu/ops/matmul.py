"""Quantized matmul building blocks.

- :func:`quant_matmul` — W8A8 int8 GEMM with fused bias + per-channel dequant
  (Pallas; the TPU twin of the reference's PpMatmul W8A8 stages inside
  csrc/mla_preprocess, e.g. mla_preprocess.cpp:368-607 tiling + MMAD pipeline).
- :func:`quant_per_tensor` — static per-tensor quant ``round(x/scale + zp)``
  (golden semantics: tests/python/sgl_kernel_npu/test_mla_preprocess.py:74-80).
- :func:`batch_matmul_transpose` — per-head batched matmul ``bmk,mkn->bmn``
  (reference csrc/batch_matmul_transpose; golden test_batch_matmul_transpose.py:15-17).
  On TPU a single einsum maps straight onto batched MXU ops, so no custom kernel
  is warranted; the fused-transpose output trick is a layout no-op under XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.utils.common import cdiv, interpret_default


def quant_per_tensor(x: jax.Array, scale, zp) -> jax.Array:
    """Static per-tensor quant: round(x / scale + zp) saturated to int8."""
    y = x.astype(jnp.float32) / jnp.float32(scale) + jnp.float32(zp)
    return jnp.clip(jnp.round(y), -128, 127).astype(jnp.int8)


def quant_matmul_ref(x_q, w_q, de_scale, bias=None, out_dtype=jnp.bfloat16):
    """Golden: ``(x_q @ w_q.T + bias) * de_scale`` (w_q is [N, K])."""
    acc = jax.lax.dot_general(
        x_q.astype(jnp.int32),
        w_q.astype(jnp.int32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if bias is not None:
        acc = acc + bias.astype(jnp.int32)[None, :]
    return (acc.astype(jnp.float32) * de_scale.astype(jnp.float32)[None, :]).astype(out_dtype)


def _quant_matmul_kernel(x_ref, w_ref, ds_ref, b_ref, o_ref, acc_ref, *, has_bias):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )

    @pl.when(k == nk - 1)
    def _out():
        acc = acc_ref[...]
        if has_bias:
            acc = acc + b_ref[...].astype(jnp.int32)
        o_ref[...] = (acc.astype(jnp.float32) * ds_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype
        )


def _quant_matmul_tiles(m, n, k, out_bytes, budget=10 * 2**20):
    """Traffic-model tile pick (cf. grouped_matmul's selector): weights are read
    once per m-step and x once per (m-step, n-tile), so the widest VMEM-legal
    ``tn`` minimizes x re-reads — full-N when it fits (then x streams exactly
    once).  Lane dim of the f32 out block needs 128-divisibility → round N up."""
    tm = min(128, max(32, m))
    tn = -(-n // 128) * 128
    tk = min(512, -(-k // 128) * 128)
    while tn > 256 and (2 * tk * tn + 2 * (4 + out_bytes) * tm * tn + 2 * tm * tk) > budget:
        tn = -(-(tn // 2) // 128) * 128
    return tm, tn, tk


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "tm", "tn", "tk", "interpret")
)
def quant_matmul(
    x_q: jax.Array,
    w_q: jax.Array,
    de_scale: jax.Array,
    bias: jax.Array | None = None,
    *,
    out_dtype=jnp.bfloat16,
    tm: int | None = None,
    tn: int | None = None,
    tk: int | None = None,
    interpret=None,
) -> jax.Array:
    """W8A8 GEMM: ``x_q [M, K] int8 @ w_q [N, K].T`` + bias, × per-channel de_scale.

    N and K must be multiples of the tile sizes after clamping; M is padded freely.
    Tile sizes default to the traffic-model pick (wide N, see _quant_matmul_tiles).
    """
    if interpret is None:
        interpret = interpret_default()
    m, kdim = x_q.shape
    n = w_q.shape[0]
    atm, atn, atk = _quant_matmul_tiles(
        m, n, kdim, jnp.dtype(out_dtype).itemsize)
    tm, tn, tk = tm or atm, tn or atn, tk or atk
    tm = min(tm, max(32, m))
    tn = min(tn, -(-n // 128) * 128)
    tk = min(tk, -(-kdim // 128) * 128)
    has_bias = bias is not None
    if bias is None:
        bias = jnp.zeros((n,), jnp.int32)
    # pad N/K up to tile multiples (zero rows/cols contribute nothing)
    n_pad = cdiv(n, tn) * tn - n
    k_pad = cdiv(kdim, tk) * tk - kdim
    n_orig = n
    if k_pad:
        x_q = jnp.pad(x_q, ((0, 0), (0, k_pad)))
        w_q = jnp.pad(w_q, ((0, 0), (0, k_pad)))
        kdim += k_pad
    if n_pad:
        w_q = jnp.pad(w_q, ((0, n_pad), (0, 0)))
        de_scale = jnp.pad(de_scale, (0, n_pad))
        bias = jnp.pad(bias, (0, n_pad))
        n += n_pad
    grid = (cdiv(m, tm), n // tn, kdim // tk)
    return pl.pallas_call(
        functools.partial(_quant_matmul_kernel, has_bias=has_bias),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, tk), lambda i, j, k: (j, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * kdim * n, bytes_accessed=m * kdim + n * kdim + 2 * m * n, transcendentals=0
        ),
        interpret=interpret,
    )(x_q, w_q, de_scale.reshape(1, n), bias.reshape(1, n))[:, :n_orig]


def batch_matmul_transpose(
    a: jax.Array,
    b: jax.Array,
    out_dtype=None,
    *,
    quant_mode: str | None = None,
    de_scale: jax.Array | None = None,
    bias: jax.Array | None = None,
    per_token_scale: jax.Array | None = None,
) -> jax.Array:
    """``out[i, j] = a[i, j, :] @ b[j]`` — einsum ``bmk,mkn->bmn``.

    Matches reference torch.ops.npu.batch_matmul_transpose (bmm over the head dim
    with fused output transpose, test_batch_matmul_transpose.py:15-17).

    ``quant_mode`` enables the reference's PpMatmul W8A8 dequant epilogues
    (batch_matmul_transpose.cpp:16-19 quantModeMap → tiling_data.h:14
    ``QuantMode``) for int8 ``a``/``b``:

    - ``per_channel_symm``:  ``out = acc_i32 * de_scale[m, n]``
    - ``per_channel_asymm``: ``out = (acc_i32 + bias[m, n]) * de_scale[m, n]``
      (``bias`` is the precomputed int32 zero-point correction
      ``-zp[m, n] * sum_k a[b, m, k]`` folded per channel, the standard
      asymmetric-weight form)
    - ``per_token_symm``:    ``out = acc_i32 * de_scale[m, n] * pts[b, m]``

    ``de_scale`` broadcasts from ``[m, n]`` (or ``[n]``); ``per_token_scale``
    from ``[b, m]`` (or ``[b]``).  On TPU the int8 einsum lowers to batched
    MXU int8 ops and XLA fuses the dequant epilogue — no custom kernel needed
    (the NZ weight format is a layout concern Mosaic owns).
    """
    if quant_mode is None:
        out = jnp.einsum(
            "bmk,mkn->bmn", a, b, preferred_element_type=jnp.float32
        )
        return out.astype(out_dtype or a.dtype)

    if quant_mode not in ("per_channel_symm", "per_channel_asymm", "per_token_symm"):
        raise ValueError(f"unsupported quant_mode {quant_mode!r}")
    assert de_scale is not None, "quantized modes need de_scale"
    out_dtype = out_dtype or jnp.bfloat16
    acc = jnp.einsum(
        "bmk,mkn->bmn",
        a.astype(jnp.int32),
        b.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    )
    if quant_mode == "per_channel_asymm":
        assert bias is not None, "per_channel_asymm needs the int32 bias term"
        acc = acc + bias.astype(jnp.int32)[None]
    ds = de_scale.astype(jnp.float32)
    if ds.ndim == 1:
        ds = ds[None, :]
    out = acc.astype(jnp.float32) * ds[None]
    if quant_mode == "per_token_symm":
        assert per_token_scale is not None, "per_token_symm needs per_token_scale"
        pts = per_token_scale.astype(jnp.float32)
        if pts.ndim == 1:
            pts = pts[:, None]
        out = out * pts[..., None]
    return out.astype(out_dtype)
