"""W8A8 (int8 weights × per-token int8 activations) serving path helpers.

The reference library is W8A8-centric: its mla_preprocess runs the whole
attention prologue through W8A8 GEMMs (reference
csrc/mla_preprocess/op_host/mla_preprocess.cpp:368 mm1/mm2 tilings), the fused
MoE chain is int8 end-to-end (fused_deep_moe.h:60-120), and swiglu_quant
(activation/swiglu_quant.py:76) exists precisely to re-quantize between the
two GEMMs.  This module applies the same recipe to the dense model families
(Llama / GPT-OSS): per-OUT-channel symmetric weight quant at load time,
per-token dynamic activation quant at run time, int8 MXU matmuls via
``ops.matmul.quant_matmul`` — halving decode weight HBM traffic (the dense
decode bottleneck) and doubling MXU int8 throughput.

DeepSeek's MoE half already has this path (models/deepseek_v3.quantize_moe_weights);
these helpers bring the dense projections to parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.matmul import quant_matmul
from sgl_kernel_npu_tpu.ops.quant import quant_per_token


def quantize_matrix(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-out-channel symmetric int8 quant of a ``[K, N]`` projection matrix.

    Returns ``(w_q [N, K] int8, de_scale [N] float32)`` in the layout
    ``quant_matmul`` consumes (weights transposed so the contraction dim is
    the lane-contiguous minor dim).
    """
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.abs(wf).max(axis=0) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / s[None, :]), -128, 127).astype(jnp.int8)
    return q.T, s


def qmm(x_q: jax.Array, sx: jax.Array, wq_s, out_dtype=jnp.float32) -> jax.Array:
    """Dequantized ``x @ w``: int8 MXU GEMM, per-channel de-scale in the kernel
    epilogue, per-token scale folded outside (XLA fuses it into the epilogue)."""
    w_q, sw = wq_s
    y = quant_matmul(x_q, w_q, sw, out_dtype=jnp.float32)
    return (y * sx[:, None]).astype(out_dtype)


def project(x: jax.Array, wq_s, out_dtype=jnp.float32) -> jax.Array:
    """Per-token quantize ``x`` then W8A8-project it (one fresh quant)."""
    x_q, sx = quant_per_token(x)
    return qmm(x_q, sx, wq_s, out_dtype)


def mlp_swiglu(x: jax.Array, w_gate_up_q, w_down_q, out_dtype) -> jax.Array:
    """W8A8 SwiGLU MLP: GEMM(gate|up halves) → fused SwiGLU+requant → GEMM
    (down) — the reference's GMM1 → swiglu_quant → GMM2 chain, dense."""
    from sgl_kernel_npu_tpu.ops.activation import swiglu_quant

    gu = project(x, w_gate_up_q)
    a_q, sa = swiglu_quant(gu.astype(jnp.bfloat16))
    return qmm(a_q, sa, w_down_q, out_dtype)


def calibrate_kv_scales(caches) -> list:
    """Per-kv-head int8 cache scales from a FLOAT-run paged cache.

    Run a representative prefill with the full-precision cache, then read the
    per-head maxima straight off the written pages (unwritten pages are zeros
    and cannot raise a max).  Returns ``[(k_scale [Hkv], v_scale [Hkv])]`` per
    layer, for the models' ``kv_scales=`` argument — tighter than the single
    static ``cfg.kv_scale`` when head magnitudes differ (they usually do).

    ``caches``: list of ``(k_cache, v_cache)`` with layout ``[P, Hkv, pg, d]``
    (the Llama / unpacked GPT-OSS layout).
    """
    out = []
    for k, v in caches:
        ks = jnp.maximum(jnp.abs(k.astype(jnp.float32)).max(axis=(0, 2, 3)),
                         1e-6) / 127.0
        vs = jnp.maximum(jnp.abs(v.astype(jnp.float32)).max(axis=(0, 2, 3)),
                         1e-6) / 127.0
        out.append((ks, vs))
    return out
