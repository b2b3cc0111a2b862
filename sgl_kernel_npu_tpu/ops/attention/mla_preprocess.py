"""Fused MLA prologue (DeepSeek-V3): the reference ``mla_preprocess`` op.

Reference: csrc/mla_preprocess (host mla_preprocess.cpp:368-707, kernels
mla_preprocess_mix_bf16.hpp) — RMSNorm+quant(hidden) → W8A8 GEMM ``wdqkv``
(hidden→2112) → split (ckv 512 ‖ k_pe 64 ‖ cq 1536) → RMSNorm+quant → W8A8 GEMM
``wuq`` (1536→heads·192) → split (q_nope 128 ‖ q_pe 64) → RoPE(q_pe, k_pe) →
per-head einsum ``wuk`` (128→512) → optional per-head quant → reshape-and-cache
into the paged latent cache via ``slot_mapping``.

Golden semantics: tests/python/sgl_kernel_npu/test_mla_preprocess.py:404-483
(``golden2_pytorch``): note the latent comes FIRST in the wdqkv output
(``split([K_NOPE+K_PE, Q_RMS])``), beta is added after the q RMSNorm, and biases are
added to the int32 GEMM accumulator before dequant.

TPU design: the two fat GEMMs run as Pallas W8A8 kernels (ops/matmul.quant_matmul);
the glue (splits, norms, rope, per-head einsum, cache write) is jnp that XLA fuses
around them.  The reference needed one monolithic kernel because every torch-eager
op on NPU paid dispatch overhead; under jit the composite IS one fused program, so
we spend kernel complexity only where the MXU needs it.

Cache modes (reference mla_preprocess.cpp:610-612):
    "krope_ctkv" — bf16 split caches (ctkv 512 / krope 64)  [default]
    "int8_nzcache" — int8 ctkv cache + per-head-quantized q_nope (NZ layout is an
        Ascend packing detail; the TPU layout is already tiled)
    "nzcache" — alias of krope_ctkv on TPU (layout-only difference).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.matmul import quant_matmul, quant_matmul_ref, quant_per_tensor
from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import (
    reshape_and_cache,
    reshape_and_cache_transposed,
)
from sgl_kernel_npu_tpu.ops.norm import rms_norm_ref
from sgl_kernel_npu_tpu.ops.rope import apply_rope

K_NOPE = 512
K_PE = 64
Q_NOPE_DIM = 128
Q_PE_DIM = 64
Q_DIM = Q_NOPE_DIM + Q_PE_DIM  # 192


class MlaPreprocessWeights(NamedTuple):
    """Static weights for the fused prologue (all per reference mla_preprocess)."""

    gamma1: jax.Array        # [hidden] RMSNorm before wdqkv
    beta1: jax.Array         # [hidden]
    qscale1: jax.Array       # [] per-tensor input quant scale
    qoffset1: jax.Array      # []
    wdqkv: jax.Array         # [2112, hidden] int8 (rows = out channels)
    descale1: jax.Array      # [2112] f32
    bias1: jax.Array         # [2112] int32
    gamma2: jax.Array        # [1536] RMSNorm on cq
    beta2: jax.Array         # [1536] added after norm (golden2:428)
    qscale2: jax.Array       # []
    qoffset2: jax.Array      # []
    wuq: jax.Array           # [heads*192, 1536] int8
    descale2: jax.Array      # [heads*192]
    bias2: jax.Array         # [heads*192] int32
    gamma3: jax.Array        # [512] RMSNorm on ckv
    wuk: jax.Array           # [heads, 128, 512] (bf16/f32)
    qnope_scale: jax.Array | None = None  # [heads] (int8 cache mode)
    ctkv_scale: jax.Array | None = None   # [] (int8 cache mode)


def pad_weights_lane_aligned(w: MlaPreprocessWeights) -> MlaPreprocessWeights:
    """Pre-pad ``wdqkv``'s output dim (2112) to a 128-lane multiple at LOAD time.

    quant_matmul otherwise pads the weight with a per-call ``jnp.pad`` — a
    15 MB materialization XLA cannot hoist across the jit parameter boundary
    (trace-measured 21 µs per decode step).  Call once when weights are built;
    mla_preprocess ignores the pad columns (split dims come from the other
    weight shapes).
    """
    n0 = w.wdqkv.shape[0]
    pad = (-n0) % 128
    if pad == 0:
        return w
    return w._replace(
        wdqkv=jnp.pad(w.wdqkv, ((0, pad), (0, 0))),
        descale1=jnp.pad(w.descale1, (0, pad)),
        bias1=jnp.pad(w.bias1, (0, pad)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("cache_mode", "use_pallas", "first_norm"),
    donate_argnums=(3, 4),
)
def mla_preprocess(
    hidden: jax.Array,
    w: MlaPreprocessWeights,
    cos_sin: tuple[jax.Array, jax.Array],
    kv_cache_nope: jax.Array,
    kv_cache_rope: jax.Array,
    slot_mapping: jax.Array,
    *,
    cache_mode: str = "krope_ctkv",
    use_pallas: bool = True,
    first_norm: bool = True,
):
    """Fused MLA prologue.

    Args:
        hidden: ``[N, hidden]`` bf16 activations.
        cos_sin: rope tables ``([N, 64], [N, 64])`` for the current positions.
        kv_cache_nope: ``[pages, 1, page, 512]`` latent cache (int8 in int8 mode).
        kv_cache_rope: ``[pages, 1, 64, page]`` (transposed rope layout).
        slot_mapping: ``[N]`` cache slots.

    Returns:
        ``(q_nope_out [N, heads, 512], q_pe [N, heads, 64],
        kv_cache_nope', kv_cache_rope')`` — exactly the reference's four outputs
        (q_out0 / q_out1 / kv_cache_out0 / kv_cache_out1).
    """
    n, _ = hidden.shape
    heads = w.wuk.shape[0]
    dtype = hidden.dtype
    gemm = quant_matmul if use_pallas else quant_matmul_ref
    cos, sin = cos_sin

    # MM1: RMSNorm → static quant → W8A8 → dequant.  (The reference golden,
    # golden2_pytorch:414, quantizes `hidden` directly — its first norm is folded
    # into the caller for that quant mode; first_norm=False reproduces that.)
    if first_norm:
        x1 = rms_norm_ref(hidden, w.gamma1, 1e-6) + w.beta1.astype(dtype)
    else:
        x1 = hidden
    x1q = quant_per_tensor(x1, w.qscale1, w.qoffset1)
    fused = gemm(x1q, w.wdqkv, w.descale1, w.bias1, out_dtype=jnp.float32)  # [N, 2112]

    # dims from the weights (full scale: 512 / 64 / 1536 — the module
    # constants; the model wiring passes its own scaled-down shapes).  wdqkv
    # may carry lane padding beyond k_nope+k_pe+q_rms (pad_weights_lane_aligned
    # hoists quant_matmul's per-call jnp.pad to load time); rope width comes
    # from cos_sin, so the pad columns are simply never read.
    k_nope_d = w.gamma3.shape[0]
    q_rms_d = w.gamma2.shape[0]
    k_pe_d = cos.shape[-1]
    assert fused.shape[1] >= k_nope_d + k_pe_d + q_rms_d
    ckv = fused[:, :k_nope_d]
    k_pe = fused[:, k_nope_d : k_nope_d + k_pe_d][:, None, :]   # [N, 1, 64]
    cq = fused[:, k_nope_d + k_pe_d : k_nope_d + k_pe_d + q_rms_d]  # [N, 1536]

    # q path: RMSNorm(+beta) → quant → W8A8 wuq → per-head split
    q = rms_norm_ref(cq.astype(dtype), w.gamma2, 1e-6) + w.beta2.astype(jnp.float32)
    qq = quant_per_tensor(q, w.qscale2, w.qoffset2)
    q_out = gemm(qq, w.wuq, w.descale2, w.bias2, out_dtype=jnp.float32)
    q_dim = w.wuq.shape[0] // heads
    q_nope_d = w.wuk.shape[1]
    q_out = q_out.reshape(n, heads, q_dim)
    q_nope, q_pe = q_out[..., :q_nope_d], q_out[..., q_nope_d:]

    # RoPE on q_pe / k_pe (rotate-half, golden apply_rope_half)
    q_pe = apply_rope(q_pe.astype(dtype), cos, sin)
    k_pe = apply_rope(k_pe.astype(dtype), cos, sin)

    # per-head up-projection: q_nope [N,H,128] × wuk [H,128,512] → [N,H,512]
    q_nope_out = jnp.einsum(
        "nhk,hkd->nhd", q_nope, w.wuk.astype(jnp.float32), preferred_element_type=jnp.float32
    )

    # kv path: RMSNorm(ckv) then cache write
    k_nope = rms_norm_ref(ckv.astype(dtype), w.gamma3, 1e-6)[:, None, :]  # [N,1,512]

    if cache_mode == "int8_nzcache":
        q_nope_out = jnp.clip(
            jnp.round(q_nope_out * w.qnope_scale.astype(jnp.float32)[None, :, None]),
            -128, 127,
        ).astype(jnp.int8)
        k_nope = jnp.clip(
            jnp.round(k_nope / w.ctkv_scale.astype(jnp.float32)), -128, 127
        ).astype(jnp.int8)
    else:
        q_nope_out = q_nope_out.astype(dtype)
        k_nope = k_nope.astype(dtype)

    kv_cache_nope = reshape_and_cache(k_nope, kv_cache_nope, slot_mapping)
    kv_cache_rope = reshape_and_cache_transposed(
        k_pe.astype(kv_cache_rope.dtype), kv_cache_rope, slot_mapping
    )
    return q_nope_out, q_pe, kv_cache_nope, kv_cache_rope
