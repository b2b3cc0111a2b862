"""Dense GQA (Llama-class) layer stack — fourth model family (beyond reference).

The reference is a kernel library consumed by SGLang for exactly this model
class: paged GQA decode attention (reference attention/decode_attention.py:373),
fused QKV-split+RMSNorm+RoPE (norm/split_qkv_rmsnorm_rope.py:202), SwiGLU MLP.
This module composes those kernels into runnable paged prefill + decode steps,
the way models/gpt_oss.py does for the sinks family.

Prefill uses the general varlen flash kernel
(ops/attention/sinks_attention.attention_sinks_prefill_pallas with ``sinks=None``);
decode uses the Pallas GQA flash-decode kernel.  Both share one paged cache
layout, so chunked prefill and decode interleave freely.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.attention.decode_attention import decode_gqa
from sgl_kernel_npu_tpu.ops.attention.sinks_attention import (
    attention_sinks_prefill,
    attention_sinks_prefill_pallas,
)
from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import reshape_and_cache
from sgl_kernel_npu_tpu.ops.norm import rms_norm
from sgl_kernel_npu_tpu.ops.rope import apply_rope, rope_cos_sin


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128
    hidden: int = 256
    num_layers: int = 2
    num_heads: int = 8
    num_kv_heads: int = 2
    head_dim: int = 32
    intermediate: int = 512
    page_size: int = 16
    rope_theta: float = 10000.0
    rms_eps: float = 1e-6
    # "int8" stores K/V pages as round(x / kv_scale) int8 — half the decode
    # KV HBM traffic.  kv_scale is a static calibration constant (set it from
    # a calibration pass: ~|k|max/127 of representative activations).
    kv_cache_dtype: str = "bf16"
    kv_scale: float = 1.0 / 64


def init_weights(key, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, cfg.num_layers * 8 + 2)
    it = iter(ks)

    def rnd(*shape, scale=0.02):
        return (jax.random.normal(next(it), shape) * scale).astype(dtype)

    h, d = cfg.hidden, cfg.head_dim
    layers = []
    for _ in range(cfg.num_layers):
        layers.append({
            "ln1": jnp.ones((h,), dtype),
            "wq": rnd(h, cfg.num_heads * d),
            "wk": rnd(h, cfg.num_kv_heads * d),
            "wv": rnd(h, cfg.num_kv_heads * d),
            "wo": rnd(cfg.num_heads * d, h),
            "ln2": jnp.ones((h,), dtype),
            "w_gate": rnd(h, cfg.intermediate),
            "w_up": rnd(h, cfg.intermediate),
            "w_down": rnd(cfg.intermediate, h),
        })
    return {
        "layers": layers,
        "ln_f": jnp.ones((h,), dtype),
        # tied embedding / lm head
        "wte": (jax.random.normal(next(it), (cfg.vocab_size, h)) * 0.02).astype(dtype),
    }


def embed(params: dict, ids: jax.Array) -> jax.Array:
    """Token ids → hidden states (tied embedding table)."""
    return params["wte"][ids]


def lm_head(params: dict, x: jax.Array) -> jax.Array:
    """Hidden states (already final-normed by the steps) → logits.
    Tied to the embedding unless the checkpoint carries a separate head
    (``w_lm``, utils/hf_loader)."""
    if "w_lm" in params:
        return x @ params["w_lm"]
    return x @ params["wte"].T


def init_kv_cache(cfg: LlamaConfig, num_pages: int, dtype=jnp.float32):
    shape = (num_pages, cfg.num_kv_heads, cfg.page_size, cfg.head_dim)
    if cfg.kv_cache_dtype == "int8":
        dtype = jnp.int8
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.num_layers)
    ]


def _kv_scale(cfg: LlamaConfig, scale=None):
    """Dequant scale for int8 K/V caches (scalar config default or a
    calibrated per-kv-head array), or None on the full-precision path."""
    if cfg.kv_cache_dtype != "int8":
        return None
    return cfg.kv_scale if scale is None else scale


def _write_kv(cfg: LlamaConfig, kv, cache, slot_mapping, scale=None):
    """Write K or V rows into the paged cache, quantizing on the int8 path.
    ``scale``: optional per-kv-head [Hkv] array (w8a8.calibrate_kv_scales)."""
    if cache.dtype == jnp.int8:
        s = cfg.kv_scale if scale is None else scale[None, :, None]
        kv = jnp.clip(jnp.round(kv.astype(jnp.float32) / s), -128, 127)
    return reshape_and_cache(kv.astype(cache.dtype), cache, slot_mapping)


def _mlp(lw, x):
    g = x @ lw["w_gate"]
    return (jax.nn.silu(g) * (x @ lw["w_up"])) @ lw["w_down"]


def quantize_weights(cfg: LlamaConfig, params: dict) -> dict:
    """Per-out-channel int8 quant of every projection (W8A8 serving mode —
    the reference's mla_preprocess/fused-MoE recipe applied to the dense
    stack; see models/w8a8.py).  Gate|up stack into ONE matrix so the MLP
    front half is a single GEMM feeding the fused swiglu_quant kernel."""
    from sgl_kernel_npu_tpu.models.w8a8 import quantize_matrix

    return {
        "layers": [
            {
                "wq": quantize_matrix(lw["wq"]),
                "wk": quantize_matrix(lw["wk"]),
                "wv": quantize_matrix(lw["wv"]),
                "wo": quantize_matrix(lw["wo"]),
                "w_gate_up": quantize_matrix(
                    jnp.concatenate([lw["w_gate"], lw["w_up"]], axis=1)),
                "w_down": quantize_matrix(lw["w_down"]),
            }
            for lw in params["layers"]
        ]
    }


def _mlp_q(lq, x):
    """W8A8 MLP (w8a8.mlp_swiglu over the stacked gate|up matrix)."""
    from sgl_kernel_npu_tpu.models.w8a8 import mlp_swiglu

    return mlp_swiglu(x, lq["w_gate_up"], lq["w_down"], x.dtype)


def _qkv_attn_proj(lq, hidden_n):
    """W8A8 q/k/v projections off ONE per-token quantization of the normed
    hidden state."""
    from sgl_kernel_npu_tpu.models.w8a8 import qmm
    from sgl_kernel_npu_tpu.ops.quant import quant_per_token

    x_q, sx = quant_per_token(hidden_n)
    dt = hidden_n.dtype
    return (qmm(x_q, sx, lq["wq"], dt), qmm(x_q, sx, lq["wk"], dt),
            qmm(x_q, sx, lq["wv"], dt))


def init_lora(key, cfg: LlamaConfig, num_adapters: int, rank: int,
              dtype=jnp.float32) -> dict:
    """Per-layer LoRA on the q and o projections.  Adapter 0 is all-zeros (the
    "no adapter" row); per-adapter scaling is folded into the B matrices."""
    ks = iter(jax.random.split(key, cfg.num_layers * 4))
    h, hq = cfg.hidden, cfg.num_heads * cfg.head_dim

    def rnd(*shape):
        w = jax.random.normal(next(ks), shape) * 0.1
        return w.at[0].set(0.0).astype(dtype)      # adapter 0 = identity

    return {
        "layers": [
            {
                "qA": rnd(num_adapters, rank, h),
                "qB": rnd(num_adapters, hq, rank),
                "oA": rnd(num_adapters, rank, hq),
                "oB": rnd(num_adapters, h, rank),
            }
            for _ in range(cfg.num_layers)
        ]
    }


def _lora_delta(x, a, b, idx):
    # ONE fused Pallas kernel (shrink+expand, adapter weights read once) with
    # the jnp chain as the large-pool fallback — see ops/lora.fused_lora_delta
    from sgl_kernel_npu_tpu.ops.lora import fused_lora_delta

    return fused_lora_delta(x, a, b, idx)


def decode_step(
    cfg: LlamaConfig,
    params: dict,
    x: jax.Array,            # [B, hidden]
    positions: jax.Array,    # [B]
    caches: list,
    block_tables: jax.Array, # [B, max_pages]
    context_lens: jax.Array, # [B] lengths INCLUDING the new token
    slot_mapping: jax.Array, # [B]
    *,
    lora: dict | None = None,
    lora_idx: jax.Array | None = None,  # [B] adapter id per request (0 = none)
    weights_q: dict | None = None,      # quantize_weights(...) → W8A8 mode
    kv_scales: list | None = None,      # per-layer (k_scale[Hkv], v_scale[Hkv])
):
    """One decode step over the stack; returns (hidden, new_caches)."""
    b = x.shape[0]
    d = cfg.head_dim
    cos, sin = rope_cos_sin(positions, d, base=cfg.rope_theta)
    scale = 1.0 / math.sqrt(d)
    new_caches = []
    for li, lw in enumerate(params["layers"]):
        lq = weights_q["layers"][li] if weights_q is not None else None
        k_cache, v_cache = caches[li]
        hidden_n = rms_norm(x, lw["ln1"], cfg.rms_eps)
        if lq is not None:
            qp, kp, vp = _qkv_attn_proj(lq, hidden_n)
        else:
            qp, kp, vp = hidden_n @ lw["wq"], hidden_n @ lw["wk"], hidden_n @ lw["wv"]
        if lora is not None:
            la = lora["layers"][li]
            qp = qp + _lora_delta(hidden_n, la["qA"], la["qB"], lora_idx)
        q = apply_rope(qp.reshape(b, cfg.num_heads, d), cos, sin)
        k = apply_rope(kp.reshape(b, cfg.num_kv_heads, d), cos, sin)
        v = vp.reshape(b, cfg.num_kv_heads, d)
        lks, lvs = kv_scales[li] if kv_scales is not None else (None, None)
        k_cache = _write_kv(cfg, k, k_cache, slot_mapping, lks)
        v_cache = _write_kv(cfg, v, v_cache, slot_mapping, lvs)
        attn = decode_gqa(q, k_cache, v_cache, context_lens, scale, block_tables,
                          k_scale=_kv_scale(cfg, lks), v_scale=_kv_scale(cfg, lvs))
        attn = attn.reshape(b, -1)
        if lq is not None:
            from sgl_kernel_npu_tpu.models.w8a8 import project
            op = project(attn, lq["wo"], x.dtype)
        else:
            op = attn @ lw["wo"]
        if lora is not None:
            op = op + _lora_delta(attn, la["oA"], la["oB"], lora_idx)
        x = x + op
        mlp_in = rms_norm(x, lw["ln2"], cfg.rms_eps)
        x = x + (_mlp_q(lq, mlp_in) if lq is not None else _mlp(lw, mlp_in))
        new_caches.append((k_cache, v_cache))
    return rms_norm(x, params["ln_f"], cfg.rms_eps), new_caches


def prefill_step(
    cfg: LlamaConfig,
    params: dict,
    x: jax.Array,            # [S, hidden] packed varlen tokens
    seq_lens: jax.Array,     # [B] new-token counts
    caches: list,
    block_tables: jax.Array, # [B, max_pages]
    context_lens: jax.Array, # [B] totals INCLUDING the new tokens
    slot_mapping: jax.Array, # [S]
    *,
    max_q: int | None = None,
    use_pallas: bool = True,
    lora: dict | None = None,
    lora_idx: jax.Array | None = None,  # [S] adapter id per TOKEN (0 = none)
    weights_q: dict | None = None,      # quantize_weights(...) → W8A8 mode
    kv_scales: list | None = None,      # per-layer (k_scale[Hkv], v_scale[Hkv])
):
    """Varlen (chunked) prefill; rows are each request's last ``seq_lens[b]``
    tokens.  KV lands in the paged cache first; attention reads it back."""
    s = x.shape[0]
    d = cfg.head_dim
    bsz = seq_lens.shape[0]
    ends = jnp.cumsum(seq_lens.astype(jnp.int32))
    req = jnp.clip(jnp.searchsorted(ends, jnp.arange(s), side="right"), 0, bsz - 1)
    j = jnp.arange(s) - (ends[req] - seq_lens[req])
    positions = context_lens[req] - seq_lens[req] + j
    cos, sin = rope_cos_sin(positions, d, base=cfg.rope_theta)
    attend = attention_sinks_prefill_pallas if use_pallas else attention_sinks_prefill
    kw = {"max_q": max_q} if use_pallas else {}
    scale = 1.0 / math.sqrt(d)
    new_caches = []
    for li, lw in enumerate(params["layers"]):
        lq = weights_q["layers"][li] if weights_q is not None else None
        k_cache, v_cache = caches[li]
        hidden_n = rms_norm(x, lw["ln1"], cfg.rms_eps)
        if lq is not None:
            qp, kp, vp = _qkv_attn_proj(lq, hidden_n)
        else:
            qp, kp, vp = hidden_n @ lw["wq"], hidden_n @ lw["wk"], hidden_n @ lw["wv"]
        if lora is not None:
            la = lora["layers"][li]
            qp = qp + _lora_delta(hidden_n, la["qA"], la["qB"], lora_idx)
        q = apply_rope(qp.reshape(s, cfg.num_heads, d), cos, sin)
        k = apply_rope(kp.reshape(s, cfg.num_kv_heads, d), cos, sin)
        v = vp.reshape(s, cfg.num_kv_heads, d)
        lks, lvs = kv_scales[li] if kv_scales is not None else (None, None)
        k_cache = _write_kv(cfg, k, k_cache, slot_mapping, lks)
        v_cache = _write_kv(cfg, v, v_cache, slot_mapping, lvs)
        attn = attend(
            q.reshape(s, cfg.num_heads * d), k_cache, v_cache, None,
            seq_lens, block_tables, context_lens, scale, 0,
            cfg.num_heads, cfg.num_kv_heads,
            k_scale=_kv_scale(cfg, lks), v_scale=_kv_scale(cfg, lvs), **kw,
        ).reshape(s, -1)
        if lq is not None:
            from sgl_kernel_npu_tpu.models.w8a8 import project
            op = project(attn, lq["wo"], x.dtype)
        else:
            op = attn @ lw["wo"]
        if lora is not None:
            op = op + _lora_delta(attn, la["oA"], la["oB"], lora_idx)
        x = x + op
        mlp_in = rms_norm(x, lw["ln2"], cfg.rms_eps)
        x = x + (_mlp_q(lq, mlp_in) if lq is not None else _mlp(lw, mlp_in))
        new_caches.append((k_cache, v_cache))
    return rms_norm(x, params["ln_f"], cfg.rms_eps), new_caches



def prefill_step_cp(
    cfg: LlamaConfig,
    params: dict,
    x: jax.Array,            # [S, hidden] one request's full prompt (padded)
    seq_lens: jax.Array,     # [1] live token count
    caches: list,
    block_tables: jax.Array, # [1, max_pages]
    context_lens: jax.Array, # [1] == seq_lens (fresh full prefill)
    slot_mapping: jax.Array, # [S] (-1 pads)
    *,
    mesh,
    axis_name: str = "cp",
):
    """Context-parallel (ring-attention) prefill of ONE request's full prompt.

    The sequence-parallel long-context prefill path (SURVEY §2.5 — the
    reference has no CP; this is the TPU-idiomatic extension): dense per-token
    work (norms, projections, MLP, cache writes) runs GSPMD-sharded over the
    ``axis_name`` mesh axis, and attention rotates K/V blocks around the ring
    (parallel.ring_attention) so no rank ever materializes the full [S, S]
    score matrix or the full K/V.

    Restriction: fresh full prefill only (``context_lens == seq_lens`` — no
    chunked continuation; CP is what replaces chunking for long prompts).
    ``S`` must divide by the ring size.  Padding rows sit at positions
    ``>= seq_lens`` so causal masking keeps them out of live outputs, and
    ``slot_mapping=-1`` keeps them out of the cache.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sgl_kernel_npu_tpu.parallel.ring_attention import ring_attention_sharded

    s = x.shape[0]
    d = cfg.head_dim
    row = NamedSharding(mesh, P(axis_name))
    x = jax.lax.with_sharding_constraint(x, row)
    positions = jnp.arange(s, dtype=jnp.int32)
    cos, sin = rope_cos_sin(positions, d, base=cfg.rope_theta)
    scale = 1.0 / math.sqrt(d)
    new_caches = []
    for li, lw in enumerate(params["layers"]):
        k_cache, v_cache = caches[li]
        hidden_n = rms_norm(x, lw["ln1"], cfg.rms_eps)
        q = apply_rope((hidden_n @ lw["wq"]).reshape(s, cfg.num_heads, d), cos, sin)
        k = apply_rope((hidden_n @ lw["wk"]).reshape(s, cfg.num_kv_heads, d), cos, sin)
        v = (hidden_n @ lw["wv"]).reshape(s, cfg.num_kv_heads, d)
        # CP attention runs on the fresh (full-precision) K/V; the cache write
        # quantizes so later decode steps read a consistent int8 cache
        k_cache = _write_kv(cfg, k, k_cache, slot_mapping)
        v_cache = _write_kv(cfg, v, v_cache, slot_mapping)
        attn = ring_attention_sharded(
            q[None], k[None], v[None], mesh=mesh, axis_name=axis_name,
            sm_scale=scale, causal=True)[0].reshape(s, -1)
        x = x + attn @ lw["wo"]
        x = x + _mlp(lw, rms_norm(x, lw["ln2"], cfg.rms_eps))
        new_caches.append((k_cache, v_cache))
    return rms_norm(x, params["ln_f"], cfg.rms_eps), new_caches
