"""GPT-OSS-style decode layer stack (third model family, beyond reference).

Composes the ops the reference ships for GPT-OSS-class models — attention sinks
with alternating sliding-window/full layers (reference
attention/sinks_attention.py) and the clamped SwiGLU variant (reference
activation/swiglu_oai.py:98) — into a runnable paged decode model, the way
models/deepseek_v3.py does for MLA+MoE.

Shapes stay static and host-sync-free: paged KV via ``reshape_and_cache``,
decode attention via the Pallas sinks kernel.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.activation import swiglu_oai
from sgl_kernel_npu_tpu.ops.attention.sinks_attention import (
    attention_sinks,
    attention_sinks_packed,
    attention_sinks_prefill,
    attention_sinks_prefill_packed,
    attention_sinks_prefill_pallas,
)
from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import reshape_and_cache
from sgl_kernel_npu_tpu.ops.norm import rms_norm
from sgl_kernel_npu_tpu.ops.rope import apply_rope, rope_cos_sin


@dataclasses.dataclass(frozen=True)
class GptOssConfig:
    vocab_size: int = 128
    hidden: int = 256
    num_layers: int = 2
    num_heads: int = 8
    num_kv_heads: int = 2
    head_dim: int = 32
    intermediate: int = 512        # per gate/up half
    sliding_window: int = 128      # even layers use the window, odd layers full
    page_size: int = 16
    rope_theta: float = 10000.0
    alpha: float = 1.702
    limit: float = 7.0
    rms_eps: float = 1e-6          # HF GPT-OSS checkpoints use 1e-5
    # the real GPT-OSS MLP is MoE (HF GptOssExperts: interleaved gate|up with
    # biases, clamped activation, softmax top-k router WITH bias): num_experts
    # > 0 switches to it; 0 keeps the dense clamped-SwiGLU MLP
    num_experts: int = 0
    topk: int = 4
    attention_bias: bool = False   # q/k/v/o biases (GPT-OSS checkpoints: True)
    packed_kv: bool = False        # two heads per 128-lane KV row (d<128: ~1.5x
                                   # decode bandwidth; needs even num_kv_heads)
    # "int8" stores K/V pages as round(x / kv_scale) int8 — half the decode KV
    # HBM traffic (quarter combined with packed_kv at d=64).  kv_scale is a
    # static calibration constant (~|k|max/127 of representative activations).
    kv_cache_dtype: str = "bf16"
    kv_scale: float = 1.0 / 64


def init_weights(key, cfg: GptOssConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, cfg.num_layers * 8 + 1)
    it = iter(ks)

    def rnd(*shape, scale=0.02):
        return (jax.random.normal(next(it), shape) * scale).astype(dtype)

    layers = []
    h, d = cfg.hidden, cfg.head_dim
    for _ in range(cfg.num_layers):
        lw = {
            "ln1": jnp.ones((h,), dtype),
            "wq": rnd(h, cfg.num_heads * d),
            "wk": rnd(h, cfg.num_kv_heads * d),
            "wv": rnd(h, cfg.num_kv_heads * d),
            "wo": rnd(cfg.num_heads * d, h),
            "sinks": rnd(cfg.num_heads, scale=1.0),
            "ln2": jnp.ones((h,), dtype),
        }
        if cfg.num_experts > 0:
            lw.update({
                "router_w": rnd(h, cfg.num_experts),
                "router_b": jnp.zeros((cfg.num_experts,), dtype),
                "w_gate_up": rnd(cfg.num_experts, h, 2 * cfg.intermediate),
                "b_gate_up": jnp.zeros((cfg.num_experts, 2 * cfg.intermediate), dtype),
                "w_down": rnd(cfg.num_experts, cfg.intermediate, h),
                "b_down": jnp.zeros((cfg.num_experts, h), dtype),
            })
        else:
            lw.update({
                "w_gate_up": rnd(h, 2 * cfg.intermediate),   # interleaved gate/up
                "w_down": rnd(cfg.intermediate, h),
            })
        if cfg.attention_bias:
            lw.update({
                "bq": jnp.zeros((cfg.num_heads * d,), dtype),
                "bk": jnp.zeros((cfg.num_kv_heads * d,), dtype),
                "bv": jnp.zeros((cfg.num_kv_heads * d,), dtype),
                "bo": jnp.zeros((h,), dtype),
            })
        layers.append(lw)
    return {
        "layers": layers,
        "ln_f": jnp.ones((h,), dtype),
        "wte": (jax.random.normal(next(it), (cfg.vocab_size, h)) * 0.02).astype(dtype),
    }


def embed(params: dict, ids: jax.Array) -> jax.Array:
    return params["wte"][ids]


def lm_head(params: dict, x: jax.Array) -> jax.Array:
    """Final norm + lm head (tied unless the checkpoint carries ``w_lm``)."""
    w = params["w_lm"] if "w_lm" in params else params["wte"].T
    return rms_norm(x, params["ln_f"], params.get("rms_eps", 1e-6)) @ w


def _rope_tables(cfg: GptOssConfig, params: dict, positions: jax.Array):
    """cos/sin for the current positions.  Checkpoints with scaled rope (the
    real GPT-OSS ships YaRN) carry ``rope_inv_freq`` [d/2] +
    ``rope_attention_scaling`` in params (utils/hf_loader reads them off the
    HF rotary module); otherwise the standard neox tables."""
    if "rope_inv_freq" in params:
        freqs = positions.astype(jnp.float32)[:, None] * params["rope_inv_freq"][None]
        emb = jnp.concatenate([freqs, freqs], axis=-1)
        f = params["rope_attention_scaling"]
        return jnp.cos(emb) * f, jnp.sin(emb) * f
    return rope_cos_sin(positions, cfg.head_dim, base=cfg.rope_theta)


def init_kv_cache(cfg: GptOssConfig, num_pages: int, dtype=jnp.float32):
    if cfg.packed_kv:
        assert cfg.num_kv_heads % 2 == 0
        shape = (num_pages, cfg.num_kv_heads // 2, cfg.page_size, 2 * cfg.head_dim)
    else:
        shape = (num_pages, cfg.num_kv_heads, cfg.page_size, cfg.head_dim)
    if cfg.kv_cache_dtype == "int8":
        dtype = jnp.int8
    return [
        (jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
        for _ in range(cfg.num_layers)
    ]


def _kv_scale(cfg: GptOssConfig, scale=None):
    """Dequant scale for int8 K/V caches (scalar default or calibrated
    per-ORIGINAL-kv-head array), or None on the full-precision path."""
    if cfg.kv_cache_dtype != "int8":
        return None
    return cfg.kv_scale if scale is None else scale


def _write_kv(cfg: GptOssConfig, kv, cache, slot_mapping, scale=None):
    """Write K or V rows (already in cache layout) into the paged cache,
    quantizing on the int8 path.  ``scale``: optional per-ORIGINAL-kv-head
    [Hkv] array; in the packed layout each pair's scales expand across the
    two d-wide halves of the shared 128-lane row (pack_kv_sinks order)."""
    if cache.dtype == jnp.int8:
        if scale is None:
            s = cfg.kv_scale
        elif cfg.packed_kv:
            h2, d2 = kv.shape[1], kv.shape[2]
            s = jnp.broadcast_to(
                scale.reshape(h2, 2, 1), (h2, 2, d2 // 2)).reshape(1, h2, d2)
        else:
            s = scale[None, :, None]
        kv = jnp.clip(jnp.round(kv.astype(jnp.float32) / s), -128, 127)
    return reshape_and_cache(kv.astype(cache.dtype), cache, slot_mapping)


def _cache_rows(cfg: GptOssConfig, kv: jax.Array) -> jax.Array:
    """Per-token KV rows in the cache layout: packed pairs heads into lanes
    ([N, hkv, d] → [N, hkv/2, 2d] — the pack_kv_sinks order)."""
    if cfg.packed_kv:
        n = kv.shape[0]
        return kv.reshape(n, cfg.num_kv_heads // 2, 2 * cfg.head_dim)
    return kv


def quantize_weights(cfg: GptOssConfig, params: dict) -> dict:
    """Per-out-channel int8 quant of every projection (W8A8 serving mode;
    see models/w8a8.py).  ``w_gate_up`` stays interleaved — swiglu_oai
    de-interleaves after the dequantized GEMM.  In MoE mode only the
    attention projections quantize (expert weights stay float here; EP
    serving quantizes experts via parallel.fused_moe.quantize_expert_weights)."""
    from sgl_kernel_npu_tpu.models.w8a8 import quantize_matrix

    names = (("wq", "wk", "wv", "wo") if cfg.num_experts > 0 else
             ("wq", "wk", "wv", "wo", "w_gate_up", "w_down"))
    return {
        "layers": [
            {name: quantize_matrix(lw[name]) for name in names}
            for lw in params["layers"]
        ]
    }


def _proj_qkv(lw, lq, hidden_n, s, cfg):
    """q/k/v projections — W8A8 (one shared per-token quant) when ``lq``."""
    d = cfg.head_dim
    if lq is not None:
        from sgl_kernel_npu_tpu.models.w8a8 import qmm
        from sgl_kernel_npu_tpu.ops.quant import quant_per_token

        x_q, sx = quant_per_token(hidden_n)
        qp, kp, vp = (qmm(x_q, sx, lq[nm], hidden_n.dtype)
                      for nm in ("wq", "wk", "wv"))
    else:
        qp, kp, vp = (hidden_n @ lw[nm] for nm in ("wq", "wk", "wv"))
    if cfg.attention_bias:
        qp, kp, vp = qp + lw["bq"], kp + lw["bk"], vp + lw["bv"]
    return (qp.reshape(s, cfg.num_heads, d),
            kp.reshape(s, cfg.num_kv_heads, d),
            vp.reshape(s, cfg.num_kv_heads, d))


def _moe_mlp(cfg: GptOssConfig, lw, x, ep_buffer=None):
    """GPT-OSS MoE MLP (HF GptOssExperts semantics): softmax top-k over biased
    router logits; experts run biased gate|up (interleaved) → clamped SwiGLU →
    biased down.  ``ep_buffer`` serves expert-parallel through
    ``Buffer.fused_oai_moe`` (bf16 ragged dispatch → biased grouped GEMMs →
    combine, expert-sharded); otherwise the dense-einsum small-model path
    (cf. deepseek_v3._dense_moe)."""
    logits = x @ lw["router_w"] + lw["router_b"]
    topw, topi = jax.lax.top_k(logits, cfg.topk)
    topw = jax.nn.softmax(topw, axis=-1)
    if ep_buffer is not None:
        out, _, _ = ep_buffer.fused_oai_moe(
            x.astype(jnp.bfloat16), topi.astype(jnp.int32),
            topw.astype(jnp.float32), lw["w_gate_up"], lw["b_gate_up"],
            lw["w_down"], lw["b_down"], alpha=cfg.alpha, limit=cfg.limit)
        return out.astype(x.dtype)
    gu = jnp.einsum("nh,ehi->nei", x, lw["w_gate_up"]) + lw["b_gate_up"][None]
    n, e = x.shape[0], cfg.num_experts
    act = swiglu_oai(gu.reshape(n * e, -1), cfg.alpha, cfg.limit).reshape(
        n, e, cfg.intermediate)
    y = jnp.einsum("nei,eih->neh", act, lw["w_down"]) + lw["b_down"][None]
    onehot = jax.nn.one_hot(topi, e, dtype=x.dtype)                 # [N, K, E]
    w = (topw[..., None].astype(x.dtype) * onehot).sum(axis=1)      # [N, E]
    return jnp.einsum("ne,neh->nh", w, y)


def _out_mlp(lw, lq, cfg, x, attn, ep_buffer=None):
    """Output projection + MLP (dense clamped-SwiGLU or MoE; ``ep_buffer``
    serves the MoE expert-parallel) — W8A8 when ``lq`` (attention projections
    only in MoE mode; experts stay float)."""
    if lq is not None:
        from sgl_kernel_npu_tpu.models.w8a8 import project

        op = project(attn, lq["wo"], x.dtype)
    else:
        op = attn @ lw["wo"]
    if cfg.attention_bias:
        op = op + lw["bo"]
    x = x + op
    mlp_in = rms_norm(x, lw["ln2"], cfg.rms_eps)
    if cfg.num_experts > 0:
        return x + _moe_mlp(cfg, lw, mlp_in, ep_buffer)
    if lq is not None:
        act = swiglu_oai(project(mlp_in, lq["w_gate_up"], jnp.bfloat16),
                         cfg.alpha, cfg.limit)
        return x + project(act, lq["w_down"], x.dtype)
    act = swiglu_oai(mlp_in @ lw["w_gate_up"], cfg.alpha, cfg.limit)
    return x + act @ lw["w_down"]


def decode_step(
    cfg: GptOssConfig,
    params: dict,
    x: jax.Array,            # [B, hidden]
    positions: jax.Array,    # [B] absolute positions of the new tokens
    caches: list,            # per layer (k_cache, v_cache)
    block_tables: jax.Array, # [B, max_pages]
    context_lens: jax.Array, # [B] lengths INCLUDING the new token
    slot_mapping: jax.Array, # [B] global cache slots for the new token
    *,
    weights_q: dict | None = None,      # quantize_weights(...) → W8A8 mode
    kv_scales: list | None = None,      # per-layer (k_scale[Hkv], v_scale[Hkv])
    ep_buffer=None,                     # parallel.Buffer → EP MoE serving
):
    """One decode step over the full layer stack; returns (hidden, new_caches)."""
    b = x.shape[0]
    d = cfg.head_dim
    cos, sin = _rope_tables(cfg, params, positions)
    new_caches = []
    scale = 1.0 / math.sqrt(d)
    for li, lw in enumerate(params["layers"]):
        lq = weights_q["layers"][li] if weights_q is not None else None
        k_cache, v_cache = caches[li]
        hidden_n = rms_norm(x, lw["ln1"], cfg.rms_eps)
        q, k, v = _proj_qkv(lw, lq, hidden_n, b, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        lks, lvs = kv_scales[li] if kv_scales is not None else (None, None)
        k_cache = _write_kv(cfg, _cache_rows(cfg, k), k_cache, slot_mapping, lks)
        v_cache = _write_kv(cfg, _cache_rows(cfg, v), v_cache, slot_mapping, lvs)
        window = cfg.sliding_window if li % 2 == 0 else 0  # GPT-OSS alternation
        attend_d = attention_sinks_packed if cfg.packed_kv else attention_sinks
        attn = attend_d(
            q.reshape(b, cfg.num_heads * d), k_cache, v_cache, lw["sinks"],
            block_tables, context_lens, scale, window,
            cfg.num_heads, cfg.num_kv_heads,
            k_scale=_kv_scale(cfg, lks), v_scale=_kv_scale(cfg, lvs),
        )
        x = _out_mlp(lw, lq, cfg, x, attn.reshape(b, -1), ep_buffer)
        new_caches.append((k_cache, v_cache))
    return x, new_caches


def prefill_step(
    cfg: GptOssConfig,
    params: dict,
    x: jax.Array,            # [S, hidden] packed varlen tokens
    seq_lens: jax.Array,     # [B] new-token counts per request
    caches: list,            # per layer (k_cache, v_cache)
    block_tables: jax.Array, # [B, max_pages]
    context_lens: jax.Array, # [B] total lengths INCLUDING the new tokens
    slot_mapping: jax.Array, # [S] global cache slots for the new tokens
    *,
    max_q: int | None = None,
    use_pallas: bool = True,
    weights_q: dict | None = None,      # quantize_weights(...) → W8A8 mode
    kv_scales: list | None = None,      # per-layer (k_scale[Hkv], v_scale[Hkv])
    ep_buffer=None,                     # parallel.Buffer → EP MoE serving
):
    """Varlen (chunked) prefill over the layer stack: rows are the concatenation
    of each request's last ``seq_lens[b]`` tokens.  KV is written to the paged
    cache first, then attention reads it back — so prefill and decode share one
    cache layout and the Pallas kernels (`attention_sinks_prefill_pallas`)."""
    s = x.shape[0]
    d = cfg.head_dim
    bsz = seq_lens.shape[0]
    ends = jnp.cumsum(seq_lens.astype(jnp.int32))
    req = jnp.clip(jnp.searchsorted(ends, jnp.arange(s), side="right"), 0, bsz - 1)
    j = jnp.arange(s) - (ends[req] - seq_lens[req])
    positions = context_lens[req] - seq_lens[req] + j
    cos, sin = _rope_tables(cfg, params, positions)
    if cfg.packed_kv:
        assert use_pallas, "packed_kv prefill runs the Pallas kernel"
        attend = attention_sinks_prefill_packed
    else:
        attend = attention_sinks_prefill_pallas if use_pallas else attention_sinks_prefill
    kw = {"max_q": max_q} if use_pallas else {}
    new_caches = []
    scale = 1.0 / math.sqrt(d)
    for li, lw in enumerate(params["layers"]):
        lq = weights_q["layers"][li] if weights_q is not None else None
        k_cache, v_cache = caches[li]
        hidden_n = rms_norm(x, lw["ln1"], cfg.rms_eps)
        q, k, v = _proj_qkv(lw, lq, hidden_n, s, cfg)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        lks, lvs = kv_scales[li] if kv_scales is not None else (None, None)
        k_cache = _write_kv(cfg, _cache_rows(cfg, k), k_cache, slot_mapping, lks)
        v_cache = _write_kv(cfg, _cache_rows(cfg, v), v_cache, slot_mapping, lvs)
        window = cfg.sliding_window if li % 2 == 0 else 0
        attn = attend(
            q.reshape(s, cfg.num_heads * d), k_cache, v_cache, lw["sinks"],
            seq_lens, block_tables, context_lens, scale, window,
            cfg.num_heads, cfg.num_kv_heads,
            k_scale=_kv_scale(cfg, lks), v_scale=_kv_scale(cfg, lvs), **kw,
        )
        x = _out_mlp(lw, lq, cfg, x, attn.reshape(s, -1), ep_buffer)
        new_caches.append((k_cache, v_cache))
    return x, new_caches


def decode_step_ref(cfg, params, x, positions, caches, block_tables, context_lens,
                    slot_mapping):
    """Golden: same math with the jnp reference attention (sinks_attention_ref)."""
    from sgl_kernel_npu_tpu.ops.activation import swiglu_oai_ref
    from sgl_kernel_npu_tpu.ops.attention.sinks_attention import attention_sinks_ref

    b = x.shape[0]
    d = cfg.head_dim
    cos, sin = _rope_tables(cfg, params, positions)
    new_caches = []
    scale = 1.0 / math.sqrt(d)
    for li, lw in enumerate(params["layers"]):
        k_cache, v_cache = caches[li]
        hidden_n = rms_norm(x, lw["ln1"], cfg.rms_eps)
        q = (hidden_n @ lw["wq"]).reshape(b, cfg.num_heads, d)
        k = (hidden_n @ lw["wk"]).reshape(b, cfg.num_kv_heads, d)
        v = (hidden_n @ lw["wv"]).reshape(b, cfg.num_kv_heads, d)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        k_cache = reshape_and_cache(k, k_cache, slot_mapping)
        v_cache = reshape_and_cache(v, v_cache, slot_mapping)
        window = cfg.sliding_window if li % 2 == 0 else 0
        attn = attention_sinks_ref(
            q.reshape(b, cfg.num_heads * d), k_cache, v_cache, lw["sinks"],
            block_tables, context_lens, scale, window,
            cfg.num_heads, cfg.num_kv_heads,
        )
        x = x + attn.reshape(b, -1) @ lw["wo"]
        mlp_in = rms_norm(x, lw["ln2"], cfg.rms_eps)
        act = swiglu_oai_ref(mlp_in @ lw["w_gate_up"], cfg.alpha, cfg.limit)
        x = x + act @ lw["w_down"]
        new_caches.append((k_cache, v_cache))
    return x, new_caches
