"""DeepSeek-V3-style MLA + MoE model (flagship).

The reference ships no model code — its kernels are specialized for DeepSeek-V3
shapes (hidden 7168 / latent 512+64 / q-lora 1536, SURVEY.md L49).  This module is
the consumer that proves the kernel set composes: an MLA (latent/absorbed) attention
block with paged KV decode, and an expert-parallel MoE block with shared experts.

Two execution paths share one weight pytree:
- ``decode_step``  — inference: Pallas paged MLA decode attention
  (ops/attention/decode_attention.py), INT8 fused MoE (parallel/fused_moe.py);
- ``train_forward`` / ``train_step`` — differentiable: dense causal MLA attention,
  BF16 EP dispatch → ``ragged_dot`` expert GEMM → combine (the *same* routing/
  collective path as inference — all_to_all, sorts and scatters all carry
  gradients), sharded dp×ep via shard_map + GSPMD.

Weights use plain dicts (pytrees) — no framework dependency.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgl_kernel_npu_tpu.config import EPConfig
from sgl_kernel_npu_tpu.ops.attention.decode_attention import decode_mla
from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import (
    reshape_and_cache,
    reshape_and_cache_transposed,
)
from sgl_kernel_npu_tpu.ops.norm import rms_norm_ref
from sgl_kernel_npu_tpu.ops.rope import apply_rope, rope_cos_sin
from sgl_kernel_npu_tpu.parallel import ep_core
from sgl_kernel_npu_tpu.parallel.buffer import Buffer
from sgl_kernel_npu_tpu.parallel.fused_moe import quantize_expert_weights


@dataclasses.dataclass(frozen=True)
class DeepSeekV3Config:
    vocab_size: int = 512
    hidden: int = 256
    num_layers: int = 2
    num_heads: int = 8
    kv_lora_rank: int = 128      # latent dim (512 at full scale)
    qk_rope_dim: int = 64
    qk_nope_dim: int = 64        # 128 at full scale
    q_lora_rank: int = 192       # 1536 at full scale
    v_head_dim: int = 64         # 128 at full scale
    num_experts: int = 16
    num_shared_experts: int = 1
    topk: int = 4
    moe_intermediate: int = 128  # per expert (2048 at full scale)
    rope_base: float = 10000.0
    page_size: int = 16
    # DeepSeek-V3.2 sparse attention (DSA): 0 = dense; >0 = lightning-indexer
    # top-k sparse decode attention over that many selected keys
    sparse_count: int = 0
    idx_heads: int = 4           # 64 at full scale
    idx_dim: int = 64            # 128 at full scale
    # "page": top pages by page-max score through the dense Pallas kernel with
    #   a pruned block table (TPU-shaped — contiguous DMAs, ~roofline reads);
    # "token": exact reference semantics (token top-k gather — slow on TPU,
    #   XLA lowers token gathers to scalar dynamic reads)
    sparse_granularity: str = "page"
    # "int8" stores the latent (nope) cache as round(k / ctkv_scale) int8 —
    # the reference's int8_nzcache mode (mla_preprocess.cpp:610-616) — halving
    # the decode hot loop's KV HBM traffic; the rope cache stays bf16.
    kv_cache_dtype: str = "bf16"
    ctkv_scale: float = 1.0 / 32  # static calibration: rms-normed latent, |k|≲4
    # routing: "softmax" (this framework's default) or "sigmoid_v3" — the real
    # DeepSeek-V3 scheme (HF DeepseekV3TopkRouter): sigmoid scores, per-layer
    # choice-bias, node-limited group top-k, un-softmaxed weights × scaling
    router_scoring: str = "softmax"
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = True

    @property
    def qk_dim(self):
        return self.qk_nope_dim + self.qk_rope_dim

    @property
    def sm_scale(self):
        return 1.0 / (self.qk_dim ** 0.5)


def init_weights(key: jax.Array, cfg: DeepSeekV3Config, dtype=jnp.float32) -> dict:
    """Random-initialized weight pytree."""
    h, lat, rope = cfg.hidden, cfg.kv_lora_rank, cfg.qk_rope_dim
    keys = iter(jax.random.split(key, 64 * cfg.num_layers + 8))

    def rnd(*shape, scale=None):
        s = scale if scale is not None else 1.0 / (shape[0] ** 0.5)
        return (jax.random.normal(next(keys), shape) * s).astype(dtype)

    def layer():
        return {
            "ln1": jnp.ones((h,), dtype),
            "wdqkv": rnd(h, lat + rope + cfg.q_lora_rank),
            "q_ln": jnp.ones((cfg.q_lora_rank,), dtype),
            "wuq": rnd(cfg.q_lora_rank, cfg.num_heads * cfg.qk_dim),
            "wuk": rnd(cfg.num_heads, cfg.qk_nope_dim, lat, scale=cfg.qk_nope_dim**-0.5),
            "kv_ln": jnp.ones((lat,), dtype),
            "wvu": rnd(cfg.num_heads, lat, cfg.v_head_dim, scale=lat**-0.5),
            "wo": rnd(cfg.num_heads * cfg.v_head_dim, h),
            "ln2": jnp.ones((h,), dtype),
            "router": rnd(h, cfg.num_experts),
            "w_gate": rnd(cfg.num_experts, h, cfg.moe_intermediate, scale=h**-0.5),
            "w_up": rnd(cfg.num_experts, h, cfg.moe_intermediate, scale=h**-0.5),
            "w_down": rnd(cfg.num_experts, cfg.moe_intermediate, h, scale=cfg.moe_intermediate**-0.5),
            "ws_gate": rnd(h, cfg.num_shared_experts * cfg.moe_intermediate),
            "ws_up": rnd(h, cfg.num_shared_experts * cfg.moe_intermediate),
            "ws_down": rnd(cfg.num_shared_experts * cfg.moe_intermediate, h),
            # lightning-indexer projections (used when cfg.sparse_count > 0)
            "w_qidx": rnd(h, cfg.idx_heads * cfg.idx_dim),
            "w_kidx": rnd(h, cfg.idx_dim),
            "w_widx": rnd(h, cfg.idx_heads, scale=0.2),
        }

    return {
        "embed": rnd(cfg.vocab_size, h, scale=0.02),
        "layers": [layer() for _ in range(cfg.num_layers)],
        "final_ln": jnp.ones((h,), dtype),
    }


# ---------------------------------------------------------------------------
# shared blocks
# ---------------------------------------------------------------------------

def _mla_qkv(cfg: DeepSeekV3Config, lw: dict, x: jax.Array, cos, sin):
    """Shared MLA projections: hidden → (q_latent+rope queries, latent kv, rope k)."""
    n = x.shape[0]
    lat, rope = cfg.kv_lora_rank, cfg.qk_rope_dim
    h1 = rms_norm_ref(x, lw["ln1"])
    f = h1 @ lw["wdqkv"]                                   # [N, lat+rope+q_lora]
    ckv, kpe, cq = f[:, :lat], f[:, lat : lat + rope], f[:, lat + rope :]
    q = rms_norm_ref(cq, lw["q_ln"]) @ lw["wuq"]
    q = q.reshape(n, cfg.num_heads, cfg.qk_dim)
    qn, qpe = q[..., : cfg.qk_nope_dim], q[..., cfg.qk_nope_dim :]
    # absorbed query: project q_nope into latent space
    q_lat = jnp.einsum("nhk,hkl->nhl", qn, lw["wuk"])       # [N, H, lat]
    qpe = apply_rope(qpe, cos, sin)
    kpe = apply_rope(kpe[:, None, :], cos, sin)[:, 0]       # [N, rope]
    k_lat = rms_norm_ref(ckv, lw["kv_ln"])                  # [N, lat]
    return q_lat, qpe, k_lat, kpe, h1


def make_mla_preprocess_weights(cfg: DeepSeekV3Config, params: dict,
                                sample_hidden: jax.Array) -> list:
    """Convert the float MLA prologue weights of every layer into
    :class:`ops.attention.mla_preprocess.MlaPreprocessWeights` (W8A8) — the
    model then runs the reference's fused mla_preprocess op (reference
    csrc/mla_preprocess/op_host/mla_preprocess.cpp:623) instead of the unfused
    float prologue (``decode_step(mla_wq=...)``).

    ``sample_hidden [N, hidden]`` calibrates the two static activation-quant
    scales and (int8 cache mode) the per-head q_nope scales.  Both quantized
    activations are POST-RMSNORM, whose magnitude is depth-stable, so one
    representative sample serves every layer (each layer's scales still use
    that layer's own weights); production calibration can pass per-layer
    activations through repeated calls instead.
    """
    from sgl_kernel_npu_tpu.ops.attention import mla_preprocess as mp

    lat, rope = cfg.kv_lora_rank, cfg.qk_rope_dim
    margin = 1.25     # headroom over the calibration sample's max
    out = []

    def quantize_rows(w):   # w [K, N] -> int8 [N, K], per-row scale [N]
        wf = w.astype(jnp.float32)
        s = jnp.maximum(jnp.abs(wf).max(axis=0) / 127.0, 1e-12)
        return jnp.clip(jnp.round(wf / s[None]), -128, 127).astype(jnp.int8).T, s

    for lw in params["layers"]:
        h1 = rms_norm_ref(sample_hidden.astype(jnp.float32), lw["ln1"])
        qs1 = jnp.abs(h1).max() / 127.0 * margin
        wd_q, sw1 = quantize_rows(lw["wdqkv"])
        fused = h1 @ lw["wdqkv"].astype(jnp.float32)
        cq = rms_norm_ref(fused[:, lat + rope :], lw["q_ln"])
        qs2 = jnp.abs(cq).max() / 127.0 * margin
        wuq_q, sw2 = quantize_rows(lw["wuq"])
        nout = lw["wdqkv"].shape[1]
        if cfg.kv_cache_dtype == "int8":
            q_nope = (cq @ lw["wuq"].astype(jnp.float32)).reshape(
                cq.shape[0], cfg.num_heads, cfg.qk_dim)[..., : cfg.qk_nope_dim]
            q_lat = jnp.einsum("nhk,hkl->nhl", q_nope,
                               lw["wuk"].astype(jnp.float32))
            qnope_scale = 126.0 / (jnp.abs(q_lat).max(axis=(0, 2)) * margin + 1e-12)
        else:
            qnope_scale = None
        out.append(mp.pad_weights_lane_aligned(mp.MlaPreprocessWeights(
            gamma1=lw["ln1"], beta1=jnp.zeros_like(lw["ln1"]),
            qscale1=qs1.astype(jnp.float32), qoffset1=jnp.float32(0),
            wdqkv=wd_q, descale1=(sw1 * qs1).astype(jnp.float32),
            bias1=jnp.zeros((nout,), jnp.int32),
            gamma2=lw["q_ln"], beta2=jnp.zeros_like(lw["q_ln"]),
            qscale2=qs2.astype(jnp.float32), qoffset2=jnp.float32(0),
            wuq=wuq_q, descale2=(sw2 * qs2).astype(jnp.float32),
            bias2=jnp.zeros((lw["wuq"].shape[1],), jnp.int32),
            gamma3=lw["kv_ln"], wuk=lw["wuk"],
            qnope_scale=qnope_scale,
            ctkv_scale=jnp.float32(cfg.ctkv_scale),
        )))
    return out


def _mla_preprocess_qkv(cfg: DeepSeekV3Config, w, x, cos, sin, cache,
                        slot_mapping):
    """Run the fused W8A8 prologue; returns (q [N,H,lat+rope] float,
    cache_n, cache_r) with int8-mode q_nope dequantized for the attention
    kernels (which re-fold ctkv_scale via ``k_scale``)."""
    from sgl_kernel_npu_tpu.ops.attention import mla_preprocess as mp

    cm = "int8_nzcache" if cfg.kv_cache_dtype == "int8" else "krope_ctkv"
    qn, qpe, cache_n, cache_r = mp.mla_preprocess(
        x, w, (cos, sin), cache["nope"], cache["rope"], slot_mapping,
        cache_mode=cm)
    if cm == "int8_nzcache":
        qn = qn.astype(jnp.float32) / w.qnope_scale[None, :, None]
    q = jnp.concatenate(
        [qn.astype(jnp.float32), qpe.astype(jnp.float32)], axis=-1)
    return q.astype(cache_r.dtype), cache_n, cache_r


def _mla_output(cfg: DeepSeekV3Config, lw: dict, attn_lat: jax.Array, dq=None):
    """Latent attention output → hidden (absorbed V up-proj + output proj).
    ``dq`` = quantize_dense_weights layer → W8A8 output projection (the
    per-head wvu einsum stays float: tiny weights, head-blocked shape)."""
    o = jnp.einsum("nhl,hlv->nhv", attn_lat, lw["wvu"])
    o = o.reshape(o.shape[0], -1)
    if dq is not None:
        from sgl_kernel_npu_tpu.models.w8a8 import project
        return project(o.astype(jnp.bfloat16), dq["wo"], jnp.float32)
    return o @ lw["wo"]


def quantize_dense_weights(cfg: DeepSeekV3Config, params: dict) -> list:
    """W8A8 for the flagship's remaining dense-side GEMMs (models/w8a8.py):
    the attention output projection and the SHARED expert (the largest dense
    GEMM in the layer — gate|up stacked for the fused swiglu_quant chain).
    Router / wvu / norms stay float.  Use with ``decode_step(dense_wq=…)``;
    composes with ``mla_wq`` + ``moe_weights_q`` for a fully-quantized layer."""
    from sgl_kernel_npu_tpu.models.w8a8 import quantize_matrix

    return [
        {
            "wo": quantize_matrix(lw["wo"]),
            "ws_gate_up": quantize_matrix(
                jnp.concatenate([lw["ws_gate"], lw["ws_up"]], axis=1)),
            "ws_down": quantize_matrix(lw["ws_down"]),
        }
        for lw in params["layers"]
    ]


def _shared_expert_q(dq, x):
    from sgl_kernel_npu_tpu.models.w8a8 import mlp_swiglu

    return mlp_swiglu(x.astype(jnp.bfloat16), dq["ws_gate_up"], dq["ws_down"],
                      jnp.float32)


def _router(cfg: DeepSeekV3Config, lw: dict, x: jax.Array):
    """Top-k routing.  ``softmax``: normalized softmax over the selected
    experts.  ``sigmoid_v3``: the real DeepSeek-V3 scheme (HF
    DeepseekV3TopkRouter) — sigmoid scores; choice ranks scores + a per-layer
    correction bias under node-limited routing (keep the ``topk_group`` best
    groups by their top-2 sums); weights are the RAW sigmoid scores of the
    chosen experts (bias excluded), optionally sum-normalized, scaled by
    ``routed_scaling_factor``."""
    logits = (x.astype(jnp.float32) @ lw["router"].astype(jnp.float32))
    if cfg.router_scoring == "softmax":
        topw, topi = jax.lax.top_k(logits, cfg.topk)
        topw = jax.nn.softmax(topw, axis=-1)
        return topi.astype(jnp.int32), topw
    assert cfg.router_scoring == "sigmoid_v3", cfg.router_scoring
    n, e = logits.shape
    scores = jax.nn.sigmoid(logits)
    choice = scores + lw["router_bias"].astype(jnp.float32)[None, :]
    if cfg.n_group > 1:
        g = choice.reshape(n, cfg.n_group, e // cfg.n_group)
        group_scores = jax.lax.top_k(g, 2)[0].sum(axis=-1)        # [N, G]
        _, gi = jax.lax.top_k(group_scores, cfg.topk_group)
        gmask = jnp.zeros((n, cfg.n_group), bool).at[
            jnp.arange(n)[:, None], gi].set(True)
        choice = jnp.where(
            jnp.repeat(gmask, e // cfg.n_group, axis=1), choice, 0.0)
    _, topi = jax.lax.top_k(choice, cfg.topk)
    topw = jnp.take_along_axis(scores, topi, axis=1)
    if cfg.norm_topk_prob:
        topw = topw / (topw.sum(axis=-1, keepdims=True) + 1e-20)
    return topi.astype(jnp.int32), topw * cfg.routed_scaling_factor


def _shared_expert(lw: dict, x: jax.Array):
    g = x @ lw["ws_gate"]
    u = x @ lw["ws_up"]
    return (g * jax.nn.sigmoid(g) * u) @ lw["ws_down"]


# ---------------------------------------------------------------------------
# inference: paged decode step
# ---------------------------------------------------------------------------

def _nope_scale(cfg: DeepSeekV3Config):
    """Dequant scale for the latent cache, or None on the bf16 path."""
    return cfg.ctkv_scale if cfg.kv_cache_dtype == "int8" else None


def _write_nope(cfg: DeepSeekV3Config, k_lat, cache, slot_mapping):
    """Write latents into the paged nope cache, quantizing on the int8 path."""
    if cache.dtype == jnp.int8:
        k_lat = jnp.clip(
            jnp.round(k_lat.astype(jnp.float32) / cfg.ctkv_scale), -128, 127)
    return reshape_and_cache(k_lat[:, None, :].astype(cache.dtype), cache, slot_mapping)


def init_kv_cache(cfg: DeepSeekV3Config, num_pages: int, dtype=jnp.bfloat16):
    def layer_cache():
        nope_dt = jnp.int8 if cfg.kv_cache_dtype == "int8" else dtype
        c = {
            "nope": jnp.zeros((num_pages, 1, cfg.page_size, cfg.kv_lora_rank), nope_dt),
            "rope": jnp.zeros((num_pages, 1, cfg.qk_rope_dim, cfg.page_size), dtype),
        }
        if cfg.sparse_count > 0:
            # index-key cache for the lightning indexer (DSA)
            c["kidx"] = jnp.zeros((num_pages, 1, cfg.page_size, cfg.idx_dim), dtype)
        return c

    return [layer_cache() for _ in range(cfg.num_layers)]


def decode_step(
    cfg: DeepSeekV3Config,
    params: dict,
    hidden: jax.Array,          # [N, H] current-token activations
    positions: jax.Array,       # [N]
    kv_caches: list[dict],
    block_table: jax.Array,     # [N, max_pages]
    seq_lens: jax.Array,        # [N] lengths incl. current token
    slot_mapping: jax.Array,    # [N]
    moe_weights_q: list[tuple] | None = None,   # per-layer quantized expert weights
    ep_buffer: Buffer | None = None,
    use_int8_dispatch: bool = True,
    mla_wq: list | None = None,   # make_mla_preprocess_weights(...) → fused prologue
    eplb_tables: tuple | None = None,   # parallel.eplb.make_remap_tables(...)
    dense_wq: list | None = None,       # quantize_dense_weights(...)
):
    """One decode step over all layers (single chip unless ep_buffer is given).

    ``use_int8_dispatch=False`` moves the EP dispatch wire at BF16 (accuracy
    baseline for the reference's "INT8 dispatch Δppl ≈ 0" bar, BASELINE.md).
    ``mla_wq`` switches the MLA prologue to the fused W8A8 mla_preprocess op.
    ``eplb_tables`` rewrites the router's logical expert ids to EPLB physical
    slots (parallel/eplb.py) — ``moe_weights_q`` / ``ep_buffer`` must then be
    built for the physical expert count."""
    cos, sin = rope_cos_sin(positions, cfg.qk_rope_dim)
    x = hidden
    new_caches = []
    for li, lw in enumerate(params["layers"]):
        cache = kv_caches[li]
        if mla_wq is not None:
            q, cache_n, cache_r = _mla_preprocess_qkv(
                cfg, mla_wq[li], x, cos, sin, cache, slot_mapping)
            h1 = (rms_norm_ref(x, lw["ln1"])
                  if cfg.sparse_count > 0 else None)  # only the DSA taps need it
        else:
            q_lat, qpe, k_lat, kpe, h1 = _mla_qkv(cfg, lw, x, cos, sin)
            cache_n = _write_nope(cfg, k_lat, cache["nope"], slot_mapping)
            cache_r = reshape_and_cache_transposed(
                kpe[:, None, :].astype(cache["rope"].dtype), cache["rope"],
                slot_mapping)
            q = jnp.concatenate([q_lat, qpe], axis=-1).astype(cache_r.dtype)
        nc = {"nope": cache_n, "rope": cache_r}
        nope_scale = _nope_scale(cfg)
        if cfg.sparse_count > 0:
            # DSA: lightning indexer scores every cached key cheaply (idx_dim
            # wide), attention then reads only the top sparse_count latents
            from sgl_kernel_npu_tpu.ops.attention.decode_attention import (
                decode_mla_sparse)
            from sgl_kernel_npu_tpu.ops.attention.lightning_indexer import (
                lightning_indexer)

            n = x.shape[0]
            qidx = (h1 @ lw["w_qidx"]).reshape(n, cfg.idx_heads, cfg.idx_dim)
            widx = h1 @ lw["w_widx"]
            kidx = h1 @ lw["w_kidx"]
            cache_i = reshape_and_cache(
                kidx[:, None, :].astype(cache["kidx"].dtype), cache["kidx"],
                slot_mapping)
            nc["kidx"] = cache_i
            if cfg.sparse_granularity == "page":
                from sgl_kernel_npu_tpu.ops.attention.decode_attention import (
                    decode_mla_block_sparse)
                from sgl_kernel_npu_tpu.ops.attention.lightning_indexer import (
                    lightning_indexer_scores_decode)

                scores = lightning_indexer_scores_decode(
                    qidx.astype(cache_i.dtype), cache_i, widx, seq_lens,
                    block_table)
                attn = decode_mla_block_sparse(
                    q, cache_n, cache_r, seq_lens, cfg.sm_scale, block_table,
                    scores, -(-cfg.sparse_count // cfg.page_size),
                    k_scale=nope_scale)
            else:
                sel = lightning_indexer(
                    qidx[:, None].astype(cache_i.dtype), cache_i,
                    widx[:, None], None, seq_lens, block_table,
                    sparse_count=cfg.sparse_count)
                attn = decode_mla_sparse(
                    q, cache_n, cache_r, seq_lens, cfg.sm_scale, block_table,
                    sel.reshape(n, cfg.sparse_count), k_scale=nope_scale)
        else:
            attn = decode_mla(q, cache_n, cache_r, seq_lens, cfg.sm_scale, block_table,
                              k_scale=nope_scale)
        new_caches.append(nc)
        x = x + _mla_output(cfg, lw, attn.astype(jnp.float32),
                            dense_wq[li] if dense_wq is not None else None)

        h2 = rms_norm_ref(x, lw["ln2"])
        topk_idx, topk_w = _router(cfg, lw, h2)
        if eplb_tables is not None:
            from sgl_kernel_npu_tpu.parallel.eplb import remap_topk
            assert ep_buffer is not None, "EPLB serving rides the EP buffer"
            topk_idx = remap_topk(topk_idx, *eplb_tables)
        if ep_buffer is not None and moe_weights_q is not None:
            w1, s1, w2, s2 = moe_weights_q[li]
            moe_out, _, _ = ep_buffer.fused_deep_moe(
                h2.astype(jnp.bfloat16), topk_idx, topk_w, w1, s1, w2, s2,
                use_int8_dispatch=use_int8_dispatch,
            )
            moe_out = moe_out.astype(x.dtype)
        elif moe_weights_q is not None:
            moe_out = _gmm_moe(cfg, moe_weights_q[li], h2, topk_idx, topk_w)
        else:
            moe_out = _dense_moe(cfg, lw, h2, topk_idx, topk_w)
        x = x + moe_out + (_shared_expert_q(dense_wq[li], h2)
                           if dense_wq is not None else _shared_expert(lw, h2))
    return x, new_caches


def embed(params: dict, ids: jax.Array) -> jax.Array:
    return params["embed"][ids]


def lm_head(params: dict, x: jax.Array) -> jax.Array:
    w = params["w_lm"] if "w_lm" in params else params["embed"].T
    return rms_norm_ref(x, params["final_ln"]) @ w


def prefill_step(
    cfg: DeepSeekV3Config,
    params: dict,
    hidden: jax.Array,          # [S, H] packed varlen token activations
    seq_lens: jax.Array,        # [B] new-token counts per request
    kv_caches: list[dict],
    block_tables: jax.Array,    # [B, max_pages]
    context_lens: jax.Array,    # [B] totals INCLUDING the new tokens
    slot_mapping: jax.Array,    # [S]
    *,
    max_q: int | None = None,
    mla_wq: list | None = None,   # make_mla_preprocess_weights(...) → fused prologue
    moe_weights_q: list[tuple] | None = None,
    ep_buffer: Buffer | None = None,
    use_int8_dispatch: bool = True,
    eplb_tables: tuple | None = None,
    dense_wq: list | None = None,       # quantize_dense_weights(...)
):
    """Varlen (chunked) prefill over all layers — the decode_step twin built on
    :func:`ops.attention.mla_prefill.mla_prefill_pallas`.

    The MoE branch mirrors decode: dense fp32 (default), single-chip W8A8
    grouped (``moe_weights_q``), or expert-parallel through
    ``ep_buffer.fused_deep_moe`` — whose normal-mode ragged dispatch sizes
    its buffers from the token count, so the same entry point serves
    prefill batches (the reference's CamMoeDispatchNormal prefill path)."""
    from sgl_kernel_npu_tpu.ops.attention.mla_prefill import mla_prefill_pallas

    s = hidden.shape[0]
    bsz = seq_lens.shape[0]
    ends = jnp.cumsum(seq_lens.astype(jnp.int32))
    req = jnp.clip(jnp.searchsorted(ends, jnp.arange(s), side="right"), 0, bsz - 1)
    j = jnp.arange(s) - (ends[req] - seq_lens[req])
    positions = context_lens[req] - seq_lens[req] + j
    cos, sin = rope_cos_sin(positions, cfg.qk_rope_dim)
    x = hidden
    new_caches = []
    for li, lw in enumerate(params["layers"]):
        cache = kv_caches[li]
        if mla_wq is not None:
            q, cache_n, cache_r = _mla_preprocess_qkv(
                cfg, mla_wq[li], x, cos, sin, cache, slot_mapping)
            h1 = (rms_norm_ref(x, lw["ln1"])
                  if cfg.sparse_count > 0 else None)
        else:
            q_lat, qpe, k_lat, kpe, h1 = _mla_qkv(cfg, lw, x, cos, sin)
            cache_n = _write_nope(cfg, k_lat, cache["nope"], slot_mapping)
            cache_r = reshape_and_cache_transposed(
                kpe[:, None, :].astype(cache["rope"].dtype), cache["rope"],
                slot_mapping)
            q = jnp.concatenate([q_lat, qpe], axis=-1).astype(cache_r.dtype)
        nc = {"nope": cache_n, "rope": cache_r}
        nope_scale = _nope_scale(cfg)
        if cfg.sparse_count > 0:
            # DSA: cache the index keys (decode scores the prompt through them)
            nc["kidx"] = reshape_and_cache(
                (h1 @ lw["w_kidx"])[:, None, :].astype(cache["kidx"].dtype),
                cache["kidx"], slot_mapping)
        new_caches.append(nc)
        if cfg.sparse_count > 0 and cfg.sparse_granularity == "page":
            # DSA prefill: indexer-pruned page walk — each q-chunk attends only
            # its top pages (+ its own causal diagonal page), O(sel) HBM reads
            # per chunk instead of O(context) (prefill twin of
            # decode_mla_block_sparse; reference ships the indexer prefill
            # kernel for exactly this, lightning_indexer_kernel.cpp:53)
            from sgl_kernel_npu_tpu.ops.attention.lightning_indexer import (
                lightning_indexer_scores_prefill_pallas)
            from sgl_kernel_npu_tpu.ops.attention.mla_prefill import (
                mla_prefill_block_sparse,
                select_prefill_pages,
            )

            mq = max_q or s
            cq = min(64, max(8, mq))
            mq_pad = -(-mq // cq) * cq
            qidx = (h1 @ lw["w_qidx"]).reshape(s, cfg.idx_heads, cfg.idx_dim)
            widx = h1 @ lw["w_widx"]
            zq = jnp.zeros((bsz, mq_pad, cfg.idx_heads, cfg.idx_dim),
                           nc["kidx"].dtype)
            qidx_d = zq.at[req, j].set(qidx.astype(zq.dtype), mode="drop")
            widx_d = (jnp.zeros((bsz, mq_pad, cfg.idx_heads), jnp.float32)
                      .at[req, j].set(widx, mode="drop"))
            scores = lightning_indexer_scores_prefill_pallas(
                qidx_d, widx_d, nc["kidx"], seq_lens, context_lens,
                block_tables, q_chunk=cq)
            page_scores = scores.reshape(
                bsz, mq_pad, block_tables.shape[1], cfg.page_size).max(-1)
            num_sel = min(-(-cfg.sparse_count // cfg.page_size),
                          block_tables.shape[1])
            pos_sel = select_prefill_pages(
                page_scores, seq_lens, context_lens, cq=cq,
                page_size=cfg.page_size, num_sel=num_sel)
            attn = mla_prefill_block_sparse(
                q, cache_n, cache_r, seq_lens, block_tables, context_lens,
                cfg.sm_scale, pos_sel, max_q=mq, q_chunk=cq, k_scale=nope_scale)
        else:
            attn = mla_prefill_pallas(
                q, cache_n, cache_r, seq_lens, block_tables, context_lens,
                cfg.sm_scale, max_q=max_q, k_scale=nope_scale)
        x = x + _mla_output(cfg, lw, attn.astype(jnp.float32),
                            dense_wq[li] if dense_wq is not None else None)

        h2 = rms_norm_ref(x, lw["ln2"])
        topk_idx, topk_w = _router(cfg, lw, h2)
        if eplb_tables is not None:
            from sgl_kernel_npu_tpu.parallel.eplb import remap_topk
            assert ep_buffer is not None, "EPLB serving rides the EP buffer"
            topk_idx = remap_topk(topk_idx, *eplb_tables)
        if ep_buffer is not None and moe_weights_q is not None:
            w1, s1, w2, s2 = moe_weights_q[li]
            moe_out, _, _ = ep_buffer.fused_deep_moe(
                h2.astype(jnp.bfloat16), topk_idx, topk_w, w1, s1, w2, s2,
                use_int8_dispatch=use_int8_dispatch,
            )
            moe_out = moe_out.astype(x.dtype)
        elif moe_weights_q is not None:
            moe_out = _gmm_moe(cfg, moe_weights_q[li], h2, topk_idx, topk_w)
        else:
            moe_out = _dense_moe(cfg, lw, h2, topk_idx, topk_w)
        x = x + moe_out + (_shared_expert_q(dense_wq[li], h2)
                           if dense_wq is not None else _shared_expert(lw, h2))
    return x, new_caches


def _dense_moe(cfg, lw, x, topk_idx, topk_w):
    """Single-chip MoE via one-hot combine (small shapes / EP=1 fallback)."""
    gate = jnp.einsum("nh,ehi->nei", x, lw["w_gate"])
    up = jnp.einsum("nh,ehi->nei", x, lw["w_up"])
    act = gate * jax.nn.sigmoid(gate) * up
    y = jnp.einsum("nei,eih->neh", act, lw["w_down"])     # [N, E, H]
    onehot = jax.nn.one_hot(topk_idx, cfg.num_experts, dtype=x.dtype)  # [N, K, E]
    w = (topk_w[..., None] * onehot).sum(axis=1)          # [N, E]
    return jnp.einsum("ne,neh->nh", w, y)


def _gmm_moe(cfg, wq: tuple, x, topk_idx, topk_w):
    """Single-chip W8A8 grouped MoE (all experts local): per-TOKEN quant →
    expert-sorted int8 gather → fused GMM1 (dequant+SwiGLU+requant) → GMM2 →
    weighted scatter-combine.  Quantizing before the top-k repeat runs the
    quant pass once per token (not per pair) and gathers int8, not f32 —
    measured 1.5x on the full-layer composite (scripts/bench_layer.py)."""
    from sgl_kernel_npu_tpu.ops import grouped_matmul as gmod

    w1, s1, w2, s2 = wq
    n, hidden = x.shape
    k = topk_idx.shape[1]
    rows = n * k
    # per-token quant stays in XLA: it fuses into the upstream projection /
    # residual pass for free (measured r5 — in-kernel quant via
    # gmm_ring.gmm1_ring(x, ..., None, ...) re-reads x at full width and lost
    # ~5 us on the layer composite; the kernel still supports it for callers
    # with no upstream op to fuse into)
    xf = x.astype(jnp.float32)
    sx_tok = jnp.maximum(jnp.abs(xf).max(-1) / 127.0, 1e-12)
    xq_tok = jnp.clip(jnp.round(xf / sx_tok[:, None]), -128, 127).astype(jnp.int8)
    flat_e = topk_idx.reshape(-1)
    # counting sort (E distinct keys): TPU argsort is a ~50-stage bitonic
    # network and dominated the MoE glue (scripts/bench_layer.py ablation)
    oh = (flat_e[:, None] == jnp.arange(cfg.num_experts)[None, :]).astype(jnp.int32)
    gsizes = oh.sum(0)
    offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(gsizes)[:-1]])
    pos_in_e = jnp.take_along_axis(jnp.cumsum(oh, 0) - 1, flat_e[:, None], 1)[:, 0]
    dest = offsets[flat_e] + pos_in_e                 # pair row → sorted slot
    src = jnp.zeros((rows,), jnp.int32).at[dest].set(
        jnp.arange(rows, dtype=jnp.int32))           # sorted slot → pair row
    tok_of_row = src // k
    if n <= 512 and hidden % 128 == 0 and w2.shape[1] % 128 == 0 \
            and w1.shape[2] % 256 == 0:
        # decode: ALL routing glue rides INSIDE the ring-streamed GMM kernels
        # (ops/gmm_ring.py, VERDICT r4 #2): the one-hot dispatch and the
        # per-row scale gather are built in-kernel from tok_of_row, and the
        # weighted combine mask from (dest, topk_w) — no [rows, hidden]
        # gather, no [n, rows] mask, and no [rows, hidden] expert output
        # ever touches HBM.  The manual DMA ring streams weights at
        # ~755 GB/s vs ~650 for the BlockSpec pipeline (chip r5: GMM1 326 vs
        # 346 µs, GMM2+combine 172 vs 213 µs at DeepSeek decode shapes).
        from sgl_kernel_npu_tpu.ops import gmm_ring

        h1, hs = gmm_ring.gmm1_ring(
            xq_tok, tok_of_row, w1, gsizes, sx_tok, s1)
        out = gmm_ring.gmm2_combine_ring(
            h1, w2, gsizes, hs, s2, dest.reshape(n, k),
            topk_w.astype(jnp.float32))
        return out.astype(x.dtype)
    # combine weights as a masked MATMUL: scatter the top-k weights into a
    # [n, rows] mask at each token's sorted slots — token-granular gathers
    # lower to scalar reads on TPU while a matmul streams the expert outputs
    # at full bandwidth; hi+lo bf16 split keeps f32-accurate weighting at
    # bf16 MXU rate
    mask = jnp.zeros((n, rows), jnp.float32).at[
        jnp.arange(n, dtype=jnp.int32)[:, None], dest.reshape(n, k)
    ].add(topk_w.astype(jnp.float32))
    m_hi = mask.astype(jnp.bfloat16)
    m_lo = (mask - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    if n <= 512:
        # BlockSpec fallback (shape-constrained): routing hops inside the
        # grouped kernels via dispatch_p / combine epilogue
        p_mat = gmod.dispatch_onehot(tok_of_row, n)
        h1, hs = gmod.grouped_matmul(
            xq_tok, w1, gsizes, sx_tok[tok_of_row], s1,
            epilogue="dequant_swiglu_quant", dispatch_p=p_mat)
        out = gmod.grouped_matmul_combine(h1, w2, gsizes, hs, s2, m_hi, m_lo)
    else:
        h1, hs = gmod.grouped_matmul(
            xq_tok[tok_of_row], w1, gsizes, sx_tok[tok_of_row], s1,
            epilogue="dequant_swiglu_quant")
        y = gmod.grouped_matmul(
            h1, w2, gsizes, hs, s2, epilogue="dequant", out_dtype=jnp.bfloat16)
        out = jax.lax.dot(m_hi, y, preferred_element_type=jnp.float32)
        out += jax.lax.dot(m_lo, y, preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def quantize_moe_weights(cfg: DeepSeekV3Config, params: dict, tn: int | None = None):
    """Per-layer W8A8 expert weights for the fused MoE path."""
    return [
        quantize_expert_weights(lw["w_gate"], lw["w_up"], lw["w_down"], tn=tn)
        for lw in params["layers"]
    ]


# ---------------------------------------------------------------------------
# training: differentiable forward with dp × ep sharding
# ---------------------------------------------------------------------------

def _train_attention(cfg, lw, x, cos, sin, *, flash=False):
    """Dense causal MLA attention over the whole sequence, [B,S,H].

    ``flash=True`` routes through the Pallas flash kernel + hand-written
    backward (ops/attention/mla_train.mla_flash_train) — O(S) memory both
    ways instead of the [B,H,S,S] score matrix."""
    b, s, h = x.shape
    flat = x.reshape(b * s, h)
    q_lat, qpe, k_lat, kpe, h1 = _mla_qkv(cfg, lw, flat, cos, sin)
    q_lat = q_lat.reshape(b, s, cfg.num_heads, -1)
    qpe = qpe.reshape(b, s, cfg.num_heads, -1)
    k_lat = k_lat.reshape(b, s, -1)
    kpe = kpe.reshape(b, s, -1)
    if flash:
        from sgl_kernel_npu_tpu.ops.attention.mla_train import mla_flash_train

        attn = mla_flash_train(q_lat, qpe, k_lat, kpe, cfg.sm_scale)
    else:
        scores = jnp.einsum("bqhl,bkl->bhqk", q_lat, k_lat)
        scores += jnp.einsum("bqhr,bkr->bhqk", qpe, kpe)
        scores *= cfg.sm_scale
        causal = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(causal[None, None], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhqk,bkl->bqhl", p, k_lat)
    return _mla_output(cfg, lw, attn.reshape(b * s, cfg.num_heads, -1)).reshape(b, s, h)


def _ep_moe_train(cfg, lw, x_flat, topk_idx, topk_w, *, mesh, ep_axis="ep", dp_axis="dp"):
    """Differentiable EP MoE: the real dispatch/combine path in BF16 + ragged_dot."""
    num_ranks = mesh.shape[ep_axis]
    t = x_flat.shape[0] // (num_ranks * mesh.shape[dp_axis])
    pair = t * min(cfg.topk, cfg.num_experts // num_ranks)

    def body(xs, idx, w, wg, wu, wd):
        d = ep_core.dispatch_ragged_core(
            xs, idx,
            axis_name=ep_axis,
            num_experts=cfg.num_experts,
            num_ranks=num_ranks,
            pair_capacity=pair,
            seg_capacity=t,
            use_int8=False,
        )
        gs = d["group_sizes"]
        xin = d["recv_x_sorted"]
        # expert GEMMs through the Pallas kernel (gmm_train custom_vjp:
        # Pallas fwd + dx, ragged-contracting dw) — 2.6x XLA ragged_dot in
        # bf16 on chip (PERF.md §grouped GEMM)
        from sgl_kernel_npu_tpu.ops.grouped_matmul import gmm_train
        gate = gmm_train(xin, wg, gs)
        up = gmm_train(xin, wu, gs)
        act = (gate * jax.nn.sigmoid(gate) * up).astype(xin.dtype)
        y = gmm_train(act, wd, gs)
        return ep_core.combine_ragged_core(
            y.astype(xin.dtype), w, d["handle"],
            axis_name=ep_axis,
            num_ranks=num_ranks,
            num_local_experts=cfg.num_experts // num_ranks,
            seg_capacity=t,
            out_dtype=xin.dtype,
        )

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P((dp_axis, ep_axis)), P((dp_axis, ep_axis)), P((dp_axis, ep_axis)),
                  P(ep_axis), P(ep_axis), P(ep_axis)),
        out_specs=P((dp_axis, ep_axis)),
        check_vma=False,
    )(x_flat, topk_idx, topk_w, lw["w_gate"], lw["w_up"], lw["w_down"])


def train_forward(cfg: DeepSeekV3Config, params: dict, tokens: jax.Array, *,
                  mesh: Mesh | None, flash: bool = False):
    """Causal LM loss; tokens [B, S].  mesh=None → single device (no EP).
    ``flash``: Pallas flash attention + custom_vjp (O(S) memory)."""
    b, s = tokens.shape
    x = params["embed"][tokens]
    cos, sin = rope_cos_sin(jnp.arange(s), cfg.qk_rope_dim)
    cos = jnp.tile(cos, (b, 1))
    sin = jnp.tile(sin, (b, 1))
    for lw in params["layers"]:
        x = x + _train_attention(cfg, lw, x, cos, sin, flash=flash)
        h2 = rms_norm_ref(x.reshape(b * s, -1), lw["ln2"])
        topk_idx, topk_w = _router(cfg, lw, h2)
        if mesh is not None:
            moe = _ep_moe_train(cfg, lw, h2, topk_idx, topk_w, mesh=mesh)
        else:
            moe = _dense_moe(cfg, lw, h2, topk_idx, topk_w)
        x = x + (moe + _shared_expert(lw, h2)).reshape(b, s, -1)
    x = rms_norm_ref(x.reshape(b * s, -1), params["final_ln"])
    logits = x @ params["embed"].T
    labels = jnp.roll(tokens, -1, axis=1).reshape(-1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    mask = jnp.tile(jnp.arange(s) < s - 1, (b,))
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return jnp.sum(nll * mask) / jnp.sum(mask)


def make_train_step(cfg: DeepSeekV3Config, mesh: Mesh | None, lr: float = 1e-3,
                    flash: bool = False):
    """SGD training step; shardings: batch dp×ep, experts ep, dense replicated."""

    def step(params, tokens):
        loss, grads = jax.value_and_grad(functools.partial(train_forward, cfg, mesh=mesh, flash=flash))(
            params, tokens
        )
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return new_params, loss

    if mesh is None:
        return jax.jit(step)

    def pspec(params):
        def leaf_spec(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in ("w_gate", "w_up", "w_down"):
                return NamedSharding(mesh, P("ep"))
            return NamedSharding(mesh, P())
        return jax.tree_util.tree_map_with_path(leaf_spec, params)

    return jax.jit(step), pspec


# ---------------------------------------------------------------------------
# tensor-parallel serving: head-sharded attention via shard_map
# ---------------------------------------------------------------------------

def _tp_layer_specs(axis: str):
    """PartitionSpecs for one layer's weights under head-TP: per-head matrices
    shard on the head dim, everything else replicates.  The reference only
    plumbs TP hooks through its dispatch op (tp_world_size etc.,
    moe_distribute_dispatch_v2_def.cpp:54-56); here TP attention actually
    runs — MLA's latent KV is head-shared, so the cache replicates and ONLY
    the q/out projections shard (the MLA TP advantage)."""
    p = P()
    return {
        "ln1": p, "wdqkv": p, "q_ln": p,
        "wuq": P(None, axis),       # [q_lora, H·qk_dim] → heads on dim 1
        "wuk": P(axis),             # [H, nope, lat]
        "kv_ln": p,
        "wvu": P(axis),             # [H, lat, v]
        "wo": P(axis, None),        # [H·v, hidden] → heads on dim 0
    }


def tp_attention_block(cfg: DeepSeekV3Config, lw: dict, x, cos, sin, cache,
                       block_table, seq_lens, slot_mapping, *, mesh, axis="tp"):
    """One MLA attention block with heads sharded over ``axis``.

    Every rank redundantly computes the (head-free) latent KV and writes the
    same cache pages; attention + output projection run on H/ntp local heads
    and the output psums.  Returns (attn_out [N, hidden], new nope/rope caches).
    """
    ntp = mesh.shape[axis]
    local_cfg = dataclasses.replace(cfg, num_heads=cfg.num_heads // ntp)
    keys = _tp_layer_specs(axis)
    lw_attn = {k: lw[k] for k in keys}

    def body(xs, lww, cos_, sin_, cn, cr, bt, sl, slots):
        q_lat, qpe, k_lat, kpe, h1 = _mla_qkv(local_cfg, lww, xs, cos_, sin_)
        cn2 = _write_nope(cfg, k_lat, cn, slots)
        cr2 = reshape_and_cache_transposed(
            kpe[:, None, :].astype(cr.dtype), cr, slots)
        q = jnp.concatenate([q_lat, qpe], axis=-1).astype(cr2.dtype)
        attn = decode_mla(q, cn2, cr2, sl, cfg.sm_scale, bt,
                          k_scale=_nope_scale(cfg))
        o = _mla_output(local_cfg, lww, attn.astype(jnp.float32))
        return jax.lax.psum(o, axis), cn2, cr2

    in_specs = (P(), {k: keys[k] for k in lw_attn}, P(), P(), P(), P(), P(), P(), P())
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=in_specs,
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(x, lw_attn, cos, sin, cache["nope"], cache["rope"], block_table,
      seq_lens, slot_mapping)


def decode_step_tp(
    cfg: DeepSeekV3Config,
    params: dict,
    hidden, positions, kv_caches, block_table, seq_lens, slot_mapping,
    *, mesh, axis: str = "tp",
):
    """decode_step with head-TP attention (MoE/shared experts replicated;
    combine with EP via a tp×ep mesh and Buffer for the full 2D layout)."""
    if cfg.sparse_count > 0:
        raise NotImplementedError(
            "decode_step_tp does not run the DSA sparse branch (and would "
            "drop the kidx cache leaf) — use dense configs for TP serving")
    cos, sin = rope_cos_sin(positions, cfg.qk_rope_dim)
    x = hidden
    new_caches = []
    for li, lw in enumerate(params["layers"]):
        o, cn, cr = tp_attention_block(
            cfg, lw, x, cos, sin, kv_caches[li], block_table, seq_lens,
            slot_mapping, mesh=mesh, axis=axis)
        new_caches.append({"nope": cn, "rope": cr})
        x = x + o
        h2 = rms_norm_ref(x, lw["ln2"])
        topk_idx, topk_w = _router(cfg, lw, h2)
        x = x + _dense_moe(cfg, lw, h2, topk_idx, topk_w) + _shared_expert(lw, h2)
    return x, new_caches
