"""Qwen3-Next-style gated-delta-rule (GDN) hybrid layer.

Second model family: exercises the FLA pipeline end to end the way SGLang consumes
the reference's fla/ + mamba/ kernels for Qwen3-Next (SURVEY.md §2.3): causal
conv1d on the mixed qkv stream → gated delta rule (chunked prefill / fused
recurrent decode over state pools) → gated RMSNorm → output projection, plus a
SwiGLU MLP block.

Prefill and decode share one weight pytree; decode carries (conv_state, ssm_state)
pools indexed per request (continuous batching).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.fla.chunk import chunk_gated_delta_rule
from sgl_kernel_npu_tpu.ops.fla.gating import fused_gdn_gating
from sgl_kernel_npu_tpu.ops.fla.norms import layernorm_gated
from sgl_kernel_npu_tpu.ops.fla.recurrent import fused_sigmoid_gating_delta_rule_update
from sgl_kernel_npu_tpu.ops.mamba.causal_conv1d import causal_conv1d_fn, causal_conv1d_update
from sgl_kernel_npu_tpu.ops.norm import rms_norm_ref


@dataclasses.dataclass(frozen=True)
class Qwen3NextConfig:
    hidden: int = 256
    num_k_heads: int = 2        # H (q/k heads)
    num_v_heads: int = 4        # HV
    head_k_dim: int = 32        # K
    head_v_dim: int = 32        # V
    conv_width: int = 4
    mlp_intermediate: int = 512
    chunk_size: int = 16
    rms_eps: float = 1e-6       # gated-norm eps (HF rms_norm_eps)

    @property
    def qkv_dim(self):
        # mixed projection: q (H·K) ‖ k (H·K) ‖ v (HV·V)
        return 2 * self.num_k_heads * self.head_k_dim + self.num_v_heads * self.head_v_dim


def init_weights(key, cfg: Qwen3NextConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))

    def rnd(*shape, scale=None):
        s = scale if scale is not None else 1.0 / (shape[0] ** 0.5)
        return (jax.random.normal(next(keys), shape) * s).astype(dtype)

    hv = cfg.num_v_heads
    return {
        "ln1": jnp.ones((cfg.hidden,), dtype),
        "w_qkvz": rnd(cfg.hidden, cfg.qkv_dim + hv * cfg.head_v_dim),  # +z gate
        "w_ba": rnd(cfg.hidden, 2 * hv),                                # b, a gates
        "conv_w": rnd(cfg.qkv_dim, cfg.conv_width, scale=1.0),
        "conv_b": jnp.zeros((cfg.qkv_dim,), dtype),
        "A_log": jnp.asarray(jax.random.uniform(next(keys), (hv,), minval=-2.0, maxval=0.0), dtype),
        "dt_bias": jnp.zeros((hv,), dtype),
        "gn_w": jnp.ones((hv * cfg.head_v_dim,), dtype),
        "w_out": rnd(hv * cfg.head_v_dim, cfg.hidden),
        "ln2": jnp.ones((cfg.hidden,), dtype),
        "w_gate_up": rnd(cfg.hidden, 2 * cfg.mlp_intermediate),
        "w_down": rnd(cfg.mlp_intermediate, cfg.hidden),
    }


def _project(cfg, w, x_flat, lq=None):
    h1 = rms_norm_ref(x_flat, w["ln1"])
    if lq is not None:   # W8A8: the wide qkvz GEMM quantizes; tiny ba stays float
        from sgl_kernel_npu_tpu.models.w8a8 import project as w8a8_project
        qkvz = w8a8_project(h1, lq["w_qkvz"], h1.dtype)
    else:
        qkvz = h1 @ w["w_qkvz"]
    ba = h1 @ w["w_ba"]
    qkv = qkvz[:, : cfg.qkv_dim]
    z = qkvz[:, cfg.qkv_dim :]
    b, a = jnp.split(ba, 2, axis=-1)
    return qkv, z, b, a


def _split_heads(cfg, qkv):
    hk = cfg.num_k_heads * cfg.head_k_dim
    q = qkv[..., :hk]
    k = qkv[..., hk : 2 * hk]
    v = qkv[..., 2 * hk :]
    n = qkv.shape[0]
    return (
        q.reshape(n, cfg.num_k_heads, cfg.head_k_dim),
        k.reshape(n, cfg.num_k_heads, cfg.head_k_dim),
        v.reshape(n, cfg.num_v_heads, cfg.head_v_dim),
    )


def _finish(cfg, w, core_out, z, x, lq=None, hybrid_cfg=None, ep=None):
    n = core_out.shape[0]
    o = layernorm_gated(
        core_out.reshape(n, -1), w["gn_w"], None, z, eps=cfg.rms_eps,
        group_size=cfg.head_v_dim, norm_before_gate=True, is_rms_norm=True,
    )
    if hybrid_cfg is not None:   # hybrid stack: MLP may be MoE / W8A8
        if lq is not None:
            from sgl_kernel_npu_tpu.models.w8a8 import project
            x = x + project(o, lq["w_out"], x.dtype)
        else:
            x = x + o @ w["w_out"]
        h2 = rms_norm_ref(x, w["ln2"], hybrid_cfg.rms_eps)
        return x + _hybrid_mlp(hybrid_cfg, w, lq, h2, ep)
    if lq is not None:
        from sgl_kernel_npu_tpu.models.w8a8 import mlp_swiglu, project

        x = x + project(o, lq["w_out"], x.dtype)
        return x + mlp_swiglu(rms_norm_ref(x, w["ln2"]), lq["w_gate_up"],
                              lq["w_down"], x.dtype)
    x = x + o @ w["w_out"]
    h2 = rms_norm_ref(x, w["ln2"])
    gu = h2 @ w["w_gate_up"]
    g, u = jnp.split(gu, 2, axis=-1)
    return x + (g * jax.nn.sigmoid(g) * u) @ w["w_down"]


def prefill(cfg: Qwen3NextConfig, w: dict, x: jax.Array):
    """[B, S, hidden] → ([B, S, hidden], conv_state [B, qkv, W-1], ssm_state
    [B, HV, K, V]) — chunked GDN path."""
    bsz, s, _ = x.shape
    flat = x.reshape(bsz * s, -1)
    qkv, z, b, a = _project(cfg, w, flat)
    qkv_seq = qkv.reshape(bsz, s, -1).swapaxes(1, 2)        # [B, qkv, S]
    conv_out, conv_state = causal_conv1d_fn(
        qkv_seq, w["conv_w"], w["conv_b"], return_final_states=True, activation="silu"
    )
    qkv = conv_out.swapaxes(1, 2).reshape(bsz * s, -1)
    q, k, v = _split_heads(cfg, qkv)
    g, beta = fused_gdn_gating(
        w["A_log"], a.reshape(bsz, s, -1), b.reshape(bsz, s, -1), w["dt_bias"]
    )
    o, ssm_state = chunk_gated_delta_rule(
        q.reshape(bsz, s, cfg.num_k_heads, -1),
        k.reshape(bsz, s, cfg.num_k_heads, -1),
        v.reshape(bsz, s, cfg.num_v_heads, -1),
        g, beta,
        chunk_size=cfg.chunk_size, use_qk_l2norm_in_kernel=True,
    )
    out = _finish(cfg, w, o.reshape(bsz * s, cfg.num_v_heads, -1), z, flat)
    return out.reshape(bsz, s, -1), conv_state, ssm_state


def decode_step(cfg: Qwen3NextConfig, w: dict, x: jax.Array, conv_pool, ssm_pool, state_indices):
    """Single-token decode over state pools.  x [B, hidden]."""
    qkv, z, b, a = _project(cfg, w, x)
    qkv_tok, conv_pool = causal_conv1d_update(
        qkv, conv_pool, w["conv_w"], w["conv_b"], activation="silu",
        conv_state_indices=state_indices,
    )
    q, k, v = _split_heads(cfg, qkv_tok)
    o, ssm_pool = fused_sigmoid_gating_delta_rule_update(
        w["A_log"], a[:, None, :], w["dt_bias"],
        q[:, None], k[:, None], v[:, None], b[:, None, :],
        ssm_pool, state_indices, use_qk_l2norm_in_kernel=True,
    )
    out = _finish(cfg, w, o[:, 0], z, x)
    return out, conv_pool, ssm_pool


# ---------------------------------------------------------------------------
# Hybrid layer stack (GDN + full-attention layers) — engine-servable
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Qwen3NextHybridConfig:
    """Qwen3-Next-style hybrid: GDN (linear-attention) layers with a full
    GQA attention layer every ``attn_every`` layers (the real model interleaves
    1:4).  GDN layers carry (conv, ssm) state pools; attention layers carry
    paged KV — the engine threads both."""

    vocab_size: int = 128
    hidden: int = 256
    num_layers: int = 2
    attn_every: int = 2            # layer i is attention iff (i + 1) % attn_every == 0
    # GDN dims
    num_k_heads: int = 2
    num_v_heads: int = 4
    head_k_dim: int = 32
    head_v_dim: int = 32
    conv_width: int = 4
    chunk_size: int = 16
    # attention dims
    num_heads: int = 8
    num_kv_heads: int = 2
    head_dim: int = 32
    page_size: int = 16
    rope_theta: float = 10000.0
    mlp_intermediate: int = 512
    # real-checkpoint (HF Qwen3Next) attention details — all default-off so
    # the lean hybrid configs stay as they were:
    rotary_dim: int = 0            # >0: partial rotary (first rotary_dim dims)
    attn_gate: bool = False        # sigmoid output gate from the q projection
    qk_norm: bool = False          # per-head RMSNorm on q/k before rope
    rms_eps: float = 1e-6
    # MoE MLP (every layer's MLP in real Qwen3-Next): 0 = dense
    moe_experts: int = 0
    moe_topk: int = 4
    moe_intermediate: int = 64
    shared_expert_intermediate: int = 64
    norm_topk_prob: bool = True

    @property
    def gdn(self) -> Qwen3NextConfig:
        return Qwen3NextConfig(
            hidden=self.hidden, num_k_heads=self.num_k_heads,
            num_v_heads=self.num_v_heads, head_k_dim=self.head_k_dim,
            head_v_dim=self.head_v_dim, conv_width=self.conv_width,
            mlp_intermediate=self.mlp_intermediate, chunk_size=self.chunk_size,
            rms_eps=self.rms_eps)

    def is_attn(self, li: int) -> bool:
        return (li + 1) % self.attn_every == 0


def init_hybrid_weights(key, cfg: Qwen3NextHybridConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, cfg.num_layers + 2))
    h, d = cfg.hidden, cfg.head_dim

    def moe_weights(kk, rnd):
        e, i = cfg.moe_experts, cfg.moe_intermediate
        si = cfg.shared_expert_intermediate
        return {
            "moe_router": rnd(h, e),
            "moe_gate": rnd(e, h, i), "moe_up": rnd(e, h, i),
            "moe_down": rnd(e, i, h),
            "ws_gate": rnd(h, si), "ws_up": rnd(h, si), "ws_down": rnd(si, h),
            "ws_gate_w": rnd(h, 1),
        }

    def attn_layer(k2):
        kk = iter(jax.random.split(k2, 16))
        rnd = lambda *s: (jax.random.normal(next(kk), s) / (s[0] ** 0.5)).astype(dtype)
        lw = {
            "kind": "attn",
            "ln1": jnp.ones((h,), dtype),
            "wq": rnd(h, cfg.num_heads * d),
            "wk": rnd(h, cfg.num_kv_heads * d),
            "wv": rnd(h, cfg.num_kv_heads * d),
            "wo": rnd(cfg.num_heads * d, h),
            "ln2": jnp.ones((h,), dtype),
        }
        if cfg.attn_gate:
            lw["wg_attn"] = rnd(h, cfg.num_heads * d)
        if cfg.qk_norm:
            lw["q_norm"] = jnp.ones((d,), dtype)
            lw["k_norm"] = jnp.ones((d,), dtype)
        if cfg.moe_experts > 0:
            lw.update(moe_weights(kk, rnd))
        else:
            lw.update({"w_gate_up": rnd(h, 2 * cfg.mlp_intermediate),
                       "w_down": rnd(cfg.mlp_intermediate, h)})
        return lw

    layers = []
    for li in range(cfg.num_layers):
        k2 = next(ks)
        if cfg.is_attn(li):
            layers.append(attn_layer(k2))
        else:
            w = init_weights(k2, cfg.gdn, dtype)
            w["kind"] = "gdn"
            if cfg.moe_experts > 0:
                del w["w_gate_up"], w["w_down"]
                kk = iter(jax.random.split(jax.random.fold_in(k2, 7), 16))
                rnd = lambda *s: (jax.random.normal(next(kk), s)
                                  / (s[0] ** 0.5)).astype(dtype)
                w.update(moe_weights(kk, rnd))
            layers.append(w)
    return {
        "layers": layers,
        "ln_f": jnp.ones((h,), dtype),
        "wte": (jax.random.normal(next(ks), (cfg.vocab_size, h)) * 0.02).astype(dtype),
    }


def quantize_hybrid_weights(cfg: Qwen3NextHybridConfig, params: dict) -> dict:
    """Per-out-channel int8 quant of every wide projection (W8A8 serving;
    models/w8a8.py): attention layers quantize q/k/v/o + the MLP pair; GDN
    layers quantize the qkvz in-projection, the out-projection, and the MLP
    pair (the tiny b/a gate GEMM and the conv/gating internals stay float)."""
    from sgl_kernel_npu_tpu.models.w8a8 import quantize_matrix

    layers_q = []
    mlp = () if cfg.moe_experts > 0 else ("w_gate_up", "w_down")
    for li, lw in enumerate(params["layers"]):
        names = (("wq", "wk", "wv", "wo") + mlp if cfg.is_attn(li) else
                 ("w_qkvz", "w_out") + mlp)
        layers_q.append({nm: quantize_matrix(lw[nm]) for nm in names})
    return {"layers": layers_q}


def quantize_hybrid_moe_weights(cfg: Qwen3NextHybridConfig, params: dict,
                                tn: int | None = None) -> list:
    """Per-layer W8A8 expert weights for EP serving of the hybrid MoE
    (parallel.fused_moe.quantize_expert_weights over moe_gate/up/down)."""
    from sgl_kernel_npu_tpu.parallel.fused_moe import quantize_expert_weights

    return [quantize_expert_weights(lw["moe_gate"], lw["moe_up"],
                                    lw["moe_down"], tn=tn)
            for lw in params["layers"]]


def hybrid_embed(params, ids):
    return params["wte"][ids]


def hybrid_lm_head(params, x):
    w = params["w_lm"] if "w_lm" in params else params["wte"].T
    return rms_norm_ref(x, params["ln_f"], params.get("rms_eps", 1e-6)) @ w


def init_hybrid_cache(cfg: Qwen3NextHybridConfig, num_pages: int,
                      state_slots: int, dtype=jnp.float32) -> list:
    gd = cfg.gdn
    caches = []
    for li in range(cfg.num_layers):
        if cfg.is_attn(li):
            shape = (num_pages, cfg.num_kv_heads, cfg.page_size, cfg.head_dim)
            caches.append({"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)})
        else:
            caches.append({
                "conv": jnp.zeros((state_slots, gd.qkv_dim, gd.conv_width - 1), dtype),
                "ssm": jnp.zeros(
                    (state_slots, gd.num_v_heads, gd.head_k_dim, gd.head_v_dim),
                    jnp.float32),
            })
    return caches


def _attn_projections(cfg, lw, lq, hidden_n, s):
    """q/k/v (+ optional sigmoid output gate) — W8A8 when ``lq``.  Optional
    per-head q/k RMSNorm (HF Qwen3Next q_norm/k_norm) before rope."""
    d = cfg.head_dim
    if lq is not None:
        from sgl_kernel_npu_tpu.models.w8a8 import qmm
        from sgl_kernel_npu_tpu.ops.quant import quant_per_token

        x_q, sx = quant_per_token(hidden_n)
        qp, kp, vp = (qmm(x_q, sx, lq[nm], hidden_n.dtype)
                      for nm in ("wq", "wk", "wv"))
    else:
        qp, kp, vp = (hidden_n @ lw[nm] for nm in ("wq", "wk", "wv"))
    gate = hidden_n @ lw["wg_attn"] if cfg.attn_gate else None
    q = qp.reshape(s, cfg.num_heads, d)
    k = kp.reshape(s, cfg.num_kv_heads, d)
    if cfg.qk_norm:
        q = rms_norm_ref(q, lw["q_norm"], cfg.rms_eps)
        k = rms_norm_ref(k, lw["k_norm"], cfg.rms_eps)
    return q, k, vp.reshape(s, cfg.num_kv_heads, d), gate


def _apply_rope_partial(cfg, x, cos, sin):
    """Partial rotary (HF Qwen3Next partial_rotary_factor): rope the first
    ``rotary_dim`` dims, pass the rest through.  rotary_dim=0 ropes the full
    head dim."""
    from sgl_kernel_npu_tpu.ops.rope import apply_rope

    rd = cfg.rotary_dim
    if rd in (0, cfg.head_dim):
        return apply_rope(x, cos, sin)
    return jnp.concatenate(
        [apply_rope(x[..., :rd], cos, sin), x[..., rd:]], axis=-1)


def _hybrid_mlp(cfg, lw, lq, x, ep=None):
    """The per-layer MLP: dense SwiGLU (optionally W8A8) or — real Qwen3-Next
    — MoE (softmax-over-ALL-experts then top-k renorm, HF
    Qwen3NextSparseMoeBlock) plus a sigmoid-gated shared expert.  ``ep`` =
    ``(parallel.Buffer, quantized expert weights)`` serves the routed experts
    expert-parallel via ``Buffer.fused_deep_moe`` (standard-SwiGLU experts —
    the same W8A8 grouped chain as DeepSeek); the shared expert stays local."""
    if cfg.moe_experts > 0:
        probs = jax.nn.softmax(
            (x @ lw["moe_router"]).astype(jnp.float32), axis=-1)
        topw, topi = jax.lax.top_k(probs, cfg.moe_topk)
        if cfg.norm_topk_prob:
            topw = topw / topw.sum(axis=-1, keepdims=True)
        if ep is not None:
            buf, wq = ep
            out, _, _ = buf.fused_deep_moe(
                x.astype(jnp.bfloat16), topi.astype(jnp.int32),
                topw.astype(jnp.float32), *wq)
            out = out.astype(x.dtype)
        else:
            g = jnp.einsum("nh,ehi->nei", x, lw["moe_gate"])
            u = jnp.einsum("nh,ehi->nei", x, lw["moe_up"])
            y = jnp.einsum("nei,eih->neh", g * jax.nn.sigmoid(g) * u, lw["moe_down"])
            onehot = jax.nn.one_hot(topi, cfg.moe_experts, dtype=x.dtype)
            w = (topw[..., None].astype(x.dtype) * onehot).sum(axis=1)
            out = jnp.einsum("ne,neh->nh", w, y)
        sg = x @ lw["ws_gate"]
        shared = (sg * jax.nn.sigmoid(sg) * (x @ lw["ws_up"])) @ lw["ws_down"]
        return out + jax.nn.sigmoid(x @ lw["ws_gate_w"]) * shared
    if lq is not None:
        from sgl_kernel_npu_tpu.models.w8a8 import mlp_swiglu

        return mlp_swiglu(x, lq["w_gate_up"], lq["w_down"], x.dtype)
    gu = x @ lw["w_gate_up"]
    g, u = jnp.split(gu, 2, axis=-1)
    return (g * jax.nn.sigmoid(g) * u) @ lw["w_down"]


def _attn_out_mlp(cfg, lw, lq, x, attn, gate=None, ep=None):
    if gate is not None:
        attn = attn * jax.nn.sigmoid(gate)
    if lq is not None:
        from sgl_kernel_npu_tpu.models.w8a8 import project

        x = x + project(attn, lq["wo"], x.dtype)
    else:
        x = x + attn @ lw["wo"]
    return x + _hybrid_mlp(cfg, lw, lq,
                            rms_norm_ref(x, lw["ln2"], cfg.rms_eps), ep)


def _attn_layer_prefill(cfg, lw, x, seq_lens, block_tables, context_lens,
                        slot_mapping, cos, sin, max_q, lq=None, ep=None):
    from sgl_kernel_npu_tpu.ops.attention.sinks_attention import (
        attention_sinks_prefill_pallas)
    from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import reshape_and_cache

    s = x.shape[0]
    d = cfg.head_dim
    hidden_n = rms_norm_ref(x, lw["ln1"], cfg.rms_eps)
    q, k, v, gate = _attn_projections(cfg, lw, lq, hidden_n, s)
    q = _apply_rope_partial(cfg, q, cos, sin)
    k = _apply_rope_partial(cfg, k, cos, sin)
    k_cache = reshape_and_cache(k, lw["_kc"], slot_mapping)
    v_cache = reshape_and_cache(v, lw["_vc"], slot_mapping)
    attn = attention_sinks_prefill_pallas(
        q.reshape(s, cfg.num_heads * d), k_cache, v_cache, None,
        seq_lens, block_tables, context_lens, 1.0 / (d ** 0.5), 0,
        cfg.num_heads, cfg.num_kv_heads, max_q=max_q)
    return (_attn_out_mlp(cfg, lw, lq, x, attn.reshape(s, -1), gate, ep),
            k_cache, v_cache)


def hybrid_prefill_step(
    cfg: Qwen3NextHybridConfig,
    params: dict,
    x: jax.Array,            # [S, hidden] ONE request's chunk (B must be 1)
    seq_lens: jax.Array,     # [1]
    caches: list,
    block_tables: jax.Array, # [1, max_pages]
    context_lens: jax.Array, # [1]
    slot_mapping: jax.Array, # [S]
    state_idx: jax.Array,    # [1] GDN state-pool slot
    *,
    max_q: int | None = None,
    weights_q: dict | None = None,   # quantize_hybrid_weights(...) → W8A8 mode
    moe_weights_q: list | None = None,   # quantize_hybrid_moe_weights(...)
    ep_buffer=None,                  # parallel.Buffer → EP MoE serving
):
    """Chunked varlen prefill with GDN state resume (one request per call: GDN
    recurrence is per-request; attention layers are varlen-general)."""
    from sgl_kernel_npu_tpu.ops.rope import rope_cos_sin

    gd = cfg.gdn
    s = x.shape[0]
    n = seq_lens[0]
    mask = jnp.arange(s) < n
    positions = context_lens[0] - n + jnp.arange(s)
    cos, sin = rope_cos_sin(positions, cfg.rotary_dim or cfg.head_dim,
                            base=cfg.rope_theta)
    slot0 = state_idx[0]
    new_caches = []
    for li, lw in enumerate(params["layers"]):
        lq = weights_q["layers"][li] if weights_q is not None else None
        ep = ((ep_buffer, moe_weights_q[li])
              if ep_buffer is not None and moe_weights_q is not None else None)
        cache = caches[li]
        if cfg.is_attn(li):
            lw = dict(lw, _kc=cache["k"], _vc=cache["v"])
            x, kc, vc = _attn_layer_prefill(
                cfg, lw, x, seq_lens, block_tables, context_lens, slot_mapping,
                cos, sin, max_q or s, lq=lq, ep=ep)
            new_caches.append({"k": kc, "v": vc})
            continue
        # --- GDN layer with state resume ---
        qkv, z, b, a = _project(gd, lw, x, lq=lq)
        qkv = jnp.where(mask[:, None], qkv, 0.0)          # pads must not touch state
        qkv_seq = qkv[None].swapaxes(1, 2)                # [1, D, S]
        conv_init = cache["conv"][slot0][None].astype(jnp.float32)
        conv_out, _ = causal_conv1d_fn(
            qkv_seq, lw["conv_w"], lw["conv_b"], initial_states=conv_init,
            return_final_states=True, activation="silu")
        # final conv window = last W-1 REAL inputs (right pads excluded)
        cat = jnp.concatenate([conv_init, qkv_seq.astype(jnp.float32)], axis=-1)
        new_conv = jax.lax.dynamic_slice_in_dim(
            cat, n, gd.conv_width - 1, axis=2)[0]
        qkv_t = conv_out.swapaxes(1, 2).reshape(s, -1)
        q, k, v = _split_heads(gd, qkv_t)
        g, beta = fused_gdn_gating(
            lw["A_log"], a[None], b[None], lw["dt_bias"])  # [1, S, HV]
        g = jnp.where(mask[None, :, None], g, 0.0)         # pad: decay 1
        beta = jnp.where(mask[None, :, None], beta, 0.0)   # pad: no update
        o, final = chunk_gated_delta_rule(
            q[None], k[None], v[None], g, beta,
            chunk_size=gd.chunk_size,
            initial_state=cache["ssm"][slot0][None],
            use_qk_l2norm_in_kernel=True)
        x = _finish(gd, lw, o[0], z, x, lq=lq, hybrid_cfg=cfg, ep=ep)
        new_caches.append({
            "conv": cache["conv"].at[slot0].set(new_conv.astype(cache["conv"].dtype)),
            "ssm": cache["ssm"].at[slot0].set(final[0]),
        })
    return x, new_caches


def hybrid_decode_step(
    cfg: Qwen3NextHybridConfig,
    params: dict,
    x: jax.Array,            # [B, hidden]
    positions: jax.Array,    # [B]
    caches: list,
    block_tables: jax.Array, # [B, max_pages]
    context_lens: jax.Array, # [B]
    slot_mapping: jax.Array, # [B]
    state_idx: jax.Array,    # [B] GDN pool slots
    *,
    weights_q: dict | None = None,   # quantize_hybrid_weights(...) → W8A8 mode
    moe_weights_q: list | None = None,   # quantize_hybrid_moe_weights(...)
    ep_buffer=None,                  # parallel.Buffer → EP MoE serving
):
    from sgl_kernel_npu_tpu.ops.attention.decode_attention import decode_gqa
    from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import reshape_and_cache
    from sgl_kernel_npu_tpu.ops.rope import apply_rope, rope_cos_sin

    gd = cfg.gdn
    bsz = x.shape[0]
    d = cfg.head_dim
    cos, sin = rope_cos_sin(positions, cfg.rotary_dim or cfg.head_dim,
                            base=cfg.rope_theta)
    new_caches = []
    for li, lw in enumerate(params["layers"]):
        lq = weights_q["layers"][li] if weights_q is not None else None
        ep = ((ep_buffer, moe_weights_q[li])
              if ep_buffer is not None and moe_weights_q is not None else None)
        cache = caches[li]
        if cfg.is_attn(li):
            hidden_n = rms_norm_ref(x, lw["ln1"], cfg.rms_eps)
            q, k, v, gate = _attn_projections(cfg, lw, lq, hidden_n, bsz)
            q = _apply_rope_partial(cfg, q, cos, sin)
            k = _apply_rope_partial(cfg, k, cos, sin)
            kc = reshape_and_cache(k, cache["k"], slot_mapping)
            vc = reshape_and_cache(v, cache["v"], slot_mapping)
            attn = decode_gqa(q, kc, vc, context_lens, 1.0 / (d ** 0.5), block_tables)
            x = _attn_out_mlp(cfg, lw, lq, x, attn.reshape(bsz, -1), gate, ep)
            new_caches.append({"k": kc, "v": vc})
            continue
        qkv, z, b, a = _project(gd, lw, x, lq=lq)
        qkv_tok, conv_pool = causal_conv1d_update(
            qkv, cache["conv"], lw["conv_w"], lw["conv_b"], activation="silu",
            conv_state_indices=state_idx)
        q, k, v = _split_heads(gd, qkv_tok)
        o, ssm_pool = fused_sigmoid_gating_delta_rule_update(
            lw["A_log"], a[:, None, :], lw["dt_bias"],
            q[:, None], k[:, None], v[:, None], b[:, None, :],
            cache["ssm"], state_idx, use_qk_l2norm_in_kernel=True)
        x = _finish(gd, lw, o[:, 0], z, x, lq=lq, hybrid_cfg=cfg, ep=ep)
        new_caches.append({"conv": conv_pool, "ssm": ssm_pool})
    return x, new_caches


def hybrid_state_snapshot(cfg: Qwen3NextHybridConfig, caches: list,
                          state_idx: jax.Array):
    """Copy the GDN (conv, ssm) pool rows of ``state_idx`` [B] — the tiny
    recurrent state a speculative round must be able to roll back (paged-KV
    layers need no rollback: stale rows sit beyond every later context)."""
    snap = []
    for li in range(cfg.num_layers):
        if not cfg.is_attn(li):
            c = caches[li]
            snap.append((c["conv"][state_idx], c["ssm"][state_idx]))
    return snap


def hybrid_state_restore(cfg: Qwen3NextHybridConfig, caches: list, snap: list,
                         state_idx: jax.Array):
    """Write a :func:`hybrid_state_snapshot` back into the pools."""
    out = []
    it = iter(snap)
    for li in range(cfg.num_layers):
        c = caches[li]
        if cfg.is_attn(li):
            out.append(c)
        else:
            conv_r, ssm_r = next(it)
            out.append({
                "conv": c["conv"].at[state_idx].set(conv_r),
                "ssm": c["ssm"].at[state_idx].set(ssm_r),
            })
    return out
