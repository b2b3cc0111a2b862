"""HuggingFace checkpoint converters → this framework's model pytrees.

The reference is a kernel library consumed by SGLang, which owns weight
loading; a standalone framework needs its own.  These converters map
``transformers`` models (torch CPU state dicts — no torch on the device path,
arrays cross once at load time) into the native model families, and double as
third-party correctness anchors: tests diff our prefill logits against the
upstream torch forward (tests/test_hf_parity.py).

Layout notes: torch ``nn.Linear.weight`` is ``[out, in]`` — transposed into
our ``x @ w`` convention.  Rope is HF's neox rotate-half, which is exactly
``ops.rope.apply_rope``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _t(sd, key, dtype):
    """state-dict tensor → jnp array (transposed Linear)."""
    return jnp.asarray(np.asarray(sd[key].float().numpy()), dtype).T


def _v(sd, key, dtype):
    """state-dict tensor → jnp array (as stored)."""
    return jnp.asarray(np.asarray(sd[key].float().numpy()), dtype)


def llama_from_hf(model, page_size: int = 16, dtype=jnp.float32):
    """``transformers`` Llama/Qwen2-style dense GQA model → (LlamaConfig, params).

    Supports tied or untied lm heads.  ``model`` is a
    ``LlamaForCausalLM``-shaped torch module on CPU.
    """
    from sgl_kernel_npu_tpu.models.llama import LlamaConfig

    hf = model.config
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // hf.num_attention_heads
    cfg = LlamaConfig(
        vocab_size=hf.vocab_size,
        hidden=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        num_kv_heads=hf.num_key_value_heads,
        head_dim=head_dim,
        intermediate=hf.intermediate_size,
        page_size=page_size,
        rope_theta=float(hf.rope_theta),
        rms_eps=float(hf.rms_norm_eps),
    )
    sd = model.state_dict()
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers.append({
            "ln1": _v(sd, p + "input_layernorm.weight", dtype),
            "wq": _t(sd, p + "self_attn.q_proj.weight", dtype),
            "wk": _t(sd, p + "self_attn.k_proj.weight", dtype),
            "wv": _t(sd, p + "self_attn.v_proj.weight", dtype),
            "wo": _t(sd, p + "self_attn.o_proj.weight", dtype),
            "ln2": _v(sd, p + "post_attention_layernorm.weight", dtype),
            "w_gate": _t(sd, p + "mlp.gate_proj.weight", dtype),
            "w_up": _t(sd, p + "mlp.up_proj.weight", dtype),
            "w_down": _t(sd, p + "mlp.down_proj.weight", dtype),
        })
    params = {
        "layers": layers,
        "ln_f": _v(sd, "model.norm.weight", dtype),
        "wte": _v(sd, "model.embed_tokens.weight", dtype),
    }
    if not getattr(hf, "tie_word_embeddings", True):
        params["w_lm"] = _t(sd, "lm_head.weight", dtype)
    return cfg, params


def gpt_oss_from_hf(model, page_size: int = 16, dtype=jnp.float32):
    """``transformers`` GptOssForCausalLM → (GptOssConfig, params).

    Maps the real GPT-OSS architecture: sinks attention with q/k/v/o biases,
    alternating sliding/full layers (sliding on even indices — the HF
    ``layer_types`` default; any other pattern is rejected), MoE MLP with
    biased interleaved gate|up experts and the clamped activation, and the
    YaRN rope (``inv_freq`` + ``attention_scaling`` read off the HF rotary
    module into the params — models.gpt_oss._rope_tables consumes them).
    """
    from sgl_kernel_npu_tpu.models.gpt_oss import GptOssConfig

    hf = model.config
    for i, lt in enumerate(hf.layer_types):
        want = "sliding_attention" if i % 2 == 0 else "full_attention"
        if lt != want:
            raise NotImplementedError(f"layer_types[{i}]={lt}; only the "
                                      "sliding-on-even alternation is mapped")
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // hf.num_attention_heads
    cfg = GptOssConfig(
        vocab_size=hf.vocab_size,
        hidden=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        num_kv_heads=hf.num_key_value_heads,
        head_dim=head_dim,
        intermediate=hf.intermediate_size,
        sliding_window=hf.sliding_window,
        page_size=page_size,
        rope_theta=float(hf.rope_theta),
        num_experts=hf.num_local_experts,
        topk=hf.num_experts_per_tok,
        attention_bias=bool(hf.attention_bias),
        rms_eps=float(hf.rms_norm_eps),
    )
    sd = model.state_dict()
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        lw = {
            "ln1": _v(sd, p + "input_layernorm.weight", dtype),
            "wq": _t(sd, p + "self_attn.q_proj.weight", dtype),
            "wk": _t(sd, p + "self_attn.k_proj.weight", dtype),
            "wv": _t(sd, p + "self_attn.v_proj.weight", dtype),
            "wo": _t(sd, p + "self_attn.o_proj.weight", dtype),
            "sinks": _v(sd, p + "self_attn.sinks", dtype),
            "ln2": _v(sd, p + "post_attention_layernorm.weight", dtype),
            # expert tensors are stored [E, in, out] already (Parameters, not
            # Linears) — no transpose
            "router_w": _t(sd, p + "mlp.router.weight", dtype),
            "router_b": _v(sd, p + "mlp.router.bias", dtype),
            "w_gate_up": _v(sd, p + "mlp.experts.gate_up_proj", dtype),
            "b_gate_up": _v(sd, p + "mlp.experts.gate_up_proj_bias", dtype),
            "w_down": _v(sd, p + "mlp.experts.down_proj", dtype),
            "b_down": _v(sd, p + "mlp.experts.down_proj_bias", dtype),
        }
        if cfg.attention_bias:
            lw.update({
                "bq": _v(sd, p + "self_attn.q_proj.bias", dtype),
                "bk": _v(sd, p + "self_attn.k_proj.bias", dtype),
                "bv": _v(sd, p + "self_attn.v_proj.bias", dtype),
                "bo": _v(sd, p + "self_attn.o_proj.bias", dtype),
            })
        layers.append(lw)
    params = {
        "layers": layers,
        "ln_f": _v(sd, "model.norm.weight", dtype),
        "wte": _v(sd, "model.embed_tokens.weight", dtype),
        "rope_inv_freq": jnp.asarray(
            model.model.rotary_emb.inv_freq.float().numpy(), jnp.float32),
        "rope_attention_scaling": jnp.float32(
            model.model.rotary_emb.attention_scaling),
        "rms_eps": float(hf.rms_norm_eps),
    }
    if not getattr(hf, "tie_word_embeddings", True):
        params["w_lm"] = _t(sd, "lm_head.weight", dtype)
    return cfg, params


def qwen3_next_from_hf(model, page_size: int = 16, dtype=jnp.float32):
    """``transformers`` Qwen3NextForCausalLM → (Qwen3NextHybridConfig, params).

    Maps the full hybrid: GDN layers (the per-k-head-group interleaved
    ``in_proj_qkvz``/``in_proj_ba`` columns are permuted into this framework's
    flat q|k|v|z / b|a layout at load time; conv + gating map directly) and
    gated attention layers (query|gate packed q_proj split, per-head q/k
    norms, partial rotary), with the MoE MLP (softmax-then-top-k router +
    sigmoid-gated shared expert) on every layer.
    """
    from sgl_kernel_npu_tpu.models.qwen3_next import Qwen3NextHybridConfig

    hf = model.config
    if getattr(hf, "attention_bias", False):
        raise NotImplementedError("attention_bias=True is not mapped")
    try:
        attn_every = hf.layer_types.index("full_attention") + 1
    except ValueError as e:
        raise NotImplementedError("no full_attention layer") from e
    for i, lt in enumerate(hf.layer_types):
        want = ("full_attention" if (i + 1) % attn_every == 0 else
                "linear_attention")
        if lt != want:
            raise NotImplementedError(f"layer_types[{i}]={lt}: only the "
                                      "uniform linear/full interleave is mapped")
    head_dim = getattr(hf, "head_dim", None) or hf.hidden_size // hf.num_attention_heads
    hk, hv = hf.linear_num_key_heads, hf.linear_num_value_heads
    dk, dv = hf.linear_key_head_dim, hf.linear_value_head_dim
    r = hv // hk
    cfg = Qwen3NextHybridConfig(
        vocab_size=hf.vocab_size,
        hidden=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        attn_every=attn_every,
        num_k_heads=hk, num_v_heads=hv, head_k_dim=dk, head_v_dim=dv,
        conv_width=hf.linear_conv_kernel_dim,
        num_heads=hf.num_attention_heads,
        num_kv_heads=hf.num_key_value_heads,
        head_dim=head_dim,
        page_size=page_size,
        rope_theta=float(hf.rope_theta),
        mlp_intermediate=hf.intermediate_size,
        rotary_dim=int(head_dim * hf.partial_rotary_factor),
        attn_gate=True, qk_norm=True,
        rms_eps=float(hf.rms_norm_eps),
        moe_experts=hf.num_experts,
        moe_topk=hf.num_experts_per_tok,
        moe_intermediate=hf.moe_intermediate_size,
        shared_expert_intermediate=hf.shared_expert_intermediate_size,
        norm_topk_prob=bool(hf.norm_topk_prob),
    )
    # column permutations: HF group-interleaved → our flat q|k|v|z and b|a
    stride = 2 * dk + 2 * r * dv
    base = np.arange(hk)[:, None] * stride
    qcols = (base + np.arange(dk)[None]).reshape(-1)
    kcols = (base + dk + np.arange(dk)[None]).reshape(-1)
    vcols = (base + 2 * dk + np.arange(r * dv)[None]).reshape(-1)
    zcols = (base + 2 * dk + r * dv + np.arange(r * dv)[None]).reshape(-1)
    qkvz_perm = np.concatenate([qcols, kcols, vcols, zcols])
    bbase = np.arange(hk)[:, None] * 2 * r
    ba_perm = np.concatenate([(bbase + np.arange(r)[None]).reshape(-1),
                              (bbase + r + np.arange(r)[None]).reshape(-1)])

    sd = model.state_dict()

    def moe_weights(p):
        e = cfg.moe_experts
        return {
            "moe_router": _t(sd, p + "mlp.gate.weight", dtype),
            "moe_gate": jnp.stack([_t(sd, p + f"mlp.experts.{x}.gate_proj.weight", dtype)
                                   for x in range(e)]),
            "moe_up": jnp.stack([_t(sd, p + f"mlp.experts.{x}.up_proj.weight", dtype)
                                 for x in range(e)]),
            "moe_down": jnp.stack([_t(sd, p + f"mlp.experts.{x}.down_proj.weight", dtype)
                                   for x in range(e)]),
            "ws_gate": _t(sd, p + "mlp.shared_expert.gate_proj.weight", dtype),
            "ws_up": _t(sd, p + "mlp.shared_expert.up_proj.weight", dtype),
            "ws_down": _t(sd, p + "mlp.shared_expert.down_proj.weight", dtype),
            "ws_gate_w": _t(sd, p + "mlp.shared_expert_gate.weight", dtype),
        }

    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        if cfg.is_attn(i):
            wq2 = _t(sd, p + "self_attn.q_proj.weight", dtype).reshape(
                cfg.hidden, cfg.num_heads, 2 * head_dim)
            lw = {
                "kind": "attn",
                "ln1": 1.0 + _v(sd, p + "input_layernorm.weight", dtype),
                "wq": wq2[:, :, :head_dim].reshape(cfg.hidden, -1),
                "wg_attn": wq2[:, :, head_dim:].reshape(cfg.hidden, -1),
                "wk": _t(sd, p + "self_attn.k_proj.weight", dtype),
                "wv": _t(sd, p + "self_attn.v_proj.weight", dtype),
                "wo": _t(sd, p + "self_attn.o_proj.weight", dtype),
                "q_norm": 1.0 + _v(sd, p + "self_attn.q_norm.weight", dtype),
                "k_norm": 1.0 + _v(sd, p + "self_attn.k_norm.weight", dtype),
                "ln2": 1.0 + _v(sd, p + "post_attention_layernorm.weight", dtype),
            }
        else:
            lw = {
                "kind": "gdn",
                "ln1": 1.0 + _v(sd, p + "input_layernorm.weight", dtype),
                "w_qkvz": _t(sd, p + "linear_attn.in_proj_qkvz.weight",
                             dtype)[:, qkvz_perm],
                "w_ba": _t(sd, p + "linear_attn.in_proj_ba.weight",
                           dtype)[:, ba_perm],
                "conv_w": _v(sd, p + "linear_attn.conv1d.weight", dtype)[:, 0, :],
                "conv_b": jnp.zeros((cfg.gdn.qkv_dim,), dtype),
                "A_log": _v(sd, p + "linear_attn.A_log", dtype),
                "dt_bias": _v(sd, p + "linear_attn.dt_bias", dtype),
                "gn_w": jnp.tile(_v(sd, p + "linear_attn.norm.weight", dtype), hv),
                "w_out": _t(sd, p + "linear_attn.out_proj.weight", dtype),
                "ln2": 1.0 + _v(sd, p + "post_attention_layernorm.weight", dtype),
            }
        lw.update(moe_weights(p))
        layers.append(lw)
    params = {
        "layers": layers,
        "ln_f": 1.0 + _v(sd, "model.norm.weight", dtype),
        "wte": _v(sd, "model.embed_tokens.weight", dtype),
        "rms_eps": float(hf.rms_norm_eps),
    }
    if not getattr(hf, "tie_word_embeddings", True):
        params["w_lm"] = _t(sd, "lm_head.weight", dtype)
    return cfg, params


def deepseek_v3_from_hf(model, page_size: int = 16, dtype=jnp.float32):
    """``transformers`` DeepseekV3ForCausalLM → (DeepSeekV3Config, params).

    Maps the HF MLA parametrization onto the absorbed form this framework
    runs: ``kv_b_proj [H*(nope+v), kv_lora]`` splits per head into
    ``wuk [H, nope, lat]`` (K up-projection, used pre-attention on q) and
    ``wvu [H, lat, v]`` (V up-projection, applied post-attention).  Dense
    (``first_k_dense_replace``) layers are rejected — serve MoE-only depth or
    extend the config first.
    """
    from sgl_kernel_npu_tpu.models.deepseek_v3 import DeepSeekV3Config

    hf = model.config
    if getattr(hf, "q_lora_rank", None) in (None, 0):
        raise NotImplementedError("q_lora_rank=None (no q LoRA) is not mapped")
    if getattr(hf, "first_k_dense_replace", 0) != 0:
        raise NotImplementedError("leading dense layers are not mapped")
    if getattr(hf, "n_shared_experts", 1) != 1:
        raise NotImplementedError("exactly one shared expert is mapped")
    lat = hf.kv_lora_rank
    nope = hf.qk_nope_head_dim
    rope = hf.qk_rope_head_dim
    cfg = DeepSeekV3Config(
        vocab_size=hf.vocab_size,
        hidden=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        kv_lora_rank=lat,
        qk_rope_dim=rope,
        qk_nope_dim=nope,
        q_lora_rank=hf.q_lora_rank,
        v_head_dim=hf.v_head_dim,
        num_experts=hf.n_routed_experts,
        num_shared_experts=1,
        topk=hf.num_experts_per_tok,
        moe_intermediate=hf.moe_intermediate_size,
        rope_base=float(hf.rope_theta),
        page_size=page_size,
        router_scoring="sigmoid_v3",
        n_group=hf.n_group,
        topk_group=hf.topk_group,
        routed_scaling_factor=float(hf.routed_scaling_factor),
        norm_topk_prob=bool(hf.norm_topk_prob),
    )
    sd = model.state_dict()
    h = cfg.num_heads
    # HF real checkpoints store the rope dims INTERLEAVED (config.rope_interleave:
    # pairs (2i, 2i+1)); its forward permutes to even|odd halves before the
    # rotate-half rope.  Absorb that permutation into the weight columns that
    # produce q_pe / k_pe so our plain neox rope reproduces the same dots.
    perm = (np.concatenate([np.arange(0, rope, 2), np.arange(1, rope, 2)])
            if getattr(hf, "rope_interleave", True) else np.arange(rope))
    layers = []
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        # HF packs kv_a_proj_with_mqa = [lat+rope, hidden]; our wdqkv is
        # [hidden, lat+rope+q_lora] with the q LoRA columns last
        kv_a = _t(sd, p + "self_attn.kv_a_proj_with_mqa.weight", dtype)
        kv_a = kv_a.at[:, lat:].set(kv_a[:, lat + perm])
        q_a = _t(sd, p + "self_attn.q_a_proj.weight", dtype)
        kv_b = _v(sd, p + "self_attn.kv_b_proj.weight", dtype)  # [H*(nope+v), lat]
        kv_b = kv_b.reshape(h, nope + cfg.v_head_dim, lat)
        wuk = kv_b[:, :nope, :]                                  # [H, nope, lat]
        wvu = kv_b[:, nope:, :].swapaxes(1, 2)                   # [H, lat, v]
        gates = [
            _t(sd, p + f"mlp.experts.{e}.gate_proj.weight", dtype)
            for e in range(cfg.num_experts)
        ]
        ups = [
            _t(sd, p + f"mlp.experts.{e}.up_proj.weight", dtype)
            for e in range(cfg.num_experts)
        ]
        downs = [
            _t(sd, p + f"mlp.experts.{e}.down_proj.weight", dtype)
            for e in range(cfg.num_experts)
        ]
        wuq = _t(sd, p + "self_attn.q_b_proj.weight", dtype)
        wuq = wuq.reshape(-1, h, nope + rope)
        wuq = wuq.at[:, :, nope:].set(wuq[:, :, nope + perm])
        layers.append({
            "ln1": _v(sd, p + "input_layernorm.weight", dtype),
            "wdqkv": jnp.concatenate([kv_a, q_a], axis=1),
            "q_ln": _v(sd, p + "self_attn.q_a_layernorm.weight", dtype),
            "wuq": wuq.reshape(wuq.shape[0], h * (nope + rope)),
            "wuk": wuk,
            "kv_ln": _v(sd, p + "self_attn.kv_a_layernorm.weight", dtype),
            "wvu": wvu,
            "wo": _t(sd, p + "self_attn.o_proj.weight", dtype),
            "ln2": _v(sd, p + "post_attention_layernorm.weight", dtype),
            "router": _t(sd, p + "mlp.gate.weight", dtype),
            "router_bias": _v(sd, p + "mlp.gate.e_score_correction_bias", dtype),
            "w_gate": jnp.stack(gates),
            "w_up": jnp.stack(ups),
            "w_down": jnp.stack(downs),
            "ws_gate": _t(sd, p + "mlp.shared_experts.gate_proj.weight", dtype),
            "ws_up": _t(sd, p + "mlp.shared_experts.up_proj.weight", dtype),
            "ws_down": _t(sd, p + "mlp.shared_experts.down_proj.weight", dtype),
            # no DSA indexer in the HF graph; zeros keep sparse_count=0 paths
            "w_qidx": jnp.zeros((cfg.hidden, cfg.idx_heads * cfg.idx_dim), dtype),
            "w_kidx": jnp.zeros((cfg.hidden, cfg.idx_dim), dtype),
            "w_widx": jnp.zeros((cfg.hidden, cfg.idx_heads), dtype),
        })
    return cfg, {
        "embed": _v(sd, "model.embed_tokens.weight", dtype),
        "layers": layers,
        "final_ln": _v(sd, "model.norm.weight", dtype),
        "w_lm": _t(sd, "lm_head.weight", dtype),
    }
