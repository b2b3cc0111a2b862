"""Third-party correctness anchors: our models vs upstream ``transformers``.

A tiny randomly-initialized HF model is converted (utils/hf_loader) and our
paged varlen prefill must reproduce the HF torch forward's logits — this
pins rope convention, norm eps, GQA semantics, and weight layout against an
independent implementation (something the reference, as a kernel library,
delegates to SGLang).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _prefill_logits_llama(cfg, params, ids):
    from sgl_kernel_npu_tpu.models import llama as lm

    n = len(ids)
    max_pages = -(-n // cfg.page_size)
    caches = lm.init_kv_cache(cfg, max_pages + 1)
    bt = jnp.arange(1, max_pages + 1, dtype=jnp.int32).reshape(1, max_pages)
    seq = jnp.asarray([n], jnp.int32)
    slots = jnp.asarray([int(bt[0, t // cfg.page_size]) * cfg.page_size
                         + t % cfg.page_size for t in range(n)], jnp.int32)
    x = lm.embed(params, jnp.asarray(ids, jnp.int32))
    h, _ = lm.prefill_step(cfg, params, x, seq, caches, bt, seq, slots,
                           max_q=max(8, n))
    return np.asarray(lm.lm_head(params, h))


@pytest.mark.parametrize("tied", [True, False])
def test_llama_matches_transformers(tied):
    from transformers import LlamaConfig, LlamaForCausalLM

    from sgl_kernel_npu_tpu.utils.hf_loader import llama_from_hf

    hf_cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=tied, attention_bias=False, mlp_bias=False)
    torch.manual_seed(3)
    model = LlamaForCausalLM(hf_cfg).eval()
    ids = [1, 5, 9, 2, 33, 17, 4, 60, 21, 7]
    with torch.no_grad():
        want = model(torch.tensor([ids])).logits[0].float().numpy()

    cfg, params = llama_from_hf(model, page_size=4)
    got = _prefill_logits_llama(cfg, params, ids)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _prefill_logits_deepseek(cfg, params, ids):
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m

    n = len(ids)
    max_pages = -(-n // cfg.page_size)
    caches = m.init_kv_cache(cfg, max_pages + 1, jnp.float32)
    bt = jnp.arange(1, max_pages + 1, dtype=jnp.int32).reshape(1, max_pages)
    seq = jnp.asarray([n], jnp.int32)
    slots = jnp.asarray([int(bt[0, t // cfg.page_size]) * cfg.page_size
                         + t % cfg.page_size for t in range(n)], jnp.int32)
    x = m.embed(params, jnp.asarray(ids, jnp.int32))
    h, _ = m.prefill_step(cfg, params, x, seq, caches, bt, seq, slots,
                          max_q=max(8, n))
    return np.asarray(m.lm_head(params, h))


def test_deepseek_v3_matches_transformers():
    """Flagship anchor: converted DeepSeek-V3 (MLA absorption, interleaved
    rope folded into weights, sigmoid_v3 group-limited router) reproduces the
    upstream torch logits."""
    from transformers import DeepseekV3Config as HfDs
    from transformers import DeepseekV3ForCausalLM

    from sgl_kernel_npu_tpu.utils.hf_loader import deepseek_v3_from_hf

    hf_cfg = HfDs(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        n_group=2, topk_group=1, routed_scaling_factor=2.5,
        norm_topk_prob=True, first_k_dense_replace=0,
        kv_lora_rank=32, q_lora_rank=48, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32,
        max_position_embeddings=128, rope_theta=10000.0)
    torch.manual_seed(11)
    model = DeepseekV3ForCausalLM(hf_cfg).eval()
    # non-zero router choice bias to pin the bias-in-choice/not-in-weights rule
    with torch.no_grad():
        for layer in model.model.layers:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.05, 0.05)
    ids = [1, 5, 9, 2, 33, 17, 4, 60, 21, 7]
    with torch.no_grad():
        want = model(torch.tensor([ids])).logits[0].float().numpy()

    cfg, params = deepseek_v3_from_hf(model, page_size=4)
    assert cfg.router_scoring == "sigmoid_v3"
    got = _prefill_logits_deepseek(cfg, params, ids)
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_gpt_oss_matches_transformers():
    """Real-architecture GPT-OSS anchor: sinks + biased projections + MoE
    (biased interleaved experts, clamped activation) + YaRN rope + an ACTIVE
    sliding window on the even layers — vs the upstream torch forward."""
    from transformers import GptOssConfig as HfGo
    from transformers import GptOssForCausalLM

    from sgl_kernel_npu_tpu.models import gpt_oss as gm
    from sgl_kernel_npu_tpu.utils.hf_loader import gpt_oss_from_hf

    hf_cfg = HfGo(
        vocab_size=64, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=6, max_position_embeddings=128,
        tie_word_embeddings=False)
    torch.manual_seed(7)
    model = GptOssForCausalLM(hf_cfg).eval()
    ids = [1, 5, 9, 2, 33, 17, 4, 60, 21, 7]   # length 10 > window 6
    with torch.no_grad():
        want = model(torch.tensor([ids])).logits[0].float().numpy()

    cfg, params = gpt_oss_from_hf(model, page_size=4)
    assert cfg.num_experts == 4 and cfg.attention_bias
    n = len(ids)
    max_pages = -(-n // cfg.page_size)
    caches = gm.init_kv_cache(cfg, max_pages + 1)
    bt = jnp.arange(1, max_pages + 1, dtype=jnp.int32).reshape(1, max_pages)
    seq = jnp.asarray([n], jnp.int32)
    slots = jnp.asarray([int(bt[0, t // cfg.page_size]) * cfg.page_size
                         + t % cfg.page_size for t in range(n)], jnp.int32)
    x = gm.embed(params, jnp.asarray(ids, jnp.int32))
    h, _ = gm.prefill_step(cfg, params, x, seq, caches, bt, seq, slots, max_q=16)
    got = np.asarray(gm.lm_head(params, h))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_qwen3_next_matches_transformers():
    """Hybrid anchor: converted Qwen3-Next (GDN with permuted in-proj columns,
    gated attention with q/k norms + partial rotary, MoE + gated shared
    expert) reproduces the upstream torch logits."""
    from transformers import Qwen3NextConfig as HfQn
    from transformers import Qwen3NextForCausalLM

    from sgl_kernel_npu_tpu.models import qwen3_next as qm
    from sgl_kernel_npu_tpu.utils.hf_loader import qwen3_next_from_hf

    hf_cfg = HfQn(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=4,
        layer_types=["linear_attention", "linear_attention",
                     "linear_attention", "full_attention"],
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.25,
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=32, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(13)
    model = Qwen3NextForCausalLM(hf_cfg).eval()
    ids = [1, 5, 9, 2, 33, 17, 4, 60, 21, 7, 40, 3]
    with torch.no_grad():
        want = model(torch.tensor([ids])).logits[0].float().numpy()

    cfg, params = qwen3_next_from_hf(model, page_size=4)
    assert cfg.attn_every == 4 and cfg.moe_experts == 4 and cfg.rotary_dim == 4
    n = len(ids)
    caches = qm.init_hybrid_cache(cfg, 16, 2)
    bt = jnp.arange(1, 1 + -(-n // cfg.page_size), dtype=jnp.int32)[None]
    seq = jnp.asarray([n], jnp.int32)
    slots = jnp.asarray([int(bt[0, t // cfg.page_size]) * cfg.page_size
                         + t % cfg.page_size for t in range(n)], jnp.int32)
    x = qm.hybrid_embed(params, jnp.asarray(ids, jnp.int32))
    h, _ = qm.hybrid_prefill_step(cfg, params, x, seq, caches, bt, seq, slots,
                                  jnp.asarray([0], jnp.int32), max_q=16)
    got = np.asarray(qm.hybrid_lm_head(params, h))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_qwen3_next_hf_weights_through_engine():
    """Converted Qwen3-Next serves through the engine (prefill + DECODE path,
    incl. partial-rotary decode tables); greedy continuation equals HF
    generate."""
    from transformers import Qwen3NextConfig as HfQn
    from transformers import Qwen3NextForCausalLM

    from sgl_kernel_npu_tpu.runtime.engine import Engine, qwen3_hybrid_adapter
    from sgl_kernel_npu_tpu.utils.hf_loader import qwen3_next_from_hf

    hf_cfg = HfQn(
        vocab_size=64, hidden_size=64, intermediate_size=96,
        num_hidden_layers=2, layer_types=["linear_attention", "full_attention"],
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        partial_rotary_factor=0.25,
        linear_num_key_heads=2, linear_num_value_heads=4,
        linear_key_head_dim=16, linear_value_head_dim=16,
        linear_conv_kernel_dim=4, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, shared_expert_intermediate_size=32,
        decoder_sparse_step=1, mlp_only_layers=[],
        max_position_embeddings=128, tie_word_embeddings=False)
    torch.manual_seed(17)
    model = Qwen3NextForCausalLM(hf_cfg).eval()
    prompt = [2, 11, 29, 7, 5]
    with torch.no_grad():
        want = model.generate(torch.tensor([prompt]), max_new_tokens=4,
                              do_sample=False, pad_token_id=0)[0, 5:].tolist()
    cfg, params = qwen3_next_from_hf(model, page_size=4)
    got = Engine(qwen3_hybrid_adapter(cfg, params), num_pages=64,
                 prefill_chunk=8).run([prompt], 4)[0]
    assert got == want


def test_llama_hf_weights_through_engine():
    """Converted weights serve through the engine; greedy continuation equals
    HF greedy generate."""
    from transformers import LlamaConfig, LlamaForCausalLM

    from sgl_kernel_npu_tpu.runtime.engine import Engine, llama_adapter
    from sgl_kernel_npu_tpu.utils.hf_loader import llama_from_hf

    hf_cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=True)
    torch.manual_seed(5)
    model = LlamaForCausalLM(hf_cfg).eval()
    prompt = [2, 11, 29, 7, 5]
    k = 6
    with torch.no_grad():
        hf_out = model.generate(
            torch.tensor([prompt]), max_new_tokens=k, do_sample=False,
            pad_token_id=0)
    want = hf_out[0, len(prompt):].tolist()

    cfg, params = llama_from_hf(model, page_size=4)
    got = Engine(llama_adapter(cfg, params), num_pages=64,
                 prefill_chunk=8).run([prompt], k)[0]
    assert got == want
