"""W8A8 dense-model serving (int8 weights × per-token int8 activations).

The reference's core inference recipe — W8A8 GEMMs with per-channel weight
scales and per-token dynamic activation quant (mla_preprocess mm1/mm2,
fused_deep_moe GMM1/GMM2, swiglu_quant re-quantization between them) —
applied to the dense Llama / GPT-OSS stacks via models/w8a8.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.models import gpt_oss as gm
from sgl_kernel_npu_tpu.models import llama as lm
from sgl_kernel_npu_tpu.models.w8a8 import project, qmm, quantize_matrix


def test_quantize_matrix_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((96, 192)) * 0.1, jnp.float32)
    wq, sw = quantize_matrix(w)
    assert wq.shape == (192, 96) and wq.dtype == jnp.int8
    back = wq.astype(jnp.float32).T * sw[None, :]
    np.testing.assert_allclose(np.asarray(back), np.asarray(w),
                               atol=float(sw.max()) / 2 + 1e-7)


def test_project_matches_float(rng):
    """W8A8 project == x @ w within combined (activation+weight) quant error."""
    x = jnp.asarray(rng.standard_normal((17, 96)) * 0.5, jnp.float32)
    w = jnp.asarray(rng.standard_normal((96, 256)) * 0.1, jnp.float32)
    got = project(x, quantize_matrix(w))
    want = x @ w
    err = np.abs(np.asarray(got) - np.asarray(want))
    ref = np.abs(np.asarray(want)).max()
    assert err.max() < 0.02 * ref + 0.02, (err.max(), ref)


def _run_llama(cfg, params, rng, **kw):
    bsz, mp, n = 2, 2, 7
    num_pages = bsz * mp + 1
    caches = lm.init_kv_cache(cfg, num_pages)
    bt = jnp.arange(1, num_pages, dtype=jnp.int32).reshape(bsz, mp)
    seq = jnp.full((bsz,), n, jnp.int32)
    slots = jnp.asarray([int(bt[b, 0]) * cfg.page_size + t
                         for b in range(bsz) for t in range(n)], jnp.int32)
    x = jnp.asarray(rng.standard_normal((bsz * n, cfg.hidden)) * 0.3, jnp.float32)
    pre, caches = lm.prefill_step(cfg, params, x, seq, caches, bt, seq, slots,
                                  max_q=8, **kw)
    xd = jnp.asarray(rng.standard_normal((bsz, cfg.hidden)) * 0.3, jnp.float32)
    dec, _ = lm.decode_step(cfg, params, xd, jnp.full((bsz,), n, jnp.int32),
                            caches, bt, jnp.full((bsz,), n + 1, jnp.int32),
                            bt[:, 0] * cfg.page_size + n, **kw)
    return np.asarray(pre), np.asarray(dec)


def test_llama_w8a8_matches_float(rng):
    """Full prefill+decode with quantized weights tracks the float run.
    Random 0.02-scale weights give tiny activations; bound relative to the
    float output magnitude."""
    cfg = lm.LlamaConfig(num_layers=2)
    params = lm.init_weights(jax.random.key(11), cfg, jnp.float32)
    wq = lm.quantize_weights(cfg, params)
    pre_f, dec_f = _run_llama(cfg, params, np.random.default_rng(4))
    pre_q, dec_q = _run_llama(cfg, params, np.random.default_rng(4), weights_q=wq)
    for got, want in ((pre_q, pre_f), (dec_q, dec_f)):
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 0.05 * scale + 0.05
        assert np.abs(got - want).max() > 0  # not silently the float path


def test_llama_w8a8_composes_with_int8_kv(rng):
    """W8A8 weights + int8 KV cache together (the full low-precision serving
    stack) still track the float run."""
    import dataclasses
    cfg = lm.LlamaConfig(num_layers=1, kv_cache_dtype="int8", kv_scale=1 / 64)
    params = lm.init_weights(jax.random.key(12), cfg, jnp.float32)
    wq = lm.quantize_weights(cfg, params)
    cfg_f = dataclasses.replace(cfg, kv_cache_dtype="bf16")
    pre_f, dec_f = _run_llama(cfg_f, params, np.random.default_rng(5))
    pre_q, dec_q = _run_llama(cfg, params, np.random.default_rng(5), weights_q=wq)
    for got, want in ((pre_q, pre_f), (dec_q, dec_f)):
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 0.08 * scale + 0.08


def _run_gpt_oss(cfg, params, rng, **kw):
    bsz, mp, n = 2, 2, 6
    num_pages = bsz * mp + 1
    caches = gm.init_kv_cache(cfg, num_pages)
    bt = jnp.arange(1, num_pages, dtype=jnp.int32).reshape(bsz, mp)
    seq = jnp.full((bsz,), n, jnp.int32)
    slots = jnp.asarray([int(bt[b, 0]) * cfg.page_size + t
                         for b in range(bsz) for t in range(n)], jnp.int32)
    x = jnp.asarray(rng.standard_normal((bsz * n, cfg.hidden)) * 0.3, jnp.float32)
    pre, caches = gm.prefill_step(cfg, params, x, seq, caches, bt, seq, slots,
                                  max_q=8, **kw)
    xd = jnp.asarray(rng.standard_normal((bsz, cfg.hidden)) * 0.3, jnp.float32)
    dec, _ = gm.decode_step(cfg, params, xd, jnp.full((bsz,), n, jnp.int32),
                            caches, bt, jnp.full((bsz,), n + 1, jnp.int32),
                            bt[:, 0] * cfg.page_size + n, **kw)
    return np.asarray(pre), np.asarray(dec)


def test_gpt_oss_w8a8_matches_float(rng):
    cfg = gm.GptOssConfig(num_layers=2, sliding_window=32)
    params = gm.init_weights(jax.random.key(13), cfg, jnp.float32)
    wq = gm.quantize_weights(cfg, params)
    pre_f, dec_f = _run_gpt_oss(cfg, params, np.random.default_rng(6))
    pre_q, dec_q = _run_gpt_oss(cfg, params, np.random.default_rng(6), weights_q=wq)
    for got, want in ((pre_q, pre_f), (dec_q, dec_f)):
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 0.05 * scale + 0.05
        assert np.abs(got - want).max() > 0


def test_qwen3_hybrid_w8a8_matches_float(rng):
    """W8A8 through the hybrid stack: GDN in/out projections + MLPs and the
    attention layers' projections quantize; the recurrence itself stays float."""
    from sgl_kernel_npu_tpu.models import qwen3_next as qm

    cfg = qm.Qwen3NextHybridConfig(vocab_size=61, num_layers=2, page_size=4,
                                   attn_every=2)
    params = qm.init_hybrid_weights(jax.random.key(15), cfg, jnp.float32)
    wq = qm.quantize_hybrid_weights(cfg, params)

    n = 6
    rng2 = np.random.default_rng(7)
    x = jnp.asarray(rng2.standard_normal((n, cfg.hidden)) * 0.3, jnp.float32)
    bt = jnp.arange(1, 9, dtype=jnp.int32).reshape(1, 8)
    slots = jnp.asarray([int(bt[0, t // cfg.page_size]) * cfg.page_size
                         + t % cfg.page_size for t in range(n)], jnp.int32)
    seq = jnp.asarray([n], jnp.int32)
    sidx = jnp.asarray([0], jnp.int32)

    xd = jnp.asarray(rng2.standard_normal((1, cfg.hidden)) * 0.3, jnp.float32)
    outs = {}
    for name, kw in (("f", {}), ("q", {"weights_q": wq})):
        caches = qm.init_hybrid_cache(cfg, 32, 2)
        pre, caches = qm.hybrid_prefill_step(
            cfg, params, x, seq, caches, bt, seq, slots, sidx, max_q=8, **kw)
        dec, _ = qm.hybrid_decode_step(
            cfg, params, xd, jnp.asarray([n], jnp.int32), caches, bt,
            jnp.asarray([n + 1], jnp.int32),
            jnp.asarray([int(bt[0, n // cfg.page_size]) * cfg.page_size
                         + n % cfg.page_size], jnp.int32), sidx, **kw)
        outs[name] = (np.asarray(pre), np.asarray(dec))
    for got, want in zip(outs["q"], outs["f"]):
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 0.06 * scale + 0.06
        assert np.abs(got - want).max() > 0


@pytest.mark.slow
def test_qwen3_hybrid_ep_moe_matches_dense(mesh8, rng):
    """Hybrid MoE through Buffer.fused_deep_moe (W8A8 experts, int8 wire) ≈
    the dense routed experts — served end-to-end through the engine."""
    from sgl_kernel_npu_tpu.config import EPConfig
    from sgl_kernel_npu_tpu.models import qwen3_next as qm
    from sgl_kernel_npu_tpu.parallel.buffer import Buffer
    from sgl_kernel_npu_tpu.runtime.engine import Engine, qwen3_hybrid_adapter

    cfg = qm.Qwen3NextHybridConfig(
        vocab_size=61, num_layers=2, page_size=4, attn_every=2,
        moe_experts=8, moe_topk=2, moe_intermediate=64,
        shared_expert_intermediate=64, hidden=128)
    params = qm.init_hybrid_weights(jax.random.key(33), cfg, jnp.float32)
    prompt = [2, 11, 29, 7, 5]
    dense = Engine(qwen3_hybrid_adapter(cfg, params), num_pages=64,
                   prefill_chunk=8).run([prompt], 4)[0]
    buf = Buffer(mesh8, "ep", num_experts=cfg.moe_experts,
                 config=EPConfig(num_max_dispatch_tokens_per_rank=2))
    moe_q = qm.quantize_hybrid_moe_weights(cfg, params, tn=128)
    ep = Engine(qwen3_hybrid_adapter(cfg, params, moe_weights_q=moe_q,
                                     ep_buffer=buf), num_pages=64,
                prefill_chunk=8).run([prompt], 4)[0]
    assert ep == dense


def test_engine_serves_w8a8(rng):
    """The serving engine runs end-to-end on the quantized adapter and emits
    the same greedy tokens as the float engine on an easy (deterministic
    low-temperature-free) decode."""
    from sgl_kernel_npu_tpu.runtime.engine import Engine, llama_adapter

    cfg = lm.LlamaConfig(num_layers=1, vocab_size=61)
    params = lm.init_weights(jax.random.key(14), cfg, jnp.float32)
    wq = lm.quantize_weights(cfg, params)
    prompts = [[1, 5, 9, 2], [7, 3]]
    out_f = Engine(llama_adapter(cfg, params), num_pages=64).run(
        prompts, max_new_tokens=4)
    out_q = Engine(llama_adapter(cfg, params, weights_q=wq), num_pages=64).run(
        prompts, max_new_tokens=4)
    assert [len(o) for o in out_q] == [len(o) for o in out_f]
    # greedy winners on random weights are usually robust to 1% perturbation;
    # require at least the first generated token of each request to agree
    for f, q in zip(out_f, out_q):
        assert f[0] == q[0]
