"""GPT-OSS-style model: Pallas decode path vs jnp golden composition."""

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.models import gpt_oss as m


def test_decode_matches_ref(rng):
    cfg = m.GptOssConfig()
    params = m.init_weights(jax.random.key(0), cfg)
    b, max_pages = 4, 8
    num_pages = b * max_pages + 1
    caches = m.init_kv_cache(cfg, num_pages)

    # pre-fill the caches with some history so the window/sinks matter
    hist = 40
    bt = jnp.asarray(
        rng.permutation(num_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    for layer in range(cfg.num_layers):
        kc, vc = caches[layer]
        for t in range(hist):
            slots = bt[:, t // cfg.page_size] * cfg.page_size + t % cfg.page_size
            kv = jnp.asarray(
                rng.standard_normal((b, cfg.num_kv_heads, cfg.head_dim)) * .5,
                jnp.float32)
            vv = jnp.asarray(
                rng.standard_normal((b, cfg.num_kv_heads, cfg.head_dim)) * .5,
                jnp.float32)
            from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import reshape_and_cache
            kc = reshape_and_cache(kv, kc, slots)
            vc = reshape_and_cache(vv, vc, slots)
        caches[layer] = (kc, vc)

    x = jnp.asarray(rng.standard_normal((b, cfg.hidden)) * .5, jnp.float32)
    positions = jnp.full((b,), hist, jnp.int32)
    ctx = jnp.full((b,), hist + 1, jnp.int32)
    slots = bt[:, hist // cfg.page_size] * cfg.page_size + hist % cfg.page_size

    got, caches_g = m.decode_step(cfg, params, x, positions, caches, bt, ctx, slots)
    want, caches_w = m.decode_step_ref(cfg, params, x, positions, caches, bt, ctx, slots)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    for (kg, vg), (kw, vw) in zip(caches_g, caches_w):
        np.testing.assert_allclose(np.asarray(kg), np.asarray(kw), rtol=1e-4, atol=1e-5)


def test_prefill_pallas_matches_golden(rng):
    """Varlen prefill_step: Pallas kernel path vs the jnp composition."""
    cfg = m.GptOssConfig()
    params = m.init_weights(jax.random.key(2), cfg)
    bsz, max_pages = 3, 4
    num_pages = bsz * max_pages + 1
    caches = m.init_kv_cache(cfg, num_pages)
    bt = jnp.asarray(
        rng.permutation(num_pages - 1)[: bsz * max_pages].reshape(bsz, max_pages) + 1,
        jnp.int32)
    seq_lens = jnp.asarray([5, 17, 32], jnp.int32)   # fresh prefills: ctx == seq
    ctx = seq_lens
    s = int(seq_lens.sum())
    x = jnp.asarray(rng.standard_normal((s, cfg.hidden)) * 0.5, jnp.float32)
    # slot for token j of request b = page bt[b, j//page] * page + j%page
    slots = []
    for b in range(bsz):
        for j in range(int(seq_lens[b])):
            slots.append(int(bt[b, j // cfg.page_size]) * cfg.page_size + j % cfg.page_size)
    slots = jnp.asarray(slots, jnp.int32)

    got, cg = m.prefill_step(cfg, params, x, seq_lens, caches, bt, ctx, slots,
                             max_q=32, use_pallas=True)
    want, cw = m.prefill_step(cfg, params, x, seq_lens, caches, bt, ctx, slots,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)
    for (kg, _), (kw, _) in zip(cg, cw):
        np.testing.assert_allclose(np.asarray(kg), np.asarray(kw), rtol=1e-5, atol=1e-6)


def test_prefill_agrees_with_decode_chain(rng):
    """One prefill_step == token-by-token decode_step (same cache, same hiddens)."""
    cfg = m.GptOssConfig(num_layers=2)
    params = m.init_weights(jax.random.key(3), cfg)
    n, max_pages = 6, 2
    caches0 = m.init_kv_cache(cfg, max_pages + 1)
    bt = jnp.arange(1, 1 + max_pages, dtype=jnp.int32).reshape(1, max_pages)
    x = jnp.asarray(rng.standard_normal((n, cfg.hidden)) * 0.5, jnp.float32)

    pre, cache_pre = m.prefill_step(
        cfg, params, x, jnp.asarray([n], jnp.int32), caches0, bt,
        jnp.asarray([n], jnp.int32),
        bt[0, jnp.arange(n) // cfg.page_size] * cfg.page_size
        + jnp.arange(n) % cfg.page_size,
        max_q=8)

    caches = caches0
    outs = []
    for t in range(n):
        sl = bt[:, t // cfg.page_size] * cfg.page_size + t % cfg.page_size
        y, caches = m.decode_step(
            cfg, params, x[t][None], jnp.asarray([t], jnp.int32), caches, bt,
            jnp.asarray([t + 1], jnp.int32), sl)
        outs.append(y[0])
    np.testing.assert_allclose(
        np.asarray(pre), np.asarray(jnp.stack(outs)), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(cache_pre[0][0]), np.asarray(caches[0][0]), rtol=1e-5, atol=1e-6)


def test_packed_kv_matches_unpacked(rng):
    """packed_kv=True (two heads per 128-lane KV row) reproduces the unpacked
    model through a prefill + multi-step decode chain."""
    base = m.GptOssConfig(num_layers=2, num_kv_heads=2, head_dim=32)
    packed = dataclasses_replace(base, packed_kv=True)
    params = m.init_weights(jax.random.key(5), base)
    n, n_dec, max_pages = 6, 3, 2
    bt = jnp.arange(1, 1 + max_pages, dtype=jnp.int32).reshape(1, max_pages)
    x = jnp.asarray(rng.standard_normal((n + n_dec, base.hidden)) * 0.5, jnp.float32)
    slot = lambda t: bt[:, t // base.page_size] * base.page_size + t % base.page_size

    outs = {}
    for name, cfg in (("unpacked", base), ("packed", packed)):
        caches = m.init_kv_cache(cfg, max_pages + 1)
        pre, caches = m.prefill_step(
            cfg, params, x[:n], jnp.asarray([n], jnp.int32), caches, bt,
            jnp.asarray([n], jnp.int32),
            bt[0, jnp.arange(n) // cfg.page_size] * cfg.page_size
            + jnp.arange(n) % cfg.page_size,
            max_q=8)
        ys = [pre]
        for t in range(n, n + n_dec):
            y, caches = m.decode_step(
                cfg, params, x[t][None], jnp.asarray([t], jnp.int32), caches, bt,
                jnp.asarray([t + 1], jnp.int32), slot(t))
            ys.append(y)
        outs[name] = np.concatenate([np.asarray(a) for a in ys], axis=0)
    np.testing.assert_allclose(outs["packed"], outs["unpacked"], rtol=2e-4, atol=2e-4)


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_gpt_oss_ep_moe_matches_dense(mesh8, rng):
    """GPT-OSS MoE through Buffer.fused_oai_moe (bf16 ragged dispatch + biased
    grouped GEMMs + clamped SwiGLU) == the dense-einsum path within bf16-wire
    error; and the HF-converted model serves through the EP engine."""
    import torch
    from transformers import GptOssConfig as HfGo
    from transformers import GptOssForCausalLM

    from sgl_kernel_npu_tpu.config import EPConfig
    from sgl_kernel_npu_tpu.parallel.buffer import Buffer
    from sgl_kernel_npu_tpu.runtime.engine import Engine, gpt_oss_adapter
    from sgl_kernel_npu_tpu.utils.hf_loader import gpt_oss_from_hf

    torch.manual_seed(21)
    model = GptOssForCausalLM(HfGo(
        vocab_size=64, hidden_size=64, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=8, num_experts_per_tok=2,
        sliding_window=6, max_position_embeddings=128,
        tie_word_embeddings=False)).eval()
    cfg, params = gpt_oss_from_hf(model, page_size=4)
    prompt = [2, 11, 29, 7, 5]

    dense = Engine(gpt_oss_adapter(cfg, params), num_pages=64,
                   prefill_chunk=8).run([prompt], 4)[0]
    with torch.no_grad():
        want = model.generate(torch.tensor([prompt]), max_new_tokens=4,
                              do_sample=False, pad_token_id=0)[0, 5:].tolist()
    assert dense == want                       # upstream anchor

    buf = Buffer(mesh8, "ep", num_experts=cfg.num_experts,
                 config=EPConfig(num_max_dispatch_tokens_per_rank=2))
    ep = Engine(gpt_oss_adapter(cfg, params, ep_buffer=buf), num_pages=64,
                prefill_chunk=8).run([prompt], 4)[0]
    assert ep == want                          # EP == dense == HF greedy


def test_two_steps_progress(rng):
    """Two chained decode steps stay finite and the caches advance."""
    cfg = m.GptOssConfig(num_layers=2)
    params = m.init_weights(jax.random.key(1), cfg)
    b, max_pages = 2, 4
    caches = m.init_kv_cache(cfg, b * max_pages + 1)
    bt = jnp.arange(1, 1 + b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    x = jnp.ones((b, cfg.hidden), jnp.float32)
    step = jax.jit(lambda x, c, pos, ctx, sl: m.decode_step(
        cfg, params, x, pos, c, bt, ctx, sl))
    pos = jnp.zeros((b,), jnp.int32)
    ctx = jnp.ones((b,), jnp.int32)
    sl = bt[:, 0] * cfg.page_size
    y1, c1 = step(x, caches, pos, ctx, sl)
    y2, c2 = step(y1, c1, pos + 1, ctx + 1, sl + 1)
    assert np.isfinite(np.asarray(y2)).all()
    assert not np.array_equal(np.asarray(c1[0][0]), np.asarray(caches[0][0]))
