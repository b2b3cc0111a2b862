"""Qwen3-Next hybrid stack (GDN + attention layers) + engine serving."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.models import qwen3_next as m


@pytest.fixture(scope="module")
def setup():
    cfg = m.Qwen3NextHybridConfig(vocab_size=61, num_layers=2, page_size=4,
                                  chunk_size=8)
    with jax.default_matmul_precision("float32"):
        params = m.init_hybrid_weights(jax.random.key(9), cfg)
    return cfg, params


def _slots(bt, n, page):
    return jnp.asarray([int(bt[0, i // page]) * page + i % page for i in range(n)],
                       jnp.int32)


def test_hybrid_prefill_matches_decode_chain(setup):
    """One prefill == token-by-token decode (GDN state + paged KV both agree)."""
    cfg, params = setup
    rng = np.random.default_rng(0)
    n, max_pages = 10, 4
    bt = jnp.arange(1, 1 + max_pages, dtype=jnp.int32).reshape(1, max_pages)
    x = jnp.asarray(rng.standard_normal((n, cfg.hidden)) * 0.5, jnp.float32)
    si = jnp.asarray([0], jnp.int32)

    with jax.default_matmul_precision("float32"):
        caches = m.init_hybrid_cache(cfg, 32, 2)
        pre, cache_pre = m.hybrid_prefill_step(
            cfg, params, x, jnp.asarray([n], jnp.int32), caches, bt,
            jnp.asarray([n], jnp.int32), _slots(bt, n, cfg.page_size), si,
            max_q=16)

        caches = m.init_hybrid_cache(cfg, 32, 2)
        outs = []
        for t in range(n):
            sl = _slots(bt, t + 1, cfg.page_size)[t:]
            y, caches = m.hybrid_decode_step(
                cfg, params, x[t][None], jnp.asarray([t], jnp.int32), caches, bt,
                jnp.asarray([t + 1], jnp.int32), sl, si)
            outs.append(np.asarray(y[0]))
    np.testing.assert_allclose(
        np.asarray(pre), np.stack(outs), rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_hybrid_chunked_prefill_resumes_state(setup):
    """Prefill 6 then 10 tokens == prefill all 16 (conv + ssm state resume)."""
    cfg, params = setup
    rng = np.random.default_rng(1)
    n, max_pages = 16, 4
    bt = jnp.arange(1, 1 + max_pages, dtype=jnp.int32).reshape(1, max_pages)
    x = jnp.asarray(rng.standard_normal((n, cfg.hidden)) * 0.5, jnp.float32)
    si = jnp.asarray([0], jnp.int32)
    all_slots = _slots(bt, n, cfg.page_size)

    with jax.default_matmul_precision("float32"):
        c0 = m.init_hybrid_cache(cfg, 32, 2)
        full, cache_full = m.hybrid_prefill_step(
            cfg, params, x, jnp.asarray([n], jnp.int32), c0, bt,
            jnp.asarray([n], jnp.int32), all_slots, si, max_q=16)

        c0 = m.init_hybrid_cache(cfg, 32, 2)
        # first chunk of 6, padded to 8 (pads must not disturb state)
        x1 = jnp.concatenate([x[:6], jnp.ones((2, cfg.hidden))], 0)
        sl1 = jnp.concatenate([all_slots[:6], jnp.full((2,), -1, jnp.int32)])
        h1, c1 = m.hybrid_prefill_step(
            cfg, params, x1, jnp.asarray([6], jnp.int32), c0, bt,
            jnp.asarray([6], jnp.int32), sl1, si, max_q=8)
        h2, c2 = m.hybrid_prefill_step(
            cfg, params, x[6:], jnp.asarray([10], jnp.int32), c1, bt,
            jnp.asarray([16], jnp.int32), all_slots[6:], si, max_q=16)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(full)[6:],
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(h1)[:6], np.asarray(full)[:6],
                               rtol=2e-3, atol=2e-3)
    # ssm + conv pools must agree with the single-shot run
    for cf, cc in zip(cache_full, c2):
        for k in cf:
            np.testing.assert_allclose(np.asarray(cf[k]), np.asarray(cc[k]),
                                       rtol=2e-3, atol=2e-3)


def test_hybrid_engine_serving(setup):
    """Engine with the hybrid adapter == direct prefill+decode chain."""
    from sgl_kernel_npu_tpu.runtime.engine import Engine, qwen3_hybrid_adapter

    cfg, params = setup
    prompt = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    n_new = 4
    with jax.default_matmul_precision("float32"):
        eng = Engine(qwen3_hybrid_adapter(cfg, params), num_pages=64,
                     max_batch=2, max_pages_per_req=16, prefill_chunk=8)
        got = eng.run([prompt], n_new)[0]

        caches = m.init_hybrid_cache(cfg, 32, 2)
        bt = jnp.arange(1, 17, dtype=jnp.int32).reshape(1, 16)
        si = jnp.asarray([0], jnp.int32)
        n = len(prompt)
        h, caches = m.hybrid_prefill_step(
            cfg, params, m.hybrid_embed(params, jnp.asarray(prompt, jnp.int32)),
            jnp.asarray([n], jnp.int32), caches, bt, jnp.asarray([n], jnp.int32),
            _slots(bt, n, cfg.page_size), si, max_q=16)
        want = [int(jnp.argmax(m.hybrid_lm_head(params, h[n - 1])))]
        page = cfg.page_size
        for _ in range(n_new - 1):
            i = n + len(want) - 1
            sl = jnp.asarray([int(bt[0, i // page]) * page + i % page], jnp.int32)
            y, caches = m.hybrid_decode_step(
                cfg, params, m.hybrid_embed(params, jnp.asarray([want[-1]], jnp.int32)),
                jnp.asarray([i], jnp.int32), caches, bt,
                jnp.asarray([i + 1], jnp.int32), sl, si)
            want.append(int(jnp.argmax(m.hybrid_lm_head(params, y[0]))))
    assert got == want


def test_hybrid_engine_spec_decode(setup):
    """Speculative decoding with a HYBRID target (GDN state rollback via
    snapshot + catch-up replay) must emit exactly the plain-engine tokens,
    with any draft."""
    from sgl_kernel_npu_tpu.models import llama as lm
    from sgl_kernel_npu_tpu.runtime.engine import (
        Engine, llama_adapter, qwen3_hybrid_adapter)

    cfg, params = setup
    dcfg = lm.LlamaConfig(vocab_size=61, num_layers=1, page_size=cfg.page_size)
    dparams = lm.init_weights(jax.random.key(3), dcfg)
    prompt = [5, 9, 2, 33, 17, 4, 8, 21]
    n_new = 6
    with jax.default_matmul_precision("float32"):
        plain = Engine(qwen3_hybrid_adapter(cfg, params), num_pages=64,
                       max_batch=2, max_pages_per_req=16, prefill_chunk=8)
        want = plain.run([prompt], n_new)[0]
        eng = Engine(qwen3_hybrid_adapter(cfg, params), num_pages=64,
                     max_batch=2, max_pages_per_req=16, prefill_chunk=8,
                     spec_k=2, draft_adapter=llama_adapter(dcfg, dparams))
        got = eng.run([prompt], n_new)[0]
    assert got == want
    assert eng.stats["spec_rounds"] > 0
