"""Dense GQA (Llama-class) model: Pallas paths vs golden; prefill/decode agreement."""

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.models import llama as m


def _slots(bt, seq_lens, page):
    out = []
    for b in range(len(seq_lens)):
        for j in range(int(seq_lens[b])):
            out.append(int(bt[b, j // page]) * page + j % page)
    return jnp.asarray(out, jnp.int32)


def test_prefill_pallas_matches_golden(rng):
    cfg = m.LlamaConfig()
    params = m.init_weights(jax.random.key(0), cfg)
    bsz, max_pages = 3, 4
    num_pages = bsz * max_pages + 1
    caches = m.init_kv_cache(cfg, num_pages)
    bt = jnp.asarray(
        rng.permutation(num_pages - 1)[: bsz * max_pages].reshape(bsz, max_pages) + 1,
        jnp.int32)
    seq_lens = jnp.asarray([7, 32, 19], jnp.int32)
    s = int(seq_lens.sum())
    x = jnp.asarray(rng.standard_normal((s, cfg.hidden)) * 0.5, jnp.float32)
    slots = _slots(bt, seq_lens, cfg.page_size)

    got, cg = m.prefill_step(cfg, params, x, seq_lens, caches, bt, seq_lens, slots,
                             max_q=32, use_pallas=True)
    want, cw = m.prefill_step(cfg, params, x, seq_lens, caches, bt, seq_lens, slots,
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)
    for (kg, _), (kw, _) in zip(cg, cw):
        np.testing.assert_allclose(np.asarray(kg), np.asarray(kw), rtol=1e-5, atol=1e-6)


def test_prefill_agrees_with_decode_chain(rng):
    """One prefill_step == token-by-token decode_step on a fresh request."""
    cfg = m.LlamaConfig(num_layers=2)
    params = m.init_weights(jax.random.key(1), cfg)
    n, max_pages = 6, 2
    caches0 = m.init_kv_cache(cfg, max_pages + 1)
    bt = jnp.arange(1, 1 + max_pages, dtype=jnp.int32).reshape(1, max_pages)
    x = jnp.asarray(rng.standard_normal((n, cfg.hidden)) * 0.5, jnp.float32)
    seq = jnp.asarray([n], jnp.int32)
    slots = _slots(bt, seq, cfg.page_size)

    pre, cache_pre = m.prefill_step(cfg, params, x, seq, caches0, bt, seq, slots,
                                    max_q=8)
    caches = caches0
    outs = []
    for t in range(n):
        y, caches = m.decode_step(
            cfg, params, x[t][None], jnp.asarray([t], jnp.int32), caches, bt,
            jnp.asarray([t + 1], jnp.int32), slots[t][None])
        outs.append(y[0])
    np.testing.assert_allclose(
        np.asarray(pre), np.asarray(jnp.stack(outs)), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(
        np.asarray(cache_pre[0][0]), np.asarray(caches[0][0]), rtol=1e-5, atol=1e-6)


def test_chunked_prefill_matches_single_shot(rng):
    """Prefilling 8 then 8 more tokens == prefilling all 16 at once."""
    cfg = m.LlamaConfig(num_layers=1)
    params = m.init_weights(jax.random.key(2), cfg)
    n, max_pages = 16, 2
    caches0 = m.init_kv_cache(cfg, max_pages + 1)
    bt = jnp.arange(1, 1 + max_pages, dtype=jnp.int32).reshape(1, max_pages)
    x = jnp.asarray(rng.standard_normal((n, cfg.hidden)) * 0.5, jnp.float32)
    all_slots = _slots(bt, jnp.asarray([n]), cfg.page_size)

    full, cache_full = m.prefill_step(
        cfg, params, x, jnp.asarray([n], jnp.int32), caches0, bt,
        jnp.asarray([n], jnp.int32), all_slots, max_q=16)

    h1, cache1 = m.prefill_step(
        cfg, params, x[:8], jnp.asarray([8], jnp.int32), caches0, bt,
        jnp.asarray([8], jnp.int32), all_slots[:8], max_q=8)
    h2, cache2 = m.prefill_step(
        cfg, params, x[8:], jnp.asarray([8], jnp.int32), cache1, bt,
        jnp.asarray([16], jnp.int32), all_slots[8:], max_q=8)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(full)[8:],
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(cache2[0][0]), np.asarray(cache_full[0][0]),
                               rtol=1e-5, atol=1e-6)
