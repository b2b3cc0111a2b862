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
