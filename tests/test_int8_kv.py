"""Int8 latent KV cache end-to-end (the reference's int8_nzcache mode,
mla_preprocess.cpp:610-616): prefill writes round(k/ctkv_scale) int8 pages,
decode/prefill attention consume them at half the KV HBM traffic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.models import deepseek_v3 as m


def _run_model(cfg, params, rng):
    b, max_pages = 4, 2
    hist = jnp.asarray(rng.standard_normal((b * 7, cfg.hidden)) * 0.3, jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((b, cfg.hidden)) * 0.3, jnp.float32)
    bt = jnp.arange(1, 1 + b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    slots_p = jnp.asarray([int(bt[i, 0]) * cfg.page_size + t
                           for i in range(b) for t in range(7)], jnp.int32)
    caches = m.init_kv_cache(cfg, b * max_pages + 1, jnp.float32)
    _, caches = m.prefill_step(
        cfg, params, hist, jnp.full((b,), 7, jnp.int32), caches, bt,
        jnp.full((b,), 7, jnp.int32), slots_p, max_q=8)
    out, caches = m.decode_step(
        cfg, params, hidden, jnp.full((b,), 7, jnp.int32), caches, bt,
        jnp.full((b,), 8, jnp.int32), bt[:, 0] * cfg.page_size + 7)
    return np.asarray(out), caches


def test_model_int8_kv_cache_matches_bf16(rng):
    """Full prefill→decode with the int8 latent cache stays within
    quantization error of the full-precision cache run."""
    cfg = m.DeepSeekV3Config(num_layers=2, page_size=16, vocab_size=61)
    cfg_i8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    params = m.init_weights(jax.random.key(3), cfg, jnp.float32)

    # same inputs: _run_model draws from its generator deterministically
    out_bf, _ = _run_model(cfg, params, np.random.default_rng(0))
    out_i8, caches = _run_model(cfg_i8, params, np.random.default_rng(0))

    assert caches[0]["nope"].dtype == jnp.int8
    assert caches[0]["rope"].dtype == jnp.float32
    # ctkv quantization (step = ctkv_scale = 1/32 on O(1) rms-normed latents)
    # perturbs activations ~1%; the layer outputs stay close
    np.testing.assert_allclose(out_i8, out_bf, rtol=0.08, atol=0.08)
    # and it is not a silent bf16 path: the int8 run must differ somewhere
    assert np.abs(out_i8 - out_bf).max() > 0


def test_model_int8_kv_cache_dsa(rng):
    """Int8 latent cache composes with the DSA sparse branch (page top-k)."""
    cfg = m.DeepSeekV3Config(num_layers=1, page_size=16, vocab_size=61,
                             sparse_count=32)
    cfg_i8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    params = m.init_weights(jax.random.key(5), cfg, jnp.float32)
    out_bf, _ = _run_model(cfg, params, np.random.default_rng(1))
    out_i8, _ = _run_model(cfg_i8, params, np.random.default_rng(1))
    np.testing.assert_allclose(out_i8, out_bf, rtol=0.08, atol=0.08)
