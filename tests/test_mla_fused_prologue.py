"""DeepSeek model running the fused W8A8 mla_preprocess prologue end-to-end.

``decode_step(mla_wq=...)`` / ``prefill_step(mla_wq=...)`` replace the unfused
float MLA prologue (_mla_qkv + cache writes) with ONE fused op — the way the
reference consumes mla_preprocess (csrc/mla_preprocess/op_host/mla_preprocess.cpp:623);
``make_mla_preprocess_weights`` is the calibrated float→W8A8 conversion.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.models import deepseek_v3 as m


def _run(cfg, params, rng, **kw):
    b, max_pages = 3, 2
    hist = jnp.asarray(rng.standard_normal((b * 6, cfg.hidden)) * 0.3, jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((b, cfg.hidden)) * 0.3, jnp.float32)
    bt = jnp.arange(1, 1 + b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    slots_p = jnp.asarray([int(bt[i, 0]) * cfg.page_size + t
                           for i in range(b) for t in range(6)], jnp.int32)
    caches = m.init_kv_cache(cfg, b * max_pages + 1, jnp.float32)
    pre, caches = m.prefill_step(
        cfg, params, hist, jnp.full((b,), 6, jnp.int32), caches, bt,
        jnp.full((b,), 6, jnp.int32), slots_p, max_q=8, **kw)
    dec, caches = m.decode_step(
        cfg, params, hidden, jnp.full((b,), 6, jnp.int32), caches, bt,
        jnp.full((b,), 7, jnp.int32), bt[:, 0] * cfg.page_size + 6, **kw)
    return np.asarray(pre), np.asarray(dec), caches


@pytest.mark.parametrize("kv_dtype", ["bf16", "int8"])
def test_model_fused_prologue_matches_float(rng, kv_dtype):
    """prefill→decode through the fused prologue tracks the float prologue
    within W8A8 quant error (both latent-cache modes)."""
    cfg = m.DeepSeekV3Config(num_layers=2, page_size=16, vocab_size=61,
                             kv_cache_dtype=kv_dtype)
    params = m.init_weights(jax.random.key(21), cfg, jnp.float32)
    sample = jnp.asarray(np.random.default_rng(9).standard_normal(
        (16, cfg.hidden)) * 0.3, jnp.float32)
    mla_wq = m.make_mla_preprocess_weights(cfg, params, sample)

    pre_f, dec_f, _ = _run(cfg, params, np.random.default_rng(7))
    pre_q, dec_q, caches = _run(cfg, params, np.random.default_rng(7),
                                mla_wq=mla_wq)
    if kv_dtype == "int8":
        assert caches[0]["nope"].dtype == jnp.int8
    for got, want in ((pre_q, pre_f), (dec_q, dec_f)):
        scale = np.abs(want).max()
        # W8A8 prologue + (int8) latent cache; bound relative to magnitude.
        # A quant-induced MoE top-k flip moves single rows — bound per token.
        diff_row = np.abs(got - want).max(axis=-1)
        n_close = int((diff_row < 0.10 * scale + 0.05).sum())
        assert n_close >= diff_row.shape[0] - 1, diff_row
        assert diff_row.max() < 0.8 * scale, (diff_row.max(), scale)
        assert diff_row.max() > 0


@pytest.mark.slow
def test_fully_quantized_layer(rng):
    """The whole-layer W8A8 stack: fused prologue (mla_wq) + grouped MoE
    (moe_weights_q) + dense-side W8A8 (dense_wq: wo + shared expert) tracks
    the float model within the combined quant budget."""
    cfg = m.DeepSeekV3Config(num_layers=2, page_size=16, vocab_size=61)
    params = m.init_weights(jax.random.key(25), cfg, jnp.float32)
    sample = jnp.asarray(np.random.default_rng(14).standard_normal(
        (16, cfg.hidden)) * 0.3, jnp.float32)
    kw = dict(
        mla_wq=m.make_mla_preprocess_weights(cfg, params, sample),
        moe_weights_q=m.quantize_moe_weights(cfg, params),
        dense_wq=m.quantize_dense_weights(cfg, params),
    )
    pre_f, dec_f, _ = _run(cfg, params, np.random.default_rng(15))
    pre_q, dec_q, _ = _run(cfg, params, np.random.default_rng(15), **kw)
    for got, want in ((pre_q, pre_f), (dec_q, dec_f)):
        scale = np.abs(want).max()
        diff_row = np.abs(got - want).max(axis=-1)
        n_close = int((diff_row < 0.12 * scale + 0.06).sum())
        assert n_close >= diff_row.shape[0] - 1, diff_row   # ≤1 routing flip
        assert diff_row.max() < 0.9 * scale
        assert diff_row.max() > 0


def test_fused_prologue_dsa(rng):
    """The fused prologue composes with the DSA sparse branch (h1 recomputed
    for the indexer taps)."""
    cfg = m.DeepSeekV3Config(num_layers=1, page_size=16, vocab_size=61,
                             sparse_count=32)
    params = m.init_weights(jax.random.key(22), cfg, jnp.float32)
    sample = jnp.asarray(np.random.default_rng(10).standard_normal(
        (16, cfg.hidden)) * 0.3, jnp.float32)
    mla_wq = m.make_mla_preprocess_weights(cfg, params, sample)
    pre_f, dec_f, _ = _run(cfg, params, np.random.default_rng(8))
    pre_q, dec_q, _ = _run(cfg, params, np.random.default_rng(8), mla_wq=mla_wq)
    for got, want in ((pre_q, pre_f), (dec_q, dec_f)):
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 0.10 * scale + 0.05
        assert np.abs(got - want).max() > 0
