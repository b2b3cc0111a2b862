"""Int8 latent KV cache end-to-end (the reference's int8_nzcache mode,
mla_preprocess.cpp:610-616): prefill writes round(k/ctkv_scale) int8 pages,
decode/prefill attention consume them at half the KV HBM traffic.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    # perturbs activations ~1%.  A ~1% attention perturbation can legitimately
    # flip a borderline MoE top-k winner for a token (the router sits
    # downstream of attention), which moves that token's whole output row —
    # so bound per token: most tokens tight, a flipped minority loosely.
    diff_row = np.abs(out_i8 - out_bf).max(axis=-1)
    n_close = int((diff_row < 0.15).sum())
    assert n_close >= diff_row.shape[0] - 1, diff_row
    assert diff_row.max() < 0.6, diff_row.max()
    # and it is not a silent bf16 path: the int8 run must differ somewhere
    assert diff_row.max() > 0


def test_mla_preprocess_int8_to_decode_chain(rng):
    """The bench_layer --int8kv path: mla_preprocess(int8_nzcache) writes the
    quantized cache and per-head-quantized q; dequantizing q and feeding
    decode_mla(k_scale=ctkv_scale) matches the bf16 chain within quant error."""
    from sgl_kernel_npu_tpu.ops.attention import decode_attention as da
    from sgl_kernel_npu_tpu.ops.attention import mla_preprocess as mp

    heads, hid, lat, rope, page = 4, 128, 512, 64, 16
    b, max_pages = 3, 2
    n_pages = b * max_pages + 1
    kf = lambda *s, sc=0.05: jnp.asarray(rng.standard_normal(s) * sc, jnp.float32)
    ki = lambda *s: jnp.asarray(rng.integers(-16, 16, s), jnp.int8)
    base = dict(
        gamma1=kf(hid) + 1, beta1=kf(hid), qscale1=jnp.float32(0.02),
        qoffset1=jnp.float32(0), wdqkv=ki(lat + rope + 192, hid),
        descale1=kf(lat + rope + 192, sc=0.002),
        bias1=jnp.zeros((lat + rope + 192,), jnp.int32),
        gamma2=kf(192) + 1, beta2=kf(192), qscale2=jnp.float32(0.02),
        qoffset2=jnp.float32(0), wuq=ki(heads * 192, 192),
        descale2=kf(heads * 192, sc=0.002),
        bias2=jnp.zeros((heads * 192,), jnp.int32),
        gamma3=kf(lat) + 1, wuk=kf(heads, 128, lat, sc=0.1),
        qnope_scale=jnp.full((heads,), 400.0, jnp.float32),
        ctkv_scale=jnp.float32(0.01),
    )
    w = mp.MlaPreprocessWeights(**base)
    hidden = kf(b, hid, sc=0.3)
    posn = jnp.arange(b, dtype=jnp.int32) + 3
    cos_sin = __import__(
        "sgl_kernel_npu_tpu.ops.rope", fromlist=["rope_cos_sin"]
    ).rope_cos_sin(posn, rope)
    bt = jnp.arange(1, 1 + b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    slots = bt[:, 0] * page + 3
    sl = jnp.full((b,), 4, jnp.int32)
    # random test weights give |q|~16σ, |k|~3σ: the physical 1/√d scale would
    # saturate the softmax and int8 noise would flip one-hot winners — use a
    # scale that keeps logits O(1) so closeness is meaningful
    sm = 5e-4
    hist = kf(b * 3, hid, sc=0.3)

    outs = {}
    for name in ("bf16", "int8"):
        if name == "int8":
            # calibrate from the bf16 run (kvn_bf / qn_bf captured below)
            base["ctkv_scale"] = jnp.float32(
                float(np.abs(kvn_bf).max()) / 127.0)
            base["qnope_scale"] = jnp.asarray(
                126.0 / np.abs(qn_bf).max(axis=(0, 2)), jnp.float32)
            w = mp.MlaPreprocessWeights(**base)
        nd = jnp.int8 if name == "int8" else jnp.float32
        kvn = jnp.zeros((n_pages, 1, page, lat), nd)
        kvr = jnp.zeros((n_pages, 1, rope, page), jnp.float32)
        # pre-fill slots 0..2 of each request with history
        cm = "int8_nzcache" if name == "int8" else "krope_ctkv"
        hslots = jnp.asarray([int(bt[i, 0]) * page + t
                              for i in range(b) for t in range(3)], jnp.int32)
        hcs = __import__(
            "sgl_kernel_npu_tpu.ops.rope", fromlist=["rope_cos_sin"]
        ).rope_cos_sin(jnp.tile(jnp.arange(3, dtype=jnp.int32), b), rope)
        _, _, kvn, kvr = mp.mla_preprocess(hist, w, hcs, kvn, kvr, hslots,
                                           cache_mode=cm)
        qn, qp, kvn, kvr = mp.mla_preprocess(hidden, w, cos_sin, kvn, kvr, slots,
                                             cache_mode=cm)
        if name == "int8":
            qn = qn.astype(jnp.float32) / w.qnope_scale[None, :, None]
            ksc = w.ctkv_scale
        else:
            kvn_bf, qn_bf = np.asarray(kvn), np.asarray(qn)
            ksc = None
        q = jnp.concatenate([qn.astype(jnp.float32), qp.astype(jnp.float32)], -1)
        outs[name] = np.asarray(
            da.decode_mla(q, kvn, kvr, sl, sm, bt, k_scale=ksc), np.float32)
    np.testing.assert_allclose(outs["int8"], outs["bf16"], rtol=0.1, atol=0.1)


def _run_gqa_model(mod, cfg, params, rng, max_q=16, **kw):
    """Shared prefill→decode driver for the dense-GQA model families
    (llama / gpt_oss share the step signatures)."""
    bsz, max_pages, n = 2, 2, 7
    num_pages = bsz * max_pages + 1
    caches = mod.init_kv_cache(cfg, num_pages)
    bt = jnp.arange(1, num_pages, dtype=jnp.int32).reshape(bsz, max_pages)
    seq_lens = jnp.full((bsz,), n, jnp.int32)
    slots = jnp.asarray([int(bt[b, 0]) * cfg.page_size + t
                         for b in range(bsz) for t in range(n)], jnp.int32)
    x = jnp.asarray(rng.standard_normal((bsz * n, cfg.hidden)) * 0.3, jnp.float32)
    _, caches = mod.prefill_step(cfg, params, x, seq_lens, caches, bt,
                                 seq_lens, slots, max_q=max_q, **kw)
    xd = jnp.asarray(rng.standard_normal((bsz, cfg.hidden)) * 0.3, jnp.float32)
    out, caches = mod.decode_step(
        cfg, params, xd, jnp.full((bsz,), n, jnp.int32), caches, bt,
        jnp.full((bsz,), n + 1, jnp.int32), bt[:, 0] * cfg.page_size + n, **kw)
    return np.asarray(out), caches


def test_llama_int8_kv_cache_matches_bf16(rng):
    """Dense-GQA family: int8 paged cache through prefill+decode stays within
    quant error of the full-precision run (reference int8 kvcache mode)."""
    from sgl_kernel_npu_tpu.models import llama as lm

    cfg = lm.LlamaConfig(num_layers=2, vocab_size=67)
    cfg_i8 = dataclasses.replace(cfg, kv_cache_dtype="int8", kv_scale=1 / 64)
    params = lm.init_weights(jax.random.key(7), cfg, jnp.float32)
    out_bf, _ = _run_gqa_model(lm, cfg, params, np.random.default_rng(2))
    out_i8, caches = _run_gqa_model(lm, cfg_i8, params, np.random.default_rng(2))
    assert caches[0][0].dtype == jnp.int8
    np.testing.assert_allclose(out_i8, out_bf, rtol=0.08, atol=0.08)
    assert np.abs(out_i8 - out_bf).max() > 0


def test_gpt_oss_int8_kv_cache_matches_bf16(rng):
    """Sinks family: int8 cache composes with sinks + sliding window, and with
    the packed (two-heads-per-lane) layout — quarter decode KV traffic at d=64."""
    from sgl_kernel_npu_tpu.models import gpt_oss as gm

    cfg = gm.GptOssConfig(num_layers=2, head_dim=64, num_kv_heads=2,
                          num_heads=8, sliding_window=32)
    params = gm.init_weights(jax.random.key(9), cfg, jnp.float32)
    out_bf, _ = _run_gqa_model(gm, cfg, params, np.random.default_rng(3))
    for packed in (False, True):
        cfg_i8 = dataclasses.replace(cfg, kv_cache_dtype="int8",
                                     kv_scale=1 / 64, packed_kv=packed)
        out_i8, caches = _run_gqa_model(gm, cfg_i8, params,
                                        np.random.default_rng(3))
        assert caches[0][0].dtype == jnp.int8
        np.testing.assert_allclose(out_i8, out_bf, rtol=0.08, atol=0.08)
        assert np.abs(out_i8 - out_bf).max() > 0


@pytest.mark.slow
def test_calibrated_kv_scales(rng):
    """Per-kv-head calibrated scales (w8a8.calibrate_kv_scales off a float
    run's cache) beat the static scalar when head magnitudes differ, and work
    through both families incl. the packed GPT-OSS layout."""
    from sgl_kernel_npu_tpu.models import gpt_oss as gm
    from sgl_kernel_npu_tpu.models import llama as lm
    from sgl_kernel_npu_tpu.models.w8a8 import calibrate_kv_scales

    # Llama with artificially skewed per-head K magnitudes: scale head 1's wk
    # rows up 8x so a single static scale must either clip or waste levels
    cfg = lm.LlamaConfig(num_layers=1, num_kv_heads=2, head_dim=32)
    params = lm.init_weights(jax.random.key(31), cfg, jnp.float32)
    d = cfg.head_dim
    wk = params["layers"][0]["wk"]
    params["layers"][0]["wk"] = wk.at[:, d:].multiply(8.0)

    out_f, caches_f = _run_gqa_model(lm, cfg, params, np.random.default_rng(11))
    scales = calibrate_kv_scales(caches_f)
    cfg_i8 = dataclasses.replace(cfg, kv_cache_dtype="int8", kv_scale=1 / 64)
    out_cal, _ = _run_gqa_model(lm, cfg_i8, params, np.random.default_rng(11),
                                kv_scales=scales)
    out_static, _ = _run_gqa_model(lm, cfg_i8, params, np.random.default_rng(11))
    err_cal = np.abs(out_cal - out_f).max()
    err_static = np.abs(out_static - out_f).max()
    assert err_cal < err_static, (err_cal, err_static)   # calibration helps
    assert err_cal < 0.05, err_cal

    # GPT-OSS packed: calibrate on the unpacked float layout, serve packed
    gcfg = gm.GptOssConfig(num_layers=1, head_dim=64, num_kv_heads=2,
                           num_heads=8)
    gparams = gm.init_weights(jax.random.key(32), gcfg, jnp.float32)
    out_gf, gcaches_f = _run_gqa_model(gm, gcfg, gparams,
                                       np.random.default_rng(12))
    gscales = calibrate_kv_scales(gcaches_f)
    gcfg_i8 = dataclasses.replace(gcfg, kv_cache_dtype="int8", packed_kv=True)
    out_gq, gc = _run_gqa_model(gm, gcfg_i8, gparams, np.random.default_rng(12),
                                kv_scales=gscales)
    assert gc[0][0].dtype == jnp.int8
    np.testing.assert_allclose(out_gq, out_gf, rtol=0.05, atol=0.05)


def test_model_int8_kv_cache_dsa(rng):
    """Int8 latent cache composes with the DSA sparse branch (page top-k)."""
    cfg = m.DeepSeekV3Config(num_layers=1, page_size=16, vocab_size=61,
                             sparse_count=32)
    cfg_i8 = dataclasses.replace(cfg, kv_cache_dtype="int8")
    params = m.init_weights(jax.random.key(5), cfg, jnp.float32)
    out_bf, _ = _run_model(cfg, params, np.random.default_rng(1))
    out_i8, _ = _run_model(cfg_i8, params, np.random.default_rng(1))
    np.testing.assert_allclose(out_i8, out_bf, rtol=0.08, atol=0.08)
