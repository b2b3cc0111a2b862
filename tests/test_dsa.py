"""DeepSeek-V3.2 sparse attention (DSA): lightning indexer + sparse MLA decode.

The reference ships the indexer kernel only (csrc/lightning_indexer); the
sparse-attention consumer lives in its SGLang host.  Here the full path is
rebuilt: index-key cache → indexer top-k → sparse decode attention, wired into
models/deepseek_v3 via ``DeepSeekV3Config(sparse_count=...)``.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.models import deepseek_v3 as m
from sgl_kernel_npu_tpu.ops.attention.decode_attention import (
    decode_mla,
    decode_mla_ref,
    decode_mla_sparse,
)


def _paged_setup(rng, b, seq, page, max_pages, lat, rope):
    n_pages = b * max_pages + 1
    kn = jnp.asarray(rng.standard_normal((n_pages, 1, page, lat)) * 0.5, jnp.float32)
    kr = jnp.asarray(rng.standard_normal((n_pages, 1, rope, page)) * 0.5, jnp.float32)
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    sl = jnp.full((b,), seq, jnp.int32)
    return kn, kr, bt, sl


def test_sparse_equals_dense_when_full(rng):
    """decode_mla_sparse over ALL positions == dense decode_mla."""
    b, seq, page, max_pages, lat, rope, hq = 3, 48, 16, 4, 64, 32, 4
    kn, kr, bt, sl = _paged_setup(rng, b, seq, page, max_pages, lat, rope)
    q = jnp.asarray(rng.standard_normal((b, hq, lat + rope)) * 0.5, jnp.float32)
    idx = jnp.tile(jnp.arange(max_pages * page, dtype=jnp.int32)[None], (b, 1))
    got = decode_mla_sparse(q, kn, kr, sl, 0.1, bt, idx)
    want = decode_mla_ref(q, kn, kr, sl, 0.1, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_sparse_restricts_to_selected(rng):
    """With a subset selection the output is the masked-softmax over exactly
    those positions (golden computed by hand)."""
    b, seq, page, max_pages, lat, rope, hq = 2, 40, 16, 4, 64, 32, 4
    kn, kr, bt, sl = _paged_setup(rng, b, seq, page, max_pages, lat, rope)
    q = jnp.asarray(rng.standard_normal((b, hq, lat + rope)) * 0.5, jnp.float32)
    k = 8
    sel = jnp.asarray(
        np.stack([rng.choice(seq, k, replace=False) for _ in range(b)]), jnp.int32)
    got = np.asarray(decode_mla_sparse(q, kn, kr, sl, 0.1, bt, sel))
    # golden: gather + softmax in numpy
    knn, krn, btn = np.asarray(kn), np.asarray(kr), np.asarray(bt)
    for i in range(b):
        ks = np.stack([knn[btn[i, p // page], 0, p % page] for p in np.asarray(sel[i])])
        rs = np.stack([krn[btn[i, p // page], 0, :, p % page] for p in np.asarray(sel[i])])
        qk = (np.asarray(q[i, :, :lat]) @ ks.T + np.asarray(q[i, :, lat:]) @ rs.T) * 0.1
        p_ = np.exp(qk - qk.max(-1, keepdims=True))
        p_ /= p_.sum(-1, keepdims=True)
        np.testing.assert_allclose(got[i], p_ @ ks, atol=2e-4)


import pytest


@pytest.mark.parametrize("gran", ["page", "token"])
@pytest.mark.slow
def test_model_sparse_full_count_equals_dense(rng, gran):
    """DeepSeek decode_step with sparse_count ≥ seq reproduces the dense model
    (indexer selects everything; softmax is order-invariant) — both the exact
    token-top-k path and the TPU page-top-k path."""
    dense_cfg = m.DeepSeekV3Config(num_layers=1, page_size=16, vocab_size=61)
    sparse_cfg = dataclasses.replace(dense_cfg, sparse_count=32,
                                     sparse_granularity=gran)
    params = m.init_weights(jax.random.key(2), dense_cfg, jnp.float32)
    b, max_pages = 4, 2
    hidden = jnp.asarray(rng.standard_normal((b, dense_cfg.hidden)) * 0.3, jnp.float32)
    bt = jnp.arange(1, 1 + b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    pos = jnp.full((b,), 7, jnp.int32)
    sl = jnp.full((b,), 8, jnp.int32)
    slots = bt[:, 0] * dense_cfg.page_size + 7

    outs = {}
    hist = jnp.asarray(rng.standard_normal((b * 7, dense_cfg.hidden)) * 0.3,
                       jnp.float32)
    for name, cfg in (("dense", dense_cfg), ("sparse", sparse_cfg)):
        caches = m.init_kv_cache(cfg, b * max_pages + 1, jnp.float32)
        _, caches = m.prefill_step(
            cfg, params, hist,
            jnp.full((b,), 7, jnp.int32), caches, bt, jnp.full((b,), 7, jnp.int32),
            jnp.asarray([int(bt[i, 0]) * cfg.page_size + t
                         for i in range(b) for t in range(7)], jnp.int32),
            max_q=8)
        out, _ = m.decode_step(cfg, params, hidden, pos, caches, bt, sl, slots)
        outs[name] = np.asarray(out)
    np.testing.assert_allclose(outs["sparse"], outs["dense"], rtol=2e-4, atol=2e-4)


def test_model_sparse_small_count_runs_and_differs(rng):
    """A tight sparse budget must change the attention result (it truly
    restricts) while staying finite."""
    cfg = m.DeepSeekV3Config(num_layers=1, page_size=16, vocab_size=61,
                             sparse_count=4, sparse_granularity="token")
    dense = dataclasses.replace(cfg, sparse_count=0)
    params = m.init_weights(jax.random.key(2), cfg, jnp.float32)
    b, max_pages = 2, 2
    bt = jnp.arange(1, 1 + b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    hidden = jnp.asarray(rng.standard_normal((b, cfg.hidden)) * 0.3, jnp.float32)
    outs = {}
    hist = jnp.asarray(rng.standard_normal((b * 12, cfg.hidden)) * 0.3, jnp.float32)
    for name, c in (("sparse", cfg), ("dense", dense)):
        caches = m.init_kv_cache(c, b * max_pages + 1, jnp.float32)
        _, caches = m.prefill_step(
            c, params, hist, jnp.full((b,), 12, jnp.int32), caches, bt,
            jnp.full((b,), 12, jnp.int32),
            jnp.asarray([int(bt[i, t // c.page_size]) * c.page_size + t % c.page_size
                         for i in range(b) for t in range(12)], jnp.int32),
            max_q=16)
        out, _ = m.decode_step(
            c, params, hidden, jnp.full((b,), 12, jnp.int32), caches, bt,
            jnp.full((b,), 13, jnp.int32), bt[:, 0] * c.page_size + 12)
        outs[name] = np.asarray(out)
    assert np.isfinite(outs["sparse"]).all()
    assert np.abs(outs["sparse"] - outs["dense"]).max() > 1e-5


def test_block_sparse_full_pages_equals_dense(rng):
    """decode_mla_block_sparse selecting every page == dense decode."""
    from sgl_kernel_npu_tpu.ops.attention.decode_attention import (
        decode_mla_block_sparse)

    b, seq, page, max_pages, lat, rope, hq = 3, 43, 16, 4, 64, 32, 4
    kn, kr, bt, _ = _paged_setup(rng, b, seq, page, max_pages, lat, rope)
    sl = jnp.asarray([43, 17, 64], jnp.int32)      # incl. a partial last page
    q = jnp.asarray(rng.standard_normal((b, hq, lat + rope)) * 0.5, jnp.float32)
    scores = jnp.asarray(rng.standard_normal((b, max_pages * page)), jnp.float32)
    got = decode_mla_block_sparse(q, kn, kr, sl, 0.1, bt, scores, max_pages)
    want = decode_mla_ref(q, kn, kr, sl, 0.1, bt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_block_sparse_restricts_to_top_pages(rng):
    """With 2 of 4 pages selected, output == dense attention over a block
    table containing only those pages."""
    from sgl_kernel_npu_tpu.ops.attention.decode_attention import (
        decode_mla_block_sparse)

    b, seq, page, max_pages, lat, rope, hq = 2, 64, 16, 4, 64, 32, 4
    kn, kr, bt, sl = _paged_setup(rng, b, seq, page, max_pages, lat, rope)
    q = jnp.asarray(rng.standard_normal((b, hq, lat + rope)) * 0.5, jnp.float32)
    # score page 1 high; last page (3) is always kept
    scores = jnp.tile(
        jnp.repeat(jnp.asarray([0.0, 5.0, 0.0, 1.0]), page)[None], (b, 1))
    got = decode_mla_block_sparse(q, kn, kr, sl, 0.1, bt, scores, 2)
    bt_sel = bt[:, jnp.asarray([1, 3])]
    want = decode_mla_ref(q, kn, kr, jnp.full((b,), 2 * page, jnp.int32),
                          0.1, bt_sel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_block_sparse_prefill_full_pages_equals_dense(rng):
    """mla_prefill_block_sparse over ALL causal pages == mla_prefill_pallas."""
    from sgl_kernel_npu_tpu.ops.attention.mla_prefill import (
        mla_prefill_block_sparse,
        mla_prefill_pallas,
    )

    bsz, s_req, page, max_pages, lat, rope, h = 2, 32, 16, 2, 64, 32, 4
    s = bsz * s_req
    kn, kr, bt, _ = _paged_setup(rng, bsz, s_req, page, max_pages, lat, rope)
    sl = jnp.full((bsz,), s_req, jnp.int32)
    cl = jnp.full((bsz,), s_req, jnp.int32)
    q = jnp.asarray(rng.standard_normal((s, h, lat + rope)) * 0.5, jnp.float32)
    pos_sel = jnp.tile(jnp.arange(max_pages, dtype=jnp.int32)[None, None],
                       (bsz, 1, 1))                      # QC=1 at q_chunk=32
    got = mla_prefill_block_sparse(
        q, kn, kr, sl, bt, cl, 0.1, pos_sel, max_q=s_req, q_chunk=32)
    want = mla_prefill_pallas(
        q, kn, kr, sl, bt, cl, 0.1, max_q=s_req, q_chunk=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_model_sparse_prefill_restricts(rng):
    """Page-granular DSA PREFILL: a tight page budget changes the prefill
    output (truly restricts) and stays finite; the indexer-selected diagonal
    page keeps local attention alive."""
    cfg = m.DeepSeekV3Config(num_layers=1, page_size=16, vocab_size=61,
                             sparse_count=16, sparse_granularity="page")
    dense = dataclasses.replace(cfg, sparse_count=0)
    params = m.init_weights(jax.random.key(2), cfg, jnp.float32)
    b, max_pages = 2, 3
    bt = jnp.arange(1, 1 + b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    hist = jnp.asarray(rng.standard_normal((b * 44, cfg.hidden)) * 0.3, jnp.float32)
    outs = {}
    for name, c in (("sparse", cfg), ("dense", dense)):
        caches = m.init_kv_cache(c, b * max_pages + 1, jnp.float32)
        out, _ = m.prefill_step(
            c, params, hist, jnp.full((b,), 44, jnp.int32), caches, bt,
            jnp.full((b,), 44, jnp.int32),
            jnp.asarray([int(bt[i, t // c.page_size]) * c.page_size + t % c.page_size
                         for i in range(b) for t in range(44)], jnp.int32),
            max_q=48)
        outs[name] = np.asarray(out)
    assert np.isfinite(outs["sparse"]).all()
    assert np.abs(outs["sparse"] - outs["dense"]).max() > 1e-5


def test_block_sparse_prefill_tolerates_dead_page_selection(rng):
    """Selected pages beyond a request's causal range must not perturb the
    result: garbage accumulated while m = -1e30 is annihilated by the first
    real page (the flash -1e30 convention), in either processing order."""
    from sgl_kernel_npu_tpu.ops.attention.mla_prefill import (
        mla_prefill_block_sparse,
        mla_prefill_pallas,
    )

    bsz, page, max_pages, lat, rope, h = 2, 16, 4, 64, 32, 4
    kn, kr, bt, _ = _paged_setup(rng, bsz, page * max_pages, page, max_pages, lat, rope)
    sl = jnp.asarray([8, 8], jnp.int32)          # fresh tokens
    cl = jnp.asarray([17, 60], jnp.int32)        # ctx: 2 pages / 4 pages live
    s = int(sl.sum())
    q = jnp.asarray(rng.standard_normal((s, h, lat + rope)) * 0.5, jnp.float32)
    # select ALL pool pages, dead-before-live order for request 0
    pos = jnp.asarray([[[3, 2, 1, 0]], [[0, 1, 2, 3]]], jnp.int32)
    got = mla_prefill_block_sparse(
        q, kn, kr, sl, bt, cl, 0.1, pos, max_q=8, q_chunk=8)
    want = mla_prefill_pallas(q, kn, kr, sl, bt, cl, 0.1, max_q=8, q_chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
