import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops.attention import sinks_attention as sa


def _setup(rng, s, hq, hkv, d, dv, page, max_pages):
    n_pages = s * max_pages
    q = jnp.asarray(rng.standard_normal((s, hq * d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((n_pages, hkv, page, dv)) * 0.5, jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32)
    bt = jnp.asarray(rng.permutation(n_pages).reshape(s, max_pages), jnp.int32)
    return q, k, v, sinks, bt


@pytest.mark.parametrize("window", [0, 24])
def test_attention_sinks_decode(rng, window):
    s, hq, hkv, d, dv, page, max_pages = 3, 8, 2, 64, 64, 16, 4
    q, k, v, sinks, bt = _setup(rng, s, hq, hkv, d, dv, page, max_pages)
    ctx = jnp.asarray([5, 33, 64], jnp.int32)
    scale = 1 / np.sqrt(d)
    got = sa.attention_sinks(q, k, v, sinks, bt, ctx, scale, window, hq, hkv)
    want = sa.attention_sinks_ref(q, k, v, sinks, bt, ctx, scale, window, hq, hkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("window", [0, 24])
def test_attention_sinks_packed_decode(rng, window):
    """Packed two-heads-per-row kernel == unpacked kernel == golden."""
    s, hq, hkv, d, dv, page, max_pages = 3, 8, 2, 64, 64, 16, 4
    q, k, v, sinks, bt = _setup(rng, s, hq, hkv, d, dv, page, max_pages)
    ctx = jnp.asarray([5, 33, 64], jnp.int32)
    scale = 1 / np.sqrt(d)
    got = sa.attention_sinks_packed(
        q, sa.pack_kv_sinks(k), sa.pack_kv_sinks(v), sinks, bt, ctx, scale,
        window, hq, hkv)
    want = sa.attention_sinks_ref(q, k, v, sinks, bt, ctx, scale, window, hq, hkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("window", [0, 24])
@pytest.mark.parametrize("use_sinks", [True, False])
def test_attention_sinks_prefill_packed(rng, window, use_sinks):
    """Packed prefill wrapper (virtual-GQA reuse of the kernel) == golden."""
    hq, hkv, d, dv, page, max_pages = 8, 4, 32, 32, 16, 4
    bsz = 3
    n_pages = bsz * max_pages
    k = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((n_pages, hkv, page, dv)) * 0.5, jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32) if use_sinks else None
    bt = jnp.asarray(rng.permutation(n_pages).reshape(bsz, max_pages), jnp.int32)
    ctx = jnp.asarray([40, 25, 64], jnp.int32)
    seq_lens = jnp.asarray([3, 25, 10], jnp.int32)
    s = int(seq_lens.sum())
    q = jnp.asarray(rng.standard_normal((s, hq * d)) * 0.5, jnp.float32)
    scale = 1 / np.sqrt(d)
    got = sa.attention_sinks_prefill_packed(
        q, sa.pack_kv_sinks(k), sa.pack_kv_sinks(v), sinks, seq_lens, bt, ctx,
        scale, window, hq, hkv, max_q=32)
    golden_sinks = sinks if sinks is not None else jnp.full((hq,), -1e30)
    want = sa.attention_sinks_prefill(
        q, k, v, golden_sinks, seq_lens, bt, ctx, scale, window, hq, hkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_pack_kv_roundtrip(rng):
    """pack_kv_sinks interleaves head pairs into lanes losslessly."""
    k = jnp.asarray(rng.standard_normal((5, 4, 16, 64)), jnp.float32)
    p = sa.pack_kv_sinks(k)
    assert p.shape == (5, 2, 16, 128)
    np.testing.assert_array_equal(np.asarray(p[:, 0, :, :64]), np.asarray(k[:, 0]))
    np.testing.assert_array_equal(np.asarray(p[:, 0, :, 64:]), np.asarray(k[:, 1]))
    np.testing.assert_array_equal(np.asarray(p[:, 1, :, :64]), np.asarray(k[:, 2]))
    np.testing.assert_array_equal(np.asarray(p[:, 1, :, 64:]), np.asarray(k[:, 3]))


def test_sink_matters(rng):
    """Large sink logit must shrink outputs (it eats softmax mass)."""
    s, hq, hkv, d, dv, page, max_pages = 2, 4, 1, 32, 32, 16, 2
    q, k, v, _, bt = _setup(rng, s, hq, hkv, d, dv, page, max_pages)
    ctx = jnp.asarray([20, 30], jnp.int32)
    small = sa.attention_sinks(q, k, v, jnp.full((hq,), -30.0), bt, ctx, 0.125, 0, hq, hkv)
    big = sa.attention_sinks(q, k, v, jnp.full((hq,), 30.0), bt, ctx, 0.125, 0, hq, hkv)
    assert np.abs(np.asarray(big)).max() < 1e-3
    assert np.abs(np.asarray(small)).max() > 1e-2


@pytest.mark.parametrize("window", [0, 24])
def test_attention_sinks_prefill_pallas(rng, window):
    """Pallas varlen prefill kernel vs the jnp golden."""
    hq, hkv, d, dv, page, max_pages = 4, 2, 32, 32, 16, 4
    bsz = 3
    n_pages = bsz * max_pages
    k = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((n_pages, hkv, page, dv)) * 0.5, jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32)
    bt = jnp.asarray(rng.permutation(n_pages).reshape(bsz, max_pages), jnp.int32)
    ctx = jnp.asarray([40, 25, 64], jnp.int32)
    seq_lens = jnp.asarray([3, 25, 10], jnp.int32)  # req 1 is a full prefill
    s = int(seq_lens.sum())
    q = jnp.asarray(rng.standard_normal((s, hq * d)) * 0.5, jnp.float32)
    scale = 1 / np.sqrt(d)
    want = sa.attention_sinks_prefill(
        q, k, v, sinks, seq_lens, bt, ctx, scale, window, hq, hkv)
    got = sa.attention_sinks_prefill_pallas(
        q, k, v, sinks, seq_lens, bt, ctx, scale, window, hq, hkv,
        max_q=32, q_chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_attention_sinks_prefill_matches_decode_lastrow(rng):
    """The last query token of each prefill request must equal the decode result."""
    hq, hkv, d, dv, page, max_pages = 4, 2, 32, 32, 16, 4
    bsz = 2
    n_pages = bsz * max_pages
    k = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((n_pages, hkv, page, dv)) * 0.5, jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32)
    bt = jnp.asarray(rng.permutation(n_pages).reshape(bsz, max_pages), jnp.int32)
    ctx = jnp.asarray([40, 25], jnp.int32)
    seq_lens = jnp.asarray([3, 5], jnp.int32)
    s = int(seq_lens.sum())
    q = jnp.asarray(rng.standard_normal((s, hq * d)) * 0.5, jnp.float32)
    scale = 1 / np.sqrt(d)
    out = sa.attention_sinks_prefill(q, k, v, sinks, seq_lens, bt, ctx, scale, 0, hq, hkv)
    # last row of each request == decode with same context
    last_rows = np.asarray(out)[[2, 7]]
    dec = sa.attention_sinks_ref(q[jnp.asarray([2, 7])], k, v, sinks, bt, ctx, scale, 0, hq, hkv)
    np.testing.assert_allclose(last_rows, np.asarray(dec), rtol=1e-4, atol=1e-4)


def _quant8(x, scale):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)


def _head_scales(k, v):
    ks = jnp.abs(k.astype(jnp.float32)).max(axis=(0, 2, 3)) / 127.0
    vs = jnp.abs(v.astype(jnp.float32)).max(axis=(0, 2, 3)) / 127.0
    return ks, vs


@pytest.mark.parametrize("window", [0, 24])
@pytest.mark.parametrize("packed", [False, True])
def test_attention_sinks_decode_int8(rng, window, packed):
    """Int8 K/V (per-kv-head scales) through both decode kernels: matches the
    int8-aware golden tightly and the f32 truth within quant error."""
    s, hq, hkv, d, dv, page, max_pages = 3, 8, 2, 64, 64, 16, 4
    q, k, v, sinks, bt = _setup(rng, s, hq, hkv, d, dv, page, max_pages)
    ctx = jnp.asarray([5, 33, 64], jnp.int32)
    scale = 1 / np.sqrt(d)
    ks, vs = _head_scales(k, v)
    kq = _quant8(k, ks[None, :, None, None])
    vq = _quant8(v, vs[None, :, None, None])
    if packed:
        got = sa.attention_sinks_packed(
            q, sa.pack_kv_sinks(kq), sa.pack_kv_sinks(vq), sinks, bt, ctx,
            scale, window, hq, hkv, k_scale=ks, v_scale=vs)
    else:
        got = sa.attention_sinks(q, kq, vq, sinks, bt, ctx, scale, window,
                                 hq, hkv, k_scale=ks, v_scale=vs)
    want_q = sa.attention_sinks_ref(q, kq, vq, sinks, bt, ctx, scale, window,
                                    hq, hkv, k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_q),
                               rtol=2e-2, atol=2e-2)
    want_f = sa.attention_sinks_ref(q, k, v, sinks, bt, ctx, scale, window, hq, hkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_f),
                               rtol=8e-2, atol=8e-2)


@pytest.mark.parametrize("packed", [False, True])
def test_attention_sinks_prefill_int8(rng, packed):
    """Int8 K/V through the varlen prefill kernel (and its packed wrapper)."""
    hq, hkv, d, dv, page, max_pages, window = 8, 4, 32, 32, 16, 4, 24
    bsz = 3
    n_pages = bsz * max_pages
    k = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((n_pages, hkv, page, dv)) * 0.5, jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32)
    bt = jnp.asarray(rng.permutation(n_pages).reshape(bsz, max_pages), jnp.int32)
    ctx = jnp.asarray([40, 25, 64], jnp.int32)
    seq_lens = jnp.asarray([3, 25, 10], jnp.int32)
    s = int(seq_lens.sum())
    q = jnp.asarray(rng.standard_normal((s, hq * d)) * 0.5, jnp.float32)
    scale = 1 / np.sqrt(d)
    ks, vs = _head_scales(k, v)
    kq = _quant8(k, ks[None, :, None, None])
    vq = _quant8(v, vs[None, :, None, None])
    if packed:
        got = sa.attention_sinks_prefill_packed(
            q, sa.pack_kv_sinks(kq), sa.pack_kv_sinks(vq), sinks, seq_lens, bt,
            ctx, scale, window, hq, hkv, k_scale=ks, v_scale=vs, max_q=32)
    else:
        got = sa.attention_sinks_prefill_pallas(
            q, kq, vq, sinks, seq_lens, bt, ctx, scale, window, hq, hkv,
            k_scale=ks, v_scale=vs, max_q=32)
    want_q = sa.attention_sinks_prefill(
        q, kq, vq, sinks, seq_lens, bt, ctx, scale, window, hq, hkv,
        k_scale=ks, v_scale=vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_q),
                               rtol=2e-2, atol=2e-2)
    want_f = sa.attention_sinks_prefill(
        q, k, v, sinks, seq_lens, bt, ctx, scale, window, hq, hkv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want_f),
                               rtol=8e-2, atol=8e-2)
