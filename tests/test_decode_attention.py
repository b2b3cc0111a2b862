import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops.attention import decode_attention as da


def _mk_paged(rng, n_pages, page, hkv, d, dtype=jnp.bfloat16):
    # TPU-first paged layout: [pages, kv_heads, page_size, head_dim]
    return jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) * 0.5, dtype)


@pytest.mark.parametrize("hq,d_nope,d_rope", [(16, 128, 64), (8, 512, 64)])
def test_decode_mla(rng, hq, d_nope, d_rope):
    b, page, max_pages = 3, 32, 4
    n_pages = b * max_pages + 1
    q = jnp.asarray(rng.standard_normal((b, hq, d_nope + d_rope)) * 0.5, jnp.bfloat16)
    kn = _mk_paged(rng, n_pages, page, 1, d_nope)
    # transposed rope cache layout [pages, 1, rope, page]
    kr = jnp.asarray(rng.standard_normal((n_pages, 1, d_rope, page)) * 0.5, jnp.bfloat16)
    block_table = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1, jnp.int32
    )
    seq_lens = jnp.asarray([1, 40, 128], jnp.int32)
    sm_scale = 1.0 / np.sqrt(d_nope + d_rope)
    got = da.decode_mla(q, kn, kr, seq_lens, sm_scale, block_table)
    want = da.decode_mla_ref(q, kn, kr, seq_lens, sm_scale, block_table)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("hq,hkv,dk,dv", [(8, 2, 128, 128), (16, 16, 64, 64), (4, 1, 576, 512)])
def test_decode_gqa(rng, hq, hkv, dk, dv):
    b, page, max_pages = 2, 16, 5
    n_pages = b * max_pages
    q = jnp.asarray(rng.standard_normal((b, hq, dk)) * 0.5, jnp.bfloat16)
    k = _mk_paged(rng, n_pages, page, hkv, dk)
    v = _mk_paged(rng, n_pages, page, hkv, dv)
    block_table = jnp.asarray(rng.permutation(n_pages).reshape(b, max_pages), jnp.int32)
    seq_lens = jnp.asarray([7, 77], jnp.int32)
    sm_scale = 1.0 / np.sqrt(dk)
    got = da.decode_gqa(q, k, v, seq_lens, sm_scale, block_table)
    want = da.decode_gqa_ref(q, k, v, seq_lens, sm_scale, block_table)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("hq,hkv,dk,dv", [(8, 2, 128, 128), (16, 16, 128, 128)])
def test_decode_gqa_high_performance(rng, hq, hkv, dk, dv):
    b, page, max_pages = 2, 16, 5
    n_pages = b * max_pages
    q = jnp.asarray(rng.standard_normal((b, hq, dk)) * 0.5, jnp.bfloat16)
    k = _mk_paged(rng, n_pages, page, hkv, dk)
    v = _mk_paged(rng, n_pages, page, hkv, dv)
    block_table = jnp.asarray(rng.permutation(n_pages).reshape(b, max_pages), jnp.int32)
    seq_lens = jnp.asarray([9, 61], jnp.int32)
    sm_scale = 1.0 / np.sqrt(dk)
    got = da.decode_gqa_high_performance(q, k, v, seq_lens, sm_scale, block_table)
    want = da.decode_gqa_ref(q, k, v, seq_lens, sm_scale, block_table)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=3e-2, rtol=3e-2
    )


def _quant_int8(x, scale):
    """round(x / scale) int8 levels (the int8_nzcache convention)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)


def test_decode_mla_int8_kv(rng):
    """Int8 latent KV cache (mla_preprocess int8_nzcache consumer): the Pallas
    kernel matches the int8-aware golden tightly, and stays within quantization
    error of the bf16 truth."""
    b, hq, d_nope, d_rope, page, max_pages = 3, 16, 512, 64, 128, 2
    n_pages = b * max_pages + 1
    q = jnp.asarray(rng.standard_normal((b, hq, d_nope + d_rope)) * 0.5, jnp.bfloat16)
    kn = _mk_paged(rng, n_pages, page, 1, d_nope)
    kr = jnp.asarray(rng.standard_normal((n_pages, 1, d_rope, page)) * 0.5, jnp.bfloat16)
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1, jnp.int32)
    seq_lens = jnp.asarray([1, 130, 256], jnp.int32)
    sm_scale = 1.0 / np.sqrt(d_nope + d_rope)
    k_scale = jnp.float32(float(jnp.abs(kn.astype(jnp.float32)).max()) / 127.0)
    kn_q = _quant_int8(kn, k_scale)

    got = da.decode_mla(q, kn_q, kr, seq_lens, sm_scale, bt, k_scale=k_scale)
    want_q = da.decode_mla_ref(q, kn_q, kr, seq_lens, sm_scale, bt, k_scale=k_scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want_q, np.float32), atol=3e-2, rtol=3e-2)
    # quantization error vs the bf16 truth stays bounded
    want_bf = da.decode_mla_ref(q, kn, kr, seq_lens, sm_scale, bt)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want_bf, np.float32), atol=8e-2, rtol=8e-2)


@pytest.mark.parametrize("which", ["flat", "paged"])
def test_decode_gqa_int8_kv(rng, which):
    """Int8 K/V paged cache with per-kv-head scales, both GQA kernels."""
    b, hq, hkv, dk, dv, page, max_pages = 2, 8, 2, 128, 128, 16, 5
    n_pages = b * max_pages
    q = jnp.asarray(rng.standard_normal((b, hq, dk)) * 0.5, jnp.bfloat16)
    k = _mk_paged(rng, n_pages, page, hkv, dk)
    v = _mk_paged(rng, n_pages, page, hkv, dv)
    bt = jnp.asarray(rng.permutation(n_pages).reshape(b, max_pages), jnp.int32)
    seq_lens = jnp.asarray([9, 61], jnp.int32)
    sm_scale = 1.0 / np.sqrt(dk)
    k_scale = jnp.abs(k.astype(jnp.float32)).max(axis=(0, 2, 3)) / 127.0  # [Hkv]
    v_scale = jnp.abs(v.astype(jnp.float32)).max(axis=(0, 2, 3)) / 127.0
    kq = _quant_int8(k, k_scale[None, :, None, None])
    vq = _quant_int8(v, v_scale[None, :, None, None])
    fn = (da.decode_gqa_high_performance if which == "flat" else da.decode_gqa)
    got = fn(q, kq, vq, seq_lens, sm_scale, bt, k_scale=k_scale, v_scale=v_scale)
    want_q = da.decode_gqa_ref(q, kq, vq, seq_lens, sm_scale, bt,
                               k_scale=k_scale, v_scale=v_scale)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want_q, np.float32), atol=3e-2, rtol=3e-2)
    want_bf = da.decode_gqa_ref(q, k, v, seq_lens, sm_scale, bt)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want_bf, np.float32), atol=8e-2, rtol=8e-2)


def test_mla_prefill_pallas_matches_golden(rng):
    from sgl_kernel_npu_tpu.ops.attention import mla_prefill as mpre

    h, dn, dr, page, max_pages = 8, 128, 64, 16, 4
    bsz = 3
    n_pages = bsz * max_pages
    kn = jnp.asarray(rng.standard_normal((n_pages, 1, page, dn)) * 0.5, jnp.float32)
    kr = jnp.asarray(rng.standard_normal((n_pages, 1, dr, page)) * 0.5, jnp.float32)
    bt = jnp.asarray(rng.permutation(n_pages).reshape(bsz, max_pages), jnp.int32)
    ctx = jnp.asarray([40, 25, 64], jnp.int32)
    seq_lens = jnp.asarray([3, 25, 10], jnp.int32)
    s = int(seq_lens.sum())
    q = jnp.asarray(rng.standard_normal((s, h, dn + dr)) * 0.5, jnp.float32)
    scale = 1 / np.sqrt(dn + dr)
    want = mpre.mla_prefill_ref(q, kn, kr, seq_lens, bt, ctx, scale)
    got = mpre.mla_prefill_pallas(q, kn, kr, seq_lens, bt, ctx, scale,
                                  max_q=32, q_chunk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_mla_prefill_lastrow_matches_decode(rng):
    """Last prefill row of each request == decode_mla at the same context."""
    from sgl_kernel_npu_tpu.ops.attention import mla_prefill as mpre

    h, dn, dr, page, max_pages = 8, 128, 64, 16, 4
    bsz = 2
    n_pages = bsz * max_pages
    kn = jnp.asarray(rng.standard_normal((n_pages, 1, page, dn)) * 0.5, jnp.float32)
    kr = jnp.asarray(rng.standard_normal((n_pages, 1, dr, page)) * 0.5, jnp.float32)
    bt = jnp.asarray(rng.permutation(n_pages).reshape(bsz, max_pages), jnp.int32)
    ctx = jnp.asarray([40, 25], jnp.int32)
    seq_lens = jnp.asarray([4, 6], jnp.int32)
    s = int(seq_lens.sum())
    q = jnp.asarray(rng.standard_normal((s, h, dn + dr)) * 0.5, jnp.float32)
    scale = 1 / np.sqrt(dn + dr)
    out = mpre.mla_prefill_pallas(q, kn, kr, seq_lens, bt, ctx, scale, max_q=8)
    last = np.asarray(out)[[3, 9]]
    dec = da.decode_mla(q[jnp.asarray([3, 9])], kn, kr, ctx, scale, bt)
    np.testing.assert_allclose(last, np.asarray(dec), rtol=2e-2, atol=2e-2)
