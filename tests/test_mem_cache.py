"""Golden-diff tests for KV-cache management ops (reference: test_cache_assign.py,
test_cache_update.py, and the alloc_extend Triton twin)."""

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops import mem_cache as mc


def _alloc_extend_golden(pre, seq, last, free, page):
    """Direct port of the 3-part fill semantics (allocator.py:8)."""
    out = []
    page_cursor = 0
    for b in range(len(pre)):
        for tok in range(pre[b], seq[b]):
            pg = tok // page
            if pg < -(-pre[b] // page):  # old partial page
                out.append(last[b] + 1 + (tok - pre[b]))
            else:
                ordinal = pg - (-(-pre[b] // page))
                out.append(free[page_cursor + ordinal] * page + tok % page)
        page_cursor += -(-seq[b] // page) - (-(-pre[b] // page))
    return out


def test_alloc_extend(rng):
    page = 16
    pre = np.array([5, 16, 0, 30], np.int32)
    seq = np.array([40, 16, 20, 33], np.int32)
    last = np.array([100, 200, -1, 300], np.int32)
    free = np.asarray(rng.permutation(64), np.int32)
    got = mc.alloc_extend(
        jnp.asarray(pre), jnp.asarray(seq), jnp.asarray(last), jnp.asarray(free),
        page_size=page, max_extend_tokens=128,
    )
    want = _alloc_extend_golden(pre, seq, last, free, page)
    np.testing.assert_array_equal(np.asarray(got[: len(want)]), want)
    assert np.all(np.asarray(got[len(want):]) == -1)


def test_cache_loc_assign_and_update(rng):
    n_pools, max_seq = 10, 64
    pool = jnp.asarray(rng.integers(0, 1000, (n_pools, max_seq)), jnp.int32)
    req_idx = jnp.asarray([3, 7, 1], jnp.int32)
    start = jnp.asarray([5, 0, 60], jnp.int32)
    end = jnp.asarray([10, 4, 64], jnp.int32)
    vals = jnp.asarray(rng.integers(0, 9999, (13,)), jnp.int32)  # 5+4+4 = 13

    updated = mc.cache_loc_assign(req_idx, pool, start, end, vals)
    un, vn = np.asarray(updated), np.asarray(vals)
    assert (un[3, 5:10] == vn[0:5]).all()
    assert (un[7, 0:4] == vn[5:9]).all()
    assert (un[1, 60:64] == vn[9:13]).all()
    # untouched rows identical
    mask = np.ones(n_pools, bool); mask[[3, 7, 1]] = False
    np.testing.assert_array_equal(un[mask], np.asarray(pool)[mask])

    back = mc.cache_loc_update(req_idx, updated, start, end, max_total=13)
    np.testing.assert_array_equal(np.asarray(back), vn)


def test_assign_cache_op(rng):
    dst = jnp.asarray(rng.integers(0, 100, (32, 8)), jnp.int32)
    src = jnp.asarray(rng.integers(0, 100, (32, 8)), jnp.int32)
    out = mc.assign_cache_op(dst, src, 4, 12, 20, 28)
    on, dn, sn = np.asarray(out), np.asarray(dst), np.asarray(src)
    np.testing.assert_array_equal(on[4:12], sn[20:28])
    np.testing.assert_array_equal(on[:4], dn[:4])
    np.testing.assert_array_equal(on[12:], dn[12:])


def test_reshape_and_cache(rng):
    pages, hkv, page, d = 8, 2, 4, 16
    cache = jnp.zeros((pages, hkv, page, d), jnp.float32)
    n = 5
    vals = jnp.asarray(rng.standard_normal((n, hkv, d)), jnp.float32)
    slots = jnp.asarray([0, 5, 31, 17, -1], jnp.int32)
    out = np.asarray(mc.reshape_and_cache(vals, cache, slots))
    for i, s in enumerate([0, 5, 31, 17]):
        np.testing.assert_array_equal(out[s // page, :, s % page, :], np.asarray(vals)[i])
    assert np.abs(out).sum() == np.abs(np.asarray(vals)[:4]).sum()


def test_reshape_and_cache_transposed_dup_pages(rng):
    # page-granular merged update (r5): duplicate pages in one call, -1 slots,
    # and preservation of untouched columns in touched pages
    pages, hkv, d, page = 6, 1, 8, 4
    base = jnp.asarray(rng.standard_normal((pages, hkv, d, page)), jnp.float32)
    n = 6
    vals = jnp.asarray(rng.standard_normal((n, hkv, d)), jnp.float32)
    # slots 8,9,10 share page 2; slot 21 in page 5; -1 dropped; slot 0 page 0
    slots = jnp.asarray([8, 9, 10, 21, -1, 0], jnp.int32)
    out = np.asarray(mc.reshape_and_cache_transposed(vals, base, slots))
    ref = np.asarray(base).copy()
    for i, s in enumerate(np.asarray(slots)):
        if s >= 0:
            ref[s // page, :, :, s % page] = np.asarray(vals)[i]
    np.testing.assert_allclose(out, ref, rtol=1e-6)
