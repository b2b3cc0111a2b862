"""LoRA ops vs numpy ports of the reference goldens (tests/.../utils.py:12-146)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import lora


def _np_sgmv_shrink(x, w, widx, slen, ranks, scalings, num_slices):
    total, _ = x.shape
    max_rank = w.shape[1] // num_slices
    out = np.zeros((total, num_slices * max_rank), np.float32)
    off = 0
    for li, sl in zip(widx, slen):
        r = ranks[li]
        if sl and r:
            res = x[off : off + sl].astype(np.float32) @ w[li, : num_slices * r].T
            out[off : off + sl, : num_slices * r] = scalings[li] * res
        off += sl
    return out


def _np_sgmv_expand(x, w, widx, slen, ranks, offsets, base):
    out = base.copy().astype(np.float32)
    num_slices = len(offsets) - 1
    max_rank = x.shape[1] // num_slices
    off = 0
    for li, sl in zip(widx, slen):
        r = ranks[li]
        if sl and r:
            xs = x[off : off + sl, : num_slices * r]
            for s in range(num_slices):
                o0, o1 = offsets[s], offsets[s + 1]
                out[off : off + sl, o0:o1] += (
                    xs[:, s * r : (s + 1) * r].astype(np.float32) @ w[li, o0:o1, :r].T
                )
        off += sl
    return out


@pytest.mark.parametrize("num_slices", [1, 3])
def test_sgmv_shrink(rng, num_slices):
    loras, max_rank, h = 4, 16, 64
    x = rng.standard_normal((40, h)).astype(np.float32)
    w = rng.standard_normal((loras, num_slices * max_rank, h)).astype(np.float32) * 0.1
    widx = np.array([2, 0, 3], np.int32)
    slen = np.array([10, 0, 25], np.int32)  # 35 of 40 tokens
    ranks = np.array([16, 8, 4, 16], np.int32)
    scal = np.array([1.0, 0.5, 2.0, 1.5], np.float32)
    got = lora.sgmv_shrink(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(widx), jnp.asarray(slen),
        jnp.asarray(ranks), jnp.asarray(scal), num_slices,
    )
    want = _np_sgmv_shrink(x, w, widx, slen, ranks, scal, num_slices)
    gn = np.asarray(got)
    # compact-by-rank layout: valid region per sequence is [:num_slices*rank]
    off = 0
    for li, sl in zip(widx, slen):
        r = ranks[li]
        np.testing.assert_allclose(
            gn[off : off + sl, : num_slices * r],
            want[off : off + sl, : num_slices * r],
            rtol=1e-4, atol=1e-4,
        )
        assert np.all(gn[off : off + sl, num_slices * r :] == 0)
        off += sl
    assert np.all(gn[35:] == 0)


def test_sgmv_expand_and_roundtrip(rng):
    loras, max_rank, h = 3, 8, 32
    offsets = [0, h, 2 * h]
    num_slices = 2
    x = rng.standard_normal((20, num_slices * max_rank)).astype(np.float32)
    w = rng.standard_normal((loras, 2 * h, max_rank)).astype(np.float32) * 0.1
    widx = np.array([1, 2], np.int32)
    slen = np.array([12, 8], np.int32)
    ranks = np.array([8, 8, 8], np.int32)
    base = rng.standard_normal((20, 2 * h)).astype(np.float32)
    got = lora.sgmv_expand(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(widx), jnp.asarray(slen),
        jnp.asarray(ranks), offsets, jnp.asarray(base),
    )
    want = _np_sgmv_expand(x, w, widx, slen, ranks, offsets, base)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_bgmv_shrink_expand(rng):
    loras, rank, h = 4, 8, 64
    t = 10
    x = rng.standard_normal((t, h)).astype(np.float32)
    a = rng.standard_normal((loras, rank, h)).astype(np.float32) * 0.1
    b = rng.standard_normal((loras, h, rank)).astype(np.float32) * 0.1
    idx = rng.integers(0, loras, t).astype(np.int32)
    mid = lora.bgmv_shrink(jnp.asarray(x), jnp.asarray(a), jnp.asarray(idx), scaling=0.5)
    want_mid = np.stack([0.5 * (x[i] @ a[idx[i]].T) for i in range(t)])
    np.testing.assert_allclose(np.asarray(mid), want_mid, rtol=1e-4, atol=1e-4)

    out = lora.bgmv_expand(mid, jnp.asarray(b), jnp.asarray(idx),
                           base_output=jnp.zeros((t, h), jnp.float32))
    want = np.stack([want_mid[i] @ b[idx[i]].T for i in range(t)])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_bgmv_fused_matches_golden(rng):
    """ONE-kernel Pallas bgmv (shrink+expand fused) vs the numpy golden."""
    from sgl_kernel_npu_tpu.ops import lora_pallas

    loras, rank, h, d, t = 5, 8, 128, 256, 16
    x = rng.standard_normal((t, h)).astype(np.float32)
    a = rng.standard_normal((loras, rank, h)).astype(np.float32) * 0.1
    b = rng.standard_normal((loras, d, rank)).astype(np.float32) * 0.1
    idx = rng.integers(0, loras, t).astype(np.int32)
    got = lora_pallas.bgmv_fused(
        jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), jnp.asarray(idx),
        scaling=0.5,
    )
    want = np.stack([0.5 * (x[i] @ a[idx[i]].T) @ b[idx[i]].T for i in range(t)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_bgmv_fused_pretransposed_and_chunked(rng):
    """The serving path (bt pre-transposed at adapter load) and the VMEM-chunked
    grid (pool too large for one step, non-divisible chunk → padded) both match
    the golden."""
    from sgl_kernel_npu_tpu.ops import lora_pallas

    loras, rank, h, d, t = 5, 8, 128, 256, 16
    x = rng.standard_normal((t, h)).astype(np.float32)
    a = rng.standard_normal((loras, rank, h)).astype(np.float32) * 0.1
    b = rng.standard_normal((loras, d, rank)).astype(np.float32) * 0.1
    idx = rng.integers(0, loras, t).astype(np.int32)
    want = np.stack([0.5 * (x[i] @ a[idx[i]].T) @ b[idx[i]].T for i in range(t)])

    bt = jnp.asarray(b).transpose(0, 2, 1)
    got = lora_pallas.bgmv_fused(
        jnp.asarray(x), jnp.asarray(a), bt=bt, idx=jnp.asarray(idx), scaling=0.5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    # force multi-chunk: tiny budget → lc < loras, 5 % lc != 0 → padded pool
    import functools
    orig = lora_pallas._bgmv_chunk
    # budget sized so lc=2 → 3 chunks over 5 adapters → padded pool
    lora_pallas._bgmv_chunk = functools.partial(orig, vmem_budget=120 * 2**10)
    try:
        lora_pallas.bgmv_fused.clear_cache()
        got2 = lora_pallas.bgmv_fused(
            jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), jnp.asarray(idx),
            scaling=0.5)
    finally:
        lora_pallas._bgmv_chunk = orig
        lora_pallas.bgmv_fused.clear_cache()
    np.testing.assert_allclose(np.asarray(got2), want, rtol=1e-4, atol=1e-4)


def test_sgmv_fused_matches_golden(rng):
    """ONE-kernel Pallas sgmv with heterogeneous ranks/scalings + tail rows."""
    from sgl_kernel_npu_tpu.ops import lora_pallas

    loras, max_rank, h, d = 4, 16, 128, 128
    slen = np.array([40, 0, 100, 17], np.int32)   # 157 of 192 packed rows
    widx = np.array([2, 0, 3, 1], np.int32)
    ranks = np.array([16, 8, 4, 16], np.int32)
    scal = np.array([1.0, 0.5, 2.0, 1.5], np.float32)
    s = 192
    x = rng.standard_normal((s, h)).astype(np.float32)
    a = rng.standard_normal((loras, max_rank, h)).astype(np.float32) * 0.1
    b = rng.standard_normal((loras, d, max_rank)).astype(np.float32) * 0.1
    got = np.asarray(lora_pallas.sgmv_fused(
        jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), jnp.asarray(widx),
        jnp.asarray(slen), jnp.asarray(ranks), jnp.asarray(scal), tm=64,
    ))
    off = 0
    want = np.zeros((s, d), np.float32)
    for li, sl in zip(widx, slen):
        r = ranks[li]
        if sl:
            mid = scal[li] * (x[off:off + sl] @ a[li, :r].T)
            want[off:off + sl] = mid @ b[li, :, :r].T
        off += sl
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_lora_delta_dispatches_to_pallas(rng):
    """The serving wrapper (small pool → Pallas kernel) matches the jnp chain."""
    loras, rank, h, t = 3, 8, 128, 12
    x = rng.standard_normal((t, h)).astype(np.float32)
    a = rng.standard_normal((loras, rank, h)).astype(np.float32) * 0.1
    b = rng.standard_normal((loras, h, rank)).astype(np.float32) * 0.1
    idx = jnp.asarray(rng.integers(0, loras, t).astype(np.int32))
    got = lora.fused_lora_delta(
        jnp.asarray(x), jnp.asarray(a), jnp.asarray(b), idx, scaling=2.0)
    want = lora.bgmv_expand(
        lora.bgmv_shrink(jnp.asarray(x), jnp.asarray(a), idx, 2.0),
        jnp.asarray(b), idx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_bgmv_large_pool_gather_path(rng):
    """33+ adapters exceed the dense-all threshold → the per-token gather path
    must produce identical results to the numpy golden."""
    loras, rank, h = 40, 4, 32
    t = 12
    x = rng.standard_normal((t, h)).astype(np.float32)
    a = rng.standard_normal((loras, rank, h)).astype(np.float32) * 0.1
    b = rng.standard_normal((loras, h, rank)).astype(np.float32) * 0.1
    idx = rng.integers(0, loras, t).astype(np.int32)
    mid = lora.bgmv_shrink(jnp.asarray(x), jnp.asarray(a), jnp.asarray(idx), scaling=2.0)
    want_mid = np.stack([2.0 * (x[i] @ a[idx[i]].T) for i in range(t)])
    np.testing.assert_allclose(np.asarray(mid), want_mid, rtol=1e-4, atol=1e-4)
    out = lora.bgmv_expand(mid, jnp.asarray(b), jnp.asarray(idx),
                           base_output=jnp.zeros((t, h), jnp.float32))
    want = np.stack([want_mid[i] @ b[idx[i]].T for i in range(t)])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)
