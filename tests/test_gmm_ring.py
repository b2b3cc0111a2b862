"""Ring-streamed decode-MoE GEMMs (ops/gmm_ring.py) vs jnp goldens.

Golden semantics match the BlockSpec grouped kernels they replace
(tests/test_grouped_matmul.py): per-token×per-channel dequant, SwiGLU,
per-row requant, zero-fill outside groups, weighted hi/lo combine — plus the
in-kernel routing glue (one-hot dispatch from tok_of_row, combine mask from
dest/topk_w, residual accumulator init).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import gmm_ring
from sgl_kernel_npu_tpu.ops.grouped_matmul import (
    pack_gmm1_scales,
    pack_gmm1_weights,
    swiglu_block,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _golden_gmm1(xq, tok_of_row, w1, gs, sx_tok, sw):
    s = tok_of_row.shape[0]
    xs = xq[tok_of_row].astype(jnp.int32)
    sx = sx_tok[tok_of_row]
    ends = jnp.cumsum(gs)
    g_of = jnp.searchsorted(ends, jnp.arange(s), side="right").clip(0, gs.shape[0] - 1)
    acc = jnp.einsum("sk,skn->sn", xs.astype(jnp.float32),
                     w1[g_of].astype(jnp.float32))
    deq = acc * sx[:, None] * sw[g_of]
    act = swiglu_block(deq)
    scale = jnp.maximum(jnp.abs(act).max(-1) / 127.0, 1e-12)
    q = jnp.clip(jnp.round(act / scale[:, None]), -128, 127)
    live = jnp.arange(s) < ends[-1]
    return (jnp.where(live[:, None], q, 0).astype(jnp.int8),
            jnp.where(live, scale, 0.0))


@pytest.mark.parametrize("sizes", [(128, 128, 128, 128), (96, 0, 200, 40)])
def test_gmm1_ring_vs_golden(rng, sizes):
    n_tok, k, n, g = 32, 256, 512, 4
    s = 512  # capacity (> total for the ragged case)
    gs = jnp.asarray(sizes, jnp.int32)
    total = int(np.sum(sizes))
    xq = jnp.asarray(rng.integers(-30, 30, (n_tok, k)), jnp.int8)
    tok = jnp.asarray(rng.integers(0, n_tok, s), jnp.int32)
    wg = jnp.asarray(rng.integers(-20, 20, (g, k, n // 2)), jnp.int8)
    wu = jnp.asarray(rng.integers(-20, 20, (g, k, n // 2)), jnp.int8)
    sg = jnp.asarray(rng.random((g, n // 2)).astype(np.float32) / 50)
    su = jnp.asarray(rng.random((g, n // 2)).astype(np.float32) / 50)
    w1 = pack_gmm1_weights(wg, wu, n)
    sw = pack_gmm1_scales(sg, su, n)
    sx_tok = jnp.asarray(rng.random(n_tok).astype(np.float32) / 10)

    h1, hs = gmm_ring.gmm1_ring(xq, tok, w1, gs, sx_tok, sw,
                                tm=128, tk=128, ring=3)
    gh, gsc = _golden_gmm1(xq, tok, w1, gs, sx_tok, sw)
    h1n, ghn = np.asarray(h1, np.int32), np.asarray(gh, np.int32)
    np.testing.assert_allclose(h1n[:total], ghn[:total], atol=1)
    np.testing.assert_allclose(np.asarray(hs)[:total], np.asarray(gsc)[:total],
                               rtol=1e-5)
    assert np.all(h1n[total:] == 0) and np.all(np.asarray(hs)[total:] == 0)


@pytest.mark.parametrize("sizes,use_init", [
    ((128, 128, 128, 128), False),
    ((64, 0, 250, 30), True),
])
def test_gmm2_combine_ring_vs_golden(rng, sizes, use_init):
    n_tok, k, n, g, ktop = 32, 256, 512, 4, 8
    s = 512
    gs = jnp.asarray(sizes, jnp.int32)
    x = jnp.asarray(rng.integers(-30, 30, (s, k)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-20, 20, (g, k, n)), jnp.int8)
    sx = jnp.asarray(rng.random(s).astype(np.float32) / 10)
    sw = jnp.asarray(rng.random((g, n)).astype(np.float32) / 50)
    dest = jnp.asarray(
        rng.permutation(s)[: n_tok * ktop].reshape(n_tok, ktop), jnp.int32)
    init = (jnp.asarray(rng.standard_normal((n_tok, n)), jnp.float32)
            if use_init else None)

    topw = jnp.asarray(rng.random((n_tok, ktop)).astype(np.float32))
    out = gmm_ring.gmm2_combine_ring(
        x, w2, gs, sx, sw, dest, topw, init=init, tm=128, tn=256, ring=3)

    ends = jnp.cumsum(gs)
    g_of = jnp.searchsorted(ends, jnp.arange(s), side="right").clip(0, g - 1)
    acc = jnp.einsum("sk,skn->sn", x.astype(jnp.float32),
                     w2[g_of].astype(jnp.float32))
    live = (jnp.arange(s) < ends[-1])[:, None]
    deq = jnp.where(live, acc * sx[:, None] * sw[g_of], 0.0).astype(jnp.bfloat16)
    # weight applied per-row in f32, binary mask in bf16 (kernel semantics)
    wrow = jnp.zeros((s,), jnp.float32).at[dest.reshape(-1)].set(topw.reshape(-1))
    mask = jnp.zeros((n_tok, s), jnp.float32).at[
        jnp.arange(n_tok)[:, None], dest].add(1.0)
    ref = mask @ (deq.astype(jnp.float32) * wrow[:, None])
    if init is not None:
        ref = ref + init
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2 * float(jnp.abs(ref).max()))

def test_ring_kernels_row_count_below_tile(rng):
    """S smaller than (or not a multiple of) the m-tile: the wrappers must pad
    the sorted-row axis — regression for an OOB tile read when a small decode
    batch (S = 64 rows) met the default tm=128."""
    n_tok, k, n, g, ktop = 8, 256, 512, 4, 2
    s = n_tok * ktop  # 16 rows, far below tm=128
    gs = jnp.asarray([5, 0, 7, 4], jnp.int32)
    xq = jnp.asarray(rng.integers(-30, 30, (n_tok, k)), jnp.int8)
    tok = jnp.asarray(rng.integers(0, n_tok, s), jnp.int32)
    wg = jnp.asarray(rng.integers(-20, 20, (g, k, n // 2)), jnp.int8)
    wu = jnp.asarray(rng.integers(-20, 20, (g, k, n // 2)), jnp.int8)
    sg = jnp.asarray(rng.random((g, n // 2)).astype(np.float32) / 50)
    su = jnp.asarray(rng.random((g, n // 2)).astype(np.float32) / 50)
    w1 = pack_gmm1_weights(wg, wu, n)
    sw = pack_gmm1_scales(sg, su, n)
    sx_tok = jnp.asarray(rng.random(n_tok).astype(np.float32) / 10)

    h1, hs = gmm_ring.gmm1_ring(xq, tok, w1, gs, sx_tok, sw, tm=128, ring=3)
    assert h1.shape == (s, n // 2) and hs.shape == (s,)
    gh, gsc = _golden_gmm1(xq, tok, w1, gs, sx_tok, sw)
    total = int(jnp.sum(gs))
    np.testing.assert_allclose(np.asarray(h1, np.int32)[:total],
                               np.asarray(gh, np.int32)[:total], atol=1)
    np.testing.assert_allclose(np.asarray(hs)[:total], np.asarray(gsc)[:total],
                               rtol=1e-5)

    w2 = jnp.asarray(rng.integers(-20, 20, (g, k, n)), jnp.int8)
    sw2 = jnp.asarray(rng.random((g, n)).astype(np.float32) / 50)
    x2 = jnp.asarray(rng.integers(-30, 30, (s, k)), jnp.int8)
    sx2 = jnp.asarray(rng.random(s).astype(np.float32) / 10)
    dest = jnp.asarray(rng.permutation(s).reshape(n_tok, ktop), jnp.int32)
    topw = jnp.asarray(rng.random((n_tok, ktop)).astype(np.float32))
    out = gmm_ring.gmm2_combine_ring(
        x2, w2, gs, sx2, sw2, dest, topw, tm=128, tn=256, ring=3)
    assert out.shape == (n_tok, n)

    ends = jnp.cumsum(gs)
    g_of = jnp.searchsorted(ends, jnp.arange(s), side="right").clip(0, g - 1)
    acc = jnp.einsum("sk,skn->sn", x2.astype(jnp.float32),
                     w2[g_of].astype(jnp.float32))
    live = (jnp.arange(s) < ends[-1])[:, None]
    deq = jnp.where(live, acc * sx2[:, None] * sw2[g_of], 0.0).astype(jnp.bfloat16)
    wrow = jnp.zeros((s,), jnp.float32).at[dest.reshape(-1)].set(topw.reshape(-1))
    mask = jnp.zeros((n_tok, s), jnp.float32).at[
        jnp.arange(n_tok)[:, None], dest].add(1.0)
    ref = mask @ (deq.astype(jnp.float32) * wrow[:, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2 * float(jnp.abs(ref).max()))

@pytest.mark.parametrize("dt", [jnp.bfloat16, jnp.float32])
def test_gmm1_ring_in_kernel_quant(rng, dt):
    """bf16 tokens straight into the kernel: the per-token dynamic quant
    (amax/127, saturating round) runs in-kernel and must match the XLA
    pre-quant path bit-for-bit on the quantized levels."""
    n_tok, k, n, g = 16, 256, 512, 4
    s = 64
    gs = jnp.asarray([20, 0, 30, 14], jnp.int32)
    x16 = jnp.asarray(rng.standard_normal((n_tok, k)) * 0.5, dt)
    tok = jnp.asarray(rng.integers(0, n_tok, s), jnp.int32)
    wg = jnp.asarray(rng.integers(-20, 20, (g, k, n // 2)), jnp.int8)
    wu = jnp.asarray(rng.integers(-20, 20, (g, k, n // 2)), jnp.int8)
    sg = jnp.asarray(rng.random((g, n // 2)).astype(np.float32) / 50)
    su = jnp.asarray(rng.random((g, n // 2)).astype(np.float32) / 50)
    w1 = pack_gmm1_weights(wg, wu, n)
    sw = pack_gmm1_scales(sg, su, n)

    h1, hs = gmm_ring.gmm1_ring(x16, tok, w1, gs, None, sw, tm=32, ring=3)

    # golden: the exact host-side quant the kernel replaces
    xf = x16.astype(jnp.float32)
    sx_tok = jnp.maximum(jnp.abs(xf).max(-1) / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / sx_tok[:, None]), -128, 127).astype(jnp.int8)
    gh, gsc = _golden_gmm1(xq, tok, w1, gs, sx_tok, sw)
    total = int(jnp.sum(gs))
    np.testing.assert_allclose(np.asarray(h1, np.int32)[:total],
                               np.asarray(gh, np.int32)[:total], atol=1)
    np.testing.assert_allclose(np.asarray(hs)[:total], np.asarray(gsc)[:total],
                               rtol=1e-5)
