"""Lightning indexer vs numpy port of the reference golden
(test_lightning_indexer.py:37)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops.attention.lightning_indexer import lightning_indexer


def _np_indexer(q, key, w, lens_q, lens_k, bt, sparse_count, sparse_mode):
    """q [B,S1,N1,D]; key [blocks,1,block,D]; w [B,S1,N1]."""
    b, s1, n1, d = q.shape
    block = key.shape[2]
    out = np.full((b, s1, 1, sparse_count), -1, np.int32)
    for bi in range(b):
        act1, act2 = lens_q[bi], lens_k[bi]
        nb = -(-act2 // block)
        k = np.concatenate([key[bt[bi, i], 0] for i in range(nb)], 0)[:act2]  # [S2, D]
        for j in range(act1):
            sc = np.maximum(q[bi, j] @ k.T, 0) * w[bi, j][:, None]   # [N1, S2]
            sc = sc.sum(0)
            if sparse_mode == 3:
                qpos = act2 - act1 + j
                sc[qpos + 1 :] = -np.inf
            order = np.argsort(-sc, kind="stable")
            r = min(sparse_count, act2)
            out[bi, j, 0, :r] = order[:r]
    return out


@pytest.mark.parametrize("sparse_mode", [0, 3])
def test_lightning_indexer_bsnd(rng, sparse_mode):
    b, s1, n1, d, block, nb = 2, 4, 4, 32, 16, 3
    sparse_count = 24
    q = rng.standard_normal((b, s1, n1, d)).astype(np.float32)
    key = rng.standard_normal((b * nb, 1, block, d)).astype(np.float32)
    w = rng.random((b, s1, n1)).astype(np.float32) + 0.1
    bt = rng.permutation(b * nb).reshape(b, nb).astype(np.int32)
    lens_q = np.array([4, 3], np.int32)
    lens_k = np.array([40, 29], np.int32)
    got = lightning_indexer(
        jnp.asarray(q), jnp.asarray(key), jnp.asarray(w), jnp.asarray(lens_q),
        jnp.asarray(lens_k), jnp.asarray(bt), "BSND", sparse_count, sparse_mode,
    )
    want = _np_indexer(q, key, w, lens_q, lens_k, bt, sparse_count, sparse_mode)
    gn = np.asarray(got)
    # compare only rows for valid query tokens; ties may reorder equal scores, so
    # compare the selected index SETS and the score-ordering on distinct scores
    for bi in range(2):
        for j in range(lens_q[bi]):
            g, wv = gn[bi, j, 0], want[bi, j, 0]
            assert set(g[g >= 0]) == set(wv[wv >= 0]), (bi, j)
            assert (g >= 0).sum() == min(sparse_count, lens_k[bi])
    # invalid query rows are all -1
    assert (gn[1, 3] == -1).all()


def test_lightning_indexer_tnd(rng):
    n1, d, block, nb = 2, 16, 8, 2
    sparse_count = 8
    lens_q = np.array([2, 3], np.int32)
    t = 5
    q = rng.standard_normal((t, n1, d)).astype(np.float32)
    key = rng.standard_normal((2 * nb, 1, block, d)).astype(np.float32)
    w = rng.random((t, n1)).astype(np.float32) + 0.1
    bt = np.arange(2 * nb).reshape(2, nb).astype(np.int32)
    lens_k = np.array([10, 12], np.int32)
    got = lightning_indexer(
        jnp.asarray(q), jnp.asarray(key), jnp.asarray(w),
        jnp.asarray(np.cumsum(lens_q).astype(np.int32)), jnp.asarray(lens_k),
        jnp.asarray(bt), "TND", sparse_count, 3,
    )
    # reshape BSND-equivalent golden manually
    qb = np.zeros((2, 3, n1, d), np.float32)
    wb = np.zeros((2, 3, n1), np.float32)
    qb[0, :2], qb[1, :3] = q[:2], q[2:]
    wb[0, :2], wb[1, :3] = w[:2], w[2:]
    want = _np_indexer(qb, key, wb, lens_q, lens_k, bt, sparse_count, 3)
    gn = np.asarray(got)
    rows = [(0, 0, 0), (1, 0, 1), (2, 1, 0), (3, 1, 1), (4, 1, 2)]
    for tr, bi, j in rows:
        g, wv = gn[tr, 0], want[bi, j, 0]
        assert set(g[g >= 0]) == set(wv[wv >= 0]), (tr, bi, j)


@pytest.mark.parametrize("layout", ["BSND", "TND"])
def test_lightning_indexer_pallas_matches_xla(rng, layout):
    """Paged page-walk kernel == einsum-over-gathered-keys path, exactly
    (identical f32 math in interpret mode → identical indices)."""
    b, s1, n1, d, block, nb = 2, 16, 4, 32, 8, 6
    sparse_count = 16
    lens_q = np.array([16, 11], np.int32)
    lens_k = np.array([41, 30], np.int32)
    key = rng.standard_normal((b * nb, 1, block, d)).astype(np.float32)
    bt = rng.permutation(b * nb).reshape(b, nb).astype(np.int32)
    if layout == "BSND":
        q = rng.standard_normal((b, s1, n1, d)).astype(np.float32)
        w = rng.random((b, s1, n1)).astype(np.float32) + 0.1
        alq = jnp.asarray(lens_q)
    else:
        t = int(lens_q.sum())
        q = rng.standard_normal((t, n1, d)).astype(np.float32)
        w = rng.random((t, n1)).astype(np.float32) + 0.1
        alq = jnp.asarray(np.cumsum(lens_q).astype(np.int32))
    args = (jnp.asarray(q), jnp.asarray(key), jnp.asarray(w), alq,
            jnp.asarray(lens_k), jnp.asarray(bt), layout, sparse_count, 3)
    got_p = lightning_indexer(*args, backend="pallas")
    got_x = lightning_indexer(*args, backend="xla")
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(got_x))
