"""FULL single-kernel fused MoE vs the unfused chain (VERDICT r1 item #1).

The reference's own bar: fused output matches the separate
dispatch→GMM→SwiGLU→GMM→combine pipeline to avg_diff < 4e-4
(tests/python/deepep/test_fused_deep_moe.py:469).

The distributed checks run in the interpret simulator with eager DMA
execution (see fused_full.py — the default lazy mode mis-delivers multi-slot
one-sided transfers).  R=4 is the default-suite size; the R=8 case is
identical machinery at ~8× the single-core simulation cost, so it carries the
``slow`` marker.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sgl_kernel_npu_tpu.parallel import fused_full
from sgl_kernel_npu_tpu.parallel.fused_moe import (
    fused_deep_moe_rank,
    quantize_expert_weights,
)

H, I = 128, 64
TN1 = 128  # pack width == n1 so both paths share the packed layout


def _weights(rng, e):
    wg = (rng.standard_normal((e, H, I)) * 0.05).astype(np.float32)
    wu = (rng.standard_normal((e, H, I)) * 0.05).astype(np.float32)
    wd = (rng.standard_normal((e, I, H)) * 0.05).astype(np.float32)
    return quantize_expert_weights(
        jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd), tn=TN1
    )


def _inputs(rng, n, e, k):
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(e, k, replace=False) for _ in range(n)]), jnp.int32
    )
    w = jnp.asarray(rng.random((n, k)), jnp.float32)
    return x, idx, w


def _run_pair(mesh, rng, *, r, e, t, k, seg, drop_prob=0.0):
    w1, s1, w2, s2 = _weights(rng, e)
    x, idx, w = _inputs(rng, r * t, e, k)
    if drop_prob:
        idx = jnp.where(jnp.asarray(rng.random((r * t, k)) < drop_prob), -1, idx)

    def fused(xs, ids, ws):
        out, cnt, drop = fused_full.fused_deep_moe_full_rank(
            xs, ids, ws, w1, s1, w2, s2,
            axis_name="ep", num_experts=e, num_ranks=r, seg_capacity=seg,
            tm=32, tk1=H, tn1=TN1, tk2=I, tn2=H, tn3=H,
        )
        return out, cnt[None], drop[None]

    def unfused(xs, ids, ws):
        out, cnt, drop = fused_deep_moe_rank(
            xs, ids, ws, w1, s1, w2, s2,
            axis_name="ep", num_experts=e, num_ranks=r,
            pair_capacity=t * k, seg_capacity=seg,
            gmm_tiles=(32, H, TN1), pack_tn=TN1,
        )
        return out, cnt[None], drop[None]

    smap = lambda fn: jax.shard_map(
        fn, mesh=mesh, in_specs=(P("ep"), P("ep"), P("ep")),
        out_specs=(P("ep"), P("ep"), P("ep")), check_vma=False,
    )
    got, cnt_f, drop_f = smap(fused)(x, idx, w)
    ref, cnt_u, drop_u = smap(unfused)(x, idx, w)
    assert int(np.asarray(drop_f).sum()) == 0 and int(np.asarray(drop_u).sum()) == 0
    # receiver-side per-expert counts must match the unfused dispatch's
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_u))
    g = np.asarray(got, np.float32)
    rr = np.asarray(ref, np.float32)
    avg_diff = np.abs(g - rr).mean() / (np.abs(rr).mean() + 1e-9)
    assert avg_diff < 4e-4, avg_diff


def _mesh(n):
    return jax.sharding.Mesh(np.array(jax.devices()[:n]), ("ep",))


def test_full_fused_matches_unfused_2rank(rng):
    """Default-tier DISTRIBUTED check (VERDICT r3 #6): the one-sided chain —
    entry barrier, cross-rank window offsets, combine return — runs on every
    push, not just nightly.  R=2 at tiny shapes keeps it under a minute."""
    _run_pair(_mesh(2), rng, r=2, e=4, t=8, k=2, seg=8)


@pytest.mark.slow
def test_full_fused_matches_unfused_4rank(rng):
    """Distributed interpret, static-shape mode, 4 ranks."""
    _run_pair(_mesh(4), rng, r=4, e=8, t=8, k=2, seg=8)


@pytest.mark.slow
def test_full_fused_topk_minus_one(rng):
    """Inactive (−1) top-k slots drop cleanly (reference MOE_ENABLE_TOPK_NEG_ONE)."""
    _run_pair(_mesh(4), rng, r=4, e=8, t=16, k=2, seg=16, drop_prob=0.3)


def test_full_fused_compact_single_rank(rng):
    """Compact (live-rows) metadata path on a 1-rank mesh in interpret."""
    mesh1 = _mesh(1)
    e, t, k = 16, 8, 4
    w1, s1, w2, s2 = _weights(rng, e)
    x, idx, w = _inputs(rng, t, e, k)

    def fused(xs, ids, ws):
        out, cnt, drop = fused_full.fused_deep_moe_full_rank(
            xs, ids, ws, w1, s1, w2, s2,
            axis_name="ep", num_experts=e, num_ranks=1, seg_capacity=t,
            tm=32, tk1=H, tn1=TN1, tk2=I, tn2=H, tn3=H,
            static_shapes=False,
        )
        return out, cnt[None], drop[None]

    def unfused(xs, ids, ws):
        out, cnt, drop = fused_deep_moe_rank(
            xs, ids, ws, w1, s1, w2, s2,
            axis_name="ep", num_experts=e, num_ranks=1,
            pair_capacity=t * k, seg_capacity=t,
            gmm_tiles=(32, H, TN1), pack_tn=TN1,
        )
        return out, cnt[None], drop[None]

    smap = lambda fn: jax.shard_map(
        fn, mesh=mesh1, in_specs=(P("ep"), P("ep"), P("ep")),
        out_specs=(P("ep"), P("ep"), P("ep")), check_vma=False,
    )
    got, cnt_f, _ = smap(fused)(x, idx, w)
    ref, cnt_u, _ = smap(unfused)(x, idx, w)
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_u))
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    avg_diff = np.abs(g - r).mean() / (np.abs(r).mean() + 1e-9)
    assert avg_diff < 4e-4, avg_diff


def test_full_fused_large_segment_tiered_chain(rng):
    """Segments past 128 rows exercise BOTH tiers of the DMA chain (one
    128-row piece + an 8-row tail) on every transfer path: dispatch sends,
    arrival waits, combine returns, drains.  e=k=2 routes every token to both
    experts, so each (expert, src) segment is exactly t=136 rows."""
    mesh1 = _mesh(1)
    e, t, k, seg = 2, 136, 2, 272
    w1, s1, w2, s2 = _weights(rng, e)
    x, idx, w = _inputs(rng, t, e, k)

    def fused(xs, ids, ws):
        out, cnt, drop = fused_full.fused_deep_moe_full_rank(
            xs, ids, ws, w1, s1, w2, s2,
            axis_name="ep", num_experts=e, num_ranks=1, seg_capacity=seg,
            tm=288, tk1=H, tn1=TN1, tk2=I, tn2=H, tn3=H,
            static_shapes=False,
        )
        return out, cnt[None], drop[None]

    def unfused(xs, ids, ws):
        out, cnt, drop = fused_deep_moe_rank(
            xs, ids, ws, w1, s1, w2, s2,
            axis_name="ep", num_experts=e, num_ranks=1,
            pair_capacity=t * k, seg_capacity=seg,
            gmm_tiles=(32, H, TN1), pack_tn=TN1,
        )
        return out, cnt[None], drop[None]

    smap = lambda fn: jax.shard_map(
        fn, mesh=mesh1, in_specs=(P("ep"), P("ep"), P("ep")),
        out_specs=(P("ep"), P("ep"), P("ep")), check_vma=False,
    )
    got, cnt_f, _ = smap(fused)(x, idx, w)
    ref, cnt_u, _ = smap(unfused)(x, idx, w)
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_u))
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    avg_diff = np.abs(g - r).mean() / (np.abs(r).mean() + 1e-9)
    assert avg_diff < 4e-4, avg_diff


def test_selector_tiles_run_and_match(rng):
    """select_full_tiles output is layout-consistent end-to-end: weights packed
    at its tn1 + the fused call with its dict must match the unfused chain.
    Also pins the production-shape choices against step-count regressions."""
    ti = fused_full.select_full_tiles(
        t=128, k=8, h=7168, i=2048, e_local=8, num_ranks=1, seg=128)
    d = fused_full._make_dims(
        num_ranks=1, e_local=8, seg=128, t=128, k=8, h=7168, n1=4096,
        static_shapes=False, **ti)
    # the round-3 hand-set grid ran 420 steps at these shapes
    assert d.s_total * d.p <= 300, (ti, d.s_total * d.p)

    r, e, t, k, seg = 2, 4, 8, 2, 8
    h, i = 256, 128
    ti2 = fused_full.select_full_tiles(
        t=t, k=k, h=h, i=i, e_local=e // r, num_ranks=r, seg=seg)
    wg = jnp.asarray((rng.standard_normal((e, h, i)) * 0.05), jnp.float32)
    wu = jnp.asarray((rng.standard_normal((e, h, i)) * 0.05), jnp.float32)
    wd = jnp.asarray((rng.standard_normal((e, i, h)) * 0.05), jnp.float32)
    w1, s1, w2, s2 = quantize_expert_weights(wg, wu, wd, tn=ti2["tn1"])
    n = r * t
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(e, k, replace=False) for _ in range(n)]), jnp.int32)
    w = jnp.asarray(rng.random((n, k)), jnp.float32)

    def fused(xs, ids, ws):
        out, cnt, drop = fused_full.fused_deep_moe_full_rank(
            xs, ids, ws, w1, s1, w2, s2,
            axis_name="ep", num_experts=e, num_ranks=r,
            seg_capacity=seg, **ti2)
        return out, cnt[None], drop[None]

    def unfused(xs, ids, ws):
        out, cnt, drop = fused_deep_moe_rank(
            xs, ids, ws, w1, s1, w2, s2,
            axis_name="ep", num_experts=e, num_ranks=r,
            pair_capacity=t * k, seg_capacity=seg, pack_tn=ti2["tn1"],
        )
        return out, cnt[None], drop[None]

    smap = lambda fn: jax.shard_map(
        fn, mesh=_mesh(r), in_specs=(P("ep"),) * 3,
        out_specs=(P("ep"),) * 3, check_vma=False,
    )
    got, cnt_f, _ = smap(fused)(x, idx, w)
    ref, cnt_u, _ = smap(unfused)(x, idx, w)
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_u))
    g, rr = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    avg_diff = np.abs(g - rr).mean() / (np.abs(rr).mean() + 1e-9)
    assert avg_diff < 4e-4, avg_diff


@pytest.mark.slow
def test_full_fused_matches_unfused_8rank(mesh8, rng):
    """Full 8-rank equivalence — same machinery as the 4-rank case but ~8× the
    single-core interpret cost (spin-waits serialize on one CPU)."""
    _run_pair(mesh8, rng, r=8, e=16, t=16, k=4, seg=16)


@pytest.mark.slow
def test_buffer_single_kernel_api(rng):
    """The FULL single-kernel chain is reachable from the public Buffer API:
    fused_deep_moe(single_kernel=True) must match the unfused form."""
    from sgl_kernel_npu_tpu.config import EPConfig
    from sgl_kernel_npu_tpu.parallel.buffer import Buffer

    r, e, t, k = 2, 8, 8, 2
    mesh = _mesh(r)
    w1, s1, w2, s2 = _weights(rng, e)
    x, idx, w = _inputs(rng, r * t, e, k)
    buf = Buffer(mesh, "ep", num_experts=e, config=EPConfig(
        num_max_dispatch_tokens_per_rank=t))
    ref, cnt_u, drop_u = buf.fused_deep_moe(
        x, idx, w, w1, s1, w2, s2, gmm_tiles=(32, H, TN1), pack_tn=TN1)
    got, cnt_f, drop_f = buf.fused_deep_moe(
        x, idx, w, w1, s1, w2, s2, pack_tn=TN1, single_kernel=True)
    assert int(np.asarray(drop_f).sum()) == 0 and int(np.asarray(drop_u).sum()) == 0
    np.testing.assert_array_equal(np.asarray(cnt_f), np.asarray(cnt_u))
    g, rr = np.asarray(got, np.float32), np.asarray(ref, np.float32)
    avg_diff = np.abs(g - rr).mean() / (np.abs(rr).mean() + 1e-9)
    assert avg_diff < 4e-4, avg_diff
