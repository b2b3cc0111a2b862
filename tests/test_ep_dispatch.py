"""EP dispatch/combine tests on an 8-device virtual CPU mesh.

Methodology mirrors the reference's distributed tests (tests/python/deepep/
test_intranode.py / test_low_latency.py): constructed payloads whose rows encode the
source rank, per-rank/per-expert count checks against torch-free golden math, -1 topk
drops, and a full dispatch→expert-compute→combine roundtrip vs a dense golden MoE with
``calc_diff``-style bounds (reference test_low_latency.py:177-179).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.config import EPConfig
from sgl_kernel_npu_tpu.parallel.buffer import Buffer

H = 64  # hidden
T = 8   # tokens per rank
K = 4   # topk
E = 16  # experts


@pytest.mark.slow
def test_ep16_scaling_subprocess():
    """EP sizes beyond the 8-device fixture (reference supports EP 2-160):
    run the protocol on a 16-rank virtual mesh in a subprocess (device count
    is fixed at process start)."""
    import pathlib
    import subprocess
    import sys

    script = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "ep_scale_check.py"
    r = subprocess.run([sys.executable, str(script), "16"],
                       capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "EP=16" in r.stdout and "OK" in r.stdout


def _make_inputs(rng, num_ranks, drop_prob=0.0):
    n = num_ranks * T
    x = rng.standard_normal((n, H)).astype(np.float32)
    idx = np.stack([rng.choice(E, size=K, replace=False) for _ in range(n)]).astype(np.int32)
    if drop_prob:
        drop = rng.random((n, K)) < drop_prob
        idx = np.where(drop, -1, idx)
    w = rng.random((n, K)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(idx), jnp.asarray(w)


def _golden_moe(x, idx, w, expert_fn):
    """Dense golden: combined[t] = Σ_k w[t,k] · expert_fn(e)(x[t])."""
    out = np.zeros_like(np.asarray(x, np.float32))
    xn, idxn, wn = map(np.asarray, (x, idx, w))
    for t in range(xn.shape[0]):
        for k in range(idxn.shape[1]):
            e = idxn[t, k]
            if e >= 0:
                out[t] += wn[t, k] * expert_fn(e, xn[t])
    return out


@pytest.fixture
def buf(mesh8):
    return Buffer(mesh8, "ep", num_experts=E, config=EPConfig(
        num_max_dispatch_tokens_per_rank=T, use_int8_dispatch=False))


def test_dispatch_layout(mesh8, rng, buf):
    x, idx, w = _make_inputs(rng, 8)
    per_rank, per_expert, in_rank = buf.get_dispatch_layout(idx)
    idxn = np.asarray(idx).reshape(8, T, K)
    for e in range(E):
        assert per_expert[:, e].sum() == (idxn == e).sum()
    # per-rank counts: tokens with ≥1 expert on that rank
    el = E // 8
    for r in range(8):
        for d in range(8):
            expected = sum(
                1 for t in range(T) if ((idxn[r, t] // el) == d).any()
            )
            assert int(per_rank[r, d]) == expected


@pytest.mark.parametrize("drop_prob", [0.0, 0.3])
def test_low_latency_roundtrip(mesh8, rng, buf, drop_prob):
    """dispatch → per-expert scale → combine equals dense golden."""
    x, idx, w = _make_inputs(rng, 8, drop_prob)
    recv_x, _, recv_count, handle, stats = buf.low_latency_dispatch(x, idx)
    assert int(stats["num_dropped"].sum()) == 0

    # counts match the layout op
    _, per_expert, _ = buf.get_dispatch_layout(idx)
    np.testing.assert_array_equal(
        np.asarray(recv_count).reshape(-1), np.asarray(per_expert.sum(axis=0))
    )

    # expert compute: y = (global_expert_id + 1) * x, applied in packed layout
    el = E // 8
    gx = np.asarray(recv_x, np.float32).reshape(8, el, -1, H)
    eid = (np.arange(8)[:, None] * el + np.arange(el)[None, :] + 1).astype(np.float32)
    y = jnp.asarray((gx * eid[:, :, None, None]).reshape(8 * el, -1, H), jnp.float32)

    combined = buf.low_latency_combine(y, w, handle, out_dtype=jnp.float32)
    golden = _golden_moe(x, idx, w, lambda e, row: (e + 1.0) * row)
    np.testing.assert_allclose(np.asarray(combined), golden, rtol=1e-4, atol=1e-4)


def test_low_latency_packed_layout_rows_from_rank(mesh8, rng, buf):
    """Rows landing in segment r of any expert must come from source rank r
    (reference check_data pattern, test_intranode.py:240-247)."""
    n = 8 * T
    x = jnp.asarray(np.repeat(np.arange(8), T)[:, None] * np.ones((1, H)), jnp.float32)
    idx = jnp.asarray(
        np.stack([np.random.default_rng(i).choice(E, K, replace=False) for i in range(n)]),
        jnp.int32,
    )
    recv_x, _, _, handle, _ = buf.low_latency_dispatch(x, idx)
    gx = np.asarray(recv_x).reshape(8 * (E // 8), 8, T, H)  # [experts, src_rank, seg, H]
    for r in range(8):
        seg = gx[:, r]
        nz = seg[np.abs(seg).sum(-1) > 0]
        assert nz.size == 0 or (nz == r).all(), f"segment {r} contains foreign rows"


def test_int8_dispatch_accuracy(mesh8, rng):
    cfg = EPConfig(num_max_dispatch_tokens_per_rank=T, use_int8_dispatch=True)
    buf = Buffer(mesh8, "ep", num_experts=E, config=cfg)
    x, idx, w = _make_inputs(rng, 8)
    recv_x, recv_scales, recv_count, handle, _ = buf.low_latency_dispatch(x, idx)
    assert recv_x.dtype == jnp.int8
    # dequantize and combine with identity experts
    deq = recv_x.astype(jnp.float32) * recv_scales[..., None]
    combined = buf.low_latency_combine(deq, w, handle, out_dtype=jnp.float32)
    golden = _golden_moe(x, idx, w, lambda e, row: row)
    # reference int8 bar: calc_diff < 1e-4 (test_low_latency.py:177) ≈ relative l2
    num = np.linalg.norm(np.asarray(combined) - golden)
    den = np.linalg.norm(golden)
    assert num / den < 2e-2  # int8 payload error budget for random normal data


def test_normal_dispatch_ragged_roundtrip(mesh8, rng, buf):
    x, idx, w = _make_inputs(rng, 8, drop_prob=0.1)
    xs, _, gs, handle, stats = buf.dispatch(x, idx)
    assert int(stats["num_dropped"].sum()) == 0
    # group sizes match layout
    _, per_expert, _ = buf.get_dispatch_layout(idx)
    np.testing.assert_array_equal(
        np.asarray(gs).reshape(-1), np.asarray(per_expert.sum(axis=0))
    )
    # expert compute in ragged layout: scale rows by (global expert id + 1)
    el = E // 8
    xs_n = np.asarray(xs, np.float32)  # [8, cap, H]
    gs_n = np.asarray(gs)  # [8, el]
    ys = np.zeros_like(xs_n)
    for r in range(8):
        off = 0
        for e in range(el):
            g = int(gs_n[r, e])
            ys[r, off : off + g] = xs_n[r, off : off + g] * (r * el + e + 1)
            off += g
    combined = buf.combine(jnp.asarray(ys), w, handle, out_dtype=jnp.float32)
    golden = _golden_moe(x, idx, w, lambda e, row: (e + 1.0) * row)
    np.testing.assert_allclose(np.asarray(combined), golden, rtol=1e-4, atol=1e-4)


def test_capacity_model_all_ep_sizes(rng):
    """EPConfig.pair_capacity must cover every EP size the reference ships a
    tuned Config for (2-160, buffer.py:75-116) with ONE model: exact sizing
    never drops, factor-1.3 sizing (mean + 3*sqrt Poisson margin) drops <1 %
    under uniform routing and saves >=2x memory at EP>=64.  Planner-only —
    no mesh (scripts/ep_scale_check.py runs the end-to-end roundtrip)."""
    from sgl_kernel_npu_tpu.parallel import ep_core

    t_per_rank, topk = 128, 8
    for r in (2, 4, 8, 16, 24, 32, 64, 128, 144, 160):
        e_total = max(2 * r, 16)
        e_local = e_total // r
        k = min(topk, e_total)
        cfg_f = EPConfig(num_max_dispatch_tokens_per_rank=t_per_rank,
                         capacity_factor=1.3)
        cap_exact = EPConfig(num_max_dispatch_tokens_per_rank=t_per_rank
                             ).pair_capacity(t_per_rank, k, r, e_local)
        cap_factor = cfg_f.pair_capacity(t_per_rank, k, r, e_local)
        idx = jnp.asarray(
            np.stack([rng.choice(e_total, k, replace=False)
                      for _ in range(t_per_rank)]), jnp.int32)
        for cap, bound in ((cap_exact, 0), (cap_factor, 0.01 * t_per_rank * k)):
            plan = ep_core.make_routing_plan(
                idx, num_experts=e_total, num_ranks=r, my_rank=jnp.int32(0),
                pair_capacity=cap, seg_capacity=t_per_rank)
            assert int(plan.num_dropped) <= bound, (r, cap)
        if r >= 64:
            assert 2 * r * cap_factor <= r * cap_exact, (r, cap_factor, cap_exact)


def test_capacity_drop_counted(mesh8, rng):
    cfg = EPConfig(num_max_dispatch_tokens_per_rank=T, capacity_factor=0.1,
                   use_int8_dispatch=False)
    buf = Buffer(mesh8, "ep", num_experts=E, config=cfg)
    # all tokens pick experts of rank 0 → massive overflow toward rank 0
    n = 8 * T
    x = jnp.ones((n, H), jnp.float32)
    idx = jnp.asarray(np.tile(np.arange(K), (n, 1)), jnp.int32)  # experts 0..3 (rank 0/1)
    _, _, _, _, stats = buf.low_latency_dispatch(x, idx)
    assert int(np.asarray(stats["num_dropped"]).sum()) > 0


def test_elastic_rank_remap(mesh8, rng, buf):
    """Elastic scale-down: rank 3's experts rehomed to rank 0; rank 5 dead."""
    import jax
    from jax.sharding import PartitionSpec as P
    from sgl_kernel_npu_tpu.parallel import ep_core

    n = 8 * T
    x, idx, w = _make_inputs(rng, 8)
    remap = np.arange(8, dtype=np.int32)
    remap[3] = 0     # rank 3's experts now served by rank 0
    remap[5] = -1    # rank 5 dead: its experts' tokens dropped

    def body(xs, ids):
        d = ep_core.dispatch_core(
            xs, ids, axis_name="ep", num_experts=E, num_ranks=8,
            pair_capacity=T * K, seg_capacity=T, use_int8=False,
            rank_remap=jnp.asarray(remap),
        )
        return d["recv_count_matrix"][None], d["num_dropped"][None]

    cmat, dropped = jax.shard_map(
        body, mesh=mesh8, in_specs=(P("ep"), P("ep")), out_specs=(P("ep"), P("ep")),
        check_vma=False,
    )(x, idx)
    cmat = np.asarray(cmat)  # [dst_rank, src_rank, E_local]
    idxn = np.asarray(idx)
    el = E // 8
    # rank 3 and 5 receive nothing
    assert cmat[3].sum() == 0 and cmat[5].sum() == 0
    # rank 0 receives its own + rank 3's expert traffic
    expected0 = ((idxn // el == 0) | (idxn // el == 3)).sum()
    assert cmat[0].sum() == expected0
    # dropped = all traffic to rank 5's experts
    assert np.asarray(dropped).sum() == (idxn // el == 5).sum()


def test_shared_expert_ranks(mesh8, rng):
    """First 2 ranks serve the shared expert; MoE experts on ranks 2..7.
    Every token also dispatches to a shared rank (round-robin); combine applies
    weight 1.0 to the shared-expert output (reference shared-expert-rank mode)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from sgl_kernel_npu_tpu.parallel import ep_core

    NS, E2 = 2, 12           # 12 MoE experts over 6 ranks -> e_local 2
    owner, slot, slots = ep_core.shared_expert_layout(E2, 8, NS)
    n = 8 * T
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(np.stack([rng.choice(E2, K, replace=False) for _ in range(n)]), jnp.int32)
    w = jnp.asarray(rng.random((n, K)), jnp.float32)

    def body(xs, ids, ws):
        my = jax.lax.axis_index("ep")
        t_local = ids.shape[0]
        gtid = my * t_local + jnp.arange(t_local, dtype=jnp.int32)
        shared_col = (E2 + gtid % NS)[:, None]
        ids_ext = jnp.concatenate([ids, shared_col], axis=1)
        ws_ext = jnp.concatenate([ws, jnp.ones((t_local, 1), jnp.float32)], axis=1)
        d = ep_core.dispatch_core(
            xs, ids_ext, axis_name="ep", num_experts=E2, num_ranks=8,
            pair_capacity=T * (K + 1), seg_capacity=T, use_int8=False,
            expert_owner=owner, expert_slot=slot, num_local_slots=slots)
        # expert compute: shared ranks (my<NS) multiply by 100; moe expert (r,s)
        # multiplies by global expert id + 1
        eid = (my - NS) * slots + jnp.arange(slots) + 1
        scale = jnp.where(my < NS, 100.0, eid.astype(jnp.float32))
        y = d["recv_x"] * scale[:, None, None]
        out = ep_core.combine_core(
            y, ws_ext, d["handle"], axis_name="ep", num_ranks=8,
            seg_capacity=T, out_dtype=jnp.float32)
        return out, d["num_dropped"][None]

    out, dropped = jax.shard_map(
        body, mesh=mesh8, in_specs=(P("ep"),) * 3, out_specs=(P("ep"), P("ep")),
        check_vma=False)(x, idx, w)
    assert int(np.asarray(dropped).sum()) == 0
    golden = np.zeros((n, H), np.float32)
    xn, idxn, wn = map(np.asarray, (x, idx, w))
    for t in range(n):
        for k in range(K):
            golden[t] += wn[t, k] * (idxn[t, k] + 1.0) * xn[t]
        golden[t] += 100.0 * xn[t]     # shared expert, weight 1
    np.testing.assert_allclose(np.asarray(out), golden, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["xla", "pallas_ragged"])
def test_int8_comm_combine(mesh8, rng, buf, backend):
    """INT8 comm-quant on the combine payload (reference SCALE_PARAM option),
    on both the padded collective and the ragged live-rows window return."""
    import jax
    from jax.sharding import PartitionSpec as P
    from sgl_kernel_npu_tpu.parallel import ep_core

    x, idx, w = _make_inputs(rng, 8)

    def run(use_int8_comm):
        def body(xs, ids, ws):
            d = ep_core.dispatch_core(
                xs, ids, axis_name="ep", num_experts=E, num_ranks=8,
                pair_capacity=T * K, seg_capacity=T, use_int8=False)
            y = d["recv_x"] * 2.0
            return ep_core.combine_core(
                y, ws, d["handle"], axis_name="ep", num_ranks=8, seg_capacity=T,
                out_dtype=jnp.float32, use_int8_comm=use_int8_comm,
                backend=backend)
        return jax.shard_map(body, mesh=mesh8, in_specs=(P("ep"),) * 3,
                             out_specs=P("ep"), check_vma=False)(x, idx, w)

    exact = np.asarray(run(False))
    quant = np.asarray(run(True))
    rel = np.linalg.norm(quant - exact) / np.linalg.norm(exact)
    assert rel < 2e-2, rel


def test_routing_plan_debug_accessor(mesh8, rng, buf):
    x, idx, w = _make_inputs(rng, 8)
    plan = buf.get_routing_plan(idx)
    # counts match the layout op
    _, per_expert, _ = buf.get_dispatch_layout(idx)
    np.testing.assert_array_equal(
        np.asarray(plan.counts_per_expert).reshape(8, E).sum(0),
        np.asarray(per_expert).sum(0),
    )
    assert int(np.asarray(plan.num_dropped).sum()) == 0


@pytest.mark.slow
def test_dispatch_checksum_validation(mesh4, rng):
    """Window-write guard (reference epoch tags sync_collectives.h:13-15 /
    winsize validation check_winsize.h:8-20): sender checksums vs receiver
    recompute must agree on a clean exchange (both backends), and the
    checksum itself must be sensitive to any payload change."""
    from sgl_kernel_npu_tpu.parallel import ep_core

    r, t4, k4 = 4, 4, 2
    cfg = EPConfig(num_max_dispatch_tokens_per_rank=t4, use_int8_dispatch=True,
                   validate_comm=True)
    buf = Buffer(mesh4, "ep", num_experts=E, config=cfg)
    n = r * t4
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(E, k4, replace=False) for _ in range(n)]), jnp.int32)
    for backend in ("xla", "pallas_ragged"):
        _, _, _, _, stats = buf.low_latency_dispatch(x, idx, backend=backend)
        assert stats["validation_flags"].shape == (r, r), backend
        assert not np.asarray(stats["validation_flags"]).any(), backend

    # sensitivity: one flipped element changes the wrapping bit-sum
    a = jnp.asarray(rng.standard_normal((4, 16)), jnp.bfloat16)
    b = a.at[2, 3].add(jnp.bfloat16(0.5))
    s_a = int(ep_core.payload_checksum(a, axes=(0, 1)))
    s_b = int(ep_core.payload_checksum(b, axes=(0, 1)))
    assert s_a != s_b
    # int8 payloads checksum exactly (integer wrap, order-independent)
    q = jnp.asarray(rng.integers(-128, 128, (8, 32)), jnp.int8)
    want = np.asarray(q, np.int32).sum(dtype=np.int32)  # numpy wraps identically
    assert int(ep_core.payload_checksum(q, axes=(0, 1))) == int(want)


def test_normal_and_low_latency_interaction(mesh4, rng):
    """Reference test_normal_and_low_latency.py pattern: BOTH modes on ONE
    Buffer inside ONE jitted program over the window backend — pins that the
    two kernels' collective ids / windows coexist without interference, and
    that each mode's result equals its isolated run."""
    from sgl_kernel_npu_tpu.parallel import ep_core

    r, t4, k4 = 4, 4, 2
    cfg = EPConfig(num_max_dispatch_tokens_per_rank=t4, use_int8_dispatch=False,
                   comm_backend="pallas_ragged")
    buf = Buffer(mesh4, "ep", num_experts=E, config=cfg)
    n = r * t4
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(E, k4, replace=False) for _ in range(n)]), jnp.int32)
    w = jnp.asarray(rng.random((n, k4)), jnp.float32)

    @jax.jit
    def both(x_, idx_, w_):
        # normal mode (prefill): dispatch -> identity experts -> combine
        xs, _, gs, h_n, _ = buf.dispatch(x_, idx_)
        norm_out = buf.combine(xs.astype(jnp.float32), w_, h_n,
                               out_dtype=jnp.float32)
        # low-latency mode (decode) in the SAME program
        rx, _, _, h_l, _ = buf.low_latency_dispatch(x_, idx_)
        ll_out = buf.low_latency_combine(rx.astype(jnp.float32) * 2.0, w_, h_l,
                                         out_dtype=jnp.float32)
        return norm_out, ll_out

    norm_out, ll_out = both(x, idx, w)
    golden_id = _golden_moe(x, idx, w, lambda e_, row: row)
    np.testing.assert_allclose(np.asarray(norm_out), golden_id,
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ll_out), 2.0 * golden_id,
                               rtol=1e-4, atol=1e-4)
