"""Hierarchical (layered) EP dispatch/combine on a (node=2, ici=4) virtual mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel import layered

N_NODES, RPN = 2, 4
R = N_NODES * RPN
E = 16
E_LOCAL = E // R
T, K, H = 16, 4, 32


def _mesh():
    devs = np.array(jax.devices()[:R]).reshape(N_NODES, RPN)
    return Mesh(devs, ("node", "ici"))


def _run(x_all, topk_all, c1=T, c2=N_NODES * T * K, seg=T):
    """dispatch → per-expert scale → combine, inside one shard_map."""

    def body(x, tk):                             # per-rank views [T, H] / [T, K]
        d = layered.dispatch_layered(
            x, tk, node_axis="node", ici_axis="ici", num_nodes=N_NODES,
            ranks_per_node=RPN, num_experts=E, phase1_capacity=c1,
            phase2_capacity=c2, seg_capacity=seg)
        rank = jax.lax.axis_index("node") * RPN + jax.lax.axis_index("ici")
        eid = rank * E_LOCAL + jnp.arange(E_LOCAL)
        y = d["recv_x"].astype(jnp.float32) * (eid[:, None, None] + 1.0)
        out = layered.combine_layered(
            y, jnp.ones((T, K), jnp.float32) / K, d["handle"],
            node_axis="node", ici_axis="ici", num_nodes=N_NODES,
            ranks_per_node=RPN, seg_capacity=seg, num_tokens=T,
            out_dtype=jnp.float32)
        return out, d["dcn_rows"], d["recv_count"], d["num_dropped"][None]

    mesh = _mesh()
    f = jax.jit(functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(("node", "ici")), P(("node", "ici"))),
        out_specs=(P(("node", "ici")),) * 4,
        check_vma=False,
    )(body))
    return f(x_all, topk_all)


def test_layered_matches_dense_golden(rng):
    x_all = jnp.asarray(rng.standard_normal((R * T, H)), jnp.float32)
    topk_all = jnp.asarray(
        np.stack([rng.choice(E, size=K, replace=False) for _ in range(R * T)]),
        jnp.int32)
    out, dcn_rows, counts, dropped = _run(x_all, topk_all)
    assert int(jnp.asarray(dropped).sum()) == 0
    # golden: out[t] = mean_k (e_k + 1) * x[t]
    scale = (np.asarray(topk_all) + 1.0).mean(axis=1)
    want = np.asarray(x_all) * scale[:, None]
    np.testing.assert_allclose(np.asarray(out).reshape(R * T, H), want,
                               rtol=1e-5, atol=1e-5)
    # every routed token lands exactly once
    assert int(jnp.asarray(counts).sum()) == R * T * K


def test_layered_dedups_dcn_rows(rng):
    """Top-k pairs clustered on one node cross DCN once per (token, node)."""
    x_all = jnp.asarray(rng.standard_normal((R * T, H)), jnp.float32)
    # each token picks K experts all on ONE node (expert ids 0..E/2-1 = node 0)
    node_of = rng.integers(0, N_NODES, R * T)
    picks = np.stack([
        rng.choice(E // N_NODES, size=K, replace=False) + n * (E // N_NODES)
        for n in node_of
    ])
    topk_all = jnp.asarray(picks, jnp.int32)
    out, dcn_rows, counts, dropped = _run(x_all, topk_all)
    assert int(jnp.asarray(dropped).sum()) == 0
    total_pairs = R * T * K
    total_dcn = int(jnp.asarray(dcn_rows).sum())
    assert total_dcn == R * T              # ONE dcn row per token, not K
    assert total_dcn * K == total_pairs
    scale = (np.asarray(topk_all) + 1.0).mean(axis=1)
    want = np.asarray(x_all) * scale[:, None]
    np.testing.assert_allclose(np.asarray(out).reshape(R * T, H), want,
                               rtol=1e-5, atol=1e-5)


def test_layered_int8_dispatch(rng):
    """INT8 rows + traveling scales on both hops dequantize to ~the bf16 result."""
    x_all = jnp.asarray(rng.standard_normal((R * T, H)), jnp.float32)
    topk_all = jnp.asarray(
        np.stack([rng.choice(E, size=K, replace=False) for _ in range(R * T)]),
        jnp.int32)

    def body(x, tk):
        d = layered.dispatch_layered(
            x, tk, node_axis="node", ici_axis="ici", num_nodes=N_NODES,
            ranks_per_node=RPN, num_experts=E, phase1_capacity=T,
            phase2_capacity=N_NODES * T * K, seg_capacity=T, use_int8=True)
        rank = jax.lax.axis_index("node") * RPN + jax.lax.axis_index("ici")
        eid = rank * E_LOCAL + jnp.arange(E_LOCAL)
        deq = d["recv_x"].astype(jnp.float32) * d["recv_scales"][..., None]
        y = deq * (eid[:, None, None] + 1.0)
        out = layered.combine_layered(
            y, jnp.ones((T, K), jnp.float32) / K, d["handle"],
            node_axis="node", ici_axis="ici", num_nodes=N_NODES,
            ranks_per_node=RPN, seg_capacity=T, num_tokens=T,
            out_dtype=jnp.float32)
        return out

    mesh = _mesh()
    f = jax.jit(functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(("node", "ici")), P(("node", "ici"))),
        out_specs=P(("node", "ici")), check_vma=False)(body))
    out = np.asarray(f(x_all, topk_all)).reshape(R * T, H)
    scale = (np.asarray(topk_all) + 1.0).mean(axis=1)
    want = np.asarray(x_all) * scale[:, None]
    rel = np.abs(out - want).max() / np.abs(want).max()
    assert rel < 2e-2                      # int8 per-token quant error bound


def test_layered_normal_prefill_roundtrip(rng):
    """Normal-mode (prefill ragged) layered path: sorted compact output feeds a
    grouped-GEMM-shaped consumer, combine returns the golden result, and the
    monitored stats surface reports per-tier traffic (VERDICT r3 #7; reference
    A2 internode prefill, ops2/op_kernel/dispatch_normal_a2.cpp)."""
    x_all = jnp.asarray(rng.standard_normal((R * T, H)), jnp.float32)
    topk_all = jnp.asarray(
        np.stack([rng.choice(E, size=K, replace=False) for _ in range(R * T)]),
        jnp.int32)

    def body(x, tk):
        d = layered.dispatch_layered_normal(
            x, tk, node_axis="node", ici_axis="ici", num_nodes=N_NODES,
            ranks_per_node=RPN, num_experts=E, phase1_capacity=T,
            phase2_capacity=N_NODES * T * K, seg_capacity=T,
            use_int8=True, monitor=True)
        rank = jax.lax.axis_index("node") * RPN + jax.lax.axis_index("ici")
        eid = rank * E_LOCAL + jnp.arange(E_LOCAL)
        # per-row expert id in the sorted layout (from group_sizes): the shape
        # a ragged grouped GEMM consumes
        gs = d["group_sizes"]
        bounds = jnp.cumsum(gs)
        row = jnp.arange(d["recv_x_sorted"].shape[0], dtype=jnp.int32)
        e_of_row = jnp.searchsorted(bounds, row, side="right")
        live = row < bounds[-1]
        deq = (d["recv_x_sorted"].astype(jnp.float32)
               * d["recv_scales_sorted"][:, None])
        y = jnp.where(
            live[:, None],
            deq * (eid[jnp.clip(e_of_row, 0, E_LOCAL - 1)][:, None] + 1.0),
            0.0)
        out = layered.combine_layered_normal(
            y, jnp.ones((T, K), jnp.float32) / K, d["handle"],
            node_axis="node", ici_axis="ici", num_nodes=N_NODES,
            ranks_per_node=RPN, seg_capacity=T, num_tokens=T,
            out_dtype=jnp.float32)
        st = d["stats"]
        return (out, gs[None], d["num_dropped"][None],
                st["dcn_send_rows"][None], st["ici_send_rows"][None])

    mesh = _mesh()
    f = jax.jit(functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(("node", "ici")), P(("node", "ici"))),
        out_specs=(P(("node", "ici")),) * 5, check_vma=False)(body))
    out, gs, dropped, dcn_rows, ici_rows = f(x_all, topk_all)
    assert int(jnp.asarray(dropped).sum()) == 0
    # every routed pair lands exactly once in the ragged layout
    assert int(jnp.asarray(gs).sum()) == R * T * K
    # stats: ICI fan-out carries every pair; DCN carries the deduped rows
    assert int(jnp.asarray(ici_rows).sum()) == R * T * K
    assert int(jnp.asarray(dcn_rows).sum()) <= R * T * K
    scale = (np.asarray(topk_all) + 1.0).mean(axis=1)
    want = np.asarray(x_all) * scale[:, None]
    rel = np.abs(np.asarray(out).reshape(R * T, H) - want).max() / np.abs(want).max()
    assert rel < 2e-2                      # int8 per-token quant error bound


def test_layered_topk_minus_one_drops(rng):
    """topk = -1 entries are inactive (reference MOE_ENABLE_TOPK_NEG_ONE)."""
    x_all = jnp.asarray(rng.standard_normal((R * T, H)), jnp.float32)
    picks = np.stack([rng.choice(E, size=K, replace=False) for _ in range(R * T)])
    picks[:, -1] = -1                      # last expert slot inactive everywhere
    topk_all = jnp.asarray(picks, jnp.int32)
    out, dcn_rows, counts, dropped = _run(x_all, topk_all)
    assert int(jnp.asarray(dropped).sum()) == 0
    w = np.where(picks >= 0, 1.0 / K, 0.0)
    scale = ((picks + 1.0) * w).sum(axis=1)
    want = np.asarray(x_all) * scale[:, None]
    np.testing.assert_allclose(np.asarray(out).reshape(R * T, H), want,
                               rtol=1e-5, atol=1e-5)
    assert int(jnp.asarray(counts).sum()) == R * T * (K - 1)


def test_layered_dcn_monitored_roundtrip(rng):
    """dcn_transport='monitored': the one-sided window transport on the node
    axis produces identical results to the XLA-collective hop (no faults).

    Runs at ranks_per_node=1 over a pure node mesh (ici_axis=None): the
    interpret simulator only supports one-sided DMA on single-axis meshes, so
    the multi-rank-per-node MESH-id path is hardware-only (layered.py note)."""
    import functools

    ln, lp = 8, 1
    le, lt, lk, lh = 16, 4, 3, 64
    x = jnp.asarray(rng.standard_normal((ln * lp * lt, lh)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(le, lk, replace=False)
                  for _ in range(ln * lp * lt)]), jnp.int32)

    def run(transport):
        def body(xv, iv):
            d = layered.dispatch_layered(
                xv, iv, node_axis="node", ici_axis=None, num_nodes=ln,
                ranks_per_node=lp, num_experts=le, phase1_capacity=lt * lk,
                phase2_capacity=ln * lt * lk, seg_capacity=lt * lk,
                use_int8=True, monitor=True, dcn_transport=transport)
            tf = (d["stats"].get("dcn_timeout_flags", jnp.zeros((ln,), jnp.int32)))
            return d["recv_x"], d["recv_scales"], d["recv_count"], tf[None]
        m = Mesh(np.array(jax.devices()[:ln]), ("node",))
        return jax.jit(functools.partial(
            jax.shard_map, mesh=m,
            in_specs=(P("node"),) * 2,
            out_specs=(P("node"),) * 4, check_vma=False,
        )(body))(x, idx)

    rx_x, rs_x, rc_x, _ = run("xla")
    rx_m, rs_m, rc_m, tf = run("monitored")
    np.testing.assert_array_equal(np.asarray(rc_x), np.asarray(rc_m))
    np.testing.assert_array_equal(np.asarray(tf), 0)
    # identical packed payloads on the live slots
    live = np.asarray(rs_x) != 0
    np.testing.assert_array_equal(
        np.asarray(rx_x)[live], np.asarray(rx_m)[live])
    np.testing.assert_allclose(
        np.asarray(rs_x)[live], np.asarray(rs_m)[live], rtol=1e-6)


def test_layered_dcn_timeout_dead_node(rng):
    """Dead-node drill on the DCN hop (VERDICT r4 #7): every node muted
    (inject_send_fault) + bounded polls forced on → the timeout fires, abort
    propagates, and recv rows truncate to zero instead of hanging the job —
    the A2 layered tree's TimeOutDetection → abort semantics."""
    import functools

    ln, lp = 8, 1
    le, lt, lk, lh = 16, 4, 2, 64
    x = jnp.asarray(rng.standard_normal((ln * lp * lt, lh)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(le, lk, replace=False)
                  for _ in range(ln * lp * lt)]), jnp.int32)

    def body(xv, iv):
        d = layered.dispatch_layered(
            xv, iv, node_axis="node", ici_axis=None, num_nodes=ln,
            ranks_per_node=lp, num_experts=le, phase1_capacity=lt * lk,
            phase2_capacity=ln * lt * lk, seg_capacity=lt * lk,
            use_int8=True, monitor=True, dcn_transport="monitored",
            dcn_max_poll_rounds=64, _dcn_inject_fault=True,
            _dcn_force_sem_read=True)
        st = d["stats"]
        return (d["recv_count"],
                st["dcn_timeout_flags"][None],
                st["dcn_wait_cost"][None])

    m = Mesh(np.array(jax.devices()[:ln]), ("node",))
    rc, tf, wc = jax.jit(functools.partial(
        jax.shard_map, mesh=m,
        in_specs=(P("node"),) * 2,
        out_specs=(P("node"),) * 3, check_vma=False,
    )(body))(x, idx)
    # every (rank, src-node) wait flagged, counts truncated to zero; the
    # FIRST timeout burns the full poll budget, then its abort broadcast
    # short-circuits the remaining waits after ~1 poll (abort semantics)
    wcm = np.asarray(wc).reshape(ln * lp, ln)
    assert np.asarray(tf).reshape(ln * lp, ln).all()
    assert (wcm.max(axis=1) >= 64).all() and (wcm >= 1).all()
    np.testing.assert_array_equal(np.asarray(rc), 0)
