"""Hierarchical (layered) EP dispatch/combine over a (node, ici) mesh.

TPU-native equivalent of the reference's A2 *layered* low-latency mode
(`ops2/op_kernel/moe_distribute_dispatch_v2_layered.h`, selected by
`HCCL_INTRA_PCIE_ENABLE=1`, deep_ep.cpp:991-1000): tokens cross the slow
inter-node fabric ONCE per (token, destination node) — deduplicated across the
top-k experts that live on the same node — land on a *proxy* rank (the mirror
rank with the same intra-node index), and fan out to their expert ranks over the
fast intra-node fabric.  Combine reverses the route and reduces the k expert
outputs per node AT THE PROXY, so the slow hop carries one row per (token, node)
in both directions.

On TPU the two tiers are mesh axes: ``ici_axis`` (fast, intra-pod ICI) and
``node_axis`` (slow, DCN across pods) — "lay out shardings so collectives ride
ICI, not DCN".  Global rank = node * ranks_per_node + ici.  Experts are owned
contiguously by global rank (e // e_local_rank), matching ep_core.

Static shapes throughout (graph-capture-safe, zero host syncs).  Payloads travel
in the input dtype, or INT8 + traveling per-token scales on BOTH hops
(``use_int8=True`` — the reference's layered INT8 dispatch, QuantProcess,
moe_distribute_dispatch_v2.h:994).  The receiver-side packed layout is
IDENTICAL to ``ep_core.dispatch_core`` (`recv_x [E_local, R*seg, H]`), so
grouped GEMMs consume either path unchanged; :func:`dispatch_layered_normal`
adds the normal-mode (prefill) ragged variant — the A2 internode prefill
pipeline's role (`ops2/op_kernel/dispatch_normal_a2.cpp`) — whose sorted
compact output feeds ``ragged_dot``/``grouped_matmul`` directly.

Monitoring: ``monitor=True`` returns per-tier traffic stats (DCN rows per
destination node, ICI fan-out rows per destination rank, per-phase drop
counts) — the EPLB/diagnosis signals of the reference's layered stats.
With the default XLA-collective hops, wait-cost matrices do not exist (the
compiler owns the synchronization and a dead node hangs the collective);
``dcn_transport="monitored"`` (r5) moves the SLOW phase-1 hop onto the
one-sided bounded-poll window transport — timeout → abort → truncate plus
per-node wait/timeout stats, the reference A2 tree's TimeOutDetection on
exactly the fabric where it lives (``moe_distribute_dispatch_v2_layered.h``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _a2a(v, axis_name):
    if axis_name is None:  # degenerate axis (ranks_per_node == 1): identity
        return v
    return jax.lax.all_to_all(v, axis_name, split_axis=0, concat_axis=0, tiled=True)


class LayeredHandle(NamedTuple):
    """Per-rank state threaded from dispatch to combine (all local, all static)."""

    send_token: jax.Array     # [N, C1] source: token id of each phase-1 row (-1 dead)
    pair_node: jax.Array      # [T*K] source: destination node per (t,k) pair (N = invalid)
    pair_ok1: jax.Array       # [T*K] source: pair survived phase-1 capacity
    # proxy-side phase-2 plan (indexed by flat (row, k) pairs, rows = N*C1)
    p2_gather: jax.Array      # [N*C1*K] index into y_back flat layout at the proxy
    p2_ok: jax.Array          # [N*C1*K]
    p2_dest: jax.Array        # [N*C1*K] dest_slot in the final packed layout (-1 invalid)
    p2_dst_p: jax.Array       # [N*C1*K] destination ici rank (P = invalid)
    p2_send_slot: jax.Array   # [N*C1*K] row in the per-dst phase-2 send buffer


def _phase1_plan(topk_idx, *, num_experts, num_nodes, ranks_per_node, c1):
    """Dedup (token, dst-node) pairs into per-node phase-1 rows."""
    t, k = topk_idx.shape
    n = t * k
    e_local_rank = num_experts // (num_nodes * ranks_per_node)
    flat_e = topk_idx.reshape(n).astype(jnp.int32)
    valid = (flat_e >= 0) & (flat_e < num_experts)
    safe_e = jnp.where(valid, flat_e, 0)
    dst_node = (safe_e // e_local_rank) // ranks_per_node
    token = jnp.arange(n, dtype=jnp.int32) // k

    sentinel = num_nodes * t
    key = jnp.where(valid, dst_node * t + token, sentinel)
    order = jnp.argsort(key, stable=True)
    sk = key[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    left = jnp.searchsorted(sk, sk, side="left").astype(jnp.int32)
    is_first = pos == left                       # first pair of its (node, token)
    distinct_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    node_of = jnp.where(sk < sentinel, sk // t, num_nodes)
    bstart = jnp.searchsorted(node_of, node_of, side="left").astype(jnp.int32)
    row_in_node = distinct_id - distinct_id[bstart]
    row_ok = (sk < sentinel) & (row_in_node < c1)

    # back to original pair order
    def unsort(v, dtype=jnp.int32):
        return jnp.zeros(n, dtype).at[order].set(v)

    pair_node = unsort(jnp.where(sk < sentinel, node_of, num_nodes))
    pair_row = unsort(row_in_node)
    pair_ok = jnp.zeros(n, bool).at[order].set(row_ok)
    pair_first = jnp.zeros(n, bool).at[order].set(is_first & row_ok)
    n_dropped = jnp.sum((sk < sentinel) & ~row_ok).astype(jnp.int32)

    send_token = (
        jnp.full((num_nodes, c1), -1, jnp.int32)
        .at[jnp.where(pair_first, pair_node, num_nodes), pair_row]
        .set(token, mode="drop")
    )
    counts1 = jnp.sum(send_token >= 0, axis=1).astype(jnp.int32)
    return pair_node, pair_row, pair_ok, pair_first, send_token, counts1, n_dropped


def _phase2_plan(recv_topk, live_row, *, num_experts, num_nodes, ranks_per_node,
                 my_node, my_ici, c2, seg_capacity):
    """Proxy fan-out plan: (row, k) pairs owned by this node → (ici rank, slot,
    src-rank segment).  Segments are indexed by ORIGINAL global src rank — proxies
    at different ici indices carry disjoint src ranks, so local occurrence
    counting is globally consistent."""
    rows, k = recv_topk.shape                   # rows = N * C1
    c1 = rows // num_nodes
    m = rows * k
    p = ranks_per_node
    e_local_rank = num_experts // (num_nodes * p)
    flat_e = recv_topk.reshape(m).astype(jnp.int32)
    row_id = jnp.arange(m, dtype=jnp.int32) // k
    src_node = row_id // c1
    live = live_row.reshape(rows)[row_id]
    valid = live & (flat_e >= 0) & (flat_e < num_experts)
    safe_e = jnp.where(valid, flat_e, 0)
    owner = safe_e // e_local_rank
    valid &= (owner // p) == my_node
    dst_p = owner % p
    slot = safe_e % e_local_rank

    sentinel = p * e_local_rank * num_nodes
    key = jnp.where(valid, (dst_p * e_local_rank + slot) * num_nodes + src_node, sentinel)
    order = jnp.argsort(key, stable=True)
    sk = key[order]
    pos = jnp.arange(m, dtype=jnp.int32)
    idx_in_seg = pos - jnp.searchsorted(sk, sk, side="left").astype(jnp.int32)
    sdst = jnp.where(sk < sentinel, sk // (e_local_rank * num_nodes), p)
    idx_in_dst = pos - jnp.searchsorted(sdst, sdst, side="left").astype(jnp.int32)
    ok_s = (sk < sentinel) & (idx_in_seg < seg_capacity) & (idx_in_dst < c2)

    s_node = jnp.where(sk < sentinel, sk % num_nodes, 0)
    s_slot = jnp.where(sk < sentinel, (sk // num_nodes) % e_local_rank, 0)
    src_rank = s_node * p + my_ici
    num_ranks = num_nodes * p
    dest_slot = jnp.where(
        ok_s,
        s_slot * (num_ranks * seg_capacity) + src_rank * seg_capacity + idx_in_seg,
        -1,
    )
    # proxy-side y_back layout: [P(dst_p), e_local, N(src_node), seg]
    gather = jnp.where(
        ok_s,
        ((sdst * e_local_rank + s_slot) * num_nodes + s_node) * seg_capacity + idx_in_seg,
        0,
    )

    def unsort(v, dtype=jnp.int32):
        return jnp.zeros(m, dtype).at[order].set(v)

    return dict(
        dst_p=unsort(jnp.where(sk < sentinel, sdst, p)),
        send_slot=unsort(idx_in_dst),
        dest_slot=jnp.full(m, -1, jnp.int32).at[order].set(dest_slot),
        gather=unsort(gather),
        ok=jnp.zeros(m, bool).at[order].set(ok_s),
        row_id=row_id,
        n_dropped=jnp.sum((sk < sentinel) & ~ok_s).astype(jnp.int32),
    )


def dispatch_layered(
    x: jax.Array,
    topk_idx: jax.Array,
    *,
    node_axis: str,
    ici_axis: str,
    num_nodes: int,
    ranks_per_node: int,
    num_experts: int,
    phase1_capacity: int,
    phase2_capacity: int,
    seg_capacity: int,
    use_int8: bool = False,
    monitor: bool = False,
    dcn_transport: str = "xla",
    dcn_max_poll_rounds: int = 5_000_000,
    _dcn_inject_fault: bool = False,
    _dcn_force_sem_read: bool | None = None,
):
    """Two-tier dispatch (run inside shard_map over (node_axis, ici_axis)).

    Returns a dict: ``recv_x [E_local, R*seg, H]`` (ep_core-compatible packed
    layout; int8 when ``use_int8``, with ``recv_scales [E_local, R*seg]``),
    ``recv_count [E_local]``, ``recv_count_matrix [R, E_local]``,
    ``dcn_rows [N]`` (deduped inter-node rows actually sent — the bandwidth win),
    ``num_dropped``, ``handle``.

    ``use_int8``: per-token dynamic INT8 quant at the source; int8 rows + f32
    scales ride BOTH hops (the reference's layered INT8 dispatch;
    QuantProcess, moe_distribute_dispatch_v2.h:994).

    ``dcn_transport="monitored"`` (VERDICT r4 #7) replaces the phase-1 XLA
    collective with the one-sided bounded-poll window transport
    (pallas_a2a, over the node axis via MESH device ids): the slow inter-node
    hop — exactly where the reference's A2 tree puts its timeout machinery
    (``moe_distribute_dispatch_v2_layered.h`` TimeOutDetection) — gains
    timeout → abort → truncate semantics and per-node wait matrices
    (``stats["dcn_wait_cost"] [N]``, ``stats["dcn_timeout_flags"] [N]``).  A
    dead node then zeroes its recv rows instead of hanging the collective.
    All phase-1 payloads (rows, topk ids, scales) pack into ONE byte payload
    so a single ragged exchange carries the hop — which also moves only the
    deduped live rows over DCN instead of the full capacity.
    ``_dcn_inject_fault`` / ``_dcn_force_sem_read`` are the CI fault hooks
    (tests/test_layered.py dead-node test).
    """
    from sgl_kernel_npu_tpu.ops.quant import INT8_MAX, saturate_int8

    t, hidden = x.shape
    if use_int8:
        xf = x.astype(jnp.float32)
        tok_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / INT8_MAX, 1e-12)
        x = saturate_int8(xf / tok_scale[:, None])
    else:
        tok_scale = None
    k = topk_idx.shape[1]
    n_nodes, p = num_nodes, ranks_per_node
    num_ranks = n_nodes * p
    e_local = num_experts // num_ranks
    assert ici_axis is not None or p == 1, \
        "ici_axis=None requires ranks_per_node == 1"
    my_node = jax.lax.axis_index(node_axis)
    my_ici = (jax.lax.axis_index(ici_axis) if ici_axis is not None
              else jnp.int32(0))
    c1, c2 = phase1_capacity, phase2_capacity

    (pair_node, pair_row, pair_ok1, pair_first, send_token, counts1,
     drop1) = _phase1_plan(
        topk_idx, num_experts=num_experts, num_nodes=n_nodes,
        ranks_per_node=p, c1=c1)

    # ---- phase 1: one row per (token, node) over the slow axis ----
    tok = jnp.where(send_token >= 0, send_token, 0)
    send_x = jnp.where((send_token >= 0)[..., None], x[tok], 0).astype(x.dtype)
    send_tk = jnp.where(
        (send_token >= 0)[..., None],
        topk_idx.astype(jnp.int32)[tok],
        -1,
    )                                               # [N, C1, K]
    if use_int8:
        send_sc = jnp.where(send_token >= 0, tok_scale[tok], 0.0)[..., None]
    dcn_stats = None
    if dcn_transport == "monitored":
        from sgl_kernel_npu_tpu.parallel.pallas_a2a import (
            pallas_ragged_all_to_all,
        )

        def to_bytes(a):
            if a.dtype == jnp.int8:
                return a
            by = jax.lax.bitcast_convert_type(a, jnp.int8)
            return by.reshape(*a.shape[:-1], a.shape[-1] * by.shape[-1])

        def from_bytes(by, dtype, width):
            if dtype == jnp.int8:
                return by
            es = jnp.dtype(dtype).itemsize
            return jax.lax.bitcast_convert_type(
                by.reshape(*by.shape[:-1], width, es), dtype)

        h_bytes = hidden * jnp.dtype(x.dtype).itemsize
        parts = [to_bytes(send_x), to_bytes(send_tk)]
        if use_int8:
            parts.append(to_bytes(send_sc.astype(jnp.float32)))
        payload = jnp.concatenate(parts, axis=-1)   # [N, C1, B] int8
        # sub-axis one-sided DMA needs MESH device coords; with a single
        # rank per node the node index IS the logical id (and interpret mode
        # only supports that degenerate case — multi-axis meshes are
        # hardware-only for dma_start)
        recv_pay, rcnt1, stats6 = pallas_ragged_all_to_all(
            payload, counts1, axis_name=node_axis, num_ranks=n_nodes,
            mesh_axes=(node_axis, ici_axis) if ici_axis is not None else None,
            monitor=True,
            max_poll_rounds=dcn_max_poll_rounds,
            inject_send_fault=_dcn_inject_fault,
            force_sem_read=_dcn_force_sem_read)
        # rows past a source's recv count (incl. all rows of a timed-out
        # node) are garbage: truncate them to dead rows
        live1 = (jnp.arange(c1, dtype=jnp.int32)[None, :]
                 < rcnt1[:, None])                  # [N, C1]
        recv_x1 = jnp.where(
            live1[..., None],
            from_bytes(recv_pay[..., :h_bytes], x.dtype, hidden), 0)
        recv_tk = jnp.where(
            live1[..., None],
            from_bytes(recv_pay[..., h_bytes:h_bytes + 4 * k], jnp.int32, k),
            -1)
        if use_int8:
            recv_sc1 = jnp.where(
                live1[..., None],
                from_bytes(recv_pay[..., h_bytes + 4 * k:], jnp.float32, 1),
                0.0)
        dcn_stats = stats6
    else:
        recv_x1 = _a2a(send_x, node_axis)           # [N, C1, H] at the proxy
        recv_tk = _a2a(send_tk, node_axis)          # [N, C1, K]
        if use_int8:
            recv_sc1 = _a2a(send_sc.astype(jnp.float32), node_axis)
    live_row = (recv_tk >= 0).any(axis=-1)          # [N, C1]

    # ---- phase 2: proxy fan-out over the fast axis ----
    plan2 = _phase2_plan(
        recv_tk.reshape(n_nodes * c1, k), live_row,
        num_experts=num_experts, num_nodes=n_nodes, ranks_per_node=p,
        my_node=my_node, my_ici=my_ici, c2=c2, seg_capacity=seg_capacity)
    rows_flat = recv_x1.reshape(n_nodes * c1, hidden)
    payload2 = rows_flat[plan2["row_id"]]
    dst = jnp.where(plan2["ok"], plan2["dst_p"], p)
    send2 = (
        jnp.zeros((p, c2, hidden), x.dtype)
        .at[dst, plan2["send_slot"]]
        .set(payload2.astype(x.dtype), mode="drop")
    )
    meta2 = (
        jnp.full((p, c2), -1, jnp.int32)
        .at[dst, plan2["send_slot"]]
        .set(plan2["dest_slot"], mode="drop")
    )
    recv_x2 = _a2a(send2, ici_axis)                 # [P, C2, H]
    recv_meta2 = _a2a(meta2, ici_axis)              # [P, C2]

    n_slots = e_local * num_ranks * seg_capacity
    packed = (
        jnp.zeros((n_slots, hidden), x.dtype)
        .at[recv_meta2.reshape(-1)]
        .set(recv_x2.reshape(-1, hidden), mode="drop")
        .reshape(e_local, num_ranks * seg_capacity, hidden)
    )
    recv_scales = None
    if use_int8:
        sc2 = (
            jnp.zeros((p, c2), jnp.float32)
            .at[dst, plan2["send_slot"]]
            .set(recv_sc1.reshape(-1)[plan2["row_id"]], mode="drop")
        )
        recv_sc2 = _a2a(sc2, ici_axis)              # [P, C2]
        recv_scales = (
            jnp.zeros((n_slots,), jnp.float32)
            .at[recv_meta2.reshape(-1)]
            .set(recv_sc2.reshape(-1), mode="drop")
            .reshape(e_local, num_ranks * seg_capacity)
        )

    # per-(dst_p, slot, src_node) counts → receiver count matrix [R, E_local]
    cnt_key = jnp.where(
        plan2["ok"],
        (plan2["dst_p"] * e_local
         + jnp.where(plan2["dest_slot"] >= 0,
                     plan2["dest_slot"] // (num_ranks * seg_capacity), 0))
        * n_nodes
        + plan2["row_id"] // c1,
        p * e_local * n_nodes,
    )
    cnt = (
        jnp.zeros((p * e_local * n_nodes,), jnp.int32)
        .at[cnt_key]
        .add(1, mode="drop")
        .reshape(p, e_local * n_nodes)
    )
    cnt_back = _a2a(cnt, ici_axis).reshape(p, e_local, n_nodes)  # [P(proxy), E_l, N]
    # entry (p', slot, s) = tokens from global rank s*P+p' into my slot
    matrix = (
        jnp.zeros((num_ranks, e_local), jnp.int32)
        .at[jnp.arange(n_nodes)[None, :] * p + jnp.arange(p)[:, None], :]
        .add(cnt_back.transpose(0, 2, 1))
    )

    handle = LayeredHandle(
        send_token=send_token,
        pair_node=pair_node,
        pair_ok1=pair_ok1,
        p2_gather=plan2["gather"],
        p2_ok=plan2["ok"],
        p2_dest=plan2["dest_slot"],
        p2_dst_p=plan2["dst_p"],
        p2_send_slot=plan2["send_slot"],
    )
    out = {
        "recv_x": packed,
        "recv_count": matrix.sum(axis=0),
        "recv_count_matrix": matrix,
        "dcn_rows": counts1,
        "num_dropped": drop1 + plan2["n_dropped"],
        "handle": handle,
    }
    if use_int8:
        out["recv_scales"] = recv_scales
    if monitor:
        # per-tier traffic + drop stats (see module docstring: wait matrices
        # don't exist on XLA-collective hops; traffic/drop/EPLB signals do)
        ici_rows = (
            jnp.zeros((p,), jnp.int32)
            .at[jnp.where(plan2["ok"], plan2["dst_p"], p)]
            .add(1, mode="drop")
        )
        out["stats"] = {
            "dcn_send_rows": counts1,          # [N] deduped rows per dst node
            "ici_send_rows": ici_rows,         # [P] fan-out rows per dst rank
            "dropped_phase1": drop1,
            "dropped_phase2": plan2["n_dropped"],
        }
        if dcn_stats is not None:
            # one-sided DCN hop (dcn_transport="monitored"): per-source-node
            # wait matrices + timeout flags — the A2 layered tree's
            # TimeOutDetection surface
            out["stats"]["dcn_wait_cost"] = dcn_stats[:, 0]
            out["stats"]["dcn_timeout_flags"] = (
                dcn_stats[:, 1] | dcn_stats[:, 4])
            out["stats"]["dcn_abort_observed"] = dcn_stats[:, 2]
    return out


def dispatch_layered_normal(
    x: jax.Array,
    topk_idx: jax.Array,
    *,
    node_axis: str,
    ici_axis: str,
    num_nodes: int,
    ranks_per_node: int,
    num_experts: int,
    phase1_capacity: int,
    phase2_capacity: int,
    seg_capacity: int,
    use_int8: bool = False,
    monitor: bool = False,
    dcn_transport: str = "xla",
    dcn_max_poll_rounds: int = 5_000_000,
    _dcn_inject_fault: bool = False,
    _dcn_force_sem_read: bool | None = None,
):
    """Layered NORMAL-mode (prefill) dispatch: two-tier route, ragged output.

    The A2 internode prefill pipeline's role
    (`ops2/op_kernel/dispatch_normal_a2.cpp`, `notify_dispatch_a2.h`) —
    high-token-count dispatch whose output is the expert-sorted compact
    layout, exactly ``ep_core.dispatch_ragged_core``'s contract:

    Returns dict with ``recv_x_sorted [E_local·R·seg, H]`` (rows grouped by
    local expert, zero past the live rows), ``recv_scales_sorted`` (int8 mode),
    ``group_sizes [E_local]`` (feeds ``grouped_matmul``/``ragged_dot``
    directly), ``recv_count_matrix``, ``dcn_rows``, ``num_dropped``,
    ``handle`` (for :func:`combine_layered_normal`), and ``stats`` when
    monitored.
    """
    res = dispatch_layered(
        x, topk_idx, node_axis=node_axis, ici_axis=ici_axis,
        num_nodes=num_nodes, ranks_per_node=ranks_per_node,
        num_experts=num_experts, phase1_capacity=phase1_capacity,
        phase2_capacity=phase2_capacity, seg_capacity=seg_capacity,
        use_int8=use_int8, monitor=monitor, dcn_transport=dcn_transport,
        dcn_max_poll_rounds=dcn_max_poll_rounds,
        _dcn_inject_fault=_dcn_inject_fault,
        _dcn_force_sem_read=_dcn_force_sem_read)
    num_ranks = num_nodes * ranks_per_node
    e_local = num_experts // num_ranks
    hidden = x.shape[1]
    cap = e_local * num_ranks * seg_capacity
    counts = res["recv_count_matrix"]                  # [R, E_local]
    seg_pos = jnp.arange(seg_capacity, dtype=jnp.int32)
    # packed layout: per-(expert, src) segments with live rows at the start
    occ = seg_pos[None, None, :] < counts.T[:, :, None]   # [E_local, R, seg]
    occ_flat = occ.reshape(-1)
    tgt = jnp.cumsum(occ_flat.astype(jnp.int32)) - 1
    tgt = jnp.where(occ_flat, jnp.minimum(tgt, cap - 1), cap)
    flat_x = res["recv_x"].reshape(-1, hidden)
    sorted_x = (
        jnp.zeros((cap, hidden), flat_x.dtype).at[tgt].set(flat_x, mode="drop")
    )
    out = {
        "recv_x_sorted": sorted_x,
        "group_sizes": res["recv_count"],
        "recv_count_matrix": counts,
        "dcn_rows": res["dcn_rows"],
        "num_dropped": res["num_dropped"],
        "handle": (res["handle"], tgt),
    }
    if use_int8:
        out["recv_scales_sorted"] = (
            jnp.zeros((cap,), jnp.float32)
            .at[tgt]
            .set(res["recv_scales"].reshape(-1), mode="drop")
        )
    if monitor:
        out["stats"] = res["stats"]
    return out


def combine_layered_normal(
    y_sorted: jax.Array,
    topk_weights: jax.Array,
    handle,
    *,
    node_axis: str,
    ici_axis: str,
    num_nodes: int,
    ranks_per_node: int,
    seg_capacity: int,
    num_tokens: int,
    out_dtype=None,
):
    """Normal-mode combine: expert outputs in the SORTED compact layout are
    scattered back to the packed per-segment layout, then ride the two-tier
    reduce of :func:`combine_layered` (proxy-side reduction before DCN)."""
    lhandle, tgt = handle
    cap, hidden = y_sorted.shape
    num_ranks = num_nodes * ranks_per_node
    e_local = cap // (num_ranks * seg_capacity)
    y_pad = jnp.concatenate(
        [y_sorted, jnp.zeros((1, hidden), y_sorted.dtype)], axis=0)
    packed = jnp.take(y_pad, tgt, axis=0).reshape(
        e_local, num_ranks * seg_capacity, hidden)
    return combine_layered(
        packed, topk_weights, lhandle,
        node_axis=node_axis, ici_axis=ici_axis, num_nodes=num_nodes,
        ranks_per_node=ranks_per_node, seg_capacity=seg_capacity,
        num_tokens=num_tokens, out_dtype=out_dtype)


def combine_layered(
    y: jax.Array,
    topk_weights: jax.Array,
    handle: LayeredHandle,
    *,
    node_axis: str,
    ici_axis: str,
    num_nodes: int,
    ranks_per_node: int,
    seg_capacity: int,
    num_tokens: int,
    out_dtype=None,
):
    """Two-tier combine: expert outputs ride ICI to the proxy, which reduces the
    per-node partial sum BEFORE the slow hop (one row per (token, node) on DCN).

    ``y``: [E_local, R*seg, H]; ``topk_weights``: [T, K].  Returns [T, H].
    """
    e_local, slots, hidden = y.shape
    n_nodes, p = num_nodes, ranks_per_node
    num_ranks = n_nodes * p
    assert slots == num_ranks * seg_capacity
    out_dtype = out_dtype or y.dtype
    t, k = topk_weights.shape
    c1 = handle.send_token.shape[1]

    # weights forward over the slow axis (small: K floats per phase-1 row)
    tok = jnp.where(handle.send_token >= 0, handle.send_token, 0)
    w1 = jnp.where(
        (handle.send_token >= 0)[..., None],
        topk_weights.astype(jnp.float32)[tok],
        0.0,
    )                                               # [N, C1, K]
    w_recv = _a2a(w1, node_axis)                    # [N, C1, K] at the proxy

    # expert outputs back over the fast axis, regrouped by proxy (src ici index)
    y_by_proxy = (
        y.reshape(e_local, n_nodes, p, seg_capacity, hidden)
        .transpose(2, 0, 1, 3, 4)                   # [P, E_l, N, seg, H]
    )
    y_back = _a2a(y_by_proxy, ici_axis)             # [P(dst_p), E_l, N, seg, H]
    flat = y_back.reshape(-1, hidden)
    picked = flat[handle.p2_gather]                 # [N*C1*K, H]
    w_pair = jnp.where(
        handle.p2_ok, w_recv.reshape(-1), 0.0
    )                                               # [N*C1*K]
    partial = (
        jnp.zeros((n_nodes * c1, hidden), jnp.float32)
        .at[jnp.arange(picked.shape[0], dtype=jnp.int32) // k]
        .add(picked.astype(jnp.float32) * w_pair[:, None])
        .reshape(n_nodes, c1, hidden)
    )

    # partial sums back over the slow axis, then reduce per source token
    back = _a2a(partial, node_axis)                 # [N, C1, H] at the source
    out = (
        jnp.zeros((t, hidden), jnp.float32)
        .at[jnp.where(handle.send_token >= 0, handle.send_token, t)]
        .add(back, mode="drop")
    )
    return out.astype(out_dtype)
