"""Expert-parallel dispatch/combine core (per-rank SPMD functions).

DeepEP-equivalent token all-to-all, redesigned for TPU/XLA rather than translated from
the reference's HCCL-window kernels (csrc/deepep/ops/op_kernel/
moe_distribute_dispatch_v2.h, cam_moe_dispatch_normal.h):

Reference mechanism                     → TPU-native design here
--------------------------------------------------------------------------------------
one-sided window writes + flag spin     → ``lax.all_to_all`` over the mesh axis (XLA
                                           schedules ICI DMAs; no flags needed — the
                                           collective IS the synchronization)
receiver-sized outputs via CPU sync     → static worst-case capacities (the reference's
  (total_recv_token.item())               own ``num_max_dispatch_tokens_per_rank``
                                           graph-capture mode, buffer.py:279,699, made
                                           the *only* mode — zero host syncs, always
                                           jit/scan-safe)
per-token INT8 quant in the send loop   → per-token INT8 quant fused into send-buffer
  (QuantProcess, dispatch_v2.h:994)       packing; scales travel with payloads
(rank,token,topk) triples in the window → a single int32 ``dest_slot`` per send row;
                                           the receiver is a pure scatter
combine re-walks routing metadata       → combine is a pure *gather*: the dispatch-time
                                           sort already computed every (t,k) pair's
                                           position in the returned expert layout, and
                                           the handle carries those indices.  Nothing
                                           on the decode-critical combine path sorts.

All functions in this module take the *per-rank view* of arrays and must be called
inside ``jax.shard_map`` over the EP mesh axis (see parallel/buffer.py for the user
API).  Everything is shape-static: the same code path is prefill ("normal") and decode
("low latency"); they differ only in capacities and output layout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.quant import INT8_MAX, saturate_int8, wire_quant
from sgl_kernel_npu_tpu.parallel.pallas_a2a import (
    pallas_all_to_all,
    pallas_ragged_all_to_all,
)


def _make_a2a(axis_name: str, num_ranks: int, backend: str):
    """Transport selector: XLA collective or the Pallas one-sided window backend.

    "pallas_ragged" only differs on the dispatch payload path (handled inside
    ``dispatch_core``); dense exchanges (combine, counts) use the fixed-size
    window kernel for it.  Collective ids come from the central allocator
    (collective_ids.next_collective_id) at trace time — distinct per call site.
    """
    if backend in ("pallas", "pallas_ragged"):

        def a2a(v):
            return pallas_all_to_all(v, axis_name=axis_name, num_ranks=num_ranks)

        return a2a
    if backend != "xla":
        raise ValueError(
            f"unknown comm backend {backend!r}; expected 'xla', 'pallas', or 'pallas_ragged'"
        )
    return lambda v: jax.lax.all_to_all(v, axis_name, split_axis=0, concat_axis=0, tiled=True)


class RoutingPlan(NamedTuple):
    """Source-side routing decisions for one batch (all shapes static).

    Every field indexed by the flattened (token, k) pairs in *original* order.
    """

    dst_rank: jax.Array        # [T*K] destination rank (R = dropped sentinel)
    send_slot: jax.Array       # [T*K] row in the per-dst send buffer
    dest_slot: jax.Array       # [T*K] slot in receiver packed layout, -1 invalid
    gather_idx: jax.Array      # [T*K] index into combine's y_back flat layout
    ok: jax.Array              # [T*K] bool: survives routing + capacity
    src_token: jax.Array       # [T*K] local token id
    counts_per_expert: jax.Array  # [E] tokens this rank sends to each global expert
    num_dropped: jax.Array     # [] capacity-overflow drops (EPLB/diagnostic signal)
    send_pos: jax.Array        # [T*K] row in the COMPACT (dst, slot)-sorted send
    #                            layout (ok rows packed from 0; dropped rows = n)


class DispatchHandle(NamedTuple):
    """Opaque handle returned by dispatch, consumed by combine (reference: the
    ``handle`` tuple of buffer.py:676/779)."""

    gather_idx: jax.Array      # [T, K]
    ok: jax.Array              # [T, K]
    recv_sort_order: jax.Array | None  # [R*C] receiver expert-sort permutation (normal mode)
    recv_valid_count: jax.Array | None  # [] valid recv rows (normal mode)
    sent_counts: jax.Array | None = None  # [R, E_local] rows this rank sent to (dst, e)
    recv_counts: jax.Array | None = None  # [R, E_local] rows received from (src, e)


def make_routing_plan(
    topk_idx: jax.Array,
    *,
    num_experts: int,
    num_ranks: int,
    my_rank: jax.Array,
    pair_capacity: int,
    seg_capacity: int,
    rank_remap: jax.Array | None = None,
    expert_owner: jax.Array | None = None,
    expert_slot: jax.Array | None = None,
    num_local_slots: int | None = None,
) -> RoutingPlan:
    """One stable sort → every routing decision for this batch.

    ``pair_capacity`` bounds rows sent from this rank to one destination rank;
    ``seg_capacity`` bounds rows landing in one (expert, src-rank) segment of the
    receiver's packed layout (= max tokens per rank, since topk experts are distinct).

    ``rank_remap`` (optional ``[num_ranks]`` int32) maps logical expert-owner ranks
    to surviving physical ranks — the reference's elastic scale-down ``elastic_info``
    (moe_distribute_dispatch_v2.h:270 InitElasticInfo, remap at :581-582,673-675).
    Entries < 0 mark dead ranks: their experts' tokens are dropped (counted).

    ``expert_owner``/``expert_slot`` (optional ``[E_total]`` int32, E_total ≥
    num_experts) give a fully general expert→(rank, local slot) placement —
    used for shared-expert ranks (virtual expert ids ≥ num_experts address the
    shared-expert slots, reference MOE_SHARED_EXPERT_RANK_NUM, deep_ep.cpp:48).
    """
    t, k = topk_idx.shape
    n = t * k
    e_local = num_experts // num_ranks
    slots = num_local_slots or e_local  # local slots per rank in the packed layout
    flat_e = topk_idx.reshape(n).astype(jnp.int32)
    if expert_owner is not None:
        e_total = expert_owner.shape[0]
        valid = (flat_e >= 0) & (flat_e < e_total)
        safe_e = jnp.where(valid, flat_e, 0)
        dst0 = expert_owner.astype(jnp.int32)[safe_e]
        slot0 = expert_slot.astype(jnp.int32)[safe_e]
    else:
        valid = flat_e >= 0
        safe_e = jnp.where(valid, flat_e, 0)
        dst0 = safe_e // e_local
        slot0 = safe_e % e_local
    dead_drops = jnp.int32(0)
    if rank_remap is not None:
        new_rank = rank_remap.astype(jnp.int32)[dst0]
        dead_drops = jnp.sum(valid & (new_rank < 0)).astype(jnp.int32)
        valid &= new_rank >= 0
        dst0 = new_rank

    # composite sort key groups by (dst rank, local slot); sentinel = R*slots
    sentinel = num_ranks * slots
    key = jnp.where(valid, dst0 * slots + slot0, sentinel)

    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    # occurrence index within the (dst, slot) bucket / within the dst-rank bucket
    idx_in_expert = pos - jnp.searchsorted(sorted_key, sorted_key, side="left").astype(jnp.int32)
    sorted_dst = jnp.where(sorted_key < sentinel, sorted_key // slots, num_ranks)
    idx_in_dst = pos - jnp.searchsorted(sorted_dst, sorted_dst, side="left").astype(jnp.int32)

    sorted_valid = sorted_key < sentinel
    ok_sorted = sorted_valid & (idx_in_dst < pair_capacity) & (idx_in_expert < seg_capacity)
    num_dropped = jnp.sum(sorted_valid & ~ok_sorted) + dead_drops

    slot_id = jnp.where(sorted_valid, sorted_key % slots, 0)
    dest_slot_sorted = jnp.where(
        ok_sorted,
        slot_id * (num_ranks * seg_capacity) + my_rank * seg_capacity + idx_in_expert,
        -1,
    )
    # combine gathers from y_back [R, slots, seg] (flattened)
    gather_sorted = jnp.where(
        ok_sorted,
        sorted_dst * (slots * seg_capacity) + slot_id * seg_capacity + idx_in_expert,
        0,
    )

    # position in the ok-compacted sorted layout (the "normal mode" compact send
    # buffer: rows packed from 0 in (dst, slot) order; dropped rows park at n)
    send_pos_sorted = jnp.where(
        ok_sorted, jnp.cumsum(ok_sorted.astype(jnp.int32)) - 1, n
    )

    # un-sort back to original (t, k) order
    def unsort(v, fill=0):
        return jnp.zeros(n, v.dtype).at[order].set(v)

    plan = RoutingPlan(
        dst_rank=unsort(sorted_dst),
        send_slot=unsort(idx_in_dst),
        dest_slot=unsort(dest_slot_sorted),
        gather_idx=unsort(gather_sorted),
        ok=jnp.zeros(n, bool).at[order].set(ok_sorted),
        src_token=pos // k,
        counts_per_expert=jnp.zeros(num_ranks * slots, jnp.int32)
        .at[sorted_key]
        .add(ok_sorted.astype(jnp.int32), mode="drop"),
        num_dropped=num_dropped,
        send_pos=unsort(send_pos_sorted),
    )
    return plan


def _pack_send_buffers(plan: RoutingPlan, payload: jax.Array, num_ranks: int, pair_capacity: int):
    """Scatter per-(t,k) payload rows into [R, C, ...] send buffers."""
    rows = payload[plan.src_token]
    buf = jnp.zeros((num_ranks, pair_capacity) + payload.shape[1:], payload.dtype)
    # dst_rank == R (dropped) and send_slot >= C fall off the end → mode="drop".
    dst = jnp.where(plan.ok, plan.dst_rank, num_ranks)
    return buf.at[dst, plan.send_slot].set(rows, mode="drop")


def payload_checksum(a: jax.Array, axes) -> jax.Array:
    """Order-independent exact checksum: wrapping int32 sum of the raw bits.

    The TPU equivalent of the reference's window-write guards (epoch tags
    ``sync_collectives.h:13-15``, winsize validation ``check_winsize.h:8-20``):
    sender and receiver compute the same value over the same bytes regardless
    of reduction order or layout, so any mis-addressed / stale / partial
    one-sided write flips the comparison.  Integer adds wrap deterministically;
    zero padding contributes nothing (bit pattern 0)."""
    if a.dtype == jnp.int8:
        v = a.astype(jnp.int32)
    elif a.dtype == jnp.bfloat16:
        v = jax.lax.bitcast_convert_type(a, jnp.int16).astype(jnp.int32)
    elif a.dtype == jnp.float32:
        v = jax.lax.bitcast_convert_type(a, jnp.int32)
    else:
        v = a.astype(jnp.int32)
    return jnp.sum(v, axis=axes)


def dispatch_core(
    x: jax.Array,
    topk_idx: jax.Array,
    *,
    axis_name: str,
    num_experts: int,
    num_ranks: int,
    pair_capacity: int,
    seg_capacity: int,
    use_int8: bool,
    rank_remap: jax.Array | None = None,
    expert_owner: jax.Array | None = None,
    expert_slot: jax.Array | None = None,
    num_local_slots: int | None = None,
    backend: str = "xla",
    monitor: bool = False,
    validate: bool = False,
):
    """Per-rank dispatch body (run inside shard_map).

    Returns a dict with the receiver-side packed tensors and the combine handle:
      - ``recv_x``      [E_local, R*seg, H]  (int8 if use_int8 else x.dtype)
      - ``recv_scales`` [E_local, R*seg]     (float32; only if use_int8)
      - ``recv_count``  [E_local]            valid tokens per local expert
      - ``recv_count_matrix`` [R, E_local]   per-source counts (diagnostics / EPLB)
      - ``num_dropped`` []                   capacity-overflow drops at this source
      - ``handle``      DispatchHandle

    ``backend``: "xla" (lax.all_to_all), "pallas" (fixed-size one-sided windows), or
    "pallas_ragged" (count exchange + only the live rows cross ICI — the reference's
    actual NotifyDispatch→CamMoeDispatch protocol and the bandwidth win over the
    padded collective).  ``monitor=True`` (pallas_ragged only) adds the reference's
    timeout detection + per-source wait-cost stats to the payload exchange
    (``wait_recv_cost_stats``/``timeout_flags`` keys; buffer.py:285-286 equivalent).
    """
    t, hidden = x.shape
    e_local = num_local_slots or (num_experts // num_ranks)
    my_rank = jax.lax.axis_index(axis_name)
    plan = make_routing_plan(
        topk_idx,
        num_experts=num_experts,
        num_ranks=num_ranks,
        my_rank=my_rank,
        pair_capacity=pair_capacity,
        seg_capacity=seg_capacity,
        rank_remap=rank_remap,
        expert_owner=expert_owner,
        expert_slot=expert_slot,
        num_local_slots=e_local,
    )

    if use_int8:
        # shared Pallas wire quant: bitwise-identical across jit programs
        payload, scale = wire_quant(x)
    else:
        payload = x
        scale = None

    send_x = _pack_send_buffers(plan, payload, num_ranks, pair_capacity)
    send_meta = jnp.full((num_ranks, pair_capacity), -1, jnp.int32)
    dst = jnp.where(plan.ok, plan.dst_rank, num_ranks)
    send_meta = send_meta.at[dst, plan.send_slot].set(plan.dest_slot, mode="drop")

    stats = None
    if backend == "pallas_ragged":
        # rows live per destination = ok (t,k) pairs routed there; send only those.
        rows_to_dst = (
            plan.counts_per_expert.reshape(num_ranks, e_local).sum(axis=-1)
        )
        if monitor:
            recv_payload, rcnt, stats = pallas_ragged_all_to_all(
                send_x, rows_to_dst, axis_name=axis_name, num_ranks=num_ranks,
                monitor=True,
            )
        else:
            recv_payload, rcnt = pallas_ragged_all_to_all(
                send_x, rows_to_dst, axis_name=axis_name, num_ranks=num_ranks,
            )
        # meta (+ scale bits) ride one ragged exchange as an int32 blob
        blob = send_meta[:, :, None]
        if use_int8:
            send_scale = _pack_send_buffers(plan, scale[:, None], num_ranks, pair_capacity)
            blob = jnp.concatenate(
                [blob, jax.lax.bitcast_convert_type(send_scale, jnp.int32)], axis=-1
            )
        recv_blob, _ = pallas_ragged_all_to_all(
            blob, rows_to_dst, axis_name=axis_name, num_ranks=num_ranks,
        )
        # rows past rcnt[s] are UNDEFINED window memory: their meta must not
        # scatter (reference: receivers only touch rows < received count)
        row_live = jnp.arange(pair_capacity, dtype=jnp.int32)[None, :] < rcnt[:, None]
        recv_meta = jnp.where(row_live, recv_blob[:, :, 0], -1)
        recv_scale_ragged = (
            jax.lax.bitcast_convert_type(recv_blob[:, :, 1], jnp.float32)
            if use_int8
            else None
        )
        counts = pallas_all_to_all(
            plan.counts_per_expert.reshape(num_ranks, e_local),
            axis_name=axis_name, num_ranks=num_ranks,
        )
    else:
        a2a = _make_a2a(axis_name, num_ranks, backend)
        recv_payload = a2a(send_x)          # [R, C, H]
        recv_meta = a2a(send_meta)          # [R, C]
        counts = a2a(plan.counts_per_expert.reshape(num_ranks, e_local))  # [R, E_local]

    validation_flags = None
    if validate:
        # window-write guard (reference epoch tags / winsize validation):
        # sender ships a per-destination checksum of exactly the rows it sent;
        # the receiver recomputes over the rows it received.  Any stale,
        # mis-addressed, or truncated one-sided write mismatches.
        sent_sum = payload_checksum(send_x, axes=(1, 2))          # [R dst]
        expect = _make_a2a(axis_name, num_ranks, "xla")(sent_sum[:, None])[:, 0]
        got_payload = recv_payload
        if backend == "pallas_ragged":
            live = (jnp.arange(pair_capacity, dtype=jnp.int32)[None, :]
                    < rcnt[:, None])
            got_payload = jnp.where(live[..., None], recv_payload, 0)
        got_sum = payload_checksum(got_payload, axes=(1, 2))      # [R src]
        validation_flags = (got_sum != expect).astype(jnp.int32)

    n_slots = e_local * num_ranks * seg_capacity
    flat_meta = recv_meta.reshape(-1)
    packed = (
        jnp.zeros((n_slots, hidden), payload.dtype)
        .at[flat_meta]
        .set(recv_payload.reshape(-1, hidden), mode="drop")
        .reshape(e_local, num_ranks * seg_capacity, hidden)
    )
    out = {
        "recv_x": packed,
        "recv_count": counts.sum(axis=0),
        "recv_count_matrix": counts,
        "num_dropped": plan.num_dropped,
        "handle": DispatchHandle(
            gather_idx=plan.gather_idx.reshape(t, -1),
            ok=plan.ok.reshape(t, -1),
            recv_sort_order=None,
            recv_valid_count=None,
            sent_counts=plan.counts_per_expert.reshape(num_ranks, e_local),
            recv_counts=counts,
        ),
    }
    if use_int8:
        if backend == "pallas_ragged":
            recv_scale = recv_scale_ragged
        else:
            send_scale = _pack_send_buffers(plan, scale[:, None], num_ranks, pair_capacity)
            recv_scale = a2a(send_scale)  # [R, C, 1]
        out["recv_scales"] = (
            jnp.zeros((n_slots,), jnp.float32)
            .at[flat_meta]
            .set(recv_scale.reshape(-1), mode="drop")
            .reshape(e_local, num_ranks * seg_capacity)
        )
    if stats is not None:
        out["wait_recv_cost_stats"] = stats[:, 0]
        out["timeout_flags"] = stats[:, 1]
        out["abort_observed"] = stats[:, 2]
        out["payload_wait_cost_stats"] = stats[:, 3]
        out["payload_timeout_flags"] = stats[:, 4]
        # stats col 5 is reserved-zero: send-side cost counting would need a
        # semaphore read, which wedges this TPU stack (PERF.md r4); the
        # receiver-side wait matrices carry the liveness diagnostics
    if validation_flags is not None:
        out["validation_flags"] = validation_flags
    return out


def combine_core(
    y: jax.Array,
    topk_weights: jax.Array,
    handle: DispatchHandle,
    *,
    axis_name: str,
    num_ranks: int,
    seg_capacity: int,
    out_dtype=None,
    backend: str = "xla",
    use_int8_comm: bool = False,
    monitor: bool = False,
):
    """Per-rank combine body (run inside shard_map).

    ``y``: [E_local, R*seg, H] expert outputs in the dispatch packed layout.
    Returns [T, H] = Σ_k topk_weights[t,k] · expert_out(t, k).

    ``use_int8_comm`` quantizes the return payload per row (the reference's
    int8 comm-quant combine option, moe_distribute_combine_v2.h:28 SCALE_PARAM);
    scales travel alongside and rows are dequantized after the gather.

    ``backend="pallas_ragged"`` moves LIVE ROWS ONLY on the return hop — the
    reference combine's ReduceScatterTrans behavior
    (moe_distribute_combine_v2.h:70): rows are compacted per destination using
    the dispatch counts (``handle.recv_counts``), ride the ragged window
    kernel, and are re-expanded at the source from ``handle.sent_counts``.
    With ``monitor=True`` it also returns the ``stats [R, 6]`` matrix
    (payload/count wait costs + timeout flags — the receiver-side half of the
    reference's combine diagnostics, buffer.py:490; its send-side
    ``combine_send_cost_stats`` has no TPU equivalent, see
    ``Buffer.low_latency_combine``).
    """
    e_local, slots, hidden = y.shape
    assert slots == num_ranks * seg_capacity
    out_dtype = out_dtype or y.dtype
    stats = None
    if backend == "pallas_ragged":
        assert handle.recv_counts is not None and handle.sent_counts is not None, (
            "ragged combine needs the dispatch counts in the handle"
        )
        cap = e_local * seg_capacity
        yb = y.reshape(e_local, num_ranks, seg_capacity, hidden)
        cnt = handle.recv_counts                            # [R_src, E_local]
        seg_pos = jnp.arange(seg_capacity, dtype=jnp.int32)
        # compact per destination: rows ordered (expert asc, slot asc)
        occ = (seg_pos[None, None, :] < cnt.T[:, :, None])  # [E, R, seg]
        occ_d = occ.transpose(1, 0, 2).reshape(num_ranks, -1)
        tgt = jnp.cumsum(occ_d.astype(jnp.int32), axis=1) - occ_d
        tgt = jnp.where(occ_d, tgt, cap)
        rows = yb.transpose(1, 0, 2, 3).reshape(num_ranks, -1, hidden)
        if use_int8_comm:
            rows, row_scale = wire_quant(rows)              # scale [R, E*seg]
        send_buf = (
            jnp.zeros((num_ranks, cap + 1, hidden), rows.dtype)
            .at[jnp.arange(num_ranks)[:, None], tgt]
            .set(rows, mode="drop")[:, :cap]
        )
        counts_to_dst = cnt.sum(axis=1)
        if monitor:
            recv, _rcnt, stats = pallas_ragged_all_to_all(
                send_buf, counts_to_dst, axis_name=axis_name,
                num_ranks=num_ranks, monitor=True,
            )
        else:
            recv, _rcnt = pallas_ragged_all_to_all(
                send_buf, counts_to_dst, axis_name=axis_name, num_ranks=num_ranks,
            )
        if use_int8_comm:
            # scales ride their own ragged exchange (same live-row schedule);
            # dequantize before the expansion gather — invalid rows are never
            # gathered, so undefined window memory past the counts is inert.
            send_scale = (
                jnp.zeros((num_ranks, cap + 1, 1), jnp.float32)
                .at[jnp.arange(num_ranks)[:, None], tgt]
                .set(row_scale[..., None], mode="drop")[:, :cap]
            )
            recv_scale, _ = pallas_ragged_all_to_all(
                send_scale, counts_to_dst, axis_name=axis_name,
                num_ranks=num_ranks,
            )
            recv = recv.astype(jnp.float32) * recv_scale
        # expand: block from d holds MY returned rows in (e, slot) order
        sent = handle.sent_counts                           # [R_dst, E_local]
        occ2 = (seg_pos[None, None, :] < sent[:, :, None]).reshape(num_ranks, -1)
        src_pos = jnp.cumsum(occ2.astype(jnp.int32), axis=1) - occ2
        src_pos = jnp.where(occ2, src_pos, cap)
        recvp = jnp.concatenate(
            [recv, jnp.zeros((num_ranks, 1, hidden), recv.dtype)], axis=1
        )
        y_back = recvp[jnp.arange(num_ranks)[:, None], src_pos]  # [R, E*seg, H]
    else:
        # regroup slots by destination (source) rank and route back
        y_by_rank = y.reshape(e_local, num_ranks, seg_capacity, hidden).transpose(1, 0, 2, 3)
        a2a = _make_a2a(axis_name, num_ranks, backend)
        if use_int8_comm:
            q, scale = wire_quant(y_by_rank)
            q_back = a2a(q)
            s_back = a2a(scale[..., None])
            y_back = q_back.astype(jnp.float32) * s_back
        else:
            y_back = a2a(y_by_rank)
    # [R, E_local, seg, H] — [d, e, i] = expert output for our (t,k) sent to (d,e,i)
    flat = y_back.reshape(-1, hidden)
    picked = flat[handle.gather_idx.reshape(-1)].reshape(*handle.gather_idx.shape, hidden)
    w = jnp.where(handle.ok, topk_weights, 0.0).astype(jnp.float32)
    combined = jnp.sum(picked.astype(jnp.float32) * w[..., None], axis=1)
    combined = combined.astype(out_dtype)
    if monitor:
        return combined, stats
    return combined


def dispatch_tp_allgather(
    recv_x: jax.Array,
    recv_scales: jax.Array | None,
    counts_matrix: jax.Array,
    *,
    tp_axis: str,
):
    """TP variant of low-latency dispatch (reference ``IsNeedAllgather``,
    moe_distribute_dispatch_v2.h:43,432-451): expert weights are column-split over
    the TP axis while tokens are sharded over (ep × tp), so after the per-tp-group
    EP exchange each TP rank all-gathers the packed tokens — every TP peer then
    holds the complete expert input and computes its weight slice.

    recv_x [E_local, R·seg, H] → [E_local, TP·R·seg, H]; counts [R, E_local] →
    [TP·R, E_local].
    """
    gathered = jax.lax.all_gather(recv_x, tp_axis, axis=1, tiled=True)
    counts = jax.lax.all_gather(counts_matrix, tp_axis, axis=0, tiled=True)
    scales = (
        jax.lax.all_gather(recv_scales, tp_axis, axis=1, tiled=True)
        if recv_scales is not None
        else None
    )
    return gathered, scales, counts


def combine_tp_reduce(y: jax.Array, *, tp_axis: str, seg_total: int):
    """Reverse of :func:`dispatch_tp_allgather`: sum the TP ranks' partial expert
    outputs, then slice back this rank's own token segment for the EP combine."""
    y_full = jax.lax.psum(y, tp_axis)
    my_tp = jax.lax.axis_index(tp_axis)
    return jax.lax.dynamic_slice_in_dim(y_full, my_tp * seg_total, seg_total, axis=1)


def dispatch_ragged_core(
    x: jax.Array,
    topk_idx: jax.Array,
    *,
    axis_name: str,
    num_experts: int,
    num_ranks: int,
    pair_capacity: int,
    seg_capacity: int,
    use_int8: bool,
    backend: str = "xla",
    monitor: bool = False,
):
    """Normal-mode (prefill) dispatch: output sorted-by-expert ragged layout.

    Returns dict with
      - ``recv_x_sorted`` [R*C, H] rows grouped by local expert (rows beyond
        ``recv_valid_count`` are zero) — feeds ``jax.lax.ragged_dot`` directly;
      - ``recv_scales_sorted`` [R*C] (if int8);
      - ``group_sizes`` [E_local];
      - ``handle`` (with receiver unsort info for combine).

    Equivalent role: CamMoeDispatchNormal → expandx ordered for grouped GEMM
    (cam_moe_dispatch_normal.h:54-65), without the device→host token-count sync.
    """
    t, hidden = x.shape
    e_local = num_experts // num_ranks
    res = dispatch_core(
        x,
        topk_idx,
        axis_name=axis_name,
        num_experts=num_experts,
        num_ranks=num_ranks,
        pair_capacity=pair_capacity,
        seg_capacity=seg_capacity,
        use_int8=use_int8,
        backend=backend,
        monitor=monitor,
    )
    # Compact the per-expert padded layout into a ragged, expert-sorted matrix.
    # Valid slots per (e, r) segment: first counts[r, e] rows of each segment.
    counts = res["recv_count_matrix"]  # [R, E_local]
    seg_pos = jnp.arange(seg_capacity, dtype=jnp.int32)
    # [E_local, R, seg] mask of occupied slots
    occ = seg_pos[None, None, :] < counts.T[:, :, None]
    occ_flat = occ.reshape(-1)
    # target row in the compact layout = exclusive cumsum of occupancy
    tgt = jnp.cumsum(occ_flat.astype(jnp.int32)) - 1
    cap = num_ranks * pair_capacity
    tgt = jnp.where(occ_flat, jnp.minimum(tgt, cap - 1), cap)  # park invalid at cap
    flat_x = res["recv_x"].reshape(-1, hidden)
    sorted_x = (
        jnp.zeros((cap, hidden), flat_x.dtype).at[tgt].set(flat_x, mode="drop")
    )
    group_sizes = res["recv_count"]
    out = {
        "recv_x_sorted": sorted_x,
        "group_sizes": group_sizes,
        "recv_count_matrix": counts,
        "num_dropped": res["num_dropped"],
        "handle": DispatchHandle(
            gather_idx=res["handle"].gather_idx,
            ok=res["handle"].ok,
            recv_sort_order=tgt,
            recv_valid_count=jnp.sum(group_sizes),
            sent_counts=res["handle"].sent_counts,
            recv_counts=res["handle"].recv_counts,
        ),
    }
    if use_int8:
        out["recv_scales_sorted"] = (
            jnp.zeros((cap,), jnp.float32)
            .at[tgt]
            .set(res["recv_scales"].reshape(-1), mode="drop")
        )
    for key in ("wait_recv_cost_stats", "timeout_flags", "abort_observed",
                "payload_wait_cost_stats", "payload_timeout_flags"):
        if key in res:
            out[key] = res[key]
    return out


def dispatch_ragged_multi_round(
    x: jax.Array,
    topk_idx: jax.Array,
    *,
    rounds: int,
    axis_name: str,
    num_experts: int,
    num_ranks: int,
    pair_capacity: int,
    seg_capacity: int,
    use_int8: bool,
):
    """Long-sequence normal dispatch in ``rounds`` chunks (bounded comm buffers).

    Equivalent of the reference's multi-round window streaming
    (DEEPEP_NORMAL_LONG_SEQ_ROUND / _PER_ROUND_TOKENS, deep_ep.cpp:49-73;
    ShareToOutputLongSeq, cam_moe_dispatch_normal.h:59): each round moves
    ``T/rounds`` tokens through ``pair_capacity``-sized buffers, and the received
    rows are merged into ONE globally expert-sorted matrix so a single grouped
    GEMM still covers the whole batch.

    Returns the same dict as :func:`dispatch_ragged_core` plus per-round handles.
    """
    t, hidden = x.shape
    assert t % rounds == 0, (t, rounds)
    tr = t // rounds
    e_local = num_experts // num_ranks
    per = [
        dispatch_ragged_core(
            x[r * tr : (r + 1) * tr],
            topk_idx[r * tr : (r + 1) * tr],
            axis_name=axis_name,
            num_experts=num_experts,
            num_ranks=num_ranks,
            pair_capacity=pair_capacity,
            seg_capacity=seg_capacity,
            use_int8=use_int8,
        )
        for r in range(rounds)
    ]
    cap_r = num_ranks * pair_capacity
    total_cap = rounds * cap_r
    gs = jnp.stack([p["group_sizes"] for p in per])              # [rounds, E_local]
    group_sizes = gs.sum(axis=0)
    # global offset of (round r, expert e) segment: experts major, rounds minor
    expert_base = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(group_sizes.astype(jnp.int32))[:-1]]
    )                                                             # [E_local]
    round_off = jnp.cumsum(gs.astype(jnp.int32), axis=0) - gs.astype(jnp.int32)  # [rounds, E_local]
    seg_off_global = expert_base[None, :] + round_off             # [rounds, E_local]

    merged = jnp.zeros((total_cap, hidden), per[0]["recv_x_sorted"].dtype)
    merged_scale = jnp.zeros((total_cap,), jnp.float32) if use_int8 else None
    round_pos = []
    for r, p in enumerate(per):
        local_ends = jnp.cumsum(gs[r].astype(jnp.int32))
        local_start = local_ends - gs[r].astype(jnp.int32)
        j = jnp.arange(cap_r, dtype=jnp.int32)
        e_of_row = jnp.clip(
            jnp.searchsorted(local_ends, j, side="right"), 0, e_local - 1
        ).astype(jnp.int32)
        valid = j < local_ends[-1]
        pos = seg_off_global[r, e_of_row] + (j - local_start[e_of_row])
        pos = jnp.where(valid, pos, total_cap)                   # OOB → dropped
        merged = merged.at[pos].set(p["recv_x_sorted"], mode="drop")
        if use_int8:
            merged_scale = merged_scale.at[pos].set(p["recv_scales_sorted"], mode="drop")
        round_pos.append(pos)

    out = {
        "recv_x_sorted": merged,
        "group_sizes": group_sizes,
        "recv_count_matrix": sum(p["recv_count_matrix"] for p in per),
        "num_dropped": sum(p["num_dropped"] for p in per),
        "round_handles": [p["handle"] for p in per],
        "round_positions": round_pos,
    }
    if use_int8:
        out["recv_scales_sorted"] = merged_scale
    return out


def combine_ragged_multi_round(
    y_sorted: jax.Array,
    topk_weights: jax.Array,
    round_handles,
    round_positions,
    *,
    axis_name: str,
    num_ranks: int,
    num_local_experts: int,
    seg_capacity: int,
    out_dtype=None,
):
    """Reverse of :func:`dispatch_ragged_multi_round`: slice each round's rows out
    of the merged expert-sorted matrix and run the per-round combine."""
    rounds = len(round_handles)
    t_r = topk_weights.shape[0] // rounds
    outs = []
    total_cap, hidden = y_sorted.shape
    padded = jnp.concatenate([y_sorted, jnp.zeros((1, hidden), y_sorted.dtype)])
    for r, (h, pos) in enumerate(zip(round_handles, round_positions)):
        y_r = padded[jnp.minimum(pos, total_cap)]
        outs.append(
            combine_ragged_core(
                y_r,
                topk_weights[r * t_r : (r + 1) * t_r],
                h,
                axis_name=axis_name,
                num_ranks=num_ranks,
                num_local_experts=num_local_experts,
                seg_capacity=seg_capacity,
                out_dtype=out_dtype,
            )
        )
    return jnp.concatenate(outs, axis=0)


def combine_ragged_core(
    y_sorted: jax.Array,
    topk_weights: jax.Array,
    handle: DispatchHandle,
    *,
    axis_name: str,
    num_ranks: int,
    num_local_experts: int,
    seg_capacity: int,
    out_dtype=None,
    backend: str = "xla",
):
    """Normal-mode combine: scatter expert-sorted rows back to packed slots, then
    reuse the gather-combine path."""
    cap, hidden = y_sorted.shape
    tgt = handle.recv_sort_order  # [E_local*R*seg] → row in y_sorted (or cap)
    padded = jnp.concatenate([y_sorted, jnp.zeros((1, hidden), y_sorted.dtype)], axis=0)
    y_packed = padded[jnp.minimum(tgt, cap)].reshape(
        num_local_experts, num_ranks * seg_capacity, hidden
    )
    return combine_core(
        y_packed,
        topk_weights,
        handle,
        axis_name=axis_name,
        num_ranks=num_ranks,
        seg_capacity=seg_capacity,
        out_dtype=out_dtype,
        backend=backend,
    )


def shared_expert_layout(num_experts: int, num_ranks: int, num_shared_ranks: int):
    """Expert placement for dedicated shared-expert ranks.

    Reference MOE_SHARED_EXPERT_RANK_NUM (deep_ep.cpp:48, deep_ep.hpp:39-41): the
    first ``num_shared_ranks`` ranks serve only the shared expert; MoE experts
    live on the remaining ranks.  Virtual expert ids ``num_experts + j`` address
    shared rank ``j`` (slot 0); route each token to
    ``num_experts + (global_token_id % num_shared_ranks)``.

    Returns ``(expert_owner [E+Ns], expert_slot [E+Ns], num_local_slots)``.
    """
    assert num_shared_ranks < num_ranks
    moe_ranks = num_ranks - num_shared_ranks
    assert num_experts % moe_ranks == 0
    e_local = num_experts // moe_ranks
    owner = jnp.concatenate([
        num_shared_ranks + jnp.arange(num_experts, dtype=jnp.int32) // e_local,
        jnp.arange(num_shared_ranks, dtype=jnp.int32),
    ])
    slot = jnp.concatenate([
        jnp.arange(num_experts, dtype=jnp.int32) % e_local,
        jnp.zeros(num_shared_ranks, jnp.int32),
    ])
    return owner, slot, e_local
