"""EPLB — expert-parallel load balancing with redundant experts.

The reference exposes the EPLB *signal* (`cumulative_local_expert_recv_stats`,
reference python/deep_ep/deep_ep/buffer.py:700-703, plus zero-compute experts
for holes); the balancer itself lives upstream.  This module ships the whole
loop, TPU-style:

1. ``expert_balance_report`` / dispatch ``recv_count_matrix`` measure per-expert
   load (utils/diagnostics.py).
2. :func:`make_placement` turns a logical-expert load vector into a physical
   placement: hot experts get REPLICAS, instances bin-pack onto ranks so every
   rank carries ~equal expected load.
3. :func:`remap_topk` (jit-able) rewrites logical top-k expert ids to physical
   slot ids, spreading tokens across an expert's replicas round-robin by row.
4. :func:`physical_expert_weights` gathers any per-expert weight array into
   physical-slot order.

Because the EP stack routes by plain expert id with rank-contiguous slots
(parallel/ep_core.make_routing_plan), the physical problem is just a normal
``num_experts = num_ranks × slots_per_rank`` MoE — every existing entry point
(``Buffer.dispatch`` / ``low_latency_*`` / ``fused_deep_moe``) works unchanged
on the remapped ids.  Placement is recomputed between batches (host numpy);
only the tiny remap tables ride the device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_placement(load, num_ranks: int, slots_per_rank: int):
    """Balanced physical placement from a logical per-expert load vector.

    Args:
        load: ``[E]`` nonnegative per-expert token counts (host array-like).
        num_ranks: EP size.
        slots_per_rank: physical expert slots per rank; ``num_ranks *
            slots_per_rank`` must be ≥ E.  Extra slots become replicas.

    Returns:
        ``placement [num_ranks * slots_per_rank] int32`` — logical expert id
        per physical slot (-1 = empty slot, never routed to).
    """
    load = np.asarray(load, np.float64)
    e = load.shape[0]
    total = num_ranks * slots_per_rank
    if total < e:
        raise ValueError(f"{total} physical slots < {e} experts")
    load = np.maximum(load, 1e-9)          # empty experts still need one home

    # 1. replica counts: hand each spare slot to the hottest per-replica expert
    reps = np.ones(e, np.int64)
    for _ in range(total - e):
        reps[np.argmax(load / reps)] += 1

    # 2. greedy bin-pack instances (share = load/reps, descending) onto the
    #    least-loaded rank that still has a free slot
    inst = [(load[x] / reps[x], x) for x in range(e) for _ in range(reps[x])]
    inst.sort(reverse=True)
    placement = np.full((num_ranks, slots_per_rank), -1, np.int32)
    rank_load = np.zeros(num_ranks)
    rank_fill = np.zeros(num_ranks, np.int64)
    for share, x in inst:
        open_ranks = np.where(rank_fill < slots_per_rank)[0]
        r = open_ranks[np.argmin(rank_load[open_ranks])]
        placement[r, rank_fill[r]] = x
        rank_fill[r] += 1
        rank_load[r] += share
    return placement.reshape(-1)


def make_remap_tables(placement, num_experts: int):
    """Device tables for :func:`remap_topk`: ``(starts [E], counts [E],
    slots [n_instances])`` — replica slot ids grouped by logical expert."""
    placement = np.asarray(placement)
    groups = [np.where(placement == x)[0] for x in range(num_experts)]
    counts = np.asarray([len(g) for g in groups], np.int32)
    if (counts == 0).any():
        raise ValueError("every logical expert needs at least one slot")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    slots = np.concatenate(groups).astype(np.int32)
    return jnp.asarray(starts), jnp.asarray(counts), jnp.asarray(slots)


def remap_topk(topk_idx: jax.Array, starts, counts, slots) -> jax.Array:
    """Logical top-k ids → physical slot ids (−1 masks pass through).

    Replica choice is round-robin by token row (plus the k position, so one
    token's duplicate picks — impossible under distinct top-k — still spread):
    deterministic, jit-friendly, and uniform under any arrival order.
    """
    t, k = topk_idx.shape
    e = topk_idx.astype(jnp.int32)
    valid = e >= 0
    safe = jnp.where(valid, e, 0)
    row = jnp.arange(t, dtype=jnp.int32)[:, None] + jnp.arange(k, dtype=jnp.int32)[None]
    phys = slots[starts[safe] + jax.lax.rem(row, counts[safe])]
    return jnp.where(valid, phys, e)


def physical_expert_weights(w: jax.Array, placement) -> jax.Array:
    """Gather a per-logical-expert array ``[E, ...]`` into physical-slot order
    ``[R*S, ...]``; empty slots copy expert 0 (they are never routed to)."""
    p = jnp.asarray(np.maximum(np.asarray(placement), 0), jnp.int32)
    return jnp.take(w, p, axis=0)


def logical_load(recv_count_matrix, placement, num_experts: int):
    """Fold a physical-slot recv-count matrix (``[src, R*S]`` or ``[R*S]``)
    back to logical per-expert load — feeds the NEXT make_placement round."""
    m = np.asarray(recv_count_matrix, np.float64)
    per_slot = m if m.ndim == 1 else m.sum(axis=0)
    placement = np.asarray(placement)
    out = np.zeros(num_experts)
    for slot, x in enumerate(placement):
        if x >= 0:
            out[x] += per_slot[slot]
    return out
