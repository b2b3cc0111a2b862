"""Typed configuration for the EP communication layer.

Replaces the reference's three config mechanisms — per-EP-size ``deep_ep.Config`` tables
(config.hpp:10-36, buffer.py:74-116), env vars (deep_ep.cpp:48-73), and build flags —
with one dataclass.  On TPU the analogue of "num SMs / chunk sizes" is capacity sizing:
XLA owns scheduling, so the tunables that matter are the static buffer capacities that
bound the all-to-all payload.
"""

from __future__ import annotations

import dataclasses
import math


@dataclasses.dataclass(frozen=True)
class EPConfig:
    """Static sizing for expert-parallel dispatch/combine.

    Attributes:
        num_max_dispatch_tokens_per_rank: worst-case local tokens per rank (the
            reference's ``num_max_dispatch_tokens_per_rank`` / ``maxBS``,
            buffer.py:699).  Bounds the per-(expert, src-rank) segment.
        capacity_factor: sizes the per-(src,dst)-rank send buffer as
            ``ceil(mean * capacity_factor + 3*sqrt(mean * capacity_factor))``
            where ``mean = T*K/R`` — the sqrt term absorbs Poisson routing skew,
            which dominates at large EP where per-pair means are small (the
            scale-dependence the reference hand-tunes via its per-size Config
            tables, buffer.py:75-116; one model covers 2-160 ranks here).
            ``None`` means exact worst case ``T * min(K, E_local)`` (never
            drops).  Smaller values trade memory/BW for possible overflow drops
            (counted in the returned stats — the EPLB signal, reference
            buffer.py:700-703).
        use_int8_dispatch: INT8-quantize token payloads for dispatch (BF16 combine),
            the reference's production setting (README.md:14).
        normal_round_tokens: per-round token chunk for normal-mode multi-round
            long-sequence dispatch (reference DEEPEP_NORMAL_LONG_SEQ_PER_ROUND_TOKENS,
            deep_ep.cpp:49-73).  ``None`` disables chunking.
        comm_backend: dispatch/combine transport — ``"xla"`` (lax.all_to_all),
            ``"pallas"`` (fixed-size one-sided windows), or ``"pallas_ragged"``
            (count exchange + live rows only; the reference's window protocol).
        monitor_comm: collect per-source wait-cost stats + timeout flags on the
            dispatch payload exchange (pallas_ragged only; the reference's
            ``dispatch_wait_recv_cost_stats``, buffer.py:285-286).
        validate_comm: per-source payload-checksum guard on dispatch — flags
            stale/mis-addressed/truncated window writes (the reference's
            epoch-tag + winsize validation discipline, sync_collectives.h:13-15,
            check_winsize.h:8-20); works on every backend.
    """

    num_max_dispatch_tokens_per_rank: int = 128
    capacity_factor: float | None = None
    use_int8_dispatch: bool = True
    normal_round_tokens: int | None = None
    comm_backend: str = "xla"
    monitor_comm: bool = False
    validate_comm: bool = False

    def pair_capacity(self, num_tokens: int, topk: int, num_ranks: int, experts_per_rank: int) -> int:
        """Rows a single src rank may send to a single dst rank."""
        exact = num_tokens * min(topk, experts_per_rank)
        if self.capacity_factor is None:
            return exact
        scaled_mean = num_tokens * topk * self.capacity_factor / num_ranks
        est = math.ceil(scaled_mean + 3.0 * math.sqrt(scaled_mean))
        return int(min(exact, max(1, est)))
