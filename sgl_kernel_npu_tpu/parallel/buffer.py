"""DeepEP-compatible user API over a ``jax.sharding.Mesh``.

Mirrors the surface of the reference ``deep_ep.Buffer`` (python/deep_ep/deep_ep/
buffer.py:13): ``get_dispatch_layout`` / ``dispatch`` / ``combine`` (normal mode,
prefill) and ``low_latency_dispatch`` / ``low_latency_combine`` (decode), plus
``fused_deep_moe``.  Differences are deliberate TPU-first choices:

- construction takes a ``jax.sharding.Mesh`` + axis name instead of a torch
  ``ProcessGroup`` (the mesh *is* the communicator; XLA owns ICI/DCN transport);
- all entry points are functional and jit-safe: inputs/outputs are globally-sharded
  arrays, shapes are static worst-case (the reference's graph-capture mode,
  buffer.py:279-280, is our only mode), so there is no CPU sync anywhere;
- no ``EventOverlap`` machinery is needed — XLA async scheduling overlaps the
  collectives with compute.  A no-op ``EventOverlap`` is kept for API familiarity
  (reference utils.py:12-33 stubs it too).

Every method also works under an outer ``jax.jit`` and inside training steps.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sgl_kernel_npu_tpu.config import EPConfig
from sgl_kernel_npu_tpu.utils.common import log_parameters
from sgl_kernel_npu_tpu.parallel import ep_core
from sgl_kernel_npu_tpu.parallel.layout import get_dispatch_layout


class EventOverlap:
    """No-op event wrapper kept for reference-API familiarity (utils.py:12-33)."""

    def current_stream_wait(self) -> None:  # pragma: no cover - trivially empty
        pass


@dataclass
class Buffer:
    """Expert-parallel communication buffer bound to a mesh axis.

    Args:
        mesh: device mesh containing the EP axis.
        axis_name: mesh axis over which experts are sharded.
        num_experts: total expert count (divisible by EP size).
        config: static capacity configuration.
    """

    mesh: Mesh
    axis_name: str = "ep"
    num_experts: int = 8
    config: EPConfig = EPConfig()

    def __post_init__(self):
        self.group_size = self.mesh.shape[self.axis_name]
        assert self.num_experts % self.group_size == 0, (
            f"num_experts={self.num_experts} not divisible by EP size {self.group_size}"
        )
        self.num_local_experts = self.num_experts // self.group_size
        self._jit_cache = {}

    # -- helpers ---------------------------------------------------------------

    def _shard(self, *specs):
        return tuple(NamedSharding(self.mesh, s) for s in specs)

    def _smap(self, fn, in_specs, out_specs, key=None):
        """shard_map the per-rank body — jitted and cached when ``key`` is given.

        Eager shard_map dispatches the body op-by-op through the Python trace
        machinery on EVERY call (~4-8× the cost of the same computation under
        ``jit``, measured on the interpret EP paths).  ``key`` must carry every
        static the body closes over that is NOT a pure function of the input
        shapes (capacities, flags, dtypes): the jitted callable is cached per
        ``(key, in_specs, out_specs)`` and jax's own shape keying covers the
        rest — so eager Buffer API calls get the graph-capture-by-default
        behavior the reference reserves for its CPU-sync-free mode
        (buffer.py:279-280).
        """
        # check_vma=False: Pallas calls inside the body can't declare varying-mesh
        # annotations on their out_shapes yet.
        sm = jax.shard_map(
            fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
        if key is None:
            return sm
        ck = (key, in_specs, out_specs)
        cached = self._jit_cache.get(ck)
        if cached is None:
            cached = jax.jit(sm)
            self._jit_cache[ck] = cached
        return cached

    def _capacities(self, num_tokens_per_rank: int, topk: int):
        seg = max(self.config.num_max_dispatch_tokens_per_rank, num_tokens_per_rank)
        pair = self.config.pair_capacity(
            num_tokens_per_rank, topk, self.group_size, self.num_local_experts
        )
        return pair, seg

    # -- layout ------------------------------------------------------------------

    def get_dispatch_layout(self, topk_idx: jax.Array):
        """Per-rank routing statistics (reference buffer.py:152).

        ``topk_idx`` is the *global* [B, K] array sharded on the batch dim over the
        EP axis; outputs are per-rank stacked along a leading rank dim.
        """
        fn = functools.partial(
            get_dispatch_layout, num_experts=self.num_experts, num_ranks=self.group_size
        )

        def body(idx):
            a, b, c = fn(idx)
            return a[None], b[None], c[None]

        p = P(self.axis_name)
        return self._smap(body, in_specs=(p,), out_specs=(p, p, p),
                          key=("layout",))(topk_idx)

    def get_routing_plan(self, topk_idx: jax.Array):
        """Debug accessor: the full source-side routing metadata per rank
        (reference ``get_notify_send_data`` blob + ``notify_verify``,
        buffer.py:203-211/391 — here it is simply the RoutingPlan fields)."""
        t = topk_idx.shape[0] // self.group_size
        k = topk_idx.shape[1]
        pair, seg = self._capacities(t, k)

        def body(idx):
            plan = ep_core.make_routing_plan(
                idx,
                num_experts=self.num_experts,
                num_ranks=self.group_size,
                my_rank=jax.lax.axis_index(self.axis_name),
                pair_capacity=pair,
                seg_capacity=seg,
            )
            return tuple(jnp.asarray(v)[None] for v in plan)

        p = P(self.axis_name)
        n_fields = len(ep_core.RoutingPlan._fields)
        outs = self._smap(body, in_specs=(p,), out_specs=(p,) * n_fields,
                          key=("routing_plan", pair, seg))(topk_idx)
        return ep_core.RoutingPlan(*outs)

    # -- low latency (decode) ------------------------------------------------------

    @log_parameters
    def low_latency_dispatch(
        self,
        x: jax.Array,
        topk_idx: jax.Array,
        num_max_dispatch_tokens_per_rank: int | None = None,
        *,
        use_int8: bool | None = None,
        backend: str | None = None,
        monitor: bool | None = None,
        validate: bool | None = None,
    ):
        """Decode-mode dispatch (reference buffer.py:676).

        Args:
            x: ``[R*T, H]`` tokens, sharded on dim 0 over the EP axis.
            topk_idx: ``[R*T, K]`` global expert ids (-1 = inactive).
            backend: transport override (``config.comm_backend`` default).
            monitor: collect wait-cost/timeout stats (pallas_ragged only;
                ``config.monitor_comm`` default).
            validate: per-source payload-checksum guard
                (``config.validate_comm`` default): sender ships a wrapping
                int32 bit-sum per destination, the receiver recomputes over
                what actually landed — ``stats["validation_flags"]`` [R, R]
                flags any stale/mis-addressed window write (the reference's
                epoch-tag + winsize guards, sync_collectives.h:13-15,
                check_winsize.h:8-20).

        Returns:
            ``(packed_recv_x, packed_recv_scales | None, packed_recv_count, handle,
            stats)`` where ``packed_recv_x`` is ``[R*E_local, R*seg, H]`` sharded so
            each rank holds its ``[E_local, R*seg, H]`` experts (the reference's
            packed layout, deep_ep.cpp:941-967), ``packed_recv_count`` the per-expert
            valid counts, and ``stats`` carries ``recv_count_matrix``/``num_dropped``
            (EPLB signals, reference buffer.py:700-703) plus — when monitored — the
            rank×rank ``wait_recv_cost_stats`` matrix and ``timeout_flags``
            (reference buffer.py:285-286; feed ``utils.diagnostics.diagnose_matrix``).
        """
        use_int8 = self.config.use_int8_dispatch if use_int8 is None else use_int8
        backend = backend or self.config.comm_backend
        monitor = self.config.monitor_comm if monitor is None else monitor
        monitor = monitor and backend == "pallas_ragged"
        validate = self.config.validate_comm if validate is None else validate
        t = x.shape[0] // self.group_size
        k = topk_idx.shape[1]
        seg = num_max_dispatch_tokens_per_rank or max(
            self.config.num_max_dispatch_tokens_per_rank, t
        )
        pair, _ = self._capacities(t, k)

        def body(xs, idx):
            res = ep_core.dispatch_core(
                xs,
                idx,
                axis_name=self.axis_name,
                num_experts=self.num_experts,
                num_ranks=self.group_size,
                pair_capacity=pair,
                seg_capacity=seg,
                use_int8=use_int8,
                backend=backend,
                monitor=monitor,
                validate=validate,
            )
            scales = res.get("recv_scales")
            zero_r = jnp.zeros((self.group_size,), jnp.int32)
            return (
                res["recv_x"],
                scales if scales is not None else jnp.zeros((1, 1), jnp.float32),
                res["recv_count"],
                res["handle"].gather_idx[None],
                res["handle"].ok[None],
                res["recv_count_matrix"][None],
                res["num_dropped"][None],
                res.get("wait_recv_cost_stats", zero_r)[None],
                res.get("timeout_flags", zero_r)[None],
                res["handle"].sent_counts[None],
                res.get("validation_flags", zero_r)[None],
            )

        p = P(self.axis_name)
        outs = self._smap(
            body, in_specs=(p, p), out_specs=(p,) * 11,
            key=("lld", pair, seg, use_int8, backend, monitor, validate),
        )(x, topk_idx)
        (recv_x, recv_scales, recv_count, gidx, ok, cmat, dropped, wait,
         tflags, scnt, vflags) = outs
        handle = ep_core.DispatchHandle(gidx, ok, None, None, scnt, cmat)
        stats = {"recv_count_matrix": cmat, "num_dropped": dropped}
        if monitor:
            stats["wait_recv_cost_stats"] = wait   # [R dst, R src] poll-iteration matrix
            stats["timeout_flags"] = tflags
        if validate:
            stats["validation_flags"] = vflags     # [R recv, R src] checksum mismatches
        return (
            recv_x,
            recv_scales if use_int8 else None,
            recv_count,
            handle,
            stats,
        )

    @log_parameters
    def low_latency_combine(
        self,
        y: jax.Array,
        topk_weights: jax.Array,
        handle: ep_core.DispatchHandle,
        *,
        out_dtype=jnp.bfloat16,
        backend: str | None = None,
        monitor: bool | None = None,
    ):
        """Decode-mode combine (reference buffer.py:779): weighted sum of expert
        outputs back at each token's source rank.  ``y`` is the packed layout
        returned by :meth:`low_latency_dispatch` (after expert compute).

        ``backend="pallas_ragged"`` moves live rows only on the return hop
        (reference ReduceScatterTrans); ``monitor=True`` (ragged only) ALSO
        returns a stats dict with ``combine_wait_cost_stats`` [R, R],
        ``payload_wait_cost_stats`` and ``timeout_flags`` — the reference's
        combine-side failure-detection surface (buffer.py:490).  The
        reference's ``combine_send_cost_stats`` (send-side cycle counts) has
        NO TPU equivalent: counting send-wait iterations would need a
        semaphore read, which wedges this TPU stack (PERF.md r4 root-cause);
        send-completion is a blocking ``wait_send`` and liveness problems
        surface on the RECEIVER's wait matrices instead."""
        seg = y.shape[1] // self.group_size
        backend = backend or self.config.comm_backend
        monitor = self.config.monitor_comm if monitor is None else monitor
        monitor = monitor and backend == "pallas_ragged"

        def body(ys, w, gidx, ok, scnt, rcnt):
            h = ep_core.DispatchHandle(gidx[0], ok[0], None, None, scnt[0], rcnt[0])
            out = ep_core.combine_core(
                ys,
                w,
                h,
                axis_name=self.axis_name,
                num_ranks=self.group_size,
                seg_capacity=seg,
                out_dtype=out_dtype,
                backend=backend,
                monitor=monitor,
            )
            if monitor:
                out, stats = out
                return out, stats[None]
            return out, jnp.zeros((1, self.group_size, 6), jnp.int32)

        p = P(self.axis_name)
        scnt = handle.sent_counts
        rcnt = handle.recv_counts
        if scnt is None:
            z = jnp.zeros(
                (self.group_size, self.group_size,
                 self.num_experts // self.group_size), jnp.int32)
            scnt = rcnt = z
        out, stats = self._smap(
            body, in_specs=(p,) * 6, out_specs=(p, p),
            key=("llc", seg, jnp.dtype(out_dtype).name, backend, monitor),
        )(y, topk_weights, handle.gather_idx, handle.ok, scnt, rcnt)
        if monitor:
            return out, {
                "combine_wait_cost_stats": stats[:, :, 0],
                "payload_wait_cost_stats": stats[:, :, 3],
                "timeout_flags": stats[:, :, 1] | stats[:, :, 4],
            }
        return out

    # -- normal mode (prefill) -----------------------------------------------------

    @log_parameters
    def dispatch(
        self,
        x: jax.Array,
        topk_idx: jax.Array,
        *,
        use_int8: bool | None = None,
        rounds: int | None = None,
        backend: str | None = None,
        monitor: bool | None = None,
    ):
        """Normal-mode dispatch (reference buffer.py:233 → intranode_dispatch):
        returns expert-sorted ragged tokens ready for ``jax.lax.ragged_dot``.

        ``rounds`` (default from ``config.normal_round_tokens``) streams long
        prefill batches through bounded comm buffers (the reference's multi-round
        long-seq mode, deep_ep.cpp:49-73) — same results, 1/rounds the buffer
        memory.

        ``monitor`` (pallas_ragged backend only; ``config.monitor_comm``
        default) adds the same wait-cost/timeout surface as
        ``low_latency_dispatch``: ``wait_recv_cost_stats`` [R, R],
        ``timeout_flags``, ``payload_wait_cost_stats`` (reference
        dispatch_wait_recv_cost_stats, buffer.py:249,285-286 — consumed by
        ``utils.diagnostics.diagnose_matrix``; send-side cost has no TPU
        equivalent, see :meth:`low_latency_combine`).

        Returns ``(recv_x_sorted [R, cap, H], recv_scales | None, group_sizes
        [R, E_local], handle, stats)`` with dim 0 = rank.
        """
        use_int8 = (
            self.config.use_int8_dispatch if use_int8 is None else use_int8
        )
        backend = backend or self.config.comm_backend
        monitor = self.config.monitor_comm if monitor is None else monitor
        monitor = monitor and backend == "pallas_ragged"
        t = x.shape[0] // self.group_size
        k = topk_idx.shape[1]
        if rounds is None and self.config.normal_round_tokens:
            rounds = max(1, t // self.config.normal_round_tokens)
        if rounds and rounds > 1:
            return self._dispatch_multi_round(x, topk_idx, use_int8, rounds)
        pair, seg = self._capacities(t, k)

        zero_r = jnp.zeros((self.group_size,), jnp.float32)

        def body(xs, idx):
            res = ep_core.dispatch_ragged_core(
                xs,
                idx,
                axis_name=self.axis_name,
                num_experts=self.num_experts,
                num_ranks=self.group_size,
                pair_capacity=pair,
                seg_capacity=seg,
                use_int8=use_int8,
                backend=backend,
                monitor=monitor,
            )
            h = res["handle"]
            scales = res.get("recv_scales_sorted")
            return (
                res["recv_x_sorted"][None],
                scales[None] if scales is not None else jnp.zeros((1, 1), jnp.float32),
                res["group_sizes"][None],
                h.gather_idx[None],
                h.ok[None],
                h.recv_sort_order[None],
                res["recv_count_matrix"][None],
                res["num_dropped"][None],
                res.get("wait_recv_cost_stats", zero_r)[None],
                res.get("timeout_flags", zero_r)[None],
                res.get("payload_wait_cost_stats", zero_r)[None],
                h.sent_counts[None],
                h.recv_counts[None],
            )

        p = P(self.axis_name)
        outs = self._smap(
            body, in_specs=(p, p), out_specs=(p,) * 13,
            key=("disp", pair, seg, use_int8, backend, monitor))(x, topk_idx)
        xs, scales, gs, gidx, ok, order, cmat, dropped = outs[:8]
        handle = ep_core.DispatchHandle(gidx, ok, order, None,
                                        outs[11], outs[12])
        stats = {"recv_count_matrix": cmat, "num_dropped": dropped}
        if monitor:
            stats["wait_recv_cost_stats"] = outs[8]
            stats["timeout_flags"] = outs[9]
            stats["payload_wait_cost_stats"] = outs[10]
        return xs, (scales if use_int8 else None), gs, handle, stats

    def _dispatch_multi_round(self, x, topk_idx, use_int8, rounds):
        t = x.shape[0] // self.group_size
        k = topk_idx.shape[1]
        tr = t // rounds
        pair = self.config.pair_capacity(tr, k, self.group_size, self.num_local_experts)
        seg = tr

        def body(xs, idx):
            res = ep_core.dispatch_ragged_multi_round(
                xs, idx, rounds=rounds,
                axis_name=self.axis_name, num_experts=self.num_experts,
                num_ranks=self.group_size, pair_capacity=pair, seg_capacity=seg,
                use_int8=use_int8,
            )
            scales = res.get("recv_scales_sorted")
            flat = (
                res["recv_x_sorted"][None],
                scales[None] if scales is not None else jnp.zeros((1, 1), jnp.float32),
                res["group_sizes"][None],
                res["recv_count_matrix"][None],
                res["num_dropped"][None],
            )
            per_round = (
                tuple(h.gather_idx[None] for h in res["round_handles"])
                + tuple(h.ok[None] for h in res["round_handles"])
                + tuple(h.recv_sort_order[None] for h in res["round_handles"])
                + tuple(p[None] for p in res["round_positions"])
            )
            return flat + per_round

        p = P(self.axis_name)
        n_out = 5 + 4 * rounds
        outs = self._smap(body, in_specs=(p, p), out_specs=(p,) * n_out,
                          key=("dispmr", rounds, pair, seg, use_int8))(x, topk_idx)
        xs, scales, gs, cmat, dropped = outs[:5]
        gidx = outs[5 : 5 + rounds]
        oks = outs[5 + rounds : 5 + 2 * rounds]
        orders = outs[5 + 2 * rounds : 5 + 3 * rounds]
        pos = outs[5 + 3 * rounds :]
        handle = {
            "rounds": rounds, "seg": seg,
            "gather_idx": gidx, "ok": oks, "orders": orders, "positions": pos,
        }
        stats = {"recv_count_matrix": cmat, "num_dropped": dropped}
        return xs, (scales if use_int8 else None), gs, handle, stats

    @log_parameters
    def combine(
        self,
        y_sorted: jax.Array,
        topk_weights: jax.Array,
        handle,
        *,
        out_dtype=jnp.bfloat16,
        backend: str | None = None,
    ):
        """Normal-mode combine (reference buffer.py:480)."""
        if isinstance(handle, dict):  # multi-round handle
            return self._combine_multi_round(y_sorted, topk_weights, handle, out_dtype)
        backend = backend or self.config.comm_backend
        t = topk_weights.shape[0] // self.group_size
        k = topk_weights.shape[1]
        pair, seg = self._capacities(t, k)

        def body(ys, w, gidx, ok, order, scnt, rcnt):
            h = ep_core.DispatchHandle(gidx[0], ok[0], order[0], None,
                                       scnt[0], rcnt[0])
            return ep_core.combine_ragged_core(
                ys[0],
                w,
                h,
                axis_name=self.axis_name,
                num_ranks=self.group_size,
                num_local_experts=self.num_local_experts,
                seg_capacity=seg,
                out_dtype=out_dtype,
                backend=backend,
            )

        p = P(self.axis_name)
        zero_c = jnp.zeros(
            (self.group_size, self.group_size, self.num_local_experts), jnp.int32)
        scnt = handle.sent_counts if handle.sent_counts is not None else zero_c
        rcnt = handle.recv_counts if handle.recv_counts is not None else zero_c
        return self._smap(
            body, in_specs=(p,) * 7, out_specs=p,
            key=("comb", seg, jnp.dtype(out_dtype).name, backend))(
            y_sorted, topk_weights, handle.gather_idx, handle.ok,
            handle.recv_sort_order, scnt, rcnt
        )

    def _combine_multi_round(self, y_sorted, topk_weights, handle, out_dtype):
        rounds, seg = handle["rounds"], handle["seg"]

        def body(ys, w, *hs):
            gidx = hs[:rounds]
            oks = hs[rounds : 2 * rounds]
            orders = hs[2 * rounds : 3 * rounds]
            pos = hs[3 * rounds :]
            handles = [
                ep_core.DispatchHandle(g[0], o[0], so[0], None)
                for g, o, so in zip(gidx, oks, orders)
            ]
            return ep_core.combine_ragged_multi_round(
                ys[0], w, handles, [pp[0] for pp in pos],
                axis_name=self.axis_name, num_ranks=self.group_size,
                num_local_experts=self.num_local_experts, seg_capacity=seg,
                out_dtype=out_dtype,
            )

        p = P(self.axis_name)
        args = (y_sorted, topk_weights, *handle["gather_idx"], *handle["ok"],
                *handle["orders"], *handle["positions"])
        return self._smap(
            body, in_specs=(p,) * len(args), out_specs=p,
            key=("combmr", rounds, seg, jnp.dtype(out_dtype).name))(*args)

    # -- fused MoE -------------------------------------------------------------------

    def fused_deep_moe(
        self,
        x: jax.Array,
        topk_idx: jax.Array,
        topk_weights: jax.Array,
        w1: jax.Array,
        w1_scale: jax.Array,
        w2: jax.Array,
        w2_scale: jax.Array,
        *,
        gmm_tiles: tuple[int, int, int] | None = None,
        pack_tn: int | None = None,
        chunks: int = 1,
        use_int8_dispatch: bool = True,
        single_kernel: bool = False,
        full_tiles: tuple[int, int, int, int, int, int] | None = None,
    ):
        """Fused dispatch→GMM1→SwiGLU→requant→GMM2→combine (reference buffer.py:852).

        ``use_int8_dispatch=False`` keeps the wire at the input dtype and
        quantizes per token after arrival — the BF16-dispatch accuracy
        baseline (reference "INT8 dispatch Δppl ≈ 0" bar, BASELINE.md).

        ``chunks > 1`` pipelines independent token slices so each slice's
        all_to_all overlaps the previous slice's GEMMs (comm/compute overlap,
        see fused_moe.fused_deep_moe_rank).

        ``single_kernel=True`` routes through the FULL single-``pallas_call``
        chain (parallel/fused_full.py — the reference's ENABLE_GMM2_COMBINE
        form, fused_deep_moe.h:35): one kernel per rank does the one-sided
        dispatch, both GEMMs, the activation, the combine return and the
        weighted reduce.  ``full_tiles`` overrides the auto
        ``(tm, tk1, tn1, tk2, tn2, tn3)``; the GMM1 n-tile is pinned to the
        weight pack width.  ``chunks``/``use_int8_dispatch`` apply to the
        unfused form only (the kernel always quantizes the wire per token).

        Weights are global arrays sharded on the expert dim: ``w1 [E, H, 2I]`` int8
        packed (see parallel/fused_moe.py), ``w2 [E, I, H]`` int8, scales float32.

        Returns ``(combined [R*T, H] bf16, recv_count [R, E_local], num_dropped [R])``.
        """
        from sgl_kernel_npu_tpu.parallel import fused_moe

        t = x.shape[0] // self.group_size
        k = topk_idx.shape[1]
        pair, seg = self._capacities(t, k)

        if single_kernel:
            from sgl_kernel_npu_tpu.ops.grouped_matmul import moe_pack_tn
            from sgl_kernel_npu_tpu.parallel import fused_full

            n1 = w1.shape[-1]
            if full_tiles is not None:
                tiles = full_tiles
            else:
                def div_le(v, cap):
                    return max(d for d in range(1, min(v, cap) + 1) if v % d == 0)

                tm = -(-seg // 32) * 32
                tiles = (tm, div_le(x.shape[-1], 1024),
                         pack_tn or moe_pack_tn(n1),
                         div_le(n1 // 2, 1024), div_le(x.shape[-1], 512),
                         div_le(x.shape[-1], 512))
            tm, tk1, tn1, tk2, tn2, tn3 = tiles

            def body_full(xs, idx, w, w1_, s1_, w2_, s2_):
                out, cnt, drop = fused_full.fused_deep_moe_full_rank(
                    xs, idx, w, w1_, s1_, w2_, s2_,
                    axis_name=self.axis_name, num_experts=self.num_experts,
                    num_ranks=self.group_size, seg_capacity=seg,
                    tm=tm, tk1=tk1, tn1=tn1, tk2=tk2, tn2=tn2, tn3=tn3,
                )
                return out, cnt[None], drop[None]

            p = P(self.axis_name)
            return self._smap(
                body_full, in_specs=(p,) * 7, out_specs=(p, p, p),
                key=("fdm_full", seg, tiles))(
                x, topk_idx, topk_weights, w1, w1_scale, w2, w2_scale
            )

        def body(xs, idx, w, w1_, s1_, w2_, s2_):
            combined, gs, dropped = fused_moe.fused_deep_moe_rank(
                xs,
                idx,
                w,
                w1_,
                s1_,
                w2_,
                s2_,
                axis_name=self.axis_name,
                num_experts=self.num_experts,
                num_ranks=self.group_size,
                pair_capacity=pair,
                seg_capacity=seg,
                gmm_tiles=gmm_tiles,
                pack_tn=pack_tn,
                chunks=chunks,
                use_int8_dispatch=use_int8_dispatch,
            )
            return combined, gs[None], dropped[None]

        p = P(self.axis_name)
        return self._smap(
            body, in_specs=(p,) * 7, out_specs=(p, p, p),
            key=("fdm", pair, seg, gmm_tiles, pack_tn, chunks,
                 use_int8_dispatch))(
            x, topk_idx, topk_weights, w1, w1_scale, w2, w2_scale
        )

    def fused_oai_moe(
        self,
        x: jax.Array,
        topk_idx: jax.Array,
        topk_weights: jax.Array,
        w_gate_up: jax.Array,   # [E, H, 2I] interleaved gate|up (+biases)
        b_gate_up: jax.Array,
        w_down: jax.Array,
        b_down: jax.Array,
        *,
        alpha: float = 1.702,
        limit: float = 7.0,
    ):
        """GPT-OSS-style EP MoE: bf16 ragged dispatch → biased gate|up grouped
        GEMM → clamped interleaved SwiGLU → biased down GEMM → combine, all
        inside shard_map (the GPT-OSS twin of :meth:`fused_deep_moe`; expert
        tensors sharded on the expert dim)."""
        from sgl_kernel_npu_tpu.parallel import fused_moe

        t = x.shape[0] // self.group_size
        k = topk_idx.shape[1]
        pair, seg = self._capacities(t, k)

        def body(xs, idx, w, wg, bg, wd, bd):
            out, gs, dropped = fused_moe.fused_oai_moe_rank(
                xs, idx, w, wg, bg, wd, bd,
                axis_name=self.axis_name, num_experts=self.num_experts,
                num_ranks=self.group_size, pair_capacity=pair,
                seg_capacity=seg, alpha=alpha, limit=limit,
            )
            return out, gs[None], dropped[None]

        p = P(self.axis_name)
        return self._smap(
            body, in_specs=(p,) * 7, out_specs=(p, p, p),
            key=("oai", pair, seg, alpha, limit))(
            x, topk_idx, topk_weights, w_gate_up, b_gate_up, w_down, b_down
        )
