"""Single-kernel fused EP dispatch → grouped GEMM1 (the reference's FusedDeepMoe
core, csrc/deepep/ops/op_kernel/fused_deep_moe.h:60-120, rebuilt TPU-native).

One Pallas kernel per rank: remote-DMAs this rank's routed rows into every
peer's receive window in K-COLUMN chunks, then computes the per-expert W8A8
GEMM gated on chunk arrival — the MXU starts on hidden-dim chunk 0 while later
chunks are still in flight (the callback-preload overlap of the reference's
CATLASS ``MmadAtlasA2PreloadAsyncWithCallback``, as a semaphore-gated grid).

Layout contract (per rank, inside shard_map over ``axis_name``):
- ``xsend [R, ER, H] int8`` — MY routed rows, pre-placed at
  ``[dst, e_local·seg + slot]`` (ER = E_local·seg); each (k-chunk, destination)
  send reads a strided ``[ER, tk]`` column slice directly — no pre-kernel
  chunking transpose;
- the receive window (an ANY-space output) is ``[NK, R, ER, tk]`` indexed by
  SOURCE — the symmetric-buffer discipline of the reference's HCCL windows —
  and chunk-major so every one-sided WRITE lands contiguously;
- row scales ``sx [E_local, R·seg]`` and weight scales travel outside the
  kernel (tiny; no overlap value).

Weights stream once (block (e, kt, nt)); the expert's full activation slab
lives in VMEM (``R·seg × H`` int8) and is assembled from window chunks during
the expert's FIRST n-tile pass — expert 0's assembly is what overlaps the
transfer; later experts' chunks have already arrived and their slab fills are
started in bulk at the expert's first step so they ride ahead of the compute.

Tile sizes come from a traffic-model selector (``_fused_tiles``): the round-3
driver measured the hand-set (tk 1024, tn 512) grid at 448 steps — ~360 µs of
pure per-step overhead against a 287 µs weight floor (BENCH_r03: fused 666.7
vs bare 307.7 µs).  Wide tiles cut the same shapes to 64 steps, exactly the
fix that took the bare grouped GEMM from 887 → 301 µs (PERF.md §grouped GEMM).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.utils.common import interpret_default


def _fused_tiles(
    rows: int,
    h: int,
    n: int,
    *,
    vmem_budget: int = 13 * 2**20,
) -> tuple[int, int]:
    """Pick (tk, tn) minimizing grid steps under the VMEM budget.

    Weight traffic is tile-independent (each [tk, tn] block streams exactly
    once) and the activation slab lives in VMEM, so — unlike the bare grouped
    GEMM — the only objective is FEWER grid steps (each costs ~0.5-1 µs of
    fixed pipeline overhead).  nk = h//tk is also the comm-chunk count:
    keep nk ≥ 4 when h allows so expert 0's compute still starts after 1/nk
    of the payload (the overlap the kernel exists for).
    """
    best = None
    best_key = None
    for nk in (4, 7, 8, 14, 16, 28, 2, 1):
        if h % nk or h // nk % 128:
            continue
        tk = h // nk
        for tn in (2048, 1024, 512, 256, 128):
            if n % tn:
                continue
            vmem = (
                2 * tk * tn          # double-buffered int8 weight block
                + rows * h           # int8 activation slab
                + rows * tn * 4      # f32 accumulator
                + 2 * rows * tn * 2  # bf16 out block (pipelined)
            )
            if vmem > vmem_budget:
                continue
            steps = (n // tn) * nk
            # prefer nk ≥ 4 (comm overlap), then fewest steps, then wide tn
            key = (nk < 4, steps, -tn)
            if best_key is None or key < best_key:
                best, best_key = (tk, tn), key
    assert best is not None, (rows, h, n)
    return best


def _fused_kernel(
    xsend_ref,   # ANY [R, ER, H] int8 (my sends, placed at (dst, e·seg+slot))
    w_ref,       # VMEM block [1, tk, tn] int8
    sw_ref,      # VMEM block [1, 1, tn] f32
    sx_ref,      # VMEM block [1, 1, rows] f32
    win_ref,     # ANY out [NK, R, ER, tk] int8 (written by peers)
    out_ref,     # VMEM out block [1, rows, tn] bf16
    x_vmem,      # VMEM scratch [rows, H] int8 (persists across grid steps)
    acc,         # VMEM scratch [rows, tn] f32
    lsem,        # local DMA sems [NK]
    ssem, rsem,  # remote DMA sems [R, NK]
    *,
    axis_name,
    num_ranks,
    seg,
    tk,
    nk,
    n_experts,
):
    e = pl.program_id(0)
    nt = pl.program_id(1)
    kt = pl.program_id(2)
    n_nt = pl.num_programs(1)
    my = jax.lax.axis_index(axis_name) if num_ranks > 1 else 0
    rows = out_ref.shape[1]           # R * seg

    def remote(ck, *, to):
        return pltpu.make_async_remote_copy(
            src_ref=xsend_ref.at[to, :, pl.ds(ck * tk, tk)],
            dst_ref=win_ref.at[ck, my],
            send_sem=ssem.at[to, ck],
            recv_sem=rsem.at[my, ck],
            device_id=to,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def recv_descriptor(s, ck):
        # matching descriptor on the receive side: local dst slice + the
        # SOURCE-indexed recv-sem slot (sync_collectives.h per-src discipline)
        return pltpu.make_async_remote_copy(
            src_ref=xsend_ref.at[s, :, pl.ds(ck * tk, tk)],
            dst_ref=win_ref.at[ck, s],
            send_sem=ssem.at[s, ck],
            recv_sem=rsem.at[s, ck],
            device_id=s,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def slab_copy(s, ck, x_vmem):
        return pltpu.make_async_copy(
            win_ref.at[ck, s, pl.ds(e * seg, seg)],
            x_vmem.at[pl.ds(s * seg, seg), pl.ds(ck * tk, tk)],
            lsem.at[ck],
        )

    @pl.when((e == 0) & (nt == 0) & (kt == 0))
    def _send_all():
        if num_ranks > 1:
            # entry barrier before the first one-sided write (peers must be
            # inside the kernel for window writes to be safe across calls);
            # jax 0.9 permits collective_id only alongside this barrier
            barrier = pltpu.get_barrier_semaphore()
            for d_off in range(num_ranks):
                d = jax.lax.rem(my + jnp.int32(d_off), num_ranks)
                pltpu.semaphore_signal(
                    barrier, inc=1, device_id=d,
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
            pltpu.semaphore_wait(barrier, num_ranks)
        for d_off in range(num_ranks):
            d = jax.lax.rem(my + d_off, num_ranks) if num_ranks > 1 else 0
            for ck in range(nk):
                remote(ck, to=d).start()

    # slab fill, arrival-gated for expert 0, bulk-pipelined afterwards:
    # expert 0 must wait chunk kt's remote arrival before copying it (the
    # overlap point — compute on chunk 0 starts while chunks 1.. ride the
    # wire); for e > 0 every chunk has long arrived, so all nk window→VMEM
    # copies start at the expert's first step and only chunk kt's is
    # waited at step kt (copy kt+1 overlaps the dot on chunk kt).
    @pl.when((nt == 0) & (e == 0))
    def _fill_gated():
        for s in range(num_ranks):
            recv_descriptor(s, kt).wait_recv()
        for s in range(num_ranks):
            slab_copy(s, kt, x_vmem).start()
        for s in range(num_ranks):
            slab_copy(s, kt, x_vmem).wait()

    @pl.when((nt == 0) & (e > 0))
    def _fill_pipelined():
        @pl.when(kt == 0)
        def _start_all():
            for ck in range(nk):
                for s in range(num_ranks):
                    slab_copy(s, ck, x_vmem).start()

        for s in range(num_ranks):
            slab_copy(s, kt, x_vmem).wait()

    @pl.when(kt == 0)
    def _zero():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += jax.lax.dot_general(
        x_vmem[:, pl.ds(kt * tk, tk)],
        w_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when(kt == nk - 1)
    def _epilogue():
        out_ref[0] = (
            acc[...] * sx_ref[0, 0][:, None] * sw_ref[0, 0][None, :]
        ).astype(out_ref.dtype)

    @pl.when((e == n_experts - 1) & (nt == n_nt - 1) & (kt == nk - 1))
    def _drain_sends():
        for d in range(num_ranks):
            for ck in range(nk):
                remote(ck, to=d).wait_send()


def fused_dispatch_gmm1_rank(
    xsend: jax.Array,     # [R, ER, H] int8 — rows pre-placed at (dst, e·seg+slot)
    w1: jax.Array,        # [E_local, H, N] int8
    sw1: jax.Array,       # [E_local, N] f32 per-channel weight scales
    sx: jax.Array,        # [E_local, R·seg] f32 per-row scales of RECEIVED rows
    *,
    axis_name: str,
    num_ranks: int,
    seg: int,
    tk: int | None = None,
    tn: int | None = None,
    collective_id: int | None = None,
    interpret: bool | None = None,
):
    """Fused one-sided dispatch + dequantizing grouped GEMM1 (run in shard_map).

    Returns ``out [E_local, R·seg, N] bf16``.  Tiles default to the
    traffic-model selector (``_fused_tiles``); explicit ``tk``/``tn`` must
    divide H/N.  Interpret mode runs under the eager-DMA TPU simulator (the
    lazy default mis-delivers multi-slot one-sided transfers, see
    fused_full.py)."""
    from sgl_kernel_npu_tpu.parallel.collective_ids import next_collective_id

    if interpret is None:
        interpret = interpret_default()
    if collective_id is None:
        collective_id = next_collective_id()
    r, er, h = xsend.shape
    e_local, _, n = w1.shape
    rows = num_ranks * seg
    if tk is None or tn is None:
        atk, atn = _fused_tiles(rows, h, n)
        tk = atk if tk is None else tk
        tn = atn if tn is None else tn
    assert er == e_local * seg and h % tk == 0 and n % tn == 0
    nk, n_nt = h // tk, n // tn

    grid = (e_local, n_nt, nk)
    _win, out = pl.pallas_call(
        functools.partial(
            _fused_kernel, axis_name=axis_name, num_ranks=num_ranks, seg=seg,
            tk=tk, nk=nk, n_experts=e_local),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tk, tn), lambda e, nt, kt: (e, kt, nt)),
            pl.BlockSpec((1, 1, tn), lambda e, nt, kt: (e, 0, nt)),
            pl.BlockSpec((1, 1, rows), lambda e, nt, kt: (e, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, rows, tn), lambda e, nt, kt: (e, 0, nt)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nk, num_ranks, er, tk), jnp.int8),
            jax.ShapeDtypeStruct((e_local, rows, n), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, h), jnp.int8),
            pltpu.VMEM((rows, tn), jnp.float32),
            pltpu.SemaphoreType.DMA((nk,)),
            pltpu.SemaphoreType.DMA((num_ranks, nk)),
            pltpu.SemaphoreType.DMA((num_ranks, nk)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=collective_id if num_ranks > 1 else None,
        ),
        interpret=(
            pltpu.InterpretParams(dma_execution_mode="eager")
            if interpret
            else False
        ),
    )(xsend, w1, sw1[:, None, :], sx[:, None, :])
    return out


def fused_dispatch_gmm1(
    x: jax.Array,          # [T, H] this rank's tokens (float)
    topk_idx: jax.Array,   # [T, K] global expert ids (−1 = inactive)
    w1: jax.Array,         # [E_local, H, N] int8
    sw1: jax.Array,        # [E_local, N] f32
    *,
    axis_name: str,
    num_experts: int,
    num_ranks: int,
    seg_capacity: int,
    tk: int | None = None,
    tn: int | None = None,
):
    """Routed fused dispatch→GEMM1 from the public routing machinery.

    Per-token INT8 quant → routing plan → sender-side placement at
    ``(dst, e_local·seg + idx_in_expert)`` → the single fused kernel.  Scales
    ride a (tiny) ``lax.all_to_all``.  Returns ``(out [E_local, R·seg, N]
    bf16, counts [E_local], handle)`` — the packed low-latency layout, so
    ``ep_core.combine_core`` consumes the expert outputs directly.
    """
    from sgl_kernel_npu_tpu.ops.quant import INT8_MAX, saturate_int8
    from sgl_kernel_npu_tpu.parallel import ep_core

    t, h = x.shape
    e_local = num_experts // num_ranks
    seg = seg_capacity
    er = e_local * seg
    my = jax.lax.axis_index(axis_name)
    plan = ep_core.make_routing_plan(
        topk_idx,
        num_experts=num_experts,
        num_ranks=num_ranks,
        my_rank=my,
        pair_capacity=er,
        seg_capacity=seg,
    )
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / INT8_MAX, 1e-12)
    xq = saturate_int8(xf / scale[:, None])

    # sender-side row position inside xsend[dst]: slot·seg + idx_in_expert
    # (each source owns its seg segment, so idx_in_expert < seg)
    sp = (plan.dest_slot // (num_ranks * seg)) * seg + plan.dest_slot % seg
    sp = jnp.where(plan.ok, sp, er)
    dst = jnp.where(plan.ok, plan.dst_rank, num_ranks)
    xsend = (
        jnp.zeros((num_ranks, er + 1, h), jnp.int8)
        .at[dst, sp].set(xq[plan.src_token], mode="drop")[:, :er]
    )
    ssend = (
        jnp.zeros((num_ranks, er + 1), jnp.float32)
        .at[dst, sp].set(scale[plan.src_token], mode="drop")[:, :er]
    )
    # scales: [R_dst, ER] → receiver [R_src, ER] → [E_local, R·seg]
    srecv = jax.lax.all_to_all(
        ssend.reshape(num_ranks, 1, er), axis_name, 0, 0, tiled=False
    ).reshape(num_ranks, e_local, seg)
    sx = srecv.transpose(1, 0, 2).reshape(e_local, num_ranks * seg)

    out = fused_dispatch_gmm1_rank(
        xsend, w1, sw1, sx,
        axis_name=axis_name, num_ranks=num_ranks, seg=seg, tk=tk, tn=tn)
    counts = plan.counts_per_expert  # my SEND counts; receivers' via psum
    k = topk_idx.shape[1]
    handle = ep_core.DispatchHandle(
        plan.gather_idx.reshape(t, k), plan.ok.reshape(t, k), None, None)
    return out, counts, handle
