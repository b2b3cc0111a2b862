"""Single-kernel fused EP dispatch → grouped GEMM1 (the reference's FusedDeepMoe
core, csrc/deepep/ops/op_kernel/fused_deep_moe.h:60-120, rebuilt TPU-native).

One Pallas kernel per rank: remote-DMAs this rank's routed rows into every
peer's receive window in K-COLUMN chunks, then computes the per-expert W8A8
GEMM gated on chunk arrival — the MXU starts on hidden-dim chunk 0 while later
chunks are still in flight (the callback-preload overlap of the reference's
CATLASS ``MmadAtlasA2PreloadAsyncWithCallback``, as a semaphore-gated grid).

Layout contract (per rank, inside shard_map over ``axis_name``):
- ``xsend [NK, R, ER, tk] int8`` — MY routed rows, pre-placed at
  ``[dst, e_local·seg + slot]`` and pre-chunked along hidden (ER = E_local·seg;
  one contiguous block per (k-chunk, destination) send);
- the receive window (an ANY-space output) is ``[NK, R, ER, tk]`` indexed by
  SOURCE — the symmetric-buffer discipline of the reference's HCCL windows;
- row scales ``sx [E_local, R·seg]`` and weight scales travel outside the
  kernel (tiny; no overlap value).

Weights stream once (block (e, kt, nt)); the expert's full activation slab
lives in VMEM (``R·seg × H`` int8) and is assembled from window chunks during
the expert's FIRST n-tile pass — expert 0's assembly is what overlaps the
transfer; later experts' chunks have already arrived.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(
    xsend_ref,   # ANY [NK, R, ER, tk] int8 (my sends, pre-chunked)
    w_ref,       # VMEM block [1, tk, tn] int8
    sw_ref,      # VMEM block [1, 1, tn] f32
    sx_ref,      # VMEM block [1, 1, rows] f32
    win_ref,     # ANY out [NK, R, ER, tk] int8 (written by peers)
    out_ref,     # VMEM out block [1, rows, tn] bf16
    x_vmem,      # VMEM scratch [rows, H] int8
    acc,         # VMEM scratch [rows, tn] f32
    lsem,        # local DMA sem
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
    rows = x_vmem.shape[0]            # R * seg

    def remote(ck, *, to):
        return pltpu.make_async_remote_copy(
            src_ref=xsend_ref.at[ck, to],
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
            src_ref=xsend_ref.at[ck, s],
            dst_ref=win_ref.at[ck, s],
            send_sem=ssem.at[s, ck],
            recv_sem=rsem.at[s, ck],
            device_id=s,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
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

    @pl.when(nt == 0)
    def _fill_slab():
        @pl.when(e == 0)
        def _arrivals():
            for s in range(num_ranks):
                recv_descriptor(s, kt).wait_recv()

        for s in range(num_ranks):
            cp = pltpu.make_async_copy(
                win_ref.at[kt, s, pl.ds(e * seg, seg)],
                x_vmem.at[pl.ds(s * seg, seg), pl.ds(kt * tk, tk)],
                lsem,
            )
            cp.start()
            cp.wait()

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
    tk: int = 1024,
    tn: int = 512,
    collective_id: int | None = None,
):
    """Fused one-sided dispatch + dequantizing grouped GEMM1 (run in shard_map).

    Returns ``out [E_local, R·seg, N] bf16``.  Requires ``H % tk == 0``,
    ``N % tn == 0``.  No CPU-interpret mode (remote DMA semaphores)."""
    from sgl_kernel_npu_tpu.parallel.collective_ids import next_collective_id

    if collective_id is None:
        collective_id = next_collective_id()
    r, er, h = xsend.shape
    e_local, _, n = w1.shape
    assert er == e_local * seg and h % tk == 0 and n % tn == 0
    nk, n_nt = h // tk, n // tn
    rows = num_ranks * seg
    # pre-chunk sends along hidden so every remote DMA is one contiguous block
    xsend_c = xsend.reshape(r, er, nk, tk).transpose(2, 0, 1, 3)

    grid = (e_local, n_nt, nk)
    _win, out = pl.pallas_call(
        functools.partial(
            _fused_kernel, axis_name=axis_name, num_ranks=num_ranks, seg=seg,
            tk=tk, nk=nk, n_experts=e_local),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, tk, tn), lambda e, nt, kt: (e, kt, nt)),
            pl.BlockSpec((1, 1, tn), lambda e, nt, kt: (e, 0, nt)),
            pl.BlockSpec((1, 1, rows), lambda e, nt, kt: (e, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, rows, tn), lambda e, nt, kt: (e, 0, nt)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nk, num_ranks, er, tk), jnp.int8),
            jax.ShapeDtypeStruct((e_local, rows, n), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, h), jnp.int8),
            pltpu.VMEM((rows, tn), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((num_ranks, nk)),
            pltpu.SemaphoreType.DMA((num_ranks, nk)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=collective_id if num_ranks > 1 else None,
        ),
    )(xsend_c, w1, sw1[:, None, :], sx[:, None, :])
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
    tk: int = 1024,
    tn: int = 512,
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
