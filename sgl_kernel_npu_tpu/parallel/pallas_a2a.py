"""Pallas one-sided window all-to-all over ICI (remote DMA + semaphores).

The TPU re-creation of the reference's HCCL-window transport
(csrc/deepep/ops/op_kernel/moe_distribute_dispatch_v2.h:91-110 window addressing,
sync_collectives.h flag discipline): every rank owns a symmetric receive window
(the kernel's output buffer), peers write their blocks directly into it with
``make_async_remote_copy``, and DMA semaphores are the arrival flags — the Pallas
equivalents of the reference's magic-tagged status words.

This backend replaces ``lax.all_to_all`` 1:1 inside the EP dispatch/combine
(``ep_core.dispatch_core(..., backend="pallas")``).  Block sizes are static, so
both sides construct matching DMA descriptors and no count phase is needed; the
ragged variant (send only ``count[d]`` rows — the bandwidth win over XLA's padded
collective) rides the same machinery with a count-exchange phase first and is the
next step on this path.

Validated hardware-free: JAX's distributed interpret mode simulates the remote
copies + semaphores across the 8-device CPU mesh (tests/test_pallas_a2a.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.utils.common import interpret_default


def _a2a_kernel(x_ref, o_ref, send_sems, recv_sems, *, axis_name, num_ranks):
    my = jax.lax.axis_index(axis_name)

    def send_copy(off):
        """Copy of my block for rank (my+off): block d of my send buffer → row
        `my` of rank d's window.  recv_sem slot = SOURCE rank, so on the
        receiving device each source signals a distinct slot (the per-(src)
        status-flag discipline of the reference's sync_collectives.h).
        The rotation schedule (rank r sends to r, r+1, …) staggers ICI traffic."""
        d = jax.lax.rem(my + off, num_ranks)
        return pltpu.make_async_remote_copy(
            src_ref=x_ref.at[d],
            dst_ref=o_ref.at[my],
            send_sem=send_sems.at[d],
            recv_sem=recv_sems.at[my],
            device_id=d,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    for off in range(num_ranks):
        send_copy(off).start()
    for off in range(num_ranks):
        send_copy(off).wait_send()
    # arrivals: matching descriptors per source (wait_recv only touches the
    # local dst_ref slice and recv_sem slot)
    for off in range(num_ranks):
        s = jax.lax.rem(my + off, num_ranks)
        pltpu.make_async_remote_copy(
            src_ref=x_ref.at[s],
            dst_ref=o_ref.at[s],
            send_sem=send_sems.at[s],
            recv_sem=recv_sems.at[s],
            device_id=s,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).wait_recv()


def pallas_all_to_all(
    x: jax.Array,
    *,
    axis_name: str,
    num_ranks: int,
    collective_id: int = 7,
    interpret: bool | None = None,
) -> jax.Array:
    """One-sided-window all-to-all: per-rank ``x [R, ...]`` → ``out [R, ...]`` where
    ``out[s]`` on rank r is ``x[r]`` from rank s (same semantics as
    ``lax.all_to_all(x, axis, 0, 0, tiled=True)`` with R blocks).

    Must be called inside ``shard_map`` over ``axis_name``.
    """
    if interpret is None:
        interpret = interpret_default()
    assert x.shape[0] == num_ranks, (x.shape, num_ranks)
    return pl.pallas_call(
        functools.partial(_a2a_kernel, axis_name=axis_name, num_ranks=num_ranks),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, collective_id=collective_id
        ),
        interpret=interpret,
    )(x)
