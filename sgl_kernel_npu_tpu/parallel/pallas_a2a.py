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

from sgl_kernel_npu_tpu.parallel.collective_ids import next_collective_id
from sgl_kernel_npu_tpu.utils.common import interpret_default


def _peer(d, axis_name, mesh_axes):
    """Device-id + type for peer ``d`` along ``axis_name``.

    ``mesh_axes=None``: the a2a spans the whole (1-D) mesh — LOGICAL ids.
    ``mesh_axes=(a0, a1, …)``: the a2a runs along ONE axis of a multi-axis
    mesh (e.g. the DCN ``node`` axis of a (node, ici) mesh, parallel/
    layered.py): ids become MESH coordinates with every other axis pinned at
    this rank's own index, so each cross-section forms an independent group.
    """
    if mesh_axes is None:
        return d, pltpu.DeviceIdType.LOGICAL
    coords = tuple(
        d if a == axis_name else jax.lax.axis_index(a) for a in mesh_axes
    )
    return coords, pltpu.DeviceIdType.MESH


def _entry_barrier(axis_name, num_ranks, mesh_axes=None):
    """All-peers kernel-entry barrier on the collective barrier semaphore.

    One-sided writes may land in a peer's window before that peer has entered
    the kernel (the hazard the reference guards with epoch-tagged sync flags,
    sync_collectives.h:13-59).  Every rank signals every rank once, then waits
    for ``num_ranks`` arrivals.  jax 0.9 couples this to ``collective_id``:
    the id names the barrier semaphore, and passing an id without using the
    barrier is a compile error — so kernels take a static ``use_barrier`` and
    the wrappers pass the allocator's id exactly when the barrier is traced
    (multi-rank compiled runs; interpret has no barrier lowering and 1-device
    self-loops need none).
    """
    barrier = pltpu.get_barrier_semaphore()
    my = jax.lax.axis_index(axis_name)
    for off in range(num_ranks):
        d = jax.lax.rem(my + jnp.int32(off), num_ranks)
        did, dtype = _peer(d, axis_name, mesh_axes)
        pltpu.semaphore_signal(
            barrier, inc=1, device_id=did, device_id_type=dtype,
        )
    pltpu.semaphore_wait(barrier, num_ranks)


def _a2a_kernel(x_ref, o_ref, send_sems, recv_sems, *, axis_name, num_ranks,
                use_barrier=False, mesh_axes=None):
    if use_barrier:
        _entry_barrier(axis_name, num_ranks, mesh_axes)
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
            device_id=_peer(d, axis_name, mesh_axes)[0],
            device_id_type=_peer(d, axis_name, mesh_axes)[1],
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
            device_id=_peer(s, axis_name, mesh_axes)[0],
            device_id_type=_peer(s, axis_name, mesh_axes)[1],
        ).wait_recv()


def _ragged_a2a_kernel(
    counts_ref,      # [R, 128] int32 VMEM (value in col 0): rows I send to each dst
    x_ref,           # [R, C, H] send buffer (rows 0..counts[d] of block d are live)
    o_ref,           # out [R, C, H] receive window
    oc_ref,          # out [R, 1] int32 receive counts window
    cnt_ssem, cnt_rsem, pay_ssem, pay_rsem,
    *,
    axis_name,
    num_ranks,
    chunk_rows,
    static_chunks,
    use_barrier=False,
    mesh_axes=None,
):
    if use_barrier:
        _entry_barrier(axis_name, num_ranks, mesh_axes)
    my = jax.lax.axis_index(axis_name)
    c_cap = x_ref.shape[1]
    max_chunks = (c_cap + chunk_rows - 1) // chunk_rows

    def chunk_count(n_rows):
        if static_chunks:
            # interpret-mode simulation rendezvouses per remote copy, so every
            # device must issue the same op count; extra chunks re-send stale
            # rows past `count`, which receivers ignore.  Hardware DMAs are
            # truly one-sided — the compiled path uses the dynamic count.
            return max_chunks
        return (n_rows + chunk_rows - 1) // chunk_rows

    def count_copy(off):
        d = jax.lax.rem(my + off, num_ranks)
        return pltpu.make_async_remote_copy(
            src_ref=counts_ref.at[pl.ds(d, 1)],
            dst_ref=oc_ref.at[pl.ds(my, 1)],
            send_sem=cnt_ssem.at[d],
            recv_sem=cnt_rsem.at[my],
            device_id=_peer(d, axis_name, mesh_axes)[0],
            device_id_type=_peer(d, axis_name, mesh_axes)[1],
        )

    def payload_chunk(dst, src_row_block, c):
        """Chunk c of my block `dst` → rows of the receiver's window row `src_row_block`."""
        return pltpu.make_async_remote_copy(
            src_ref=x_ref.at[dst, pl.ds(c * chunk_rows, chunk_rows)],
            dst_ref=o_ref.at[src_row_block, pl.ds(c * chunk_rows, chunk_rows)],
            send_sem=pay_ssem.at[dst],
            recv_sem=pay_rsem.at[src_row_block],
            device_id=_peer(dst, axis_name, mesh_axes)[0],
            device_id_type=_peer(dst, axis_name, mesh_axes)[1],
        )

    # phase A: counts (the reference's NotifyDispatch count exchange,
    # notify_dispatch.h:109-631, as one-sided writes + flags)
    for off in range(num_ranks):
        count_copy(off).start()

    # phase B: payload — only ceil(count/chunk) chunks per destination
    for off in range(num_ranks):
        d = jax.lax.rem(my + off, num_ranks)
        n_chunks = chunk_count(counts_ref[d, 0])

        def send_c(c, _, d=d):
            payload_chunk(d, my, c).start()
            return 0

        jax.lax.fori_loop(0, n_chunks, send_c, 0)

    # drain counts
    for off in range(num_ranks):
        count_copy(off).wait_send()
    for off in range(num_ranks):
        s = jax.lax.rem(my + off, num_ranks)
        pltpu.make_async_remote_copy(
            src_ref=counts_ref.at[pl.ds(s, 1)],
            dst_ref=oc_ref.at[pl.ds(s, 1)],
            send_sem=cnt_ssem.at[s],
            recv_sem=cnt_rsem.at[s],
            device_id=_peer(s, axis_name, mesh_axes)[0],
            device_id_type=_peer(s, axis_name, mesh_axes)[1],
        ).wait_recv()

    # drain payload: counts are now known on both sides
    for off in range(num_ranks):
        d = jax.lax.rem(my + off, num_ranks)
        n_chunks = chunk_count(counts_ref[d, 0])

        def wait_s(c, _, d=d):
            payload_chunk(d, my, c).wait_send()
            return 0

        jax.lax.fori_loop(0, n_chunks, wait_s, 0)
    for off in range(num_ranks):
        s = jax.lax.rem(my + off, num_ranks)
        n_chunks = chunk_count(oc_ref[s, 0])

        def wait_r(c, _, s=s):
            pltpu.make_async_remote_copy(
                src_ref=x_ref.at[s, pl.ds(c * chunk_rows, chunk_rows)],
                dst_ref=o_ref.at[s, pl.ds(c * chunk_rows, chunk_rows)],
                send_sem=pay_ssem.at[s],
                recv_sem=pay_rsem.at[s],
                device_id=_peer(s, axis_name, mesh_axes)[0],
                device_id_type=_peer(s, axis_name, mesh_axes)[1],
            ).wait_recv()
            return 0

        jax.lax.fori_loop(0, n_chunks, wait_r, 0)


FLAG_MAGIC = 0x5A17  # flag-row sentinel (reference sync_collectives.h magic tags)


def _ragged_a2a_monitored_kernel(
    counts_ref,      # [R, 128] int32 VMEM (value in col 0): rows I send to each dst
    x_ref,           # [R, C, H] send buffer
    o_ref,           # out [R, C, H] receive window
    oc_ref,          # out [R, 128] int32 receive counts window
    flags_ref,       # out [2R·8, 128] int32 HBM flag window: slot s (rows
                     # 8s..8s+8) = payload flag from source s; slot R+s = abort
                     # broadcast from rank s.  8 rows per slot: int32 HBM is
                     # (8, 128)-tiled, so every DMA offset stays tile-aligned
    stats_ref,       # out [R, 8] int32 SMEM: col0 flag-poll iters, col1
                     # timeout, col2 abort-seen, col3 = col0 (merged payload
                     # phase), col4 payload-missing flag, col5 reserved (0)
    cnt_ssem, cnt_rsem, pay_ssem, pay_rsem, flg_ssem, flg_rsem, loc_sem,
    fscr,            # VMEM scratch [2R·8, 128] int32: poll snapshot of the
                     # whole flags_ref window (same shape; slot s = rows
                     # 8s..8s+8, checked at rows_i == 8·s)
    fbuf,            # VMEM scratch [8, 128] int32: one flag-slot tile staged
                     # locally — starts as the zero tile, later the magic tile
    *,
    axis_name,
    num_ranks,
    chunk_rows,
    static_chunks,
    max_poll_rounds,
    inject_send_fault,
    use_sem_read,
    local_abort,
    use_barrier=False,
    mesh_axes=None,
):
    """Ragged a2a with failure detection — the reference's ``TimeOutDetection``
    (moe_distribute_dispatch_v2.h:23-26,1110-1126) + per-source wait-cost stats
    (``dispatch_wait_recv_cost_stats``, buffer.py:285-286), TPU-native:

    * **All flags are window MEMORY, written by DMA and polled by local DMA
      reads** — exactly the reference's flag/STATE_CHECK window discipline
      (``sync_collectives.h:17-120``).  ``pltpu.semaphore_read`` is NEVER used:
      on this TPU stack even a single read — DMA or regular semaphore — hangs
      the device (measured on chip, round 4; it also explains round 3's
      ``TPU backend error (Internal)`` and both tunnel wedges).
    * Each sender finishes its count+payload sends to a destination (local
      ``wait_send``), then DMA-writes a magic flag row into that destination's
      flag window.  The flag is a LIVENESS signal: data correctness still
      comes from matched descriptor ``wait_recv``s, which are guaranteed live
      once the flag is visible (the sends were fully issued).
    * The receiver's wait is a *bounded* poll loop: each round one local DMA
      snapshots the flag window, checked for the source's flag and for abort
      rows (poll iterations stand in for the reference's cycle counts).
    * On timeout the waiter DMA-writes an abort row into every peer's flag
      window — the reference's write into peers' STATE_CHECK offset — so the
      whole job exits its waits instead of hanging on one dead rank.
    * A timed-out / aborted source's recv count is forced to 0 (its window
      rows stay undefined) and the flags surface in ``stats``.  In-flight DMAs
      from a rank that died mid-send are not drained (their recv semaphores
      dangle) — the same post-abort exposure the reference accepts; the whole
      job is tearing down at that point.

    ``inject_send_fault`` (static) makes THIS rank send nothing — the test hook
    for exercising detection (the reference's inactive-rank test flags, SURVEY
    §5).  ``use_sem_read=False`` (interpret-mode default, where lazy DMA
    delivery would falsely time out on live sources) degrades to blocking
    waits with zeroed stats — functionally identical on the no-fault path."""
    if use_barrier:
        _entry_barrier(axis_name, num_ranks, mesh_axes)
    my = jax.lax.axis_index(axis_name)
    c_cap = x_ref.shape[1]
    max_chunks = (c_cap + chunk_rows - 1) // chunk_rows
    for s0 in range(num_ranks):  # SMEM: scalar stores only
        for c0 in range(stats_ref.shape[1]):
            stats_ref[s0, c0] = 0

    def chunk_count(n_rows):
        if static_chunks:
            return max_chunks
        return (n_rows + chunk_rows - 1) // chunk_rows

    def count_copy(off):
        d = jax.lax.rem(my + off, num_ranks)
        return pltpu.make_async_remote_copy(
            src_ref=counts_ref.at[pl.ds(d, 1)],
            dst_ref=oc_ref.at[pl.ds(my, 1)],
            send_sem=cnt_ssem.at[d],
            recv_sem=cnt_rsem.at[my],
            device_id=_peer(d, axis_name, mesh_axes)[0],
            device_id_type=_peer(d, axis_name, mesh_axes)[1],
        )

    def payload_chunk(dst, src_row_block, c):
        return pltpu.make_async_remote_copy(
            src_ref=x_ref.at[dst, pl.ds(c * chunk_rows, chunk_rows)],
            dst_ref=o_ref.at[src_row_block, pl.ds(c * chunk_rows, chunk_rows)],
            send_sem=pay_ssem.at[dst],
            recv_sem=pay_rsem.at[src_row_block],
            device_id=_peer(dst, axis_name, mesh_axes)[0],
            device_id_type=_peer(dst, axis_name, mesh_axes)[1],
        )

    def flag_copy(dst, src_slot, slot):
        # one-sided flag write: fbuf → dst's flag slot (8-row tile)
        return pltpu.make_async_remote_copy(
            src_ref=fbuf,
            dst_ref=flags_ref.at[pl.ds(8 * slot, 8)],
            send_sem=flg_ssem.at[dst],
            recv_sem=flg_rsem.at[src_slot],
            device_id=_peer(dst, axis_name, mesh_axes)[0],
            device_id_type=_peer(dst, axis_name, mesh_axes)[1],
        )

    # zero MY flag window (outputs are uninitialized memory), then barrier so
    # no peer's flag lands before the zeroing.  The fbuf staging tile starts
    # as the zero tile and later becomes the magic flag tile.
    fbuf[...] = jnp.zeros_like(fbuf)
    for slot0 in range(2 * num_ranks):
        z = pltpu.make_async_copy(
            fbuf, flags_ref.at[pl.ds(8 * slot0, 8)], loc_sem
        )
        z.start()
        z.wait()
    if use_barrier:
        _entry_barrier(axis_name, num_ranks, mesh_axes)

    if not inject_send_fault:
        for off in range(num_ranks):
            count_copy(off).start()
        for off in range(num_ranks):
            d = jax.lax.rem(my + off, num_ranks)
            n_chunks = chunk_count(counts_ref[d, 0])

            def send_c(c, _, d=d):
                payload_chunk(d, my, c).start()
                return 0

            jax.lax.fori_loop(0, n_chunks, send_c, 0)
        # drain own sends (local completion — independent of receiver
        # liveness), then flag each destination: count + payload to d are
        # fully issued, so d's descriptor waits are guaranteed live
        for off in range(num_ranks):
            count_copy(off).wait_send()
        for off in range(num_ranks):
            d = jax.lax.rem(my + off, num_ranks)
            n_chunks = chunk_count(counts_ref[d, 0])

            def wait_s(c, _, d=d):
                payload_chunk(d, my, c).wait_send()
                return 0

            jax.lax.fori_loop(0, n_chunks, wait_s, 0)
        fbuf[...] = jnp.full_like(fbuf, FLAG_MAGIC)
        for off in range(num_ranks):
            d = jax.lax.rem(my + off, num_ranks)
            flag_copy(d, my, my).start()

    # bounded flag poll per source: one local DMA snapshot of the flag window
    # per round (the reference's WaitStatus spin over its flag region)
    for off in range(num_ranks):
        s = jax.lax.rem(my + off, num_ranks)
        consume = pltpu.make_async_remote_copy(
            src_ref=counts_ref.at[pl.ds(s, 1)],
            dst_ref=oc_ref.at[pl.ds(s, 1)],
            send_sem=cnt_ssem.at[s],
            recv_sem=cnt_rsem.at[s],
            device_id=_peer(s, axis_name, mesh_axes)[0],
            device_id_type=_peer(s, axis_name, mesh_axes)[1],
        )

        def wait_r(c, _, s=s):
            pltpu.make_async_remote_copy(
                src_ref=x_ref.at[s, pl.ds(c * chunk_rows, chunk_rows)],
                dst_ref=o_ref.at[s, pl.ds(c * chunk_rows, chunk_rows)],
                send_sem=pay_ssem.at[s],
                recv_sem=pay_rsem.at[s],
                device_id=_peer(s, axis_name, mesh_axes)[0],
                device_id_type=_peer(s, axis_name, mesh_axes)[1],
            ).wait_recv()
            return 0

        if not use_sem_read:
            consume.wait_recv()
            if not inject_send_fault:  # flags are sent on this path; consume
                flag_copy(s, s, s).wait_recv()
            n_chunks = chunk_count(oc_ref[s, 0])
            jax.lax.fori_loop(0, n_chunks, wait_r, 0)
            continue

        def poll_cond(carry):
            it, arrived, aborted = carry
            return jnp.logical_and(
                jnp.logical_and(~arrived, ~aborted), it < max_poll_rounds
            )

        def poll_body(carry, s=s):
            it, _, _ = carry
            snap = pltpu.make_async_copy(flags_ref, fscr, loc_sem)
            snap.start()
            snap.wait()
            # all-vector flag checks (no scalar loads from VMEM): lane 0 of
            # each slot's first row, selected by iota
            hit = (fscr[:, :1] == FLAG_MAGIC).astype(jnp.int32)
            rows_i = jax.lax.broadcasted_iota(jnp.int32, hit.shape, 0)
            arrived = jnp.sum(jnp.where(rows_i == 8 * s, hit, 0)) > 0
            aborted = jnp.sum(jnp.where(rows_i >= 8 * num_ranks, hit, 0)) > 0
            return (it + 1, arrived, aborted)

        it, arrived, aborted = jax.lax.while_loop(
            poll_cond, poll_body, (jnp.int32(0), jnp.bool_(False), jnp.bool_(False))
        )
        timeout = jnp.logical_and(~arrived, ~aborted)
        stats_ref[s, 0] = it
        stats_ref[s, 1] = timeout.astype(jnp.int32)
        stats_ref[s, 2] = aborted.astype(jnp.int32)
        stats_ref[s, 3] = it
        stats_ref[s, 4] = (~arrived).astype(jnp.int32)

        @pl.when(timeout)
        def _():
            # reference: broadcast into peers' STATE_CHECK window region so
            # every rank exits its wait loops instead of hanging.
            # ``local_abort`` (1-device self-loop, or interpret where the
            # simulator's lazy delivery would never surface the write)
            # degrades to a local flag-window write.
            fbuf[...] = jnp.full_like(fbuf, FLAG_MAGIC)
            if local_abort:
                ab = pltpu.make_async_copy(
                    fbuf, flags_ref.at[pl.ds(8 * (num_ranks + my), 8)], loc_sem
                )
                ab.start()
                ab.wait()
            else:
                for d in range(num_ranks):
                    flag_copy(d, my, num_ranks + my).start()
                for d in range(num_ranks):
                    flag_copy(d, my, num_ranks + my).wait_send()

        @pl.when(arrived)
        def _(s=s):
            # data waits are descriptor-matched and live (flag ⇒ sends issued)
            consume.wait_recv()
            flag_copy(s, s, s).wait_recv()
            n_chunks = chunk_count(oc_ref[s, 0])
            jax.lax.fori_loop(0, n_chunks, wait_r, 0)

        @pl.when(~arrived)
        def _(s=s):
            # undefined window rows must not be consumed (vector row store:
            # Mosaic disallows scalar stores to VMEM)
            oc_ref[pl.ds(s, 1)] = jnp.zeros((1, oc_ref.shape[1]), oc_ref.dtype)

    # drain own flag sends (local completion; skipped rows on the abort path
    # are the documented teardown exposure)
    if not inject_send_fault:
        for off in range(num_ranks):
            d = jax.lax.rem(my + off, num_ranks)
            flag_copy(d, my, my).wait_send()


def pallas_ragged_all_to_all(
    x: jax.Array,
    counts: jax.Array,
    *,
    axis_name: str,
    num_ranks: int,
    chunk_rows: int = 32,
    collective_id: int | None = None,
    interpret: bool | None = None,
    static_chunks: bool | None = None,
    monitor: bool = False,
    max_poll_rounds: int = 5_000_000,
    inject_send_fault: bool = False,
    force_sem_read: bool | None = None,
    mesh_axes: tuple | None = None,
):
    """Ragged window all-to-all: transfer only ``counts[d]`` live rows per pair.

    This is the bandwidth win over both ``lax.all_to_all`` and the fixed-size
    window backend, which move the full worst-case capacity: with balanced top-k
    routing the live rows are ~``T·K/R`` of a ``T·min(K, E_local)`` capacity.
    Two phases, exactly the reference protocol (count exchange = NotifyDispatch;
    chunked one-sided payload writes = CamMoeDispatch window traffic).

    Args: ``x [R, C, …]`` send blocks; ``counts [R]`` live rows per destination.
    Returns ``(recv [R, C, …], recv_counts [R])``; receiver rows past
    ``recv_counts[s]`` are undefined — mask downstream.

    ``monitor=True`` adds timeout detection + wait-cost stats (see
    :func:`_ragged_a2a_monitored_kernel`) and returns ``(recv, recv_counts,
    stats [R, 6])`` — cols: 0 poll iterations until flag arrival, 1 timeout
    flag, 2 abort-observed flag, 3 = col 0 (payload waits merge into the flag
    poll), 4 payload-missing flag, 5 reserved-zero (send-side cost needs a
    semaphore read, which wedges this stack — receiver matrices carry the
    reference's ``dispatch_wait_recv_cost_stats`` role, buffer.py:285-286).
    ``max_poll_rounds`` must be sized so a merely-SLOW source cannot falsely
    time out: each poll round costs a full local DMA snapshot of the flag
    window (≫ 1 µs), so the default bounds the wait at seconds — far beyond
    any live sender's flag latency; a false timeout on a live source leaves
    that source's in-flight DMAs undrained (semaphore-nonzero teardown), the
    same post-abort exposure the reference accepts on a REAL timeout.
    ``inject_send_fault`` makes this rank mute (test hook).
    """
    if interpret is None:
        interpret = interpret_default()
    if collective_id is None:
        collective_id = next_collective_id()
    if static_chunks is None:
        static_chunks = interpret  # see chunk_count: interpret sim needs symmetry
    r, c_cap = x.shape[0], x.shape[1]
    assert r == num_ranks
    # Mosaic DMA slices must keep the lane (last) dim a multiple of the 128
    # tile; thin payloads (meta blobs, scale columns) are padded to one full
    # lane tile here and sliced back after the exchange (chip compile rejects
    # them otherwise: "Slice shape along dimension 2 must be aligned").
    trail = x.shape[2:]
    lane = 1
    for dim in trail:
        lane *= dim
    # Flatten/pad unless the trailing shape is already exactly [lane%128==0]:
    # a multi-dim trailing shape with an aligned PRODUCT but misaligned last
    # dim (e.g. [R, C, 64, 2]) still DMA-slices along a misaligned minor dim
    # and hits the Mosaic "Slice shape ... must be aligned" compile error.
    if len(trail) != 1 or trail[-1] % 128:
        lane_p = -(-max(lane, 1) // 128) * 128
        xp = jnp.pad(
            x.reshape(r, c_cap, lane), ((0, 0), (0, 0), (0, lane_p - lane))
        )
        res = pallas_ragged_all_to_all(
            xp, counts, axis_name=axis_name, num_ranks=num_ranks,
            chunk_rows=chunk_rows, collective_id=collective_id,
            interpret=interpret, static_chunks=static_chunks, monitor=monitor,
            max_poll_rounds=max_poll_rounds,
            inject_send_fault=inject_send_fault,
            force_sem_read=force_sem_read,
            mesh_axes=mesh_axes,
        )
        out = res[0][..., :lane].reshape(x.shape)
        return (out, *res[1:])
    # Interpret defaults to blocking waits: the simulator delivers remote
    # copies lazily, so a bounded poll would falsely time out on LIVE sources.
    # ``force_sem_read=True`` opts back into the bounded-poll decision logic —
    # with every source muted (inject_send_fault) the poll legitimately never
    # sees an arrival, which is exactly how the CI timeout test drives the
    # timeout → abort-broadcast → truncate → drain branch hardware-free
    # (VERDICT r3 #5; reference TimeOutDetection,
    # moe_distribute_dispatch_v2.h:1110-1178).
    use_sem_read = (not interpret) if force_sem_read is None else force_sem_read
    assert not (inject_send_fault and not use_sem_read), (
        "fault injection needs the bounded-poll path (hardware or "
        "force_sem_read); blocking waits would deadlock on the muted rank"
    )
    counts_in = jnp.broadcast_to(
        counts.reshape(num_ranks, 1).astype(jnp.int32), (num_ranks, 128)
    )
    # entry barrier exactly on compiled multi-rank runs: interpret has no
    # barrier lowering (its rendezvous per remote copy is the sync), and
    # 1-device self-loops need none.  jax 0.9 allows collective_id iff the
    # kernel uses the barrier semaphore (see _entry_barrier).
    use_barrier = (not interpret) and num_ranks > 1
    common = dict(
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=collective_id if use_barrier else None,
        ),
        interpret=interpret,
    )
    if monitor:
        out, oc, _flags, stats = pl.pallas_call(
            functools.partial(
                _ragged_a2a_monitored_kernel,
                axis_name=axis_name,
                num_ranks=num_ranks,
                chunk_rows=min(chunk_rows, c_cap),
                static_chunks=static_chunks,
                max_poll_rounds=max_poll_rounds,
                inject_send_fault=inject_send_fault,
                use_sem_read=use_sem_read,
                local_abort=interpret or num_ranks == 1,
                use_barrier=use_barrier,
                mesh_axes=mesh_axes,
            ),
            out_shape=(
                jax.ShapeDtypeStruct(x.shape, x.dtype),
                jax.ShapeDtypeStruct((num_ranks, 128), jnp.int32),
                jax.ShapeDtypeStruct((2 * num_ranks * 8, 128), jnp.int32),
                jax.ShapeDtypeStruct((num_ranks, 8), jnp.int32),
            ),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                # flag window in HBM: polled via explicit local DMA snapshots,
                # which the compiler cannot cache/hoist (a VMEM ref read in a
                # spin loop could be)
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((num_ranks,)),
                pltpu.SemaphoreType.DMA((num_ranks,)),
                pltpu.SemaphoreType.DMA((num_ranks,)),
                pltpu.SemaphoreType.DMA((num_ranks,)),
                pltpu.SemaphoreType.DMA((num_ranks,)),
                pltpu.SemaphoreType.DMA((num_ranks,)),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((2 * num_ranks * 8, 128), jnp.int32),
                pltpu.VMEM((8, 128), jnp.int32),
            ],
            **common,
        )(counts_in, x)
        return out, oc[:, 0], stats[:, :6]
    out, oc = pl.pallas_call(
        functools.partial(
            _ragged_a2a_kernel,
            axis_name=axis_name,
            num_ranks=num_ranks,
            chunk_rows=min(chunk_rows, c_cap),
            static_chunks=static_chunks,
            use_barrier=use_barrier,
            mesh_axes=mesh_axes,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((num_ranks, 128), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
        ],
        **common,
    )(counts_in, x)
    return out, oc[:, 0]


def pallas_all_to_all(
    x: jax.Array,
    *,
    axis_name: str,
    num_ranks: int,
    collective_id: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """One-sided-window all-to-all: per-rank ``x [R, ...]`` → ``out [R, ...]`` where
    ``out[s]`` on rank r is ``x[r]`` from rank s (same semantics as
    ``lax.all_to_all(x, axis, 0, 0, tiled=True)`` with R blocks).

    Must be called inside ``shard_map`` over ``axis_name``.
    """
    if interpret is None:
        interpret = interpret_default()
    if collective_id is None:
        collective_id = next_collective_id()
    assert x.shape[0] == num_ranks, (x.shape, num_ranks)
    # lane-tile padding for thin blocks (see pallas_ragged_all_to_all)
    trail = x.shape[1:]
    lane = 1
    for dim in trail:
        lane *= dim
    # canonical compiled shape is [R, rows, 128]: flatten/pad any input whose
    # last dim is not lane-aligned, even if the trailing PRODUCT is (see
    # pallas_ragged_all_to_all)
    if len(trail) != 2 or trail[-1] % 128:
        rows = -(-max(lane, 1) // 128)
        xp = jnp.pad(x.reshape(num_ranks, lane), ((0, 0), (0, rows * 128 - lane)))
        out = pallas_all_to_all(
            xp.reshape(num_ranks, rows, 128), axis_name=axis_name,
            num_ranks=num_ranks, collective_id=collective_id,
            interpret=interpret,
        )
        return out.reshape(num_ranks, rows * 128)[:, :lane].reshape(x.shape)
    use_barrier = (not interpret) and num_ranks > 1  # see _entry_barrier
    return pl.pallas_call(
        functools.partial(_a2a_kernel, axis_name=axis_name, num_ranks=num_ranks,
                          use_barrier=use_barrier),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=collective_id if use_barrier else None,
        ),
        interpret=interpret,
    )(x)
