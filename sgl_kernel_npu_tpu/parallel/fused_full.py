"""FULL single-kernel fused MoE: one-sided dispatch → GMM1 → SwiGLU+requant →
GMM2 → one-sided combine return → in-kernel weighted reduce.

The TPU re-creation of the reference's complete ``FusedDeepMoe`` op
(csrc/deepep/ops/op_kernel/fused_deep_moe.h:35 ``ENABLE_GMM2_COMBINE`` and
:60-120 ``GmmDeqSwigluQuant``): ONE ``pallas_call`` per rank takes this rank's
routed tokens and returns the combined MoE output ``[T, H]`` — every hop
(dispatch window writes, both W8A8 grouped GEMMs, the activation, the combine
return DMA, and the weighted reduction) happens inside the kernel, so on a real
mesh the ICI transfers hide behind the expert GEMMs instead of serializing
between kernel launches.

Design (TPU-native, not a translation):

* **Compact ragged segments.**  A count all-gather (tiny, runs *before* the
  kernel — the NotifyDispatch phase, notify_dispatch.h:109-631) gives every
  rank the full ``[src, dst, expert]`` count tensor, so both sides compute all
  window offsets and the receive layout packs live rows back-to-back, grouped
  by expert: the GEMMs do live-rows-only work (the reference reads
  ``ep_recv_count`` for the same reason), and the combine moves live rows only
  (reference ReduceScatterTrans, moe_distribute_combine_v2.h:70).
* **Metadata-driven flat grid.**  The grid is ``(slot, step)`` where each slot
  is one (expert, m-tile) pair — tiles never straddle experts — and the steps
  of a slot run GMM1's (n, k) sweep then GMM2's.  Which (expert, row-range)
  each slot owns comes from scalar-prefetched arrays computed on device from
  the counts; dead slots are packed last and pin their block indices (no
  refetch, no MXU).
* **Arrival-gated compute.**  Sends go out expert-major in the first step;
  each expert's first slot waits only on that expert's segments, so later
  experts' traffic still rides ICI while earlier experts multiply.
* **Combine returns stream per tile.**  As soon as a tile's GMM2 rows are
  done they are remote-DMA'd back to their source ranks' return windows (the
  return layout mirrors each sender's compact send layout, so row ``i`` of my
  send buffer gets its expert output back at return-window row ``i``).  The
  final reduction is a masked matmul: ``combined = mask @ ret_window`` with
  the top-k weights scattered into ``mask`` at send positions (token-granular
  gathers lower to scalar reads on TPU; the matmul reads at full bandwidth).
* **Static-shape mode** (``static_shapes=True``): every offset/size uses the
  worst-case segment capacity instead of live counts.  Values are then
  rank-independent, which makes DMA op counts symmetric — required by JAX's
  distributed interpret simulator — so the full chain is CI-testable on the
  8-device CPU mesh (the reference can only test on real NPUs, SURVEY §4).
  Hardware uses compact mode.

Numerics match the unfused chain (`fused_moe.fused_deep_moe_rank`): same
per-token INT8 quant, same dequant/SwiGLU/requant formulas, bf16 combine with
the top-k weights split hi+lo into two bf16 dot products (f32-accurate weights
at bf16 MXU rate).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.quant import INT8_MAX, saturate_int8, wire_quant
from sgl_kernel_npu_tpu.parallel import ep_core
from sgl_kernel_npu_tpu.utils.common import cdiv, interpret_default


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


ROW_ALIGN = 8  # Mosaic: dynamic row offsets into tiled refs must be 8-aligned


def _align(x):
    return -(-x // ROW_ALIGN) * ROW_ALIGN


@dataclass(frozen=True)
class _FusedDims:
    """Static geometry of one fused call (python ints only)."""

    num_ranks: int
    e_local: int
    seg: int          # per-(expert, src) row capacity
    t: int            # tokens on this rank
    h: int            # hidden
    n1: int           # GMM1 output width (= 2·I, gate/up packed)
    i: int            # intermediate (= n1 // 2)
    tm: int
    tk1: int
    tn1: int
    tk2: int
    tn2: int
    tn3: int
    cap_send: int     # send/return-window rows (rounded to tm)
    cap_recv: int     # receive-window rows (rounded to tm)
    s_compute: int    # compute slots (worst case)
    s_total: int
    p1: int           # GMM1 steps per slot
    p2: int           # GMM2 steps per slot
    p: int            # steps per slot (= p1 + p2)
    rt_cnt: int       # reduce row-tiles (cap_send // tm)

    @property
    def nk1(self):
        return self.h // self.tk1

    @property
    def nt1(self):
        return self.n1 // self.tn1

    @property
    def nk2(self):
        return self.i // self.tk2

    @property
    def nt2(self):
        return self.h // self.tn2

    @property
    def nt3(self):
        return self.h // self.tn3


def _make_dims(
    *, num_ranks, e_local, seg, t, k, h, n1,
    tm, tk1, tn1, tk2, tn2, tn3, static_shapes,
) -> _FusedDims:
    i = n1 // 2
    assert n1 % 2 == 0 and h % tk1 == 0 and n1 % tn1 == 0 and tn1 % 2 == 0
    assert i % tk2 == 0 and h % tn2 == 0 and h % tn3 == 0
    assert tm % 32 == 0, "int8 row tiles need 32-row alignment"
    assert seg <= tm, (
        "a (expert, src) segment must fit in one m-tile so the combine return "
        f"splits at most once per segment (seg={seg}, tm={tm})"
    )
    if static_shapes:
        assert tm % seg == 0 or seg % tm == 0, (
            "static mode needs segment/tile alignment so remote-DMA op counts "
            f"match across ranks (tm={tm}, seg={seg})"
        )
    # every (dst, expert) segment slot is 8-row aligned (ROW_ALIGN padding)
    seg_al = _align(seg)
    worst_send = num_ranks * e_local * seg_al
    if not static_shapes:
        worst_send = min(worst_send, t * k + (ROW_ALIGN - 1) * num_ranks * e_local)
    cap_send = _round_up(worst_send, tm)
    worst_recv = e_local * num_ranks * seg_al
    if not static_shapes:
        worst_recv = min(
            worst_recv, num_ranks * t * k + (ROW_ALIGN - 1) * num_ranks * e_local
        )
    # +tm headroom: tiles start at group offsets (not tm multiples), so the last
    # tile's [row0, row0+tm) slab read may run past the live rows
    cap_recv = _round_up(worst_recv, tm) + tm
    s_compute = min(
        e_local * cdiv(num_ranks * seg_al, tm),
        cdiv(worst_recv, tm) + e_local,
    )
    p1 = (n1 // tn1) * (h // tk1)
    p2 = (h // tn2) * (i // tk2)
    p = p1 + p2
    rt_cnt = cap_send // tm
    reduce_steps = (h // tn3) * rt_cnt
    s_total = s_compute + cdiv(reduce_steps, p)
    return _FusedDims(
        num_ranks=num_ranks, e_local=e_local, seg=seg, t=t, h=h, n1=n1, i=i,
        tm=tm, tk1=tk1, tn1=tn1, tk2=tk2, tn2=tn2, tn3=tn3,
        cap_send=cap_send, cap_recv=cap_recv, s_compute=s_compute,
        s_total=s_total, p1=p1, p2=p2, p=p, rt_cnt=rt_cnt,
    )


def _divisors_128(n: int) -> list[int]:
    return [v for v in range(128, n + 1, 128) if n % v == 0]


def select_full_tiles(
    *,
    t: int,
    k: int,
    h: int,
    i: int,
    e_local: int,
    num_ranks: int,
    seg: int,
    vmem_budget: int = 13 * 2**20,
) -> dict:
    """Traffic-model tile selection for the FULL fused kernel.

    Weight traffic is tile-independent (every [tk, tn] block streams once), so
    the objective is grid-step count: the round-3 hand-set (tm 128, tk 1024,
    tn 512) grid ran p=35–84 steps per slot — hundreds of µs of pure per-step
    overhead at DeepSeek decode shapes (the same failure mode BENCH_r03 showed
    for the sub-kernel).  Minimize ``s_compute·p + reduce_steps`` under a VMEM
    residency budget; mirrors ``_make_dims``'s geometry (the modeled VMEM terms
    are the kernel's scratch + double-buffered blocks).

    ``tn1`` is LAYOUT-COUPLED: gate/up weights must be packed with
    ``pack_gmm1_weights(..., tn=tn1)`` — use this selector at the packing site
    and pass the same dict to :func:`fused_deep_moe_full_rank`.
    """
    n1 = 2 * i
    seg_al = _align(seg)
    worst_recv = min(e_local * num_ranks * seg_al,
                     num_ranks * t * k + (ROW_ALIGN - 1) * num_ranks * e_local)
    worst_send = min(num_ranks * e_local * seg_al,
                     t * k + (ROW_ALIGN - 1) * num_ranks * e_local)
    best, best_key = None, None
    tn1s = [v for v in _divisors_128(n1) if v % 256 == 0 or v == n1]
    for tm in (128, 256):
        s_compute = min(
            e_local * cdiv(num_ranks * seg_al, tm),
            cdiv(worst_recv, tm) + e_local,
        )
        rt_cnt = _round_up(worst_send, tm) // tm
        for tn1 in tn1s:
            for tk1 in _divisors_128(h):
                p1 = (n1 // tn1) * (h // tk1)
                for tk2 in _divisors_128(i):
                    for tn2 in _divisors_128(h):
                        p2 = (h // tn2) * (i // tk2)
                        for tn3 in _divisors_128(h):
                            vmem = (
                                tm * h              # xslab int8
                                + 2 * tm * h        # yslab bf16
                                + 4 * tm * i        # h2f f32
                                + tm * i            # h2q int8
                                + 4 * tm * max(tn1, tn2)   # acc f32
                                + 2 * tk1 * tn1     # w1 block ×2
                                + 2 * tk2 * tn2     # w2 block ×2
                                + 4 * t * tn3       # racc f32
                                + 2 * 2 * tm * tn3  # rblk bf16 ×2
                                + 2 * 2 * t * tn3   # out block ×2 bf16
                                + 2 * 2 * tm * 2 * t  # mask block ×2 bf16
                            )
                            if vmem > vmem_budget:
                                continue
                            p = p1 + p2
                            steps = s_compute * p + (h // tn3) * rt_cnt
                            key = (steps, p, -tn1)
                            if best_key is None or key < best_key:
                                best = dict(tm=tm, tk1=tk1, tn1=tn1,
                                            tk2=tk2, tn2=tn2, tn3=tn3)
                                best_key = key
    assert best is not None, (t, k, h, i, e_local, num_ranks, seg)
    return best


def _build_metadata(counts_eff: jax.Array, my: jax.Array, d: _FusedDims):
    """All offsets + the slot schedule, from the all-gathered count tensor.

    ``counts_eff [R_src, R_dst, E_local]`` — live counts (compact mode) or the
    constant segment capacity (static mode).  Everything below is identical
    jnp either way; in static mode the values are rank-independent.
    """
    r, e = d.num_ranks, d.e_local
    # 8-aligned segment slots: offsets stay DMA-legal at every piece (see
    # _dma_chain); transfers round up into the padding, never past the slot
    counts_al = (-(-counts_eff // ROW_ALIGN) * ROW_ALIGN).astype(jnp.int32)

    def excl_cumsum_2d(m):  # exclusive cumsum over the flattened last two dims
        flat = m.reshape(m.shape[0], -1)
        cs = jnp.cumsum(flat, axis=1) - flat
        return cs.reshape(m.shape)

    # send layout of every rank: rows sorted (dst major, expert minor)
    send_layout = excl_cumsum_2d(counts_al)               # [S, D, E]
    send_off = send_layout[my]                            # [D, E] my xs offsets
    ret_off = send_layout[:, my]                          # [S, E]: rank s's offset of (dst=my, e)
    # receive layout of every rank: rows sorted (expert major, src minor)
    recv_layout = excl_cumsum_2d(counts_al.transpose(1, 2, 0))  # [D, E, S]
    recv_off = recv_layout[my].transpose(1, 0)            # [S, E] my window offsets
    dst_off = recv_layout[:, :, my]                       # [D, E] my segment's spot at dst

    cnt_send = counts_eff[my]                             # [D, E]
    cnt_recv = counts_eff[:, my, :]                       # [S, E]

    # Combine-return wait descriptors must mirror the sender's EXACTLY — src
    # slice included (one-sided waits are matched descriptor-for-descriptor).
    # Each destination d returns my segment from its y stage at
    # yhbm[slot, yrow]; a tile boundary splits the segment at most once
    # (seg ≤ tm).  Everything is derivable from the count tensor:
    gs_d = recv_layout[:, :, 0]                           # [D, E] group starts at d
    rel = dst_off - gs_d                                  # my segment's row within d's group
    comb_split = jnp.clip(-(-rel // d.tm) * d.tm - rel, 0, cnt_send)
    rows_all = counts_al.sum(0)                           # [D, E] rows per (dst, expert)
    tiles_all = -(-rows_all // d.tm)                      # [D, E] tiles per (dst, expert)
    tile_base = jnp.cumsum(tiles_all, axis=1) - tiles_all  # [D, E]
    j1 = rel // d.tm
    comb_slot1 = tile_base + j1
    comb_yrow1 = rel - j1 * d.tm
    rel2 = rel + comb_split
    j2 = rel2 // d.tm
    comb_slot2 = tile_base + j2
    comb_yrow2 = rel2 - j2 * d.tm

    rows_e = counts_al[:, my, :].sum(axis=0)              # [E] slot rows per expert
    group_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(rows_e)[:-1]]
    ).astype(jnp.int32)

    # slot schedule: per-expert m-tiles, live slots packed first
    tiles_e = cdiv(rows_e, d.tm).astype(jnp.int32)
    tile_ends = jnp.cumsum(tiles_e)
    n_live = tile_ends[-1].astype(jnp.int32)
    slot = jnp.arange(d.s_total, dtype=jnp.int32)
    g_live = jnp.clip(
        jnp.searchsorted(tile_ends, slot, side="right"), 0, e - 1
    ).astype(jnp.int32)
    j = slot - (tile_ends[g_live] - tiles_e[g_live])
    row0 = group_start[g_live] + j * d.tm
    valid = jnp.clip(rows_e[g_live] - j * d.tm, 0, d.tm)
    live = slot < n_live
    # pads pin to the last live slot's blocks (no refetch)
    last = jnp.maximum(n_live - 1, 0)
    lg = jnp.clip(jnp.searchsorted(tile_ends, last, side="right"), 0, e - 1)
    lrow0 = group_start[lg] + (last - (tile_ends[lg] - tiles_e[lg])) * d.tm
    g_arr = jnp.where(live, g_live, lg).astype(jnp.int32)
    row0_arr = jnp.where(live, row0, lrow0).astype(jnp.int32)
    valid_arr = jnp.where(live, valid, 0).astype(jnp.int32)
    first_arr = jnp.where(live & (j == 0), 1, 0).astype(jnp.int32)

    return dict(
        cnt_send=cnt_send.reshape(-1).astype(jnp.int32),
        send_off=send_off.reshape(-1).astype(jnp.int32),
        dst_off=dst_off.reshape(-1).astype(jnp.int32),
        cnt_recv=cnt_recv.reshape(-1).astype(jnp.int32),
        recv_off=recv_off.reshape(-1).astype(jnp.int32),
        ret_off=ret_off.reshape(-1).astype(jnp.int32),
        comb_split=comb_split.reshape(-1).astype(jnp.int32),
        comb_slot1=comb_slot1.reshape(-1).astype(jnp.int32),
        comb_yrow1=comb_yrow1.reshape(-1).astype(jnp.int32),
        comb_slot2=comb_slot2.reshape(-1).astype(jnp.int32),
        comb_yrow2=comb_yrow2.reshape(-1).astype(jnp.int32),
        g_arr=g_arr, row0_arr=row0_arr, valid_arr=valid_arr, first_arr=first_arr,
        n_live=n_live, rows_e=rows_e, send_off_2d=send_off,
    )


def _dma_chain(size, make_copy, op, big: int = 128):
    """Cover ``[0, align8(size))`` rows with ``big``-row chunks + an 8-row tail.

    Pieces sit at 8-aligned offsets — Mosaic requires dynamic row offsets into
    tiled (HBM/VMEM) refs to be provably 8-divisible, so ALL layout offsets in
    this kernel are 8-aligned and the up-to-7 overflow rows land in the
    segment's alignment padding.  ``size`` may be traced; ``make_copy(row_off,
    rows)`` builds the descriptor; ``op`` applies ``.start()`` /
    ``.wait_recv()`` / ``.wait_send()``.

    The two-tier decomposition matters: descriptor issue is serial scalar-core
    work, and the round-3 all-8-row version put ~1300 descriptors on the
    critical path of one decode-shape call (BENCH: fused_full 1225 µs vs a
    430 µs weight floor).  A full 128-row segment is ONE descriptor now.
    Senders and waiters MUST decompose identically (one-sided transfers match
    descriptor-for-descriptor) — both sides call this function with the same
    ``size``, so they do."""
    nb = size // big

    def chunk_big(c, _):
        op(make_copy(c * big, big))
        return 0

    jax.lax.fori_loop(0, nb, chunk_big, 0, unroll=False)
    base = nb * big
    n8 = (size - base + ROW_ALIGN - 1) // ROW_ALIGN

    def chunk8(c, _):
        op(make_copy(base + c * ROW_ALIGN, ROW_ALIGN))
        return 0

    jax.lax.fori_loop(0, n8, chunk8, 0, unroll=False)


def _fused_full_kernel(
    # scalar prefetch
    g_ref, row0_ref, valid_ref, first_ref,
    cnt_send_ref, send_off_ref, dst_off_ref,
    cnt_recv_ref, recv_off_ref, ret_off_ref,
    comb_split_ref, comb_slot1_ref, comb_yrow1_ref,
    comb_slot2_ref, comb_yrow2_ref, misc_ref,
    # inputs
    xs_ref, ss_ref, mask_ref, rlive_ref, w1_ref, sw1_ref, w2_ref, sw2_ref,
    # outputs
    xwin_ref, swin_ref, retwin_ref, yhbm_ref, out_ref,
    # scratch
    xslab, sxslab, h2f, h2q, s2, acc, yslab, racc, rblk, rmaskv,
    lsem, disp_ssem, disp_rsem, sc_ssem, sc_rsem, comb_ssem, comb_rsem,
    *,
    d: _FusedDims,
    axis_name: str,
    phases: frozenset = frozenset({"send", "fill", "combine", "reduce"}),
):
    r, e = d.num_ranks, d.e_local
    s_id = pl.program_id(0)
    p_id = pl.program_id(1)
    my = jax.lax.axis_index(axis_name) if r > 1 else 0
    n_live = misc_ref[0]

    def dev(i):
        return jax.lax.rem(my + i, r) if r > 1 else 0

    def ds8(start, rows):
        """Row slice whose start Mosaic can PROVE 8-aligned.

        All layout offsets are 8-aligned by construction (``_build_metadata``),
        but they arrive as opaque SMEM scalars; ``(x // 8) * 8`` is an identity
        on them that makes the divisibility syntactic."""
        return pl.ds((start // ROW_ALIGN) * ROW_ALIGN, rows)

    # ---- remote descriptor builders (recv-sem slot = SOURCE rank, the
    # per-source flag discipline of the reference's sync_collectives.h) -------
    def disp_copy(dst, src_row, dst_row, rows, src_slot):
        return pltpu.make_async_remote_copy(
            src_ref=xs_ref.at[ds8(src_row, rows)],
            dst_ref=xwin_ref.at[ds8(dst_row, rows)],
            send_sem=disp_ssem.at[dst],
            recv_sem=disp_rsem.at[src_slot],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def scale_copy(dst, src_row, dst_row, rows, src_slot):
        return pltpu.make_async_remote_copy(
            src_ref=ss_ref.at[ds8(src_row, rows)],
            dst_ref=swin_ref.at[ds8(dst_row, rows)],
            send_sem=sc_ssem.at[dst],
            recv_sem=sc_rsem.at[src_slot],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def comb_copy(slot, dst, src_row, dst_row, rows, src_slot):
        # src is the HBM y stage (slot-indexed: every tile owns its own row
        # space, so there is no reuse hazard and remote DMA reads from HBM)
        return pltpu.make_async_remote_copy(
            src_ref=yhbm_ref.at[slot, ds8(src_row, rows)],
            dst_ref=retwin_ref.at[ds8(dst_row, rows)],
            send_sem=comb_ssem.at[dst],
            recv_sem=comb_rsem.at[src_slot],
            device_id=dst,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def for_each_pair(body):
        """body(dst, ei, cnt, s_off, d_off) over all (dst, expert) pairs,
        expert-major and destination-rotated (early experts land first)."""

        def it(pair, _):
            ei = pair // r
            dst = dev(pair % r)
            idx = dst * e + ei
            body(dst, ei, cnt_send_ref[idx], send_off_ref[idx], dst_off_ref[idx])
            return 0

        jax.lax.fori_loop(0, e * r, it, 0, unroll=False)

    def tile_segments(slot, body):
        """body(src, y_row, ret_row, size) for each (src segment ∩ slot's tile).

        The src loop is destination-rotated (rank r starts at r, r+1, …) — the
        stagger every comm kernel here uses; the interpret simulator also
        requires it for cross-device delivery (see tests/test_fused_full.py)."""
        g = g_ref[slot]
        row0 = row0_ref[slot]
        valid = valid_ref[slot]

        def it(src_i, _):
            src = dev(src_i)
            idx = src * e + g
            seg_start = recv_off_ref[idx]
            cnt = cnt_recv_ref[idx]
            a = jnp.maximum(row0, seg_start)
            b = jnp.minimum(row0 + valid, seg_start + cnt)
            size = jnp.maximum(b - a, 0)
            body(src, a - row0, ret_off_ref[idx] + (a - seg_start), size)
            return 0

        jax.lax.fori_loop(0, r, it, 0, unroll=False)

    # ======================= phase 0: dispatch sends ========================
    @pl.when((s_id == 0) & (p_id == 0) & ("send" in phases))
    def _send_all():
        if r > 1:
            # all-ranks barrier before any one-sided write: a remote DMA must
            # not land before its target's kernel (and windows) exist — the
            # same start-of-op sync the reference's notify phase provides
            bar = pltpu.get_barrier_semaphore()
            for i in range(r):
                pltpu.semaphore_signal(
                    bar, inc=1, device_id=dev(i),
                    device_id_type=pltpu.DeviceIdType.LOGICAL,
                )
            pltpu.semaphore_wait(bar, r)

        def send_pair(dst, ei, cnt, s_off, d_off):
            _dma_chain(
                cnt,
                lambda o, n: disp_copy(dst, s_off + o, d_off + o, n, my),
                lambda c: c.start(),
            )
            _dma_chain(
                cnt,
                lambda o, n: scale_copy(dst, s_off + o, d_off + o, n, my),
                lambda c: c.start(),
            )

        for_each_pair(send_pair)

    in_compute = s_id < d.s_compute
    slot_live = in_compute & (s_id < n_live)
    g = g_ref[s_id]
    row0 = row0_ref[s_id]
    valid = valid_ref[s_id]

    # ================== GMM1 steps (p < p1): nt outer, kt inner =============
    nt = p_id // d.nk1
    kt = p_id % d.nk1

    @pl.when(slot_live & (p_id == 0))
    def _rowmask():
        # LIVE row mask, once per slot (it used to be recomputed EVERY grid
        # step — ~0.5 µs × hundreds of steps of pure waste): 1.0 only for rows
        # some segment actually DMA'd.  The aligned tile valid (rows_e)
        # includes up-to-7 alignment-padding rows per segment whose window
        # content is uninitialized; letting them through poisons the requant
        # max for the whole tile (chip-only, data-dependent — static/interpret
        # mode always has full segments and never sees it).
        _iota = jax.lax.broadcasted_iota(jnp.int32, (d.tm, 1), 0)

        def _live_row(src_i, m):
            src = dev(src_i)
            idx = src * e + g
            seg_start = recv_off_ref[idx]
            cnt = cnt_recv_ref[idx]
            a = jnp.maximum(row0, seg_start) - row0
            b = jnp.minimum(row0 + valid, seg_start + cnt) - row0
            return m | ((_iota >= a) & (_iota < b))

        m = jax.lax.fori_loop(
            0, r, _live_row, jnp.zeros((d.tm, 1), jnp.bool_), unroll=False
        )
        rmaskv[...] = m.astype(jnp.float32)

    @pl.when(slot_live & (p_id == 0) & ("fill" in phases))
    def _tile_start():
        # arrival waits: first tile of each expert waits that expert's segments
        @pl.when(first_ref[s_id] == 1)
        def _wait_arrivals():
            def it(src_i, _):
                src = dev(src_i)
                idx = src * e + g
                cnt = cnt_recv_ref[idx]
                base = recv_off_ref[idx]
                # sender src's xs offset for (me, g) — its send_off, which by
                # symmetry equals my ret_off[src, g] (waits must mirror the
                # sender's src slice exactly)
                sbase = ret_off_ref[idx]
                _dma_chain(
                    cnt,
                    lambda o, n: disp_copy(src, sbase + o, base + o, n, src),
                    lambda c: c.wait_recv(),
                )
                _dma_chain(
                    cnt,
                    lambda o, n: scale_copy(src, sbase + o, base + o, n, src),
                    lambda c: c.wait_recv(),
                )
                return 0

            jax.lax.fori_loop(0, r, it, 0, unroll=False)

        # assemble this tile's activation slab + row scales
        cx = pltpu.make_async_copy(
            xwin_ref.at[ds8(row0, d.tm)], xslab, lsem.at[0]
        )
        cs = pltpu.make_async_copy(
            swin_ref.at[ds8(row0, d.tm)], sxslab, lsem.at[1]
        )
        cx.start()
        cs.start()
        cx.wait()
        cs.wait()

    @pl.when(slot_live & (p_id < d.p1))
    def _gmm1():
        @pl.when(kt == 0)
        def _zero():
            acc[:, : d.tn1] = jnp.zeros((d.tm, d.tn1), jnp.int32)

        # exact int32 accumulation across k-chunks (int8·int8 partial sums
        # stay < 2^31 at any supported tk), converted to f32 ONCE at the
        # epilogue — the per-step astype+f32-add of the earlier version was
        # pure VPU overhead
        acc[:, : d.tn1] += jax.lax.dot_general(
            xslab[:, pl.ds(kt * d.tk1, d.tk1)],
            w1_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(kt == d.nk1 - 1)
        def _epilogue1():
            deq = (
                acc[:, : d.tn1].astype(jnp.float32)
                * sxslab[:, :1]
                * sw1_ref[0, 0][None, :]
            )
            half = d.tn1 // 2
            gate, up = deq[:, :half], deq[:, half:]
            act = gate * jax.nn.sigmoid(gate) * up
            h2f[:, pl.ds(nt * half, half)] = jnp.where(
                rmaskv[...] > 0, act, 0.0
            )

        @pl.when(p_id == d.p1 - 1)
        def _requant():
            # per-token dynamic re-quant (the reference's GmmDeqSwigluQuant
            # epilogue, fused_deep_moe.h:60-120)
            m = jnp.max(jnp.abs(h2f[...]), axis=-1, keepdims=True)
            sc = jnp.maximum(m / INT8_MAX, 1e-12)
            s2[...] = sc
            h2q[...] = jnp.clip(jnp.round(h2f[...] / sc), -128, 127).astype(jnp.int8)

    # ================== GMM2 steps (p1 ≤ p < p): nt2 outer, kt2 inner =======
    q_id = p_id - d.p1
    nt2 = q_id // d.nk2
    kt2 = q_id % d.nk2

    @pl.when(slot_live & (p_id >= d.p1))
    def _gmm2():
        @pl.when(kt2 == 0)
        def _zero():
            acc[:, : d.tn2] = jnp.zeros((d.tm, d.tn2), jnp.int32)

        acc[:, : d.tn2] += jax.lax.dot_general(
            h2q[:, pl.ds(kt2 * d.tk2, d.tk2)],
            w2_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

        @pl.when(kt2 == d.nk2 - 1)
        def _epilogue2():
            y = acc[:, : d.tn2].astype(jnp.float32) * s2[...] * sw2_ref[0, 0][None, :]
            yslab[:, pl.ds(nt2 * d.tn2, d.tn2)] = y.astype(jnp.bfloat16)

        @pl.when((p_id == d.p - 1) & ("combine" in phases))
        def _combine_send():
            # stage this tile's y rows to HBM, then stream them back to their
            # source ranks' return windows (reference combine:
            # moe_distribute_combine_v2.h:47-71)
            stage = pltpu.make_async_copy(yslab, yhbm_ref.at[s_id], lsem.at[0])
            stage.start()
            stage.wait()

            def body(src, y_row, ret_row, size):
                _dma_chain(
                    size,
                    lambda o, n: comb_copy(s_id, src, y_row + o, ret_row + o, n, my),
                    lambda c: c.start(),
                )

            tile_segments(s_id, body)

    # ======================= reduce phase ===================================
    r_step = (s_id - d.s_compute) * d.p + p_id
    in_reduce = (s_id >= d.s_compute) & (r_step < d.nt3 * d.rt_cnt)
    nt3 = r_step // d.rt_cnt
    rt = r_step % d.rt_cnt

    @pl.when(in_reduce & (r_step == 0) & ("send" in phases))
    def _drain_dispatch_sends():
        # drain dispatch + scale sends (local completion)
        def drain_pair(dst, ei, cnt, s_off, d_off):
            _dma_chain(
                cnt,
                lambda o, n: disp_copy(dst, s_off + o, d_off + o, n, my),
                lambda c: c.wait_send(),
            )
            _dma_chain(
                cnt,
                lambda o, n: scale_copy(dst, s_off + o, d_off + o, n, my),
                lambda c: c.wait_send(),
            )

        for_each_pair(drain_pair)

    @pl.when(in_reduce & (r_step == 0) & ("combine" in phases))
    def _reduce_prologue():
        # drain every live slot's combine sends (local completion)
        def drain_slot(slot, _):
            @pl.when(slot < n_live)
            def _():
                def body(src, y_row, ret_row, size):
                    _dma_chain(
                        size,
                        lambda o, n: comb_copy(
                            slot, src, y_row + o, ret_row + o, n, my
                        ),
                        lambda c: c.wait_send(),
                    )

                tile_segments(slot, body)

            return 0

        jax.lax.fori_loop(0, d.s_compute, drain_slot, 0, unroll=False)

        # wait all combine returns: rank dst sends back cnt_send[dst, e] rows
        def it(dst_i, _):
            dst = dev(dst_i)

            def inner(ei, _):
                idx = dst * e + ei
                cnt = cnt_send_ref[idx]
                base = send_off_ref[idx]
                sp = comb_split_ref[idx]
                # mirror dst's per-tile send decomposition exactly: part 1 in
                # tile slot1 up to the boundary, part 2 in slot2 from yrow 0
                sl1, yr1 = comb_slot1_ref[idx], comb_yrow1_ref[idx]
                sl2, yr2 = comb_slot2_ref[idx], comb_yrow2_ref[idx]
                _dma_chain(
                    sp,
                    lambda o, n: comb_copy(sl1, dst, yr1 + o, base + o, n, dst),
                    lambda c: c.wait_recv(),
                )
                _dma_chain(
                    cnt - sp,
                    lambda o, n: comb_copy(sl2, dst, yr2 + o, base + sp + o, n, dst),
                    lambda c: c.wait_recv(),
                )
                return 0

            jax.lax.fori_loop(0, e, inner, 0, unroll=False)
            return 0

        jax.lax.fori_loop(0, r, it, 0, unroll=False)

    @pl.when(in_reduce & ("reduce" in phases))
    def _reduce():
        # double-buffered return-window reads: step s's copy is started at
        # step s−1 (s=0 primes itself), so the DMA hides under the previous
        # step's dot — the round-3 start-then-wait serialized ~100 DMA
        # latencies onto the reduce phase
        def rcopy(step, slot):
            s_nt3 = step // d.rt_cnt
            s_rt = step % d.rt_cnt
            return pltpu.make_async_copy(
                retwin_ref.at[
                    pl.ds(s_rt * d.tm, d.tm), pl.ds(s_nt3 * d.tn3, d.tn3)
                ],
                rblk.at[slot],
                lsem.at[slot],
            )

        cur = jax.lax.rem(r_step, 2)

        @pl.when(r_step == 0)
        def _prime():
            rcopy(0, 0).start()

        @pl.when(r_step + 1 < d.nt3 * d.rt_cnt)
        def _prefetch():
            rcopy(r_step + 1, 1 - cur).start()

        rcopy(r_step, cur).wait()

        @pl.when(rt == 0)
        def _zero():
            racc[...] = jnp.zeros_like(racc)

        # zero non-live rows: alignment-padding rows carry garbage (their mask
        # weight is 0, but 0·NaN would poison the accumulator)
        blk = jnp.where(rlive_ref[...] > 0, rblk[cur], jnp.bfloat16(0))
        # mask cols = [w_hi | w_lo] bf16: two bf16 dots ≈ f32-accurate weights
        prod = jax.lax.dot_general(
            mask_ref[...],
            blk,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        racc[...] += prod[: d.t] + prod[d.t :]

        @pl.when(rt == d.rt_cnt - 1)
        def _write():
            out_ref[...] = racc[...].astype(out_ref.dtype)


def fused_deep_moe_full_rank(
    x: jax.Array,
    topk_idx: jax.Array,
    topk_weights: jax.Array,
    w1: jax.Array,
    sw1: jax.Array,
    w2: jax.Array,
    sw2: jax.Array,
    *,
    axis_name: str,
    num_experts: int,
    num_ranks: int,
    seg_capacity: int,
    tm: int = 256,
    tk1: int = 1024,
    tn1: int = 512,
    tk2: int = 1024,
    tn2: int = 512,
    tn3: int = 512,
    static_shapes: bool | None = None,
    interpret: bool | None = None,
    collective_id: int | None = None,
    debug_outputs: bool = False,
    phases: frozenset = frozenset({"send", "fill", "combine", "reduce"}),
    allow_partial_phases: bool = False,
):
    """Per-rank FULL fused MoE (run inside shard_map over ``axis_name``).

    ``phases`` is a PROFILING knob: dropping members statically disables that
    machinery ("send" = dispatch window writes+drains, "fill" = arrival waits
    + slab assembly, "combine" = return DMAs + their waits, "reduce" = the
    final masked-matmul reduction) so ablation benches can attribute kernel
    time.  Anything less than the full set produces garbage output and can
    leave recv semaphores unconsumed (kernel-exit failure) — callers must
    opt in explicitly with ``allow_partial_phases=True`` (bench only).

    Args:
        x: ``[T, H]`` this rank's tokens (float).
        topk_idx / topk_weights: ``[T, K]`` routing (−1 = inactive slot).
        w1: ``[E_local, H, 2I]`` int8, gate/up packed with
            ``pack_gmm1_weights(..., tn=tn1)``; sw1 ``[E_local, 2I]`` f32.
        w2: ``[E_local, I, H]`` int8; sw2 ``[E_local, H]`` f32.
        seg_capacity: max rows one (expert, src-rank) pair may send.
        static_shapes: worst-case offsets/sizes everywhere (defaults to
            interpret mode — required there for symmetric DMA counts).

    Returns:
        ``(combined [T, H] bf16, recv_count [E_local] — RECEIVER-side counts,
        num_dropped [])``.
    """
    if set(phases) != {"send", "fill", "combine", "reduce"} \
            and not allow_partial_phases:
        raise ValueError(
            "phases is a bench-only ablation knob: partial sets produce "
            "garbage output and may strand recv semaphores; pass "
            "allow_partial_phases=True to opt in")
    if interpret is None:
        interpret = interpret_default()
    if static_shapes is None:
        static_shapes = interpret
    t, h = x.shape
    k = topk_idx.shape[1]
    e_local = num_experts // num_ranks
    d = _make_dims(
        num_ranks=num_ranks, e_local=e_local, seg=seg_capacity, t=t, k=k,
        h=h, n1=w1.shape[-1], tm=min(tm, _round_up(max(t * k, 32), 32)),
        tk1=min(tk1, h), tn1=min(tn1, w1.shape[-1]),
        tk2=min(tk2, w2.shape[1]), tn2=min(tn2, h), tn3=min(tn3, h),
        static_shapes=static_shapes,
    )
    my = jax.lax.axis_index(axis_name) if num_ranks > 1 else jnp.int32(0)

    plan = ep_core.make_routing_plan(
        topk_idx,
        num_experts=num_experts,
        num_ranks=num_ranks,
        my_rank=my,
        pair_capacity=e_local * seg_capacity,
        seg_capacity=seg_capacity,
    )
    cnt_real = plan.counts_per_expert.reshape(num_ranks, e_local)
    if num_ranks > 1:
        counts_all = jax.lax.all_gather(cnt_real, axis_name)  # [S, D, E]
    else:
        counts_all = cnt_real[None]
    counts_eff = (
        jnp.full_like(counts_all, seg_capacity) if static_shapes else counts_all
    )
    md = _build_metadata(counts_eff, my, d)

    # send positions in the 8-aligned (dst, expert)-segment layout (both modes:
    # in static mode the aligned offsets are the constant segment grid)
    idx_in_seg = plan.dest_slot % seg_capacity
    slot_local = plan.dest_slot // (num_ranks * seg_capacity)
    safe_dst = jnp.clip(plan.dst_rank, 0, num_ranks - 1)
    safe_slot = jnp.clip(slot_local, 0, e_local - 1)
    pos = md["send_off_2d"][safe_dst, safe_slot] + idx_in_seg
    pos = jnp.where(plan.ok, pos, d.cap_send)

    # shared Pallas wire quant — must produce the int8 wire bits dispatch_core
    # produces, or the fused-vs-unfused 4e-4 comparison drifts (see wire_quant)
    xq, scale = wire_quant(x)
    # placement as a one-hot int8 MATMUL, not a row scatter: token-granular
    # gathers/scatters lower to ~60 GB/s scalar loops on TPU (PERF.md §DSA),
    # and this [cap_send, H] build was ~400 µs of the call at decode shapes —
    # the MXU does the same data movement in ~10 µs.  int8·one-hot sums are
    # exact (each output row is one x row or zero).
    row_src = (
        jnp.full((d.cap_send + 1,), t, jnp.int32)
        .at[pos].set(plan.src_token, mode="drop")[: d.cap_send]
    )
    p_mat = (
        row_src[:, None] == jnp.arange(t, dtype=jnp.int32)[None, :]
    ).astype(jnp.int8)
    xs = jax.lax.dot_general(
        p_mat, xq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.int8)
    ss = (
        jnp.zeros((d.cap_send + 1, 128), jnp.float32)
        .at[pos, 0].set(scale[plan.src_token], mode="drop")[: d.cap_send]
    )
    wmask = jnp.where(plan.ok, topk_weights.reshape(-1), 0.0).astype(jnp.float32)
    mask_f32 = (
        jnp.zeros((t, d.cap_send + 1), jnp.float32)
        .at[plan.src_token, pos].set(wmask, mode="drop")[:, : d.cap_send]
    )
    mhi = mask_f32.astype(jnp.bfloat16)
    mlo = (mask_f32 - mhi.astype(jnp.float32)).astype(jnp.bfloat16)
    # stored transposed [cap_send, 2T] so row-tile blocks keep a full last dim
    # (Mosaic block rule); the reduce contracts over dim 0 of both operands
    mask2 = jnp.concatenate([mhi, mlo], axis=0).T  # [cap_send, 2T]
    # per-row liveness of the return window (alignment-padding rows carry
    # garbage from partially-live transfers; the reduce zeroes them)
    rlive = (
        jnp.zeros((d.cap_send + 1, 1), jnp.float32)
        .at[pos, 0].set(1.0, mode="drop")[: d.cap_send]
    )

    misc = jnp.stack([md["n_live"], md["n_live"]]).astype(jnp.int32)

    if collective_id is None and num_ranks > 1:
        from sgl_kernel_npu_tpu.parallel.collective_ids import next_collective_id

        collective_id = next_collective_id()

    np1 = d.p1

    def w1_map(s, p, g_r, *_):
        gg = g_r[s]
        live_gmm1 = jnp.logical_and(s < d.s_compute, p < np1)
        ktm = jnp.where(live_gmm1, p % d.nk1, d.nk1 - 1)
        ntm = jnp.where(live_gmm1, p // d.nk1, d.nt1 - 1)
        return gg, ktm, ntm

    def sw1_map(s, p, g_r, *_):
        gg, _, ntm = w1_map(s, p, g_r)
        return gg, 0, ntm

    def w2_map(s, p, g_r, *_):
        gg = g_r[s]
        q = jnp.maximum(p - np1, 0)
        live_gmm2 = jnp.logical_and(s < d.s_compute, p >= np1)
        ktm = jnp.where(live_gmm2, q % d.nk2, 0)
        ntm = jnp.where(live_gmm2, q // d.nk2, 0)
        return gg, ktm, ntm

    def sw2_map(s, p, g_r, *_):
        gg, _, ntm = w2_map(s, p, g_r)
        return gg, 0, ntm

    def mask_map(s, p, *_):
        red = jnp.logical_and(s >= d.s_compute,
                              (s - d.s_compute) * d.p + p < d.nt3 * d.rt_cnt)
        rstep = (s - d.s_compute) * d.p + p
        return jnp.where(red, rstep % d.rt_cnt, 0), 0

    rlive_map = mask_map

    def out_map(s, p, *_):
        red = jnp.logical_and(s >= d.s_compute,
                              (s - d.s_compute) * d.p + p < d.nt3 * d.rt_cnt)
        rstep = (s - d.s_compute) * d.p + p
        return 0, jnp.where(red, rstep // d.rt_cnt, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=16,
        grid=(d.s_total, d.p),
        in_specs=[
            # HBM pinned: XLA otherwise VMEM-places small buffers, and VMEM
            # refs reject the ragged DMAs' unaligned dynamic row offsets
            pl.BlockSpec(memory_space=pltpu.HBM),   # xs
            pl.BlockSpec(memory_space=pltpu.HBM),   # ss
            pl.BlockSpec((d.tm, 2 * t), mask_map),  # mask (hi ‖ lo, transposed)
            pl.BlockSpec((d.tm, 1), rlive_map),     # return-row liveness
            pl.BlockSpec((1, d.tk1, d.tn1), w1_map),
            pl.BlockSpec((1, 1, d.tn1), sw1_map),
            pl.BlockSpec((1, d.tk2, d.tn2), w2_map),
            pl.BlockSpec((1, 1, d.tn2), sw2_map),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # x window
            pl.BlockSpec(memory_space=pltpu.HBM),   # scale window
            pl.BlockSpec(memory_space=pltpu.HBM),   # return window
            pl.BlockSpec(memory_space=pltpu.HBM),   # y stage
            pl.BlockSpec((t, d.tn3), out_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((d.tm, h), jnp.int8),                    # xslab
            pltpu.VMEM((d.tm, 128), jnp.float32),               # sxslab (col 0)
            pltpu.VMEM((d.tm, d.i), jnp.float32),               # h2f
            pltpu.VMEM((d.tm, d.i), jnp.int8),                  # h2q
            pltpu.VMEM((d.tm, 1), jnp.float32),                 # s2
            pltpu.VMEM((d.tm, max(d.tn1, d.tn2)), jnp.int32),   # acc (exact int)
            pltpu.VMEM((d.tm, h), jnp.bfloat16),                # yslab
            pltpu.VMEM((t, d.tn3), jnp.float32),                # racc
            pltpu.VMEM((2, d.tm, d.tn3), jnp.bfloat16),         # rblk ×2
            pltpu.VMEM((d.tm, 1), jnp.float32),                 # rmaskv
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
            pltpu.SemaphoreType.DMA((num_ranks,)),
        ],
    )
    xwin, swin, retwin, _yhbm, combined = pl.pallas_call(
        functools.partial(
            _fused_full_kernel, d=d, axis_name=axis_name, phases=phases
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((d.cap_recv, h), jnp.int8),
            jax.ShapeDtypeStruct((d.cap_recv, 128), jnp.float32),
            jax.ShapeDtypeStruct((d.cap_send, h), jnp.bfloat16),
            jax.ShapeDtypeStruct((d.s_compute, d.tm, h), jnp.bfloat16),
            jax.ShapeDtypeStruct((t, h), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=collective_id if num_ranks > 1 else None,
        ),
        # eager DMA execution: the simulator's default lazy ("on_wait") mode
        # mis-delivers multi-slot one-sided transfers (verified empirically —
        # sends/waits balance per semaphore yet data lands partially); eager
        # execution is faithful.  Requires the start barrier above.
        interpret=(
            pltpu.InterpretParams(dma_execution_mode="eager")
            if interpret
            else False
        ),
    )(
        md["g_arr"], md["row0_arr"], md["valid_arr"], md["first_arr"],
        md["cnt_send"], md["send_off"], md["dst_off"],
        md["cnt_recv"], md["recv_off"], md["ret_off"],
        md["comb_split"], md["comb_slot1"], md["comb_yrow1"],
        md["comb_slot2"], md["comb_yrow2"], misc,
        xs, ss, mask2, rlive, w1, sw1[:, None, :], w2, sw2[:, None, :],
    )
    # receiver-side per-expert counts (reference ep_recv_count semantics —
    # fixes the sender-count inconsistency of fused_dispatch_gmm1)
    recv_count = counts_all[:, my, :].sum(axis=0)
    if debug_outputs:
        return combined, recv_count, plan.num_dropped, (xwin, swin, retwin, _yhbm, md)
    return combined, recv_count, plan.num_dropped
