"""Ring-streamed decode-MoE grouped GEMMs (flat DMA pipeline, ~755 GB/s).

The BlockSpec-pipelined grouped kernels (ops/grouped_matmul.py) top out at
~650-680 GB/s of weight streaming: Mosaic's automatic pipeline is strictly
double-buffered, and at decode shapes the weight DMA is the bound (the MoE
GEMMs at per-expert M=128 leave the MXU half idle either way).  Chip probes
(r5): a manual 4-8 deep DMA ring sustains 744-755 GB/s — the same flat-
pipeline technique as ops/attention/decode_attention.py's page walk — worth
~35-50 µs per GEMM on the DeepSeek decode layer.

Two kernels specialized for the decode hot path (small token count, ragged
expert groups, W8A8), which also absorb ALL the routing glue that used to run
as XLA fusions around the GEMMs (VERDICT r4 #2 — the reference's FusedDeepMoe
exists precisely to absorb this glue, fused_deep_moe.h:35):

- :func:`gmm1_ring` — grouped W8A8 GEMM1 + dequant→SwiGLU→per-row requant.
  The one-hot dispatch matrix is built IN-KERNEL from ``tok_of_row`` (a
  [tm, n_tok] iota compare per tile) and the per-row input scales are gathered
  on the MXU as ``P @ sx_tok``.
- :func:`gmm2_combine_ring` — grouped W8A8 GEMM2 with the weighted top-k
  combine accumulated into a VMEM-resident [n_tok, N] f32 output (the
  ``grouped_matmul_combine`` fusion, reference fused_deep_moe.h
  ENABLE_GMM2_COMBINE).  The combine mask tile is built IN-KERNEL from
  ``(dest, topk_w)`` once per group-tile step (hi/lo bf16 split for
  f32-accurate weighting at bf16 MXU rate), and the layer's residual can
  ride as the accumulator init so the MoE output, residual add, and dtype
  cast all leave the kernel as one array.

Both run as ONE grid step with a ``fori_loop`` over live (group-tile, chunk)
pairs; pad tiles (ragged worst-case schedule slots) are compacted out of the
loop up front, so they cost neither DMA nor MXU time (the BlockSpec kernels
pin pad blocks instead).  Reference parity: the CATLASS grouped-GEMM library
(csrc/deepep/ops/utils/op_kernel/operator/catlass/) with per-token dequant /
dequant+SwiGLU+quant epilogues, SURVEY.md §2.1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.grouped_matmul import make_gmm_metadata, swiglu_block
from sgl_kernel_npu_tpu.utils.common import interpret_default


def _compact_live(group_sizes: jax.Array, s: int, tm: int):
    """make_gmm_metadata schedule with pad slots compacted to the tail.

    Returns ``(g_of, mt_of, offsets, n_live)`` where the first ``n_live``
    entries of ``g_of``/``mt_of`` are the live (group, m-tile) visits in
    schedule order and ``n_live`` is a traced [1] vector.
    """
    group_ids, m_tiles, offsets, is_pad, num_tiles = make_gmm_metadata(
        group_sizes, s, tm)
    order = jnp.argsort(is_pad, stable=True)
    g_of = group_ids[order]
    mt_of = m_tiles[order]
    n_live = (num_tiles - jnp.sum(is_pad)).astype(jnp.int32).reshape(1)
    return g_of, mt_of, offsets, n_live, num_tiles


def _onehot_tile(tok_ref, mt, tm, n_tok, dtype):
    """[tm, n_tok] one-hot row→token tile from the row→token id vector."""
    toks = tok_ref[pl.ds(mt * tm, tm), :]  # [tm, 1] i32
    cols = jax.lax.broadcasted_iota(jnp.int32, (tm, n_tok), 1)
    return (toks == cols).astype(dtype)


def _gmm1_ring_kernel(
    # scalar prefetch
    g_of, mt_of, offsets, nlive_ref,
    # inputs
    xq_hbm,    # ANY [n_tok, K] int8 — or bf16/f32 when quantize_input
    tok_ref,   # VMEM [S, 1] i32 sorted-row → token
    w_hbm,     # ANY [G, K, N] int8
    sxt_in,    # VMEM [n_tok, 1] f32 per-TOKEN input scales (None when
               # quantize_input: computed in-kernel)
    sw_ref,    # VMEM [G, N] f32 per-channel weight scales
    # outputs
    h1_ref,    # VMEM [S, N/2] int8
    hs_ref,    # VMEM [S, 1] f32 per-row requant scales
    # scratch
    xin,       # VMEM [n_tok, K] input-dtype stage (aliases xv when int8 in)
    wring,     # VMEM [ring, tk, N] int8
    acc,       # VMEM [tm, N] f32
    pt_buf,    # VMEM [tm, n_tok] int8 one-hot tile (cached per step)
    *rest,     # (+ xv, sxt_scr when quantize_input), sems last
    tm: int,
    tk: int,
    ring: int,
    quantize_input: bool,
):
    if quantize_input:
        xv, sxt_scr, sems = rest
        sxt_ref = sxt_scr
    else:
        (sems,) = rest
        xv = xin
        sxt_ref = sxt_in
    n_tok, k = xv.shape
    nk = k // tk
    n_live = nlive_ref[0]
    n_chunks = n_live * nk

    cp = pltpu.make_async_copy(xq_hbm, xin, sems.at[ring])
    cp.start()

    def chunk_dma(c, slot):
        step = c // nk
        kt = c % nk
        return pltpu.make_async_copy(
            w_hbm.at[g_of[step], pl.ds(kt * tk, tk)],
            wring.at[slot],
            sems.at[slot],
        )

    for i in range(ring):
        @pl.when(i < n_chunks)
        def _():
            chunk_dma(jnp.int32(i), jnp.int32(i)).start()

    cp.wait()
    if quantize_input:
        # per-token dynamic int8 quant IN-KERNEL (the reference FusedDeepMoe
        # absorbs this exact glue, QuantProcess
        # moe_distribute_dispatch_v2.h:994): one VPU pass while the weight
        # ring warms — replaces ~40 µs of XLA abs-reduce/clamp/convert ops
        # and their HBM round trip on the decode layer
        xf = xin[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        scale = jnp.maximum(amax / 127.0, 1e-12)
        xv[...] = jnp.clip(jnp.round(xf / scale), -128, 127).astype(jnp.int8)
        sxt_scr[...] = scale

    def body(c, _):
        slot = jax.lax.rem(c, ring)
        chunk_dma(c, slot).wait()
        step = c // nk
        kt = c % nk
        mt = mt_of[step]

        # sorted-row tile via in-kernel one-hot dispatch: P_tile @ xq[:, chunk]
        # (the one-hot tile depends on the step only — build it once)
        @pl.when(kt == 0)
        def _build_pt():
            pt_buf[...] = _onehot_tile(tok_ref, mt, tm, n_tok, jnp.int8)

        xt = jax.lax.dot_general(
            pt_buf[...], xv[:, pl.ds(kt * tk, tk)], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)
        part = jax.lax.dot_general(
            xt, wring[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

        @pl.when(kt == 0)
        def _():
            acc[...] = part

        @pl.when(kt > 0)
        def _():
            acc[...] += part

        nxt = c + ring
        @pl.when(nxt < n_chunks)
        def _():
            chunk_dma(nxt, slot).start()

        @pl.when(kt == nk - 1)
        def _epilogue():
            g = g_of[step]
            start, end = offsets[g], offsets[g + 1]
            rows = mt * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
            in_group = (rows >= start) & (rows < end)
            # per-row input scales: MXU gather P @ sx_tok
            sx_rows = jax.lax.dot_general(
                pt_buf[...].astype(jnp.float32), sxt_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            deq = acc[...] * sx_rows * sw_ref[g][None, :]
            act = swiglu_block(deq)
            amax = jnp.max(jnp.abs(act), axis=-1, keepdims=True)
            scale = jnp.maximum(amax / 127.0, 1e-12)
            q = jnp.clip(jnp.round(act / scale), -128, 127)
            # straddled boundary tiles are visited once per group: merge rows
            prev = h1_ref[pl.ds(mt * tm, tm), :]
            prev_s = hs_ref[pl.ds(mt * tm, tm), :]
            h1_ref[pl.ds(mt * tm, tm), :] = jnp.where(
                in_group, q.astype(jnp.int8), prev)
            hs_ref[pl.ds(mt * tm, tm), :] = jnp.where(
                in_group, scale.astype(jnp.float32), prev_s)
        return 0

    # zero-fill first (rows outside every group, incl. fully-pad tail tiles,
    # must read as zeros — the grouped_matmul contract)
    h1_ref[...] = jnp.zeros_like(h1_ref)
    hs_ref[...] = jnp.zeros_like(hs_ref)
    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(
    jax.jit, static_argnames=("tm", "tk", "ring", "interpret"))
def gmm1_ring(
    xq: jax.Array,           # [n_tok, K] int8 quantized tokens
    tok_of_row: jax.Array,   # [S] i32 sorted-row → source token
    w1: jax.Array,           # [G, K, N] int8 (gate‖up packed, pack_gmm1_weights)
    group_sizes: jax.Array,  # [G]
    scale_x_tok: jax.Array,  # [n_tok] f32 per-TOKEN input scales
    scale_w: jax.Array,      # [G, N] f32
    *,
    tm: int = 128,
    tk: int | None = None,
    ring: int = 4,
    interpret=None,
):
    """Ring-streamed GMM1 + dequant→SwiGLU→requant with in-kernel dispatch.

    Returns ``(h1 [S, N/2] int8, hs [S] f32)`` — the dequant_swiglu_quant
    grouped matmul with the one-hot dispatch, row-scale gather, and requant
    all inside one kernel.

    ``xq`` may be **bf16/f32 tokens** instead of int8: the per-token dynamic
    quant (amax/127 scale, saturating round — reference QuantProcess,
    moe_distribute_dispatch_v2.h:994) then runs IN-KERNEL during the weight
    ring warm-up and ``scale_x_tok`` is ignored (pass ``None``)."""
    if interpret is None:
        interpret = interpret_default()
    s = tok_of_row.shape[0]
    n_tok = xq.shape[0]
    g, k, n = w1.shape
    quantize_input = xq.dtype != jnp.int8
    if tk is None:
        # 512 beats 1024 by ~1.5 us at decode shapes (r5 chip sweep): halves
        # the first-chunk fill latency at the same stream rate
        tk = next((t for t in (512, 1024, 256, 128) if k % t == 0), k)
    assert k % tk == 0 and xq.shape == (n_tok, k)
    # the kernel reads/writes whole [tm]-row tiles: pad the sorted-row axis up
    # (pad rows carry token id n_tok → all-zero one-hot → zero rows, and the
    # epilogue's in_group mask keeps them at the zero fill)
    s_orig = s
    s = -(-s // tm) * tm
    if s != s_orig:
        tok_of_row = jnp.pad(tok_of_row, (0, s - s_orig),
                             constant_values=n_tok)
    g_of, mt_of, offsets, n_live, _ = _compact_live(group_sizes, s, tm)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_tok, k), xq.dtype),
            pltpu.VMEM((ring, tk, n), jnp.int8),
            pltpu.VMEM((tm, n), jnp.float32),
            pltpu.VMEM((tm, n_tok), jnp.int8),
        ] + ([
            pltpu.VMEM((n_tok, k), jnp.int8),      # xv: quantized stage
            pltpu.VMEM((n_tok, 1), jnp.float32),   # sxt_scr: in-kernel scales
        ] if quantize_input else []) + [
            pltpu.SemaphoreType.DMA((ring + 1,)),
        ],
    )
    if quantize_input:
        sxt = jnp.zeros((1, 1), jnp.float32)       # unused placeholder input
    else:
        sxt = scale_x_tok.reshape(n_tok, 1)
    h1, hs = pl.pallas_call(
        functools.partial(_gmm1_ring_kernel, tm=tm, tk=tk, ring=ring,
                          quantize_input=quantize_input),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((s, n // 2), jnp.int8),
            jax.ShapeDtypeStruct((s, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=(
            pltpu.InterpretParams(dma_execution_mode="eager")
            if interpret else False),
    )(g_of, mt_of, offsets, n_live,
      xq, tok_of_row.reshape(s, 1), w1, sxt, scale_w)
    return h1[:s_orig], hs[:s_orig, 0]


def _gmm2_combine_ring_kernel(
    g_of, mt_of, offsets, nlive_ref,
    x_hbm,     # ANY [S, K] int8 (GMM1 output)
    sx_ref,    # VMEM [S, 1] f32
    w_hbm,     # ANY [G, K, N] int8
    sw_ref,    # VMEM [G, N] f32
    dest_ref,  # VMEM [n_tok, ktop] i32 (token, k) → sorted slot
    topw_ref,  # VMEM [n_tok, ktop] f32 combine weights
    init_ref,  # VMEM [n_tok, N] f32 accumulator init (residual) or None
    o_ref,     # VMEM out [n_tok, N]
    xv,        # VMEM [S, K] int8
    wring,     # VMEM [ring, K, tn] int8
    oacc,      # VMEM [n_tok, N] f32
    mhi_buf,   # VMEM [n_tok, tm] bf16 combine mask hi (cached per step)
    mlo_buf,   # VMEM [n_tok, tm] bf16 combine mask lo correction
    sems,      # DMA sems [ring + 1]
    *,
    tm: int,
    tn: int,
    ring: int,
):
    s, k = xv.shape
    n = o_ref.shape[1]
    nn = n // tn
    n_tok, ktop = dest_ref.shape
    n_live = nlive_ref[0]
    n_chunks = n_live * nn

    cp = pltpu.make_async_copy(x_hbm, xv, sems.at[ring])
    cp.start()

    def chunk_dma(c, slot):
        step = c // nn
        jt = c % nn
        return pltpu.make_async_copy(
            w_hbm.at[g_of[step], :, pl.ds(jt * tn, tn)],
            wring.at[slot],
            sems.at[slot],
        )

    for i in range(ring):
        @pl.when(i < n_chunks)
        def _():
            chunk_dma(jnp.int32(i), jnp.int32(i)).start()

    cp.wait()
    if init_ref is None:
        oacc[...] = jnp.zeros_like(oacc)
    else:
        oacc[...] = init_ref[...]

    def body(c, _):
        slot = jax.lax.rem(c, ring)
        chunk_dma(c, slot).wait()
        step = c // nn
        jt = c % nn
        mt = mt_of[step]
        g = g_of[step]
        start, end = offsets[g], offsets[g + 1]

        # the combine mask depends on the step only: build once per step in
        # the sublane-friendly [n_tok, tm] orientation (dest column slices
        # broadcast along LANES — no sublane→lane relayout), hi/lo bf16 split
        # for f32-accurate weighting at bf16 MXU rate
        @pl.when(jt == 0)
        def _build_mask():
            cols = mt * tm + jax.lax.broadcasted_iota(jnp.int32, (n_tok, tm), 1)
            m = jnp.zeros((n_tok, tm), jnp.float32)
            for kk in range(ktop):
                m += jnp.where(dest_ref[:, kk][:, None] == cols,
                               topw_ref[:, kk][:, None], 0.0)
            live = (cols >= start) & (cols < end)
            m = jnp.where(live, m, 0.0)
            mhi = m.astype(jnp.bfloat16)
            mhi_buf[...] = mhi
            mlo_buf[...] = (m - mhi.astype(jnp.float32)).astype(jnp.bfloat16)

        acc = jax.lax.dot_general(
            xv[pl.ds(mt * tm, tm), :], wring[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        rows = mt * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
        in_group = (rows >= start) & (rows < end)
        deq = acc * sx_ref[pl.ds(mt * tm, tm), :] * sw_ref[g, pl.ds(jt * tn, tn)][None, :]
        deq = jnp.where(in_group, deq, 0.0).astype(jnp.bfloat16)
        upd = jax.lax.dot_general(
            mhi_buf[...], deq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        upd += jax.lax.dot_general(
            mlo_buf[...], deq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        oacc[:, pl.ds(jt * tn, tn)] += upd

        nxt = c + ring
        @pl.when(nxt < n_chunks)
        def _():
            chunk_dma(nxt, slot).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    o_ref[...] = oacc[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "ring", "out_dtype", "interpret"))
def gmm2_combine_ring(
    x: jax.Array,            # [S, K] int8 expert-sorted rows (GMM1 output)
    w2: jax.Array,           # [G, K, N] int8
    group_sizes: jax.Array,  # [G]
    scale_x: jax.Array,      # [S] f32
    scale_w: jax.Array,      # [G, N] f32
    dest: jax.Array,         # [n_tok, ktop] i32 (token, k) → sorted slot
    topk_w: jax.Array,       # [n_tok, ktop] f32 combine weights
    *,
    init: jax.Array | None = None,  # [n_tok, N] f32 residual / accumulator init
    tm: int = 128,
    tn: int | None = None,
    ring: int = 4,
    out_dtype=jnp.float32,
    interpret=None,
):
    """Ring-streamed GMM2 with fused weighted combine and in-kernel mask.

    The combine mask tile is built in-kernel from ``(dest, topk_w)`` once per
    group-tile step (hi/lo bf16 split for f32-accurate weighting at bf16 MXU
    rate).  Weights stream
    once in full-K column chunks; the [n_tok, N] f32 combine accumulator is
    VMEM-resident and can start from ``init`` (the layer residual), so the
    MoE output leaves the kernel already summed and cast."""
    if interpret is None:
        interpret = interpret_default()
    s, k = x.shape
    g, _, n = w2.shape
    n_tok = dest.shape[0]
    if tn is None:
        # 896 beats 1792 by ~1.4 us at decode shapes (r5 chip sweep)
        tn = next((t for t in (896, 1792, 1536, 1024, 512, 256, 128)
                   if n % t == 0), n)
    # whole [tm]-row tiles: pad the sorted-row axis (zero rows dequant to zero
    # and sit outside every group's [start, end) — masked either way)
    if s % tm:
        pad = -(-s // tm) * tm - s
        x = jnp.pad(x, ((0, pad), (0, 0)))
        scale_x = jnp.pad(scale_x, (0, pad))
        s += pad
    g_of, mt_of, offsets, n_live, _ = _compact_live(group_sizes, s, tm)

    has_init = init is not None
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if has_init else [])

    def kern(g_of, mt_of, offsets, nlive_ref, x_hbm, sx_ref, w_hbm, sw_ref,
             dest_ref, topw_ref, *rest):
        if has_init:
            init_ref, o_ref, xv, wring, oacc, mhi_buf, mlo_buf, sems = rest
        else:
            (o_ref, xv, wring, oacc, mhi_buf, mlo_buf, sems), init_ref = \
                rest, None
        _gmm2_combine_ring_kernel(
            g_of, mt_of, offsets, nlive_ref, x_hbm, sx_ref, w_hbm, sw_ref,
            dest_ref, topw_ref, init_ref, o_ref, xv, wring, oacc,
            mhi_buf, mlo_buf, sems, tm=tm, tn=tn, ring=ring)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((s, k), jnp.int8),
            pltpu.VMEM((ring, k, tn), jnp.int8),
            pltpu.VMEM((n_tok, n), jnp.float32),
            pltpu.VMEM((n_tok, tm), jnp.bfloat16),
            pltpu.VMEM((n_tok, tm), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((ring + 1,)),
        ],
    )
    args = [x, scale_x.reshape(s, 1), w2, scale_w, dest.astype(jnp.int32),
            topk_w.astype(jnp.float32)]
    if has_init:
        args.append(init.astype(jnp.float32))
    (out,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tok, n), out_dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        interpret=(
            pltpu.InterpretParams(dma_execution_mode="eager")
            if interpret else False),
    )(g_of, mt_of, offsets, n_live, *args)
    return out
