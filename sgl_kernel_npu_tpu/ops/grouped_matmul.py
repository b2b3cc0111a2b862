"""Grouped (ragged) matrix multiply for MoE expert GEMMs — Pallas TPU kernel.

Capability parity with the reference's embedded CATLASS grouped-GEMM library
(csrc/deepep/ops/utils/op_kernel/operator/catlass/, ~14.5k LoC of AscendC tile
templates: ``GroupedMatmulSliceMPerTokenDequant*`` with dequant / dequant+SwiGLU+quant
epilogues, SURVEY.md §2.1) — rebuilt the TPU way:

- groups are ragged on the M dim (``group_sizes`` is a *traced* array — no host
  sync); a megablox-style tile schedule assigns grid steps to (group, m-tile)
  pairs via scalar-prefetched metadata computed on device;
- the MXU does the inner product at int8×int8→int32 (W8A8) or bf16×bf16→f32;
- epilogues fuse per-token × per-channel dequantization and optionally SwiGLU
  (gate ‖ up column blocks of the same tile), so GEMM1 of a MoE layer writes
  activations straight in their final form;
- an XLA ``jax.lax.ragged_dot`` wrapper (:func:`grouped_matmul_ref`) is both the
  golden reference and the fallback path.

Weight layout for the SwiGLU epilogue: pack gate/up columns block-interleaved with
:func:`pack_gmm1_weights` so each N tile holds ``[gate_cols | up_cols]`` of the same
intermediate slice (a TPU-friendly answer to the reference's per-row SwiGLU epilogue).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.utils.common import cdiv, interpret_default

Epilogue = Literal["none", "dequant", "dequant_swiglu", "dequant_swiglu_quant"]


# ---------------------------------------------------------------------------
# XLA reference / fallback
# ---------------------------------------------------------------------------

def grouped_matmul_ref(x: jax.Array, w: jax.Array, group_sizes: jax.Array) -> jax.Array:
    """``out[i] = x[i] @ w[g(i)]`` with rows grouped contiguously (golden)."""
    return jax.lax.ragged_dot(
        x, w, group_sizes.astype(jnp.int32), preferred_element_type=jnp.float32
    )


def gmm_dequant_ref(x_q, w_q, group_sizes, scale_x, scale_w):
    """Golden W8A8 grouped matmul with per-token × per-channel dequant."""
    acc = jax.lax.ragged_dot(
        x_q.astype(jnp.int8),
        w_q.astype(jnp.int8),
        group_sizes.astype(jnp.int32),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    g_of_row = _row_groups(group_sizes, x_q.shape[0])
    return acc * scale_x[:, None] * scale_w[g_of_row]


def _row_groups(group_sizes: jax.Array, num_rows: int) -> jax.Array:
    """Group id per row (rows past the total get the last group)."""
    ends = jnp.cumsum(group_sizes)
    return jnp.searchsorted(ends, jnp.arange(num_rows), side="right").clip(
        0, group_sizes.shape[0] - 1
    )


def swiglu_block(acc: jax.Array) -> jax.Array:
    """SwiGLU over a [rows, gate‖up] tile: silu(gate) * up."""
    half = acc.shape[-1] // 2
    gate, up = acc[:, :half], acc[:, half:]
    return gate * jax.nn.sigmoid(gate) * up


def default_pack_tn(n: int) -> int:
    """Widest hardware-legal SwiGLU pack/tile width (≤ 2048) dividing ``n``.

    Wide tn minimizes x re-reads in the grouped GEMM (see select_gmm_tiles);
    tn == n is always legal (full-width output tile)."""
    for t in (2048, 1024, 512, 256):
        if n % t == 0:
            return t
    return n


def moe_pack_tn(n: int) -> int:
    """Pack width for fused-MoE GMM1 weights: full-width when the fused
    dequant+SwiGLU+quant epilogue's accumulator fits VMEM (n ≲ 8192), else the
    widest legal tile (separate requant pass)."""
    if 128 * n * 4 + 2 * 256 * (128 + n) <= 12 * 2**20:
        return n
    return default_pack_tn(n)


def pack_gmm1_weights(w_gate: jax.Array, w_up: jax.Array, tn: int) -> jax.Array:
    """Interleave gate/up column *blocks*: each tn-wide slab = [gate tn/2 | up tn/2].

    ``w_gate``/``w_up``: [G, K, I] → packed [G, K, 2I]; with this layout a
    ``dequant_swiglu`` N tile computes a contiguous intermediate slice.
    """
    g, k, i = w_gate.shape
    half = tn // 2
    assert i % half == 0, (i, tn)
    blocks = i // half
    wg = w_gate.reshape(g, k, blocks, half)
    wu = w_up.reshape(g, k, blocks, half)
    return jnp.stack([wg, wu], axis=3).reshape(g, k, 2 * i)


def pack_gmm1_scales(s_gate: jax.Array, s_up: jax.Array, tn: int) -> jax.Array:
    """Per-channel weight scales packed to match :func:`pack_gmm1_weights`."""
    g, i = s_gate.shape
    half = tn // 2
    blocks = i // half
    return jnp.stack(
        [s_gate.reshape(g, blocks, half), s_up.reshape(g, blocks, half)], axis=2
    ).reshape(g, 2 * i)


def dispatch_onehot(tok_of_row: jax.Array, n_tok: int, dtype=jnp.int8) -> jax.Array:
    """One-hot ``[S, n_tok]`` row→token dispatch matrix for ``dispatch_p``.

    Rows of the sorted layout select their source token; the grouped matmul
    forms each sorted x tile as ``P @ x`` on the MXU (exact for int8 — one-hot
    selection of values ≤ 127 accumulates losslessly in int32)."""
    return (tok_of_row[:, None] == jnp.arange(n_tok, dtype=jnp.int32)[None, :]).astype(
        dtype
    )


# ---------------------------------------------------------------------------
# tile schedule metadata (device-computed, scalar-prefetched)
# ---------------------------------------------------------------------------

def select_gmm_tiles(
    s: int,
    k: int,
    n: int,
    in_dtype,
    *,
    num_groups: int = 8,
    out_esize: int = 2,
    vmem_budget: int = 12 * 2**20,
) -> tuple[int, int, int]:
    """Analytic tile selector (the reference's cost-model tiling,
    ``PpMatmulTilingApi::GetTileSize`` mla_preprocess.cpp:211, rebuilt for TPU):
    minimize modeled HBM traffic under a VMEM residency budget.

    Per grid row-step the inner (n, k) sweep reads the step's group's entire
    [K, N] weight slab once, the x row-block once per n-tile, and writes the
    out row-block once — so weight traffic wants *few row steps* (large tm,
    bounded below by one step per group) while x traffic wants *wide tn*.
    Measured on-chip (v5e, S=1024 K=7168 N=4096 G=8 int8): square-tile choice
    887 µs vs traffic-model choice 293 µs against a 287 µs weight-read floor
    (XLA ragged_dot int8: 601 µs).
    """
    esize = jnp.dtype(in_dtype).itemsize
    best = (min(128, max(8, s)), min(128, k), min(128, n))
    best_cost = (float("inf"), 0, 0)
    for tm in (128, 256, 512):
        if tm > max(128, s):
            continue
        # row steps: one per m-tile, at least one per group (straddles add a
        # few more for any tm, so they don't change the ranking)
        steps = max(-(-s // tm), num_groups)
        for tk in (256, 512, 1024, 2048):
            if k % tk or tk > k:
                continue
            for tn in (256, 512, 1024, 2048):
                if n % tn or tn > n:
                    continue
                vmem = (
                    2 * (tm * tk + tk * tn) * esize   # double-buffered x + w blocks
                    + tm * tn * 4                     # f32 accumulator
                    + 2 * tm * tn * out_esize         # out block (pipelined)
                )
                if vmem > vmem_budget:
                    continue
                traffic = (
                    steps * k * n * esize             # weight slabs
                    + steps * (n // tn) * tm * k * esize  # x re-reads per n-tile
                    + steps * tm * n * out_esize      # out writes
                )
                # traffic is tk-independent: tie-break toward larger tk
                # (fewer grid steps / semaphore waits), then larger tn
                cost = (traffic, -tk, -tn)
                if cost < best_cost:
                    best, best_cost = (tm, tk, tn), cost
    return best


def make_gmm_metadata(group_sizes: jax.Array, m: int, tm: int):
    """Map grid steps to (group, m-tile) pairs; ragged-safe and host-sync-free.

    Returns ``(group_ids, m_tile_ids, group_offsets, is_pad, num_tiles)`` where
    the device arrays are scalar-prefetched (``num_tiles`` static).  Padding
    steps re-visit tail tiles so every output tile is written at least once
    (zero-fill guarantee); ``is_pad`` lets the index maps pin pad steps' input
    blocks (no refetch) and the kernel skip their MXU work — without it, every
    pad step re-reads its group's entire [K, N] weight slab, up to 2× total
    weight traffic when groups align with tiles.
    """
    g = group_sizes.shape[0]
    m_tiles = cdiv(m, tm)
    num_tiles = m_tiles + g  # worst case: every group adds one boundary tile

    sizes = group_sizes.astype(jnp.int32)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(sizes)])
    t_first = offsets[:-1] // tm
    t_last = jnp.maximum((offsets[1:] + tm - 1) // tm - 1, t_first)
    tiles_per_group = jnp.where(sizes > 0, t_last - t_first + 1, 0)

    group_ids = jnp.repeat(
        jnp.arange(g, dtype=jnp.int32), tiles_per_group, total_repeat_length=num_tiles
    )
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(tiles_per_group)])
    pos = jnp.arange(num_tiles, dtype=jnp.int32)
    occ = pos - starts[group_ids]
    m_tile = t_first[group_ids] + occ

    # padding steps (pos >= total actual tiles) sweep the untouched tail tiles
    actual = starts[-1]
    last_tile = jnp.max(jnp.where(sizes > 0, t_last, -1))
    pad_tile = last_tile + 1 + (pos - actual)
    is_pad = pos >= actual
    m_tile = jnp.where(is_pad, pad_tile, m_tile).clip(0, m_tiles - 1)
    group_ids = jnp.where(is_pad, g - 1, group_ids)
    return group_ids, m_tile, offsets, is_pad.astype(jnp.int32), num_tiles


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _gmm_kernel(
    group_ids_ref,
    m_tiles_ref,
    offsets_ref,
    is_pad_ref,
    *refs,  # [p_ref,] x_ref, w_ref, sx_ref, sw_ref, o_ref [, s_out_ref], acc_ref
    tm: int,
    epilogue: Epilogue,
    gather: bool = False,
    rhs_contract_last: bool = False,
):
    if gather:
        p_ref, refs = refs[0], refs[1:]
    else:
        p_ref = None
    x_ref, w_ref, sx_ref, sw_ref, *refs = refs
    if epilogue == "dequant_swiglu_quant":
        o_ref, s_out_ref, acc_ref = refs
    else:
        (o_ref, acc_ref), s_out_ref = refs, None
    i = pl.program_id(0)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(is_pad_ref[i] == 0)  # pad steps only zero-fill their out tile
    def _mxu():
        if gather:
            # dispatch-as-matmul: the sorted row tile is P @ x where P is the
            # one-hot row→token matrix.  Exact (one-hot selection), and turns
            # the token-granular XLA row gather — which lowers to ~60 GB/s
            # scalar dynamic reads on TPU — into ~µs of MXU work on operands
            # already resident in VMEM (the fused-combine twin of the masked-
            # matmul combine below / models/deepseek_v3._gmm_moe).
            if x_ref.dtype == jnp.int8:
                xt = jax.lax.dot_general(
                    p_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.int8)
            else:
                xt = jax.lax.dot_general(
                    p_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(x_ref.dtype)
        else:
            xt = x_ref[...]
        # rhs_contract_last: contract w's LAST dim (x @ w[g]^T without
        # materializing the [G, N, K] transpose — the dx direction of the
        # trainable grouped matmul)
        dims = (((1,), (1,)), ((), ())) if rhs_contract_last else (((1,), (0,)), ((), ()))
        if xt.dtype == jnp.int8:
            acc_ref[...] += jax.lax.dot_general(
                xt,
                w_ref[0],
                dims,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            acc_ref[...] += jax.lax.dot_general(
                xt,
                w_ref[0],
                dims,
                preferred_element_type=jnp.float32,
            )

    @pl.when(k == nk - 1)
    def _epilogue():
        g = group_ids_ref[i]
        m_tile = m_tiles_ref[i]
        start, end = offsets_ref[g], offsets_ref[g + 1]
        rows = m_tile * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
        # pad steps never own rows: a clipped pad tile can alias the last real
        # tile, and pads skip the MXU work, so their acc is stale
        in_group = (rows >= start) & (rows < end) & (is_pad_ref[i] == 0)

        result = acc_ref[...]
        if epilogue != "none":
            result = result * sx_ref[...] * sw_ref[0]
        if epilogue in ("dequant_swiglu", "dequant_swiglu_quant"):
            result = swiglu_block(result)

        first_visit = jnp.logical_or(i == 0, m_tiles_ref[jnp.maximum(i - 1, 0)] != m_tile)
        prev = jnp.where(first_visit, jnp.zeros_like(o_ref[...]), o_ref[...])
        if epilogue == "dequant_swiglu_quant":
            # the reference's GmmDeqSwigluQuant fusion (fused_deep_moe.h:60-120):
            # per-token dynamic re-quant in-tile — needs tn == n so the whole
            # output row is visible for the row max
            amax = jnp.max(jnp.abs(result), axis=-1, keepdims=True)
            scale = jnp.maximum(amax / 127.0, 1e-12)
            q = jnp.clip(jnp.round(result / scale), -128, 127)
            o_ref[...] = jnp.where(in_group, q.astype(o_ref.dtype), prev)
            prev_s = jnp.where(
                first_visit, jnp.zeros_like(s_out_ref[...]), s_out_ref[...]
            )
            s_out_ref[...] = jnp.where(in_group, scale.astype(jnp.float32), prev_s)
        else:
            o_ref[...] = jnp.where(in_group, result.astype(o_ref.dtype), prev)


@functools.partial(
    jax.jit,
    static_argnames=(
        "epilogue", "tm", "tk", "tn", "out_dtype", "rhs_contract_last", "interpret"
    ),
)
def grouped_matmul(
    x: jax.Array,
    w: jax.Array,
    group_sizes: jax.Array,
    scale_x: jax.Array | None = None,
    scale_w: jax.Array | None = None,
    *,
    epilogue: Epilogue = "none",
    tm: int | None = None,
    tk: int | None = None,
    tn: int | None = None,
    out_dtype=None,
    dispatch_p: jax.Array | None = None,
    rhs_contract_last: bool = False,
    interpret=None,
) -> jax.Array:
    """Megablox-style grouped matmul with fused epilogues.

    Args:
        x: ``[S, K]`` rows grouped contiguously by expert (int8 or bf16/f32).
            With ``dispatch_p``: the *unsorted* token array ``[n_tok, K]``.
        w: ``[G, K, N]`` expert weights (int8 for dequant epilogues).
        group_sizes: ``[G]`` rows per group (traced; rows beyond the total are
            zero-filled in the output).
        scale_x: ``[S]`` per-token scales (dequant epilogues).
        scale_w: ``[G, N]`` per-channel weight scales.
        epilogue: ``none`` | ``dequant`` | ``dequant_swiglu`` (the latter expects
            gate/up packed by :func:`pack_gmm1_weights` and halves the output width).
        dispatch_p: optional ``[S, n_tok]`` one-hot row→token dispatch matrix
            (same dtype class as x: int8 or x.dtype).  The expert-sorted row
            tile is formed *inside* the kernel as ``P @ x`` on the MXU instead
            of a token-granular XLA gather (~60 GB/s scalar reads).  Build with
            :func:`dispatch_onehot`.  Sized for decode batches (``n_tok`` ≲ 512
            keeps P under 0.5 MB/tile).

    Returns:
        ``[S, N]`` (or ``[S, N/2]`` for the SwiGLU epilogue).
    """
    if interpret is None:
        interpret = interpret_default()
    if dispatch_p is not None:
        s = dispatch_p.shape[0]
        n_tok, kdim = x.shape
    else:
        s, kdim = x.shape
    if rhs_contract_last:
        # x [S, K] · w [G, N, K] → [S, N]: contraction is w's LAST dim
        # (x @ w[g]^T — the dx direction of gmm_train, no transpose copy)
        g, n, _ = w.shape
        assert w.shape[2] == kdim, (w.shape, kdim)
        assert epilogue == "none", "rhs_contract_last supports epilogue='none' only"
    else:
        g, _, n = w.shape
    tm_arg, tk_arg = tm, tk
    if tm is None or tk is None or tn is None:
        a_tm, a_tk, a_tn = select_gmm_tiles(
            s, kdim, n, x.dtype, num_groups=g,
            out_esize=jnp.dtype(out_dtype or jnp.float32).itemsize,
        )
        tm, tk, tn = tm or a_tm, tk or a_tk, tn or a_tn
    tm = min(tm, s)
    tk = min(tk, kdim)
    tn = min(tn, n)
    if epilogue == "dequant_swiglu_quant":
        # the row max for per-token quant needs the whole output row in-tile;
        # auto-picked tm/tk are clamped to the VMEM model, explicit args win
        # (r5: the 6 MB clamp forced tk=512 → 224 grid steps at DeepSeek
        # shapes — ~90 µs of pure step overhead; wide-tk fits easily under
        # an explicit vmem_limit_bytes)
        tn = n
        if tm_arg is None:
            while tm > 128 and tm * n * 4 > 4 * 2**20:
                tm //= 2
        if tk_arg is None:
            while tk > 256 and 2 * tk * (tm + n) > 18 * 2**20:
                tk //= 2
            while kdim % tk:  # keep divisibility after halving
                tk //= 2
    assert kdim % tk == 0 and n % tn == 0, (kdim, tk, n, tn)
    if epilogue == "dequant_swiglu":
        assert tn % 2 == 0
        if not interpret and (tn // 2) % 128 and tn != n:
            # Mosaic: the output tile is tn/2 wide and must be lane-aligned (or
            # span the full output).  tn cannot be silently widened here — the
            # gate/up packing (pack_gmm1_weights) is tied to it.
            raise ValueError(
                f"dequant_swiglu on hardware needs (tn//2) % 128 == 0 or tn == n; "
                f"got tn={tn}, n={n}. Re-pack weights with a legal tn (e.g. 256)."
            )
        n_out = n // 2
        tn_out = tn // 2
    elif epilogue == "dequant_swiglu_quant":
        n_out = n // 2
        tn_out = tn // 2
        out_dtype = jnp.int8
    else:
        n_out = n
        tn_out = tn
    out_dtype = out_dtype or (jnp.bfloat16 if epilogue != "none" else jnp.float32)

    group_ids, m_tiles, offsets, is_pad, num_tiles = make_gmm_metadata(group_sizes, s, tm)

    if scale_x is None:
        scale_x = jnp.ones((s,), jnp.float32)
    if scale_w is None:
        scale_w = jnp.ones((g, n), jnp.float32)

    grid = (num_tiles, n // tn, kdim // tk)

    # Pad steps pin their input block indices to (…, 0, 0): consecutive pads then
    # map to the same blocks and Pallas skips the refetch — otherwise each pad
    # step would re-stream its group's whole [K, N] weight slab.
    kernel = functools.partial(
        _gmm_kernel, tm=tm, epilogue=epilogue, gather=dispatch_p is not None,
        rhs_contract_last=rhs_contract_last,
    )
    if rhs_contract_last:
        w_spec = pl.BlockSpec(
            (1, tn, tk),
            lambda i, nn, kk, gi, mt, off, pad: (
                gi[i], nn * (1 - pad[i]), kk * (1 - pad[i])
            ),
            memory_space=pltpu.VMEM,
        )
    else:
        w_spec = pl.BlockSpec(
            (1, tk, tn),
            lambda i, nn, kk, gi, mt, off, pad: (
                gi[i], kk * (1 - pad[i]), nn * (1 - pad[i])
            ),
            memory_space=pltpu.VMEM,
        )
    if dispatch_p is not None:
        # P tile walks the sorted rows; the token array block [n_tok, tk] is
        # pinned at row 0 (whole token set resident per k-slice)
        p_x_specs = [
            pl.BlockSpec(
                (tm, n_tok),
                lambda i, nn, kk, gi, mt, off, pad: (mt[i], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_tok, tk),
                lambda i, nn, kk, gi, mt, off, pad: (0, kk * (1 - pad[i])),
                memory_space=pltpu.VMEM,
            ),
        ]
    else:
        p_x_specs = [
            pl.BlockSpec(
                (tm, tk),
                lambda i, nn, kk, gi, mt, off, pad: (mt[i], kk * (1 - pad[i])),
                memory_space=pltpu.VMEM,
            ),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=p_x_specs + [
            w_spec,
            pl.BlockSpec(
                (tm, 1),
                lambda i, nn, kk, gi, mt, off, pad: (mt[i], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tn),
                lambda i, nn, kk, gi, mt, off, pad: (gi[i], 0, nn * (1 - pad[i])),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (tm, tn_out),
                lambda i, nn, kk, gi, mt, off, pad: (mt[i], nn),
                memory_space=pltpu.VMEM,
            ),
        )
        + (
            (
                pl.BlockSpec(
                    (tm, 1),
                    lambda i, nn, kk, gi, mt, off, pad: (mt[i], 0),
                    memory_space=pltpu.VMEM,
                ),
            )
            if epilogue == "dequant_swiglu_quant"
            else ()
        ),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
    )
    out_shape = (jax.ShapeDtypeStruct((s, n_out), out_dtype),)
    if epilogue == "dequant_swiglu_quant":
        out_shape += (jax.ShapeDtypeStruct((s, 1), jnp.float32),)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),

        cost_estimate=pl.CostEstimate(
            flops=2 * s * kdim * n,
            bytes_accessed=s * kdim + g * kdim * n + s * n_out,
            transcendentals=s * n_out if epilogue != "none" else 0,
        ),
    )(group_ids, m_tiles, offsets, is_pad,
      *(() if dispatch_p is None else (dispatch_p,)),
      x, w, scale_x.reshape(s, 1), scale_w.reshape(g, 1, n))
    if epilogue == "dequant_swiglu_quant":
        return outs[0], outs[1][:, 0]
    return outs[0]


# ---------------------------------------------------------------------------
# combine-fused grouped matmul (GMM2 + weighted top-k combine in one kernel)
# ---------------------------------------------------------------------------

def _gmm_combine_kernel(
    group_ids_ref,
    m_tiles_ref,
    offsets_ref,
    is_pad_ref,
    x_ref,
    w_ref,
    sx_ref,
    sw_ref,
    mhi_ref,
    mlo_ref,
    o_ref,
    acc_ref,
    oacc_ref,
    *,
    tm: int,
):
    i = pl.program_id(1)
    k = pl.program_id(2)
    ni = pl.num_programs(1)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(jnp.logical_and(i == 0, k == 0))
    def _zero_out():
        oacc_ref[...] = jnp.zeros_like(oacc_ref)

    @pl.when(is_pad_ref[i] == 0)
    def _mxu():
        acc_ref[...] += jax.lax.dot_general(
            x_ref[...],
            w_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)

    @pl.when(k == nk - 1)
    def _combine():
        @pl.when(is_pad_ref[i] == 0)
        def _acc():
            g = group_ids_ref[i]
            m_tile = m_tiles_ref[i]
            start, end = offsets_ref[g], offsets_ref[g + 1]
            rows = m_tile * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
            # boundary tiles are visited once per straddling group: each visit
            # contributes only its own group's rows to the combine sum
            in_group = (rows >= start) & (rows < end)
            deq = acc_ref[...] * sx_ref[...] * sw_ref[0]
            deq = jnp.where(in_group, deq, 0.0).astype(jnp.bfloat16)
            # the combine blocks must ALSO be masked: columns for rows outside
            # the group (incl. out-of-bounds tile padding when S % tm != 0)
            # hold garbage that the matmul would turn into NaN even against
            # zeroed deq rows.  The mask is built at FULL [n_tok, tm] shape
            # via a minor-dim iota: slicing in_group to [1, tm] makes an i1
            # vector with a replicated sublane offset that Mosaic cannot
            # relayout into the where() operand shape ("Invalid relayout:
            # non-singleton logical dimension is replicated").
            cols = m_tile * tm + jax.lax.broadcasted_iota(
                jnp.int32, mhi_ref.shape, 1)
            live = (cols >= start) & (cols < end)
            mhi = jnp.where(live, mhi_ref[...], 0).astype(jnp.bfloat16)
            mlo = jnp.where(live, mlo_ref[...], 0).astype(jnp.bfloat16)
            oacc_ref[...] += jax.lax.dot_general(
                mhi, deq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            oacc_ref[...] += jax.lax.dot_general(
                mlo, deq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(i == ni - 1)
        def _write():
            o_ref[...] = oacc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tm", "tk", "tn", "out_dtype", "interpret")
)
def grouped_matmul_combine(
    x: jax.Array,
    w: jax.Array,
    group_sizes: jax.Array,
    scale_x: jax.Array,
    scale_w: jax.Array,
    combine_hi: jax.Array,
    combine_lo: jax.Array,
    *,
    tm: int = 128,
    tk: int | None = None,
    tn: int | None = None,
    out_dtype=jnp.float32,
    interpret=None,
) -> jax.Array:
    """W8A8 grouped matmul with the weighted top-k combine fused as epilogue.

    Computes ``combine @ (dequant(x @ w[g]))`` in one kernel: the MoE return
    path (reference: CamMoeCombineNormal / the fused op's combine epilogue,
    fused_deep_moe.h ENABLE_GMM2_COMBINE) without ever writing the [S, N]
    expert output to HBM — the grid runs n-outer so the [n_tok, tn] combine
    accumulator stays VMEM-resident across the row sweep.

    Args:
        x: ``[S, K]`` int8 expert-sorted rows (GMM1 output).
        w: ``[G, K, N]`` int8 expert down-projection weights.
        scale_x / scale_w: per-row / per-channel dequant scales.
        combine_hi/lo: ``[n_tok, S]`` bf16 hi/lo split of the f32 top-k weight
            matrix (column j = sorted row j's token, value = routing weight).

    Returns:
        ``[n_tok, N]`` combined MoE output.
    """
    if interpret is None:
        interpret = interpret_default()
    s, kdim = x.shape
    g, _, n = w.shape
    n_tok = combine_hi.shape[0]
    # chip-swept defaults (r5 trace timing, DeepSeek GMM2 shapes K=2048 N=7168):
    # (tk 2048, tn 1792) 210 µs vs the old (1024, 1024) 255 µs — full-K chunks
    # kill the k-inner sweep and 1792 quarters the n-outer weight re-visits
    if tk is None:
        tk = next((t for t in (2048, 1024, 512, 256) if kdim % t == 0), kdim)
    if tn is None:
        tn = next((t for t in (1792, 1024, 512, 256)
                   if n % t == 0 and 2 * tk * t <= 15 * 2**20), n)
    tm = min(tm, s)
    tk = min(tk, kdim)
    tn = min(tn, n)
    assert kdim % tk == 0 and n % tn == 0, (kdim, tk, n, tn)

    group_ids, m_tiles, offsets, is_pad, num_tiles = make_gmm_metadata(group_sizes, s, tm)
    grid = (n // tn, num_tiles, kdim // tk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tm, tk),
                lambda nn, i, kk, gi, mt, off, pad: (mt[i], kk * (1 - pad[i])),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tk, tn),
                lambda nn, i, kk, gi, mt, off, pad: (
                    gi[i], kk * (1 - pad[i]), nn * (1 - pad[i])
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tm, 1),
                lambda nn, i, kk, gi, mt, off, pad: (mt[i], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tn),
                lambda nn, i, kk, gi, mt, off, pad: (gi[i], 0, nn * (1 - pad[i])),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_tok, tm),
                lambda nn, i, kk, gi, mt, off, pad: (0, mt[i]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (n_tok, tm),
                lambda nn, i, kk, gi, mt, off, pad: (0, mt[i]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (n_tok, tn),
            lambda nn, i, kk, gi, mt, off, pad: (0, nn),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.float32),
            pltpu.VMEM((n_tok, tn), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_gmm_combine_kernel, tm=tm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tok, n), out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * kdim * n + 4 * n_tok * s * n,
            bytes_accessed=s * kdim + g * kdim * n + n_tok * n * 4,
            transcendentals=0,
        ),
    )(group_ids, m_tiles, offsets, is_pad,
      x, w, scale_x.reshape(s, 1), scale_w.reshape(g, 1, n),
      combine_hi, combine_lo)


# ---------------------------------------------------------------------------
# trainable grouped matmul (custom_vjp — Pallas fwd + dx, ragged-contracting dw)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def gmm_train(x: jax.Array, w: jax.Array, group_sizes: jax.Array) -> jax.Array:
    """Differentiable grouped matmul ``out[i] = x[i] @ w[g(i)]`` (f32 out).

    Training MoE expert GEMMs through the Pallas kernel instead of XLA
    ``ragged_dot`` (measured 2.6× faster in bf16, PERF.md §grouped GEMM):
    the backward runs dx on the same kernel in ``rhs_contract_last`` mode
    (x @ w[g]^T without materializing the [G, N, K] transpose) and dw via
    XLA's ragged-contracting ``ragged_dot_general`` ([m]-ragged contraction
    → [G, K, N], same FLOPs as the forward).
    """
    return grouped_matmul(x, w, group_sizes)


def _gmm_train_fwd(x, w, group_sizes):
    return grouped_matmul(x, w, group_sizes), (x, w, group_sizes)


def _gmm_train_bwd(res, dy):
    x, w, gs = res
    dy_b = dy.astype(x.dtype)
    dx = grouped_matmul(dy_b, w, gs, rhs_contract_last=True).astype(x.dtype)
    dn = jax.lax.RaggedDotDimensionNumbers(
        (((0,), (0,)), ((), ())), (0,), ()
    )
    dw = jax.lax.ragged_dot_general(
        x, dy_b, gs.astype(jnp.int32), dn, preferred_element_type=jnp.float32
    ).astype(w.dtype)
    return dx, dw, None


gmm_train.defvjp(_gmm_train_fwd, _gmm_train_bwd)
