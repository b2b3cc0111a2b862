"""Fused Pallas LoRA kernels: shrink+expand in ONE kernel launch.

The jnp LoRA path (ops/lora.py) is capability-complete but measured 8.6×
(bgmv) / 17× (sgmv) off its memory floor on chip (scripts/bench_lora.py,
round 3): the op chain is fixed-overhead-bound at decode shapes and the
all-adapters dense trick pays A× FLOPs at prefill shapes.  These kernels are
the Pallas fallback promised in ops/lora.py:16 — the TPU equivalent of the
reference's dedicated AscendC LoRA kernels (csrc/lora/op_kernel/, 1,852 LoC).

Two kernels, matched to the two serving regimes:

* ``bgmv_fused`` (decode, per-token adapter): ALL adapters in one grid step
  (chunked only when the pool outgrows VMEM).  The step computes the
  full-pool shrink ``x @ A_allᵀ → [T, L·R]`` (the extra MACs are noise at
  decode shapes), masks each token to its adapter's R-column block, and
  expands against the stacked ``[L·R, D]`` B.  Weight traffic = the ideal
  model (each adapter read once) and the grid is 1 step for typical pools —
  the round-3 version swept a grid step PER adapter and its ~L·0.8 µs of
  per-step overhead put it at 1.85× floor (BENCH_r03).  B is consumed
  row-major ``[L, R, D]``: pass ``bt=`` (pre-transposed once at adapter-load
  time, the serving pattern) or the wrapper transposes the reference-layout
  ``[L, D, R]`` per call.

* ``sgmv_fused`` (prefill, per-sequence adapter): tokens of one sequence are
  contiguous, so this is a *grouped* problem — the tile schedule reuses
  ``make_gmm_metadata`` (ops/grouped_matmul.py) with sequences as groups;
  boundary tiles straddling two sequences are visited once per sequence with
  complementary row masks.  Each tile loads its sequence's adapter weights
  (A once per visited tile, B once per visited tile), computes shrink [tm, R]
  in registers/VMEM and immediately expands to [tm, D] — the [S, R] shrink
  intermediate never touches HBM.

Heterogeneous per-adapter ranks/scalings (the sgemmv generality) ride as
per-tile scalar-prefetch arrays; slices are handled by the wrappers in
ops/lora.py (one kernel call per slice over sliced weight views — same
traffic, no packed-layout decoding in-kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.grouped_matmul import make_gmm_metadata
from sgl_kernel_npu_tpu.utils.common import interpret_default


def _bgmv_kernel(idx_ref, x_ref, a_ref, bt_ref, o_ref, acc_ref, *,
                 scaling: float, r: int, lc: int):
    c = pl.program_id(0)
    nc = pl.num_programs(0)

    # full-pool shrink: x [T, H] @ a-chunk [lc·R, H]ᵀ → [T, lc·R].  The off-
    # adapter MACs are free at decode shapes — the op is launch/weight-read
    # bound, so ONE wide dot beats per-adapter steps.
    shrink = jax.lax.dot_general(
        x_ref[...],
        a_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # token t's live columns: the R-block of its adapter (within this chunk)
    col = jax.lax.broadcasted_iota(jnp.int32, shrink.shape, 1)
    live = (col // r + c * lc) == idx_ref[...]     # idx [T, 1] lane-broadcast
    shrink = jnp.where(live, shrink * scaling, 0.0)
    y = jax.lax.dot_general(
        shrink,
        bt_ref[...].astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    if nc == 1:
        o_ref[...] = y.astype(o_ref.dtype)         # common case: no acc pass
    else:
        @pl.when(c == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += y

        @pl.when(c == nc - 1)
        def _write():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _bgmv_chunk(t: int, h: int, d: int, l: int, r: int, esize: int,
                vmem_budget: int = 12 * 2**20) -> int:
    """Adapters per grid step: all of them unless the pool outgrows VMEM."""
    fixed = t * h * esize + 2 * t * d * 4 + t * d * 4   # x + out(×2) + acc
    lc = l
    while lc > 1 and fixed + 2 * lc * r * (h + d) * esize > vmem_budget:
        lc = -(-lc // 2)
    return lc


@functools.partial(jax.jit, static_argnames=("scaling", "interpret"))
def bgmv_fused(
    x: jax.Array,
    a: jax.Array,
    b: jax.Array | None = None,
    idx: jax.Array | None = None,
    *,
    bt: jax.Array | None = None,
    scaling: float = 1.0,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused per-token LoRA delta: ``Δ[t] = scaling · (x[t] @ A[idx_t]ᵀ) @ B[idx_t]ᵀ``.

    Args: x ``[T, H]``; a ``[L, R, H]`` shrink weights; b ``[L, D, R]`` expand
    weights (reference layout — transposed here per call), or ``bt``
    ``[L, R, D]`` pre-transposed once at adapter-load time (the serving path:
    skips the per-call transpose); idx ``[T]`` int32 adapter per token.
    Returns ``[T, D]`` f32.
    """
    if interpret is None:
        interpret = interpret_default()
    t, h = x.shape
    l, r, _ = a.shape
    if bt is None:
        bt = b.transpose(0, 2, 1)                     # [L, R, D]
    d = bt.shape[2]
    lc = _bgmv_chunk(t, h, d, l, r, jnp.dtype(a.dtype).itemsize)
    n_chunks = -(-l // lc)
    a_flat = a.reshape(l * r, h)
    bt_flat = bt.reshape(l * r, d)
    if l % lc:                                        # pad pool to the chunk grid
        pad = (n_chunks * lc - l) * r
        a_flat = jnp.concatenate(
            [a_flat, jnp.zeros((pad, h), a_flat.dtype)], axis=0)
        bt_flat = jnp.concatenate(
            [bt_flat, jnp.zeros((pad, d), bt_flat.dtype)], axis=0)
    return pl.pallas_call(
        functools.partial(_bgmv_kernel, scaling=scaling, r=r, lc=lc),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((t, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lc * r, h), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((lc * r, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, d), jnp.float32),
        scratch_shapes=[pltpu.VMEM((t, d), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * l * t * r * (h + d),
            bytes_accessed=t * h * x.dtype.itemsize + l * r * (h + d) * a.dtype.itemsize
            + t * d * 4,
            transcendentals=0,
        ),
    )(idx.reshape(t, 1).astype(jnp.int32), x, a_flat, bt_flat)


def _sgmv_kernel(
    # scalar prefetch
    seq_ids_ref,      # [nt] sequence (group) of tile
    m_tiles_ref,      # [nt] row-tile index
    offsets_ref,      # [nseq+1] row offsets per sequence
    is_pad_ref,       # [nt]
    adapter_ref,      # [nt] adapter id (drives weight BlockSpecs)
    scal_ref,         # [nt] f32 per-tile scaling
    rank_ref,         # [nt] int32 per-tile live rank
    # blocks
    x_ref, a_ref, b_ref, o_ref,
    *,
    tm: int,
):
    i = pl.program_id(0)
    g = seq_ids_ref[i]
    m_tile = m_tiles_ref[i]
    start, end = offsets_ref[g], offsets_ref[g + 1]
    rows = m_tile * tm + jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    # pad steps sweep tail tiles (rows past the packed tokens): zero-fill only
    in_group = (rows >= start) & (rows < end) & (is_pad_ref[i] == 0)

    shrink = jax.lax.dot_general(
        x_ref[...],
        a_ref[0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [tm, R]
    # heterogeneous rank: components ≥ rank[adapter] are dead weight rows
    col = jax.lax.broadcasted_iota(jnp.int32, shrink.shape, 1)
    live = in_group & (col < rank_ref[i])
    shrink = jnp.where(live, shrink * scal_ref[i], 0.0)
    y = jax.lax.dot_general(
        shrink,
        b_ref[0].astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                          # [tm, D]

    # boundary tiles are visited once per straddling sequence; visits own
    # disjoint row ranges, so merge with the previous visit's rows
    first_visit = jnp.logical_or(
        i == 0, m_tiles_ref[jnp.maximum(i - 1, 0)] != m_tile
    )
    prev = jnp.where(first_visit, jnp.zeros_like(o_ref[...]), o_ref[...])
    o_ref[...] = jnp.where(in_group, y.astype(o_ref.dtype), prev)


@functools.partial(jax.jit, static_argnames=("tm", "interpret"))
def sgmv_fused(
    x: jax.Array,
    a: jax.Array,
    b: jax.Array,
    weight_indices: jax.Array,
    seq_lengths: jax.Array,
    lora_ranks: jax.Array,
    lora_scalings: jax.Array,
    *,
    tm: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused per-sequence LoRA delta over packed varlen tokens.

    Args: x ``[S, H]`` (sequences contiguous, ``sum(seq_lengths)`` ≤ S; tail
    rows produce zeros); a ``[L, R, H]``; b ``[L, D, R]``; weight_indices
    ``[nseq]`` adapter per sequence; lora_ranks/lora_scalings ``[L]``.
    Returns ``[S, D]`` f32 delta.
    """
    if interpret is None:
        interpret = interpret_default()
    s, h = x.shape
    l, r, _ = a.shape
    d = b.shape[1]
    tm = min(tm, s)

    seq_ids, m_tiles, offsets, is_pad, num_tiles = make_gmm_metadata(
        seq_lengths.astype(jnp.int32), s, tm
    )
    widx = weight_indices.astype(jnp.int32)
    nseq = seq_lengths.shape[0]
    safe_seq = jnp.clip(seq_ids, 0, nseq - 1)
    adapter = jnp.where(is_pad == 1, 0, widx[safe_seq])
    scal = lora_scalings.astype(jnp.float32)[adapter]
    rank = lora_ranks.astype(jnp.int32)[adapter]

    return pl.pallas_call(
        functools.partial(_sgmv_kernel, tm=tm),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (tm, h),
                    lambda i, g, mt, off, pad, aid, sc, rk: (mt[i], 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, r, h),
                    lambda i, g, mt, off, pad, aid, sc, rk: (aid[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, d, r),
                    lambda i, g, mt, off, pad, aid, sc, rk: (aid[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tm, d),
                lambda i, g, mt, off, pad, aid, sc, rk: (mt[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((s, d), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * s * r * (h + d),
            bytes_accessed=s * h * x.dtype.itemsize
            + int(num_tiles) * r * (h + d) * a.dtype.itemsize + s * d * 4,
            transcendentals=0,
        ),
    )(seq_ids, m_tiles, offsets, is_pad, adapter, scal, rank, x, a, b)
