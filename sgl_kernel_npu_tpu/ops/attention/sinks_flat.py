"""Flat-pipeline sinks decode over the packed KV cache (d=64 bandwidth attack).

The BlockSpec packed kernel (`sinks_attention._sinks_packed_kernel`) is
MXU-latency-bound, not bandwidth-bound: its (token, page) grid runs 1024 steps
at GPT-OSS bench shapes and each step issues 8 thin ``[2g, 128]×[128, 128]``
dots plus 4 separate online-softmax updates — ~0.85 µs of fixed cost per
0.34 µs of DMA.  This module restructures the walk the same way
``decode_attention._mla_kernel`` does:

* ONE grid step, a flat ``fori_loop`` over ``(seq, packed-head, super-page)``
  with a 4-deep manual DMA ring (the chip streams 755 GB/s at depth 4 vs
  650-680 through Mosaic's double buffering — PERF.md chip calibration);
* each step covers a whole ``G``-page super-block of one packed head: one
  ``[2g, d2] × [G·page, d2]ᵀ`` score dot (N = G·page wide — at G=8, pages=128
  that is 8× fewer MXU latencies than per-page dots) and ONE online-softmax
  update instead of ``hkv2`` per-page updates;
* K and V pages ride per-(page, head) 32 KB DMAs straight from the paged HBM
  cache — no layout change vs `pack_kv_sinks`, so prefill/cache-write paths
  are untouched.

Reference parity: ``attention/sinks_attention.py:90`` (its decode is one
Triton kernel over (token, head) — this is the TPU-shaped equivalent of the
same single-kernel walk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.attention.decode_attention import NEG_INF


def _sinks_flat_kernel(
    bt_ref,       # scalar prefetch [B, max_pages]
    ctx_ref,      # scalar prefetch [B]
    q_ref,        # [B, hkv2, g2, d2] VMEM (zero-interleaved packed queries)
    sink_ref,     # [hkv2, 1, g2] VMEM
    k_hbm,        # [P, hkv2, page, d2] HBM (packed cache, untouched layout)
    v_hbm,        # [P, hkv2, page, dv2] HBM
    o_ref,        # [B, hkv2, g2, dv2] VMEM
    k_buf,        # scratch [n_buf, G*page, d2]
    v_buf,        # scratch [n_buf, G*page, dv2]
    acc_ref,      # scratch [g2, dv2] f32
    m_ref,        # scratch [g2, 128] f32
    l_ref,        # scratch [g2, 128] f32
    sems,         # DMA semaphores [n_buf, 2, G]
    *,
    scale,
    page_size,
    window,
    max_pages,
    n_super,
    hkv2,
):
    g2 = q_ref.shape[2]
    n_buf, sp_keys, _ = k_buf.shape
    group = sp_keys // page_size
    per_seq = hkv2 * n_super
    total = q_ref.shape[0] * per_seq

    def decompose(t):
        i = t // per_seq
        r = t - i * per_seq
        j = r // n_super
        s = r - j * n_super
        return i, j, s

    def bounds(ctx):
        hi_page = jnp.clip((ctx - 1) // page_size, 0, max_pages - 1)
        lo = jnp.maximum(ctx - window, 0) if window > 0 else 0
        lo_page = jnp.clip(jnp.minimum(lo // page_size, hi_page), 0, max_pages - 1)
        return lo, lo_page, hi_page

    def super_dma(slot, t):
        i, j, s = decompose(t)
        ctx = ctx_ref[i]
        _, lo_page, hi_page = bounds(ctx)
        for g in range(group):
            p = jnp.minimum(lo_page + s * group + g, hi_page)
            pg = bt_ref[i, p]
            pltpu.make_async_copy(
                k_hbm.at[pg, j], k_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 0, g],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[pg, j], v_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 1, g],
            ).start()

    def super_wait(slot, t):
        i, j, s = decompose(t)
        ctx = ctx_ref[i]
        _, lo_page, hi_page = bounds(ctx)
        for g in range(group):
            p = jnp.minimum(lo_page + s * group + g, hi_page)
            pg = bt_ref[i, p]
            pltpu.make_async_copy(
                k_hbm.at[pg, j], k_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 0, g],
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[pg, j], v_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 1, g],
            ).wait()

    for w in range(n_buf - 1):
        @pl.when(w < total)
        def _warm(w=w):
            super_dma(w, w)

    def body(t, _):
        i, j, s = decompose(t)
        ctx = ctx_ref[i]
        lo_win, lo_page, hi_page = bounds(ctx)
        slot = jax.lax.rem(t, n_buf)
        nxt = jax.lax.rem(t + n_buf - 1, n_buf)

        @pl.when(t + n_buf - 1 < total)
        def _prefetch():
            super_dma(nxt, t + n_buf - 1)

        super_wait(slot, t)

        @pl.when(s == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)

        # a super-block is live iff its first logical page is in range
        has_work = lo_page + s * group <= hi_page

        @pl.when(has_work)
        def _compute():
            k_blk = k_buf[slot]
            v_blk = v_buf[slot]
            if k_blk.dtype == jnp.int8:   # int8 cache: scales folded by the host
                k_blk = k_blk.astype(q_ref.dtype)
            if v_blk.dtype == jnp.int8:
                v_blk = v_blk.astype(q_ref.dtype)
            qk = jax.lax.dot_general(
                q_ref[i, j], k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            # column validity from UNclamped logical positions (clamped
            # duplicate pages land at pos ≥ ctx → masked)
            col = jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
            pos = (lo_page + s * group) * page_size + col
            mask = pos < ctx
            if window > 0:
                mask &= pos >= lo_win
            qk = jnp.where(mask, qk, NEG_INF)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            probs = jnp.exp(qk - m_new)
            l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(
                probs, axis=-1, keepdims=True)
            m_ref[:, :1] = m_new
            acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
                probs.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        @pl.when(s == n_super - 1)
        def _finish():
            sink = sink_ref[j, 0].astype(jnp.float32)[:, None]
            m_fin = jnp.maximum(m_ref[:, :1], sink)
            l_fin = l_ref[:, :1] * jnp.exp(m_ref[:, :1] - m_fin) + jnp.exp(
                sink - m_fin)
            o_ref[i, j] = (acc_ref[...] * jnp.exp(m_ref[:, :1] - m_fin)
                           / l_fin).astype(o_ref.dtype)

        return 0

    jax.lax.fori_loop(0, total, body, 0)


def sinks_packed_flat_call(
    q2, sk2, k_packed, v_packed, block_tables, context_lens, *,
    scale, sliding_window_size, interpret,
):
    """Launch the flat kernel on pre-packed inputs.

    Args:
        q2: ``[S, hkv2, g2, d2]`` zero-interleaved packed queries
            (``sinks_attention._pack_queries`` convention, int8 scales already
            folded by the caller).
        sk2: ``[hkv2, 1, g2]`` packed sink logits.
        k_packed / v_packed: ``[P, hkv2, page, 2d]`` packed caches.

    Returns ``[S, hkv2, g2, 2·dv]`` packed outputs (same shape contract as the
    BlockSpec kernel, so `attention_sinks_packed`'s unpack path is shared).
    """
    s, hkv2, g2, d2 = q2.shape
    n_pages_total, _, page_size, dv2 = v_packed.shape
    max_pages = block_tables.shape[1]
    if sliding_window_size > 0:
        n_pg = min(max_pages, -(-sliding_window_size // page_size) + 1)
    else:
        n_pg = max_pages
    group = min(8, n_pg)
    n_super = -(-n_pg // group)
    n_buf = 4 if s * hkv2 * n_super >= 4 else 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q2, whole batch resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sinks
            pl.BlockSpec(memory_space=pl.ANY),       # paged caches stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, group * page_size, d2), k_packed.dtype),
            pltpu.VMEM((n_buf, group * page_size, dv2), v_packed.dtype),
            pltpu.VMEM((g2, dv2), jnp.float32),
            pltpu.VMEM((g2, 128), jnp.float32),
            pltpu.VMEM((g2, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((n_buf, 2, group)),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _sinks_flat_kernel, scale=scale, page_size=page_size,
            window=sliding_window_size, max_pages=max_pages,
            n_super=n_super, hkv2=hkv2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hkv2, g2, dv2), q2.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_tables.astype(jnp.int32), context_lens.astype(jnp.int32),
      q2, sk2, k_packed, v_packed)
