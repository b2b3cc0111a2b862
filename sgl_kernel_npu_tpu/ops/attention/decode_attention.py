"""Paged-KV decode attention (MLA and GQA) as Pallas TPU kernels.

Capability parity with reference
``python/sgl_kernel_npu/sgl_kernel_npu/attention/decode_attention.py``:

- ``decode_mla``  (reference :166) — DeepSeek MLA: q = [B, Hq, 512+64] (nope ‖ rope),
  paged latent cache split into k_nope [pages, 1, page, 512] and a *transposed*
  rope cache k_rope [pages, 1, rope, page] (rope=64 < 128 lanes, so the transposed
  layout is the only HBM shape whose page slices are DMA-aligned — and it feeds the
  q_pe·k_pe product in native MXU orientation); V aliases K_nope (reference :123).
  Output [B, Hq, 512].
- ``decode_gqa``  (reference :373) — grouped-query attention over paged K/V caches,
  with the DeepSeek split-K special case (Lk = 576 → 512 model + 64 pe) handled by
  the same two-part dot product.

TPU-first design (not a Triton translation):
- the page walk is the Pallas grid; ``block_table`` and ``kv_seq_lens`` ride
  ``PrefetchScalarGridSpec`` scalar prefetch so each page's HBM→VMEM DMA address is
  computed before the step runs (the idiomatic TPU paged-attention pattern);
- online softmax state (m, l, acc) lives in VMEM scratch and persists across the
  sequential page grid — one flash-decoding pass, no mid-chunk HBM traffic;
- pages past ``kv_seq_len`` clamp their DMA to page 0 and are masked out, keeping
  shapes static for XLA;
- the paged cache layout is ``[num_pages, kv_heads, page_size, head_dim]`` (kv-head
  dim *before* the token dim) so per-head page blocks are (page_size, head_dim)
  tiles — legal and MXU-friendly regardless of head_dim.  This intentionally differs
  from the reference's ``[pages, page, heads, dim]``: on TPU the last two dims must
  form aligned tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.utils.common import cdiv, interpret_default

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# golden references
# ---------------------------------------------------------------------------

def _gather_pages(buffer: jax.Array, block_table: jax.Array, max_len: int) -> jax.Array:
    """[pages, H, page, D] + [B, max_pages] → [B, H, max_len, D] (linear KV view)."""
    _, h, page_size, d = buffer.shape
    n_pages = cdiv(max_len, page_size)
    pages = buffer[block_table[:, :n_pages]]  # [B, n_pages, H, page, D]
    b = pages.shape[0]
    return pages.transpose(0, 2, 1, 3, 4).reshape(b, h, n_pages * page_size, d)[:, :, :max_len]


def decode_mla_ref(q, k_nope_buffer, k_rope_buffer, kv_seq_lens, sm_scale, block_table,
                   k_scale=None):
    """Pure-jnp paged MLA decode attention (golden).

    ``k_rope_buffer`` uses the transposed layout [pages, 1, rope, page].
    An int8 ``k_nope_buffer`` holds ``round(k / k_scale)`` levels (the
    ``int8_nzcache`` mode written by :func:`mla_preprocess`)."""
    b, hq, _ = q.shape
    d_nope = k_nope_buffer.shape[-1]
    max_len = int(block_table.shape[1] * k_nope_buffer.shape[2])
    q_nope, q_pe = q[..., :d_nope], q[..., d_nope:]
    k_nope = _gather_pages(k_nope_buffer, block_table, max_len)[:, 0]  # [B, L, 512]
    if k_nope_buffer.dtype == jnp.int8:
        k_nope = k_nope.astype(jnp.float32) * jnp.float32(
            1.0 if k_scale is None else k_scale)
    k_rope = _gather_pages(
        k_rope_buffer.swapaxes(-1, -2), block_table, max_len
    )[:, 0]                                                            # [B, L, 64]
    qk = jnp.einsum("bhd,bld->bhl", q_nope.astype(jnp.float32), k_nope.astype(jnp.float32))
    qk += jnp.einsum("bhd,bld->bhl", q_pe.astype(jnp.float32), k_rope.astype(jnp.float32))
    qk *= sm_scale
    mask = jnp.arange(max_len)[None, None, :] < kv_seq_lens[:, None, None]
    qk = jnp.where(mask, qk, NEG_INF)
    p = jax.nn.softmax(qk, axis=-1)
    out = jnp.einsum("bhl,bld->bhd", p, k_nope.astype(jnp.float32))
    return out.astype(q.dtype)


def _kv_head_scale(scale, hkv):
    """Normalize an int8-cache dequant scale (scalar or per-kv-head [Hkv]) to
    a [Hkv, 1, 1] f32 broadcastable over [B, Hkv, ·, ·]."""
    s = jnp.asarray(1.0 if scale is None else scale, jnp.float32)
    return jnp.broadcast_to(s.reshape(-1, 1, 1) if s.ndim else s, (hkv, 1, 1))


def decode_gqa_ref(q, k_buffer, v_buffer, kv_seq_lens, sm_scale, block_table,
                   k_scale=None, v_scale=None):
    """Pure-jnp paged GQA decode attention (golden).  Int8 K/V buffers hold
    ``round(x / scale)`` levels; scales are scalar or per-kv-head [Hkv]."""
    b, hq, dk = q.shape
    hkv = k_buffer.shape[1]
    group = hq // hkv
    max_len = int(block_table.shape[1] * k_buffer.shape[2])
    k = _gather_pages(k_buffer, block_table, max_len)  # [B, Hkv, L, Dk]
    v = _gather_pages(v_buffer, block_table, max_len)  # [B, Hkv, L, Dv]
    if k_buffer.dtype == jnp.int8:
        k = k.astype(jnp.float32) * _kv_head_scale(k_scale, hkv)[None]
    if v_buffer.dtype == jnp.int8:
        v = v.astype(jnp.float32) * _kv_head_scale(v_scale, hkv)[None]
    qg = q.reshape(b, hkv, group, dk).astype(jnp.float32)
    qk = jnp.einsum("bkgd,bkld->bkgl", qg, k.astype(jnp.float32)) * sm_scale
    mask = jnp.arange(max_len)[None, None, None, :] < kv_seq_lens[:, None, None, None]
    qk = jnp.where(mask, qk, NEG_INF)
    p = jax.nn.softmax(qk, axis=-1)
    out = jnp.einsum("bkgl,bkld->bkgd", p, v.astype(jnp.float32))
    return out.reshape(b, hq, v.shape[-1]).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas MLA decode
# ---------------------------------------------------------------------------

def _mla_kernel(
    block_table_ref,  # scalar prefetch [B, max_pages]
    seq_lens_ref,     # scalar prefetch [B]
    q_nope_ref,       # [1, Hq, 512] VMEM
    q_pe_ref,         # [1, Hq, 64]  VMEM
    kn_hbm,           # [pages, page, 512] HBM (manually DMA'd)
    kr_hbm,           # [pages, rope, page] HBM (transposed rope cache)
    o_ref,            # [1, Hq, 512]
    kn_buf,           # scratch [2, page, 512] VMEM (double buffer)
    kr_buf,           # scratch [2, page, 64]
    acc_ref,          # scratch [Hq, 512] f32
    m_ref,            # scratch [Hq, 128] f32
    l_ref,            # scratch [Hq, 128] f32
    sems,             # DMA semaphores [2, 2]
    *,
    sm_scale,
    page_size,
):
    """Whole batch in ONE grid step: a single flat DMA pipeline walks every
    (sequence, super-page) pair with no drain at sequence boundaries.

    Each super-step launches ``group`` page DMAs into one contiguous buffer and
    computes one flash update over ``group·page_size`` keys (4×-wider matmuls and
    4× fewer semaphore waits than page-at-a-time, which measured ~550 ns/page of
    loop overhead vs the 180 ns DMA; the per-sequence grid variant additionally
    lost a pipeline fill per sequence)."""
    bsz = q_nope_ref.shape[0]
    n_buf, sp_keys, d_nope = kn_buf.shape
    group = sp_keys // page_size
    max_pages = block_table_ref.shape[1]
    n_super = (max_pages + group - 1) // group
    total = bsz * n_super

    def super_dma(slot, t):
        """DMA the `group` pages of flat step t = i·n_super + s (clamped)."""
        i = t // n_super
        s = t - i * n_super
        seq_len = seq_lens_ref[i]
        last = jnp.maximum((seq_len + page_size - 1) // page_size - 1, 0)
        for g in range(group):
            p = jnp.minimum(s * group + g, last)
            pg = block_table_ref[i, p]
            pltpu.make_async_copy(
                kn_hbm.at[pg], kn_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 0, g],
            ).start()
            pltpu.make_async_copy(
                kr_hbm.at[pg], kr_buf.at[slot, :, pl.ds(g * page_size, page_size)],
                sems.at[slot, 1, g],
            ).start()

    def super_wait(slot, t):
        i = t // n_super
        s = t - i * n_super
        seq_len = seq_lens_ref[i]
        last = jnp.maximum((seq_len + page_size - 1) // page_size - 1, 0)
        for g in range(group):
            p = jnp.minimum(s * group + g, last)
            pg = block_table_ref[i, p]
            pltpu.make_async_copy(
                kn_hbm.at[pg], kn_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 0, g],
            ).wait()
            pltpu.make_async_copy(
                kr_hbm.at[pg], kr_buf.at[slot, :, pl.ds(g * page_size, page_size)],
                sems.at[slot, 1, g],
            ).wait()

    for w in range(n_buf - 1):
        @pl.when(w < total)
        def _warm(w=w):
            super_dma(w, w)

    def body(t, _):
        i = t // n_super
        s = t - i * n_super
        seq_len = seq_lens_ref[i]
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

        valid = seq_len - s * sp_keys

        @pl.when(valid > 0)
        def _compute():
            # native-precision MXU dots (bf16×bf16→f32 accumulate): casting the
            # [G·page, 512] K tile to f32 would both burn VPU cycles and drop
            # MXU throughput ~8× — enough to unshadow the DMA pipeline.
            q_nope = q_nope_ref[i]
            q_pe = q_pe_ref[i]
            k_nope = kn_buf[slot]                                # [G·page, 512]
            if k_nope.dtype == jnp.int8:
                # int8 KV cache: levels convert exactly (|k| ≤ 128); the dequant
                # scale is folded into q / the output by the host wrapper, so
                # the kernel stays scale-free.  Convert to q's dtype (bf16 in
                # production) so the MXU dots see matching operands; the
                # convert shadows under the halved DMA.
                k_nope = k_nope.astype(q_nope_ref.dtype)
            k_rope_t = kr_buf[slot]                              # [rope, G·page]
            qk = jax.lax.dot_general(
                q_nope, k_nope, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            qk += jax.lax.dot_general(
                q_pe, k_rope_t, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            qk *= sm_scale
            pos = jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
            qk = jnp.where(pos < valid, qk, NEG_INF)

            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            probs = jnp.exp(qk - m_new)
            l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(probs, axis=-1, keepdims=True)
            m_ref[:, :1] = m_new
            pv = jax.lax.dot_general(
                probs.astype(k_nope.dtype), k_nope, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[...] = acc_ref[...] * alpha + pv

        @pl.when(s == n_super - 1)
        def _finish():
            o_ref[i] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)

        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret", "ring"))
def decode_mla(
    q,
    k_nope_buffer,
    k_rope_buffer,
    kv_seq_lens,
    sm_scale,
    block_table,
    *,
    k_scale=None,
    interpret=None,
    ring: int = 4,
):
    """Paged MLA decode attention (reference decode_attention.py:166).

    Args:
        q: ``[B, Hq, Lkv + Lrope]`` queries (nope ‖ rope on the last dim).
        k_nope_buffer: ``[num_pages, 1, page_size, Lkv]`` paged latent cache —
            bf16, or **int8** holding ``round(k / k_scale)`` levels (the
            ``int8_nzcache`` cache written by :func:`mla_preprocess`; reference
            mla_preprocess.cpp:610-616 pairs that cache mode with an int8
            attention consumer).  Int8 halves the decode loop's KV HBM traffic.
        k_rope_buffer: ``[num_pages, 1, Lrope, page_size]`` paged rope cache
            (*transposed* layout — see module docstring; stays bf16, matching
            the reference's krope handling).
        kv_seq_lens: ``[B]`` int32 current lengths.
        sm_scale: softmax scale.
        block_table: ``[B, max_pages]`` logical→physical page map.
        k_scale: scalar dequant scale for the int8 cache (``ctkv_scale``).
            Folded into q (for the scores) and the output (for PV, since V
            aliases K) on the host — the kernel never sees it.

    Returns:
        ``[B, Hq, Lkv]`` attention output (V aliases K_nope, reference :123).
    """
    if interpret is None:
        interpret = interpret_default()
    b, hq, _ = q.shape
    n_pages_total, hkv, page_size, d_nope = k_nope_buffer.shape
    d_rope = k_rope_buffer.shape[-2]
    assert hkv == 1, "MLA latent cache has a single KV head"
    assert k_rope_buffer.shape[-1] == page_size, "rope cache must be transposed [*, rope, page]"
    is_int8 = k_nope_buffer.dtype == jnp.int8
    ks = jnp.float32(1.0 if k_scale is None else k_scale) if is_int8 else None
    if not interpret and (page_size % 128 != 0 or d_nope % 128 != 0):
        # compiled path DMA-slices HBM pages: both dims must be lane/tile aligned.
        return decode_mla_ref(q, k_nope_buffer, k_rope_buffer, kv_seq_lens, sm_scale,
                              block_table, k_scale=k_scale)
    max_pages = block_table.shape[1]
    hq_orig = hq
    hq = max(8, -(-hq // 8) * 8)  # pad heads to a sublane tile
    q_nope = q[..., :d_nope]
    q_pe = q[..., d_nope:]
    if is_int8:
        # scores see q·(k_int·s) = (q·s)·k_int; PV magnitude is restored on the
        # output below.  Both folds touch only [B, Hq, ·] tensors.
        q_nope = (q_nope.astype(jnp.float32) * ks).astype(q.dtype)
    if hq != hq_orig:
        pad = ((0, 0), (0, hq - hq_orig), (0, 0))
        q_nope, q_pe = jnp.pad(q_nope, pad), jnp.pad(q_pe, pad)
    kn = k_nope_buffer.reshape(n_pages_total, page_size, d_nope)
    kr = k_rope_buffer.reshape(n_pages_total, d_rope, page_size)
    group = min(8, max_pages)  # pages per super-step (one wait per `group` pages)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q_nope, whole batch resident
            pl.BlockSpec(memory_space=pltpu.VMEM),   # q_pe
            pl.BlockSpec(memory_space=pl.ANY),    # paged caches stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            # ring-deep DMA pipeline (r5: depth-2 streamed ~700 GB/s, depth 4
            # ~755 — the chip's flat-stream ceiling, see ops/gmm_ring.py)
            pltpu.VMEM((ring, group * page_size, d_nope), kn.dtype),
            pltpu.VMEM((ring, d_rope, group * page_size), kr.dtype),
            pltpu.VMEM((hq, d_nope), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((ring, 2, group)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_mla_kernel, sm_scale=sm_scale, page_size=page_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d_nope), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_table.astype(jnp.int32), kv_seq_lens.astype(jnp.int32), q_nope, q_pe, kn, kr)
    out = out[:, :hq_orig]
    if is_int8:
        out = (out.astype(jnp.float32) * ks).astype(q.dtype)
    return out


# ---------------------------------------------------------------------------
# Pallas GQA decode — flat-pipeline variant (the `decode_gqa_high_performance`
# equivalent, reference decode_attention.py:646): same continuous DMA walk as the
# MLA kernel, one flat loop over (sequence, kv-head, super-page).
# ---------------------------------------------------------------------------

def _gqa_flat_kernel(
    block_table_ref,  # [B, max_pages]
    seq_lens_ref,     # [B]
    q_ref,            # [B, Hkv, group, Dk] VMEM
    k_hbm,            # [pages, Hkv, page, Dk] HBM
    v_hbm,            # [pages, Hkv, page, Dv] HBM
    o_ref,            # [B, Hkv, group, Dv] VMEM
    k_buf,            # [2, G*page, Dk]
    v_buf,            # [2, G*page, Dv]
    acc_ref, m_ref, l_ref,
    sems,             # [2, 2, G]
    *,
    sm_scale,
    page_size,
):
    bsz, hkv = q_ref.shape[0], q_ref.shape[1]
    n_buf, sp_keys, dk = k_buf.shape
    group_pages = sp_keys // page_size
    max_pages = block_table_ref.shape[1]
    n_super = (max_pages + group_pages - 1) // group_pages
    per_seq = hkv * n_super
    total = bsz * per_seq

    def decompose(t):
        i = t // per_seq
        r = t - i * per_seq
        h = r // n_super
        s = r - h * n_super
        return i, h, s

    def super_dma(slot, t):
        i, h, s = decompose(t)
        seq_len = seq_lens_ref[i]
        last = jnp.maximum((seq_len + page_size - 1) // page_size - 1, 0)
        for g in range(group_pages):
            p = jnp.minimum(s * group_pages + g, last)
            pg = block_table_ref[i, p]
            pltpu.make_async_copy(
                k_hbm.at[pg, h], k_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 0, g],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[pg, h], v_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 1, g],
            ).start()

    def super_wait(slot, t):
        i, h, s = decompose(t)
        seq_len = seq_lens_ref[i]
        last = jnp.maximum((seq_len + page_size - 1) // page_size - 1, 0)
        for g in range(group_pages):
            p = jnp.minimum(s * group_pages + g, last)
            pg = block_table_ref[i, p]
            pltpu.make_async_copy(
                k_hbm.at[pg, h], k_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 0, g],
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[pg, h], v_buf.at[slot, pl.ds(g * page_size, page_size), :],
                sems.at[slot, 1, g],
            ).wait()

    for w in range(n_buf - 1):
        @pl.when(w < total)
        def _warm(w=w):
            super_dma(w, w)

    def body(t, _):
        i, h, s = decompose(t)
        seq_len = seq_lens_ref[i]
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

        valid = seq_len - s * sp_keys

        @pl.when(valid > 0)
        def _compute():
            # native-precision MXU dots (see _mla_kernel)
            q = q_ref[i, h]
            k = k_buf[slot]
            v = v_buf[slot]
            if k.dtype == jnp.int8:   # int8 KV cache: scale folded by the host
                k = k.astype(q.dtype)
            if v.dtype == jnp.int8:
                v = v.astype(q.dtype)
            qk = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * sm_scale
            pos = jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
            qk = jnp.where(pos < valid, qk, NEG_INF)
            m_prev = m_ref[:, :1]
            m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            probs = jnp.exp(qk - m_new)
            l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(probs, axis=-1, keepdims=True)
            m_ref[:, :1] = m_new
            acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
                probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(s == n_super - 1)
        def _finish():
            o_ref[i, h] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)

        return 0

    jax.lax.fori_loop(0, total, body, 0)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_gqa_high_performance(
    q, k_buffer, v_buffer, kv_seq_lens, sm_scale, block_table, *,
    k_scale=None, v_scale=None, interpret=None,
):
    """Flat-pipeline paged GQA decode (reference decode_attention.py:646 analogue).

    Same signature/layout as :func:`decode_gqa`; requires lane-aligned head dims
    (falls back to :func:`decode_gqa` otherwise).  Int8 K/V buffers hold
    ``round(x / scale)`` levels; ``k_scale``/``v_scale`` are scalar or per-kv-head
    ``[Hkv]`` and are folded into q / the output on the host (the kernel only
    converts the int8 tiles) — int8 KV halves the decode loop's HBM traffic.
    """
    if interpret is None:
        interpret = interpret_default()
    b, hq, dk = q.shape
    n_pages_total, hkv, page_size, _ = k_buffer.shape
    dv = v_buffer.shape[-1]
    if not interpret and (dk % 128 or dv % 128 or page_size % 8):
        return decode_gqa(q, k_buffer, v_buffer, kv_seq_lens, sm_scale, block_table,
                          k_scale=k_scale, v_scale=v_scale, interpret=interpret)
    group = hq // hkv
    group_p = max(8, -(-group // 8) * 8)
    qg = q.reshape(b, hkv, group, dk)
    if k_buffer.dtype == jnp.int8:
        ksb = _kv_head_scale(k_scale, hkv)
        qg = (qg.astype(jnp.float32) * ksb[None]).astype(q.dtype)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))
    max_pages = block_table.shape[1]
    gp = min(8, max_pages)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            # 4-deep DMA ring (r5: matches decode_mla — double buffering
            # leaves ~13% of the stream ceiling on the table, PERF.md)
            pltpu.VMEM((4, gp * page_size, dk), k_buffer.dtype),
            pltpu.VMEM((4, gp * page_size, dv), v_buffer.dtype),
            pltpu.VMEM((group_p, dv), jnp.float32),
            pltpu.VMEM((group_p, 128), jnp.float32),
            pltpu.VMEM((group_p, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4, 2, gp)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_gqa_flat_kernel, sm_scale=sm_scale, page_size=page_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, group_p, dv), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(block_table.astype(jnp.int32), kv_seq_lens.astype(jnp.int32), qg, k_buffer, v_buffer)
    out = out[:, :, :group]
    if v_buffer.dtype == jnp.int8:
        out = (out.astype(jnp.float32) * _kv_head_scale(v_scale, hkv)[None]).astype(q.dtype)
    return out.reshape(b, hq, dv)


# ---------------------------------------------------------------------------
# Pallas GQA decode
# ---------------------------------------------------------------------------

def _gqa_kernel(
    block_table_ref,
    seq_lens_ref,
    q_ref,      # [1, group, Dk] (one kv head's query group)
    k_ref,      # [1, page, Dk]
    v_ref,      # [1, page, Dv]
    o_ref,      # [1, group, Dv]
    acc_ref,
    m_ref,
    l_ref,
    *,
    sm_scale,
    page_size,
    d_model,
):
    b = pl.program_id(0)
    p = pl.program_id(2)
    n_pages = pl.num_programs(2)
    seq_len = seq_lens_ref[b]

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    valid_in_page = seq_len - p * page_size

    @pl.when(valid_in_page > 0)
    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        if k.dtype == jnp.int8:   # int8 KV cache: scale folded by the host
            k = k.astype(q.dtype)
        if v.dtype == jnp.int8:
            v = v.astype(q.dtype)
        # Split-K dot (DeepSeek 576 = 512 + 64) falls out of a single dot here since
        # both parts share the contraction; no special case needed on TPU.
        qk = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        qk *= sm_scale
        pos = jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        qk = jnp.where(pos < valid_in_page, qk, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        probs = jnp.exp(qk - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(probs, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        pv = jax.lax.dot_general(
            probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(p == n_pages - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def decode_gqa(q, k_buffer, v_buffer, kv_seq_lens, sm_scale, block_table, *,
               k_scale=None, v_scale=None, interpret=None):
    """Paged GQA decode attention (reference decode_attention.py:373).

    Args:
        q: ``[B, Hq, Dk]``; k_buffer/v_buffer: ``[pages, Hkv, page_size, D{k,v}]``
            (TPU-first layout — kv-head dim before token dim, see module docstring).
            Int8 buffers hold ``round(x / scale)`` levels; ``k_scale``/``v_scale``
            are scalar or per-kv-head ``[Hkv]`` (see decode_gqa_high_performance).

    Returns ``[B, Hq, Dv]``.
    """
    if interpret is None:
        interpret = interpret_default()
    b, hq, dk = q.shape
    n_pages_total, hkv, page_size, _ = k_buffer.shape
    dv = v_buffer.shape[-1]
    assert hq % hkv == 0
    group = hq // hkv
    max_pages = block_table.shape[1]
    # Lay q out as [B, Hkv, group, Dk] so one grid step owns one kv head's group.
    # Pad the group dim to a full sublane tile (8); padded heads compute garbage
    # that is sliced away (q=0 rows stay finite through the online softmax).
    group_p = max(8, -(-group // 8) * 8)
    qg = q.reshape(b, hkv, group, dk)
    if k_buffer.dtype == jnp.int8:
        qg = (qg.astype(jnp.float32) * _kv_head_scale(k_scale, hkv)[None]).astype(q.dtype)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))
    group = group_p

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, hkv, max_pages),
        in_specs=[
            pl.BlockSpec(
                (1, 1, group, dk),
                lambda i, h, p, bt, sl: (i, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, page_size, dk),
                lambda i, h, p, bt, sl: (bt[i, p], h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, page_size, dv),
                lambda i, h, p, bt, sl: (bt[i, p], h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group, dv), lambda i, h, p, bt, sl: (i, h, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((group, dv), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
            pltpu.VMEM((group, 128), jnp.float32),
        ],
    )

    def kernel(bt, sl, q_r, k_r, v_r, o_r, acc, m, l):
        _gqa_kernel(
            bt,
            sl,
            q_r.at[:, 0],
            k_r.at[:, 0],
            v_r.at[:, 0],
            o_r.at[:, 0],
            acc,
            m,
            l,
            sm_scale=sm_scale,
            page_size=page_size,
            d_model=dk,
        )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, group, dv), q.dtype),
        interpret=interpret,
    )(block_table.astype(jnp.int32), kv_seq_lens.astype(jnp.int32), qg, k_buffer, v_buffer)
    out = out[:, :, : hq // hkv]
    if v_buffer.dtype == jnp.int8:
        out = (out.astype(jnp.float32) * _kv_head_scale(v_scale, hkv)[None]).astype(q.dtype)
    return out.reshape(b, hq, dv)


def decode_mla_sparse(
    q,                    # [B, Hq, Lkv + Lrope]
    k_nope_buffer,        # [pages, 1, page, Lkv]
    k_rope_buffer,        # [pages, 1, Lrope, page] (transposed layout)
    kv_seq_lens,          # [B]
    sm_scale,
    block_table,          # [B, max_pages]
    topk_index,           # [B, K] token positions from the lightning indexer (−1 = pad)
    k_scale=None,         # int8-cache dequant scale (see decode_mla)
):
    """Sparse MLA decode attention over indexer-selected positions
    (DeepSeek-V3.2 DSA: the lightning indexer picks ``K`` keys per query, so
    attention reads O(K), not O(seq) — reference ships the indexer
    (csrc/lightning_indexer); the sparse consumer lives in SGLang, rebuilt
    here).  Gathers the selected latents then runs one dense masked softmax;
    at K ≪ seq this is the KV-traffic win (K·(Lkv+Lrope) bytes/token)."""
    b, hq, _ = q.shape
    _, _, page_size, d_nope = k_nope_buffer.shape
    idx = topk_index.astype(jnp.int32)
    live = (idx >= 0) & (idx < kv_seq_lens[:, None].astype(jnp.int32))
    safe = jnp.where(live, idx, 0)
    rows = jnp.arange(b)[:, None]
    phys = block_table[rows, safe // page_size]                 # [B, K]
    slot = safe % page_size
    kn = k_nope_buffer[phys, 0, slot, :]                        # [B, K, Lkv]
    kr = k_rope_buffer[phys, 0, :, slot]                        # [B, K, Lrope]
    kn = kn.astype(jnp.float32)
    if k_nope_buffer.dtype == jnp.int8:
        kn = kn * jnp.float32(1.0 if k_scale is None else k_scale)
    q_nope, q_pe = q[..., :d_nope], q[..., d_nope:]
    qk = jnp.einsum("bhd,bkd->bhk", q_nope.astype(jnp.float32), kn)
    qk += jnp.einsum("bhd,bkd->bhk", q_pe.astype(jnp.float32),
                     kr.astype(jnp.float32))
    qk = jnp.where(live[:, None, :], qk * sm_scale, NEG_INF)
    p = jax.nn.softmax(qk, axis=-1)
    out = jnp.einsum("bhk,bkd->bhd", p, kn)
    return out.astype(q.dtype)


def decode_mla_block_sparse(
    q,                    # [B, Hq, Lkv + Lrope]
    k_nope_buffer,
    k_rope_buffer,
    kv_seq_lens,          # [B]
    sm_scale,
    block_table,          # [B, max_pages]
    token_scores,         # [B, max_len] indexer scores (−inf beyond ctx is fine)
    num_sel_pages: int,
    k_scale=None,         # int8-cache dequant scale (see decode_mla)
):
    """Block-sparse MLA decode: top pages by (page-max of token scores), then
    the regular Pallas paged kernel over a PRUNED block table.

    The TPU-shaped answer to DSA sparse attention: token-granular gathers are
    catastrophically slow on TPU (measured ~60 GB/s effective — XLA lowers
    them to scalar dynamic gathers), but a page-granular selection keeps every
    DMA a contiguous [page, 512] block, so the selected KV reads at the dense
    kernel's 97%-of-roofline bandwidth.  The current token's (partial) page is
    always included; invalid pages sort to the tail and are masked by the
    pruned sequence length.  Softmax covers every token of every selected
    page — block-sparse semantics, the standard page-top-k relaxation of the
    reference's token-top-k indexer.
    """
    b = q.shape[0]
    page = k_nope_buffer.shape[2]
    max_pages = block_table.shape[1]
    sl = kv_seq_lens.astype(jnp.int32)
    ps = token_scores.reshape(b, max_pages, page)
    # page score = max over its valid tokens
    pos = jnp.arange(max_pages * page, dtype=jnp.int32).reshape(max_pages, page)
    valid = pos[None] < sl[:, None, None]
    pscore = jnp.max(jnp.where(valid, ps.astype(jnp.float32), -jnp.inf), axis=-1)
    last_page = (sl - 1) // page
    pscore = pscore.at[jnp.arange(b), last_page].set(jnp.inf)  # always keep
    k_eff = min(num_sel_pages, max_pages)
    _, sel_pages = jax.lax.top_k(pscore, k_eff)                # [B, k_eff]
    sel_pages = jnp.sort(sel_pages, axis=-1)                   # fulls→partial→invalid
    rows = jnp.arange(b)[:, None]
    bt_sel = block_table[rows, sel_pages]
    vp = jnp.clip(sl[:, None] - sel_pages * page, 0, page)     # valid tokens/page
    seq_sel = jnp.sum(vp, axis=-1).astype(jnp.int32)
    return decode_mla(q, k_nope_buffer, k_rope_buffer, seq_sel, sm_scale, bt_sel,
                      k_scale=k_scale)
