"""Attention with sink logits (GPT-OSS style) over paged KV — decode + prefill.

Capability parity with reference ``attention/sinks_attention.py``
(``attention_sinks_triton:90`` decode, ``attention_sinks_prefill_triton:241``):
per-head learned sink logits join the softmax denominator (equivalent to one extra
always-attended token with value 0), plus sliding-window masking.

Decode runs as a Pallas flash-decoding kernel over the page grid (same structure as
ops/attention/decode_attention.decode_gqa); prefill ships both a fused jnp golden
(:func:`attention_sinks_prefill`) and a Pallas varlen flash kernel
(:func:`attention_sinks_prefill_pallas`) over a (batch, kv-head, q-chunk, kv-page)
grid.

Cache layout: ``[pages, kv_heads, page_size, head_dim]`` (TPU-first, see
decode_attention module docstring).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.attention.decode_attention import (
    NEG_INF,
    _gather_pages,
    _kv_head_scale,
)
from sgl_kernel_npu_tpu.utils.common import interpret_default


def attention_sinks_ref(
    query, k_cache, v_cache, sinks, block_tables, context_lens, scale,
    sliding_window_size: int, q_head_num: int, k_head_num: int,
    k_scale=None, v_scale=None,
):
    """Golden decode path.  query [S, Hq*D] → [S, Hq*Dv].  Int8 caches hold
    ``round(x / scale)`` levels; scales scalar or per-kv-head [Hkv]."""
    s = query.shape[0]
    d = query.shape[-1] // q_head_num
    dv = v_cache.shape[-1]
    max_len = int(block_tables.shape[1] * k_cache.shape[2])
    q = query.reshape(s, q_head_num, d).astype(jnp.float32)
    k = _gather_pages(k_cache, block_tables, max_len).astype(jnp.float32)  # [S,Hkv,L,D]
    v = _gather_pages(v_cache, block_tables, max_len).astype(jnp.float32)
    if k_cache.dtype == jnp.int8:
        k = k * _kv_head_scale(k_scale, k_head_num)[None]
    if v_cache.dtype == jnp.int8:
        v = v * _kv_head_scale(v_scale, k_head_num)[None]
    group = q_head_num // k_head_num
    qg = q.reshape(s, k_head_num, group, d)
    logits = jnp.einsum("skgd,skld->skgl", qg, k) * scale
    pos = jnp.arange(max_len)[None, None, None, :]
    ctx = context_lens[:, None, None, None]
    mask = pos < ctx
    if sliding_window_size > 0:
        mask &= pos >= ctx - sliding_window_size
    logits = jnp.where(mask, logits, NEG_INF)
    sink = sinks.astype(jnp.float32).reshape(k_head_num, group)[None, :, :, None]
    all_logits = jnp.concatenate([logits, jnp.broadcast_to(sink, (s, k_head_num, group, 1))], -1)
    p = jax.nn.softmax(all_logits, axis=-1)[..., :-1]   # sink contributes denom only
    out = jnp.einsum("skgl,skld->skgd", p, v)
    return out.reshape(s, q_head_num * dv).astype(query.dtype)


def _decode_page_bounds(ctx, *, window, page_size, max_pages):
    """[lo_page, hi_page] of KV pages a decode token (position ctx−1) can see.

    Window pruning: grid steps outside the range clamp to ``hi_page`` (index maps
    reuse the resident block, no DMA) and skip compute — KV traffic is O(window),
    not O(ctx), on sliding-window layers."""
    hi_page = jnp.clip((ctx - 1) // page_size, 0, max_pages - 1)
    lo = jnp.maximum(ctx - window, 0) if window > 0 else 0
    lo_page = jnp.clip(jnp.minimum(lo // page_size, hi_page), 0, max_pages - 1)
    return lo_page, hi_page


def _sinks_kernel(
    bt_ref, ctx_ref, q_ref, sink_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, scale, page_size, window, max_pages, hkv,
):
    """All kv heads of one token per grid step: grid is (token, page) and the
    per-head flash dots run as a static unrolled loop, so each step moves one
    fat ``[hkv, page, d]`` block instead of hkv thin ones (8× fewer grid steps
    and DMAs at GPT-OSS shapes — the step cost is DMA/grid-bound, not MXU)."""
    i = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)
    ctx = ctx_ref[i]
    g = q_ref.shape[2]

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    lo = ctx - window if window > 0 else 0
    lo_page, hi_page = _decode_page_bounds(
        ctx, window=window, page_size=page_size, max_pages=max_pages)
    page = jnp.minimum(lo_page + p, hi_page)         # must match the index maps
    page_start = page * page_size
    has_work = jnp.logical_and(
        lo_page + p <= hi_page,
        (page_start < ctx) & (page_start + page_size > lo),
    )

    @pl.when(has_work)
    def _step():
        k_blk, v_blk = k_ref[0], v_ref[0]
        if k_blk.dtype == jnp.int8:  # int8 KV cache: scale folded by the host
            k_blk = k_blk.astype(q_ref.dtype)
        if v_blk.dtype == jnp.int8:
            v_blk = v_blk.astype(q_ref.dtype)
        for h in range(hkv):                         # static unroll
            rows = pl.ds(h * g, g)
            # native-precision MXU dots (cf. decode_attention._mla_kernel)
            qk = jax.lax.dot_general(
                q_ref[0, h], k_blk[h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            pos = page_start + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
            mask = pos < ctx
            if window > 0:
                mask &= pos >= lo
            qk = jnp.where(mask, qk, NEG_INF)
            m_prev = m_ref[rows, :1]
            m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            probs = jnp.exp(qk - m_new)
            l_ref[rows, :1] = l_ref[rows, :1] * alpha + jnp.sum(
                probs, axis=-1, keepdims=True)
            m_ref[rows, :1] = m_new
            acc_ref[rows, :] = acc_ref[rows, :] * alpha + jax.lax.dot_general(
                probs.astype(v_blk.dtype), v_blk[h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(p == n_pages - 1)
    def _finish():
        for h in range(hkv):                         # static unroll
            rows = pl.ds(h * g, g)
            # the sink joins the denominator as one extra logit per head
            sink = sink_ref[h, 0].astype(jnp.float32)[:, None]
            m_fin = jnp.maximum(m_ref[rows, :1], sink)
            l_fin = l_ref[rows, :1] * jnp.exp(m_ref[rows, :1] - m_fin) + jnp.exp(
                sink - m_fin)
            o_ref[0, h] = (acc_ref[rows, :] * jnp.exp(m_ref[rows, :1] - m_fin)
                           / l_fin).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window_size", "q_head_num", "k_head_num", "interpret"),
)
def attention_sinks(
    query, k_cache, v_cache, sinks, block_tables, context_lens, scale,
    sliding_window_size: int, q_head_num: int, k_head_num: int, *,
    k_scale=None, v_scale=None, interpret=None,
):
    """Paged decode attention with sinks + sliding window (reference :90).

    Int8 K/V caches hold ``round(x / scale)`` levels (half the KV HBM traffic);
    ``k_scale``/``v_scale`` (scalar or per-kv-head [Hkv]) fold into q / the
    output on the host — the kernel only converts the int8 tiles.  The sink
    logit is untouched: folding k_scale into q keeps the score magnitudes
    physical, and V's scale multiplies after the (sink-weighted) normalize."""
    if interpret is None:
        interpret = interpret_default()
    s = query.shape[0]
    d = query.shape[-1] // q_head_num
    n_pages, hkv, page_size, _ = k_cache.shape
    dv = v_cache.shape[-1]
    assert hkv == k_head_num
    group = q_head_num // k_head_num
    group_p = max(8, -(-group // 8) * 8)
    qg = query.reshape(s, k_head_num, group, d)
    if k_cache.dtype == jnp.int8:
        qg = (qg.astype(jnp.float32) * _kv_head_scale(k_scale, hkv)[None]
              ).astype(query.dtype)
    sk = sinks.reshape(k_head_num, group)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))
        sk = jnp.pad(sk, ((0, 0), (0, group_p - group)))
    max_pages = block_tables.shape[1]
    if sliding_window_size > 0:
        n_pg = min(max_pages, -(-sliding_window_size // page_size) + 1)
    else:
        n_pg = max_pages

    def _kv_page(i, p, bt, cl):
        lo_page, hi_page = _decode_page_bounds(
            cl[i], window=sliding_window_size, page_size=page_size,
            max_pages=max_pages)
        return bt[i, jnp.minimum(lo_page + p, hi_page)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, n_pg),
        in_specs=[
            pl.BlockSpec((1, k_head_num, group_p, d),
                         lambda i, p, bt, cl: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # sinks laid out [Hkv, 1, group_p]: block == array (Mosaic requires
            # (8,128)-divisible or full-dim blocks)
            pl.BlockSpec((k_head_num, 1, group_p), lambda i, p, bt, cl: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_head_num, page_size, d),
                         lambda i, p, bt, cl: (_kv_page(i, p, bt, cl), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_head_num, page_size, dv),
                         lambda i, p, bt, cl: (_kv_page(i, p, bt, cl), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k_head_num, group_p, dv),
                               lambda i, p, bt, cl: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((k_head_num * group_p, dv), jnp.float32),
            pltpu.VMEM((k_head_num * group_p, 128), jnp.float32),
            pltpu.VMEM((k_head_num * group_p, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_sinks_kernel, scale=scale, page_size=page_size,
                          window=sliding_window_size, max_pages=max_pages,
                          hkv=k_head_num),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, k_head_num, group_p, dv), query.dtype),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), context_lens.astype(jnp.int32),
      qg, sk[:, None], k_cache, v_cache)
    out = out[:, :, :group]
    if v_cache.dtype == jnp.int8:
        out = (out.astype(jnp.float32) * _kv_head_scale(v_scale, hkv)[None]
               ).astype(query.dtype)
    return out.reshape(s, q_head_num * dv)


def pack_kv_sinks(cache):
    """[P, Hkv, pg, d] → [P, Hkv/2, pg, 2d]: two heads share one 128-lane row.

    XLA's HBM layout pads the minor dim to 128 lanes, so a d=64 cache wastes
    half its HBM footprint AND half its read bandwidth.  Packing head pairs
    side-by-side restores full-lane reads (see PERF.md, sinks decode)."""
    p, h, pg, d = cache.shape
    assert h % 2 == 0, "packed layout needs an even kv-head count"
    return cache.reshape(p, h // 2, 2, pg, d).swapaxes(2, 3).reshape(
        p, h // 2, pg, 2 * d)


def _sinks_packed_kernel(
    bt_ref, ctx_ref, q_ref, sink_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
    *, scale, page_size, window, max_pages, hkv2,
):
    """Packed twin of :func:`_sinks_kernel`: KV blocks are [hkv/2, page, 2d]
    (head pair per 128-lane row) and q rows are zero-interleaved — rows
    [0, gp) carry head 2j in lanes [0, d) (zeros elsewhere), rows [gp, 2gp)
    carry head 2j+1 in lanes [d, 2d).  One dot then yields both heads' scores
    (the zero half annihilates the other head), and the PV dot's valid output
    lanes are [0, d) for the top rows and [d, 2d) for the bottom rows."""
    i = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)
    ctx = ctx_ref[i]
    g2 = q_ref.shape[2]                              # 2 * gp

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    lo = ctx - window if window > 0 else 0
    lo_page, hi_page = _decode_page_bounds(
        ctx, window=window, page_size=page_size, max_pages=max_pages)
    page = jnp.minimum(lo_page + p, hi_page)         # must match the index maps
    page_start = page * page_size
    has_work = jnp.logical_and(
        lo_page + p <= hi_page,
        (page_start < ctx) & (page_start + page_size > lo),
    )

    @pl.when(has_work)
    def _step():
        k_blk, v_blk = k_ref[0], v_ref[0]
        if k_blk.dtype == jnp.int8:  # int8 KV cache: scale folded by the host
            k_blk = k_blk.astype(q_ref.dtype)
        if v_blk.dtype == jnp.int8:
            v_blk = v_blk.astype(q_ref.dtype)
        for j in range(hkv2):                        # static unroll (half of hkv)
            rows = pl.ds(j * g2, g2)
            qk = jax.lax.dot_general(
                q_ref[0, j], k_blk[j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            pos = page_start + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
            mask = pos < ctx
            if window > 0:
                mask &= pos >= lo
            qk = jnp.where(mask, qk, NEG_INF)
            m_prev = m_ref[rows, :1]
            m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
            alpha = jnp.exp(m_prev - m_new)
            probs = jnp.exp(qk - m_new)
            l_ref[rows, :1] = l_ref[rows, :1] * alpha + jnp.sum(
                probs, axis=-1, keepdims=True)
            m_ref[rows, :1] = m_new
            acc_ref[rows, :] = acc_ref[rows, :] * alpha + jax.lax.dot_general(
                probs.astype(v_blk.dtype), v_blk[j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(p == n_pages - 1)
    def _finish():
        for j in range(hkv2):                        # static unroll
            rows = pl.ds(j * g2, g2)
            sink = sink_ref[j, 0].astype(jnp.float32)[:, None]
            m_fin = jnp.maximum(m_ref[rows, :1], sink)
            l_fin = l_ref[rows, :1] * jnp.exp(m_ref[rows, :1] - m_fin) + jnp.exp(
                sink - m_fin)
            o_ref[0, j] = (acc_ref[rows, :] * jnp.exp(m_ref[rows, :1] - m_fin)
                           / l_fin).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "sliding_window_size", "q_head_num", "k_head_num",
                     "interpret", "impl"),
)
def attention_sinks_packed(
    query, k_packed, v_packed, sinks, block_tables, context_lens, scale,
    sliding_window_size: int, q_head_num: int, k_head_num: int, *,
    k_scale=None, v_scale=None, interpret=None, impl: str = "flat",
):
    """Paged sinks decode over the PACKED cache (``pack_kv_sinks`` layout).

    Same semantics as :func:`attention_sinks`, but KV rides 128-lane-full
    blocks — half the HBM traffic at d=64 (GPT-OSS shapes).  Int8 packed
    caches compose (quarter traffic at d=64): per-ORIGINAL-kv-head scales fold
    into q before the zero-interleave pack / into the unpacked output.

    ``impl``: ``"flat"`` (default) = the flat-pipeline manual-DMA kernel
    (`ops/attention/sinks_flat.py` — one wide score dot per packed head over a
    G-page super-block, 755 GB/s-class streaming); ``"blockspec"`` = the
    (token, page)-grid kernel kept for comparison benches."""
    if interpret is None:
        interpret = interpret_default()
    s = query.shape[0]
    d = query.shape[-1] // q_head_num
    n_pages, hkv2, page_size, d2 = k_packed.shape
    assert d2 == 2 * d and 2 * hkv2 == k_head_num
    dv = v_packed.shape[-1] // 2
    group = q_head_num // k_head_num
    group_p = max(8, -(-group // 8) * 8)
    qg = query.reshape(s, k_head_num, group, d)
    if k_packed.dtype == jnp.int8:
        qg = (qg.astype(jnp.float32) * _kv_head_scale(k_scale, k_head_num)[None]
              ).astype(query.dtype)
    sk = sinks.reshape(k_head_num, group)
    if group_p != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_p - group), (0, 0)))
        sk = jnp.pad(sk, ((0, 0), (0, group_p - group)))
    # zero-interleaved packed queries: [s, hkv/2, 2*gp, 2d] (shared helper —
    # one definition of the lane-packing convention for decode AND prefill)
    q2, _ = _pack_queries(qg.reshape(s, k_head_num * group_p * d),
                          k_head_num * group_p, k_head_num, d)
    sk2 = jnp.concatenate([sk[0::2], sk[1::2]], axis=-1)[:, None, :]  # [hkv2,1,2gp]
    max_pages = block_tables.shape[1]

    if impl == "flat" and (interpret or (page_size % 8 == 0 and d2 % 128 == 0
                                         and 2 * dv % 128 == 0)):
        from sgl_kernel_npu_tpu.ops.attention.sinks_flat import (
            sinks_packed_flat_call,
        )

        out = sinks_packed_flat_call(
            q2, sk2, k_packed, v_packed, block_tables, context_lens,
            scale=scale, sliding_window_size=sliding_window_size,
            interpret=interpret)
        o = _unpack_outputs(out, s, k_head_num, group_p, dv).reshape(
            s, k_head_num, group_p, dv)[:, :, :group]
        if v_packed.dtype == jnp.int8:
            o = (o.astype(jnp.float32)
                 * _kv_head_scale(v_scale, k_head_num)[None]).astype(query.dtype)
        return o.reshape(s, q_head_num * dv)

    if sliding_window_size > 0:
        n_pg = min(max_pages, -(-sliding_window_size // page_size) + 1)
    else:
        n_pg = max_pages

    def _kv_page(i, p, bt, cl):
        lo_page, hi_page = _decode_page_bounds(
            cl[i], window=sliding_window_size, page_size=page_size,
            max_pages=max_pages)
        return bt[i, jnp.minimum(lo_page + p, hi_page)]

    g2 = 2 * group_p
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, n_pg),
        in_specs=[
            pl.BlockSpec((1, hkv2, g2, d2), lambda i, p, bt, cl: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv2, 1, g2), lambda i, p, bt, cl: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv2, page_size, d2),
                         lambda i, p, bt, cl: (_kv_page(i, p, bt, cl), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv2, page_size, 2 * dv),
                         lambda i, p, bt, cl: (_kv_page(i, p, bt, cl), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hkv2, g2, 2 * dv),
                               lambda i, p, bt, cl: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hkv2 * g2, 2 * dv), jnp.float32),
            pltpu.VMEM((hkv2 * g2, 128), jnp.float32),
            pltpu.VMEM((hkv2 * g2, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_sinks_packed_kernel, scale=scale, page_size=page_size,
                          window=sliding_window_size, max_pages=max_pages,
                          hkv2=hkv2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hkv2, g2, 2 * dv), query.dtype),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), context_lens.astype(jnp.int32),
      q2, sk2, k_packed, v_packed)
    # de-interleave via the shared helper, then drop the group padding
    o = _unpack_outputs(out, s, k_head_num, group_p, dv).reshape(
        s, k_head_num, group_p, dv)
    o = o[:, :, :group]
    if v_packed.dtype == jnp.int8:
        o = (o.astype(jnp.float32) * _kv_head_scale(v_scale, k_head_num)[None]
             ).astype(query.dtype)
    return o.reshape(s, q_head_num * dv)


def _pack_queries(query, hq, hkv, d):
    """[S, hq·d] → ([S, hkv/2, 2g, 2d] zero-interleaved, helper dims).

    Rows [0, g) carry head 2j in lanes [0, d), rows [g, 2g) carry head 2j+1 in
    lanes [d, 2d): one dot against a packed KV row then yields both heads'
    scores (the zero half annihilates the other head)."""
    s = query.shape[0]
    g = hq // hkv
    qg = query.reshape(s, hkv, g, d)
    qa, qb = qg[:, 0::2], qg[:, 1::2]
    q2 = jnp.concatenate([
        jnp.concatenate([qa, jnp.zeros_like(qa)], -1),
        jnp.concatenate([jnp.zeros_like(qb), qb], -1),
    ], axis=2)
    return q2, g


def _unpack_outputs(out2, s, hkv, g, dv):
    """Inverse of the zero-interleave: [S, hkv/2, 2g, 2dv] → [S, hq·dv]."""
    oa = out2[:, :, :g, :dv]
    ob = out2[:, :, g:, dv:]
    return jnp.stack([oa, ob], axis=2).reshape(s, hkv * g * dv)


def attention_sinks_prefill_packed(
    query, k_packed, v_packed, sinks, seq_lens, block_tables, context_lens,
    scale, sliding_window_size: int, q_head_num: int, k_head_num: int,
    k_scale=None, v_scale=None, **kw,
):
    """Varlen prefill over the PACKED cache (``pack_kv_sinks`` layout).

    The packed cache IS a GQA problem with ``hkv/2`` kv-heads of dim ``2d``;
    zero-interleaved queries (group ``2g``) make the existing prefill kernel
    compute both heads of each pair from one 128-lane-full KV block — no new
    kernel, half the HBM traffic at d=64.  Int8 packed caches compose: the
    per-ORIGINAL-kv-head scales fold here (before the pack / after the
    unpack), so the inner call sees plain int8 tiles with scale 1."""
    s = query.shape[0]
    d = query.shape[-1] // q_head_num
    hkv2 = k_head_num // 2
    if k_packed.dtype == jnp.int8:
        g0 = q_head_num // k_head_num
        qs = query.reshape(s, k_head_num, g0, d).astype(jnp.float32)
        qs = qs * _kv_head_scale(k_scale, k_head_num)[None]
        query = qs.astype(query.dtype).reshape(s, -1)
    q2, g = _pack_queries(query, q_head_num, k_head_num, d)
    if sinks is not None:
        sk = sinks.reshape(k_head_num, g)
        sinks = jnp.concatenate([sk[0::2], sk[1::2]], axis=-1).reshape(-1)
    out2 = attention_sinks_prefill_pallas(
        q2.reshape(s, -1), k_packed, v_packed, sinks, seq_lens, block_tables,
        context_lens, scale, sliding_window_size, hkv2 * 2 * g, hkv2, **kw)
    dv = v_packed.shape[-1] // 2
    out = _unpack_outputs(out2.reshape(s, hkv2, 2 * g, 2 * dv), s, k_head_num, g, dv)
    if v_packed.dtype == jnp.int8:
        o = out.reshape(s, k_head_num, g, dv).astype(jnp.float32)
        o = o * _kv_head_scale(v_scale, k_head_num)[None]
        out = o.astype(out.dtype).reshape(s, k_head_num * g * dv)
    return out


def _prefill_page_bounds(seq_len, ctx, qc, *, cq, window, page_size, max_pages):
    """[lo_page, hi_page] of KV pages visible to q-chunk ``qc`` of a request.

    Chunk rows occupy absolute positions [ctx−seq+qc·cq, ctx−seq+(qc+1)·cq) ∩
    [·, ctx); causal hi = last visible position, window lo = first.  Grid steps
    outside the range clamp to ``hi_page`` so Pallas re-uses the already-resident
    block (no DMA) and the kernel skips their compute.
    """
    start = ctx - seq_len + qc * cq
    hi_pos = jnp.minimum(ctx - seq_len + (qc + 1) * cq, ctx)  # exclusive
    hi_page = jnp.clip((hi_pos - 1) // page_size, 0, max_pages - 1)
    lo_pos = jnp.maximum(start - (window - 1), 0) if window > 0 else 0
    lo_page = jnp.clip(jnp.minimum(lo_pos // page_size, hi_page), 0, max_pages - 1)
    return lo_page, hi_page


def _sinks_prefill_kernel(
    seq_lens_ref,    # [B] new-token counts
    ctx_lens_ref,    # [B] total lengths (incl. new tokens)
    bt_ref,          # [B, max_pages]
    q_ref,           # [1, 1, CQ, G, D] dense-padded queries
    sink_ref,        # [1, 1, G]
    k_ref,           # [1, 1, page, D]
    v_ref,           # [1, 1, page, Dv]
    o_ref,           # [1, 1, CQ, G, Dv]
    acc_ref, m_ref, l_ref,
    *,
    scale,
    page_size,
    window,
    max_pages,
):
    b = pl.program_id(0)
    qc = pl.program_id(2)
    pc = pl.program_id(3)
    n_pages = pl.num_programs(3)
    cq, g, dk = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    rows = cq * g

    seq_len = seq_lens_ref[b]
    ctx = ctx_lens_ref[b]

    @pl.when(pc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    # absolute causal position of each q row (rows are (token, head-in-group))
    tok = qc * cq + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // g
    qpos = ctx - seq_len + tok                       # [rows, 1]
    row_live = tok < seq_len
    lo_page, hi_page = _prefill_page_bounds(
        seq_len, ctx, qc, cq=cq, window=window, page_size=page_size,
        max_pages=max_pages,
    )
    page = jnp.minimum(lo_page + pc, hi_page)        # must match the index maps
    page_lo = page * page_size
    chunk_has_work = jnp.logical_and(qc * cq < seq_len, lo_page + pc <= hi_page)

    @pl.when(chunk_has_work)
    def _step():
        q = q_ref[0, 0].reshape(rows, dk)            # merge leading dims only
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        if k.dtype == jnp.int8:   # int8 KV cache: scale folded by the host
            k = k.astype(q.dtype)
        if v.dtype == jnp.int8:
            v = v.astype(q.dtype)
        qk = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        kpos = page_lo + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        mask = jnp.logical_and(kpos <= qpos, row_live)
        if window > 0:
            mask = jnp.logical_and(mask, kpos > qpos - window)
        qk = jnp.where(mask, qk, NEG_INF)
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

    @pl.when(pc == n_pages - 1)
    def _finish():
        if sink_ref is None:          # plain varlen flash prefill (no sink logit)
            out = acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)
        else:
            # per-row sink logit: row (token, g) uses sinks[g]
            rowg = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % g
            sink = jnp.zeros((rows, 1), jnp.float32)
            for gi in range(g):
                sink = jnp.where(rowg == gi, sink_ref[0, 0, gi], sink)
            m_fin = jnp.maximum(m_ref[:, :1], sink)
            l_fin = l_ref[:, :1] * jnp.exp(m_ref[:, :1] - m_fin) + jnp.exp(sink - m_fin)
            out = acc_ref[...] * jnp.exp(m_ref[:, :1] - m_fin) / jnp.maximum(l_fin, 1e-30)
        out = jnp.where(row_live, out, 0.0)
        o_ref[0, 0] = out.reshape(cq, g, -1).astype(o_ref.dtype)


def attention_sinks_prefill_pallas(
    query, k_cache, v_cache, sinks, seq_lens, block_tables, context_lens, scale,
    sliding_window_size: int, q_head_num: int, k_head_num: int,
    *, max_q: int | None = None, q_chunk: int = 128,
    k_scale=None, v_scale=None, interpret=None,
):
    """Pallas varlen prefill with sinks + sliding window — the device-kernel
    counterpart of :func:`attention_sinks_prefill` (the reference ships this as
    ``attention_sinks_prefill_triton:241``; here a flash kernel over a
    ``(batch, kv-head, q-chunk, kv-page)`` grid with the online-softmax state
    carried across the page dim).

    ``max_q``: static bound on per-request new-token counts (defaults to the
    packed total — correct but wasteful; callers should pass their bound).
    Packed rows are scattered to a dense ``[B, max_q]`` layout, the kernel runs
    regular, and outputs gather back to packed rows.

    ``sinks=None`` runs plain varlen flash prefill (no sink logit) — the general
    paged causal prefill kernel for GQA models without sinks.
    """
    if interpret is None:
        interpret = interpret_default()
    s = query.shape[0]
    d = query.shape[-1] // q_head_num
    dv = v_cache.shape[-1]
    bsz = seq_lens.shape[0]
    n_pages_total, hkv, page_size, _ = k_cache.shape
    assert hkv == k_head_num
    group = q_head_num // k_head_num
    max_q = max_q or s
    cq = min(q_chunk, max(8, max_q))
    max_q = -(-max_q // cq) * cq                       # pad to chunk multiple

    ends = jnp.cumsum(seq_lens.astype(jnp.int32))
    req = jnp.clip(jnp.searchsorted(ends, jnp.arange(s), side="right"), 0, bsz - 1)
    j = jnp.arange(s) - (ends[req] - seq_lens[req])
    qg = query.reshape(s, k_head_num, group, d)
    if k_cache.dtype == jnp.int8:   # int8 cache: fold the dequant scale into q
        qg = (qg.astype(jnp.float32) * _kv_head_scale(k_scale, hkv)[None]
              ).astype(query.dtype)
    qd = (
        jnp.zeros((bsz, max_q, k_head_num, group, d), query.dtype)
        .at[req, j]
        .set(qg, mode="drop")
        .transpose(0, 2, 1, 3, 4)                      # [B, Hkv, max_q, G, D]
    )
    max_pages = block_tables.shape[1]
    if sliding_window_size > 0:
        # pages spanned by [first-row window lo, last-row causal hi): the visible
        # range is ≤ (cq−1)+window long → bounded page count, O(window) not O(seq)
        n_pg = min(max_pages, -(-(cq + sliding_window_size - 1) // page_size) + 1)
    else:
        n_pg = max_pages

    def _kv_page(b, qc, pc, sl, cl, bt):
        lo_page, hi_page = _prefill_page_bounds(
            sl[b], cl[b], qc, cq=cq, window=sliding_window_size,
            page_size=page_size, max_pages=max_pages,
        )
        return bt[b, jnp.minimum(lo_page + pc, hi_page)]

    sink_specs = [] if sinks is None else [
        pl.BlockSpec(
            (1, 1, group),
            lambda b, h, qc, pc, sl, cl, bt: (h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bsz, k_head_num, max_q // cq, n_pg),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cq, group, d),
                lambda b, h, qc, pc, sl, cl, bt: (b, h, qc, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            *sink_specs,
            pl.BlockSpec(
                (1, 1, page_size, d),
                lambda b, h, qc, pc, sl, cl, bt: (_kv_page(b, qc, pc, sl, cl, bt), h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, page_size, dv),
                lambda b, h, qc, pc, sl, cl, bt: (_kv_page(b, qc, pc, sl, cl, bt), h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, cq, group, dv),
            lambda b, h, qc, pc, sl, cl, bt: (b, h, qc, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((cq * group, dv), jnp.float32),
            pltpu.VMEM((cq * group, 128), jnp.float32),
            pltpu.VMEM((cq * group, 128), jnp.float32),
        ],
    )
    body = functools.partial(
        _sinks_prefill_kernel, scale=scale, page_size=page_size,
        window=sliding_window_size, max_pages=max_pages,
    )
    if sinks is None:
        kernel = lambda sl, cl, bt, q, k, v, o, acc, m, l: body(
            sl, cl, bt, q, None, k, v, o, acc, m, l)
        sink_args = ()
    else:
        kernel = body
        sink_args = (sinks.astype(jnp.float32).reshape(k_head_num, 1, group),)
    od = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bsz, k_head_num, max_q, group, dv), query.dtype
        ),
        interpret=interpret,
    )(
        seq_lens.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        block_tables.astype(jnp.int32),
        qd,
        *sink_args,
        k_cache,
        v_cache,
    )
    out = od.transpose(0, 2, 1, 3, 4)[req, j]          # [S, Hkv, G, Dv]
    if v_cache.dtype == jnp.int8:
        out = (out.astype(jnp.float32) * _kv_head_scale(v_scale, hkv)[None]
               ).astype(query.dtype)
    return out.reshape(s, q_head_num * dv)


def attention_sinks_prefill(
    query, k_cache, v_cache, sinks, seq_lens, block_tables, context_lens, scale,
    sliding_window_size: int, q_head_num: int, k_head_num: int,
    k_scale=None, v_scale=None,
):
    """Varlen prefill with sinks (reference :241): query rows are the concatenation
    of each request's last ``seq_lens[b]`` positions; token j of request b attends
    causally to cache positions ≤ context_len − seq_len + j (window applies)."""
    s = query.shape[0]
    d = query.shape[-1] // q_head_num
    dv = v_cache.shape[-1]
    bsz = seq_lens.shape[0]
    max_len = int(block_tables.shape[1] * k_cache.shape[2])
    ends = jnp.cumsum(seq_lens.astype(jnp.int32))
    req = jnp.clip(jnp.searchsorted(ends, jnp.arange(s), side="right"), 0, bsz - 1)
    j = jnp.arange(s) - (ends[req] - seq_lens[req])            # position within request
    qpos = context_lens[req] - seq_lens[req] + j               # absolute causal position

    q = query.reshape(s, k_head_num, q_head_num // k_head_num, d).astype(jnp.float32)
    k = _gather_pages(k_cache, block_tables, max_len).astype(jnp.float32)[req]
    v = _gather_pages(v_cache, block_tables, max_len).astype(jnp.float32)[req]
    if k_cache.dtype == jnp.int8:
        k = k * _kv_head_scale(k_scale, k_head_num)[None]
    if v_cache.dtype == jnp.int8:
        v = v * _kv_head_scale(v_scale, k_head_num)[None]
    logits = jnp.einsum("skgd,skld->skgl", q, k) * scale
    pos = jnp.arange(max_len)[None, None, None, :]
    hi = (qpos + 1)[:, None, None, None]
    mask = pos < hi
    if sliding_window_size > 0:
        mask &= pos >= hi - sliding_window_size
    logits = jnp.where(mask, logits, NEG_INF)
    group = q_head_num // k_head_num
    if sinks is None:
        p = jax.nn.softmax(logits, axis=-1)
    else:
        sink = sinks.astype(jnp.float32).reshape(k_head_num, group)[None, :, :, None]
        all_logits = jnp.concatenate(
            [logits, jnp.broadcast_to(sink, (s, k_head_num, group, 1))], -1
        )
        p = jax.nn.softmax(all_logits, axis=-1)[..., :-1]
    out = jnp.einsum("skgl,skld->skgd", p, v)
    return out.reshape(s, q_head_num * dv).astype(query.dtype)
