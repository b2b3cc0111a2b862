"""Varlen MLA prefill attention over the paged latent cache (Pallas).

The reference ships only MLA *decode* (attention/decode_attention.py:166) and
leaves prefill attention to its consumer; a complete serving path needs the
prefill twin, so this module provides it (beyond-reference, same family as
``attention_sinks_prefill_pallas``).

Math is decode_mla's, row-causal: absorbed queries q_nope [S, H, 512] ‖ q_pe
[S, H, 64] attend to the latent cache (k_nope [pages, 1, page, 512] + transposed
rope cache k_rope [pages, 1, 64, page]); V aliases K_nope.  Token j of request b
sees cache positions ≤ context_len − seq_len + j.  Flash kernel over a
``(batch, q-chunk, kv-page)`` grid with causal page pruning (clamped index maps
dedup the DMA — see sinks_attention._prefill_page_bounds).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.attention.decode_attention import NEG_INF, _gather_pages
from sgl_kernel_npu_tpu.ops.attention.sinks_attention import _prefill_page_bounds
from sgl_kernel_npu_tpu.utils.common import interpret_default


def mla_prefill_ref(
    q, k_nope_buffer, k_rope_buffer, seq_lens, block_tables, context_lens, sm_scale,
    k_scale=None,
):
    """Golden varlen causal MLA prefill. q [S, H, 576] → [S, H, 512].  An int8
    ``k_nope_buffer`` holds ``round(k / k_scale)`` levels (int8_nzcache mode)."""
    s, h, _ = q.shape
    d_nope = k_nope_buffer.shape[-1]
    bsz = seq_lens.shape[0]
    max_len = int(block_tables.shape[1] * k_nope_buffer.shape[2])
    ends = jnp.cumsum(seq_lens.astype(jnp.int32))
    req = jnp.clip(jnp.searchsorted(ends, jnp.arange(s), side="right"), 0, bsz - 1)
    j = jnp.arange(s) - (ends[req] - seq_lens[req])
    qpos = context_lens[req] - seq_lens[req] + j

    q_nope, q_pe = q[..., :d_nope], q[..., d_nope:]
    kn = _gather_pages(k_nope_buffer, block_tables, max_len)[:, 0][req]  # [S, L, 512]
    kr = _gather_pages(
        k_rope_buffer.swapaxes(-1, -2), block_tables, max_len)[:, 0][req]
    kn = kn.astype(jnp.float32)
    if k_nope_buffer.dtype == jnp.int8:
        kn = kn * jnp.float32(1.0 if k_scale is None else k_scale)
    qk = jnp.einsum("shd,sld->shl", q_nope.astype(jnp.float32), kn)
    qk += jnp.einsum("shd,sld->shl", q_pe.astype(jnp.float32), kr.astype(jnp.float32))
    qk *= sm_scale
    mask = jnp.arange(max_len)[None, None, :] <= qpos[:, None, None]
    qk = jnp.where(mask, qk, NEG_INF)
    p = jax.nn.softmax(qk, axis=-1)
    out = jnp.einsum("shl,sld->shd", p, kn)
    return out.astype(q.dtype)


def _mla_prefill_kernel(
    seq_lens_ref,    # [B]
    ctx_lens_ref,    # [B]
    bt_ref,          # [B, max_pages]
    qn_ref,          # [1, CQ, H, 512]
    qp_ref,          # [1, CQ, H, 64]
    kn_ref,          # [1, 1, page, 512]
    kr_ref,          # [1, 1, 64, page]
    o_ref,           # [1, CQ, H, 512]
    acc_ref, m_ref, l_ref,
    *,
    sm_scale,
    page_size,
    max_pages,
):
    b = pl.program_id(0)
    qc = pl.program_id(1)
    pc = pl.program_id(2)
    n_pg = pl.num_programs(2)
    cq, h = qn_ref.shape[1], qn_ref.shape[2]
    rows = cq * h
    dn = qn_ref.shape[3]

    seq_len = seq_lens_ref[b]
    ctx = ctx_lens_ref[b]

    @pl.when(pc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    tok = qc * cq + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // h
    qpos = ctx - seq_len + tok
    row_live = tok < seq_len
    lo_page, hi_page = _prefill_page_bounds(
        seq_len, ctx, qc, cq=cq, window=0, page_size=page_size, max_pages=max_pages)
    page = jnp.minimum(lo_page + pc, hi_page)        # must match the index maps
    page_lo = page * page_size
    has_work = jnp.logical_and(qc * cq < seq_len, lo_page + pc <= hi_page)

    @pl.when(has_work)
    def _step():
        qn = qn_ref[0].reshape(rows, dn)
        qp = qp_ref[0].reshape(rows, qp_ref.shape[3])
        kn = kn_ref[0, 0]                            # [page, 512]
        if kn.dtype == jnp.int8:  # int8 latent cache: scale folded by the host
            kn = kn.astype(qn_ref.dtype)
        kr = kr_ref[0, 0]                            # [64, page]
        qk = jax.lax.dot_general(
            qn, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        qk += jax.lax.dot_general(
            qp, kr, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        qk *= sm_scale
        kpos = page_lo + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        qk = jnp.where(jnp.logical_and(kpos <= qpos, row_live), qk, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        probs = jnp.exp(qk - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(probs, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            probs.astype(kn.dtype), kn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pc == n_pg - 1)
    def _finish():
        out = acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)
        out = jnp.where(row_live, out, 0.0)
        o_ref[0] = out.reshape(cq, h, dn).astype(o_ref.dtype)


def mla_prefill_pallas(
    q, k_nope_buffer, k_rope_buffer, seq_lens, block_tables, context_lens, sm_scale,
    *, max_q: int | None = None, q_chunk: int = 64, k_scale=None, interpret=None,
):
    """Varlen paged MLA prefill: q [S, H, 576] (absorbed nope ‖ rope) → [S, H, 512].

    ``max_q``: static per-request new-token bound (defaults to the packed total).
    ``k_scale``: dequant scale when ``k_nope_buffer`` is int8 (int8_nzcache);
    folded into q / the output on the host, like :func:`decode_mla`.
    """
    if interpret is None:
        interpret = interpret_default()
    s, h, _ = q.shape
    dn = k_nope_buffer.shape[-1]
    dr = k_rope_buffer.shape[-2]
    bsz = seq_lens.shape[0]
    _, _, page_size, _ = k_nope_buffer.shape
    max_q = max_q or s
    cq = min(q_chunk, max(8, max_q))
    max_q = -(-max_q // cq) * cq
    max_pages = block_tables.shape[1]

    ends = jnp.cumsum(seq_lens.astype(jnp.int32))
    req = jnp.clip(jnp.searchsorted(ends, jnp.arange(s), side="right"), 0, bsz - 1)
    j = jnp.arange(s) - (ends[req] - seq_lens[req])
    qd = (
        jnp.zeros((bsz, max_q, h, q.shape[-1]), q.dtype)
        .at[req, j]
        .set(q, mode="drop")
    )
    qn, qp = qd[..., :dn], qd[..., dn:]
    is_int8 = k_nope_buffer.dtype == jnp.int8
    ks = jnp.float32(1.0 if k_scale is None else k_scale) if is_int8 else None
    if is_int8:
        qn = (qn.astype(jnp.float32) * ks).astype(qd.dtype)

    def _kv_page(b, qc, pc, sl, cl, bt):
        lo_page, hi_page = _prefill_page_bounds(
            sl[b], cl[b], qc, cq=cq, window=0, page_size=page_size,
            max_pages=max_pages)
        return bt[b, jnp.minimum(lo_page + pc, hi_page)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bsz, max_q // cq, max_pages),
        in_specs=[
            pl.BlockSpec((1, cq, h, dn), lambda b, qc, pc, sl, cl, bt: (b, qc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cq, h, dr), lambda b, qc, pc, sl, cl, bt: (b, qc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page_size, dn),
                         lambda b, qc, pc, sl, cl, bt: (_kv_page(b, qc, pc, sl, cl, bt), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dr, page_size),
                         lambda b, qc, pc, sl, cl, bt: (_kv_page(b, qc, pc, sl, cl, bt), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cq, h, dn), lambda b, qc, pc, sl, cl, bt: (b, qc, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cq * h, dn), jnp.float32),
            pltpu.VMEM((cq * h, 128), jnp.float32),
            pltpu.VMEM((cq * h, 128), jnp.float32),
        ],
    )
    od = pl.pallas_call(
        functools.partial(_mla_prefill_kernel, sm_scale=sm_scale,
                          page_size=page_size, max_pages=max_pages),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, max_q, h, dn), q.dtype),
        interpret=interpret,
    )(
        seq_lens.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        block_tables.astype(jnp.int32),
        qn,
        qp,
        k_nope_buffer,
        k_rope_buffer,
    )
    out = od[req, j]
    if is_int8:
        out = (out.astype(jnp.float32) * ks).astype(q.dtype)
    return out


# ---------------------------------------------------------------------------
# DSA block-sparse prefill: indexer-pruned page walk
# ---------------------------------------------------------------------------

def _mla_prefill_pruned_kernel(
    seq_lens_ref,    # [B]
    ctx_lens_ref,    # [B]
    bt_sel_ref,      # [B, QC, P] selected page-pool ids (dead -> 0)
    pos_sel_ref,     # [B, QC, P] selected page index within the sequence (-1 dead)
    qn_ref,          # [1, CQ, H, 512]
    qp_ref,          # [1, CQ, H, 64]
    kn_ref,          # [1, 1, page, 512]
    kr_ref,          # [1, 1, 64, page]
    o_ref,           # [1, CQ, H, 512]
    acc_ref, m_ref, l_ref,
    *,
    sm_scale,
    page_size,
):
    """Flash accumulation over ONLY the indexer-selected pages of each
    (request, q-chunk) — the prefill twin of ``decode_mla_block_sparse``
    (DeepSeek-V3.2 DSA page-granular relaxation).  Causal masking uses the
    selected page's absolute position, so selection order is irrelevant."""
    b = pl.program_id(0)
    qc = pl.program_id(1)
    pc = pl.program_id(2)
    n_pg = pl.num_programs(2)
    cq, h = qn_ref.shape[1], qn_ref.shape[2]
    rows = cq * h
    dn = qn_ref.shape[3]

    seq_len = seq_lens_ref[b]
    ctx = ctx_lens_ref[b]
    page_pos = pos_sel_ref[b, qc, pc]

    @pl.when(pc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    tok = qc * cq + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // h
    qpos = ctx - seq_len + tok
    row_live = tok < seq_len
    has_work = jnp.logical_and(qc * cq < seq_len, page_pos >= 0)
    page_lo = page_pos * page_size

    @pl.when(has_work)
    def _step():
        qn = qn_ref[0].reshape(rows, dn)
        qp = qp_ref[0].reshape(rows, qp_ref.shape[3])
        kn = kn_ref[0, 0]
        if kn.dtype == jnp.int8:  # int8 latent cache: scale folded by the host
            kn = kn.astype(qn_ref.dtype)
        kr = kr_ref[0, 0]
        qk = jax.lax.dot_general(
            qn, kn, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        qk += jax.lax.dot_general(
            qp, kr, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        qk *= sm_scale
        kpos = page_lo + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        qk = jnp.where(jnp.logical_and(kpos <= qpos, row_live), qk, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        probs = jnp.exp(qk - m_new)
        l_ref[:, :1] = l_ref[:, :1] * alpha + jnp.sum(probs, axis=-1, keepdims=True)
        m_ref[:, :1] = m_new
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            probs.astype(kn.dtype), kn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pc == n_pg - 1)
    def _finish():
        out = acc_ref[...] / jnp.maximum(l_ref[:, :1], 1e-30)
        out = jnp.where(row_live, out, 0.0)
        o_ref[0] = out.reshape(cq, h, dn).astype(o_ref.dtype)


def select_prefill_pages(
    page_scores, seq_lens, context_lens, *, cq: int, page_size: int, num_sel: int
):
    """Per-(request, q-chunk) top pages from page-aggregated indexer scores.

    ``page_scores [B, max_q, max_pages]``: per-token per-page score (−inf at
    causally dead positions — e.g. token scores from
    ``lightning_indexer_scores_prefill_pallas`` max-reduced over each page).
    Each chunk's LAST causal page is force-included (local attention always
    survives pruning).  Returns ``pos_sel [B, QC, num_sel]`` page indices
    within the sequence, −1 = dead slot.
    """
    b, max_q, max_pages = page_scores.shape
    qcn = -(-max_q // cq)
    if max_q % cq:
        page_scores = jnp.pad(
            page_scores, ((0, 0), (0, qcn * cq - max_q), (0, 0)),
            constant_values=NEG_INF)
    cs = page_scores.reshape(b, qcn, cq, max_pages).max(axis=2)  # [B, QC, pages]
    qc_idx = jnp.arange(qcn, dtype=jnp.int32)
    live_chunk = qc_idx[None, :] * cq < seq_lens[:, None]
    qhi = jnp.minimum((qc_idx[None, :] + 1) * cq, seq_lens[:, None]) - 1
    hi_page = jnp.clip(
        (context_lens[:, None] - seq_lens[:, None] + qhi) // page_size,
        0, max_pages - 1)
    b_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
    cs = cs.at[b_idx, qc_idx[None, :], hi_page].set(
        jnp.where(live_chunk, jnp.float32(3e38), NEG_INF))
    vals, pos = jax.lax.top_k(cs, num_sel)                       # [B, QC, P]
    return jnp.where(vals > NEG_INF, pos, -1).astype(jnp.int32)


def mla_prefill_block_sparse(
    q, k_nope_buffer, k_rope_buffer, seq_lens, block_tables, context_lens,
    sm_scale, pos_sel,
    *, max_q: int | None = None, q_chunk: int = 64, k_scale=None, interpret=None,
):
    """Block-sparse varlen paged MLA prefill over indexer-selected pages.

    Same contract as :func:`mla_prefill_pallas` plus ``pos_sel [B, QC, P]``
    from :func:`select_prefill_pages` (QC must match this function's chunking:
    ``ceil(max_q_padded / q_chunk)``).  Work and HBM reads are O(P) per chunk
    instead of O(context) — the prefill twin of the page-granular DSA decode
    (reference ships indexer kernels for exactly this, SGLang drives them)."""
    if interpret is None:
        interpret = interpret_default()
    s, h, _ = q.shape
    dn = k_nope_buffer.shape[-1]
    dr = k_rope_buffer.shape[-2]
    bsz = seq_lens.shape[0]
    _, _, page_size, _ = k_nope_buffer.shape
    max_q = max_q or s
    cq = min(q_chunk, max(8, max_q))
    max_q = -(-max_q // cq) * cq
    num_sel = pos_sel.shape[-1]
    assert pos_sel.shape[1] == max_q // cq, (pos_sel.shape, max_q, cq)

    ends = jnp.cumsum(seq_lens.astype(jnp.int32))
    req = jnp.clip(jnp.searchsorted(ends, jnp.arange(s), side="right"), 0, bsz - 1)
    j = jnp.arange(s) - (ends[req] - seq_lens[req])
    qd = (
        jnp.zeros((bsz, max_q, h, q.shape[-1]), q.dtype)
        .at[req, j]
        .set(q, mode="drop")
    )
    qn, qp = qd[..., :dn], qd[..., dn:]
    is_int8 = k_nope_buffer.dtype == jnp.int8
    ks = jnp.float32(1.0 if k_scale is None else k_scale) if is_int8 else None
    if is_int8:
        qn = (qn.astype(jnp.float32) * ks).astype(qd.dtype)
    # selected page-pool ids (dead -> page 0; masked in-kernel by pos_sel < 0)
    bt_sel = jnp.take_along_axis(
        block_tables[:, None, :].astype(jnp.int32),
        jnp.maximum(pos_sel, 0).astype(jnp.int32), axis=2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(bsz, max_q // cq, num_sel),
        in_specs=[
            pl.BlockSpec((1, cq, h, dn),
                         lambda b, qc, pc, sl, cl, bts, pss: (b, qc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cq, h, dr),
                         lambda b, qc, pc, sl, cl, bts, pss: (b, qc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page_size, dn),
                         lambda b, qc, pc, sl, cl, bts, pss: (bts[b, qc, pc], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dr, page_size),
                         lambda b, qc, pc, sl, cl, bts, pss: (bts[b, qc, pc], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cq, h, dn),
                               lambda b, qc, pc, sl, cl, bts, pss: (b, qc, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cq * h, dn), jnp.float32),
            pltpu.VMEM((cq * h, 128), jnp.float32),
            pltpu.VMEM((cq * h, 128), jnp.float32),
        ],
    )
    od = pl.pallas_call(
        functools.partial(_mla_prefill_pruned_kernel, sm_scale=sm_scale,
                          page_size=page_size),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, max_q, h, dn), q.dtype),
        interpret=interpret,
    )(
        seq_lens.astype(jnp.int32),
        context_lens.astype(jnp.int32),
        bt_sel,
        pos_sel.astype(jnp.int32),
        qn,
        qp,
        k_nope_buffer,
        k_rope_buffer,
    )
    out = od[req, j]
    if is_int8:
        out = (out.astype(jnp.float32) * ks).astype(q.dtype)
    return out
