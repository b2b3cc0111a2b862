"""Lightning indexer — DeepSeek-V3.2 sparse-attention top-k index selection.

Capability parity with reference ``torch.ops.npu.lightning_indexer``
(csrc/lightning_indexer; golden tests/python/sgl_kernel_npu/
test_lightning_indexer.py:37): per query token, score every cached key as
``Σ_heads w[t,h] · relu(q[t,h] · k[pos])``, apply causal masking (sparse_mode=3:
queries right-aligned to the key sequence), and return the indices of the
``sparse_count`` best keys in descending score order, padded with −1.

TPU design: the scoring is one batched MXU matmul + ReLU + weighted head reduction,
and the selection is ``jax.lax.top_k`` — both native XLA super-ops; the reference's
cube/vector service split (LIPreload) is Ascend scheduling detail with no TPU
analogue needed.

Prefill scoring runs as a paged Pallas kernel (``_li_prefill_kernel``): a
``(request, q-chunk, kv-page)`` flash-style page walk with causal page pruning
(the mla_prefill pattern) that reads each key page from HBM once per q-chunk
instead of materializing the ``[T, S2max, D]`` gathered keys the pure-XLA path
needs — the reference's dedicated prefill kernel
(csrc/lightning_indexer/op_kernel/lightning_indexer_kernel.cpp:53) exists for
the same reason.  Selection stays in ``jax.lax.top_k`` on the ``[T, S2max]``
score matrix (O(T·S), not O(T·S·D)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.attention.decode_attention import _gather_pages
from sgl_kernel_npu_tpu.ops.attention.sinks_attention import _prefill_page_bounds
from sgl_kernel_npu_tpu.utils.common import interpret_default

NEG_INF = float("-inf")


def _li_prefill_kernel(
    lens_q_ref,      # [B] query counts
    lens_k_ref,      # [B] key (context) lengths
    bt_ref,          # [B, max_pages]
    q_ref,           # [1, CQ, N1, D]
    w_ref,           # [1, CQ, N1]
    k_ref,           # [1, 1, page, D]
    o_ref,           # [1, CQ, page] f32 masked scores
    *,
    page_size,
    max_pages,
    causal,
):
    b = pl.program_id(0)
    qc = pl.program_id(1)
    pc = pl.program_id(2)
    cq, n1, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]

    lq = lens_q_ref[b]
    lk = lens_k_ref[b]
    _, hi_page = _prefill_page_bounds(
        lq if causal else jnp.int32(0), lk, qc, cq=cq, window=0,
        page_size=page_size, max_pages=max_pages)
    page = jnp.minimum(pc, hi_page)                  # must match the index maps
    page_lo = page * page_size
    # dead steps (page beyond this chunk's causal range) write NEG_INF columns
    has_work = jnp.logical_and(qc * cq < lq, pc <= hi_page)

    tok = qc * cq + jax.lax.broadcasted_iota(jnp.int32, (cq, 1), 0)
    row_live = tok < lq
    qpos = lk - lq + tok if causal else jnp.broadcast_to(lk - 1, (cq, 1))
    kpos = page_lo + jax.lax.broadcasted_iota(jnp.int32, (cq, page_size), 1)
    mask = (kpos <= qpos) & (kpos < lk) & row_live

    def _scores():
        q = q_ref[0].reshape(cq * n1, d)             # merge leading dims only
        k = k_ref[0, 0]                              # [page, D]
        qk = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        r3 = jnp.maximum(qk, 0.0).reshape(cq, n1, page_size)
        # head reduction as a batched (1, n1)·(n1, page) dot — avoids the
        # [cq, n1] → [cq·n1, 1] lane→sublane reshape Mosaic miscompiles
        w3 = w_ref[0].astype(jnp.float32)[:, None, :]   # [cq, 1, n1]
        s3 = jax.lax.dot_general(
            w3, r3, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)      # [cq, 1, page]
        return s3[:, 0, :]

    s = jax.lax.cond(has_work, _scores, lambda: jnp.zeros((cq, page_size), jnp.float32))
    o_ref[0] = jnp.where(mask & has_work, s, NEG_INF)


def lightning_indexer_scores_prefill_pallas(
    q_dense: jax.Array,               # [B, max_q, N1, D] dense-padded queries
    w_dense: jax.Array,               # [B, max_q, N1]
    key: jax.Array,                   # [blocks, 1, page, D] paged
    lens_q: jax.Array,                # [B]
    lens_k: jax.Array,                # [B]
    block_table: jax.Array,           # [B, max_pages]
    *,
    causal: bool = True,
    q_chunk: int = 64,
    interpret=None,
):
    """Masked indexer scores ``[B, max_q, max_pages·page]`` via the paged walk.

    Scores are exact f32 ``Σ_h w·relu(q·k)`` with −inf at causally/len-masked
    positions; feed the flattened rows to ``top_k``.
    """
    if interpret is None:
        interpret = interpret_default()
    bsz, max_q, n1, d = q_dense.shape
    page_size = key.shape[2]
    max_pages = block_table.shape[1]
    cq = min(q_chunk, max(8, max_q))
    if max_q % cq:
        pad = -(-max_q // cq) * cq - max_q
        q_dense = jnp.pad(q_dense, ((0, 0), (0, pad), (0, 0), (0, 0)))
        w_dense = jnp.pad(w_dense, ((0, 0), (0, pad), (0, 0)))
        max_q += pad

    def _page(b, qc, pc, lq, lk, bt):
        _, hi_page = _prefill_page_bounds(
            lq[b] if causal else jnp.int32(0), lk[b], qc, cq=cq, window=0,
            page_size=page_size, max_pages=max_pages)
        return bt[b, jnp.minimum(pc, hi_page)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bsz, max_q // cq, max_pages),
        in_specs=[
            pl.BlockSpec((1, cq, n1, d), lambda b, qc, pc, lq, lk, bt: (b, qc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cq, n1), lambda b, qc, pc, lq, lk, bt: (b, qc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, page_size, d),
                         lambda b, qc, pc, lq, lk, bt: (_page(b, qc, pc, lq, lk, bt), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cq, page_size),
                               lambda b, qc, pc, lq, lk, bt: (b, qc, pc),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_li_prefill_kernel, page_size=page_size,
                          max_pages=max_pages, causal=causal),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (bsz, max_q, max_pages * page_size), jnp.float32),
        interpret=interpret,
    )(
        lens_q.astype(jnp.int32),
        lens_k.astype(jnp.int32),
        block_table.astype(jnp.int32),
        q_dense,
        w_dense,
        key,
    )


@functools.partial(jax.jit, static_argnames=(
    "layout_query", "sparse_count", "sparse_mode", "backend", "max_q"))
def lightning_indexer(
    query: jax.Array,                 # BSND [B, S1, N1, D] or TND [T, N1, D]
    key: jax.Array,                   # [blocks, 1, block_size, D] paged (kv heads = 1)
    weights: jax.Array,               # per (token, head): [B, S1, N1] / [T, N1]
    actual_seq_lengths_query: jax.Array | None,   # [B] (TND: prefix sums)
    actual_seq_lengths_key: jax.Array,            # [B]
    block_table: jax.Array,           # [B, max_blocks]
    layout_query: str = "BSND",
    sparse_count: int = 2048,
    sparse_mode: int = 3,
    backend: str = "pallas",
    max_q: int | None = None,
):
    """Returns int32 indices shaped like query with the last two dims → [1, sparse_count].

    ``backend="pallas"`` (default) scores through the paged page-walk kernel —
    O(q-chunks · S · D) HBM key reads, no gathered-key materialization;
    ``backend="xla"`` keeps the einsum-over-gathered-keys path (exact same
    math, used as the golden reference).  ``max_q``: static per-request
    new-token bound for the pallas path (defaults to S1 / the packed total)."""
    d = query.shape[-1]
    n1 = query.shape[-2]
    bsz = block_table.shape[0]
    if layout_query == "BSND":
        b, s1 = query.shape[0], query.shape[1]
        q_flat = query.reshape(b * s1, n1, d)
        w_flat = weights.reshape(b * s1, n1)
        tok_b = jnp.repeat(jnp.arange(b, dtype=jnp.int32), s1)
        if actual_seq_lengths_query is None:
            lens_q = jnp.full((b,), s1, jnp.int32)
        else:
            lens_q = actual_seq_lengths_query.astype(jnp.int32)
        tok_j = jnp.tile(jnp.arange(s1, dtype=jnp.int32), b)
        tok_valid = tok_j < lens_q[tok_b]
        out_shape = (b, s1, 1, sparse_count)
    elif layout_query == "TND":
        t = query.shape[0]
        q_flat = query.reshape(t, n1, d)
        w_flat = weights.reshape(t, n1)
        ends = actual_seq_lengths_query.astype(jnp.int32)     # prefix sums
        tok_b = jnp.clip(jnp.searchsorted(ends, jnp.arange(t), side="right"), 0, bsz - 1)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), ends[:-1]])
        tok_j = jnp.arange(t, dtype=jnp.int32) - starts[tok_b]
        lens_q = ends - starts
        tok_valid = jnp.arange(t) < ends[-1]
        out_shape = (t, 1, sparse_count)
    else:
        raise ValueError(layout_query)

    max_len = int(block_table.shape[1] * key.shape[2])
    lens_k = actual_seq_lengths_key.astype(jnp.int32)

    if backend == "pallas":
        mq = max_q or (s1 if layout_query == "BSND" else t)
        q_dense = (
            jnp.zeros((bsz, mq, n1, d), query.dtype)
            .at[tok_b, tok_j].set(q_flat, mode="drop")
        )
        w_dense = (
            jnp.zeros((bsz, mq, n1), weights.dtype)
            .at[tok_b, tok_j].set(w_flat, mode="drop")
        )
        scores_dense = lightning_indexer_scores_prefill_pallas(
            q_dense, w_dense, key, lens_q, lens_k, block_table,
            causal=(sparse_mode == 3),
        )
        scores = scores_dense[tok_b, tok_j]                    # [T, S2max]
    else:
        k_lin = _gather_pages(key, block_table, max_len)[:, 0]  # [B, S2max, D]
        k_tok = k_lin[tok_b]                                    # [T, S2max, D]
        scores = jnp.einsum(
            "tnd,tsd->tns", q_flat.astype(jnp.float32), k_tok.astype(jnp.float32)
        )
        scores = jnp.maximum(scores, 0.0) * w_flat.astype(jnp.float32)[:, :, None]
        scores = jnp.sum(scores, axis=1)                        # [T, S2max]

        pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
        s2 = lens_k[tok_b][:, None]
        mask = pos < s2
        if sparse_mode == 3:
            # causal: query j of a request is right-aligned to its key sequence
            qpos = s2[:, 0] - lens_q[tok_b] + tok_j             # absolute position
            mask &= pos <= qpos[:, None]
        scores = jnp.where(mask, scores, NEG_INF)

    kk = min(sparse_count, max_len)
    _, idx = jax.lax.top_k(scores, kk)
    idx = idx.astype(jnp.int32)
    if kk < sparse_count:
        idx = jnp.pad(idx, ((0, 0), (0, sparse_count - kk)), constant_values=-1)
    # reference fills min(sparse_count, act_s2) entries (−inf-masked causal entries
    # keep their slots at the tail of the sort) and pads the rest with −1
    valid_count = jnp.minimum(sparse_count, lens_k[tok_b])
    col = jnp.arange(sparse_count, dtype=jnp.int32)[None, :]
    idx = jnp.where((col < valid_count[:, None]) & tok_valid[:, None], idx, -1)
    return idx.reshape(out_shape)


@functools.partial(jax.jit, static_argnames=())
def lightning_indexer_scores_decode(
    query: jax.Array,                 # [B, N1, D] one decode token per request
    key: jax.Array,                   # [blocks, 1, block_size, D] paged
    weights: jax.Array,               # [B, N1]
    actual_seq_lengths_key: jax.Array,  # [B]
    block_table: jax.Array,           # [B, max_blocks]
):
    """Masked indexer scores for decode (one query token per request):
    [B, max_len] with −inf beyond each request's causal range.  Feed to
    ``decode_attention.decode_mla_block_sparse`` (page-top-k DSA)."""
    b, n1, d = query.shape
    max_len = int(block_table.shape[1] * key.shape[2])
    k_lin = _gather_pages(key, block_table, max_len)[:, 0]     # [B, S2max, D]
    scores = jnp.einsum(
        "bnd,bsd->bns", query.astype(jnp.float32), k_lin.astype(jnp.float32))
    scores = jnp.maximum(scores, 0.0) * weights.astype(jnp.float32)[:, :, None]
    scores = jnp.sum(scores, axis=1)                           # [B, S2max]
    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    mask = pos < actual_seq_lengths_key.astype(jnp.int32)[:, None]
    return jnp.where(mask, scores, NEG_INF)
