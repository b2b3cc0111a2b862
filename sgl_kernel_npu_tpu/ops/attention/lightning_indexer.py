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
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.attention.decode_attention import _gather_pages

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("layout_query", "sparse_count", "sparse_mode"))
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
):
    """Returns int32 indices shaped like query with the last two dims → [1, sparse_count]."""
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
    k_lin = _gather_pages(key, block_table, max_len)[:, 0]     # [B, S2max, D]
    lens_k = actual_seq_lengths_key.astype(jnp.int32)

    k_tok = k_lin[tok_b]                                       # [T, S2max, D]
    scores = jnp.einsum(
        "tnd,tsd->tns", q_flat.astype(jnp.float32), k_tok.astype(jnp.float32)
    )
    scores = jnp.maximum(scores, 0.0) * w_flat.astype(jnp.float32)[:, :, None]
    scores = jnp.sum(scores, axis=1)                           # [T, S2max]

    pos = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    s2 = lens_k[tok_b][:, None]
    mask = pos < s2
    if sparse_mode == 3:
        # causal: query j of a request is right-aligned to its key sequence
        qpos = s2[:, 0] - lens_q[tok_b] + tok_j                # absolute position
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
