"""Paged-KV slot allocation.

Equivalent of the reference ``alloc_extend`` (csrc/alloc_extend, 3-part fill; Triton
twin python/sgl_kernel_npu/.../mem_cache/allocator.py:8): given previous and new
sequence lengths, the last occupied slot per request, and a free-page list, emit the
token-slot indices for the extension of every request, packed contiguously.

TPU-native formulation: instead of the reference's three explicit fill loops
(partial old page / full new pages / partial new page), each output position derives
its slot in closed form — XLA turns the whole op into a handful of fused vector ops,
no kernel needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("page_size", "max_extend_tokens"))
def alloc_extend(
    pre_lens: jax.Array,
    seq_lens: jax.Array,
    last_loc: jax.Array,
    free_pages: jax.Array,
    *,
    page_size: int,
    max_extend_tokens: int,
) -> jax.Array:
    """Compute token-slot indices for extending each request.

    Args:
        pre_lens: ``[B]`` current lengths; seq_lens: ``[B]`` target lengths.
        last_loc: ``[B]`` last occupied slot id per request.
        free_pages: ``[F]`` free physical page ids, consumed in order.
        max_extend_tokens: static output size (≥ total extension).

    Returns:
        ``[max_extend_tokens]`` int32 slot ids; positions past the total are -1.
    """
    pre_lens = pre_lens.astype(jnp.int32)
    seq_lens = seq_lens.astype(jnp.int32)
    extend = seq_lens - pre_lens
    starts = jnp.cumsum(extend) - extend  # output segment start per request

    pages_before = -(-pre_lens // page_size)
    pages_after = -(-seq_lens // page_size)
    new_pages = pages_after - pages_before
    page_starts = jnp.cumsum(new_pages) - new_pages  # free-list offset per request

    p = jnp.arange(max_extend_tokens, dtype=jnp.int32)
    # request owning output position p
    seg_ends = jnp.cumsum(extend)
    b = jnp.searchsorted(seg_ends, p, side="right").astype(jnp.int32)
    b = jnp.clip(b, 0, pre_lens.shape[0] - 1)
    j = p - starts[b]                      # position within the extension
    tok = pre_lens[b] + j                  # absolute token position in the sequence
    page = tok // page_size
    in_old_partial = page < pages_before[b]        # falls in the old partial page
    new_page_ord = page - pages_before[b]
    free_idx = jnp.clip(page_starts[b] + new_page_ord, 0, free_pages.shape[0] - 1)
    slot_new = free_pages[free_idx].astype(jnp.int32) * page_size + tok % page_size
    slot_old = last_loc[b].astype(jnp.int32) + 1 + j
    slot = jnp.where(in_old_partial, slot_old, slot_new)
    total = seg_ends[-1]
    return jnp.where(p < total, slot, -1)


@jax.jit
def alloc_decode(seq_lens: jax.Array, last_loc: jax.Array, free_pages: jax.Array, *, page_size: int = 128):
    """Single-token decode allocation: slot for position ``seq_lens-1`` per request."""
    seq_lens = seq_lens.astype(jnp.int32)
    needs_page = (seq_lens - 1) % page_size == 0
    page_ord = jnp.cumsum(needs_page.astype(jnp.int32)) - needs_page
    new_slot = free_pages[jnp.clip(page_ord, 0, free_pages.shape[0] - 1)].astype(jnp.int32) * page_size
    return jnp.where(needs_page, new_slot, last_loc.astype(jnp.int32) + 1)
