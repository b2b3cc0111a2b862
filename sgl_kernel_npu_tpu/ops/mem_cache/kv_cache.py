"""Paged KV-cache writes (reshape-and-cache).

The reference folds this into mla_preprocess's final stage (write per-token latent
kv into the paged cache via ``slotmapping``, csrc/mla_preprocess/op_host/
mla_preprocess.cpp:610-622).  On TPU a slot-mapped scatter compiles to an efficient
dynamic-update stream; we keep it a standalone op usable by any attention variant.

Cache layout (TPU-first, see ops/attention/decode_attention.py):
    cache [num_pages, kv_heads, page_size, head_dim], slot = page * page_size + offset.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def reshape_and_cache(
    value: jax.Array,
    cache: jax.Array,
    slot_mapping: jax.Array,
) -> jax.Array:
    """Write per-token values into paged cache slots.

    Args:
        value: ``[N, kv_heads, head_dim]`` new entries.
        cache: ``[num_pages, kv_heads, page_size, head_dim]``.
        slot_mapping: ``[N]`` int32 global slot ids (-1 = skip).

    Returns the updated cache (functional; donate the cache buffer under jit for an
    in-place update).
    """
    n_pages, hkv, page_size, d = cache.shape
    slots = slot_mapping.astype(jnp.int32)
    page = jnp.where(slots >= 0, slots // page_size, n_pages)  # OOB → dropped
    off = slots % page_size
    # scatter [N, hkv, d] into [pages, hkv, page, d]
    return cache.at[page, :, off, :].set(value.astype(cache.dtype), mode="drop")


def reshape_and_cache_transposed(
    value: jax.Array,
    cache: jax.Array,
    slot_mapping: jax.Array,
) -> jax.Array:
    """Write per-token values into a *transposed* paged cache.

    Layout ``[num_pages, kv_heads, head_dim, page_size]`` — used for the MLA rope
    cache whose head_dim (64) is below the 128-lane tile, making the transposed
    layout the only DMA-sliceable HBM shape (see ops/attention/decode_attention.py).

    Args: value ``[N, kv_heads, head_dim]``; slot_mapping ``[N]``.

    Implementation note (round 5): a direct column scatter
    (``cache.at[page, :, :, off].set``) writes ``[d, 1]`` strips along the
    MINOR dim, and XLA's layout assignment responds by relaying the ENTIRE
    cache into a page-minor layout around the scatter — three whole-cache
    copies (~113 us/step on the 16.8 MB DeepSeek rope cache, trace-measured)
    because the Pallas attention kernels mandate the default layout.  The
    page-granular form below gathers the touched pages (major-dim gather),
    merges every token's column into its page with masked vector ops, and
    scatters whole pages back — layout-neutral, so no relayout is ever
    inserted.  Duplicate pages within one call are handled: each gathered
    page receives ALL tokens routed to it (columns are unique because slots
    are unique), so colliding page rows scatter identical merged content.
    """
    n_pages, hkv, d, page_size = cache.shape
    slots = slot_mapping.astype(jnp.int32)
    n = slots.shape[0]
    valid = slots >= 0
    page = jnp.where(valid, slots // page_size, 0)  # safe gather index
    off = slots % page_size
    vals = value.astype(jnp.float32)  # [N, hkv, d]
    gathered = cache[page]            # [N, hkv, d, page_size]
    same = ((page[:, None] == page[None, :]) & valid[None, :]).astype(jnp.float32)
    oh_off = (off[:, None] == jnp.arange(page_size, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)                       # [N, ps]
    colset = (same @ oh_off) > 0                          # [N, ps] written cols
    colval = jnp.einsum("ij,jhd,jp->ihdp", same, vals, oh_off)
    upd = jnp.where(colset[:, None, None, :],
                    colval.astype(cache.dtype), gathered)
    page_s = jnp.where(valid, page, n_pages)              # OOB → dropped
    return cache.at[page_s].set(upd, mode="drop")
