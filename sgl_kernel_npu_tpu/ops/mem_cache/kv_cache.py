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
    """
    n_pages, hkv, d, page_size = cache.shape
    slots = slot_mapping.astype(jnp.int32)
    page = jnp.where(slots >= 0, slots // page_size, n_pages)
    off = slots % page_size
    return cache.at[page, :, :, off].set(value.astype(cache.dtype), mode="drop")
