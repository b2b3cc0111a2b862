"""Cache-location scatter/gather ops.

Parity with reference csrc ops (all trivial vector index ops on TPU — XLA fuses the
masked scatters/gathers; the AscendC kernels existed because torch-eager indexing was
slow on NPU, a constraint JAX does not have):

- ``cache_loc_assign``  (csrc/cache_location_assign; golden test_cache_assign.py:49-60):
  ``token_pool[req_pool_indices[i], start[i]:end[i]] = out_cache_loc[segment_i]``.
- ``cache_loc_update``  (golden test_cache_update.py:9-30): the inverse gather.
- ``assign_cache_op``   (csrc/assign_cache_op): ranged copy dst[d0:d1] = src[s0:s1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _segments(start, end, max_total: int):
    """Map flat positions → (request, within-segment offset) for ragged segments."""
    lens = (end - start).astype(jnp.int32)
    seg_ends = jnp.cumsum(lens)
    starts = seg_ends - lens
    p = jnp.arange(max_total, dtype=jnp.int32)
    b = jnp.clip(jnp.searchsorted(seg_ends, p, side="right"), 0, lens.shape[0] - 1)
    j = p - starts[b]
    valid = p < seg_ends[-1]
    return b.astype(jnp.int32), j, valid


def cache_loc_assign(
    req_pool_indices: jax.Array,
    token_pool: jax.Array,
    start_offset: jax.Array,
    end_offset: jax.Array,
    out_cache_loc: jax.Array,
) -> jax.Array:
    """Scatter new cache locations into per-request token-pool rows.

    Returns the updated ``token_pool`` (functional; donate for in-place XLA update).
    """
    b, j, valid = _segments(start_offset, end_offset, out_cache_loc.shape[0])
    rows = req_pool_indices.astype(jnp.int32)[b]
    cols = start_offset.astype(jnp.int32)[b] + j
    rows = jnp.where(valid, rows, token_pool.shape[0])  # OOB → dropped
    return token_pool.at[rows, cols].set(
        out_cache_loc.astype(token_pool.dtype), mode="drop"
    )


def cache_loc_update(
    req_pool_indices: jax.Array,
    req_to_token: jax.Array,
    start_offset: jax.Array,
    end_offset: jax.Array,
    max_total: int,
) -> jax.Array:
    """Gather per-request token locations into a flat array (inverse of assign)."""
    b, j, valid = _segments(start_offset, end_offset, max_total)
    rows = req_pool_indices.astype(jnp.int32)[b]
    cols = start_offset.astype(jnp.int32)[b] + j
    vals = req_to_token[rows, cols]
    return jnp.where(valid, vals, -1)


def assign_cache_op(
    dst: jax.Array,
    src: jax.Array,
    dst_start: jax.Array,
    dst_end: jax.Array,
    src_start: jax.Array,
    src_end: jax.Array,
) -> jax.Array:
    """Ranged copy ``dst[d0:d1] = src[s0:s1]`` with traced bounds (KV slot copy)."""
    n = dst.shape[0]
    p = jnp.arange(n, dtype=jnp.int32)
    length = jnp.minimum(dst_end - dst_start, src_end - src_start).astype(jnp.int32)
    in_range = (p >= dst_start) & (p < dst_start + length)
    src_idx = jnp.clip(p - dst_start + src_start, 0, src.shape[0] - 1)
    vals = src[src_idx]
    if dst.ndim > 1:
        in_range = in_range.reshape((-1,) + (1,) * (dst.ndim - 1))
    return jnp.where(in_range, vals, dst)
