"""Zero-expert (identity expert) handling for EPLB.

Parity with reference ``moe/zero_experts_compute_identity.py:50``: expert ids
≥ num_experts denote "zero experts" that act as identity; their scaled input is
computed locally and they are stripped from the routing (scale → 0, index →
``identity_mask_value``).  If a token routed ONLY to zero experts, slot 0 is
pointed at expert 0 with scale 0 to keep the dispatch well-formed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def zero_experts_compute_identity(
    expert_indices: jax.Array,   # [S, K] int32
    expert_scales: jax.Array,    # [S, K] float
    num_experts: int,
    zero_expert_type: str,       # "identity"
    hidden_states: jax.Array,    # [S, D]
    identity_mask_value: int = 0,
):
    """Returns ``(zero_result [S, D], new_indices, new_scales)``."""
    assert zero_expert_type == "identity"
    is_zero = expert_indices >= num_experts
    zero_scale = jnp.sum(jnp.where(is_zero, expert_scales, 0.0), axis=1)
    zero_result = (hidden_states.astype(jnp.float32) * zero_scale[:, None]).astype(
        hidden_states.dtype
    )
    new_scales = jnp.where(is_zero, 0.0, expert_scales).astype(expert_scales.dtype)
    new_indices = jnp.where(is_zero, identity_mask_value, expert_indices)
    all_zero = jnp.all(is_zero, axis=1)
    first_col = jnp.arange(expert_indices.shape[1]) == 0
    new_indices = jnp.where(
        all_zero[:, None] & first_col[None, :], 0, new_indices
    ).astype(expert_indices.dtype)
    return zero_result, new_indices, new_scales
