"""Dispatch layout computation.

Equivalent of the reference ``DispatchLayout`` op (csrc/deepep/ops/op_kernel/
dispatch_layout.h:28; Python entry deep_ep/buffer.py:152): from ``topk_idx`` compute
per-rank / per-expert token counts and the token→rank membership mask.  On TPU this is
a handful of one-hot reductions that XLA fuses into a single pass — no custom kernel
is warranted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_dispatch_layout(
    topk_idx: jax.Array, num_experts: int, num_ranks: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compute routing statistics for a local batch.

    Args:
        topk_idx: ``[num_tokens, topk]`` int32 global expert ids; ``-1`` entries are
            inactive (dropped) slots (reference MOE_ENABLE_TOPK_NEG_ONE path).
        num_experts: total expert count across all ranks.
        num_ranks: EP world size (must divide ``num_experts``).

    Returns:
        ``(num_tokens_per_rank [R], num_tokens_per_expert [E], is_token_in_rank [T, R] bool)``.
    """
    assert num_experts % num_ranks == 0
    experts_per_rank = num_experts // num_ranks
    valid = topk_idx >= 0
    safe_idx = jnp.where(valid, topk_idx, 0)

    onehot_e = jax.nn.one_hot(safe_idx, num_experts, dtype=jnp.int32) * valid[..., None]
    num_tokens_per_expert = jnp.sum(onehot_e, axis=(0, 1))

    rank_idx = safe_idx // experts_per_rank
    onehot_r = jax.nn.one_hot(rank_idx, num_ranks, dtype=jnp.int32) * valid[..., None]
    is_token_in_rank = jnp.sum(onehot_r, axis=1) > 0
    num_tokens_per_rank = jnp.sum(is_token_in_rank.astype(jnp.int32), axis=0)
    return num_tokens_per_rank, num_tokens_per_expert, is_token_in_rank
