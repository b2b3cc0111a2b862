"""Causal depthwise conv1d for Mamba-style SSM layers.

Capability parity with reference ``python/sgl_kernel_npu/sgl_kernel_npu/mamba/
causal_conv1d.py``: prefill ``causal_conv1d_fn_native`` (:18) and decode
``causal_conv1d_update_npu`` (:592) with continuous-batching state pools
(``conv_state_indices``, ``pad_slot_id`` skips).

TPU design: conv width is tiny (typically 4), so the convolution is W shifted
multiply-adds that XLA fuses into one VPU pass — no kernel needed.  The decode-side
state pool update is a masked scatter.  (The reference's circular-buffer
``cache_seqlens`` mode trades a shift for modular addressing; on TPU the shift is
free bandwidth-wise at state_len≈3, so we keep linear states.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

PAD_SLOT_ID = -1


def _act(out, activation):
    if activation in ("silu", "swish", True):
        return out * jax.nn.sigmoid(out)
    if activation in (None, False):
        return out
    raise NotImplementedError(f"activation must be None or silu/swish, got {activation}")


def causal_conv1d_fn(
    x: jax.Array,                       # [B, D, T]
    weight: jax.Array,                  # [D, W]
    bias: jax.Array | None = None,
    initial_states: jax.Array | None = None,   # [B, D, W-1]
    return_final_states: bool = False,
    activation: str | None = "silu",
):
    """Prefill causal depthwise conv.  Returns ``out`` or ``(out, final_states)``."""
    b, d, t = x.shape
    _, w = weight.shape
    xf = x.astype(jnp.float32)
    if initial_states is None:
        prefix = jnp.zeros((b, d, w - 1), jnp.float32)
    else:
        prefix = initial_states.astype(jnp.float32)
    xp = jnp.concatenate([prefix, xf], axis=-1)            # [B, D, T + W - 1]
    out = jnp.zeros((b, d, t), jnp.float32)
    for i in range(w):                                      # W tiny → unrolled VPU adds
        out = out + weight.astype(jnp.float32)[None, :, i : i + 1] * xp[:, :, i : i + t]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None]
    out = _act(out, activation).astype(x.dtype)
    if return_final_states:
        final = xp[:, :, -(w - 1):].astype(x.dtype)
        return out, final
    return out


def causal_conv1d_update(
    x: jax.Array,                       # [B, D] or [B, D, S]
    conv_state: jax.Array,              # [pool, D, state_len]
    weight: jax.Array,                  # [D, W]
    bias: jax.Array | None = None,
    activation: str | bool | None = None,
    conv_state_indices: jax.Array | None = None,   # [B] (PAD_SLOT_ID = skip)
    num_accepted_tokens: jax.Array | None = None,  # [B] MTP: accepted drafts last step
    intermediate_conv_window: jax.Array | None = None,  # [pool, S_prev, D, state_len]
    pad_slot_id: int = PAD_SLOT_ID,
):
    """Decode conv update over a state pool.

    Returns ``(out, new_conv_state)`` — or ``(out, new_conv_state, new_window)``
    when ``intermediate_conv_window`` is given.  Rows with ``conv_state_indices ==
    pad_slot_id`` neither read nor write the pool.

    MTP / speculative decoding (reference causal_conv1d.py:384,554): the previous
    step saved the conv window *after each draft token* into
    ``intermediate_conv_window``; this step resumes from the window of the last
    accepted token (``num_accepted_tokens − 1``) and records fresh per-token
    windows for the next verification round.
    """
    squeeze = x.ndim == 2
    if squeeze:
        x = x[:, :, None]
    b, d, s = x.shape
    _, w = weight.shape
    pool, _, state_len = conv_state.shape
    if conv_state_indices is None:
        conv_state_indices = jnp.arange(b, dtype=jnp.int32)
    idx = conv_state_indices.astype(jnp.int32)
    valid = idx != pad_slot_id
    safe = jnp.where(valid, idx, 0).clip(0, pool - 1)

    if num_accepted_tokens is not None and intermediate_conv_window is not None:
        off = jnp.clip(num_accepted_tokens.astype(jnp.int32) - 1, 0,
                       intermediate_conv_window.shape[1] - 1)
        state = intermediate_conv_window[safe, off]          # [B, D, state_len]
    else:
        state = conv_state[safe]
    state = jnp.where(valid[:, None, None], state, 0.0).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    window = jnp.concatenate([state, xf], axis=-1)          # [B, D, state_len + S]
    out = jnp.zeros((b, d, s), jnp.float32)
    tail = window[:, :, -(s + w - 1):]
    for i in range(w):
        out = out + weight.astype(jnp.float32)[None, :, i : i + 1] * tail[:, :, i : i + s]
    if bias is not None:
        out = out + bias.astype(jnp.float32)[None, :, None]
    out = _act(out, activation).astype(x.dtype)

    new_state_rows = window[:, :, -state_len:].astype(conv_state.dtype)
    scatter_idx = jnp.where(valid, idx, pool)               # OOB → dropped
    new_pool = conv_state.at[scatter_idx].set(new_state_rows, mode="drop")
    out = out[:, :, 0] if squeeze else out
    if intermediate_conv_window is None:
        return out, new_pool
    # per-token windows: window ending after token j (inclusive)
    wins = jnp.stack(
        [window[:, :, j + 1 : j + 1 + state_len] for j in range(s)], axis=1
    ).astype(intermediate_conv_window.dtype)                # [B, S, D, state_len]
    s_prev = intermediate_conv_window.shape[1]
    if s < s_prev:
        wins = jnp.pad(wins, ((0, 0), (0, s_prev - s), (0, 0), (0, 0)))
    new_window = intermediate_conv_window.at[scatter_idx].set(wins[:, :s_prev], mode="drop")
    return out, new_pool, new_window
