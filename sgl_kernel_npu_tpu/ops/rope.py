"""Rotary position embedding helpers.

The reference applies rotate-half RoPE inside its fusions (mla_preprocess RopeConcat
stage, csrc/mla_preprocess/op_host/mla_preprocess.cpp:533-560; golden:
tests/python/sgl_kernel_npu/test_mla_preprocess.py:59 ``apply_rope_half``).  On TPU the
application is cheap VPU work that XLA fuses into neighbours, so this module provides
jnp building blocks used by the fused kernels rather than standalone Pallas calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_cos_sin(
    positions: jax.Array,
    rotary_dim: int,
    base: float = 10000.0,
    dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for rotate-half RoPE.

    Returns ``(cos, sin)`` of shape ``[len(positions), rotary_dim]`` where the
    frequency of dim pair ``i`` repeats across both halves (neox layout).
    """
    half = rotary_dim // 2
    inv_freq = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / rotary_dim))
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate-half RoPE: ``x*cos + rotate_half(x)*sin``.

    ``x`` is ``[N, heads, D]``; ``cos/sin`` are ``[N, D]`` and broadcast over heads.
    Matches the reference golden (test_mla_preprocess.py:59-64).
    """
    cosf = cos.astype(jnp.float32)[:, None, :]
    sinf = sin.astype(jnp.float32)[:, None, :]
    xf = x.astype(jnp.float32)
    return (xf * cosf + rotate_half(xf) * sinf).astype(x.dtype)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """GPT-J / interleaved RoPE variant (pairs are adjacent elements)."""
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    x1, x2 = x_pairs[..., 0], x_pairs[..., 1]
    half = cos.shape[-1] // 2
    c = cos.astype(jnp.float32)[:, None, :half]
    s = sin.astype(jnp.float32)[:, None, :half]
    r1 = x1 * c - x2 * s
    r2 = x2 * c + x1 * s
    return jnp.stack([r1, r2], axis=-1).reshape(xf.shape).astype(x.dtype)
