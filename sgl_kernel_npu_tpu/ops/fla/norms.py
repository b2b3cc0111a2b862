"""Gated group layer/RMS norm (reference fla/layernorm_gated.py:84/241).

y = norm(x or x·silu(z)) per group; if ``norm_before_gate``, the gate applies after:
y = (norm(x)·w + b) · silu(z).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layernorm_gated(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None = None,
    z: jax.Array | None = None,
    *,
    eps: float = 1e-5,
    group_size: int | None = None,
    norm_before_gate: bool = True,
    is_rms_norm: bool = False,
):
    n = x.shape[-1]
    group_size = group_size or n
    assert n % group_size == 0
    xf = x.astype(jnp.float32)
    if z is not None and not norm_before_gate:
        zf = z.astype(jnp.float32)
        xf = xf * zf * jax.nn.sigmoid(zf)
    xg = xf.reshape(*xf.shape[:-1], n // group_size, group_size)
    if is_rms_norm:
        var = jnp.mean(xg * xg, axis=-1, keepdims=True)
        xn = xg * jax.lax.rsqrt(var + eps)
    else:
        mu = jnp.mean(xg, axis=-1, keepdims=True)
        var = jnp.mean((xg - mu) ** 2, axis=-1, keepdims=True)
        xn = (xg - mu) * jax.lax.rsqrt(var + eps)
    y = xn.reshape(xf.shape) * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if z is not None and norm_before_gate:
        zf = z.astype(jnp.float32)
        y = y * zf * jax.nn.sigmoid(zf)
    return y.astype(x.dtype)
