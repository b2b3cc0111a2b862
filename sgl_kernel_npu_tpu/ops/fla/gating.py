"""Fused GDN gating (reference fla/fused_gdn_gating.py:52).

g = −exp(A_log) · softplus(a + dt_bias, beta, threshold);  beta_out = sigmoid(b).
Pure VPU elementwise — jnp, XLA fuses it into neighbours.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def softplus_beta(x: jax.Array, beta: float = 1.0, threshold: float = 20.0) -> jax.Array:
    bx = beta * x
    return jnp.where(bx <= threshold, (1.0 / beta) * jnp.log1p(jnp.exp(bx)), x)


def fused_gdn_gating(
    A_log: jax.Array,   # [HV]
    a: jax.Array,       # [..., HV]
    b: jax.Array,       # [..., HV]
    dt_bias: jax.Array, # [HV]
    beta: float = 1.0,
    threshold: float = 20.0,
):
    """Returns ``(g, beta_out)`` in float32."""
    x = a.astype(jnp.float32) + dt_bias.astype(jnp.float32)
    g = -jnp.exp(A_log.astype(jnp.float32)) * softplus_beta(x, beta, threshold)
    return g, jax.nn.sigmoid(b.astype(jnp.float32))
