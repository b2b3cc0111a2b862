"""Recurrent (decode) gated delta rule with fused sigmoid gating.

Reference: fla/fused_sigmoid_gating_recurrent.py:161
``fused_sigmoid_gating_delta_rule_update_npu`` — per token:
    g    = −exp(A_log) · softplus(a + dt_bias)
    β    = sigmoid(b)
    S   *= exp(g)
    v'   = β · (v − kᵀS)
    S   += k ⊗ v'
    o    = qᵀS
with optional q/k L2 norm and per-request state stored in a pool addressed by
``initial_state_indices`` (−1 = fresh state).

TPU design: decode T is tiny (1 for decode, a few for MTP); the token recurrence is a
``lax.scan`` and everything else is batched outer products that XLA fuses — a Pallas
kernel would add nothing at these shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.fla.chunk import l2norm
from sgl_kernel_npu_tpu.ops.fla.gating import softplus_beta


@functools.partial(
    jax.jit,
    static_argnames=("softplus_beta_p", "softplus_threshold", "scale", "use_qk_l2norm_in_kernel"),
    donate_argnums=(8,),
)
def fused_sigmoid_gating_delta_rule_update(
    A_log: jax.Array,              # [HV]
    a: jax.Array,                  # [B, T, HV]
    dt_bias: jax.Array,            # [HV]
    q: jax.Array,                  # [B, T, H, K]
    k: jax.Array,                  # [B, T, H, K]
    v: jax.Array,                  # [B, T, HV, V]
    b: jax.Array,                  # [B, T, HV]
    initial_state_source: jax.Array,   # [pool, HV, K, V] state pool
    initial_state_indices: jax.Array,  # [B] (−1 = zero init, no writeback)
    *,
    softplus_beta_p: float = 1.0,
    softplus_threshold: float = 20.0,
    scale: float | None = None,
    use_qk_l2norm_in_kernel: bool = True,
):
    """Returns ``(o [B, T, HV, V], updated state pool)``."""
    bsz, t, h, kd = q.shape
    hv, vd = v.shape[2], v.shape[-1]
    if scale is None:
        scale = kd ** -0.5
    rep = hv // h
    if rep > 1:
        q = jnp.repeat(q, rep, axis=2)
        k = jnp.repeat(k, rep, axis=2)
    if use_qk_l2norm_in_kernel:
        q, k = l2norm(q), l2norm(k)
    qf = q.astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    g = -jnp.exp(A_log.astype(jnp.float32))[None, None] * softplus_beta(
        a.astype(jnp.float32) + dt_bias.astype(jnp.float32)[None, None],
        softplus_beta_p, softplus_threshold,
    )                                                  # [B, T, HV]
    beta = jax.nn.sigmoid(b.astype(jnp.float32))

    idx = initial_state_indices.astype(jnp.int32)
    s0 = jnp.where(
        (idx >= 0)[:, None, None, None],
        initial_state_source[jnp.clip(idx, 0, initial_state_source.shape[0] - 1)],
        0.0,
    ).astype(jnp.float32)                              # [B, HV, K, V]

    def step(s, inp):
        q_t, k_t, v_t, g_t, b_t = inp                  # [HV,K],[HV,K],[HV,V],[HV],[HV]
        s = s * jnp.exp(g_t)[:, None, None]
        v_p = (v_t - jnp.einsum("hk,hkv->hv", k_t, s)) * b_t[:, None]
        s = s + k_t[:, :, None] * v_p[:, None, :]
        o_t = jnp.einsum("hk,hkv->hv", q_t, s)
        return s, o_t

    def per_seq(q_, k_, v_, g_, b_, s0_):
        return jax.lax.scan(step, s0_, (q_, k_, v_, g_, b_))

    s_fin, o = jax.vmap(per_seq)(qf, kf, vf, g, beta, s0)
    # write final states back into the pool (−1 indices dropped)
    pool = initial_state_source.at[jnp.where(idx >= 0, idx, initial_state_source.shape[0])].set(
        s_fin.astype(initial_state_source.dtype), mode="drop"
    )
    return o.astype(v.dtype), pool
