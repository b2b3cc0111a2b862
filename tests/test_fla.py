"""FLA gated-delta-rule pipeline vs from-scratch goldens (reference pipeline spec:
fla/chunk.py:47 native; recurrent spec: fused_sigmoid_gating_recurrent.py:110-160)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import tri_inv
from sgl_kernel_npu_tpu.ops.fla import (
    chunk_gated_delta_rule,
    chunk_gated_delta_rule_ref,
    fused_gdn_gating,
    fused_sigmoid_gating_delta_rule_update,
    layernorm_gated,
    l2norm,
)


def _gdn_inputs(rng, b, t, h, hv, kd, vd):
    q = rng.standard_normal((b, t, h, kd)).astype(np.float32)
    k = rng.standard_normal((b, t, h, kd)).astype(np.float32)
    v = rng.standard_normal((b, t, hv, vd)).astype(np.float32) * 0.5
    g = -np.abs(rng.standard_normal((b, t, hv))).astype(np.float32) * 0.2
    beta = rng.random((b, t, hv)).astype(np.float32)
    return map(jnp.asarray, (q, k, v, g, beta))


@pytest.mark.parametrize("chunk_size,t", [(16, 64), (16, 50)])
@pytest.mark.parametrize("gqa", [False, True])
def test_chunk_gdn_vs_native(rng, chunk_size, t, gqa):
    b, h, kd, vd = 2, 2, 32, 16
    hv = h * 2 if gqa else h
    q, k, v, g, beta = _gdn_inputs(rng, b, t, h, hv, kd, vd)
    o, s = chunk_gated_delta_rule(
        q, k, v, g, beta, chunk_size=chunk_size, use_qk_l2norm_in_kernel=True
    )
    o_ref, s_ref = chunk_gated_delta_rule_ref(
        q, k, v, g, beta, chunk_size=chunk_size, use_qk_l2norm_in_kernel=True
    )
    np.testing.assert_allclose(np.asarray(o), o_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=2e-3, atol=2e-3)


def test_chunk_gdn_initial_state(rng):
    b, t, h, kd, vd = 1, 32, 2, 16, 16
    q, k, v, g, beta = _gdn_inputs(rng, b, t, h, h, kd, vd)
    s0 = jnp.asarray(rng.standard_normal((b, h, kd, vd)), jnp.float32) * 0.3
    o, s = chunk_gated_delta_rule(q, k, v, g, beta, chunk_size=16, initial_state=s0)
    o_ref, s_ref = chunk_gated_delta_rule_ref(
        q, k, v, g, beta, chunk_size=16, initial_state=s0
    )
    np.testing.assert_allclose(np.asarray(o), o_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(s), s_ref, rtol=2e-3, atol=2e-3)


def test_recurrent_matches_chunked(rng):
    """The decode recurrence must agree with the chunked prefill on the same tokens."""
    b, t, h, kd, vd = 2, 8, 2, 16, 16
    hv = 4
    q, k, v, g_unused, beta_unused = _gdn_inputs(rng, b, t, h, hv, kd, vd)
    A_log = jnp.asarray(rng.uniform(-2, 0, hv), jnp.float32)
    a = jnp.asarray(rng.standard_normal((b, t, hv)), jnp.float32)
    dt_bias = jnp.asarray(rng.standard_normal(hv) * 0.1, jnp.float32)
    bgate = jnp.asarray(rng.standard_normal((b, t, hv)), jnp.float32)

    pool = jnp.zeros((b, hv, kd, vd), jnp.float32)
    idx = jnp.arange(b, dtype=jnp.int32)
    o_rec, pool_out = fused_sigmoid_gating_delta_rule_update(
        A_log, a, dt_bias, q, k, v, bgate, pool, idx, use_qk_l2norm_in_kernel=True
    )

    g, beta = fused_gdn_gating(A_log, a, bgate, dt_bias)
    o_chunk, s_chunk = chunk_gated_delta_rule(
        q, k, v, g, beta, chunk_size=8, use_qk_l2norm_in_kernel=True
    )
    np.testing.assert_allclose(np.asarray(o_rec), np.asarray(o_chunk), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pool_out), np.asarray(s_chunk), rtol=2e-3, atol=2e-3)


def test_triangular_inverse(rng):
    c = 32
    a = np.tril(rng.standard_normal((4, c, c)).astype(np.float32) * 0.3, -1)
    l = jnp.asarray(np.eye(c) + a, jnp.float32)
    inv = tri_inv.triangular_inverse(l)
    want = tri_inv.triangular_inverse_ref(l)
    np.testing.assert_allclose(np.asarray(inv), np.asarray(want, np.float32), rtol=1e-4, atol=1e-4)
    prod = np.einsum("bij,bjk->bik", np.asarray(l), np.asarray(inv))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(c), prod.shape), atol=1e-4)


def test_l2norm_and_layernorm_gated(rng):
    x = jnp.asarray(rng.standard_normal((6, 64)), jnp.float32)
    n = np.asarray(l2norm(x))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-4)

    w = jnp.asarray(rng.uniform(0.5, 1.5, 64), jnp.float32)
    z = jnp.asarray(rng.standard_normal((6, 64)), jnp.float32)
    y = layernorm_gated(x, w, None, z, group_size=16, norm_before_gate=True, is_rms_norm=True)
    xg = np.asarray(x).reshape(6, 4, 16)
    rms = xg / np.sqrt((xg ** 2).mean(-1, keepdims=True) + 1e-5)
    zn = np.asarray(z)
    want = rms.reshape(6, 64) * np.asarray(w) * zn * (1 / (1 + np.exp(-zn)))
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-4, atol=1e-4)


def test_chunk_gdn_varlen_matches_per_sequence(rng):
    """Packed varlen (boundary reset) == independent per-sequence runs."""
    from sgl_kernel_npu_tpu.ops.fla.chunk import chunk_gated_delta_rule_varlen

    h, kd, vd = 2, 16, 16
    lens = [10, 5, 17]
    cu = jnp.asarray(np.concatenate([[0], np.cumsum(lens)]), jnp.int32)
    t = sum(lens)
    q = jnp.asarray(rng.standard_normal((t, h, kd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, h, kd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, h, vd)) * 0.5, jnp.float32)
    g = jnp.asarray(-np.abs(rng.standard_normal((t, h))) * 0.2, jnp.float32)
    beta = jnp.asarray(rng.random((t, h)), jnp.float32)

    o, _ = chunk_gated_delta_rule_varlen(q, k, v, g, beta, cu, chunk_size=8,
                                         use_qk_l2norm_in_kernel=True)
    off = 0
    for ln in lens:
        sl = slice(off, off + ln)
        o_ref, _ = chunk_gated_delta_rule(
            q[None, sl], k[None, sl], v[None, sl], g[None, sl], beta[None, sl],
            chunk_size=8, use_qk_l2norm_in_kernel=True)
        np.testing.assert_allclose(
            np.asarray(o[sl]), np.asarray(o_ref[0]), rtol=3e-3, atol=3e-3,
        )
        off += ln
