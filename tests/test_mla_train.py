"""Differentiable MLA flash attention: fwd + custom_vjp bwd vs golden autodiff.

The reference has no training kernels at all; this is the TPU-native extension
that lets `models/deepseek_v3.train_forward` run flash attention (O(S) memory)
with hand-written Pallas backward kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops.attention.mla_train import mla_flash_train, mla_train_ref


def _inputs(rng, b, s, h, dl, dr, dtype=jnp.float32):
    mk = lambda *sh: jnp.asarray(rng.standard_normal(sh) * 0.3, dtype)
    return mk(b, s, h, dl), mk(b, s, h, dr), mk(b, s, dl), mk(b, s, dr)


@pytest.mark.parametrize("s,cq,ck", [(40, 16, 32), (64, 16, 16), (96, 32, 32)])
def test_forward_matches_ref(rng, s, cq, ck):
    ql, qp, kl, kp = _inputs(rng, 2, s, 4, 64, 32)
    out = mla_flash_train(ql, qp, kl, kp, 0.13, q_chunk=cq, k_chunk=ck)
    want = mla_train_ref(ql, qp, kl, kp, 0.13)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_grads_match_autodiff(rng):
    ql, qp, kl, kp = _inputs(rng, 2, 40, 4, 64, 32)
    sc = 0.13

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a, sc)))

    flash = lambda *a, **k: mla_flash_train(*a, **k, q_chunk=16, k_chunk=32)
    g1 = jax.grad(loss(flash), argnums=(0, 1, 2, 3))(ql, qp, kl, kp)
    g2 = jax.grad(loss(mla_train_ref), argnums=(0, 1, 2, 3))(ql, qp, kl, kp)
    for a, b in zip(g1, g2):
        rel = float(jnp.abs(a - b).max()) / max(float(jnp.abs(b).max()), 1e-6)
        assert rel < 1e-4


@pytest.mark.slow
def test_train_forward_flash_equals_dense(rng):
    """Whole-model training loss + grads identical via flash attention."""
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m

    cfg = m.DeepSeekV3Config(num_layers=1, vocab_size=64)
    params = m.init_weights(jax.random.key(0), cfg)
    toks = jnp.asarray(rng.integers(0, 64, (2, 24)), jnp.int32)
    l0, g0 = jax.value_and_grad(
        lambda p: m.train_forward(cfg, p, toks, mesh=None))(params)
    l1, g1 = jax.value_and_grad(
        lambda p: m.train_forward(cfg, p, toks, mesh=None, flash=True))(params)
    assert abs(float(l0) - float(l1)) < 1e-5
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_bf16_long_sequence(rng):
    """bf16 inputs, ragged S spanning several chunks."""
    ql, qp, kl, kp = _inputs(rng, 1, 200, 2, 64, 32, jnp.bfloat16)
    out = mla_flash_train(ql, qp, kl, kp, 0.1, q_chunk=32, k_chunk=64)
    want = mla_train_ref(ql, qp, kl, kp, 0.1)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(want, np.float32), atol=3e-2)
