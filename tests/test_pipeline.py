"""GPipe-style pipeline over the virtual mesh vs sequential stage application."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.parallel.pipeline import pipeline_forward

R = 8


def _stage_fn(sp, x):
    h = jnp.tanh(x @ sp["w1"] + sp["b1"])
    return h @ sp["w2"]


@pytest.mark.parametrize("num_micro", [8, 16])
def test_pipeline_matches_sequential(mesh8, rng, num_micro):
    d, dh, b = 32, 64, 32
    params = {
        "w1": jnp.asarray(rng.standard_normal((R, d, dh)) * 0.3, jnp.float32),
        "b1": jnp.asarray(rng.standard_normal((R, dh)) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((R, dh, d)) * 0.3, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    got = pipeline_forward(
        _stage_fn, params, x, mesh=mesh8, axis_name="ep", num_micro=num_micro
    )

    want = x
    for s in range(R):
        sp = jax.tree.map(lambda a, s=s: a[s], params)
        want = _stage_fn(sp, want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_pipeline_under_jit_and_grad(mesh8, rng):
    """The schedule is scan-based: differentiable and jit-safe."""
    d, dh, b, m = 16, 16, 16, 8
    params = {
        "w1": jnp.asarray(rng.standard_normal((R, d, dh)) * 0.3, jnp.float32),
        "b1": jnp.zeros((R, dh), jnp.float32),
        "w2": jnp.asarray(rng.standard_normal((R, dh, d)) * 0.3, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    @jax.jit
    def loss(p, xx):
        y = pipeline_forward(_stage_fn, p, xx, mesh=mesh8, axis_name="ep", num_micro=m)
        return jnp.sum(y * y)

    g = jax.grad(loss)(params, x)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    # gradient must match the sequential model's gradient
    def loss_seq(p, xx):
        y = xx
        for s in range(R):
            sp = jax.tree.map(lambda a, s=s: a[s], p)
            y = _stage_fn(sp, y)
        return jnp.sum(y * y)

    g_seq = jax.grad(loss_seq)(params, x)
    for a, bb in zip(jax.tree.leaves(g), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), rtol=1e-4, atol=1e-4)
