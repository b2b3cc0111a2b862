import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import matmul as mm


@pytest.mark.parametrize("m,k,n,bias", [(16, 256, 128, True), (33, 512, 256, False)])
def test_quant_matmul(rng, m, k, n, bias):
    x = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (n, k)), jnp.int8)
    ds = jnp.asarray(rng.random(n) / 1000, jnp.float32)
    b = jnp.asarray(rng.integers(-10, 10, n), jnp.int32) if bias else None
    got = mm.quant_matmul(x, w, ds, b, out_dtype=jnp.float32, tm=32, tn=128, tk=256)
    want = mm.quant_matmul_ref(x, w, ds, b, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_quant_per_tensor():
    x = jnp.asarray([[0.5, -3.7, 100.0]], jnp.float32)
    q = mm.quant_per_tensor(x, 0.5, 1.0)
    np.testing.assert_array_equal(np.asarray(q), [[2, -6, 127]])


def test_batch_matmul_transpose(rng):
    b, m, k, n = 8, 16, 64, 32
    a = jnp.asarray(rng.standard_normal((b, m, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((m, k, n)), jnp.float32)
    got = mm.batch_matmul_transpose(a, w)
    want = np.einsum("bmk,mkn->bmn", np.asarray(a), np.asarray(w))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
