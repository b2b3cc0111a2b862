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


@pytest.mark.parametrize(
    "mode", ["per_channel_symm", "per_channel_asymm", "per_token_symm"]
)
def test_batch_matmul_transpose_quant_modes(rng, mode):
    """Reference quantModeMap surface (batch_matmul_transpose.cpp:16-19)."""
    b, m, k, n = 4, 8, 64, 32
    a = jnp.asarray(rng.integers(-128, 128, (b, m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (m, k, n)), jnp.int8)
    ds = jnp.asarray(rng.random((m, n)).astype(np.float32) / 1000)
    bias = jnp.asarray(rng.integers(-50, 50, (m, n)), jnp.int32)
    pts = jnp.asarray(rng.random((b, m)).astype(np.float32))

    kw = {}
    acc = np.einsum(
        "bmk,mkn->bmn",
        np.asarray(a, np.int64),
        np.asarray(w, np.int64),
    ).astype(np.float64)
    if mode == "per_channel_asymm":
        kw["bias"] = bias
        acc = acc + np.asarray(bias, np.float64)[None]
    want = acc * np.asarray(ds, np.float64)[None]
    if mode == "per_token_symm":
        kw["per_token_scale"] = pts
        want = want * np.asarray(pts, np.float64)[:, :, None]

    got = mm.batch_matmul_transpose(
        a, w, jnp.float32, quant_mode=mode, de_scale=ds, **kw
    )
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=1e-5)


def test_batch_matmul_transpose_quant_1d_scales(rng):
    """[n] de_scale and [b] per-token scale broadcast forms."""
    b, m, k, n = 2, 4, 32, 16
    a = jnp.asarray(rng.integers(-128, 128, (b, m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (m, k, n)), jnp.int8)
    ds = jnp.asarray(rng.random(n).astype(np.float32) / 1000)
    pts = jnp.asarray(rng.random(b).astype(np.float32))
    got = mm.batch_matmul_transpose(
        a, w, jnp.float32, quant_mode="per_token_symm",
        de_scale=ds, per_token_scale=pts,
    )
    acc = np.einsum("bmk,mkn->bmn", np.asarray(a, np.int64), np.asarray(w, np.int64))
    want = (acc.astype(np.float64) * np.asarray(ds, np.float64)[None, None]
            * np.asarray(pts, np.float64)[:, None, None])
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=1e-5)
