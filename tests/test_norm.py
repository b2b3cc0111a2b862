"""Kernel-vs-golden tests for the norm fusions (pattern: SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import norm


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("rows,hidden", [(4, 256), (130, 1024), (1, 7168)])
def test_rms_norm(rng, dtype, rows, hidden):
    x = jnp.asarray(rng.standard_normal((rows, hidden)), dtype)
    w = jnp.asarray(rng.standard_normal((hidden,)), dtype)
    got = norm.rms_norm(x, w, 1e-6)
    want = norm.rms_norm_ref(x, w, 1e-6)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-2, rtol=1e-2)


@pytest.mark.parametrize("quantize", [False, True])
def test_add_rms_norm_bias(rng, quantize):
    rows, hidden = 33, 512
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((rows, hidden)), dt)
    res = jnp.asarray(rng.standard_normal((rows, hidden)), dt)
    w = jnp.asarray(rng.standard_normal((hidden,)), dt)
    b = jnp.asarray(rng.standard_normal((hidden,)) * 0.1, dt)
    qs = jnp.asarray(rng.uniform(5, 20, (hidden,)), jnp.float32) if quantize else None
    qo = jnp.asarray(rng.uniform(-1, 1, (hidden,)), jnp.float32) if quantize else None
    out, added = norm.add_rms_norm_bias(x, res, w, b, 1e-6, qs, qo)
    out_ref, added_ref = norm.add_rms_norm_bias_ref(x, res, w, b, 1e-6, qs, qo)
    np.testing.assert_allclose(
        np.asarray(added, np.float32), np.asarray(added_ref, np.float32), atol=1e-2
    )
    if quantize:
        assert out.dtype == jnp.int8
        # saturating-cast boundaries may differ by 1 ulp of int8
        assert np.mean(np.abs(np.asarray(out, np.int32) - np.asarray(out_ref, np.int32))) < 0.02
    else:
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(out_ref, np.float32), atol=4e-2
        )


def test_add_gemma_rms_norm(rng):
    rows, hidden = 9, 2048
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((rows, hidden)), dt)
    res = jnp.asarray(rng.standard_normal((rows, hidden)), dt)
    w = jnp.asarray(rng.standard_normal((hidden,)) * 0.2, dt)
    got_n, got_a = norm.add_gemma_rms_norm(x, w, res, 1e-6)
    want_n, want_a = norm.add_gemma_rms_norm_ref(x, w, res, 1e-6)
    np.testing.assert_allclose(np.asarray(got_a, np.float32), np.asarray(want_a, np.float32), atol=1e-2)
    np.testing.assert_allclose(np.asarray(got_n, np.float32), np.asarray(want_n, np.float32), atol=4e-2)


def test_l1_norm(rng):
    x = jnp.asarray(np.abs(rng.standard_normal((17, 384))) + 0.1, jnp.float32)
    got = norm.l1_norm(x)
    want = norm.l1_norm_ref(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_split_qkv_rmsnorm_rope(rng):
    from sgl_kernel_npu_tpu.ops.rope import rope_cos_sin

    b, hd, qh, kvh = 5, 64, 256, 128  # 4 q heads, 2 kv heads
    x = jnp.asarray(rng.standard_normal((b, qh + 2 * kvh)), jnp.float32)
    qw = jnp.asarray(rng.uniform(0.5, 1.5, hd), jnp.float32)
    kw = jnp.asarray(rng.uniform(0.5, 1.5, hd), jnp.float32)
    cos, sin = rope_cos_sin(jnp.arange(b), hd)
    q, k, v = norm.split_qkv_rmsnorm_rope(x, sin, cos, qh, kvh, hd, 1e-6, qw, kw)
    # v is a pure passthrough
    np.testing.assert_array_equal(np.asarray(v), np.asarray(x[:, qh + kvh :]))
    # manual golden for q head 1
    from sgl_kernel_npu_tpu.ops.rope import apply_rope

    xh = np.asarray(x[:, hd : 2 * hd], np.float32)
    var = (xh ** 2).mean(-1, keepdims=True)
    normed = xh / np.sqrt(var + 1e-6) * np.asarray(qw)
    want = np.asarray(apply_rope(jnp.asarray(normed)[:, None, :], cos, sin))[:, 0]
    np.testing.assert_allclose(np.asarray(q[:, hd : 2 * hd]), want, rtol=1e-4, atol=1e-4)
