import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops import quant


def test_quant_per_token_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((64, 896)) * 3, jnp.bfloat16)
    q, s = quant.quant_per_token(x)
    q_ref, s_ref = quant.quant_per_token_ref(x)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-6)
    # rounding ties may differ by 1 quantum between fused (XLA) and kernel paths
    diff = np.abs(np.asarray(q, np.int32) - np.asarray(q_ref, np.int32))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3
    deq = quant.dequant_per_token(q, s, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(deq), np.asarray(x, np.float32), atol=float(np.abs(x).max()) / 120
    )


def test_quant_zero_row():
    x = jnp.zeros((4, 256), jnp.float32)
    q, s = quant.quant_per_token(x)
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.isfinite(np.asarray(s)))
