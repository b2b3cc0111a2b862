import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import activation


@pytest.mark.parametrize("group_list_type", [0, 1])
@pytest.mark.parametrize("need_quant", [True, False])
def test_swiglu_quant(rng, group_list_type, need_quant):
    rows, h = 96, 512
    x = jnp.asarray(rng.standard_normal((rows, h)) * 2, jnp.bfloat16)
    counts = np.array([20, 0, 37, 11], np.int32)  # 68 valid rows of 96
    gl = jnp.asarray(np.cumsum(counts) if group_list_type == 0 else counts)
    out, scale = activation.swiglu_quant(x, gl, group_list_type, need_quant)
    out_ref, scale_ref = activation.swiglu_quant_ref(x, gl, group_list_type, need_quant)
    valid = int(counts.sum())
    if need_quant:
        assert out.dtype == jnp.int8
        np.testing.assert_allclose(
            np.asarray(scale[:valid]), np.asarray(scale_ref[:valid]), rtol=1e-5
        )
        diff = np.abs(np.asarray(out[:valid], np.int32) - np.asarray(out_ref[:valid], np.int32))
        assert diff.mean() < 0.02
        # dequantized accuracy vs fp32 swiglu
        deq = np.asarray(out[:valid], np.float32) * np.asarray(scale[:valid])[:, None]
        golden = np.asarray(activation.swiglu_ref(x.astype(jnp.float32)))[:valid]
        np.testing.assert_allclose(deq, golden, atol=np.abs(golden).max() / 100)
    else:
        np.testing.assert_allclose(
            np.asarray(out[:valid], np.float32),
            np.asarray(out_ref[:valid], np.float32),
            atol=2e-2,
        )
    # invalid rows zeroed
    assert np.all(np.asarray(out[valid:], np.float32) == 0)


def test_swiglu_oai(rng):
    rows, h = 40, 768
    x = jnp.asarray(rng.standard_normal((rows, h)) * 4, jnp.float32)
    got = activation.swiglu_oai(x, 1.702, 7.0)
    want = activation.swiglu_oai_ref(x, 1.702, 7.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
