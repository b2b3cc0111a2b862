import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops import rope


def test_rope_rotation_preserves_norm(rng):
    pos = jnp.arange(16)
    cos, sin = rope.rope_cos_sin(pos, 64)
    x = jnp.asarray(rng.standard_normal((16, 4, 64)), jnp.float32)
    y = rope.apply_rope(x, cos, sin)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        rtol=1e-5,
    )


def test_rope_position_zero_identity(rng):
    cos, sin = rope.rope_cos_sin(jnp.zeros(3, jnp.int32), 32)
    x = jnp.asarray(rng.standard_normal((3, 2, 32)), jnp.float32)
    np.testing.assert_allclose(np.asarray(rope.apply_rope(x, cos, sin)), np.asarray(x), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rope.apply_rope_interleaved(x, cos, sin)), np.asarray(x), atol=1e-6
    )


def test_rope_relative_shift(rng):
    """RoPE inner products depend only on relative position."""
    dim = 64
    q = jnp.asarray(rng.standard_normal((1, 1, dim)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, dim)), jnp.float32)
    for m, n, shift in [(3, 7, 5), (0, 4, 10)]:
        cm, sm = rope.rope_cos_sin(jnp.array([m]), dim)
        cn, sn = rope.rope_cos_sin(jnp.array([n]), dim)
        cms, sms = rope.rope_cos_sin(jnp.array([m + shift]), dim)
        cns, sns = rope.rope_cos_sin(jnp.array([n + shift]), dim)
        d1 = np.sum(np.asarray(rope.apply_rope(q, cm, sm)) * np.asarray(rope.apply_rope(k, cn, sn)))
        d2 = np.sum(
            np.asarray(rope.apply_rope(q, cms, sms)) * np.asarray(rope.apply_rope(k, cns, sns))
        )
        np.testing.assert_allclose(d1, d2, rtol=1e-4)
