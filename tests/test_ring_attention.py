"""Ring (context-parallel) attention vs full-sequence golden on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.parallel.ring_attention import (
    ring_attention_ref,
    ring_attention_sharded,
)

R = 8


@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 2)])
@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full(mesh8, rng, hq, hkv, causal):
    b, tl, d = 2, 16, 32
    t = R * tl
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, d)) * 0.5, jnp.float32)
    sm = 1.0 / np.sqrt(d)

    got = ring_attention_sharded(
        q, k, v, mesh=mesh8, axis_name="ep", sm_scale=sm, causal=causal
    )
    want = ring_attention_ref(q, k, v, sm, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_ring_first_token_isolation(mesh8, rng):
    """Causal: token 0 must attend only to itself, across rank boundaries."""
    b, tl, h, d = 1, 8, 4, 32
    t = R * tl
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    out = ring_attention_sharded(
        q, k, v, mesh=mesh8, axis_name="ep", sm_scale=0.2, causal=True
    )
    np.testing.assert_allclose(
        np.asarray(out)[0, 0], np.asarray(v)[0, 0], rtol=1e-5, atol=1e-5
    )
