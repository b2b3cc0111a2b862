"""Qwen3-Next GDN layer: streaming decode must reproduce prefill outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.models import qwen3_next as q3


def test_decode_matches_prefill(rng):
    cfg = q3.Qwen3NextConfig(hidden=64, num_k_heads=2, num_v_heads=4,
                             head_k_dim=16, head_v_dim=16, mlp_intermediate=128,
                             chunk_size=8)
    w = q3.init_weights(jax.random.key(0), cfg)
    b, s = 2, 16
    x = jnp.asarray(rng.standard_normal((b, s, cfg.hidden)) * 0.5, jnp.float32)

    full, conv_fin, ssm_fin = q3.prefill(cfg, w, x)

    conv_pool = jnp.zeros((b, cfg.qkv_dim, cfg.conv_width - 1), jnp.float32)
    ssm_pool = jnp.zeros((b, cfg.num_v_heads, cfg.head_k_dim, cfg.head_v_dim), jnp.float32)
    idx = jnp.arange(b, dtype=jnp.int32)
    outs = []
    for t in range(s):
        o, conv_pool, ssm_pool = q3.decode_step(cfg, w, x[:, t], conv_pool, ssm_pool, idx)
        outs.append(np.asarray(o))
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(conv_pool), np.asarray(conv_fin), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ssm_pool), np.asarray(ssm_fin), rtol=5e-3, atol=5e-3)
