import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops.mamba import causal_conv1d_fn, causal_conv1d_update


def _np_causal_conv(x, w, bias, init, act):
    b, d, t = x.shape
    width = w.shape[1]
    xp = np.concatenate([init, x], axis=-1)
    out = np.zeros((b, d, t), np.float32)
    for i in range(width):
        out += w[None, :, i : i + 1] * xp[:, :, i : i + t]
    if bias is not None:
        out += bias[None, :, None]
    if act:
        out = out / (1 + np.exp(-out)) * 1.0 if False else out * (1 / (1 + np.exp(-out)))
    return out


@pytest.mark.parametrize("use_init", [False, True])
def test_causal_conv1d_fn(rng, use_init):
    b, d, t, w = 2, 8, 20, 4
    x = rng.standard_normal((b, d, t)).astype(np.float32)
    weight = rng.standard_normal((d, w)).astype(np.float32)
    bias = rng.standard_normal(d).astype(np.float32)
    init = rng.standard_normal((b, d, w - 1)).astype(np.float32) if use_init else np.zeros((b, d, w - 1), np.float32)
    out, final = causal_conv1d_fn(
        jnp.asarray(x), jnp.asarray(weight), jnp.asarray(bias),
        jnp.asarray(init) if use_init else None,
        return_final_states=True, activation="silu",
    )
    want = _np_causal_conv(x, weight, bias, init, True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(final), np.concatenate([init, x], -1)[:, :, -(w - 1):], rtol=1e-5
    )


def test_causal_conv1d_update_matches_prefill(rng):
    """Streaming updates must reproduce the prefill outputs token by token."""
    b, d, t, w = 3, 4, 10, 4
    state_len = w - 1
    x = rng.standard_normal((b, d, t)).astype(np.float32)
    weight = rng.standard_normal((d, w)).astype(np.float32)
    bias = rng.standard_normal(d).astype(np.float32)
    full = causal_conv1d_fn(jnp.asarray(x), jnp.asarray(weight), jnp.asarray(bias),
                            activation="silu")
    pool = jnp.zeros((b, d, state_len), jnp.float32)
    idx = jnp.arange(b, dtype=jnp.int32)
    outs = []
    for i in range(t):
        o, pool = causal_conv1d_update(
            jnp.asarray(x[:, :, i]), pool, jnp.asarray(weight), jnp.asarray(bias),
            activation="silu", conv_state_indices=idx,
        )
        outs.append(np.asarray(o))
    got = np.stack(outs, axis=-1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=1e-4, atol=1e-5)


def test_causal_conv1d_update_pad_slot(rng):
    b, d, w = 2, 4, 4
    pool = jnp.asarray(rng.standard_normal((5, d, w - 1)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((d, w)), jnp.float32)
    idx = jnp.asarray([3, -1], jnp.int32)
    out, new_pool = causal_conv1d_update(x, pool, weight, conv_state_indices=idx)
    # padded row leaves the pool untouched everywhere except slot 3
    np.testing.assert_array_equal(
        np.delete(np.asarray(new_pool), 3, axis=0), np.delete(np.asarray(pool), 3, axis=0)
    )
    assert not np.allclose(np.asarray(new_pool)[3], np.asarray(pool)[3])


def test_causal_conv1d_mtp_rollback(rng):
    """Speculative decoding: resume from the window of the last accepted draft."""
    b, d, w = 2, 4, 4
    state_len, s_draft = w - 1, 3
    pool = jnp.zeros((b, d, state_len), jnp.float32)
    window_pool = jnp.zeros((b, s_draft, d, state_len), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((d, w)), jnp.float32)
    idx = jnp.arange(b, dtype=jnp.int32)

    # step 1: process 3 draft tokens, saving per-token windows
    xd = jnp.asarray(rng.standard_normal((b, d, s_draft)), jnp.float32)
    out1, pool1, window_pool = causal_conv1d_update(
        xd, pool, weight, activation=None, conv_state_indices=idx,
        intermediate_conv_window=window_pool,
    )
    # step 2: request 0 accepted 2 drafts, request 1 accepted 1
    acc = jnp.asarray([2, 1], jnp.int32)
    x2 = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    out2, _, _ = causal_conv1d_update(
        x2, pool1, weight, activation=None, conv_state_indices=idx,
        num_accepted_tokens=acc, intermediate_conv_window=window_pool,
    )
    # golden: recompute from scratch with only the accepted prefixes
    for bi, a in enumerate([2, 1]):
        seq = np.concatenate([np.asarray(xd)[bi, :, :a], np.asarray(x2)[bi][:, None]], -1)
        full = causal_conv1d_fn(jnp.asarray(seq)[None], weight, activation=None)
        np.testing.assert_allclose(
            np.asarray(out2)[bi], np.asarray(full)[0, :, -1], rtol=1e-5, atol=1e-6
        )
