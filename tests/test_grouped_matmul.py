import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops import grouped_matmul as gm
from sgl_kernel_npu_tpu.ops.quant import quant_per_token_ref


def _groups(rng, g, total):
    """Random group sizes summing to ≤ total (leaves a zero tail)."""
    sizes = rng.multinomial(total - 32, np.ones(g) / g)
    return sizes.astype(np.int32)


@pytest.mark.parametrize("g,s,k,n", [(4, 256, 128, 128), (8, 512, 256, 256)])
def test_gmm_bf16_matches_ragged_dot(rng, g, s, k, n):
    sizes = _groups(rng, g, s)
    x = jnp.asarray(rng.standard_normal((s, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((g, k, n)) * 0.1, jnp.float32)
    gs = jnp.asarray(sizes)
    got = gm.grouped_matmul(x, w, gs, tm=64, tk=128, tn=128)
    want = gm.grouped_matmul_ref(x, w, gs)
    total = int(sizes.sum())
    np.testing.assert_allclose(
        np.asarray(got[:total]), np.asarray(want[:total]), rtol=2e-2, atol=2e-2
    )
    # rows past the ragged total are zero-filled
    assert np.all(np.asarray(got[total:]) == 0)


def test_gmm_handles_empty_groups(rng):
    g, s, k, n = 6, 192, 128, 128
    sizes = np.array([64, 0, 50, 0, 0, 14], np.int32)
    x = jnp.asarray(rng.standard_normal((s, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((g, k, n)) * 0.1, jnp.float32)
    gs = jnp.asarray(sizes)
    got = gm.grouped_matmul(x, w, gs, tm=64, tk=128, tn=128)
    want = gm.grouped_matmul_ref(x, w, gs)
    total = int(sizes.sum())
    np.testing.assert_allclose(
        np.asarray(got[:total]), np.asarray(want[:total]), rtol=2e-2, atol=2e-2
    )


def test_gmm_int8_dequant(rng):
    g, s, k, n = 4, 256, 128, 128
    sizes = _groups(rng, g, s)
    xf = rng.standard_normal((s, k)).astype(np.float32)
    wf = (rng.standard_normal((g, k, n)) * 0.05).astype(np.float32)
    x_q, sx = quant_per_token_ref(jnp.asarray(xf))
    # per-channel symmetric weight quant
    sw = np.abs(wf).max(axis=1) / 127.0  # [g, n]
    w_q = np.clip(np.round(wf / sw[:, None, :]), -128, 127).astype(np.int8)
    gs = jnp.asarray(sizes)
    got = gm.grouped_matmul(
        x_q, jnp.asarray(w_q), gs, sx, jnp.asarray(sw), epilogue="dequant",
        tm=64, tk=128, tn=128, out_dtype=jnp.float32,
    )
    want = gm.gmm_dequant_ref(x_q, jnp.asarray(w_q), gs, sx, jnp.asarray(sw))
    total = int(sizes.sum())
    np.testing.assert_allclose(
        np.asarray(got[:total]), np.asarray(want[:total]), rtol=1e-3, atol=1e-3
    )
    # and dequantized result ≈ the fp32 matmul
    dense = gm.grouped_matmul_ref(jnp.asarray(xf), jnp.asarray(wf), gs)
    err = np.abs(np.asarray(got[:total]) - np.asarray(dense[:total]))
    assert err.mean() < 0.05 * np.abs(np.asarray(dense[:total])).mean() + 1e-3


def test_gmm_dequant_swiglu(rng):
    g, s, k, i = 4, 128, 128, 256
    tn = 128
    sizes = _groups(rng, g, s)
    xf = rng.standard_normal((s, k)).astype(np.float32)
    wg = (rng.standard_normal((g, k, i)) * 0.05).astype(np.float32)
    wu = (rng.standard_normal((g, k, i)) * 0.05).astype(np.float32)
    x_q, sx = quant_per_token_ref(jnp.asarray(xf))

    sg = np.abs(wg).max(axis=1) / 127.0
    su = np.abs(wu).max(axis=1) / 127.0
    wg_q = np.clip(np.round(wg / sg[:, None, :]), -128, 127).astype(np.int8)
    wu_q = np.clip(np.round(wu / su[:, None, :]), -128, 127).astype(np.int8)

    w_packed = gm.pack_gmm1_weights(jnp.asarray(wg_q), jnp.asarray(wu_q), tn)
    s_packed = gm.pack_gmm1_scales(jnp.asarray(sg), jnp.asarray(su), tn)
    gs = jnp.asarray(sizes)
    got = gm.grouped_matmul(
        x_q, w_packed, gs, sx, s_packed, epilogue="dequant_swiglu",
        tm=64, tk=128, tn=tn, out_dtype=jnp.float32,
    )
    assert got.shape == (s, i)
    # golden: dequant gmm for gate and up separately, then swiglu
    gate = gm.gmm_dequant_ref(x_q, jnp.asarray(wg_q), gs, sx, jnp.asarray(sg))
    up = gm.gmm_dequant_ref(x_q, jnp.asarray(wu_q), gs, sx, jnp.asarray(su))
    want = np.asarray(gate) * (1 / (1 + np.exp(-np.asarray(gate)))) * np.asarray(up)
    total = int(sizes.sum())
    np.testing.assert_allclose(np.asarray(got[:total]), want[:total], rtol=5e-3, atol=5e-3)


def test_auto_tile_selection(rng):
    """Auto-selected tiles produce identical results; selector respects VMEM."""
    g, s, k, n = 4, 256, 512, 512
    sizes = _groups(rng, g, s)
    x = jnp.asarray(rng.standard_normal((s, k)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((g, k, n)) * 0.1, jnp.float32)
    gs = jnp.asarray(sizes)
    auto = gm.grouped_matmul(x, w, gs)          # tiles auto-selected
    manual = gm.grouped_matmul(x, w, gs, tm=64, tk=128, tn=128)
    total = int(sizes.sum())
    np.testing.assert_allclose(
        np.asarray(auto[:total]), np.asarray(manual[:total]), rtol=2e-2, atol=2e-2
    )
    tm, tk, tn = gm.select_gmm_tiles(s, k, n, jnp.int8)
    esize = 1
    assert 2 * (tm * tk + tk * tn) * esize + tm * tn * (4 + esize) <= 8 * 2**20


def test_gmm_dequant_swiglu_quant(rng):
    """Fused GMM1+dequant+SwiGLU+per-token-quant == unfused swiglu + requant."""
    from sgl_kernel_npu_tpu.ops.quant import INT8_MAX, saturate_int8

    g, s, k, i = 4, 128, 128, 256
    n = 2 * i
    sizes = _groups(rng, g, s)
    xf = rng.standard_normal((s, k)).astype(np.float32)
    wg = (rng.standard_normal((g, k, i)) * 0.05).astype(np.float32)
    wu = (rng.standard_normal((g, k, i)) * 0.05).astype(np.float32)
    x_q, sx = quant_per_token_ref(jnp.asarray(xf))
    sg = np.abs(wg).max(axis=1) / 127.0
    su = np.abs(wu).max(axis=1) / 127.0
    wg_q = np.clip(np.round(wg / sg[:, None, :]), -128, 127).astype(np.int8)
    wu_q = np.clip(np.round(wu / su[:, None, :]), -128, 127).astype(np.int8)

    w_packed = gm.pack_gmm1_weights(jnp.asarray(wg_q), jnp.asarray(wu_q), n)
    s_packed = gm.pack_gmm1_scales(jnp.asarray(sg), jnp.asarray(su), n)
    gs = jnp.asarray(sizes)
    q, scales = gm.grouped_matmul(
        x_q, w_packed, gs, sx, s_packed, epilogue="dequant_swiglu_quant",
        tm=64, tk=128,
    )
    assert q.shape == (s, i) and q.dtype == jnp.int8 and scales.shape == (s,)
    # golden: unfused dequant gmm → swiglu → per-token requant
    gate = gm.gmm_dequant_ref(x_q, jnp.asarray(wg_q), gs, sx, jnp.asarray(sg))
    up = gm.gmm_dequant_ref(x_q, jnp.asarray(wu_q), gs, sx, jnp.asarray(su))
    h = np.asarray(gate) * (1 / (1 + np.exp(-np.asarray(gate)))) * np.asarray(up)
    s2 = np.maximum(np.abs(h).max(-1) / 127.0, 1e-12)
    q_ref = np.clip(np.round(h / s2[:, None]), -128, 127)
    total = int(sizes.sum())
    deq = np.asarray(q, np.float32)[:total] * np.asarray(scales)[:total, None]
    deq_ref = q_ref[:total] * s2[:total, None]
    np.testing.assert_allclose(deq, deq_ref, rtol=5e-3, atol=5e-3)
    # rows past the total are zero, scales zero
    if total < s:
        assert (np.asarray(q)[total:] == 0).all()
        assert (np.asarray(scales)[total:] == 0).all()


def test_gmm_dispatch_p_matches_gathered(rng):
    """In-kernel one-hot dispatch (P @ x on the MXU) == XLA row gather + GMM."""
    g, n_tok, k_top, kd, n = 4, 32, 4, 256, 512
    rows = n_tok * k_top
    x = jnp.asarray(rng.integers(-128, 128, (n_tok, kd)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (g, kd, n)), jnp.int8)
    tok_of_row = jnp.asarray(rng.integers(0, n_tok, (rows,)), jnp.int32)
    gs = jnp.array([40, 0, 50, 38], jnp.int32)
    sx = jnp.abs(jnp.asarray(rng.standard_normal(rows), jnp.float32)) + 0.1
    sw = jnp.abs(jnp.asarray(rng.standard_normal((g, n)), jnp.float32)) + 0.1
    p_mat = gm.dispatch_onehot(tok_of_row, n_tok)
    want = gm.grouped_matmul(
        x[tok_of_row], w, gs, sx, sw, epilogue="dequant", tm=64, tk=128, tn=128
    )
    got = gm.grouped_matmul(
        x, w, gs, sx, sw, epilogue="dequant", dispatch_p=p_mat,
        tm=64, tk=128, tn=128,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_gmm_combine_fused_matches_unfused(rng):
    """GMM2 + weighted combine in one kernel == dequant GMM then mask @ y."""
    g, n_tok, k_top, kd, n = 4, 24, 4, 256, 384
    rows = n_tok * k_top
    sizes = np.array([30, 26, 0, 40], np.int32)  # ragged, zero tail
    x = jnp.asarray(rng.integers(-128, 128, (rows, kd)), jnp.int8)
    w = jnp.asarray(rng.integers(-128, 128, (g, kd, n)), jnp.int8)
    gs = jnp.asarray(sizes)
    sx = jnp.abs(jnp.asarray(rng.standard_normal(rows), jnp.float32)) * 0.01 + 0.001
    sw = jnp.abs(jnp.asarray(rng.standard_normal((g, n)), jnp.float32)) * 0.01
    # each token combines k_top random sorted slots with random weights
    total = int(sizes.sum())
    mask_np = np.zeros((n_tok, rows), np.float32)
    for t in range(n_tok):
        slots = rng.choice(total, k_top, replace=False)
        mask_np[t, slots] = rng.random(k_top)
    mask = jnp.asarray(mask_np)
    m_hi = mask.astype(jnp.bfloat16)
    m_lo = (mask - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    y = gm.grouped_matmul(
        x, w, gs, sx, sw, epilogue="dequant", out_dtype=jnp.bfloat16,
        tm=64, tk=128, tn=128,
    )
    want = jnp.asarray(m_hi) @ y.astype(jnp.float32) + m_lo @ y.astype(jnp.float32)
    got = gm.grouped_matmul_combine(
        x, w, gs, sx, sw, m_hi, m_lo, tm=64, tk=128, tn=128
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_gmm_train_grads_match_ragged_dot(rng):
    """custom_vjp (Pallas fwd + dx, ragged-contracting dw) == XLA autodiff."""
    import jax

    g, s, k, n = 4, 128, 256, 128
    sizes = np.array([40, 0, 50, 38], np.int32)
    x = jnp.asarray(rng.standard_normal((s, k)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((g, k, n)) * 0.1, jnp.bfloat16)
    gs = jnp.asarray(sizes)

    def loss_pallas(x, w):
        return jnp.sum(jnp.square(gm.gmm_train(x, w, gs)))

    def loss_ref(x, w):
        return jnp.sum(jnp.square(
            jax.lax.ragged_dot(x, w, gs, preferred_element_type=jnp.float32)))

    lp, (dxp, dwp) = jax.value_and_grad(loss_pallas, argnums=(0, 1))(x, w)
    lr, (dxr, dwr) = jax.value_and_grad(loss_ref, argnums=(0, 1))(x, w)
    assert abs(float(lp - lr)) / (abs(float(lr)) + 1e-9) < 1e-5
    for a, b in ((dxp, dxr), (dwp, dwr)):
        ra, rb = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.abs(ra - rb).mean() / (np.abs(rb).mean() + 1e-9) < 5e-3
