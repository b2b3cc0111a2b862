"""mla_preprocess vs a from-scratch numpy golden (reference golden2_pytorch flow,
test_mla_preprocess.py:404-483)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops.attention import mla_preprocess as mp
from sgl_kernel_npu_tpu.ops.rope import rope_cos_sin

HID, HEADS, N = 512, 8, 16
Q_RMS = 1536


def _np_rmsnorm(x, g, eps=1e-6):
    x = x.astype(np.float32)
    var = (x * x).mean(-1, keepdims=True, dtype=np.float32)
    return (x / np.sqrt(var + eps)) * g


def _close(got, want, tol):
    """Robust closeness: ±1-quantum flips at int8 rounding ties are tolerated
    (reference uses cosine/ratio metrics for the same reason)."""
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    scale = np.abs(want).mean() + 1e-9
    rel = np.abs(got - want) / scale
    assert np.mean(rel) < tol, f"mean rel {np.mean(rel)} > {tol}"
    assert np.quantile(rel, 0.999) < 50 * tol, f"q999 {np.quantile(rel, 0.999)}"


def _np_quant(x, scale, zp):
    return np.clip(np.round(x / scale + zp), -128, 127).astype(np.int8)


def _np_gemm_deq(a, w, ds, b):
    return (a.astype(np.int32) @ w.astype(np.int32).T + b) * ds


def _np_rope(x, cos, sin):
    half = x.shape[-1] // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], -1)
    return x * cos[:, None, :] + rot * sin[:, None, :]


@pytest.mark.parametrize("cache_mode", ["krope_ctkv", "int8_nzcache"])
def test_mla_preprocess_golden(rng, cache_mode):
    hidden = rng.standard_normal((N, HID)).astype(np.float32)
    w = mp.MlaPreprocessWeights(
        gamma1=jnp.asarray(rng.uniform(0.5, 1.5, HID), jnp.float32),
        beta1=jnp.asarray(rng.uniform(-0.1, 0.1, HID), jnp.float32),
        qscale1=jnp.float32(0.05),
        qoffset1=jnp.float32(0.0),
        wdqkv=jnp.asarray(rng.integers(-16, 16, (2112, HID)), jnp.int8),
        descale1=jnp.asarray(rng.random(2112) / 1000, jnp.float32),
        bias1=jnp.asarray(rng.integers(-10, 10, 2112), jnp.int32),
        gamma2=jnp.asarray(rng.uniform(0.5, 1.5, Q_RMS), jnp.float32),
        beta2=jnp.asarray(rng.uniform(-0.1, 0.1, Q_RMS), jnp.float32),
        qscale2=jnp.float32(0.02),
        qoffset2=jnp.float32(0.0),
        wuq=jnp.asarray(rng.integers(-16, 16, (HEADS * 192, Q_RMS)), jnp.int8),
        descale2=jnp.asarray(rng.random(HEADS * 192) / 1000, jnp.float32),
        bias2=jnp.asarray(rng.integers(-10, 10, HEADS * 192), jnp.int32),
        gamma3=jnp.asarray(rng.uniform(0.5, 1.5, 512), jnp.float32),
        wuk=jnp.asarray(rng.standard_normal((HEADS, 128, 512)) * 0.05, jnp.float32),
        qnope_scale=jnp.asarray(rng.uniform(0.5, 1.0, HEADS), jnp.float32),
        ctkv_scale=jnp.float32(0.8),
    )
    pages, page = 8, 16
    nope_dtype = jnp.int8 if cache_mode == "int8_nzcache" else jnp.float32
    cache_n = jnp.zeros((pages, 1, page, 512), nope_dtype)
    cache_r = jnp.zeros((pages, 1, 64, page), jnp.float32)
    slots = jnp.asarray(rng.choice(pages * page, N, replace=False), jnp.int32)
    cos, sin = rope_cos_sin(jnp.arange(N), 64)

    q_nope, q_pe, out_n, out_r = mp.mla_preprocess(
        jnp.asarray(hidden), w, (cos, sin), cache_n, cache_r, slots,
        cache_mode=cache_mode,
    )

    # ---- numpy golden ----
    wn = {k: np.asarray(v) for k, v in w._asdict().items()}
    x1 = _np_rmsnorm(hidden, wn["gamma1"]) + wn["beta1"]
    fused = _np_gemm_deq(_np_quant(x1, 0.05, 0.0), wn["wdqkv"], wn["descale1"], wn["bias1"])
    ckv, k_pe, cq = fused[:, :512], fused[:, 512:576][:, None], fused[:, 576:]
    q = _np_rmsnorm(cq.astype(np.float32), wn["gamma2"]) + wn["beta2"]
    q_out = _np_gemm_deq(_np_quant(q, 0.02, 0.0), wn["wuq"], wn["descale2"], wn["bias2"])
    q_out = q_out.reshape(N, HEADS, 192)
    qn, qp = q_out[..., :128], q_out[..., 128:]
    cosn, sinn = np.asarray(cos), np.asarray(sin)
    qp = _np_rope(qp, cosn, sinn)
    kp = _np_rope(k_pe, cosn, sinn)
    qn_out = np.einsum("nhk,hkd->nhd", qn, wn["wuk"])
    kn = _np_rmsnorm(ckv.astype(np.float32), wn["gamma3"])[:, None]
    if cache_mode == "int8_nzcache":
        qn_out = np.clip(np.round(qn_out * wn["qnope_scale"][None, :, None]), -128, 127)
        kn = np.clip(np.round(kn / wn["ctkv_scale"]), -128, 127)

    _close(q_pe, qp, 1e-3)
    _close(q_nope, qn_out, 1e-2 if cache_mode == "int8_nzcache" else 1e-3)
    # cache contents at the mapped slots
    on, orr = np.asarray(out_n, np.float32), np.asarray(out_r)
    sl = np.asarray(slots)
    got_n = np.stack([on[s // page, 0, s % page] for s in sl])
    got_r = np.stack([orr[s // page, 0, :, s % page] for s in sl])
    _close(got_n, kn[:, 0], 1e-2 if cache_mode == "int8_nzcache" else 1e-3)
    _close(got_r, kp[:, 0], 1e-3)
