"""Chip profile of mla_preprocess stages (scan-marginal per-stage timing).

Finds where the 83 µs vs 27 µs weight-read floor goes (PERF.md).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_scanned
from sgl_kernel_npu_tpu.ops.attention import mla_preprocess as mp
from sgl_kernel_npu_tpu.ops.matmul import quant_matmul, quant_per_tensor
from sgl_kernel_npu_tpu.ops.norm import rms_norm_ref
from sgl_kernel_npu_tpu.ops.rope import rope_cos_sin


def main():
    rng = np.random.default_rng(0)
    n, hidden, heads = 128, 7168, 16
    ki = lambda *s: jnp.asarray(rng.integers(-100, 100, s), jnp.int8)
    kf = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)

    w = mp.MlaPreprocessWeights(
        gamma1=kf(hidden) + 1, beta1=kf(hidden), qscale1=jnp.float32(0.01),
        qoffset1=jnp.float32(0), wdqkv=ki(2112, hidden), descale1=kf(2112) / 50,
        bias1=jnp.zeros((2112,), jnp.int32), gamma2=kf(1536) + 1, beta2=kf(1536),
        qscale2=jnp.float32(0.01), qoffset2=jnp.float32(0),
        wuq=ki(heads * 192, 1536), descale2=kf(heads * 192) / 50,
        bias2=jnp.zeros((heads * 192,), jnp.int32), gamma3=kf(512) + 1,
        wuk=jnp.asarray(rng.standard_normal((heads, 128, 512)) * 0.05, jnp.bfloat16),
    )
    pages, page = 64, 128
    kvn = jnp.zeros((pages, 1, page, 512), jnp.bfloat16)
    kvr = jnp.zeros((pages, 1, 64, page), jnp.bfloat16)
    slots = jnp.asarray(rng.permutation(pages * page)[:n], jnp.int32)
    pos = jnp.asarray(rng.integers(0, 4096, n), jnp.int32)
    cos_sin = rope_cos_sin(pos, 64)

    n1, n2 = 8, 264   # wide spread: marginal must dwarf tunnel jitter
    hs = jnp.asarray(rng.standard_normal((n1, n, hidden)) * 0.5, jnp.bfloat16)
    hb = jnp.asarray(rng.standard_normal((n2, n, hidden)) * 0.5, jnp.bfloat16)

    def t(name, fn, *ops):
        dt = _bench_scanned(fn, hs, hb, ops)
        print(f"{name:28s} {dt*1e6:8.1f} us")
        return dt

    # full op (no donation inside scan)
    t("full mla_preprocess", lambda h, kn, kr: mp.mla_preprocess(
        h, w, cos_sin, kn, kr, slots)[0], kvn, kvr)

    # stage 1: norm+quant+gemm1
    def s1(h):
        x1 = rms_norm_ref(h, w.gamma1, 1e-6) + w.beta1.astype(h.dtype)
        x1q = quant_per_tensor(x1, w.qscale1, w.qoffset1)
        return quant_matmul(x1q, w.wdqkv, w.descale1, w.bias1, out_dtype=jnp.float32)
    t("norm+quant+gemm1", lambda h: s1(h))

    t("gemm1 only", lambda xq: quant_matmul(
        xq, w.wdqkv, w.descale1, w.bias1, out_dtype=jnp.float32),
      ) if False else None
    xqs = jnp.asarray(rng.integers(-100, 100, (n1, n, hidden)), jnp.int8)
    xqb = jnp.asarray(rng.integers(-100, 100, (n2, n, hidden)), jnp.int8)
    dt = _bench_scanned(lambda xq: quant_matmul(
        xq, w.wdqkv, w.descale1, w.bias1, out_dtype=jnp.float32), xqs, xqb, ())
    print(f"{'gemm1 only':28s} {dt*1e6:8.1f} us")

    # stage 2: norm+quant+gemm2 from a [n,1536] input
    cqs = jnp.asarray(rng.standard_normal((n1, n, 1536)), jnp.float32)
    cqb = jnp.asarray(rng.standard_normal((n2, n, 1536)), jnp.float32)

    def s2(cq):
        q = rms_norm_ref(cq.astype(jnp.bfloat16), w.gamma2, 1e-6) + w.beta2.astype(jnp.float32)
        qq = quant_per_tensor(q, w.qscale2, w.qoffset2)
        return quant_matmul(qq, w.wuq, w.descale2, w.bias2, out_dtype=jnp.float32)
    dt = _bench_scanned(lambda cq: s2(cq), cqs, cqb, ())
    print(f"{'norm+quant+gemm2':28s} {dt*1e6:8.1f} us")

    qq2s = jnp.asarray(rng.integers(-100, 100, (n1, n, 1536)), jnp.int8)
    qq2b = jnp.asarray(rng.integers(-100, 100, (n2, n, 1536)), jnp.int8)
    dt = _bench_scanned(lambda qq: quant_matmul(
        qq, w.wuq, w.descale2, w.bias2, out_dtype=jnp.float32), qq2s, qq2b, ())
    print(f"{'gemm2 only':28s} {dt*1e6:8.1f} us")

    # stage 3: wuk einsum
    qns = jnp.asarray(rng.standard_normal((n1, n, heads, 128)), jnp.float32)
    qnb = jnp.asarray(rng.standard_normal((n2, n, heads, 128)), jnp.float32)
    dt = _bench_scanned(lambda qn: jnp.einsum(
        "nhk,hkd->nhd", qn, w.wuk.astype(jnp.float32),
        preferred_element_type=jnp.float32), qns, qnb, ())
    print(f"{'wuk einsum':28s} {dt*1e6:8.1f} us")

    # stage 4: rope + rmsnorm(ckv) + cache writes
    fs = jnp.asarray(rng.standard_normal((n1, n, 2112)), jnp.float32)
    fb = jnp.asarray(rng.standard_normal((n2, n, 2112)), jnp.float32)

    def s4(fused, kn, kr):
        from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import (
            reshape_and_cache, reshape_and_cache_transposed)
        from sgl_kernel_npu_tpu.ops.rope import apply_rope
        ckv = fused[:, :512]
        k_pe = fused[:, 512:576][:, None, :]
        k_pe = apply_rope(k_pe.astype(jnp.bfloat16), *cos_sin)
        k_nope = rms_norm_ref(ckv.astype(jnp.bfloat16), w.gamma3, 1e-6)[:, None, :]
        a = reshape_and_cache(k_nope.astype(jnp.bfloat16), kn, slots)
        b = reshape_and_cache_transposed(k_pe.astype(jnp.bfloat16), kr, slots)
        return a[..., :1] + b[..., :1].transpose(0, 1, 3, 2)
    dt = _bench_scanned(lambda f, kn, kr: s4(f, kn, kr), fs, fb, (kvn, kvr))
    print(f"{'rope+norm+cache-writes':28s} {dt*1e6:8.1f} us")


if __name__ == "__main__":
    main()
