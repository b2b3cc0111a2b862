"""Chip smoke + bench: single-kernel fused dispatch→GMM1 (self-loop, 1 device).

Validates the semaphore-gated K-chunk pipeline against the plain grouped-GEMM
reference, then times it against grouped_matmul on the same data (the payload
transfer rides inside the kernel — at self-loop bandwidth the overlap should
make the fused time ≈ the GMM-alone time).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel.fused_kernel import fused_dispatch_gmm1_rank


def run(e_local, seg, h, n, label):
    rng = np.random.default_rng(0)
    r = 1
    er = e_local * seg
    xs = jnp.asarray(rng.integers(-100, 100, (r, er, h)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-100, 100, (e_local, h, n)), jnp.int8)
    sw = jnp.asarray(rng.random((e_local, n)).astype(np.float32) / 100)
    sx = jnp.asarray(rng.random((e_local, r * seg)).astype(np.float32) / 100)

    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))

    @jax.jit
    def fused(xs_, w1_, sw_, sx_):
        return jax.shard_map(
            lambda a, b, c, d: fused_dispatch_gmm1_rank(
                a, b, c, d, axis_name="ep", num_ranks=1, seg=seg),
            mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P(),
            check_vma=False,
        )(xs_, w1_, sw_, sx_)

    got = np.asarray(fused(xs, w1, sw, sx), np.float32)

    # golden: per-expert dequantized GEMM over the same rows
    want = np.zeros_like(got)
    xsn = np.asarray(xs, np.int32)
    for e in range(e_local):
        acc = xsn[0, e * seg : (e + 1) * seg] @ np.asarray(w1[e], np.int32)
        want[e] = acc.astype(np.float32) * np.asarray(sx[e])[:, None] * np.asarray(sw[e])[None, :]
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    ok = rel < 3e-2
    print(f"{'OK ' if ok else 'FAIL'} fused_dispatch_gmm1 {label}: rel={rel:.2e}")
    return ok


def run_routed(rng_seed=1):
    """End-to-end routed path on the self-loop mesh: per-token quant → routing
    plan → fused kernel → combine_core, vs the dense golden."""
    from sgl_kernel_npu_tpu.parallel import ep_core
    from sgl_kernel_npu_tpu.parallel.fused_kernel import fused_dispatch_gmm1

    rng = np.random.default_rng(rng_seed)
    t_tok, h, n, e, k, seg = 16, 1024, 512, 4, 2, 16
    x = jnp.asarray(rng.standard_normal((t_tok, h)) * 0.3, jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(e, k, replace=False) for _ in range(t_tok)]), jnp.int32)
    w = jnp.asarray(rng.random((t_tok, k)), jnp.float32)
    w1 = jnp.asarray(rng.integers(-100, 100, (e, h, n)), jnp.int8)
    sw = jnp.asarray(rng.random((e, n)).astype(np.float32) / 100)
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))

    @jax.jit
    def go(x_, idx_, w_, w1_, sw_):
        def body(xs, ii, ww, w1__, sw__):
            out, _, handle = fused_dispatch_gmm1(
                xs, ii, w1__, sw__, axis_name="ep", num_experts=e,
                num_ranks=1, seg_capacity=seg, tk=512, tn=512)
            return ep_core.combine_core(
                out.astype(jnp.float32), ww, handle, axis_name="ep",
                num_ranks=1, seg_capacity=seg, out_dtype=jnp.float32)
        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(),) * 5, out_specs=P(),
            check_vma=False)(x_, idx_, w_, w1_, sw_)

    got = np.asarray(go(x, idx, w, w1, sw))
    # golden: per-token int8 quant → Σ_k w·dequant(xq @ w1[e_k])
    xf = np.asarray(x, np.float32)
    sc = np.maximum(np.abs(xf).max(-1) / 127.0, 1e-12)
    xq = np.clip(np.round(xf / sc[:, None]), -128, 127).astype(np.int32)
    want = np.zeros((t_tok, n), np.float32)
    for t in range(t_tok):
        for j in range(k):
            ee = int(idx[t, j])
            acc = xq[t] @ np.asarray(w1[ee], np.int32)
            want[t] += float(w[t, j]) * acc * sc[t] * np.asarray(sw[ee])
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-9)
    ok = rel < 3e-2
    print(f"{'OK ' if ok else 'FAIL'} fused routed dispatch+GMM1+combine: rel={rel:.2e}")
    return ok


def bench():
    from bench import _bench_scanned
    from sgl_kernel_npu_tpu.ops import grouped_matmul as gm

    rng = np.random.default_rng(0)
    e_local, seg, h, n = 8, 128, 7168, 4096
    er = e_local * seg
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))
    mk = jax.jit(lambda k, s: jax.random.randint(k, s, -100, 100, jnp.int8),
                 static_argnums=1)
    w1 = mk(jax.random.key(0), (e_local, h, n))
    sw = jnp.asarray(rng.random((e_local, n)).astype(np.float32) / 100)
    sx = jnp.asarray(rng.random((e_local, seg)).astype(np.float32) / 100)
    xs_small = mk(jax.random.key(1), (2, 1, er, h))
    xs_big = mk(jax.random.key(2), (50, 1, er, h))

    def fused_fn(xs_, w1_, sw_, sx_):
        return jax.shard_map(
            lambda a, b, c, d: fused_dispatch_gmm1_rank(
                a, b, c, d, axis_name="ep", num_ranks=1, seg=seg),
            mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P(),
            check_vma=False,
        )(xs_, w1_, sw_, sx_)

    t_fused = _bench_scanned(fused_fn, xs_small, xs_big, (w1, sw, sx))
    # baseline: GMM alone on already-arrived rows (the compute floor)
    gs = jnp.full((e_local,), seg, jnp.int32)
    sxf = sx.reshape(-1)
    t_gmm = _bench_scanned(
        lambda xs_, w1_, sw_: gm.grouped_matmul(
            xs_[0], w1_, gs, sxf, sw_, epilogue="dequant",
            out_dtype=jnp.bfloat16),
        xs_small, xs_big, (w1, sw))
    payload = er * h  # int8 bytes moved through the window
    print(f"fused dispatch+GMM1: {t_fused*1e6:8.1f} us "
          f"(payload {payload/1e6:.0f} MB rides inside)")
    print(f"grouped_matmul only: {t_gmm*1e6:8.1f} us")
    print(f"overlap overhead: {(t_fused-t_gmm)*1e6:8.1f} us "
          f"vs serialized transfer ~{payload/610e9*1e6:.0f} us at window BW")


def main():
    ok = run(4, 128, 2048, 1024, "small")
    if ok:
        ok &= run_routed()
    if ok:
        ok &= run(8, 128, 7168, 4096, "deepseek-shape")
    if ok:
        bench()
    print("ALL OK" if ok else "SOME FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
