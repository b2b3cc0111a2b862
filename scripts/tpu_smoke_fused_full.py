"""Chip smoke + bench: FULL single-kernel fused MoE (self-loop, 1 device).

Validates the complete in-kernel chain — dispatch window sends, GMM1,
SwiGLU+requant, GMM2, combine return DMA, masked-matmul reduce — in compact
(live-rows) mode against the unfused pipeline, then benches both at DeepSeek
decode shapes (reference bar: avg_diff < 4e-4,
tests/python/deepep/test_fused_deep_moe.py:469).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel.fused_full import fused_deep_moe_full_rank
from sgl_kernel_npu_tpu.parallel.fused_moe import fused_deep_moe_rank


def _mesh():
    return Mesh(np.array(jax.devices()[:1]), ("ep",))


def _run_pair(t_tok, h, i, e, k, seg, tiles, label, rng_seed=0, bench=False):
    """Fused-full vs unfused chain on identical quantized weights/tokens."""
    rng = np.random.default_rng(rng_seed)
    n1 = 2 * i
    mesh = _mesh()
    tm, tk1, tn1, tk2, tn2, tn3 = tiles

    mk8 = jax.jit(lambda key, s: jax.random.randint(key, s, -100, 100, jnp.int8),
                  static_argnums=1)
    w1 = mk8(jax.random.key(0), (e, h, n1))
    w2 = mk8(jax.random.key(1), (e, i, h))
    sw1 = jnp.asarray(rng.random((e, n1)).astype(np.float32) / (100 * np.sqrt(h)))
    sw2 = jnp.asarray(rng.random((e, h)).astype(np.float32) / (100 * np.sqrt(i)))
    x = jnp.asarray(rng.standard_normal((t_tok, h)) * 0.3, jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(e, k, replace=False) for _ in range(t_tok)]), jnp.int32)
    w = jnp.asarray(rng.random((t_tok, k)), jnp.float32)

    @jax.jit
    def fused(x_, idx_, w_, w1_, sw1_, w2_, sw2_):
        def body(a, b, c, d1, d2, d3, d4):
            out, cnt, drop = fused_deep_moe_full_rank(
                a, b, c, d1, d2, d3, d4,
                axis_name="ep", num_experts=e, num_ranks=1, seg_capacity=seg,
                tm=tm, tk1=tk1, tn1=tn1, tk2=tk2, tn2=tn2, tn3=tn3,
                static_shapes=False)
            return out, cnt[None], drop[None]
        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(),) * 7,
            out_specs=(P(), P(), P()), check_vma=False,
        )(x_, idx_, w_, w1_, sw1_, w2_, sw2_)

    @jax.jit
    def unfused(x_, idx_, w_, w1_, sw1_, w2_, sw2_):
        def body(a, b, c, d1, d2, d3, d4):
            out, cnt, drop = fused_deep_moe_rank(
                a, b, c, d1, d2, d3, d4,
                axis_name="ep", num_experts=e, num_ranks=1,
                pair_capacity=t_tok * k, seg_capacity=seg,
                pack_tn=tn1)
            return out, cnt[None], drop[None]
        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(),) * 7,
            out_specs=(P(), P(), P()), check_vma=False,
        )(x_, idx_, w_, w1_, sw1_, w2_, sw2_)

    got, cnt_f, drop_f = fused(x, idx, w, w1, sw1, w2, sw2)
    ref, cnt_u, drop_u = unfused(x, idx, w, w1, sw1, w2, sw2)
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    counts_ok = np.array_equal(np.asarray(cnt_f), np.asarray(cnt_u))
    avg_diff = np.abs(g - r).mean() / (np.abs(r).mean() + 1e-9)
    ok = avg_diff < 4e-4 and counts_ok
    print(f"{'OK ' if ok else 'FAIL'} fused_full {label}: avg_diff={avg_diff:.2e} "
          f"counts_match={counts_ok} drops={int(np.asarray(drop_f).sum())}")

    if ok and bench:
        from bench import _bench_scanned

        mk = jax.jit(
            lambda key, s: jax.random.normal(key, s, jnp.float32) * 0.3,
            static_argnums=1)
        xs_small = mk(jax.random.key(2), (2, t_tok, h))
        xs_big = mk(jax.random.key(3), (34, t_tok, h))

        t_f = _bench_scanned(
            lambda xs_, *a: fused(xs_[0], *a)[0],
            xs_small, xs_big, (idx, w, w1, sw1, w2, sw2))
        t_u = _bench_scanned(
            lambda xs_, *a: unfused(xs_[0], *a)[0],
            xs_small, xs_big, (idx, w, w1, sw1, w2, sw2))
        wbytes = e * h * n1 + e * i * h
        floor = wbytes / 819e9
        print(f"  full-fused kernel : {t_f*1e6:8.1f} us "
              f"(weight floor {floor*1e6:.0f} us)")
        print(f"  unfused chain     : {t_u*1e6:8.1f} us")
    return ok


def main():
    ok = _run_pair(16, 512, 256, 8, 2, 16, (32, 512, 512, 256, 512, 512),
                   "small")
    if ok:
        ok &= _run_pair(
            128, 7168, 2048, 8, 8, 128, (256, 1024, 512, 1024, 512, 512),
            "deepseek-decode", bench=True)
    print("ALL OK" if ok else "SOME FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
