"""Chip benchmark: LoRA bgmv/sgmv vs their memory rooflines (VERDICT r1 #8).

Tests the claim in ops/lora.py:12-16 ("XLA fuses the adapter gather into the
batched dot, so jnp is already roofline").  Two traffic models bound the
answer:

- IDEAL: each live adapter's weights are read once: L_live*R*H bytes (+ x, out).
- MATERIALIZED: the per-token gather w[tok_idx] hits HBM: T*R*H bytes (+ x, out).

If measured time tracks the MATERIALIZED model the gather is materializing and
the Pallas scalar-prefetch fallback promised in ops/lora.py is warranted;
if it tracks IDEAL (or the op is latency-floor-bound), jnp stays.

Scan-marginal timing (bench.py method); weights generated on device.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_scanned
from sgl_kernel_npu_tpu.ops import lora
from sgl_kernel_npu_tpu.ops import lora_pallas


def bench_bgmv(rng):
    """Decode shapes: batch 128, hidden 4096, rank 16, 8 adapters, bf16."""
    t, h, r, l = 128, 4096, 16, 8
    mk = jax.jit(lambda k, s: jax.random.normal(k, s, jnp.bfloat16) * 0.1,
                 static_argnums=1)
    a = mk(jax.random.key(0), (l, r, h))       # shrink weights
    b = mk(jax.random.key(1), (l, h, r))       # expand weights
    idx = jnp.asarray(rng.integers(0, l, t), jnp.int32)
    n1, n2 = 8, 136
    xs_small = mk(jax.random.key(2), (n1, t, h))
    xs_big = mk(jax.random.key(3), (n2, t, h))

    tm = _bench_scanned(
        lambda x, a_, b_, i_: lora.bgmv_expand(
            lora.bgmv_shrink(x, a_, i_, 0.5), b_, i_),
        xs_small, xs_big, (a, b, idx))
    tf = _bench_scanned(
        lambda x, a_, b_, i_: lora_pallas.bgmv_fused(x, a_, b_, i_, scaling=0.5),
        xs_small, xs_big, (a, b, idx))
    ideal = (2 * l * r * h + t * h + t * h) * 2 / 819e9
    mat = (2 * t * r * h + t * h + t * h) * 2 / 819e9
    print(f"bgmv shrink+expand T={t} H={h} R={r} L={l}: jnp {tm*1e6:7.1f} us | "
          f"fused Pallas {tf*1e6:7.1f} us ({tm/tf:.1f}x) | "
          f"ideal {ideal*1e6:5.1f} us | materialized {mat*1e6:5.1f} us")
    return tf, ideal, mat


def bench_sgmv(rng):
    """Prefill shapes: 4096 packed tokens, 4 seqs, hidden 4096, rank 32."""
    s, h, r, l, bsz = 4096, 4096, 32, 8, 4
    mk = jax.jit(lambda k, sh: jax.random.normal(k, sh, jnp.bfloat16) * 0.1,
                 static_argnums=1)
    a = mk(jax.random.key(0), (l, r, h))
    b = mk(jax.random.key(1), (l, h, r))
    widx = jnp.asarray(rng.integers(0, l, bsz), jnp.int32)
    lens = jnp.full((bsz,), s // bsz, jnp.int32)
    ranks = jnp.full((l,), r, jnp.int32)
    scal = jnp.ones((l,), jnp.float32)
    n1, n2 = 2, 18
    xs_small = mk(jax.random.key(2), (n1, s, h))
    xs_big = mk(jax.random.key(3), (n2, s, h))

    tm = _bench_scanned(
        lambda x, a_, b_, w_, ln_, rk_, sc_: lora.sgmv_expand(
            lora.sgmv_shrink(x, a_, w_, ln_, rk_, sc_), b_, w_, ln_, rk_, (0, h)),
        xs_small, xs_big, (a, b, widx, lens, ranks, scal))
    tf = _bench_scanned(
        lambda x, a_, b_, w_, ln_, rk_, sc_: lora_pallas.sgmv_fused(
            x, a_, b_, w_, ln_, rk_, sc_),
        xs_small, xs_big, (a, b, widx, lens, ranks, scal))
    ideal = (2 * min(l, bsz) * r * h + 2 * s * h) * 2 / 819e9
    mat = (2 * s * r * h + 2 * s * h) * 2 / 819e9
    # useful flops for scale: 2 matmuls, 2*S*R*H each
    tflops = 2 * 2 * s * r * h / tf / 1e12
    print(f"sgmv shrink+expand S={s} H={h} R={r}: jnp {tm*1e6:7.1f} us | "
          f"fused Pallas {tf*1e6:7.1f} us ({tm/tf:.1f}x, {tflops:.1f} TF) | "
          f"ideal {ideal*1e6:5.1f} us | materialized {mat*1e6:6.1f} us")
    return tf, ideal, mat


def main():
    rng = np.random.default_rng(0)
    tb, ib, mb = bench_bgmv(rng)
    ts, is_, ms = bench_sgmv(rng)
    verdict = []
    for name, tm, ideal, mat in (("bgmv", tb, ib, mb), ("sgmv", ts, is_, ms)):
        verdict.append(f"{name} fused kernel: {tm/ideal:.1f}x off ideal floor")
    print("; ".join(verdict))


if __name__ == "__main__":
    main()
