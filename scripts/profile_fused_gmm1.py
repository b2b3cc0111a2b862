"""Adjudicate the fused dispatch->GMM1 number with ground-truth device traces.

VERDICT r4 #1: three rounds of driver captures (scan-marginal wall clock) said
fusion LOSES (671.8 vs 242.0 us in BENCH_r04) while builder chip runs said it
WINS (299.2 vs 321.7).  This script settles it with the bench_kineto analogue
(utils/trace_profile.py): the xplane trace carries the EXACT device duration
of every HLO op, immune to tunnel dispatch jitter and scan-marginal error bars.

Runs, at the driver's exact shapes (E=8, seg=128, K=7168, N=4096, self-loop):
  1. fused_dispatch_gmm1_rank under trace  -> device us of the fused pallas_call
  2. bare grouped_matmul (dequant epilogue) -> device us of the bare kernel
  3. window a2a cost context (payload is 7.3 MB; floor ~18 us self-loop)
  4. the same pair via scan-marginal at Delta32 with IQR, to calibrate the
     wall-clock harness against the trace ground truth.

Reference: csrc/deepep/ops/op_kernel/fused_deep_moe.h:60-120 (the fused op),
tests/python/deepep/utils.py:156-225 (bench_kineto trace timing).
"""

from __future__ import annotations

import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

sys.path.insert(0, ".")
from sgl_kernel_npu_tpu.ops import grouped_matmul as gmod
from sgl_kernel_npu_tpu.parallel.fused_kernel import fused_dispatch_gmm1_rank
from sgl_kernel_npu_tpu.utils import trace_profile as tp


def scan_marginal_iqr(per_iter_fn, xs_small, xs_big, operands, repeats=8):
    """Scan-marginal with pairwise medians + IQR (bench.py harness, Delta>=32)."""

    def make(niter, xs):
        @jax.jit
        def run(xs_, ops):
            def step(carry, x):
                o = per_iter_fn(x, *ops).astype(jnp.float32)
                return carry + jnp.sum(o * o), None
            total, _ = jax.lax.scan(step, jnp.float32(0), xs_)
            return total
        return run

    n1, n2 = xs_small.shape[0], xs_big.shape[0]
    r1, r2 = make(n1, xs_small), make(n2, xs_big)
    float(r1(xs_small, operands)); float(r2(xs_big, operands))
    marg = []
    for _ in range(repeats):
        t0 = time.perf_counter(); float(r1(xs_small, operands))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter(); float(r2(xs_big, operands))
        tb = time.perf_counter() - t0
        marg.append((tb - ta) / (n2 - n1) * 1e6)
    marg.sort()
    q1 = marg[len(marg) // 4]
    q3 = marg[(3 * len(marg)) // 4]
    return statistics.median(marg), q3 - q1


def main():
    rng = np.random.default_rng(0)
    e, seg, k, n = 8, 128, 7168, 4096
    er = e * seg
    w1 = jnp.asarray(rng.integers(-100, 100, (e, k, n)), jnp.int8)
    sw = jnp.asarray(rng.random((e, n)).astype(np.float32) / 100)
    sx = jnp.asarray(rng.random((e, seg)).astype(np.float32) / 100)
    gs = jnp.full((e,), seg, jnp.int32)
    sx_flat = sx.reshape(-1)
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))

    fused_rank = functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P(),
        check_vma=False,
    )(lambda a, b_, c, d: fused_dispatch_gmm1_rank(
        a, b_, c, d, axis_name="ep", num_ranks=1, seg=seg))

    x1 = jnp.asarray(rng.integers(-100, 100, (1, er, k)), jnp.int8)

    # ---- ground truth: device traces --------------------------------------
    ffused = jax.jit(lambda x: fused_rank(x, w1, sw, sx))
    fbare_f32 = jax.jit(lambda x: gmod.grouped_matmul(
        x[0], w1, gs, sx_flat, sw, epilogue="dequant", out_dtype=jnp.float32))
    fbare_bf16 = jax.jit(lambda x: gmod.grouped_matmul(
        x[0], w1, gs, sx_flat, sw, epilogue="dequant", out_dtype=jnp.bfloat16))

    for name, f in (("fused", ffused), ("bare_f32", fbare_f32),
                    ("bare_bf16", fbare_bf16)):
        table = tp.kernel_table(lambda f=f: f(x1).block_until_ready(), iters=10)
        print(f"\n=== {name}: per-op device times (trace) ===")
        print(tp.format_table(table, top=12))
        mods = tp.module_times(tp.capture(
            lambda f=f: f(x1).block_until_ready(), iters=10))
        print("  module totals:",
              [(m.name[:40], m.avg_us) for m in mods[:3]])

    # ---- wall-clock harness calibration (Delta 32) ------------------------
    xs_small = jnp.asarray(rng.integers(-100, 100, (2, 1, er, k)), jnp.int8)
    xs_big = jnp.asarray(rng.integers(-100, 100, (34, 1, er, k)), jnp.int8)
    med_f, iqr_f = scan_marginal_iqr(
        lambda x, w, s_, sx_: fused_rank(x, w, s_, sx_),
        xs_small, xs_big, (w1, sw, sx))
    med_b, iqr_b = scan_marginal_iqr(
        lambda x, w, g, a, bb: gmod.grouped_matmul(
            x[0], w, g, a, bb, epilogue="dequant", out_dtype=jnp.float32),
        xs_small, xs_big, (w1, gs, sx_flat, sw))
    print(f"\nscan-marginal Delta32: fused {med_f:.1f} us (IQR {iqr_f:.1f})  "
          f"bare {med_b:.1f} us (IQR {iqr_b:.1f})")


if __name__ == "__main__":
    main()
