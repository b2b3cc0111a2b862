"""Chip bench: flat-pipeline sinks decode vs the BlockSpec packed kernel.

GPT-OSS decode shapes (batch 128, 64 q-heads / 8 kv-heads / d 64, ctx 1024,
page 128), trace-timed (utils/trace_profile).  Usage:
    python scripts/bench_sinks_flat.py [--window 0]
"""

import argparse
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from sgl_kernel_npu_tpu.ops.attention import sinks_attention as sa  # noqa: E402
from sgl_kernel_npu_tpu.utils import trace_profile as tp  # noqa: E402


def _module_med_us(fn, iters=12, warm=2):
    """(median, iqr) device time of the whole jitted module, trace-based."""
    import statistics

    from jax.profiler import ProfileData

    for _ in range(warm):
        fn()
    path = tp.capture(fn, iters=iters)
    pd = ProfileData.from_file(path)
    durs = []
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                durs.extend(ev.duration_ns / 1e3 for ev in line.events)
    durs.sort()
    med = statistics.median(durs) if durs else 0.0
    iqr = durs[(3 * len(durs)) // 4] - durs[len(durs) // 4] if len(durs) >= 4 else 0.0
    return med, iqr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--ctx", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    s, hq, hkv, d, page = args.batch, 64, 8, 64, 128
    max_pages = args.ctx // page
    P = s * max_pages + 8
    rng = np.random.default_rng(0)
    # generate on DEVICE: host arrays this size take minutes over the tunnel
    mk = jax.jit(lambda key, shp: jax.random.normal(key, shp, jnp.bfloat16) * 0.5,
                 static_argnums=1)
    q = mk(jax.random.key(0), (s, hq * d))
    k = mk(jax.random.key(1), (P, hkv, page, d))
    v = mk(jax.random.key(2), (P, hkv, page, d))
    sinks = mk(jax.random.key(3), (hq,))
    bt = jnp.asarray(rng.permutation(P)[: s * max_pages].reshape(s, max_pages), jnp.int32)
    ctx = jnp.full((s,), args.ctx, jnp.int32)
    scale = 1.0 / np.sqrt(d)
    kp, vp = sa.pack_kv_sinks(k), sa.pack_kv_sinks(v)

    # live KV bytes actually attended (window-pruned)
    live = min(args.ctx, args.window + page) if args.window > 0 else args.ctx
    kv_bytes = s * hkv * live * d * 2 * kp.dtype.itemsize

    ref = sa.attention_sinks_ref(q, k, v, sinks, bt, ctx, scale, args.window, hq, hkv)

    def run(impl):
        # attention_sinks_packed is itself jitted — operands must ride as jit
        # ARGUMENTS (closure constants embed in the MLIR shipped to the remote
        # compiler, which rejects bodies over ~100 MB with HTTP 413)
        fn = lambda: sa.attention_sinks_packed(
            q, kp, vp, sinks, bt, ctx, scale, args.window, hq, hkv, impl=impl)
        out = jax.block_until_ready(fn())
        rel = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
                    ) / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        med, iqr = _module_med_us(lambda: jax.block_until_ready(fn()),
                                  iters=args.iters, warm=2)
        print(f"{impl:10s}: {med:8.1f} us (iqr {iqr:.1f})  "
              f"{kv_bytes / (med * 1e-6) / 1e9:6.1f} GB/s live-KV  rel={rel:.2e}")
        return med

    t_flat = run("flat")
    t_bs = run("blockspec")
    print(f"speedup: {t_bs / t_flat:.2f}x")


if __name__ == "__main__":
    main()
