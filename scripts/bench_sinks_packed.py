"""Chip benchmark: packed vs unpacked sinks DECODE kernel.

GPT-OSS shapes: batch 128, 64 q heads / 8 kv heads / d 64, ctx 1024, page 128.
The packed layout (pack_kv_sinks) stores two d=64 heads per 128-lane row,
halving HBM traffic (XLA pads the minor dim to 128 lanes).  Scan-marginal
timing (see bench.py docstring); KV generated on device (tunnel transfer is
~1 MB/s for host arrays).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_scanned
from sgl_kernel_npu_tpu.ops.attention import sinks_attention as sa


def main():
    rng = np.random.default_rng(0)
    b, hq, hkv, d, dv, page = 128, 64, 8, 64, 64, 128
    seq = 1024
    max_pages = seq // page
    n_pages = b * max_pages + 1

    mk = jax.jit(lambda k, s: jax.random.normal(k, s, jnp.bfloat16) * 0.5,
                 static_argnums=1)
    k = mk(jax.random.key(0), (n_pages, hkv, page, d))
    v = mk(jax.random.key(1), (n_pages, hkv, page, dv))
    kp = jax.jit(sa.pack_kv_sinks)(k)
    vp = jax.jit(sa.pack_kv_sinks)(v)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32)
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    ctx = jnp.full((b,), seq, jnp.int32)
    scale = float(1 / np.sqrt(d))

    n1, n2 = 8, 72
    qs_small = mk(jax.random.key(2), (n1, b, hq * d))
    qs_big = mk(jax.random.key(3), (n2, b, hq * d))

    for window in (128, 0):
        live = min(window, seq) if window > 0 else seq
        kv_bytes = b * hkv * live * (d + dv) * 2
        t_un = _bench_scanned(
            lambda q, k_, v_, bt_, cl_: sa.attention_sinks(
                q, k_, v_, sinks, bt_, cl_, scale, window, hq, hkv),
            qs_small, qs_big, (k, v, bt, ctx))
        t_pk = _bench_scanned(
            lambda q, k_, v_, bt_, cl_: sa.attention_sinks_packed(
                q, k_, v_, sinks, bt_, cl_, scale, window, hq, hkv),
            qs_small, qs_big, (kp, vp, bt, ctx))
        print(f"window={window:4d}: unpacked {t_un*1e6:8.1f} us "
              f"({kv_bytes/t_un/1e9:5.0f} GB/s live KV) | "
              f"packed {t_pk*1e6:8.1f} us ({kv_bytes/t_pk/1e9:5.0f} GB/s) | "
              f"{t_un/t_pk:.2f}x")


if __name__ == "__main__":
    main()
