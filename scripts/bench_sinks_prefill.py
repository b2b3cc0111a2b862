"""Chip benchmark: Pallas varlen sinks-prefill kernel vs the jnp (XLA) path.

GPT-OSS-ish shapes: 64 q heads / 8 kv heads / d 64, sliding window 128.
Scan-marginal timing (see bench.py docstring).
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
    hq, hkv, d, dv, page = 64, 8, 64, 64, 128
    bsz, seq = 4, 1024                      # full prefill: ctx == seq
    window = 128
    max_pages = seq // page
    n_pages = bsz * max_pages
    s = bsz * seq

    k = jnp.asarray(rng.standard_normal((n_pages, hkv, page, d)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((n_pages, hkv, page, dv)) * 0.5, jnp.bfloat16)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32)
    bt = jnp.asarray(rng.permutation(n_pages).reshape(bsz, max_pages), jnp.int32)
    ctx = jnp.full((bsz,), seq, jnp.int32)
    seq_lens = jnp.full((bsz,), seq, jnp.int32)
    scale = float(1 / np.sqrt(d))

    n1, n2 = 2, 10
    qs_small = jnp.asarray(rng.standard_normal((n1, s, hq * d)) * 0.5, jnp.bfloat16)
    qs_big = jnp.asarray(rng.standard_normal((n2, s, hq * d)) * 0.5, jnp.bfloat16)
    operands = (k, v, sinks, seq_lens, bt, ctx)

    t_pallas = _bench_scanned(
        lambda q, *o: sa.attention_sinks_prefill_pallas(
            q, *o, scale, window, hq, hkv, max_q=seq),
        qs_small, qs_big, operands)
    t_jnp = _bench_scanned(
        lambda q, *o: sa.attention_sinks_prefill(q, *o, scale, window, hq, hkv),
        qs_small, qs_big, operands)

    # useful-work floor: with window W each token reads ~W keys+values
    flops = 2 * s * hq * (window + page) * (d + dv)  # qk + pv, window+page partial pages
    print(f"pallas: {t_pallas*1e6:9.1f} us  ({flops/t_pallas/1e12:6.1f} TFLOPs eff)")
    print(f"jnp:    {t_jnp*1e6:9.1f} us  ({flops/t_jnp/1e12:6.1f} TFLOPs eff)")
    print(f"speedup: {t_jnp/t_pallas:.2f}x")


if __name__ == "__main__":
    main()
