"""Chip benchmark: paged GQA decode attention (Llama-class shapes).

The reference ships decode_gqa + decode_gqa_high_performance (Triton,
decode_attention.py:373,646); this measures our Pallas pair against the
HBM roofline (KV read is the whole job) and the XLA-naive gather path.

Shapes: batch 64, 32 q-heads / 8 kv-heads, d 128, seq 1024, page 128, bf16 —
KV read per call = B·Hkv·S·(Dk+Dv)·2 = 256 MB.

Scan-marginal timing (bench.py method); arrays generated on device.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_scanned
from sgl_kernel_npu_tpu.ops.attention import decode_attention as da


def main():
    b, hq, hkv, d, page, seq = 64, 32, 8, 128, 128, 1024
    max_pages = seq // page
    n_pages = b * max_pages + 1
    rng = np.random.default_rng(0)
    mk = jax.jit(lambda key, s: jax.random.normal(key, s, jnp.bfloat16) * 0.5,
                 static_argnums=1)
    k = mk(jax.random.key(0), (n_pages, hkv, page, d))
    v = mk(jax.random.key(1), (n_pages, hkv, page, d))
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    sl = jnp.full((b,), seq, jnp.int32)
    scale = float(1 / np.sqrt(d))
    qs_small = mk(jax.random.key(2), (8, b, hq, d))
    qs_big = mk(jax.random.key(3), (72, b, hq, d))
    ops = (k, v, sl, bt)

    kv_bytes = b * hkv * seq * 2 * d * 2
    results = {}
    for name, fn in (
        ("decode_gqa", da.decode_gqa),
        ("decode_gqa_high_performance", da.decode_gqa_high_performance),
        ("xla_ref", da.decode_gqa_ref),
    ):
        t = _bench_scanned(
            lambda q, k_, v_, sl_, bt_, f=fn: f(q, k_, v_, sl_, scale, bt_),
            qs_small, qs_big, ops, repeats=6)
        results[name] = t
        print(f"{name:28s}: {t*1e6:7.1f} us | {kv_bytes/t/1e9:6.1f} GB/s KV "
              f"({kv_bytes/t/819e9*100:5.1f}% of 819 GB/s roofline)")
    best = min(results["decode_gqa"], results["decode_gqa_high_performance"])
    print(f"speedup vs XLA path: {results['xla_ref']/best:.2f}x")


if __name__ == "__main__":
    main()
