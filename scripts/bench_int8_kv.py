"""Int8 KV cache decode bench: decode_mla over bf16 vs int8 latent pages.

The kernel is HBM-bound (PERF.md: 97% of roofline at bf16), so halving the KV
bytes should land near 2x.  Scan-marginal timing (see bench.py / memory notes);
DeepSeek-V3 decode shapes.
"""

import sys
import time
import statistics
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_scanned


def main():
    from sgl_kernel_npu_tpu.ops.attention import decode_attention as da

    assert jax.default_backend() != "cpu", "chip bench"
    b, hq, dn, dr, page, seq = 128, 16, 512, 64, 128, 1024
    max_pages = seq // page
    n_pages = b * max_pages + 1
    rng = np.random.default_rng(0)
    mk = jax.jit(lambda key, s, dt: jax.random.normal(key, s, dt) * 0.5,
                 static_argnums=(1, 2))
    kn = mk(jax.random.key(0), (n_pages, 1, page, dn), jnp.bfloat16)
    kr = mk(jax.random.key(1), (n_pages, 1, dr, page), jnp.bfloat16)
    ks = jnp.float32(float(jnp.abs(kn.astype(jnp.float32)).max()) / 127.0)
    knq = jax.jit(lambda k, s: jnp.clip(jnp.round(k.astype(jnp.float32) / s),
                                        -128, 127).astype(jnp.int8))(kn, ks)
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    sl = jnp.full((b,), seq, jnp.int32)
    scale = float(1.0 / np.sqrt(dn + dr))
    n1, n2 = 8, 136
    qs_small = mk(jax.random.key(2), (n1, b, hq, dn + dr), jnp.bfloat16)
    qs_big = mk(jax.random.key(3), (n2, b, hq, dn + dr), jnp.bfloat16)

    t_bf = _bench_scanned(
        lambda q, kn_, kr_, sl_, bt_: da.decode_mla(q, kn_, kr_, sl_, scale, bt_),
        qs_small, qs_big, (kn, kr, sl, bt))
    t_i8 = _bench_scanned(
        lambda q, kn_, kr_, sl_, bt_: da.decode_mla(
            q, kn_, kr_, sl_, scale, bt_, k_scale=ks),
        qs_small, qs_big, (knq, kr, sl, bt))

    kv_bf = b * seq * (dn + dr) * 2          # bf16 bytes read per call
    kv_i8 = b * seq * (dn + dr * 2)          # int8 nope + bf16 rope
    print(f"decode_mla bf16: {t_bf*1e6:.1f} us  ({kv_bf/t_bf/1e9:.0f} GB/s KV)")
    print(f"decode_mla int8: {t_i8*1e6:.1f} us  ({kv_i8/t_i8/1e9:.0f} GB/s KV, "
          f"floor {kv_i8/819e9*1e6:.0f} us)")
    print(f"speedup: {t_bf/t_i8:.2f}x")


if __name__ == "__main__":
    main()
