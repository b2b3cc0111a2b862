"""W8A8 dense decode layer on one chip: Llama-8B-class shapes, bf16 vs int8
weights.

Decode is weight-read bound on dense models; W8A8 halves the weight bytes and
doubles MXU throughput, so the layer should approach the int8 weight floor.
Shapes: hidden 4096, 32 q / 8 kv heads (d=128), intermediate 14336, batch 64,
seq 1024 paged KV — one full decode layer (projections + paged GQA attention +
SwiGLU MLP) per iteration, scan-marginal timing (bench.py method).

Weights generated on device (see bench_layer.py note on the axon tunnel).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_scanned
from sgl_kernel_npu_tpu.models import llama as lm


def main():
    t0 = time.time()
    cfg = lm.LlamaConfig(hidden=4096, num_layers=1, num_heads=32,
                         num_kv_heads=8, head_dim=128, intermediate=14336,
                         page_size=128, vocab_size=128)
    b, seq = 64, 1024
    max_pages = seq // cfg.page_size
    n_pages = b * max_pages + 1

    keys = iter(list(jax.random.split(jax.random.key(0), 24)))

    @jax.jit
    def make_all():
        kf = lambda *s, sc=0.02: jax.random.normal(next(keys), s, jnp.bfloat16) * sc
        h, d = cfg.hidden, cfg.head_dim
        lw = {
            "ln1": jnp.ones((h,), jnp.bfloat16),
            "wq": kf(h, cfg.num_heads * d),
            "wk": kf(h, cfg.num_kv_heads * d),
            "wv": kf(h, cfg.num_kv_heads * d),
            "wo": kf(cfg.num_heads * d, h),
            "ln2": jnp.ones((h,), jnp.bfloat16),
            "w_gate": kf(h, cfg.intermediate),
            "w_up": kf(h, cfg.intermediate),
            "w_down": kf(cfg.intermediate, h),
        }
        params = {"layers": [lw], "ln_f": jnp.ones((h,), jnp.bfloat16)}
        kc = kf(n_pages, cfg.num_kv_heads, cfg.page_size, d, sc=0.5)
        vc = kf(n_pages, cfg.num_kv_heads, cfg.page_size, d, sc=0.5)
        return params, kc, vc

    params, kc, vc = jax.block_until_ready(make_all())
    wq = jax.jit(lambda p: lm.quantize_weights(cfg, p))(params)
    wq = jax.block_until_ready(wq)

    rng = np.random.default_rng(0)
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    ctx = jnp.full((b,), seq, jnp.int32)
    pos = jnp.full((b,), seq - 1, jnp.int32)
    slots = bt[:, -1] * cfg.page_size + cfg.page_size - 1

    def step(use_q):
        # params/wq ride as scan operands: closure captures embed as MLIR
        # constants and the remote-compile endpoint rejects them >100 MB
        def f(x, params_, wq_, kc_, vc_, bt_, ctx_):
            out, _ = lm.decode_step(
                cfg, params_, x, pos, [(kc_, vc_)], bt_, ctx_, slots,
                weights_q=wq_ if use_q else None)
            return out
        return f

    mk = jax.jit(lambda key, s: jax.random.normal(key, s, jnp.bfloat16) * 0.3,
                 static_argnums=1)
    xs_small = mk(jax.random.key(1), (4, b, cfg.hidden))
    xs_big = mk(jax.random.key(2), (36, b, cfg.hidden))
    ops = (params, wq, kc, vc, bt, ctx)

    t_bf = _bench_scanned(step(False), xs_small, xs_big, ops, repeats=6)
    t_q = _bench_scanned(step(True), xs_small, xs_big, ops, repeats=6)

    h, d = cfg.hidden, cfg.head_dim
    n_params = (h * cfg.num_heads * d * 2 + h * cfg.num_kv_heads * d * 2
                + 3 * h * cfg.intermediate)
    kv_bytes = b * seq * cfg.num_kv_heads * 2 * d * 2
    floor_bf = (2 * n_params + kv_bytes) / 819e9
    floor_q = (1 * n_params + kv_bytes) / 819e9
    print(f"llama8B decode layer, B={b}: bf16 {t_bf*1e6:.1f} us "
          f"(floor {floor_bf*1e6:.1f}), w8a8 {t_q*1e6:.1f} us "
          f"(floor {floor_q*1e6:.1f})")
    print(f"w8a8 speedup: {t_bf/t_q:.2f}x   "
          f"pct_of_floor: bf16 {100*floor_bf/t_bf:.0f}% w8a8 {100*floor_q/t_q:.0f}%")
    print(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
