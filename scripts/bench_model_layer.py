"""DeepSeek-V3 model decode_step on one chip — the engine's jit unit.

scripts/bench_layer.py measures the hand-composed kernel chain; this measures
the MODEL path the engine actually jits (decode_step with the fused W8A8
mla_preprocess prologue + W8A8 grouped MoE), so the difference is the model
glue (residuals, norms, router) on top of the kernels.

Modes: ``float`` (unfused f32-weight prologue + dense MoE — the naive model)
and ``fused`` (mla_wq + moe_weights_q — the production path; default).
Shapes: 1 layer at per-rank production scale (hidden 7168, 16 heads, latent
512+64, 8 local experts, top-8, batch 128, seq 1024 paged).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_scanned
from sgl_kernel_npu_tpu.models import deepseek_v3 as m


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    t0 = time.time()
    cfg = m.DeepSeekV3Config(
        vocab_size=128, hidden=7168, num_layers=1, num_heads=16,
        kv_lora_rank=512, qk_rope_dim=64, qk_nope_dim=128, q_lora_rank=1536,
        v_head_dim=128, num_experts=8, num_shared_experts=1, topk=8,
        moe_intermediate=2048, page_size=128)
    b, seq = 128, 1024
    max_pages = seq // cfg.page_size
    n_pages = b * max_pages + 1

    params = jax.jit(lambda k: m.init_weights(k, cfg, jnp.bfloat16))(
        jax.random.key(0))
    params = jax.block_until_ready(params)
    caches = m.init_kv_cache(cfg, n_pages, jnp.bfloat16)
    # pre-fill the caches with noise so decode reads real pages
    caches = [
        {k: (jax.random.normal(jax.random.key(i), v.shape, jnp.float32) * 0.5
             ).astype(v.dtype) if v.dtype != jnp.int8 else v
         for i, (k, v) in enumerate(c.items())}
        for c in caches
    ]

    kw = {}
    if mode == "fused":
        sample = jax.random.normal(jax.random.key(9), (64, cfg.hidden),
                                   jnp.float32) * 0.3
        kw["mla_wq"] = jax.block_until_ready(
            m.make_mla_preprocess_weights(cfg, params, sample))
        kw["moe_weights_q"] = jax.block_until_ready(
            m.quantize_moe_weights(cfg, params))

    rng = np.random.default_rng(0)
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    sl = jnp.full((b,), seq, jnp.int32)
    pos = jnp.full((b,), seq - 1, jnp.int32)
    slots = bt[:, -1] * cfg.page_size + cfg.page_size - 1

    def step(x, c0_nope, c0_rope, bt_, sl_):
        out, _ = m.decode_step(
            cfg, params, x, pos, [{"nope": c0_nope, "rope": c0_rope}],
            bt_, sl_, slots, **kw)
        return out

    mk = jax.jit(lambda key, s: jax.random.normal(key, s, jnp.bfloat16) * 0.3,
                 static_argnums=1)
    xs_small = mk(jax.random.key(1), (4, b, cfg.hidden))
    xs_big = mk(jax.random.key(2), (24, b, cfg.hidden))
    ops = (caches[0]["nope"], caches[0]["rope"], bt, sl)
    t = _bench_scanned(step, xs_small, xs_big, ops, repeats=6)
    print(f"model decode layer ({mode}), B={b}: {t*1e6:.1f} us "
          f"({b/t/1e3:.1f} ktok/s)")
    print(f"total {time.time()-t0:.0f}s")


if __name__ == "__main__":
    main()
