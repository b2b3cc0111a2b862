"""End-to-end model smoke on real TPU hardware (both model families).

`tpu_smoke.py` proves kernels against goldens; this proves the *compositions*:

  1. DeepSeek-V3 decode step (mla_preprocess → paged MLA attention → router →
     fused INT8 MoE) — two steps on chip: finite outputs, paged KV actually
     advances, same-input determinism.
  2. Qwen3-Next GDN hybrid — chunked-prefill FLA vs recurrent decode on chip
     must agree step-for-step (the strongest self-consistency check the model
     has; mirrors tests/test_qwen3_next.py on hardware).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def deepseek_decode():
    from __graft_entry__ import _tiny_cfg
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m

    cfg = _tiny_cfg()
    params = m.init_weights(jax.random.key(0), cfg)
    n, max_pages = 4, 4
    caches = m.init_kv_cache(cfg, n * max_pages + 1, jnp.float32)
    hidden = jnp.ones((n, cfg.hidden), jnp.float32)
    positions = jnp.arange(n, dtype=jnp.int32) + 7
    bt = jnp.arange(1, 1 + n * max_pages, dtype=jnp.int32).reshape(n, max_pages)
    seq_lens = jnp.full((n,), 8, jnp.int32)
    slots = jnp.arange(n, dtype=jnp.int32) * cfg.page_size + 7

    step = jax.jit(lambda h, p, c, b, s, sm: m.decode_step(cfg, params, h, p, c, b, s, sm))
    out1, caches1 = step(hidden, positions, caches, bt, seq_lens, slots)
    out1b, _ = step(hidden, positions, caches, bt, seq_lens, slots)
    out2, caches2 = step(out1, positions + 1, caches1, bt, seq_lens + 1, slots + 1)

    finite = bool(np.isfinite(np.asarray(out1)).all() and np.isfinite(np.asarray(out2)).all())
    determ = bool((np.asarray(out1) == np.asarray(out1b)).all())
    # the written KV slots must differ from the empty cache
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(caches), jax.tree.leaves(caches1))
    )
    ok = finite and determ and moved
    print(f"{'OK ' if ok else 'FAIL'} deepseek_v3 decode x2: finite={finite} "
          f"deterministic={determ} kv_advanced={moved}")
    return ok


def qwen3_next_consistency():
    """Chunked-prefill vs recurrent decode, under f32 matmul precision.

    TPU's default matmul precision feeds f32 operands to the MXU as bf16; the
    two paths accumulate that rounding differently (2.6e-2 divergence over 16
    steps), so the *consistency* check pins precision to isolate real bugs.
    """
    from sgl_kernel_npu_tpu.models import qwen3_next as q3

    cfg = q3.Qwen3NextConfig(hidden=64, num_k_heads=2, num_v_heads=4,
                             head_k_dim=16, head_v_dim=16, mlp_intermediate=128,
                             chunk_size=8)
    rng = np.random.default_rng(0)
    w = q3.init_weights(jax.random.key(0), cfg)
    b, s = 2, 16
    x = jnp.asarray(rng.standard_normal((b, s, cfg.hidden)) * 0.5, jnp.float32)

    with jax.default_matmul_precision("float32"):
        full, conv_fin, ssm_fin = jax.jit(lambda xx: q3.prefill(cfg, w, xx))(x)

        conv_pool = jnp.zeros((b, cfg.qkv_dim, cfg.conv_width - 1), jnp.float32)
        ssm_pool = jnp.zeros(
            (b, cfg.num_v_heads, cfg.head_k_dim, cfg.head_v_dim), jnp.float32
        )
        idx = jnp.arange(b, dtype=jnp.int32)
        dstep = jax.jit(lambda xt, c, ss: q3.decode_step(cfg, w, xt, c, ss, idx))
        outs = []
        for t in range(s):
            o, conv_pool, ssm_pool = dstep(x[:, t], conv_pool, ssm_pool)
            outs.append(np.asarray(o))
    got = np.stack(outs, axis=1)
    rel = np.abs(got - np.asarray(full)).max()
    srel = np.abs(np.asarray(ssm_pool) - np.asarray(ssm_fin)).max()
    ok = rel < 5e-3 and srel < 5e-3
    print(f"{'OK ' if ok else 'FAIL'} qwen3_next decode==prefill on chip: "
          f"max_abs_diff={rel:.2e} state_diff={srel:.2e}")
    return ok


def gpt_oss_decode():
    """Third family: sinks attention + sliding window + clamped SwiGLU,
    Pallas decode path vs the jnp golden composition, on chip."""
    from sgl_kernel_npu_tpu.models import gpt_oss as m

    cfg = m.GptOssConfig(head_dim=128, page_size=128)  # chip-aligned dims
    rng = np.random.default_rng(0)
    params = m.init_weights(jax.random.key(0), cfg)
    b, max_pages = 4, 2
    caches = m.init_kv_cache(cfg, b * max_pages + 1)
    bt = jnp.arange(1, 1 + b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    x = jnp.asarray(rng.standard_normal((b, cfg.hidden)) * .5, jnp.float32)
    pos = jnp.zeros((b,), jnp.int32)
    ctx = jnp.ones((b,), jnp.int32)
    slots = bt[:, 0] * cfg.page_size
    got, _ = m.decode_step(cfg, params, x, pos, caches, bt, ctx, slots)
    want, _ = m.decode_step_ref(cfg, params, x, pos, caches, bt, ctx, slots)
    rel = np.abs(np.asarray(got) - np.asarray(want)).max()
    ok = rel < 3e-2
    print(f"{'OK ' if ok else 'FAIL'} gpt_oss decode vs golden on chip: "
          f"max_abs_diff={rel:.2e}")
    return ok


def llama_engine_serving():
    """Fourth family + runtime: the continuous-batching engine serving a tiny
    Llama on the real chip (radix reuse + chunked Pallas prefill + paged
    decode) must reproduce the direct prefill+decode chain, also on chip."""
    from sgl_kernel_npu_tpu.models import llama as m
    from sgl_kernel_npu_tpu.runtime.engine import Engine, llama_adapter

    cfg = m.LlamaConfig(vocab_size=61, num_layers=2, head_dim=128, page_size=8)
    params = m.init_weights(jax.random.key(7), cfg)
    prompt = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    n_new = 4

    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    got = eng.run([prompt], n_new)[0]

    caches = m.init_kv_cache(cfg, 32)
    bt = jnp.arange(1, 17, dtype=jnp.int32).reshape(1, 16)
    page = cfg.page_size
    slot = lambda i: int(bt[0, i // page]) * page + i % page
    n = len(prompt)
    slots = jnp.asarray([slot(i) for i in range(n)], jnp.int32)
    h, caches = m.prefill_step(
        cfg, params, m.embed(params, jnp.asarray(prompt, jnp.int32)),
        jnp.asarray([n], jnp.int32), caches, bt, jnp.asarray([n], jnp.int32),
        slots, max_q=16)
    want = [int(jnp.argmax(m.lm_head(params, h[n - 1])))]
    for _ in range(n_new - 1):
        i = n + len(want) - 1
        y, caches = m.decode_step(
            cfg, params, m.embed(params, jnp.asarray([want[-1]], jnp.int32)),
            jnp.asarray([i], jnp.int32), caches, bt,
            jnp.asarray([i + 1], jnp.int32), jnp.asarray([slot(i)], jnp.int32))
        want.append(int(jnp.argmax(m.lm_head(params, y[0]))))
    ok = got == want
    print(f"{'OK ' if ok else 'FAIL'} llama engine serving on chip: "
          f"engine={got} direct={want}")

    # speculative decoding in the engine loop (draft == target: all accepted)
    spec = Engine(llama_adapter(cfg, params), num_pages=64,
                  max_batch=2, max_pages_per_req=16, prefill_chunk=8,
                  spec_k=2, draft_adapter=llama_adapter(cfg, params))
    got_s = spec.run([prompt], n_new)[0]
    ok_s = got_s == want and spec.stats["spec_rounds"] < n_new
    print(f"{'OK ' if ok_s else 'FAIL'} llama engine spec decode on chip: "
          f"engine={got_s} rounds={spec.stats['spec_rounds']} "
          f"accepted={spec.stats['spec_accepted']}")
    return ok and ok_s


def main():
    print(f"device: {jax.devices()[0].device_kind}")
    ok = deepseek_decode()
    ok &= qwen3_next_consistency()
    ok &= gpt_oss_decode()
    ok &= llama_engine_serving()
    print("ALL OK" if ok else "SOME FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
