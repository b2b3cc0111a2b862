"""Continuous-batching engine: correctness vs direct model calls, radix reuse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.models import llama as m
from sgl_kernel_npu_tpu.runtime.engine import Engine, HostKVPool, llama_adapter


@pytest.fixture(scope="module")
def setup():
    cfg = m.LlamaConfig(vocab_size=61, num_layers=2, page_size=4)
    params = m.init_weights(jax.random.key(7), cfg)
    return cfg, params


def reference_generate(cfg, params, prompt, n_new, num_pages=32):
    """Straight-line generation with the model functions and a private cache."""
    caches = m.init_kv_cache(cfg, num_pages)
    max_pages = 16
    bt = jnp.arange(1, 1 + max_pages, dtype=jnp.int32).reshape(1, max_pages)
    page = cfg.page_size
    toks = list(int(t) for t in prompt)
    slot = lambda i: int(bt[0, i // page]) * page + i % page
    n = len(toks)
    slots = jnp.asarray([slot(i) for i in range(n)], jnp.int32)
    h, caches = m.prefill_step(
        cfg, params, m.embed(params, jnp.asarray(toks, jnp.int32)),
        jnp.asarray([n], jnp.int32), caches, bt, jnp.asarray([n], jnp.int32),
        slots, max_q=32)
    out = [int(jnp.argmax(m.lm_head(params, h[n - 1])))]
    for _ in range(n_new - 1):
        i = len(toks) + len(out) - 1                 # position of the new token
        y, caches = m.decode_step(
            cfg, params, m.embed(params, jnp.asarray([out[-1]], jnp.int32)),
            jnp.asarray([i], jnp.int32), caches, bt, jnp.asarray([i + 1], jnp.int32),
            jnp.asarray([slot(i)], jnp.int32))
        out.append(int(jnp.argmax(m.lm_head(params, y[0]))))
    return out


def test_engine_matches_reference(setup):
    cfg, params = setup
    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    prompt = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]     # 10 tokens (2.5 pages)
    got = eng.run([prompt], 6)[0]
    want = reference_generate(cfg, params, prompt, 6)
    assert got == want


def test_engine_batched_matches_individual(setup):
    cfg, params = setup
    p1 = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    p2 = [40, 41, 42, 43, 44]
    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    got = eng.run([p1, p2], 3)
    assert got[0] == reference_generate(cfg, params, p1, 3)
    assert got[1] == reference_generate(cfg, params, p2, 3)


def test_radix_prefix_reuse(setup):
    cfg, params = setup
    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    shared = [5, 9, 2, 33, 17, 4, 8, 21]            # 2 full pages
    p1 = shared + [60, 3]
    p2 = shared + [11, 12, 13]
    out1 = eng.run([p1], 4)[0]
    pre1 = eng.stats["prefill_tokens"]
    assert eng.cm.cached_pages >= 2                 # prefix got cached
    out2 = eng.run([p2], 4)[0]
    pre2 = eng.stats["prefill_tokens"] - pre1
    assert eng.stats["cached_tokens"] >= 8          # second prompt reused it
    assert pre2 == len(p2) - 8                      # only the tail prefilled
    # reuse must not change results
    assert out2 == reference_generate(cfg, params, p2, 4)
    assert out1 == reference_generate(cfg, params, p1, 4)


def test_identical_inflight_prompts(setup):
    """Two identical prompts admitted together (the insert race path)."""
    cfg, params = setup
    p = [7, 7, 3, 2, 9, 9, 1, 0, 5]
    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    got = eng.run([p, p], 4)
    want = reference_generate(cfg, params, p, 4)
    assert got[0] == want and got[1] == want
    # all pages accounted for after retirement: free + cached == total
    assert eng.cm.free_pages + eng.cm.cached_pages == 64


def test_host_kv_tier_offload_and_restore(setup):
    """L2 host tier: a finished prompt's KV offloads to the page-major host
    pool; after the device radix evicts it, re-admission restores the prefix
    from host instead of recomputing — same tokens, fewer prefill tokens."""
    cfg, params = setup
    page = cfg.page_size
    eng = Engine(llama_adapter(cfg, params), num_pages=16,
                 max_batch=2, max_pages_per_req=8, prefill_chunk=8,
                 host_pool_pages=64)
    pa = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]          # 2 full pages cached
    out1 = eng.run([pa], 4)[0]
    assert eng.stats["host_offloaded_pages"] == 2
    # flood the tiny device pool with other prompts → LRU evicts pa's pages
    # (checking match() mid-flood would bump pa's recency — check only once)
    for base in range(0, 55, 9):
        eng.run([[(base + i) % 61 for i in range(12)],
                 [(base + 30 + i) % 61 for i in range(12)]], 2)
    dev_matched, _ = eng.cm.match(np.asarray(pa[:8], np.int32))
    if dev_matched:
        eng.cm.release(np.asarray(pa[:dev_matched], np.int32))
    assert dev_matched == 0, "device radix should have evicted the prefix"
    pre_before = eng.stats["prefill_tokens"]
    out2 = eng.run([pa], 4)[0]
    assert out2 == out1
    assert eng.stats["host_restored_tokens"] == 8
    # only the tail (10 - 8 restored) prefilled
    assert eng.stats["prefill_tokens"] - pre_before == len(pa) - 8
    assert eng.cm.free_pages + eng.cm.cached_pages == 16


def test_prefill_decode_disaggregation(setup):
    """PD disaggregation through a SHARED host pool: a prefill engine computes
    the prompt KV and offloads it; a separate decode engine admission-matches
    the same prompt, restores the prefix from the pool, and generates the
    same tokens as a monolithic engine — with (almost) no prefill compute of
    its own (the reference's transfer_kv_dim_exchange serving role)."""
    cfg, params = setup
    pool = HostKVPool(64, cfg.page_size)
    prompt = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]      # 2 full pages + tail

    pe = Engine(llama_adapter(cfg, params), num_pages=32,
                max_batch=2, max_pages_per_req=8, prefill_chunk=8,
                host_pool=pool)
    pe.run([prompt], 1)                               # prefill-only service
    assert pe.stats["host_offloaded_pages"] == 2

    de = Engine(llama_adapter(cfg, params), num_pages=32,
                max_batch=2, max_pages_per_req=8, prefill_chunk=8,
                host_pool=pool)
    got = de.run([prompt], 6)[0]
    want = reference_generate(cfg, params, prompt, 6)
    assert got == want
    assert de.stats["host_restored_tokens"] == 8      # both full pages rode the pool
    assert de.stats["prefill_tokens"] == len(prompt) - 8


def test_mixed_prefill_decode_scheduling(setup):
    """A request admitted mid-decode must not stall the decoding one, and
    interleaved (mixed) scheduling must produce identical tokens."""
    cfg, params = setup
    p1 = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    p2 = [40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51]
    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=4)
    r1 = eng.add_request(p1, 8)
    # drive r1 through prefill (3 chunks of 4) into decode
    while not eng.finished.get(r1) and len(
            [r for r in eng.running if r.pos >= r.prompt_len]) == 0:
        eng.step()
    decoded_before = len(eng.running[0].out_tokens)
    r2 = eng.add_request(p2, 5)
    # one mixed step: r2 prefills its first chunk AND r1 decodes a token
    eng.step()
    r1_req = next(r for r in eng.running if r.rid == r1)
    r2_req = next(r for r in eng.running if r.rid == r2)
    assert len(r1_req.out_tokens) == decoded_before + 1
    assert 0 < r2_req.pos < r2_req.prompt_len
    while eng.waiting or eng.running:
        eng.step()
    assert eng.finished[r1] == reference_generate(cfg, params, p1, 8)
    assert eng.finished[r2] == reference_generate(cfg, params, p2, 5)
    assert eng.cm.free_pages + eng.cm.cached_pages == 64


def test_pages_released_on_finish(setup):
    cfg, params = setup
    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    eng.run([[1, 2, 3, 4, 5, 6], [9, 8, 7, 6, 5]], 6)
    assert eng.cm.free_pages + eng.cm.cached_pages == 64


def test_deepseek_engine_matches_reference(rng):
    """Engine with the DeepSeek adapter == direct prefill+decode chain."""
    from sgl_kernel_npu_tpu.models import deepseek_v3 as dsm
    from sgl_kernel_npu_tpu.runtime.engine import deepseek_adapter

    cfg = dsm.DeepSeekV3Config(num_layers=1, page_size=4, vocab_size=61)
    params = dsm.init_weights(jax.random.key(3), cfg, jnp.float32)
    prompt = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    n_new = 4

    eng = Engine(deepseek_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    got = eng.run([prompt], n_new)[0]

    # reference chain: full prefill then decode token by token
    caches = dsm.init_kv_cache(cfg, 32, jnp.float32)
    page = cfg.page_size
    bt = jnp.arange(1, 17, dtype=jnp.int32).reshape(1, 16)
    slot = lambda i: int(bt[0, i // page]) * page + i % page
    n = len(prompt)
    slots = jnp.asarray([slot(i) for i in range(n)], jnp.int32)
    h, caches = dsm.prefill_step(
        cfg, params, dsm.embed(params, jnp.asarray(prompt, jnp.int32)),
        jnp.asarray([n], jnp.int32), caches, bt, jnp.asarray([n], jnp.int32),
        slots, max_q=16)
    want = [int(jnp.argmax(dsm.lm_head(params, h[n - 1])))]
    for _ in range(n_new - 1):
        i = n + len(want) - 1
        y, caches = dsm.decode_step(
            cfg, params, dsm.embed(params, jnp.asarray([want[-1]], jnp.int32)),
            jnp.asarray([i], jnp.int32), caches, bt,
            jnp.asarray([i + 1], jnp.int32), jnp.asarray([slot(i)], jnp.int32))
        want.append(int(jnp.argmax(dsm.lm_head(params, y[0]))))
    assert got == want


@pytest.mark.slow
def test_deepseek_engine_ep_sharded_serving(rng, mesh8):
    """Continuous-batching engine with EP-SHARDED expert weights: the decode
    MoE runs through Buffer.fused_deep_moe (dispatch → W8A8 GMMs → combine
    over the 8-rank mesh) and must emit the same tokens as the single-chip
    W8A8 grouped path (identical math; only collective reordering differs)."""
    from sgl_kernel_npu_tpu.config import EPConfig
    from sgl_kernel_npu_tpu.models import deepseek_v3 as dsm
    from sgl_kernel_npu_tpu.parallel.buffer import Buffer
    from sgl_kernel_npu_tpu.runtime.engine import deepseek_adapter

    cfg = dsm.DeepSeekV3Config(num_layers=1, page_size=4, vocab_size=61,
                               num_experts=16, topk=4)
    params = dsm.init_weights(jax.random.key(3), cfg, jnp.float32)
    moe_q = dsm.quantize_moe_weights(cfg, params)
    prompts = [[5, 9, 2, 33, 17, 4, 8, 21, 60, 3], [40, 41, 42, 43, 44]]
    n_new = 4

    single = Engine(deepseek_adapter(cfg, params, moe_weights_q=moe_q),
                    num_pages=128, max_batch=8, max_pages_per_req=16,
                    prefill_chunk=8)
    want = single.run(prompts, n_new)

    buf = Buffer(mesh8, "ep", num_experts=cfg.num_experts,
                 config=EPConfig(num_max_dispatch_tokens_per_rank=8))
    ep = Engine(deepseek_adapter(cfg, params, moe_weights_q=moe_q,
                                 ep_buffer=buf),
                num_pages=128, max_batch=8, max_pages_per_req=16,
                prefill_chunk=8)
    got = ep.run(prompts, n_new)
    assert got == want


def test_gpt_oss_engine_matches_reference(rng):
    """Engine with the GPT-OSS adapter == direct prefill+decode chain."""
    from sgl_kernel_npu_tpu.models import gpt_oss as gm
    from sgl_kernel_npu_tpu.runtime.engine import gpt_oss_adapter

    cfg = gm.GptOssConfig(num_layers=2, page_size=4, vocab_size=61,
                          sliding_window=8)
    params = gm.init_weights(jax.random.key(5), cfg)
    prompt = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    n_new = 4

    eng = Engine(gpt_oss_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    got = eng.run([prompt], n_new)[0]

    caches = gm.init_kv_cache(cfg, 32)
    page = cfg.page_size
    bt = jnp.arange(1, 17, dtype=jnp.int32).reshape(1, 16)
    slot = lambda i: int(bt[0, i // page]) * page + i % page
    n = len(prompt)
    slots = jnp.asarray([slot(i) for i in range(n)], jnp.int32)
    h, caches = gm.prefill_step(
        cfg, params, gm.embed(params, jnp.asarray(prompt, jnp.int32)),
        jnp.asarray([n], jnp.int32), caches, bt, jnp.asarray([n], jnp.int32),
        slots, max_q=16)
    want = [int(jnp.argmax(gm.lm_head(params, h[n - 1][None])[0]))]
    for _ in range(n_new - 1):
        i = n + len(want) - 1
        y, caches = gm.decode_step(
            cfg, params, gm.embed(params, jnp.asarray([want[-1]], jnp.int32)),
            jnp.asarray([i], jnp.int32), caches, bt,
            jnp.asarray([i + 1], jnp.int32), jnp.asarray([slot(i)], jnp.int32))
        want.append(int(jnp.argmax(gm.lm_head(params, y)[0])))
    assert got == want


def test_multi_lora_serving(setup):
    """Batched requests with different LoRA adapters == per-adapter direct runs."""
    from sgl_kernel_npu_tpu.runtime.engine import llama_adapter as mk_adapter

    cfg, params = setup
    lora = m.init_lora(jax.random.key(21), cfg, num_adapters=3, rank=4)
    prompts = [[5, 9, 2, 33, 17], [40, 41, 42, 43, 44], [7, 3, 2, 9, 1]]
    lora_ids = [1, 2, 0]
    eng = Engine(mk_adapter(cfg, params, lora=lora), num_pages=64,
                 max_batch=4, max_pages_per_req=16, prefill_chunk=8)
    rids = [eng.add_request(p, 4, lora_id=l) for p, l in zip(prompts, lora_ids)]
    while eng.waiting or eng.running:
        eng.step()
    got = [eng.finished[r] for r in rids]

    # direct single-request generation with the adapter applied
    def direct(prompt, lid):
        caches = m.init_kv_cache(cfg, 32)
        bt = jnp.arange(1, 17, dtype=jnp.int32).reshape(1, 16)
        page = cfg.page_size
        slot = lambda i: int(bt[0, i // page]) * page + i % page
        n = len(prompt)
        slots = jnp.asarray([slot(i) for i in range(n)], jnp.int32)
        h, caches = m.prefill_step(
            cfg, params, m.embed(params, jnp.asarray(prompt, jnp.int32)),
            jnp.asarray([n], jnp.int32), caches, bt, jnp.asarray([n], jnp.int32),
            slots, max_q=8, lora=lora, lora_idx=jnp.full((n,), lid, jnp.int32))
        out = [int(jnp.argmax(m.lm_head(params, h[n - 1])))]
        for _ in range(3):
            i = n + len(out) - 1
            y, caches = m.decode_step(
                cfg, params, m.embed(params, jnp.asarray([out[-1]], jnp.int32)),
                jnp.asarray([i], jnp.int32), caches, bt,
                jnp.asarray([i + 1], jnp.int32), jnp.asarray([slot(i)], jnp.int32),
                lora=lora, lora_idx=jnp.asarray([lid], jnp.int32))
            out.append(int(jnp.argmax(m.lm_head(params, y[0]))))
        return out

    for g, p, l in zip(got, prompts, lora_ids):
        assert g == direct(p, l)
    # adapters actually apply: the hidden states differ between adapter ids
    caches = m.init_kv_cache(cfg, 32)
    bt = jnp.arange(1, 17, dtype=jnp.int32).reshape(1, 16)
    n = len(prompts[0])
    slots = jnp.asarray([int(bt[0, i // cfg.page_size]) * cfg.page_size
                         + i % cfg.page_size for i in range(n)], jnp.int32)
    args = (cfg, params, m.embed(params, jnp.asarray(prompts[0], jnp.int32)),
            jnp.asarray([n], jnp.int32), caches, bt, jnp.asarray([n], jnp.int32),
            slots)
    h0, _ = m.prefill_step(*args, max_q=8, lora=lora,
                           lora_idx=jnp.zeros((n,), jnp.int32))
    h1, _ = m.prefill_step(*args, max_q=8, lora=lora,
                           lora_idx=jnp.ones((n,), jnp.int32))
    assert not np.allclose(np.asarray(h0), np.asarray(h1), atol=1e-5)


def test_host_kv_tier_deepseek_dict_caches(rng):
    """The host tier handles dict-pytree caches (DeepSeek nope/rope): offload
    + restore reproduce the recomputed output."""
    from sgl_kernel_npu_tpu.models import deepseek_v3 as dsm
    from sgl_kernel_npu_tpu.runtime.engine import deepseek_adapter

    cfg = dsm.DeepSeekV3Config(num_layers=1, page_size=4, vocab_size=61)
    params = dsm.init_weights(jax.random.key(3), cfg, jnp.float32)
    pa = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    eng = Engine(deepseek_adapter(cfg, params), num_pages=16,
                 max_batch=2, max_pages_per_req=8, prefill_chunk=8,
                 host_pool_pages=64)
    out1 = eng.run([pa], 4)[0]
    assert eng.stats["host_offloaded_pages"] == 2
    for base in range(0, 55, 9):
        eng.run([[(base + i) % 61 for i in range(12)],
                 [(base + 30 + i) % 61 for i in range(12)]], 2)
    out2 = eng.run([pa], 4)[0]
    assert out2 == out1
    assert eng.stats["host_restored_tokens"] >= 8


def test_engine_context_parallel_prefill_matches(setup):
    """Item: CP under the engine.  Serving with ring-attention prefill over a
    4-device 'cp' mesh must generate the same tokens as the single-device
    engine (prefill_chunk >= prompt and divisible by the ring size — CP
    replaces chunking; parallel/ring_attention.py)."""
    from sgl_kernel_npu_tpu.runtime.engine import llama_cp_adapter

    cfg, params = setup
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("cp",))
    eng = Engine(llama_cp_adapter(cfg, params, mesh), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=16)
    p1 = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    p2 = [40, 41, 42, 43, 44]
    got = eng.run([p1, p2], 3)
    assert got[0] == reference_generate(cfg, params, p1, 3)
    assert got[1] == reference_generate(cfg, params, p2, 3)


def test_engine_pipeline_parallel_matches(setup):
    """Item: PP under the engine.  Serving with the layer stack split into 2
    stages over a 'pp' mesh (stage-sharded weights + KV) must generate the
    same tokens as the single-device engine (models/llama_pp.py)."""
    from sgl_kernel_npu_tpu.runtime.engine import llama_pp_adapter

    cfg, params = setup
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("pp",))
    eng = Engine(llama_pp_adapter(cfg, params, mesh), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    p1 = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    p2 = [40, 41, 42, 43, 44]
    got = eng.run([p1, p2], 3)
    assert got[0] == reference_generate(cfg, params, p1, 3)
    assert got[1] == reference_generate(cfg, params, p2, 3)
