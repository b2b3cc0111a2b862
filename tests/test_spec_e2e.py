"""End-to-end speculative decoding: chain drafts + one-shot verify == greedy.

Composes the spec-decode ops (ops/speculative.verify_tree_greedy) with the model
stack: k draft tokens are scored in ONE varlen prefill call (a chain tree's
attention mask IS the causal mask, so the paged prefill kernel is the tree
scorer), verified greedily, and the accepted prefix must reproduce vanilla
token-by-token greedy decoding — including after a mid-chain rejection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.models import llama as m
from sgl_kernel_npu_tpu.ops import speculative as sp


@pytest.fixture(scope="module")
def setup():
    cfg = m.LlamaConfig(vocab_size=61, num_layers=2, page_size=4)
    params = m.init_weights(jax.random.key(11), cfg)
    return cfg, params


def _greedy(cfg, params, prompt, n_new):
    caches = m.init_kv_cache(cfg, 32)
    bt = jnp.arange(1, 17, dtype=jnp.int32).reshape(1, 16)
    page = cfg.page_size
    slot = lambda i: int(bt[0, i // page]) * page + i % page
    n = len(prompt)
    slots = jnp.asarray([slot(i) for i in range(n)], jnp.int32)
    h, caches = m.prefill_step(
        cfg, params, m.embed(params, jnp.asarray(prompt, jnp.int32)),
        jnp.asarray([n], jnp.int32), caches, bt, jnp.asarray([n], jnp.int32),
        slots, max_q=32)
    out = [int(jnp.argmax(m.lm_head(params, h[n - 1])))]
    for _ in range(n_new - 1):
        i = n + len(out) - 1
        y, caches = m.decode_step(
            cfg, params, m.embed(params, jnp.asarray([out[-1]], jnp.int32)),
            jnp.asarray([i], jnp.int32), caches, bt, jnp.asarray([i + 1], jnp.int32),
            jnp.asarray([slot(i)], jnp.int32))
        out.append(int(jnp.argmax(m.lm_head(params, y[0]))))
    return out


def _spec_round(cfg, params, caches, bt, prompt_len, root_token, drafts):
    """Score [root]+drafts in one prefill call, verify, return accepted tokens.

    Returns (accepted tokens INCLUDING the bonus target token, new caches)."""
    page = cfg.page_size
    slot = lambda i: int(bt[0, i // page]) * page + i % page
    cand = [root_token] + list(drafts)
    d = len(cand)
    n = prompt_len
    slots = jnp.asarray([slot(n + j) for j in range(d)], jnp.int32)
    h, caches = m.prefill_step(
        cfg, params, m.embed(params, jnp.asarray(cand, jnp.int32)),
        jnp.asarray([d], jnp.int32), caches, bt, jnp.asarray([n + d], jnp.int32),
        slots, max_q=8)
    target = jnp.argmax(m.lm_head(params, h), -1).astype(jnp.int32)[None]  # [1, D]

    # chain tree: next_token[i] = i+1, no siblings
    nt = jnp.asarray([[*range(1, d), -1]], jnp.int32)
    ns = jnp.full((1, d), -1, jnp.int32)
    ridx = jnp.arange(d, dtype=jnp.int32)[None]
    predicts, accept_index, accept_num = sp.verify_tree_greedy(
        jnp.asarray([cand], jnp.int32), ridx, nt, ns, target)
    n_acc = int(accept_num[0])
    accepted = [cand[int(accept_index[0, i])] for i in range(1, n_acc + 1)]
    bonus = int(np.asarray(predicts)[int(accept_index[0, n_acc])])
    return accepted + [bonus], caches, n_acc


def _prefill_prompt(cfg, params, prompt):
    caches = m.init_kv_cache(cfg, 32)
    bt = jnp.arange(1, 17, dtype=jnp.int32).reshape(1, 16)
    page = cfg.page_size
    slot = lambda i: int(bt[0, i // page]) * page + i % page
    n = len(prompt)
    slots = jnp.asarray([slot(i) for i in range(n)], jnp.int32)
    h, caches = m.prefill_step(
        cfg, params, m.embed(params, jnp.asarray(prompt, jnp.int32)),
        jnp.asarray([n], jnp.int32), caches, bt, jnp.asarray([n], jnp.int32),
        slots, max_q=32)
    t0 = int(jnp.argmax(m.lm_head(params, h[n - 1])))
    return caches, bt, t0


def test_perfect_drafts_all_accepted(setup):
    """Drafts from the target itself: every draft accepted, output == greedy."""
    cfg, params = setup
    prompt = [5, 9, 2, 33, 17, 4]
    k = 3
    greedy = _greedy(cfg, params, prompt, k + 2)
    caches, bt, t0 = _prefill_prompt(cfg, params, prompt)
    assert t0 == greedy[0]
    drafts = greedy[1 : 1 + k]                      # oracle drafts
    got, caches, n_acc = _spec_round(cfg, params, caches, bt, len(prompt), t0, drafts)
    assert n_acc == k                               # all drafts accepted
    # spec round emitted drafts + bonus == greedy continuation
    assert [t0] + got == greedy[: k + 2]


def test_engine_spec_decode_oracle_draft(setup):
    """Engine spec mode with draft == target: every round accepts all k drafts,
    output identical to the non-speculative engine, far fewer target steps."""
    from sgl_kernel_npu_tpu.runtime.engine import Engine, llama_adapter

    cfg, params = setup
    prompt = [5, 9, 2, 33, 17, 4, 8, 21]
    n_new = 9
    plain = Engine(llama_adapter(cfg, params), num_pages=64,
                   max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    want = plain.run([prompt], n_new)[0]
    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8,
                 spec_k=3, draft_adapter=llama_adapter(cfg, params))
    got = eng.run([prompt], n_new)[0]
    assert got == want
    assert eng.stats["spec_rounds"] > 0
    # oracle drafts: k accepted per round → rounds ≈ n_new/(k+1), not n_new
    assert eng.stats["spec_rounds"] <= -(-n_new // 4) + 1
    assert eng.stats["spec_accepted"] >= 3 * (eng.stats["spec_rounds"] - 1)


def test_engine_spec_decode_weak_draft_still_greedy(setup):
    """A draft with DIFFERENT weights must not change the emitted tokens:
    acceptance only shortcuts positions where draft argmax == target argmax."""
    from sgl_kernel_npu_tpu.models import llama as m
    from sgl_kernel_npu_tpu.runtime.engine import Engine, llama_adapter

    cfg, params = setup
    draft_params = m.init_weights(jax.random.key(99), cfg)
    p1 = [5, 9, 2, 33, 17, 4, 8, 21, 60, 3]
    p2 = [40, 41, 42, 43, 44]
    plain = Engine(llama_adapter(cfg, params), num_pages=64,
                   max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    want = plain.run([p1, p2], 7)
    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8,
                 spec_k=2, draft_adapter=llama_adapter(cfg, draft_params))
    got = eng.run([p1, p2], 7)
    assert got == want
    assert eng.cm.free_pages + eng.cm.cached_pages == 64


def test_engine_spec_decode_deepseek_self_draft(rng):
    """MTP-style self-drafting for the flagship family: a 1-layer DeepSeek
    (the target's own first layer's worth of weights, separate KV pool) drafts
    for the full target — greedy output must match the plain engine exactly
    (docs/serving.md's self-draft recipe)."""
    import dataclasses

    from sgl_kernel_npu_tpu.models import deepseek_v3 as m
    from sgl_kernel_npu_tpu.runtime.engine import Engine, deepseek_adapter

    cfg = m.DeepSeekV3Config(num_layers=2, page_size=4, vocab_size=61)
    params = m.init_weights(jax.random.key(41), cfg, jnp.float32)
    dcfg = dataclasses.replace(cfg, num_layers=1)
    dparams = {"embed": params["embed"], "final_ln": params["final_ln"],
               "layers": params["layers"][:1]}
    prompt = [5, 9, 2, 33, 17, 4]
    plain = Engine(deepseek_adapter(cfg, params), num_pages=64,
                   max_batch=2, max_pages_per_req=16, prefill_chunk=8)
    want = plain.run([prompt], 6)[0]
    eng = Engine(deepseek_adapter(cfg, params), num_pages=64,
                 max_batch=2, max_pages_per_req=16, prefill_chunk=8,
                 spec_k=2, draft_adapter=deepseek_adapter(dcfg, dparams))
    got = eng.run([prompt], 6)[0]
    assert got == want
    assert eng.stats["spec_rounds"] > 0


@pytest.mark.slow
def test_engine_tree_spec_matches_greedy(setup):
    """TREE speculation (root branching + COW suffix pages): greedy output
    identical to the plain engine; with a weak draft the extra branches
    rescue rounds the chain rejects, so tree accepts >= chain accepts (and
    strictly more for some seed)."""
    from sgl_kernel_npu_tpu.models import llama as m
    from sgl_kernel_npu_tpu.runtime.engine import Engine, llama_adapter

    cfg, params = setup
    prompts = [[5, 9, 2, 33, 17, 4], [40, 41, 42], [7, 3, 60, 21]]
    n_new = 8
    plain = Engine(llama_adapter(cfg, params), num_pages=96,
                   max_batch=6, max_pages_per_req=16, prefill_chunk=8)
    want = plain.run(prompts, n_new)

    rescued = False
    for seed in (99, 7, 31):
        draft_params = m.init_weights(jax.random.key(seed), cfg)
        accepts = {}
        for width in (1, 2):
            eng = Engine(llama_adapter(cfg, params), num_pages=96,
                         max_batch=6, max_pages_per_req=16, prefill_chunk=8,
                         spec_k=2, spec_tree_width=width,
                         draft_adapter=llama_adapter(cfg, draft_params))
            got = eng.run(prompts, n_new)
            assert got == want, (width, seed)
            accepts[width] = eng.stats["spec_accepted"]
            assert eng.cm.free_pages + eng.cm.cached_pages == 96  # no page leaks
        assert accepts[2] >= accepts[1], (seed, accepts)
        rescued |= accepts[2] > accepts[1]
    assert rescued, "no seed showed a branch rescue"


def test_engine_tree_spec_oracle_draft(setup):
    """Draft == target: branch 0 is the oracle chain, every round accepts all
    k drafts, output matches the plain engine."""
    from sgl_kernel_npu_tpu.runtime.engine import Engine, llama_adapter

    cfg, params = setup
    prompt = [5, 9, 2, 33, 17, 4, 8, 21]
    n_new = 9
    plain = Engine(llama_adapter(cfg, params), num_pages=64,
                   max_batch=4, max_pages_per_req=16, prefill_chunk=8)
    want = plain.run([prompt], n_new)[0]
    eng = Engine(llama_adapter(cfg, params), num_pages=64,
                 max_batch=4, max_pages_per_req=16, prefill_chunk=8,
                 spec_k=3, spec_tree_width=2,
                 draft_adapter=llama_adapter(cfg, params))
    got = eng.run([prompt], n_new)[0]
    assert got == want
    assert eng.stats["spec_accepted"] >= 3 * (eng.stats["spec_rounds"] - 1)


def test_rejected_draft_falls_back_to_greedy(setup):
    """A corrupted draft stops acceptance; the bonus token is the greedy one."""
    cfg, params = setup
    prompt = [5, 9, 2, 33, 17, 4]
    k = 3
    greedy = _greedy(cfg, params, prompt, k + 2)
    caches, bt, t0 = _prefill_prompt(cfg, params, prompt)
    drafts = list(greedy[1 : 1 + k])
    drafts[1] = (drafts[1] + 7) % cfg.vocab_size    # corrupt the 2nd draft
    if drafts[1] == greedy[2]:
        drafts[1] = (drafts[1] + 1) % cfg.vocab_size
    got, caches, n_acc = _spec_round(cfg, params, caches, bt, len(prompt), t0, drafts)
    assert n_acc == 1                               # only the 1st draft accepted
    # accepted prefix + bonus still follows the greedy sequence
    assert [t0] + got == greedy[:3]
