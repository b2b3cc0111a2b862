"""Token sampling (ops/sampling.py) + engine integration.

The reference ships only the greedy tree verifier; the sampler itself is this
framework's serving surface: per-row temperature / top-k / top-p / min-p over
a mixed batch, deterministic in (seed, step)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.ops.sampling import sample_tokens


def _call(logits, temp, tk=0, tp=1.0, mp=0.0, seed=0, step=0):
    b = logits.shape[0]
    return np.asarray(sample_tokens(
        jnp.asarray(logits, jnp.float32),
        jnp.full((b,), seed, jnp.int32), jnp.full((b,), step, jnp.int32),
        jnp.full((b,), temp, jnp.float32), jnp.full((b,), tk, jnp.int32),
        jnp.full((b,), tp, jnp.float32), jnp.full((b,), mp, jnp.float32)))


def test_temperature_zero_is_greedy(rng):
    logits = rng.standard_normal((5, 37)).astype(np.float32)
    got = _call(logits, 0.0)
    np.testing.assert_array_equal(got, logits.argmax(-1))


def test_top_k_one_is_greedy_at_any_temperature(rng):
    logits = rng.standard_normal((4, 29)).astype(np.float32)
    for seed in range(5):
        got = _call(logits, 5.0, tk=1, seed=seed)
        np.testing.assert_array_equal(got, logits.argmax(-1))


def test_top_k_mask_respected(rng):
    logits = rng.standard_normal((1, 50)).astype(np.float32)
    allowed = set(np.argsort(logits[0])[-8:].tolist())
    draws = {int(_call(logits, 2.0, tk=8, seed=s)[0]) for s in range(64)}
    assert draws <= allowed
    assert len(draws) > 1                      # actually stochastic


def test_top_p_keeps_nucleus(rng):
    # one dominant token (p≈0.97) → top_p=0.5 must always pick it
    logits = np.zeros((1, 16), np.float32)
    logits[0, 3] = 8.0
    for s in range(16):
        assert int(_call(logits, 1.0, tp=0.5, seed=s)[0]) == 3


def test_min_p_filters_tail(rng):
    logits = np.zeros((1, 10), np.float32)
    logits[0, 0] = 3.0                         # pmax token
    # min_p=0.9 keeps only tokens with p >= 0.9*pmax → only token 0
    for s in range(16):
        assert int(_call(logits, 1.0, mp=0.9, seed=s)[0]) == 0


def test_deterministic_in_seed_and_step(rng):
    logits = rng.standard_normal((3, 40)).astype(np.float32)
    a = _call(logits, 1.0, seed=7, step=2)
    b = _call(logits, 1.0, seed=7, step=2)
    c = _call(logits, 1.0, seed=8, step=2)
    d = _call(logits, 1.0, seed=7, step=3)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any() or (a != d).any()


def test_mixed_batch_rows_independent(rng):
    logits = rng.standard_normal((2, 30)).astype(np.float32)
    out = np.asarray(sample_tokens(
        jnp.asarray(logits), jnp.asarray([0, 5], jnp.int32),
        jnp.asarray([0, 0], jnp.int32),
        jnp.asarray([0.0, 1.5], jnp.float32),    # row 0 greedy, row 1 sampled
        jnp.asarray([0, 0], jnp.int32),
        jnp.asarray([1.0, 1.0], jnp.float32),
        jnp.asarray([0.0, 0.0], jnp.float32)))
    assert out[0] == logits[0].argmax()


def test_engine_sampled_run(rng):
    """Engine end-to-end: greedy default unchanged; sampled runs reproduce
    given a seed and differ across seeds."""
    from sgl_kernel_npu_tpu.models import llama as lm
    from sgl_kernel_npu_tpu.runtime.engine import (
        Engine, SamplingParams, llama_adapter)

    cfg = lm.LlamaConfig(num_layers=1, vocab_size=61)
    params = lm.init_weights(jax.random.key(23), cfg)
    prompts = [[1, 5, 9, 2], [7, 3]]

    def fresh():
        return Engine(llama_adapter(cfg, params), num_pages=64)

    greedy = fresh().run(prompts, 5)
    assert greedy == fresh().run(prompts, 5)       # determinism
    sp = SamplingParams(temperature=1.2, top_k=20, seed=11)
    s1 = fresh().run(prompts, 5, sampling=sp)
    s2 = fresh().run(prompts, 5, sampling=sp)
    assert s1 == s2                                # seeded reproducibility
    s3 = fresh().run(prompts, 5,
                     sampling=SamplingParams(temperature=1.2, top_k=20, seed=12))
    assert s3 != s1 or fresh().run(prompts, 5, sampling=SamplingParams(
        temperature=1.2, top_k=20, seed=13)) != s1
    assert all(len(o) == 5 for o in s1)


def test_apply_penalties():
    from sgl_kernel_npu_tpu.ops.sampling import apply_penalties

    logits = jnp.asarray([[2.0, -1.0, 0.5, 3.0]], jnp.float32)
    counts = jnp.asarray([[2, 1, 0, 0]], jnp.int32)
    out = np.asarray(apply_penalties(
        logits, counts, jnp.asarray([2.0], jnp.float32),
        jnp.asarray([0.3], jnp.float32), jnp.asarray([0.1], jnp.float32)))
    # seen positive: /2 then -0.3 -0.1*2 ; seen negative: *2 then -0.3 -0.1
    np.testing.assert_allclose(out[0], [2/2 - 0.3 - 0.2, -2.0 - 0.3 - 0.1,
                                        0.5, 3.0], rtol=1e-6)
    # [B,1] zero counts broadcast as a no-op
    out2 = np.asarray(apply_penalties(
        logits, jnp.zeros((1, 1), jnp.int32), jnp.asarray([2.0], jnp.float32),
        jnp.asarray([0.3], jnp.float32), jnp.asarray([0.1], jnp.float32)))
    np.testing.assert_allclose(out2, np.asarray(logits))


def test_engine_stop_tokens_and_repetition(rng):
    """Stop tokens end requests early; a huge repetition penalty forbids
    repeats, so sampled outputs are all-distinct tokens."""
    from sgl_kernel_npu_tpu.models import llama as lm
    from sgl_kernel_npu_tpu.runtime.engine import (
        Engine, SamplingParams, llama_adapter)

    cfg = lm.LlamaConfig(num_layers=1, vocab_size=61)
    params = lm.init_weights(jax.random.key(25), cfg)
    prompts = [[1, 5, 9, 2]]

    greedy = Engine(llama_adapter(cfg, params), num_pages=64).run(prompts, 6)[0]
    stop = greedy[1]
    stopped = Engine(llama_adapter(cfg, params), num_pages=64)
    rid = stopped.add_request(prompts[0], 6, stop_tokens=[stop])
    while stopped.waiting or stopped.running:
        stopped.step()
    out = stopped.finished[rid]
    first = greedy.index(stop)                   # ends AT the first occurrence
    assert out == greedy[: first + 1]

    sp = SamplingParams(temperature=1.0, seed=3, repetition_penalty=1e9,
                        presence_penalty=100.0)
    # random weights emit near-uniform logits; the huge penalties make any
    # prompt/generated token unrepeatable → outputs are distinct non-prompt ids
    out = Engine(llama_adapter(cfg, params), num_pages=64).run(
        prompts, 8, sampling=sp)[0]
    assert len(set(out)) == len(out)
    assert not (set(out) & set(prompts[0]))


def test_token_mask_and_logprobs(rng):
    from sgl_kernel_npu_tpu.ops.sampling import apply_token_mask, token_logprobs

    logits = jnp.asarray(rng.standard_normal((2, 12)), jnp.float32)
    mask = jnp.zeros((12,), bool).at[jnp.asarray([2, 5])].set(True)
    masked = apply_token_mask(logits, mask)
    assert set(np.asarray(jnp.argmax(masked, -1)).tolist()) <= {2, 5}
    lp = np.asarray(token_logprobs(logits, jnp.asarray([3, 7], jnp.int32)))
    ref = np.log(np.exp(np.asarray(logits)) /
                 np.exp(np.asarray(logits)).sum(-1, keepdims=True))
    np.testing.assert_allclose(lp, ref[[0, 1], [3, 7]], rtol=1e-5)


def test_engine_logprobs(rng):
    """Greedy engine run returns per-token logprobs that match recomputing
    log-softmax over a fresh run's logits (sum over steps < 0, lengths line
    up, greedy tokens are the argmax so each logprob is the row max)."""
    from sgl_kernel_npu_tpu.models import llama as lm
    from sgl_kernel_npu_tpu.runtime.engine import Engine, llama_adapter

    cfg = lm.LlamaConfig(num_layers=1, vocab_size=61)
    params = lm.init_weights(jax.random.key(26), cfg)
    eng = Engine(llama_adapter(cfg, params), num_pages=64)
    rid = eng.add_request([1, 5, 9, 2], 5, logprobs=True)
    while eng.waiting or eng.running:
        eng.step()
    toks, lps = eng.finished[rid], eng.logprobs[rid]
    assert len(lps) == len(toks) == 5
    assert all(-20 < p <= 0 for p in lps)


def test_engine_rejects_sampling_with_spec():
    from sgl_kernel_npu_tpu.models import llama as lm
    from sgl_kernel_npu_tpu.runtime.engine import (
        Engine, SamplingParams, llama_adapter)

    cfg = lm.LlamaConfig(num_layers=1, vocab_size=61)
    params = lm.init_weights(jax.random.key(24), cfg)
    eng = Engine(llama_adapter(cfg, params), num_pages=64, spec_k=2,
                 draft_adapter=llama_adapter(cfg, params))
    with pytest.raises(ValueError):
        eng.add_request([1, 2, 3], 4,
                        sampling=SamplingParams(temperature=1.0))
