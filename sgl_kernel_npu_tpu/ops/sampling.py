"""Batched token sampling (temperature / top-k / top-p / min-p).

The reference ships only the speculative greedy verifier
(sample/verify_tree_greedy.py) and leaves sampling to SGLang; a standalone
serving framework needs the sampler itself.  One jit-able function handles a
mixed batch: per-row parameters, greedy rows (temperature 0) short-circuit to
argmax, and every filter composes (top-k → top-p → min-p, the SGLang order).

All shapes static: the filters work on a descending sort of the row ([B, V]
sort per decode step — VPU work XLA fuses; no host sync).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def _filter_logits(logits, top_k, top_p, min_p):
    """Mask logits to the allowed set.  Row params: top_k<=0 disables top-k,
    top_p>=1 disables top-p, min_p<=0 disables min-p."""
    b, v = logits.shape
    sorted_l = jnp.sort(logits, axis=-1)[:, ::-1]           # descending
    # top-k: threshold at the k-th largest logit
    k = jnp.clip(jnp.where(top_k <= 0, v, top_k), 1, v)
    kth = jnp.take_along_axis(sorted_l, (k - 1)[:, None], axis=1)
    logits = jnp.where(logits < kth, NEG_INF, logits)
    # top-p (nucleus): smallest prefix of the sorted distribution with
    # cumulative probability >= top_p; a token survives iff the mass BEFORE it
    # is < top_p (the first token always survives)
    probs_sorted = jax.nn.softmax(sorted_l, axis=-1)
    mass_before = jnp.cumsum(probs_sorted, axis=-1) - probs_sorted
    # per-row threshold logit: the smallest sorted logit still kept
    keep_sorted = mass_before < jnp.minimum(top_p, 1.0)[:, None]
    thr = jnp.min(jnp.where(keep_sorted, sorted_l, jnp.inf), axis=-1)
    logits = jnp.where(logits < thr[:, None], NEG_INF, logits)
    # min-p: drop tokens whose prob < min_p × max prob (computed on the
    # already-filtered row)
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    logits = jnp.where(probs < min_p[:, None] * pmax, NEG_INF, logits)
    return logits


@functools.partial(jax.jit, donate_argnums=())
def sample_tokens(
    logits: jax.Array,       # [B, V] float
    seeds: jax.Array,        # [B] int32 per-request seeds
    steps: jax.Array,        # [B] int32 per-request generation counters
    temperature: jax.Array,  # [B] float32; <= 0 → greedy row
    top_k: jax.Array,        # [B] int32; <= 0 → off
    top_p: jax.Array,        # [B] float32; >= 1 → off
    min_p: jax.Array,        # [B] float32; <= 0 → off
) -> jax.Array:
    """Per-row sampling over a mixed batch; deterministic in (seed, step)."""
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    lf = logits.astype(jnp.float32)
    scaled = lf / jnp.maximum(temperature, 1e-6)[:, None]
    filtered = _filter_logits(scaled, top_k, top_p, min_p)

    def row(key_seed, step, lrow):
        key = jax.random.fold_in(jax.random.key(key_seed), step)
        return jax.random.categorical(key, lrow).astype(jnp.int32)

    sampled = jax.vmap(row)(seeds, steps, filtered)
    return jnp.where(temperature <= 0.0, greedy_tok, sampled)


@jax.jit
def token_logprobs(logits: jax.Array, tokens: jax.Array) -> jax.Array:
    """log P(token) per row under the UNFILTERED distribution [B]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(logp, tokens[:, None].astype(jnp.int32),
                               axis=1)[:, 0]


def apply_token_mask(logits: jax.Array, allowed_mask: jax.Array) -> jax.Array:
    """Constrained decoding hook: keep only tokens where ``allowed_mask`` is
    True ([V] or [B, V] bool — e.g. a grammar/JSON-schema state machine's
    allowed set for this step)."""
    return jnp.where(allowed_mask, logits, NEG_INF)


def sample_tokens_ref(logits, seeds, steps, temperature, top_k, top_p, min_p):
    """Golden twin (same math, un-jitted entry for tests)."""
    return sample_tokens(logits, seeds, steps, temperature, top_k, top_p, min_p)


@jax.jit
def apply_penalties(
    logits: jax.Array,       # [B, V]
    counts: jax.Array,       # [B, V] int32 token occurrence counts
    repetition: jax.Array,   # [B] float32; 1 = off (HF multiplicative style)
    presence: jax.Array,     # [B] float32; 0 = off (subtract if seen)
    frequency: jax.Array,    # [B] float32; 0 = off (subtract × count)
) -> jax.Array:
    """Occurrence penalties before the filters (HF/OpenAI semantics)."""
    lf = logits.astype(jnp.float32)
    seen = counts > 0
    rep = repetition[:, None]
    lf = jnp.where(seen, jnp.where(lf > 0, lf / rep, lf * rep), lf)
    lf = lf - presence[:, None] * seen.astype(jnp.float32)
    lf = lf - frequency[:, None] * counts.astype(jnp.float32)
    return lf.astype(logits.dtype)
