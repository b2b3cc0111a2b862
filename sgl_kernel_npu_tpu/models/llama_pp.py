"""Pipeline-parallel serving for the Llama family: layer stages over a mesh axis.

The reference has no pipeline parallelism (SURVEY §2.5 — PP "not present");
`parallel/pipeline.py` provides the GPipe microbatch schedule for training.
This module makes PP reachable from the serving engine: the layer stack is
split into ``num_stages`` contiguous stages, each rank of the ``pp`` mesh axis
owns one stage's weights AND that stage's slice of the paged KV pool, and a
token batch flows through the ring with ``ppermute`` — one `lax.scan` over
stages, `lax.cond` so each rank computes only on its own turn (decode is
inherently sequential across stages; prefill throughput overlap at scale comes
from microbatching, parallel.pipeline.pipeline_forward).

Stage layout: every per-layer weight/cache leaf gains a leading
``[num_stages, layers_per_stage]`` pair of axes, sharded ``P("pp")`` — rank r
sees ``[1, L/R, ...]`` inside ``shard_map``.  Shared (embed / lm_head / final
norm) weights stay replicated; the engine drives embed/lm_head outside the
sharded body as usual.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sgl_kernel_npu_tpu.models.llama import LlamaConfig, _mlp
from sgl_kernel_npu_tpu.ops.attention.decode_attention import decode_gqa
from sgl_kernel_npu_tpu.ops.attention.sinks_attention import (
    attention_sinks_prefill,
)
from sgl_kernel_npu_tpu.ops.mem_cache.kv_cache import reshape_and_cache
from sgl_kernel_npu_tpu.ops.norm import rms_norm
from sgl_kernel_npu_tpu.ops.rope import apply_rope, rope_cos_sin


def stack_stage_params(cfg: LlamaConfig, params: dict, num_stages: int) -> dict:
    """Restack per-layer weight dicts into ``[num_stages, L/R, ...]`` leaves
    (shard the leading axis over the ``pp`` mesh axis)."""
    layers = params["layers"]
    lps = _layers_per_stage(cfg, num_stages)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "stages": jax.tree.map(
            lambda a: a.reshape(num_stages, lps, *a.shape[1:]), stacked),
        "ln_f": params["ln_f"],
    }


def _layers_per_stage(cfg: LlamaConfig, num_stages: int) -> int:
    assert cfg.num_layers % num_stages == 0, (cfg.num_layers, num_stages)
    return cfg.num_layers // num_stages


def init_kv_cache_pp(cfg: LlamaConfig, num_pages: int, num_stages: int,
                     dtype=jnp.float32):
    """Stage-major paged KV pool: ``[num_stages, L/R, pages, hkv, page, d]``."""
    lps = _layers_per_stage(cfg, num_stages)
    shape = (num_stages, lps, num_pages, cfg.num_kv_heads, cfg.page_size,
             cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _decode_layer(cfg, lw, x, cos, sin, kc, vc, slots, bt, ctx):
    b, d = x.shape[0], cfg.head_dim
    scale = 1.0 / math.sqrt(d)
    hidden_n = rms_norm(x, lw["ln1"], cfg.rms_eps)
    q = apply_rope((hidden_n @ lw["wq"]).reshape(b, cfg.num_heads, d), cos, sin)
    k = apply_rope((hidden_n @ lw["wk"]).reshape(b, cfg.num_kv_heads, d), cos, sin)
    v = (hidden_n @ lw["wv"]).reshape(b, cfg.num_kv_heads, d)
    kc = reshape_and_cache(k, kc, slots)
    vc = reshape_and_cache(v, vc, slots)
    attn = decode_gqa(q, kc, vc, ctx, scale, bt).reshape(b, -1)
    x = x + attn @ lw["wo"]
    x = x + _mlp(lw, rms_norm(x, lw["ln2"], cfg.rms_eps))
    return x, kc, vc


def _prefill_layer(cfg, lw, x, cos, sin, kc, vc, slots, bt, seq_lens, ctx):
    s, d = x.shape[0], cfg.head_dim
    scale = 1.0 / math.sqrt(d)
    hidden_n = rms_norm(x, lw["ln1"], cfg.rms_eps)
    q = apply_rope((hidden_n @ lw["wq"]).reshape(s, cfg.num_heads, d), cos, sin)
    k = apply_rope((hidden_n @ lw["wk"]).reshape(s, cfg.num_kv_heads, d), cos, sin)
    v = (hidden_n @ lw["wv"]).reshape(s, cfg.num_kv_heads, d)
    kc = reshape_and_cache(k, kc, slots)
    vc = reshape_and_cache(v, vc, slots)
    # jnp varlen prefill path: under the stage-`cond` the Pallas prefill
    # kernel's interpret mode would trace per stage; the XLA path fuses fine
    # at serving-test scale and is numerically identical
    attn = attention_sinks_prefill(
        q.reshape(s, cfg.num_heads * d), kc, vc, None, seq_lens, bt, ctx,
        scale, 0, cfg.num_heads, cfg.num_kv_heads).reshape(s, -1)
    x = x + attn @ lw["wo"]
    x = x + _mlp(lw, rms_norm(x, lw["ln2"], cfg.rms_eps))
    return x, kc, vc


def _pp_rank_body(cfg, layer_fn, stages, ln_f, x, caches, *, axis_name):
    """Run the full stack across stages: rank r applies its stage at step r,
    ppermute rotates the hidden; after R steps rank 0 holds the final hidden
    (psum-broadcast out).  ``stages``/``caches`` leaves are ``[1, L/R, ...]``."""
    num_stages = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    def stage_apply(operand):
        h, kc, vc = operand

        def one_layer(carry, lkv):
            lw, kc_l, vc_l = lkv
            h, = carry
            h, kc_l, vc_l = layer_fn(cfg, lw, h, kc_l, vc_l)
            return (h,), (kc_l, vc_l)

        (h,), (kc2, vc2) = jax.lax.scan(
            one_layer, (h,), (jax.tree.map(lambda a: a[0], stages), kc[0], vc[0]))
        return h, kc2[None], vc2[None]

    def step(carry, i):
        h, kc, vc = carry
        h2, kc, vc = jax.lax.cond(
            i == my, stage_apply, lambda o: (o[0], o[1], o[2]), (h, kc, vc))
        h2 = jax.lax.ppermute(h2, axis_name, perm)
        return (h2, kc, vc), None

    (h, kc, vc), _ = jax.lax.scan(
        step, (x, caches["k"], caches["v"]),
        jnp.arange(num_stages, dtype=jnp.int32))
    # rank 0 holds the final hidden after the last rotation — broadcast it
    h = jax.lax.psum(jnp.where(my == 0, h, jnp.zeros_like(h)), axis_name)
    return rms_norm(h, ln_f, cfg.rms_eps), {"k": kc, "v": vc}


def decode_step_pp(cfg, pp_params, x, positions, caches, block_tables,
                   context_lens, slot_mapping, *, mesh, axis_name="pp"):
    """One PP decode step: [B, hidden] → ([B, hidden], caches)."""
    cos, sin = rope_cos_sin(positions, cfg.head_dim, base=cfg.rope_theta)

    def layer_fn(cfg_, lw, h, kc, vc):
        return _decode_layer(cfg_, lw, h, cos, sin, kc, vc, slot_mapping,
                             block_tables, context_lens)

    body = functools.partial(
        _pp_rank_body, cfg, layer_fn, axis_name=axis_name)
    return jax.shard_map(
        lambda st, ln, xx, cc: body(st, ln, xx, cc),
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(axis_name)),
        out_specs=(P(), P(axis_name)),
        check_vma=False,
    )(pp_params["stages"], pp_params["ln_f"], x, caches)


def prefill_step_pp(cfg, pp_params, x, seq_lens, caches, block_tables,
                    context_lens, slot_mapping, *, mesh, axis_name="pp"):
    """Varlen (chunked) prefill through the PP stages: [S, hidden] packed rows."""
    s = x.shape[0]
    bsz = seq_lens.shape[0]
    ends = jnp.cumsum(seq_lens.astype(jnp.int32))
    req = jnp.clip(jnp.searchsorted(ends, jnp.arange(s), side="right"), 0, bsz - 1)
    j = jnp.arange(s) - (ends[req] - seq_lens[req])
    positions = context_lens[req] - seq_lens[req] + j
    cos, sin = rope_cos_sin(positions, cfg.head_dim, base=cfg.rope_theta)

    def layer_fn(cfg_, lw, h, kc, vc):
        return _prefill_layer(cfg_, lw, h, cos, sin, kc, vc, slot_mapping,
                              block_tables, seq_lens, context_lens)

    body = functools.partial(
        _pp_rank_body, cfg, layer_fn, axis_name=axis_name)
    return jax.shard_map(
        lambda st, ln, xx, cc: body(st, ln, xx, cc),
        mesh=mesh,
        in_specs=(P(axis_name), P(), P(), P(axis_name)),
        out_specs=(P(), P(axis_name)),
        check_vma=False,
    )(pp_params["stages"], pp_params["ln_f"], x, caches)
