"""Ring attention: context-parallel prefill over a mesh axis (beyond-reference).

The reference has no sequence/context parallelism (SURVEY §2.5: "no ring
attention / Ulysses / CP in this repo") — its long-context story is paged
attention + the EP multi-round pipeline.  On TPU, context parallelism is the
idiomatic extension: shard the *sequence* over a mesh axis, keep queries local,
and rotate K/V blocks around the ring with ``ppermute`` while accumulating a
flash-style online softmax.  ICI bandwidth overlaps with the attention matmuls
(XLA schedules collective-permute asynchronously), so long-context prefill
scales with the ring size.

Per-rank layout (inside ``shard_map`` over ``axis_name``):
    q, k, v: ``[B, T_local, H, D]`` — rank r owns absolute positions
    ``[r·T_local, (r+1)·T_local)``.
Causal masking uses absolute positions, so the result equals full (unsharded)
causal attention; blocks entirely in the future are skipped numerically by the
mask (their contribution underflows to zero weight).

GQA: ``k``/``v`` may have fewer heads (``Hq % Hkv == 0``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention_ref(q, k, v, sm_scale, *, causal=True):
    """Golden: full (unsharded) multi-head causal attention, f32 math.

    q [B, T, Hq, D]; k/v [B, S, Hkv, D] → [B, T, Hq, Dv]."""
    b, t, hq, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    g = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, t, hkv, g, d)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    logits = jnp.einsum("bthgd,bshd->bhgts", qf, kf) * sm_scale
    if causal:
        mask = jnp.arange(t)[:, None] >= jnp.arange(s)[None, :]
        logits = jnp.where(mask[None, None, None], logits, NEG_INF)
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhgts,bshd->bthgd", p, vf)
    return out.reshape(b, t, hq, -1).astype(q.dtype)


def _block_update(q, kb, vb, sm_scale, q_pos, k_pos, m, l, acc, *, causal):
    """One flash update of the local queries against a remote K/V block."""
    b, t, hkv, g, d = q.shape
    logits = jnp.einsum(
        "bthgd,bshd->bhgts", q, kb.astype(jnp.float32)
    ) * sm_scale                                             # [B,Hkv,g,T,S]
    if causal:
        mask = q_pos[:, None] >= k_pos[None, :]              # [T, S] absolute
        logits = jnp.where(mask[None, None, None], logits, NEG_INF)
    m_new = jnp.maximum(m, jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(logits - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum("bhgts,bshd->bhgtd", p, vb.astype(jnp.float32))
    return m_new, l, acc


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    sm_scale: float,
    *,
    axis_name: str,
    causal: bool = True,
):
    """Context-parallel causal attention (call inside shard_map over ``axis_name``).

    Args: per-rank ``q/k/v [B, T_local, H(, Hkv), D]``.
    Returns per-rank ``[B, T_local, Hq, Dv]`` equal to the full-sequence result.
    """
    num_ranks = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, tl, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    dv = v.shape[-1]
    qf = q.astype(jnp.float32).reshape(b, tl, hkv, g, d)
    q_pos = my * tl + jnp.arange(tl, dtype=jnp.int32)

    perm = [(i, (i + 1) % num_ranks) for i in range(num_ranks)]

    def step(carry, i):
        kb, vb, m, l, acc = carry
        kv_rank = jax.lax.rem(my - i + num_ranks, num_ranks)
        k_pos = kv_rank * tl + jnp.arange(tl, dtype=jnp.int32)
        m, l, acc = _block_update(
            qf, kb, vb, sm_scale, q_pos, k_pos, m, l, acc, causal=causal
        )
        # rotate the K/V block to the next rank (skipped after the last use)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (kb, vb, m, l, acc), None

    m0 = jnp.full((b, hkv, g, tl, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, tl, 1), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, tl, dv), jnp.float32)
    # after num_ranks rotations every K/V block is back home — the final
    # (unused) ppermute keeps the scan body uniform
    (_, _, m, l, acc), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(num_ranks, dtype=jnp.int32)
    )
    out = acc / jnp.maximum(l[..., 0, None], 1e-30)
    # [B,Hkv,g,T,Dv] → [B,T,Hq,Dv]
    return out.transpose(0, 3, 1, 2, 4).reshape(b, tl, hq, dv).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("axis_name", "mesh", "sm_scale", "causal"))
def ring_attention_sharded(q, k, v, *, mesh, axis_name="cp", sm_scale, causal=True):
    """Convenience wrapper: global [B, T, H, D] arrays, sequence sharded over
    ``axis_name`` of ``mesh``; returns the global attention output."""
    from jax.sharding import PartitionSpec as P

    p = P(None, axis_name)
    return jax.shard_map(
        lambda qq, kk, vv: ring_attention(
            qq, kk, vv, sm_scale, axis_name=axis_name, causal=causal
        ),
        mesh=mesh,
        in_specs=(p, p, p),
        out_specs=p,
        check_vma=False,
    )(q, k, v)
