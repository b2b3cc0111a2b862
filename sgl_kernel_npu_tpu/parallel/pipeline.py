"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

Beyond-reference (SURVEY §2.5: PP "not present" in the reference).  TPU-native
design: every rank owns one *stage* (a contiguous slice of layers); microbatches
flow through the ring with ``ppermute`` while all stages compute in parallel on
different microbatches.  The schedule is the standard fill/steady/drain loop of
``num_micro + num_stages − 1`` steps, expressed as ``lax.scan`` so the whole
pipeline is one compiled program (no per-step dispatch).

Usage (inside or outside jit):

    def stage_fn(stage_params, x):        # one stage's forward
        return my_layers(stage_params, x)

    y = pipeline_forward(stage_fn, stage_params, x, mesh=mesh, axis_name="pp",
                         num_micro=8)

``stage_params`` is sharded with its leading axis over ``axis_name`` (stage s
holds slice s); ``x [B, ...]`` is replicated in, the result is replicated out.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def pipeline_forward_rank(stage_fn, stage_params, x, *, axis_name, num_micro):
    """Per-rank body (call inside shard_map over ``axis_name``).

    ``x [B, ...]`` full batch (replicated); returns the full output (replicated).
    """
    num_stages = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b = x.shape[0]
    assert b % num_micro == 0, (b, num_micro)
    mb = b // num_micro
    x_mb = x.reshape(num_micro, mb, *x.shape[1:])

    total = num_micro + num_stages - 1
    # ring: stage s sends to s+1; the last stage's sends wrap to 0 (ignored)
    perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    def step(carry, t):
        recv, out = carry
        # stage 0 injects microbatch t (clamped; masked out of range below)
        inj = x_mb[jnp.clip(t, 0, num_micro - 1)]
        cur = jnp.where(my == 0, inj.astype(recv.dtype), recv)
        y = stage_fn(stage_params, cur)
        # my microbatch id at step t is (t - my); valid while 0 ≤ id < M
        mb_id = t - my
        valid_out = jnp.logical_and(my == num_stages - 1,
                                    jnp.logical_and(mb_id >= 0, mb_id < num_micro))
        out = jax.lax.cond(
            valid_out,
            lambda o: jax.lax.dynamic_update_index_in_dim(
                o, y.astype(o.dtype), jnp.clip(mb_id, 0, num_micro - 1), 0
            ),
            lambda o: o,
            out,
        )
        recv = jax.lax.ppermute(y, axis_name, perm)
        return (recv, out), None

    y0 = jax.eval_shape(stage_fn, stage_params, x_mb[0])
    recv0 = jnp.zeros(y0.shape, y0.dtype)
    out0 = jnp.zeros((num_micro, *y0.shape), y0.dtype)
    (_, out), _ = jax.lax.scan(
        step, (recv0, out0), jnp.arange(total, dtype=jnp.int32)
    )
    # only the last stage holds real outputs; broadcast them to every rank
    out = jnp.where(my == num_stages - 1, out, jnp.zeros_like(out))
    out = jax.lax.psum(out, axis_name)
    return out.reshape(b, *y0.shape[1:])


def pipeline_forward(stage_fn, stage_params, x, *, mesh, axis_name="pp", num_micro):
    """Convenience wrapper: ``stage_params`` leading-axis sharded over
    ``axis_name`` (one stage per rank), ``x`` replicated; output replicated."""
    pspec = jax.tree.map(lambda _: P(axis_name), stage_params)

    def body(sp, xx):
        sp = jax.tree.map(lambda a: a[0], sp)  # drop the per-rank stage axis
        return pipeline_forward_rank(
            stage_fn, sp, xx, axis_name=axis_name, num_micro=num_micro
        )

    return jax.shard_map(
        body, mesh=mesh, in_specs=(pspec, P()), out_specs=P(), check_vma=False
    )(stage_params, x)
