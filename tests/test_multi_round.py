"""Multi-round (long-seq) normal dispatch equals single-round results."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sgl_kernel_npu_tpu.parallel import ep_core

E, H, T, K, R = 16, 32, 8, 4, 4


def _smap(mesh8, fn, n_out):
    return jax.shard_map(
        fn, mesh=mesh8, in_specs=(P("ep"), P("ep"), P("ep")),
        out_specs=tuple(P("ep") for _ in range(n_out)), check_vma=False,
    )


@pytest.mark.slow
def test_multi_round_matches_single(mesh4, rng):
    mesh8 = mesh4
    n = R * T
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(np.stack([rng.choice(E, K, replace=False) for _ in range(n)]), jnp.int32)
    w = jnp.asarray(rng.random((n, K)), jnp.float32)
    el = E // R

    def single(xs, ids, ws):
        d = ep_core.dispatch_ragged_core(
            xs, ids, axis_name="ep", num_experts=E, num_ranks=R,
            pair_capacity=T * K, seg_capacity=T, use_int8=False)
        y = d["recv_x_sorted"] * 2.0
        out = ep_core.combine_ragged_core(
            y, ws, d["handle"], axis_name="ep", num_ranks=R,
            num_local_experts=el, seg_capacity=T, out_dtype=jnp.float32)
        return out, d["group_sizes"][None]

    def multi(xs, ids, ws):
        rounds = 2
        d = ep_core.dispatch_ragged_multi_round(
            xs, ids, rounds=rounds, axis_name="ep", num_experts=E, num_ranks=R,
            pair_capacity=(T // rounds) * K, seg_capacity=T // rounds, use_int8=False)
        y = d["recv_x_sorted"] * 2.0
        out = ep_core.combine_ragged_multi_round(
            y, ws, d["round_handles"], d["round_positions"], axis_name="ep",
            num_ranks=R, num_local_experts=el, seg_capacity=T // rounds,
            out_dtype=jnp.float32)
        return out, d["group_sizes"][None]

    out1, gs1 = _smap(mesh8, single, 2)(x, idx, w)
    out2, gs2 = _smap(mesh8, multi, 2)(x, idx, w)
    np.testing.assert_array_equal(np.asarray(gs1), np.asarray(gs2))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-5)
    # golden: y = 2x ⇒ combined = 2·Σw·x
    golden = 2 * np.asarray(x) * np.asarray(w).sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out2), golden, rtol=1e-4, atol=1e-4)


def test_buffer_multi_round_api(mesh2, rng):
    """2 ranks: the multi-round machinery is rank-generic and the 4-rank
    variant of the same path runs in the slow tier
    (test_multi_round_matches_single); R=2 keeps the default tier fast."""
    from sgl_kernel_npu_tpu.config import EPConfig
    from sgl_kernel_npu_tpu.parallel.buffer import Buffer

    r2 = 2
    buf = Buffer(mesh2, "ep", num_experts=E, config=EPConfig(
        num_max_dispatch_tokens_per_rank=T, use_int8_dispatch=False,
        normal_round_tokens=T // 2))
    n = r2 * T
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(np.stack([rng.choice(E, K, replace=False) for _ in range(n)]), jnp.int32)
    w = jnp.asarray(rng.random((n, K)), jnp.float32)
    xs, _, gs, handle, stats = buf.dispatch(x, idx)   # auto 2 rounds
    assert isinstance(handle, dict) and handle["rounds"] == 2
    ys = xs * 3.0
    out = buf.combine(ys, w, handle, out_dtype=jnp.float32)
    golden = 3 * np.asarray(x) * np.asarray(w).sum(1, keepdims=True)
    np.testing.assert_allclose(np.asarray(out), golden, rtol=1e-4, atol=1e-4)
