"""TP-allgather dispatch variant: tp×ep mesh, column-split experts, vs dense golden."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel import ep_core

TP, EP, E, T, K, H = 2, 4, 8, 8, 2, 32


@pytest.fixture
def mesh_tp_ep():
    devs = np.array(jax.devices()[:8]).reshape(TP, EP)
    return Mesh(devs, ("tp", "ep"))


def test_tp_allgather_roundtrip(mesh_tp_ep, rng):
    n = TP * EP * T
    el = E // EP
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(np.stack([rng.choice(E, K, replace=False) for _ in range(n)]), jnp.int32)
    w = jnp.asarray(rng.random((n, K)), jnp.float32)
    # per-expert square weight, column-split over TP: W = [W_tp0 | W_tp1] on dim 1,
    # y = (x @ W_tp) @ W_tp.T summed over tp ≈ x @ (W @ W.T)  — use identity-ish
    # simpler: expert scales again, but TP splits the scale: each tp rank applies
    # scale/TP and the psum reassembles the full scale.
    def body(xs, ids, ws):
        d = ep_core.dispatch_core(
            xs, ids, axis_name="ep", num_experts=E, num_ranks=EP,
            pair_capacity=T * K, seg_capacity=T, use_int8=False)
        gathered, _, counts = ep_core.dispatch_tp_allgather(
            d["recv_x"], None, d["recv_count_matrix"], tp_axis="tp")
        # per-tp partial expert compute: scale by (e+1)/TP on the FULL gathered set
        my_ep = jax.lax.axis_index("ep")
        eid = (my_ep * el + jnp.arange(el) + 1).astype(jnp.float32)
        y_part = gathered * (eid[:, None, None] / TP)
        y_mine = ep_core.combine_tp_reduce(y_part, tp_axis="tp", seg_total=EP * T)
        out = ep_core.combine_core(
            y_mine, ws, d["handle"], axis_name="ep", num_ranks=EP,
            seg_capacity=T, out_dtype=jnp.float32)
        return out, counts[None]

    out, counts = jax.shard_map(
        body, mesh=mesh_tp_ep,
        in_specs=(P(("tp", "ep")), P(("tp", "ep")), P(("tp", "ep"))),
        out_specs=(P(("tp", "ep")), P(("tp", "ep"))),
        check_vma=False,
    )(x, idx, w)

    golden = np.zeros((n, H), np.float32)
    xn, idxn, wn = map(np.asarray, (x, idx, w))
    for t in range(n):
        for k in range(K):
            golden[t] += wn[t, k] * (idxn[t, k] + 1.0) * xn[t]
    np.testing.assert_allclose(np.asarray(out), golden, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_tp_attention_serving_matches_single(rng, mesh8):
    """Head-TP decode (shard_map over 8 ranks) == single-device decode_step."""
    import dataclasses

    import jax
    from jax.sharding import Mesh
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m

    cfg = m.DeepSeekV3Config(num_layers=1, page_size=16, vocab_size=61,
                             num_heads=8)
    params = m.init_weights(jax.random.key(4), cfg, jnp.float32)
    b, max_pages = 4, 2
    caches = m.init_kv_cache(cfg, b * max_pages + 1, jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((b, cfg.hidden)) * 0.3, jnp.float32)
    bt = jnp.arange(1, 1 + b * max_pages, dtype=jnp.int32).reshape(b, max_pages)
    pos = jnp.full((b,), 5, jnp.int32)
    sl = jnp.full((b,), 6, jnp.int32)
    slots = bt[:, 0] * cfg.page_size + 5

    want, cw = m.decode_step(cfg, params, hidden, pos, caches, bt, sl, slots)
    tp_mesh = Mesh(np.array(jax.devices()[:8]), ("tp",))
    got, cg = m.decode_step_tp(cfg, params, hidden, pos, caches, bt, sl, slots,
                               mesh=tp_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(cg[0]["nope"]), np.asarray(cw[0]["nope"]), atol=1e-5)
