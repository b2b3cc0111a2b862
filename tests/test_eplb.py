"""EPLB: replica placement, top-k remap, end-to-end balanced EP MoE.

Reference ships only the load signal (cumulative_local_expert_recv_stats,
buffer.py:700-703); parallel/eplb.py closes the loop (placement with redundant
experts → remap → same math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgl_kernel_npu_tpu.parallel import eplb


def test_make_placement_balances_skewed_load():
    e, r, s = 16, 8, 4                      # 32 slots for 16 experts
    load = np.ones(e)
    load[3] = 40.0                          # one scorcher
    load[7] = 12.0
    placement = eplb.make_placement(load, r, s)
    assert placement.shape == (r * s,)
    reps3 = int((placement == 3).sum())
    assert reps3 >= 4                        # the hot expert got replicated
    assert (np.bincount(placement[placement >= 0], minlength=e) >= 1).all()
    # expected per-rank load (each instance carries load/reps) ~uniform
    reps = np.bincount(placement[placement >= 0], minlength=e)
    share = np.where(placement >= 0, load[np.maximum(placement, 0)]
                     / reps[np.maximum(placement, 0)], 0.0)
    per_rank = share.reshape(r, s).sum(axis=1)
    assert per_rank.max() / per_rank.mean() < 1.35, per_rank


def test_remap_round_robin_and_masks(rng):
    e, r, s = 4, 2, 4
    load = np.asarray([30.0, 1.0, 1.0, 1.0])
    placement = eplb.make_placement(load, r, s)
    tables = eplb.make_remap_tables(placement, e)
    topk = jnp.asarray([[0, 1], [0, 2], [0, 3], [0, -1]], jnp.int32)
    phys = np.asarray(eplb.remap_topk(topk, *tables))
    pl = np.asarray(placement)
    assert (pl[phys[:, 0]] == 0).all()       # all col-0 picks are replicas of 0
    assert len(set(phys[:, 0].tolist())) > 1 # ...spread across replicas
    assert phys[3, 1] == -1                  # mask passes through
    back = np.asarray(eplb.logical_load(np.bincount(
        phys[phys >= 0], minlength=r * s), placement, e))
    assert back[0] == 4 and back.sum() == 7


def test_eplb_through_model_decode(mesh2, rng):
    """decode_step(eplb_tables=...) serves an EPLB placement end-to-end: the
    router's logical picks remap to physical slots, the physical Buffer +
    gathered weights produce the same outputs as the logical EP run.

    R=2 (the remap/placement machinery is rank-generic; the 8-rank EPLB
    balance check runs in the slow tier below) keeps the default tier fast."""
    mesh8 = mesh2
    from sgl_kernel_npu_tpu.config import EPConfig
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m
    from sgl_kernel_npu_tpu.parallel.buffer import Buffer

    cfg = m.DeepSeekV3Config(
        vocab_size=64, hidden=128, num_layers=1, num_heads=8, kv_lora_rank=128,
        qk_rope_dim=64, qk_nope_dim=64, q_lora_rank=128, v_head_dim=64,
        num_experts=8, topk=2, moe_intermediate=128, page_size=16)
    params = m.init_weights(jax.random.key(1), cfg)
    n, max_pages = 8, 2
    caches = m.init_kv_cache(cfg, n * max_pages + 1, jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((n, cfg.hidden)) * 0.3, jnp.float32)
    pos = jnp.arange(n, dtype=jnp.int32)
    bt = jnp.arange(1, 1 + n * max_pages, dtype=jnp.int32).reshape(n, max_pages)
    sl = jnp.full((n,), 5, jnp.int32)
    slots = jnp.arange(n, dtype=jnp.int32) * cfg.page_size + 4

    moe_q = m.quantize_moe_weights(cfg, params, tn=256)
    buf = Buffer(mesh8, "ep", num_experts=8,
                 config=EPConfig(num_max_dispatch_tokens_per_rank=n // 2))
    base, _ = m.decode_step(cfg, params, hidden, pos, caches, bt, sl, slots,
                            moe_weights_q=moe_q, ep_buffer=buf)

    placement = eplb.make_placement(np.ones(8), 2, 6)  # 12 physical slots
    tables = eplb.make_remap_tables(placement, 8)
    moe_qp = [tuple(eplb.physical_expert_weights(a, placement) for a in layer)
              for layer in moe_q]
    buf_p = Buffer(mesh8, "ep", num_experts=12,
                   config=EPConfig(num_max_dispatch_tokens_per_rank=n // 2))
    out, _ = m.decode_step(cfg, params, hidden, pos, caches, bt, sl, slots,
                           moe_weights_q=moe_qp, ep_buffer=buf_p,
                           eplb_tables=tables)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_eplb_fused_deep_moe_matches_and_balances(mesh8, rng):
    """End-to-end on the 8-rank mesh: remapped ids + physical weights through
    Buffer.fused_deep_moe == the logical run, and per-rank recv load evens out
    under a pathologically skewed router."""
    from sgl_kernel_npu_tpu.config import EPConfig
    from sgl_kernel_npu_tpu.parallel.buffer import Buffer
    from sgl_kernel_npu_tpu.parallel.fused_moe import quantize_expert_weights

    E, H, I, K, T = 16, 128, 128, 2, 8
    n = 8 * T
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    # skew: half of all routing goes to expert 0 (plus a random distinct pick)
    other = rng.integers(1, E, n)
    idx = jnp.asarray(np.stack([np.zeros(n, np.int64), other], axis=1), jnp.int32)
    w = jnp.asarray(rng.random((n, K)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((E, H, I)) * 0.05, jnp.float32)
    wu = jnp.asarray(rng.standard_normal((E, H, I)) * 0.05, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((E, I, H)) * 0.05, jnp.float32)
    w1, s1, w2, s2 = quantize_expert_weights(wg, wu, wd, tn=128)

    # logical run (16 experts, 2/rank)
    buf = Buffer(mesh8, "ep", num_experts=E, config=EPConfig(
        num_max_dispatch_tokens_per_rank=T))
    base, base_counts, d0 = buf.fused_deep_moe(x, idx, w, w1, s1, w2, s2,
                                               pack_tn=128)

    # EPLB run: 3 slots/rank → 24 physical slots, expert 0 replicated
    load = np.bincount(np.asarray(idx).ravel(), minlength=E)
    placement = eplb.make_placement(load, 8, 3)
    tables = eplb.make_remap_tables(placement, E)
    idx_p = eplb.remap_topk(idx, *tables)
    wp = [eplb.physical_expert_weights(a, placement) for a in (w1, s1, w2, s2)]
    buf_p = Buffer(mesh8, "ep", num_experts=24, config=EPConfig(
        num_max_dispatch_tokens_per_rank=T))
    out, counts, d1 = buf_p.fused_deep_moe(x, idx_p, w, *wp, pack_tn=128)

    assert int(np.asarray(d0).sum()) == 0 and int(np.asarray(d1).sum()) == 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               rtol=2e-2, atol=2e-2)

    def rank_imbalance(counts, slots_per_rank):
        c = np.asarray(counts, np.float64).reshape(8, slots_per_rank, -1).sum((1, 2))
        return c.max() / (c.mean() + 1e-9)

    imb_base = rank_imbalance(base_counts, 2)
    imb_eplb = rank_imbalance(counts, 3)
    assert imb_eplb < imb_base * 0.55, (imb_base, imb_eplb)
