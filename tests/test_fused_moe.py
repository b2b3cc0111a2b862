"""Fused MoE vs unfused baseline (reference test_fused_deep_moe.py:155-216 pattern)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.config import EPConfig
from sgl_kernel_npu_tpu.parallel.buffer import Buffer
from sgl_kernel_npu_tpu.parallel.fused_moe import quantize_expert_weights

E, H, I, K, T = 16, 128, 128, 4, 8
TN = 128


def _dense_moe_fp32(x, idx, w, wg, wu, wd):
    """Golden dense fp32 MoE."""
    out = np.zeros_like(x)
    for t in range(x.shape[0]):
        for k in range(idx.shape[1]):
            e = int(idx[t, k])
            if e < 0:
                continue
            h = x[t] @ wg[e], x[t] @ wu[e]
            act = h[0] * (1 / (1 + np.exp(-h[0]))) * h[1]
            out[t] += w[t, k] * (act @ wd[e])
    return out


def test_fused_deep_moe_vs_golden(mesh8, rng):
    n = 8 * T
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(E, K, replace=False) for _ in range(n)]), jnp.int32
    )
    w = jnp.asarray(rng.random((n, K)), jnp.float32)
    wg = (rng.standard_normal((E, H, I)) * 0.05).astype(np.float32)
    wu = (rng.standard_normal((E, H, I)) * 0.05).astype(np.float32)
    wd = (rng.standard_normal((E, I, H)) * 0.05).astype(np.float32)

    w1, s1, w2, s2 = quantize_expert_weights(
        jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd), tn=TN
    )
    buf = Buffer(mesh8, "ep", num_experts=E, config=EPConfig(
        num_max_dispatch_tokens_per_rank=T))

    combined, recv_count, dropped = buf.fused_deep_moe(
        x, idx, w, w1, s1, w2, s2, gmm_tiles=(64, 128, TN), pack_tn=TN
    )
    assert int(np.asarray(dropped).sum()) == 0
    golden = _dense_moe_fp32(np.asarray(x), np.asarray(idx), np.asarray(w), wg, wu, wd)

    got = np.asarray(combined, np.float32)
    # avg relative diff bound in the spirit of the reference's 4e-4 (which compares
    # int8-vs-int8); ours compares against fp32 so the budget is the int8 error.
    denom = np.abs(golden).mean() + 1e-6
    avg_diff = np.abs(got - golden).mean() / denom
    assert avg_diff < 0.1, avg_diff
    # correlation must be essentially 1
    c = np.corrcoef(got.ravel(), golden.ravel())[0, 1]
    assert c > 0.999, c


def test_model_decode_with_ep_buffer(mesh8, rng):
    """Flagship decode_step with the EP fused-MoE path ≈ the dense single-chip path."""
    import jax
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m

    cfg = m.DeepSeekV3Config(
        vocab_size=64, hidden=128, num_layers=1, num_heads=8, kv_lora_rank=128,
        qk_rope_dim=64, qk_nope_dim=64, q_lora_rank=128, v_head_dim=64,
        num_experts=16, topk=4, moe_intermediate=128, page_size=16,
    )
    params = m.init_weights(jax.random.key(1), cfg)
    n, max_pages = 16, 2
    caches = m.init_kv_cache(cfg, n * max_pages + 1, jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((n, cfg.hidden)) * 0.3, jnp.float32)
    pos = jnp.arange(n, dtype=jnp.int32)
    bt = jnp.arange(1, 1 + n * max_pages, dtype=jnp.int32).reshape(n, max_pages)
    sl = jnp.full((n,), 5, jnp.int32)
    slots = jnp.arange(n, dtype=jnp.int32) * cfg.page_size + 4

    dense_out, _ = m.decode_step(cfg, params, hidden, pos, caches, bt, sl, slots)

    buf = Buffer(mesh8, "ep", num_experts=cfg.num_experts,
                 config=EPConfig(num_max_dispatch_tokens_per_rank=n // 8))
    moe_q = m.quantize_moe_weights(cfg, params, tn=256)
    ep_out, _ = m.decode_step(cfg, params, hidden, pos, caches, bt, sl, slots,
                              moe_weights_q=moe_q, ep_buffer=buf)
    d, e = np.asarray(dense_out), np.asarray(ep_out)
    rel = np.abs(d - e).mean() / (np.abs(d).mean() + 1e-9)
    assert rel < 0.05, rel  # int8 MoE vs fp32 dense budget


def test_model_prefill_with_ep_buffer(mesh8, rng):
    """Flagship PREFILL with the EP MoE path ≈ the dense path — the normal-mode
    ragged dispatch sizes its buffers from the token count, so the same
    fused_deep_moe entry point serves prefill batches (reference
    CamMoeDispatchNormal prefill mode)."""
    import jax
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m

    cfg = m.DeepSeekV3Config(
        vocab_size=64, hidden=128, num_layers=1, num_heads=8, kv_lora_rank=128,
        qk_rope_dim=64, qk_nope_dim=64, q_lora_rank=128, v_head_dim=64,
        num_experts=16, topk=4, moe_intermediate=128, page_size=16,
    )
    params = m.init_weights(jax.random.key(2), cfg)
    bsz, per = 4, 8
    s = bsz * per
    caches = m.init_kv_cache(cfg, bsz * 2 + 1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((s, cfg.hidden)) * 0.3, jnp.float32)
    bt = jnp.arange(1, 1 + bsz * 2, dtype=jnp.int32).reshape(bsz, 2)
    seq = jnp.full((bsz,), per, jnp.int32)
    slots = jnp.asarray([int(bt[b, 0]) * cfg.page_size + t
                         for b in range(bsz) for t in range(per)], jnp.int32)

    dense_out, _ = m.prefill_step(cfg, params, x, seq, caches, bt, seq, slots,
                                  max_q=8)
    buf = Buffer(mesh8, "ep", num_experts=cfg.num_experts,
                 config=EPConfig(num_max_dispatch_tokens_per_rank=s // 8))
    moe_q = m.quantize_moe_weights(cfg, params, tn=256)
    ep_out, _ = m.prefill_step(cfg, params, x, seq, caches, bt, seq, slots,
                               max_q=8, moe_weights_q=moe_q, ep_buffer=buf)
    d, e = np.asarray(dense_out), np.asarray(ep_out)
    rel = np.abs(d - e).mean() / (np.abs(d).mean() + 1e-9)
    assert rel < 0.05, rel


def test_model_decode_single_chip_gmm_moe(rng):
    """decode_step with quantized weights but NO ep_buffer: the single-chip
    W8A8 grouped path (_gmm_moe) ≈ the fp32 dense path."""
    import jax
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m

    cfg = m.DeepSeekV3Config(
        vocab_size=64, hidden=128, num_layers=1, num_heads=8, kv_lora_rank=128,
        qk_rope_dim=64, qk_nope_dim=64, q_lora_rank=128, v_head_dim=64,
        num_experts=16, topk=4, moe_intermediate=128, page_size=16,
    )
    params = m.init_weights(jax.random.key(1), cfg)
    n, max_pages = 16, 2
    caches = m.init_kv_cache(cfg, n * max_pages + 1, jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((n, cfg.hidden)) * 0.3, jnp.float32)
    pos = jnp.arange(n, dtype=jnp.int32)
    bt = jnp.arange(1, 1 + n * max_pages, dtype=jnp.int32).reshape(n, max_pages)
    sl = jnp.full((n,), 5, jnp.int32)
    slots = jnp.arange(n, dtype=jnp.int32) * cfg.page_size + 4

    dense_out, _ = m.decode_step(cfg, params, hidden, pos, caches, bt, sl, slots)
    moe_q = m.quantize_moe_weights(cfg, params)
    gmm_out, _ = m.decode_step(cfg, params, hidden, pos, caches, bt, sl, slots,
                               moe_weights_q=moe_q)
    d, g = np.asarray(dense_out), np.asarray(gmm_out)
    rel = np.abs(d - g).mean() / (np.abs(d).mean() + 1e-9)
    assert rel < 0.05, rel  # int8 MoE vs fp32 dense budget


@pytest.mark.slow
def test_model_int8_dispatch_accuracy(mesh4, rng):
    """BASELINE.md north star: INT8 dispatch Δppl ≈ 0 vs BF16 dispatch, at the
    MODEL level (reference accuracy bar) — full DeepSeek-V3-lite decode step
    through the EP fused-MoE path, logit KL + loss delta with explicit bounds.

    Both wires feed identical W8A8 expert GEMMs; the only difference is the
    dispatch payload precision, so the divergence measured here is exactly the
    INT8-wire quantization error the reference claims is ppl-neutral."""
    import jax
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m

    cfg = m.DeepSeekV3Config(
        vocab_size=128, hidden=128, num_layers=2, num_heads=8, kv_lora_rank=128,
        qk_rope_dim=64, qk_nope_dim=64, q_lora_rank=128, v_head_dim=64,
        num_experts=16, topk=4, moe_intermediate=128, page_size=16,
    )
    params = m.init_weights(jax.random.key(3), cfg)
    n, max_pages = 16, 2
    caches = m.init_kv_cache(cfg, n * max_pages + 1, jnp.float32)
    hidden = jnp.asarray(rng.standard_normal((n, cfg.hidden)) * 0.3, jnp.float32)
    pos = jnp.arange(n, dtype=jnp.int32)
    bt = jnp.arange(1, 1 + n * max_pages, dtype=jnp.int32).reshape(n, max_pages)
    sl = jnp.full((n,), 5, jnp.int32)
    slots = jnp.arange(n, dtype=jnp.int32) * cfg.page_size + 4

    buf = Buffer(mesh4, "ep", num_experts=cfg.num_experts,
                 config=EPConfig(num_max_dispatch_tokens_per_rank=n // 4))
    moe_q = m.quantize_moe_weights(cfg, params, tn=256)

    logits = {}
    for wire, int8 in (("int8", True), ("bf16", False)):
        out, _ = m.decode_step(cfg, params, hidden, pos, caches, bt, sl, slots,
                               moe_weights_q=moe_q, ep_buffer=buf,
                               use_int8_dispatch=int8)
        logits[wire] = np.asarray(m.lm_head(params, out), np.float64)

    def log_softmax(z):
        z = z - z.max(axis=-1, keepdims=True)
        return z - np.log(np.exp(z).sum(axis=-1, keepdims=True))

    lp_i8, lp_bf = log_softmax(logits["int8"]), log_softmax(logits["bf16"])
    # per-token KL(bf16 ‖ int8), mean over the batch
    kl = float((np.exp(lp_bf) * (lp_bf - lp_i8)).sum(axis=-1).mean())
    # next-token NLL on argmax(bf16) targets — the "Δppl" proxy
    tgt = logits["bf16"].argmax(axis=-1)
    nll_bf = -lp_bf[np.arange(n), tgt].mean()
    nll_i8 = -lp_i8[np.arange(n), tgt].mean()
    dloss = abs(float(nll_i8 - nll_bf))
    assert kl < 5e-3, f"logit KL {kl}"
    assert dloss < 5e-3, f"loss delta {dloss} (ppl ratio {np.exp(dloss):.5f})"


@pytest.mark.slow
def test_fused_deep_moe_chunk_pipelined_matches(rng):
    """chunks=2 (comm/compute-overlap pipeline) must reproduce chunks=1
    bit-for-bit when capacities are ample (no chunk-skew drops).  2-rank mesh:
    the chunk pipeline is rank-count-generic and interpret cost is
    superlinear in ranks (the 4-rank skew test covers multi-rank chunking)."""
    mesh8 = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("ep",))
    n = 2 * T
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(E, K, replace=False) for _ in range(n)]), jnp.int32
    )
    w = jnp.asarray(rng.random((n, K)), jnp.float32)
    wg = (rng.standard_normal((E, H, I)) * 0.05).astype(np.float32)
    wu = (rng.standard_normal((E, H, I)) * 0.05).astype(np.float32)
    wd = (rng.standard_normal((E, I, H)) * 0.05).astype(np.float32)
    w1, s1, w2, s2 = quantize_expert_weights(
        jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd), tn=TN)
    buf = Buffer(mesh8, "ep", num_experts=E, config=EPConfig(
        num_max_dispatch_tokens_per_rank=T))
    base, count0, drop0 = buf.fused_deep_moe(
        x, idx, w, w1, s1, w2, s2, gmm_tiles=(64, 128, TN), pack_tn=TN)
    piped, count1, drop1 = buf.fused_deep_moe(
        x, idx, w, w1, s1, w2, s2, gmm_tiles=(64, 128, TN), pack_tn=TN, chunks=2)
    assert int(np.asarray(drop0).sum()) == 0 and int(np.asarray(drop1).sum()) == 0
    np.testing.assert_array_equal(np.asarray(count0), np.asarray(count1))
    np.testing.assert_allclose(
        np.asarray(piped, np.float32), np.asarray(base, np.float32), atol=1e-5)


@pytest.mark.slow
def test_fused_deep_moe_default_pack_quant_epilogue(mesh8, rng):
    """Default packing → full-width tn → single GmmDeqSwigluQuant-style kernel."""
    from sgl_kernel_npu_tpu.ops.grouped_matmul import moe_pack_tn

    assert moe_pack_tn(2 * I) == 2 * I  # this shape takes the fused-quant path
    n = 8 * T
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(E, K, replace=False) for _ in range(n)]), jnp.int32
    )
    w = jnp.asarray(rng.random((n, K)), jnp.float32)
    wg = (rng.standard_normal((E, H, I)) * 0.05).astype(np.float32)
    wu = (rng.standard_normal((E, H, I)) * 0.05).astype(np.float32)
    wd = (rng.standard_normal((E, I, H)) * 0.05).astype(np.float32)

    w1, s1, w2, s2 = quantize_expert_weights(
        jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd))  # default pack
    buf = Buffer(mesh8, "ep", num_experts=E, config=EPConfig(
        num_max_dispatch_tokens_per_rank=T))
    combined, _, dropped = buf.fused_deep_moe(x, idx, w, w1, s1, w2, s2)
    assert int(np.asarray(dropped).sum()) == 0
    golden = _dense_moe_fp32(np.asarray(x), np.asarray(idx), np.asarray(w), wg, wu, wd)
    got = np.asarray(combined, np.float32)
    avg_diff = np.abs(got - golden).mean() / (np.abs(golden).mean() + 1e-6)
    assert avg_diff < 0.1, avg_diff
    c = np.corrcoef(got.ravel(), golden.ravel())[0, 1]
    assert c > 0.999, c


@pytest.mark.slow
def test_fused_deep_moe_chunk_skew_drop_accounting(mesh4, rng):
    """Weak-item: chunks>1 divides capacities per chunk, so routing skew
    BETWEEN chunks can drop rows the unchunked path keeps.  This pins the
    accounting: with capacity sized so the full batch fits but a chunk-0
    hotspot overflows the per-chunk share, num_dropped must equal the exact
    analytic overflow, the unchunked path must drop nothing, and tokens in
    the unskewed chunk must be bit-identical to the unchunked result."""
    n = 4 * T                     # 16 tokens per rank, chunks=2 -> 8 + 8
    x = jnp.asarray(rng.standard_normal((n, H)), jnp.float32)
    # per-rank rows 0..7 (chunk 0) all route to rank 0's experts {0..3};
    # rows 8..15 (chunk 1) to rank 3's experts {12..15}
    pos_in_rank = np.arange(n) % T
    idx_np = np.where(pos_in_rank[:, None] < T // 2,
                      np.tile(np.arange(K), (n, 1)),
                      np.tile(np.arange(E - K, E), (n, 1)))
    idx = jnp.asarray(idx_np, jnp.int32)
    w = jnp.asarray(rng.random((n, K)), jnp.float32)
    wg = (rng.standard_normal((E, H, I)) * 0.05).astype(np.float32)
    wu = (rng.standard_normal((E, H, I)) * 0.05).astype(np.float32)
    wd = (rng.standard_normal((E, I, H)) * 0.05).astype(np.float32)
    w1, s1, w2, s2 = quantize_expert_weights(
        jnp.asarray(wg), jnp.asarray(wu), jnp.asarray(wd), tn=TN)

    cfg = EPConfig(num_max_dispatch_tokens_per_rank=T, capacity_factor=1.95)
    cap = cfg.pair_capacity(T, K, 4, E // 4)
    load = (T // 2) * K           # rows each src sends to its hot rank per chunk
    assert load < cap, "unchunked must fit"
    percap = -(-cap // 2)
    assert percap < load, "per-chunk capacity must overflow"
    # BOTH chunks are skewed (chunk 0 -> rank 0, chunk 1 -> rank 3)
    expected_drops = 4 * 2 * (load - percap)

    buf = Buffer(mesh4, "ep", num_experts=E, config=cfg)
    base, _, drop0 = buf.fused_deep_moe(
        x, idx, w, w1, s1, w2, s2, gmm_tiles=(64, 128, TN), pack_tn=TN)
    piped, _, drop1 = buf.fused_deep_moe(
        x, idx, w, w1, s1, w2, s2, gmm_tiles=(64, 128, TN), pack_tn=TN,
        chunks=2)
    assert int(np.asarray(drop0).sum()) == 0
    assert int(np.asarray(drop1).sum()) == expected_drops
    # WHICH rows drop is deterministic: within a hot dst the layout fills
    # slot-major then arrival order, so pair (token j, expert col k) of a
    # chunk sits at sorted position k*(T/2) + j and survives iff that is
    # < percap.  Compare against the dense golden with exactly the dropped
    # pairs masked out.
    j = (pos_in_rank % (T // 2))[:, None]              # arrival order in chunk
    sorted_pos = np.arange(K)[None, :] * (T // 2) + j
    idx_partial = np.where(sorted_pos < percap, idx_np, -1)
    golden_partial = _dense_moe_fp32(
        np.asarray(x), idx_partial, np.asarray(w), wg, wu, wd)
    got = np.asarray(piped, np.float32)
    denom = np.abs(golden_partial).mean() + 1e-6
    assert np.abs(got - golden_partial).mean() / denom < 0.1
