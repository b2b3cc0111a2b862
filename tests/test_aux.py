"""Aux subsystems: zero experts, KV offload, memory saver, diagnostics."""

import jax
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.ops.moe import zero_experts_compute_identity
from sgl_kernel_npu_tpu.utils.diagnostics import diagnose_matrix, expert_balance_report
from sgl_kernel_npu_tpu.utils.kvcacheio import TransferDirection, transfer_kv_dim_exchange
from sgl_kernel_npu_tpu.utils.memory_saver import MemorySaver


def test_zero_experts_identity(rng):
    s, d, k, e = 6, 16, 4, 8
    hidden = jnp.asarray(rng.standard_normal((s, d)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, e, (s, k)), jnp.int32)
    idx = idx.at[0, 1].set(e + 3)          # one zero expert
    idx = idx.at[2].set(jnp.asarray([e, e + 1, e + 2, e + 3]))  # all zero experts
    scales = jnp.asarray(rng.random((s, k)), jnp.float32)
    zr, ni, ns = zero_experts_compute_identity(idx, scales, e, "identity", hidden)
    np.testing.assert_allclose(
        np.asarray(zr[0]), np.asarray(hidden[0]) * float(scales[0, 1]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(zr[1]), np.zeros(d), atol=1e-7
    )
    assert int(ni[0, 1]) == 0 and float(ns[0, 1]) == 0.0
    # token routed only to zero experts → slot 0 points at expert 0, scale 0
    assert int(ni[2, 0]) == 0 and np.all(np.asarray(ns[2]) == 0)


def test_transfer_kv_roundtrip(rng):
    layers, pages, page, d = 3, 8, 4, 16
    dev_k = [jnp.asarray(rng.standard_normal((pages, page, d)), jnp.float32)
             for _ in range(layers)]
    host_k = np.zeros((20, layers, page, d), np.float32)
    d_idx, h_idx = np.array([1, 5, 7]), np.array([10, 3, 0])
    # D2H then zero device, H2D back
    dev_k, host_k, _, _ = transfer_kv_dim_exchange(
        d_idx, h_idx, dev_k, host_k, direction=TransferDirection.D2H)
    orig = [np.asarray(l) for l in dev_k]
    zeroed = [jnp.zeros_like(l) for l in dev_k]
    dev_k2, host_k, _, _ = transfer_kv_dim_exchange(
        d_idx, h_idx, zeroed, host_k, direction=TransferDirection.H2D)
    for li in range(layers):
        got = np.asarray(dev_k2[li])
        np.testing.assert_allclose(got[d_idx], orig[li][d_idx], rtol=1e-6)
        assert np.all(got[np.setdiff1d(np.arange(pages), d_idx)] == 0)


def test_memory_saver_pause_resume(rng):
    ms = MemorySaver()
    w = ms.register("w", jnp.asarray(rng.standard_normal((64, 64)), jnp.float32), tag="weights")
    kv = ms.register("kv", jnp.ones((32, 8)), tag="kv", cpu_backup=False)
    orig = np.asarray(w)
    freed = ms.pause("weights")
    assert freed == 64 * 64 * 4
    ms.pause("kv")
    ms.resume("weights")
    np.testing.assert_array_equal(np.asarray(ms.get("w")), orig)
    ms.resume("kv")
    assert np.all(np.asarray(ms.get("kv")) == 0)  # discard mode re-materializes zeros


def test_diagnose_matrix():
    m = np.ones((8, 8))
    m[3, :] = 50.0   # slow row
    m[5, 6] = 400.0  # hot point
    out = diagnose_matrix(m)
    assert 3 in out["abnormal_rows"]
    assert (5, 6) in out["abnormal_points"]
    rep = expert_balance_report(np.array([[4, 0], [4, 0]]))
    assert rep["empty_experts"] == 1


def test_checkpoint_train_resume(tmp_path, rng):
    """Checkpoint/resume (beyond reference): save params+step mid-training,
    restore into a fresh process-state, training continues identically."""
    import jax
    import jax.numpy as jnp
    from sgl_kernel_npu_tpu.models import deepseek_v3 as m
    from sgl_kernel_npu_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    cfg = m.DeepSeekV3Config(
        vocab_size=64, hidden=64, num_layers=1, num_heads=4, kv_lora_rank=32,
        qk_rope_dim=16, qk_nope_dim=16, q_lora_rank=32, v_head_dim=16,
        num_experts=4, topk=2, moe_intermediate=32, page_size=8)
    params = m.init_weights(jax.random.key(0), cfg)
    step = m.make_train_step(cfg, mesh=None)
    tokens = jnp.asarray(rng.integers(0, 64, (2, 8)), jnp.int32)

    p1, _ = step(params, tokens)
    save_checkpoint(str(tmp_path / "ck"), {"params": p1, "step": 1})
    restored = restore_checkpoint(str(tmp_path / "ck"), like={"params": p1, "step": 0})
    assert int(restored["step"]) == 1
    p2a, l2a = step(p1, tokens)
    p2b, l2b = step(restored["params"], tokens)
    assert float(l2a) == float(l2b)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), p2a, p2b)
