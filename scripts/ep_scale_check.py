"""EP-size scaling check on a virtual CPU mesh: dispatch→expert-id GEMM→combine.

Usage: ep_scale_check.py [num_ranks] [--capacity-only].

The reference supports EP 2–160 via per-size tuned Config tables
(buffer.py:75-116); here ONE capacity model (EPConfig.pair_capacity) covers
any mesh size.  Two validations:

1. ``check_capacity_model()`` — at every EP size in the reference's table
   (2, 4, 8, 16, 24, 32, 64, 128, 144, 160), run the real routing planner
   (ep_core.make_routing_plan) on fixed-seed uniform routing at production
   token counts and assert: exact capacity never drops, factor-1.3 capacity
   drops <1 % while cutting send-buffer memory ≥2x at large EP, and the
   per-rank dispatch window stays under 1 GiB at DeepSeek-V3 shapes.
2. The end-to-end mesh roundtrip at ``num_ranks`` virtual devices —
   dispatch → expert-id compute → combine vs the dense golden (run as a
   subprocess so the device count can differ from the test fixture's 8).
"""

import os
import sys

n_ranks = int(sys.argv[1]) if len(sys.argv) > 1 else 16
capacity_only = "--capacity-only" in sys.argv
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_ranks}"
).strip()

import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.config import EPConfig
from sgl_kernel_npu_tpu.parallel.buffer import Buffer


REFERENCE_EP_SIZES = (2, 4, 8, 16, 24, 32, 64, 128, 144, 160)


def check_capacity_model():
    """Validate EPConfig's capacity model at every reference-table EP size.

    The reference ships hand-tuned per-size Configs (buffer.py:75-116); our
    single model must (a) never drop at exact sizing, (b) drop <1 % at
    factor sizing while actually saving memory, (c) keep the static dispatch
    window affordable at production shapes for every supported size.
    """
    from sgl_kernel_npu_tpu.parallel import ep_core

    t_per_rank, topk, hidden_bytes = 128, 8, 7168  # DeepSeek-V3, int8 wire
    rng = np.random.default_rng(7)
    for r in REFERENCE_EP_SIZES:
        e_total = max(2 * r, 16)
        e_local = e_total // r
        k = min(topk, e_total)
        cfg_exact = EPConfig(num_max_dispatch_tokens_per_rank=t_per_rank)
        cfg_factor = EPConfig(num_max_dispatch_tokens_per_rank=t_per_rank,
                              capacity_factor=1.3)
        cap_exact = cfg_exact.pair_capacity(t_per_rank, k, r, e_local)
        cap_factor = cfg_factor.pair_capacity(t_per_rank, k, r, e_local)
        seg_capacity = t_per_rank  # topk experts are distinct per token

        # fixed-seed uniform routing through the REAL planner (one src rank)
        idx = jnp.asarray(
            np.stack([rng.choice(e_total, k, replace=False)
                      for _ in range(t_per_rank)]), jnp.int32)
        for cap, bound in ((cap_exact, 0), (cap_factor, 0.01 * t_per_rank * k)):
            plan = ep_core.make_routing_plan(
                idx, num_experts=e_total, num_ranks=r, my_rank=jnp.int32(0),
                pair_capacity=cap, seg_capacity=seg_capacity)
            dropped = int(plan.num_dropped)
            assert dropped <= bound, (
                f"EP={r}: cap={cap} dropped {dropped} > bound {bound}")

        # memory: per-rank dispatch window = R * cap * hidden bytes (int8)
        window_exact = r * cap_exact * hidden_bytes
        window_factor = r * cap_factor * hidden_bytes
        assert window_factor <= 1 << 30, (
            f"EP={r}: factor window {window_factor/2**20:.0f} MiB > 1 GiB")
        if r >= 64:
            # at scale the factor sizing must actually pay for itself
            assert window_factor * 2 <= window_exact, (
                f"EP={r}: factor saves <2x ({window_factor} vs {window_exact})")
        print(f"EP={r:3d}: cap exact {cap_exact:4d} / factor {cap_factor:4d}, "
              f"window {window_exact/2**20:7.1f} / {window_factor/2**20:7.1f} MiB: OK")


def main():
    t_per_rank, topk = 8, 4
    num_experts = 2 * n_ranks
    n = n_ranks * t_per_rank
    rng = np.random.default_rng(0)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_ranks]), ("ep",))
    buf = Buffer(mesh, "ep", num_experts=num_experts,
                 config=EPConfig(num_max_dispatch_tokens_per_rank=t_per_rank,
                                 use_int8_dispatch=False))

    hidden = 64
    x = jnp.asarray(rng.standard_normal((n, hidden)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(num_experts, topk, replace=False) for _ in range(n)]),
        jnp.int32)
    w = jnp.asarray(rng.random((n, topk)), jnp.float32)

    # low-latency round trip with expert-id compute: combine must equal the
    # dense golden sum_k w[t,k] * (expert_id+1) * x[t]
    recv_x, _, recv_count, handle, stats = buf.low_latency_dispatch(x, idx)
    assert int(np.asarray(stats["num_dropped"]).sum()) == 0
    el = num_experts // n_ranks
    gx = np.asarray(recv_x, np.float32).reshape(n_ranks, el, -1, hidden)
    eid = (np.arange(n_ranks)[:, None] * el + np.arange(el)[None, :] + 1)
    y = jnp.asarray(
        (gx * eid[:, :, None, None]).reshape(n_ranks * el, -1, hidden), jnp.float32)
    out = buf.low_latency_combine(y, w, handle, out_dtype=jnp.float32)
    wn, xn, idxn = np.asarray(w), np.asarray(x), np.asarray(idx)
    golden = np.stack([
        sum(wn[t, k] * (idxn[t, k] + 1.0) * xn[t] for k in range(topk))
        for t in range(n)])
    err = np.abs(np.asarray(out) - golden).max()
    assert err < 1e-3, err
    print(f"EP={n_ranks}: low-latency dispatch/compute/combine OK (err {err:.1e})")


if __name__ == "__main__":
    check_capacity_model()
    if not capacity_only:
        main()
