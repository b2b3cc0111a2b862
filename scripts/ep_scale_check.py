"""EP-size scaling check on a virtual CPU mesh: dispatch→expert-id GEMM→combine.

Usage: ep_scale_check.py [num_ranks].  The reference supports EP 2–160 via
per-size Config tables (buffer.py:75-88); here one capacity model covers any
mesh size — this script proves the protocol end-to-end on meshes bigger than
the 8-device test fixture (run as a subprocess so the device count can differ).
"""

import os
import sys

n_ranks = int(sys.argv[1]) if len(sys.argv) > 1 else 16
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
    main()
