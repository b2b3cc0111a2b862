"""One low-latency dispatch/combine roundtrip check for a sweep configuration.

Env: SWEEP_TOKENS / SWEEP_HIDDEN / SWEEP_TOPK / SWEEP_EXPERTS.
Runs on 8 virtual CPU devices; validates the roundtrip against dense golden math
(same check as tests/test_ep_dispatch.py, parameterized by the sweep)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.config import EPConfig
from sgl_kernel_npu_tpu.parallel.buffer import Buffer


def main():
    t = int(os.environ.get("SWEEP_TOKENS", 8))
    h = int(os.environ.get("SWEEP_HIDDEN", 64))
    k = int(os.environ.get("SWEEP_TOPK", 4))
    e = int(os.environ.get("SWEEP_EXPERTS", 16))
    r = 8
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:r]), ("ep",))
    buf = Buffer(mesh, "ep", num_experts=e,
                 config=EPConfig(num_max_dispatch_tokens_per_rank=t, use_int8_dispatch=False))
    rng = np.random.default_rng(0)
    n = r * t
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    idx = jnp.asarray(np.stack([rng.choice(e, k, replace=False) for _ in range(n)]), jnp.int32)
    w = jnp.asarray(rng.random((n, k)), jnp.float32)

    recv_x, _, counts, handle, stats = buf.low_latency_dispatch(x, idx)
    el = e // r
    gx = np.asarray(recv_x, np.float32).reshape(r, el, -1, h)
    eid = (np.arange(r)[:, None] * el + np.arange(el)[None] + 1).astype(np.float32)
    y = jnp.asarray((gx * eid[:, :, None, None]).reshape(r * el, -1, h), jnp.float32)
    combined = buf.low_latency_combine(y, w, handle, out_dtype=jnp.float32)

    golden = np.zeros((n, h), np.float32)
    xn, idxn, wn = map(np.asarray, (x, idx, w))
    for tt in range(n):
        for kk in range(k):
            golden[tt] += wn[tt, kk] * (idxn[tt, kk] + 1.0) * xn[tt]
    err = np.abs(np.asarray(combined) - golden).max()
    assert err < 1e-3, err
    assert int(np.asarray(stats["num_dropped"]).sum()) == 0
    print(f"ok tokens={t} hidden={h} topk={k} experts={e} max_err={err:.2e}")


if __name__ == "__main__":
    main()
