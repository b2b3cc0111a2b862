"""Hardware smoke test for the monitored one-sided comm path (single chip).

The bounded flag-window poll (local DMA snapshots of the flag region), the
abort-row broadcast, and the timeout accounting behave differently under the
interpret simulator (lazy delivery falsely times out live sources), so they
are validated here on the real chip with a 1-device mesh.  NOTE:
``pltpu.semaphore_read`` must never be used on this stack — a single read
(DMA or regular semaphore) hangs the device (measured round 4); the monitored
kernel is flag-window based for exactly that reason.

  1. self-loop ragged exchange — data + count arrive, no timeout flagged;
  2. fault-injected run (this rank mutes its sends) — the bounded poll expires,
     the timeout flag fires, the recv count is forced to 0, and the kernel
     still terminates (the whole point of the reference's TimeOutDetection,
     moe_distribute_dispatch_v2.h:1110-1126: report instead of hang).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel.pallas_a2a import pallas_ragged_all_to_all


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {getattr(dev, 'device_kind', '?')}")
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))
    R, C, H = 1, 64, 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, C, H)), jnp.float32)
    counts = jnp.asarray([40], jnp.int32)

    def body(fault):
        def f(xs, cs):
            out, oc, stats = pallas_ragged_all_to_all(
                xs, cs, axis_name="ep", num_ranks=R, chunk_rows=16,
                monitor=True, max_poll_rounds=20_000, inject_send_fault=fault,
            )
            return out, oc[None], stats[None]
        return jax.jit(
            functools.partial(
                jax.shard_map, mesh=mesh, in_specs=(P("ep"), P("ep")),
                out_specs=(P("ep"),) * 3, check_vma=False,
            )(f)
        )

    ok = True

    out, oc, stats = body(fault=False)(x, counts)
    out, oc, stats = map(np.asarray, (out, oc, stats))
    good = (
        oc[0, 0] == 40
        and np.allclose(out[0, :40], np.asarray(x)[0, :40])
        and stats[0, 0, 1] == 0
    )
    print(f"{'OK ' if good else 'FAIL'} monitored self-loop: "
          f"count={oc[0, 0]} polls={stats[0, 0, 0]} timeout={stats[0, 0, 1]}")
    ok &= good

    out, oc, stats = body(fault=True)(x, counts)
    oc, stats = np.asarray(oc), np.asarray(stats)
    good = oc[0, 0] == 0 and stats[0, 0, 1] == 1 and stats[0, 0, 0] >= 20_000
    print(f"{'OK ' if good else 'FAIL'} fault-injected timeout: "
          f"count={oc[0, 0]} polls={stats[0, 0, 0]} timeout={stats[0, 0, 1]}")
    ok &= good

    # full LL dispatch→combine over the ragged backend with combine monitoring
    # (payload-phase bounded waits + receiver-side wait matrices, VERDICT item 2)
    from sgl_kernel_npu_tpu.parallel import ep_core

    E, T, K, Hd = 8, 16, 2, 256
    xt = jnp.asarray(rng.standard_normal((T, Hd)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.choice(E, K, replace=False) for _ in range(T)]), jnp.int32)
    wts = jnp.asarray(rng.random((T, K)), jnp.float32)

    def roundtrip(backend, monitor):
        def f(xs, ids, ws):
            d = ep_core.dispatch_core(
                xs, ids, axis_name="ep", num_experts=E, num_ranks=R,
                pair_capacity=T * K, seg_capacity=T, use_int8=False,
                backend=backend)
            y = d["recv_x"].astype(jnp.float32) * 0.5
            out = ep_core.combine_core(
                y, ws, d["handle"], axis_name="ep", num_ranks=R,
                seg_capacity=T, out_dtype=jnp.float32, backend=backend,
                monitor=monitor)
            if monitor:
                out, st = out
                return out, st[None]
            return out, jnp.zeros((1, R, 6), jnp.int32)
        return jax.jit(
            functools.partial(
                jax.shard_map, mesh=mesh, in_specs=(P("ep"),) * 3,
                out_specs=(P("ep"), P("ep")), check_vma=False,
            )(f)
        )

    out_x, _ = roundtrip("xla", False)(xt, idx, wts)
    out_r, cst = roundtrip("pallas_ragged", True)(xt, idx, wts)
    out_x, out_r, cst = map(np.asarray, (out_x, out_r, cst))
    good = (
        np.allclose(out_r, out_x, rtol=1e-5, atol=1e-5)
        and cst[0, 0, 1] == 0 and cst[0, 0, 4] == 0
    )
    print(f"{'OK ' if good else 'FAIL'} monitored ragged combine roundtrip: "
          f"max_diff={np.abs(out_r - out_x).max():.2e} "
          f"count_polls={cst[0, 0, 0]} payload_polls={cst[0, 0, 3]} "
          f"send_polls={cst[0, 0, 5]} timeouts={cst[0, 0, 1]},{cst[0, 0, 4]}")
    ok &= good

    print("ALL OK" if ok else "SOME FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
