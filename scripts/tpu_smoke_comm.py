"""Hardware smoke test for the monitored one-sided comm path (single chip).

The bounded-poll wait (`pltpu.semaphore_read`), state-check broadcast
(`pltpu.semaphore_signal`), and timeout accounting have no CPU-interpret lowering,
so they are validated here on the real chip with a 1-device mesh:

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

    print("ALL OK" if ok else "SOME FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
