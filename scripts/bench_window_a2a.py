"""Self-loop bandwidth of the one-sided ragged window all-to-all (single chip).

The reference's headline numbers are EP dispatch/combine bandwidths on a
384-chip pod (BASELINE.md); on one chip the self-loop run measures the window
protocol itself (count exchange + chunked one-sided payload DMA + semaphore
sync) with no ICI in the path.  Serialized-chain timing: the kernel feeds its
own next input inside a fori_loop, so calls cannot overlap; the marginal cost
between two chain lengths cancels dispatch overhead.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from sgl_kernel_npu_tpu.parallel.pallas_a2a import pallas_ragged_all_to_all


def main():
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))
    R, C, H = 1, 4096, 7168            # DeepSeek-V3 prefill-batch payload shape
    rng = np.random.default_rng(0)
    counts = jnp.asarray([C], jnp.int32)
    x0 = jnp.asarray(rng.standard_normal((R, C, H)), jnp.bfloat16)

    def chained(n, cr):
        def f(xs_, cs):
            out, _ = pallas_ragged_all_to_all(
                xs_, cs, axis_name="ep", num_ranks=R, chunk_rows=cr)
            return out

        sm = functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(P("ep"), P("ep")),
            out_specs=P("ep"), check_vma=False)(f)

        @jax.jit
        def run(x, c):
            def body(i, x):
                return sm(x, c)
            return jnp.sum(
                jax.lax.fori_loop(0, n, body, x)[:, :1, :1].astype(jnp.float32))
        return run

    for cr in (512, 2048):
        ts = {}
        for n in (16, 272):
            r = chained(n, cr)
            float(r(x0, counts))               # compile + warm
            times = []
            for _ in range(6):
                t0 = time.perf_counter()
                float(r(x0, counts))
                times.append(time.perf_counter() - t0)
            ts[n] = min(times)
        dt = (ts[272] - ts[16]) / 256
        print(f"chunk_rows={cr}: {dt*1e6:7.1f} us/xfer -> "
              f"{C*H*2/dt/1e9:4.0f} GB/s one-way (56 MiB payload, self-loop)")


if __name__ == "__main__":
    main()
