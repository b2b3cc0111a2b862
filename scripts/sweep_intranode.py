"""One normal-mode (prefill) dispatch/combine roundtrip for a sweep configuration.

Env: SWEEP_TOKENS / SWEEP_HIDDEN / SWEEP_TOPK / SWEEP_EXPERTS / SWEEP_ROUNDS /
SWEEP_INT8 / SWEEP_DROP (topk→-1 probability) / SWEEP_BACKEND.

Mirrors the reference's intranode CI matrix (.github/workflows/pr-test-npu.yml:55-110:
model shapes × EPLB drop cases × multi-round), hardware-free on 8 virtual devices.
The roundtrip (dispatch → ×2 per expert row → combine) is checked against dense
golden math with -1 entries dropped.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from sgl_kernel_npu_tpu.config import EPConfig
from sgl_kernel_npu_tpu.parallel.buffer import Buffer


def main():
    t = int(os.environ.get("SWEEP_TOKENS", 16))
    h = int(os.environ.get("SWEEP_HIDDEN", 64))
    k = int(os.environ.get("SWEEP_TOPK", 4))
    e = int(os.environ.get("SWEEP_EXPERTS", 16))
    rounds = int(os.environ.get("SWEEP_ROUNDS", 1))
    use_int8 = os.environ.get("SWEEP_INT8", "0") == "1"
    drop_p = float(os.environ.get("SWEEP_DROP", 0.0))
    backend = os.environ.get("SWEEP_BACKEND", "xla")
    r = 8
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:r]), ("ep",))
    buf = Buffer(
        mesh, "ep", num_experts=e,
        config=EPConfig(
            num_max_dispatch_tokens_per_rank=t, use_int8_dispatch=use_int8,
            comm_backend=backend,
        ),
    )
    rng = np.random.default_rng(0)
    n = r * t
    x = jnp.asarray(rng.standard_normal((n, h)), jnp.float32)
    idx = np.stack([rng.choice(e, k, replace=False) for _ in range(n)]).astype(np.int32)
    if drop_p > 0:
        idx = np.where(rng.random(idx.shape) < drop_p, -1, idx)  # topk = -1 masking
    idx = jnp.asarray(idx)
    w = jnp.asarray(rng.random((n, k)), jnp.float32)

    xs, scales, gs, handle, stats = buf.dispatch(
        x, idx, rounds=rounds if rounds > 1 else None
    )
    ys = xs.astype(jnp.float32) * (scales[..., None] if use_int8 else 1.0) * 2.0
    out = buf.combine(ys.astype(x.dtype), w, handle, out_dtype=jnp.float32)

    wm = np.where(np.asarray(idx) >= 0, np.asarray(w), 0.0)
    xg = np.asarray(x)
    if use_int8:  # golden sees the same per-token int8 payload quantization
        from sgl_kernel_npu_tpu.ops.quant import quant_per_token_ref

        q, s = quant_per_token_ref(x)
        xg = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    golden = 2.0 * xg * wm.sum(axis=1, keepdims=True)
    err = np.abs(np.asarray(out) - golden).max()
    tol = 1e-4
    passed = err < tol
    status = "OK" if passed else "FAIL"
    print(
        f"{status} tokens={t} hidden={h} topk={k} experts={e} rounds={rounds} "
        f"int8={int(use_int8)} drop={drop_p} backend={backend}: max_err={err:.2e} "
        f"dropped={int(np.asarray(stats['num_dropped']).sum())}"
    )
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
