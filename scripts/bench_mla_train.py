"""Chip benchmark: MLA flash-train kernel (fwd + bwd) vs the O(S²) XLA path.

Training shapes: B=1, S=2048, 16 heads, latent 512 + rope 64, bf16.  The XLA
path materializes the [B, H, S, S] score matrix (here 256 MB f32) in BOTH
directions; the flash kernel is O(S).  Scan-marginal timing.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from bench import _bench_scanned
from sgl_kernel_npu_tpu.ops.attention.mla_train import mla_flash_train, mla_train_ref


def main():
    b, s, h, dl, dr = 1, 2048, 16, 512, 64
    cq = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ck = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    sc = 0.042
    mk = jax.jit(lambda key, shape: jax.random.normal(key, shape, jnp.bfloat16) * 0.3,
                 static_argnums=1)
    kl = mk(jax.random.key(0), (b, s, dl))
    kp = mk(jax.random.key(1), (b, s, dr))
    qp = mk(jax.random.key(2), (b, s, h, dr))

    # spread must dwarf tunnel jitter (~24 ms): 8 iterations of a ~1 ms op
    # once measured 122 us 'per iter' — impossible (634 TF)
    n1, n2 = 2, 26
    qs_small = mk(jax.random.key(3), (n1, b, s, h, dl))
    qs_big = mk(jax.random.key(4), (n2, b, s, h, dl))

    def fwd_flash(ql, kl_, kp_, qp_):
        return mla_flash_train(ql, qp_, kl_, kp_, sc, q_chunk=cq, k_chunk=ck)

    def fwd_ref(ql, kl_, kp_, qp_):
        return mla_train_ref(ql, qp_, kl_, kp_, sc)

    def grad_of(fn):
        def loss(ql, kl_, kp_, qp_):
            return jnp.sum(jnp.sin(fn(ql, kl_, kp_, qp_).astype(jnp.float32)))

        def g(ql, kl_, kp_, qp_):
            out = jax.grad(loss, argnums=(0, 1))(ql, kl_, kp_, qp_)
            return out[0] + 0 * out[1].sum()   # single-array return for the scan
        return g

    ops = (kl, kp, qp)
    t_fwd_k = _bench_scanned(fwd_flash, qs_small, qs_big, ops)
    t_fwd_r = _bench_scanned(fwd_ref, qs_small, qs_big, ops)
    t_bwd_k = _bench_scanned(grad_of(fwd_flash), qs_small, qs_big, ops)
    t_bwd_r = _bench_scanned(grad_of(fwd_ref), qs_small, qs_big, ops)
    flops = 2 * 2 * b * h * s * s // 2 * (dl + dr)   # causal qk + pv
    print(f"cq={cq} ck={ck}", flush=True)
    print(f"fwd: flash {t_fwd_k*1e6:8.1f} us ({flops/t_fwd_k/1e12:5.1f} TF)  "
          f"xla {t_fwd_r*1e6:8.1f} us  -> {t_fwd_r/t_fwd_k:.2f}x")
    print(f"fwd+bwd: flash {t_bwd_k*1e6:8.1f} us  xla {t_bwd_r*1e6:8.1f} us  "
          f"-> {t_bwd_r/t_bwd_k:.2f}x")


if __name__ == "__main__":
    main()
