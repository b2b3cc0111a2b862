"""Unit-lower-triangular matrix inverse.

Parity with reference ``torch.ops.npu.triangular_inverse`` (csrc/tri_inv: column
sweep), used by the FLA chunk solve (fla/chunk.py:24-29 ``fast_inv_tril``).  On TPU
the column sweep (C sequential steps) is replaced by the exact nilpotent-squaring
product — log2(C) batched matmuls on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.fla.chunk import tril_nilpotent_inverse


def triangular_inverse(l: jax.Array) -> jax.Array:
    """Inverse of a unit-lower-triangular matrix (batched on leading dims)."""
    c = l.shape[-1]
    eye = jnp.eye(c, dtype=jnp.float32)
    a = eye - l.astype(jnp.float32)        # strictly lower: L = I − A
    return tril_nilpotent_inverse(a).astype(l.dtype)


def triangular_inverse_ref(l: jax.Array) -> jax.Array:
    """Column-sweep golden (mirrors the reference kernel's algorithm)."""
    import numpy as np

    ln = np.asarray(l, np.float64)
    c = ln.shape[-1]
    out = np.broadcast_to(np.eye(c), ln.shape).copy()
    for i in range(1, c):
        # row i of the inverse: x_i = e_i − Σ_{j<i} L[i,j]·x_j
        out[..., i, :i] = -np.einsum("...j,...jk->...k", ln[..., i, :i], out[..., :i, :i])
    return jnp.asarray(out, l.dtype)
