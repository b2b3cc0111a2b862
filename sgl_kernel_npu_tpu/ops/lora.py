"""LoRA batched/segmented matvec ops: BGMV / SGMV / SGEMMV.

Capability parity with reference ``csrc/lora`` (bgmv_shrink/expand, sgmv_shrink/
expand, sgemmv_shrink/expand; goldens tests/python/sgl_kernel_npu/utils.py:12-146):

- shrink: hidden → (num_slices × rank), scaled;
- expand: rank → hidden slices, accumulated into a base output at slice offsets;
- bgmv_*: per-token adapter index; sgmv_*: per-sequence index + lengths;
  sgemmv_*: heterogeneous per-adapter ranks/scalings (the general case — the other
  four are specializations, which is how we implement them).

TPU design note: the jnp paths here are the capability-complete goldens.  Chip
measurement (scripts/bench_lora.py, round 3) showed them 8.6×/17× off the
memory floor — launch-overhead-bound at decode shapes, A×-FLOPs-bound at
prefill shapes — so the hot paths now ride the fused Pallas kernels in
ops/lora_pallas.py (``bgmv_fused`` / ``sgmv_fused``: shrink+expand in ONE
kernel, weights streamed once; the TPU twin of the reference's AscendC LoRA
kernels, csrc/lora/op_kernel/).  ``fused_lora_delta`` below picks the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def token_lora_indices(weight_indices: jax.Array, seq_lengths: jax.Array, total_tokens: int):
    """Per-token adapter index from per-sequence indices + lengths."""
    ends = jnp.cumsum(seq_lengths.astype(jnp.int32))
    seq_of_token = jnp.searchsorted(ends, jnp.arange(total_tokens), side="right")
    seq_of_token = jnp.clip(seq_of_token, 0, seq_lengths.shape[0] - 1)
    valid = jnp.arange(total_tokens) < ends[-1]
    return weight_indices.astype(jnp.int32)[seq_of_token], valid


def _dense_all_ok(t: int, a: int, out_dim: int) -> bool:
    """Use the all-adapters MXU path when the [T, A, out] intermediate is small."""
    return a <= 32 and t * a * out_dim * 4 <= 32 * 2**20


def _shrink(x, weights, tok_idx, valid, ranks, scalings, num_slices: int):
    """Core shrink: out[t, :S·r] = scaling[a] · (x[t] @ weights[a, :S·r].T).

    Slices are packed compactly by the adapter's *actual* rank (reference layout,
    utils.py:57-63): weight row / output column c corresponds to slice c // r,
    component c % r, so the whole padded product is valid up to column S·r.

    Two paths: for small adapter pools the all-adapters dense matmul + one-hot
    select reads each adapter's weights exactly ONCE from HBM (A× the FLOPs,
    all on the MXU — decode LoRA is bandwidth-bound, so A·T·R extra MACs are
    free); the general path is the per-token weight gather the reference's
    bgmv kernels implement in AscendC (csrc/lora/op_kernel/).
    """
    out_dim = weights.shape[1]
    a = weights.shape[0]
    if _dense_all_ok(x.shape[0], a, out_dim):
        all_out = jnp.einsum(
            "th,arh->tar", x.astype(jnp.float32), weights.astype(jnp.float32)
        )                                                 # [T, A, S*maxR]
        onehot = (tok_idx[:, None] == jnp.arange(a)[None, :]).astype(jnp.float32)
        out = jnp.einsum("tar,ta->tr", all_out, onehot)
    else:
        w = weights[tok_idx]                              # [T, S*maxR, H]
        out = jnp.einsum("th,trh->tr", x.astype(jnp.float32), w.astype(jnp.float32))
    rank_t = ranks.astype(jnp.int32)[tok_idx]             # [T]
    col = jnp.arange(out_dim)
    mask = (col[None, :] < num_slices * rank_t[:, None]) & valid[:, None]
    out = jnp.where(mask, out * scalings.astype(jnp.float32)[tok_idx][:, None], 0.0)
    return out.astype(x.dtype)


def _expand(x, weights, tok_idx, valid, ranks, slice_offsets, base_output):
    """Core expand: per slice s, out[:, off_s:off_{s+1}] += x[:, s·r:(s+1)·r] @ B_s.T
    (compact-by-rank input layout, dynamic per-token rank)."""
    t = x.shape[0]
    num_slices = len(slice_offsets) - 1
    total_out = int(slice_offsets[-1])
    max_rank = x.shape[1] // num_slices
    out = base_output if base_output is not None else jnp.zeros((t, total_out), x.dtype)
    out_dtype = out.dtype
    out = out.astype(jnp.float32)
    a = weights.shape[0]
    # all-adapters path: fold the one-hot adapter select into the input —
    # xe[t, (a, r)] = onehot[t, a] · x_slice[t, r] — then ONE dense matmul
    # against the [A·maxR, slice] reshaped weights.  Weights stream once from
    # HBM; no [T, out_dim, maxR] per-token gather (see _shrink).
    dense_all = _dense_all_ok(t, a, max_rank) and a <= 32
    if dense_all:
        onehot = (tok_idx[:, None] == jnp.arange(a)[None, :]).astype(jnp.float32)
        w = None
    else:
        w = weights[tok_idx]                              # [T, out_dim, maxR]
    rank_t = ranks.astype(jnp.int32)[tok_idx]
    j = jnp.arange(max_rank)[None, :]                     # rank component
    for s in range(num_slices):
        o0, o1 = int(slice_offsets[s]), int(slice_offsets[s + 1])
        # slice s occupies input columns [s·r_t, s·r_t + r_t)
        cols = jnp.clip(s * rank_t[:, None] + j, 0, x.shape[1] - 1)
        xs = jnp.take_along_axis(x, cols, axis=1).astype(jnp.float32)
        rmask = (j < rank_t[:, None]) & valid[:, None]
        xs = jnp.where(rmask, xs, 0.0)
        if dense_all:
            xe = (onehot[:, :, None] * xs[:, None, :]).reshape(t, a * max_rank)
            ws = (
                weights[:, o0:o1, :].astype(jnp.float32)
                .transpose(0, 2, 1).reshape(a * max_rank, o1 - o0)
            )
            out = out.at[:, o0:o1].add(xe @ ws)
        else:
            ws = w[:, o0:o1, :].astype(jnp.float32)       # [T, slice, maxR]
            out = out.at[:, o0:o1].add(jnp.einsum("tr,tdr->td", xs, ws))
    return out.astype(out_dtype)


# -- BGMV: per-token adapter ---------------------------------------------------------

def bgmv_shrink(x, weights, weight_indices, scaling: float = 1.0):
    """x [T, H] × A [L, R, H] per-token → [T, R], × scaling (csrc/lora/bgmv_shrink)."""
    t = x.shape[0]
    ranks = jnp.full((weights.shape[0],), weights.shape[1], jnp.int32)
    scalings = jnp.full((weights.shape[0],), scaling, jnp.float32)
    return _shrink(x, weights, weight_indices.astype(jnp.int32), jnp.ones(t, bool),
                   ranks, scalings, num_slices=1)


def bgmv_expand(x, weights, weight_indices, base_output=None, slice_offset: int = 0,
                slice_size: int | None = None, output_dim: int | None = None):
    """x [T, R] × B [L, D, R] per-token → accumulate into output[:, off:off+size]."""
    t, r = x.shape
    d = weights.shape[1]
    slice_size = slice_size if slice_size is not None else d
    output_dim = output_dim if output_dim is not None else slice_offset + slice_size
    if base_output is None:
        base_output = jnp.zeros((t, output_dim), x.dtype)
    a = weights.shape[0]
    idx = weight_indices.astype(jnp.int32)
    if _dense_all_ok(t, a, r):
        # fold the adapter one-hot into x, one dense matmul (see _expand)
        onehot = (idx[:, None] == jnp.arange(a)[None, :]).astype(jnp.float32)
        xe = (onehot[:, :, None] * x.astype(jnp.float32)[:, None, :]).reshape(t, a * r)
        ws = (
            weights[:, :slice_size, :].astype(jnp.float32)
            .transpose(0, 2, 1).reshape(a * r, slice_size)
        )
        delta = xe @ ws
    else:
        w = weights[idx]
        delta = jnp.einsum(
            "tr,tdr->td", x.astype(jnp.float32), w[:, :slice_size, :].astype(jnp.float32)
        )
    return base_output.at[:, slice_offset : slice_offset + slice_size].add(
        delta.astype(base_output.dtype)
    )


# -- SGMV / SGEMMV: per-sequence adapter ---------------------------------------------

def sgmv_shrink(x, weights, weight_indices, seq_lengths, lora_ranks, lora_scalings,
                num_slices: int = 1):
    """Sequence-grouped shrink (golden: utils.py:12-72)."""
    tok_idx, valid = token_lora_indices(weight_indices, seq_lengths, x.shape[0])
    return _shrink(x, weights, tok_idx, valid, lora_ranks, lora_scalings, num_slices)


def sgmv_expand(x, weights, weight_indices, seq_lengths, lora_ranks, slice_offsets,
                base_output=None):
    """Sequence-grouped expand (golden: utils.py:79-146)."""
    tok_idx, valid = token_lora_indices(weight_indices, seq_lengths, x.shape[0])
    return _expand(x, weights, tok_idx, valid, lora_ranks, tuple(slice_offsets), base_output)


# SGEMMV = SGMV with heterogeneous per-adapter ranks/scalings; the general core
# already supports that, so these are exact aliases (reference keeps 6 kernels).
sgemmv_shrink = sgmv_shrink
sgemmv_expand = sgmv_expand


# -- fused Pallas fast paths -----------------------------------------------------------

def fused_lora_delta(
    x: jax.Array,
    a: jax.Array,
    b: jax.Array,
    token_adapter: jax.Array,
    *,
    scaling: float = 1.0,
    bt: jax.Array | None = None,
) -> jax.Array:
    """Per-token LoRA delta ``scaling·(x @ A[i]ᵀ) @ B[i]ᵀ`` via ONE Pallas kernel.

    The decode serving path (models/llama.py multi-LoRA).  x ``[T, H]``,
    a ``[L, R, H]``, b ``[L, D, R]``, token_adapter ``[T]``; returns [T, D]
    in x.dtype.  Falls back to the jnp chain when the per-adapter sweep would
    re-read a large x too many times (T·L·H beyond ~64 MB of reads).
    """
    from sgl_kernel_npu_tpu.ops import lora_pallas

    t, h = x.shape
    l, r = a.shape[0], a.shape[1]
    if _dense_all_ok(t, l, r) and _dense_all_ok(t, l, b.shape[1]):
        # r5 trace adjudication (PERF.md §LoRA): at decode shapes with a
        # small pool, XLA's all-adapters dense chain runs AT the weight-read
        # floor (6.9 µs vs the kernel's 9.3 — pallas fixed launch cost
        # dominates ops this small), so it is the production decode path.
        idx = token_adapter.astype(jnp.int32)
        return bgmv_expand(bgmv_shrink(x, a, idx, scaling), b, idx).astype(x.dtype)
    if t * l * h * x.dtype.itemsize <= 64 * 2**20:
        # mid-size pools/batches: the fused kernel streams each adapter once
        # (the chain's gather path re-reads per token); bt [L, R, D] passes
        # the once-per-load transposed expand weights (lora_pallas.bgmv_fused)
        return lora_pallas.bgmv_fused(
            x, a, b, token_adapter, bt=bt, scaling=scaling
        ).astype(x.dtype)
    idx = token_adapter.astype(jnp.int32)
    return bgmv_expand(bgmv_shrink(x, a, idx, scaling), b, idx).astype(x.dtype)


def fused_sgmv_delta(
    x: jax.Array,
    a: jax.Array,
    b: jax.Array,
    weight_indices: jax.Array,
    seq_lengths: jax.Array,
    lora_ranks: jax.Array,
    lora_scalings: jax.Array,
) -> jax.Array:
    """Per-sequence LoRA delta over packed varlen tokens via ONE Pallas kernel
    (prefill serving path; heterogeneous ranks/scalings ride per-tile scalars)."""
    from sgl_kernel_npu_tpu.ops import lora_pallas

    return lora_pallas.sgmv_fused(
        x, a, b, weight_indices, seq_lengths, lora_ranks, lora_scalings
    ).astype(x.dtype)
