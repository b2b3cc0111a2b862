"""Chunked gated delta rule forward (flash linear attention).

Capability parity with the reference pipeline (python/sgl_kernel_npu/
sgl_kernel_npu/fla/): ``chunk_gated_delta_rule_npu`` (chunk.py:250) orchestrating
cumsum → KKT → solve_tril → WY recompute → state update → output; math spec =
``chunk_gated_delta_rule_native`` (chunk.py:47).

TPU design: the whole pipeline is batched [B·H, n_chunks, C, D] einsums — exactly
what the MXU wants — plus one sequential ``lax.scan`` over chunks for the state
recurrence.  XLA fuses the elementwise glue, so the composite runs as a handful of
batched matmul super-ops; no per-stage kernels are needed.  The reference's
16→32→64 block triangular solve (solve_tril.py:457) becomes a closed-form nilpotent
inverse: for strictly-lower A, (I − A)⁻¹ = Π_i (I + A^(2^i)) — log2(C) batched
64×64 matmuls, branch-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Row L2 normalization (reference fla/l2norm.py:72)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)).astype(x.dtype)


def tril_nilpotent_inverse(a: jax.Array) -> jax.Array:
    """(I − A)⁻¹ for strictly-lower-triangular A via repeated squaring (exact).

    (I−A)(I+A)(I+A²)(I+A⁴)… = I − A^(2^m) = I once 2^m ≥ C (A is nilpotent), so the
    inverse is the ordered product of log2(C) factors — all batched matmuls.
    """
    c = a.shape[-1]
    eye = jnp.eye(c, dtype=a.dtype)
    inv = eye + a
    p = a
    for _ in range(max(1, (c - 1).bit_length() - 1)):
        p = p @ p
        inv = inv @ (eye + p)
    return inv


@functools.partial(
    jax.jit,
    static_argnames=("chunk_size", "output_final_state", "use_qk_l2norm_in_kernel", "scale"),
)
def chunk_gated_delta_rule(
    q: jax.Array,              # [B, T, H, K]
    k: jax.Array,              # [B, T, H, K]
    v: jax.Array,              # [B, T, HV, V]
    g: jax.Array,              # [B, T, HV] log-decay
    beta: jax.Array,           # [B, T, HV]
    *,
    scale: float | None = None,
    chunk_size: int = 64,
    initial_state: jax.Array | None = None,   # [B, HV, K, V]
    output_final_state: bool = True,
    use_qk_l2norm_in_kernel: bool = False,
):
    """Chunked GDN forward.  Returns ``(o [B, T, HV, V], final_state [B, HV, K, V])``.

    GQA: when HV > H, q/k heads are shared across HV//H value heads
    (reference chunk.py:153-155).
    """
    b, t, h, kd = q.shape
    hv, vd = v.shape[2], v.shape[-1]
    if hv > h:
        rep = hv // h
        q = jnp.repeat(q, rep, axis=2)
        k = jnp.repeat(k, rep, axis=2)
    if use_qk_l2norm_in_kernel:
        q, k = l2norm(q), l2norm(k)
    if scale is None:
        scale = kd ** -0.5

    c = chunk_size
    pad = (-t) % c
    nt = (t + pad) // c

    def prep(x):
        x = x.astype(jnp.float32)
        x = jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        # [B, T+, HV, D] → [B·HV, NT, C, D]  (or without D for g/beta)
        x = jnp.moveaxis(x, 2, 1).reshape((b * hv, nt, c) + x.shape[3:])
        return x

    q, k, v, gg, bb = prep(q * scale), prep(k), prep(v), prep(g), prep(beta)

    v_beta = v * bb[..., None]
    k_beta = k * bb[..., None]
    gc = jnp.cumsum(gg, axis=-1)                          # within-chunk cumulative decay
    tri = jnp.tril(jnp.ones((c, c), bool))
    tri_strict = jnp.tril(jnp.ones((c, c), bool), -1)
    decay = jnp.where(tri, jnp.exp(gc[..., :, None] - gc[..., None, :]), 0.0)

    kkt = jnp.einsum("zntk,znsk->znts", k_beta, k)        # [BH, NT, C, C]
    a = jnp.where(tri_strict, -(kkt * decay), 0.0)
    t_inv = tril_nilpotent_inverse(a)                      # (I − A)⁻¹
    u = jnp.einsum("znts,znsv->zntv", t_inv, v_beta)       # WY: u
    w = jnp.einsum("znts,znsk->zntk", t_inv, k_beta * jnp.exp(gc)[..., None])  # WY: w

    if initial_state is None:
        s0 = jnp.zeros((b * hv, kd, vd), jnp.float32)
    else:
        s0 = initial_state.reshape(b * hv, kd, vd).astype(jnp.float32)

    attn = jnp.where(tri, jnp.einsum("zntk,znsk->znts", q, k) * decay, 0.0)
    g_last = gc[..., -1]                                   # [BH, NT]

    def chunk_step(s, inp):
        q_i, k_i, u_i, w_i, gc_i, gl_i, attn_i = inp
        v_prime = w_i @ s                                  # [C, V]
        v_new = u_i - v_prime
        o_i = (q_i * jnp.exp(gc_i)[..., None]) @ s + attn_i @ v_new
        k_scaled = k_i * jnp.exp(gl_i - gc_i)[..., None]
        s_new = s * jnp.exp(gl_i) + k_scaled.swapaxes(-1, -2) @ v_new
        return s_new, o_i

    # scan over chunks; vmap over B·HV
    def per_bh(q_, k_, u_, w_, gc_, gl_, attn_, s0_):
        s_fin, o = jax.lax.scan(chunk_step, s0_, (q_, k_, u_, w_, gc_, gl_, attn_))
        return s_fin, o

    s_fin, o = jax.vmap(per_bh)(q, k, u, w, gc, g_last, attn, s0)
    o = o.reshape(b, hv, nt * c, vd)[:, :, :t].swapaxes(1, 2)
    final = s_fin.reshape(b, hv, kd, vd) if output_final_state else None
    return o.astype(v.dtype), final


def chunk_gated_delta_rule_varlen(
    q, k, v, g, beta, cu_seqlens, *,
    scale=None, chunk_size=64, use_qk_l2norm_in_kernel=False,
):
    """Varlen (packed) chunked GDN: sequences concatenated on the token dim with
    boundaries at ``cu_seqlens`` (reference chunk.py:250 cu_seqlens path).

    One fused batch-of-1 pass instead of the reference's per-sequence Python loop
    (chunk.py:161-183): adding a large negative constant to ``g`` at each sequence
    start makes every cross-boundary decay factor exp(Δg) underflow to exactly 0,
    so the state resets at boundaries *inside* the chunked math — boundaries need
    not be chunk-aligned.  Initial states are zero (use the recurrent path to
    resume from per-request state pools).

    Args: tensors shaped ``[T_total, H(V), D]`` / ``[T_total, HV]``;
    ``cu_seqlens [N+1]``.  Returns ``(o [T_total, HV, V], None)``.
    """
    t = q.shape[0]
    big = jnp.float32(1e4)
    starts = cu_seqlens[:-1]
    is_start = jnp.zeros((t,), jnp.float32).at[starts].set(1.0, mode="drop")
    g_reset = g.astype(jnp.float32) - big * is_start[:, None]
    o, _ = chunk_gated_delta_rule(
        q[None], k[None], v[None], g_reset[None], beta[None],
        scale=scale, chunk_size=chunk_size, output_final_state=False,
        use_qk_l2norm_in_kernel=use_qk_l2norm_in_kernel,
    )
    return o[0], None


def chunk_gated_delta_rule_ref(q, k, v, g, beta, *, scale=None, chunk_size=64,
                               initial_state=None, use_qk_l2norm_in_kernel=False):
    """Straight-line per-chunk loop port of the native math (chunk.py:47) — golden."""
    import numpy as np

    q, k, v, g, beta = map(lambda x: np.asarray(x, np.float32), (q, k, v, g, beta))
    b, t, h, kd = q.shape
    hv, vd = v.shape[2], v.shape[-1]
    if hv > h:
        q = np.repeat(q, hv // h, axis=2)
        k = np.repeat(k, hv // h, axis=2)
    if use_qk_l2norm_in_kernel:
        q = q / (np.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (np.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
    scale = scale or kd ** -0.5
    c = chunk_size
    pad = (-t) % c
    o = np.zeros((b, t, hv, vd), np.float32)
    s_out = np.zeros((b, hv, kd, vd), np.float32)
    for bi in range(b):
        for hi in range(hv):
            qs = np.pad(q[bi, :, hi] * scale, ((0, pad), (0, 0)))
            ks = np.pad(k[bi, :, hi], ((0, pad), (0, 0)))
            vs = np.pad(v[bi, :, hi], ((0, pad), (0, 0)))
            gs = np.pad(g[bi, :, hi], (0, pad))
            bs = np.pad(beta[bi, :, hi], (0, pad))
            s = (np.zeros((kd, vd), np.float32) if initial_state is None
                 else np.asarray(initial_state, np.float32)[bi, hi].copy())
            for ci in range((t + pad) // c):
                sl = slice(ci * c, (ci + 1) * c)
                qi, ki, vi, gi, bti = qs[sl], ks[sl], vs[sl], gs[sl], bs[sl]
                gci = np.cumsum(gi)
                dec = np.tril(np.exp(gci[:, None] - gci[None, :]))
                a = -np.tril((ki * bti[:, None]) @ ki.T * dec, -1)
                tinv = np.linalg.inv(np.eye(c) - a)
                u = tinv @ (vi * bti[:, None])
                w = tinv @ (ki * bti[:, None] * np.exp(gci)[:, None])
                v_new = u - w @ s
                attn = np.tril(qi @ ki.T * dec)
                oi = (qi * np.exp(gci)[:, None]) @ s + attn @ v_new
                s = s * np.exp(gci[-1]) + (ki * np.exp(gci[-1] - gci)[:, None]).T @ v_new
                rows = min(c, max(0, t - ci * c))
                o[bi, ci * c : ci * c + rows, hi] = oi[:rows]
            s_out[bi, hi] = s
    return o, s_out
