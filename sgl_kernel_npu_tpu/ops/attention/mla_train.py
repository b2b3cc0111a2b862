"""Differentiable dense causal MLA flash attention (Pallas fwd + bwd).

The reference ships inference kernels only; its training story is "use torch".
Here the *training* path gets a TPU-native flash kernel with a hand-written
backward (``jax.custom_vjp``), so `models/deepseek_v3.train_forward` stops
materializing the [B, H, S, S] score matrix — O(S) memory instead of O(S²),
which is what makes long-sequence MLA training fit in HBM at all.

MLA absorbed-attention math (same as ops/attention/mla_prefill.py): queries
(q_lat [B,S,H,L] ‖ q_pe [B,S,H,R]) attend to per-token latent K (k_lat [B,S,L]
+ k_pe [B,S,R], shared across heads); V aliases k_lat, so k_lat's gradient
collects both the dK and dV flash-backward terms.

Layout notes (Mosaic): all per-row statistics (LSE, delta) ride in a
[rows, 128]-broadcast layout — every lane of a row holds the same value — so
no cross-lane relayout is ever needed (a [C,1]→[1,C] style reshape NaNs on
hardware, see PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgl_kernel_npu_tpu.ops.attention.decode_attention import NEG_INF
from sgl_kernel_npu_tpu.utils.common import interpret_default


def mla_train_ref(q_lat, q_pe, k_lat, k_pe, sm_scale):
    """Golden dense causal MLA attention: [B,S,H,L] → [B,S,H,L] (f32 math)."""
    s = q_lat.shape[1]
    qk = jnp.einsum("bqhl,bkl->bhqk", q_lat.astype(jnp.float32),
                    k_lat.astype(jnp.float32))
    qk += jnp.einsum("bqhr,bkr->bhqk", q_pe.astype(jnp.float32),
                     k_pe.astype(jnp.float32))
    qk *= sm_scale
    causal = jnp.tril(jnp.ones((s, s), bool))
    qk = jnp.where(causal[None, None], qk, NEG_INF)
    p = jax.nn.softmax(qk, axis=-1)
    out = jnp.einsum("bhqk,bkl->bqhl", p, k_lat.astype(jnp.float32))
    return out.astype(q_lat.dtype)


def _row_tok(cq, h, rows):
    """Token index of each (token-major, head-minor) row."""
    return jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) // h


def _scores(qn, qp, kn, kp, sm_scale):
    qk = jax.lax.dot_general(qn, kn, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    qk += jax.lax.dot_general(qp, kp, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return qk * sm_scale


def _fwd_kernel(qn_ref, qp_ref, kn_ref, kp_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, sm_scale, ck, s_valid):
    qc, kc = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)
    cq, h, dn = qn_ref.shape[1], qn_ref.shape[2], qn_ref.shape[3]
    rows = cq * h

    @pl.when(kc == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    tok = qc * cq + _row_tok(cq, h, rows)
    hi_kc = (qc * cq + cq - 1) // ck               # last causal k chunk
    kcc = jnp.minimum(kc, hi_kc)                   # must match the index maps

    @pl.when(kc <= hi_kc)
    def _step():
        qn = qn_ref[0].reshape(rows, dn)
        qp = qp_ref[0].reshape(rows, qp_ref.shape[3])
        kn, kp = kn_ref[0], kp_ref[0]              # [ck, L], [ck, R]
        qk = _scores(qn, qp, kn, kp, sm_scale)
        kpos = kcc * ck + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        live = jnp.logical_and(kpos <= tok,
                               jnp.logical_and(kpos < s_valid, tok < s_valid))
        qk = jnp.where(live, qk, NEG_INF)
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(qk, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        probs = jnp.exp(qk - m_new)
        l_ref[...] = l_ref[...] * alpha + jnp.sum(probs, axis=-1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            probs.astype(kn.dtype), kn, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kc == nk - 1)
    def _finish():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / l).reshape(cq, h, dn).astype(o_ref.dtype)
        # [rows, 128]-broadcast LSE (no cross-lane relayout)
        lse_ref[0] = m_ref[...] + jnp.log(l)


def _bwd_dq_kernel(qn_ref, qp_ref, do_ref, lse_ref, dl_ref, kn_ref, kp_ref,
                   dqn_ref, dqp_ref, dqn_acc, dqp_acc, *, sm_scale, ck, s_valid):
    qc, kc = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)
    cq, h, dn = qn_ref.shape[1], qn_ref.shape[2], qn_ref.shape[3]
    dr = qp_ref.shape[3]
    rows = cq * h

    @pl.when(kc == 0)
    def _init():
        dqn_acc[...] = jnp.zeros_like(dqn_acc)
        dqp_acc[...] = jnp.zeros_like(dqp_acc)

    tok = qc * cq + _row_tok(cq, h, rows)
    hi_kc = (qc * cq + cq - 1) // ck
    kcc = jnp.minimum(kc, hi_kc)

    @pl.when(kc <= hi_kc)
    def _step():
        qn = qn_ref[0].reshape(rows, dn)
        qp = qp_ref[0].reshape(rows, dr)
        do = do_ref[0].reshape(rows, dn)
        kn, kp = kn_ref[0], kp_ref[0]
        qk = _scores(qn, qp, kn, kp, sm_scale)
        kpos = kcc * ck + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        live = jnp.logical_and(kpos <= tok,
                               jnp.logical_and(kpos < s_valid, tok < s_valid))
        p = jnp.where(live, jnp.exp(qk - lse_ref[0, :, :1]), 0.0)
        dp = jax.lax.dot_general(do, kn, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - dl_ref[0, :, :1]) * sm_scale).astype(kn.dtype)
        dqn_acc[...] += jax.lax.dot_general(
            ds, kn, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dqp_acc[...] += jax.lax.dot_general(
            ds, kp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kc == nk - 1)
    def _finish():
        dqn_ref[0] = dqn_acc[...].reshape(cq, h, dn).astype(dqn_ref.dtype)
        dqp_ref[0] = dqp_acc[...].reshape(cq, h, dr).astype(dqp_ref.dtype)


def _bwd_dk_kernel(kn_ref, kp_ref, qn_ref, qp_ref, do_ref, lse_ref, dl_ref,
                   dkn_ref, dkp_ref, dkn_acc, dkp_acc,
                   *, sm_scale, cq, ck, nq, s_valid):
    kc, qrel = pl.program_id(1), pl.program_id(2)
    nqr = pl.num_programs(2)
    h, dn = qn_ref.shape[2], qn_ref.shape[3]
    dr = qp_ref.shape[3]
    rows = cq * h

    @pl.when(qrel == 0)
    def _init():
        dkn_acc[...] = jnp.zeros_like(dkn_acc)
        dkp_acc[...] = jnp.zeros_like(dkp_acc)

    lo_qc = (kc * ck) // cq                        # first causal q chunk
    qcc = jnp.minimum(lo_qc + qrel, nq - 1)        # must match the index maps

    @pl.when(lo_qc + qrel <= nq - 1)
    def _step():
        tok = qcc * cq + _row_tok(cq, h, rows)
        qn = qn_ref[0].reshape(rows, dn)
        qp = qp_ref[0].reshape(rows, dr)
        do = do_ref[0].reshape(rows, dn)
        kn, kp = kn_ref[0], kp_ref[0]
        qk = _scores(qn, qp, kn, kp, sm_scale)
        kpos = kc * ck + jax.lax.broadcasted_iota(jnp.int32, qk.shape, 1)
        live = jnp.logical_and(kpos <= tok,
                               jnp.logical_and(kpos < s_valid, tok < s_valid))
        p = jnp.where(live, jnp.exp(qk - lse_ref[0, :, :1]), 0.0)
        dp = jax.lax.dot_general(do, kn, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - dl_ref[0, :, :1]) * sm_scale).astype(kn.dtype)
        pb = p.astype(kn.dtype)
        # v aliases k_lat: dk_lat = dsᵀ·q_lat + pᵀ·do
        dkn_acc[...] += jax.lax.dot_general(
            ds, qn, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dkn_acc[...] += jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dkp_acc[...] += jax.lax.dot_general(
            ds, qp, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(qrel == nqr - 1)
    def _finish():
        dkn_ref[0] = dkn_acc[...].astype(dkn_ref.dtype)
        dkp_ref[0] = dkp_acc[...].astype(dkp_ref.dtype)


def _pad_s(x, sp, axis=1):
    pad = sp - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash(sm_scale, cq, ck, ckb, interpret, q_lat, q_pe, k_lat, k_pe):
    out, _ = _flash_fwd(sm_scale, cq, ck, ckb, interpret, q_lat, q_pe, k_lat, k_pe)
    return out


def _flash_fwd(sm_scale, cq, ck, ckb, interpret, q_lat, q_pe, k_lat, k_pe):
    b, s, h, dn = q_lat.shape
    dr = q_pe.shape[-1]
    sp = -(-s // ck) * ck
    assert ck % cq == 0, "q_chunk must divide k_chunk"
    nq, nk = sp // cq, sp // ck
    rows = cq * h
    qn = _pad_s(q_lat, sp)
    qp = _pad_s(q_pe, sp)
    kn = _pad_s(k_lat, sp)
    kp = _pad_s(k_pe, sp)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, ck=ck, s_valid=s),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, cq, h, dn), lambda b_, qc, kc: (b_, qc, 0, 0)),
            pl.BlockSpec((1, cq, h, dr), lambda b_, qc, kc: (b_, qc, 0, 0)),
            pl.BlockSpec((1, ck, dn),
                         lambda b_, qc, kc: (b_, jnp.minimum(kc, (qc * cq + cq - 1) // ck), 0)),
            pl.BlockSpec((1, ck, dr),
                         lambda b_, qc, kc: (b_, jnp.minimum(kc, (qc * cq + cq - 1) // ck), 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, cq, h, dn), lambda b_, qc, kc: (b_, qc, 0, 0)),
            pl.BlockSpec((1, rows, 128), lambda b_, qc, kc: (b_, qc, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sp, h, dn), q_lat.dtype),
            jax.ShapeDtypeStruct((b, nq * rows, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, dn), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
            pltpu.VMEM((rows, 128), jnp.float32),
        ],
        interpret=interpret,
    )(qn, qp, kn, kp)
    return out[:, :s], (q_lat, q_pe, k_lat, k_pe, out[:, :s], lse)


def _flash_bwd(sm_scale, cq, ck, ckb, interpret, res, g):
    # the backward runs its own (smaller) k-chunk: its kernels carry two
    # f32 accumulators plus the dO block, so the forward's wide k tiles
    # overflow VMEM when XLA also places small outputs there
    ck = ckb
    q_lat, q_pe, k_lat, k_pe, out, lse = res
    b, s, h, dn = q_lat.shape
    dr = q_pe.shape[-1]
    sp = -(-s // ck) * ck
    nq, nk = sp // cq, sp // ck
    rows = cq * h
    qn = _pad_s(q_lat, sp)
    qp = _pad_s(q_pe, sp)
    kn = _pad_s(k_lat, sp)
    kp = _pad_s(k_pe, sp)
    do = _pad_s(g.astype(q_lat.dtype), sp)
    # delta = rowsum(dO ∘ O), broadcast to the [rows, 128] stat layout
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = _pad_s(delta, sp).reshape(b, nq * rows)[..., None]
    delta = jnp.broadcast_to(delta, (b, nq * rows, 128))

    qspec = pl.BlockSpec((1, cq, h, dn), lambda b_, qc, kc: (b_, qc, 0, 0))
    qpspec = pl.BlockSpec((1, cq, h, dr), lambda b_, qc, kc: (b_, qc, 0, 0))
    statspec = pl.BlockSpec((1, rows, 128), lambda b_, qc, kc: (b_, qc, 0))
    kmap = lambda b_, qc, kc: (b_, jnp.minimum(kc, (qc * cq + cq - 1) // ck), 0)

    dqn, dqp = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, sm_scale=sm_scale, ck=ck, s_valid=s),
        grid=(b, nq, nk),
        in_specs=[qspec, qpspec, qspec, statspec, statspec,
                  pl.BlockSpec((1, ck, dn), kmap),
                  pl.BlockSpec((1, ck, dr), kmap)],
        out_specs=[qspec, qpspec],
        out_shape=[jax.ShapeDtypeStruct((b, sp, h, dn), jnp.float32),
                   jax.ShapeDtypeStruct((b, sp, h, dr), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((rows, dn), jnp.float32),
                        pltpu.VMEM((rows, dr), jnp.float32)],
        interpret=interpret,
    )(qn, qp, do, lse, delta, kn, kp)

    qmap = lambda b_, kc, qr: (
        b_, jnp.minimum((kc * ck) // cq + qr, nq - 1), 0, 0)
    smap = lambda b_, kc, qr: (b_, jnp.minimum((kc * ck) // cq + qr, nq - 1), 0)
    dkn, dkp = pl.pallas_call(
        functools.partial(_bwd_dk_kernel, sm_scale=sm_scale, cq=cq, ck=ck,
                          nq=nq, s_valid=s),
        grid=(b, nk, nq),
        in_specs=[
            pl.BlockSpec((1, ck, dn), lambda b_, kc, qr: (b_, kc, 0)),
            pl.BlockSpec((1, ck, dr), lambda b_, kc, qr: (b_, kc, 0)),
            pl.BlockSpec((1, cq, h, dn), qmap),
            pl.BlockSpec((1, cq, h, dr), qmap),
            pl.BlockSpec((1, cq, h, dn), qmap),
            pl.BlockSpec((1, rows, 128), smap),
            pl.BlockSpec((1, rows, 128), smap),
        ],
        out_specs=[pl.BlockSpec((1, ck, dn), lambda b_, kc, qr: (b_, kc, 0)),
                   pl.BlockSpec((1, ck, dr), lambda b_, kc, qr: (b_, kc, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, sp, dn), jnp.float32),
                   jax.ShapeDtypeStruct((b, sp, dr), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((ck, dn), jnp.float32),
                        pltpu.VMEM((ck, dr), jnp.float32)],
        interpret=interpret,
    )(kn, kp, qn, qp, do, lse, delta)

    return (dqn[:, :s].astype(q_lat.dtype), dqp[:, :s].astype(q_pe.dtype),
            dkn[:, :s].astype(k_lat.dtype), dkp[:, :s].astype(k_pe.dtype))


_flash.defvjp(_flash_fwd, _flash_bwd)


def mla_flash_train(q_lat, q_pe, k_lat, k_pe, sm_scale, *,
                    q_chunk: int = 64, k_chunk: int = 256,
                    bwd_k_chunk: int = 128, interpret=None):
    """Differentiable dense causal MLA flash attention.

    q_lat [B,S,H,L] ‖ q_pe [B,S,H,R] attend to k_lat [B,S,L] + k_pe [B,S,R]
    (V = k_lat); returns [B,S,H,L].  O(S) memory in both directions; the
    backward is two Pallas kernels (dQ over k-chunks, dK over q-chunks) with
    causal chunk pruning via clamped index maps.
    """
    if interpret is None:
        interpret = interpret_default()
    s = q_lat.shape[1]
    cq = min(q_chunk, max(8, s))
    ck = max(k_chunk, cq)
    ck = -(-ck // cq) * cq                     # cq | ck
    ckb = max(min(bwd_k_chunk, ck), cq)
    ckb = -(-ckb // cq) * cq
    if ck % ckb:
        ckb = cq          # cq | ck always holds, keeping bwd sp == fwd sp
    return _flash(sm_scale, cq, ck, ckb, interpret, q_lat, q_pe, k_lat, k_pe)
