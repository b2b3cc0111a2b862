"""Fused expert-parallel MoE: dispatch → GMM1 → SwiGLU → requant → GMM2 → combine.

Equivalent of the reference ``FusedDeepMoe`` single kernel (csrc/deepep/ops/op_kernel/
fused_deep_moe.h:60-120; Python entry buffer.py:852): INT8 dispatch, W8A8 grouped
GEMM1 with per-token dequant + SwiGLU + requant epilogue, W8A8 grouped GEMM2, BF16
combine.

The reference fuses everything into one device kernel with callback-driven
comm/compute overlap (CATLASS ``MmadAtlasA2PreloadAsyncWithCallback``).  On TPU the
equivalent overlap comes from XLA's async collective scheduling: the ``all_to_all``
launches are asynchronous and the Pallas GEMMs are independent per chunk, so the
compiler pipelines them.  The hot math (both GEMMs + SwiGLU + both quantizations)
runs inside two Pallas kernels at int8 MXU throughput.

Weight convention (per rank, inside shard_map):
    w1: [E_local, H, 2I] int8, gate/up column-block-packed (pack_gmm1_weights)
    w1_scale: [E_local, 2I] float32 per-channel (pack_gmm1_scales)
    w2: [E_local, I, H] int8
    w2_scale: [E_local, H] float32
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sgl_kernel_npu_tpu.ops.grouped_matmul import grouped_matmul, moe_pack_tn
from sgl_kernel_npu_tpu.ops.quant import INT8_MAX, saturate_int8
from sgl_kernel_npu_tpu.parallel import ep_core


def fused_deep_moe_rank(
    x: jax.Array,
    topk_idx: jax.Array,
    topk_weights: jax.Array,
    w1: jax.Array,
    w1_scale: jax.Array,
    w2: jax.Array,
    w2_scale: jax.Array,
    *,
    axis_name: str,
    num_experts: int,
    num_ranks: int,
    pair_capacity: int,
    seg_capacity: int,
    gmm_tiles: tuple[int, int, int] | None = None,
    pack_tn: int | None = None,
    chunks: int = 1,
    use_int8_dispatch: bool = True,
):
    """Per-rank fused MoE body (run inside shard_map).

    ``use_int8_dispatch=False`` moves the dispatch payload at the input dtype
    and quantizes per-token *after* arrival — the expert GEMMs are identical,
    only the wire precision differs (the BF16-dispatch baseline of the
    reference's "INT8 dispatch Δppl ≈ 0" accuracy bar, BASELINE.md).

    ``pack_tn`` MUST equal the ``tn`` used by :func:`quantize_expert_weights` /
    ``pack_gmm1_weights`` — the gate/up column-block layout is tied to it, so
    GMM1 always tiles N at ``pack_tn`` regardless of the auto-selector.

    ``chunks > 1`` splits the token batch into independent slices whose
    dispatch all_to_alls carry no data dependence on each other's GEMMs —
    XLA's latency-hiding scheduler then overlaps chunk ``c+1``'s collective
    with chunk ``c``'s GMM pipeline.  This is the TPU equivalent of the
    reference's callback-preload comm/compute overlap (CATLASS
    ``MmadAtlasA2PreloadAsyncWithCallback``, fused_deep_moe.h:60-120) without
    a monolithic kernel.  Capacities are divided per chunk, so extreme
    routing skew *between* chunks can drop tokens the unchunked path would
    keep — size capacities for the per-chunk worst case when using this.

    Returns ``(combined [T, H] bf16, recv_count [E_local], num_dropped [])``.
    """
    if chunks > 1:
        t = x.shape[0]
        if t % chunks:
            raise ValueError(f"token count {t} not divisible by chunks={chunks}")
        tc = t // chunks
        outs, counts, drops = [], [], []
        for c in range(chunks):
            sl = slice(c * tc, (c + 1) * tc)
            o, gs, nd = fused_deep_moe_rank(
                x[sl], topk_idx[sl], topk_weights[sl],
                w1, w1_scale, w2, w2_scale,
                axis_name=axis_name, num_experts=num_experts,
                num_ranks=num_ranks,
                pair_capacity=-(-pair_capacity // chunks),
                seg_capacity=-(-seg_capacity // chunks),
                gmm_tiles=gmm_tiles, pack_tn=pack_tn, chunks=1,
                use_int8_dispatch=use_int8_dispatch,
            )
            outs.append(o)
            counts.append(gs)
            drops.append(nd)
        return (jnp.concatenate(outs, axis=0),
                sum(counts[1:], counts[0]),
                sum(drops[1:], drops[0]))
    t, hidden = x.shape
    e_local = num_experts // num_ranks
    if gmm_tiles is None:
        from sgl_kernel_npu_tpu.ops.grouped_matmul import select_gmm_tiles

        tm, tk, _ = select_gmm_tiles(
            num_ranks * pair_capacity, hidden, w1.shape[-1], jnp.int8,
            num_groups=e_local, out_esize=4,
        )
    else:
        tm, tk, _ = gmm_tiles
    tn = moe_pack_tn(w1.shape[-1]) if pack_tn is None else min(pack_tn, w1.shape[-1])

    d = ep_core.dispatch_ragged_core(
        x,
        topk_idx,
        axis_name=axis_name,
        num_experts=num_experts,
        num_ranks=num_ranks,
        pair_capacity=pair_capacity,
        seg_capacity=seg_capacity,
        use_int8=use_int8_dispatch,
    )
    if use_int8_dispatch:
        xs = d["recv_x_sorted"]        # [cap, H] int8
        sx = d["recv_scales_sorted"]   # [cap]
    else:
        # BF16 wire: per-token quant after arrival (accuracy baseline path)
        xf = d["recv_x_sorted"].astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1) / INT8_MAX, 1e-12)
        xs = saturate_int8(xf / sx[:, None])
    gs = d["group_sizes"]              # [E_local]

    if tn == w1.shape[-1]:
        # single fused GMM1 + dequant + SwiGLU + per-token re-quant (the
        # reference's GmmDeqSwigluQuant, fused_deep_moe.h:60-120): int8
        # activations leave the kernel directly — no f32 round trip
        q2, s2 = grouped_matmul(
            xs, w1, gs, sx, w1_scale,
            epilogue="dequant_swiglu_quant", tm=tm, tk=tk,
        )
    else:
        h1 = grouped_matmul(
            xs, w1, gs, sx, w1_scale,
            epilogue="dequant_swiglu", tm=tm, tk=tk, tn=tn, out_dtype=jnp.float32,
        )  # [cap, I]
        # per-token dynamic requant as a separate pass (wide-N fallback)
        s2 = jnp.maximum(jnp.max(jnp.abs(h1), axis=-1) / INT8_MAX, 1e-12)
        q2 = saturate_int8(h1 / s2[:, None])

    y = grouped_matmul(
        q2, w2, gs, s2, w2_scale,
        epilogue="dequant", tm=tm, tk=tk, tn=None, out_dtype=jnp.bfloat16,
    )  # [cap, H]  (GMM2's N tiling is free — auto-select)

    combined = ep_core.combine_ragged_core(
        y,
        topk_weights,
        d["handle"],
        axis_name=axis_name,
        num_ranks=num_ranks,
        num_local_experts=e_local,
        seg_capacity=seg_capacity,
        out_dtype=jnp.bfloat16,
    )
    return combined, gs, d["num_dropped"]


def fused_oai_moe_rank(
    x: jax.Array,
    topk_idx: jax.Array,
    topk_weights: jax.Array,
    w_gate_up: jax.Array,   # [E_local, H, 2I] interleaved gate|up
    b_gate_up: jax.Array,   # [E_local, 2I]
    w_down: jax.Array,      # [E_local, I, H]
    b_down: jax.Array,      # [E_local, H]
    *,
    axis_name: str,
    num_experts: int,
    num_ranks: int,
    pair_capacity: int,
    seg_capacity: int,
    alpha: float = 1.702,
    limit: float = 7.0,
):
    """Per-rank GPT-OSS MoE body (run inside shard_map): bf16 ragged dispatch
    → grouped GEMM(gate|up) + per-expert bias → clamped interleaved SwiGLU
    (ops.activation.swiglu_oai semantics) → grouped GEMM(down) + bias →
    ragged combine.  GEMMs ride the bf16 Pallas grouped kernel (gmm_train
    forward).  Returns ``(combined [T, H], group_sizes [E_local], dropped)``.
    """
    from sgl_kernel_npu_tpu.ops.activation import swiglu_oai_ref
    from sgl_kernel_npu_tpu.ops.grouped_matmul import gmm_train

    d = ep_core.dispatch_ragged_core(
        x, topk_idx,
        axis_name=axis_name, num_experts=num_experts, num_ranks=num_ranks,
        pair_capacity=pair_capacity, seg_capacity=seg_capacity,
        use_int8=False,
    )
    xin = d["recv_x_sorted"]            # [cap, H]
    gs = d["group_sizes"]               # [E_local]
    row_e = jnp.clip(
        jnp.searchsorted(jnp.cumsum(gs), jnp.arange(xin.shape[0]),
                         side="right"),
        0, gs.shape[0] - 1)             # expert id per sorted row
    gu = gmm_train(xin, w_gate_up, gs) + b_gate_up[row_e]
    act = swiglu_oai_ref(gu, alpha, limit).astype(xin.dtype)
    y = gmm_train(act, w_down, gs) + b_down[row_e]
    combined = ep_core.combine_ragged_core(
        y.astype(xin.dtype), topk_weights, d["handle"],
        axis_name=axis_name, num_ranks=num_ranks,
        num_local_experts=num_experts // num_ranks,
        seg_capacity=seg_capacity, out_dtype=x.dtype,
    )
    return combined, gs, d["num_dropped"]


def quantize_expert_weights(w_gate, w_up, w_down, tn: int | None = None):
    """Quantize fp expert weights to the fused-MoE W8A8 layout.

    Args: ``w_gate``/``w_up``: [E, H, I]; ``w_down``: [E, I, H] (float).
    Returns ``(w1 int8 [E, H, 2I], w1_scale [E, 2I], w2 int8 [E, I, H],
    w2_scale [E, H])``.
    """
    from sgl_kernel_npu_tpu.ops.grouped_matmul import pack_gmm1_scales, pack_gmm1_weights

    if tn is None:
        tn = moe_pack_tn(2 * w_gate.shape[-1])

    def chan_quant(w):  # per-output-channel symmetric
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / INT8_MAX, 1e-12)  # [E, N]
        q = saturate_int8(w / s[:, None, :])
        return q, s

    qg, sg = chan_quant(w_gate.astype(jnp.float32))
    qu, su = chan_quant(w_up.astype(jnp.float32))
    qd, sd = chan_quant(w_down.astype(jnp.float32))
    w1 = pack_gmm1_weights(qg, qu, tn)
    s1 = pack_gmm1_scales(sg, su, tn)
    return w1, s1, qd, sd
