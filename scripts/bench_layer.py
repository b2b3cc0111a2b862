"""Full DeepSeek-V3 decode LAYER step on one chip — the flagship composite.

Per-rank production shapes (DeepSeek-V3 at TP8×EP32-equivalent slice): batch
128 decode tokens, hidden 7168, 16 local q-heads (128/TP8), latent 512 + rope
64, seq 1024 paged KV, 8 local experts (256/EP32), top-8 routing, W8A8 MoE
(GMM1 fused dequant+SwiGLU+requant → GMM2 dequant), MLA preprocess prologue.

One jitted function = one decode layer; comm excluded (one chip — the EP
all-to-all cost is measured separately, PERF.md §window a2a).  Scan-marginal
timing (bench.py method).

All big arrays are generated ON DEVICE (jax.random) — host-generated numpy
would push ~560 MB through the axon tunnel at ~1 MB/s.
"""

import pathlib
import statistics
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_scanned
from sgl_kernel_npu_tpu.ops import grouped_matmul as gm
from sgl_kernel_npu_tpu.ops.attention import mla_preprocess as mp
from sgl_kernel_npu_tpu.ops.attention.decode_attention import decode_mla
from sgl_kernel_npu_tpu.ops.rope import rope_cos_sin


def main():
    # full | noattn | nomoe | nogmm | oldglue | fusedmoe | int8kv
    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    t0 = time.time()
    b, hidden, heads = 128, 7168, 16
    lat, rope = 512, 64
    e_local, topk, inter = 8, 8, 2048
    seq, page = 1024, 128
    max_pages = seq // page
    n_pages = b * max_pages + 1

    # fusedmoe: tiles from the traffic-model selector — tn1 is layout-coupled
    # to the gate/up pack width, so it must be chosen before weights are packed
    if mode == "fusedmoe":
        from sgl_kernel_npu_tpu.parallel import fused_full

        ftiles = fused_full.select_full_tiles(
            t=b, k=topk, h=hidden, i=inter, e_local=e_local,
            num_ranks=1, seg=b)
        print(f"fused_full tiles: {ftiles}", flush=True)
    else:
        ftiles = None

    keys = iter(list(jax.random.split(jax.random.key(0), 40)))

    @jax.jit
    def make_all():
        ki = lambda *s: jax.random.randint(next(keys), s, -100, 100, jnp.int8)
        kf = lambda *s, sc=0.05: jax.random.normal(next(keys), s, jnp.float32) * sc

        w = mp.MlaPreprocessWeights(
            gamma1=kf(hidden) + 1, beta1=kf(hidden), qscale1=jnp.float32(0.01),
            qoffset1=jnp.float32(0), wdqkv=ki(lat + rope + 1536, hidden),
            descale1=kf(lat + rope + 1536) / 50,
            bias1=jnp.zeros((lat + rope + 1536,), jnp.int32),
            gamma2=kf(1536) + 1, beta2=kf(1536), qscale2=jnp.float32(0.01),
            qoffset2=jnp.float32(0), wuq=ki(heads * 192, 1536),
            descale2=kf(heads * 192) / 50, bias2=jnp.zeros((heads * 192,), jnp.int32),
            gamma3=kf(lat) + 1,
            wuk=jax.random.normal(next(keys), (heads, 128, lat), jnp.bfloat16) * 0.05,
            # int8_nzcache calibration (used only in --int8kv mode)
            qnope_scale=jnp.full((heads,), 100.0, jnp.float32),
            ctkv_scale=jnp.float32(0.02),
        )
        kv_nope = jax.random.normal(next(keys), (n_pages, 1, page, lat), jnp.bfloat16) * 0.5
        if mode == "int8kv":
            # int8 latent cache: half the attention KV traffic (decode_mla int8)
            kv_nope = jnp.clip(jnp.round(kv_nope.astype(jnp.float32) / 0.02),
                               -128, 127).astype(jnp.int8)
        kv_rope = jax.random.normal(next(keys), (n_pages, 1, rope, page), jnp.bfloat16) * 0.5

        # MoE weights (per-rank slice): GMM1 K=hidden → 2*inter, GMM2 K=inter → hidden
        wg = kf(e_local, hidden, inter, sc=0.02)
        wu = kf(e_local, hidden, inter, sc=0.02)
        sg = jnp.abs(wg).max(axis=1) / 127.0
        su = jnp.abs(wu).max(axis=1) / 127.0
        wgq = jnp.clip(jnp.round(wg / sg[:, None, :]), -128, 127).astype(jnp.int8)
        wuq = jnp.clip(jnp.round(wu / su[:, None, :]), -128, 127).astype(jnp.int8)
        n_full = 2 * inter
        pack_w = ftiles["tn1"] if ftiles else n_full
        w1 = gm.pack_gmm1_weights(wgq, wuq, pack_w)
        s1 = gm.pack_gmm1_scales(sg, su, pack_w)
        w2 = ki(e_local, inter, hidden)
        s2 = kf(e_local, hidden, sc=0.0005)
        router = kf(hidden, e_local, sc=0.02)
        wo = jax.random.normal(next(keys), (heads * 128, hidden), jnp.bfloat16) * 0.01
        wvu = jax.random.normal(next(keys), (heads, lat, 128), jnp.bfloat16) * 0.04
        return (mp.pad_weights_lane_aligned(w), kv_nope, kv_rope,
                w1, s1, w2, s2, router, wo, wvu)

    operands = make_all()
    jax.block_until_ready(operands)
    w = operands[0]
    print(f"[{time.time()-t0:6.1f}s] weights generated on device", flush=True)

    rng = np.random.default_rng(0)
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1, jnp.int32)
    seq_lens = jnp.full((b,), seq, jnp.int32)
    slots = jnp.asarray((np.asarray(bt)[:, -1]) * page + 5, jnp.int32)
    pos = jnp.asarray(rng.integers(0, seq, b), jnp.int32)
    cos_sin = rope_cos_sin(pos, rope)
    rows = b * topk

    # all big arrays ride as jit operands: closure captures embed as MLIR
    # constants and the remote-compile endpoint rejects them above ~100 MB
    def layer(h_in, w, kvn, kvr, w1, s1, w2, s2, router, wo, wvu):
        if mode == "noattn":
            x = h_in.astype(jnp.float32)
        else:
            # 1. fused MLA prologue (writes paged cache, makes absorbed q)
            q_nope, q_pe, kvn, kvr = mp.mla_preprocess(
                h_in, w, cos_sin, kvn, kvr, slots,
                cache_mode="int8_nzcache" if mode == "int8kv" else "krope_ctkv")
            if mode == "int8kv":
                # per-head q dequant ([B,H,512], tiny) then the int8 kernel
                q_nope = q_nope.astype(jnp.float32) / w.qnope_scale[None, :, None]
            q = jnp.concatenate(
                [q_nope.astype(jnp.bfloat16), q_pe.astype(jnp.bfloat16)], -1)
            # 2. paged MLA decode attention (flat DMA pipeline)
            attn = decode_mla(q, kvn, kvr, seq_lens, 0.042, bt,
                              k_scale=w.ctkv_scale if mode == "int8kv" else None)
            # 3. V up-proj + output proj
            o = jnp.einsum("nhl,hlv->nhv", attn.astype(jnp.float32),
                           wvu.astype(jnp.float32))
            x = h_in.astype(jnp.float32) + o.reshape(b, -1) @ wo.astype(jnp.float32)
        if mode == "nomoe":
            return x.astype(h_in.dtype), kvn, kvr
        if mode == "fusedmoe":
            # MoE half through the FULL single-kernel fused MoE (fused_full):
            # per-token quant, routing placement, both GEMMs, SwiGLU and the
            # weighted combine all run inside ONE pallas_call — the only
            # glue left outside is the router matmul + top_k
            from jax.sharding import Mesh, PartitionSpec as P

            from sgl_kernel_npu_tpu.parallel import fused_full

            logits = x @ router
            topw, topi = jax.lax.top_k(logits, topk)
            topw = jax.nn.softmax(topw, axis=-1)
            mesh1 = Mesh(np.array(jax.devices()[:1]), ("ep",))
            out = jax.shard_map(
                lambda xs, ids, ws: fused_full.fused_deep_moe_full_rank(
                    xs.astype(jnp.bfloat16), ids, ws,
                    w1, s1, w2, s2,
                    axis_name="ep", num_experts=e_local, num_ranks=1,
                    seg_capacity=b, **ftiles)[0],
                mesh=mesh1, in_specs=(P(), P(), P()), out_specs=P(),
                check_vma=False,
            )(x, topi, topw)
            return (x + out.astype(jnp.float32)).astype(h_in.dtype), kvn, kvr
        # 4. quantize per TOKEN (b rows) in XLA: it fuses into the wo-proj +
        # residual pass for FREE (r5 trace: moving it in-kernel re-read x at
        # full width and lost ~5 us on the composite)
        sx_tok = jnp.maximum(jnp.abs(x).max(-1) / 127.0, 1e-12)
        xq_tok = jnp.clip(jnp.round(x / sx_tok[:, None]), -128, 127).astype(jnp.int8)
        logits = x @ router
        topw, topi = jax.lax.top_k(logits, topk)
        topw = jax.nn.softmax(topw, axis=-1)
        flat_e = topi.reshape(-1)
        # counting sort instead of argsort: with E_local=8 distinct keys a
        # one-hot cumsum ranks every row in O(rows·E) vector ops — TPU sorts
        # are ~50-stage bitonic networks and dominate the MoE glue otherwise
        oh = (flat_e[:, None] == jnp.arange(e_local)[None, :]).astype(jnp.int32)
        gsizes = oh.sum(0)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(gsizes)[:-1]])
        pos_in_e = jnp.take_along_axis(
            jnp.cumsum(oh, 0) - 1, flat_e[:, None], 1)[:, 0]
        dest = offsets[flat_e] + pos_in_e             # pair row → sorted slot
        src = jnp.zeros((rows,), jnp.int32).at[dest].set(
            jnp.arange(rows, dtype=jnp.int32))       # sorted slot → pair row
        tok_of_row = src // topk
        # combine weights as a masked MATMUL: top-k weights scattered into
        # [b, rows] at the sorted slots, hi+lo bf16 split for f32-accurate
        # weighting at bf16 MXU rate
        mask = jnp.zeros((b, rows), jnp.float32).at[
            jnp.arange(b, dtype=jnp.int32)[:, None], dest.reshape(b, topk)
        ].add(topw)
        m_hi = mask.astype(jnp.bfloat16)
        m_lo = (mask - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if mode == "nogmm":                           # glue-only ablation
            xq = xq_tok[tok_of_row]
            sx = sx_tok[tok_of_row]
            y = (xq.astype(jnp.float32) * sx[:, None]).astype(jnp.bfloat16)
            out = jax.lax.dot(m_hi, y, preferred_element_type=jnp.float32)
            out += jax.lax.dot(m_lo, y, preferred_element_type=jnp.float32)
        elif mode == "oldglue":
            # r1 path: XLA row gather into GMM1, separate GMM2, y streamed
            # twice through the combine matmuls
            xq = xq_tok[tok_of_row]                   # int8 gather [rows, H]
            sx = sx_tok[tok_of_row]
            h1, hs = gm.grouped_matmul(
                xq, w1, gsizes, sx, s1, epilogue="dequant_swiglu_quant")
            y = gm.grouped_matmul(
                h1, w2, gsizes, hs, s2, epilogue="dequant", out_dtype=jnp.bfloat16)
            out = jax.lax.dot(m_hi, y, preferred_element_type=jnp.float32)
            out += jax.lax.dot(m_lo, y, preferred_element_type=jnp.float32)
        else:
            # r5 path (models/deepseek_v3._gmm_moe): ring-streamed flat
            # kernels (ops/gmm_ring.py, ~755 GB/s weight stream); ALL routing
            # glue in-kernel (one-hot dispatch + scale gather from tok_of_row,
            # combine mask from dest/topw), residual folded as GMM2's
            # accumulator init — the layer output IS the kernel output
            from sgl_kernel_npu_tpu.ops import gmm_ring

            h1, hs = gmm_ring.gmm1_ring(xq_tok, tok_of_row, w1, gsizes,
                                        sx_tok, s1)
            out16 = gmm_ring.gmm2_combine_ring(
                h1, w2, gsizes, hs, s2, dest.reshape(b, topk), topw,
                init=x, out_dtype=h_in.dtype)
            return out16, kvn, kvr
        return (x + out).astype(h_in.dtype), kvn, kvr

    h0 = jax.random.normal(jax.random.key(9), (b, hidden), jnp.bfloat16) * 0.5
    # KV caches donated (a serving engine updates its cache in place); the
    # returned caches thread into the next call so no 150 MB copy appears
    jl = jax.jit(layer, donate_argnums=(2, 3))
    kvn0, kvr0 = operands[1], operands[2]
    rest = operands[:1] + operands[3:]
    state = {"kv": (kvn0, kvr0)}

    def stepfn():
        o, kn, kr = jl(h0, rest[0], state["kv"][0], state["kv"][1], *rest[1:])
        state["kv"] = (kn, kr)
        jax.block_until_ready(o)

    stepfn()
    print(f"[{time.time()-t0:6.1f}s] single-layer compile+run done", flush=True)

    # trace-based timing (round 5): the xplane trace carries exact device-side
    # durations per op — the scan-marginal wall-clock method this replaced had
    # error bars wider than the effects being measured (see trace_profile.py)
    from sgl_kernel_npu_tpu.utils import trace_profile as tp
    from jax.profiler import ProfileData

    for _ in range(5):
        stepfn()
    path = tp.capture(stepfn, iters=12)
    pd = ProfileData.from_file(path)
    mod_durs = []
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    mod_durs.append(ev.duration_ns / 1e3)
    mod_durs.sort()
    t = statistics.median(mod_durs) * 1e-6 if mod_durs else 1e-9
    iqr = (mod_durs[(3 * len(mod_durs)) // 4] - mod_durs[len(mod_durs) // 4]
           if len(mod_durs) >= 4 else 0.0)
    print(f"[{time.time()-t0:6.1f}s] trace timing done "
          f"(n={len(mod_durs)}, IQR {iqr:.1f} us)", flush=True)
    print("per-op device breakdown:")
    rows_tbl = tp.op_times(path)
    print(tp.format_table(rows_tbl, top=40)); print("SUM all ops:", round(sum(r.total_us for r in rows_tbl)/12, 1), "us/step")
    if "--hlo" in sys.argv:
        for r in rows_tbl[:18]:
            print(f"  {r.name}: {r.hlo}")
    # weight-read floor: all weights once + KV read
    w1_, w2_, wo_, wvu_ = operands[3], operands[5], operands[8], operands[9]
    wbytes = (w.wdqkv.size + w.wuq.size + w1_.size + w2_.size
              + w.wuk.size * 2 + wo_.size * 2 + wvu_.size * 2)
    kv_bytes = b * seq * ((lat if mode == "int8kv" else lat * 2) + rope * 2)
    floor = (wbytes + kv_bytes) / 819e9
    print(f"DeepSeek-V3 decode layer, B={b}: {t*1e6:8.1f} us "
          f"({b/t/1e3:.0f} ktok/s/chip/layer)")
    print(f"weight+KV read floor: {floor*1e6:8.1f} us  -> {floor/t*100:.1f}% of floor-speed")


if __name__ == "__main__":
    main()
