"""Compile + numerics smoke test of every Pallas kernel on real TPU hardware.

Run on a chip (bench runs this environment); CPU tests cover the same ops in
interpret mode, but Mosaic lowering has extra constraints worth checking for real.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
import jax.numpy as jnp


def check(name, got, want, tol=3e-2):
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    rel = np.abs(g - w).mean() / (np.abs(w).mean() + 1e-9)
    status = "OK " if rel < tol else "FAIL"
    print(f"{status} {name}: rel={rel:.2e}")
    return rel < tol


def main():
    rng = np.random.default_rng(0)
    ok = True

    from sgl_kernel_npu_tpu.ops import activation, norm, quant
    from sgl_kernel_npu_tpu.ops import grouped_matmul as gm
    from sgl_kernel_npu_tpu.ops import matmul as mm

    x = jnp.asarray(rng.standard_normal((256, 1024)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(1024), jnp.bfloat16)
    ok &= check("rms_norm", norm.rms_norm(x, w), norm.rms_norm_ref(x, w))

    res = jnp.asarray(rng.standard_normal((256, 1024)), jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal(1024) * 0.1, jnp.bfloat16)
    got = norm.add_rms_norm_bias(x, res, w, b, 1e-6)
    want = norm.add_rms_norm_bias_ref(x, res, w, b, 1e-6)
    ok &= check("add_rms_norm_bias", got[0], want[0])

    q, s = quant.quant_per_token(x)
    qr, sr = quant.quant_per_token_ref(x)
    ok &= check("quant_per_token", q.astype(jnp.float32) * s[:, None],
                qr.astype(jnp.float32) * sr[:, None])

    out, sc = activation.swiglu_quant(x, None, 1, True)
    out_r, sc_r = activation.swiglu_quant_ref(x, None, 1, True)
    ok &= check("swiglu_quant", out.astype(jnp.float32) * sc[:, None],
                out_r.astype(jnp.float32) * sc_r[:, None])

    xq = jnp.asarray(rng.integers(-64, 64, (128, 512)), jnp.int8)
    wq = jnp.asarray(rng.integers(-64, 64, (256, 512)), jnp.int8)
    ds = jnp.asarray(rng.random(256) / 100, jnp.float32)
    ok &= check("quant_matmul", mm.quant_matmul(xq, wq, ds, out_dtype=jnp.float32),
                mm.quant_matmul_ref(xq, wq, ds, out_dtype=jnp.float32), 1e-4)

    sizes = jnp.asarray([100, 28, 60, 68], jnp.int32)
    xg = jnp.asarray(rng.standard_normal((256, 512)), jnp.float32)
    wg = jnp.asarray(rng.standard_normal((4, 512, 256)) * 0.05, jnp.float32)
    ok &= check("grouped_matmul", gm.grouped_matmul(xg, wg, sizes),
                gm.grouped_matmul_ref(xg, wg, sizes), 1e-3)

    sxq, ssx = quant.quant_per_token_ref(xg)
    sw = jnp.asarray(np.abs(np.asarray(wg)).max(1) / 127.0, jnp.float32)
    wgq = jnp.clip(jnp.round(wg / sw[:, None, :]), -128, 127).astype(jnp.int8)
    ok &= check("gmm_dequant",
                gm.grouped_matmul(sxq, wgq, sizes, ssx, sw, epilogue="dequant",
                                  out_dtype=jnp.float32),
                gm.gmm_dequant_ref(sxq, wgq, sizes, ssx, sw), 1e-3)

    # in-kernel one-hot dispatch (P @ x on the MXU) == gathered rows
    n_tok = 64
    xq_tok = jnp.asarray(rng.integers(-128, 128, (n_tok, 512)), jnp.int8)
    tok_of_row = jnp.asarray(rng.integers(0, n_tok, 256), jnp.int32)
    p_mat = gm.dispatch_onehot(tok_of_row, n_tok)
    ok &= check("gmm_dispatch_p",
                gm.grouped_matmul(xq_tok, wgq, sizes, ssx, sw,
                                  epilogue="dequant", dispatch_p=p_mat,
                                  out_dtype=jnp.float32),
                gm.grouped_matmul(xq_tok[tok_of_row], wgq, sizes, ssx, sw,
                                  epilogue="dequant", out_dtype=jnp.float32),
                1e-6)

    # combine-fused GMM2: weighted top-k combine as the kernel epilogue
    mask_np = np.zeros((n_tok, 256), np.float32)
    total_rows = int(np.asarray(sizes).sum())
    for tt in range(n_tok):
        mask_np[tt, rng.choice(total_rows, 4, replace=False)] = rng.random(4)
    m_hi = jnp.asarray(mask_np, jnp.bfloat16)
    m_lo = jnp.asarray(mask_np - np.asarray(m_hi, np.float32), jnp.bfloat16)
    y_bf = gm.grouped_matmul(sxq, wgq, sizes, ssx, sw, epilogue="dequant",
                             out_dtype=jnp.bfloat16)
    ok &= check("gmm_combine_fused",
                gm.grouped_matmul_combine(sxq, wgq, sizes, ssx, sw, m_hi, m_lo),
                m_hi.astype(jnp.float32) @ y_bf.astype(jnp.float32)
                + m_lo.astype(jnp.float32) @ y_bf.astype(jnp.float32), 1e-2)

    from sgl_kernel_npu_tpu.ops.attention import decode_attention as da
    bsz, hq, hkv, dk, dv, page, mp = 4, 8, 2, 128, 128, 128, 2
    npg = bsz * mp
    qa = jnp.asarray(rng.standard_normal((bsz, hq, dk)) * 0.5, jnp.bfloat16)
    ka = jnp.asarray(rng.standard_normal((npg, hkv, page, dk)) * 0.5, jnp.bfloat16)
    va = jnp.asarray(rng.standard_normal((npg, hkv, page, dv)) * 0.5, jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(npg).reshape(bsz, mp), jnp.int32)
    sl = jnp.asarray([17, 100, 256, 5], jnp.int32)
    ok &= check("decode_gqa", da.decode_gqa(qa, ka, va, sl, 0.088, bt),
                da.decode_gqa_ref(qa, ka, va, sl, 0.088, bt))
    ok &= check("decode_gqa_hp", da.decode_gqa_high_performance(qa, ka, va, sl, 0.088, bt),
                da.decode_gqa_ref(qa, ka, va, sl, 0.088, bt))
    # int8 K/V cache (per-kv-head scales; kernel converts tiles, host folds scale)
    ksg = jnp.abs(ka.astype(jnp.float32)).max(axis=(0, 2, 3)) / 127.0
    vsg = jnp.abs(va.astype(jnp.float32)).max(axis=(0, 2, 3)) / 127.0
    kaq = jnp.clip(jnp.round(ka.astype(jnp.float32) / ksg[None, :, None, None]),
                   -128, 127).astype(jnp.int8)
    vaq = jnp.clip(jnp.round(va.astype(jnp.float32) / vsg[None, :, None, None]),
                   -128, 127).astype(jnp.int8)
    ok &= check("decode_gqa_int8",
                da.decode_gqa(qa, kaq, vaq, sl, 0.088, bt, k_scale=ksg, v_scale=vsg),
                da.decode_gqa_ref(qa, kaq, vaq, sl, 0.088, bt, k_scale=ksg, v_scale=vsg))
    ok &= check("decode_gqa_hp_int8",
                da.decode_gqa_high_performance(
                    qa, kaq, vaq, sl, 0.088, bt, k_scale=ksg, v_scale=vsg),
                da.decode_gqa_ref(qa, kaq, vaq, sl, 0.088, bt, k_scale=ksg, v_scale=vsg))

    from sgl_kernel_npu_tpu.ops.attention import sinks_attention as sa
    qs_ = jnp.asarray(rng.standard_normal((4, hq * dk)) * 0.5, jnp.float32)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32)
    ok &= check("attention_sinks",
                sa.attention_sinks(qs_, ka.astype(jnp.float32), va.astype(jnp.float32),
                                   sinks, bt, sl, 0.088, 64, hq, hkv),
                sa.attention_sinks_ref(qs_, ka.astype(jnp.float32), va.astype(jnp.float32),
                                       sinks, bt, sl, 0.088, 64, hq, hkv))

    sq = jnp.asarray([2, 100, 30, 1], jnp.int32)   # varlen new tokens per request
    qp = jnp.asarray(rng.standard_normal((int(sq.sum()), hq * dk)) * 0.5, jnp.float32)
    ok &= check("attention_sinks_prefill",
                sa.attention_sinks_prefill_pallas(
                    qp, ka.astype(jnp.float32), va.astype(jnp.float32),
                    sinks, sq, bt, sl, 0.088, 64, hq, hkv, max_q=128),
                sa.attention_sinks_prefill(
                    qp, ka.astype(jnp.float32), va.astype(jnp.float32),
                    sinks, sq, bt, sl, 0.088, 64, hq, hkv))

    ok &= check("prefill_no_sinks",
                sa.attention_sinks_prefill_pallas(
                    qp, ka.astype(jnp.float32), va.astype(jnp.float32),
                    None, sq, bt, sl, 0.088, 0, hq, hkv, max_q=128),
                sa.attention_sinks_prefill(
                    qp, ka.astype(jnp.float32), va.astype(jnp.float32),
                    None, sq, bt, sl, 0.088, 0, hq, hkv))
    # int8 K/V through the sinks family (decode + packed decode + prefill)
    ok &= check("sinks_int8",
                sa.attention_sinks(qs_, kaq, vaq, sinks, bt, sl, 0.088, 64,
                                   hq, hkv, k_scale=ksg, v_scale=vsg),
                sa.attention_sinks_ref(qs_, kaq, vaq, sinks, bt, sl, 0.088, 64,
                                       hq, hkv, k_scale=ksg, v_scale=vsg))
    ok &= check("sinks_packed_int8",
                sa.attention_sinks_packed(
                    qs_, sa.pack_kv_sinks(kaq), sa.pack_kv_sinks(vaq), sinks,
                    bt, sl, 0.088, 64, hq, hkv, k_scale=ksg, v_scale=vsg),
                sa.attention_sinks_ref(qs_, kaq, vaq, sinks, bt, sl, 0.088, 64,
                                       hq, hkv, k_scale=ksg, v_scale=vsg))
    ok &= check("sinks_prefill_int8",
                sa.attention_sinks_prefill_pallas(
                    qp, kaq, vaq, sinks, sq, bt, sl, 0.088, 64, hq, hkv,
                    k_scale=ksg, v_scale=vsg, max_q=128),
                sa.attention_sinks_prefill(
                    qp, kaq, vaq, sinks, sq, bt, sl, 0.088, 64, hq, hkv,
                    k_scale=ksg, v_scale=vsg))

    # --- MLA decode (the bench kernel, 512+64 latent layout) ---
    dn, dr = 512, 64
    npg2 = bsz * mp + 1
    qm = jnp.asarray(rng.standard_normal((bsz, hq, dn + dr)) * 0.5, jnp.bfloat16)
    knm = jnp.asarray(rng.standard_normal((npg2, 1, page, dn)) * 0.5, jnp.bfloat16)
    krm = jnp.asarray(rng.standard_normal((npg2, 1, dr, page)) * 0.5, jnp.bfloat16)
    btm = jnp.asarray(rng.permutation(npg2 - 1)[: bsz * mp].reshape(bsz, mp) + 1, jnp.int32)
    slm = jnp.asarray([17, 200, 256, 1], jnp.int32)
    ok &= check("decode_mla", da.decode_mla(qm, knm, krm, slm, 0.042, btm),
                da.decode_mla_ref(qm, knm, krm, slm, 0.042, btm))
    # int8 latent cache (int8_nzcache consumer: half the KV HBM traffic)
    ksm = jnp.float32(float(jnp.abs(knm.astype(jnp.float32)).max()) / 127.0)
    knq = jnp.clip(jnp.round(knm.astype(jnp.float32) / ksm), -128, 127).astype(jnp.int8)
    ok &= check("decode_mla_int8",
                da.decode_mla(qm, knq, krm, slm, 0.042, btm, k_scale=ksm),
                da.decode_mla_ref(qm, knq, krm, slm, 0.042, btm, k_scale=ksm))

    from sgl_kernel_npu_tpu.ops.attention import mla_prefill as mpre
    sqm = jnp.asarray([2, 100, 30, 1], jnp.int32)
    qpre = jnp.asarray(
        rng.standard_normal((int(sqm.sum()), hq, dn + dr)) * 0.5, jnp.bfloat16)
    ok &= check("mla_prefill",
                mpre.mla_prefill_pallas(qpre, knm, krm, sqm, btm, slm, 0.042,
                                        max_q=128),
                mpre.mla_prefill_ref(qpre, knm, krm, sqm, btm, slm, 0.042))
    ok &= check("mla_prefill_int8",
                mpre.mla_prefill_pallas(qpre, knq, krm, sqm, btm, slm, 0.042,
                                        max_q=128, k_scale=ksm),
                mpre.mla_prefill_ref(qpre, knq, krm, sqm, btm, slm, 0.042,
                                     k_scale=ksm))
    # DSA pruned prefill with ALL causal pages selected == the dense kernel
    n_pg_smoke = btm.shape[1]
    cq_smoke = 64
    qc_n = 128 // cq_smoke
    pos_all = jnp.tile(
        jnp.arange(n_pg_smoke, dtype=jnp.int32)[None, None],
        (sqm.shape[0], qc_n, 1))
    ok &= check("mla_prefill_block_sparse",
                mpre.mla_prefill_block_sparse(
                    qpre, knm, krm, sqm, btm, slm, 0.042, pos_all,
                    max_q=128, q_chunk=cq_smoke),
                mpre.mla_prefill_ref(qpre, knm, krm, sqm, btm, slm, 0.042))

    # --- remaining Pallas norm/activation kernels ---
    ok &= check("add_gemma_rms_norm",
                norm.add_gemma_rms_norm(x, w, res)[0],
                norm.add_gemma_rms_norm_ref(x, w, res, 1e-6)[0])
    xf32 = x.astype(jnp.float32)
    ok &= check("l1_norm", norm.l1_norm(xf32), norm.l1_norm_ref(xf32), 1e-4)
    gu = jnp.asarray(rng.standard_normal((128, 512)), jnp.float32)
    ok &= check("swiglu_oai", activation.swiglu_oai(gu),
                activation.swiglu_oai_ref(gu), 1e-3)

    # --- grouped matmul with the fused dequant+SwiGLU epilogue (fused-MoE GMM1) ---
    gct, kd, inter, tn = 4, 128, 256, 256  # tn=256: hardware-legal swiglu tile
    wg = jnp.asarray(rng.standard_normal((gct, kd, inter)) * 0.05, jnp.float32)
    wu = jnp.asarray(rng.standard_normal((gct, kd, inter)) * 0.05, jnp.float32)
    xg2 = jnp.asarray(rng.standard_normal((128, kd)), jnp.float32)
    xq2, sx2 = quant.quant_per_token_ref(xg2)
    sg2 = jnp.abs(wg).max(axis=1) / 127.0
    su2 = jnp.abs(wu).max(axis=1) / 127.0
    wgq = jnp.clip(jnp.round(wg / sg2[:, None, :]), -128, 127).astype(jnp.int8)
    wuq = jnp.clip(jnp.round(wu / su2[:, None, :]), -128, 127).astype(jnp.int8)
    sizes2 = jnp.asarray([60, 20, 30, 18], jnp.int32)
    got = gm.grouped_matmul(
        xq2, gm.pack_gmm1_weights(wgq, wuq, tn), sizes2, sx2,
        gm.pack_gmm1_scales(sg2, su2, tn), epilogue="dequant_swiglu",
        tm=64, tk=128, tn=tn, out_dtype=jnp.float32)
    gate = gm.gmm_dequant_ref(xq2, wgq, sizes2, sx2, sg2)
    up = gm.gmm_dequant_ref(xq2, wuq, sizes2, sx2, su2)
    h_ref = jax.nn.sigmoid(gate) * gate * up
    ok &= check("gmm_dequant_swiglu", got, h_ref, 1e-3)

    # fused per-token re-quant epilogue (full-width packing)
    n_full = 2 * inter
    wp = gm.pack_gmm1_weights(wgq, wuq, n_full)
    sp = gm.pack_gmm1_scales(sg2, su2, n_full)
    qv, qs = gm.grouped_matmul(
        xq2, wp, sizes2, sx2, sp, epilogue="dequant_swiglu_quant", tm=64, tk=128)
    s_ref = jnp.maximum(jnp.max(jnp.abs(h_ref), axis=-1) / 127.0, 1e-12)
    q_ref = jnp.clip(jnp.round(h_ref / s_ref[:, None]), -128, 127)
    ok &= check("gmm_dequant_swiglu_quant",
                qv.astype(jnp.float32) * qs[:, None],
                q_ref * s_ref[:, None], 1e-3)

    # packed two-heads-per-128-lane sinks decode vs golden
    from sgl_kernel_npu_tpu.ops.attention import sinks_attention as sa2

    sp, hqp, hkvp, dp, pgp, mpp = 8, 16, 4, 64, 16, 4
    npg = sp * mpp
    qp_ = jnp.asarray(rng.standard_normal((sp, hqp * dp)) * 0.5, jnp.bfloat16)
    kp_ = jnp.asarray(rng.standard_normal((npg, hkvp, pgp, dp)) * 0.5, jnp.bfloat16)
    vp_ = jnp.asarray(rng.standard_normal((npg, hkvp, pgp, dp)) * 0.5, jnp.bfloat16)
    snk = jnp.asarray(rng.standard_normal(hqp), jnp.float32)
    btp = jnp.asarray(rng.permutation(npg).reshape(sp, mpp), jnp.int32)
    ctxp = jnp.asarray(rng.integers(1, mpp * pgp, sp), jnp.int32)
    ok &= check("attention_sinks_packed",
                sa2.attention_sinks_packed(
                    qp_, sa2.pack_kv_sinks(kp_), sa2.pack_kv_sinks(vp_), snk,
                    btp, ctxp, 0.125, 24, hqp, hkvp),
                sa2.attention_sinks_ref(
                    qp_, kp_, vp_, snk, btp, ctxp, 0.125, 24, hqp, hkvp))

    # DSA block-sparse decode: all pages selected == dense (chip numerics)
    from sgl_kernel_npu_tpu.ops.attention import decode_attention as da2

    bs_, hq_, lat_, rp_, pg_, mp_ = 4, 8, 512, 64, 128, 4
    npg_ = bs_ * mp_ + 1
    knb = jnp.asarray(rng.standard_normal((npg_, 1, pg_, lat_)) * 0.5, jnp.bfloat16)
    krb = jnp.asarray(rng.standard_normal((npg_, 1, rp_, pg_)) * 0.5, jnp.bfloat16)
    btb = jnp.asarray(rng.permutation(npg_ - 1)[: bs_ * mp_].reshape(bs_, mp_) + 1,
                      jnp.int32)
    slb = jnp.asarray(rng.integers(pg_, mp_ * pg_, bs_), jnp.int32)
    qb = jnp.asarray(rng.standard_normal((bs_, hq_, lat_ + rp_)) * 0.5, jnp.bfloat16)
    scb = jnp.asarray(rng.standard_normal((bs_, mp_ * pg_)), jnp.float32)
    ok &= check("decode_mla_block_sparse",
                da2.decode_mla_block_sparse(qb, knb, krb, slb, 0.042, btb, scb, mp_),
                da2.decode_mla_ref(qb, knb, krb, slb, 0.042, btb))

    # differentiable MLA flash attention (train path): fwd + custom_vjp bwd
    from sgl_kernel_npu_tpu.ops.attention import mla_train as mt

    b_, s_, h_, dl_, dr_ = 1, 256, 16, 512, 64
    mk = lambda *sh: jnp.asarray(rng.standard_normal(sh) * 0.3, jnp.bfloat16)
    ql, qp2, kl, kp2 = mk(b_, s_, h_, dl_), mk(b_, s_, h_, dr_), mk(b_, s_, dl_), mk(b_, s_, dr_)
    ok &= check("mla_flash_train_fwd",
                mt.mla_flash_train(ql, qp2, kl, kp2, 0.042),
                mt.mla_train_ref(ql, qp2, kl, kp2, 0.042), 3e-2)
    loss_k = lambda *a: jnp.sum(jnp.sin(mt.mla_flash_train(*a, 0.042).astype(jnp.float32)))
    loss_r = lambda *a: jnp.sum(jnp.sin(mt.mla_train_ref(*a, 0.042).astype(jnp.float32)))
    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(ql, qp2, kl, kp2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(ql, qp2, kl, kp2)
    for nm, a, b2 in zip(("dq_lat", "dq_pe", "dk_lat", "dk_pe"), gk, gr):
        ok &= check(f"mla_flash_train_{nm}", a.astype(jnp.float32),
                    b2.astype(jnp.float32), tol=5e-2)

    # paged lightning-indexer prefill scores vs einsum-over-gathered-keys
    from sgl_kernel_npu_tpu.ops.attention import lightning_indexer as li

    bi_, mq_, n1_, di_, pgi_, mpi_ = 2, 64, 16, 128, 128, 4
    npgi = bi_ * mpi_
    qd = jnp.asarray(rng.standard_normal((bi_, mq_, n1_, di_)) * 0.5, jnp.bfloat16)
    wd = jnp.asarray(rng.random((bi_, mq_, n1_)) + 0.1, jnp.bfloat16)
    ki = jnp.asarray(rng.standard_normal((npgi, 1, pgi_, di_)) * 0.5, jnp.bfloat16)
    bti = jnp.asarray(rng.permutation(npgi).reshape(bi_, mpi_), jnp.int32)
    lqi = jnp.asarray([64, 40], jnp.int32)
    lki = jnp.asarray([300, 100], jnp.int32)
    got_sc = li.lightning_indexer_scores_prefill_pallas(
        qd, wd, ki, lqi, lki, bti)
    kl = da._gather_pages(ki, bti, mpi_ * pgi_)[:, 0].astype(jnp.float32)
    sc_ref = jnp.einsum("bqnd,bsd->bqns", qd.astype(jnp.float32), kl)
    sc_ref = (jnp.maximum(sc_ref, 0.0) * wd.astype(jnp.float32)[..., None]).sum(2)
    tok = jnp.arange(mq_)[None, :, None]
    pos = jnp.arange(mpi_ * pgi_)[None, None, :]
    qpos = (lki - lqi)[:, None, None] + tok
    maskp = (pos <= qpos) & (pos < lki[:, None, None]) & (tok < lqi[:, None, None])
    gm_ = jnp.where(maskp, got_sc, 0.0)
    rm_ = jnp.where(maskp, sc_ref, 0.0)
    ok &= check("lightning_indexer_prefill", gm_, rm_, 3e-2)
    finite_ok = bool(jnp.all(
        jnp.where(maskp, jnp.isfinite(got_sc), got_sc == li.NEG_INF)).item())
    print(f"{'OK ' if finite_ok else 'FAIL'} lightning_indexer_prefill masking")
    ok &= finite_ok

    print("ALL OK" if ok else "SOME FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
