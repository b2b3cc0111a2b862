"""Benchmark driver: paged MLA decode attention at DeepSeek-V3 scale on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference's headline numbers are EP dispatch/combine bandwidths measured on a
384-chip pod (BASELINE.md) — not measurable on one chip.  The single-chip headline
here is the decode-attention KV-read bandwidth (the decode hot loop,
reference decode_attention.py:110-152), reported with ``vs_baseline`` = speedup of
the Pallas kernel over the XLA-naive gather+softmax implementation of the same op on
the same chip (>1.0 = our kernel beats compiler-generated code).

``detail`` carries the secondary metrics that back the PERF.md table (grouped
W8A8 GEMM, packed sinks decode, MLA prefill, one-sided window a2a, fused
dispatch→GMM1) so every PERF.md headline has a driver-captured twin.  All
timings are MEDIAN-of-N of the scan-marginal estimate — the reproducible
number, not best-of-runs (±10-15 % between-process variance is documented in
PERF.md).
"""

from __future__ import annotations

import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench_scanned(per_iter_fn, qs_small, qs_big, operands, repeats: int = 10):
    """Per-iteration device time via the marginal cost between two scan lengths.

    Iterations run inside ONE jitted scan (each step consumes a different q slice
    → no CSE), the scalar result is fetched to the host (forces completion through
    the remote-execution tunnel), and the fixed per-dispatch cost — which the axon
    tunnel makes tens of ms — cancels in the difference.  Large buffers must be
    passed via `operands`: closure captures are embedded as constants (hundreds of
    MB of MLIR) and break the remote compiler."""

    def make(niter):
        @jax.jit
        def run(qs, operands):
            def step(carry, q):
                out = per_iter_fn(q, *operands)
                # nonlinear consumption: a plain sum lets XLA factor
                # sum(p @ v) into (sum p)·(sum v) and DELETE the matmul from
                # jnp baselines (Pallas calls are opaque and unaffected)
                o = out.astype(jnp.float32)
                return carry + jnp.sum(o * o), None

            total, _ = jax.lax.scan(step, jnp.float32(0), qs)
            return total
        return run

    n1, n2 = qs_small.shape[0], qs_big.shape[0]
    run1, run2 = make(n1), make(n2)
    float(run1(qs_small, operands))  # compile + warm
    float(run2(qs_big, operands))
    # PAIRWISE marginals, median over pairs: timing the two scan lengths
    # back-to-back and differencing per repeat means a tunnel hiccup corrupts
    # only the pair it lands in, and the median rejects it (BENCH_r03's driver
    # window caught one: a stall inflated lora_fused 9.5 → 516 µs and drove
    # two other secondaries negative — with leg-median differencing a single
    # bad window poisons the whole metric).
    marginals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run1(qs_small, operands))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run2(qs_big, operands))
        tb = time.perf_counter() - t0
        marginals.append((tb - ta) / (n2 - n1))
    # median, not min: the driver-recorded number must be the one a rerun
    # reproduces (VERDICT r1: headline = the number the driver can capture)
    return max(statistics.median(marginals), 1e-9)


def _probe_backend(timeout_s: int = 300) -> None:
    """The axon TPU plugin hangs on init when the tunnel is down; probe it in
    a killable subprocess and fall back to CPU so the driver always gets a
    JSON line (a CPU line beats a hung bench)."""
    import os
    import subprocess
    import sys

    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")
        return
    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True)
    except Exception:
        jax.config.update("jax_platforms", "cpu")


def main():
    from sgl_kernel_npu_tpu.ops.attention import decode_attention as da

    _probe_backend()
    on_tpu = jax.default_backend() != "cpu"
    # DeepSeek-V3 decode shapes (scaled to fit a single v5e): 128-token batch,
    # 16 q heads (TP-sharded at full scale), latent 512 + rope 64, seq 1024.
    b, hq, d_nope, d_rope = (128, 16, 512, 64) if on_tpu else (8, 8, 128, 64)
    page, seq = (128, 1024) if on_tpu else (16, 64)
    max_pages = seq // page
    n_pages = b * max_pages + 1

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, hq, d_nope + d_rope)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((n_pages, 1, page, d_nope)), jnp.bfloat16)
    kr = jnp.asarray(rng.standard_normal((n_pages, 1, d_rope, page)), jnp.bfloat16)
    block_table = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1, jnp.int32
    )
    seq_lens = jnp.full((b,), seq, jnp.int32)
    sm_scale = float(1.0 / np.sqrt(d_nope + d_rope))

    # wide iteration spread: the marginal time between the two scan lengths must
    # dwarf the axon tunnel's per-dispatch jitter (tens of ms)
    n1, n2 = (8, 136) if on_tpu else (1, 3)
    qs_small = jnp.asarray(rng.standard_normal((n1, b, hq, d_nope + d_rope)), jnp.bfloat16)
    qs_big = jnp.asarray(rng.standard_normal((n2, b, hq, d_nope + d_rope)), jnp.bfloat16)
    operands = (kn, kr, seq_lens, block_table)
    def measure(fn):
        # marginal-cost timing can degenerate (t2 < t1) under tunnel jitter;
        # retry once before accepting
        for _ in range(2):
            t = _bench_scanned(fn, qs_small, qs_big, operands)
            if t > 1e-8:
                return t
        return t

    t_kernel = measure(
        lambda qq, kn_, kr_, sl_, bt_: da.decode_mla(
            qq, kn_, kr_, sl_, sm_scale, bt_, interpret=not on_tpu),
    )
    t_golden = measure(
        lambda qq, kn_, kr_, sl_, bt_: da.decode_mla_ref(qq, kn_, kr_, sl_, sm_scale, bt_),
    )

    kv_bytes = b * seq * (d_nope + d_rope) * 2  # bf16 KV read per call
    gbps = kv_bytes / t_kernel / 1e9
    result = {
        "metric": "mla_decode_attention_kv_bandwidth",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": round(t_golden / t_kernel, 3),
        "detail": {
            "batch": b, "heads": hq, "seq": seq, "page": page,
            "kernel_us": round(t_kernel * 1e6, 1),
            "xla_naive_us": round(t_golden * 1e6, 1),
            "backend": jax.default_backend(),
        },
    }
    if on_tpu:
        for name, fn in (
            ("gmm", _gmm_secondary),
            ("sinks", _sinks_packed_secondary),
            ("prefill", _mla_prefill_secondary),
            ("a2a", _window_a2a_secondary),
            ("fused", _fused_gmm1_secondary),
            ("fused_full", _fused_full_secondary),
            ("gqa", _gqa_secondary),
            ("int8kv", _int8kv_secondary),
            ("lora", _lora_secondary),
            ("layer", _layer_secondary),
        ):
            try:
                result["detail"].update(fn(rng))
            except Exception as e:  # record, don't lose the whole bench line
                result["detail"][f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result))


def _gmm_secondary(rng):
    """Secondary metric: W8A8 grouped GEMM (fused-MoE GMM1 shape) vs its
    weight-read floor and vs XLA ragged_dot (see PERF.md)."""
    from sgl_kernel_npu_tpu.ops import grouped_matmul as gmod

    e, s, k, n = 8, 1024, 7168, 4096
    gs = jnp.full((e,), s // e, jnp.int32)
    wq = jnp.asarray(rng.integers(-100, 100, (e, k, n)), jnp.int8)
    sx = jnp.asarray(rng.random(s).astype(np.float32) / 100)
    sw = jnp.asarray(rng.random((e, n)).astype(np.float32) / 100)
    xs_small = jnp.asarray(rng.integers(-100, 100, (2, s, k)), jnp.int8)
    xs_big = jnp.asarray(rng.integers(-100, 100, (18, s, k)), jnp.int8)
    t = _bench_scanned(
        lambda x, w, g, a, bb: gmod.grouped_matmul(
            x, w, g, a, bb, epilogue="dequant", out_dtype=jnp.bfloat16),
        xs_small, xs_big, (wq, gs, sx, sw),
    )
    return {
        "gmm1_int8_us": round(t * 1e6, 1),
        "gmm1_int8_tops": round(2 * s * k * n / t / 1e12, 1),
        "gmm1_weight_floor_us": round(e * k * n / 819e9 * 1e6, 1),
    }


def _sinks_packed_secondary(rng):
    """Packed sinks decode (GPT-OSS shapes, full-context window=0): the packed
    two-heads-per-lane KV layout vs the unpacked kernel (PERF.md §sinks)."""
    from sgl_kernel_npu_tpu.ops.attention import sinks_attention as sa

    b, hq, hkv, d, dv, page, seq = 128, 64, 8, 64, 64, 128, 1024
    max_pages = seq // page
    n_pages = b * max_pages + 1
    mk = jax.jit(lambda key, s: jax.random.normal(key, s, jnp.bfloat16) * 0.5,
                 static_argnums=1)
    k = mk(jax.random.key(0), (n_pages, hkv, page, d))
    v = mk(jax.random.key(1), (n_pages, hkv, page, dv))
    kp = jax.jit(sa.pack_kv_sinks)(k)
    vp = jax.jit(sa.pack_kv_sinks)(v)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32)
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    ctx = jnp.full((b,), seq, jnp.int32)
    scale = float(1 / np.sqrt(d))
    qs_small = mk(jax.random.key(2), (8, b, hq * d))
    qs_big = mk(jax.random.key(3), (72, b, hq * d))
    t_pk = _bench_scanned(
        lambda q, k_, v_, bt_, cl_: sa.attention_sinks_packed(
            q, k_, v_, sinks, bt_, cl_, scale, 0, hq, hkv),
        qs_small, qs_big, (kp, vp, bt, ctx), repeats=6)
    t_un = _bench_scanned(
        lambda q, k_, v_, bt_, cl_: sa.attention_sinks(
            q, k_, v_, sinks, bt_, cl_, scale, 0, hq, hkv),
        qs_small, qs_big, (k, v, bt, ctx), repeats=6)
    kv_bytes = b * hkv * seq * (d + dv) * 2
    return {
        "sinks_packed_us": round(t_pk * 1e6, 1),
        "sinks_packed_gbps": round(kv_bytes / t_pk / 1e9, 1),
        "sinks_packed_speedup": round(t_un / t_pk, 2),
    }


def _mla_prefill_secondary(rng):
    """Paged varlen MLA prefill kernel vs the XLA gather path (PERF.md §prefill:
    4×1024-token full prefill, 16 heads, latent 512 + rope 64)."""
    from sgl_kernel_npu_tpu.ops.attention import mla_prefill as mpre

    bsz, s_req, h, dn, dr, page = 4, 1024, 16, 512, 64, 128
    s = bsz * s_req
    n_pages = bsz * (s_req // page) + 1
    mk = jax.jit(lambda key, shp: jax.random.normal(key, shp, jnp.bfloat16) * 0.5,
                 static_argnums=1)
    kn = mk(jax.random.key(0), (n_pages, 1, page, dn))
    kr = mk(jax.random.key(1), (n_pages, 1, dr, page))
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: bsz * (s_req // page)]
        .reshape(bsz, s_req // page) + 1, jnp.int32)
    sl = jnp.full((bsz,), s_req, jnp.int32)
    cl = jnp.full((bsz,), s_req, jnp.int32)
    scale = float(1 / np.sqrt(dn + dr))
    qs_small = mk(jax.random.key(2), (1, s, h, dn + dr))
    qs_big = mk(jax.random.key(3), (5, s, h, dn + dr))
    ops = (kn, kr, sl, bt, cl)
    t_pl = _bench_scanned(
        lambda q, kn_, kr_, sl_, bt_, cl_: mpre.mla_prefill_pallas(
            q, kn_, kr_, sl_, bt_, cl_, scale, max_q=s_req),
        qs_small, qs_big, ops, repeats=5)
    t_ref = _bench_scanned(
        lambda q, kn_, kr_, sl_, bt_, cl_: mpre.mla_prefill_ref(
            q, kn_, kr_, sl_, bt_, cl_, scale),
        qs_small, qs_big, ops, repeats=5)
    return {
        "mla_prefill_us": round(t_pl * 1e6, 1),
        "mla_prefill_mtoks": round(s / t_pl / 1e6, 2),
        "mla_prefill_speedup": round(t_ref / t_pl, 1),
    }


def _window_a2a_secondary(rng):
    """One-sided ragged window all-to-all, self-loop (the DeepEP protocol
    engine without ICI in the path) — PERF.md §window a2a."""
    from jax.sharding import Mesh, PartitionSpec as P
    from sgl_kernel_npu_tpu.parallel.pallas_a2a import pallas_ragged_all_to_all

    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))
    r_, c, h = 1, 4096, 7168
    counts = jnp.asarray([c], jnp.int32)
    x0 = jnp.asarray(rng.standard_normal((r_, c, h)), jnp.bfloat16)

    def chained(n):
        def f(xs_, cs):
            out, _ = pallas_ragged_all_to_all(
                xs_, cs, axis_name="ep", num_ranks=r_, chunk_rows=2048)
            return out

        sm = functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(P("ep"), P("ep")),
            out_specs=P("ep"), check_vma=False)(f)

        @jax.jit
        def run(x, cs):
            body = lambda i, x: sm(x, cs)
            return jnp.sum(
                jax.lax.fori_loop(0, n, body, x)[:, :1, :1].astype(jnp.float32))
        return run

    run_a = chained(16)
    run_b = chained(272)
    float(run_a(x0, counts))
    float(run_b(x0, counts))
    marginals = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(run_a(x0, counts))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run_b(x0, counts))
        tb = time.perf_counter() - t0
        marginals.append((tb - ta) / 256)
    dt = max(statistics.median(marginals), 1e-9)
    return {
        "window_a2a_us": round(dt * 1e6, 1),
        "window_a2a_gbps": round(c * h * 2 / dt / 1e9, 1),
    }


def _fused_gmm1_secondary(rng):
    """Single-kernel fused dispatch→GMM1 (self-loop) vs the bare grouped GEMM
    on resident rows — the fusion-overhead number in PERF.md §fused kernel."""
    from jax.sharding import Mesh, PartitionSpec as P
    from sgl_kernel_npu_tpu.ops import grouped_matmul as gmod
    from sgl_kernel_npu_tpu.parallel.fused_kernel import fused_dispatch_gmm1_rank

    e, seg, k, n = 8, 128, 7168, 4096
    er = e * seg
    w1 = jnp.asarray(rng.integers(-100, 100, (e, k, n)), jnp.int8)
    sw = jnp.asarray(rng.random((e, n)).astype(np.float32) / 100)
    sx = jnp.asarray(rng.random((e, seg)).astype(np.float32) / 100)
    gs = jnp.full((e,), seg, jnp.int32)
    sx_flat = sx.reshape(-1)
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))

    fused_rank = functools.partial(
        jax.shard_map,
        mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P(),
        check_vma=False,
    )(lambda a, b_, c, d: fused_dispatch_gmm1_rank(
        a, b_, c, d, axis_name="ep", num_ranks=1, seg=seg))

    xs_small = jnp.asarray(rng.integers(-100, 100, (2, 1, er, k)), jnp.int8)
    xs_big = jnp.asarray(rng.integers(-100, 100, (10, 1, er, k)), jnp.int8)
    t_fused = _bench_scanned(
        lambda x, w, s_, sx_: fused_rank(x, w, s_, sx_),
        xs_small, xs_big, (w1, sw, sx), repeats=5)
    t_bare = _bench_scanned(
        lambda x, w, g, a, bb: gmod.grouped_matmul(
            x[0], w, g, a, bb, epilogue="dequant", out_dtype=jnp.float32),
        xs_small, xs_big, (w1, gs, sx_flat, sw), repeats=5)
    return {
        "fused_dispatch_gmm1_us": round(t_fused * 1e6, 1),
        "bare_gmm1_us": round(t_bare * 1e6, 1),
        "fusion_overhead_us": round((t_fused - t_bare) * 1e6, 1),
    }


def _fused_full_secondary(rng):
    """FULL single-kernel fused MoE (dispatch→GMM1→SwiGLU→GMM2→combine in ONE
    pallas_call, fused_full.fused_deep_moe_full_rank) vs the unfused op chain
    at DeepSeek decode shapes, self-loop mesh — the VERDICT r3 #1 number the
    driver never captured."""
    from jax.sharding import Mesh, PartitionSpec as P
    from sgl_kernel_npu_tpu.parallel import fused_full
    from sgl_kernel_npu_tpu.parallel.fused_moe import fused_deep_moe_rank

    b, h, i, e, k = 128, 7168, 2048, 8, 8
    tiles = fused_full.select_full_tiles(
        t=b, k=k, h=h, i=i, e_local=e, num_ranks=1, seg=b)

    @functools.partial(jax.jit, static_argnums=0)
    def mkw(_):
        kk = iter(jax.random.split(jax.random.key(7), 8))
        w1 = jax.random.randint(next(kk), (e, h, 2 * i), -100, 100, jnp.int8)
        s1 = jax.random.uniform(next(kk), (e, 2 * i), jnp.float32) / 100
        w2 = jax.random.randint(next(kk), (e, i, h), -100, 100, jnp.int8)
        s2 = jax.random.uniform(next(kk), (e, h), jnp.float32) / 100
        return w1, s1, w2, s2

    w1, s1, w2, s2 = mkw(0)
    idx = jnp.tile(jnp.arange(e, dtype=jnp.int32)[None], (b, 1))  # k == e
    wts = jnp.full((b, k), 1.0 / k, jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))
    smap = lambda fn: functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(),) * 7, out_specs=P(),
        check_vma=False)(fn)

    fused = smap(lambda x, i_, ww, a, bb, c, d: fused_full.fused_deep_moe_full_rank(
        x, i_, ww, a, bb, c, d,
        axis_name="ep", num_experts=e, num_ranks=1, seg_capacity=b, **tiles)[0])
    unfused = smap(lambda x, i_, ww, a, bb, c, d: fused_deep_moe_rank(
        x, i_, ww, a, bb, c, d,
        axis_name="ep", num_experts=e, num_ranks=1,
        pair_capacity=b * k, seg_capacity=b, pack_tn=tiles["tn1"])[0])

    mkx = jax.jit(lambda key, s: jax.random.normal(key, s, jnp.bfloat16) * 0.5,
                  static_argnums=1)
    xs_small = mkx(jax.random.key(20), (4, b, h))
    xs_big = mkx(jax.random.key(21), (36, b, h))
    ops = (idx, wts, w1, s1, w2, s2)
    tf = _bench_scanned(
        lambda x, *o: fused(x, *o), xs_small, xs_big, ops, repeats=5)
    tu = _bench_scanned(
        lambda x, *o: unfused(x, *o), xs_small, xs_big, ops, repeats=5)
    return {
        "fused_full_us": round(tf * 1e6, 1),
        "unfused_chain_us": round(tu * 1e6, 1),
        "fused_full_vs_unfused": round(tu / tf, 2),
    }


def _gqa_secondary(rng):
    """Paged GQA decode (Llama-class shapes) vs HBM roofline (scripts/bench_gqa.py
    measures both variants; the driver captures the production one)."""
    from sgl_kernel_npu_tpu.ops.attention import decode_attention as da

    b, hq, hkv, d, page, seq = 64, 32, 8, 128, 128, 1024
    max_pages = seq // page
    n_pages = b * max_pages + 1
    mk = jax.jit(lambda key, s: jax.random.normal(key, s, jnp.bfloat16) * 0.5,
                 static_argnums=1)
    k = mk(jax.random.key(0), (n_pages, hkv, page, d))
    v = mk(jax.random.key(1), (n_pages, hkv, page, d))
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    sl = jnp.full((b,), seq, jnp.int32)
    scale = float(1 / np.sqrt(d))
    qs_small = mk(jax.random.key(2), (8, b, hq, d))
    qs_big = mk(jax.random.key(3), (72, b, hq, d))
    t = _bench_scanned(
        lambda q, k_, v_, sl_, bt_: da.decode_gqa_high_performance(
            q, k_, v_, sl_, scale, bt_),
        qs_small, qs_big, (k, v, sl, bt), repeats=5)
    kv_bytes = b * hkv * seq * 2 * d * 2
    return {
        "gqa_decode_us": round(t * 1e6, 1),
        "gqa_decode_gbps": round(kv_bytes / t / 1e9, 1),
    }


def _int8kv_secondary(rng):
    """Int8 latent KV cache decode (the int8_nzcache consumer): decode_mla
    reading int8 pages vs the bf16 headline shapes — expect ~1.5-1.9x from
    halved KV HBM traffic (scripts/bench_int8_kv.py measures the sweep)."""
    from sgl_kernel_npu_tpu.ops.attention import decode_attention as da

    b, hq, d_nope, d_rope, page, seq = 128, 16, 512, 64, 128, 1024
    max_pages = seq // page
    n_pages = b * max_pages + 1
    mk = jax.jit(lambda key, s: jax.random.normal(key, s, jnp.bfloat16) * 0.5,
                 static_argnums=1)
    kn8 = jnp.asarray(
        rng.integers(-100, 100, (n_pages, 1, page, d_nope)), jnp.int8)
    kr = mk(jax.random.key(1), (n_pages, 1, d_rope, page))
    bt = jnp.asarray(
        rng.permutation(n_pages - 1)[: b * max_pages].reshape(b, max_pages) + 1,
        jnp.int32)
    sl = jnp.full((b,), seq, jnp.int32)
    sm_scale = float(1 / np.sqrt(d_nope + d_rope))
    qs_small = mk(jax.random.key(2), (8, b, hq, d_nope + d_rope))
    qs_big = mk(jax.random.key(3), (136, b, hq, d_nope + d_rope))
    t = _bench_scanned(
        lambda q, kn_, kr_, sl_, bt_: da.decode_mla(
            q, kn_, kr_, sl_, sm_scale, bt_, k_scale=1 / 64),
        qs_small, qs_big, (kn8, kr, sl, bt), repeats=5)
    kv_bytes = b * seq * (d_nope * 1 + d_rope * 2)  # int8 nope + bf16 rope
    return {
        "mla_decode_int8kv_us": round(t * 1e6, 1),
        "mla_decode_int8kv_gbps": round(kv_bytes / t / 1e9, 1),
    }


def _lora_secondary(rng):
    """Fused Pallas multi-LoRA delta (decode shapes) vs the jnp op chain and
    the ideal weight-read floor (each live adapter read once) — the evidence
    behind serving LoRA through ops/lora_pallas (PERF.md §lora)."""
    from sgl_kernel_npu_tpu.ops import lora as lmod
    from sgl_kernel_npu_tpu.ops import lora_pallas

    t, h, r, l = 128, 4096, 16, 8
    mk = jax.jit(lambda k, s: jax.random.normal(k, s, jnp.bfloat16) * 0.1,
                 static_argnums=1)
    a = mk(jax.random.key(30), (l, r, h))
    b = mk(jax.random.key(31), (l, h, r))
    bt = b.transpose(0, 2, 1)  # adapter-load-time transpose (serving pattern)
    idx = jnp.asarray(rng.integers(0, l, t), jnp.int32)
    xs_small = mk(jax.random.key(32), (8, t, h))
    xs_big = mk(jax.random.key(33), (136, t, h))
    tf = _bench_scanned(
        lambda x, a_, bt_, i_: lora_pallas.bgmv_fused(
            x, a_, bt=bt_, idx=i_, scaling=0.5),
        xs_small, xs_big, (a, bt, idx))
    tj = _bench_scanned(
        lambda x, a_, b_, i_: lmod.bgmv_expand(
            lmod.bgmv_shrink(x, a_, i_, 0.5), b_, i_),
        xs_small, xs_big, (a, b, idx))
    # honest floor: adapters read once + x read + f32 out write
    floor = (l * r * (h + h) * 2 + t * h * 2 + t * h * 4) / 819e9
    return {
        "lora_fused_us": round(tf * 1e6, 1),
        "lora_jnp_us": round(tj * 1e6, 1),
        "lora_fused_vs_floor": round(tf / floor, 2),
    }


def _layer_secondary(rng):
    """Flagship composite: one full DeepSeek-V3 decode layer (scripts/bench_layer.py)
    run as a subprocess so the driver-captured JSON carries the VERDICT #4 number —
    plus the fusedmoe variant (MoE half through the FULL single-kernel fused MoE,
    VERDICT r3 #1/#2)."""
    import re
    import subprocess
    import sys as _sys

    def run_mode(args):
        proc = subprocess.run(
            [_sys.executable, "scripts/bench_layer.py", *args],
            capture_output=True, text=True, timeout=900,
            cwd=str(__import__("pathlib").Path(__file__).resolve().parent),
        )
        m = re.search(r"decode layer, B=\d+:\s*([0-9.]+) us", proc.stdout)
        f = re.search(r"floor:\s*([0-9.]+) us\s+->\s+([0-9.]+)% of floor",
                      proc.stdout)
        if not m or not f:
            raise RuntimeError(
                f"bench_layer parse failed: {proc.stdout[-300:]}{proc.stderr[-300:]}")
        return float(m.group(1)), float(f.group(1)), float(f.group(2))

    t_us, floor_us, pct = run_mode([])
    out = {
        "layer_us": t_us,
        "layer_floor_us": floor_us,
        "layer_pct_of_floor": pct,
    }
    try:
        tf_us, _, pf = run_mode(["fusedmoe"])
        out["layer_fusedmoe_us"] = tf_us
        out["layer_fusedmoe_pct_of_floor"] = pf
    except Exception as exc:  # keep the primary layer number
        out["layer_fusedmoe_error"] = f"{type(exc).__name__}: {exc}"[:200]
    return out


if __name__ == "__main__":
    main()
