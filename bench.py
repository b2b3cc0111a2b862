"""Benchmark driver: paged MLA decode attention at DeepSeek-V3 scale on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference's headline numbers are EP dispatch/combine bandwidths measured on a
384-chip pod (BASELINE.md) — not measurable on one chip.  The single-chip headline
here is the decode-attention KV-read bandwidth (the decode hot loop,
reference decode_attention.py:110-152), reported with ``vs_baseline`` = speedup of
the Pallas kernel over the XLA-naive gather+softmax implementation of the same op.

Timing methodology (round 5): **device-trace medians** (utils/trace_profile.py,
the reference's ``bench_kineto`` analogue — tests/python/deepep/utils.py:156-225).
The xplane trace carries the exact device duration of every op, with ±1 µs
event-to-event dispersion; each metric carries an ``*_iqr`` field.  The previous
scan-marginal wall-clock harness is retired for TPU metrics: its error bars
exceeded the effects measured (BENCH_r04's ``bare_gmm1_us`` 242.0 would need
970 GB/s of weight streaming — above HBM peak; the trace method measures the
same kernel at 381 µs standalone / 339 µs in-scan).  ``detail`` carries the
secondary metrics that back PERF.md so every PERF.md headline has a
driver-captured twin.
"""

from __future__ import annotations

import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# timing harnesses
# ---------------------------------------------------------------------------

def _trace_events(fn, iters: int = 8, warm: int = 2):
    """Run ``fn()`` under the profiler; return {'modules': [us...],
    'ops': {short_name: [us...]}} of device-side events."""
    from jax.profiler import ProfileData

    from sgl_kernel_npu_tpu.utils import trace_profile as tp

    for _ in range(warm):
        fn()
    path = tp.capture(fn, iters=iters)
    pd = ProfileData.from_file(path)
    modules, ops = [], {}
    for plane in pd.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                for ev in line.events:
                    modules.append(ev.duration_ns / 1e3)
            elif line.name == "XLA Ops":
                for ev in line.events:
                    key = tp._short_name(ev.name)
                    ops.setdefault(key, []).append(ev.duration_ns / 1e3)
    return {"modules": modules, "ops": ops}


def _med_iqr(xs):
    xs = sorted(xs)
    if not xs:
        return 0.0, 0.0
    med = statistics.median(xs)
    iqr = xs[(3 * len(xs)) // 4] - xs[len(xs) // 4] if len(xs) >= 4 else 0.0
    return med, iqr


def _module_us(fn, iters: int = 8, warm: int = 2):
    """(median, iqr) device time of the whole jitted function."""
    ev = _trace_events(fn, iters, warm)
    return _med_iqr(ev["modules"])


def _op_us(fn, substr: str, iters: int = 8, warm: int = 2):
    """(median, iqr) device time of ops whose short name contains ``substr``.

    Falls back to the dominant repeated op when the name does not match
    (custom-call naming varies with the jit nesting)."""
    ev = _trace_events(fn, iters, warm)
    durs = [d for k, v in ev["ops"].items() if substr in k for d in v]
    if not durs:
        durs = max((v for v in ev["ops"].values() if len(v) >= iters),
                   key=lambda v: sum(v), default=[])
    return _med_iqr(durs)


def _bench_scanned(per_iter_fn, qs_small, qs_big, operands, repeats: int = 10):
    """Scan-marginal wall-clock (CPU fallback only; see module docstring)."""

    def make(niter):
        @jax.jit
        def run(qs, operands):
            def step(carry, q):
                o = per_iter_fn(q, *operands).astype(jnp.float32)
                return carry + jnp.sum(o * o), None

            total, _ = jax.lax.scan(step, jnp.float32(0), qs)
            return total
        return run

    n1, n2 = qs_small.shape[0], qs_big.shape[0]
    run1, run2 = make(n1), make(n2)
    float(run1(qs_small, operands))
    float(run2(qs_big, operands))
    marginals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run1(qs_small, operands))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run2(qs_big, operands))
        tb = time.perf_counter() - t0
        marginals.append((tb - ta) / (n2 - n1))
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

    if on_tpu:
        # operands ride as jit ARGUMENTS everywhere: closure-captured device
        # arrays embed as constants in the MLIR shipped to the remote
        # compiler, which rejects bodies over ~100 MB (HTTP 413)
        fg = jax.jit(lambda *a: da.decode_mla_ref(*a, sm_scale, block_table))
        t_kernel_us, k_iqr = _op_us(
            lambda: jax.block_until_ready(da.decode_mla(
                q, kn, kr, seq_lens, sm_scale, block_table)),
            "decode_mla", iters=10)
        t_golden_us, _ = _module_us(
            lambda: jax.block_until_ready(fg(q, kn, kr, seq_lens)), iters=6)
        t_kernel, t_golden = t_kernel_us * 1e-6, t_golden_us * 1e-6
    else:
        n1, n2 = 1, 3
        qs_small = jnp.asarray(
            rng.standard_normal((n1, b, hq, d_nope + d_rope)), jnp.bfloat16)
        qs_big = jnp.asarray(
            rng.standard_normal((n2, b, hq, d_nope + d_rope)), jnp.bfloat16)
        operands = (kn, kr, seq_lens, block_table)
        t_kernel = _bench_scanned(
            lambda qq, kn_, kr_, sl_, bt_: da.decode_mla(
                qq, kn_, kr_, sl_, sm_scale, bt_, interpret=True),
            qs_small, qs_big, operands)
        t_golden = _bench_scanned(
            lambda qq, kn_, kr_, sl_, bt_: da.decode_mla_ref(
                qq, kn_, kr_, sl_, sm_scale, bt_),
            qs_small, qs_big, operands)
        k_iqr = 0.0

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
            "kernel_iqr_us": round(k_iqr, 1),
            "xla_naive_us": round(t_golden * 1e6, 1),
            "backend": jax.default_backend(),
            "timing": "device-trace median" if on_tpu else "scan-marginal",
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
            ("engine", _engine_secondary),
            ("layer", _layer_secondary),
        ):
            try:
                result["detail"].update(fn(rng))
            except Exception as e:  # record, don't lose the whole bench line
                result["detail"][f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(result))


def _gmm_secondary(rng):
    """W8A8 grouped GEMM (fused-MoE GMM1 shape): the production ring kernel
    (ops/gmm_ring.py) and the BlockSpec kernel vs the weight-read floor.
    ``gmm1_int8_us``/``bare_gmm1_us`` are the SAME op measured by the same
    harness (r4's 21% disagreement was scan-marginal noise — VERDICT r4 #1c)."""
    from sgl_kernel_npu_tpu.ops import gmm_ring
    from sgl_kernel_npu_tpu.ops import grouped_matmul as gmod

    e, s, k, n = 8, 1024, 7168, 4096
    n_tok = s // e
    gs = jnp.full((e,), s // e, jnp.int32)
    wq = jnp.asarray(rng.integers(-100, 100, (e, k, n)), jnp.int8)
    sx = jnp.asarray(rng.random(s).astype(np.float32) / 100)
    sxt = jnp.asarray(rng.random(n_tok).astype(np.float32) / 100)
    sw = jnp.asarray(rng.random((e, n)).astype(np.float32) / 100)
    x = jnp.asarray(rng.integers(-100, 100, (s, k)), jnp.int8)
    xq = jnp.asarray(rng.integers(-100, 100, (n_tok, k)), jnp.int8)
    tok = jnp.asarray(rng.integers(0, n_tok, s), jnp.int32)

    t_blk, iqr_blk = _op_us(
        lambda: jax.block_until_ready(gmod.grouped_matmul(
            x, wq, gs, sx, sw, epilogue="dequant", out_dtype=jnp.bfloat16)),
        "grouped_matmul")
    t_ring, iqr_ring = _op_us(
        lambda: jax.block_until_ready(gmm_ring.gmm1_ring(
            xq, tok, wq, gs, sxt, sw)),
        "gmm1_ring")
    floor = e * k * n / 819e9 * 1e6
    return {
        "gmm1_int8_us": round(t_blk, 1),
        "gmm1_int8_iqr_us": round(iqr_blk, 1),
        "gmm1_int8_tops": round(2 * s * k * n / (t_blk * 1e-6) / 1e12, 1),
        "gmm1_ring_us": round(t_ring, 1),
        "gmm1_ring_iqr_us": round(iqr_ring, 1),
        "gmm1_weight_floor_us": round(floor, 1),
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
    qq = mk(jax.random.key(2), (b, hq * d))
    t_pk, iqr = _op_us(
        lambda: jax.block_until_ready(sa.attention_sinks_packed(
            qq, kp, vp, sinks, bt, ctx, scale, 0, hq, hkv)),
        "attention_sinks")
    t_un, _ = _op_us(
        lambda: jax.block_until_ready(sa.attention_sinks(
            qq, k, v, sinks, bt, ctx, scale, 0, hq, hkv)),
        "attention_sinks", iters=6)
    kv_bytes = b * hkv * seq * (d + dv) * 2
    return {
        "sinks_packed_us": round(t_pk, 1),
        "sinks_packed_iqr_us": round(iqr, 1),
        "sinks_packed_gbps": round(kv_bytes / (t_pk * 1e-6) / 1e9, 1),
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
    qf = mk(jax.random.key(2), (s, h, dn + dr))
    f_pl = jax.jit(lambda *a: mpre.mla_prefill_pallas(
        *a, scale, max_q=s_req))
    f_ref = jax.jit(lambda *a: mpre.mla_prefill_ref(*a, scale))
    t_pl, iqr = _op_us(
        lambda: jax.block_until_ready(f_pl(qf, kn, kr, sl, bt, cl)),
        "prefill")
    t_ref, _ = _module_us(
        lambda: jax.block_until_ready(f_ref(qf, kn, kr, sl, bt, cl)), iters=4)
    return {
        "mla_prefill_us": round(t_pl, 1),
        "mla_prefill_iqr_us": round(iqr, 1),
        "mla_prefill_mtoks": round(s / (t_pl * 1e-6) / 1e6, 2),
        "mla_prefill_speedup": round(t_ref / t_pl, 1),
    }


def _window_a2a_secondary(rng):
    """One-sided ragged window all-to-all, self-loop (the DeepEP protocol
    engine without ICI in the path) — PERF.md §window a2a.  Traced per-event:
    the pallas custom-call inside a chained fori_loop gives one event per
    transfer."""
    from jax.sharding import Mesh, PartitionSpec as P
    from sgl_kernel_npu_tpu.parallel.pallas_a2a import pallas_ragged_all_to_all

    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))
    r_, c, h = 1, 4096, 7168
    counts = jnp.asarray([c], jnp.int32)
    x0 = jnp.asarray(rng.standard_normal((r_, c, h)), jnp.bfloat16)

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
            jax.lax.fori_loop(0, 16, body, x)[:, :1, :1].astype(jnp.float32))

    ev = _trace_events(lambda: float(run(x0, counts)), iters=3, warm=1)
    durs = [d for k, v in ev["ops"].items() if "all_to_all" in k for d in v]
    if not durs:  # op naming fallback: the dominant repeated op IS the a2a
        durs = max((v for v in ev["ops"].values() if len(v) >= 16),
                   key=lambda v: sum(v), default=[0.0])
    dt_us, iqr = _med_iqr(durs)
    return {
        "window_a2a_us": round(dt_us, 1),
        "window_a2a_iqr_us": round(iqr, 1),
        "window_a2a_gbps": round(c * h * 2 / (dt_us * 1e-6) / 1e9, 1),
    }


def _fused_gmm1_secondary(rng):
    """Single-kernel fused dispatch→GMM1 (self-loop) vs the bare grouped GEMM —
    the VERDICT r4 #1 adjudication metric.  Done-criterion:
    fused ≤ bare + window_a2a (the dispatch rides free)."""
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
    x1 = jnp.asarray(rng.integers(-100, 100, (1, er, k)), jnp.int8)
    mesh = Mesh(np.array(jax.devices()[:1]), ("ep",))

    fused_rank = functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=P(),
        check_vma=False,
    )(lambda a, b_, c, d: fused_dispatch_gmm1_rank(
        a, b_, c, d, axis_name="ep", num_ranks=1, seg=seg))

    ffused = jax.jit(fused_rank)
    fbare = jax.jit(lambda x_, w_, g_, a_, b_: gmod.grouped_matmul(
        x_[0], w_, g_, a_, b_, epilogue="dequant", out_dtype=jnp.bfloat16))
    # module-vs-module: both sides carry their full invocation cost (the
    # fused module includes the xsend staging copy the call induces)
    t_fused, iqr_f = _module_us(
        lambda: jax.block_until_ready(ffused(x1, w1, sw, sx)), iters=10)
    t_bare, iqr_b = _module_us(
        lambda: jax.block_until_ready(fbare(x1, w1, gs, sx_flat, sw)), iters=10)
    return {
        "fused_dispatch_gmm1_us": round(t_fused, 1),
        "fused_dispatch_gmm1_iqr_us": round(iqr_f, 1),
        "bare_gmm1_us": round(t_bare, 1),
        "bare_gmm1_iqr_us": round(iqr_b, 1),
        "fusion_overhead_us": round(t_fused - t_bare, 1),
    }


def _fused_full_secondary(rng):
    """FULL single-kernel fused MoE (dispatch→GMM1→SwiGLU→GMM2→combine in ONE
    pallas_call) vs TWO baselines (VERDICT r4 #3): the slow protocol twin
    (``unfused_chain_us``, fused_moe.fused_deep_moe_rank) and the HONEST best
    unfused path — the production ring-kernel MoE half exactly as
    models/deepseek_v3._gmm_moe runs it (``unfused_best_us``)."""
    from jax.sharding import Mesh, PartitionSpec as P
    from sgl_kernel_npu_tpu.models.deepseek_v3 import _gmm_moe, DeepSeekV3Config
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

    cfg = DeepSeekV3Config(hidden=h, num_experts=e, topk=k, moe_intermediate=i)
    x16 = jax.jit(lambda: jax.random.normal(
        jax.random.key(20), (b, h), jnp.bfloat16) * 0.5)()
    ffused = jax.jit(fused)
    funfused = jax.jit(unfused)
    fbest = jax.jit(lambda xx, *ws: _gmm_moe(
        cfg, ws, xx.astype(jnp.float32), idx, wts))
    args = (x16, idx, wts, w1, s1, w2, s2)
    tf, iqr_f = _module_us(
        lambda: jax.block_until_ready(ffused(*args)), iters=6)
    tu, _ = _module_us(
        lambda: jax.block_until_ready(funfused(*args)), iters=4)
    tb, iqr_b = _module_us(
        lambda: jax.block_until_ready(fbest(x16, w1, s1, w2, s2)), iters=6)
    return {
        "fused_full_us": round(tf, 1),
        "fused_full_iqr_us": round(iqr_f, 1),
        "unfused_chain_us": round(tu, 1),
        "unfused_best_us": round(tb, 1),
        "unfused_best_iqr_us": round(iqr_b, 1),
        "fused_full_vs_unfused": round(tu / tf, 2),
        "fused_full_vs_best": round(tb / tf, 2),
    }


def _gqa_secondary(rng):
    """Paged GQA decode (Llama-class shapes) vs HBM roofline."""
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
    qq = mk(jax.random.key(2), (b, hq, d))
    t, iqr = _op_us(
        lambda: jax.block_until_ready(da.decode_gqa_high_performance(
            qq, k, v, sl, scale, bt)),
        "gqa")
    kv_bytes = b * hkv * seq * 2 * d * 2
    return {
        "gqa_decode_us": round(t, 1),
        "gqa_decode_iqr_us": round(iqr, 1),
        "gqa_decode_gbps": round(kv_bytes / (t * 1e-6) / 1e9, 1),
    }


def _int8kv_secondary(rng):
    """Int8 latent KV cache decode (the int8_nzcache consumer)."""
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
    qq = mk(jax.random.key(2), (b, hq, d_nope + d_rope))
    t, iqr = _op_us(
        lambda: jax.block_until_ready(da.decode_mla(
            qq, kn8, kr, sl, sm_scale, bt, k_scale=1 / 64)),
        "decode_mla")
    kv_bytes = b * seq * (d_nope * 1 + d_rope * 2)  # int8 nope + bf16 rope
    return {
        "mla_decode_int8kv_us": round(t, 1),
        "mla_decode_int8kv_iqr_us": round(iqr, 1),
        "mla_decode_int8kv_gbps": round(kv_bytes / (t * 1e-6) / 1e9, 1),
    }


def _lora_secondary(rng):
    """Fused Pallas multi-LoRA delta (decode shapes) vs the jnp op chain and
    the ideal weight-read floor (PERF.md §lora)."""
    from sgl_kernel_npu_tpu.ops import lora as lmod
    from sgl_kernel_npu_tpu.ops import lora_pallas

    t, h, r, l = 128, 4096, 16, 8
    mk = jax.jit(lambda k, s: jax.random.normal(k, s, jnp.bfloat16) * 0.1,
                 static_argnums=1)
    a = mk(jax.random.key(30), (l, r, h))
    b = mk(jax.random.key(31), (l, h, r))
    bt = b.transpose(0, 2, 1)  # adapter-load-time transpose (serving pattern)
    idx = jnp.asarray(rng.integers(0, l, t), jnp.int32)
    xx = mk(jax.random.key(32), (t, h))
    fj = jax.jit(lambda x_, a_, b_, i_: lmod.bgmv_expand(
        lmod.bgmv_shrink(x_, a_, i_, 0.5), b_, i_))
    tf, iqr = _op_us(
        lambda: jax.block_until_ready(lora_pallas.bgmv_fused(
            xx, a, bt=bt, idx=idx, scaling=0.5)),
        "bgmv_fused", iters=12)
    tj, _ = _module_us(
        lambda: jax.block_until_ready(fj(xx, a, b, idx)), iters=8)
    # the production decode path (fused_lora_delta routes small pools through
    # the floor-speed all-adapters chain — PERF.md §LoRA r5 adjudication)
    fs = jax.jit(lambda x_, a_, b_, i_: lmod.fused_lora_delta(
        x_, a_, b_, i_, scaling=0.5))
    ts, iqr_s = _module_us(
        lambda: jax.block_until_ready(fs(xx, a, b, idx)), iters=10)
    # honest floor: adapters read once + x read + f32 out write
    floor = (l * r * (h + h) * 2 + t * h * 2 + t * h * 4) / 819e9 * 1e6
    return {
        "lora_fused_us": round(tf, 1),
        "lora_fused_iqr_us": round(iqr, 1),
        "lora_jnp_us": round(tj, 1),
        "lora_fused_vs_floor": round(tf / floor, 2),
        "lora_serve_us": round(ts, 1),
        "lora_serve_iqr_us": round(iqr_s, 1),
        "lora_serve_vs_floor": round(ts / floor, 2),
    }


def _engine_secondary(rng):
    """End-to-end serving throughput (VERDICT r4 #5): the continuous-batching
    engine's decode step on a Llama-class model, device-time tokens/s.

    The axon tunnel adds ~25 ms of host dispatch per step, so the honest
    measurable number is DEVICE-limited throughput: batch / median device time
    of one engine decode step (the full jitted model step the engine issues —
    weights + paged KV + sampling glue).  Floor model = per-step HBM traffic
    (all weights once + live KV) at 819 GB/s."""
    from sgl_kernel_npu_tpu.models import llama as lm
    from sgl_kernel_npu_tpu.runtime.engine import Engine, llama_adapter

    # model sized so the engine's jitted step (params ride as closure
    # constants through the adapter) stays under the remote compiler's
    # ~100 MB body limit: ~50 MB of bf16 weights
    cfg = lm.LlamaConfig(
        vocab_size=2048, hidden=1024, num_layers=2, num_heads=8,
        num_kv_heads=4, head_dim=128, intermediate=2816, page_size=64)
    params = lm.init_weights(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    bsz, prompt_len, ctx = 16, 63, 64
    eng = Engine(llama_adapter(cfg, params, dtype=jnp.bfloat16),
                 num_pages=bsz * 4 + 8, max_batch=bsz,
                 max_pages_per_req=4, prefill_chunk=prompt_len, mixed=False)
    prompts = [list(np.asarray(rng.integers(1, 8000, prompt_len)))
               for _ in range(bsz)]
    for p in prompts:
        eng.add_request(p, max_new_tokens=10_000)
    # drive until every request is in decode phase
    for _ in range(bsz + 2):
        eng.step()
    assert all(r.pos >= r.prompt_len for r in eng.running), "not in decode"

    # one engine step may issue several jitted modules (decode + head/sample
    # glue): per-step device time = total module time / steps
    n_steps = 12
    ev = _trace_events(lambda: eng.step(), iters=n_steps, warm=3)
    t_us = sum(ev["modules"]) / n_steps
    _, iqr = _med_iqr(ev["modules"])
    head_dim = cfg.head_dim
    wbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    kv_bytes = bsz * ctx * cfg.num_kv_heads * head_dim * 2 * 2 * cfg.num_layers
    floor_us = (wbytes + kv_bytes) / 819e9 * 1e6
    toks_s = bsz / (t_us * 1e-6)
    return {
        "engine_decode_step_us": round(t_us, 1),
        "engine_decode_step_iqr_us": round(iqr, 1),
        "engine_decode_toks_s": round(toks_s, 0),
        "engine_decode_floor_us": round(floor_us, 1),
        "engine_decode_pct_of_floor": round(100 * floor_us / t_us, 1),
    }


def _layer_secondary(rng):
    """Flagship composite: one full DeepSeek-V3 decode layer
    (scripts/bench_layer.py, trace-based) run as a subprocess — the VERDICT #4
    number — plus the fusedmoe variant (MoE half through the FULL single-kernel
    fused MoE)."""
    import re
    import subprocess
    import sys as _sys

    def run_mode(args):
        proc = subprocess.run(
            [_sys.executable, "scripts/bench_layer.py", *args],
            capture_output=True, text=True, timeout=1800,
            cwd=str(__import__("pathlib").Path(__file__).resolve().parent),
        )
        m = re.search(r"decode layer, B=\d+:\s*([0-9.]+) us", proc.stdout)
        f = re.search(r"floor:\s*([0-9.]+) us\s+->\s+([0-9.]+)% of floor",
                      proc.stdout)
        q = re.search(r"IQR ([0-9.]+) us", proc.stdout)
        if not m or not f:
            raise RuntimeError(
                f"bench_layer parse failed: {proc.stdout[-300:]}{proc.stderr[-300:]}")
        return (float(m.group(1)), float(f.group(1)), float(f.group(2)),
                float(q.group(1)) if q else 0.0)

    t_us, floor_us, pct, iqr = run_mode([])
    out = {
        "layer_us": t_us,
        "layer_iqr_us": iqr,
        "layer_floor_us": floor_us,
        "layer_pct_of_floor": pct,
    }
    try:
        tf_us, _, pf, _ = run_mode(["fusedmoe"])
        out["layer_fusedmoe_us"] = tf_us
        out["layer_fusedmoe_pct_of_floor"] = pf
    except Exception as exc:  # keep the primary layer number
        out["layer_fusedmoe_error"] = f"{type(exc).__name__}: {exc}"[:200]
    return out


if __name__ == "__main__":
    main()
