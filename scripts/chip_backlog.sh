#!/bin/bash
# Chip-validation backlog: run on the real TPU as soon as the axon tunnel is
# back.  Order matters: correctness smokes first, then the VERDICT-item
# benches.
#
# WEDGE PROTOCOL (round-4 findings): a hung Pallas kernel wedges the device
# for ~10-40 min after the process dies; plain-matmul recovery precedes
# Pallas-DMA recovery, so after any hang (a) kill the process, (b) leave the
# chip ALONE for >=10 min (failed probes reset the recovery clock), (c) rerun
# a known-good Pallas comm kernel (e.g. the non-monitored ragged a2a) as a
# canary before trusting any new result.  NEVER use pltpu.semaphore_read in
# any kernel -- a single read hangs this stack.
#
# Usage: scripts/chip_backlog.sh [logdir]   (default /tmp/chip_backlog)
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/chip_backlog}
mkdir -p "$LOG"
fail=0

run() {
  name=$1; shift
  echo "=== $name ==="
  timeout 900 "$@" 2>&1 | tee "$LOG/$name.log" | tail -5 || fail=1
}

# 1. correctness: every single-chip Pallas kernel vs golden (now incl. the
#    int8 KV cases for decode_mla / GQA / mla_prefill)
run smoke        python scripts/tpu_smoke.py
# 2. comm protocol self-loop (+ fault-injected timeout)
run smoke_comm   python scripts/tpu_smoke_comm.py
# 3. fused dispatch->GMM1 self-loop
run smoke_fused  python scripts/tpu_smoke_fused.py
# 4. FULL single-kernel fused MoE self-loop (VERDICT #1 chip half)
run smoke_full   python scripts/tpu_smoke_fused_full.py
# 5. model-level smoke
run smoke_model  python scripts/tpu_smoke_model.py
# 6. VERDICT #4: flagship decode layer (glue now fused into the GMM kernels;
#    target <= 850 us / >= 80% of the 680 us floor)
run bench_layer  python scripts/bench_layer.py
# 6b. same layer with the int8 latent cache (attention KV traffic halves)
run bench_layer_int8 python scripts/bench_layer.py int8kv
# 7. VERDICT #8: LoRA bgmv/sgmv vs roofline evidence
run bench_lora   python scripts/bench_lora.py
# 8. int8 KV decode bench (new): expect ~1.8-2x decode_mla at DeepSeek shapes
run bench_int8   python scripts/bench_int8_kv.py
# 8b. W8A8 dense decode layer (new): Llama-8B shapes, bf16 vs int8 weights
run bench_w8a8   python scripts/bench_w8a8.py
# 8c. model decode layer (the engine's jit unit): fused prologue + W8A8 MoE
run bench_model  python scripts/bench_model_layer.py fused
run bench_model_float python scripts/bench_model_layer.py float
# 9. driver-bench preview (BENCH_r02 twin)
run bench        python bench.py

echo; echo "logs in $LOG"; exit $fail
