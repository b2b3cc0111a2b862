#!/usr/bin/env bash
# Sweep low-latency EP dispatch/combine configs on the virtual CPU mesh.
# Mirrors the reference's daily sweep (scripts/enumerate_test_low_latency.sh there:
# EP x tokens x hidden x topk x experts), hardware-free here.
set -euo pipefail
cd "$(dirname "$0")/.."

for tokens in 8 32; do
  for hidden in 64 256; do
    for topk in 4 8; do
      for experts in 16 32; do
        echo "== tokens=$tokens hidden=$hidden topk=$topk experts=$experts"
        SWEEP_TOKENS=$tokens SWEEP_HIDDEN=$hidden SWEEP_TOPK=$topk SWEEP_EXPERTS=$experts \
          python scripts/sweep_low_latency.py
      done
    done
  done
done
