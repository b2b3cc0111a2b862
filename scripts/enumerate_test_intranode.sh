#!/usr/bin/env bash
# Sweep normal-mode (prefill) EP dispatch/combine configs on the virtual CPU mesh.
# Mirrors the reference's intranode CI matrix (pr-test-npu.yml: shapes × EPLB drop
# cases × multi-round) plus our transport backends, hardware-free here.
set -euo pipefail
cd "$(dirname "$0")/.."

for tokens in 16 32; do
  for experts in 16 32; do
    for int8 in 0 1; do
      echo "== tokens=$tokens experts=$experts int8=$int8"
      SWEEP_TOKENS=$tokens SWEEP_EXPERTS=$experts SWEEP_INT8=$int8 \
        python scripts/sweep_intranode.py
    done
  done
done

echo "== multi-round (long-seq) + drop + ragged backend"
SWEEP_TOKENS=32 SWEEP_ROUNDS=4 python scripts/sweep_intranode.py
SWEEP_DROP=0.3 python scripts/sweep_intranode.py
SWEEP_DROP=1.0 python scripts/sweep_intranode.py     # empty batch
SWEEP_BACKEND=pallas_ragged SWEEP_INT8=1 python scripts/sweep_intranode.py
