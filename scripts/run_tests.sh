#!/bin/bash
# Sharded test runner: three sequential pytest PROCESSES.
#
# A single-process `pytest tests -q` accumulates jit/tracing state across the
# ~190 tests and degrades ~2x on long runs; fresh processes per shard keep the
# wall time at the sum of the per-file costs.  Shards are balanced by measured
# cost (EP/comm interpret tests dominate).  Usage: scripts/run_tests.sh [extra
# pytest args].
set -uo pipefail
cd "$(dirname "$0")/.."

fail=0
EXTRA=("$@")
run() {
  echo "=== shard: $* ==="
  python -m pytest -q -p no:cacheprovider "${EXTRA[@]}" "$@" || fail=1
}

# shard 1: EP communication + distributed protocol
run tests/test_ep_dispatch.py tests/test_pallas_a2a.py tests/test_multi_round.py \
    tests/test_tp_allgather.py tests/test_layered.py tests/test_collective_ids.py

# shard 2: fused MoE + serving engine + spec decode
run tests/test_fused_moe.py tests/test_fused_full.py tests/test_engine.py \
    tests/test_spec_e2e.py tests/test_pipeline.py tests/test_ring_attention.py

# shard 3: kernels + models + everything else
run tests --ignore=tests/test_ep_dispatch.py --ignore=tests/test_pallas_a2a.py \
    --ignore=tests/test_multi_round.py --ignore=tests/test_tp_allgather.py \
    --ignore=tests/test_layered.py --ignore=tests/test_collective_ids.py \
    --ignore=tests/test_fused_moe.py --ignore=tests/test_fused_full.py \
    --ignore=tests/test_engine.py --ignore=tests/test_spec_e2e.py \
    --ignore=tests/test_pipeline.py --ignore=tests/test_ring_attention.py

exit $fail
