#!/bin/bash
# Post-outage TPU work queue: waits for the axon tunnel, then runs the
# pending on-chip work in priority order. The axon tunnel can be down for
# hours (observed 5h+); `import jax; jax.devices()` hangs while it is.
# Probe in a bounded subprocess, never in a long-lived driver process
# (.claude/skills/verify/SKILL.md has the outage playbook).
#
# Order (VERDICT r03): parity FIRST -- kernels changed since the last
# on-chip run are unproven against Mosaic lowering until this passes --
# then the headline capture, then the perf micros that drive config
# decisions (grad_sort_mode / vertex_sort_mode / tier rebalance:
# the decision thresholds live in benchmarks/micro_scatter_stages.py and
# docs/DESIGN.md).
set -u
cd "$(dirname "$0")/.."

echo "=== waiting for TPU ==="
up=0
for i in $(seq 1 "${TPU_QUEUE_ATTEMPTS:-200}"); do
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU up after attempt $i"; up=1; break
  fi
  echo "attempt $i: TPU still down $(date +%H:%M:%S)"; sleep 60
done
if [ "$up" != 1 ]; then echo "TPU never came up; aborting queue"; exit 1; fi

echo "=== 1. on-chip parity tests (kernels unproven on Mosaic until green) ==="
DMESH2_TPU_TESTS=1 timeout 2700 python -m pytest tests/test_tpu_parity.py -q 2>&1 | tail -5

echo "=== 2. headline bench ==="
BENCH_ITERS=5 BENCH_HEADLINE_ONLY=1 timeout 2400 python -u bench.py 2>&1 | grep -v Platform

echo "=== 2b. headline A/B: iota grad sort + static vertex order ==="
BENCH_GRAD_SORT_MODE=iota BENCH_VERTEX_SORT_MODE=static \
  BENCH_ITERS=5 BENCH_HEADLINE_ONLY=1 timeout 2400 python -u bench.py 2>&1 | grep -v Platform

echo "=== 2c. headline A/B: fwd_subchunks=2 (piece-granular early exit) ==="
BENCH_FWD_SUBCHUNKS=2 \
  BENCH_ITERS=5 BENCH_HEADLINE_ONLY=1 timeout 2400 python -u bench.py 2>&1 | grep -v Platform

echo "=== 2d. headline A/B: fused prep (AA corners ride the corner gather) ==="
BENCH_PREP_MODE=fused \
  BENCH_ITERS=5 BENCH_HEADLINE_ONLY=1 timeout 2400 python -u bench.py 2>&1 | grep -v Platform

echo "=== 2e. headline A/B: bwd_subchunks=2 (piece-granular backward skip) ==="
BENCH_BWD_SUBCHUNKS=2 \
  BENCH_ITERS=5 BENCH_HEADLINE_ONLY=1 timeout 2400 python -u bench.py 2>&1 | grep -v Platform

echo "=== 3. micro_scatter_stages (scatter decomposition: iota vs payload, static vertex perm) ==="
timeout 3600 python -u benchmarks/micro_scatter_stages.py 2>&1 | grep -v Platform

echo "=== 3b. stage table, candidate config (iota + static vertex order) ==="
BENCH_GRAD_SORT_MODE=iota BENCH_VERTEX_SORT_MODE=static \
  PROF_ITERS=3 timeout 2400 python -u benchmarks/profile_stages.py 2>&1 | grep -v Platform

echo "=== 4. micro_gradcols (blocked vs unblocked sort operands) ==="
timeout 2400 python -u benchmarks/micro_gradcols.py 2>&1 | grep -v Platform

echo "=== 5. micro_prep ==="
timeout 2400 python -u benchmarks/micro_prep.py 2>&1 | grep -v Platform

echo "=== 5b. micro_vpu (VPU throughput calibration for the DESIGN roofline) ==="
timeout 1200 python -u benchmarks/micro_vpu.py 2>&1 | grep -v Platform

echo "=== 6. full bench (all 5 configs incl. 64-view opt) ==="
BENCH_ITERS=3 timeout 3600 python -u bench.py 2>&1 | grep -v Platform

echo "=== queue done ==="
