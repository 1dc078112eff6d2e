#!/usr/bin/env bash
# Round-5 measurement protocol: reproduces every number in
# docs/perf-notes.md and perf/*.jsonl, logging INTO THE REPO (perf/logs/).
# Each step is independently skippable; all run on the attached TPU.
set -u
cd "$(dirname "$0")/.."
mkdir -p perf/logs

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ))" | tee -a perf/logs/r5.log
  timeout "$to" "$@" 2>&1 | grep -av WARNING | tee -a "perf/logs/${name}.log"
}

# 1. driver-protocol bench: headline + budget-boxed companions
run driver_bench 1800 python bench.py

# 2. compute-side ceiling + mode matrix (stable vs tunnel D2H variance)
run count32 1200 python bench.py --mode device-count --mb 32 --fast

# 3. weak scaling on the virtual CPU mesh (analysis in perf/README.md)
run scaling 2400 python bench.py --scaling --mb 16

# 4. honest stage decomposition (CSE-proof slopes)
run stage_a_parts 1200 python scripts/profile_stage_a_parts.py 8

# 5. wide-bucket hybrid merge: compile + merge-only throughput
run hybrid_probe 2400 python scripts/probe_exact_compile.py 512 1024

# 6. CJK device-only with the hybrid enabled (long compile; run last)
run cjk_hybrid 2400 env JTOKKIT_TPU_NATIVE_LONG=0 JTOKKIT_TPU_WIDE_MIN=256 \
  python bench.py --mode device-count --flavor cjk --mb 4 --fast
