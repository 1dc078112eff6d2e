#!/bin/bash
# Round-4 measurement battery: run once when the TPU tunnel is healthy.
# Produces /tmp/r4_*.log; safe to re-run (compiles persist in _xla_cache).
set -x
cd "$(dirname "$0")/.."

# 0. tunnel sanity (fail fast if the tunnel is down)
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('sanity', np.asarray(jnp.arange(8).sum()))" || exit 1

# 1. headline + count (plan-cache steady state)
timeout 2400 python bench.py --fast --mb 32 2>&1 | tee /tmp/r4_device.log
timeout 1200 python bench.py --fast --mb 32 --mode device-count 2>&1 | tee /tmp/r4_count.log

# 2. stage-A breakdown (new masked_rows + cat probe)
timeout 1800 python scripts/profile_stage_a_v4.py 8 english 2>&1 | tee /tmp/r4_stagea.log
timeout 1800 python scripts/profile_stage_a_v4.py 8 cjk 2>&1 | tee /tmp/r4_stagea_cjk.log

# 3. CJK device, no native routing (merge-engine comparison)
timeout 1800 env JTOKKIT_TPU_NATIVE_LONG=0 python bench.py --fast --mb 4 \
  --flavor cjk 2>&1 | tee /tmp/r4_cjk_seq.log
timeout 2400 env JTOKKIT_TPU_NATIVE_LONG=0 JTOKKIT_TPU_EXACT_MIN_LANES=256 \
  python bench.py --fast --mb 4 --flavor cjk 2>&1 | tee /tmp/r4_cjk_exact.log

# 4. merge micro (round cost structure)
timeout 1800 python scripts/profile_merge_micro.py 2>&1 | tee /tmp/r4_merge.log
