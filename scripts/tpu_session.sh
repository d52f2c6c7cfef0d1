#!/bin/bash
# One serialized TPU measurement session (run ALONE — one tunnel client at
# a time).  Priority order: the measurements that decide engine defaults
# first, then the bench artifact, then the e2e ladders.  Each step logs to
# /tmp/tpu_session/ and a step failure does not stop later steps.
set -u
OUT=${1:-/tmp/tpu_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a "$OUT/session.log"
  timeout "${STEP_TIMEOUT:-2400}" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  echo "=== $name rc=$? ($(date))" | tee -a "$OUT/session.log"
}

# 0. chip-side kernel/parity regression first (cheap insurance: a Mosaic
#    lowering failure or VMEM overflow must surface before the sweeps)
STEP_TIMEOUT=900 run kernel_parity python scripts/kernel_parity_tpu.py

# 1. the round artifact — bench measures the default AND gather paths
#    itself, so even a short tunnel window captures the decisive numbers
run bench python bench.py

# 2. W=512 variant matrix: gather60/plan/pallas-syrk x Gram precision
run profile_w512 python scripts/profile_w512.py

# 3. ladders (e2e steady-state with the native host stages)
run ladder3 python scripts/ladder3_e2e.py
run ladder3_drift env LADDER3_DRIFT=1 LADDER3_REFINE=1 LADDER3_STEADY=0 \
    python scripts/ladder3_e2e.py
run ladder2 python scripts/ladder2_sift_e2e.py

# 4. SIFT per-stage breakdown (informs the <20 ms/img work)
run profile_sift python scripts/profile_sift.py

grep -h "" "$OUT"/*.out | tail -40
