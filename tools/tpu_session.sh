#!/bin/bash
# One-shot TPU validation session: runs the TODO.md "PENDING TPU VALIDATION"
# checklist in order, one python process at a time (two TPU-backend processes
# deadlock on the tunnel), logging everything to /tmp/tpu_session/.
#
# Usage: bash tools/tpu_session.sh [quick]
#   quick = only the fast probes (textured + regen), skip the full bench.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_session
mkdir -p "$LOG"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$to" "$@" 2>&1 | tee "$LOG/$name.log" | tail -20
  echo "--- $name rc=$? ---"
}

# 0. Tunnel probe (fail fast if still down)
run probe 300 python -c "import jax, jax.numpy as jnp; \
print(float(jnp.ones((8,)).sum()), jax.devices())" || exit 1

# 1. In-kernel texture unit + one-hot winner fetch (ORT_FUSED_TEX=0 reverts)
run textured 2400 python tools/bench_quick.py textured

# 2. Path regeneration: flip _REGEN_DEFAULT in pallas_pt.py if regen wins
run regen 2400 python tools/bench_quick.py cornell regen

# 3. Knot per-stage profile -> next traversal lever
run profile_knot 2400 python tools/profile_knot.py

# 3b. Group-gated walk A/B (flip _group_walk_default when ON wins, then
#     rerun the knot numbers with ORT_GROUP_WALK=1)
run groupwalk 2400 python tools/bench_quick.py groupwalk
run knot_gated 2400 env ORT_GROUP_WALK=1 python tools/bench_quick.py knot

[ "${1:-}" = quick ] && exit 0

# 4. Full bench, twice: second run validates warm-cache compile < 120s
run bench_cold 5400 python bench.py
run bench_warm 3600 python bench.py

echo "All logs in $LOG/"
