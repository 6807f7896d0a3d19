#!/bin/bash
# Round-4 TPU queue, part 3 — post-bench probes. Waits for queue2
# ("queue2 done" in its log) so the tunnel is never shared between two
# TPU clients (CLAUDE.md), then runs:
#   1. probe_transposed re-run with round-4 constants (verdict stretch #7)
#   2. step profile at 1M for docs/profile_r04.md
#   3. occupancy at the production fused (152,512) config
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4q3}
Q2LOG=${2:-/tmp/r4q2/queue.log}
mkdir -p "$OUT"
log() { echo "[r4q3 $(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

log "waiting for queue2 ($Q2LOG)"
while ! grep -q "queue2 done" "$Q2LOG" 2>/dev/null; do sleep 60; done
log "queue2 finished"

log "stage 0: tunnel health"
timeout 300 python -c "import jax,numpy as np,jax.numpy as jnp; \
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.arange(8.)))))" \
  >"$OUT/health.txt" 2>&1
if [ $? -ne 0 ]; then log "tunnel dead — aborting"; exit 1; fi
log "tunnel alive: $(tail -1 "$OUT/health.txt")"

log "stage 1: transposed-layout probe re-run (verdict stretch #7)"
timeout 3600 python tools/probe_transposed.py >"$OUT/transposed.txt" 2>&1
log "transposed rc=$?: $(tail -3 "$OUT/transposed.txt" | tr '\n' ' ')"

log "stage 2: step profile at 1M (fused defaults) for profile_r04"
timeout 3600 python tools/profile_step.py --n $((2**20)) --steps 20 \
  >"$OUT/profile_1M.txt" 2>&1
log "profile rc=$?: $(tail -6 "$OUT/profile_1M.txt" | tr '\n' ' ')"

log "stage 3: occupancy at production fused defaults, 1M"
timeout 3600 python tools/occupancy.py --n $((2**20)) \
  >"$OUT/occupancy.txt" 2>&1
log "occupancy rc=$?: $(tail -4 "$OUT/occupancy.txt" | tr '\n' ' ')"

log "queue3 done — results in $OUT"
