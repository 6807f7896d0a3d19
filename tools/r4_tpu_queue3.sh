#!/bin/bash
# Round-4 TPU queue, part 3 — runs AFTER r4_tpu_queue2.sh completes
# (the launcher waits for "queue2 done" in /tmp/r4q2/queue.log).
# Stretch items: VERDICT #7 transposed-probe re-check under the fused
# 3-row-window constants, and a fused-engine occupancy reading at 1M.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4q3}
mkdir -p "$OUT"
log() { echo "[r4q3 $(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

log "stage 0: tunnel health"
timeout 300 python -c "import jax,numpy as np,jax.numpy as jnp; \
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.arange(8.)))))" \
  >"$OUT/health.txt" 2>&1
if [ $? -ne 0 ]; then log "tunnel dead — aborting"; exit 1; fi
log "tunnel alive"

log "stage A: occupancy at 1M, fused defaults (true pairs / slots)"
timeout 3000 python tools/occupancy.py --n 1048576 \
  >"$OUT/occupancy_1M.txt" 2>&1
log "occupancy rc=$?: $(tail -2 "$OUT/occupancy_1M.txt" | head -1)"

log "stage B: transposed-layout probe re-run (VERDICT r3 #7)"
timeout 3000 python tools/probe_transposed.py --m 1048576 \
  >"$OUT/probe_transposed_1M.txt" 2>&1
log "probe rc=$? (nonzero = the r2 INTERNAL error still stands)"
timeout 3000 python tools/probe_transposed.py --m 262144 \
  >"$OUT/probe_transposed_262k.txt" 2>&1
log "probe 262k rc=$?"

log "queue3 done — results in $OUT"
