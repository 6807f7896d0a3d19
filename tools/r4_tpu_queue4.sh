#!/bin/bash
# Round-4 TPU queue, part 4 — after queue2 finished and queue3 aborted on
# a transient post-OOM tunnel stall (wcsph_20M needs 19.95G > 15.75G HBM,
# now recorded). Serializes ALL TPU work:
#   1. wcsph_wide12M — the wide-hash row that fits HBM (>2^24 cells)
#   2. pbf_256k_settled re-run (first run overlapped a stray TPU client)
#   3. the queue3 probes: transposed re-run, 1M step profile, occupancy
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4q4}
mkdir -p "$OUT"
log() { echo "[r4q4 $(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

log "stage 0: tunnel health"
timeout 300 python -c "import jax,numpy as np,jax.numpy as jnp; \
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.arange(8.)))))" \
  >"$OUT/health.txt" 2>&1
if [ $? -ne 0 ]; then log "tunnel dead — aborting"; exit 1; fi
log "tunnel alive: $(tail -1 "$OUT/health.txt")"

log "stage 1: wcsph_wide12M (wide-hash at scale, fits HBM)"
timeout 7200 python bench.py --cases wcsph_wide12M >"$OUT/wide12M.json" 2>>"$OUT/queue.log"
log "wide12M: $(cat "$OUT/wide12M.json")"

log "stage 2: pbf_256k_settled re-run (contention check)"
timeout 3600 python bench.py --cases pbf_256k_settled >"$OUT/pbf_settled.json" 2>>"$OUT/queue.log"
log "pbf_settled: $(cat "$OUT/pbf_settled.json")"

log "stage 3: transposed-layout probe re-run (verdict stretch #7)"
timeout 3600 python tools/probe_transposed.py >"$OUT/transposed.txt" 2>&1
log "transposed rc=$?: $(tail -3 "$OUT/transposed.txt" | tr '\n' ' ')"

log "stage 4: step profile at 1M (fused defaults) for profile_r04"
timeout 3600 python tools/profile_step.py --n $((2**20)) --steps 20 \
  >"$OUT/profile_1M.txt" 2>&1
log "profile rc=$?: $(tail -6 "$OUT/profile_1M.txt" | tr '\n' ' ')"

log "stage 5: occupancy at production fused defaults, 1M"
timeout 3600 python tools/occupancy.py --n $((2**20)) \
  >"$OUT/occupancy.txt" 2>&1
log "occupancy rc=$?: $(tail -4 "$OUT/occupancy.txt" | tr '\n' ' ')"

log "queue4 done — results in $OUT"
