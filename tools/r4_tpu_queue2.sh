#!/bin/bash
# Round-4 TPU queue, part 2 — stages 0-3 of r4_tpu_queue.sh completed
# 2026-08-19 02:00-02:18 (wideprobe mod/wide/convert all zero-deficit at
# 150k AND in the 43M-cell pad-below regime, 10-step physics bit-exact,
# headline 1.594e7). Remaining: settled kscan, bench --all, wcsph_20M.
# Serializes ALL TPU work (CLAUDE.md: never two TPU clients at once).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4q2}
mkdir -p "$OUT"
log() { echo "[r4q2 $(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

log "stage 0: tunnel health"
timeout 300 python -c "import jax,numpy as np,jax.numpy as jnp; \
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.arange(8.)))))" \
  >"$OUT/health.txt" 2>&1
if [ $? -ne 0 ]; then log "tunnel dead — aborting"; exit 1; fi
log "tunnel alive: $(tail -1 "$OUT/health.txt")"

log "stage A: settled-regime block/win scan (finish roadmap #4; 152:512"
log "         = 33.56ms and 176:512 = 32.60ms already measured 02:18)"
timeout 6000 python tools/kscan.py --n 262144 --scene settled --fused 1 \
  --combos 128:512:1,152:384:1,152:640:1,176:640:1,208:512:1,176:384:1 \
  >"$OUT/kscan_settled.txt" 2>&1
log "kscan rc=$?: $(grep -c 'sum=' "$OUT/kscan_settled.txt") rows"

log "stage B: full bench table (BASELINE refresh, incl. multiphase_1M)"
timeout 18000 python bench.py --all >"$OUT/bench_all.jsonl" 2>>"$OUT/queue.log"
log "bench --all rc=$? ($(wc -l <"$OUT/bench_all.jsonl") rows)"

log "stage C: first real wide-mode row (mod-2^24, 43M cells)"
timeout 14000 python bench.py --cases wcsph_20M >"$OUT/wcsph_20M.json" 2>>"$OUT/queue.log"
log "wcsph_20M: $(cat "$OUT/wcsph_20M.json")"

log "queue2 done — results in $OUT"
