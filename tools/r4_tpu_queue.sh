#!/bin/bash
# Round-4 TPU measurement queue — run when the axon tunnel is back.
# Serializes ALL TPU work (CLAUDE.md: never two TPU clients at once).
# Usage: bash tools/r4_tpu_queue.sh [outdir]   (default /tmp/r4q)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4q}
mkdir -p "$OUT"
log() { echo "[r4q $(date +%H:%M:%S)] $*" | tee -a "$OUT/queue.log"; }

log "stage 0: tunnel health"
timeout 300 python -c "import jax,numpy as np,jax.numpy as jnp; \
print(jax.devices()); print(float(np.asarray(jnp.sum(jnp.arange(8.)))))" \
  >"$OUT/health.txt" 2>&1
if [ $? -ne 0 ]; then log "tunnel still dead — aborting"; exit 1; fi
log "tunnel alive: $(head -1 "$OUT/health.txt")"

log "stage 1: wideprobe forced-wide A/B at 150k (mod first, then bitcast)"
timeout 3000 python tools/wideprobe.py --n 150000 --modes mod,wide,convert,raw \
  >"$OUT/wideprobe_150k.txt" 2>&1
log "wideprobe rc=$? — $(grep -c 'deficit' "$OUT/wideprobe_150k.txt") deficit lines"

log "stage 2: wideprobe true >2^24-cell regime (pad-below; mod hv may alias"
log "         legitimately — judge physics NaN/overflow, not hv equality)"
timeout 3000 python tools/wideprobe.py --n 150000 --pad-below 4100 \
  --modes mod,wide >"$OUT/wideprobe_pad.txt" 2>&1
log "pad-below rc=$?"

log "stage 2b: physics A/B — 10 full steps per mode vs exact reference"
timeout 3000 python tools/wideprobe.py --n 150000 --steps 10 \
  --modes mod,wide >"$OUT/wideprobe_steps.txt" 2>&1
log "steps small-grid rc=$? (mod/wide expect max|dpos|=0 exactly)"
timeout 3000 python tools/wideprobe.py --n 150000 --steps 10 \
  --pad-below 4100 --modes mod >"$OUT/wideprobe_steps_pad.txt" 2>&1
log "steps pad-below rc=$? (vs segments oracle; order-noise only)"

log "stage 3: headline sanity (wcsph_1M, fused defaults)"
timeout 3000 python bench.py --cases wcsph_1M >"$OUT/wcsph_1M.json" 2>>"$OUT/queue.log"
log "headline: $(cat "$OUT/wcsph_1M.json")"

log "stage 4: settled-regime block/win scan (roadmap #4)"
timeout 6000 python tools/kscan.py --n 262144 --scene settled --fused 1 \
  --combos 152:512:1,176:512:1,128:512:1,152:384:1,152:640:1,176:640:1,208:512:1 \
  >"$OUT/kscan_settled.txt" 2>&1
log "kscan rc=$?"

log "stage 5: full bench table (BASELINE refresh)"
timeout 14000 python bench.py --all >"$OUT/bench_all.jsonl" 2>>"$OUT/queue.log"
log "bench --all rc=$? ($(wc -l <"$OUT/bench_all.jsonl") rows)"

log "stage 6: first real wide-mode row (only meaningful if stages 1-2 clean)"
timeout 14000 python bench.py --cases wcsph_20M >"$OUT/wcsph_20M.json" 2>>"$OUT/queue.log"
log "wcsph_20M: $(cat "$OUT/wcsph_20M.json")"

log "queue done — results in $OUT"
