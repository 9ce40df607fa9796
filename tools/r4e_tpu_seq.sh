#!/bin/bash
# Round-4 battery 5 (after r4d):
#   1. go:249600 CLEAN steady row — r4b measured 358 s steady because every
#      run re-derived the band operands from a fresh 3.49 GB annotation
#      re-upload; safe.py now caches them across runs (r4d: 199,680 went
#      153.5 -> 11.6 s). The compile cache should serve r4b's executables.
#   2. go:349440 attempt — next GO-binary ceiling point (fw f32 band
#      ~11.7 GB by the n^1.5 scaling law; isolated process, canary after).
#   3. cross:7488 / 9984 / 12480 — locate the band/dense crossover from
#      BELOW (r4d: band already wins at 14,976 by 1.25x; dense OOMs at
#      31,872).
#   4. bench.py shakeout (primes the driver's end-of-round cache).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:249600 clean rerun (operand cache)"
timeout 4200 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:249600:4373:125:nodist:bits"
log "go249600 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:349440 ceiling attempt"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:349440:4373:125:nodist:bits"
log "go349440 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

for n in 7488 9984 12480; do
  log "cross:$n"
  timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py "cross:$n"
  log "cross$n rc=$?"
done

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "bench.py (shakeout + cache prime for the driver)"
timeout 5400 tools/tpu_run.sh bench.py
log "bench rc=$?"

log "battery done"
