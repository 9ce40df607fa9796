#!/bin/bash
# Round-4 battery 4 (chained after tools/r4b_tpu_seq.sh; replaces r4c):
#   1. DIAGNOSE the 199,680-node GO steady wall (153.5 s in r4b vs 7.3 s at
#      149,760 — a 20x cliff for 1.33x the nodes): phase split first, then a
#      go: rerun that now records _hypergeom_engine_used;
#   2. band/dense crossover sweep (VERDICT r3 #7);
#   3. matmul_precision policy at 99,840 (VERDICT r3 #8);
#   4. bench.py band_scale shakeout (primes the driver's end-of-round run).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

if [ -f /tmp/r4b.pid ]; then
  while kill -0 "$(cat /tmp/r4b.pid)" 2>/dev/null; do sleep 60; done
  log "battery r4b finished; starting r4d"
fi

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "phases 199680x4373"
timeout 4200 tools/tpu_run.sh tools/tpu_bandgo_phases.py 199680 4373
log "phases rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:199680 rerun (engine-recording)"
timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:199680:4373:125:nodist:bits"
log "go rerun rc=$?"

for n in 14976 19968 26112 31872; do
  log "cross:$n"
  timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py "cross:$n"
  log "cross$n rc=$?"
done

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "prec:99840"
timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py prec:99840
log "prec rc=$?"

log "bench.py (band_scale shakeout + cache prime for the driver)"
timeout 5400 tools/tpu_run.sh bench.py
log "bench rc=$?"

log "battery done"
