#!/bin/bash
# Round-4 battery 3 (chained after tools/r4b_tpu_seq.sh):
#   1. band/dense crossover sweep (VERDICT r3 #7) — same workload through
#      the dense window-banded engine and the forced band-storage engine,
#      14,976..31,872 nodes, to set SAFE.band_storage_min_nodes from
#      measurement instead of the hard-coded 32768;
#   2. large-N null precision policy (VERDICT r3 #8) — matmul_precision
#      'highest' vs 'default' at 99,840 nodes, tie movement in count units;
#   3. bench.py shakeout — the new band_scale block (49,920 x 2,048) has
#      never run on hardware; this primes the compile cache so the driver's
#      end-of-round bench run is steady, and records the first real numbers.
# Single-tenant chip: one point per process.
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

if [ -f /tmp/r4b.pid ]; then
  while kill -0 "$(cat /tmp/r4b.pid)" 2>/dev/null; do sleep 60; done
  log "battery r4b finished; starting r4c"
fi

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

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
