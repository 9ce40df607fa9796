#!/bin/bash
# Round-5 battery 2: (a) verify-skill validation battery, (b) bench headline
# min-of-3 gate calibration, (c) bt-bucket cold-start measurement (VERDICT r5
# item 6 "done" criterion): euclid 1M at target 125 pays the cold compile at
# the BUCKETED shapes (bt 27->28), then target 110 (bt 25->28, same bucket,
# precomputed) must reuse every cached executable — its first_s should be
# near steady_s + host order/upload, not a multi-minute remote Mosaic compile.
# CPU-probe evidence: same-bucket radius change = 0 recompiles (273 cold).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "tpu_validate (verify skill battery)"
timeout 1800 tools/tpu_run.sh tools/tpu_validate.py
log "validate rc=$?"

log "bench.py (headline min-of-3 + regression gate)"
timeout 2400 tools/tpu_run.sh bench.py
log "bench rc=$?"

log "euclid:1M@125 cold at bucketed shapes (bt 28)"
timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py "euclid:1000000:125:nodist:bits"
log "euclid125 rc=$?"

log "euclid:1M@110 FRESH radius, same bt bucket (expect first_s ~ steady)"
timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py "euclid:1000000:110:nodist:bits"
log "euclid110 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "battery 2 done"
