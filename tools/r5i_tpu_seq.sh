#!/bin/bash
# Round-5 battery 9: finish what r5g started (the battery process was killed
# mid-run after the two headline points landed — 399,360x4,373@80 BROKEN at
# 28.7 s steady device/f32 g2, 349,440@125 upgraded to device/f32 g4 at
# 34.6 s; log tools/r5g_results.log). Remaining points, in safety order:
#   1. tpu_validate — the verify-skill battery (also a health check after
#      the killed holder; canary first to absorb any grant wedge),
#   2. 299,520@125 regression (expect device g8, steady ~29.5 s — the
#      lookup_group static argname means ONE fresh cold compile),
#   3. STRETCH 499,968x4,373@30 — half a million nodes x full GO width on
#      one chip (planner decides residency/group; f16 expected),
#   4. bench.py — headline + regression gate under the new signatures.
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "tpu_validate (verify skill battery)"
timeout 2400 tools/tpu_run.sh tools/tpu_validate.py
log "validate rc=$?"

log "go:299520x4373@125 regression (expect device g8, steady ~29.5 s)"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:299520:4373:125:nodist:bits"
log "go299520 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "STRETCH go:499968x4373@30 — half a million nodes x full GO width on one chip"
timeout 7200 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:499968:4373:30:nodist:bits"
log "go499968 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "bench.py (headline + gate)"
timeout 3600 tools/tpu_run.sh bench.py
log "bench rc=$?"

log "battery done"
