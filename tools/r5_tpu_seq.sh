#!/bin/bash
# Round-5 battery 1: break the 349,440 x 4,373 single-chip census wall
# (VERDICT r5 item 1) with the HBM-plan-guarded f16 logsf residency, and
# re-run the 299,520 ceiling through the guard (regression check: the plan
# must still admit device-f32 there).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "canary (+ reported HBM bytes_limit)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:349440 wall point through the guard (expect logsf_out=f16)"
timeout 7200 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:349440:4373:125:nodist:bits"
log "go349440 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:299520 guard regression (expect logsf_out=device)"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:299520:4373:125:nodist:bits"
log "go299520 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "battery done"
