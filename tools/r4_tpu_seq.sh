#!/bin/bash
# Round-4 battery 1: record the >=199,680-node GO-binary outcome (VERDICT r3
# directive 1) with the FULL lever stack (keep_node_distances=False + forced
# bit-packed indicator band), plus a stretch point if it fits.
# Single-tenant chip: one process at a time; each point in its own process.
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:199680:4373:125:nodist:bits"
timeout 4800 tools/tpu_run.sh tools/tpu_bandstore_point.py go:199680:4373:125:nodist:bits
rc1=$?
log "go199680 rc=$rc1"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary2 rc=$?"

if [ "$rc1" -eq 0 ]; then
  log "go:249600:4373:125:nodist:bits (stretch)"
  timeout 4800 tools/tpu_run.sh tools/tpu_bandstore_point.py go:249600:4373:125:nodist:bits
  log "go249600 rc=$?"
  log "canary (health re-check 2)"
  timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
  log "canary3 rc=$?"
fi

log "battery done"
