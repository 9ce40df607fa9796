#!/bin/bash
# Round-3f serialized TPU measurement battery: GO-binary band enrichment
# past 100k nodes with the round-3d/3e HBM levers (keep_node_distances=False
# + bit-packed indicator bands). Single-tenant chip: one process at a time;
# each scale point in its own process per CLAUDE.md.
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "bench.py health check"
timeout 1800 tools/tpu_run.sh bench.py
log "bench rc=$?"

log "go:149760:4373:125:nodist"
timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py go:149760:4373:125:nodist
log "go149760 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary2 rc=$?"

log "go:199680:4373:125:nodist"
timeout 4800 tools/tpu_run.sh tools/tpu_bandstore_point.py go:199680:4373:125:nodist
log "go199680 rc=$?"

log "battery done"
