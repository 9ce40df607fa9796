#!/bin/bash
# Round-3b serialized TPU measurement battery after the symmetric-FW and
# dynamic-count-lookup changes (single-tenant chip: one process at a time;
# each scale point in its own process per CLAUDE.md).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "bandgo production end-to-end 99840x4373"
timeout 3600 tools/tpu_run.sh tools/tpu_table_profile.py bandgo:99840:4373
log "bandgo rc=$?"

log "quant:99840"
timeout 2400 tools/tpu_run.sh tools/tpu_bandstore_point.py quant:99840
log "quant99840 rc=$?"

log "quant:149760"
timeout 2400 tools/tpu_run.sh tools/tpu_bandstore_point.py quant:149760
log "quant149760 rc=$?"

log "hop:99840"
timeout 3000 tools/tpu_run.sh tools/tpu_bandstore_point.py hop:99840
log "hop rc=$?"

log "battery done"
