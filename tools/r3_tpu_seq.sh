#!/bin/bash
# Round-3 serialized TPU measurement battery (single-tenant chip: one
# process at a time; each point in its own process per CLAUDE.md).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "phases 99840x4373 (slot-loop lookup validation)"
timeout 3000 tools/tpu_run.sh tools/tpu_bandgo_phases.py 99840 4373
log "phases rc=$?"

log "hop:99840 (landmark certificate hardware scale row)"
timeout 3000 tools/tpu_run.sh tools/tpu_bandstore_point.py hop:99840
log "hop rc=$?"

log "sort null 19968x64x250"
timeout 2400 tools/tpu_run.sh tools/tpu_sort_null_bench.py 19968 64 250
log "sort rc=$?"

log "battery done"
