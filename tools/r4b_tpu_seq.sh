#!/bin/bash
# Round-4 battery 2: the GO-binary ceiling with the HBM diet landed
# (int8 operands, deferred NES, annotation-upload release — see
# ops/enrich_band.hypergeom_band_table). Re-runs the 199,680-node point
# that OOM'd pre-diet (tools/r4_results.log) and walks the ceiling up.
# Single-tenant chip: one process at a time; each point in its own process.
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

for n in 199680 249600 299520; do
  log "go:$n:4373:125:nodist:bits"
  timeout 4800 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:$n:4373:125:nodist:bits"
  rc=$?
  log "go$n rc=$rc"
  log "canary (health re-check)"
  timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
  log "canary rc=$?"
  if [ "$rc" -ne 0 ]; then
    log "stopping the walk at the first failing point"
    break
  fi
done

log "battery done"
