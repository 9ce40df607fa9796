#!/bin/bash
# Round-5 battery 7: break the 399,360x4,373@80 census wall with the
# lookup-group lever. Diagnosis (r5f data, CLAUDE.md): the slot-loop lookup
# (ops/hypergeom_table._lookup_slot_loop, group=8) keeps up to 8 (n, chunk)
# f32 gather outputs LIVE per fori step — ~6.7 GB at 399,360x512, entirely
# absent from the old census model. Modeling census peak as
# resident + table + (2 + group)*chunk-cells makes ALL THREE measured
# anchors consistent (299,520 dev g8 = 14.75 RAN; 349,440 f16 g8 = 14.07
# RAN; 399,360@80 f16 g8 = 15.95 OOM) against a 15.04 GB admit line
# (CENSUS_SAFETY = 0.94). The planner now walks (residency x group):
#   * 399,360@80  -> expect device/f32 group=2 (modeled 14.45, BELOW the
#     largest measured-safe peak) — the r5e/r5f wall, now a record point;
#   * 349,440@125 -> expect device/f32 group=4 (upgrade from f16);
#   * 299,520@125 -> expect device/f32 group=8 (unchanged, no perf tax).
# NOTE: lookup_group is a new static argname — every point pays a fresh
# cold compile. Canary between risky points (OOM poisons the backend).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:399360x4373@80 — THE WALL (expect logsf_out=device lookup_group=2)"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:399360:4373:80:nodist:bits"
log "go399360 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:349440x4373@125 (expect device g4 — fidelity upgrade from f16)"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:349440:4373:125:nodist:bits"
log "go349440 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:299520x4373@125 regression (expect device g8, steady ~29.5 s)"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:299520:4373:125:nodist:bits"
log "go299520 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "STRETCH go:499968x4373@30 — half a million nodes x full GO width on one chip (expect f16 g2)"
timeout 7200 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:499968:4373:30:nodist:bits"
log "go499968 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "tpu_validate (verify skill battery)"
timeout 2400 tools/tpu_run.sh tools/tpu_validate.py
log "validate rc=$?"

log "bench.py (headline + gate; band-scale phase recompiles once under the new signature)"
timeout 3600 tools/tpu_run.sh bench.py
log "bench rc=$?"

log "battery done"
