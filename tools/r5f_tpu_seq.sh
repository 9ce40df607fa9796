#!/bin/bash
# Round-5 battery 6: CALIBRATE the census HBM model against REAL allocator
# peaks (CLAUDE.md round-5 open item: the @80 ceiling attempt OOM'd in the
# census chunk loop despite a modeled 10.8 GB admission, while 299,520@125
# device-f32 runs at modeled 11.2 — the model under-counts something that
# scales with n*A). SAFEPY_TPU_HBM_TRACE=1 samples memory_stats() at the
# prep/relax/census boundaries and per census chunk (safepy_tpu/hbm.py
# record_peak); the go: spec prints an hbm_trace JSON line with real vs
# modeled phase peaks. Also banks the bench gate proof (rc=0 with the
# r5-recalibrated constants) BEFORE the risky wall point, and re-attempts
# 399,360x4,373@80 with the K-transient fix (the census no longer eagerly
# astype(f32)s the full int8 annotation matrix — 6.98 GB at that shape).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "tpu_validate (verify skill battery)"
timeout 2400 tools/tpu_run.sh tools/tpu_validate.py
log "validate rc=$?"

log "bench.py (r5-calibrated gate; expect rc=0)"
timeout 2400 tools/tpu_run.sh bench.py
log "bench rc=$?"

log "TRACE go:299520x4373@125 (known-good device-f32 point; modeled census 11.2)"
SAFEPY_TPU_HBM_TRACE=1 timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:299520:4373:125:nodist:bits"
log "go299520 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "TRACE go:349440x4373@125 (known-good f16 point; modeled census 9.73)"
SAFEPY_TPU_HBM_TRACE=1 timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:349440:4373:125:nodist:bits"
log "go349440 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "TRACE go:399360x4373@80 (the r5e census wall, retried with the K-transient fix)"
SAFEPY_TPU_HBM_TRACE=1 timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:399360:4373:80:nodist:bits"
log "go399360 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "battery 6 done"
