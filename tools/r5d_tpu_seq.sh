#!/bin/bash
# Round-5 battery 4: (a) in-process radius sweeps — the PRIMARY bt-bucketing
# use-case (VERDICT r4 item 6): the second radius of each sweep lands in the
# same bt bucket, maps to the same canonical band, and must pay ~steady +
# host order rebuild, not a fresh multi-minute Mosaic compile; (b) the
# guardfail demo — the pre-dispatch HBM guard refuses 399,360 x 4,373 with a
# clean ValueError and the process backend stays healthy (the r4 behavior
# was a poisoned backend).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "sweepgo:199680x4373, targets 125 -> 110 (same bucket)"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "sweepgo:199680:4373:125:110"
log "sweepgo rc=$?"

log "sweepeuclid:1M, targets 125 -> 110 (same bucket)"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "sweepeuclid:1000000:125:110"
log "sweepeuclid rc=$?"

log "guardfail:399360x4373 (expect clean refusal + healthy backend)"
timeout 1800 tools/tpu_run.sh tools/tpu_bandstore_point.py "guardfail:399360:4373:125"
log "guardfail rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "battery 4 done"
