#!/bin/bash
# Round-5 battery 3: prove the CANONICAL-band bucketing (VERDICT r5 item 6
# "done" criterion). _bucket_band now maps every radius in a bt-bucket to the
# bucket's maximum band (band is a STATIC argname of the band pipelines, so
# same-bt-different-band still recompiled: 1M@110 paid 307 s after 1M@125 —
# tools/r5_results.log 19:48). Sequence: one cold compile at the canonical
# shapes (1M@125 -> band 6655), then a FRESH radius in the same bucket
# (1M@110 -> band 6655) whose first_s must be ~ steady + host order/upload,
# then bench.py with the r5-calibrated gate (expect rc=0).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "euclid:1M@125 cold at CANONICAL band (6655)"
timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py "euclid:1000000:125:nodist:bits"
log "euclid125 rc=$?"

log "euclid:1M@110 FRESH radius, same canonical band (expect first_s ~ steady)"
timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py "euclid:1000000:110:nodist:bits"
log "euclid110 rc=$?"

log "bench.py (r5-calibrated gate; expect rc=0)"
timeout 2400 tools/tpu_run.sh bench.py
log "bench rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "battery 3 done"
