#!/bin/bash
# Round-4 battery 5b: the r4e tail (the r4e parent was stopped after
# go:249600 so tools/tpu_validate.py could take the chip for the /verify
# battery). Chains behind any pid in /tmp/r4e_point.pid.
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

if [ -f /tmp/r4e_point.pid ]; then
  while kill -0 "$(cat /tmp/r4e_point.pid)" 2>/dev/null; do sleep 30; done
  log "prior holder done; starting r4e2"
fi

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "go:349440 ceiling attempt"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:349440:4373:125:nodist:bits"
log "go349440 rc=$?"

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

for n in 7488 9984 12480; do
  log "cross:$n"
  timeout 3600 tools/tpu_run.sh tools/tpu_bandstore_point.py "cross:$n"
  log "cross$n rc=$?"
done

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "bench.py (shakeout + cache prime for the driver)"
timeout 5400 tools/tpu_run.sh bench.py
log "bench rc=$?"

log "battery done"
