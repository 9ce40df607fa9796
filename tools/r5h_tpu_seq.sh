#!/bin/bash
# Round-5 battery 8: MEASURE the slot-loop lookup's live HBM by ballast
# probing (tools/tpu_lookup_liveset_probe.py) — the census model's
# (2 + group) * cell term was anchor-fitted (axon reports no allocator
# counters); this turns it into a direct measurement. Fixed shapes:
# rows=406,528, w=512 (cell = 0.833 GB), table 0.134 GB, k i32 0.833 GB,
# acc 0.833 GB. Model prediction for max survivable ballast at ~15.5 GB
# usable: B(g) ~= 15.5 - 1.8 - g*0.833  ->  B(8) ~= 7.0, B(2) ~= 12.0,
# B(1) ~= 12.9. Ladder brackets each. rc 0 = survived, rc 3 = OOM
# (expected for the + rungs); sleep 90 s after any OOM (worker wedge).
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }
probe() {
  log "probe ballast=$1 group=$2"
  timeout 1800 tools/tpu_run.sh tools/tpu_lookup_liveset_probe.py "$1" "$2"
  rc=$?
  log "probe rc=$rc"
  if [ "$rc" -ne 0 ]; then
    log "cooling 90 s (worker wedge after OOM)"
    sleep 90
    timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
    log "canary rc=$?"
  fi
}

log "canary"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

# group 8: model says survives ~7.0 GB ballast
probe 5 8
probe 7 8
probe 9 8
probe 11 8

# group 2: model says survives ~12.0 GB
probe 10 2
probe 12 2
probe 13 2

# group 1: model says survives ~12.9 GB
probe 12 1
probe 13 1

log "battery done"
