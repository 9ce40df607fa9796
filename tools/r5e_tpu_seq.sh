#!/bin/bash
# Round-5 battery 5: the guard-before-prep fix (the r5d guardfail demo OOM'd
# INSIDE the operand prep — the full-device prep jit peaks at ~10 (N, A)
# cells because XLA materializes the twice-consumed f32 nan0; the guard ran
# after it). Now: (a) guardfail:399360x4373@125 must refuse cleanly BEFORE
# any (N, A) device staging and leave the process backend healthy; (b) the
# column-chunked prep (~2 cells peak) plus the prep-phase HBM model admit
# 399,360 x 4,373 at target 80 (plan: relax 14.0 GB of 14.08 admitted, f16
# logsf) — a NEW single-chip GO ceiling past the r5 349,440; (c) fallback
# at target 60 if the runtime band rounds past the plan; (d) canary.
set -u
cd /root/repo
log() { echo "=== [$(date +%H:%M:%S)] $*"; }

log "guardfail:399360x4373@125 (expect clean refusal + healthy backend)"
timeout 1800 tools/tpu_run.sh tools/tpu_bandstore_point.py "guardfail:399360:4373:125"
rc_guard=$?
log "guardfail rc=$rc_guard"

log "go:399360x4373@80 (new single-chip ceiling attempt, chunked prep + f16 logsf)"
timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:399360:4373:80:nodist:bits"
rc80=$?
log "go80 rc=$rc80"

if [ "$rc80" -ne 0 ]; then
  log "go:399360x4373@60 (fallback: runtime band exceeded the @80 plan)"
  timeout 5400 tools/tpu_run.sh tools/tpu_bandstore_point.py "go:399360:4373:60:nodist:bits"
  log "go60 rc=$?"
fi

log "canary (health re-check)"
timeout 1200 tools/tpu_run.sh tools/tpu_bandstore_point.py canary
log "canary rc=$?"

log "battery 5 done"
