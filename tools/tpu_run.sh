#!/bin/bash
# Serialize access to the single-tenant tunneled TPU: retry while the grant
# from a previous process is still releasing ("Backend 'axon' is not in the
# list of known backends"). Output streams live (WARNING lines filtered).
# Usage: tools/tpu_run.sh script.py [args...]
set -u
for attempt in $(seq 1 12); do
  OUT=$(mktemp)
  PYTHONPATH=/root/repo:${PYTHONPATH:-} python "$@" 2>&1 | \
    grep --line-buffered -v WARNING | tee "$OUT"
  rc=${PIPESTATUS[0]}
  # retry only on FAILED runs whose output shows the grant contention (a
  # successful run may legitimately mention the message while self-recovering)
  if [ $rc -ne 0 ] && grep -q "not in the list of known backends" "$OUT"; then
    rm -f "$OUT"
    echo "[tpu_run] attempt $attempt: grant busy, retrying in 30s" >&2
    sleep 30
    continue
  fi
  rm -f "$OUT"
  exit $rc
done
echo "[tpu_run] gave up after 12 attempts" >&2
exit 1
