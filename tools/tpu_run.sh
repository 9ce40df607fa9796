#!/bin/bash
# Serialize access to the single-tenant tunneled TPU: retry while the grant
# from a previous process is still releasing ("Backend 'axon' is not in the
# list of known backends"). Usage: tools/tpu_run.sh script.py [args...]
set -u
OUT=$(mktemp)
for attempt in $(seq 1 12); do
  PYTHONPATH=/root/repo:${PYTHONPATH:-} python "$@" >"$OUT" 2>&1
  rc=$?
  if grep -q "not in the list of known backends" "$OUT"; then
    echo "[tpu_run] attempt $attempt: grant busy, retrying in 30s" >&2
    sleep 30
    continue
  fi
  grep -v WARNING "$OUT"
  rm -f "$OUT"
  exit $rc
done
echo "[tpu_run] gave up after 12 attempts" >&2
grep -v WARNING "$OUT"; rm -f "$OUT"
exit 1
