#!/usr/bin/env bash
# Run the full test suite as sequential chunks that each fit a ~10-minute
# window on a slow (1-core) rig. Rationale (STATUS.md): the 8-virtual-
# device collective tests SIGABRT when starved >~40 s under host
# contention, and the whole suite (355 tests) exceeds a single window —
# so run chunks SOLO, never concurrently with other heavy processes.
#
# Usage: bash tools/run_suite_chunks.sh [extra pytest args...]
# Exit: non-zero if any chunk fails; prints a per-chunk summary.
set -u
cd "$(dirname "$0")/.."

fail=0
summary=""

chunk() {
  local name="$1"; shift
  echo "=== chunk $name: pytest $* ==="
  local start rc dt
  start=$(date +%s)
  python -m pytest -q "$@" ${EXTRA[@]+"${EXTRA[@]}"}
  rc=$?
  dt=$(( $(date +%s) - start ))
  summary+="$name: rc=$rc ${dt}s"$'\n'
  [ $rc -ne 0 ] && fail=1
}

EXTRA=("$@")
chunk base        tests/ -m "not multidevice and not e2e and not heavy"
chunk heavy       tests/ -m heavy
chunk multidevice tests/ -m multidevice
chunk cli         tests/test_cli.py
chunk e2e         tests/ -m e2e --ignore=tests/test_cli.py

echo "=== suite chunk summary ==="
printf '%s' "$summary"
exit $fail
