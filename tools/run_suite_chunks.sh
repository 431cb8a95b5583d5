#!/usr/bin/env bash
# Run the full test suite as sequential chunks that each fit a ~10-minute
# window on a slow (1-core) rig. Rationale (STATUS.md): the 8-virtual-
# device collective tests SIGABRT when starved >~40 s under host
# contention, and the whole suite (330+ tests) exceeds a single window —
# so run chunks SOLO, never concurrently with other heavy processes.
#
# Usage: bash tools/run_suite_chunks.sh [extra pytest args...]
# Exit: non-zero if any chunk fails; prints a per-chunk summary.
set -u
cd "$(dirname "$0")/.."

declare -a NAMES=(
  "base"         # fast single-device tests
  "heavy"        # compile-heavy caches / DPT twins / interpret kernels
  "multidevice"  # 8-virtual-device collective tests (run solo!)
  "cli"          # the big CLI end-to-end file
  "e2e"          # remaining engine/serving end-to-end tests
)
declare -a ARGS=(
  "-m not multidevice and not e2e and not heavy"
  "-m heavy"
  "-m multidevice"
  "tests/test_cli.py"
  "-m e2e --ignore=tests/test_cli.py"
)

fail=0
summary=""
for i in "${!NAMES[@]}"; do
  name="${NAMES[$i]}"
  echo "=== chunk $name: pytest ${ARGS[$i]} ==="
  start=$(date +%s)
  # shellcheck disable=SC2086
  if [ "${ARGS[$i]#-m}" != "${ARGS[$i]}" ]; then
    python -m pytest tests/ -m "${ARGS[$i]#-m }" -q "$@"
  else
    python -m pytest ${ARGS[$i]} -q "$@"
  fi
  rc=$?
  dt=$(( $(date +%s) - start ))
  summary+="$name: rc=$rc ${dt}s"$'\n'
  [ $rc -ne 0 ] && fail=1
done
echo "=== suite chunk summary ==="
printf '%s' "$summary"
exit $fail
