#!/bin/bash
# Crash-tolerant test suite runner.
#
# The XLA:CPU backend on this host segfaults roughly once per ~200
# fresh compiles (known flake, see NOTES_ROUND4.md); a monolithic
# pytest run then loses everything after the crash.  This runner
# executes pytest per test FILE, retries a file once when it dies with
# SIGSEGV (rc 139), and aggregates the results.
#
# Usage: ./run_suite.sh [extra pytest args...]   (default: -m "not slow")
set -u
ARGS=("$@")
if [ ${#ARGS[@]} -eq 0 ]; then
    ARGS=(-m "not slow")
fi
pass=0; fail=0; failed_files=()
for f in tests/test_*.py; do
    for attempt in 1 2; do
        python -m pytest "$f" "${ARGS[@]}" -q --no-header 2>&1 | tail -2
        rc=${PIPESTATUS[0]}
        if [ "$rc" -eq 139 ] || [ "$rc" -eq 134 ]; then
            echo "[run_suite] $f crashed (rc=$rc), attempt $attempt"
            continue
        fi
        break
    done
    if [ "$rc" -eq 0 ] || [ "$rc" -eq 5 ]; then   # 5 = no tests selected
        pass=$((pass+1))
    else
        fail=$((fail+1)); failed_files+=("$f")
    fi
done
echo "[run_suite] files passed: $pass, failed: $fail"
if [ "$fail" -gt 0 ]; then
    printf '[run_suite] failing: %s\n' "${failed_files[@]}"
    exit 1
fi
