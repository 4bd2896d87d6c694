#!/bin/bash
# Crash-tolerant test suite runner.
#
# The XLA:CPU backend on this host segfaults roughly once per ~200
# fresh compiles (known flake, see NOTES_ROUND4.md); a monolithic
# pytest run then loses everything after the crash.  This runner
# executes pytest per test FILE, retries a file once when it dies with
# SIGSEGV (rc 139), and aggregates the results.  Every crash is
# appended to .flake_log (timestamp, file, rc) so the flake's frequency
# stays bounded by evidence rather than anecdote.
#
# Tiers:
#   ./run_suite.sh                 fast tier (-m "not slow")
#   ./run_suite.sh --slow          slow tier only (-m slow): e2e ecoli-1K,
#                                  golden saves, reference-vs-ours
#   ./run_suite.sh --all           everything
#   ./run_suite.sh [pytest args]   custom
#
# The slow tier is the end-to-end correctness gate: run it (in addition
# to the fast tier) before any round-end commit.
set -u
ARGS=("$@")
if [ ${#ARGS[@]} -eq 0 ]; then
    ARGS=(-m "not slow")
elif [ "${ARGS[0]}" == "--slow" ]; then
    ARGS=(-m "slow" "${ARGS[@]:1}")
elif [ "${ARGS[0]}" == "--all" ]; then
    ARGS=("${ARGS[@]:1}")
fi
FLAKELOG=".flake_log"
pass=0; fail=0; failed_files=()
for f in tests/test_*.py; do
    for attempt in 1 2; do
        python -m pytest "$f" "${ARGS[@]}" -q --no-header 2>&1 | tail -2
        rc=${PIPESTATUS[0]}
        if [ "$rc" -eq 139 ] || [ "$rc" -eq 134 ]; then
            echo "[run_suite] $f crashed (rc=$rc), attempt $attempt"
            echo "$(date -Is) $f rc=$rc attempt=$attempt" >> "$FLAKELOG"
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
if [ -f "$FLAKELOG" ]; then
    echo "[run_suite] XLA:CPU crash flake count to date: $(wc -l < "$FLAKELOG")"
fi
if [ "$fail" -gt 0 ]; then
    printf '[run_suite] failing: %s\n' "${failed_files[@]}"
    exit 1
fi
