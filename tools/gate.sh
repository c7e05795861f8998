#!/usr/bin/env bash
# One-command closing gate: pytest + full-registry oracle check + leak greps.
#
# Usage:  bash tools/gate.sh [--skip-pytest]
#
# Exits non-zero if any stage fails.  Run this before ending a session so
# the closing state of the repo is a single attested invocation:
#   1. pytest tests/ -x -q                    (unit + golden + property suite)
#   2. tools/check_oracles.py --fast          (ALL queries() vs oracle_sql()
#                                              at sf0.001 -> CORRECTNESS_LOCAL.json)
#   3. leak greps                             (no proprietary strings/URLs/keys)
#
# NOT covered (run separately; see README "Running"): bench.py and
# bench.py --scaling — perf evidence needs a healthy host window
# (tools/bench_watch.py), not a fixed gate.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"
skip_pytest=0
for arg in "$@"; do
  case "$arg" in
    --skip-pytest) skip_pytest=1 ;;
    *) echo "gate.sh: unknown argument: $arg" >&2; exit 2 ;;
  esac
done
fail=0

if [[ $skip_pytest -eq 0 ]]; then
  echo "== gate 1/3: pytest =="
  python -m pytest tests/ -x -q || fail=1
else
  echo "== gate 1/3: pytest SKIPPED (--skip-pytest) =="
fi

echo "== gate 2/3: full oracle registry (sf0.001) =="
python tools/check_oracles.py --fast || fail=1

echo "== gate 3/3: leak greps =="
# Patterns a public repo must never contain: internal package imports,
# non-public hosts/buckets, slack links, credential material.  Search the
# WHOLE tree (root markdown included — prose is where leaks land), minus
# VCS/venv dirs and this script's own pattern literals.
leaks=$(grep -rInE \
  'internal[._-]only|s3://(anthropic|internal)|AKIA[0-9A-Z]{16}|hooks\.slack\.com|x-api-key: *[A-Za-z0-9]' \
  --include='*.py' --include='*.md' --include='*.sh' --include='*.json' \
  --exclude-dir='.git' --exclude-dir='.claude' --exclude-dir='__pycache__' \
  . 2>/dev/null | grep -v '^\./tools/gate\.sh:' || true)
if [[ -n "$leaks" ]]; then
  echo "$leaks"
  echo "LEAK GREP HITS ^^^"
  fail=1
else
  echo "leak greps: 0 hits"
fi

if [[ $fail -eq 0 ]]; then
  echo "GATE: ALL GREEN"
else
  echo "GATE: FAILED"
fi
exit $fail
