#!/usr/bin/env bash
# End-of-round snapshot gate (VERDICT r10 "What's wrong" #1, owed since
# round 8): the round's LAST commit must be produced by this script, so
# the gates run AFTER the last content edit — never edit-then-commit
# with the suite unverified.
#
# Usage: tools/snapshot.sh "commit message"
#   1. refuses to run with nothing to commit
#   2. runs the full ScalaTest suite (QtestSpec + NegativeQtestSpec +
#      CensusSpec + every unit spec) at the working tree
#   3. runs tools/census.py (doc-count drift)
#   4. commits ONLY if both are green
set -euo pipefail
cd "$(dirname "$0")/.."

msg="${1:?usage: tools/snapshot.sh \"commit message\"}"

if git diff --quiet && git diff --cached --quiet \
    && [ -z "$(git status --porcelain)" ]; then
  echo "snapshot: nothing to commit" >&2
  exit 1
fi

echo "snapshot: running full suite at working tree..."
if ! sbt -batch test > /tmp/snapshot_sbt_test.log 2>&1; then
  echo "snapshot: SUITE RED — refusing to commit." >&2
  grep -E "\*\*\* FAILED|TESTS FAILED|error\]" /tmp/snapshot_sbt_test.log \
    | tail -20 >&2
  exit 1
fi
tail -5 /tmp/snapshot_sbt_test.log

echo "snapshot: running census..."
if ! python3 tools/census.py; then
  echo "snapshot: census DRIFT — refusing to commit." >&2
  exit 1
fi

git add -A
git commit -m "$msg"
echo "snapshot: committed green."
