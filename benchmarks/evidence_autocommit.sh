#!/bin/bash
# Commit campaign evidence as it lands so a VM/tunnel loss mid-round can't
# erase optimization trajectories again (round-3 failure mode). Runs beside
# the TPU queue; commits ONLY benchmarks/evidence (never source files) every
# ~15 min when something changed.
set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r5_autocommit.pid
while :; do
  sleep 900
  git add -A benchmarks/evidence 2>/dev/null
  # Pathspec'd commit: a plain `git commit` would sweep anything a
  # concurrent session has staged into an "evidence autocommit" message.
  if ! git diff --cached --quiet -- benchmarks/evidence; then
    changed=$(git diff --cached --name-only -- benchmarks/evidence \
      | sed 's|benchmarks/evidence/||' | cut -d/ -f1 | sort -u | tr '\n' ' ')
    git commit -q -m "evidence autocommit: ${changed}" \
      -m "No-Verification-Needed: campaign evidence files only, no source change" \
      -- benchmarks/evidence
    echo "$(date '+%F %T') committed: ${changed}" >> /tmp/r5_autocommit.log
  fi
done
