#!/usr/bin/env bash
# Round-start ritual (r14 VERDICT item 3) — run FIRST each round, before
# any operator edit:
#
#   1. Commit the driver's round artifacts (BENCH_r*.json,
#      CORRECTNESS_r*.json, VERDICT.md, ADVICE.md, BENCH_HISTORY.jsonl)
#      if the driver left them uncommitted. The rotation ledger's
#      "tree equals what the driver checked" invariant depends on this
#      commit happening before step 2.
#   2. Refresh rotation_ledger.json from the newest CORRECTNESS_r*.json
#      (hashes the CURRENT modules — only correct while the tree still
#      equals the checked state, hence the ordering).
#   3. Commit the refreshed ledger.
#
# Idempotent: re-running on a clean, already-rotated tree is a no-op.
set -euo pipefail
cd "$(dirname "$0")"

ARTIFACTS=(BENCH_r*.json CORRECTNESS_r*.json VERDICT.md ADVICE.md \
           BENCH_HISTORY.jsonl COPYCHECK.json LEAKCHECK.json)

if ! git diff --quiet -- "${ARTIFACTS[@]}" 2>/dev/null \
   || [ -n "$(git ls-files --others --exclude-standard -- "${ARTIFACTS[@]}")" ]; then
    git add -- "${ARTIFACTS[@]}" 2>/dev/null || true
    git commit -m "Commit driver round artifacts before ledger rotation"
fi

# Refuse to rotate over a dirty tree: the ledger stamps CURRENT module
# hashes as "what the driver checked", which is a lie if modules changed.
# ':(glob)' pathspec: default git pathspec '**' does NOT match the
# package's top-level modules (catalog.py, session.py, ...) — r15
# ADVICE: uncommitted edits there passed this guard silently.
if ! git diff --quiet -- ':(glob)cqlcopy_spark/**/*.py' 'cqlcopy_spark/*.py' '__spark_entry__.py'; then
    echo "ERROR: operator modules have uncommitted edits — the ledger" >&2
    echo "would stamp unchecked content as driver-verified. Commit or" >&2
    echo "stash them, or accept the staleness and skip rotation." >&2
    exit 1
fi

python -m cqlcopy_spark.plans.rotation

if ! git diff --quiet -- rotation_ledger.json; then
    git add rotation_ledger.json
    git commit -m "Refresh rotation ledger from latest correctness round"
fi

echo "round_start: done (tree clean, ledger current)."
