#!/usr/bin/env bash
# Builder-side LEAKCHECK provenance (VERDICT r6 #8 / r7 #8 / r8 #2): the
# driver's LEAKCHECK.json records only {round, n_hits, hits}, which cannot
# prove WHAT tree the scan saw. This manifest stamps the scanned tree from
# the builder's side: every git-tracked file is sha256'd, and the sorted
# per-file digest list is itself sha256'd into one tree digest. Re-run any
# round with the round number as $1; commit the output next to
# LEAKCHECK.json so scan provenance is auditable per round.
set -euo pipefail
cd "$(dirname "$0")/.."
ROUND="${1:?usage: leakcheck_manifest.sh <round>}"
# exclude the manifest itself (self-reference: stamping changes it) and
# LEAKCHECK.json (driver-refreshed AFTER the builder stamps) — the r9
# verdict's byte-drift was exactly these two; everything else is stable
# at the stamped head, so the numbers reproduce bit-for-bit
FILES=$(git ls-files | grep -v -e '^LEAKCHECK_MANIFEST.json$' -e '^LEAKCHECK.json$' | sort)
N=$(printf '%s\n' "$FILES" | wc -l | tr -d ' ')
BYTES=$(printf '%s\n' "$FILES" | xargs -d '\n' wc -c | tail -1 | awk '{print $1}')
DIGEST=$(printf '%s\n' "$FILES" | xargs -d '\n' sha256sum | sort -k2 | sha256sum | awk '{print $1}')
HEAD_SHA=$(git rev-parse HEAD)
cat > LEAKCHECK_MANIFEST.json <<EOF
{"round": ${ROUND}, "files_scanned": ${N}, "bytes": ${BYTES}, "tree_sha256": "${DIGEST}", "git_head": "${HEAD_SHA}", "scope": "git ls-files minus LEAKCHECK_MANIFEST.json + LEAKCHECK.json (self-referential / driver-refreshed)"}
EOF
echo "LEAKCHECK_MANIFEST.json: ${N} files, ${BYTES} bytes, tree ${DIGEST:0:16}…"
