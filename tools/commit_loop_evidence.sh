#!/bin/bash
# Copy the two-iteration loop run's evidence into the repo (VERDICT r2:
# loop evidence lives in-repo, never in /tmp) and write docs/loop_scale.md.
#
#   OUT=/tmp/loop_r3 bash tools/commit_loop_evidence.sh
#
# Commits nothing itself — review the diff, then git add docs/.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/loop_r3}
mkdir -p docs/loop_r3
# stage logs (trim the repeated axon platform warnings; keep the content)
for f in "$OUT"/logs/*.log; do
    grep -v "Platform 'axon' is experimental\|cpu_aot_loader" "$f" \
        > "docs/loop_r3/$(basename "$f")" || true
done
# tracker learning curves (small TSVs — the raw self-improvement signal)
for it in 1 2; do
    [ -f "$OUT/tracker_$it/log.tsv" ] && \
        cp "$OUT/tracker_$it/log.tsv" "docs/loop_r3/tracker_$it.tsv"
done
[ -f "$OUT/mdm_2/log.tsv" ] && cp "$OUT/mdm_2/log.tsv" docs/loop_r3/mdm_2.tsv
python tools/loop_summary.py "$OUT" > docs/loop_scale.md
echo "wrote docs/loop_scale.md + $(ls docs/loop_r3 | wc -l) files in docs/loop_r3/"
