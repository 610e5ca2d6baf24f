#!/bin/bash
# Stage loop-run evidence into the repo and COMMIT it — called after
# EVERY stage of tools/loop_two_iter.sh and from its 15-min heartbeat.
#
#   OUT=/tmp/loop_r4 bash tools/stage_evidence.sh <stage-name>
#
# /tmp is wiped between rounds (VERDICT r3 item 1): only evidence that
# is committed stage-by-stage survives. Big binaries (checkpoints, npz
# clips) stay in $OUT; what lands in git is the small text record —
# trimmed stage logs, learning-curve TSVs, dataset manifests, clip
# inventories — plus a regenerated docs/loop_scale.md summary.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/loop_r4}
STAGE=${1:?stage name}
# smoke runs override these so they never pollute the committed evidence
DOC=${EVIDENCE_DIR:-docs/loop_r4}
SUMMARY=${SUMMARY_MD:-docs/loop_scale.md}
mkdir -p "$DOC"

# trimmed stage logs (drop the repeated axon platform warnings)
for f in "$OUT"/logs/*.log; do
    if [ -f "$f" ]; then
        grep -v "Platform 'axon' is experimental\|cpu_aot_loader" "$f" \
            > "$DOC/$(basename "$f")" || true
    fi
done
# learning curves (the raw self-improvement signal)
for name in tracker_1 tracker_2 mdm_1 mdm_2; do
    if [ -f "$OUT/$name/log.tsv" ]; then
        cp "$OUT/$name/log.tsv" "$DOC/$name.tsv"
    fi
done
# dataset manifests (what each iteration trained on)
for y in "$OUT"/dataset_*.yaml "$OUT"/track_*.yaml; do
    if [ -f "$y" ]; then cp "$y" "$DOC/$(basename "$y")"; fi
done
# clip inventories: generated + physically-corrected recordings
for it in 1 2; do
    for kind in kin_gen recorded; do
        if [ -d "$OUT/${kind}_$it" ]; then
            (cd "$OUT/${kind}_$it" && ls -la --time-style=+%FT%T) \
                > "$DOC/${kind}_$it.txt" || true
        fi
    done
done

if [ ! -f "$DOC/STAGES.md" ]; then
    printf '# Loop r4 stage log\n\n| stage | UTC time |\n|---|---|\n' \
        > "$DOC/STAGES.md"
fi
echo "| $STAGE | $(date -u +%FT%TZ) |" >> "$DOC/STAGES.md"

python tools/loop_summary.py "$OUT" > "$SUMMARY" || true

if [ "${NO_COMMIT:-0}" = 1 ]; then
    echo "[stage_evidence] staged (no commit): $STAGE"
    exit 0
fi
git add "$DOC" "$SUMMARY" || true
# pathspec commit: never sweeps unrelated staged files into the evidence
# commit (the heartbeat runs concurrently with interactive work)
git commit -q -m "loop evidence: $STAGE" -- "$DOC" "$SUMMARY" \
    || true
echo "[stage_evidence] committed: $STAGE"
