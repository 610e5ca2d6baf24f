#!/bin/bash
# Post-loop evidence chain: waits for tools/loop_two_iter.sh (pid in
# /tmp/loop_r4.pid) to finish, then — only if the loop COMPLETED
# (dataset_3.yaml exists) — runs the remaining round-4 TPU evidence
# jobs back-to-back, committing after each stage so nothing is lost at
# a round boundary (VERDICT r3 item 1 evidence discipline):
#
#   1. tools/mdm2_sweep.py      -> docs/mdm_scale.md        (VERDICT item 4)
#   2. tools/fidelity_ab.py     -> docs/fidelity.md         (items 3 + 6)
#   3. tools/kin_gen_refscale.py-> docs/loop_r4/kin_gen_refscale.md
#                                  + appended to docs/loop_scale.md (item 1)
#
# Stages run strictly serialized (single axon TPU grant; 1-core host).
set -uo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
OUT=${OUT:-/tmp/loop_r4}
PIDFILE=${PIDFILE:-/tmp/loop_r4.pid}

log() { echo "[post_loop $(date -u +%H:%M:%S)] $*"; }

if [ -f "$PIDFILE" ]; then
    pid=$(cat "$PIDFILE")
    while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
if [ ! -f "$OUT/dataset_3.yaml" ]; then
    log "loop did not complete (no $OUT/dataset_3.yaml) — exiting so the"
    log "loop can be resumed instead of burning the TPU grant here"
    exit 1
fi
log "loop complete — running post-loop evidence chain"

log "stage 1/3: mdm2_sweep"
python tools/mdm2_sweep.py --run_dir "$OUT" \
    2>&1 | tee /tmp/mdm2_sweep.log
git add docs/mdm_scale.md docs/loop_r4 2>/dev/null || true
git commit -q -m "loop r4 evidence: MDM_2 dataset-diversity sweep (docs/mdm_scale.md)" \
    -- docs/mdm_scale.md docs/loop_r4 || true

log "stage 2/3: fidelity_ab (A/B + reference-data anchor)"
python tools/fidelity_ab.py --iters 400 --anchor_iters 1500 \
    2>&1 | tee /tmp/fidelity_ab.log
git add docs/fidelity.md || true
git commit -q -m "fidelity: re-sweep under hard-limit default + reference-data anchor" \
    -- docs/fidelity.md || true

log "stage 3/3: kin_gen_refscale"
python tools/kin_gen_refscale.py --mdm_dir "$OUT/mdm_1" \
    2>&1 | tee /tmp/kin_gen_refscale.log
# keep only the markdown table block it prints; loop_summary.py folds
# docs/loop_r4/kin_gen_refscale.md into the regenerated summary
awk '/^## Kin-gen wall-clock/{p=1} p' /tmp/kin_gen_refscale.log \
    > docs/loop_r4/kin_gen_refscale.md
python tools/loop_summary.py "$OUT" > docs/loop_scale.md || true
git add docs/loop_r4/kin_gen_refscale.md docs/loop_scale.md || true
git commit -q -m "loop r4 evidence: kin-gen reference-scale timing" \
    -- docs/loop_r4/kin_gen_refscale.md docs/loop_scale.md || true

log "post-loop evidence chain complete"
