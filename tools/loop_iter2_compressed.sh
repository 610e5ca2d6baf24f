#!/bin/bash
# Compressed iteration 2 of the PARC self-improvement loop — used when
# the round's wall-clock cannot fit tools/loop_two_iter.sh's full
# iteration 2 (per-style kin-gen compiles against the grown dataset's
# new MotionLib shapes cost ~15 min each on the cold remote cache).
#
# Same stages and evidence discipline as loop_two_iter.sh run_iter 2 +
# the MDM_2 warm-start (reference parc_0_setup_iter.py:11,72-76
# input_model_path chaining); compressed in SCOPE, not in kind:
#   - kin_gen_2: KG2_MIX styles (default all 4, matching iteration 1 so
#     MDM_2 vs MDM_1 keep-rates compare like-for-like).
#   - tracker_2: ITERS2 (default 1500) PPO iters @4096 envs.
#   - MDM_2: MDM_EPOCHS warm-started epochs on the grown dataset
#     (default 300: takes the 300-epoch MDM_1 to the ~600-epoch
#     operating point the reference-scale study calls for).
# Everything else (record, dataset_3 manifest) is at
# loop_two_iter.sh scale.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
export OUT=${OUT:-/tmp/loop_r4}
ITERS2=${ITERS2:-1500}
MDM_EPOCHS=${MDM_EPOCHS:-300}
KG2_MIX=${KG2_MIX:-"boxes:5 stairs:3 paths:3 file:3"}
FILE_TERRAIN=${FILE_TERRAIN:-/root/reference/data/terrains/TEASER_TERRAIN.pkl}

log() { echo "[iter2c $(date +%H:%M:%S)] $*"; }
evidence() { bash tools/stage_evidence.sh "$1" || true; }

( while true; do sleep 900; bash tools/stage_evidence.sh heartbeat \
      >/dev/null 2>&1 || true; done ) &
HB_PID=$!
trap 'kill $HB_PID 2>/dev/null || true' EXIT

evidence record_1

# next-iteration dataset = seed + iteration-1 recordings
mkdir -p "$OUT/motions_iter_2"
ln -sfn "$OUT/seed_motions/base" "$OUT/motions_iter_2/base"
ln -sfn "$OUT/recorded_1" "$OUT/motions_iter_2/recorded_1"
python -m parc_tpu.pipeline.cli create_dataset \
    --motions_dir "$OUT/motions_iter_2" --out "$OUT/dataset_2.yaml" \
    2>&1 | tee "$OUT/logs/create_dataset_2.log"
evidence dataset_2

# MDM_2: warm-started from MDM_1, continued on the grown dataset.
# Always invoked: train_mdm resumes from out_dir checkpoints (a
# checkpoint already in out_dir wins over init_from), so re-running
# after a crash/restart completes an interrupted run instead of
# leaving MDM_2 under-trained (ADVICE r4).
cat > "$OUT/mdm2.yaml" <<YAML
batch_size: 512
iters_per_epoch: 50
epochs_per_checkpoint: 40
epochs_per_output: 5
YAML
python -m parc_tpu.pipeline.cli train_mdm \
    --dataset "$OUT/dataset_2.yaml" --out_dir "$OUT/mdm_2" \
    --max_epochs "$MDM_EPOCHS" --config "$OUT/mdm2.yaml" \
    --init_from "$OUT/mdm_1" \
    2>&1 | tee -a "$OUT/logs/train_mdm_2.log"
evidence mdm_2

# kin_gen_2 (compressed mix)
mkdir -p "$OUT/kin_gen_2"
seed_base=2000
for pair in $KG2_MIX; do
    style=${pair%%:*}; count=${pair##*:}
    if [ "$(ls "$OUT/kin_gen_2" | grep -c "^${style}_" || true)" -ge "$count" ]; then
        log "kin_gen_2/$style: reusing existing clips"; continue
    fi
    log "kin_gen_2: style=$style count=$count"
    tpb=$(( count < 4 ? count : 4 ))
    if [ "$style" = file ]; then
        cat > "$OUT/kg2_$style.yaml" <<YAML
terrain_style: file
terrain_files: ["$FILE_TERRAIN"]
terrains_per_batch: $tpb
YAML
    else
        cat > "$OUT/kg2_$style.yaml" <<YAML
terrain_style: $style
terrains_per_batch: $tpb
YAML
    fi
    python -m parc_tpu.pipeline.cli kin_gen \
        --dataset "$OUT/dataset_2.yaml" --mdm_dir "$OUT/mdm_2" \
        --out_dir "$OUT/kin_gen_2" --num_motions "$count" \
        --seed $seed_base --config "$OUT/kg2_$style.yaml" \
        2>&1 | tee -a "$OUT/logs/kin_gen_2.log"
    seed_base=$((seed_base + 100))
    evidence "kin_gen_2_${style}"
done

# tracker_2 dataset = dataset_2 motions + generated clips
mkdir -p "$OUT/motions_track_2"
for d in "$OUT/motions_iter_2"/*/ "$OUT/seed_motions"/*/; do
    [ -d "$d" ] && ln -sfn "${d%/}" \
        "$OUT/motions_track_2/$(basename "${d%/}")" || true
done
ln -sfn "$OUT/kin_gen_2" "$OUT/motions_track_2/generated"
python -m parc_tpu.pipeline.cli create_dataset \
    --motions_dir "$OUT/motions_track_2" --out "$OUT/track_2.yaml" \
    2>&1 | tee "$OUT/logs/create_dataset_track_2.log"
evidence track_manifest_2

# Always invoked: train_tracker resumes from out_dir checkpoints, so a
# re-run completes an interrupted run rather than recording from a
# half-trained tracker (ADVICE r4).
log "tracker_2: start (@4096 envs, $ITERS2 iters)"
python -m parc_tpu.pipeline.cli train_tracker \
    --dataset "$OUT/track_2.yaml" --out_dir "$OUT/tracker_2" \
    --num_envs 4096 --max_iters "$ITERS2" \
    2>&1 | tee -a "$OUT/logs/tracker_2.log"
log "tracker_2: done"
evidence tracker_2

log "record_2: start"
python -m parc_tpu.pipeline.cli record --dataset "$OUT/track_2.yaml" \
    --tracker_dir "$OUT/tracker_2" --out_dir "$OUT/recorded_2" \
    --checkpoint best \
    2>&1 | tee "$OUT/logs/record_2.log"
log "record_2: done"
evidence record_2

mkdir -p "$OUT/motions_iter_3"
ln -sfn "$OUT/seed_motions/base" "$OUT/motions_iter_3/base"
ln -sfn "$OUT/recorded_1" "$OUT/motions_iter_3/recorded_1"
ln -sfn "$OUT/recorded_2" "$OUT/motions_iter_3/recorded_2"
python -m parc_tpu.pipeline.cli create_dataset \
    --motions_dir "$OUT/motions_iter_3" --out "$OUT/dataset_3.yaml" \
    2>&1 | tee "$OUT/logs/create_dataset_3.log"
evidence dataset_3

# MDM_2 checkpoint sweep on style-diverse kin-gen fixtures
# (VERDICT r4 item 3: committed sweep table on a seriously-trained model)
python tools/mdm2_sweep.py --run_dir "$OUT" \
    2>&1 | tee "$OUT/logs/mdm2_sweep.log" || true
cp "$OUT/logs/mdm2_sweep.log" docs/loop_r4/ 2>/dev/null || true
git add docs/mdm_scale.md docs/loop_r4/mdm2_sweep.log 2>/dev/null || true
git commit -q -m "loop r5 evidence: mdm_2 checkpoint sweep" \
    -- docs/mdm_scale.md docs/loop_r4/mdm2_sweep.log || true

evidence loop_complete
log "COMPRESSED ITER 2 COMPLETE: $OUT/dataset_3.yaml"
