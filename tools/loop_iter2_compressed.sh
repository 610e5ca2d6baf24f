#!/bin/bash
# Compressed iteration 2 of the PARC self-improvement loop — used when
# the round's wall-clock cannot fit tools/loop_two_iter.sh's full
# iteration 2 (per-style kin-gen compiles against the grown dataset's
# new MotionLib shapes cost ~15 min each on the cold remote cache).
#
# Same stages and evidence discipline as loop_two_iter.sh run_iter 2 +
# the MDM_2 warm-start (reference parc_0_setup_iter.py:11,72-76
# input_model_path chaining); compressed in SCOPE, not in kind:
#   - kin_gen_2: boxes-only (KG2_MIX), instead of 4 terrain styles —
#     dataset_2's recorded clips already span boxes/stairs/paths/file
#     from iteration 1, so tracker_2 still trains on all styles.
#   - tracker_2: ITERS2 (default 1000) PPO iters @4096 envs.
#   - MDM_2: 100 warm-started epochs (vs 150) — the warm-start loss
#     curve on the grown dataset is the evidence; it plateaus early.
# Everything else (record, dataset_3 manifest) is at
# loop_two_iter.sh scale.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}
export OUT=${OUT:-/tmp/loop_r4}
ITERS2=${ITERS2:-1000}
MDM_EPOCHS=${MDM_EPOCHS:-100}
KG2_MIX=${KG2_MIX:-"boxes:4"}

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

# MDM_2: warm-started from MDM_1, continued on the grown dataset
if [ ! -d "$OUT/mdm_2/checkpoints" ]; then
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
        2>&1 | tee "$OUT/logs/train_mdm_2.log"
fi
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
    cat > "$OUT/kg2_$style.yaml" <<YAML
terrain_style: $style
terrains_per_batch: $tpb
YAML
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

if [ ! -f "$OUT/tracker_2/log.tsv" ] || \
   [ "$(wc -l < "$OUT/tracker_2/log.tsv")" -lt 10 ]; then
    log "tracker_2: start (@4096 envs, $ITERS2 iters)"
    python -m parc_tpu.pipeline.cli train_tracker \
        --dataset "$OUT/track_2.yaml" --out_dir "$OUT/tracker_2" \
        --num_envs 4096 --max_iters "$ITERS2" \
        2>&1 | tee "$OUT/logs/tracker_2.log"
    log "tracker_2: done"
fi
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

evidence loop_complete
log "COMPRESSED ITER 2 COMPLETE: $OUT/dataset_3.yaml"
