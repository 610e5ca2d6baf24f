#!/bin/bash
# Round-2 full PARC iteration at scale, driven off the multi-hour MDM
# checkpoint from tools/mdm_scale.py (/tmp/mdm_scale):
#   kin_gen (MDM+A*+opt) -> create_dataset -> train_tracker @4096 envs
#   -> record -> create_dataset (next-iteration manifest)
# Stage logs land under $OUT; summarize results into docs/loop_scale.md.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
OUT=${OUT:-/tmp/loop2}
ITERS=${ITERS:-1500}
NUM_MOTIONS=${NUM_MOTIONS:-8}
mkdir -p "$OUT"

# 0. seed dataset = the same clips the MDM trained on
python - <<'EOF'
import os
from parc_tpu.anim.motion_data import save_motion_data
from parc_tpu.data.synthetic import (gap_jump_clip, platform_clip,
                                     standing_clip, walking_clip)
out = os.environ.get("OUT", "/tmp/loop2")
d = f"{out}/seed_motions/base"
os.makedirs(d, exist_ok=True)
save_motion_data(f"{d}/stand.npz", standing_clip())
save_motion_data(f"{d}/platform.npz", platform_clip())
save_motion_data(f"{d}/gap.npz", gap_jump_clip())
for s in range(6):
    save_motion_data(f"{d}/walk{s}.npz", walking_clip(seed=s, speed=1.0 + 0.2 * s))
print("seed clips written")
EOF

python -m parc_tpu.pipeline.cli create_dataset \
    --motions_dir "$OUT/seed_motions" --out "$OUT/seed.yaml"

# 1. kin_gen from the scale-run MDM checkpoint (skipped when a previous
# attempt already generated enough clips — stages are resumable; the
# tracker below likewise resumes from its latest checkpoint)
if [ "$(ls "$OUT/kin_gen" 2>/dev/null | wc -l)" -lt "$NUM_MOTIONS" ]; then
    python -m parc_tpu.pipeline.cli kin_gen --dataset "$OUT/seed.yaml" \
        --mdm_dir /tmp/mdm_scale --out_dir "$OUT/kin_gen" \
        --num_motions "$NUM_MOTIONS"
else
    echo "kin_gen: reusing $(ls "$OUT/kin_gen" | wc -l) existing clips"
fi

# 2. dataset over seed + generated clips
mkdir -p "$OUT/motions_iter1"
ln -sfn "$OUT/seed_motions/base" "$OUT/motions_iter1/base"
ln -sfn "$OUT/kin_gen" "$OUT/motions_iter1/generated"
python -m parc_tpu.pipeline.cli create_dataset \
    --motions_dir "$OUT/motions_iter1" --out "$OUT/iter1.yaml"

# 3. tracker at scale
python -m parc_tpu.pipeline.cli train_tracker --dataset "$OUT/iter1.yaml" \
    --out_dir "$OUT/tracker" --num_envs 4096 --max_iters "$ITERS"

# 4. record physically-corrected motions from the best-tested checkpoint
python -m parc_tpu.pipeline.cli record --dataset "$OUT/iter1.yaml" \
    --tracker_dir "$OUT/tracker" --out_dir "$OUT/recorded" \
    --checkpoint best

# 5. next-iteration manifest
mkdir -p "$OUT/motions_iter2"
ln -sfn "$OUT/seed_motions/base" "$OUT/motions_iter2/base"
ln -sfn "$OUT/recorded" "$OUT/motions_iter2/recorded"
python -m parc_tpu.pipeline.cli create_dataset \
    --motions_dir "$OUT/motions_iter2" --out "$OUT/iter2.yaml"

echo "LOOP COMPLETE: $OUT/iter2.yaml"
