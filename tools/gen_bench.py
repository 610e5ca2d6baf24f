"""MDM generation throughput benchmark — parc_2 kin-gen's hot loop.

Times batched DDIM window generation (`gen.gen_mdm_motion`) at the
production model size (6 layers, d_model 1024 — reference
PARC/train_gen_default.yaml) with the reference's inference settings
(DDIM stride 5 over 1001 timesteps => ~200 denoise steps per 15-frame
window, kin_gen batch 32..128 rollouts — PARC/kin_gen_default.yaml).

Prints one JSON line: windows/s, denoise net evals/s, motion-seconds
generated per wall-second.

Env vars: GEN_BATCH (default 128), GEN_STRIDE (5), GEN_REPS (3).
"""

import json
import os
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from parc_tpu.anim import motion_lib as ml
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import standing_clip, walking_clip
    from parc_tpu.diffusion import gen as gen_lib
    from parc_tpu.diffusion.mdm import MDM
    from parc_tpu.utils import terrain as terrain_lib

    batch = int(os.environ.get("GEN_BATCH", 128))
    stride = int(os.environ.get("GEN_STRIDE", 5))
    reps = int(os.environ.get("GEN_REPS", 3))

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    model = humanoid_spec().build()
    lib = ml.build_motion_lib(
        model, [standing_clip(), walking_clip(seed=1)])
    mdm = MDM(model)
    t0 = time.perf_counter()
    state = mdm.init(lib, jax.random.key(0, impl="rbg"),
                     stats_samples=256)
    print(f"# init: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # flat-ish boxes terrain + a walking conditioning window
    rng = np.random.default_rng(0)
    terr = terrain_lib.create_terrain(48, 48, dx=0.4, min_x=-9.6,
                                      min_y=-9.6)
    terr = terr.replace(hf=jnp.asarray(terrain_lib.add_boxes(
        rng, np.zeros((48, 48), np.float32), num_boxes=16,
        box_min_height=-0.4, box_max_height=0.6)))
    clip = walking_clip(seed=3)
    num_prev = mdm.scfg.num_prev_states
    prev = jnp.broadcast_to(jnp.asarray(clip.frames[5:5 + num_prev]),
                            (batch, num_prev, 34))
    prev_contacts = jnp.zeros((batch, num_prev, model.num_bodies))
    target_xy = prev[:, -1, 0:2] + jnp.asarray([3.0, 0.5])

    settings = gen_lib.GenSettings(ddim_stride=stride)
    k = jax.random.key(1, impl="rbg")

    def run(k):
        frames, contacts = gen_lib.gen_mdm_motion(
            mdm, state, k, prev, prev_contacts, terr, target_xy, settings)
        return frames

    t0 = time.perf_counter()
    out = run(k)
    float(out[0, 0, 0])  # sync (block_until_ready unreliable on axon)
    compile_s = time.perf_counter() - t0
    print(f"# compile+first run: {compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(reps):
        k = jax.random.fold_in(k, i)
        t0 = time.perf_counter()
        out = run(k)
        float(out[0, 0, 0])
        times.append(time.perf_counter() - t0)
    dt = min(times)
    n_steps = (mdm.cfg.diffusion_timesteps + stride - 1) // stride
    window_s = (mdm.scfg.seq_len - num_prev) / mdm.scfg.fps
    print(f"# times: {[f'{t:.3f}' for t in times]}, "
          f"{n_steps} denoise steps/window", file=sys.stderr)
    print(json.dumps({
        "metric": "mdm_gen_windows_per_sec",
        "value": round(batch / dt, 2),
        "unit": f"15-frame windows/s @batch {batch}, ddim stride {stride}",
        "net_evals_per_sec": round(batch * n_steps / dt, 1),
        "motion_seconds_per_sec": round(batch * window_s / dt, 2),
    }))


if __name__ == "__main__":
    main()
