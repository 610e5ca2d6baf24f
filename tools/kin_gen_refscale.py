"""Time kin-gen at reference scale vs the scaled-down defaults.

The reference generates each motion from 128 parallel MDM rollouts and
optimizes the kept ones for 3000 Adam iterations
(PARC/kin_gen_default.yaml mdm_path/opt); pipeline defaults use 32/500.
This probe times one generation batch at BOTH settings on TPU and
reports wall-clock per kept motion (VERDICT r2 missing-4).

Run on TPU:  python tools/kin_gen_refscale.py [--mdm_dir /tmp/mdm_scale]
                                              [--terrains 3]
Appends results to docs/loop_scale.md by hand (printed markdown).
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mdm_dir", default="/tmp/mdm_scale")
    p.add_argument("--terrains", type=int, default=3)
    p.add_argument("--style", default="boxes")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from parc_tpu.anim import motion_lib as ml
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import (gap_jump_clip, platform_clip,
                                         standing_clip, walking_clip)
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.opt import motion_opt
    from parc_tpu.pipeline import kin_gen
    from parc_tpu.utils import checkpoint as ckpt_lib

    model = humanoid_spec().build()
    clips = [standing_clip(), platform_clip(), gap_jump_clip()]
    for s in range(6):
        clips.append(walking_clip(seed=s, speed=1.0 + 0.2 * s))
    lib = ml.build_motion_lib(model, clips)
    mdm = MDM(model, MDMConfig())
    state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=512)
    state = ckpt_lib.restore(f"{args.mdm_dir}/checkpoints", state)

    import tempfile

    configs = {
        "defaults (32 rollouts, 500 opt iters)": kin_gen.KinGenConfig(
            terrain_style=args.style),
        "reference scale (128 rollouts, 3000 opt iters)":
            kin_gen.KinGenConfig(
                terrain_style=args.style, num_rollouts=128,
                opt_cfg=motion_opt.MotionOptConfig(iters=3000)),
        # batched multi-terrain generation: all terrains' rollouts share
        # one autoregressive device program
        # (procgen/mdm_path.generate_frames_multi)
        f"reference scale, terrains_per_batch={args.terrains}":
            kin_gen.KinGenConfig(
                terrain_style=args.style, num_rollouts=128,
                terrains_per_batch=args.terrains,
                opt_cfg=motion_opt.MotionOptConfig(iters=3000)),
    }

    print("\n## Kin-gen wall-clock: defaults vs reference scale\n")
    print("| config | terrains | clips kept | wall (s) | s / kept clip |")
    print("|---|---|---|---|---|")
    for label, cfg in configs.items():
        # warm-up compile (not timed) at the same batch shape
        if cfg.terrains_per_batch > 1:
            with tempfile.TemporaryDirectory() as tmp:
                kin_gen.run_kin_gen(mdm, state, cfg.terrains_per_batch,
                                    tmp, cfg, seed=900)
        else:
            kin_gen.gen_motion_and_terrain(mdm, state, cfg, seed=999)
        t0 = time.time()
        with tempfile.TemporaryDirectory() as tmp:
            out = kin_gen.run_kin_gen(mdm, state, args.terrains, tmp, cfg,
                                      seed=100)
            kept = len(out)
        wall = time.time() - t0
        per = wall / max(kept, 1)
        print(f"| {label} | {args.terrains} | {kept} | {wall:.1f} | "
              f"{per:.1f} |", flush=True)


if __name__ == "__main__":
    main()
