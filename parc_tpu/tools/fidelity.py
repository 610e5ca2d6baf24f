"""Physics-fidelity harness: open-loop PD replay of a fixed, diverse clip
set under sensitivity sweeps over contact / joint-limit parameters.

The driver north star (BASELINE.json) is "tracker reward within 5% of the
Isaac Gym reference".  Isaac Gym cannot run here, so fidelity is
quantified by proxies that a PhysX-equivalent sim must pass:

1. **Open-loop PD replay** (this module): drive the sim with PD targets
   taken directly from reference-format clips — no policy in the loop —
   and measure tracked reward / survival / tracking error until the
   first failure.  A sim whose contact + limit model supports the same
   motions the reference's PhysX TGS solver supports (reference:
   envs/ig_env.py:131-164, 4 position iterations) scores high; contact
   parameters far from the PhysX operating point degrade it.
2. **Sensitivity sweeps**: one-at-a-time perturbations of contact
   stiffness/damping/friction/force-cap and the joint-limit mode
   (penalty springs vs the hard SPD-implicit boundary spring,
   engine.compute_joint_torques hard branch).
   Small sensitivity near the default = the default sits on a plateau,
   not a knife edge.
3. **RL convergence A/Bs** (docs/fidelity.md): trained-tracker reward on
   the same clip set under both limit modes.

Clip set (parc_tpu/data/synthetic.py): standing + walking (flat),
platform_clip (height discontinuity), gap_jump_clip (flight + landing).

Run:  python -m parc_tpu.tools.fidelity [--steps N] [--markdown]
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_lib as ml
from parc_tpu.envs.base import DoneFlags, EnvConfig
from parc_tpu.envs.deepmimic import DeepMimicEnv
from parc_tpu.physics import engine


REFERENCE_CLIP_PKLS = {
    # real PARC kinematic clips over real terrains, shipped inside the
    # reference checkout — the closest reachable absolute anchor to the
    # "tracker reward within 5% of Isaac Gym" north star (BASELINE.json):
    # these are the motions the reference itself demos on
    "ref_civilization": "/root/reference/data/terrains/civilization.pkl",
    "ref_teaser": "/root/reference/data/terrains/TEASER_TERRAIN.pkl",
}


def fidelity_clips(include_reference: bool = True):
    import os

    from parc_tpu.data.synthetic import (gap_jump_clip, platform_clip,
                                         standing_clip, walking_clip)
    clips = {
        "stand": standing_clip(),
        "walk": walking_clip(seed=1),
        "platform": platform_clip(),
        "gap_jump": gap_jump_clip(),
    }
    if include_reference:
        from parc_tpu.anim import motion_data as md
        for name, path in REFERENCE_CLIP_PKLS.items():
            if os.path.exists(path):
                clips[name] = md.load_motion_data(path)
    return clips


@dataclasses.dataclass
class ReplayResult:
    clip: str
    mean_reward: float       # mean tracked reward over pre-failure steps
    survival: float          # fraction of the clip completed before FAIL
    failed: bool
    tracking_error: np.ndarray  # (7,) mean over pre-failure steps


def pd_replay(model: cm.CharModel, sim_params: engine.SimParams,
              clips: Dict[str, "object"],
              env_cfg: Optional[EnvConfig] = None,
              seed: int = 0) -> List[ReplayResult]:
    """Open-loop PD replay: action_t = reference dof pose at t + dt."""
    names = list(clips.keys())
    n = len(names)
    lib = ml.build_motion_lib(model, [clips[k] for k in names])
    cfg = env_cfg or EnvConfig(num_envs=n, episode_length=1e9)
    env = DeepMimicEnv(model, sim_params, cfg)
    ids = jnp.arange(n)
    state = env.reset(lib, jax.random.PRNGKey(seed), num_envs=n,
                      motion_ids=ids)
    clip_steps = np.asarray(
        np.floor(np.asarray(lib.lengths) / cfg.control_dt), np.int32) - 1
    n_steps = int(clip_steps.max())

    def step_fn(st, _):
        tar = ml.calc_motion_frame(lib, st.motion_ids,
                                   st.motion_times + cfg.control_dt)
        act = cm.rot_to_dof(model, tar.joint_rot)
        st = env.step(lib, st, act)
        return st, (st.reward, st.done, st.tracking_error)

    _, (rewards, dones, errs) = jax.jit(
        lambda s: jax.lax.scan(step_fn, s, None, length=n_steps))(state)
    rewards = np.asarray(rewards)        # (T, n)
    dones = np.asarray(dones)
    errs = np.asarray(errs)              # (T, n, 7)

    out = []
    for i, name in enumerate(names):
        t_clip = int(clip_steps[i])
        fail_ts = np.nonzero(dones[:t_clip, i] == DoneFlags.FAIL)[0]
        t_end = int(fail_ts[0]) + 1 if fail_ts.size else t_clip
        out.append(ReplayResult(
            clip=name,
            mean_reward=float(rewards[:t_end, i].mean()),
            survival=t_end / max(t_clip, 1),
            failed=bool(fail_ts.size),
            tracking_error=errs[:t_end, i].mean(axis=0)))
    return out


def default_sweeps() -> Dict[str, engine.SimParams]:
    """One-at-a-time perturbations around the default operating point."""
    base = dict(use_pallas=True)
    return {
        # default now ships hard_joint_limits=True (PhysX-parity mode,
        # +12.8% tracker test reward in the RL A/B — docs/fidelity.md)
        "default": engine.SimParams(**base),
        "penalty_limits": engine.SimParams(hard_joint_limits=False, **base),
        "stiffness_x0.5": engine.SimParams(contact_stiffness=4000.0, **base),
        "stiffness_x2": engine.SimParams(contact_stiffness=16000.0, **base),
        "damping_x0.5": engine.SimParams(contact_damping=150.0, **base),
        "damping_x2": engine.SimParams(contact_damping=600.0, **base),
        "friction_0.5": engine.SimParams(friction=0.5, **base),
        "friction_1.5": engine.SimParams(friction=1.5, **base),
        # x0.5 (1500 N) never binds on this clip set (bit-identical to the
        # default row) — sweep a cap that actually clips landing impacts
        "force_cap_x0.1": engine.SimParams(max_contact_force=300.0, **base),
    }


def run_sweeps(markdown: bool = False,
               sweeps: Optional[Dict[str, engine.SimParams]] = None
               ) -> Dict[str, List[ReplayResult]]:
    from parc_tpu.data.humanoid import humanoid_spec
    model = humanoid_spec().build()
    clips = fidelity_clips()
    sweeps = sweeps or default_sweeps()
    results = {}
    for name, params in sweeps.items():
        results[name] = pd_replay(model, params, clips)
    if markdown:
        print(format_markdown(results))
    return results


def format_markdown(results: Dict[str, List[ReplayResult]]) -> str:
    clip_names = [r.clip for r in next(iter(results.values()))]
    lines = ["| config | " + " | ".join(
        f"{c} reward / survival" for c in clip_names) + " |"]
    lines.append("|---" * (1 + len(clip_names)) + "|")
    for cfg_name, rs in results.items():
        cells = [f"{r.mean_reward:.3f} / {r.survival:.2f}" for r in rs]
        lines.append(f"| {cfg_name} | " + " | ".join(cells) + " |")
    return "\n".join(lines)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--markdown", action="store_true")
    args = p.parse_args()
    results = run_sweeps(markdown=True)
    if not args.markdown:
        for cfg_name, rs in results.items():
            for r in rs:
                print(f"{cfg_name:16s} {r.clip:10s} reward={r.mean_reward:.3f}"
                      f" survival={r.survival:.2f} failed={r.failed}"
                      f" err={np.round(r.tracking_error, 3)}")


if __name__ == "__main__":
    main()
