"""Micro-breakdown of the DeepMimic env step on the current backend.

Times jitted variants of the step pipeline (scan-inside-jit, fetch-scalar
sync per CLAUDE.md rule 4) to attribute cost:
  physics   — control_step only
  +obs      — physics + post-step obs
  +reward   — ... + reward/done/tracking
  +reset    — ... + reset sampling (no reset obs)
  full      — the real env.step (includes the second obs pass)

Usage: python tools/profile_step.py [num_envs] [steps]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.data.synthetic import standing_clip, walking_clip
from parc_tpu.envs.base import DoneFlags, EnvConfig
from parc_tpu.envs.deepmimic import DeepMimicEnv
from parc_tpu.physics import engine
from parc_tpu.utils import terrain as terrain_lib
from parc_tpu.anim import char_model as cm


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    model = humanoid_spec().build()
    env = DeepMimicEnv(model, engine.SimParams(), EnvConfig(num_envs=n))
    lib = ml.build_motion_lib(
        model, [walking_clip(seed=0), walking_clip(seed=1, speed=1.0),
                standing_clip()])
    lib = jax.device_put(lib)
    state = env.reset(lib, jax.random.PRNGKey(0))
    actions = jnp.zeros((n, model.dof_size))

    def physics_only(lib, state, actions):
        t = terrain_lib.Terrain(
            hf=lib.terrain_hf,
            hf_mask=jnp.zeros(lib.terrain_hf.shape, bool),
            hf_maxmin=jnp.zeros(lib.terrain_hf.shape + (2,)),
            min_point=lib.terrain_min_point, dxdy=lib.terrain_dxdy)
        sim = engine.control_step(env.model, env.sim_params, t, state.sim,
                                  actions,
                                  sim_steps=env.cfg.sim_steps_per_control,
                                  terrain_idx=state.motion_ids)
        return state.replace(sim=sim)

    def plus_obs(lib, state, actions):
        state = physics_only(lib, state, actions)
        return state.replace(obs=env._compute_obs(lib, state))

    def plus_reward(lib, state, actions):
        state = physics_only(lib, state, actions)
        mt = state.motion_times + env.cfg.control_dt
        state = state.replace(motion_times=mt,
                              time=state.time + env.cfg.control_dt)
        ref = ml.calc_motion_frame(lib, state.motion_ids, mt)
        ref_body_pos, ref_body_rot = cm.forward_kinematics(
            env.model, ref.root_pos, ref.root_rot, ref.joint_rot)
        reward, comps = env._compute_reward(state, ref, ref_body_pos)
        done = env._compute_done(lib, state, ref, ref_body_pos)
        terr = env._tracking_error(state, ref, ref_body_pos, ref_body_rot)
        obs = env._compute_obs(lib, state)
        return state.replace(obs=obs, reward=reward, done=done,
                             tracking_error=terr, reward_components=comps)

    def plus_reset_sample(lib, state, actions):
        state = plus_reward(lib, state, actions)
        rng, sub = jax.random.split(state.rng)
        r_ids, r_times, r_sim = env._sample_reset(lib, sub,
                                                  state.done.shape[0],
                                                  state.fail_rates)
        mask = state.done != DoneFlags.NULL
        sim = engine.where_state(mask, r_sim, state.sim)
        return state.replace(sim=sim, rng=rng,
                             motion_times=jnp.where(mask, r_times,
                                                    state.motion_times))

    def full(lib, state, actions):
        return env.step(lib, state, actions)

    variants = [("physics", physics_only), ("+obs", plus_obs),
                ("+reward+obs", plus_reward),
                ("+reset_sample", plus_reset_sample), ("full", full)]

    for name, fn in variants:
        def scan_fn(lib, state, actions):
            def body(s, _):
                return fn(lib, s, actions), None
            out, _ = jax.lax.scan(body, state, None, length=steps)
            return out
        jfn = jax.jit(scan_fn)
        out = jfn(lib, state, actions)
        float(out.sim.root_pos[0, 0])   # sync (block_until_ready unreliable)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = jfn(lib, state, actions)
        float(out.sim.root_pos[0, 0])
        dt = (time.perf_counter() - t0) / (reps * steps)
        print(f"{name:<16s} {dt * 1e3:8.3f} ms/step   "
              f"{n / dt / 1e3:10.1f}k env-steps/s")


if __name__ == "__main__":
    main()
