"""Micro-breakdown of the DeepMimic env step on the current backend.

Times jitted scan variants (scan-inside-jit, fetch-scalar sync per
CLAUDE.md rule 4) to attribute cost. Two caveats learned on v5e:

* XLA dead-code-eliminates whatever a variant doesn't consume — an
  env-only scan whose actions ignore ``state.obs`` silently drops the
  entire obs assembly (~1.3 ms at 4096 envs). The ``env-only`` variant
  here is therefore reported as "physics+reward+reset (obs DCE'd)" and
  obs cost is attributed as ``full - env-only - policy``.
* per-variant numbers include ~0.1 ms of scan/carry overhead; deltas
  between variants are the signal, not absolute values.

Usage: python tools/profile_step.py [num_envs] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.data.synthetic import standing_clip, walking_clip
from parc_tpu.envs import obs as obs_mod
from parc_tpu.envs.base import EnvConfig
from parc_tpu.learning import normalizer as norm_lib
from parc_tpu.learning.ppo import PPOAgent, PPOConfig
from parc_tpu.physics import engine


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else None
    if ctx is not None:
        ctx.__enter__()
    model = humanoid_spec().build()
    cfg = EnvConfig(num_envs=n)
    from parc_tpu.envs.deepmimic import DeepMimicEnv
    env = DeepMimicEnv(model, engine.SimParams(), cfg)
    lib = ml.build_motion_lib(
        model, [standing_clip(), walking_clip(seed=1), walking_clip(seed=2)])
    agent = PPOAgent(env, PPOConfig())
    astate = agent.init(lib, jax.random.PRNGKey(0))
    if ctx is not None:
        ctx.__exit__(None, None, None)
    dev = jax.devices()[0]
    astate = jax.device_put(astate, dev)
    lib = jax.device_put(lib, dev)
    es = astate.env_state
    params, obs_norm = astate.params, astate.obs_norm
    pool_k = PPOConfig().reset_pool_k

    def timed(name, scan_fn, *args):
        jfn = jax.jit(scan_fn)
        out = jfn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = jfn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        dt = (time.perf_counter() - t0) / (reps * steps)
        print(f"{name:<28s} {dt * 1e3:8.3f} ms/step   "
              f"{n / dt / 1e3:10.1f}k env-steps/s", flush=True)
        return dt

    # ---- step-level variants -------------------------------------------
    def policy_scan(lib, es, params, obs_norm):
        def body(x, _):
            norm_obs = norm_lib.normalize(obs_norm, x)
            mean, _ = agent.net.apply(params, norm_obs, method="actor")
            pad = jnp.pad(mean, ((0, 0), (0, x.shape[1] - mean.shape[1])))
            return x + 1e-9 * pad, None
        out, _ = jax.lax.scan(body, es.obs, None, length=steps)
        return out

    def env_scan(lib, es, params, obs_norm):
        pool = env.build_reset_pool(lib, es.rng, es.fail_rates, n, k=pool_k)
        def body(carry, _):
            s, counts = carry
            s = env.step(lib, s, jnp.zeros((n, model.dof_size)),
                         reset_pool=pool, pool_slot=counts % pool_k)
            counts = counts + (s.done != 0).astype(counts.dtype)
            return (s, counts), None
        (s, _), _ = jax.lax.scan(body, (es, jnp.zeros((n,), jnp.int32)),
                                 None, length=steps)
        return s.sim.root_pos

    def full_scan(lib, es, params, obs_norm):
        pool = env.build_reset_pool(lib, es.rng, es.fail_rates, n, k=pool_k)
        def body(carry, _):
            s, counts = carry
            norm_obs = norm_lib.normalize(obs_norm, s.obs)
            mean, _ = agent.net.apply(params, norm_obs, method="actor")
            action = agent.a_mid + agent.a_scale * mean
            s = env.step(lib, s, action, reset_pool=pool,
                         pool_slot=counts % pool_k)
            counts = counts + (s.done != 0).astype(counts.dtype)
            return (s, counts), None
        (s, _), _ = jax.lax.scan(body, (es, jnp.zeros((n,), jnp.int32)),
                                 None, length=steps)
        return s.sim.root_pos

    print(f"# backend={jax.default_backend()} n={n}", flush=True)
    t_pol = timed("policy (normalize+actor)", policy_scan, lib, es, params,
                  obs_norm)
    t_env = timed("env-only (obs DCE'd)", env_scan, lib, es, params,
                  obs_norm)
    t_full = timed("full step", full_scan, lib, es, params, obs_norm)
    print(f"# attributed obs cost: {(t_full - t_env - t_pol) * 1e3:.3f} ms",
          flush=True)

    # ---- obs sub-components --------------------------------------------
    def scan_over(fn):
        def outer(lib, es):
            def body(t, _):
                out = fn(lib, es, es.motion_times + t * 0.033)
                s = sum(jnp.sum(x.astype(jnp.float32))
                        for x in jax.tree.leaves(out))
                return t + 1e-9 * s, None
            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
            return out
        return outer

    def char_only(lib, es, times):
        sim = es.sim
        key_pos = sim.body_pos[..., env.key_body_ids, :]
        return obs_mod.compute_char_obs(
            sim.root_pos, sim.root_rot, sim.root_vel, sim.root_ang_vel,
            sim.joint_rot, sim.dof_vel, key_pos, cfg.global_obs,
            cfg.root_height_obs)

    def tar_full(lib, es, times):
        sim = es.sim
        tar = env._tar_frames(lib, es.motion_ids, times)
        tar_body_pos, _ = cm.forward_kinematics(
            model, tar.root_pos, tar.root_rot, tar.joint_rot)
        tar_key_pos = tar_body_pos[..., env.key_body_ids, :]
        return obs_mod.compute_tar_obs(
            sim.root_pos, sim.root_rot, tar.root_pos, tar.root_rot,
            tar.joint_rot, tar_key_pos, cfg.global_obs)

    def hf_only(lib, es, times):
        sim = es.sim
        ray_pts = obs_mod.ray_sample_points(sim.root_pos, sim.root_rot, cfg)
        return obs_mod.compute_hf_obs(
            lib.terrain_hf, lib.terrain_min_point, lib.terrain_dxdy,
            es.motion_ids, ray_pts, sim.root_pos, cfg.min_obs_h,
            cfg.max_obs_h)

    def full_obs(lib, es, times):
        return env._compute_obs(lib, es.replace(motion_times=times))

    timed("obs: char", scan_over(char_only), lib, es)
    timed("obs: tar frames+FK+obs", scan_over(tar_full), lib, es)
    timed("obs: heightfield cone", scan_over(hf_only), lib, es)
    timed("obs: full assembly", scan_over(full_obs), lib, es)


if __name__ == "__main__":
    main()
