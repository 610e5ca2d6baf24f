"""Benchmark: humanoid env-steps/sec on TPU.

Measures the full DeepMimic training rollout path — policy MLP forward,
PD-actuated Featherstone physics (60 Hz x 2 substeps), terrain contact,
observation/reward/done, masked auto-reset — batched over NUM_ENVS envs,
as one jitted scan on device.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north star is 2M env-steps/s on a v5e-8 (8 chips);
this runs on however many chips are visible and compares against
250k/chip * n_chips (BASELINE.md:21).
"""

import json
import os
import sys
import time

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
ROLLOUT_STEPS = int(os.environ.get("BENCH_STEPS", 64))


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def main():
    import jax
    try:  # persistent compile cache. The driver runs bench on a fresh
        # /tmp (wiped between rounds), so a committed repo-local cache
        # (.bench_cache, warmed by tools/warm_bench_cache.sh) also feeds
        # the lookup: host-CPU setup compiles at 4096 envs were ~380s of
        # every driver run (BENCH_r04 "setup: 380.6s").
        here = os.path.dirname(os.path.abspath(__file__))
        cache = os.path.join(here, ".bench_cache")
        if not os.path.isdir(cache):
            cache = "/tmp/jax_cache"
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    if os.environ.get("JAX_PLATFORMS"):
        # honor an explicit JAX_PLATFORMS=cpu: the remote-TPU
        # sitecustomize re-pins the platform config after registering
        # its plugin, so the env var alone is silently ignored
        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass
    import jax.numpy as jnp

    from parc_tpu.anim import motion_lib as ml
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import standing_clip, walking_clip
    from parc_tpu.envs.base import EnvConfig
    from parc_tpu.envs.deepmimic import DeepMimicEnv
    from parc_tpu.learning import normalizer as norm_lib
    from parc_tpu.learning.networks import ActorCritic
    from parc_tpu.learning.ppo import PPOAgent, PPOConfig

    from parc_tpu.physics import engine

    try:
        devices = jax.devices()
    except RuntimeError:
        # The ambient env may pin JAX_PLATFORMS to a stale plugin name
        # (the remote-TPU plugin has reported as both 'axon' and 'tpu'
        # across driver versions) — fall back to auto-selection.
        jax.config.update("jax_platforms", "")
        devices = jax.devices()
    n_chips = len(devices)
    print(f"# devices: {devices}", file=sys.stderr)

    # Build everything eagerly on the *host* CPU backend (eager dispatch to a
    # remote TPU is latency-bound), then transfer once.
    t_setup = time.time()
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    setup_scope = (jax.default_device(cpu) if cpu is not None
                   else _nullcontext())
    with setup_scope:
        model = humanoid_spec().build()
        cfg = EnvConfig(num_envs=NUM_ENVS)
        env = DeepMimicEnv(model, engine.SimParams(), cfg)
        lib = ml.build_motion_lib(
            model,
            [standing_clip(), walking_clip(seed=1), walking_clip(seed=2)])
        agent = PPOAgent(env, PPOConfig())
        state = agent.init(lib, jax.random.PRNGKey(0))
    state = jax.device_put(state, devices[0])
    lib = jax.device_put(lib, devices[0])
    print(f"# setup: {time.time() - t_setup:.1f}s", file=sys.stderr)

    if n_chips > 1:
        # multi-chip: shard the env batch over a 'data' mesh with
        # shard_map — per-shard local batches keep the Pallas physics
        # kernel legal (GSPMD cannot auto-shard a pallas_call)
        from parc_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(n_chips, model_parallel=1)
        assert NUM_ENVS % n_chips == 0
        rollout_jit = mesh_lib.make_sharded_rollout(
            env, agent.net, agent.a_mid, agent.a_scale, mesh,
            lib, state.env_state, num_steps=ROLLOUT_STEPS)
        from jax.sharding import NamedSharding, PartitionSpec
        state = state.replace(env_state=jax.device_put(
            state.env_state,
            mesh_lib.env_state_shardings(mesh, state.env_state, NUM_ENVS)))
        lib = jax.device_put(
            lib, jax.tree.map(
                lambda _: NamedSharding(mesh, PartitionSpec()), lib))
    else:
        pool_k = PPOConfig().reset_pool_k

        def rollout(lib, env_state, params, obs_norm):
            # reset pool amortized over the rollout, as in training
            # (learning/ppo.py rollout): done envs pull pre-sampled reset
            # states/obs instead of paying a second obs pass every step
            pool = env.build_reset_pool(
                lib, env_state.rng, env_state.fail_rates, NUM_ENVS,
                k=pool_k)

            def step_fn(carry, _):
                es, counts = carry
                norm_obs = norm_lib.normalize(obs_norm, es.obs)
                mean, _ = agent.net.apply(params, norm_obs,
                                          method="actor")
                action = agent.a_mid + agent.a_scale * mean
                es = env.step(lib, es, action, reset_pool=pool,
                              pool_slot=counts % pool_k)
                counts = counts + (es.done != 0).astype(counts.dtype)
                return (es, counts), es.reward.mean()

            counts0 = jnp.zeros((NUM_ENVS,), jnp.int32)
            (es, _), rewards = jax.lax.scan(step_fn, (env_state, counts0),
                                            None, length=ROLLOUT_STEPS)
            return es, rewards.mean()

        # lib enters as a jit argument: device-array closures would be
        # fetched back over the TPU tunnel during lowering.  (No buffer
        # donation: the axon remote backend stalls on donated inputs.)
        rollout_jit = jax.jit(rollout)

    t0 = time.time()
    es, rew = rollout_jit(lib, state.env_state, state.params,
                          state.obs_norm)
    # NOTE: sync via scalar fetch — block_until_ready does not reliably wait
    # on the axon remote backend
    float(rew)
    compile_time = time.time() - t0
    print(f"# compile+first run: {compile_time:.1f}s", file=sys.stderr)

    # timed runs
    times = []
    for _ in range(3):
        t0 = time.time()
        es, rew = rollout_jit(lib, es, state.params, state.obs_norm)
        float(rew)
        times.append(time.time() - t0)
    best = min(times)
    steps_per_sec = NUM_ENVS * ROLLOUT_STEPS / best
    print(f"# times: {[f'{t:.3f}' for t in times]}, mean_reward={float(rew):.3f}",
          file=sys.stderr)

    baseline = 250_000.0 * n_chips  # north star 2M / 8 chips, scaled
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": f"env-steps/s @{NUM_ENVS} envs x{n_chips} chip",
        "vs_baseline": round(steps_per_sec / baseline, 4),
    }))


if __name__ == "__main__":
    main()
