"""Device-mesh utilities: SPMD data/model parallel sharding.

The reference scales by spawning one process per GPU and allreducing
gradients over NCCL (util/mp_util.py:10-41, learning/mp_optimizer.py:83-90).
The TPU-native equivalent is a single jitted program over a
``jax.sharding.Mesh``: annotate the env batch with a 'data' axis and the
wide MLP kernels with a 'model' axis, and XLA inserts the psum/all-gather
collectives over ICI.  Normalizer statistics and gradient reductions need no
explicit communication code — arrays are logically global under GSPMD.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = num_devices or len(devices)
    assert n % model_parallel == 0
    arr = mesh_utils.create_device_mesh(
        (n // model_parallel, model_parallel), devices=devices[:n])
    return Mesh(arr, ("data", "model"))


def _is_wide_kernel(path_leaf, x) -> Optional[P]:
    """Sharding for a network kernel: shard the wide output dim on 'model'."""
    if x.ndim == 2 and x.shape[-1] >= 512:
        return P(None, "model")
    if x.ndim == 1 and x.shape[-1] >= 512:
        return P("model")
    return P()


def param_shardings(mesh: Mesh, params: Any) -> Any:
    """Megatron-style sharding for MLP stacks: wide kernels split on the
    'model' axis, everything else replicated."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, _is_wide_kernel(None, x)), params)


def batch_shardings(mesh: Mesh, tree: Any, batch_size: int) -> Any:
    """Shard every leaf whose leading dim equals ``batch_size`` on 'data'."""
    def spec(x):
        if x.ndim >= 1 and x.shape[0] == batch_size:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())
    return jax.tree.map(spec, tree)


def shard_agent_state(mesh: Mesh, agent_state: Any, num_envs: int) -> Any:
    """Place an AgentState on the mesh: env batch on 'data', params on
    'model' where wide, rest replicated."""
    shardings = agent_state.replace(
        params=param_shardings(mesh, agent_state.params),
        opt_state=jax.tree.map(
            lambda x: NamedSharding(mesh, _is_wide_kernel(None, x))
            if hasattr(x, "ndim") else NamedSharding(mesh, P()),
            agent_state.opt_state),
        obs_norm=jax.tree.map(
            lambda x: NamedSharding(mesh, P()), agent_state.obs_norm),
        env_state=env_state_shardings(mesh, agent_state.env_state,
                                      num_envs),
        rng=NamedSharding(mesh, P()),
        sample_count=NamedSharding(mesh, P()),
    )
    return jax.device_put(agent_state, shardings)


def env_batch_pspec(x, num_envs: int) -> P:
    """PartitionSpec for one leaf: 'data'-sharded iff the leading dim is
    the env batch."""
    if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == num_envs:
        return P("data")
    return P()


def env_state_shardings(mesh: Mesh, env_state: Any, num_envs: int) -> Any:
    """NamedShardings matching :func:`env_state_pspec` (for device_put)."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        env_state_pspec(env_state, num_envs))


def env_state_pspec(env_state: Any, num_envs: int) -> Any:
    """PartitionSpecs for an EnvState: env-batch leaves on 'data', with the
    per-MOTION leaves explicitly replicated. The leading-dim heuristic
    alone is a trap: fail_rates has shape (num_motions,), which collides
    with (num_envs,) whenever a run uses one env per motion (the record
    stage always does).

    ParkourState adds per-mgdm-row leaves (leading dim mgdm_num, NOT
    num_envs): the generated-reference buffers shard on 'data' (contiguous
    blocks match the shard-major env layout — ParkourEnv.local_shard);
    the synchronized replan timer is a cross-shard-identical scalar."""
    specs = jax.tree.map(lambda x: env_batch_pspec(x, num_envs), env_state)
    if hasattr(specs, "fail_rates"):
        specs = specs.replace(fail_rates=P())
    if hasattr(specs, "ref_frames34"):
        specs = specs.replace(
            ref_frames34=P("data"), ref_contacts=P("data"),
            target_xy=P("data"), ref_synthetic=P("data"),
            replan_timer=P())
    return specs


def agent_state_pspec(state: Any, num_envs: int) -> Any:
    """PartitionSpecs for a full AgentState under shard_map data
    parallelism: everything replicated except the env batch.

    Never applies the leading-dim heuristic to params/opt_state — a
    2048-wide net at the default 2048 envs would otherwise get its hidden
    kernels and biases sliced across 'data' and crash at trace time."""
    rep = lambda t: jax.tree.map(lambda _: P(), t)
    return state.replace(
        params=rep(state.params),
        opt_state=rep(state.opt_state),
        obs_norm=rep(state.obs_norm),
        env_state=env_state_pspec(state.env_state, num_envs),
        rng=P(),
        sample_count=P(),
    )


def local_agent(agent, n_shards: int):
    """Shallow agent clone whose env is the per-shard local env
    (env.local_shard): inside shard_map every env method then sees the
    batch size and static row split (ParkourEnv dm|mgdm) of its own shard.
    Net/optimizer/action bounds are shared with the global agent, so
    params pytrees are interchangeable."""
    import copy
    if n_shards <= 1 or not hasattr(agent.env, "local_shard"):
        return agent
    clone = copy.copy(agent)
    clone.env = agent.env.local_shard(n_shards)
    return clone


def shard_major_env_state(env, env_state: Any, n_shards: int) -> Any:
    """Permute env-batch rows into shard-major blocks when the env has a
    static row split (ParkourEnv.shard_row_permutation); identity for
    row-iid envs (DeepMimic).  Apply ONCE to a freshly-reset state before
    sharding it on 'data' — training keeps the layout (persistent
    checkpoints hold no per-env rows, learning/ppo.py persistent_state)."""
    perm_fn = getattr(env, "shard_row_permutation", None)
    if perm_fn is None or n_shards <= 1:
        return env_state
    perm = jnp.asarray(perm_fn(n_shards))
    n = env.cfg.num_envs

    def take(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n:
            return jnp.take(x, perm, axis=0)
        return x

    new_state = jax.tree.map(take, env_state)
    # per-motion / per-mgdm-row leaves are NOT env rows; restore them
    # (they already split correctly as contiguous 'data' blocks)
    for field in ("fail_rates", "ref_frames34", "ref_contacts",
                  "target_xy", "ref_synthetic"):
        if hasattr(new_state, field):
            new_state = new_state.replace(
                **{field: getattr(env_state, field)})
    return new_state


def make_sharded_train_iter(agent, mesh: Mesh, lib, state):
    """Data-parallel PPO ``train_iter`` under ``shard_map`` — the multichip
    path that KEEPS the Pallas physics kernel (GSPMD auto-partitioning
    cannot shard a ``pallas_call``; under shard_map each shard sees a local
    env batch, so the kernel launches per-chip).

    Per-shard divergence is explicit: the agent/env rng streams are folded
    with the shard index so every chip simulates different envs; gradients,
    normalizer statistics, and advantage moments reduce over the 'data'
    axis inside ``train_iter`` (axis_name plumbing, learning/ppo.py), and
    the per-motion fail-rate EMA is pmean-reconciled once per iteration —
    the reference's per-process MotionLib fail rates are likewise only
    synchronized through the gradient allreduce cadence
    (learning/mp_optimizer.py:83-90, dm_env.py:720-783).

    Supports DeepMimicEnv AND ParkourEnv/MGDMEnv: each shard runs a local
    env clone (env.local_shard) with its own dm|mgdm slice, so the
    ``lax.cond`` MDM replan executes per shard on the local mgdm batch —
    the reference's per-process mgdm replan under NCCL DP
    (envs/ig_parkour/ig_parkour_env.py:53, mgdm_env.py:575-826).  For
    parkour, ``state.env_state`` must be in shard-major row layout
    (shard_major_env_state).  ``lib`` and ``state`` are used for pytree
    structure only.
    """
    from jax import shard_map

    num_envs = agent.env.cfg.num_envs
    assert num_envs % mesh.shape["data"] == 0, (
        f"num_envs {num_envs} must divide the data axis "
        f"{mesh.shape['data']}")
    state_spec = agent_state_pspec(state, num_envs)
    lib_spec = jax.tree.map(lambda x: P(), lib)
    shard_agent = local_agent(agent, mesh.shape["data"])

    def local_fn(lib, st):
        didx = jax.lax.axis_index("data")
        # split off replicated next-keys, fold the shard index into the
        # local streams so shards explore independently
        rng_next, rng_local = jax.random.split(st.rng)
        env_rng_next, env_rng_local = jax.random.split(st.env_state.rng)
        st = st.replace(
            rng=jax.random.fold_in(rng_local, didx),
            env_state=st.env_state.replace(
                rng=jax.random.fold_in(env_rng_local, didx)))
        new_state, metrics = shard_agent.train_iter(lib, st,
                                                    axis_name="data")
        counts = (jax.lax.psum(metrics.num_dones, "data"),
                  jax.lax.psum(metrics.num_fails, "data"))
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, "data"), metrics)
        metrics = metrics.replace(num_dones=counts[0], num_fails=counts[1])
        new_state = new_state.replace(
            rng=rng_next,
            env_state=new_state.env_state.replace(
                rng=env_rng_next,
                fail_rates=jax.lax.pmean(new_state.env_state.fail_rates,
                                         "data")))
        return new_state, metrics

    metrics_spec = jax.tree.map(
        lambda _: P(), jax.eval_shape(
            lambda l, s: agent.train_iter(l, s, axis_name=None)[1],
            lib, state))
    fn = shard_map(local_fn, mesh=mesh,
                   in_specs=(lib_spec, state_spec),
                   out_specs=(state_spec, metrics_spec),
                   check_vma=False)
    jfn = jax.jit(fn)
    # Self-placing wrapper: inputs restored from a checkpoint (or freshly
    # device_put without a sharding) arrive COMMITTED to a single device,
    # and jit refuses to mix them with an N-device shard_map. device_put
    # onto the in_spec shardings is a no-op for already-placed buffers and
    # a one-time host->mesh copy otherwise, so every caller (tests, resume
    # flows, train_tracker) can pass arrays from anywhere.
    lib_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), lib_spec)
    state_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), state_spec)

    def train_iter(lib, st):
        return jfn(jax.device_put(lib, lib_sh),
                   jax.device_put(st, state_sh))
    return train_iter


def make_sharded_rollout(env, net, a_mid, a_scale, mesh: Mesh,
                         lib, env_state, num_steps: int):
    """Deterministic-policy rollout under shard_map (bench / eval on a
    multi-chip mesh, Pallas physics kept).  Returns jitted
    fn(lib, env_state, params, obs_norm) -> (env_state, mean_reward)."""
    from jax import shard_map
    from parc_tpu.learning import normalizer as norm_lib

    num_envs = env_state.done.shape[0]
    state_spec = env_state_pspec(env_state, num_envs)
    lib_spec = jax.tree.map(lambda x: P(), lib)
    if hasattr(env, "local_shard"):
        env = env.local_shard(mesh.shape["data"])

    pool_k = 4

    def local_fn(lib, es, params, obs_norm):
        didx = jax.lax.axis_index("data")
        es = es.replace(rng=jax.random.fold_in(es.rng, didx))
        n_local = es.done.shape[0]
        # per-shard reset pool (learning/ppo.py rollout): one obs pass per
        # step; the pool is built on the local batch so the Pallas physics
        # kernel stays legal under shard_map
        pool = (env.build_reset_pool(lib, es.rng, es.fail_rates, n_local,
                                     k=pool_k)
                if hasattr(env, "build_reset_pool") else None)

        def step_fn(carry, _):
            es, counts = carry
            norm_obs = norm_lib.normalize(obs_norm, es.obs)
            mean, _ = net.apply(params, norm_obs, method="actor")
            act = a_mid + a_scale * mean
            if pool is not None:
                es = env.step(lib, es, act, reset_pool=pool,
                              pool_slot=counts % pool_k)
                counts = counts + (es.done != 0).astype(counts.dtype)
            else:
                es = env.step(lib, es, act)
            return (es, counts), es.reward.mean()

        counts0 = jnp.zeros((n_local,), jnp.int32)
        (es, _), rewards = jax.lax.scan(step_fn, (es, counts0), None,
                                        length=num_steps)
        return es, jax.lax.pmean(rewards.mean(), "data")

    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(lib_spec, state_spec, P(), P()),
        out_specs=(state_spec, P()),
        check_vma=False)
    jfn = jax.jit(fn)
    # Same self-placement contract as make_sharded_train_iter: accept
    # single-device-committed inputs (checkpoint restores) by moving them
    # onto the mesh per the shard_map in_specs before dispatch.
    lib_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), lib_spec)
    state_sh = jax.tree.map(lambda s: NamedSharding(mesh, s), state_spec)
    rep_sh = NamedSharding(mesh, P())

    def rollout(lib, es, params, obs_norm):
        return jfn(jax.device_put(lib, lib_sh),
                   jax.device_put(es, state_sh),
                   jax.device_put(params,
                                  jax.tree.map(lambda _: rep_sh, params)),
                   jax.device_put(obs_norm,
                                  jax.tree.map(lambda _: rep_sh, obs_norm)))
    return rollout


def check_param_sync(mesh: Mesh, params: Any, atol: float = 1e-6) -> float:
    """Max abs deviation of any replica's params from the cross-device mean.

    Parity with the reference's periodic multi-proc desync assertion
    (learning/mp_optimizer.py:68-81): in shard_map data parallelism the
    parameters are replicated by construction, but a non-deterministic op
    or a collectives bug would let replicas drift — this is the race
    detector for that. Raises if the deviation exceeds ``atol``. The
    tolerance is nonzero because all-reduce implementations may accumulate
    in different orders per participant (measured ~1 ulp on the CPU
    backend); real desyncs are orders of magnitude larger.
    """
    from jax import shard_map

    def local_fn(p):
        worst = jnp.zeros(())
        for leaf in jax.tree.leaves(p):
            leaf = leaf.astype(jnp.float32)
            mean = jax.lax.pmean(leaf, "data")
            worst = jnp.maximum(worst, jnp.max(jnp.abs(leaf - mean)))
        return jax.lax.pmax(worst, "data")

    # Pass the LIVE buffers through: device_put with the replicated spec is
    # a no-op when params already live on this mesh (the case that matters —
    # each device's possibly-drifted copy is inspected in place); it only
    # copies when params sit elsewhere (then the check is trivially clean).
    rep = jax.device_put(
        params, jax.tree.map(
            lambda _: NamedSharding(mesh, P()), params))
    fn = shard_map(local_fn, mesh=mesh, in_specs=(P(),), out_specs=P(),
                   check_vma=False)
    dev = float(jax.jit(fn)(rep))
    if dev > atol:
        raise AssertionError(
            f"data-parallel param replicas out of sync: max|p - pmean(p)| "
            f"= {dev:.3e} > {atol:.3e}")
    return dev


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization (TPU pods / multi-host CPU).

    Replaces the reference's torch.distributed TCP rendezvous
    (util/mp_util.py:10-41): with JAX each host calls
    ``jax.distributed.initialize`` once and all hosts then participate in
    the same GSPMD programs over DCN+ICI. No-op when already initialized
    or when running single-process.
    """
    if jax.distributed.is_initialized():
        return
    # NOTE: never probe jax.process_count() here — it initializes the
    # backend, after which jax.distributed.initialize can no longer run.
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except (ValueError, RuntimeError):
        # single-process / no coordinator configured: run locally
        pass


def is_primary() -> bool:
    """True on the logging/checkpointing process (reference pattern:
    root-proc-only save/log — util/mp_util.py + base_agent.py:127)."""
    return jax.process_index() == 0
