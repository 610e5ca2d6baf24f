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
        env_state=batch_shardings(mesh, agent_state.env_state, num_envs),
        rng=NamedSharding(mesh, P()),
        sample_count=NamedSharding(mesh, P()),
    )
    return jax.device_put(agent_state, shardings)


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
    if jax.process_count() > 1:
        return  # already initialized
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
