"""Policy/value networks (flax.linen).

Registry of MLP builders mirroring the reference's net modules
(reference: learning/nets/net_builder.py:5, fc_3layers_2048units.py etc.).
The tracker default is a 3x2048-unit ReLU MLP for both actor and critic.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLP(nn.Module):
    layers: Sequence[int]
    activation: Callable = nn.relu
    # compute dtype for the matmuls (params stay f32); bf16 on TPU doubles
    # MXU throughput on the 1312->2048->2048->2048 tracker trunks
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for width in self.layers:
            x = self.activation(nn.Dense(width, dtype=self.dtype)(x))
        return x


_NET_REGISTRY = {
    "fc_2layers_1024units": (1024, 1024),
    "fc_3layers_1024units": (1024, 1024, 1024),
    "fc_2layers_512units": (512, 512),
    "fc_3layers_2048units": (2048, 2048, 2048),
}


def build_net(name: str, dtype: object = None) -> MLP:
    if name not in _NET_REGISTRY:
        raise KeyError(f"unknown net {name!r}; have {list(_NET_REGISTRY)}")
    return MLP(layers=_NET_REGISTRY[name], dtype=dtype)


class ActorCritic(nn.Module):
    """Gaussian actor + value critic over normalized observations.

    std handling matches the reference's DistributionGaussianDiag modes
    (reference: learning/distribution_gaussian_diag.py): FIXED uses a
    constant std; VARIABLE predicts log-std per dim.
    """

    action_dim: int
    actor_net: str = "fc_3layers_2048units"
    critic_net: str = "fc_3layers_2048units"
    actor_std_type: str = "FIXED"
    action_std: float = 0.05
    actor_init_output_scale: float = 0.01
    # trunk compute dtype (heads and outputs stay f32 so PPO logp/value
    # math is full precision; rollout and update share the same apply, so
    # epoch-0 importance ratios are exactly 1 regardless of dtype)
    dtype: object = None

    def setup(self):
        self.actor_trunk = build_net(self.actor_net, dtype=self.dtype)
        self.critic_trunk = build_net(self.critic_net, dtype=self.dtype)
        init = nn.initializers.variance_scaling(
            self.actor_init_output_scale, "fan_avg", "uniform")
        self.actor_head = nn.Dense(self.action_dim, kernel_init=init)
        self.critic_head = nn.Dense(1)
        if self.actor_std_type == "VARIABLE":
            self.logstd_head = nn.Dense(
                self.action_dim, kernel_init=nn.initializers.zeros)
        elif self.actor_std_type == "CONSTANT":
            self.logstd_param = self.param(
                "logstd", nn.initializers.constant(jnp.log(self.action_std)),
                (self.action_dim,))

    def actor(self, obs):
        h = self.actor_trunk(obs).astype(jnp.float32)
        mean = self.actor_head(h)
        if self.actor_std_type == "FIXED":
            logstd = jnp.full_like(mean, jnp.log(self.action_std))
        elif self.actor_std_type == "CONSTANT":
            logstd = jnp.broadcast_to(self.logstd_param, mean.shape)
        else:
            logstd = self.logstd_head(h)
        return mean, logstd

    def critic(self, obs):
        h = self.critic_trunk(obs).astype(jnp.float32)
        return self.critic_head(h)[..., 0]

    def __call__(self, obs):
        mean, logstd = self.actor(obs)
        return mean, logstd, self.critic(obs)
