"""Keypoint-based motion retargeting (pure JAX, no external IK library).

Reference parity: pyroki_retarget/10_humanoid_retargeting.py(+_fancy) —
retargets SMPL keypoint trajectories to a robot skeleton by optimizing
joint variables against local/global keypoint-alignment costs with scale
variables and smoothness/limit regularizers (there via pyroki+jaxls
Levenberg-Marquardt; here a jitted Adam loop over our FK, the same
machinery as tools/motion_opt).

Works in both directions (SMPL -> humanoid, humanoid -> any CharModel):
all it needs is a keypoint trajectory, a CharModel, and a body<->keypoint
mapping.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from parc_tpu.anim import char_model as cm
from parc_tpu.utils import rotation as rot

# SMPL joint names (reference: pyroki_retarget/_utils.py SMPL_JOINT_NAMES)
SMPL_JOINT_NAMES = (
    "pelvis", "left_hip", "right_hip", "spine_1", "left_knee", "right_knee",
    "spine_2", "left_ankle", "right_ankle", "spine_3", "left_foot",
    "right_foot", "neck", "left_collar", "right_collar", "head",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hand", "right_hand")

# default SMPL-joint -> humanoid-body correspondence
# (reference: _utils.get_humanoid_retarget_indices)
DEFAULT_SMPL_TO_HUMANOID: Dict[str, str] = {
    "pelvis": "pelvis",
    "spine_3": "torso",
    "head": "head",
    "left_hip": "left_thigh",
    "left_knee": "left_shin",
    "left_ankle": "left_foot",
    "right_hip": "right_thigh",
    "right_knee": "right_shin",
    "right_ankle": "right_foot",
    "left_shoulder": "left_upper_arm",
    "left_elbow": "left_lower_arm",
    "left_wrist": "left_hand",
    "right_shoulder": "right_upper_arm",
    "right_elbow": "right_lower_arm",
    "right_wrist": "right_hand",
}


@dataclasses.dataclass(frozen=True)
class RetargetConfig:
    iters: int = 1500
    lr: float = 0.02
    w_global: float = 1.0      # absolute keypoint positions
    w_local: float = 2.0       # keypoint offsets relative to the root
    w_smooth: float = 0.5      # second-difference smoothness
    w_limits: float = 10.0     # joint-limit barrier
    w_scale_reg: float = 1.0   # keep the skeleton scale near 1
    optimize_scale: bool = True


def _mapping_indices(model: cm.CharModel,
                     mapping: Dict[str, str],
                     keypoint_names: Sequence[str]
                     ) -> Tuple[np.ndarray, np.ndarray]:
    names = list(model.body_names)
    kp_idx, body_idx = [], []
    for kp_name, body_name in mapping.items():
        if kp_name in keypoint_names and body_name in names:
            kp_idx.append(list(keypoint_names).index(kp_name))
            body_idx.append(names.index(body_name))
    return np.asarray(kp_idx, np.int32), np.asarray(body_idx, np.int32)


def retarget_keypoints(model: cm.CharModel, keypoints: np.ndarray,
                       keypoint_names: Sequence[str] = SMPL_JOINT_NAMES,
                       mapping: Optional[Dict[str, str]] = None,
                       cfg: RetargetConfig = RetargetConfig(),
                       fps: float = 30.0):
    """Retarget a (T, K, 3) keypoint trajectory onto ``model``.

    Returns (frames34 (T, 34), final_losses dict).
    """
    mapping = mapping or DEFAULT_SMPL_TO_HUMANOID
    kp_idx, body_idx = _mapping_indices(model, mapping, keypoint_names)
    assert len(kp_idx) >= 4, "need at least 4 keypoint correspondences"
    target = jnp.asarray(keypoints, jnp.float32)[:, kp_idx]  # (T, C, 3)
    t_len = keypoints.shape[0]

    lo = jnp.asarray(model.dof_limits_lower)
    hi = jnp.asarray(model.dof_limits_upper)

    def fk_points(x):
        root_pos = x["root_pos"]
        root_rot = rot.exp_map_to_quat(x["root_rot"])
        joint_rot = cm.dof_to_rot(model, x["dof"])
        body_pos, _ = cm.forward_kinematics(model, root_pos, root_rot,
                                            joint_rot)
        scale = x["scale"] if cfg.optimize_scale else 1.0
        rel = (body_pos - root_pos[..., None, :]) * scale
        return root_pos[..., None, :] + rel

    def loss_fn(x):
        pts = fk_points(x)[:, body_idx]           # (T, C, 3)
        losses = {}
        losses["global"] = cfg.w_global * jnp.mean((pts - target) ** 2)
        rel_p = pts - pts[:, 0:1]
        rel_t = target - target[:, 0:1]
        losses["local"] = cfg.w_local * jnp.mean((rel_p - rel_t) ** 2)
        acc = x["dof"][2:] - 2 * x["dof"][1:-1] + x["dof"][:-2]
        racc = (x["root_pos"][2:] - 2 * x["root_pos"][1:-1]
                + x["root_pos"][:-2])
        losses["smooth"] = cfg.w_smooth * (jnp.mean(acc ** 2)
                                           + jnp.mean(racc ** 2))
        over = jnp.maximum(x["dof"] - hi, 0.0) + jnp.maximum(
            lo - x["dof"], 0.0)
        losses["limits"] = cfg.w_limits * jnp.mean(over ** 2)
        if cfg.optimize_scale:
            losses["scale_reg"] = cfg.w_scale_reg * jnp.mean(
                (x["scale"] - 1.0) ** 2)
        return sum(losses.values()), losses

    # init: root at the pelvis keypoint, zero pose
    pelvis = target[:, 0]
    x0 = {
        "root_pos": pelvis,
        "root_rot": jnp.zeros((t_len, 3)),
        "dof": jnp.zeros((t_len, model.dof_size)),
        "scale": jnp.ones(()),
    }

    tx = optax.adam(cfg.lr)

    @jax.jit
    def run(x):
        opt_state = tx.init(x)

        def step(carry, _):
            x, opt_state = carry
            (_, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(x)
            updates, opt_state = tx.update(grads, opt_state)
            x = optax.apply_updates(x, updates)
            return (x, opt_state), None

        (x, _), _ = jax.lax.scan(step, (x, opt_state), None,
                                 length=cfg.iters)
        return x, loss_fn(x)[1]

    x, losses = run(x0)
    frames34 = jnp.concatenate(
        [x["root_pos"], x["root_rot"],
         jnp.clip(x["dof"], lo, hi)], axis=-1)
    return np.asarray(frames34), {k: float(v) for k, v in losses.items()}


def keypoints_from_motion(model: cm.CharModel,
                          frames34: np.ndarray) -> np.ndarray:
    """Inverse direction helper: body keypoints of an existing clip
    (reference: convert_parc_to_pyroki.py exports SMPL-joint keypoints)."""
    import jax.numpy as jnp
    f = jnp.asarray(frames34)
    root_q = rot.exp_map_to_quat(f[:, 3:6])
    joint_q = cm.dof_to_rot(model, f[:, 6:])
    body_pos, _ = cm.forward_kinematics(model, f[:, 0:3], root_q, joint_q)
    return np.asarray(body_pos)
