"""Autoregressive MDM rollouts along an A* path.

Generates long parkour motions by chaining 15-frame MDM windows: each
iteration rewinds a few frames, conditions on the last two, targets a path
node ahead of the rollout's progress, and appends the newly generated
window.  A batch of B rollouts runs in one jitted device program per
iteration; only the done-check and node bookkeeping touch the host.

Reference parity: tools/procgen/mdm_path.py:19-376 (generation loop
:226-321, scoring :322-376).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from parc_tpu.anim import char_model as cm
from parc_tpu.diffusion import gen as gen_lib
from parc_tpu.diffusion.mdm import MDM, MDMState
from parc_tpu.utils import rotation as rot
from parc_tpu.utils import terrain as terrain_lib


@dataclasses.dataclass
class PathGenSettings:
    batch_size: int = 32
    rewind_frames: int = 5
    lookahead_nodes: int = 7
    done_dist: float = 0.5
    max_seconds: float = 10.0
    fps: float = 30.0
    settings: gen_lib.GenSettings = dataclasses.field(
        default_factory=gen_lib.GenSettings)


@dataclasses.dataclass
class PathGenResult:
    frames34: np.ndarray      # (B, T, 34)
    contacts: np.ndarray      # (B, T, num_bodies)
    lengths: np.ndarray       # (B,) valid frame counts
    contact_loss: np.ndarray  # (B,)
    pen_loss: np.ndarray      # (B,)
    total_loss: np.ndarray    # (B,)


def _feet_xy(model: cm.CharModel, frames34: jax.Array,
             foot_ids) -> jax.Array:
    root_pos = frames34[..., 0:3]
    root_rot = rot.exp_map_to_quat(frames34[..., 3:6])
    joint_rot = cm.dof_to_rot(model, frames34[..., 6:])
    body_pos, _ = cm.forward_kinematics(model, root_pos, root_rot, joint_rot)
    return jnp.mean(body_pos[..., foot_ids, :], axis=-2)


def generate_frames_along_path(mdm: MDM, state: MDMState,
                               terrain: terrain_lib.Terrain,
                               path_nodes: np.ndarray,
                               start_frames34: Optional[np.ndarray],
                               start_contacts: Optional[np.ndarray],
                               rng: jax.Array,
                               cfg: PathGenSettings = PathGenSettings()
                               ) -> PathGenResult:
    """Roll B parallel motions from the path start to its final node.

    Args:
      path_nodes: (N, 3) world xyz nodes from A*.
      start_frames34: (num_prev, 34) REAL recent character frames to
        condition the chain on (online replanning), or None to start cold
        at the path's first node — the reference's two regimes
        (mdm_path.py:149-163): with real frames the first window is
        prev-state-conditioned as usual; from a cold start a synthetic
        standing anchor is built at nodes[0] and the first window is
        generated with the prev-state condition DROPPED (use_prev_state
        False, CFG off), because a synthetic standing pose that conditions
        a well-fit model pins the whole chain to a standing attractor.
      start_contacts: (num_prev, num_bodies) or None.
    """
    model = mdm.model
    b = cfg.batch_size
    np_prev = mdm.scfg.num_prev_states
    seq = mdm.scfg.seq_len
    max_frames = int(cfg.max_seconds * cfg.fps)
    names = list(model.body_names)
    foot_ids = jnp.asarray([names.index("right_foot"),
                            names.index("left_foot")], jnp.int32)

    nodes = jnp.asarray(path_nodes)
    cold_start = start_frames34 is None
    if cold_start:
        # synthetic standing anchor at the path start, heading at the next
        # node, root z randomized in [0.7, 0.9] above the node (reference
        # gen_mdm_motion_at_path_start, mdm_path.py:136-159)
        rng, k_z = jax.random.split(rng)
        nxt = np.asarray(path_nodes)[min(1, len(path_nodes) - 1)]
        d0 = nxt[0:2] - np.asarray(path_nodes)[0, 0:2]
        heading = float(np.arctan2(d0[1], d0[0])) \
            if np.linalg.norm(d0) > 1e-6 else 0.0
        root_z = 0.7 + 0.2 * float(jax.random.uniform(k_z))
        start_frames34 = np.zeros((np_prev, 34), np.float32)
        start_frames34[:, 0:2] = np.asarray(path_nodes)[0, 0:2]
        start_frames34[:, 2] = np.asarray(path_nodes)[0, 2] + root_z
        start_frames34[:, 5] = heading
        start_contacts = np.zeros((np_prev, model.num_bodies), np.float32)
    frames = jnp.broadcast_to(
        jnp.asarray(start_frames34)[None], (b, np_prev, 34)).copy()
    contacts = jnp.broadcast_to(
        jnp.asarray(start_contacts)[None],
        (b, np_prev, model.num_bodies)).copy()

    # mdm weights + terrain enter as jit arguments (device closures stall
    # remote lowering)
    gen_step = jax.jit(
        lambda st, terr, key, prev_f, prev_c, tgt: gen_lib.gen_mdm_motion(
            mdm, st, key, prev_f, prev_c, terr, tgt,
            settings=cfg.settings))
    # Cold-start first window: drop the prev-state condition and CFG
    # (reference gen_mdm_motion_at_path_start, mdm_path.py:149-161); with
    # real prev frames the first window conditions normally.
    if cold_start:
        start_settings = dataclasses.replace(
            cfg.settings, use_prev_state=False, guidance_scale=1.0)
        gen_start = jax.jit(
            lambda st, terr, key, prev_f, prev_c, tgt:
            gen_lib.gen_mdm_motion(mdm, st, key, prev_f, prev_c, terr, tgt,
                                   settings=start_settings))
    else:
        gen_start = gen_step
    state = jax.device_put(state)
    terrain = jax.device_put(terrain)

    closest = np.zeros((b,), np.int64)
    done = np.zeros((b,), bool)
    done_len = np.full((b,), -1, np.int64)

    def update_progress(frames):
        # progress bookkeeping on host
        nonlocal closest, done, done_len
        feet = np.asarray(_feet_xy(model, frames[:, -1], foot_ids))
        d_nodes = np.linalg.norm(
            np.asarray(nodes)[None, :, 0:2] - feet[:, None, 0:2], axis=-1)
        closest = np.maximum(closest, d_nodes.argmin(axis=1))
        end_d = np.linalg.norm(
            np.asarray(nodes)[-1, 0:2] - feet[:, 0:2], axis=-1)
        newly_done = (~done) & (end_d < cfg.done_dist)
        done_len[newly_done] = frames.shape[1]
        done |= newly_done

    # Generate the first window towards the next path node.  Cold start:
    # the synthetic standing anchor is dropped from the output (reference
    # keeps slice(0, seq-1-rewind) of the generated window only).  Warm
    # start: the REAL prev frames stay at the head of the clip so online
    # replanning (astar_mdm) produces motions continuous with the
    # character's actual pose.
    rng, key = jax.random.split(rng)
    tgt0 = jnp.broadcast_to(nodes[min(1, len(path_nodes) - 1), 0:2][None],
                            (b, 2))
    first_f, first_c = gen_start(state, terrain, key,
                                 frames[:, -np_prev:],
                                 contacts[:, -np_prev:], tgt0)
    if cold_start:
        frames = first_f[:, :seq - 1]
        contacts = first_c[:, :seq - 1]
    else:
        frames = jnp.concatenate([frames, first_f[:, :seq - 1]], axis=1)
        contacts = jnp.concatenate([contacts, first_c[:, :seq - 1]], axis=1)
    update_progress(frames)

    while frames.shape[1] < max_frames and not done.all():
        # rewind (drop the last few frames — they tend to degrade)
        if frames.shape[1] > np_prev + cfg.rewind_frames:
            frames = frames[:, :-cfg.rewind_frames]
            contacts = contacts[:, :-cfg.rewind_frames]
        prev_f = frames[:, -np_prev:]
        prev_c = contacts[:, -np_prev:]

        tgt_idx = np.minimum(closest + cfg.lookahead_nodes,
                             len(path_nodes) - 1)
        target_xy = nodes[jnp.asarray(tgt_idx), 0:2]

        rng, key = jax.random.split(rng)
        new_f, new_c = gen_step(state, terrain, key, prev_f, prev_c,
                                target_xy)
        frames = jnp.concatenate([frames, new_f], axis=1)
        contacts = jnp.concatenate([contacts, new_c], axis=1)

        update_progress(frames)

    done_len[done_len < 0] = frames.shape[1]

    c_loss, p_loss = score_rollouts(mdm, terrain, frames, contacts)
    return PathGenResult(
        frames34=np.asarray(frames), contacts=np.asarray(contacts),
        lengths=done_len,
        contact_loss=np.asarray(c_loss), pen_loss=np.asarray(p_loss),
        total_loss=np.asarray(c_loss + p_loss))


# R terrains -> one hf (R, H, W) Terrain (utils/terrain.stack_terrains)
_stack_terrains = terrain_lib.stack_terrains


def generate_frames_multi(mdm: MDM, state: MDMState,
                          terrains: List[terrain_lib.Terrain],
                          paths: List[np.ndarray],
                          rng: jax.Array,
                          cfg: PathGenSettings = PathGenSettings()
                          ) -> List[PathGenResult]:
    """Cold-start rollouts along R paths over R terrains in ONE batched
    device program (batch R * cfg.batch_size).

    The TPU-first answer to kin-gen at reference scale (2000 motions per
    iteration, PARC/kin_gen_default.yaml): instead of one generation
    chain per terrain (small batches underutilize the MXU and every
    window pays the host/remote round-trip), the rollouts of R terrains
    run in one autoregressive chain — each row conditions on ITS
    terrain's local heightfield (gen.sample_local_hf terrain_idx) and
    targets ITS path's nodes; only the per-row done bookkeeping touches
    the host.  Returns one PathGenResult per terrain, each shaped
    exactly like :func:`generate_frames_along_path`'s (so callers rank /
    threshold identically).
    """
    assert len(terrains) == len(paths) and terrains
    model = mdm.model
    r, b = len(terrains), cfg.batch_size
    bt = r * b
    np_prev = mdm.scfg.num_prev_states
    seq = mdm.scfg.seq_len
    max_frames = int(cfg.max_seconds * cfg.fps)
    names = list(model.body_names)
    foot_ids = jnp.asarray([names.index("right_foot"),
                            names.index("left_foot")], jnp.int32)

    stacked = jax.device_put(_stack_terrains(terrains))
    terrain_idx = jnp.repeat(jnp.arange(r), b)             # (B,)
    row_terrain = np.repeat(np.arange(r), b)               # host copy

    # per-row node tables padded to a common length with the final node
    # (progress toward a repeated final node is monotone/no-op)
    n_max = max(len(p) for p in paths)
    nodes_np = np.stack([
        np.concatenate([p, np.repeat(p[-1:], n_max - len(p), axis=0)])
        for p in paths]).astype(np.float32)
    row_nodes = nodes_np[row_terrain]                      # (B, N, 3)
    n_valid = np.asarray([len(p) for p in paths])[row_terrain]

    # cold-start anchors per terrain (reference
    # gen_mdm_motion_at_path_start; same construction as the single-path
    # cold start above)
    rng, k_z = jax.random.split(rng)
    root_z = 0.7 + 0.2 * np.asarray(jax.random.uniform(k_z, (r,)))
    start = np.zeros((r, np_prev, 34), np.float32)
    for i, p in enumerate(paths):
        nxt = p[min(1, len(p) - 1)]
        d0 = nxt[0:2] - p[0, 0:2]
        heading = float(np.arctan2(d0[1], d0[0])) \
            if np.linalg.norm(d0) > 1e-6 else 0.0
        start[i, :, 0:2] = p[0, 0:2]
        start[i, :, 2] = p[0, 2] + root_z[i]
        start[i, :, 5] = heading
    frames = jnp.asarray(np.repeat(start, b, axis=0))      # (B, prev, 34)
    contacts = jnp.zeros((bt, np_prev, model.num_bodies))

    gen_step = jax.jit(
        lambda st, terr, key, prev_f, prev_c, tgt, tidx:
        gen_lib.gen_mdm_motion(mdm, st, key, prev_f, prev_c, terr, tgt,
                               settings=cfg.settings, terrain_idx=tidx))
    start_settings = dataclasses.replace(
        cfg.settings, use_prev_state=False, guidance_scale=1.0)
    gen_start = jax.jit(
        lambda st, terr, key, prev_f, prev_c, tgt, tidx:
        gen_lib.gen_mdm_motion(mdm, st, key, prev_f, prev_c, terr, tgt,
                               settings=start_settings, terrain_idx=tidx))
    state = jax.device_put(state)

    closest = np.zeros((bt,), np.int64)
    done = np.zeros((bt,), bool)
    done_len = np.full((bt,), -1, np.int64)

    def update_progress(frames):
        nonlocal closest, done, done_len
        feet = np.asarray(_feet_xy(model, frames[:, -1], foot_ids))
        d_nodes = np.linalg.norm(
            row_nodes[:, :, 0:2] - feet[:, None, 0:2], axis=-1)
        # never advance onto the padding tail
        d_nodes[np.arange(n_max)[None] >= n_valid[:, None]] = np.inf
        closest = np.maximum(closest, d_nodes.argmin(axis=1))
        end_d = np.linalg.norm(
            row_nodes[np.arange(bt), n_valid - 1, 0:2] - feet[:, 0:2],
            axis=-1)
        newly_done = (~done) & (end_d < cfg.done_dist)
        done_len[newly_done] = frames.shape[1]
        done |= newly_done

    rng, key = jax.random.split(rng)
    tgt0 = jnp.asarray(
        row_nodes[np.arange(bt),
                  np.minimum(1, n_valid - 1), 0:2])        # (B, 2)
    first_f, first_c = gen_start(state, stacked, key, frames[:, -np_prev:],
                                 contacts[:, -np_prev:], tgt0, terrain_idx)
    frames = first_f[:, :seq - 1]
    contacts = first_c[:, :seq - 1]
    update_progress(frames)

    while frames.shape[1] < max_frames and not done.all():
        if frames.shape[1] > np_prev + cfg.rewind_frames:
            frames = frames[:, :-cfg.rewind_frames]
            contacts = contacts[:, :-cfg.rewind_frames]
        prev_f = frames[:, -np_prev:]
        prev_c = contacts[:, -np_prev:]
        tgt_idx = np.minimum(closest + cfg.lookahead_nodes, n_valid - 1)
        target_xy = jnp.asarray(
            row_nodes[np.arange(bt), tgt_idx, 0:2])
        rng, key = jax.random.split(rng)
        new_f, new_c = gen_step(state, stacked, key, prev_f, prev_c,
                                target_xy, terrain_idx)
        frames = jnp.concatenate([frames, new_f], axis=1)
        contacts = jnp.concatenate([contacts, new_c], axis=1)
        update_progress(frames)

    done_len[done_len < 0] = frames.shape[1]

    results = []
    frames_np = np.asarray(frames)
    contacts_np = np.asarray(contacts)
    for i, t in enumerate(terrains):
        sl = slice(i * b, (i + 1) * b)
        c_loss, p_loss = score_rollouts(mdm, t, jnp.asarray(frames_np[sl]),
                                        jnp.asarray(contacts_np[sl]))
        results.append(PathGenResult(
            frames34=frames_np[sl], contacts=contacts_np[sl],
            lengths=done_len[sl],
            contact_loss=np.asarray(c_loss), pen_loss=np.asarray(p_loss),
            total_loss=np.asarray(c_loss + p_loss)))
    return results


def score_rollouts(mdm: MDM, terrain: terrain_lib.Terrain,
                   frames34: jax.Array, contacts: jax.Array):
    """Contact + penetration losses for ranking rollouts (reference:
    tools/procgen/mdm_path.py:31-127)."""
    model = mdm.model
    root_pos = frames34[..., 0:3]
    root_rot = rot.exp_map_to_quat(frames34[..., 3:6])
    joint_rot = cm.dof_to_rot(model, frames34[..., 6:])
    body_pos, body_rot = cm.forward_kinematics(model, root_pos, root_rot,
                                               joint_rot)
    # contact points on all bodies
    bidx = model.contact_point_body
    pts = (body_pos[..., bidx, :]
           + rot.quat_rotate(body_rot[..., bidx, :],
                             jnp.broadcast_to(model.contact_point_offset,
                                              body_pos[..., bidx, :].shape)))
    ground = terrain_lib.get_hf_val(terrain, pts[..., 0:2])
    h_above = pts[..., 2] - model.contact_point_radius - ground

    # penetration: points below the surface
    pen = jnp.maximum(-h_above, 0.0)
    pen_loss = jnp.sum(jnp.mean(pen**2, axis=-1), axis=-1)

    # contact: flagged-contact bodies should be near the surface
    onehot = jax.nn.one_hot(bidx, model.num_bodies)
    body_min_h = jnp.min(
        jnp.where(onehot.T[None, None] > 0, h_above[..., None, :], jnp.inf),
        axis=-1)
    tagged = contacts > 0.5
    cdist = jnp.where(tagged, jnp.maximum(body_min_h, 0.0), 0.0)
    contact_loss = jnp.sum(jnp.mean(cdist**2, axis=-1), axis=-1)
    return contact_loss, pen_loss
