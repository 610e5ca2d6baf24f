"""Motion Diffusion Model: training and sampling.

Terrain-conditioned motion diffusion with predict-x0 parameterization,
cosine schedule (1001 steps), classifier-free condition dropout, geometric
losses (velocity, FK body-position consistency, heightfield collision,
target direction), EMA weights, and DDPM/DDIM samplers.

Reference parity: diffusion/mdm.py:110-1651 (training loop :1238-1335,
losses :617-754, DDPM :1115-1145, DDIM :1156-1216, CFG :1032-1065);
hyperparameter defaults from PARC/train_gen_default.yaml.

TPU-first departures: the whole train step — window sampling, hf
augmentation, diffusion, loss, AdamW update, EMA — is one jitted SPMD
program; batch shards over the 'data' mesh axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from parc_tpu.anim import char_model as cm
from parc_tpu.anim import motion_lib as ml
from parc_tpu.diffusion import sampler as sampler_lib
from parc_tpu.diffusion import schedules
from parc_tpu.diffusion.transformer import MDMTransformer
from parc_tpu.utils import rotation as rot


def _rbg_key(k: jax.Array) -> jax.Array:
    """Re-key any PRNG key (typed or raw uint32, any impl/word-count) onto
    the TPU-native ``rbg`` impl, whose 4-word state is cheap to expand into
    the ~600M dropout bits a denoiser forward consumes."""
    if jnp.issubdtype(jnp.asarray(k).dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(k)
    else:
        data = jnp.asarray(k, jnp.uint32)
    data = data.reshape(-1)
    reps = -(-4 // data.shape[0])  # ceil division
    return jax.random.wrap_key_data(jnp.tile(data, reps)[:4], impl="rbg")


@dataclasses.dataclass(frozen=True)
class MDMConfig:
    diffusion_timesteps: int = 1001
    batch_size: int = 64
    lr: float = 1e-5
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    ema_decay: float = 0.99
    ema_start: int = 200

    # network
    d_model: int = 1024
    num_heads: int = 16
    d_hid: int = 1024
    num_layers: int = 6
    dropout: float = 0.1
    # encoder matmuls in bf16 on TPU (params/losses stay f32); set False
    # for bit-stable f32 end to end
    bf16_compute: bool = True

    # condition dropout (classifier-free guidance training)
    hf_dropout: float = 0.1
    target_dropout: float = 0.025
    prev_state_dropout: float = 0.1
    prev_state_noise_chance: float = 0.5
    # OOD condition resampling (reference: mdm.py:903-940 _ood_chance)
    ood_chance: float = 0.1

    # loss weights (reference: train_gen_default.yaml w_*)
    w_simple_root_pos: float = 1.0
    w_simple_root_rot: float = 1.0
    w_simple_joint_rot: float = 0.5
    w_simple_contacts: float = 1.0
    w_simple_body_pos: float = 0.5
    w_body_pos_consistency: float = 1.0
    w_vel_root_pos: float = 0.5
    w_vel_root_rot: float = 0.02
    w_vel_joint_rot: float = 0.01
    w_target: float = 0.02
    w_hf: float = 15.0


@struct.dataclass
class MDMState:
    params: Any
    ema_params: Any
    opt_state: Any
    mean: jax.Array   # (total_frames, frame_dim)
    std: jax.Array
    rng: jax.Array
    step: jax.Array


class MDM:
    """Static model wrapper; all mutable state in MDMState."""

    def __init__(self, model: cm.CharModel, cfg: MDMConfig = MDMConfig(),
                 sampler_cfg: sampler_lib.SamplerConfig
                 = sampler_lib.SamplerConfig()):
        self.model = model
        self.cfg = cfg
        self.scfg = sampler_cfg
        self.frame_dim = sampler_cfg.frame_dim(model)
        self.rates = schedules.make_rates(cfg.diffusion_timesteps)
        import jax.numpy as _jnp
        compute_dtype = (_jnp.bfloat16
                         if cfg.bf16_compute
                         and jax.default_backend() != "cpu" else None)
        self.net = MDMTransformer(
            frame_dim=self.frame_dim, seq_len=sampler_cfg.seq_len,
            num_prev_states=sampler_cfg.num_prev_states,
            d_model=cfg.d_model, num_heads=cfg.num_heads, d_hid=cfg.d_hid,
            num_layers=cfg.num_layers, dropout=cfg.dropout,
            compute_dtype=compute_dtype)
        tx = optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)
        self.tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)

    # ------------------------------------------------------------------
    def init(self, lib: ml.MotionLib, rng: jax.Array,
             stats_samples: Optional[int] = None) -> MDMState:
        """Init params + dataset feature statistics.

        ``stats_samples=None`` (default) computes the EXACT per-window
        mean/std over every window of every motion (reference:
        diffusion/mdm.py:480-548); pass an int for the fast Monte-Carlo
        estimate (tests / throwaway inits)."""
        k_stats, k_net, k_state = jax.random.split(rng, 3)
        if stats_samples is None:
            mean, std = sampler_lib.compute_feature_stats_exact(
                self.model, self.scfg, lib)
        else:
            mean, std = sampler_lib.compute_feature_stats(
                self.model, self.scfg, lib, k_stats, stats_samples)
        scfg = self.scfg
        dummy = dict(
            x_t=jnp.zeros((1, scfg.seq_len, self.frame_dim)),
            t=jnp.zeros((1,), jnp.int32),
            prev_states=jnp.zeros((1, scfg.num_prev_states, self.frame_dim)),
            hf=jnp.zeros((1, scfg.hf_dim_x, scfg.hf_dim_y)),
            target_dir=jnp.zeros((1, 2)))
        params = self.net.init(k_net, **dummy)
        return MDMState(params=params, ema_params=params,
                        opt_state=self.tx.init(params), mean=mean, std=std,
                        rng=k_state, step=jnp.zeros((), jnp.int32))

    # ------------------------------------------------------------------
    def _standardize(self, state: MDMState, frames, prev_states):
        np_ = self.scfg.num_prev_states
        f = (frames - state.mean[np_:]) / state.std[np_:]
        p = (prev_states - state.mean[:np_]) / state.std[:np_]
        return f, p

    def _unstandardize_frames(self, state: MDMState, frames):
        np_ = self.scfg.num_prev_states
        return frames * state.std[np_:] + state.mean[np_:]

    # ------------------------------------------------------------------
    def _geometric_losses(self, state: MDMState, pred_std, gt_std,
                          batch: sampler_lib.WindowBatch):
        """All losses in unstandardized (canonical) space, **per sample**
        (B,) so OOD rows can be masked (reference: mdm.py:617-754 returns
        per-sample losses for the same reason, :936-940)."""
        cfg = self.cfg
        scfg = self.scfg
        pred = self._unstandardize_frames(state, pred_std)
        gt = self._unstandardize_frames(state, gt_std)
        p = sampler_lib.split_features(self.model, pred)
        g = sampler_lib.split_features(self.model, gt)

        def m(x):
            return jnp.mean(x, axis=tuple(range(1, x.ndim)))

        losses = {}
        losses["simple_root_pos"] = cfg.w_simple_root_pos * m(
            (p["root_pos"] - g["root_pos"])**2)
        losses["simple_root_rot"] = cfg.w_simple_root_rot * m(
            (p["root_rot"] - g["root_rot"])**2)
        losses["simple_joint_rot"] = cfg.w_simple_joint_rot * m(
            (p["dof"] - g["dof"])**2)
        losses["simple_body_pos"] = cfg.w_simple_body_pos * m(
            (p["joint_pos"] - g["joint_pos"])**2)
        losses["simple_contacts"] = cfg.w_simple_contacts * m(
            (p["contacts"] - g["contacts"])**2)

        # velocity consistency across frames
        def vel(x):
            return x[:, 1:] - x[:, :-1]
        losses["vel_root_pos"] = cfg.w_vel_root_pos * m(
            (vel(p["root_pos"]) - vel(g["root_pos"]))**2)
        losses["vel_root_rot"] = cfg.w_vel_root_rot * m(
            (vel(p["root_rot"]) - vel(g["root_rot"]))**2)
        losses["vel_joint_rot"] = cfg.w_vel_joint_rot * m(
            (vel(p["dof"]) - vel(g["dof"]))**2)

        # FK consistency: body positions implied by predicted dofs must
        # match the predicted joint_pos features
        joint_rot = cm.dof_to_rot(self.model, p["dof"])
        root_quat = rot.exp_map_to_quat(p["root_rot"])
        body_pos, body_rot = cm.forward_kinematics(self.model, p["root_pos"],
                                                   root_quat, joint_rot)
        fk_joint_pos = (body_pos[..., 1:, :] - p["root_pos"][..., None, :])
        fk_flat = fk_joint_pos.reshape(fk_joint_pos.shape[:-2] + (-1,))
        losses["body_pos_consistency"] = (
            cfg.w_body_pos_consistency
            * m((fk_flat - p["joint_pos"])**2))

        # heightfield collision: the engine's per-geom contact point cloud,
        # transformed by the FK body frames, must stay above the local hf
        # (canonical coords; hf already relative to canon z).  Reference:
        # util/terrain_util.py:1895-1949 motion_frames_hf_sdf_loss rotates
        # geom_util char point samples by FK body rotations; we reuse the
        # same 52-point contact cloud the physics engine collides with,
        # with each point's radius as its required clearance.
        pb = self.model.contact_point_body          # (P,)
        pts = (rot.quat_rotate(body_rot[..., pb, :],
                               self.model.contact_point_offset)
               + body_pos[..., pb, :])              # (B, T, P, 3)
        bx = pts[..., 0] / scfg.hf_dx + scfg.hf_num_x_neg
        by = pts[..., 1] / scfg.hf_dx + scfg.hf_num_y
        # max height over the 4 surrounding cells: a point laterally
        # penetrating a box side (or within half a cell of a taller
        # neighbor) still sees the tall cell — nearest-cell rounding
        # undershoots there (the reference's box-SDF interior distance
        # has no such blind spot)
        ix0 = jnp.clip(jnp.floor(bx).astype(jnp.int32), 0, scfg.hf_dim_x - 1)
        iy0 = jnp.clip(jnp.floor(by).astype(jnp.int32), 0, scfg.hf_dim_y - 1)
        ix1 = jnp.minimum(ix0 + 1, scfg.hf_dim_x - 1)
        iy1 = jnp.minimum(iy0 + 1, scfg.hf_dim_y - 1)
        bidx = jnp.arange(batch.hf.shape[0])[:, None, None]
        hf_at = jnp.maximum(
            jnp.maximum(batch.hf[bidx, ix0, iy0], batch.hf[bidx, ix0, iy1]),
            jnp.maximum(batch.hf[bidx, ix1, iy0], batch.hf[bidx, ix1, iy1]))
        clearance = pts[..., 2] - self.model.contact_point_radius
        pen = jnp.maximum(hf_at - clearance, 0.0)
        losses["hf_collision"] = cfg.w_hf * m(pen**2)

        # target direction: net root xy displacement should follow target
        disp = p["root_pos"][:, -1, 0:2] - p["root_pos"][:, 0, 0:2]
        norm = jnp.linalg.norm(disp, axis=-1, keepdims=True)
        dir_pred = disp / jnp.maximum(norm, 1e-3)
        has_target = (jnp.linalg.norm(batch.target_dir, axis=-1) > 1e-6)
        cos = jnp.sum(dir_pred * batch.target_dir, axis=-1)
        losses["target"] = cfg.w_target * jnp.where(has_target,
                                                    1.0 - cos, 0.0)
        return losses

    # ------------------------------------------------------------------
    def loss_fn(self, params, state: MDMState, batch, rng):
        cfg = self.cfg
        b = batch.frames.shape[0]
        k_t, k_n, k_cd, k_pn, k_drop = jax.random.split(rng, 5)

        gt_std, prev_std = self._standardize(state, batch.frames,
                                             batch.prev_states)
        t = jax.random.randint(k_t, (b,), 0, self.rates.num_timesteps)
        noise = jax.random.normal(k_n, gt_std.shape)
        x_t = schedules.forward_diffusion(self.rates, gt_std, t, noise)

        # condition dropout masks
        k1, k2, k3 = jax.random.split(k_cd, 3)
        hf_mask = (jax.random.uniform(k1, (b,)) > cfg.hf_dropout)
        tgt_mask = (jax.random.uniform(k2, (b,)) > cfg.target_dropout)
        prev_mask = (jax.random.uniform(k3, (b,)) > cfg.prev_state_dropout)

        # prev-state noising with indicator (autoregressive robustness)
        k4, k5, k6 = jax.random.split(k_pn, 3)
        noised_flag = (jax.random.uniform(k4, (b,))
                       > cfg.prev_state_noise_chance)
        t_prev = jax.random.randint(k5, (b,), 0,
                                    self.rates.num_timesteps // 4)
        prev_noise = jax.random.normal(k6, prev_std.shape)
        prev_noisy = schedules.forward_diffusion(self.rates, prev_std,
                                                 t_prev, prev_noise)
        prev_in = jnp.where(noised_flag[:, None, None], prev_noisy, prev_std)

        # OOD condition resampling (reference: mdm.py:903-940): some rows
        # get a fresh synthetic heightfield and a randomly rotated target;
        # their clean-signal matching losses are zeroed so only the
        # hf-collision and target objectives train on them
        hf = batch.hf
        target_dir = batch.target_dir
        ood = jnp.zeros((b,), bool)
        if cfg.ood_chance > 0:
            k7, k8, k9 = jax.random.split(k_cd, 3)
            ood = jax.random.uniform(k7, (b,)) < cfg.ood_chance
            center_z = hf[:, self.scfg.hf_num_x_neg, self.scfg.hf_num_y]
            ood_hf = sampler_lib.generate_ood_hfs(self.scfg, k8, b, center_z)
            hf = jnp.where(ood[:, None, None], ood_hf, hf)
            ang = jax.random.uniform(k9, (b,)) * 2 * jnp.pi
            rot_tgt = rot.rotate_2d_vec(batch.target_dir, ang)
            target_dir = jnp.where(ood[:, None], rot_tgt, target_dir)
            batch = batch.replace(hf=hf, target_dir=target_dir)

        # activation-dropout masks need ~600M random bits per forward;
        # threefry generates them at ~30 ms on a v5e chip (~75% of a full
        # denoiser forward).  The TPU-native rbg generator is ~free, and
        # dropout only needs statistical (not cryptographic/portable)
        # bits — so re-key the dropout stream onto rbg.
        k_drop = _rbg_key(k_drop)
        pred = self.net.apply(
            params, x_t, t, prev_in, hf, target_dir,
            hf_mask=hf_mask.astype(jnp.float32),
            target_mask=tgt_mask.astype(jnp.float32),
            prev_state_mask=prev_mask.astype(jnp.float32),
            prev_state_noised=noised_flag.astype(jnp.float32),
            deterministic=False, rngs={"dropout": k_drop})

        losses = self._geometric_losses(state, pred, gt_std, batch)
        keep_on_ood = ("hf_collision", "target")
        losses = {
            k: jnp.mean(v if k in keep_on_ood
                        else jnp.where(ood, 0.0, v))
            for k, v in losses.items()}
        total = sum(losses.values())
        return total, losses

    # ------------------------------------------------------------------
    def train_step(self, lib: ml.MotionLib, state: MDMState):
        """One jitted optimization step (sampling fused in)."""
        cfg = self.cfg
        rng, k_batch, k_loss = jax.random.split(state.rng, 3)
        batch = sampler_lib.sample_batch(self.model, self.scfg, lib, k_batch,
                                         cfg.batch_size)
        (total, losses), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(state.params, state, batch, k_loss)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA after warmup
        decay = jnp.where(state.step >= cfg.ema_start, cfg.ema_decay, 0.0)
        ema = jax.tree.map(lambda e, p: decay * e + (1 - decay) * p,
                           state.ema_params, params)
        new_state = state.replace(params=params, ema_params=ema,
                                  opt_state=opt_state, rng=rng,
                                  step=state.step + 1)
        metrics = {"total": total, **losses}
        return new_state, metrics

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------

    def _denoise(self, params, state, x_t, t, prev_std, hf, target_dir,
                 guidance_scale: float = 1.0, prev_noised=None,
                 cond_cache=None, use_prev_state: bool = True):
        b = x_t.shape[0]
        ones = jnp.ones((b,))

        if cond_cache is not None:
            cond_toks, uncond_toks = cond_cache
            if guidance_scale == 1.0:
                return self.net.apply(params, x_t, t, cond_toks=cond_toks,
                                      deterministic=True)
            # CFG pair as ONE 2B-batch encoder pass (better MXU
            # utilization + half the dispatches vs two sequential calls)
            both = self.net.apply(
                params, jnp.concatenate([x_t, x_t], 0),
                jnp.concatenate([t, t], 0),
                cond_toks=jnp.concatenate([cond_toks, uncond_toks], 0),
                deterministic=True)
            cond, uncond = both[:b], both[b:]
            return uncond + guidance_scale * (cond - uncond)

        def call(hf_m, tgt_m, prev_m):
            return self.net.apply(
                params, x_t, t, prev_std, hf, target_dir,
                hf_mask=hf_m, target_mask=tgt_m, prev_state_mask=prev_m,
                prev_state_noised=prev_noised, deterministic=True)

        # use_prev_state: static bool, or a per-sample (b,) {0,1} mask (the
        # reference's per-env use_prev_state tensor, mgdm_env.py:644-645)
        cond = call(ones, ones, ones * use_prev_state)
        if guidance_scale == 1.0:
            return cond
        uncond = call(ones, jnp.zeros((b,)), jnp.zeros((b,)))
        return uncond + guidance_scale * (cond - uncond)

    def _encode_cond_cache(self, params, prev_std, hf, target_dir,
                           guidance_scale: float, prev_noised=None,
                           use_prev_state: bool = True):
        """Precompute the timestep-independent condition tokens once per
        sampling run (the reference's fast_forward cache,
        diffusion/mdm_transformer.py fast_forward): the hf CNN, target
        and prev-state tokens are reused by every denoise step instead
        of being recomputed ~200x inside the scan."""
        b = prev_std.shape[0]
        ones = jnp.ones((b,))
        zeros = jnp.zeros((b,))

        def enc(tgt_m, prev_m):
            return self.net.apply(
                params, prev_std, hf, target_dir, ones, tgt_m, prev_m,
                prev_noised, method="encode_conditions")

        cond = enc(ones, ones * use_prev_state)
        uncond = enc(zeros, zeros) if guidance_scale != 1.0 else None
        return cond, uncond

    def _post_x0(self, state, x0, hf, guidance, target_xy,
                 inpaint_frames, inpaint_mask):
        """Hooks applied to the predicted clean signal each denoise step:
        dof-limit projection, gradient guidance, in-painting (reference:
        mdm.py:1115-1145 project_dofs + apply_guidance + apply_in_paint)."""
        from parc_tpu.diffusion import guidance as guid_lib
        x0 = self._project_dofs(state, x0)
        if guidance is not None and guidance.active:
            x0 = guid_lib.apply_guidance(self, state, x0, hf, target_xy,
                                         guidance)
        if inpaint_frames is not None:
            x0 = guid_lib.apply_inpaint(x0, inpaint_frames, inpaint_mask)
        return x0

    def _project_dofs(self, state: MDMState, x_std):
        """Clamp predicted joint dofs to joint limits (unstandardized
        space; reference: mdm.py project_dofs / kin_char_model:951-961)."""
        x = self._unstandardize_frames(state, x_std)
        feats = sampler_lib.split_features(self.model, x)
        i2 = 3 + 3 + 3 * (self.model.num_bodies - 1)
        i3 = i2 + self.model.dof_size
        dof = jnp.clip(feats["dof"], jnp.asarray(self.model.dof_limits_lower),
                       jnp.asarray(self.model.dof_limits_upper))
        x = jnp.concatenate([x[..., :i2], dof, x[..., i3:]], axis=-1)
        np_ = self.scfg.num_prev_states
        return (x - state.mean[np_:]) / state.std[np_:]

    def ddim_sample(self, state: MDMState, rng, prev_states, hf, target_dir,
                    stride: int = 5, guidance_scale: float = 1.0,
                    use_ema: bool = True, guidance=None, target_xy=None,
                    inpaint_frames=None, inpaint_mask=None,
                    use_prev_state: bool = True):
        """DDIM (eta=0) sampling of one 15-frame window (standardized in/out
        handled internally; returns unstandardized canonical frames).

        guidance: optional GuidanceParams; target_xy (B, 2) canonical;
        inpaint_frames (B, T, F) unstandardized + inpaint_mask (T,) or
        (B, T) pins frames each step."""
        params = state.ema_params if use_ema else state.params
        b = prev_states.shape[0]
        np_ = self.scfg.num_prev_states
        prev_std = (prev_states - state.mean[:np_]) / state.std[:np_]
        if inpaint_frames is not None:
            inpaint_frames = (inpaint_frames - state.mean[np_:]) \
                / state.std[np_:]

        timesteps = jnp.arange(0, self.rates.num_timesteps, stride)[::-1]
        x = jax.random.normal(
            rng, (b, self.scfg.seq_len, self.frame_dim))

        strong_hf = guidance is not None and guidance.strong_hf_guidance
        # fast_forward condition cache: hoisted out of the scan (invalid
        # under strong hf guidance, which re-tokenizes a changing hf)
        cond_cache = None if strong_hf else self._encode_cond_cache(
            params, prev_std, hf, target_dir, guidance_scale,
            use_prev_state=use_prev_state)

        def body(x, idx):
            t_cur = timesteps[idx]
            t_batch = jnp.full((b,), t_cur, jnp.int32)
            if strong_hf:
                from parc_tpu.diffusion import guidance as guid_lib
                x0, _ = guid_lib.hf_guidance_x0(
                    self, params, state, x, t_batch, prev_std, hf,
                    target_dir, target_xy, guidance,
                    use_prev_state=use_prev_state)
            else:
                x0 = self._denoise(params, state, x, t_batch, prev_std, hf,
                                   target_dir, guidance_scale,
                                   cond_cache=cond_cache)
            x0 = self._post_x0(state, x0, hf, guidance, target_xy,
                               inpaint_frames, inpaint_mask)
            ac_t = schedules.gather(self.rates.alphas_cumprod, t_cur)
            t_next = jnp.where(idx + 1 < timesteps.shape[0],
                               timesteps[jnp.minimum(idx + 1,
                                                     timesteps.shape[0] - 1)],
                               -1)
            ac_next = jnp.where(
                t_next >= 0,
                schedules.gather(self.rates.alphas_cumprod,
                                 jnp.maximum(t_next, 0)),
                1.0)
            eps = (x - jnp.sqrt(ac_t) * x0) / jnp.sqrt(1.0 - ac_t)
            x_next = (jnp.sqrt(ac_next) * x0
                      + jnp.sqrt(jnp.maximum(1.0 - ac_next, 0.0)) * eps)
            return x_next, None

        x, _ = jax.lax.scan(body, x, jnp.arange(timesteps.shape[0]))
        return self._unstandardize_frames(state, x)

    def ddpm_sample(self, state: MDMState, rng, prev_states, hf, target_dir,
                    guidance_scale: float = 1.0, use_ema: bool = True,
                    guidance=None, target_xy=None,
                    inpaint_frames=None, inpaint_mask=None,
                    use_prev_state: bool = True):
        """Full ancestral DDPM sampling (predict-x0 posterior)."""
        params = state.ema_params if use_ema else state.params
        b = prev_states.shape[0]
        np_ = self.scfg.num_prev_states
        prev_std = (prev_states - state.mean[:np_]) / state.std[:np_]
        if inpaint_frames is not None:
            inpaint_frames = (inpaint_frames - state.mean[np_:]) \
                / state.std[np_:]
        n = self.rates.num_timesteps

        k_init, k_loop = jax.random.split(rng)
        x = jax.random.normal(
            k_init, (b, self.scfg.seq_len, self.frame_dim))
        cond_cache = self._encode_cond_cache(params, prev_std, hf,
                                             target_dir, guidance_scale,
                                             use_prev_state=use_prev_state)

        def body(carry, t_rev):
            x, key = carry
            t_cur = n - 1 - t_rev
            key, k_n = jax.random.split(key)
            t_batch = jnp.full((b,), t_cur, jnp.int32)
            x0 = self._denoise(params, state, x, t_batch, prev_std, hf,
                               target_dir, guidance_scale,
                               cond_cache=cond_cache)
            x0 = self._post_x0(state, x0, hf, guidance, target_xy,
                               inpaint_frames, inpaint_mask)
            mean = (schedules.gather(self.rates.posterior_mean_x0_coef,
                                     t_cur) * x0
                    + schedules.gather(self.rates.posterior_mean_xt_coef,
                                       t_cur) * x)
            logvar = schedules.gather(
                self.rates.posterior_log_variance_clipped, t_cur)
            noise = jax.random.normal(k_n, x.shape)
            x = mean + jnp.where(t_cur > 0,
                                 jnp.exp(0.5 * logvar), 0.0) * noise
            return (x, key), None

        (x, _), _ = jax.lax.scan(body, (x, k_loop), jnp.arange(n))
        return self._unstandardize_frames(state, x)
