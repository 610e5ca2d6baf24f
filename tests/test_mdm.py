"""MDM diffusion stack tests (small config for CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_lib as ml
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.data.synthetic import standing_clip, walking_clip
from parc_tpu.diffusion import sampler as sampler_lib
from parc_tpu.diffusion import schedules
from parc_tpu.diffusion.mdm import MDM, MDMConfig


@pytest.fixture(scope="module")
def setup():
    model = humanoid_spec().build()
    lib = ml.build_motion_lib(
        model, [walking_clip(seed=0), walking_clip(seed=1, speed=1.0),
                standing_clip()])
    cfg = MDMConfig(diffusion_timesteps=51, batch_size=8, d_model=64,
                    num_heads=4, d_hid=64, num_layers=2, ema_start=1)
    mdm = MDM(model, cfg)
    return model, lib, mdm


def test_schedule_properties():
    rates = schedules.make_rates(101)
    ac = np.asarray(rates.alphas_cumprod)
    assert ac[0] > 0.99
    assert ac[-1] < 0.01
    assert np.all(np.diff(ac) < 0)
    # forward diffusion at t=0 is nearly identity
    x0 = jnp.ones((2, 3))
    xt = schedules.forward_diffusion(rates, x0, jnp.zeros((2,), jnp.int32),
                                     jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(xt), np.asarray(x0) * ac[0]**0.5,
                               rtol=1e-5)


def test_sampler_batch(setup):
    model, lib, mdm = setup
    scfg = mdm.scfg
    batch = sampler_lib.sample_batch(model, scfg, lib,
                                     jax.random.PRNGKey(0), 16)
    assert batch.frames.shape == (16, 15, mdm.frame_dim)
    assert batch.prev_states.shape == (16, 2, mdm.frame_dim)
    assert batch.hf.shape == (16, 31, 31)
    assert batch.target_dir.shape == (16, 2)
    for leaf in jax.tree.leaves(batch):
        assert np.all(np.isfinite(np.asarray(leaf)))
    # canonicalization: last prev state sits at origin with zero heading
    feats = sampler_lib.split_features(model, batch.prev_states[:, -1])
    np.testing.assert_allclose(np.asarray(feats["root_pos"][:, 0:2]), 0.0,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(feats["root_pos"][:, 2]), 0.0,
                               atol=1e-4)
    from parc_tpu.utils import rotation as rot
    q = rot.exp_map_to_quat(jnp.asarray(feats["root_rot"]))
    headings = np.asarray(rot.calc_heading(q))
    np.testing.assert_allclose(headings, 0.0, atol=1e-3)


def test_exact_feature_stats(setup):
    """Exact stats = brute-force enumeration of every window; deterministic
    (no rng), matching the reference's whole-dataset computation
    (diffusion/mdm.py:480-548); small chunk sizes don't change the result."""
    model, lib, mdm = setup
    scfg = mdm.scfg
    mean, std = sampler_lib.compute_feature_stats_exact(model, scfg, lib)
    assert mean.shape == (scfg.total_frames, mdm.frame_dim)

    # brute force: all windows on the dt grid, single full batch
    dt = 1.0 / scfg.fps
    window = (scfg.total_frames - 1) * dt
    lengths = np.asarray(lib.lengths)
    counts = np.maximum(
        np.floor((lengths - window) / dt + 1e-6).astype(int) + 1, 1)
    ids = np.repeat(np.arange(len(counts)), counts).astype(np.int32)
    t0 = np.concatenate([np.arange(c) for c in counts]) * dt
    feats, _ = sampler_lib.window_features(
        model, scfg, lib, jnp.asarray(ids), jnp.asarray(t0, jnp.float32))
    ref_mean = np.mean(np.asarray(feats), axis=0)
    ref_std = np.maximum(np.std(np.asarray(feats), axis=0), 1e-3)
    np.testing.assert_allclose(np.asarray(mean), ref_mean, atol=1e-4)
    np.testing.assert_allclose(np.asarray(std), ref_std, atol=1e-4)

    # chunking must not change the result (weighted padding correctness)
    mean2, std2 = sampler_lib.compute_feature_stats_exact(
        model, scfg, lib, chunk=37)
    np.testing.assert_allclose(np.asarray(mean2), np.asarray(mean),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(std2), np.asarray(std), atol=1e-5)


def test_train_step_decreases_loss(setup):
    model, lib, mdm = setup
    state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=256)
    step = jax.jit(lambda s: mdm.train_step(lib, s))
    first = None
    losses = []
    for _ in range(10):
        state, metrics = step(state)
        losses.append(float(metrics["total"]))
    assert np.all(np.isfinite(losses))
    assert int(state.step) == 10
    # not strictly monotone, but should not diverge
    assert losses[-1] < losses[0] * 3


def test_ddim_sampling_shapes(setup):
    model, lib, mdm = setup
    state = mdm.init(lib, jax.random.PRNGKey(1), stats_samples=128)
    b = 4
    batch = sampler_lib.sample_batch(model, mdm.scfg, lib,
                                     jax.random.PRNGKey(2), b)
    out = jax.jit(lambda: mdm.ddim_sample(
        state, jax.random.PRNGKey(3), batch.prev_states, batch.hf,
        batch.target_dir, stride=10))()
    assert out.shape == (b, 15, mdm.frame_dim)
    assert np.all(np.isfinite(np.asarray(out)))
    # CFG path also runs
    out2 = mdm.ddim_sample(state, jax.random.PRNGKey(4), batch.prev_states,
                           batch.hf, batch.target_dir, stride=25,
                           guidance_scale=2.0)
    assert np.all(np.isfinite(np.asarray(out2)))


def test_ddim_without_prev_state(setup):
    """use_prev_state=False (reference path-start regime,
    mdm_path.py:149-161) must drop the prev-state condition: the output
    stays finite and actually differs from the conditioned sample."""
    model, lib, mdm = setup
    state = mdm.init(lib, jax.random.PRNGKey(1), stats_samples=128)
    batch = sampler_lib.sample_batch(model, mdm.scfg, lib,
                                     jax.random.PRNGKey(2), 4)
    cond = mdm.ddim_sample(state, jax.random.PRNGKey(5), batch.prev_states,
                           batch.hf, batch.target_dir, stride=25)
    free = mdm.ddim_sample(state, jax.random.PRNGKey(5), batch.prev_states,
                           batch.hf, batch.target_dir, stride=25,
                           use_prev_state=False)
    assert np.all(np.isfinite(np.asarray(free)))
    assert not np.allclose(np.asarray(free), np.asarray(cond), atol=1e-4)
    # and the prev frames themselves no longer matter
    free2 = mdm.ddim_sample(state, jax.random.PRNGKey(5),
                            batch.prev_states * 0.0 + 7.0,
                            batch.hf, batch.target_dir, stride=25,
                            use_prev_state=False)
    np.testing.assert_allclose(np.asarray(free2), np.asarray(free),
                               atol=1e-4)
    # per-sample mask (reference mgdm_env.py:644-645 per-env tensor):
    # masked rows match the unconditioned sample, unmasked the conditioned
    mask = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    mixed = mdm.ddim_sample(state, jax.random.PRNGKey(5),
                            batch.prev_states, batch.hf, batch.target_dir,
                            stride=25, use_prev_state=mask)
    np.testing.assert_allclose(np.asarray(mixed[0]), np.asarray(cond[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mixed[1]), np.asarray(free[1]),
                               atol=1e-4)


def test_guidance_and_inpaint(setup):
    """Gradient guidance + in-painting + dof projection hooks
    (reference: diffusion/mdm.py:1444-1560)."""
    from parc_tpu.diffusion import guidance as guid_lib
    model, lib, mdm = setup
    state = mdm.init(lib, jax.random.PRNGKey(5), stats_samples=128)
    b = 2
    batch = sampler_lib.sample_batch(model, mdm.scfg, lib,
                                     jax.random.PRNGKey(6), b)
    gp = guid_lib.GuidanceParams(use_target=True, use_hf=True,
                                 guide_speed=True, guide_acc=True,
                                 guide_jerk=True, guidance_str=0.01)
    target_xy = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    out = jax.jit(lambda: mdm.ddim_sample(
        state, jax.random.PRNGKey(7), batch.prev_states, batch.hf,
        batch.target_dir, stride=25, guidance=gp, target_xy=target_xy))()
    assert out.shape == (b, 15, mdm.frame_dim)
    assert np.all(np.isfinite(np.asarray(out)))

    # guidance changed the sample vs unguided (same rng)
    base = mdm.ddim_sample(state, jax.random.PRNGKey(7), batch.prev_states,
                           batch.hf, batch.target_dir, stride=25)
    assert float(jnp.max(jnp.abs(out - base))) > 1e-6

    # in-painting pins the final frame exactly (unstandardized space)
    paint = mdm._unstandardize_frames(state, base)
    mask = jnp.zeros((15,), bool).at[-1].set(True)
    out_ip = mdm.ddim_sample(state, jax.random.PRNGKey(8),
                             batch.prev_states, batch.hf, batch.target_dir,
                             stride=25, inpaint_frames=paint,
                             inpaint_mask=mask)
    np.testing.assert_allclose(np.asarray(out_ip[:, -1]),
                               np.asarray(paint[:, -1]), atol=1e-3)

    # dof projection keeps predicted dofs inside joint limits
    feats = sampler_lib.split_features(model, out)
    lo = np.asarray(model.dof_limits_lower) - 1e-4
    hi = np.asarray(model.dof_limits_upper) + 1e-4
    dof = np.asarray(feats["dof"])
    assert np.all(dof >= lo) and np.all(dof <= hi)


def test_strong_hf_guidance(setup):
    """Heightfield-optimizing guidance (reference: mdm.py:1562-1651)."""
    from parc_tpu.diffusion import guidance as guid_lib
    model, lib, mdm = setup
    state = mdm.init(lib, jax.random.PRNGKey(9), stats_samples=128)
    batch = sampler_lib.sample_batch(model, mdm.scfg, lib,
                                     jax.random.PRNGKey(10), 2)
    gp = guid_lib.GuidanceParams(use_target=True, use_hf=True,
                                 strong_hf_guidance=True, hf_iters=2,
                                 guidance_str=0.05)
    out = jax.jit(lambda: mdm.ddim_sample(
        state, jax.random.PRNGKey(11), batch.prev_states, batch.hf,
        batch.target_dir, stride=25, guidance=gp,
        target_xy=jnp.ones((2, 2))))()
    assert np.all(np.isfinite(np.asarray(out)))


def test_rot_changer_roundtrip():
    """frames34 -> {quat, tan_norm} -> frames34 preserves the pose
    (reference: diffusion/utils/rot_changer.py:8-100)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from parc_tpu.anim import char_model as cm
    from parc_tpu.data.humanoid import humanoid_spec
    from parc_tpu.data.synthetic import walking_clip
    from parc_tpu.diffusion.rot_changer import ROT_TYPES, RotChanger
    from parc_tpu.utils import rotation as rot

    model = humanoid_spec().build()
    frames = jnp.asarray(walking_clip(seed=3).frames[:8])
    for rt in ROT_TYPES:
        rc = RotChanger(model, rt)
        enc = rc.from_frames34(frames)
        assert enc.shape[-1] == rc.frame_dim
        dec = rc.to_frames34(enc)
        assert dec.shape == frames.shape
        # compare poses via FK (dof/exp-map have sign ambiguities)
        def fk(f):
            return cm.forward_kinematics(
                model, f[..., 0:3], rot.exp_map_to_quat(f[..., 3:6]),
                cm.dof_to_rot(model, f[..., 6:]))[0]
        np.testing.assert_allclose(np.asarray(fk(dec)),
                                   np.asarray(fk(frames)),
                                   atol=1e-4, err_msg=rt)
    with __import__("pytest").raises(ValueError):
        RotChanger(model, "matrix")


def test_rates_golden_vs_reference(reference_root):
    """Golden parity of every diffusion-schedule quantity against the
    reference's own DiffusionRates (diffusion/diffusion_util.py:71-131;
    imported, not copied)."""
    import sys
    import torch
    sys.path.insert(0, str(reference_root))
    try:
        from diffusion import diffusion_util as ref_du
    finally:
        sys.path.pop(0)

    T = 101
    ref = ref_du.DiffusionRates(T, device="cpu")
    ours = schedules.make_rates(T)

    def cmp(a, b, name):
        # ours computes the schedule in f64 then casts; the reference is
        # f32 throughout - tolerance covers the rounding, not semantics
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=5e-6,
                                   rtol=1e-4, err_msg=name)

    cmp(ours.betas, ref.betas, "betas")
    cmp(ours.alphas_cumprod, ref.alphas_cumprod, "alphas_cumprod")
    cmp(ours.sqrt_alphas_cumprod, ref.sqrt_alphas_cumprod,
        "sqrt_alphas_cumprod")
    cmp(ours.sqrt_one_minus_alphas_cumprod,
        ref.sqrt_one_minus_alphas_cumprod, "sqrt_1m_alphas_cumprod")
    cmp(ours.posterior_mean_x0_coef, ref.posterior_mean_coef1,
        "posterior_mean_coef1")
    cmp(ours.posterior_mean_xt_coef, ref.posterior_mean_coef2,
        "posterior_mean_coef2")
    cmp(jnp.sqrt(ours.posterior_variance), ref.posterior_std,
        "posterior_std")

    # forward diffusion q(x_t | x_0) with shared noise
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 7)).astype(np.float32)
    noise = rng.normal(size=(4, 7)).astype(np.float32)
    t = np.asarray([0, 10, 50, 100])
    ours_xt = schedules.forward_diffusion(
        schedules.make_rates(T), jnp.asarray(x0),
        jnp.asarray(t, jnp.int32), jnp.asarray(noise))
    ref_xt = (ref.sqrt_alphas_cumprod[t, None] * torch.tensor(x0)
              + ref.sqrt_one_minus_alphas_cumprod[t, None]
              * torch.tensor(noise))
    np.testing.assert_allclose(np.asarray(ours_xt), ref_xt.numpy(),
                               atol=1e-6, rtol=1e-5)


def test_timestep_embedding_golden_vs_reference(reference_root):
    """Our concat [cos|sin] layout is a fixed permutation of the
    reference's interleaved PositionalEncoding table (diffusion_util.py:
    202-217) with identical frequencies."""
    import sys
    sys.path.insert(0, str(reference_root))
    try:
        from diffusion import diffusion_util as ref_du
    finally:
        sys.path.pop(0)

    d, T = 64, 101
    pe = ref_du.PositionalEncoding(d, 0.0, T).pe[0].numpy()     # (T, d)
    ours = np.asarray(schedules.timestep_embedding(
        jnp.arange(T, dtype=jnp.float32), d))                   # (T, d)
    half = d // 2
    np.testing.assert_allclose(ours[:, half:], pe[:, 0::2], atol=1e-5,
                               err_msg="sin half")
    np.testing.assert_allclose(ours[:, :half], pe[:, 1::2], atol=1e-5,
                               err_msg="cos half")
