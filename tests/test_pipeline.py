"""End-to-end mini PARC loop: dataset -> MDM -> kin-gen -> tracker -> record.

Everything tiny (CPU-sized), but the full pipeline wiring is exercised:
the same stages the reference runs as parc_1..parc_5.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parc_tpu.anim import motion_data as md
from parc_tpu.data.humanoid import humanoid_spec
from parc_tpu.data.synthetic import standing_clip, walking_clip


@pytest.fixture(scope="module")
def model():
    return humanoid_spec().build()


@pytest.fixture(scope="module")
def dataset_yaml(tmp_path_factory, model):
    root = tmp_path_factory.mktemp("motions")
    (root / "walking").mkdir()
    (root / "standing").mkdir()
    md.save_motion_data(str(root / "walking" / "walk_0.npz"),
                        walking_clip(seed=0))
    md.save_motion_data(str(root / "walking" / "walk_1.npz"),
                        walking_clip(seed=1, speed=1.0))
    md.save_motion_data(str(root / "standing" / "stand_0.npz"),
                        standing_clip())
    from parc_tpu.pipeline import dataset
    out = dataset.create_dataset_yaml(str(root), str(root / "motions.yaml"))
    return out


def test_create_and_load_dataset(dataset_yaml, model):
    import yaml
    from parc_tpu.pipeline import dataset
    with open(dataset_yaml) as f:
        manifest = yaml.safe_load(f)
    assert len(manifest["motions"]) == 3
    classes = {m["class"] for m in manifest["motions"]}
    assert classes == {"walking", "standing"}
    # class-balanced: weights per class sum to ~1/2
    for cls in classes:
        s = sum(m["weight"] for m in manifest["motions"]
                if m["class"] == cls)
        assert 0.4 < s < 0.65, (cls, s)
    lib = dataset.load_dataset(model, dataset_yaml)
    assert lib.num_motions == 3


def test_tracker_train_and_record(dataset_yaml, model, tmp_path):
    from parc_tpu.envs.base import EnvConfig
    from parc_tpu.envs.deepmimic import DeepMimicEnv
    from parc_tpu.learning.ppo import PPOAgent, PPOConfig
    from parc_tpu.physics import engine
    from parc_tpu.pipeline import dataset, record, train_tracker

    lib = dataset.load_dataset(model, dataset_yaml)
    env = DeepMimicEnv(model, engine.SimParams(),
                       EnvConfig(num_envs=4))
    agent = PPOAgent(env, PPOConfig(
        steps_per_iter=4, update_epochs=1, batch_size=1,
        actor_net="fc_2layers_512units", critic_net="fc_2layers_512units"))
    tcfg = train_tracker.TrainerConfig(
        output_dir=str(tmp_path / "tracker"), iters_per_output=2,
        iters_per_checkpoint=2, test_steps=6)
    state = train_tracker.train(agent, lib, tcfg, max_iters=3,
                                meta=dataset.dataset_meta(dataset_yaml))
    assert float(state.sample_count) == 3 * 4 * 4

    # min-episodes-per-env evaluation (reference: base_agent.py:328-362):
    # the while-loop runs past short episodes until every env contributed
    # ceil(test_episodes/num_envs) episodes (bounded by max_steps)
    test_fn = train_tracker.make_test_fn(agent, 400, test_episodes=8)
    test = test_fn(jax.device_put(lib), state, jax.random.PRNGKey(1))
    assert int(test["num_eps"]) >= 8
    assert int(test["test_steps"]) <= 400
    comp = np.asarray(test["component_returns"])
    assert comp.shape == (6,) and np.all(np.isfinite(comp))
    assert np.isfinite(float(test["mean_return"]))
    # checkpoint written and restorable into a *different* num_envs
    # (persistent sub-pytree excludes per-env transients)
    from parc_tpu.learning import ppo as ppo_lib
    from parc_tpu.utils import checkpoint as ckpt_lib
    # final checkpoint at it=3 (off-interval) in addition to it=2
    assert ckpt_lib.latest_step(str(tmp_path / "tracker/checkpoints")) == 3
    env2 = DeepMimicEnv(model, engine.SimParams(), EnvConfig(num_envs=2))
    agent2 = PPOAgent(env2, agent.cfg)
    fresh = agent2.init(lib, jax.random.PRNGKey(0))
    restored = ckpt_lib.restore(str(tmp_path / "tracker/checkpoints"),
                                ppo_lib.persistent_state(fresh))
    merged = ppo_lib.merge_persistent(fresh, restored)
    assert float(merged.sample_count) > 0

    # eval stage (run.py test/test2 parity): deterministic rollout metrics
    # + network diagnostics from the saved checkpoint
    from parc_tpu.pipeline import cli
    cli.stage_eval(dict(
        dataset=dataset_yaml, tracker_dir=str(tmp_path / "tracker"),
        num_envs=2, test_steps=4, diagnostics=True,
        actor_net="fc_2layers_512units", critic_net="fc_2layers_512units"))

    # record stage: one env per motion (standing should track; walkers may
    # fail at this training level but the machinery must produce output)
    env_r = DeepMimicEnv(model, engine.SimParams(),
                         EnvConfig(num_envs=lib.num_motions,
                                   rand_reset=False))
    agent_r = PPOAgent(env_r, agent.cfg)
    rcfg = record.RecordConfig(start_fractions=(0.0, 0.3), max_steps=40,
                               save_obs=True)
    results = record.record_motions(agent_r, lib, state, rcfg)
    assert len(results) == lib.num_motions
    saved = record.save_recorded(
        [r for r in results], str(tmp_path / "recorded"))
    for p in saved:
        clip = md.load_motion_data(p)
        assert clip.frames.shape[-1] == 34
        assert np.all(np.isfinite(clip.frames))
        # reference recorded clips carry per-step obs (README.md:99-105)
        assert clip.obs is not None
        assert clip.obs.shape == (clip.frames.shape[0], env_r.obs_dim)


def test_kin_gen_smoke(dataset_yaml, model, tmp_path):
    """Tiny MDM + kin-gen: untrained model, so just verify the machinery
    produces filtered/optimized clips end to end."""
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.opt import motion_opt
    from parc_tpu.pipeline import dataset, kin_gen
    from parc_tpu.procgen import mdm_path

    lib = dataset.load_dataset(model, dataset_yaml)
    mdm = MDM(model, MDMConfig(diffusion_timesteps=11, d_model=32,
                               num_heads=2, d_hid=32, num_layers=1))
    state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=64)

    cfg = kin_gen.KinGenConfig(
        num_rollouts=2, top_k=1, max_retries=1, mirror=True,
        max_contact_loss=1e9, max_pen_loss=1e9, max_total_loss=1e9,
        opt_cfg=motion_opt.MotionOptConfig(iters=10),
        path_cfg=mdm_path.PathGenSettings(batch_size=2, max_seconds=1.5))
    clips = kin_gen.gen_motion_and_terrain(mdm, state, cfg, seed=0)
    # untrained MDM: we only demand structural correctness
    assert isinstance(clips, list)
    for clip in clips:
        assert clip.frames.shape[-1] == 34
        assert clip.terrain is not None
        assert np.all(np.isfinite(clip.frames))


def test_multi_terrain_generation(dataset_yaml, model, tmp_path):
    """Batched multi-terrain generation (mdm_path.generate_frames_multi,
    the TPU answer to reference-scale kin-gen): per-row terrain
    conditioning matches the per-terrain single path exactly, and the
    batched kin-gen driver produces the same artifacts as sequential."""
    from parc_tpu.diffusion import gen as gen_lib
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.opt import motion_opt
    from parc_tpu.pipeline import dataset, kin_gen
    from parc_tpu.procgen import mdm_path
    from parc_tpu.utils import terrain as terrain_lib

    lib = dataset.load_dataset(model, dataset_yaml)
    mdm = MDM(model, MDMConfig(diffusion_timesteps=11, d_model=32,
                               num_heads=2, d_hid=32, num_layers=1))
    state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=64)

    # two terrains with DIFFERENT heights so cross-terrain conditioning
    # leakage would be visible
    t0 = terrain_lib.create_terrain(20, 20, dx=0.4, min_x=-4.0, min_y=-4.0)
    t1 = terrain_lib.create_terrain(24, 24, dx=0.4, min_x=-4.0, min_y=-4.0,
                                    height=0.7)

    # 1) stacked sample_local_hf == per-terrain single calls
    canon_xy = jnp.asarray([[0.0, 0.5], [-1.0, 1.0]])
    canon_z = jnp.asarray([0.8, 1.5])
    canon_h = jnp.asarray([0.3, -1.1])
    stacked = mdm_path._stack_terrains([t0, t1])
    hf_multi = gen_lib.sample_local_hf(
        mdm, stacked, canon_xy, canon_z, canon_h,
        terrain_idx=jnp.asarray([0, 1]))
    for i, t in enumerate([t0, t1]):
        hf_one = gen_lib.sample_local_hf(
            mdm, t, canon_xy[i:i + 1], canon_z[i:i + 1], canon_h[i:i + 1])
        np.testing.assert_allclose(np.asarray(hf_multi[i]),
                                   np.asarray(hf_one[0]), atol=1e-5)

    # 2) generate over both terrains in one batch
    nodes0 = np.asarray([[-3.0, -3.0, 0.0], [0.0, 0.0, 0.0],
                         [3.0, 3.0, 0.0]], np.float32)
    nodes1 = np.asarray([[-3.0, 0.0, 0.7], [0.0, 0.0, 0.7],
                         [2.0, 1.0, 0.7], [3.5, 2.0, 0.7]], np.float32)
    cfg = mdm_path.PathGenSettings(batch_size=2, max_seconds=1.0)
    results = mdm_path.generate_frames_multi(
        mdm, state, [t0, t1], [nodes0, nodes1], jax.random.PRNGKey(7), cfg)
    assert len(results) == 2
    for r in results:
        assert r.frames34.shape[0] == 2
        assert r.frames34.shape[-1] == 34
        assert np.all(np.isfinite(r.frames34))
        assert np.all(np.isfinite(r.total_loss))

    # 3) batched kin-gen driver: same file layout as sequential
    kcfg = kin_gen.KinGenConfig(
        num_rollouts=2, top_k=1, max_retries=1, mirror=False,
        max_contact_loss=1e9, max_pen_loss=1e9, max_total_loss=1e9,
        terrains_per_batch=2,
        opt_cfg=motion_opt.MotionOptConfig(iters=5),
        path_cfg=mdm_path.PathGenSettings(batch_size=2, max_seconds=1.0))
    out = str(tmp_path / "kgb")
    paths = kin_gen.run_kin_gen(mdm, state, 2, out, kcfg, seed=0)
    from parc_tpu.anim import motion_data as md
    for p in paths:
        clip = md.load_motion_data(p)
        assert clip.frames.shape[-1] == 34
        assert np.all(np.isfinite(clip.frames))


def test_kin_gen_file_terrain_mode(tmp_path):
    """terrain_style=file slices random windows out of stored terrains
    (reference: parc_2_kin_gen.py:236-287 ProcGenMode.FILE): slices vary
    with the rng, stay window-sized, and contain source heights."""
    import pathlib
    from parc_tpu.pipeline import kin_gen

    pkl = pathlib.Path("/root/reference/data/terrains/TEASER_TERRAIN.pkl")
    if not pkl.exists():
        pytest.skip("reference terrain pkl unavailable")
    cfg = kin_gen.KinGenConfig(terrain_style="file",
                               terrain_files=(str(pkl),), terrain_dim=8)
    rng = np.random.default_rng(0)
    hf1 = kin_gen.gen_terrain(cfg, rng)
    hf2 = kin_gen.gen_terrain(cfg, rng)
    assert hf1.shape == hf2.shape == (16, 16)
    assert not np.array_equal(hf1, hf2), "random windows must differ"
    assert float(hf1.min()) == 0.0  # re-floored to the window minimum
    # the slice carries real structure from the file, not a procgen draw
    assert float(hf1.max()) > 0.0
    # unknown style still rejects
    with pytest.raises(ValueError):
        kin_gen.gen_terrain(kin_gen.KinGenConfig(terrain_style="nope"), rng)


def test_cli_config_nested_dataclass_and_coercion():
    """--config YAML ergonomics: a nested ``opt_cfg:`` block becomes a
    MotionOptConfig (not a raw dict), and numeric strings coerce to the
    field type — PyYAML parses ``1.0e9`` (exponent without a sign) as a
    string, which previously crashed _select_keepers with a ufunc error."""
    from parc_tpu.opt import motion_opt
    from parc_tpu.pipeline import cli, kin_gen

    cfg = cli._dataclass_from_dict(kin_gen.KinGenConfig, {
        "max_contact_loss": "1.0e9",          # YAML-no-sign string float
        "num_rollouts": 4,
        "opt_cfg": {"iters": 7, "w_contact": "2.5e0"},
    })
    assert isinstance(cfg.max_contact_loss, float)
    assert cfg.max_contact_loss == 1.0e9
    assert isinstance(cfg.opt_cfg, motion_opt.MotionOptConfig)
    assert cfg.opt_cfg.iters == 7
    assert cfg.opt_cfg.w_contact == 2.5
    assert cfg.num_rollouts == 4


def test_kin_gen_job_sharding(model, tmp_path, monkeypatch):
    """Multi-job kin-gen sharding (reference parc_0_setup_iter.py:21-24
    writes num_batches_of_motions job configs): batches get disjoint seed
    slices and name-prefixed outputs that coexist in one directory."""
    from parc_tpu.anim import motion_data as md
    from parc_tpu.data.synthetic import standing_clip
    from parc_tpu.pipeline import kin_gen

    seeds = []

    def fake_gen(mdm, state, cfg, seed):
        seeds.append(seed)
        return [standing_clip(n=4)]

    monkeypatch.setattr(kin_gen, "gen_motion_and_terrain", fake_gen)
    out = str(tmp_path / "kg")
    cfg = kin_gen.KinGenConfig()
    # two jobs of the same 2-motion width, as cli.stage_kin_gen shards them
    p0 = kin_gen.run_kin_gen(None, None, 2, out, cfg, seed=0,
                             name_prefix="b0_")
    p1 = kin_gen.run_kin_gen(None, None, 2, out, cfg, seed=2,
                             name_prefix="b1_")
    assert seeds == [0, 1, 2, 3]          # disjoint seed slices
    names = sorted(os.path.basename(p) for p in p0 + p1)
    assert names == [f"b0_{cfg.terrain_style}_00000.npz",
                     f"b0_{cfg.terrain_style}_00001.npz",
                     f"b1_{cfg.terrain_style}_00000.npz",
                     f"b1_{cfg.terrain_style}_00001.npz"]
    for p in p0 + p1:                     # all loadable
        assert md.load_motion_data(p).frames.shape[-1] == 34


def test_mdm_validation_harness(dataset_yaml, model, tmp_path):
    """Seeded validation generation over a fixture terrain+path
    (reference: tools/motion_tests/mdm_validation_test.py)."""
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.pipeline import dataset
    from parc_tpu.procgen import mdm_path
    from parc_tpu.tools import validation
    from parc_tpu.utils import terrain as terrain_lib

    lib = dataset.load_dataset(model, dataset_yaml)
    mdm = MDM(model, MDMConfig(diffusion_timesteps=11, d_model=32,
                               num_heads=2, d_hid=32, num_layers=1))
    state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=64)

    terrain = terrain_lib.create_terrain(24, 24, dx=0.4, min_x=-4.8,
                                         min_y=-4.8)
    nodes = np.asarray([[-3.0, -3.0, 0.0], [0.0, 0.0, 0.0],
                        [3.0, 3.0, 0.0]], np.float32)
    fx = validation.ValidationFixture("flat_diag", terrain, nodes)
    cfg = mdm_path.PathGenSettings(batch_size=2, max_seconds=1.0)
    rows = validation.run_validation(
        mdm, state, [fx], output_dir=str(tmp_path / "val"), seed=0,
        path_cfg=cfg, top_k=2)
    assert len(rows) == 2
    for r in rows:
        assert np.isfinite(r["mean_jerk"])
        assert r["final_node_dist"] is not None
    summary = validation.summarize(rows)
    assert "final_node_dist_mean" in summary
    # deterministic: same seed -> same metrics
    rows2 = validation.run_validation(mdm, state, [fx], seed=0,
                                      path_cfg=cfg, top_k=2)
    assert rows2[0]["mean_jerk"] == rows[0]["mean_jerk"]
    import os
    assert len(os.listdir(tmp_path / "val")) == 2

    # checkpoint-history sweep (reference: compute_losses.py epoch sweep):
    # save two checkpoints, sweep both, rows tagged per step
    from parc_tpu.utils import checkpoint as ckpt_lib
    ckpt_dir = str(tmp_path / "ckpts")
    ckpt_lib.save(ckpt_dir, 1, state)
    ckpt_lib.save(ckpt_dir, 2, state)
    assert ckpt_lib.all_steps(ckpt_dir) == [1, 2]   # full history retained
    sweep = validation.sweep_checkpoints(mdm, state, ckpt_dir, [fx],
                                         seed=0, path_cfg=cfg, top_k=1)
    assert [r["checkpoint"] for r in sweep] == [1, 2]


def test_astar_mdm_replan(dataset_yaml, model, tmp_path):
    """Online A*+MDM replanning from the current pose (reference:
    dm_env.py:915-1030 astar_mdm): slice -> plan -> generate -> fresh
    single-clip MotionLib."""
    from parc_tpu.anim import motion_data as md
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.pipeline import dataset
    from parc_tpu.procgen import astar_mdm, mdm_path

    lib = dataset.load_dataset(model, dataset_yaml)
    mdm = MDM(model, MDMConfig(diffusion_timesteps=11, d_model=32,
                               num_heads=2, d_hid=32, num_layers=1))
    state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=64)

    dim = 40
    terrain = md.HostTerrain(
        hf=np.zeros((dim, dim), np.float32),
        min_point=np.asarray([-8.0, -8.0], np.float32),
        dxdy=np.asarray([0.4, 0.4], np.float32))
    prev = np.zeros((2, 34), np.float32)
    prev[:, 2] = 0.94
    prev_c = np.zeros((2, model.num_bodies), np.float32)
    prev_c[:, [11, 14]] = 1.0

    cfg = astar_mdm.AStarMDMSettings(
        path=mdm_path.PathGenSettings(batch_size=2, max_seconds=1.0),
        save_path=str(tmp_path / "astar_mdm.npz"))
    out = astar_mdm.astar_mdm_replan(
        mdm, state, terrain, prev, prev_c,
        np.asarray([4.0, 4.0], np.float32), jax.random.PRNGKey(0), cfg)
    assert out is not None
    clip, new_lib = out
    assert clip.frames.shape[-1] == 34
    assert np.all(np.isfinite(clip.frames))
    # warm start keeps the character's REAL recent frames at the clip head
    # (reference includes out_prev_state in the generated window) so the
    # tracked reference is continuous with the current pose
    np.testing.assert_allclose(clip.frames[:2], prev, atol=1e-5)
    assert new_lib.num_motions == 1
    assert (tmp_path / "astar_mdm.npz").exists()
    reloaded = md.load_motion_data(str(tmp_path / "astar_mdm.npz"))
    assert reloaded.frames.shape == clip.frames.shape


def test_loss_roundtrip_and_dataset_filter(model, tmp_path):
    """Generated-clip losses persist through .npz and gate dataset
    inclusion (reference: PARC/util/create_dataset.py:118-137)."""
    from parc_tpu.pipeline import dataset

    root = tmp_path / "motions"
    (root / "gen").mkdir(parents=True)
    good = walking_clip(seed=0)
    good.losses = {"contact": 0.5, "pen": 0.2, "total": 5.0}
    bad = walking_clip(seed=1)
    bad.losses = {"contact": 9.0, "pen": 0.2, "total": 12.0}
    md.save_motion_data(str(root / "gen" / "good.npz"), good)
    md.save_motion_data(str(root / "gen" / "bad.npz"), bad)

    reloaded = md.load_motion_data(str(root / "gen" / "good.npz"))
    assert reloaded.losses == pytest.approx(
        {"contact": 0.5, "pen": 0.2, "total": 5.0})

    out = dataset.create_dataset_yaml(str(root), str(tmp_path / "d.yaml"))
    import yaml
    with open(out) as f:
        manifest = yaml.safe_load(f)
    files = [m["file"] for m in manifest["motions"]]
    assert any(f.endswith("good.npz") for f in files)
    assert not any(f.endswith("bad.npz") for f in files)


def test_dataset_mask_precompute(model, tmp_path, monkeypatch):
    """Dataset build computes and persists motion-aware terrain masks for
    clips missing them (reference: PARC/util/create_dataset.py:148-163):
    touched cells get pinned augmentation bounds instead of the free +-3 m
    defaults, and the MotionLib threads the stored bounds through."""
    import yaml
    from parc_tpu.anim import motion_lib as ml
    from parc_tpu.pipeline import dataset

    root = tmp_path / "motions"
    (root / "walk").mkdir(parents=True)
    clip = walking_clip(seed=0)
    assert clip.terrain.hf_maxmin is None   # precondition: no stored bounds
    md.save_motion_data(str(root / "walk" / "w.npz"), clip)
    out = dataset.create_dataset_yaml(str(root), str(tmp_path / "d.yaml"))
    with open(out) as f:
        entry = yaml.safe_load(f)["motions"][0]
    saved = md.load_motion_data(entry["file"])
    t = saved.terrain
    assert t.hf_mask is not None and t.hf_mask.any()
    assert t.hf_maxmin is not None
    assert saved.hf_mask_inds is not None
    assert len(saved.hf_mask_inds) == saved.frames.shape[0]
    # each touched cell is either pinned near hf or jump-carved (the
    # character cleared it: hmax capped below the flight path, hmin open);
    # free cells get the wide z_buf bounds
    masked = t.hf_maxmin[t.hf_mask]
    mhf = t.hf[t.hf_mask]
    pinned = masked[:, 0] - mhf < 0.1
    carved = masked[:, 1] - mhf < -2.9
    assert np.all(pinned | carved) and pinned.any()
    free = t.hf_maxmin[~t.hf_mask]
    assert np.all(free[:, 0] - t.hf[~t.hf_mask] > 2.9)
    assert np.all(free[:, 1] - t.hf[~t.hf_mask] < -2.9)
    # stored bounds (not the +-3 default) reach the device MotionLib
    lib = ml.build_motion_lib(model, [saved])
    mm = np.asarray(lib.terrain_maxmin[0])
    hf = np.asarray(lib.terrain_hf[0])
    assert (mm[..., 0] - hf < 0.5).any() and not np.allclose(
        mm[..., 0] - hf, 3.0)


def test_dataset_reference_pkl_conversion(model, tmp_path):
    """An ingested reference .pkl keeps its stored hf_maxmin, gains
    computed hf_mask_inds, and is persisted as a native .npz."""
    import shutil
    import yaml
    from parc_tpu.pipeline import dataset

    root = tmp_path / "motions"
    (root / "ref").mkdir(parents=True)
    shutil.copy("/root/reference/data/terrains/civilization.pkl",
                str(root / "ref" / "civ.pkl"))
    orig = md.load_motion_data(str(root / "ref" / "civ.pkl"))
    cfg = dataset.DatasetConfig(max_terrain_cells=64)   # civ terrain is 50x50
    out = dataset.create_dataset_yaml(str(root), str(tmp_path / "d.yaml"),
                                      cfg, model=model)
    with open(out) as f:
        entry = yaml.safe_load(f)["motions"][0]
    assert entry["file"].endswith(".npz")   # foreign pickle converted
    saved = md.load_motion_data(entry["file"])
    np.testing.assert_allclose(saved.terrain.hf_maxmin,
                               orig.terrain.hf_maxmin, atol=1e-5)
    assert saved.hf_mask_inds is not None
    assert len(saved.hf_mask_inds) == saved.frames.shape[0]


def test_cli_parkour_training(dataset_yaml, model, tmp_path):
    """CLI parc_3 parity for the full composition env: env_name=parkour
    trains dm + mgdm fractions with an (untrained tiny) MDM in the loop."""
    from parc_tpu.pipeline import cli
    cli.stage_train_tracker(dict(
        dataset=dataset_yaml, out_dir=str(tmp_path / "trk"),
        env_name="parkour", num_envs=4, mgdm_num=2, plan_frames=8,
        ddim_stride=5, terrain_dim=24, max_iters=2,
        # tiny nets + tiny MDM for CPU
        steps_per_iter=2, update_epochs=1, batch_size=1,
        actor_net="fc_2layers_512units", critic_net="fc_2layers_512units",
        diffusion_timesteps=11, d_model=32, num_heads=2, d_hid=32,
        num_layers=1, iters_per_output=2, iters_per_checkpoint=2,
        test_steps=3))
    from parc_tpu.utils import checkpoint as ckpt_lib
    assert ckpt_lib.latest_step(str(tmp_path / "trk" / "checkpoints")) == 2


def test_cli_setup_iter_view_metrics(dataset_yaml, model, tmp_path):
    """Remaining CLI stages: setup_iter writes chained per-stage configs
    (parc_0 parity); view exports the HTML viewer + PNG strip; metrics
    writes the per-clip quality CSV."""
    import yaml
    from parc_tpu.pipeline import cli

    cli.stage_setup_iter(dict(root=str(tmp_path / "parc"), iter=1,
                              num_motions=7))
    base = tmp_path / "parc" / "iter_1"
    for stage in ("train_mdm", "kin_gen", "train_tracker", "record",
                  "create_dataset"):
        with open(base / f"{stage}.yaml") as f:
            cfg = yaml.safe_load(f)
        assert cfg, stage
    with open(base / "kin_gen.yaml") as f:
        kg = yaml.safe_load(f)
    assert kg["num_motions"] == 7
    assert kg["mdm_dir"] == str(base / "mdm")
    # create_dataset chains into iter_2
    with open(base / "create_dataset.yaml") as f:
        cd = yaml.safe_load(f)
    assert "iter_2" in cd["out"]

    # view + metrics on a real clip from the dataset manifest
    with open(dataset_yaml) as f:
        clip_path = yaml.safe_load(f)["motions"][0]["file"]
    out_html = str(tmp_path / "clip.html")
    cli.stage_view(dict(input=clip_path, out=out_html))
    assert os.path.getsize(out_html) > 1000
    assert os.path.exists(out_html.replace(".html", ".png"))

    motions_dir = os.path.dirname(clip_path)
    csv_path = str(tmp_path / "metrics.csv")
    cli.stage_metrics(dict(motions_dir=motions_dir, out=csv_path))
    with open(csv_path) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) >= 2  # header + >=1 clip


def test_create_dataset_no_pkl_npz_double_listing(tmp_path, model):
    """A .pkl converted to a mask-precomputed .npz sibling by a previous
    create_dataset pass must not be listed twice on rebuild (the PARC loop
    rebuilds manifests every iteration)."""
    import yaml
    from parc_tpu.pipeline import dataset as ds
    from parc_tpu.data.synthetic import walking_clip

    d = tmp_path / "motions" / "walk"
    d.mkdir(parents=True)
    clip = walking_clip(seed=3)
    md.save_motion_data(str(d / "a.npz"), clip)
    # fake an already-converted pair: same stem, both formats
    md.save_motion_data(str(d / "b.npz"), clip)
    import pickle
    with open(d / "b.pkl", "wb") as f:
        pickle.dump({"frames": np.asarray(clip.frames),
                     "fps": 30, "loop_mode": "CLAMP"}, f)
    out = ds.create_dataset_yaml(str(tmp_path / "motions"),
                                 str(tmp_path / "ds.yaml"))
    with open(out) as f:
        files = [e["file"] for e in yaml.safe_load(f)["motions"]]
    stems = [os.path.splitext(os.path.basename(p))[0] for p in files]
    assert sorted(stems) == ["a", "b"], stems


def test_best_checkpoint_step(tmp_path):
    """Record/eval can pick the highest-Test_Reward checkpoint from the
    retained history (robust to late fail-rate-curriculum reward dips)."""
    from parc_tpu.pipeline import train_tracker
    d = tmp_path / "tracker"
    d.mkdir()
    rows = [(1, 0.95), (100, 0.98), (200, 0.72), (300, 0.90),
            (400, 1.02), (500, 0.99), (600, 0.88)]
    with open(d / "log.tsv", "w") as f:
        f.write("Iteration\tTest_Reward\tOther\n")
        for it, r in rows:
            f.write(f"{it}.0\t{r}\t0.0\n")
    # checkpoint at 400 has the best test reward
    assert train_tracker.best_checkpoint_step(
        str(d), steps=[200, 400, 600]) == 400
    # a checkpoint between test logs scores by the latest test <= step
    assert train_tracker.best_checkpoint_step(
        str(d), steps=[250, 650]) == 650  # 250 scores 0.72 (test@200), 650 scores 0.88 (test@600)
    # no log.tsv -> fall back to the last step
    d2 = tmp_path / "empty"
    d2.mkdir()
    assert train_tracker.best_checkpoint_step(
        str(d2), steps=[7, 9]) == 9
    # no checkpoints at all
    assert train_tracker.best_checkpoint_step(str(d2), steps=[]) is None


def test_train_mdm_warm_start_chaining(dataset_yaml, model, tmp_path,
                                       monkeypatch):
    """PARC iteration chaining: ``train_mdm --init_from`` warm-starts from
    the previous iteration's checkpoints (reference parc_0_setup_iter.py
    input_model_path -> parc_1_train_gen.py:40-46), and a checkpoint
    already in out_dir (a resumed run) wins over init_from."""
    import jax.numpy as jnp
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.pipeline import cli, dataset, train_mdm
    from parc_tpu.utils import checkpoint as ckpt_lib

    tiny = dict(diffusion_timesteps=11, d_model=32, num_heads=2,
                d_hid=32, num_layers=1)
    lib = dataset.load_dataset(model, dataset_yaml)
    mdm = MDM(model, MDMConfig(**tiny))
    state_a = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=64)
    # make iteration-1 params recognizable
    state_a = state_a.replace(
        params=jax.tree.map(lambda p: p + 1.25, state_a.params))
    a_dir = tmp_path / "mdm_1"
    ckpt_lib.save(str(a_dir / "checkpoints"), 5, state_a)

    captured = []

    def fake_train(mdm_, lib_, tcfg, state=None, seed=0, max_epochs=None):
        captured.append(state)
        return state

    monkeypatch.setattr(train_mdm, "train", fake_train)
    cfg = dict(tiny, dataset=dataset_yaml, out_dir=str(tmp_path / "mdm_2"),
               init_from=str(a_dir), stats_samples=64)
    cli.stage_train_mdm(cfg)
    assert captured[-1] is not None, "warm start must pass a restored state"
    leaf_a = jax.tree.leaves(state_a.params)[0]
    leaf_b = jax.tree.leaves(captured[-1].params)[0]
    assert jnp.allclose(leaf_a, leaf_b), "params must come from init_from"

    # a local checkpoint in out_dir wins over init_from (resume semantics)
    ckpt_lib.save(str(tmp_path / "mdm_2" / "checkpoints"), 3, state_a)
    cli.stage_train_mdm(cfg)
    assert captured[-1] is None, "local resume must ignore init_from"
