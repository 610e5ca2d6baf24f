"""PARC-TPU pipeline CLI.

Stages (mirroring the reference's parc_0..parc_5 scripts + run.py):

    python -m parc_tpu.pipeline.cli create_dataset --motions_dir D --out m.yaml
    python -m parc_tpu.pipeline.cli train_mdm --dataset m.yaml --out_dir O
    python -m parc_tpu.pipeline.cli kin_gen --mdm_dir O --out_dir K -n 50
    python -m parc_tpu.pipeline.cli train_tracker --dataset m.yaml --out_dir T
    python -m parc_tpu.pipeline.cli record --dataset m.yaml --tracker_dir T
    python -m parc_tpu.pipeline.cli setup_iter --root R --iter N

Any flag can also come from a YAML file via --config (flags win).
Reference parity: run.py:95-164, parc_0_setup_iter.py, parc_1..5 scripts.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np
import yaml


def _dataclass_from_dict(cls, d: dict):
    """Build a (possibly nested) config dataclass from a flat YAML dict.

    Nested dicts become nested dataclasses (e.g. kin_gen's ``opt_cfg:``
    block -> MotionOptConfig), and numeric strings are coerced to the
    field's type — PyYAML parses ``1.0e9`` (exponent without a sign) as
    a *string*, a silent trap for hand-written configs."""
    try:
        import typing
        hints = typing.get_type_hints(cls)
    except Exception:
        hints = {f.name: f.type for f in dataclasses.fields(cls)}
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        t = hints.get(f.name)
        if dataclasses.is_dataclass(t) and isinstance(v, dict):
            v = _dataclass_from_dict(t, v)
        elif t in (float, int) and isinstance(v, str):
            v = t(float(v))
        kwargs[f.name] = v
    return cls(**kwargs)


def _load_config(args) -> dict:
    cfg = {}
    if args.config:
        with open(args.config) as f:
            cfg = yaml.safe_load(f) or {}
    for k, v in vars(args).items():
        if v is not None and k not in ("config", "stage"):
            cfg[k] = v
    return cfg


def _build_model():
    from parc_tpu.data.humanoid import humanoid_spec
    return humanoid_spec().build()


def stage_create_dataset(cfg: dict):
    from parc_tpu.pipeline import dataset
    out = dataset.create_dataset_yaml(
        cfg["motions_dir"], cfg.get("out", "output/motions.yaml"),
        _dataclass_from_dict(dataset.DatasetConfig, cfg))
    print(f"wrote {out}")


def stage_train_mdm(cfg: dict):
    import jax
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.pipeline import dataset, train_mdm
    from parc_tpu.utils import checkpoint as ckpt_lib
    model = _build_model()
    lib = dataset.load_dataset(model, cfg["dataset"])
    mdm = MDM(model, _dataclass_from_dict(MDMConfig, cfg))
    tcfg = _dataclass_from_dict(train_mdm.MDMTrainerConfig, cfg)
    if cfg.get("out_dir"):
        tcfg = dataclasses.replace(tcfg, output_dir=cfg["out_dir"])
    # warm start: PARC iterations k>1 continue training the previous
    # iteration's model on the grown dataset rather than re-initializing
    # (reference: parc_0_setup_iter.py:11,72-76 input_model_path ->
    # parc_1_train_gen.py:40-46; feature stats come with the restored
    # state, like the reference's reused input_sampler_stats_path).
    # A checkpoint already in out_dir (a resumed run) wins over init_from.
    state = None
    if (cfg.get("init_from")
            and ckpt_lib.latest_step(
                f"{tcfg.output_dir}/checkpoints") is None):
        # stats_samples: the throwaway state is only a shape template —
        # mean/std are overwritten by the restore below, so skip the
        # exact full-dataset stats pass (minutes on a grown dataset)
        state = mdm.init(lib, jax.random.PRNGKey(cfg.get("seed", 0)),
                         stats_samples=64)
        state = ckpt_lib.restore(f"{cfg['init_from']}/checkpoints", state)
        print(f"warm-started MDM from {cfg['init_from']}")
    train_mdm.train(mdm, lib, tcfg, state=state, seed=cfg.get("seed", 0),
                    max_epochs=cfg.get("max_epochs"))


def stage_kin_gen(cfg: dict):
    import jax
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.pipeline import dataset, kin_gen
    from parc_tpu.utils import checkpoint as ckpt_lib
    model = _build_model()
    lib = dataset.load_dataset(model, cfg["dataset"])
    mdm = MDM(model, _dataclass_from_dict(MDMConfig, cfg))
    state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=512)
    mdm_dir = cfg.get("mdm_dir")
    if mdm_dir:
        state = ckpt_lib.restore(f"{mdm_dir}/checkpoints", state)
    # multi-job sharding (reference: parc_0 writes num_batches_of_motions
    # kin-gen job configs for separate machines): batch_idx selects this
    # job's disjoint seed slice; all jobs share out_dir via name prefixes
    num_motions = cfg.get("num_motions", 10)
    batch_idx = int(cfg.get("batch_idx", 0))
    num_batches = int(cfg.get("num_batches", 1))
    prefix = f"b{batch_idx}_" if num_batches > 1 else ""
    paths = kin_gen.run_kin_gen(
        mdm, state, num_motions,
        cfg.get("out_dir", "output/kin_gen"),
        _dataclass_from_dict(kin_gen.KinGenConfig, cfg),
        seed=cfg.get("seed", 0) + batch_idx * num_motions,
        name_prefix=prefix)
    print(f"generated {len(paths)} clips")


def stage_train_tracker(cfg: dict):
    """Tracker training (parc_3). ``env_name: deepmimic`` (default) trains
    on the dataset clips; ``env_name: parkour`` trains the reference's
    full composition env — a dm fraction tracking dataset clips plus an
    mgdm fraction tracking MDM-generated references replanned in-graph
    (reference: envs/ig_parkour/ig_parkour_env.py:65-67)."""
    from parc_tpu.envs import builder
    from parc_tpu.learning.ppo import PPOAgent, PPOConfig
    from parc_tpu.pipeline import dataset, train_tracker
    model = _build_model()
    lib = dataset.load_dataset(model, cfg["dataset"])

    mdm = None
    if cfg.get("env_name") in ("parkour", "mgdm"):
        import jax
        from parc_tpu.diffusion.mdm import MDM, MDMConfig
        from parc_tpu.utils import checkpoint as ckpt_lib
        mdm = MDM(model, _dataclass_from_dict(MDMConfig, cfg))
        mdm_state = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=256)
        if cfg.get("mdm_dir"):
            mdm_state = ckpt_lib.restore(
                f"{cfg['mdm_dir']}/checkpoints", mdm_state)

    env = builder.build_env(model, cfg, mdm=mdm)
    agent = PPOAgent(env, _dataclass_from_dict(PPOConfig, cfg))
    if cfg.get("env_name") in ("parkour", "mgdm"):
        lib = env.make_lib(lib, mdm_state)
    tcfg = _dataclass_from_dict(train_tracker.TrainerConfig, cfg)
    if cfg.get("out_dir"):
        tcfg = dataclasses.replace(tcfg, output_dir=cfg["out_dir"])
    train_tracker.train(agent, lib, tcfg, seed=cfg.get("seed", 0),
                        max_iters=cfg.get("max_iters"),
                        meta=dataset.dataset_meta(cfg["dataset"]))


def _select_checkpoint_step(cfg: dict):
    """Resolve the ``checkpoint`` option for tracker-consuming stages:
    'last' (default) / 'best' (highest logged Test_Reward in the retained
    history — robust to late fail-rate-curriculum reward dips) / an int
    step."""
    which = cfg.get("checkpoint", "last")
    if which in (None, "last"):
        return None
    if which == "best":
        from parc_tpu.pipeline import train_tracker
        step = train_tracker.best_checkpoint_step(cfg["tracker_dir"])
        print(f"checkpoint=best -> step {step}")
        return step
    return int(which)


def stage_record(cfg: dict):
    import jax
    from parc_tpu.envs.base import EnvConfig
    from parc_tpu.envs.deepmimic import DeepMimicEnv
    from parc_tpu.learning.ppo import PPOAgent, PPOConfig
    from parc_tpu.physics import engine
    from parc_tpu.pipeline import dataset, record
    from parc_tpu.utils import checkpoint as ckpt_lib
    model = _build_model()
    lib = dataset.load_dataset(model, cfg["dataset"])
    env_cfg = _dataclass_from_dict(EnvConfig, cfg)
    env_cfg = dataclasses.replace(env_cfg, num_envs=lib.num_motions,
                                  rand_reset=False)
    env = DeepMimicEnv(model, engine.SimParams(), env_cfg)
    agent = PPOAgent(env, _dataclass_from_dict(PPOConfig, cfg))
    state = agent.init(lib, jax.random.PRNGKey(0))
    from parc_tpu.learning import ppo as ppo_lib
    step = _select_checkpoint_step(cfg)
    restored = ckpt_lib.restore(f"{cfg['tracker_dir']}/checkpoints",
                                ppo_lib.persistent_state(state), step=step)
    state = ppo_lib.merge_persistent(state, restored)
    rcfg = _dataclass_from_dict(record.RecordConfig, cfg)
    results = record.record_motions(agent, lib, state, rcfg)
    paths = record.save_recorded(results,
                                 cfg.get("out_dir", "output/recorded"))
    print(f"recorded {len(paths)}/{lib.num_motions} motions")


def stage_eval(cfg: dict):
    """Deterministic-policy evaluation of a trained tracker + optional
    network-health diagnostics (reference: run.py modes test/test2,
    learning/dm_ppo_agent.py:162-219 test metrics and :607-773 test_model2
    dormant-unit / stable-rank report)."""
    import jax
    from parc_tpu.envs.base import EnvConfig
    from parc_tpu.envs.deepmimic import DeepMimicEnv
    from parc_tpu.learning import ppo as ppo_lib
    from parc_tpu.learning.ppo import PPOAgent, PPOConfig
    from parc_tpu.physics import engine
    from parc_tpu.pipeline import dataset, train_tracker
    from parc_tpu.utils import checkpoint as ckpt_lib
    model = _build_model()
    lib = dataset.load_dataset(model, cfg["dataset"])
    env = DeepMimicEnv(model, engine.SimParams(),
                       _dataclass_from_dict(EnvConfig, cfg))
    agent = PPOAgent(env, _dataclass_from_dict(PPOConfig, cfg))
    state = agent.init(lib, jax.random.PRNGKey(cfg.get("seed", 0)))
    restored = ckpt_lib.restore(f"{cfg['tracker_dir']}/checkpoints",
                                ppo_lib.persistent_state(state),
                                step=_select_checkpoint_step(cfg))
    state = ppo_lib.merge_persistent(state, restored)
    test_fn = train_tracker.make_test_fn(
        agent, cfg.get("test_steps", 300),
        test_episodes=cfg.get("test_episodes", 16))
    lib = jax.device_put(lib)
    test = test_fn(lib, state, jax.random.PRNGKey(cfg.get("seed", 0)))
    print(f"test_reward      {float(test['mean_reward']):.4f}")
    print(f"test_return      {float(test['mean_return']):.4f}")
    print(f"episodes         {int(test['num_eps'])}"
          f" (over {int(test['test_steps'])} steps)")
    print(f"mean_ep_len      {float(test['mean_ep_len']):.3f} s")
    print(f"fail_frac        {float(test['fail_frac']):.4f}")
    comp = np.asarray(test["component_returns"])
    for name, v in zip(train_tracker.REWARD_COMPONENT_NAMES, comp):
        print(f"return_{name:<13s} {float(v):.4f}")
    terr = np.asarray(test["tracking_error"])
    for name, v in zip(train_tracker.TRACKING_ERROR_NAMES, terr):
        print(f"{name:<16s} {float(v):.5f}")
    from parc_tpu.pipeline import train_tracker as tt
    from parc_tpu.utils.logger import Logger
    tt.log_fail_rate_tables(Logger(), np.asarray(state.env_state.fail_rates),
                            dataset.dataset_meta(cfg["dataset"]), top_k=10)
    if cfg.get("diagnostics"):
        from parc_tpu.learning import diagnostics
        report = diagnostics.full_report(agent, state, state.env_state.obs)
        print("\nnetwork diagnostics (test2 parity):")
        for layer, stats in report.items():
            line = "  ".join(f"{k}={v:.4g}" if isinstance(v, float)
                             else f"{k}={v}" for k, v in stats.items())
            print(f"  {layer}: {line}")


def stage_setup_iter(cfg: dict):
    """Write the per-iteration stage configs chaining output dirs
    (reference: parc_0_setup_iter.py)."""
    root = cfg.get("root", "output/parc")
    it = int(cfg.get("iter", 0))
    base = os.path.join(root, f"iter_{it}")
    os.makedirs(base, exist_ok=True)
    stages = {
        "train_mdm": {"dataset": os.path.join(base, "motions.yaml"),
                      "out_dir": os.path.join(base, "mdm")},
        "kin_gen": {"dataset": os.path.join(base, "motions.yaml"),
                    "mdm_dir": os.path.join(base, "mdm"),
                    "out_dir": os.path.join(base, "kin_gen"),
                    "num_motions": cfg.get("num_motions", 50),
                    "num_batches": cfg.get("num_batches", 1)},
        "train_tracker": {"dataset": os.path.join(base, "motions+gen.yaml"),
                          "out_dir": os.path.join(base, "tracker")},
        "record": {"dataset": os.path.join(base, "motions+gen.yaml"),
                   "tracker_dir": os.path.join(base, "tracker"),
                   "out_dir": os.path.join(base, "recorded")},
        "create_dataset": {"motions_dir": os.path.join(base, "recorded"),
                           "out": os.path.join(root, f"iter_{it + 1}",
                                               "motions.yaml")},
    }
    for name, scfg in stages.items():
        path = os.path.join(base, f"{name}.yaml")
        with open(path, "w") as f:
            yaml.safe_dump(scfg, f)
        print(f"wrote {path}")


def stage_metrics(cfg: dict):
    """Per-clip quality metrics + dataset statistics for a motion dir
    (reference: tools/motion_tests/compute_losses.py, compute_stats.py)."""
    from parc_tpu.anim import motion_data as md
    from parc_tpu.tools import metrics
    model = _build_model()
    motions_dir = cfg["motions_dir"]
    csv_path = cfg.get("out", os.path.join(motions_dir, "metrics.csv"))
    rows = metrics.evaluate_motion_dir(model, motions_dir, csv_path=csv_path)
    print(f"wrote {csv_path} ({len(rows)} clips)")
    motions = [md.load_motion_data(os.path.join(motions_dir, r["file"]))
               for r in rows]
    if motions:
        for k, v in metrics.dataset_statistics(model, motions).items():
            print(f"{k}: {v:.4f}")


def stage_augment(cfg: dict):
    """Batch terrain-aware augmentation of an existing motion set
    (reference: tools/motion_opt/augment_motions.py)."""
    import glob
    from parc_tpu.anim import motion_data as md
    from parc_tpu.pipeline import augment
    model = _build_model()
    files = sorted(glob.glob(os.path.join(cfg["motions_dir"], "*.npz"))
                   + glob.glob(os.path.join(cfg["motions_dir"], "*.pkl")))
    motions = [md.load_motion_data(f) for f in files]
    acfg = _dataclass_from_dict(augment.AugmentConfig, cfg)
    if cfg.get("num_motions"):
        acfg = dataclasses.replace(acfg,
                                   num_new_motions=cfg["num_motions"])
    paths = augment.run_augment(model, motions,
                                cfg.get("out_dir", "output/augmented"),
                                acfg, names=files, seed=cfg.get("seed", 0))
    print(f"wrote {len(paths)} augmented clips")


def stage_optimize(cfg: dict):
    """Batch terrain-aware contact optimization of existing clips
    (reference: tools/motion_opt/optimize_motions.py)."""
    import glob
    import jax.numpy as jnp
    from parc_tpu.anim import motion_data as md
    from parc_tpu.opt import motion_opt
    model = _build_model()
    files = sorted(glob.glob(os.path.join(cfg["motions_dir"], "*.npz"))
                   + glob.glob(os.path.join(cfg["motions_dir"], "*.pkl")))
    out_dir = cfg.get("out_dir", "output/optimized")
    os.makedirs(out_dir, exist_ok=True)
    ocfg = _dataclass_from_dict(motion_opt.MotionOptConfig, cfg)
    n = 0
    for f in files:
        m = md.load_motion_data(f)
        if m.terrain is None:
            print(f"skipping {f} (no terrain)")
            continue
        contacts = (m.contacts if m.contacts is not None
                    else np.zeros((m.frames.shape[0], model.num_bodies),
                                  np.float32))
        frames, losses = motion_opt.motion_contact_optimization(
            model, m.terrain.to_device(), jnp.asarray(m.frames),
            jnp.asarray(contacts), ocfg)
        base = os.path.splitext(os.path.basename(f))[0]
        out = os.path.join(out_dir, base + "_opt.npz")
        md.save_motion_data(out, dataclasses.replace(
            m, frames=np.asarray(frames, np.float32)))
        print(f"{base}: pen={losses['penetration']:.4f} "
              f"contact={losses['contact']:.4f} -> {out}")
        n += 1
    print(f"optimized {n} clips")


def stage_view(cfg: dict):
    """Export a standalone HTML viewer (and PNG strip) for a clip
    (reference: the MOTION_FORGE viewer app)."""
    from parc_tpu.anim import motion_data as md
    from parc_tpu.viewer import html_viewer, render
    model = _build_model()
    motion = md.load_motion_data(cfg["input"])
    out = cfg.get("out") or cfg["input"].rsplit(".", 1)[0] + ".html"
    if cfg.get("compare"):
        other = md.load_motion_data(cfg["compare"])
        html_viewer.export_compare(
            model, [motion, other], out,
            labels=[os.path.basename(cfg["input"]),
                    os.path.basename(cfg["compare"])],
            title=os.path.basename(cfg["input"]))
    else:
        html_viewer.export(model, motion, out,
                           title=os.path.basename(cfg["input"]))
    render.render_motion_strip(model, motion,
                               out.rsplit(".", 1)[0] + ".png")
    print(f"wrote {out} (+ .png strip)")


def stage_studio(cfg: dict):
    """Interactive browser studio: terrain editing, A* planning, MDM
    generation, motion editing/optimization, physics tracking in the loop
    (reference: the MOTION_FORGE Polyscope app)."""
    from parc_tpu.anim import motion_data as md
    from parc_tpu.viewer import studio
    model = _build_model()
    motion = (md.load_motion_data(cfg["input"])
              if cfg.get("input") else None)
    s = studio.Studio(model, motion,
                      mdm_dir=cfg.get("mdm_dir"),
                      tracker_dir=cfg.get("tracker_dir"),
                      seed=cfg.get("seed", 0),
                      mdm_config=cfg,  # MDMConfig keys filtered inside
                      workspace=cfg.get("workspace"))
    studio.run_studio(s, port=int(cfg.get("port", 8000)),
                      host=cfg.get("host", "127.0.0.1"),
                      allow_remote=bool(cfg.get("allow_remote", False)))


STAGES = {
    "create_dataset": stage_create_dataset,
    "train_mdm": stage_train_mdm,
    "kin_gen": stage_kin_gen,
    "train_tracker": stage_train_tracker,
    "record": stage_record,
    "setup_iter": stage_setup_iter,
    "eval": stage_eval,
    "metrics": stage_metrics,
    "augment": stage_augment,
    "optimize": stage_optimize,
    "view": stage_view,
    "studio": stage_studio,
}


def main(argv=None):
    p = argparse.ArgumentParser(prog="parc_tpu.pipeline")
    p.add_argument("stage", choices=sorted(STAGES))
    p.add_argument("--config", default=None)
    p.add_argument("--input", default=None)
    p.add_argument("--compare", default=None)
    p.add_argument("--dataset", default=None)
    p.add_argument("--motions_dir", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--out_dir", default=None)
    p.add_argument("--mdm_dir", default=None)
    p.add_argument("--init_from", default=None,
                   help="train_mdm: warm-start from this run's checkpoints"
                        " (reference input_model_path iteration chaining)")
    p.add_argument("--tracker_dir", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="tracker checkpoint for record/eval: 'last' "
                        "(default), 'best' (highest logged Test_Reward), "
                        "or an int step")
    p.add_argument("--root", default=None)
    p.add_argument("--iter", type=int, default=None)
    p.add_argument("--num_motions", "-n", type=int, default=None)
    p.add_argument("--batch_idx", type=int, default=None)
    p.add_argument("--num_batches", type=int, default=None)
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--max_iters", type=int, default=None)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--test_steps", type=int, default=None)
    p.add_argument("--test_episodes", type=int, default=None)
    p.add_argument("--diagnostics", action="store_true", default=None)
    p.add_argument("--port", type=int, default=None)
    p.add_argument("--host", default=None)
    p.add_argument("--allow_remote", action="store_true", default=None)
    p.add_argument("--workspace", default=None)
    p.add_argument("--env_name", default=None,
                   choices=["deepmimic", "parkour", "mgdm"])
    args = p.parse_args(argv)
    STAGES[args.stage](_load_config(args))


if __name__ == "__main__":
    main()
