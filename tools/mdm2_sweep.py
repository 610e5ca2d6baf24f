"""Checkpoint sweep of the loop's iteration-2 MDM on style-diverse fixtures.

Usage (after tools/loop_two_iter.sh):
    python tools/mdm2_sweep.py --run_dir /tmp/loop_r3

Extends docs/mdm_scale.md with the dataset-diversity evidence (VERDICT
round-2 item 6): the iteration-2 MDM — warm-started from the
iteration-1 model and continued on the grown heterogeneous dataset
(seed clips + physically-corrected recordings over boxes/stairs/paths/
file terrains; reference iteration chaining parc_0_setup_iter.py:11,
72-76 input_model_path) — swept checkpoint-by-checkpoint
on generation fixtures spanning terrain styles absent from the round-2
9-clip set.  Fixtures are drawn exactly the way kin-gen draws its
terrain+path attempts (procgen -> simplify -> A*), so every fixture path
is A*-feasible; metrics are the reference's compute_losses.py columns
(reference: tools/motion_tests/compute_losses.py, PARC dataset scale in
PARC/train_gen_default.yaml).
"""

import argparse
import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEASER = "/root/reference/data/terrains/TEASER_TERRAIN.pkl"
SECTION_HEADER = "## Training at dataset diversity (loop iteration 2)"


def build_fixtures(styles):
    import numpy as np
    from parc_tpu.pipeline import kin_gen
    from parc_tpu.tools.validation import ValidationFixture

    fixtures = []
    for si, style in enumerate(styles):
        cfg = kin_gen.KinGenConfig(
            terrain_style=style,
            terrain_files=(TEASER,) if style == "file" else ())
        rng = np.random.default_rng(1000 + si)
        drawn = None
        for _ in range(32):
            drawn = kin_gen._draw_terrain_and_path(cfg, rng)
            if drawn is not None:
                break
        if drawn is None:
            # one infeasible style must not kill the whole evidence run
            print(f"WARNING: no A*-feasible path for {style} in 32 draws; "
                  "skipping style", file=sys.stderr)
            continue
        terrain, _, nodes = drawn
        fixtures.append(ValidationFixture(style, terrain, nodes))
    return fixtures


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", default="/tmp/loop_r4")
    p.add_argument("--mdm_subdir", default="mdm_2")
    p.add_argument("--dataset", default=None,
                   help="dataset yaml (default <run_dir>/dataset_2.yaml)")
    p.add_argument("--styles", default="boxes,stairs,paths,file")
    p.add_argument("--out", default="docs/mdm_scale.md")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from parc_tpu.diffusion.mdm import MDM, MDMConfig
    from parc_tpu.pipeline import dataset as dataset_lib
    from parc_tpu.tools import validation

    from tools.mdm_scale import build_lib  # humanoid model + seed lib

    ds = args.dataset or os.path.join(args.run_dir, "dataset_2.yaml")
    model, _ = build_lib()
    lib = dataset_lib.load_dataset(model, ds)
    mdm = MDM(model, MDMConfig())
    state_like = mdm.init(lib, jax.random.PRNGKey(0), stats_samples=512)

    fixtures = build_fixtures(args.styles.split(","))
    ckpt_dir = os.path.join(args.run_dir, args.mdm_subdir, "checkpoints")
    rows = validation.sweep_checkpoints(
        mdm, state_like, ckpt_dir, fixtures,
        output_dir=os.path.join(args.run_dir, "validation_mdm2"))

    by_ckpt = {}
    for r in rows:
        by_ckpt.setdefault(r["checkpoint"], []).append(r)

    # training-loss curve
    loss_rows = []
    log_path = os.path.join(args.run_dir, args.mdm_subdir, "log.tsv")
    if os.path.exists(log_path):
        with open(log_path) as f:
            for row in csv.DictReader(f, delimiter="\t"):
                if row.get("Loss"):
                    loss_rows.append((int(float(row["Epoch"])),
                                      float(row["Loss"])))

    import numpy as np
    lines = [
        "",
        SECTION_HEADER,
        "",
        "The two-iteration loop run (docs/loop_scale.md) continues the",
        "full-size MDM (warm-started from the iteration-1 model, the",
        "reference's parc_0_setup_iter input_model_path chaining) on the",
        f"grown heterogeneous dataset (`{os.path.basename(ds)}`: seed",
        "clips + physically-corrected recordings across boxes/stairs/",
        "paths/file terrains + mirrors).",
        "Checkpoint sweep on kin-gen-style fixtures (procgen -> A* path),",
        "one per terrain style — stairs/paths/file were absent from the",
        "round-2 9-clip set:",
        "",
    ]
    if loss_rows:
        lines += ["Training loss: "
                  + ", ".join(f"epoch {e}: {l:.4f}"
                              for e, l in loss_rows[::max(1,
                                                          len(loss_rows)
                                                          // 8)]), ""]
    lines += [
        "| ckpt | fixture | final-node dist | mean jerk | contact loss "
        "| pen loss |",
        "|---|---|---|---|---|---|",
    ]
    for ck in sorted(by_ckpt):
        per_fx = {}
        for r in by_ckpt[ck]:
            per_fx.setdefault(r["fixture"], []).append(r)
        for fx in sorted(per_fx):
            s = validation.summarize(per_fx[fx])
            lines.append(
                f"| {ck} | {fx} | "
                f"{s.get('final_node_dist_mean', float('nan')):.3f} | "
                f"{s.get('mean_jerk_mean', float('nan')):.0f} | "
                f"{s.get('contact_loss_mean', float('nan')):.3f} | "
                f"{s.get('pen_loss_mean', float('nan')):.3f} |")
    # replace an existing section in place (re-runs must not duplicate
    # the committed doc); append only when the section is absent
    new_section = "\n".join(lines) + "\n"
    existing = ""
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = f.read()
    if SECTION_HEADER in existing:
        head = existing.split(SECTION_HEADER)[0].rstrip("\n")
        existing = head + "\n"
    with open(args.out, "w") as f:
        f.write(existing + new_section)
    print(f"wrote diversity sweep section to {args.out}")


if __name__ == "__main__":
    main()
