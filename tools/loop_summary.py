"""Summarize PARC loop runs into markdown (docs/loop_scale.md).

Usage:
    python tools/loop_summary.py /tmp/loop_r3            # two-iteration run
    python tools/loop_summary.py --single /tmp/loop2     # legacy single-iter

Reads the stage artifacts of tools/loop_two_iter.sh (kin_gen_{k} clips,
tracker_{k}/log.tsv, recorded_{k} clips, dataset_{k}.yaml manifests) and
prints the per-iteration table + the iter1 -> iter2 self-improvement
comparison (reference: README.md:34-60 loop, parc_0_setup_iter.py).
"""

import argparse
import csv
import glob
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# never claim the axon TPU grant from a summarizer: the loop's device
# stages hold the single grant and this runs between/alongside them
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass


def read_tracker(out_dir, it):
    log_path = os.path.join(out_dir, f"tracker_{it}", "log.tsv")
    if not os.path.exists(log_path):
        return None
    with open(log_path) as f:
        rows = list(csv.DictReader(f, delimiter="\t"))
    if not rows:
        return None
    it_col = [float(r["Iteration"]) for r in rows]
    tr = [float(r["Test_Reward"]) for r in rows]
    ff = [float(r["Test_Fail_Frac"]) for r in rows]
    sps = [float(r.get("Samples_Per_Sec", "nan")) for r in rows]
    best = int(np.argmax(tr))
    return dict(iters=int(it_col[-1]), first=tr[0], last=tr[-1],
                best=tr[best], best_iter=int(it_col[best]),
                ff_first=ff[0], ff_last=ff[-1], ff_min=min(ff),
                ff_at_best=ff[best], sps=float(np.nanmean(sps)), rows=rows)


def clip_stats(paths):
    """Per-clip loss stats recorded by kin_gen (npz 'losses' or None)."""
    from parc_tpu.anim import motion_data as md
    totals, contacts, pens, dur = [], [], [], 0.0
    for p in paths:
        m = md.load_motion_data(p)
        dur += m.frames.shape[0] / m.fps
        if m.losses:
            totals.append(m.losses.get("total", np.nan))
            contacts.append(m.losses.get("contact", np.nan))
            pens.append(m.losses.get("pen", np.nan))
    out = dict(n=len(paths), duration=dur)
    if totals:
        out.update(loss_mean=float(np.nanmean(totals)),
                   loss_med=float(np.nanmedian(totals)))
    if contacts and np.isfinite(contacts).any():
        out.update(contact_mean=float(np.nanmean(contacts)),
                   pen_mean=float(np.nanmean(pens)))
    return out


def manifest_stats(path):
    if not os.path.exists(path):
        return None
    with open(path) as f:
        motions = yaml.safe_load(f)["motions"]
    classes = {}
    for m in motions:
        classes[m["class"]] = classes.get(m["class"], 0) + 1
    return dict(n=len(motions), classes=classes)


def read_mdm(out_dir, name):
    log_path = os.path.join(out_dir, name, "log.tsv")
    if not os.path.exists(log_path):
        return None
    with open(log_path) as f:
        rows = [r for r in csv.DictReader(f, delimiter="\t")
                if r.get("Loss")]
    if not rows:
        return None
    return dict(epochs=int(float(rows[-1]["Epoch"])),
                first=float(rows[0]["Loss"]),
                last=float(rows[-1]["Loss"]),
                rows=[(int(float(r["Epoch"])), float(r["Loss"]))
                      for r in rows])


def summarize_two_iter(out):
    print("# PARC self-improvement loop at scale (two iterations)\n")
    print("Run dir: `%s` (tools/loop_two_iter.sh); tracker @4096 envs on" % out)
    print("one TPU v5e chip; MDM iteration 2 warm-started from iteration 1")
    print("and continued on the grown dataset (reference iteration")
    print("chaining, parc_0_setup_iter.py input_model_path). Stage logs,")
    print("learning-curve TSVs and dataset manifests are committed under")
    print("docs/loop_r4/ (stage-by-stage, tools/stage_evidence.sh).\n")

    per_iter = {}
    for k in (1, 2):
        kin = sorted(glob.glob(os.path.join(out, f"kin_gen_{k}", "*.npz")))
        rec = sorted(glob.glob(os.path.join(out, f"recorded_{k}", "*.npz")))
        styles = {}
        for p in kin:
            s = os.path.basename(p).split("_")[0]
            styles[s] = styles.get(s, 0) + 1
        per_iter[k] = dict(
            kin=clip_stats(kin), styles=styles,
            rec=len(rec),
            tracker=read_tracker(out, k),
            track_manifest=manifest_stats(
                os.path.join(out, f"track_{k}.yaml")),
            next_manifest=manifest_stats(
                os.path.join(out, f"dataset_{k + 1}.yaml")))

    print("| metric | iteration 1 | iteration 2 |")
    print("|---|---|---|")

    def row(name, fn, fmt="{}"):
        vals = []
        for k in (1, 2):
            try:
                v = fn(per_iter[k])
                vals.append("—" if v is None else fmt.format(v))
            except (KeyError, TypeError):
                vals.append("—")
        print(f"| {name} | {vals[0]} | {vals[1]} |")

    row("kin-gen clips kept (incl. mirrors)", lambda d: d["kin"]["n"])
    row("kin-gen styles", lambda d: ", ".join(
        f"{k}: {v}" for k, v in sorted(d["styles"].items())))
    row("kin-gen kept duration (s)", lambda d: d["kin"]["duration"],
        "{:.1f}")
    row("kin-gen mean opt loss", lambda d: d["kin"].get("loss_mean"),
        "{:.3f}")
    row("tracker dataset size", lambda d: d["track_manifest"]["n"])
    row("tracker iters", lambda d: d["tracker"]["iters"])
    row("tracker test reward (final)", lambda d: d["tracker"]["last"],
        "{:.3f}")
    row("tracker test reward (best)", lambda d: d["tracker"]["best"],
        "{:.3f}")
    row("tracker fail frac (at best)", lambda d: d["tracker"]["ff_at_best"],
        "{:.3f}")
    row("tracker fail frac (min)", lambda d: d["tracker"]["ff_min"],
        "{:.3f}")
    row("train throughput (samples/s)", lambda d: d["tracker"]["sps"],
        "{:,.0f}")
    row("record: clips saved", lambda d: d["rec"])
    row("next dataset size", lambda d: d["next_manifest"]["n"])

    # kin-gen reference-scale timing (tools/kin_gen_refscale.py via
    # tools/post_loop_evidence.sh) — folded in so regeneration of this
    # summary never drops it
    ref_md = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "loop_r4",
        "kin_gen_refscale.md")
    if os.path.exists(ref_md):
        with open(ref_md) as f:
            print("\n" + f.read().rstrip())

    for k in (1, 2):
        t = per_iter[k]["tracker"]
        if not t:
            continue
        print(f"\n## Tracker iteration {k} learning curve\n")
        print("| iter | Test_Reward | Test_Fail_Frac |")
        print("|---|---|---|")
        rows = t["rows"]
        for r in rows[:: max(1, len(rows) // 8)]:
            print(f"| {int(float(r['Iteration']))} | "
                  f"{float(r['Test_Reward']):.3f} | "
                  f"{float(r['Test_Fail_Frac']):.3f} |")

    mdms = [(k, read_mdm(out, k)) for k in ("mdm_1", "mdm_2")]
    if any(m for _, m in mdms):
        print("\n## MDM training (iteration 2 warm-starts from iteration 1)\n")
        print("| model | epochs | first loss | last loss |")
        print("|---|---|---|---|")
        for name, m in mdms:
            if m:
                print(f"| {name} | {m['epochs']} | {m['first']:.4f} | "
                      f"{m['last']:.4f} |")


def summarize_single(out_dir: str):
    rows = []
    kin = sorted(glob.glob(os.path.join(out_dir, "kin_gen", "*.npz")))
    print(f"## Full-loop run: `{out_dir}`\n")
    print(f"- kin_gen: **{len(kin)}** clips "
          f"({len([k for k in kin if '_mirror' in k])} mirrored)")
    log_path = os.path.join(out_dir, "tracker", "log.tsv")
    if os.path.exists(log_path):
        with open(log_path) as f:
            rows = list(csv.DictReader(f, delimiter="\t"))
    if rows:
        it = [float(r["Iteration"]) for r in rows]
        tr = [float(r["Test_Reward"]) for r in rows]
        ff = [float(r["Test_Fail_Frac"]) for r in rows]
        sps = [float(r.get("Samples_Per_Sec", "nan")) for r in rows]
        best = int(np.argmax(tr))
        print(f"- tracker: {int(it[-1])} iters logged; Test_Reward "
              f"{tr[0]:.3f} -> {tr[-1]:.3f} (peak {tr[best]:.3f} @ iter "
              f"{int(it[best])}); Test_Fail_Frac {ff[0]:.2f} -> "
              f"{ff[-1]:.2f} (min {min(ff):.2f}); train throughput "
              f"{np.nanmean(sps):,.0f} samples/s")
    rec = sorted(glob.glob(os.path.join(out_dir, "recorded", "*.npz")))
    print(f"\n- record: **{len(rec)}** physically-corrected clips saved")
    man = os.path.join(out_dir, "iter2.yaml")
    ms = manifest_stats(man)
    if ms:
        cls = ", ".join(f"{k}: {v}" for k, v in sorted(ms["classes"].items()))
        print(f"- next-iteration manifest: {ms['n']} motions ({cls})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("out_dir", nargs="?", default="/tmp/loop_r3")
    p.add_argument("--single", action="store_true")
    args = p.parse_args()
    if args.single:
        summarize_single(args.out_dir)
    else:
        summarize_two_iter(args.out_dir)
