"""Summarize a tools/loop_scale.sh output directory into markdown.

Usage: python tools/loop_summary.py /tmp/loop4

Reads the stage artifacts (kin_gen clips, tracker log.tsv, recorded
clips, next-iteration manifest) and prints the markdown summary used in
docs/loop_scale.md.
"""

import csv
import glob
import os
import sys

import numpy as np
import yaml


def main(out_dir: str):
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
        print("\n| iter | Test_Reward | Test_Fail_Frac |")
        print("|---|---|---|")
        for r in rows[:: max(1, len(rows) // 8)]:
            print(f"| {int(float(r['Iteration']))} | "
                  f"{float(r['Test_Reward']):.3f} | "
                  f"{float(r['Test_Fail_Frac']):.3f} |")

    rec = sorted(glob.glob(os.path.join(out_dir, "recorded", "*.npz")))
    print(f"\n- record: **{len(rec)}** physically-corrected clips saved")

    man = os.path.join(out_dir, "iter2.yaml")
    if os.path.exists(man):
        with open(man) as f:
            motions = yaml.safe_load(f)["motions"]
        classes = {}
        for m in motions:
            classes[m["class"]] = classes.get(m["class"], 0) + 1
        cls = ", ".join(f"{k}: {v}" for k, v in sorted(classes.items()))
        print(f"- next-iteration manifest: {len(motions)} motions ({cls})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/loop4")
