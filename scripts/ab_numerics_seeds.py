"""Multi-seed A/B of the compositing convention (VERDICT r2 #6).

Round 2 made the repo's own compositing numerics the default over the
reference's (rendering__.py:416-418 conventions, exposed as
--reference_numerics) on ONE seed. This driver runs the synthetic e2e at an
equal per-run budget for N seeds x {default, reference_numerics}, in
separate processes (fresh TPU state per run), and writes one decision table:
curriculum completion, frames admitted, final PSNR, pose errors.

Usage: python scripts/ab_numerics_seeds.py --minutes 20 --seeds 1453 7 23
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
E2E = os.path.join(ROOT, "scripts", "synthetic_e2e.py")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=20.0)
    ap.add_argument("--seeds", type=int, nargs="+", default=[1453, 7, 23])
    ap.add_argument("--out", default="/tmp/startrax_ab")
    ap.add_argument("--appinit_ckpt", default="",
                    help="shared appearance checkpoint (skips stage 1 in "
                         "every run; the A/B flag only affects training)")
    ap.add_argument("--thres_scale_refnum", type=float, default=1.0,
                    help="scale online_thres (and its tightened variant) for "
                         "the reference_numerics arm: the refnum convention's "
                         "converged photometric loss runs ~5-10%% above the "
                         "default convention's on the same scene (measured, "
                         "artifacts/ab_threshold_calibration_r4.json), so an "
                         "absolute admission gate calibrated under one "
                         "convention under-admits the other — compare at "
                         "equal thresholds in each convention's OWN units")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rows = []
    for seed in args.seeds:
        for ref in (False, True):
            tag = f"seed{seed}_{'ref' if ref else 'def'}"
            run_out = os.path.join(args.out, tag)
            cmd = [sys.executable, E2E, "--minutes", str(args.minutes),
                   "--out", run_out, "--set", f"seed={seed}",
                   "--set", f"reference_numerics={ref}"]
            if ref and args.thres_scale_refnum != 1.0:
                from startrax.utils.config import load_config
                base = load_config(["--config", os.path.join(
                    ROOT, "startrax", "configs", "synthetic_star_online.txt")])
                cmd += ["--set", ("online_thres="
                                  f"{base.online_thres * args.thres_scale_refnum}")]
                if base.online_thres_tightened > 0:
                    cmd += ["--set", ("online_thres_tightened="
                                      f"{base.online_thres_tightened * args.thres_scale_refnum}")]
            if args.appinit_ckpt:
                cmd += ["--appinit_ckpt", args.appinit_ckpt]
            for kv in args.set:
                cmd += ["--set", kv]
            print(f"=== {tag} ===", flush=True)
            r = subprocess.run(cmd, cwd=ROOT)
            row = {"seed": seed, "reference_numerics": ref,
                   "returncode": r.returncode}
            summary_path = os.path.join(run_out, "summary.json")
            if os.path.exists(summary_path):
                with open(summary_path) as f:
                    s = json.load(f)
                row.update({k: s.get(k) for k in (
                    "curriculum_done", "frames_admitted", "online_epochs",
                    "final_frame_psnr", "init_trans_error",
                    "final_trans_error", "init_rot_error",
                    "final_rot_error")})
            rows.append(row)
            with open(os.path.join(args.out, "ab_table.json"), "w") as f:
                json.dump(rows, f, indent=2)
            print(json.dumps(row), flush=True)

    # verdict: a convention "wins" a seed if it admits more frames, or at
    # equal admission has lower max translation error
    def score(row):
        if row.get("frames_admitted") is None:
            return (-1, 0.0)
        return (row["frames_admitted"],
                -max(row["final_trans_error"] or [9.9]))

    wins = {"default": 0, "reference": 0}
    for seed in args.seeds:
        d = next(r for r in rows if r["seed"] == seed and not r["reference_numerics"])
        rf = next(r for r in rows if r["seed"] == seed and r["reference_numerics"])
        wins["default" if score(d) >= score(rf) else "reference"] += 1
    table = {"rows": rows, "wins": wins,
             "winner": max(wins, key=wins.get)}
    with open(os.path.join(args.out, "ab_table.json"), "w") as f:
        json.dump(table, f, indent=2)
    print("AB_RESULT " + json.dumps({"wins": wins, "winner": table["winner"]}),
          flush=True)


if __name__ == "__main__":
    main()
