"""Occgrid (nerfacc-replacement) speed bench: time-to-loss vs plain app-init.

The reference carries nerfacc purely for speed (train_app_init_nerfacc.py:
99-105 resizes ray batches to keep 2^16 samples in flight); this measures
whether our empty-space-skipping path actually buys wall-clock on the TPU
(VERDICT r4 item 6). Both apps train the static field on frame 0 of the
same synthetic scene for --minutes each (fresh process per run, like
scripts/ab_numerics_seeds.py); the table reports wall-clock to reach each
fine-loss threshold (from metrics.jsonl timestamps) plus the final loss and
the occgrid run's sample-truncation accounting.

Note the loss metrics differ in meaning: app_init's fine_loss is the
importance-sampled fine network's MSE (64+64 samples/ray), occgrid's is its
single-field render MSE over the marched+selected samples. Both are train
MSE on the same ray distribution, so time-to-MSE is the comparable axis.

Usage: python scripts/occgrid_bench.py --minutes 12 [--out /tmp/occgrid_bench]
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

THRESHOLDS = [2e-2, 1e-2, 5e-3, 3e-3, 2e-3, 1.5e-3, 1e-3]


def parse_metrics(run_dir):
    rows = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if "train/fine_loss" in r:
                rows.append((r["time"], r["train/fine_loss"], r))
    return rows


def time_to(rows, t0, thr):
    for t, loss, _ in rows:
        if loss <= thr:
            return round(t - t0, 1)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=12.0)
    ap.add_argument("--out", default="/tmp/occgrid_bench")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    base = os.path.join(ROOT, "startrax", "configs", "synthetic_star_online.txt")

    table = {}
    for app_name, module, subdir in (
        ("app_init", "startrax.apps.app_init", "app_init"),
        ("occgrid_init", "startrax.apps.occgrid_init", "occgrid_init"),
    ):
        cmd = [sys.executable, "-m", module, "--config", base,
               "--basedir", args.out, "--expname", f"bench_{app_name}",
               "--train_minutes", str(args.minutes),
               "--epochs_appearance", "100000",
               "--appearance_init_thres", "1e-9"]
        for kv in args.set:
            k, _, v = kv.partition("=")
            cmd += [f"--{k}", v]
        print(f"=== {app_name} ({args.minutes} min) ===", flush=True)
        t0 = time.time()
        rc = subprocess.run(cmd, cwd=ROOT).returncode
        run_dir = os.path.join(args.out, f"bench_{app_name}", subdir)
        rows = parse_metrics(run_dir) if os.path.exists(
            os.path.join(run_dir, "metrics.jsonl")) else []
        entry = {
            "returncode": rc,
            "epochs": len(rows),
            "final_fine_loss": rows[-1][1] if rows else None,
            "time_to": {f"{thr:g}": time_to(rows, t0, thr) for thr in THRESHOLDS},
        }
        if app_name == "occgrid_init" and rows:
            last = rows[-1][2]
            entry["mean_samples"] = last.get("train/mean_samples")
            entry["dropped_frac"] = last.get("train/dropped_frac")
        table[app_name] = entry
        print(json.dumps(entry, indent=1), flush=True)

    with open(os.path.join(args.out, "occgrid_bench.json"), "w") as f:
        json.dump(table, f, indent=2)
    print("BENCH DONE", flush=True)


if __name__ == "__main__":
    main()
