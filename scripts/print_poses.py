"""Print learned vehicle poses from an online checkpoint.

Counterpart of the reference print_poses.py. Usage:
    python scripts/print_poses.py <ckpt_dir> [--gt-datadir DATADIR ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--step", type=int, default=None)
    args = ap.parse_args()

    from startrax.train.checkpoint import restore_checkpoint

    state = restore_checkpoint(args.ckpt_dir, step=args.step)
    params = state["params"] if "params" in state else state
    poses = np.asarray(params["poses"])  # [F-1, K, 7]
    print(f"poses: {poses.shape[0]} frames x {poses.shape[1]} vehicles")
    for f in range(poses.shape[0]):
        for k in range(poses.shape[1]):
            t = poses[f, k, :3]
            q = poses[f, k, 3:]
            print(
                f"frame {f + 1} vehicle {k}: t=({t[0]:+.4f}, {t[1]:+.4f}, {t[2]:+.4f}) "
                f"q=({q[0]:+.4f}, {q[1]:+.4f}, {q[2]:+.4f}, {q[3]:+.4f})"
            )
    if "curriculum" in state:
        print("curriculum:", {k: v for k, v in state["curriculum"].items()})


if __name__ == "__main__":
    main()
