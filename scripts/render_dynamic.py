"""Render the dynamic branch with hand-specified object poses to PNGs.

Counterpart of the reference's manual test_dynamic_nerf.py (stale in-tree):
load an online checkpoint, sweep a synthetic pose path, render the dynamic
component and full composition per pose.

Usage:
  python scripts/render_dynamic.py <online_ckpt_dir> --out /tmp/dyn \
      [--translate 0.0 1.0 0.25] [--rotate-deg 0 360 30]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--out", default="/tmp/render_dynamic")
    ap.add_argument("--height", type=int, default=80)
    ap.add_argument("--translate", nargs=3, type=float, default=[0.0, 1.0, 0.25],
                    help="start stop step for an x-translation sweep")
    ap.add_argument("--vehicles", type=int, default=1)
    ap.add_argument("--num-frames", type=int, default=8)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import jax.numpy as jnp
    import imageio.v2 as imageio

    from startrax.data.synthetic import SyntheticScene
    from startrax.eval.render import render_image
    from startrax.models.star import StarConfig
    from startrax.ops import rays as ray_ops
    from startrax.train.checkpoint import restore_checkpoint
    from startrax.ops.losses import to8b

    state = restore_checkpoint(args.ckpt_dir)
    params = state["params"] if "params" in state else state

    # infer model dims from the checkpoint
    W = params["nerf"]["static_coarse"]["lin_in"]["w"].shape[1]
    n_blocks = len(params["nerf"]["static_coarse"]["blocks"])
    cfg = StarConfig(
        num_vehicles=args.vehicles, netdepth=2 * n_blocks, netdepth_fine=2 * n_blocks,
        netwidth=W, netwidth_fine=W, n_samples=64, n_importance=64,
        near=2.0, far=8.0,
    )

    scene = SyntheticScene(num_vehicles=args.vehicles, num_frames=args.num_frames,
                           H=args.height, W=args.height, focal=float(args.height))
    c2w = scene.camera(0, 8)
    rays_o, rays_d = ray_ops.get_rays_np(scene.H, scene.W, scene.K, c2w)

    start, stop, step = args.translate
    for i, tx in enumerate(np.arange(start, stop, step)):
        pose = np.zeros((args.vehicles, 7), np.float32)
        pose[:, 0] = tx
        pose[:, 6] = 1.0
        out = render_image(params["nerf"], cfg, rays_o, rays_d,
                           pose=jnp.asarray(pose), with_test_outputs=True)
        imageio.imwrite(os.path.join(args.out, f"full_{i:03d}.png"), to8b(out["rgb"]))
        imageio.imwrite(
            os.path.join(args.out, f"dynamic_{i:03d}.png"), to8b(out["rgb_dynamic_all"])
        )
        print(f"pose tx={tx:.2f} -> full_{i:03d}.png / dynamic_{i:03d}.png")


if __name__ == "__main__":
    main()
