"""Render a tracking gif + decomposition panels from a saved online
checkpoint of the synthetic e2e run."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--height", type=int, default=80)
    ap.add_argument("--vehicles", type=int, default=2)
    ap.add_argument("--num-frames", type=int, default=8)
    ap.add_argument("--width-mlp", type=int, default=128)
    ap.add_argument("--depth-mlp", type=int, default=8)
    args = ap.parse_args()

    import jax.numpy as jnp
    import imageio.v2 as imageio

    from startrax.data.synthetic import SyntheticScene, SyntheticAdapter
    from startrax.eval.render import render_image
    from startrax.models.star import StarConfig
    from startrax.ops.losses import to8b
    from startrax.train import loop
    from startrax.train.checkpoint import restore_checkpoint
    from startrax.utils.vis import visualize_depth

    state = restore_checkpoint(os.path.join(args.run_dir, "ckpt"))
    params = state["params"]

    scene = SyntheticScene(num_vehicles=args.vehicles, num_frames=args.num_frames,
                           H=args.height, W=args.height, focal=float(args.height))
    data = SyntheticAdapter(scene, num_views=8)
    cfg = StarConfig(num_vehicles=args.vehicles, netdepth=args.depth_mlp,
                     netdepth_fine=args.depth_mlp, netwidth=args.width_mlp,
                     netwidth_fine=args.width_mlp, n_samples=64, n_importance=64,
                     near=scene.near, far=scene.far)
    rays_o, rays_d = data.view_rays(0)

    frames = []
    for f in range(scene.num_frames):
        pose = loop.gather_frame_pose(jnp.asarray(params["poses"]), jnp.asarray(f),
                                      cfg.num_vehicles)
        out = render_image(params["nerf"], cfg, rays_o, rays_d, pose=pose,
                           with_test_outputs=True)
        row = np.concatenate(
            [to8b(data.images[0, f]), to8b(out["rgb"]), to8b(out["rgb_static"]),
             to8b(out["rgb_dynamic_all"]), to8b(visualize_depth(out["depth"]))],
            axis=1,
        )
        frames.append(row)
        print(f"frame {f} rendered", flush=True)

    imageio.mimwrite(os.path.join(args.run_dir, "tracking.gif"), frames,
                     duration=500, loop=0)
    imageio.imwrite(os.path.join(args.run_dir, "panel_last.png"), frames[-1])
    print("wrote tracking.gif (columns: target | full | static | dynamic | depth)")


if __name__ == "__main__":
    main()
