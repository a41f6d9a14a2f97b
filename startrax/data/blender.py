"""Blender synthetic-scene loader (NeRF lego format, host-side numpy).

Counterpart of the reference datasets/lego.py: transforms_{train,val,test}.json
with per-frame camera_angle_x and transform_matrix; RGBA images composited
onto a white background when white_bkgd is set.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from ..ops import rays as ray_ops


class BlenderScene:
    def __init__(
        self,
        datadir: str,
        split: str = "train",
        half_res: bool = False,
        testskip: int = 1,
        white_bkgd: bool = True,
        near: float = 2.0,
        far: float = 6.0,
    ):
        import imageio.v2 as imageio

        with open(os.path.join(datadir, f"transforms_{split}.json")) as fp:
            meta = json.load(fp)

        skip = 1 if (split == "train" or testskip == 0) else testskip
        imgs, poses = [], []
        for frame in meta["frames"][::skip]:
            fname = os.path.join(datadir, frame["file_path"] + ".png")
            imgs.append(imageio.imread(fname))
            poses.append(np.asarray(frame["transform_matrix"], dtype=np.float32))

        imgs = (np.asarray(imgs) / 255.0).astype(np.float32)  # [N, H, W, 4]
        self.poses = np.stack(poses)

        H, W = imgs.shape[1:3]
        camera_angle_x = float(meta["camera_angle_x"])
        focal = 0.5 * W / np.tan(0.5 * camera_angle_x)

        if half_res:
            import cv2

            H, W, focal = H // 2, W // 2, focal / 2.0
            imgs = np.stack(
                [cv2.resize(im, (W, H), interpolation=cv2.INTER_AREA) for im in imgs]
            )

        if imgs.shape[-1] == 4:
            if white_bkgd:
                imgs = imgs[..., :3] * imgs[..., -1:] + (1.0 - imgs[..., -1:])
            else:
                imgs = imgs[..., :3] * imgs[..., -1:]

        self.images = imgs.astype(np.float32)  # [N, H, W, 3]
        self.H, self.W, self.focal = int(H), int(W), float(focal)
        self.K = ray_ops.intrinsics_matrix(self.H, self.W, self.focal)
        self.near, self.far = near, far

        grids = [ray_ops.get_rays_np(self.H, self.W, self.K, p[:3, :4]) for p in self.poses]
        self.rays_o = np.stack([g[0] for g in grids]).astype(np.float32)
        self.rays_d = np.stack([g[1] for g in grids]).astype(np.float32)

    def sample_batch(self, rng: np.random.Generator, n_rand: int) -> Dict[str, np.ndarray]:
        N = self.images.shape[0]
        v = rng.integers(0, N, n_rand)
        y = rng.integers(0, self.H, n_rand)
        x = rng.integers(0, self.W, n_rand)
        return {
            "rays_o": self.rays_o[v, y, x],
            "rays_d": self.rays_d[v, y, x],
            "target": self.images[v, y, x],
        }

    def view_rays(self, view: int):
        return self.rays_o[view], self.rays_d[view]
