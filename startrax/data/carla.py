"""CARLA multi-view dynamic-scene data pipeline (host-side numpy).

Counterpart of the reference datasets/carla_star_app_init.py and
datasets/carla_star_online__.py. Directory layout (produced by the authors'
CARLA capture tooling):

  datadir/
    intrinsics.npy        {"h", "w", "fov"} dict
    extrinsics.npy        {cam_index: 4x4 UE4 camera pose} dict
    camera0/ ... cameraN/ per-frame "<f>.png", "<f>_semantic.png",
                          "<f>_depth.png" (24-bit encoded CARLA depth)
    poses/<vehicle>/*.npy per-frame 4x4 UE4 vehicle poses
    bboxes.npy            per-vehicle {"local_vertices": [8,3]} (optional)

Conventions kept from the reference:
  - UE4 -> NeRF axis change (utils/dataset.py:40-53),
  - world scale_factor (0.01) applied to translations, near/far, depths,
  - view split: train < 50, val 50..55, test > 55 (carla_star_online__.py:206-218),
  - semantic car id = 10,
  - CARLA depth decoded from 24-bit RGB then *1000m (carla_star_app_init.py:127-134),
  - GT relative pose of frame i: pose0 @ inv(pose_i) mapping world(frame i)
    points into the frame-0 vehicle frame (carla_star_online__.py:472-517),
  - noisy pose init: y-axis Euler noise ~ N * pi/16 - pi/32, translation
    noise N/100, frame 0 untouched (carla_star_online__.py:520-573).

Redesign vs the reference: ray grids are stored per *view* (not replicated
per frame — the reference materializes [frames, views*H*W, 3] copies); a
batch gathers (view, pixel) rays and (frame, view, pixel) targets by index.
"""

from __future__ import annotations

import dataclasses
import os
import re
from glob import glob
from typing import Dict, Optional

import numpy as np

from ..ops import rays as ray_ops
from ..ops.lie import matrix_to_se3
from . import transforms

CAR_SEMANTIC_ID = 10


def natural_keys(text: str):
    return [int(c) if c.isdigit() else c for c in re.split(r"(\d+)", text)]


@dataclasses.dataclass
class CarlaConfig:
    datadir: str
    num_frames: int
    num_vehicles: int = 1
    has_depth_data: bool = False
    scale_factor: float = 0.01
    near: float = 3.0
    far: float = 80.0
    eval_last_frame: int = 0  # 0 = all frames
    crop_box: tuple = (100, 300, 100, 300)  # precrop window (y0,y1,x0,x1)


def load_intrinsics(datadir: str):
    d = np.load(os.path.join(datadir, "intrinsics.npy"), allow_pickle=True).item()
    H, W, fov = int(d["h"]), int(d["w"]), float(d["fov"])
    focal = ray_ops.focal_from_fov(W, fov)
    return H, W, focal


def _decode_carla_depth(depth_img: np.ndarray) -> np.ndarray:
    """24-bit RGB-encoded depth -> meters (reference carla_star_app_init.py:127-134)."""
    d = depth_img.astype(np.float64)
    normalized = (d[..., 0] + d[..., 1] * 256.0 + d[..., 2] * 256.0 * 256.0) / (
        256.0 ** 3 - 1.0
    )
    return (1000.0 * normalized).astype(np.float32)


def _view_split_indices(n_cameras: int, split: str):
    if split == "train":
        return [i for i in range(n_cameras) if i < 50]
    if split == "val":
        return [i for i in range(n_cameras) if 50 <= i <= 55]
    if split == "test":
        return [i for i in range(n_cameras) if i > 55]
    raise ValueError(f"invalid split {split}")


class CarlaScene:
    """Loads one CARLA capture into host arrays, per split."""

    def __init__(self, cfg: CarlaConfig, split: str, max_frames: Optional[int] = None):
        import imageio.v2 as imageio

        self.cfg = cfg
        self.split = split
        self._car_pools = {}  # (start, end) -> [M, 4] (v, f, y, x) car pixels
        H, W, focal = load_intrinsics(cfg.datadir)
        self.H, self.W, self.focal = H, W, focal
        self.K = ray_ops.intrinsics_matrix(H, W, focal)

        extrinsics = np.load(
            os.path.join(cfg.datadir, "extrinsics.npy"), allow_pickle=True
        ).item()
        cameras = sorted(glob(os.path.join(cfg.datadir, "camera*/")), key=natural_keys)
        view_ids = _view_split_indices(len(cameras), split)

        n_frames = max_frames or cfg.num_frames
        imgs, poses, semantic, depth = [], [], [], []
        for i in view_ids:
            cam = cameras[i]
            rgb_paths, sem_paths, depth_paths = [], [], []
            for path in sorted(glob(os.path.join(cam, "*.png")), key=natural_keys):
                if path.endswith("_semantic.png"):
                    sem_paths.append(path)
                elif path.endswith("_depth.png"):
                    depth_paths.append(path)
                else:
                    rgb_paths.append(path)
            imgs.append(
                [imageio.imread(p) for p in rgb_paths[:n_frames]]
            )
            semantic.append([imageio.imread(p)[..., 0] for p in sem_paths[:n_frames]])
            if cfg.has_depth_data:
                depth.append(
                    [_decode_carla_depth(imageio.imread(p)) for p in depth_paths[:n_frames]]
                )
            poses.append(transforms.from_ue4_to_nerf(np.asarray(extrinsics[i])))

        self.images = (np.asarray(imgs, dtype=np.float32) / 255.0)[..., :3]
        # [V, F, H, W, 3]
        self.semantic = np.asarray(semantic, dtype=np.uint8) if semantic and semantic[0] else None
        self.depths = np.asarray(depth, dtype=np.float32) if cfg.has_depth_data else None
        self.poses = np.asarray(poses, dtype=np.float32)  # [V, 4, 4]

        self.near, self.far = cfg.near, cfg.far
        if cfg.scale_factor > 0:
            self.near *= cfg.scale_factor
            self.far *= cfg.scale_factor
            self.poses[:, :3, 3] *= cfg.scale_factor
            if self.depths is not None:
                self.depths *= cfg.scale_factor

        if split == "test" and cfg.eval_last_frame:
            self.images = self.images[:, : cfg.eval_last_frame]
            if self.semantic is not None:
                self.semantic = self.semantic[:, : cfg.eval_last_frame]
            if self.depths is not None:
                self.depths = self.depths[:, : cfg.eval_last_frame]

        # Per-view ray grids [V, H, W, 3] (not replicated per frame).
        grids = [ray_ops.get_rays_np(H, W, self.K, p[:3, :4]) for p in self.poses]
        self.rays_o = np.stack([g[0] for g in grids]).astype(np.float32)
        self.rays_d = np.stack([g[1] for g in grids]).astype(np.float32)

        bboxes_path = os.path.join(cfg.datadir, "bboxes.npy")
        self.bboxes = (
            np.load(bboxes_path, allow_pickle=True) if os.path.exists(bboxes_path) else None
        )

    # ---------------- GT vehicle poses ----------------

    def _vehicle_pose_files(self):
        posedir = os.path.join(self.cfg.datadir, "poses")
        vehicle_dirs = sorted(os.listdir(posedir), key=natural_keys)
        return [
            sorted(glob(os.path.join(posedir, v, "*.npy")), key=natural_keys)
            for v in vehicle_dirs[: self.cfg.num_vehicles]
        ]

    def gt_vehicle_poses(self) -> np.ndarray:
        """World->vehicle (inverse) poses per frame, [K, F, 4, 4]
        (reference get_gt_vehicle_poses, carla_star_online__.py:425-469)."""
        out = []
        for files in self._vehicle_pose_files():
            mats = []
            for f in files[: self.cfg.num_frames]:
                p = transforms.from_ue4_to_nerf(np.load(f))
                if self.cfg.scale_factor > 0:
                    p[:3, 3] *= self.cfg.scale_factor
                mats.append(transforms.invert_transformation(p))
            out.append(np.stack(mats))
        return np.stack(out).astype(np.float32)

    def gt_relative_poses(self) -> np.ndarray:
        """7-vec poses [K, F, 7]: pose0 @ inv(pose_f), mapping frame-f world
        points into the frame-0 canonical vehicle frame
        (reference load_gt_relative_poses, carla_star_online__.py:472-517)."""
        out = []
        for files in self._vehicle_pose_files():
            mats = []
            pose0 = None
            for i, f in enumerate(files[: self.cfg.num_frames]):
                p = transforms.from_ue4_to_nerf(np.load(f)).astype(np.float32)
                if self.cfg.scale_factor > 0:
                    p[:3, 3] *= self.cfg.scale_factor
                if i == 0:
                    pose0 = p
                    mats.append(np.eye(4, dtype=np.float32))
                else:
                    mats.append(pose0 @ transforms.invert_transformation(p))
            out.append(np.stack(mats))
        mats = np.stack(out).astype(np.float32)  # [K, F, 4, 4]
        return np.asarray(matrix_to_se3(mats))

    def noisy_gt_relative_poses(self, rng: np.random.Generator) -> np.ndarray:
        """Noisy init for online training [K, F, 7]: y-axis Euler noise
        (N * pi/16 - pi/32) + translation noise (N / 100) on frames >= 1
        (reference get_noisy_gt_relative_poses, carla_star_online__.py:520-573)."""
        from scipy.spatial.transform import Rotation

        gt = self.gt_relative_poses()  # [K, F, 7]
        K, F = gt.shape[:2]
        noisy = np.zeros_like(gt)
        for k in range(K):
            eul = Rotation.from_quat(gt[k, :, 3:7]).as_euler("xyz")
            trans = gt[k, :, :3].copy()
            eul[1:, 1] += rng.standard_normal(F - 1) * np.pi / 16 - np.pi / 32
            trans[1:] += rng.standard_normal((F - 1, 3)) / 100.0
            q = Rotation.from_euler("xyz", eul).as_quat()
            noisy[k] = np.concatenate([trans, q], axis=-1)
        return noisy.astype(np.float32)

    def bbox_local_vertices(self) -> Optional[np.ndarray]:
        """[K, 8, 3] scaled NeRF-frame bbox corners (reference
        get_local_vertices, utils/metrics.py:465-478)."""
        if self.bboxes is None:
            return None
        out = []
        for i in range(self.cfg.num_vehicles):
            lv = np.asarray(self.bboxes[i]["local_vertices"], dtype=np.float32)
            out.append(self.cfg.scale_factor * transforms.from_ue4_to_nerf_pts(lv))
        return np.stack(out)

    # ---------------- batch sampling ----------------

    def _car_pool(self, start: int, end: int, view_range=None) -> np.ndarray:
        """Cached (v, f, y, x) indices of car pixels in the frame window."""
        vlo, vhi = view_range or (0, self.images.shape[0])
        key = (start, end, vlo, vhi)
        if key not in self._car_pools:
            m = self.semantic[vlo:vhi, start:end] == CAR_SEMANTIC_ID
            v, f, y, x = np.nonzero(m)
            self._car_pools[key] = np.stack([v + vlo, f + start, y, x], axis=-1)
        return self._car_pools[key]

    def sample_batch(
        self,
        rng: np.random.Generator,
        n_rand: int,
        start_frame: int = 0,
        current_frame: int = 1,
        car_sample_ratio: float = 0.0,
        crop: bool = False,
        frame: Optional[int] = None,
        mixed_frames: bool = False,
        ghost_sample_ratio: float = 0.0,
        frame0_sample_ratio: float = 0.0,
        view_range=None,
    ) -> Dict[str, np.ndarray]:
        """Random ray minibatch from a random in-window frame
        (reference __getitem__, carla_star_online__.py:287-350).

        mixed_frames=True samples each ray's frame independently from the
        window (batch["frame"] becomes an [N] int array) so every frame's
        pose gets gradient every step — a capability the reference's
        one-frame-per-batch sampling doesn't have.

        ghost_sample_ratio / frame0_sample_ratio (mixed layout, needs
        semantics): see data/synthetic.SyntheticAdapter.sample_batch — ghost
        rays carve appearance-init vehicle ghosts out of the static field;
        frame-0 car rays anchor the dynamic fields' canonical frame (frame-0
        pose is identity by construction).

        view_range=(lo, hi) restricts sampling to that half-open view subset
        (the cross-view field/pose split, data/synthetic.sample_batch)."""
        V, F = self.images.shape[:2]
        vlo, vhi = view_range or (0, V)
        if ghost_sample_ratio > 0 or frame0_sample_ratio > 0:
            mixed_frames = True
        if mixed_frames and frame is None:
            f = rng.integers(start_frame, current_frame, size=n_rand)
            v = rng.integers(vlo, vhi, n_rand)
            if crop:
                y0, y1, x0, x1 = self.cfg.crop_box
                y = rng.integers(y0, min(y1, self.H), n_rand)
                x = rng.integers(x0, min(x1, self.W), n_rand)
            else:
                y = rng.integers(0, self.H, n_rand)
                x = rng.integers(0, self.W, n_rand)
            lo = 0
            n_car = int(n_rand * car_sample_ratio)
            if n_car > 0 and not crop and self.semantic is not None:
                pool = self._car_pool(start_frame, current_frame, view_range)
                if len(pool):
                    picks = pool[rng.integers(0, len(pool), size=n_car)]
                    v[:n_car], f[:n_car], y[:n_car], x[:n_car] = picks.T
                    lo = n_car
            if self.semantic is not None and not crop:
                n_ghost = int(n_rand * ghost_sample_ratio)
                if n_ghost > 0 and current_frame - start_frame > 1:
                    pool = self._car_pool(start_frame, current_frame, view_range)
                    if len(pool):
                        hi = min(lo + n_ghost, n_rand)
                        picks = pool[rng.integers(0, len(pool), size=hi - lo)]
                        pv, pf, py, px = picks.T
                        shift = rng.integers(
                            1, current_frame - start_frame, size=hi - lo)
                        other = start_frame + (pf - start_frame + shift) % (
                            current_frame - start_frame)
                        v[lo:hi], f[lo:hi], y[lo:hi], x[lo:hi] = pv, other, py, px
                        lo = hi
                n_f0 = int(n_rand * frame0_sample_ratio)
                if n_f0 > 0 and start_frame == 0:
                    pool0 = self._car_pool(0, 1, view_range)
                    if len(pool0):
                        hi = min(lo + n_f0, n_rand)
                        picks = pool0[rng.integers(0, len(pool0), size=hi - lo)]
                        v[lo:hi], f[lo:hi], y[lo:hi], x[lo:hi] = picks.T
                        lo = hi
            batch = {
                "rays_o": self.rays_o[v, y, x],
                "rays_d": self.rays_d[v, y, x],
                "target": self.images[v, f, y, x],
                "frame": f.astype(np.int32),
            }
            if self.depths is not None:
                batch["target_depth"] = self.depths[v, f, y, x]
            return batch
        if frame is None:
            frame = int(rng.integers(start_frame, current_frame))

        if crop:
            y0, y1, x0, x1 = self.cfg.crop_box
            v = rng.integers(vlo, vhi, n_rand)
            y = rng.integers(y0, min(y1, self.H), n_rand)
            x = rng.integers(x0, min(x1, self.W), n_rand)
        elif car_sample_ratio > 0 and self.semantic is not None:
            n_car = int(n_rand * car_sample_ratio)
            car_mask = self.semantic[vlo:vhi, frame] == CAR_SEMANTIC_ID
            car_idx = np.argwhere(car_mask)
            noncar_idx = np.argwhere(~car_mask)
            pick_car = car_idx[rng.integers(0, max(len(car_idx), 1), n_car)] if len(car_idx) else np.zeros((0, 3), int)
            pick_non = noncar_idx[rng.integers(0, len(noncar_idx), n_rand - len(pick_car))]
            picks = np.concatenate([pick_car, pick_non], axis=0)
            picks = picks[rng.permutation(len(picks))]
            v, y, x = picks[:, 0] + vlo, picks[:, 1], picks[:, 2]
        else:
            v = rng.integers(vlo, vhi, n_rand)
            y = rng.integers(0, self.H, n_rand)
            x = rng.integers(0, self.W, n_rand)

        batch = {
            "rays_o": self.rays_o[v, y, x],
            "rays_d": self.rays_d[v, y, x],
            "target": self.images[v, frame, y, x],
            "frame": np.int32(frame),
        }
        if self.depths is not None:
            batch["target_depth"] = self.depths[v, frame, y, x]
        return batch

    def view_rays(self, view: int):
        """Full-frame rays for one view: ([H, W, 3], [H, W, 3])."""
        return self.rays_o[view], self.rays_d[view]
