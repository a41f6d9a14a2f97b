"""Procedural multi-view dynamic scene for tests and benchmarks.

The reference trains on CARLA captures that are not shipped with the code; to
make the framework self-verifying we synthesize a scene with an *analytic*
static density field plus K rigid "vehicles" moving along known SE(3)
trajectories, rendered through the same compositing math the models use
(golden-tested independently in tests/test_compositing.py). This yields
pixel-perfect self-consistent supervision:

- appearance init must reconstruct the static field (PSNR gate),
- online training must recover the known vehicle poses from photometric
  loss alone — the end-to-end property the whole system exists for.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Dict, Tuple

import numpy as np

# bump when scene-generation code changes (invalidates on-disk caches)
_CACHE_VERSION = 3

from ..ops import rays as ray_ops

# --------------------------------------------------------------------------
# Analytic fields: a handful of colored Gaussian blobs + a ground slab.
# --------------------------------------------------------------------------

_STATIC_BLOBS = np.array(
    [
        # x, y, z, radius, sigma_peak, r, g, b
        [0.0, -0.1, 0.0, 0.55, 28.0, 0.9, 0.25, 0.2],
        [0.9, 0.15, -0.5, 0.4, 24.0, 0.2, 0.8, 0.3],
        [-0.8, 0.05, -0.4, 0.45, 24.0, 0.25, 0.35, 0.9],
        [0.2, 0.6, 0.6, 0.3, 20.0, 0.9, 0.85, 0.2],
    ],
    dtype=np.float32,
)

_VEHICLE_COLORS = np.array(
    [[0.95, 0.55, 0.1], [0.1, 0.9, 0.9], [0.8, 0.1, 0.8]], dtype=np.float32
)


def static_sigma_rgb(pts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic static field. pts [..., 3] -> (sigma [...], rgb [..., 3])."""
    sigma = np.zeros(pts.shape[:-1], np.float32)
    rgb_acc = np.zeros(pts.shape[:-1] + (3,), np.float32)
    for bx, by, bz, rad, peak, r, g, b in _STATIC_BLOBS:
        d2 = np.sum((pts - np.array([bx, by, bz], np.float32)) ** 2, -1)
        s = peak * np.exp(-d2 / (2 * rad * rad / 9.0))
        sigma += s
        rgb_acc += s[..., None] * np.array([r, g, b], np.float32)
    # ground slab at y = -1
    ground = 20.0 * np.exp(-((pts[..., 1] + 1.0) ** 2) / 0.005)
    sigma += ground
    rgb_acc += ground[..., None] * np.array([0.45, 0.45, 0.5], np.float32)
    rgb = rgb_acc / np.maximum(sigma[..., None], 1e-8)
    return sigma, np.clip(rgb, 0.0, 1.0)


def vehicle_sigma_rgb(pts_canonical: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Analytic vehicle k in its canonical frame: an anisotropic super-
    Gaussian (sharp-edged box-like blob, long axis = x) with a striped
    texture. The texture matters: a solid-colored blob makes the SE(3) pose
    photometrically near-unobservable (the dynamic field can absorb pose
    error), which is not representative of textured CARLA vehicles."""
    scales = np.array([0.45, 0.18, 0.22], np.float32)
    q = np.sum((pts_canonical / scales) ** 4, -1)
    sigma = 80.0 * np.exp(-q / 2.0)
    base = _VEHICLE_COLORS[k % 3]
    x, y, z = pts_canonical[..., 0], pts_canonical[..., 1], pts_canonical[..., 2]
    stripes = 0.55 + 0.45 * np.sin(14.0 * x) * np.sin(9.0 * y + 3.0 * z)
    rgb = base * stripes[..., None]
    return sigma.astype(np.float32), np.clip(rgb, 0.0, 1.0).astype(np.float32)


_ACCEL_WARNED = False


@functools.lru_cache(maxsize=8)
def _accel_marcher(H: int, W: int, S: int, K: int):
    """Jitted GT marcher for one (H, W, S, K) shape: the exact math of
    SyntheticScene._render_frame_numpy in jnp, elementwise f32 end-to-end
    (no matmuls, so no bf16 involved — numpy parity to float tolerance,
    test_data.py::test_accel_render_matches_numpy)."""
    import jax
    import jax.numpy as jnp

    blobs = jnp.asarray(_STATIC_BLOBS)
    scales = jnp.asarray([0.45, 0.18, 0.22], jnp.float32)

    def fn(rays_o, rays_d, z, Rk, tk, colors):
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z[:, None]  # [H,W,S,3]
        sigma = jnp.zeros(pts.shape[:-1], jnp.float32)
        rgb_acc = jnp.zeros(pts.shape[:-1] + (3,), jnp.float32)
        for i in range(blobs.shape[0]):
            bx, by, bz, rad, peak, r, g, b = (blobs[i, j] for j in range(8))
            d2 = jnp.sum((pts - jnp.stack([bx, by, bz])) ** 2, -1)
            s = peak * jnp.exp(-d2 / (2 * rad * rad / 9.0))
            sigma = sigma + s
            rgb_acc = rgb_acc + s[..., None] * jnp.stack([r, g, b])
        ground = 20.0 * jnp.exp(-((pts[..., 1] + 1.0) ** 2) / 0.005)
        sigma = sigma + ground
        rgb_acc = rgb_acc + ground[..., None] * jnp.asarray(
            [0.45, 0.45, 0.5], jnp.float32)
        sigma_static = sigma

        for k in range(K):
            pts_can = jnp.einsum("ij,...j->...i", Rk[k], pts) + tk[k]
            q = jnp.sum((pts_can / scales) ** 4, -1)
            s_k = 80.0 * jnp.exp(-q / 2.0)
            x, y, zz = pts_can[..., 0], pts_can[..., 1], pts_can[..., 2]
            stripes = 0.55 + 0.45 * jnp.sin(14.0 * x) * jnp.sin(9.0 * y + 3.0 * zz)
            rgb_k = jnp.clip(colors[k] * stripes[..., None], 0.0, 1.0)
            sigma = sigma + s_k
            rgb_acc = rgb_acc + s_k[..., None] * rgb_k

        rgb = jnp.clip(rgb_acc / jnp.maximum(sigma[..., None], 1e-8), 0.0, 1.0)
        dists = jnp.diff(z, append=z[-1] + (z[1] - z[0]))
        dists = dists * jnp.linalg.norm(rays_d, axis=-1)[..., None]
        alpha = 1.0 - jnp.exp(-sigma * dists)
        T = jnp.cumprod(
            jnp.concatenate(
                [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1),
            -1)[..., :-1]
        w = alpha * T
        img = jnp.sum(w[..., None] * rgb, axis=-2)
        depth = jnp.sum(w * z, axis=-1)
        sigma_dyn = sigma - sigma_static
        dyn_mask = jnp.sum(w * (sigma_dyn > 0.5 * sigma), axis=-1) > 0.1
        return img, depth, dyn_mask

    return jax.jit(fn)


# --------------------------------------------------------------------------
# Scene
# --------------------------------------------------------------------------


def _look_at(eye: np.ndarray, center: np.ndarray, up=np.array([0.0, 1.0, 0.0])):
    """c2w matrix in NeRF convention (camera looks along -z)."""
    f = center - eye
    f = f / np.linalg.norm(f)
    s = np.cross(f, up)
    s = s / np.linalg.norm(s)
    u = np.cross(s, f)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0] = s
    c2w[:3, 1] = u
    c2w[:3, 2] = -f
    c2w[:3, 3] = eye
    return c2w


def _quat_from_yaw(yaw: float) -> np.ndarray:
    return np.array([0.0, np.sin(yaw / 2), 0.0, np.cos(yaw / 2)], np.float32)


@dataclasses.dataclass
class SyntheticScene:
    """A ring of cameras around an origin-centered scene with K vehicles
    translating/yawing over F frames."""

    num_vehicles: int = 1
    num_frames: int = 8
    H: int = 64
    W: int = 64
    focal: float = 64.0
    near: float = 2.0
    far: float = 8.0
    n_march: int = 192  # samples for ground-truth marching
    cam_radius: float = 4.0
    cam_height: float = 1.2

    @property
    def K(self) -> np.ndarray:
        return ray_ops.intrinsics_matrix(self.H, self.W, self.focal)

    def camera(self, view: int, num_views: int) -> np.ndarray:
        ang = 2 * np.pi * view / num_views
        eye = np.array(
            [self.cam_radius * np.cos(ang), self.cam_height, self.cam_radius * np.sin(ang)],
            np.float32,
        )
        return _look_at(eye, np.zeros(3, np.float32))

    def gt_pose_world(self, frame: int, k: int) -> np.ndarray:
        """World-from-canonical pose of vehicle k at `frame`, as a 7-vec.

        Vehicle 0 translates along x with slight yaw; vehicle 1 along z."""
        t = frame / max(self.num_frames - 1, 1)
        if k % 2 == 0:
            trans = np.array([-1.2 + 2.4 * t, -0.55, 1.1], np.float32)
            yaw = 0.3 * t
        else:
            trans = np.array([1.0, -0.55, -1.3 + 2.2 * t], np.float32)
            yaw = -0.25 * t
        return np.concatenate([trans, _quat_from_yaw(yaw)]).astype(np.float32)

    def gt_relative_pose(self, frame: int, k: int) -> np.ndarray:
        """Pose used by the model: canonical(frame-0)-from-world at `frame`
        composed so that warping world points by it lands in the frame-0
        vehicle frame. This is inv(world_pose_f) in our parameterization of
        sample-point warps (the model applies pose directly to world pts)."""
        from scipy.spatial.transform import Rotation

        p = self.gt_pose_world(frame, k)
        R = Rotation.from_quat(p[3:]).as_matrix().astype(np.float32)
        t = p[:3]
        Rinv = R.T
        tinv = -Rinv @ t
        q = Rotation.from_matrix(Rinv).as_quat().astype(np.float32)
        return np.concatenate([tinv, q]).astype(np.float32)

    def sigma_rgb_at(self, pts: np.ndarray, frame: int):
        """Total scene density/color at world pts for a given frame."""
        from scipy.spatial.transform import Rotation

        sigma, rgb = static_sigma_rgb(pts)
        rgb_acc = sigma[..., None] * rgb
        for k in range(self.num_vehicles):
            pose = self.gt_relative_pose(frame, k)
            R = Rotation.from_quat(pose[3:]).as_matrix().astype(np.float32)
            pts_can = np.einsum("ij,...j->...i", R, pts) + pose[:3]
            s_k, rgb_k = vehicle_sigma_rgb(pts_can, k)
            sigma += s_k
            rgb_acc += s_k[..., None] * rgb_k
        rgb = rgb_acc / np.maximum(sigma[..., None], 1e-8)
        return sigma, np.clip(rgb, 0.0, 1.0)

    def render_frame(self, view: int, num_views: int, frame: int):
        """Ground-truth render: fine ray march through the analytic fields.

        Returns (rgb [H,W,3], depth [H,W], dyn_mask [H,W] bool).

        Dispatches to the jax-accelerated marcher (one jitted graph per
        (H, W, S, K) shape, runs on the default backend — the TPU is idle
        during dataset generation, and the numpy marcher costs ~27 s/frame
        at 192^2 x 192 samples on this 1-core host vs milliseconds on
        device; a 36-view x 8-frame 192^2 scene is 2+ h numpy vs ~1 min
        accelerated). STARTRAX_SYNTH_NUMPY=1 forces the numpy path; both
        produce the same scene to float tolerance (parity-tested)."""
        if os.environ.get("STARTRAX_SYNTH_NUMPY") != "1":
            try:
                return self._render_frame_accel(view, num_views, frame)
            except Exception as e:  # pragma: no cover - env-dependent
                global _ACCEL_WARNED
                if not _ACCEL_WARNED:
                    print(f"synthetic: accel render failed ({e!r}); "
                          "falling back to numpy", flush=True)
                    _ACCEL_WARNED = True
        return self._render_frame_numpy(view, num_views, frame)

    def _render_frame_accel(self, view: int, num_views: int, frame: int):
        from scipy.spatial.transform import Rotation

        c2w = self.camera(view, num_views)
        rays_o, rays_d = ray_ops.get_rays_np(self.H, self.W, self.K, c2w)
        z = np.linspace(self.near, self.far, self.n_march, dtype=np.float32)
        K = self.num_vehicles
        Rk = np.stack([
            Rotation.from_quat(self.gt_relative_pose(frame, k)[3:]).as_matrix()
            for k in range(K)
        ]).astype(np.float32)
        tk = np.stack([self.gt_relative_pose(frame, k)[:3] for k in range(K)])
        colors = np.stack([_VEHICLE_COLORS[k % 3] for k in range(K)])
        fn = _accel_marcher(self.H, self.W, self.n_march, K)
        img, dep, m = fn(rays_o, rays_d, z, Rk, tk, colors)
        return (np.asarray(img, np.float32), np.asarray(dep, np.float32),
                np.asarray(m))

    def _render_frame_numpy(self, view: int, num_views: int, frame: int):
        c2w = self.camera(view, num_views)
        rays_o, rays_d = ray_ops.get_rays_np(self.H, self.W, self.K, c2w)
        z = np.linspace(self.near, self.far, self.n_march, dtype=np.float32)
        pts = rays_o[..., None, :] + rays_d[..., None, :] * z[:, None]  # [H,W,S,3]

        sigma, rgb = self.sigma_rgb_at(pts, frame)
        sigma_static, _ = static_sigma_rgb(pts)

        dists = np.diff(z, append=z[-1] + (z[1] - z[0]))
        dists = dists * np.linalg.norm(rays_d, axis=-1)[..., None]
        alpha = 1.0 - np.exp(-sigma * dists)
        T = np.cumprod(
            np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1
        )[..., :-1]
        w = alpha * T
        img = np.sum(w[..., None] * rgb, axis=-2)
        depth = np.sum(w * z, axis=-1)

        # dynamic mask: rays whose visible weight is dominated by dynamic density
        sigma_dyn = sigma - sigma_static
        dyn_mask = np.sum(w * (sigma_dyn > 0.5 * sigma), axis=-1) > 0.1
        return img.astype(np.float32), depth.astype(np.float32), dyn_mask

    def make_dataset(self, num_views: int = 6, frames=None) -> Dict[str, np.ndarray]:
        """All views x frames: images, rays, depths, masks, GT poses."""
        frames = list(range(self.num_frames)) if frames is None else frames
        imgs, depths, masks, rays_o_all, rays_d_all = [], [], [], [], []
        for v in range(num_views):
            c2w = self.camera(v, num_views)
            ro, rd = ray_ops.get_rays_np(self.H, self.W, self.K, c2w)
            row_i, row_d, row_m = [], [], []
            for f in frames:
                img, dep, m = self.render_frame(v, num_views, f)
                row_i.append(img)
                row_d.append(dep)
                row_m.append(m)
            imgs.append(np.stack(row_i))
            depths.append(np.stack(row_d))
            masks.append(np.stack(row_m))
            rays_o_all.append(ro)
            rays_d_all.append(rd)
        gt_rel = np.stack(
            [
                np.stack([self.gt_relative_pose(f, k) for k in range(self.num_vehicles)])
                for f in frames
            ]
        )  # [F, K, 7]
        return {
            "images": np.stack(imgs),  # [V, F, H, W, 3]
            "depths": np.stack(depths),  # [V, F, H, W]
            "dyn_masks": np.stack(masks),  # [V, F, H, W]
            "rays_o": np.stack(rays_o_all),  # [V, H, W, 3]
            "rays_d": np.stack(rays_d_all),  # [V, H, W, 3]
            "gt_relative_poses": gt_rel,  # [F, K, 7]
        }


# in-process memo so the train and val splits of the same scene share one
# generated dataset (generation is minutes of host work at H>=128)
_GEN_MEMO: Dict[str, Dict[str, np.ndarray]] = {}


class SyntheticAdapter:
    """Dataset-style facade over SyntheticScene matching CarlaScene's
    sampling API (used by the apps and tests).

    num_val_views > 0 generates that many EXTRA views held out from training:
    split="train" exposes the first `num_views`, split="val"/"test" exposes
    the held-out tail — the held-out views feed the GT-free photometric
    best-epoch selection (reference splits views 51-55/>55 the same way,
    carla_star_online__.py:206-218)."""

    def __init__(self, scene: SyntheticScene, num_views: int = 6,
                 cache_dir: str = "", split: str = "train",
                 num_val_views: int = 0):
        self.scene = scene
        total_views = num_views + num_val_views
        # the key must cover EVERY field that changes the generated data
        # (focal/near/far/cam_* included) plus a format version bumped
        # whenever the generation code changes — a partial key silently
        # serves stale ground truth
        desc = json.dumps(
            {"views": total_views, "version": _CACHE_VERSION,
             **dataclasses.asdict(scene)},
            sort_keys=True)
        if desc in _GEN_MEMO:
            self.data = _GEN_MEMO[desc]
        elif cache_dir:
            import hashlib
            import os

            digest = hashlib.sha1(desc.encode()).hexdigest()[:16]
            key = (f"synth_v{total_views}_f{scene.num_frames}_h{scene.H}"
                   f"_k{scene.num_vehicles}_{digest}.npz")
            path = os.path.join(cache_dir, key)
            if os.path.exists(path):
                with np.load(path) as z:
                    self.data = {k: z[k] for k in z.files}
            else:
                self.data = scene.make_dataset(num_views=total_views)
                os.makedirs(cache_dir, exist_ok=True)
                tmp = path + ".tmp.npz"
                np.savez(tmp, **self.data)
                os.replace(tmp, path)
        else:
            self.data = scene.make_dataset(num_views=total_views)
        _GEN_MEMO[desc] = self.data

        if num_val_views > 0:
            sl = (slice(0, num_views) if split == "train"
                  else slice(num_views, total_views))
            self.data = dict(self.data)
            for k in ("images", "depths", "dyn_masks", "rays_o", "rays_d"):
                self.data[k] = self.data[k][sl]
        self.images = self.data["images"]
        self.depths = self.data["depths"]  # [V, F, H, W] analytic depth
        self.rays_o = self.data["rays_o"]
        self.rays_d = self.data["rays_d"]
        self.near, self.far = scene.near, scene.far
        self.H, self.W = scene.H, scene.W
        self._car_pools = {}  # (start, end) -> [M, 4] (v, f, y, x) car pixels

    def _car_pool(self, start: int, end: int,
                  view_range=None) -> np.ndarray:
        vlo, vhi = view_range or (0, self.images.shape[0])
        key = (start, end, vlo, vhi)
        if key not in self._car_pools:
            m = self.data["dyn_masks"][vlo:vhi, start:end]  # [V', W, H, W]
            v, f, y, x = np.nonzero(m)
            self._car_pools[key] = np.stack([v + vlo, f + start, y, x], axis=-1)
        return self._car_pools[key]

    def sample_batch(self, rng, n_rand, start_frame=0, current_frame=1, frame=None,
                     car_sample_ratio=0.0, mixed_frames=False,
                     ghost_sample_ratio=0.0, frame0_sample_ratio=0.0,
                     view_range=None, **_):
        """Random ray minibatch.

        mixed_frames=True samples each ray's frame independently from the
        window (batch["frame"] becomes an [N] int array), so every frame's
        pose gets gradient every step; car_sample_ratio reserves that
        fraction of rays for pixels on a vehicle (reference car-balanced
        sampling, datasets/carla_star_online__.py:313-350).

        ghost_sample_ratio reserves rays through vehicle pixels of a
        DIFFERENT in-window frame — supervising background where a vehicle
        was/will be, which carves appearance-init vehicle ghosts out of the
        static field. frame0_sample_ratio pins rays to frame 0 (pose =
        identity by construction), anchoring the dynamic fields' canonical
        frame without ground truth. Both force the mixed-frame layout.

        view_range=(lo, hi) restricts sampling to that half-open view subset
        — the cross-view split that lets field and pose phases see disjoint
        views (pose gradients on views the fields never trained on stay
        informative at the joint photometric optimum)."""
        if ghost_sample_ratio > 0 or frame0_sample_ratio > 0:
            mixed_frames = True
        if not mixed_frames:
            if frame is None:
                frame = int(rng.integers(start_frame, current_frame))
            return sample_ray_batch(
                rng, self.data, n_rand, frame,
                car_sample_ratio=car_sample_ratio, view_range=view_range
            )

        V, F, H, W, _ = self.data["images"].shape
        vlo, vhi = view_range or (0, V)
        v = rng.integers(vlo, vhi, size=n_rand)
        f = rng.integers(start_frame, current_frame, size=n_rand)
        y = rng.integers(0, H, size=n_rand)
        x = rng.integers(0, W, size=n_rand)
        lo = 0
        n_car = int(n_rand * car_sample_ratio)
        if n_car > 0:
            pool = self._car_pool(start_frame, current_frame, view_range)
            if len(pool):
                picks = pool[rng.integers(0, len(pool), size=n_car)]
                v[lo:n_car], f[lo:n_car], y[lo:n_car], x[lo:n_car] = picks.T
                lo = n_car
        n_ghost = int(n_rand * ghost_sample_ratio)
        if n_ghost > 0 and current_frame - start_frame > 1:
            pool = self._car_pool(start_frame, current_frame, view_range)
            if len(pool):
                hi = min(lo + n_ghost, n_rand)
                picks = pool[rng.integers(0, len(pool), size=hi - lo)]
                pv, pf, py, px = picks.T
                # redraw each ray's frame from the window EXCLUDING the frame
                # the pixel's vehicle mask came from
                shift = rng.integers(1, current_frame - start_frame, size=hi - lo)
                other = start_frame + (pf - start_frame + shift) % (
                    current_frame - start_frame)
                v[lo:hi], f[lo:hi], y[lo:hi], x[lo:hi] = pv, other, py, px
                lo = hi
        n_f0 = int(n_rand * frame0_sample_ratio)
        if n_f0 > 0 and start_frame == 0:
            hi = min(lo + n_f0, n_rand)
            # anchor rays: frame-0 VEHICLE pixels (the identity pose only
            # constrains the dynamic field where the vehicle is visible)
            pool0 = self._car_pool(0, 1, view_range)
            if len(pool0):
                picks = pool0[rng.integers(0, len(pool0), size=hi - lo)]
                v[lo:hi], f[lo:hi], y[lo:hi], x[lo:hi] = picks.T
            else:
                f[lo:hi] = 0
            lo = hi
        return {
            "rays_o": self.data["rays_o"][v, y, x],
            "rays_d": self.data["rays_d"][v, y, x],
            "target": self.data["images"][v, f, y, x],
            "target_depth": self.data["depths"][v, f, y, x],
            "frame": f.astype(np.int32),
        }

    def view_rays(self, view: int):
        return self.rays_o[view], self.rays_d[view]

    # the synthetic scene's canonical vehicle frame is origin-centered (the
    # model pose IS world->vehicle), unlike CARLA where the canonical frame
    # is the frame-0 placement — the test protocol's bbox math branches on
    # this (apps/test_protocol.py)
    bbox_rebase_frame0 = False

    def bbox_local_vertices(self) -> np.ndarray:
        """[K, 8, 3] canonical-frame bbox corners of the analytic vehicles
        (counterpart of CarlaScene.bbox_local_vertices): the sigma = 1
        iso-extent of the super-Gaussian 80 * exp(-q/2),
        q = sum((p / scales)^4) -> half-extent = scales * (2 ln 80)^(1/4)."""
        ext = (np.array([0.45, 0.18, 0.22], np.float32)
               * (2.0 * np.log(80.0)) ** 0.25)
        corners = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            np.float32)
        K = self.scene.num_vehicles
        return np.broadcast_to(corners * ext, (K, 8, 3)).copy()

    def gt_vehicle_poses(self) -> np.ndarray:
        """[K, F, 4, 4] world->vehicle GT pose matrices (counterpart of
        CarlaScene.gt_vehicle_poses; here identical to the relative-pose
        convention since the canonical frame is the vehicle frame)."""
        from scipy.spatial.transform import Rotation

        K, F = self.scene.num_vehicles, self.scene.num_frames
        out = np.zeros((K, F, 4, 4), np.float32)
        for k in range(K):
            for f in range(F):
                p = self.scene.gt_relative_pose(f, k)
                out[k, f, :3, :3] = Rotation.from_quat(p[3:]).as_matrix()
                out[k, f, :3, 3] = p[:3]
                out[k, f, 3, 3] = 1.0
        return out

    def gt_relative_poses(self):
        # [K, F, 7] to match CarlaScene's convention
        return np.swapaxes(self.data["gt_relative_poses"], 0, 1)

    def noisy_gt_relative_poses(self, rng):
        from ..ops import lie
        import jax.numpy as jnp

        gt = self.gt_relative_poses()  # [K, F, 7]
        tau = rng.normal(size=gt.shape[:-1] + (6,)).astype(np.float32) * 0.05
        tau[:, 0] = 0.0
        noisy = lie.se3_multiply(jnp.asarray(gt), lie.se3_exp(jnp.asarray(tau)))
        return np.asarray(noisy)


def sample_ray_batch(rng, data, n_rand: int, frame: int, car_sample_ratio: float = 0.0,
                     view_range=None):
    """Random ray minibatch from one frame across all views (the reference's
    pseudo-epoch sampling, datasets/carla_star_app_init.py); a
    car_sample_ratio fraction of rays is drawn from vehicle pixels
    (datasets/carla_star_online__.py:313-350). view_range=(lo, hi) restricts
    to that view subset."""
    V, F, H, W, _ = data["images"].shape
    vlo, vhi = view_range or (0, V)
    v = rng.integers(vlo, vhi, size=n_rand)
    y = rng.integers(0, H, size=n_rand)
    x = rng.integers(0, W, size=n_rand)
    n_car = int(n_rand * car_sample_ratio)
    if n_car > 0:
        cv, cy, cx = np.nonzero(data["dyn_masks"][vlo:vhi, frame])
        if len(cv):
            idx = rng.integers(0, len(cv), size=n_car)
            v[:n_car], y[:n_car], x[:n_car] = cv[idx] + vlo, cy[idx], cx[idx]
    return {
        "rays_o": data["rays_o"][v, y, x],
        "rays_d": data["rays_d"][v, y, x],
        "target": data["images"][v, frame, y, x],
        "target_depth": data["depths"][v, frame, y, x],
        "frame": np.int32(frame),
    }
