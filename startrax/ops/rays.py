"""Pinhole-camera ray generation (NeRF convention: x right, y up, -z forward).

TPU-native counterpart of the reference's get_rays / get_rays_np
(models/rendering__.py:41-71). The jnp variant is jittable; the numpy variant
is for host-side data pipelines that precompute ray grids per view.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_rays(H: int, W: int, K, c2w):
    """Per-pixel ray origins/directions for an HxW image.

    K: [3,3] intrinsics; c2w: [3,4] or [4,4] camera-to-world.
    Returns rays_o, rays_d each [H, W, 3].
    """
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    dirs = jnp.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -jnp.ones_like(i)], -1
    )
    rays_d = jnp.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def get_rays_np(H: int, W: int, K, c2w):
    """Numpy twin of get_rays for host data pipelines."""
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    dirs = np.stack(
        [(i - K[0][2]) / K[0][0], -(j - K[1][2]) / K[1][1], -np.ones_like(i)], -1
    )
    rays_d = np.einsum("hwc,rc->hwr", dirs, c2w[:3, :3])
    rays_o = np.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def focal_from_fov(W: int, fov_deg: float) -> float:
    """Focal length from horizontal field of view in degrees."""
    return W / (2.0 * np.tan(fov_deg * np.pi / 360.0))


def intrinsics_matrix(H: int, W: int, focal: float) -> np.ndarray:
    return np.array(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], dtype=np.float32
    )
