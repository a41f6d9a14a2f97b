"""Visualization helpers: depth colormaps, value overlays, static/dynamic
composition, projected 3D bounding boxes.

Counterpart of the reference utils/visualization.py (visualize_depth with a
JET colormap, visualize_depth_with_values) and the bbox projection drawing in
utils/logging__.py:204-280. Host-side numpy/cv2, eval-only.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _jet(x: np.ndarray) -> np.ndarray:
    """JET colormap on [0,1] values -> [..., 3] RGB in [0,1] (no cv2 needed)."""
    x = np.clip(x, 0.0, 1.0)
    four = 4.0 * x
    r = np.clip(np.minimum(four - 1.5, -four + 4.5), 0, 1)
    g = np.clip(np.minimum(four - 0.5, -four + 3.5), 0, 1)
    b = np.clip(np.minimum(four + 0.5, -four + 2.5), 0, 1)
    return np.stack([r, g, b], axis=-1)


def visualize_depth(depth: np.ndarray, near: Optional[float] = None, far: Optional[float] = None):
    """Depth [H, W] (or [K, H, W] batched per vehicle) -> JET RGB, normalized
    per image like the reference (utils/visualization.py:12-57)."""
    depth = np.asarray(depth, np.float32)
    if depth.ndim == 3:
        return np.stack([visualize_depth(d, near, far) for d in depth])
    lo = np.min(depth) if near is None else near
    hi = np.max(depth) if far is None else far
    x = (depth - lo) / max(hi - lo, 1e-8)
    return _jet(x)


def visualize_depth_with_values(depth: np.ndarray, grid: int = 8):
    """Numeric depth overlay grid (reference utils/visualization.py:60-93):
    the depth colormap annotated with sampled values via cv2.putText."""
    img = (visualize_depth(depth) * 255).astype(np.uint8).copy()
    try:
        import cv2
    except ImportError:
        return img
    H, W = depth.shape
    for gy in range(grid):
        for gx in range(grid):
            y = int((gy + 0.5) * H / grid)
            x = int((gx + 0.5) * W / grid)
            cv2.putText(
                img, f"{depth[y, x]:.2f}", (x, y), cv2.FONT_HERSHEY_PLAIN,
                0.6, (255, 255, 255), 1,
            )
    return img


def compose_static_dynamic(rgb_static: np.ndarray, rgb_dynamic: np.ndarray):
    """Side-by-side composition panel (reference utils/visualization.py:97-105)."""
    rows = [np.asarray(rgb_static)]
    rgb_dynamic = np.asarray(rgb_dynamic)
    if rgb_dynamic.ndim == 4:  # [K, H, W, 3]
        rows.extend(list(rgb_dynamic))
    else:
        rows.append(rgb_dynamic)
    return np.concatenate(rows, axis=1)


def project_points(pts_world: np.ndarray, K: np.ndarray, w2c: np.ndarray):
    """World points [N, 3] -> pixel coords [N, 2] with intrinsics K and
    world-to-camera w2c (reference get_image_point, utils/logging__.py:204-223).
    Camera follows the NeRF convention (x right, y up, -z forward)."""
    homog = np.concatenate([pts_world, np.ones((pts_world.shape[0], 1))], axis=-1)
    cam = (w2c @ homog.T).T[:, :3]
    # NeRF cam -> pinhole: flip y and z
    x = cam[:, 0] / np.maximum(-cam[:, 2], 1e-8) * K[0, 0] + K[0, 2]
    y = -cam[:, 1] / np.maximum(-cam[:, 2], 1e-8) * K[1, 1] + K[1, 2]
    return np.stack([x, y], axis=-1)


_BOX_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),
    (4, 5), (4, 6), (5, 7), (6, 7),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def draw_box(img: np.ndarray, corners_px: np.ndarray, color=(0, 255, 0)):
    """Draw a projected 3D box wireframe onto an image (uint8, HxWx3),
    corners in the (-,+)^3 binary order used by eval.iou tests."""
    try:
        import cv2
    except ImportError:
        return img
    img = np.ascontiguousarray(img)
    for a, b in _BOX_EDGES:
        pa = tuple(np.round(corners_px[a]).astype(int))
        pb = tuple(np.round(corners_px[b]).astype(int))
        cv2.line(img, pa, pb, color, 1)
    return img
