"""Tiled full-frame rendering for validation/test.

Counterpart of the reference's chunked eval forward (chunk=8192 rays,
train_online__.py:488-652) — but the tile size here is a *throughput* choice,
not a memory workaround: each tile is one jitted call with static shapes, and
with a device mesh the tile's ray axis is sharded so a full frame renders
across all chips (the reference is strictly single-GPU).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import lru_cache

from ..models.star import StarConfig, render_star
from ..parallel import mesh as meshlib


@lru_cache(maxsize=32)
def _tile_renderer(cfg: StarConfig, with_test_outputs: bool, has_pose: bool):
    """Jitted tile renderer cached per (config, mode) — defining the jit
    inside render_image would retrace and recompile on every call."""

    def tile_render(params, o, d, pose):
        return render_star(
            params, cfg, o, d, key=None, pose=pose, train=False,
            with_test_outputs=with_test_outputs,
        )

    return jax.jit(tile_render)


DEFAULT_KEYS = ("rgb", "depth", "rgb0", "depth0", "rgb_static", "rgb_dynamic",
                "depth_static", "depth_dynamic", "dynamic_transmittance",
                "rgb_dynamic_all", "acc", "disp")


def _render_tiles(tile_render, params, rays_o, rays_d, pose, tile, keys, mesh):
    """Shared tiling loop: render H*W rays in fixed-size tiles with one
    batched device->host transfer per tile (per-key fetches each pay the full
    relay round trip on tunneled backends)."""
    H, W = rays_o.shape[:2]
    n = H * W
    ro = np.asarray(rays_o).reshape(n, 3)
    rd = np.asarray(rays_d).reshape(n, 3)

    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        pad = n_pad - n
        ro = np.concatenate([ro, np.repeat(ro[-1:], pad, 0)], axis=0)
        rd = np.concatenate([rd, np.repeat(rd[-1:], pad, 0)], axis=0)

    chunks: Dict[str, list] = {}
    for i in range(0, n_pad, tile):
        o = jnp.asarray(ro[i : i + tile])
        d = jnp.asarray(rd[i : i + tile])
        if mesh is not None:
            sh = meshlib.batch_sharding(mesh)
            o = jax.device_put(o, sh)
            d = jax.device_put(d, sh)
        out = tile_render(params, o, d, pose)
        host_out = jax.device_get(
            {k: out[k] for k in keys if k in out and out[k] is not None}
        )
        for k, v in host_out.items():
            chunks.setdefault(k, []).append(v)

    result = {}
    for k, parts in chunks.items():
        arr = np.concatenate(parts, axis=0)[:n]
        result[k] = arr.reshape((H, W) + arr.shape[1:])
    return result


def render_image(
    params,
    cfg: StarConfig,
    rays_o,
    rays_d,
    pose=None,
    tile: int = 8192,
    mesh=None,
    with_test_outputs: bool = False,
    keys=DEFAULT_KEYS,
) -> Dict[str, np.ndarray]:
    """Render H*W rays in fixed-size tiles; returns host arrays [H, W, ...].

    rays_o/rays_d: [H, W, 3]. Missing keys (e.g. dynamic maps in appearance
    init) are skipped.
    """
    tile_render = _tile_renderer(cfg, with_test_outputs, pose is not None)
    return _render_tiles(tile_render, params, rays_o, rays_d, pose, tile, keys, mesh)


@lru_cache(maxsize=32)
def _nerf_time_tile_renderer(cfg, num_frames: int):
    from ..models.nerf_time import render_nerf_time

    def tile_render(params, o, d, frame):
        return render_nerf_time(
            params, cfg, o, d, frame=frame, num_frames=num_frames,
            key=None, train=False,
        )

    return jax.jit(tile_render)


def render_image_nerf_time(
    params,
    cfg: StarConfig,
    rays_o,
    rays_d,
    frame,
    num_frames: int,
    tile: int = 8192,
    mesh=None,
    keys=DEFAULT_KEYS,
) -> Dict[str, np.ndarray]:
    """render_image for the time-conditioned baseline (reference
    train_nerf_time.py val/test renders); `frame` is a traced scalar so all
    frames share one compiled graph."""
    tile_render = _nerf_time_tile_renderer(cfg, num_frames)
    return _render_tiles(
        tile_render, params, rays_o, rays_d, jnp.asarray(frame), tile, keys, mesh
    )


@lru_cache(maxsize=32)
def _mip_tile_renderer(cfg, with_test_outputs: bool):
    from ..models.mip import render_star_mip

    def tile_render(params, o, d, pose):
        return render_star_mip(
            params, cfg, o, d, key=None, pose=pose, train=False,
            with_test_outputs=with_test_outputs,
        )

    return jax.jit(tile_render)


def render_image_mip(
    params,
    cfg,
    rays_o,
    rays_d,
    pose=None,
    tile: int = 8192,
    mesh=None,
    with_test_outputs: bool = False,
    keys=DEFAULT_KEYS,
) -> Dict[str, np.ndarray]:
    """render_image for the mip (IPE) variant; cfg is a models.mip.MipConfig
    (counterpart of the reference's mip eval render, train_online_mip.py)."""
    tile_render = _mip_tile_renderer(cfg, with_test_outputs)
    return _render_tiles(tile_render, params, rays_o, rays_d, pose, tile, keys, mesh)
