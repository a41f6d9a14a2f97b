"""Occupancy-grid accelerated ray marching (nerfacc OccGridEstimator
equivalent), designed for XLA/TPU: static shapes + mask compaction instead of
CUDA stream compaction.

Reference behavior being replaced (train_app_init_nerfacc.py:49-91,
models/rendering.old.py:1083-1181 render_image_with_occgrid):
- a res^3 occupancy grid over the scene AABB, EMA-updated from field density
  (occ_eval_fn = density * render_step_size, threshold occ_thre=1e-2),
- ray marching samples only occupied cells (variable per ray in CUDA).

TPU redesign:
- the grid is a dense [res, res, res] f32 EMA + bool occupancy in HBM,
- updates subsample cells with jittered positions (like nerfacc's
  every-n-steps partial updates) — one fused-MLP density eval,
- marching is a *fixed* n_march-step traversal; per-sample occupancy is a
  gather from the grid; per ray the occupied samples are compacted to the
  front by a stable argsort on the mask and truncated to a fixed budget
  n_selected. Invalid slots render with sigma = -inf (alpha 0), so
  compositing stays exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OccGridConfig:
    resolution: int = 128
    aabb_min: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    aabb_max: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    occ_threshold: float = 1e-2  # on density * step_size
    ema_decay: float = 0.95
    update_fraction: float = 0.25  # fraction of cells refreshed per update
    render_step_size: float = 5e-3
    n_march: int = 512  # dense march steps per ray
    n_selected: int = 128  # post-compaction sample budget per ray


def init_grid(cfg: OccGridConfig) -> Dict[str, Any]:
    r = cfg.resolution
    return {
        "density_ema": jnp.zeros((r, r, r), jnp.float32),
        "step": jnp.asarray(0, jnp.int32),
    }


def _cell_centers(cfg: OccGridConfig):
    r = cfg.resolution
    lo = jnp.asarray(cfg.aabb_min)
    hi = jnp.asarray(cfg.aabb_max)
    idx = (jnp.arange(r) + 0.5) / r
    gx, gy, gz = jnp.meshgrid(idx, idx, idx, indexing="ij")
    frac = jnp.stack([gx, gy, gz], axis=-1)  # [r,r,r,3]
    return lo + frac * (hi - lo)


def update_grid(
    grid: Dict[str, Any],
    density_fn: Callable,
    key,
    cfg: OccGridConfig,
) -> Dict[str, Any]:
    """EMA-update a random subset of cells from the field density.

    density_fn: pts [N, 3] -> density [N] (post-softplus). Mirrors nerfacc's
    update_every_n_steps with occ_eval_fn (train_app_init_nerfacc.py:72-77).
    """
    r = cfg.resolution
    k1, k2 = jax.random.split(key)
    centers = _cell_centers(cfg)  # [r,r,r,3]
    cell = (jnp.asarray(cfg.aabb_max) - jnp.asarray(cfg.aabb_min)) / r
    jitter = (jax.random.uniform(k1, centers.shape) - 0.5) * cell
    pts = (centers + jitter).reshape(-1, 3)

    density = density_fn(pts).reshape(r, r, r)
    # refresh a random subset (all cells on the first update); EMA elsewhere
    refresh = jax.random.uniform(k2, (r, r, r)) < cfg.update_fraction
    refresh = refresh | (grid["step"] == 0)
    ema = grid["density_ema"]
    new_ema = jnp.where(refresh, jnp.maximum(ema * cfg.ema_decay, density), ema)
    return {"density_ema": new_ema, "step": grid["step"] + 1}


def occupancy(grid: Dict[str, Any], cfg: OccGridConfig):
    occ = grid["density_ema"] * cfg.render_step_size > cfg.occ_threshold
    # an un-updated grid skips nothing (warmup semantics)
    return jnp.where(grid["step"] == 0, jnp.ones_like(occ), occ)


def _lookup(grid_occ, pts, cfg: OccGridConfig):
    """Occupancy at world points (points outside the AABB are unoccupied)."""
    lo = jnp.asarray(cfg.aabb_min)
    hi = jnp.asarray(cfg.aabb_max)
    frac = (pts - lo) / (hi - lo)
    inside = jnp.all((frac >= 0.0) & (frac < 1.0), axis=-1)
    idx = jnp.clip((frac * cfg.resolution).astype(jnp.int32), 0, cfg.resolution - 1)
    occ = grid_occ[idx[..., 0], idx[..., 1], idx[..., 2]]
    return occ & inside


def march_and_select(
    grid: Dict[str, Any],
    cfg: OccGridConfig,
    rays_o,
    rays_d,
    near: float,
    far: float,
    key=None,
):
    """Fixed-step march + occupied-sample compaction.

    Returns (z_sel [R, n_selected], valid [R, n_selected], n_occupied [R])
    sorted by depth: the first k slots per ray are its occupied samples in
    order; the rest are flagged invalid. n_occupied counts a ray's occupied
    march samples BEFORE truncation to the n_selected budget, so callers can
    monitor the dropped fraction (the reference instead resizes the ray batch
    to bound total samples, train_app_init_nerfacc.py:99-105 — shape-dynamic;
    here the budget is adapted between jit boundaries, see apps/occgrid_init).
    """
    R = rays_o.shape[0]
    t = jnp.linspace(0.0, 1.0, cfg.n_march)
    z = near * (1.0 - t) + far * t
    z = jnp.broadcast_to(z, (R, cfg.n_march))
    if key is not None:
        dz = (far - near) / cfg.n_march
        z = z + jax.random.uniform(key, z.shape) * dz

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    occ = _lookup(occupancy(grid, cfg), pts, cfg)  # [R, n_march] bool

    # stable compaction: occupied samples first, depth order preserved, so
    # z_sel is already ascending (valid block ascending, then `far` fill)
    order = jnp.argsort(~occ, axis=-1, stable=True)
    sel = order[:, : cfg.n_selected]
    z_sel = jnp.take_along_axis(z, sel, axis=-1)
    valid = jnp.take_along_axis(occ, sel, axis=-1)
    z_sel = jnp.where(valid, z_sel, far)
    return z_sel, valid, jnp.sum(occ, axis=-1)


def masked_raw_alpha(raw_alpha, valid):
    """Force alpha -> 0 on invalid (empty-space) slots before compositing."""
    return jnp.where(valid, raw_alpha, -1e9)
