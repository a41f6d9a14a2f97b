"""Occupancy-grid STaR: a static + dynamic radiance-field pair rendered with
empty-space-skipped marching.

TPU-native counterpart of the reference's nerfacc STaR variant
(models/star_nerfacc.py:23-166): one static and one dynamic field of equal
depth (unlike the main STaR's half-depth dynamic fields), a single rigid pose
warping sample points into the dynamic field's canonical frame, and the joint
raw2outputs_star compositing. The CUDA OccGridEstimator sampling becomes the
mask-compaction march in kernels/occgrid.py; invalid (empty-space) slots
composite with alpha 0, so results equal dense marching over occupied space.

Generalizes the reference in two ways that come free in this design: the pose
may cover K vehicles ([K, 7], vmapped like models/star.py), and the occupancy
grid is updated from the *joint* density so dynamic geometry also carves
occupancy.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import chex
import jax
import jax.numpy as jnp

from ..kernels import occgrid
from ..ops.compositing import raw2outputs, raw2outputs_star
from .fields import FieldConfig, init_field, init_stacked_fields, apply_field, apply_stacked_fields
from .star import StarConfig, warp_to_vehicle_frames

Params = Dict[str, Any]


def _pair_field_cfg(cfg: StarConfig) -> FieldConfig:
    # Equal-depth static/dynamic pair (star_nerfacc.py:42-43 uses the same
    # VanillaNeRFRadianceField architecture for both).
    return cfg.static_field()


def init_star_occgrid(key, cfg: StarConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "static": init_field(k1, _pair_field_cfg(cfg)),
        "dynamic": init_stacked_fields(k2, _pair_field_cfg(cfg), cfg.num_vehicles),
    }


def joint_density_fn(params: Params, cfg: StarConfig, pose: Optional[jnp.ndarray]):
    """World-space density of static + pose-warped dynamic fields, for
    occupancy-grid updates (the occ_eval_fn role, train_app_init_nerfacc.py:72-77)."""
    fcfg = _pair_field_cfg(cfg)

    def fn(pts):  # [N, 3] -> [N]
        dirs = jnp.broadcast_to(jnp.asarray([[0.0, 0.0, -1.0]], pts.dtype), (pts.shape[0], 3))
        raw_s, _ = apply_field(params["static"], fcfg, pts[:, None, :], dirs)
        sigma = jax.nn.softplus(raw_s[:, 0])
        if pose is not None:
            pts_dyn, dirs_dyn = warp_to_vehicle_frames(pose, pts[:, None, :], dirs)
            raw_d, _ = apply_stacked_fields(params["dynamic"], fcfg, pts_dyn, dirs_dyn)
            sigma = sigma + jnp.sum(jax.nn.softplus(raw_d[:, :, 0]), axis=0)
        return sigma

    return fn


def render_star_occgrid(
    params: Params,
    cfg: StarConfig,
    grid: Dict[str, Any],
    occ_cfg: occgrid.OccGridConfig,
    rays_o,
    rays_d,
    pose=None,
    key=None,
    with_test_outputs: bool = False,
):
    """Occupancy-skipped render of the static+dynamic pair.

    pose=None is the appearance-init path (static only, raw2outputs);
    otherwise pose is [K, 7] and the pair composites under the joint
    transmittance (star_nerfacc.py:112-166 forward_chunk).
    """
    n_rays = rays_o.shape[0]
    chex.assert_shape(rays_o, (n_rays, 3))
    chex.assert_shape(rays_d, (n_rays, 3))
    if pose is not None:
        chex.assert_shape(pose, (cfg.num_vehicles, 7))

    z_sel, valid, n_occ = occgrid.march_and_select(
        grid, occ_cfg, rays_o, rays_d, cfg.near, cfg.far, key=key
    )
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_sel[..., None]

    fcfg = _pair_field_cfg(cfg)
    raw_alpha_s, raw_rgb_s = apply_field(params["static"], fcfg, pts, viewdirs)
    raw_alpha_s = occgrid.masked_raw_alpha(raw_alpha_s, valid)

    if pose is None:
        out = raw2outputs(
            raw_alpha_s, raw_rgb_s, z_sel, rays_d,
            white_bkgd=cfg.white_bkgd, far_dist=cfg.far_dist,
        )
    else:
        pts_dyn, dirs_dyn = warp_to_vehicle_frames(pose, pts, viewdirs)
        raw_alpha_d, raw_rgb_d = apply_stacked_fields(params["dynamic"], fcfg, pts_dyn, dirs_dyn)
        raw_alpha_d = occgrid.masked_raw_alpha(raw_alpha_d, valid[None, :, :])  # [K, R, S]
        out = raw2outputs_star(
            raw_alpha_s,
            raw_rgb_s,
            jnp.moveaxis(raw_alpha_d, 0, 1),  # [R, K, S]
            jnp.moveaxis(raw_rgb_d, 0, 1),  # [R, K, S, 3]
            z_sel,
            rays_d,
            white_bkgd=cfg.white_bkgd,
            far_dist=cfg.far_dist,
            with_test_outputs=with_test_outputs,
            reference_numerics=cfg.reference_numerics,
        )
    out["n_occupied"] = n_occ
    out["valid"] = valid
    return out
