"""Time-conditioned NeRF baseline: the no-decomposition model STaR is
compared against. Feeds normalized frame time as a 4th input coordinate.

Counterpart of the reference models/nerf_time.py (NerfTime) and the
render_nerf_time orchestrator (models/rendering__.py:152-184).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..ops.compositing import raw2outputs
from ..ops.sampling import stratified_z_vals, pts_from_z, hierarchical_z_vals
from .fields import FieldConfig, init_field, apply_field
from .star import StarConfig

Params = Dict[str, Any]


def _time_field_cfg(cfg: StarConfig, fine: bool) -> FieldConfig:
    base = cfg.static_field(fine)
    return dataclasses.replace(base, input_dims=4)


def init_nerf_time(key, cfg: StarConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "coarse": init_field(k1, _time_field_cfg(cfg, False)),
        "fine": init_field(k2, _time_field_cfg(cfg, True)),
    }


def render_nerf_time(
    params: Params,
    cfg: StarConfig,
    rays_o,
    rays_d,
    frame,
    num_frames: int,
    key=None,
    train: bool = True,
):
    """Coarse -> importance -> fine render with time conditioning.

    `frame` is a traced integer scalar; time = frame / (num_frames - 1)
    (reference models/nerf_time.py:96).
    """
    import chex

    n_rays = rays_o.shape[0]
    chex.assert_shape(rays_o, (n_rays, 3))
    chex.assert_shape(rays_d, (n_rays, 3))
    time = jnp.asarray(frame, jnp.float32) / (num_frames - 1)

    if key is not None:
        k_strat, k_pdf = jax.random.split(key)
    else:
        k_strat = k_pdf = None

    z_vals = stratified_z_vals(
        k_strat if train else None, n_rays, cfg.near, cfg.far, cfg.n_samples,
        lindisp=cfg.lindisp, perturb=cfg.perturb if train else 0.0,
    )
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = pts_from_z(rays_o, rays_d, z_vals)

    raw_alpha, raw_rgb = apply_field(
        params["coarse"], _time_field_cfg(cfg, False), pts, viewdirs, time=time
    )
    result_coarse = raw2outputs(
        raw_alpha, raw_rgb, z_vals, rays_d,
        white_bkgd=cfg.white_bkgd, far_dist=cfg.far_dist,
    )
    result = {f"{k}0": v for k, v in result_coarse.items()}

    if cfg.n_importance > 0:
        z_union, z_samples = hierarchical_z_vals(
            k_pdf if train else None, z_vals, result_coarse["weights"],
            cfg.n_importance, det=not train,
            stratified=cfg.stratified_fine,
        )
        pts_fine = pts_from_z(rays_o, rays_d, z_union)
        raw_alpha_f, raw_rgb_f = apply_field(
            params["fine"], _time_field_cfg(cfg, True), pts_fine, viewdirs, time=time
        )
        result.update(
            raw2outputs(
                raw_alpha_f, raw_rgb_f, z_union, rays_d,
                white_bkgd=cfg.white_bkgd, far_dist=cfg.far_dist,
            )
        )
        result["z_std"] = jnp.std(z_samples, axis=-1)

    return result
