"""The STaR network: one static radiance field + K rigid dynamic fields,
composited under a joint transmittance, with differentiable SE(3) pose warps.

TPU-native counterpart of the reference models/star__.py and the render
orchestrators in models/rendering__.py:115-298. Key re-designs:

- no ray `chunk` loop (star__.py:84-100): the whole ray batch is resident in
  HBM and evaluated in one jitted graph; large eval renders tile instead
  (eval/render.py),
- the K-vehicle loop (star__.py:207-210) is jax.vmap over stacked params,
- the pose warp (star__.py:187-199: pp.SE3(pose).Act) is ops.lie.se3_act —
  pure XLA, so pose gradients flow photometric-loss -> compositing -> field
  inputs -> quaternion parameters under jax.grad.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.compositing import raw2outputs, raw2outputs_star
from ..ops.sampling import (
    stratified_z_vals,
    pts_from_z,
    pts_from_z_t,
    hierarchical_z_vals,
)
from .fields import (
    FieldConfig,
    init_field,
    apply_field,
    apply_field_t,
    init_stacked_fields,
    apply_stacked_fields,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class StarConfig:
    """Model + rendering configuration (mirrors the reference config flags)."""

    num_vehicles: int = 1
    netdepth: int = 8
    netdepth_fine: int = 8
    netwidth: int = 256
    netwidth_fine: int = 256
    multires: int = 10
    multires_views: int = 4
    n_samples: int = 256
    n_importance: int = 256
    near: float = 3.0
    far: float = 80.0
    far_dist: float = 1e10
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    lindisp: bool = False
    perturb: float = 1.0
    end_barf: int = -1
    compute_dtype: Any = jnp.bfloat16
    use_fused: Any = None  # None = auto (fused Pallas MLP on TPU)
    # Sum pre-activation raw densities before softplus for the joint alpha,
    # exactly as the reference does (rendering__.py:416-418), instead of the
    # default post-softplus density sum. A/B lever for parity studies.
    reference_numerics: bool = False
    # Draw importance samples from stratified ascending u (mip-NeRF style;
    # enables the bitonic-merge z-union) instead of the reference's iid
    # uniforms (rendering__.py:738). Decoupled from reference_numerics so the
    # sampling and compositing conventions can be attributed independently.
    stratified_fine: bool = True

    def static_field(self, fine: bool = False) -> FieldConfig:
        return FieldConfig(
            depth=self.netdepth_fine if fine else self.netdepth,
            width=self.netwidth_fine if fine else self.netwidth,
            multires=self.multires,
            multires_views=self.multires_views,
            end_barf=self.end_barf,
            compute_dtype=self.compute_dtype,
            use_fused=self.use_fused,
        )

    def dynamic_field(self, fine: bool = False) -> FieldConfig:
        # Dynamic fields are half-depth (reference star__.py:41-57).
        cfg = self.static_field(fine)
        return dataclasses.replace(cfg, depth=cfg.depth // 2)


def init_star(key, cfg: StarConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params: Params = {
        "static_coarse": init_field(k1, cfg.static_field()),
        "dynamic_coarse": init_stacked_fields(k3, cfg.dynamic_field(), cfg.num_vehicles),
    }
    if cfg.n_importance > 0:
        params["static_fine"] = init_field(k2, cfg.static_field(fine=True))
        params["dynamic_fine"] = init_stacked_fields(
            k4, cfg.dynamic_field(fine=True), cfg.num_vehicles
        )
    return params


def warp_to_vehicle_frames(pose, pts, viewdirs):
    """Transform world-frame sample points and view directions into each
    vehicle's canonical frame.

    pose: [K, 7] SE(3) 7-vecs shared by all rays, or [R, K, 7] per-ray poses
    (mixed-frame batches: every ray may come from a different frame, so every
    frame's pose receives gradient every step — a TPU-batch-size capability
    the reference's one-frame-per-batch sampling doesn't have).
    pts: [R, S, 3]; viewdirs: [R, 3].
    Returns pts_dyn [K, R, S, 3], viewdirs_dyn [K, R, 3].
    """
    if pose.ndim == 3:  # [R, K, 7] -> [K, R, 7]
        pose = jnp.moveaxis(pose, 0, 1)
        pts_dyn = lie.se3_act(pose[:, :, None, :], pts[None])
        dirs_dyn = lie.so3_act(pose[:, :, 3:7], viewdirs[None])
    else:
        pts_dyn = lie.se3_act(pose[:, None, None, :], pts[None])
        dirs_dyn = lie.so3_act(pose[:, None, 3:7], viewdirs[None])
    return pts_dyn, dirs_dyn


def _use_kernel_warp(dyn_cfg, pose) -> bool:
    """In-kernel SE(3) warp applies to shared-pose ([K, 7]) batches on the
    fused raw-pts path; per-ray mixed-frame poses keep the XLA warp."""
    import os

    from .fields import _resolve_use_fused

    if os.environ.get("STARTRAX_KERNEL_WARP", "1") != "1":
        return False
    return pose.ndim == 2 and dyn_cfg.input_dims == 3 and _resolve_use_fused(dyn_cfg)


def pack_warp(pose7):
    """SE(3) 7-vec -> packed [16] kernel warp (M row-major, t, zero pad)."""
    M = lie.quat_to_matrix(pose7[3:7])
    return jnp.concatenate([M.reshape(9), pose7[:3], jnp.zeros(4, pose7.dtype)])


def _apply_dynamic_warped(params, cfg, pose, pts, viewdirs, step):
    """Evaluate K dynamic fields on world pts with per-vehicle in-kernel
    warps. Returns ([K, R, S], [K, R, S, 3]) matching apply_stacked_fields."""
    outs = []
    for k in range(pose.shape[0]):
        p_k = jax.tree.map(lambda x, k=k: x[k], params)
        outs.append(
            apply_field(p_k, cfg, pts, viewdirs, step=step,
                        warp=pack_warp(pose[k]), input_grads=False)
        )
    return jnp.stack([o[0] for o in outs]), jnp.stack([o[1] for o in outs])


def _apply_dynamic_warped_t(params, cfg, pose, pts_t, viewdirs_t, step):
    """Channel-leading twin of _apply_dynamic_warped: pts_t [3, R, S],
    viewdirs_t [3, R] -> ([K, R, S], [K, 3, R, S])."""
    outs = []
    for k in range(pose.shape[0]):
        p_k = jax.tree.map(lambda x, k=k: x[k], params)
        outs.append(
            apply_field_t(p_k, cfg, pts_t, viewdirs_t, step=step,
                          warp=pack_warp(pose[k]))
        )
    return jnp.stack([o[0] for o in outs]), jnp.stack([o[1] for o in outs])


# Channel-leading (transposed) renderer I/O: points/dirs/rgb travel as
# [3, ...] arrays end-to-end (ops/sampling.pts_from_z_t -> fused kernel io_t
# -> compositing rgb_t), so no lane-padded [N, 3/4] f32 array exists in HBM
# between ray generation and compositing (BENCH_NOTES r4 attributed ~24 ms
# of the 100.7 ms flagship step to exactly those layouts). Env-gated for
# A/B: STARTRAX_IO_T=0 restores the legacy layout.
_IO_T = __import__("os").environ.get("STARTRAX_IO_T", "1") == "1"


def _use_io_t(cfg: StarConfig, pose) -> bool:
    """io_t needs every field eval on the fused raw-pts path: the static
    field always qualifies when fused; dynamics need the in-kernel warp
    (shared-pose batches). Mixed-frame (per-ray pose) batches keep the XLA
    warp and the legacy layout."""
    from .fields import _resolve_use_fused

    if not _IO_T or not _resolve_use_fused(cfg.static_field()):
        return False
    if pose is None:
        return True
    return _use_kernel_warp(cfg.dynamic_field(), pose)


def apply_star(
    params: Params,
    cfg: StarConfig,
    pts,
    viewdirs,
    z_vals,
    rays_d,
    pose=None,
    is_coarse: bool = True,
    step=None,
    noise_key=None,
    with_test_outputs: bool = False,
    io_t: bool = False,
):
    """One coarse or fine pass (reference star__.py:118-225 forward_chunk).

    pose=None is the appearance-init path (static field only); otherwise pose
    is [K, 7] and the static + K dynamic fields composite jointly.

    io_t=True: pts is CHANNEL-LEADING [3, R, S] and viewdirs is [3, R] (the
    fused kernel's lane-dense layout; see _use_io_t). Output dict shapes are
    identical either way.
    """
    static_params = params["static_coarse"] if is_coarse else params["static_fine"]
    static_cfg = cfg.static_field(fine=not is_coarse)

    if io_t:
        raw_alpha_s, raw_rgb_s = apply_field_t(static_params, static_cfg,
                                               pts, viewdirs, step=None)
    else:
        raw_alpha_s, raw_rgb_s = apply_field(static_params, static_cfg, pts,
                                             viewdirs, step=None,
                                             input_grads=False)

    noise = None
    if noise_key is not None and cfg.raw_noise_std > 0:
        noise = cfg.raw_noise_std * jax.random.normal(noise_key, raw_alpha_s.shape)

    if pose is None:
        return raw2outputs(
            raw_alpha_s,
            raw_rgb_s,
            z_vals,
            rays_d,
            noise=noise,
            white_bkgd=cfg.white_bkgd,
            far_dist=cfg.far_dist,
            rgb_t=io_t,
        )

    dyn_params = params["dynamic_coarse"] if is_coarse else params["dynamic_fine"]
    dyn_cfg = cfg.dynamic_field(fine=not is_coarse)

    if io_t:
        # io_t implies the in-kernel warp (see _use_io_t): the SE(3) warp
        # runs inside the Pallas kernel and every rgb raster stays
        # channel-leading into compositing
        raw_alpha_d, raw_rgb_d = _apply_dynamic_warped_t(
            dyn_params, dyn_cfg, pose, pts, viewdirs, step
        )
        raw_alpha_d = jnp.moveaxis(raw_alpha_d, 0, 1)  # [R, K, S]
        raw_rgb_d = jnp.moveaxis(raw_rgb_d, 0, 2)  # [K,3,R,S] -> [3,R,K,S]
    else:
        if _use_kernel_warp(dyn_cfg, pose):
            # shared-pose batches on the fused path: the SE(3) warp runs
            # inside the Pallas kernel (packed [16] SMEM operand) — the
            # [K, R, S, 3] vehicle-frame point/dir arrays never exist in HBM
            raw_alpha_d, raw_rgb_d = _apply_dynamic_warped(
                dyn_params, dyn_cfg, pose, pts, viewdirs, step
            )
        else:
            pts_dyn, dirs_dyn = warp_to_vehicle_frames(pose, pts, viewdirs)
            raw_alpha_d, raw_rgb_d = apply_stacked_fields(
                dyn_params, dyn_cfg, pts_dyn, dirs_dyn, step=step
            )
        raw_alpha_d = jnp.moveaxis(raw_alpha_d, 0, 1)  # [R, K, S]
        raw_rgb_d = jnp.moveaxis(raw_rgb_d, 0, 1)  # [R, K, S, 3]

    # Density noise is used only during appearance init (star__.py:219-222).
    return raw2outputs_star(
        raw_alpha_s,
        raw_rgb_s,
        raw_alpha_d,
        raw_rgb_d,
        z_vals,
        rays_d,
        noise=None,
        white_bkgd=cfg.white_bkgd,
        far_dist=cfg.far_dist,
        with_test_outputs=with_test_outputs,
        reference_numerics=cfg.reference_numerics,
        rgb_t=io_t,
    )


def render_star(
    params: Params,
    cfg: StarConfig,
    rays_o,
    rays_d,
    key=None,
    pose=None,
    train: bool = True,
    step=None,
    with_test_outputs: bool = False,
):
    """Full coarse -> importance-resample -> fine render of a ray batch.

    Covers both reference orchestrators: render_star_appinit (pose=None,
    rendering__.py:115-149) and render_star_online (rendering__.py:249-298).
    Coarse outputs get a "0" suffix; fine outputs keep bare names; adds z_std.
    """
    import chex

    n_rays = rays_o.shape[0]
    chex.assert_shape(rays_o, (n_rays, 3))
    chex.assert_shape(rays_d, (n_rays, 3))
    if pose is not None:
        K = cfg.num_vehicles
        if pose.ndim == 3:
            chex.assert_shape(pose, (n_rays, K, 7))  # per-ray mixed-frame poses
        else:
            chex.assert_shape(pose, (K, 7))
    if key is not None:
        k_strat, k_pdf, k_noise = jax.random.split(key, 3)
    else:
        k_strat = k_pdf = k_noise = None

    z_vals = stratified_z_vals(
        k_strat if train else None,
        n_rays,
        cfg.near,
        cfg.far,
        cfg.n_samples,
        lindisp=cfg.lindisp,
        perturb=cfg.perturb if train else 0.0,
    )
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    io_t = _use_io_t(cfg, pose)
    if io_t:
        # channel-leading path: pts/dirs/rgb travel [3, ...] end-to-end —
        # the only transposes are on tiny [R, 3] ray arrays here and [3, R]
        # maps in compositing; the big [R, S, 3] rasters never exist
        pts = pts_from_z_t(rays_o, rays_d, z_vals)
        viewdirs_in = viewdirs.T
    else:
        pts = pts_from_z(rays_o, rays_d, z_vals)
        viewdirs_in = viewdirs

    result_coarse = apply_star(
        params, cfg, pts, viewdirs_in, z_vals, rays_d,
        pose=pose, is_coarse=True, step=step,
        noise_key=k_noise if train else None,
        with_test_outputs=with_test_outputs,
        io_t=io_t,
    )
    result = {f"{k}0": v for k, v in result_coarse.items()}

    if cfg.n_importance > 0:
        z_union, z_samples = hierarchical_z_vals(
            k_pdf if train else None,
            z_vals,
            result_coarse["weights"],
            cfg.n_importance,
            det=not train,
            stratified=cfg.stratified_fine,
        )
        pts_fine = (pts_from_z_t if io_t else pts_from_z)(rays_o, rays_d, z_union)
        result_fine = apply_star(
            params, cfg, pts_fine, viewdirs_in, z_union, rays_d,
            pose=pose, is_coarse=False, step=step,
            noise_key=k_noise if train else None,
            with_test_outputs=with_test_outputs,
            io_t=io_t,
        )
        result.update(result_fine)
        result["z_std"] = jnp.std(z_samples, axis=-1)

    return result
