"""Volume rendering: alpha compositing for a single field (NeRF) and the STaR
multi-field composition (one static field + K rigid dynamic fields sharing a
joint transmittance).

Pure-function counterpart of the reference raw2outputs / raw2outputs_star
(models/rendering__.py:301-576). Numerics match the reference in f32:
softplus-based alpha, 1e-10 transmittance guard, f32-eps clamps. The vehicle
axis is vectorized (the reference loops in Python, star__.py:207-210).
"""

from __future__ import annotations

import os
from typing import Optional

import chex
import jax
import jax.numpy as jnp

from ..constants import EPS, TRANS_EPS, DISP_EPS
from .regularizers import (
    alpha_entropy,
    dynamic_vs_static_reg,
    ray_reg,
    static_reg,
    dynamic_reg,
)


def raw2alpha(raw, dists):
    """alpha = 1 - exp(-softplus(raw) * dist)  (rendering__.py:301-303)."""
    return 1.0 - jnp.exp(-jax.nn.softplus(raw) * dists)


def _dists_from_z(z_vals, rays_d, far_dist):
    """Inter-sample distances with a far cap appended, scaled by |rays_d|."""
    d = z_vals[..., 1:] - z_vals[..., :-1]
    last = jnp.full_like(d[..., :1], far_dist)
    d = jnp.concatenate([d, last], axis=-1)
    return d * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)


# XLA lowers lax.cumprod on TPU to a log-step shifted-add decomposition whose
# pad/slice/broadcast glue shows up as measurable fusion time around the
# Pallas kernels (BENCH_NOTES round-3 trace: pad_add 5.2 ms + slices 3.5 ms +
# broadcasts 3.6 ms per step). The default transmittance therefore computes
# the exclusive cumulative product in log space with one strictly-lower-
# triangular matmul (cumsum-as-matmul rides the MXU; its backward — a reverse
# exclusive cumsum — is the transposed triangular matmul). Env-gated so the
# two implementations can be A/B'd: STARTRAX_MATMUL_CUMPROD=0 restores
# lax.cumprod.
_MATMUL_CUMPROD = os.environ.get("STARTRAX_MATMUL_CUMPROD", "1") == "1"


def _transmittance_cumprod(alpha):
    ones = jnp.ones_like(alpha[..., :1])
    return jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha + TRANS_EPS], axis=-1), axis=-1
    )[..., :-1]


def _transmittance_matmul(alpha):
    s = alpha.shape[-1]
    # tri[i, j] = 1 for j < i: row 0 is empty -> T_0 = exp(0) = 1 exactly.
    tri = jnp.tril(jnp.ones((s, s), jnp.float32), k=-1)
    # x must bottom out at exactly eps when alpha == 1. Writing it as
    # `1.0 - alpha + TRANS_EPS` is NOT safe under jit: XLA's algebraic
    # simplifier reassociates the two constants, folds 1.0 + 1e-10 to 1.0f,
    # and the saturated lanes become log(0) = -inf -> 0 * inf = NaN inside
    # the triangular matmul (jit-only; eager per-op compilation never fuses
    # the adds). The max() blocks that fold, and its subgradient at the tie
    # goes to the first operand, so d/dalpha stays -1 like the cumprod path.
    x = jnp.maximum(1.0 - alpha.astype(jnp.float32), 0.0) + TRANS_EPS
    logx = jnp.log(x)
    cs = jnp.einsum(
        "...s,is->...i", logx, tri, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.exp(cs).astype(alpha.dtype)


def _transmittance(alpha):
    """T_i = prod_{j<i} (1 - alpha_j + 1e-10) along the last axis."""
    if _MATMUL_CUMPROD:
        return _transmittance_matmul(alpha)
    return _transmittance_cumprod(alpha)


def raw2outputs(
    raw_alpha,
    raw_rgb,
    z_vals,
    rays_d,
    noise: Optional[jnp.ndarray] = None,
    white_bkgd: bool = False,
    far_dist: float = 1e10,
    rgb_t: bool = False,
):
    """Single-field alpha compositing.

    raw_alpha: [R, S], raw_rgb: [R, S, 3]. `noise` (same shape as raw_alpha)
    implements the training-time density noise; pass None for eval.
    Returns dict with rgb/disp/acc/weights/depth/dists/z_vals (reference
    rendering__.py:307-379).

    rgb_t=True takes raw_rgb CHANNEL-LEADING [3, R, S] (the fused kernel's
    io_t layout — lane-dense in HBM, unlike [R, S, 3] whose minor dim is
    lane-padded 3->128). All map outputs keep their legacy [R, 3] shapes;
    the only transposes happen on per-RAY maps ([3, R], trivially small).
    """
    # trace-time shape contract (reference models/types__.py enforces the
    # same at runtime with torchtyping+typeguard; chex is free under jit)
    R, S = raw_alpha.shape
    chex.assert_shape(raw_rgb, (3, R, S) if rgb_t else (R, S, 3))
    chex.assert_shape(z_vals, (R, S))
    chex.assert_shape(rays_d, (R, 3))
    dists = _dists_from_z(z_vals, rays_d, far_dist)
    rgb = jax.nn.sigmoid(raw_rgb)
    if noise is not None:
        raw_alpha = raw_alpha + noise

    alpha = raw2alpha(raw_alpha, dists)
    weights = alpha * _transmittance(alpha)

    if rgb_t:
        rgb_map = jnp.sum(weights[None] * rgb, axis=-1).T  # [3, R] -> [R, 3]
    else:
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    weights_sum = jnp.sum(weights, axis=-1)
    weights_sum = jnp.where(weights_sum >= 0, weights_sum, 1e-7)
    disp_map = 1.0 / jnp.maximum(DISP_EPS, depth_map / weights_sum)
    acc_map = jnp.sum(weights, axis=-1)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return {
        "rgb": rgb_map,
        "disp": disp_map,
        "acc": acc_map,
        "weights": weights,
        "depth": depth_map,
        "dists": dists,
        "z_vals": z_vals,
    }


def raw2outputs_star(
    raw_alpha_static,
    raw_rgb_static,
    raw_alpha_dynamic,
    raw_rgb_dynamic,
    z_vals,
    rays_d,
    noise: Optional[jnp.ndarray] = None,
    white_bkgd: bool = False,
    far_dist: float = 1e10,
    with_test_outputs: bool = False,
    reference_numerics: bool = False,
    rgb_t: bool = False,
):
    """STaR multi-field compositing under a joint transmittance.

    Shapes: raw_alpha_static [R, S]; raw_rgb_static [R, S, 3];
    raw_alpha_dynamic [R, K, S]; raw_rgb_dynamic [R, K, S, 3].

    rgb_t=True takes the rgb rasters CHANNEL-LEADING — raw_rgb_static
    [3, R, S], raw_rgb_dynamic [3, R, K, S] (the fused kernel's io_t
    layout): every big rgb-shaped intermediate then has the sample axis
    minor (lane-dense in HBM) instead of a lane-padded 3-wide minor. The
    result dict keeps its legacy shapes (rgb maps [R, 3] / [R, K, 3]);
    only tiny per-ray maps get transposed.

    alpha_total = 1 - exp(-(sigma_s + sum_k sigma_d^k) * dist) with
    sigma = softplus(raw), the shared transmittance T = cumprod(1 -
    alpha_total), and the color integrates T * (alpha_s * c_s + sum_k
    alpha_d^k * c_d^k) — reference rendering__.py:383-576. Also emits the five
    regularizer scalars and the per-vehicle final transmittance used for 2D
    IoU.

    Note: the reference sums *pre-activation* raw densities before the
    softplus (rendering__.py:416-418); we sum post-softplus densities, the
    physically consistent form (it makes an empty dynamic field reduce STaR
    compositing exactly to single-field compositing, and gives
    T == T_s * prod_k T_d^k up to the 1e-10 guard). Pass
    reference_numerics=True to reproduce the reference's pre-activation sum
    for the joint alpha (per-field alphas are identical in both conventions);
    tests/test_compositing.py quantifies the divergence.
    """
    # trace-time shape contract (the reference enforces this at runtime with
    # torchtyping+typeguard, models/types__.py; chex asserts are free under jit)
    R, S = raw_alpha_static.shape
    K = raw_alpha_dynamic.shape[1]
    chex.assert_shape(raw_rgb_static, (3, R, S) if rgb_t else (R, S, 3))
    chex.assert_shape(raw_alpha_dynamic, (R, K, S))
    chex.assert_shape(raw_rgb_dynamic,
                      (3, R, K, S) if rgb_t else (R, K, S, 3))
    chex.assert_shape(z_vals, (R, S))
    chex.assert_shape(rays_d, (R, 3))

    dists = _dists_from_z(z_vals, rays_d, far_dist)  # [R, S]

    rgb_static = jax.nn.sigmoid(raw_rgb_static)
    rgb_dynamic = jax.nn.sigmoid(raw_rgb_dynamic)

    if noise is not None:
        raw_alpha_static = raw_alpha_static + noise
        raw_alpha_dynamic = raw_alpha_dynamic + noise[:, None, :]

    sigma_s = jax.nn.softplus(raw_alpha_static)
    sigma_d = jax.nn.softplus(raw_alpha_dynamic)
    sigma_total = sigma_s + jnp.sum(sigma_d, axis=1)

    alpha_static = raw2alpha(raw_alpha_static, dists)  # [R, S]
    alpha_dynamic = raw2alpha(raw_alpha_dynamic, dists[:, None, :])  # [R, K, S]
    if reference_numerics:
        # softplus(raw_s + sum_k raw_d): reference rendering__.py:416-418.
        alpha_total = raw2alpha(
            raw_alpha_static + jnp.sum(raw_alpha_dynamic, axis=1), dists
        )
    else:
        alpha_total = 1.0 - jnp.exp(-sigma_total * dists)

    T_s = _transmittance(alpha_static)  # [R, S]
    T_d = _transmittance(alpha_dynamic)  # [R, K, S]
    T = _transmittance(alpha_total)  # [R, S]

    if rgb_t:
        # channel axis MAJOR: broadcasting [R, S]/[R, K, S] factors against
        # [3, R, S]/[3, R, K, S] keeps the lane dim = S everywhere; only the
        # reduced per-ray maps ([3, R] / [3, R, K]) get transposed
        rgb_map = jnp.sum(
            T[None]
            * (alpha_static[None] * rgb_static
               + jnp.sum(alpha_dynamic[None] * rgb_dynamic, axis=2)),
            axis=-1,
        ).T  # [R, 3]
        rgb_map_static = jnp.sum(
            (T_s * alpha_static)[None] * rgb_static, axis=-1).T
        rgb_map_dynamic = jnp.moveaxis(
            jnp.sum((T_d * alpha_dynamic)[None] * rgb_dynamic, axis=-1),
            0, -1)  # [R, K, 3]
    else:
        rgb_map = jnp.sum(
            T[..., None]
            * (
                alpha_static[..., None] * rgb_static
                + jnp.sum(alpha_dynamic[..., None] * rgb_dynamic, axis=1)
            ),
            axis=-2,
        )

        # Per-component maps (visualization / masked metrics)
        rgb_map_static = jnp.sum(
            T_s[..., None] * alpha_static[..., None] * rgb_static, axis=-2)
        rgb_map_dynamic = jnp.sum(
            T_d[..., None] * alpha_dynamic[..., None] * rgb_dynamic, axis=-2
        )  # [R, K, 3]
    dynamic_weights = T_d * alpha_dynamic
    depth_dynamic = jnp.sum(dynamic_weights * z_vals[:, None, :], axis=-1)  # [R, K]
    static_weights = T_s * alpha_static
    depth_static = jnp.sum(static_weights * z_vals, axis=-1)

    weights = T * alpha_total
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    weights_sum = jnp.sum(weights, axis=-1)
    weights_sum = jnp.where(weights_sum >= 0, weights_sum, EPS)
    disp_map = 1.0 / jnp.maximum(DISP_EPS, depth_map / weights_sum)
    acc_map = jnp.sum(weights, axis=-1)

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    result = {
        "rgb": rgb_map,
        "disp": disp_map,
        "acc": acc_map,
        "weights": weights,
        "depth": depth_map,
        "dists": dists,
        "z_vals": z_vals,
        "rgb_static": rgb_map_static,
        "rgb_dynamic": rgb_map_dynamic,
        "depth_static": depth_static,
        "depth_dynamic": depth_dynamic,
        "dynamic_transmittance": T_d[:, :, -1],
        "loss_alpha_entropy": alpha_entropy(alpha_static, alpha_dynamic),
        "loss_dynamic_vs_static_reg": dynamic_vs_static_reg(alpha_static, alpha_dynamic),
        "loss_ray_reg": ray_reg(sigma_d, sigma_total),
        "loss_static_reg": static_reg(sigma_s, alpha_static),
        "loss_dynamic_reg": dynamic_reg(sigma_d),
    }

    if with_test_outputs:
        # Dynamic-only render through the all-vehicles transmittance
        # (reference rendering__.py:534-556, used for dynamic-masked metrics).
        alpha_dynamic_all = 1.0 - jnp.exp(-jnp.sum(sigma_d, axis=1) * dists)
        T_d_all = _transmittance(alpha_dynamic_all)
        if rgb_t:
            result["rgb_dynamic_all"] = jnp.sum(
                T_d_all[None]
                * jnp.sum(alpha_dynamic[None] * rgb_dynamic, axis=2),
                axis=-1,
            ).T
        else:
            result["rgb_dynamic_all"] = jnp.sum(
                T_d_all[..., None]
                * jnp.sum(alpha_dynamic[..., None] * rgb_dynamic, axis=1),
                axis=-2,
            )

    return result
