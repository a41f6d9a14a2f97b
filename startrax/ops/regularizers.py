"""STaR / D2NeRF regularizers on per-sample alphas and densities.

Pure-function counterparts of the reference models/rendering__.py:612-715.
All take [R, S] static and [R, K, S] dynamic arrays and return scalars.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import EPS


def alpha_entropy(alpha_s, alpha_d):
    """H(alpha_s) + H(alpha_d): binary entropy pushed to 0/1 occupancy
    (reference compute_alpha_entropy, rendering__.py:612-631)."""
    num_vehicles = alpha_d.shape[1]

    a_s = jnp.clip(alpha_s, EPS, 1.0 - EPS)
    a_d = jnp.clip(alpha_d, EPS, 1.0 - EPS)

    ent = -jnp.mean(
        alpha_s * jnp.log(a_s) + (1.0 - alpha_s) * jnp.log1p(-a_s)
    ) / (num_vehicles + 1)
    ent += jnp.sum(
        -jnp.mean(
            alpha_d * jnp.log(a_d) + (1.0 - alpha_d) * jnp.log1p(-a_d), axis=(0, 2)
        )
    ) / (num_vehicles + 1)
    return ent


def dynamic_vs_static_reg(alpha_s, alpha_d):
    """Entropy of the normalized static/dynamic alpha split, weighted by total
    alpha: encourages each sample to be explained by exactly one field
    (reference compute_dynamic_vs_static_reg, rendering__.py:634-679)."""
    total_alpha = alpha_s + jnp.sum(alpha_d, axis=1)  # [R, S]
    denom = jnp.clip(total_alpha, EPS, None)
    static_normed = jnp.clip(alpha_s / denom, EPS, None)
    dynamic_normed = jnp.clip(alpha_d / denom[:, None, :], EPS, None)

    return -jnp.mean(
        total_alpha
        * (
            static_normed * jnp.log(static_normed)
            + jnp.sum(dynamic_normed * jnp.log(dynamic_normed), axis=1)
        )
    )


def ray_reg(sigma_d, total_sigma):
    """D2NeRF ray regularization: mean over rays of max_s(sigma_d/sigma_tot)^2
    (reference compute_ray_reg, rendering__.py:682-695)."""
    num_vehicles = sigma_d.shape[1]
    normed = sigma_d / jnp.clip(total_sigma, EPS, None)[:, None, :]
    return jnp.sum(jnp.mean(jnp.max(normed, axis=-1) ** 2.0, axis=0)) / num_vehicles


def static_reg(sigma_s, alpha_s, mask_threshold: float = 0.1):
    """Entropy of the per-ray normalized static alpha distribution, masked to
    rays with enough static density (reference compute_static_reg,
    rendering__.py:698-711)."""
    a_s = jnp.clip(alpha_s, EPS, 1.0 - EPS)
    sigma_sum = jnp.sum(sigma_s, axis=-1, keepdims=True)
    mask = jnp.where(sigma_sum < mask_threshold, 0.0, 1.0)
    p = a_s / jnp.sum(a_s, axis=-1, keepdims=True)
    return jnp.mean(mask * -jnp.mean(p * jnp.log(p), axis=-1, keepdims=True))


def dynamic_reg(sigma_d):
    """Mean dynamic density (reference compute_dynamic_reg,
    rendering__.py:714-715)."""
    return jnp.mean(sigma_d)
