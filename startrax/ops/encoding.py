"""Positional encodings: NeRF sin/cos frequency encoding, BARF coarse-to-fine
masking, and mip-NeRF integrated positional encoding (IPE).

Counterpart of the reference models/embedder.py (Embedder, barf_mask) and the
nerfstudio IPE used by the mip variant. Frequencies are compile-time constants,
so the encode is a handful of fused VPU ops under jit.
"""

from __future__ import annotations

import math
from functools import partial

import jax.numpy as jnp
import numpy as np


def freq_bands(num_freqs: int, max_freq_log2: float | None = None, log_sampling: bool = True):
    if max_freq_log2 is None:
        max_freq_log2 = num_freqs - 1
    if log_sampling:
        return 2.0 ** np.linspace(0.0, max_freq_log2, num_freqs)
    return np.linspace(2.0 ** 0.0, 2.0 ** max_freq_log2, num_freqs)


def encoding_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dims * (int(include_input) + 2 * num_freqs)


def barf_weights(step, end_barf: int, num_freqs: int, start: int = 0):
    """Per-frequency BARF coarse-to-fine weights in [0, 1].

    Mirrors reference models/embedder.py:26-35: alpha ramps linearly with the
    epoch/step from `start` to `end_barf`; frequency k fades in smoothly as
    (1 - cos(pi * clamp(alpha - k, 0, 1))) / 2.
    """
    alpha = (step - start) / (end_barf - start) * num_freqs
    k = jnp.arange(num_freqs, dtype=jnp.float32)
    return (1.0 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * math.pi)) / 2.0


def positional_encoding(
    x,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
    step=None,
    end_barf: int = -1,
):
    """NeRF frequency encoding of x [..., d] -> [..., d*(include + 2*num_freqs)].

    Output layout matches the reference Embedder (models/embedder.py:81-112):
    [x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]. When `step` is given
    and end_barf > 0, the sin/cos bands are masked by the BARF schedule.
    """
    bands = jnp.asarray(freq_bands(num_freqs, log_sampling=log_sampling), dtype=x.dtype)
    # [..., num_freqs, d]
    scaled = x[..., None, :] * bands[:, None]
    sin = jnp.sin(scaled)
    cos = jnp.cos(scaled)

    if step is not None and end_barf > 0:
        w = barf_weights(step, end_barf, num_freqs)[:, None].astype(x.dtype)
        sin = sin * w
        cos = cos * w

    enc = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    enc = enc.reshape(x.shape[:-1] + (2 * num_freqs * x.shape[-1],))
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


def integrated_positional_encoding(mean, cov_diag, num_freqs: int, min_deg: int = 0):
    """mip-NeRF IPE of a Gaussian (mean, diagonal covariance) over a frustum.

    E[sin(f x)] for x ~ N(mu, sigma^2) = sin(f mu) * exp(-f^2 sigma^2 / 2).
    Returns [..., 2 * num_freqs * d] (sin block then cos block per frequency).
    Replaces the nerfstudio NeRFEncoding(.., covs) path used by the reference
    mip variant (models/mipnerf.py:16-27).
    """
    scales = jnp.asarray(
        2.0 ** np.arange(min_deg, min_deg + num_freqs), dtype=mean.dtype
    )
    sm = mean[..., None, :] * scales[:, None]  # [..., F, d]
    sv = cov_diag[..., None, :] * (scales[:, None] ** 2)
    damp = jnp.exp(-0.5 * sv)
    sin = jnp.sin(sm) * damp
    cos = jnp.cos(sm) * damp
    enc = jnp.concatenate([sin[..., None, :], cos[..., None, :]], axis=-2)
    return enc.reshape(mean.shape[:-1] + (2 * num_freqs * mean.shape[-1],))


def conical_frustum_to_gaussian(origins, directions, t0, t1, base_radius):
    """Approximate a conical frustum along a ray by a Gaussian (mip-NeRF eq. 7).

    origins/directions: [..., 3]; t0/t1: [...]; base_radius: [...] or scalar
    (radius at unit distance). Returns (mean [..., 3], cov_diag [..., 3]).
    """
    mu = (t0 + t1) / 2.0
    hw = (t1 - t0) / 2.0
    mu2, hw2 = mu * mu, hw * hw
    denom = 3.0 * mu2 + hw2
    t_mean = mu + (2.0 * mu * hw2) / denom
    t_var = hw2 / 3.0 - (4.0 / 15.0) * ((hw2 * hw2) * (12.0 * mu2 - hw2)) / (denom * denom)
    r_var = base_radius ** 2 * (
        mu2 / 4.0 + (5.0 / 12.0) * hw2 - (4.0 / 15.0) * (hw2 * hw2) / denom
    )

    mean = origins + directions * t_mean[..., None]
    d2 = jnp.sum(directions * directions, axis=-1, keepdims=True).clip(1e-10)
    d_outer_diag = directions * directions
    null_outer_diag = 1.0 - d_outer_diag / d2
    cov_diag = t_var[..., None] * d_outer_diag + r_var[..., None] * null_outer_diag
    return mean, cov_diag
