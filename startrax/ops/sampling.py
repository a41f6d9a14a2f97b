"""Ray sampling: stratified coarse samples and inverse-CDF importance samples.

Counterpart of the reference sample_pts / sample_pdf
(models/rendering__.py:75-112, 719-761), designed for TPU/XLA:

- all shapes are static; randomness comes from explicit jax.random keys,
- the inverse-CDF search is a dense comparison matrix (VPU-friendly) instead
  of searchsorted, avoiding data-dependent gather patterns,
- the coarse/fine z-union is a fixed-size sort.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import PDF_EPS


def stratified_z_vals(
    key,
    n_rays: int,
    near: float,
    far: float,
    n_samples: int,
    lindisp: bool = False,
    perturb: float = 1.0,
    dtype=jnp.float32,
):
    """[n_rays, n_samples] depths, linear in depth (or disparity), with
    per-interval jitter when perturb > 0 (training). Pass key=None or
    perturb=0 for deterministic midpointless linspace (eval)."""
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    if not lindisp:
        z = near * (1.0 - t) + far * t
    else:
        z = 1.0 / (1.0 / near * (1.0 - t) + 1.0 / far * t)
    z = jnp.broadcast_to(z, (n_rays, n_samples))

    if key is not None and perturb > 0.0:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], -1)
        lower = jnp.concatenate([z[..., :1], mids], -1)
        u = jax.random.uniform(key, z.shape, dtype=dtype)
        z = lower + (upper - lower) * u
    return z


def pts_from_z(rays_o, rays_d, z_vals):
    """o + d*z -> [n_rays, n_samples, 3]."""
    return rays_o[..., None, :] + rays_d[..., None, :] * z_vals[..., :, None]


def pts_from_z_t(rays_o, rays_d, z_vals):
    """Channel-leading twin of pts_from_z: o + d*z -> [3, R, S].

    Built channel-leading natively (the transposes touch only the tiny
    [R, 3] ray arrays) so the lane-padded [R, S, 3] points tensor — ~43x
    its logical HBM bytes per touch — never exists. Feeds the fused
    kernel's io_t path (kernels/fused_mlp)."""
    return rays_o.T[:, :, None] + rays_d.T[:, :, None] * z_vals[None]


def merge_sorted(a, b):
    """Merge per-row ascending a [..., A] and b [..., B] into one ascending
    [..., A+B] array with a bitonic MERGE — log2(A+B) compare-exchange stages
    of elementwise min/max, vs the ~log^2 stages of a full sort network.
    Requires A+B to be a power of two (the NeRF coarse+fine unions are:
    64+64, 256+256); asserts otherwise."""
    x = jnp.concatenate([a, b[..., ::-1]], axis=-1)  # ascending+descending = bitonic
    n = x.shape[-1]
    assert n & (n - 1) == 0, f"merge_sorted needs a power-of-two union, got {n}"
    k = n // 2
    while k >= 1:
        y = x.reshape(x.shape[:-1] + (n // (2 * k), 2, k))
        lo = jnp.minimum(y[..., 0, :], y[..., 1, :])
        hi = jnp.maximum(y[..., 0, :], y[..., 1, :])
        x = jnp.stack([lo, hi], axis=-2).reshape(x.shape)
        k //= 2
    return x


def sample_pdf(key, bins, weights, n_samples: int, det: bool = False,
               stratified: bool = False):
    """Inverse-CDF sampling of n_samples depths from a per-ray histogram.

    bins: [R, B+1] bin edges (z midpoints), weights: [R, B] coarse weights.
    det=True uses evenly spaced u (eval); otherwise uniform randoms —
    iid like the reference (rendering__.py:738), or stratified jittered
    (u_i = (i + rand)/n, mip-NeRF style) with stratified=True. Stratified u
    is ascending, so the returned samples are per-ray sorted (the CDF
    inverse is monotone), which makes the coarse/fine union a cheap merge.
    Matches reference sample_pdf (rendering__.py:719-761) numerically.
    """
    import chex

    chex.assert_equal_rank([bins, weights])
    B = weights.shape[-1]
    # z-midpoint callers pass B+1 edges; edge-style callers (mip) pass B+2
    if bins.shape[-1] not in (B + 1, B + 2):
        raise AssertionError(
            f"bins last dim {bins.shape[-1]} must be weights last dim + 1 or + 2 ({B})"
        )
    weights = weights + PDF_EPS
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, B+1]

    if det or key is None:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    elif stratified:
        r = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)
        u = (jnp.arange(n_samples, dtype=cdf.dtype) + r) / n_samples
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=cdf.dtype)

    # bins may have one more entry than the cdf (edge-style callers, e.g. the
    # mip sampler); the index-gather formulation never touched the last bin,
    # so truncate to match.
    bins = bins[..., : cdf.shape[-1]]

    # Inverting the CDF without gathers: TPU gathers from [R, B] cost ~2.6 ms
    # each here; instead compute the bracketing (cdf, bin) pairs as masked
    # min/max reductions over the dense comparison matrix (cdf and bins are
    # both ascending, so argmax over {cdf_j <= u} matches for both).
    le = cdf[..., :, None] <= u[..., None, :]  # [R, B+1, n_samples]
    neg = jnp.float32(-1e10)
    pos = jnp.float32(1e10)
    cdf_below = jnp.max(jnp.where(le, cdf[..., :, None], neg), axis=-2)
    bins_below = jnp.max(jnp.where(le, bins[..., :, None], neg), axis=-2)
    cdf_above = jnp.min(jnp.where(le, pos, cdf[..., :, None]), axis=-2)
    bins_above = jnp.min(jnp.where(le, pos, bins[..., :, None]), axis=-2)
    # u < cdf[0] never happens (cdf[0] = 0 <= u); u >= cdf[-1] leaves "above"
    # empty -> clamp to the last bin (reference clamps indices the same way)
    cdf_above = jnp.where(cdf_above >= pos, cdf[..., -1:], cdf_above)
    bins_above = jnp.where(bins_above >= pos, bins[..., -1:], bins_above)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def hierarchical_z_vals(key, z_vals, weights, n_importance: int, det: bool,
                        stratified: bool = True):
    """Coarse weights -> sorted union of coarse z and importance samples.

    Returns (z_union [R, S+I], z_samples [R, I]); z_samples is already
    stop-gradiented (the reference detaches, rendering__.py:135).

    stratified=True (default) draws stratified (sorted) importance samples so
    the union is a bitonic MERGE of two sorted sequences instead of a full
    sort of S+I values; stratified=False keeps the reference's iid uniforms
    (rendering__.py:738) + full sort. The det/eval path's linspace u is
    always sorted, so it always merges."""
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = sample_pdf(key, z_mid, weights[..., 1:-1], n_importance,
                           det=det, stratified=stratified)
    z_samples = jax.lax.stop_gradient(z_samples)
    n_union = z_vals.shape[-1] + n_importance
    sorted_samples = det or key is None or stratified
    if sorted_samples and (n_union & (n_union - 1)) == 0:
        z_union = merge_sorted(z_vals, z_samples)
    else:
        z_union = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
    return z_union, z_samples
