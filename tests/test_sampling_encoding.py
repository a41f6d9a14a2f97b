"""Unit tests for stratified/PDF sampling and positional encodings, golden
against independent numpy implementations of the math in the reference
(models/rendering__.py:75-112, 719-761; models/embedder.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from startrax.ops import encoding, sampling


# ----------------------------- sampling -----------------------------------


def test_stratified_deterministic_linspace():
    z = np.asarray(sampling.stratified_z_vals(None, 4, 2.0, 6.0, 5, perturb=0.0))
    np.testing.assert_allclose(z[0], np.linspace(2.0, 6.0, 5), rtol=1e-6)
    assert z.shape == (4, 5)


def test_stratified_lindisp():
    z = np.asarray(
        sampling.stratified_z_vals(None, 1, 1.0, 4.0, 3, lindisp=True, perturb=0.0)
    )
    # disparity-linear: 1/z linear between 1 and 0.25
    np.testing.assert_allclose(1.0 / z[0], np.linspace(1.0, 0.25, 3), rtol=1e-6)


def test_stratified_jitter_stays_in_intervals():
    key = jax.random.PRNGKey(0)
    z = np.asarray(sampling.stratified_z_vals(key, 128, 2.0, 6.0, 65, perturb=1.0))
    assert np.all(z >= 2.0 - 1e-5) and np.all(z <= 6.0 + 1e-5)
    assert np.all(np.diff(z, axis=-1) > -1e-6)  # sorted within each ray


def _np_sample_pdf_det(bins, weights, n_samples):
    """Independent numpy re-derivation of deterministic inverse-CDF sampling."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros_like(pdf[..., :1]), np.cumsum(pdf, -1)], -1)
    u = np.broadcast_to(np.linspace(0, 1, n_samples), cdf.shape[:-1] + (n_samples,))
    out = np.empty(u.shape, dtype=np.float64)
    for r in range(cdf.shape[0]):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.maximum(0, inds - 1)
        above = np.minimum(cdf.shape[-1] - 1, inds)
        cdf_b, cdf_a = cdf[r][below], cdf[r][above]
        bins_b, bins_a = bins[r][below], bins[r][above]
        denom = np.where(cdf_a - cdf_b < 1e-5, 1.0, cdf_a - cdf_b)
        t = (u[r] - cdf_b) / denom
        out[r] = bins_b + t * (bins_a - bins_b)
    return out


def test_sample_pdf_matches_numpy_searchsorted():
    rng = np.random.default_rng(0)
    R, B = 16, 31
    bins = np.sort(rng.uniform(2.0, 6.0, size=(R, B + 1)).astype(np.float32), axis=-1)
    weights = rng.uniform(0.0, 1.0, size=(R, B)).astype(np.float32)
    got = np.asarray(
        sampling.sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), 24, det=True)
    )
    want = _np_sample_pdf_det(bins.astype(np.float64), weights.astype(np.float64), 24)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_sample_pdf_concentrates_on_peak():
    # A delta-like weight at one bin should pull nearly all samples there.
    R, B = 4, 63
    bins = np.broadcast_to(np.linspace(0, 1, B + 1, dtype=np.float32), (R, B + 1)).copy()
    weights = np.full((R, B), 1e-8, dtype=np.float32)
    weights[:, 20] = 1.0
    s = np.asarray(
        sampling.sample_pdf(
            jax.random.PRNGKey(1), jnp.asarray(bins), jnp.asarray(weights), 64, det=False
        )
    )
    frac_near = np.mean((s > bins[0, 19]) & (s < bins[0, 22]))
    assert frac_near > 0.95


def test_hierarchical_union_sorted():
    key = jax.random.PRNGKey(2)
    z = sampling.stratified_z_vals(None, 8, 2.0, 6.0, 33, perturb=0.0)
    w = jax.random.uniform(key, (8, 33))
    z_union, z_samples = sampling.hierarchical_z_vals(key, z, w, 16, det=False)
    assert z_union.shape == (8, 49)
    zu = np.asarray(z_union)
    assert np.all(np.diff(zu, axis=-1) >= 0)


def test_merge_sorted_equals_full_sort():
    rng = np.random.default_rng(3)
    a = np.sort(rng.normal(size=(5, 32)), axis=-1)
    b = np.sort(rng.normal(size=(5, 32)), axis=-1)
    merged = np.asarray(sampling.merge_sorted(jnp.asarray(a), jnp.asarray(b)))
    expect = np.sort(np.concatenate([a, b], axis=-1), axis=-1)
    np.testing.assert_allclose(merged, expect)


def test_sample_pdf_stratified_is_sorted_and_on_distribution():
    key = jax.random.PRNGKey(7)
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 17), (64, 17))
    w = np.ones((64, 16), np.float32)
    w[:, 8] = 50.0  # peak in bin 8
    zs = sampling.sample_pdf(key, bins, jnp.asarray(w), 64, det=False,
                             stratified=True)
    zs = np.asarray(zs)
    assert np.all(np.diff(zs, axis=-1) >= 0)  # ascending per ray
    lo, hi = bins[0, 8], bins[0, 9]
    frac = np.mean((zs >= lo) & (zs <= hi))
    assert frac > 0.5  # mass concentrates on the peaked bin


def test_hierarchical_power_of_two_union_merges_correctly():
    """Default (stratified) path on a power-of-two union takes the bitonic
    merge; the result must still be the ascending union of both sets."""
    key = jax.random.PRNGKey(4)
    z = sampling.stratified_z_vals(None, 8, 2.0, 6.0, 32, perturb=0.0)
    w = jax.random.uniform(key, (8, 32))
    z_union, z_samples = sampling.hierarchical_z_vals(key, z, w, 32, det=False)
    assert z_union.shape == (8, 64)
    zu = np.asarray(z_union)
    assert np.all(np.diff(zu, axis=-1) >= 0)
    expect = np.sort(
        np.concatenate([np.asarray(z), np.asarray(z_samples)], axis=-1), axis=-1
    )
    np.testing.assert_allclose(zu, expect)


def test_hierarchical_iid_sort_path():
    key = jax.random.PRNGKey(5)
    z = sampling.stratified_z_vals(None, 8, 2.0, 6.0, 32, perturb=0.0)
    w = jax.random.uniform(key, (8, 32))
    z_union, z_samples = sampling.hierarchical_z_vals(
        key, z, w, 32, det=False, stratified=False)
    zs = np.asarray(z_samples)
    assert not np.all(np.diff(zs, axis=-1) >= 0)  # iid u: unsorted samples
    assert np.all(np.diff(np.asarray(z_union), axis=-1) >= 0)


# ----------------------------- encodings ----------------------------------


def test_positional_encoding_layout_and_values():
    x = jnp.asarray([[0.5, -1.0, 2.0]])
    L = 4
    enc = np.asarray(encoding.positional_encoding(x, L))
    assert enc.shape == (1, 3 * (1 + 2 * L))
    xn = np.asarray(x)
    np.testing.assert_allclose(enc[:, :3], xn, rtol=1e-6)
    # per-frequency blocks: [sin(x*f), cos(x*f)]
    for i, f in enumerate(2.0 ** np.arange(L)):
        blk = enc[:, 3 + 6 * i : 3 + 6 * (i + 1)]
        np.testing.assert_allclose(blk[:, :3], np.sin(xn * f), atol=1e-6)
        np.testing.assert_allclose(blk[:, 3:], np.cos(xn * f), atol=1e-6)


def test_barf_weights_schedule():
    L = 8
    w0 = np.asarray(encoding.barf_weights(0.0, 100, L))
    w_half = np.asarray(encoding.barf_weights(50.0, 100, L))
    w_end = np.asarray(encoding.barf_weights(100.0, 100, L))
    np.testing.assert_allclose(w0, 0.0, atol=1e-6)
    np.testing.assert_allclose(w_end, 1.0, atol=1e-6)
    assert np.all(np.diff(w_half) <= 1e-6)  # lower freqs admitted first
    assert w_half[0] == 1.0 and w_half[-1] == 0.0


def test_ipe_damps_with_variance():
    mean = jnp.zeros((1, 3)) + 0.3
    small = encoding.integrated_positional_encoding(mean, jnp.full((1, 3), 1e-6), 8)
    large = encoding.integrated_positional_encoding(mean, jnp.full((1, 3), 10.0), 8)
    assert float(jnp.sum(jnp.abs(large))) < float(jnp.sum(jnp.abs(small)))


def test_conical_frustum_gaussian_mean_on_ray():
    o = jnp.zeros((4, 1, 3))
    d = jnp.asarray(np.tile([[0.0, 0.0, -1.0]], (4, 1))[:, None])
    t0 = jnp.full((4, 1), 2.0)
    t1 = jnp.full((4, 1), 3.0)
    mean, cov = encoding.conical_frustum_to_gaussian(o, d, t0, t1, 0.01)
    m = np.asarray(mean)
    # mean sits along the ray between t0 and t1
    assert np.all(m[..., 2] < -2.0) and np.all(m[..., 2] > -3.0)
    assert np.all(np.asarray(cov) >= 0.0)


def test_ipe_matches_monte_carlo_expectation():
    """IPE is E[sin/cos(f x)] under the Gaussian: verify by sampling."""
    rng = np.random.default_rng(42)
    mean = np.array([[0.4, -0.2, 1.1]], np.float32)
    std = np.array([[0.3, 0.1, 0.5]], np.float32)
    enc = np.asarray(
        encoding.integrated_positional_encoding(
            jnp.asarray(mean), jnp.asarray(std ** 2), num_freqs=3
        )
    )[0]
    samples = mean + rng.standard_normal((200000, 3)).astype(np.float32) * std
    mc = []
    for i, f in enumerate(2.0 ** np.arange(3)):
        mc.append(np.sin(samples * f).mean(0))
        mc.append(np.cos(samples * f).mean(0))
    mc = np.concatenate(mc)
    np.testing.assert_allclose(enc, mc, atol=5e-3)


def test_conical_frustum_moments_match_monte_carlo():
    """The frustum Gaussian's t-mean matches Monte-Carlo over the cone
    volume (mip-NeRF eq. 7 approximation, within its documented tolerance)."""
    rng = np.random.default_rng(0)
    t0, t1, r = 2.0, 2.5, 0.05
    o = jnp.zeros((1, 1, 3))
    d = jnp.asarray([[[0.0, 0.0, 1.0]]])
    mean, cov = encoding.conical_frustum_to_gaussian(
        o, d, jnp.full((1, 1), t0), jnp.full((1, 1), t1), r
    )
    # MC: sample t with density ∝ t^2 (cone cross-section area)
    u = rng.uniform(size=2000000)
    t = (t0 ** 3 + u * (t1 ** 3 - t0 ** 3)) ** (1 / 3)
    np.testing.assert_allclose(float(mean[0, 0, 2]), t.mean(), rtol=2e-3)
    np.testing.assert_allclose(float(cov[0, 0, 2]), t.var(), rtol=0.15)
