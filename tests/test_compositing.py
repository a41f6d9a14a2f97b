"""Golden + property tests for volume rendering and STaR compositing.

The numpy goldens re-derive the math of the reference
(models/rendering__.py:301-576) independently.
"""

import jax
import jax.numpy as jnp
import numpy as np

from startrax.ops import compositing


def _np_softplus(x):
    return np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)


def _np_raw2outputs(raw_alpha, raw_rgb, z_vals, rays_d, far_dist=1e10):
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], far_dist)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = 1.0 / (1.0 + np.exp(-raw_rgb))
    alpha = 1.0 - np.exp(-_np_softplus(raw_alpha) * dists)
    T = np.cumprod(
        np.concatenate([np.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], -1), -1
    )[..., :-1]
    weights = alpha * T
    rgb_map = np.sum(weights[..., None] * rgb, -2)
    depth = np.sum(weights * z_vals, -1)
    acc = np.sum(weights, -1)
    return rgb_map, depth, acc, weights


def _random_inputs(R=8, S=16, seed=0):
    rng = np.random.default_rng(seed)
    raw_alpha = rng.normal(size=(R, S)).astype(np.float32)
    raw_rgb = rng.normal(size=(R, S, 3)).astype(np.float32)
    z_vals = np.sort(rng.uniform(2.0, 6.0, size=(R, S)).astype(np.float32), axis=-1)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    return raw_alpha, raw_rgb, z_vals, rays_d


def test_raw2outputs_matches_numpy_golden():
    raw_alpha, raw_rgb, z_vals, rays_d = _random_inputs()
    out = compositing.raw2outputs(
        jnp.asarray(raw_alpha), jnp.asarray(raw_rgb), jnp.asarray(z_vals), jnp.asarray(rays_d)
    )
    rgb, depth, acc, weights = _np_raw2outputs(
        raw_alpha.astype(np.float64), raw_rgb.astype(np.float64),
        z_vals.astype(np.float64), rays_d.astype(np.float64),
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["depth"]), depth, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["acc"]), acc, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["weights"]), weights, atol=1e-4)


def test_raw2outputs_opaque_first_sample():
    # A very dense first sample makes the ray color its color.
    R, S = 4, 8
    raw_alpha = np.full((R, S), -20.0, np.float32)
    raw_alpha[:, 0] = 50.0
    raw_rgb = np.zeros((R, S, 3), np.float32)
    raw_rgb[:, 0] = 8.0  # sigmoid -> ~1
    z_vals = np.broadcast_to(np.linspace(2, 6, S, dtype=np.float32), (R, S)).copy()
    rays_d = np.tile([[0.0, 0.0, -1.0]], (R, 1)).astype(np.float32)
    out = compositing.raw2outputs(
        jnp.asarray(raw_alpha), jnp.asarray(raw_rgb), jnp.asarray(z_vals), jnp.asarray(rays_d)
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["depth"]), z_vals[:, 0], atol=1e-2)


def test_white_background():
    raw_alpha = np.full((2, 4), -30.0, np.float32)  # fully transparent
    raw_rgb = np.zeros((2, 4, 3), np.float32)
    z_vals = np.broadcast_to(np.linspace(2, 6, 4, dtype=np.float32), (2, 4)).copy()
    rays_d = np.tile([[0.0, 0.0, -1.0]], (2, 1)).astype(np.float32)
    out = compositing.raw2outputs(
        jnp.asarray(raw_alpha), jnp.asarray(raw_rgb), jnp.asarray(z_vals),
        jnp.asarray(rays_d), white_bkgd=True,
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), 1.0, atol=1e-3)


def test_star_reduces_to_static_when_dynamic_empty():
    raw_alpha, raw_rgb, z_vals, rays_d = _random_inputs(seed=1)
    R, S = raw_alpha.shape
    K = 2
    raw_alpha_d = np.full((R, K, S), -45.0, np.float32)  # sigma ~ 3e-20
    raw_rgb_d = np.zeros((R, K, S, 3), np.float32)
    out_star = compositing.raw2outputs_star(
        jnp.asarray(raw_alpha), jnp.asarray(raw_rgb),
        jnp.asarray(raw_alpha_d), jnp.asarray(raw_rgb_d),
        jnp.asarray(z_vals), jnp.asarray(rays_d),
    )
    out_static = compositing.raw2outputs(
        jnp.asarray(raw_alpha), jnp.asarray(raw_rgb), jnp.asarray(z_vals), jnp.asarray(rays_d)
    )
    np.testing.assert_allclose(
        np.asarray(out_star["rgb"]), np.asarray(out_static["rgb"]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out_star["depth"]), np.asarray(out_static["depth"]), atol=1e-3
    )
    # empty dynamic field -> transmittance ~ 1 everywhere
    np.testing.assert_allclose(
        np.asarray(out_star["dynamic_transmittance"]), 1.0, atol=1e-4
    )


def test_star_joint_transmittance_golden():
    """Check alpha_total = raw2alpha(sigma_s + sum sigma_d) and the joint-T
    color integral against a direct numpy evaluation."""
    rng = np.random.default_rng(2)
    R, K, S = 4, 2, 8
    ras = rng.normal(size=(R, S)).astype(np.float32)
    rrs = rng.normal(size=(R, S, 3)).astype(np.float32)
    rad = rng.normal(size=(R, K, S)).astype(np.float32)
    rrd = rng.normal(size=(R, K, S, 3)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(R, S)).astype(np.float32), -1)
    d = rng.normal(size=(R, 3)).astype(np.float32)

    out = compositing.raw2outputs_star(
        jnp.asarray(ras), jnp.asarray(rrs), jnp.asarray(rad), jnp.asarray(rrd),
        jnp.asarray(z), jnp.asarray(d), with_test_outputs=True,
    )

    dists = np.concatenate([np.diff(z, axis=-1), np.full((R, 1), 1e10, np.float32)], -1)
    dists = dists * np.linalg.norm(d, axis=-1, keepdims=True)
    sig = lambda x: 1 / (1 + np.exp(-x))
    a_s = 1 - np.exp(-_np_softplus(ras) * dists)
    a_d = 1 - np.exp(-_np_softplus(rad) * dists[:, None, :])
    a_tot = 1 - np.exp(-(_np_softplus(ras) + _np_softplus(rad).sum(1)) * dists)
    T = np.cumprod(
        np.concatenate([np.ones((R, 1)), 1 - a_tot + 1e-10], -1), -1
    )[:, :-1]
    rgb_want = np.sum(
        T[..., None] * (a_s[..., None] * sig(rrs) + np.sum(a_d[..., None] * sig(rrd), 1)),
        axis=-2,
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_want, atol=1e-4)
    assert out["rgb_dynamic"].shape == (R, K, 3)
    assert out["dynamic_transmittance"].shape == (R, K)
    assert out["rgb_dynamic_all"].shape == (R, 3)
    # regularizers are finite scalars
    for k in [
        "loss_alpha_entropy", "loss_dynamic_vs_static_reg", "loss_ray_reg",
        "loss_static_reg", "loss_dynamic_reg",
    ]:
        assert np.isfinite(float(out[k])), k


def test_star_reference_numerics_golden():
    """reference_numerics=True sums pre-activation raws before softplus for
    the joint alpha, exactly matching the reference (rendering__.py:416-418)."""
    rng = np.random.default_rng(5)
    R, K, S = 4, 2, 8
    ras = rng.normal(size=(R, S)).astype(np.float32)
    rrs = rng.normal(size=(R, S, 3)).astype(np.float32)
    rad = rng.normal(size=(R, K, S)).astype(np.float32)
    rrd = rng.normal(size=(R, K, S, 3)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(R, S)).astype(np.float32), -1)
    d = rng.normal(size=(R, 3)).astype(np.float32)

    out = compositing.raw2outputs_star(
        jnp.asarray(ras), jnp.asarray(rrs), jnp.asarray(rad), jnp.asarray(rrd),
        jnp.asarray(z), jnp.asarray(d), reference_numerics=True,
    )

    dists = np.concatenate([np.diff(z, axis=-1), np.full((R, 1), 1e10, np.float32)], -1)
    dists = dists * np.linalg.norm(d, axis=-1, keepdims=True)
    sig = lambda x: 1 / (1 + np.exp(-x))
    a_s = 1 - np.exp(-_np_softplus(ras) * dists)
    a_d = 1 - np.exp(-_np_softplus(rad) * dists[:, None, :])
    # reference joint alpha: softplus of the raw sum
    a_tot = 1 - np.exp(-_np_softplus(ras + rad.sum(1)) * dists)
    T = np.cumprod(
        np.concatenate([np.ones((R, 1)), 1 - a_tot + 1e-10], -1), -1
    )[:, :-1]
    rgb_want = np.sum(
        T[..., None] * (a_s[..., None] * sig(rrs) + np.sum(a_d[..., None] * sig(rrd), 1)),
        axis=-2,
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb_want, atol=1e-4)

    # The conventions genuinely differ on raw inputs (softplus is not
    # additive): a very negative dynamic raw *subtracts* static density in
    # the reference convention but is a no-op in the default convention.
    out_default = compositing.raw2outputs_star(
        jnp.asarray(ras), jnp.asarray(rrs), jnp.asarray(rad), jnp.asarray(rrd),
        jnp.asarray(z), jnp.asarray(d), reference_numerics=False,
    )
    assert float(jnp.max(jnp.abs(out["rgb"] - out_default["rgb"]))) > 1e-4

    # Gradients stay finite in reference mode (training-safety).
    def f(ra):
        o = compositing.raw2outputs_star(
            ra, jnp.asarray(rrs), jnp.asarray(rad), jnp.asarray(rrd),
            jnp.asarray(z), jnp.asarray(d), reference_numerics=True,
        )
        return jnp.sum(o["rgb"])

    g = jax.grad(f)(jnp.asarray(ras))
    assert np.all(np.isfinite(np.asarray(g)))


def test_regularizers_drive_expected_direction():
    """Alpha entropy is ~0 for saturated alphas, large for alpha=0.5."""
    from startrax.ops import regularizers as reg

    R, K, S = 4, 1, 8
    half = jnp.full((R, S), 0.5)
    half_d = jnp.full((R, K, S), 0.5)
    sat = jnp.full((R, S), 1e-6)
    sat_d = jnp.full((R, K, S), 1e-6)
    assert float(reg.alpha_entropy(half, half_d)) > float(reg.alpha_entropy(sat, sat_d))

    # ray_reg: dynamic-dominated ray penalized more than static-dominated
    sigma_d_hi = jnp.full((R, K, S), 5.0)
    sigma_d_lo = jnp.full((R, K, S), 0.01)
    total = jnp.full((R, S), 5.05)
    assert float(reg.ray_reg(sigma_d_hi, total)) > float(reg.ray_reg(sigma_d_lo, total))


def test_compositing_grads_finite():
    raw_alpha, raw_rgb, z_vals, rays_d = _random_inputs(seed=3)

    def f(ra):
        out = compositing.raw2outputs(
            ra, jnp.asarray(raw_rgb), jnp.asarray(z_vals), jnp.asarray(rays_d)
        )
        return jnp.sum(out["rgb"]) + jnp.sum(out["depth"])

    g = jax.grad(f)(jnp.asarray(raw_alpha))
    assert np.all(np.isfinite(np.asarray(g)))


def test_transmittance_matmul_matches_cumprod():
    """The MXU path (log-space triangular matmul, BENCH_NOTES round-3) must
    match lax.cumprod in value AND gradient, including saturated alphas where
    1 - alpha bottoms out at the 1e-10 guard."""
    rng = np.random.default_rng(7)
    alpha = rng.uniform(0.0, 1.0, size=(6, 32)).astype(np.float32)
    alpha[0, :4] = 1.0          # fully opaque prefix -> T collapses to ~1e-10^k
    alpha[1] = 0.0              # fully transparent -> T stays exactly 1
    alpha[2, 16:] = 1.0 - 1e-7  # near-opaque tail
    for shape in [(6, 32), (2, 3, 32)]:
        a = jnp.asarray(alpha[: shape[0]].reshape(shape) if len(shape) == 2
                        else np.broadcast_to(alpha[:2, None, :], shape))
        t_ref = compositing._transmittance_cumprod(a)
        t_mm = compositing._transmittance_matmul(a)
        np.testing.assert_allclose(np.asarray(t_mm), np.asarray(t_ref),
                                   rtol=1e-5, atol=1e-7)
        # jit is the real deployment mode AND a numerics trap: XLA's
        # algebraic simplifier folds `1 - alpha + eps` to `1 - alpha`,
        # which turns saturated lanes into log(0) = -inf -> NaN in the
        # triangular matmul (caught by /verify in round 3).
        t_jit = jax.jit(compositing._transmittance_matmul)(a)
        assert not np.any(np.isnan(np.asarray(t_jit)))
        np.testing.assert_allclose(np.asarray(t_jit), np.asarray(t_ref),
                                   rtol=1e-5, atol=1e-7)

    # gradients: dT_i/dalpha_j = -T_i / (1 - alpha_j + eps) for j < i
    a = jnp.asarray(rng.uniform(0.05, 0.95, size=(4, 16)).astype(np.float32))
    g_ref = jax.grad(lambda x: jnp.sum(jnp.sin(compositing._transmittance_cumprod(x))))(a)
    g_mm = jax.grad(lambda x: jnp.sum(jnp.sin(compositing._transmittance_matmul(x))))(a)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref), rtol=1e-4, atol=1e-6)
    g_jit = jax.jit(jax.grad(
        lambda x: jnp.sum(jnp.sin(compositing._transmittance_matmul(x)))))(a)
    np.testing.assert_allclose(np.asarray(g_jit), np.asarray(g_ref), rtol=1e-4, atol=1e-6)
    # saturated alphas must keep jitted grads finite too
    a_sat = jnp.asarray(alpha[:4])
    g_sat = jax.jit(jax.grad(
        lambda x: jnp.sum(compositing._transmittance_matmul(x))))(a_sat)
    assert np.all(np.isfinite(np.asarray(g_sat)))
    # row 0 of the exclusive product has no dependence -> exact 1, zero grad
    np.testing.assert_array_equal(np.asarray(compositing._transmittance_matmul(a))[:, 0], 1.0)
