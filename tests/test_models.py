"""Model-layer tests: field MLPs, stacked-vmap equivalence, the full STaR
render, pose gradient flow, and the batch-independence gradient check (the
reference's CheckBatchGradient callback, callbacks/check_batch_grad.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from startrax.models import fields, star
from startrax.models.star import StarConfig
from startrax.ops import lie

CFG = StarConfig(
    num_vehicles=2,
    netdepth=4,
    netdepth_fine=4,
    netwidth=32,
    netwidth_fine=32,
    n_samples=16,
    n_importance=16,
    near=2.0,
    far=6.0,
    compute_dtype=jnp.float32,
)


def _rays(n, seed=0):
    rng = np.random.default_rng(seed)
    rays_o = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(rays_o), jnp.asarray(d)


def test_shape_contracts_reject_malformed():
    """Every public model/render entry point fails fast on malformed shapes
    (reference enforces this with torchtyping, models/types__.py)."""
    from startrax.ops import compositing, sampling

    params = star.init_star(jax.random.PRNGKey(0), CFG)
    rays_o, rays_d = _rays(4)

    with pytest.raises(AssertionError):
        star.render_star(params, CFG, rays_o[:, :2], rays_d[:, :2])  # rays not [R,3]
    with pytest.raises(AssertionError):  # pose K mismatch (CFG has 2 vehicles)
        star.render_star(params, CFG, rays_o, rays_d, pose=lie.se3_identity(3))

    fcfg = CFG.static_field()
    fparams = fields.init_field(jax.random.PRNGKey(1), fcfg)
    pts = jnp.zeros((4, 8, 3))
    with pytest.raises(AssertionError):
        fields.apply_field(fparams, fcfg, pts, jnp.zeros((5, 3)))  # R mismatch
    with pytest.raises(AssertionError):
        fields.apply_field(fparams, fcfg, jnp.zeros((4, 8, 2)), jnp.zeros((4, 3)))

    with pytest.raises(AssertionError):  # raw_rgb not [R,S,3]
        compositing.raw2outputs(
            jnp.zeros((4, 8)), jnp.zeros((4, 8, 4)), jnp.zeros((4, 8)), rays_d
        )
    with pytest.raises(AssertionError):  # bins must be weights+1 or +2 wide
        sampling.sample_pdf(None, jnp.zeros((4, 12)), jnp.zeros((4, 8)), 4, det=True)
    with pytest.raises(AssertionError):
        lie.se3_act(jnp.zeros((2, 6)), jnp.zeros((2, 3)))


def test_field_shapes_and_determinism():
    cfg = CFG.static_field()
    params = fields.init_field(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8, 3)).astype(np.float32))
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3)).astype(np.float32))
    a1, r1 = fields.apply_field(params, cfg, pts, dirs)
    a2, r2 = fields.apply_field(params, cfg, pts, dirs)
    assert a1.shape == (4, 8) and r1.shape == (4, 8, 3)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))


def test_stacked_fields_match_loop():
    cfg = CFG.dynamic_field()
    stacked = fields.init_stacked_fields(jax.random.PRNGKey(1), cfg, 3)
    pts = jnp.asarray(np.random.default_rng(2).normal(size=(3, 4, 8, 3)).astype(np.float32))
    dirs = jnp.asarray(np.random.default_rng(3).normal(size=(3, 4, 3)).astype(np.float32))
    a_v, r_v = fields.apply_stacked_fields(stacked, cfg, pts, dirs)
    for k in range(3):
        single = jax.tree.map(lambda x: x[k], stacked)
        a_k, r_k = fields.apply_field(single, cfg, pts[k], dirs[k])
        np.testing.assert_allclose(np.asarray(a_v[k]), np.asarray(a_k), atol=1e-5)
        np.testing.assert_allclose(np.asarray(r_v[k]), np.asarray(r_k), atol=1e-5)


def test_residual_blocks_start_as_identity():
    """fc1 weights start at zero (reference resnet.py:37), so the trunk is
    initially lin_out(relu(lin_in(x)))."""
    cfg = CFG.static_field()
    params = fields.init_field(jax.random.PRNGKey(4), cfg)
    for blk in params["blocks"]:
        assert float(jnp.sum(jnp.abs(blk["fc1"]["w"]))) == 0.0


def test_render_star_appinit_keys_and_shapes():
    params = star.init_star(jax.random.PRNGKey(5), CFG)
    rays_o, rays_d = _rays(8)
    out = star.render_star(
        params, CFG, rays_o, rays_d, key=jax.random.PRNGKey(6), pose=None, train=True
    )
    S = CFG.n_samples
    assert out["rgb0"].shape == (8, 3)
    assert out["rgb"].shape == (8, 3)
    assert out["weights0"].shape == (8, S)
    assert out["weights"].shape == (8, S + CFG.n_importance)
    assert out["z_std"].shape == (8,)


def test_render_star_online_shapes():
    params = star.init_star(jax.random.PRNGKey(7), CFG)
    rays_o, rays_d = _rays(8)
    pose = lie.se3_identity(CFG.num_vehicles)
    out = star.render_star(
        params, CFG, rays_o, rays_d, key=jax.random.PRNGKey(8), pose=pose, train=True
    )
    K = CFG.num_vehicles
    assert out["rgb"].shape == (8, 3)
    assert out["rgb_dynamic"].shape == (8, K, 3)
    assert out["dynamic_transmittance"].shape == (8, K)
    for k in ["loss_alpha_entropy", "loss_ray_reg"]:
        assert np.isfinite(float(out[k]))


@pytest.mark.slow
def test_pose_gradients_flow():
    """Photometric loss must produce nonzero gradients on the SE(3) pose —
    the mechanism that makes online tracking work."""
    params = star.init_star(jax.random.PRNGKey(9), CFG)
    rays_o, rays_d = _rays(16, seed=4)
    target = jnp.asarray(np.random.default_rng(5).uniform(size=(16, 3)).astype(np.float32))

    def loss_fn(tau):
        pose = lie.se3_exp(tau)
        out = star.render_star(
            params, CFG, rays_o, rays_d, key=jax.random.PRNGKey(10), pose=pose, train=True
        )
        return jnp.mean((out["rgb"] - target) ** 2) + jnp.mean((out["rgb0"] - target) ** 2)

    tau = jnp.zeros((CFG.num_vehicles, 6)) + 0.05
    g = jax.grad(loss_fn)(tau)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


@pytest.mark.slow
def test_batch_gradient_isolation():
    """Backprop one ray's output; all other rays' inputs get zero gradient
    (reference CheckBatchGradient, callbacks/check_batch_grad.py:7-51)."""
    cfg = dataclasses.replace(CFG, perturb=0.0)
    params = star.init_star(jax.random.PRNGKey(11), cfg)
    rays_o, rays_d = _rays(6, seed=6)
    pose = lie.se3_identity(cfg.num_vehicles)

    def one_ray_loss(o):
        out = star.render_star(params, cfg, o, rays_d, key=None, pose=pose, train=False)
        return jnp.sum(out["rgb"][0]) + jnp.sum(out["rgb0"][0])

    g = np.asarray(jax.grad(one_ray_loss)(rays_o))
    assert np.any(g[0] != 0.0), "selected ray should have gradient"
    np.testing.assert_array_equal(g[1:], 0.0)


def test_render_jits_and_is_deterministic_at_eval():
    params = star.init_star(jax.random.PRNGKey(12), CFG)
    rays_o, rays_d = _rays(8, seed=7)
    pose = lie.se3_identity(CFG.num_vehicles)

    @jax.jit
    def render(p, o, d, pose):
        return star.render_star(p, CFG, o, d, key=None, pose=pose, train=False)

    out1 = render(params, rays_o, rays_d, pose)
    out2 = render(params, rays_o, rays_d, pose)
    np.testing.assert_array_equal(np.asarray(out1["rgb"]), np.asarray(out2["rgb"]))


def test_nerf_time_render():
    from startrax.models import nerf_time

    params = nerf_time.init_nerf_time(jax.random.PRNGKey(13), CFG)
    rays_o, rays_d = _rays(8, seed=8)
    out = nerf_time.render_nerf_time(
        params, CFG, rays_o, rays_d, frame=jnp.asarray(3), num_frames=16,
        key=jax.random.PRNGKey(14), train=True,
    )
    assert out["rgb"].shape == (8, 3)
    # different times give different outputs (time is actually wired in)
    out2 = nerf_time.render_nerf_time(
        params, CFG, rays_o, rays_d, frame=jnp.asarray(9), num_frames=16,
        key=jax.random.PRNGKey(14), train=True,
    )
    assert float(jnp.max(jnp.abs(out["rgb"] - out2["rgb"]))) > 0.0


def test_mip_render_shapes():
    from startrax.models import mip

    mcfg = mip.MipConfig(
        num_vehicles=2, depth=4, width=32, n_samples=16, n_importance=16,
        near=2.0, far=6.0, compute_dtype=jnp.float32,
    )
    params = mip.init_star_mip(jax.random.PRNGKey(15), mcfg)
    rays_o, rays_d = _rays(8, seed=9)
    out = mip.render_star_mip(
        params, mcfg, rays_o, rays_d, key=jax.random.PRNGKey(16), pose=None, train=True
    )
    assert out["rgb"].shape == (8, 3) and out["rgb0"].shape == (8, 3)

    pose = lie.se3_identity(mcfg.num_vehicles)
    out_online = mip.render_star_mip(
        params, mcfg, rays_o, rays_d, key=jax.random.PRNGKey(17), pose=pose, train=True
    )
    assert out_online["rgb_dynamic"].shape == (8, 2, 3)
    assert np.isfinite(float(out_online["loss_alpha_entropy"]))
