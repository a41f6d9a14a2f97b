"""Tests for the occupancy grid, visualization helpers, and mesh extraction."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from startrax.kernels import occgrid
from startrax.utils import mesh as mesh_mod
from startrax.utils import vis


OCC = occgrid.OccGridConfig(
    resolution=32, aabb_min=(-1, -1, -1), aabb_max=(1, 1, 1),
    occ_threshold=1e-2, render_step_size=0.05, n_march=64, n_selected=24,
    update_fraction=1.0,
)


def _blob_density(pts, center=(0.3, 0.0, 0.0), radius=0.2, peak=50.0):
    d2 = jnp.sum((pts - jnp.asarray(center)) ** 2, axis=-1)
    return peak * jnp.exp(-d2 / (2 * radius * radius))


def test_grid_update_marks_blob():
    grid = occgrid.init_grid(OCC)
    grid = occgrid.update_grid(grid, _blob_density, jax.random.PRNGKey(0), OCC)
    occ = np.asarray(occgrid.occupancy(grid, OCC))
    # after a full refresh, cells near the blob occupied, far corners not
    assert occ[21, 16, 16]  # (0.3, 0, 0) cell ~ index 20-21
    assert not occ[2, 2, 2]
    frac = occ.mean()
    assert 0.001 < frac < 0.2, f"occupancy fraction {frac}"


def test_march_selects_only_occupied():
    grid = occgrid.init_grid(OCC)
    grid = occgrid.update_grid(grid, _blob_density, jax.random.PRNGKey(1), OCC)
    # ray through the blob center
    rays_o = jnp.asarray([[-2.0, 0.0, 0.0], [-2.0, 0.95, 0.95]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    z_sel, valid, n_occ = occgrid.march_and_select(grid, OCC, rays_o, rays_d, 0.5, 4.0)
    assert z_sel.shape == (2, OCC.n_selected)
    v0 = np.asarray(valid[0])
    assert v0.sum() > 0, "ray through blob should hit occupied cells"
    # samples are depth-ordered with valid block first
    first_invalid = np.argmax(~v0) if (~v0).any() else len(v0)
    assert v0[:first_invalid].all() and not v0[first_invalid:].any()
    # valid z positions are inside the blob region in world space
    z_valid = np.asarray(z_sel[0])[v0]
    x_world = -2.0 + z_valid
    # occupied where density*step > thresh: |x - 0.3| < ~0.66 for this blob
    assert np.all(np.abs(x_world - 0.3) < 0.75)
    # ray missing the blob has no valid samples
    assert np.asarray(valid[1]).sum() == 0


def test_masked_alpha_zeroes_invalid():
    raw = jnp.zeros((2, 4))
    valid = jnp.asarray([[True, False, True, False], [False] * 4])
    masked = occgrid.masked_raw_alpha(raw, valid)
    a = 1.0 - np.exp(-np.log1p(np.exp(np.asarray(masked))) * 0.1)
    assert a[0, 1] < 1e-6 and a[1, 0] < 1e-6
    assert a[0, 0] > 0.01


def test_occgrid_render_matches_dense_on_coarse_scene():
    """Compositing with occgrid-selected samples approximates dense sampling
    when the grid is well-fitted."""
    from startrax.ops.compositing import raw2outputs

    grid = occgrid.init_grid(OCC)
    for s in range(3):
        grid = occgrid.update_grid(grid, _blob_density, jax.random.PRNGKey(s), OCC)

    rays_o = jnp.asarray([[-2.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]])

    # dense reference
    z_dense = jnp.linspace(0.5, 4.0, 256)[None]
    pts = rays_o[:, None] + rays_d[:, None] * z_dense[..., None]
    sigma = _blob_density(pts)
    raw = jnp.log(jnp.expm1(jnp.maximum(sigma, 1e-6)))  # inverse softplus
    rgbraw = jnp.full(pts.shape, 2.0)
    dense = raw2outputs(raw, rgbraw, z_dense, rays_d)

    z_sel, valid, n_occ = occgrid.march_and_select(grid, OCC, rays_o, rays_d, 0.5, 4.0)
    pts_s = rays_o[:, None] + rays_d[:, None] * z_sel[..., None]
    sigma_s = _blob_density(pts_s)
    raw_s = occgrid.masked_raw_alpha(jnp.log(jnp.expm1(jnp.maximum(sigma_s, 1e-6))), valid)
    sparse = raw2outputs(raw_s, jnp.full(pts_s.shape, 2.0), z_sel, rays_d)

    np.testing.assert_allclose(float(sparse["acc"][0]), float(dense["acc"][0]), atol=0.05)
    np.testing.assert_allclose(
        float(sparse["depth"][0]), float(dense["depth"][0]), atol=0.1
    )


def test_march_counts_occupied_before_truncation():
    """n_occupied reports pre-truncation counts so callers can track the
    dropped fraction (reference bounds total samples instead,
    train_app_init_nerfacc.py:99-105)."""
    tight = dataclasses.replace(OCC, n_selected=4)
    grid = occgrid.init_grid(tight)
    grid = occgrid.update_grid(grid, _blob_density, jax.random.PRNGKey(1), tight)
    rays_o = jnp.asarray([[-2.0, 0.0, 0.0]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0]])
    z_sel, valid, n_occ = occgrid.march_and_select(grid, tight, rays_o, rays_d, 0.5, 4.0)
    n_occ = int(n_occ[0])
    assert n_occ > tight.n_selected, "test scene must overflow the tiny budget"
    assert int(np.asarray(valid[0]).sum()) == tight.n_selected
    # with a big-enough budget nothing is dropped and counts agree
    z2, v2, n2 = occgrid.march_and_select(grid, OCC, rays_o, rays_d, 0.5, 4.0)
    assert int(n2[0]) == int(np.asarray(v2[0]).sum()) == n_occ


@pytest.mark.slow
def test_star_occgrid_pair_matches_dense_compositing():
    """The static+dynamic occgrid pair (reference models/star_nerfacc.py:23-166)
    equals raw2outputs_star over the same samples when nothing is truncated,
    and pose gradients flow through the warp."""
    from startrax.models import star_occgrid
    from startrax.models.star import StarConfig
    from startrax.ops import lie
    from startrax.ops.compositing import raw2outputs_star
    from startrax.models.fields import apply_field, apply_stacked_fields

    # near/far keep the march inside the occupancy AABB so the warmup grid
    # (everything occupied) yields all-valid samples
    cfg = StarConfig(
        num_vehicles=1, netdepth=2, netdepth_fine=2, netwidth=16, netwidth_fine=16,
        n_samples=16, n_importance=0, near=1.2, far=2.8, compute_dtype=jnp.float32,
    )
    params = star_occgrid.init_star_occgrid(jax.random.PRNGKey(0), cfg)
    grid = occgrid.init_grid(OCC)  # step 0 -> warmup: everything occupied
    occ_all = dataclasses.replace(OCC, n_selected=OCC.n_march)

    rays_o = jnp.asarray([[-2.0, 0.0, 0.0], [-2.0, 0.3, 0.1]])
    rays_d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    pose = lie.se3_identity(1)

    out = star_occgrid.render_star_occgrid(
        params, cfg, grid, occ_all, rays_o, rays_d, pose=pose
    )
    assert bool(jnp.all(out["valid"]))

    # dense re-computation over the same z
    z = out["z_vals"]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    fcfg = cfg.static_field()
    ras, rrs = apply_field(params["static"], fcfg, pts, viewdirs)
    from startrax.models.star import warp_to_vehicle_frames

    pd, dd = warp_to_vehicle_frames(pose, pts, viewdirs)
    rad, rrd = apply_stacked_fields(params["dynamic"], fcfg, pd, dd)
    want = raw2outputs_star(
        ras, rrs, jnp.moveaxis(rad, 0, 1), jnp.moveaxis(rrd, 0, 1), z, rays_d,
        far_dist=cfg.far_dist,
    )
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(want["rgb"]), atol=1e-5)

    # pose gradient flows through the occgrid render
    def f(p7):
        o = star_occgrid.render_star_occgrid(
            params, cfg, grid, occ_all, rays_o, rays_d, pose=p7
        )
        return jnp.sum(o["rgb"])

    g = jax.grad(f)(pose)
    assert np.all(np.isfinite(np.asarray(g)))

    # joint density includes the dynamic field
    dens = star_occgrid.joint_density_fn(params, cfg, pose)(pts.reshape(-1, 3))
    dens_static = star_occgrid.joint_density_fn(params, cfg, None)(pts.reshape(-1, 3))
    assert dens.shape == (pts.reshape(-1, 3).shape[0],)
    assert float(jnp.max(jnp.abs(dens - dens_static))) > 0  # dynamic adds density


# ------------------------------- vis --------------------------------------


def test_visualize_depth_shapes_and_range():
    d = np.random.default_rng(0).uniform(2, 6, (16, 16)).astype(np.float32)
    img = vis.visualize_depth(d)
    assert img.shape == (16, 16, 3)
    assert img.min() >= 0 and img.max() <= 1
    batched = vis.visualize_depth(np.stack([d, d]))
    assert batched.shape == (2, 16, 16, 3)


def test_project_points_center():
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    w2c = np.eye(4)
    pts = np.array([[0.0, 0.0, -5.0]])  # straight ahead (NeRF -z forward)
    px = vis.project_points(pts, K, w2c)
    np.testing.assert_allclose(px, [[32.0, 32.0]], atol=1e-5)


def test_draw_box_runs():
    img = np.zeros((64, 64, 3), np.uint8)
    corners = np.array(
        [[10 + 20 * ((c >> 0) & 1), 10 + 20 * ((c >> 1) & 1)] for c in range(8)], float
    )
    out = vis.draw_box(img, corners)
    assert out.sum() > 0  # lines drawn


# ------------------------------- mesh -------------------------------------


def test_marching_tetrahedra_sphere():
    n = 48
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    sdf = 0.6 - np.linalg.norm(g, axis=-1)  # inside sphere radius 0.6
    verts, faces = mesh_mod.marching_tetrahedra(sdf, 0.0, bounds=(-1, 1))
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.02)
    assert np.abs(r - 0.6).max() < 0.08


def test_extract_mesh_writes_obj(tmp_path):
    def density(pts):
        return 100.0 * (np.linalg.norm(pts, axis=-1) < 0.5)

    path = tmp_path / "m.obj"
    verts, faces = mesh_mod.extract_mesh(density, str(path), resolution=24, sigma_threshold=50.0)
    text = path.read_text()
    assert text.count("v ") == len(verts)
    assert text.count("f ") == len(faces)
    assert len(verts) > 0


def test_query_density_and_opacity():
    import jax
    import jax.numpy as jnp
    from startrax.models import fields

    cfg = fields.FieldConfig(depth=4, width=32, compute_dtype=jnp.float32)
    params = fields.init_field(jax.random.PRNGKey(0), cfg)
    pts = jnp.asarray(np.random.default_rng(0).normal(size=(16, 3)).astype(np.float32))
    d = fields.query_density(params, cfg, pts)
    assert d.shape == (16,) and bool(jnp.all(d >= 0))
    o = fields.query_opacity(params, cfg, pts, step_size=0.01)
    assert bool(jnp.all((o >= 0) & (o <= 1)))
    rgb = fields.query_rgb(params, cfg, pts)
    assert rgb.shape == (16, 3) and bool(jnp.all((rgb >= 0) & (rgb <= 1)))


def test_extract_color_mesh(tmp_path):
    def density(pts):
        return 100.0 * (np.linalg.norm(pts, axis=-1) < 0.5)

    def rgb(pts):
        return np.tile([[1.0, 0.0, 0.0]], (len(pts), 1))

    path = tmp_path / "c.obj"
    verts, faces, colors = mesh_mod.extract_color_mesh(
        density, rgb, str(path), resolution=20, sigma_threshold=50.0
    )
    assert len(colors) == len(verts)
    line = path.read_text().splitlines()[0].split()
    assert len(line) == 7  # v x y z r g b


def test_gradient_isolation_diagnostic():
    import dataclasses
    import jax
    import jax.numpy as jnp
    from startrax.models.star import StarConfig, init_star, render_star
    from startrax.train.diagnostics import check_batch_gradient_isolation

    cfg = StarConfig(num_vehicles=1, netdepth=4, netdepth_fine=4, netwidth=16,
                     netwidth_fine=16, n_samples=8, n_importance=8, near=2.0,
                     far=6.0, compute_dtype=jnp.float32, perturb=0.0)
    params = init_star(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "rays_o": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
        "rays_d": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
    }
    check_batch_gradient_isolation(
        lambda o, d: render_star(params, cfg, o, d, key=None, pose=None, train=False),
        batch,
    )

    # a mixing renderer must be caught
    def mixing(o, d):
        out = render_star(params, cfg, o, d, key=None, pose=None, train=False)
        out = dict(out)
        out["rgb"] = out["rgb"] + 0.01 * jnp.mean(out["rgb"], axis=0, keepdims=True)
        return out

    with pytest.raises(AssertionError, match="mixing"):
        check_batch_gradient_isolation(mixing, batch)


def test_sigma_loss_isolation_diagnostic():
    import jax.numpy as jnp
    from startrax.models.star import StarConfig, init_star, render_star
    from startrax.train.diagnostics import check_sigma_loss_isolation

    cfg = StarConfig(num_vehicles=1, netdepth=4, netdepth_fine=4, netwidth=16,
                     netwidth_fine=16, n_samples=8, n_importance=8, near=2.0,
                     far=6.0, compute_dtype=jnp.float32, perturb=0.0)
    params = init_star(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(1)
    batch = {
        "rays_o": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
        "rays_d": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
        "target_depth": jnp.asarray(rng.uniform(3, 5, size=(4,)).astype(np.float32)),
    }
    check_sigma_loss_isolation(
        lambda o, d: render_star(params, cfg, o, d, key=None, pose=None, train=False),
        batch,
    )
