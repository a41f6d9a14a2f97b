"""Multi-device tests on the virtual 8-device CPU mesh: sharded training
steps match single-device results, and the graft dry-run entry works."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from startrax.models.star import StarConfig
from startrax.parallel import mesh as meshlib
from startrax.train import loop, optim

CFG = StarConfig(
    num_vehicles=1, netdepth=4, netdepth_fine=4, netwidth=32, netwidth_fine=32,
    n_samples=16, n_importance=16, near=2.0, far=6.0, compute_dtype=jnp.float32,
    perturb=0.0,
)


def _batch(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "rays_o": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "target": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        "frame": jnp.asarray(1, jnp.int32),
    }


def test_mesh_has_8_devices():
    mesh = meshlib.make_mesh()
    assert mesh.size == 8


def test_shard_batch_layout():
    mesh = meshlib.make_mesh()
    batch = meshlib.shard_batch(_batch(64), mesh)
    assert batch["rays_o"].sharding.is_equivalent_to(
        NamedSharding(mesh, P(meshlib.RAY_AXIS)), 2
    )
    # scalar frame is replicated
    assert batch["frame"].sharding.is_fully_replicated


def test_shard_batch_is_explicit_per_key():
    """Sharding is decided by KEY, not shape: a poison aux array whose
    leading dim equals the mesh size must stay replicated (the old
    divisibility heuristic would silently ray-shard it — VERDICT r4)."""
    mesh = meshlib.make_mesh()
    b = _batch(64)
    b["poses"] = jnp.ones((mesh.size, 7), jnp.float32)  # [8, 7] aux table
    b["aux_table"] = jnp.ones((2 * mesh.size, 3), jnp.float32)
    out = meshlib.shard_batch(b, mesh)
    assert out["poses"].sharding.is_fully_replicated
    assert out["aux_table"].sharding.is_fully_replicated
    # per-ray frame indices ARE sharded; scalar frames replicated
    b2 = _batch(64)
    b2["frame"] = jnp.zeros((64,), jnp.int32)
    out2 = meshlib.shard_batch(b2, mesh)
    assert out2["frame"].sharding.is_equivalent_to(
        NamedSharding(mesh, P(meshlib.RAY_AXIS)), 1
    )
    # a ray key with a non-divisible leading dim is an error, not a silent
    # replication
    b3 = _batch(64)
    b3["rays_o"] = jnp.ones((63, 3), jnp.float32)
    with pytest.raises(ValueError, match="not divisible"):
        meshlib.shard_batch(b3, mesh)
    # extra_ray_keys extends the registry
    b4 = _batch(64)
    b4["my_weights"] = jnp.ones((64,), jnp.float32)
    out4 = meshlib.shard_batch(b4, mesh, extra_ray_keys=("my_weights",))
    assert out4["my_weights"].sharding.is_equivalent_to(
        NamedSharding(mesh, P(meshlib.RAY_AXIS)), 1
    )


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    """DP over rays must be semantics-preserving: the sharded train step
    produces the same loss and parameter update as the unsharded one."""
    params = loop.init_online_params(jax.random.PRNGKey(0), CFG, num_frames=3)
    tx = optim.make_star_optimizer(
        params, lrate_static=1e-3, lrate_dynamic=1e-3, lrate_pose=1e-2, grad_clip=1.0
    )
    step = loop.make_online_train_step(CFG, loop.LossConfig(), tx)

    batch = _batch(64, seed=3)
    key = jax.random.PRNGKey(4)
    epoch = jnp.asarray(0)

    p1, o1, l1, _ = step(params, tx.init(params), batch, key, epoch)

    mesh = meshlib.make_mesh()
    sharded_batch = meshlib.shard_batch(dict(batch), mesh)
    rp = meshlib.replicate_params(params, mesh)
    p2, o2, l2, _ = step(rp, tx.init(rp), sharded_batch, key, epoch)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_eval_render_image_tiled_sharded():
    from startrax.eval.render import render_image
    from startrax.ops import lie

    params = loop.init_online_params(jax.random.PRNGKey(5), CFG, num_frames=3)
    H, W = 16, 24
    rng = np.random.default_rng(6)
    rays_o = rng.normal(size=(H, W, 3)).astype(np.float32)
    rays_d = rng.normal(size=(H, W, 3)).astype(np.float32)
    mesh = meshlib.make_mesh()
    out = render_image(
        params["nerf"], CFG, rays_o, rays_d, pose=lie.se3_identity(1),
        tile=128, mesh=mesh, with_test_outputs=True,
    )
    assert out["rgb"].shape == (H, W, 3)
    assert out["depth"].shape == (H, W)
    assert out["dynamic_transmittance"].shape == (H, W, 1)
    assert out["rgb_dynamic_all"].shape == (H, W, 3)
    assert np.all(np.isfinite(out["rgb"]))


def test_graft_dryrun_multichip():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    lowered = jax.jit(fn).lower(*args)  # compile-check without running the
    assert lowered is not None          # full-size model on CPU
