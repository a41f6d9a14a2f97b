"""Tests for optimizers, curriculum, checkpointing, and the train steps."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from startrax.models.star import StarConfig, init_star
from startrax.ops import lie
from startrax.train import loop, optim
from startrax.train.curriculum import CurriculumConfig, CurriculumState, advance
from startrax.train import checkpoint as ckpt

CFG = StarConfig(
    num_vehicles=1, netdepth=4, netdepth_fine=4, netwidth=32, netwidth_fine=32,
    n_samples=16, n_importance=16, near=2.0, far=6.0, compute_dtype=jnp.float32,
)


def _batch(n=32, seed=0, with_frame=True):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    b = {
        "rays_o": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
        "rays_d": jnp.asarray(d),
        "target": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
    }
    if with_frame:
        b["frame"] = jnp.asarray(2, jnp.int32)
    return b


# ----------------------------- schedules ----------------------------------


def test_multistep_schedule():
    s = optim.make_schedule(1e-3, decay_rate=0.5, decay_milestones=[10, 20], steps_per_epoch=2)
    assert float(s(0)) == pytest.approx(1e-3)
    assert float(s(20)) == pytest.approx(5e-4)  # epoch 10
    assert float(s(40)) == pytest.approx(2.5e-4)  # epoch 20


def test_step_schedule():
    s = optim.make_schedule(1e-3, decay_rate=0.5, decay_epochs=10, steps_per_epoch=1)
    assert float(s(9)) == pytest.approx(1e-3)
    assert float(s(10)) == pytest.approx(5e-4)
    assert float(s(25)) == pytest.approx(2.5e-4)


def test_star_optimizer_groups_step_atomically():
    params = loop.init_online_params(jax.random.PRNGKey(0), CFG, num_frames=4)
    tx = optim.make_star_optimizer(
        params, lrate_static=1e-3, lrate_dynamic=1e-3, lrate_pose=1e-2, grad_clip=None
    )
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # both the nerf and the pose subtrees received updates in one step
    assert float(jnp.abs(updates["poses"]).max()) > 0
    assert float(jnp.abs(updates["nerf"]["static_coarse"]["lin_in"]["w"]).max()) > 0


def test_grad_accumulation():
    params = {"nerf": {"static_coarse": {"w": jnp.zeros(3)}}, "poses": jnp.zeros((1, 1, 7))}
    tx = optim.make_star_optimizer(
        params, lrate_static=1e-2, lrate_dynamic=1e-2, lrate_pose=1e-2,
        grad_clip=None, accumulate_steps=3,
    )
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    p = params
    for i in range(2):  # first 2 of 3 accumulation steps: no param change
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)
        assert float(jnp.abs(p["poses"]).max()) == 0.0
    updates, state = tx.update(g, state, p)
    p = optax.apply_updates(p, updates)
    assert float(jnp.abs(p["poses"]).max()) > 0.0


# ----------------------------- curriculum ---------------------------------


def test_curriculum_initial_advance_and_tighten():
    cfg = CurriculumConfig(num_frames=8, initial_num_frames=5, online_thres=1e-3)
    s = CurriculumState.initial(cfg)
    assert s.current_frame == 5
    s = advance(s, cfg, 2e-3)  # above threshold: no advance
    assert s.current_frame == 5
    s = advance(s, cfg, 9e-4)  # advances, threshold tightens
    assert s.current_frame == 6 and s.threshold == pytest.approx(95e-5)


def test_curriculum_waits_70_epochs():
    cfg = CurriculumConfig(num_frames=8, initial_num_frames=5)
    s = CurriculumState.initial(cfg)
    s = advance(s, cfg, 1e-4)  # 5 -> 6
    for _ in range(70):  # loss always good, but must wait out the counter
        s = advance(s, cfg, 1e-6)
        assert s.current_frame == 6
    s = advance(s, cfg, 1e-6)  # epoch 71 since advance: goes
    assert s.current_frame == 7


def test_curriculum_stops_at_num_frames():
    cfg = CurriculumConfig(num_frames=6, initial_num_frames=5, min_epochs_between=0)
    s = CurriculumState.initial(cfg)
    s = advance(s, cfg, 1e-6)  # -> 6
    s = advance(s, cfg, 1e-6)  # -> 7 > num_frames: done
    assert s.done


# ----------------------------- train steps --------------------------------


def test_appinit_step_reduces_loss():
    params = init_star(jax.random.PRNGKey(0), CFG)
    tx = optim.make_appinit_optimizer(5e-3)
    opt_state = tx.init(params)
    step = loop.make_appinit_train_step(CFG, loop.LossConfig(), tx)
    batch = _batch(64, with_frame=False)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, lossv, _ = step(params, opt_state, batch, sub)
        losses.append(float(lossv))
    assert losses[-1] < losses[0]


def test_online_step_updates_poses_and_normalizes_quats():
    params = loop.init_online_params(jax.random.PRNGKey(2), CFG, num_frames=4)
    tx = optim.make_star_optimizer(
        params, lrate_static=1e-3, lrate_dynamic=1e-3, lrate_pose=1e-2
    )
    opt_state = tx.init(params)
    step = loop.make_online_train_step(
        CFG, loop.LossConfig(lambda_alpha_entropy=1e-3, lambda_ray_reg=1e-5), tx
    )
    batch = _batch(64, seed=1)
    p0 = np.asarray(params["poses"])
    params, opt_state, lossv, metrics = step(
        params, opt_state, batch, jax.random.PRNGKey(3), jnp.asarray(0)
    )
    p1 = np.asarray(params["poses"])
    # frame-2 pose moved (it was rendered), quaternions stay unit
    assert np.abs(p1 - p0).max() > 0
    np.testing.assert_allclose(np.linalg.norm(p1[..., 3:7], axis=-1), 1.0, atol=1e-5)
    assert np.isfinite(float(lossv))
    assert "fine_loss" in metrics


def test_online_step_mixed_frame_batch():
    """Per-ray frame indices: every frame's pose must receive gradient in a
    single step (the TPU mixed-frame batch capability; one-frame-per-batch is
    the reference's datasets/carla_star_online__.py:287 behavior)."""
    tx = optim.make_fused_star_optimizer(
        loop.init_online_params(jax.random.PRNGKey(0), CFG, num_frames=4),
        lrate_static=1e-3, lrate_dynamic=1e-3, lrate_pose=1e-2,
        steps_per_epoch=10, grad_clip=1.0,
    )
    params = loop.init_online_params(jax.random.PRNGKey(0), CFG, num_frames=4)
    opt_state = tx.init(params)
    step_fn = loop.make_online_train_step(CFG, loop.LossConfig(), tx)

    b = _batch(n=48, with_frame=False)
    # rays from frames 1, 2, 3 mixed in one batch
    b["frame"] = jnp.asarray(np.tile(np.array([1, 2, 3], np.int32), 16))
    before = np.asarray(params["poses"])
    params2, _, lossv, metrics = step_fn(params, opt_state, b, jax.random.PRNGKey(1),
                                         jnp.asarray(0))
    after = np.asarray(params2["poses"])
    assert np.isfinite(float(lossv))
    for f in range(3):  # all three in-window poses moved
        assert np.abs(after[f] - before[f]).max() > 0
    # quats still normalized
    np.testing.assert_allclose(
        np.linalg.norm(after[..., 3:7], axis=-1), 1.0, atol=1e-5
    )


@pytest.mark.slow
def test_online_step_depth_supervision():
    """DS-NeRF depth supervision in the online step (reference
    models/loss.py:4-9 + train_online__.py:265): the depth_loss metric is
    emitted, and depth supervision changes the pose update — depth constrains
    the vehicles along the ray, which photometric loss alone does not."""
    params = loop.init_online_params(jax.random.PRNGKey(7), CFG, num_frames=4)
    tx = optim.make_star_optimizer(
        params, lrate_static=1e-3, lrate_dynamic=1e-3, lrate_pose=1e-2
    )
    opt_state = tx.init(params)
    b = _batch(64, seed=5)
    rng = np.random.default_rng(6)
    b["target_depth"] = jnp.asarray(
        rng.uniform(CFG.near + 0.5, CFG.far - 0.5, size=(64,)).astype(np.float32)
    )

    step_plain = loop.make_online_train_step(CFG, loop.LossConfig(), tx)
    step_depth = loop.make_online_train_step(
        CFG, loop.LossConfig(use_depth_loss=True, depth_lambda=0.1), tx
    )
    p_plain, _, _, _ = step_plain(params, opt_state, b, jax.random.PRNGKey(8),
                                  jnp.asarray(0))
    p_depth, _, lossv, metrics = step_depth(params, opt_state, b,
                                            jax.random.PRNGKey(8), jnp.asarray(0))
    assert np.isfinite(float(lossv))
    assert np.isfinite(float(metrics["depth_loss"]))
    assert float(metrics["depth_loss"]) > 0
    assert np.abs(np.asarray(p_depth["poses"]) - np.asarray(p_plain["poses"])).max() > 0


def test_depth_and_sigma_supervision_coarse_only():
    """depth_loss/sigma_loss with N_importance=0 supervise the coarse
    ("0"-suffixed) outputs instead of raising KeyError on the missing fine
    keys (ADVICE r3)."""
    cfg0 = dataclasses.replace(CFG, n_importance=0)
    params = loop.init_online_params(jax.random.PRNGKey(7), cfg0, num_frames=4)
    tx = optim.make_star_optimizer(
        params, lrate_static=1e-3, lrate_dynamic=1e-3, lrate_pose=1e-2
    )
    opt_state = tx.init(params)
    b = _batch(32, seed=5)
    rng = np.random.default_rng(6)
    b["target_depth"] = jnp.asarray(
        rng.uniform(CFG.near + 0.5, CFG.far - 0.5, size=(32,)).astype(np.float32)
    )
    step = loop.make_online_train_step(
        cfg0, loop.LossConfig(use_depth_loss=True, depth_lambda=0.1,
                              use_sigma_loss=True, sigma_lambda=0.01), tx
    )
    _, _, lossv, metrics = step(params, opt_state, b, jax.random.PRNGKey(8),
                                jnp.asarray(0))
    assert np.isfinite(float(lossv))
    assert float(metrics["depth_loss"]) > 0
    assert np.isfinite(float(metrics["sigma_loss"]))


@pytest.mark.slow
def test_gauge_step_depth_term():
    """gauge_depth_lambda adds the DS-NeRF depth term to the gauge fit: the
    step runs with target_depth in the batch and the depth term changes the
    fitted gauge (the photometric landscape along the drift is flat — depth
    is the term that slopes it, VERDICT r3 item 1)."""
    params = loop.init_online_params(jax.random.PRNGKey(8), CFG, num_frames=4)
    b = _batch(n=32, with_frame=True)
    rng = np.random.default_rng(9)
    b["target_depth"] = jnp.asarray(
        rng.uniform(CFG.near + 0.5, CFG.far - 0.5, size=(32,)).astype(np.float32)
    )
    tx = optax.adam(5e-3)

    def run(depth_lambda):
        gauge = jnp.asarray(lie.se3_identity(CFG.num_vehicles))
        opt_state = tx.init(gauge)
        step = loop.make_gauge_train_step(CFG, tx, freeze_rot=True,
                                          depth_lambda=depth_lambda)
        for i in range(3):
            gauge, opt_state, lossv = step(
                gauge, opt_state, params["nerf"], params["poses"], b,
                jax.random.PRNGKey(i))
        assert np.isfinite(float(lossv))
        return np.asarray(gauge)

    g_plain, g_depth = run(0.0), run(5.0)
    assert np.abs(g_depth[..., :3] - g_plain[..., :3]).max() > 0


@pytest.mark.slow
def test_mixed_frame_pose_matches_shared_pose():
    """A per-ray pose table where all rays share one frame must render
    identically to the shared-pose path."""
    from startrax.models.star import render_star

    params = loop.init_online_params(jax.random.PRNGKey(3), CFG, num_frames=4)
    b = _batch(n=16, with_frame=False)
    pose_shared = loop.gather_frame_pose(params["poses"], jnp.asarray(2), CFG.num_vehicles)
    frames = jnp.full((16,), 2, jnp.int32)
    pose_perray = loop.gather_frame_pose(params["poses"], frames, CFG.num_vehicles)
    assert pose_perray.shape == (16, CFG.num_vehicles, 7)
    out_a = render_star(params["nerf"], CFG, b["rays_o"], b["rays_d"], key=None,
                        pose=pose_shared, train=False)
    out_b = render_star(params["nerf"], CFG, b["rays_o"], b["rays_d"], key=None,
                        pose=pose_perray, train=False)
    np.testing.assert_allclose(np.asarray(out_a["rgb"]), np.asarray(out_b["rgb"]),
                               atol=1e-6)


def test_freeze_rot_keeps_rotations_moves_translations():
    """freeze_rot training steps keep each pose's current quaternion while
    translations stay free (coarse-to-fine warmup behavior)."""
    from startrax.train import optim

    params = loop.init_online_params(jax.random.PRNGKey(6), CFG, num_frames=4)
    params["poses"] = params["poses"] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(7), params["poses"].shape)
    q0 = np.asarray(params["poses"][..., 3:7]).copy()
    t0 = np.asarray(params["poses"][..., :3]).copy()
    tx = optim.make_fused_star_optimizer(params, 5e-3, 5e-3, 5e-3)
    opt_state = tx.init(params)
    step = loop.make_online_train_step(CFG, loop.LossConfig(), tx, freeze_rot=True)
    b = _batch(n=16, with_frame=True)
    for i in range(2):
        params, opt_state, lossv, m = step(
            params, opt_state, b, jax.random.PRNGKey(i), jnp.asarray(0))
    np.testing.assert_array_equal(np.asarray(params["poses"][..., 3:7]), q0)
    assert not np.allclose(np.asarray(params["poses"][..., :3]), t0)


def test_gauge_step_freeze_rot_translation_only():
    """gauge_freeze_rot: the shared gauge's quaternion stays exactly identity
    while its translation moves — the full-SE(3) fit's duplicate-mode jump
    (artifacts/e2e_r3_gauge_history.json epoch 36) is structurally excluded."""
    params = loop.init_online_params(jax.random.PRNGKey(8), CFG, num_frames=4)
    gauge = jnp.asarray(lie.se3_identity(CFG.num_vehicles))
    tx = optax.adam(5e-3)
    opt_state = tx.init(gauge)
    step = loop.make_gauge_train_step(CFG, tx, freeze_rot=True)
    b = _batch(n=16, with_frame=True)
    for i in range(2):
        gauge, opt_state, lossv = step(
            gauge, opt_state, params["nerf"], params["poses"], b,
            jax.random.PRNGKey(i))
    g = np.asarray(gauge)
    np.testing.assert_array_equal(
        g[..., 3:7], np.asarray(lie.se3_identity(CFG.num_vehicles))[..., 3:7])
    assert not np.allclose(g[..., :3], 0.0)


def test_gather_frame_pose_pins_frame0_identity():
    poses = jnp.asarray(np.random.default_rng(4).normal(size=(3, 2, 7)).astype(np.float32))
    p0 = loop.gather_frame_pose(poses, jnp.asarray(0), 2)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(lie.se3_identity(2)), atol=1e-6)
    p2 = loop.gather_frame_pose(poses, jnp.asarray(2), 2)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(poses[1]), atol=1e-6)


# ----------------------------- checkpoint ---------------------------------


def test_checkpoint_roundtrip(tmp_path):
    params = loop.init_online_params(jax.random.PRNGKey(5), CFG, num_frames=3)
    state = {"params": params, "step": jnp.asarray(7)}
    ckpt.save_checkpoint(str(tmp_path / "ck"), state, step=7)
    template = jax.tree.map(np.zeros_like, state)
    restored = ckpt.restore_checkpoint(str(tmp_path / "ck"), template)
    got = jax.tree.leaves(restored["params"])
    want = jax.tree.leaves(params)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=0)


def test_checkpoint_opt_state_resume(tmp_path):
    """Full-resume contract: a restored optimizer state must keep its pytree
    node types (optax NamedTuples, not plain dicts) and be steppable.
    Regression test for the round-1 advisor finding: PyTreeRestore without an
    item template returned dict nodes, crashing tx.update on resume."""
    params = loop.init_online_params(jax.random.PRNGKey(5), CFG, num_frames=3)
    tx = optim.make_fused_star_optimizer(
        params, lrate_static=1e-3, lrate_dynamic=1e-3, lrate_pose=1e-3,
        steps_per_epoch=4, grad_clip=1.0, accumulate_steps=2,
    )
    opt_state = tx.init(params)
    # advance one step so the saved state has non-trivial counts/moments
    g = jax.tree.map(jnp.ones_like, params)
    updates, opt_state = tx.update(g, opt_state, params)
    params = optax.apply_updates(params, updates)

    state = {"params": params, "opt_state": opt_state}
    ckpt.save_checkpoint(str(tmp_path / "ck"), state, step=1)
    template = {
        "params": loop.init_online_params(jax.random.PRNGKey(9), CFG, num_frames=3),
        "opt_state": tx.init(params),
    }
    restored = ckpt.restore_checkpoint(str(tmp_path / "ck"), template)

    # node types preserved: structure of restored state == freshly-init state
    assert jax.tree.structure(restored["opt_state"]) == jax.tree.structure(tx.init(params))
    # leaf values round-trip
    for g_, w_ in zip(jax.tree.leaves(restored["opt_state"]), jax.tree.leaves(opt_state)):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_), atol=0)
    # and the restored state is actually steppable (the resume crash path)
    updates2, _ = tx.update(g, restored["opt_state"], restored["params"])
    assert np.isfinite(np.asarray(jax.tree.leaves(updates2)[0])).all()


def test_restore_static_only():
    app = init_star(jax.random.PRNGKey(6), CFG)
    online = loop.init_online_params(jax.random.PRNGKey(7), CFG, num_frames=3)
    before_dyn = np.asarray(jax.tree.leaves(online["nerf"]["dynamic_coarse"])[0])
    merged = ckpt.restore_static_only(app, online)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(merged["nerf"]["static_coarse"])[0]),
        np.asarray(jax.tree.leaves(app["static_coarse"])[0]),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(merged["nerf"]["dynamic_coarse"])[0]), before_dyn
    )
    np.testing.assert_array_equal(np.asarray(merged["poses"]), np.asarray(online["poses"]))


def test_poses_txt_roundtrip(tmp_path):
    rng = np.random.default_rng(8)
    mats = np.tile(np.eye(4, dtype=np.float64), (5, 1, 1))
    mats[:, :3, 3] = rng.normal(size=(5, 3))
    p = tmp_path / "poses.txt"
    ckpt.save_poses_txt(str(p), mats)
    back = ckpt.load_poses_txt(str(p))
    np.testing.assert_allclose(back, mats, atol=1e-5)
    # file stores translations x100 (reference utils/io.py:497-519)
    raw = np.loadtxt(p).reshape(-1, 4, 4)
    np.testing.assert_allclose(raw[:, :3, 3], mats[:, :3, 3] * 100, atol=1e-4)


def test_gc_checkpoints(tmp_path):
    d = str(tmp_path / "ck")
    for s in range(5):
        ckpt.save_checkpoint(d, {"x": jnp.asarray(float(s))}, step=s)
    remaining = ckpt.gc_checkpoints(d, keep_last=2)
    assert remaining == [3, 4]
    restored = ckpt.restore_checkpoint(d)
    assert float(restored["x"]) == 4.0


@pytest.mark.slow
def test_schedule_accounts_for_accumulation():
    """With accumulate_steps=k, LR milestones must fire at the same epoch in
    micro-step terms (MultiSteps advances schedules per effective step)."""
    params = {"nerf": {"static_coarse": {"w": jnp.zeros(3)}}, "poses": jnp.zeros((1, 1, 7))}
    tx = optim.make_star_optimizer(
        params, lrate_static=1e-2, lrate_dynamic=1e-2, lrate_pose=1e-2,
        steps_per_epoch=10, decay_milestones=[2], decay_rate=0.5,
        grad_clip=None, accumulate_steps=5,
    )
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    p = params
    deltas = []
    prev = float(p["nerf"]["static_coarse"]["w"][0])
    for i in range(40):  # 4 epochs of 10 micro-steps
        updates, state = tx.update(g, state, p)
        p = optax.apply_updates(p, updates)
        cur = float(p["nerf"]["static_coarse"]["w"][0])
        if cur != prev:
            deltas.append(cur - prev)
            prev = cur
    # adam deltas equal -lr; after epoch 2 (4 effective steps) lr halves
    assert len(deltas) == 8
    early, late = abs(deltas[0]), abs(deltas[-1])
    assert late == pytest.approx(early * 0.5, rel=1e-3)


def test_sigma_loss_sentinel_mask():
    """sigma_loss max_dist masks the far_dist (1e10) filler sample. The
    reference multiplies that sentinel in unmasked (models/loss.py:56-63),
    but at its CARLA operating point the Gaussian annihilates it; on scenes
    whose background sits near the far plane the unmasked sentinel dominates
    by ~8 orders of magnitude (measured 4e9 vs 24,
    artifacts/sigma_calibration_r5.json)."""
    from startrax.ops.losses import sigma_loss

    R, S = 4, 8
    rng = np.random.default_rng(0)
    z = jnp.sort(jnp.asarray(rng.uniform(2.0, 8.0, size=(R, S)).astype(np.float32)), axis=1)
    w = jnp.asarray(rng.uniform(0.01, 0.2, size=(R, S)).astype(np.float32))
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((R, 1), 1e10, jnp.float32)], axis=1)
    gt = jnp.asarray(rng.uniform(6.5, 7.9, size=(R,)).astype(np.float32))

    raw = float(sigma_loss(w, z, dists, gt, 2.0, 8.0))
    masked = float(sigma_loss(w, z, dists, gt, 2.0, 8.0, max_dist=5e9))
    assert raw > 1e6  # sentinel dominates unmasked
    assert 0 < masked < 1e3
    # masking only the sentinel == computing on the finite dists
    dists_fin = dists.at[:, -1].set(0.0)
    ref = float(sigma_loss(w, z, dists_fin, gt, 2.0, 8.0))
    np.testing.assert_allclose(masked, ref, rtol=1e-6)
    # reference operating point (GT depths far below the far plane vs a
    # huge far): the sentinel term is ~0 either way -> masking is a no-op
    gt_far = jnp.asarray(rng.uniform(5.0, 20.0, size=(R,)).astype(np.float32))
    z_far = jnp.sort(jnp.asarray(rng.uniform(3.0, 80.0, size=(R, S)).astype(np.float32)), axis=1)
    d_far = jnp.concatenate(
        [z_far[:, 1:] - z_far[:, :-1], jnp.full((R, 1), 1e10, jnp.float32)], axis=1)
    raw_ref = float(sigma_loss(w, z_far, d_far, gt_far, 3.0, 80.0))
    masked_ref = float(sigma_loss(w, z_far, d_far, gt_far, 3.0, 80.0, max_dist=5e9))
    np.testing.assert_allclose(raw_ref, masked_ref, rtol=1e-4)
