"""App-level smoke tests: config parsing and short end-to-end training runs
through the real entry points on the synthetic dataset."""

import glob
import json
import os

import numpy as np
import pytest

from startrax.utils import config as config_mod


def test_parse_reference_style_config(tmp_path):
    p = tmp_path / "cfg.txt"
    p.write_text(
        """
expname = foo
N_rand = 1400
lrate = 5e-4
lrate_decay_steps = [80]
noisy_pose_init = True
mixed_precision = False
# comment line
scale_factor = 0.01
"""
    )
    cfg = config_mod.load_config(["--config", str(p), "--N_rand", "256"])
    assert cfg.expname == "foo"
    assert cfg.N_rand == 256  # CLI override wins
    assert cfg.lrate == pytest.approx(5e-4)
    assert cfg.lrate_decay_steps == [80]
    assert cfg.noisy_pose_init is True
    assert cfg.scale_factor == pytest.approx(0.01)


def test_all_shipped_configs_parse():
    """Every shipped experiment file parses, every key in it is a real
    Config field (parse_config_file silently drops unknown keys — a typo'd
    flag in a shipped config would otherwise be dead), and the result maps
    onto a StarConfig. Covers the 15 reference config ports."""
    cfg_dir = os.path.join(os.path.dirname(config_mod.__file__), "..", "configs")
    files = glob.glob(os.path.join(cfg_dir, "*.txt"))
    assert len(files) >= 15
    for f in files:
        with open(f) as fp:
            for line in fp:
                line = line.split("#", 1)[0].strip()
                if line and "=" in line:
                    key = line.split("=", 1)[0].strip()
                    assert key in config_mod._FIELDS, (f, key)
        values = config_mod.parse_config_file(f)
        assert "expname" in values, f
        cfg = config_mod.load_config(["--config", f])
        config_mod.star_config_from(cfg)


def test_star_config_mapping():
    cfg = config_mod.Config(mixed_precision=True, scale_factor=0.01, near=3.0, far=80.0)
    sc = config_mod.star_config_from(cfg)
    assert sc.near == pytest.approx(0.03)
    assert sc.far == pytest.approx(0.8)
    import jax.numpy as jnp

    assert sc.compute_dtype == jnp.bfloat16


def test_star_config_reference_numerics_and_i_embed():
    sc = config_mod.star_config_from(config_mod.Config(reference_numerics=True))
    assert sc.reference_numerics
    # i_embed=-1 -> identity embedding (reference models/embedder.py:38-54)
    sc = config_mod.star_config_from(config_mod.Config(i_embed=-1))
    assert sc.multires == 0 and sc.multires_views == 0
    with pytest.raises(ValueError):
        config_mod.star_config_from(config_mod.Config(i_embed=3))


def _tiny_synthetic_cfg(tmp_path, **overrides):
    base = dict(
        expname="smoke", basedir=str(tmp_path), dataset_type="synthetic",
        num_frames=6, num_vehicles=1, near=2.0, far=8.0, scale_factor=-1.0,
        netdepth=4, netdepth_fine=4, netwidth=32, netwidth_fine=32,
        N_samples=12, N_importance=12, N_rand=128, steps_per_epoch=10,
        epoch_val=100, epoch_ckpt=100, mixed_precision=False,
    )
    base.update(overrides)
    return config_mod.Config(**base)


@pytest.mark.slow
def test_app_init_smoke(tmp_path):
    from startrax.apps import app_init

    cfg = _tiny_synthetic_cfg(tmp_path, epochs_appearance=2, appearance_init_thres=1e-9)
    params = app_init.train(cfg)
    assert "static_coarse" in params
    # metrics were logged
    metrics_path = tmp_path / "smoke" / "app_init" / "metrics.jsonl"
    rows = [json.loads(l) for l in open(metrics_path)]
    assert any("train/fine_loss" in r for r in rows)


@pytest.mark.slow
def test_online_smoke_with_curriculum_and_ckpt(tmp_path):
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=2, online_thres=1e9,  # force an advance
        initial_num_frames=5, lambda_alpha_entropy=1e-3, lambda_ray_reg=1e-5,
        noisy_pose_init=True, epoch_val=1,
    )
    params = online.train(cfg)
    assert params["poses"].shape == (5, 1, 7)
    run_dir = tmp_path / "smoke" / "online"
    rows = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    # curriculum advanced since threshold was huge
    frames = [r["train/current_frame_num"] for r in rows if "train/current_frame_num" in r]
    assert max(frames) >= 6
    # val images rendered
    assert len(list((run_dir / "images").glob("*.png"))) > 0
    # checkpoints saved
    assert (run_dir / "ckpts").exists()


@pytest.mark.slow
def test_online_mixed_frames_smoke(tmp_path):
    """Online app with per-ray mixed-frame batches trains end-to-end."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=2, online_thres=1e-12, mixed_frames=True,
        car_sample_ratio=0.3,
    )
    params = online.train(cfg)
    assert params["poses"].shape[0] == cfg.num_frames - 1


def test_nerf_time_smoke(tmp_path):
    from startrax.apps import nerf_time

    cfg = _tiny_synthetic_cfg(tmp_path, epochs_online=1, online_thres=1e-9)
    params = nerf_time.train(cfg)
    assert "coarse" in params and "fine" in params


def test_occgrid_init_smoke(tmp_path):
    from startrax.apps import occgrid_init

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_appearance=2, appearance_init_thres=1e-9,
        grid_resolution=16, render_step_size=0.05, N_samples=32,
    )
    params, grid = occgrid_init.train(cfg)
    assert "lin_in" in params
    import numpy as np

    assert int(grid["step"]) > 0


def test_mip_app_init_smoke(tmp_path):
    from startrax.apps import mip as mip_app

    cfg = _tiny_synthetic_cfg(tmp_path, epochs_appearance=1, appearance_init_thres=1e-9)
    params = mip_app.train_app_init(cfg)
    assert "static" in params


@pytest.mark.slow
def test_online_trans_only(tmp_path):
    import numpy as np
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=1, online_thres=1e-12, pose_trans_only=True,
        noisy_pose_init=False,
    )
    params = online.train(cfg)
    q = np.asarray(params["poses"][..., 3:7])
    # quaternions pinned to identity; translations may move
    np.testing.assert_allclose(q[..., :3], 0.0, atol=1e-6)
    np.testing.assert_allclose(q[..., 3], 1.0, atol=1e-6)


@pytest.mark.slow
def test_lego_app_smoke(tmp_path, monkeypatch):
    """Blender/lego training through the real app entry point."""
    import json
    import numpy as np
    import imageio.v2 as imageio
    from startrax.apps import lego

    root = tmp_path / "lego_data"
    root.mkdir()
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = root / split
        d.mkdir()
        frames = []
        for i in range(2):
            name = f"{split}/r_{i}"
            imageio.imwrite(root / f"{name}.png",
                            rng.integers(0, 255, (16, 16, 4), dtype=np.uint8))
            c2w = np.eye(4); c2w[2, 3] = 4.0
            frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
        json.dump({"camera_angle_x": 0.7, "frames": frames},
                  open(root / f"transforms_{split}.json", "w"))

    cfg = config_mod.Config(
        expname="lego_smoke", basedir=str(tmp_path), dataset_type="blender",
        datadir=str(root), white_bkgd=True, near=2.0, far=6.0, scale_factor=-1.0,
        netdepth=4, netdepth_fine=4, netwidth=16, netwidth_fine=16,
        N_samples=8, N_importance=8, N_rand=64, steps_per_epoch=5,
        epochs_appearance=1, appearance_init_thres=1e-12, epoch_val=100,
        epoch_ckpt=100, mixed_precision=False,
    )
    from startrax.apps import app_init

    params = app_init.train(cfg)
    assert "static_coarse" in params


@pytest.mark.slow
def test_online_pose_only_phases(tmp_path):
    """pose_only_every freezes field weights during pose-only epochs."""
    import jax
    import numpy as np
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=2, online_thres=1e-12, pose_only_every=1,
        noisy_pose_init=True, steps_per_epoch=4,
    )
    # epoch 0 joint, epoch 1 pose-only; capture by patching: simpler — run and
    # check it completes and poses are finite/unit-quaternion
    params = online.train(cfg)
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_online_app_depth_supervision_logged(tmp_path):
    """The online app's depth-supervised path end to end: the prefetched
    synthetic batches carry target_depth, the DS-NeRF depth term is applied
    (config depth_loss/depth_lambda -> LossConfig), and the per-epoch logs
    report it (reference train_online__.py:265,317-320). Recipe shipped as
    configs/synthetic_star_online_depth.txt."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=2, online_thres=1e-12, noisy_pose_init=True,
        steps_per_epoch=4, depth_loss=True, depth_lambda=0.01,
    )
    online.train(cfg)
    rows = [json.loads(l)
            for l in open(tmp_path / "smoke" / "online" / "metrics.jsonl")]
    dl = [r["train/depth_loss"] for r in rows if "train/depth_loss" in r]
    assert len(dl) == 2 and all(np.isfinite(v) and v >= 0 for v in dl)


@pytest.mark.slow
def test_online_phase_machine_and_selection(tmp_path):
    """The promoted pose recipe drives the production app through its phase
    machine: fieldform -> barf -> joint curriculum -> block-coordinate polish
    with GT-free photometric best-epoch selection (round-2 VERDICT #1-#3)."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=10, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        pose_delay_epochs=1, end_barf=2, barf_freeze_rot=True,
        epochs_between_frames=0,  # compress the reference's 70-epoch gap
        polish_epochs=4, polish_mode="alternate",
        alt_field_epochs=1, alt_pose_epochs=1,
        ghost_sample_ratio=0.1, frame0_sample_ratio=0.1,
        selection="photometric", selection_patience=0,
    )
    online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    history = json.loads((run_dir / "history.json").read_text())
    phases = [h["phase"] for h in history]
    for expected in ("fieldform", "barf", "joint", "polish_field",
                     "polish_pose"):
        assert expected in phases, (expected, phases)
    assert phases.index("fieldform") < phases.index("barf") < phases.index("joint")
    assert phases.index("joint") < phases.index("polish_field")
    # post-curriculum epochs carry the GT-free selection score
    scored = [h for h in history if "score" in h]
    assert scored and all(np.isfinite(h["score"]) for h in scored)
    # best-epoch snapshot checkpointed
    assert (run_dir / "ckpts_best").exists()


def test_synthetic_bbox_3d_iou_convention():
    """The synthetic adapter's new bbox/GT-vehicle-pose API composes with
    the test protocol's bbox math (bbox_rebase_frame0=False branch): at GT
    poses the est and GT vehicle->world transforms coincide -> 3D IoU = 1."""
    import numpy as np
    from startrax.data.synthetic import SyntheticAdapter, SyntheticScene
    from startrax.eval import iou as iou_mod
    from startrax.ops import lie
    import jax.numpy as jnp

    scene = SyntheticScene(num_vehicles=2, num_frames=3, H=8, W=8, focal=8.0)
    data = SyntheticAdapter(scene, num_views=1)
    assert data.bbox_rebase_frame0 is False
    lv = data.bbox_local_vertices()
    assert lv.shape == (2, 8, 3)
    gt_vehicle = data.gt_vehicle_poses()
    assert gt_vehicle.shape == (2, 3, 4, 4)
    gt_rel = np.swapaxes(data.gt_relative_poses(), 0, 1)  # [F, K, 7]
    frame = 2
    est_rel_inv = np.asarray(
        lie.se3_to_matrix(lie.se3_inverse(jnp.asarray(gt_rel[frame]))))
    est_v2w = est_rel_inv  # bbox_rebase_frame0=False branch
    gt_v2w = np.linalg.inv(gt_vehicle[:, frame])
    np.testing.assert_allclose(est_v2w, gt_v2w, atol=1e-5)
    ious, _, _ = iou_mod.compute_3d_iou(est_v2w, gt_v2w, lv)
    np.testing.assert_allclose(np.asarray(ious), 1.0, atol=1e-3)


def test_score_frames_subsampling():
    """selection_frames caps the scored frames to an evenly strided subset
    including the window endpoints; 0 scores everything (VERDICT r3 item 7:
    post-curriculum epochs must stay cheap at CARLA frame counts)."""
    from startrax.apps.online import _score_frames

    cfg_all = config_mod.Config(selection_frames=0)
    assert _score_frames(cfg_all, 0, 15) == list(range(15))
    cfg_cap = config_mod.Config(selection_frames=4)
    frames = _score_frames(cfg_cap, 0, 15)
    assert len(frames) == 4 and frames[0] == 0 and frames[-1] == 14
    assert frames == sorted(frames)
    # cap larger than the window: unchanged
    assert _score_frames(cfg_cap, 0, 3) == [0, 1, 2]


@pytest.mark.slow
def test_online_selection_depth_and_subsampling(tmp_path):
    """selection=photometric_depth with frame/stride subsampling: the app
    runs through polish scoring epochs with the depth-augmented criterion on
    the synthetic dataset's analytic depth maps, and the knobs act (scores
    stay finite at stride 2 / 3 scored frames)."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=6, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0,
        polish_epochs=3, polish_mode="alternate",
        alt_field_epochs=1, alt_pose_epochs=1,
        selection="photometric_depth", selection_depth_lambda=2.0,
        selection_frames=3, selection_stride=2, selection_patience=0,
    )
    online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    history = json.loads((run_dir / "history.json").read_text())
    scored = [h for h in history if "score" in h]
    assert scored and all(np.isfinite(h["score"]) for h in scored)


@pytest.mark.slow
def test_online_refit_anchor_polish(tmp_path):
    """polish_mode=refit_anchor: dynamic fields re-initialized and re-fit
    from frame-0 rays, poses-only recovery, then alternate — the GT-free
    transplant of the floor-diagnostic regime (artifacts/floor_diag_r3.json)
    that breaks the alternate mode's fields-absorb-pose-error fixed point."""
    import numpy as np
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=12, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0,
        polish_epochs=8, polish_mode="refit_anchor",
        refit_epochs=2, refit_pose_epochs=2,
        alt_field_epochs=1, alt_pose_epochs=1,
        selection="photometric", selection_patience=0,
    )
    params = online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    history = json.loads((run_dir / "history.json").read_text())
    phases = [h["phase"] for h in history]
    for expected in ("refit_field", "refit_pose", "polish_field"):
        assert expected in phases, (expected, phases)
    assert phases.index("refit_field") < phases.index("refit_pose")
    assert phases.index("refit_pose") < phases.index("polish_field")
    assert phases.count("refit_field") == 2 and phases.count("refit_pose") == 2
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_online_gauge_align_depth_guard(tmp_path):
    """gauge_align with gauge_depth_lambda > 0: the gauge FIT loss and the
    guard's held-out criterion both carry the DS-NeRF depth term (the
    photometric landscape along the canonical drift is flat,
    artifacts/depth_landscape_r4.json — depth is the term that slopes it).
    Exercises the full app path: depth-weighted gauge epochs, depth-weighted
    _guard_eval, and the accept/reject bookkeeping."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=10, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0,
        polish_epochs=5, polish_mode="gauge_align",
        refit_epochs=1, gauge_epochs=1, gauge_rounds=1,
        gauge_guard=True, gauge_depth_lambda=2.0,
        depth_loss=True, depth_lambda=0.25,
        alt_field_epochs=1, alt_pose_epochs=1,
        alt_plateau_window=100,
        selection="photometric_depth", selection_patience=0,
    )
    params = online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    history = json.loads((run_dir / "history.json").read_text())
    phases = [h["phase"] for h in history]
    assert "gauge_ref" in phases and "gauge_fit" in phases
    # the guard ran and logged a decision for every vehicle
    log_text = (run_dir / "run.log").read_text()
    assert "gauge_align guard" in log_text
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_online_multi_start_polish(tmp_path):
    """multi_start_rounds > 0: after an alternation round completes, the app
    basin-hops — perturbed candidates get short pose-only polishes, are
    scored by the GT-free criterion, and the best strictly-improving one is
    adopted (VERDICT r3 item 5). The stage runs exactly multi_start_rounds
    times and leaves quaternions normalized."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=10, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0,
        polish_epochs=6, polish_mode="alternate",
        alt_field_epochs=1, alt_pose_epochs=1,
        alt_plateau_window=100,
        multi_start_rounds=1, multi_start_candidates=2,
        multi_start_epochs=1, multi_start_scale=0.05,
        selection="photometric", selection_patience=0,
    )
    params = online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    history = json.loads((run_dir / "history.json").read_text())
    phases = [h["phase"] for h in history]
    assert phases.count("multi_start") == 1, phases
    assert phases.index("multi_start") > phases.index("polish_pose")
    log_text = (run_dir / "run.log").read_text()
    assert "multi_start: candidate" in log_text
    assert ("multi_start: adopted" in log_text
            or "multi_start: no candidate beat" in log_text)
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_online_gauge_frame0_mode(tmp_path):
    """gauge_mode=frame0: the gauge is fitted on frame-0 rays against the
    PRODUCTION fields (no reference-field stage), the INVERSE correction is
    applied (within the gauge_max_trans/_rot sanity bound), and alternation
    re-converges. The estimator the measured depth landscape actually
    supports (probe A, artifacts/depth_landscape_r4.json)."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=9, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0,
        polish_epochs=5, polish_mode="gauge_align", gauge_mode="frame0",
        gauge_epochs=1, gauge_rounds=1, gauge_depth_lambda=2.0,
        depth_loss=True, depth_lambda=0.1,
        alt_field_epochs=1, alt_pose_epochs=1,
        alt_plateau_window=100,
        selection="photometric_depth", selection_patience=0,
    )
    params = online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    history = json.loads((run_dir / "history.json").read_text())
    phases = [h["phase"] for h in history]
    assert "gauge_fit" in phases and "gauge_ref" not in phases, phases
    assert "polish_field" in phases  # re-convergence after the correction
    log_text = (run_dir / "run.log").read_text()
    assert "gauge_align[frame0]: applying" in log_text
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_online_selection_boundary_only(tmp_path):
    """selection_boundary_only: the run scores every epoch but the final
    pick prefers the best alternation-round-boundary epoch once >= 2
    boundaries exist (VERDICT r4 item 4; offline validation in
    artifacts/selection_rejudge_r5.json). With 1-epoch field/pose phases and
    6 polish epochs the run completes >= 2 rounds, so boundary bests are
    logged and the restored snapshot is the boundary one."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=12, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0,
        polish_epochs=6, polish_mode="alternate",
        alt_field_epochs=1, alt_pose_epochs=1,
        alt_plateau_window=100,
        selection="photometric", selection_boundary_only=True,
        selection_patience=0,
    )
    params = online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    log_text = (run_dir / "run.log").read_text()
    assert "boundary best: epoch" in log_text
    history = json.loads((run_dir / "history.json").read_text())
    boundaries = [h for h in history if h.get("boundary")]
    assert len(boundaries) >= 2, [h.get("phase") for h in history]
    # every boundary row completes a pose phase
    assert all(h["phase"] == "polish_pose" for h in boundaries)
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_selection_and_guard_coarse_only(tmp_path):
    """selection_score and _guard_eval with N_importance=0 read the coarse
    ("0"-suffixed) render outputs instead of raising KeyError — the
    compute_losses fallback mirrored into the selection path (ADVICE r4)."""
    import jax
    from startrax.apps import online
    from startrax.apps.common import make_dataset
    from startrax.train import loop

    cfg = _tiny_synthetic_cfg(
        tmp_path, N_importance=0, num_frames=3,
        selection="photometric_depth", gauge_depth_lambda=1.0,
    )
    star_cfg = config_mod.star_config_from(cfg)
    assert star_cfg.n_importance == 0
    val_data = make_dataset(cfg, "val")
    params = loop.init_online_params(jax.random.PRNGKey(0), star_cfg, 3)
    score = online.selection_score(cfg, star_cfg, params, val_data, 3)
    assert np.isfinite(score) and score > 0
    total, mass = online._guard_eval(cfg, star_cfg, params, val_data, 3)
    assert np.isfinite(total)
    assert mass.shape == (star_cfg.num_vehicles,)


@pytest.mark.slow
def test_online_gauge_frame0_cap_rejects(tmp_path):
    """The frame-0 gauge's per-vehicle magnitude bound (ADVICE r4): with an
    impossible cap every fitted correction is rejected, the poses are left
    untouched, and the run falls back to plain alternation instead of
    jumping the pose table off a diverged fit."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=9, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0,
        polish_epochs=5, polish_mode="gauge_align", gauge_mode="frame0",
        gauge_epochs=1, gauge_rounds=1, gauge_depth_lambda=2.0,
        gauge_max_trans=-1.0,  # |t| <= -1 never holds: force rejection
        depth_loss=True, depth_lambda=0.1,
        alt_field_epochs=1, alt_pose_epochs=1,
        alt_plateau_window=100,
        selection="photometric_depth", selection_patience=0,
    )
    params = online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    log_text = (run_dir / "run.log").read_text()
    assert "exceeds cap" in log_text
    assert "gauge_align[frame0]: applying" not in log_text
    # rejection falls through to the alternate stage, poses unchanged
    assert "guard rejected every" in log_text or "alternate" in log_text
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_online_gauge_align_polish(tmp_path):
    """polish_mode=gauge_align: fresh frame-0 reference fields fit on a
    scratch copy (production fields untouched), a shared per-vehicle SE(3)
    gauge fit against them, pose correction, then alternate re-convergence —
    re-entering the gauge stage once per configured round. The GT-free
    correction of the constant canonical-frame drift that dominates the
    alternation fixed point (artifacts/crossview_diag.json)."""
    import numpy as np
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=12, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0,
        polish_epochs=7, polish_mode="gauge_align",
        refit_epochs=1, gauge_epochs=1, gauge_rounds=2,
        gauge_guard=False,  # exercise the unconditional-apply machinery
        alt_field_epochs=1, alt_pose_epochs=1,
        alt_plateau_window=100,  # phase lengths drive the transitions
        selection="photometric", selection_patience=0,
    )
    params = online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    history = json.loads((run_dir / "history.json").read_text())
    phases = [h["phase"] for h in history]
    for expected in ("gauge_ref", "gauge_fit", "polish_field", "polish_pose"):
        assert expected in phases, (expected, phases)
    assert phases.index("gauge_ref") < phases.index("gauge_fit")
    assert phases.index("gauge_fit") < phases.index("polish_field")
    assert phases.index("polish_field") < phases.index("polish_pose")
    # second gauge round re-enters after the first alternate round completes
    assert phases.count("gauge_ref") == 2 and phases.count("gauge_fit") == 2
    assert phases.index("polish_pose") < len(phases) - 1 - phases[::-1].index(
        "gauge_ref")
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


def test_gauge_accept_rule():
    """The per-vehicle acceptance inequality: strict held-out improvement AND
    no accept-by-vanishing (a correction that teleports the vehicle out of
    view can improve the photometric score for free)."""
    from startrax.apps.online import _gauge_accept

    assert _gauge_accept(1.0, 0.9, 0.5, 0.4)          # better + visible
    assert not _gauge_accept(1.0, 1.1, 0.5, 0.5)      # worse score
    assert not _gauge_accept(1.0, 0.9999, 0.5, 0.5)   # not strictly better
    assert not _gauge_accept(1.0, 0.5, 0.5, 0.01)     # vanished vehicle
    assert _gauge_accept(1.0, 0.5, 0.0, 0.0)          # invisible at base: no
    # vanishing possible, photometric alone decides


@pytest.mark.slow
def test_online_gauge_guard_rejects_garbage_fit(tmp_path, monkeypatch):
    """Guard plumbing end-to-end: when the held-out evaluation rejects every
    vehicle's correction, the fit is discarded (poses untouched), the gauge
    machinery ends (no second round), and the run continues in plain
    alternation. The evaluation itself is stubbed to reject deterministically
    — with a tiny degenerate run the photometric comparison against barely-
    trained scratch fields is arbitrary (the acceptance rule proper is unit-
    tested in test_gauge_accept_rule)."""
    import numpy as np
    from startrax.apps import online

    calls = {"n": 0}

    def fake_guard_eval(cfg, star_cfg, params, val_data, num_frames,
                        mesh=None, view=0, start_frame=1):
        # first call per gauge round scores the uncorrected base; every
        # candidate afterwards scores strictly worse -> reject all
        calls["n"] += 1
        score = 1.0 if calls["n"] == 1 else 2.0
        return score, np.ones(star_cfg.num_vehicles)

    monkeypatch.setattr(online, "_guard_eval", fake_guard_eval)

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=12, online_thres=1e9,
        online_thres_tightened=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0,
        polish_epochs=7, polish_mode="gauge_align",
        refit_epochs=1, gauge_epochs=1, gauge_rounds=2,
        alt_field_epochs=1, alt_pose_epochs=1,
        alt_plateau_window=100,
        selection="photometric", selection_patience=0,
    )
    params = online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    history = json.loads((run_dir / "history.json").read_text())
    phases = [h["phase"] for h in history]
    assert "gauge_fit" in phases
    # rejection maxes the round counter: the gauge stage never re-enters
    assert phases.count("gauge_ref") == 1 and phases.count("gauge_fit") == 1
    # alternation continues after the rejected fit
    i = phases.index("gauge_fit")
    assert i < phases.index("polish_field")
    # the rejected fit left the production poses untouched (the following
    # polish_field epoch is field-only, so its pose error must be identical)
    assert history[i]["trans"] == history[i + 1]["trans"]
    assert "guard rejected every vehicle" in (run_dir / "run.log").read_text()
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)


@pytest.mark.slow
def test_online_polish_substate_resumes(tmp_path):
    """The polish sub-state (alternation phase, rounds used, best-epoch
    snapshot) is checkpointed: a resumed run continues mid-polish instead of
    restarting the machinery, and the best snapshot survives the restart."""
    import numpy as np
    from startrax.apps import online

    kw = dict(
        epochs_online=6, online_thres=1e9, online_thres_tightened=1e9,
        initial_num_frames=5, noisy_pose_init=True, steps_per_epoch=4,
        epochs_between_frames=0, polish_epochs=50, polish_mode="alternate",
        alt_field_epochs=2, alt_pose_epochs=2, alt_plateau_window=100,
        selection="photometric", selection_patience=0, epoch_val=2,
    )
    cfg = _tiny_synthetic_cfg(tmp_path, **kw)
    online.train(cfg)
    run_dir = tmp_path / "smoke" / "online"
    h1 = json.loads((run_dir / "history.json").read_text())
    # the run ended mid-polish with a best-epoch snapshot on disk
    assert any(p["phase"].startswith("polish") for p in h1)
    assert (run_dir / "ckpts_best").exists()

    cfg2 = _tiny_synthetic_cfg(
        tmp_path, online_ckpt_path=str(run_dir / "ckpts"),
        **{**kw, "epochs_online": 10})
    online.train(cfg2)
    log = (run_dir / "run.log").read_text()
    assert "resumed polish sub-state" in log
    assert "restored best-epoch snapshot" in log
    h2 = json.loads((run_dir / "history.json").read_text())
    # resumed epochs continue the alternation (phase sequence advances from
    # the saved sub-state rather than restarting at epoch 0 of the machinery)
    resumed = [p for p in h2 if p["epoch"] >= 6]
    assert resumed and all(p["phase"].startswith("polish") for p in resumed)


@pytest.mark.slow
def test_online_app_sharded_matches_unsharded(tmp_path):
    """The app's OWN epoch path trains ray-sharded over the virtual-device
    mesh (data_parallel=on) and matches the unsharded run (round-2 VERDICT
    #4; semantics proven at step level in test_parallel.py)."""
    import jax
    from startrax.apps import online

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    common = dict(
        epochs_online=2, online_thres=1e-12, noisy_pose_init=True,
        steps_per_epoch=4, num_workers=1, seed=11,  # 1 worker: deterministic
    )
    cfg_off = _tiny_synthetic_cfg(tmp_path / "off", data_parallel="off", **common)
    cfg_on = _tiny_synthetic_cfg(tmp_path / "on", data_parallel="on", **common)
    p_off = online.train(cfg_off)
    p_on = online.train(cfg_on)
    h_off = json.loads(
        (tmp_path / "off" / "smoke" / "online" / "history.json").read_text())
    h_on = json.loads(
        (tmp_path / "on" / "smoke" / "online" / "history.json").read_text())
    np.testing.assert_allclose([h["fine"] for h in h_on],
                               [h["fine"] for h in h_off], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(p_on["poses"]),
                               np.asarray(p_off["poses"]), atol=1e-4)


@pytest.mark.slow
def test_online_test_protocol_end_to_end(tmp_path):
    """online.test() runs the full protocol from a saved checkpoint on the
    synthetic dataset: per-frame masked metric rows, RPE/ATE, 2D IoU, the
    NEW synthetic 3D-IoU path (bbox_rebase_frame0=False), pose trajectory
    export. This is the exact entry the run drivers' stage 2 invokes."""
    from startrax.apps import online

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=1, online_thres=1e9, initial_num_frames=5,
        noisy_pose_init=True, steps_per_epoch=2, save_video_frames=False,
    )
    online.train(cfg)
    ckpt_dir = str(tmp_path / "smoke" / "online" / "ckpts")
    cfg_t = _tiny_synthetic_cfg(
        tmp_path, test=True, online_ckpt_path=ckpt_dir,
        save_video_frames=False,
    )
    online.test(cfg_t)
    run_dir = tmp_path / "smoke" / "online_test"
    rows = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    keys = set().union(*[set(r) for r in rows])
    for k in ("test/view0_frame_psnr", "test/view0_frame_psnr_dynamic",
              "test/rpe_trans_0", "test/ate_0", "test/3d_iou_0"):
        assert k in keys, (k, sorted(keys)[:40])
    # frame-0 trajectory convention (origin-canonical dataset): ATE must be
    # at the pose-noise scale (~0.1), not inflated by the whole frame-0 GT
    # pose (~1.6) — the bug the bbox_rebase_frame0 branch fixed
    ates = [r["test/ate_0"] for r in rows if "test/ate_0" in r]
    assert ates and ates[-1] < 0.4, ates
    assert (run_dir / "poses_vehicle0.txt").exists()


def test_frame_metrics_full_suite(tmp_path):
    """_frame_metrics emits the reference-shaped per-frame metric row
    (train_online__.py:663-725): full/static/dynamic PSNR+SSIM, and the three
    LPIPS variants when weights are supplied."""
    import numpy as np
    import jax.numpy as jnp
    from startrax.apps.online import _frame_metrics
    from test_eval import _fake_lpips_weights

    rng = np.random.default_rng(3)
    H = W = 32
    out = {
        "rgb": rng.uniform(size=(H, W, 3)).astype(np.float32),
        "rgb_dynamic_all": rng.uniform(size=(H, W, 3)).astype(np.float32),
    }
    target = rng.uniform(size=(H, W, 3)).astype(np.float32)
    mask = np.zeros((H, W), bool)
    mask[8:20, 8:20] = True

    row = _frame_metrics(out, target, mask, num_vehicles=1, lpips_fn=None)
    for k in ("psnr", "ssim", "psnr_static", "psnr_dynamic", "ssim_static",
              "ssim_dynamic"):
        assert k in row and np.isfinite(row[k]), k
    assert "lpips" not in row

    from startrax.eval.image import LPIPS
    wpath = _fake_lpips_weights(str(tmp_path / "w.npz"), rng)
    row = _frame_metrics(out, target, mask, num_vehicles=1, lpips_fn=LPIPS(wpath))
    for k in ("lpips", "lpips_static", "lpips_dynamic"):
        assert k in row and np.isfinite(row[k]), k


@pytest.mark.slow
def test_mip_online_smoke_with_pose_metrics(tmp_path):
    """Mip online training logs pose trans/rot errors and renders a val view
    (reference train_online_mip.py val loop)."""
    import numpy as np
    from startrax.apps import mip as mip_app

    cfg = _tiny_synthetic_cfg(
        tmp_path, epochs_online=1, online_thres=1e-12, noisy_pose_init=True,
        skip_appearance_init=True, epoch_val=1, num_freqs_pos=4, num_freqs_dir=2,
    )
    params = mip_app.train_online(cfg)
    q = np.asarray(params["poses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    rows = [json.loads(l) for l in open(tmp_path / "smoke" / "mip_online" / "metrics.jsonl")]
    keys = set().union(*[set(r) for r in rows])
    assert "train/trans_error_0" in keys and "train/rot_error_0" in keys
    assert "val/psnr" in keys


def test_mip_test_mode(tmp_path):
    """Mip test mode runs the shared protocol (masked metric suite, RPE/ATE,
    pose export) over the IPE renderer."""
    import jax
    import numpy as np
    from startrax.apps import mip as mip_app
    from startrax.models import mip as mip_mod
    from startrax.ops import lie
    from startrax.train import checkpoint as ckpt

    cfg = _tiny_synthetic_cfg(
        tmp_path, test=True, eval_last_frame=2, num_freqs_pos=4, num_freqs_dir=2,
        online_ckpt_path=str(tmp_path / "ck"),
    )
    mcfg = mip_app.mip_config_from(cfg)
    params = {
        "nerf": mip_mod.init_star_mip(jax.random.PRNGKey(0), mcfg),
        "poses": lie.se3_identity(cfg.num_frames - 1, 1),
    }
    ckpt.save_checkpoint(str(tmp_path / "ck"), {"params": params}, step=0)

    mip_app.test(cfg)

    run_dir = tmp_path / "smoke" / "mip_test"
    rows = [json.loads(l) for l in open(run_dir / "metrics.jsonl")]
    keys = set().union(*[set(r) for r in rows])
    for metric in ("psnr", "ssim", "psnr_static", "psnr_dynamic",
                   "ssim_static", "ssim_dynamic", "2d_iou"):
        assert f"test/view0_{metric}" in keys, f"missing {metric}"
    assert any(k.startswith("test/rpe_trans") for k in keys)
    assert (run_dir / "poses_vehicle0.txt").exists()


@pytest.mark.slow
def test_nerf_time_val_and_test(tmp_path):
    """The baseline now has val + test loops (reference train_nerf_time.py),
    emitting the same masked metric suite as STaR so the two are comparable."""
    import jax
    from startrax.apps import nerf_time
    from startrax.models import nerf_time as nt_mod
    from startrax.train import checkpoint as ckpt
    from startrax.utils.config import star_config_from

    cfg = _tiny_synthetic_cfg(tmp_path, epochs_online=1, online_thres=1e-12,
                              epoch_val=1)
    nerf_time.train(cfg)
    rows = [json.loads(l) for l in open(tmp_path / "smoke" / "nerf_time" / "metrics.jsonl")]
    keys = set().union(*[set(r) for r in rows])
    assert "val/psnr" in keys and "val/ssim" in keys

    params = nt_mod.init_nerf_time(jax.random.PRNGKey(0), star_config_from(cfg))
    ckpt.save_checkpoint(str(tmp_path / "ck"), {"params": params}, step=0)
    cfg_t = _tiny_synthetic_cfg(tmp_path, test=True, eval_last_frame=2,
                                online_ckpt_path=str(tmp_path / "ck"))
    nerf_time.test(cfg_t)
    rows = [json.loads(l) for l in open(tmp_path / "smoke" / "nerf_time_test" / "metrics.jsonl")]
    keys = set().union(*[set(r) for r in rows])
    for metric in ("psnr", "ssim", "psnr_static", "psnr_dynamic",
                   "ssim_static", "ssim_dynamic"):
        assert f"test/view0_{metric}" in keys, f"missing {metric}"
