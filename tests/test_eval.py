"""Tests for the eval suite: image metrics, pose metrics, RPE/ATE, IoU."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from startrax.eval import image, pose, trajectory, iou


# ------------------------------ image -------------------------------------


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    got = float(image.psnr(a, b))
    np.testing.assert_allclose(got, -10 * np.log10(0.01), rtol=1e-5)


def test_psnr_masked():
    a = jnp.zeros((4, 4, 3))
    b = a.at[0, 0].set(1.0)
    mask = jnp.zeros((4, 4), bool).at[1:, :].set(True)  # exclude the bad pixel
    assert float(image.psnr(a, b, mask=mask)) > 50


def test_ssim_identical_and_noise():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    assert float(image.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)
    noisy = img + jnp.asarray(rng.normal(size=(32, 32, 3)).astype(np.float32) * 0.2)
    assert float(image.ssim(img, noisy)) < 0.9


def test_ssim_matches_reference_formula_flat_images():
    # constant images: SSIM = (2 mu1 mu2 + c1)/(mu1^2 + mu2^2 + c1)
    a = jnp.full((16, 16, 1), 0.4)
    b = jnp.full((16, 16, 1), 0.6)
    c1 = 0.01 ** 2
    want = (2 * 0.4 * 0.6 + c1) / (0.4 ** 2 + 0.6 ** 2 + c1)
    np.testing.assert_allclose(float(image.ssim(a, b)), want, rtol=1e-4)


def test_masked_ssim_runs():
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.uniform(size=(24, 24, 3)).astype(np.float32))
    mask = np.zeros((24, 24), bool)
    mask[6:18, 6:18] = True
    v = float(image.masked_ssim(a, a, jnp.asarray(mask)))
    assert v == pytest.approx(1.0, abs=1e-5)


def test_lpips_gated_without_weights():
    with pytest.raises(RuntimeError, match="LPIPS"):
        image.lpips(jnp.zeros((8, 8, 3)), jnp.zeros((8, 8, 3)))


def _fake_lpips_weights(path, rng, scale=0.1):
    """Random weights in the exact .npz schema scripts/convert_lpips_weights.py
    produces (13 VGG16 convs OIHW + 5 linear heads)."""
    chans = [3, 64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    out = {}
    for i in range(13):
        out[f"w{i}"] = rng.normal(size=(chans[i + 1], chans[i], 3, 3)).astype(np.float32) * scale
        out[f"b{i}"] = np.zeros(chans[i + 1], np.float32)
    for s, c in enumerate([64, 128, 256, 512, 512]):
        out[f"lin{s}"] = np.full(c, 1.0 / c, np.float32)
    np.savez(path, **out)
    return path


def test_lpips_network_with_weights(tmp_path):
    """The JAX LPIPS network runs end-to-end given a weights file: zero for
    identical images, positive and increasing with perturbation size."""
    rng = np.random.default_rng(0)
    wpath = _fake_lpips_weights(str(tmp_path / "lpips.npz"), rng)
    fn = image.LPIPS(wpath)
    img = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    same = float(fn(img, img))
    assert same == pytest.approx(0.0, abs=1e-6)
    small = float(fn(img, jnp.clip(img + 0.05, 0, 1)))
    large = float(fn(img, jnp.clip(img + 0.3, 0, 1)))
    assert 0 < small < large


# ------------------------------ pose --------------------------------------


def _pose7(t, rotvec):
    q = Rotation.from_rotvec(rotvec).as_quat()
    return np.concatenate([t, q]).astype(np.float32)


def test_pose_metrics_identity():
    poses = np.stack([_pose7([0, 0, 0], [0, 0, 0])] * 4)
    out = pose.get_pose_metrics(poses, poses)
    assert out[0] == pytest.approx(0.0, abs=1e-6)
    assert out[1] == pytest.approx(0.0, abs=1e-5)


def test_pose_metrics_translation_only():
    gt = np.stack([_pose7([0, 0, 0], [0, 0, 0])] * 3)
    est = np.stack([_pose7([1, 0, 0], [0, 0, 0])] * 3)
    trans, rot, last_t, last_r, _, _ = pose.get_pose_metrics(est, gt)
    assert trans == pytest.approx(1.0, rel=1e-6)
    assert rot == pytest.approx(0.0, abs=1e-5)
    assert last_t == pytest.approx(1.0, rel=1e-6)


def test_pose_metrics_multi_shapes():
    F, K = 5, 2
    rng = np.random.default_rng(2)
    est = np.stack(
        [[_pose7(rng.normal(size=3), rng.normal(size=3) * 0.1) for _ in range(K)] for _ in range(F)]
    )
    out = pose.get_pose_metrics_multi(est, est, reduce=False)
    assert len(out[0]) == K and out[0][0].shape == (F,)


# ----------------------------- trajectory ---------------------------------


def test_rpe_zero_for_identical():
    rng = np.random.default_rng(3)
    traj = np.stack([_pose7(rng.normal(size=3), rng.normal(size=3) * 0.2) for _ in range(6)])
    t_rmse, r_rmse = trajectory.evaluate_rpe(traj, traj)
    assert t_rmse == pytest.approx(0.0, abs=1e-5)
    assert r_rmse == pytest.approx(0.0, abs=1e-3)


def test_rpe_constant_offset_is_zero():
    # RPE of a trajectory with a constant rigid offset is 0 (relative motion equal)
    rng = np.random.default_rng(4)
    gt = np.stack([_pose7([i * 0.5, 0, 0], [0, 0, 0]) for i in range(6)])
    offset = _pose7([0.3, -0.2, 0.1], [0, 0, 0])
    est = gt.copy()
    est[:, :3] += offset[:3]
    t_rmse, _ = trajectory.evaluate_rpe(est, gt)
    assert t_rmse == pytest.approx(0.0, abs=1e-5)


def test_ate_known_value():
    gt = np.stack([_pose7([0, 0, 0], [0, 0, 0])] * 4)
    est = np.stack([_pose7([0, 3, 4], [0, 0, 0])] * 4)  # dist 5 each frame
    assert trajectory.evaluate_ate(est, gt) == pytest.approx(5.0, rel=1e-6)


# ------------------------------- IoU --------------------------------------


def _unit_box(center, half=0.5):
    corners = np.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)], np.float32
    ) * half
    return corners + np.asarray(center, np.float32)


def test_box3d_iou_identical():
    b = _unit_box([0, 0, 0])
    assert iou.box3d_iou(b, b) == pytest.approx(1.0, rel=1e-4)


def test_box3d_iou_disjoint():
    assert iou.box3d_iou(_unit_box([0, 0, 0]), _unit_box([5, 0, 0])) == 0.0


def test_box3d_iou_half_overlap():
    # unit cubes offset by 0.5 in x: intersection 0.5, union 1.5 -> 1/3
    got = iou.box3d_iou(_unit_box([0, 0, 0]), _unit_box([0.5, 0, 0]))
    assert got == pytest.approx(1.0 / 3.0, rel=1e-3)


def test_box3d_iou_rotated():
    # cube vs itself rotated 45 deg about z: known IoU = 2(sqrt(2)-1)/(2-(sqrt(2)-1)*... )
    # just verify symmetry + sensible range
    b = _unit_box([0, 0, 0])
    R = Rotation.from_euler("z", np.pi / 4).as_matrix().astype(np.float32)
    br = b @ R.T
    v = iou.box3d_iou(b, br)
    assert 0.5 < v < 1.0
    assert v == pytest.approx(iou.box3d_iou(br, b), rel=1e-4)


def test_compute_3d_iou_with_poses():
    K = 2
    local = np.stack([_unit_box([0, 0, 0], half=0.4)] * K)
    eye = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    shifted = eye.copy()
    shifted[:, 0, 3] = 0.4
    ious, bboxes, gt_bboxes = iou.compute_3d_iou(shifted, eye, local)
    assert ious.shape == (K,)
    assert np.all(ious > 0.2) and np.all(ious < 0.6)


def test_compute_2d_iou():
    N, K = 100, 2
    dt = np.ones((N, K), np.float32)
    dt[:30, 0] = 0.01  # vehicle 0 covers rays 0..29
    sem = np.zeros(N, bool)
    sem[:30] = True
    v, masks = iou.compute_2d_iou(dt, sem)
    assert v == pytest.approx(1.0)
    sem2 = np.zeros(N, bool)
    sem2[15:45] = True
    v2, _ = iou.compute_2d_iou(dt, sem2)
    assert v2 == pytest.approx(15 / 45, rel=1e-6)
