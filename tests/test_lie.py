"""Golden tests for SE(3)/SO(3) ops against scipy.spatial.transform.

Covers the capabilities the reference gets from lietorch/pypose and verifies
the convergence property its manual scripts check (test_pypose.py pattern).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from startrax.ops import lie


def random_quats(n, seed=0):
    r = Rotation.random(n, random_state=seed)
    return r.as_quat().astype(np.float32), r  # xyzw


def test_quat_rotate_matches_scipy():
    q, r = random_quats(32)
    v = np.random.default_rng(1).normal(size=(32, 3)).astype(np.float32)
    got = np.asarray(lie.quat_rotate(jnp.asarray(q), jnp.asarray(v)))
    want = r.apply(v).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_quat_to_matrix_matches_scipy():
    q, r = random_quats(16, seed=2)
    got = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(got, r.as_matrix().astype(np.float32), atol=1e-5)


def test_matrix_to_quat_roundtrip():
    q, r = random_quats(64, seed=3)
    q2 = np.asarray(lie.matrix_to_quat(jnp.asarray(r.as_matrix().astype(np.float32))))
    # same rotation up to sign (we canonicalize qw >= 0)
    dots = np.abs(np.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_quat_multiply_matches_scipy():
    qa, ra = random_quats(8, seed=4)
    qb, rb = random_quats(8, seed=5)
    got = np.asarray(lie.quat_multiply(jnp.asarray(qa), jnp.asarray(qb)))
    want = (ra * rb).as_quat().astype(np.float32)
    dots = np.abs(np.sum(got * want, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(6)
    phi = rng.normal(size=(32, 3)).astype(np.float32)
    phi[0] = 0.0  # exercise the small-angle branch
    phi[1] = 1e-6
    q = lie.so3_exp(jnp.asarray(phi))
    phi2 = np.asarray(lie.so3_log(q))
    np.testing.assert_allclose(phi2, phi, atol=1e-4)


def test_so3_exp_matches_scipy():
    rng = np.random.default_rng(7)
    phi = rng.normal(size=(16, 3)).astype(np.float32)
    got = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    want = Rotation.from_rotvec(phi).as_quat().astype(np.float32)
    dots = np.abs(np.sum(got * want, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)


def test_se3_act_matches_matrix():
    q, r = random_quats(8, seed=8)
    t = np.random.default_rng(9).normal(size=(8, 3)).astype(np.float32)
    pose = np.concatenate([t, q], axis=-1)
    pts = np.random.default_rng(10).normal(size=(8, 3)).astype(np.float32)
    got = np.asarray(lie.se3_act(jnp.asarray(pose), jnp.asarray(pts)))
    want = np.einsum("nij,nj->ni", r.as_matrix(), pts) + t
    np.testing.assert_allclose(got, want.astype(np.float32), atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(11)
    tau = rng.normal(size=(32, 6)).astype(np.float32) * 0.8
    tau[0] = 0.0
    pose = lie.se3_exp(jnp.asarray(tau))
    tau2 = np.asarray(lie.se3_log(pose))
    np.testing.assert_allclose(tau2, tau, atol=1e-4)


def test_se3_inverse_and_multiply():
    q, _ = random_quats(8, seed=12)
    t = np.random.default_rng(13).normal(size=(8, 3)).astype(np.float32)
    pose = jnp.asarray(np.concatenate([t, q], axis=-1))
    ident = lie.se3_multiply(pose, lie.se3_inverse(pose))
    np.testing.assert_allclose(np.asarray(ident[..., :3]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(ident[..., 6])), 1.0, atol=1e-5)


def test_se3_matrix_roundtrip():
    q, _ = random_quats(8, seed=14)
    t = np.random.default_rng(15).normal(size=(8, 3)).astype(np.float32)
    pose = jnp.asarray(np.concatenate([t, q], axis=-1))
    T = lie.se3_to_matrix(pose)
    pose2 = lie.matrix_to_se3(T)
    pts = jnp.asarray(np.random.default_rng(16).normal(size=(8, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(lie.se3_act(pose, pts)), np.asarray(lie.se3_act(pose2, pts)), atol=1e-5
    )


def test_rotation_metric_known_values():
    # Mirrors the reference test_metrics.py sanity: identical rotations -> 0.
    R1 = Rotation.from_euler("xyz", [[0.3, -0.2, 1.0]]).as_matrix().astype(np.float32)
    assert float(lie.rotation_metric(jnp.asarray(R1), jnp.asarray(R1))[0]) < 1e-5
    # 180-degree rotation about z vs identity -> ||I - Rz(pi)||_F = sqrt(8)
    R2 = Rotation.from_euler("z", [np.pi]).as_matrix().astype(np.float32)
    eye = np.eye(3, dtype=np.float32)[None]
    got = float(lie.rotation_metric(jnp.asarray(eye), jnp.asarray(R2))[0])
    np.testing.assert_allclose(got, np.sqrt(8.0), rtol=1e-5)


def test_pose_recovery_by_gradient_descent():
    """The core mechanism of online tracking in isolation: a learnable SE(3)
    converges to a random GT pose via Adam on point-cloud MSE (the reference
    verifies exactly this with pypose, test_pypose.py:61-161)."""
    import optax

    rng = np.random.default_rng(42)
    gt_tau = jnp.asarray(rng.normal(size=(6,)).astype(np.float32) * 0.5)
    gt_pose = lie.se3_exp(gt_tau)
    pts = jnp.asarray(rng.normal(size=(256, 3)).astype(np.float32))
    target = lie.se3_act(gt_pose, pts)

    def loss_fn(tau):
        pred = lie.se3_act(lie.se3_exp(tau), pts)
        return jnp.mean((pred - target) ** 2)

    tau = jnp.zeros((6,))
    opt = optax.adam(1e-2)
    state = opt.init(tau)

    @jax.jit
    def step(tau, state):
        loss, g = jax.value_and_grad(loss_fn)(tau)
        updates, state = opt.update(g, state)
        return optax.apply_updates(tau, updates), state, loss

    for _ in range(500):
        tau, state, loss = step(tau, state)
    assert float(loss) < 1e-6, f"pose did not converge, loss={float(loss)}"
