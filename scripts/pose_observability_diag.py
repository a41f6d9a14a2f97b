"""Pose-observability diagnostic against the EXACT analytic fields (CPU).

Answers "is the pose machinery sound, and what does it take to converge?"
by optimizing per-frame vehicle poses photometrically against the synthetic
scene's analytic density/color fields — no learned fields, so convergence
isolates the loss geometry:

- single-stage (full texture): a vehicle whose noisy init exceeds the
  texture's basin (stripe period ~0.45 in x) locks onto the WRONG stripe and
  never converges (observed: stuck at ~0.08 trans error),
- two-stage (coarse texture-free, then full): both vehicles converge to
  ~1e-6 — the validation behind the BARF warmup in scripts/synthetic_e2e.py.

Usage: python scripts/pose_observability_diag.py [--coarse_its 700]
(forces the CPU backend; runtime ~2 min.)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from startrax.data.synthetic import SyntheticScene, _VEHICLE_COLORS, _STATIC_BLOBS
from startrax.ops import lie
from startrax.ops import rays as ray_ops
from startrax.ops.compositing import raw2outputs_star

BLOBS = jnp.asarray(_STATIC_BLOBS)


def static_sigma_rgb_j(pts):
    sigma = jnp.zeros(pts.shape[:-1])
    acc = jnp.zeros(pts.shape[:-1] + (3,))
    for i in range(BLOBS.shape[0]):
        bx, by, bz, rad, peak, r, g, b = [BLOBS[i, j] for j in range(8)]
        d2 = jnp.sum((pts - jnp.stack([bx, by, bz])) ** 2, -1)
        s = peak * jnp.exp(-d2 / (2 * rad * rad / 9.0))
        sigma += s
        acc += s[..., None] * jnp.stack([r, g, b])
    ground = 20.0 * jnp.exp(-((pts[..., 1] + 1.0) ** 2) / 0.005)
    sigma += ground
    acc += ground[..., None] * jnp.asarray([0.45, 0.45, 0.5])
    rgb = acc / jnp.maximum(sigma[..., None], 1e-8)
    return sigma, jnp.clip(rgb, 0, 1)


def vehicle_sigma_rgb_j(p, k, tex):
    """tex in [0, 1] scales the stripe texture amplitude (0 = coarse)."""
    scales = jnp.asarray([0.45, 0.18, 0.22])
    q = jnp.sum((p / scales) ** 4, -1)
    sigma = 80.0 * jnp.exp(-q / 2.0)
    base = jnp.asarray(_VEHICLE_COLORS[k % 3])
    stripes = 0.55 + 0.45 * tex * jnp.sin(14.0 * p[..., 0]) * jnp.sin(
        9.0 * p[..., 1] + 3.0 * p[..., 2])
    return sigma, jnp.clip(base * stripes[..., None], 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coarse_its", type=int, default=700)
    ap.add_argument("--fine_its", type=int, default=900)
    ap.add_argument("--frame", type=int, default=5)
    ap.add_argument("--n_rand", type=int, default=512)
    ap.add_argument("--noise", type=float, default=0.05)
    args = ap.parse_args()

    scene = SyntheticScene(num_vehicles=2, num_frames=8, H=128, W=128, focal=128.0)
    rng = np.random.default_rng(0)
    views = [scene.camera(v, 8) for v in range(8)]
    gt_rel = np.stack([scene.gt_relative_pose(args.frame, k) for k in range(2)])
    pose_gt = jnp.asarray(gt_rel)
    tau = rng.normal(size=(2, 6)).astype(np.float32) * args.noise
    pose0 = lie.se3_multiply(pose_gt, lie.se3_exp(jnp.asarray(tau)))

    logit = lambda x: jnp.log(jnp.clip(x, 1e-6, 1 - 1e-6) / (1 - jnp.clip(x, 1e-6, 1 - 1e-6)))

    def render_batch(pose, ro, rd, tex, S=128):
        z = jnp.linspace(scene.near, scene.far, S)
        pts = ro[:, None, :] + rd[:, None, :] * z[:, None]
        sig_s, rgb_s = static_sigma_rgb_j(pts)
        raw_s = jnp.log(jnp.expm1(jnp.maximum(sig_s, 1e-6)))
        sig_d, rgb_d = [], []
        for k in range(2):
            pk = lie.se3_act(pose[k], pts)
            s, c = vehicle_sigma_rgb_j(pk, k, tex)
            sig_d.append(s)
            rgb_d.append(c)
        raw_d = jnp.stack([jnp.log(jnp.expm1(jnp.maximum(s, 1e-6))) for s in sig_d], 1)
        rgb_d = jnp.stack(rgb_d, 1)
        zb = jnp.broadcast_to(z, pts.shape[:2])
        return raw2outputs_star(raw_s, logit(rgb_s), raw_d, logit(rgb_d), zb, rd)["rgb"]

    opt = optax.adam(5e-4)

    def make_step(tex_model):
        @jax.jit
        def step(pose, state, ro, rd, tgt):
            def loss_fn(p):
                return jnp.mean((render_batch(p, ro, rd, tex_model) - tgt) ** 2)

            lv, g = jax.value_and_grad(loss_fn)(pose)
            up, state = opt.update(g, state)
            pose = optax.apply_updates(pose, up)
            return pose.at[..., 3:7].set(lie.quat_normalize(pose[..., 3:7])), state, lv

        return step

    def sample_rays(n):
        v = rng.integers(0, 8)
        ro, rd = ray_ops.get_rays_np(scene.H, scene.W, scene.K, views[v])
        y = rng.integers(0, scene.H, n)
        x = rng.integers(0, scene.W, n)
        return jnp.asarray(ro[y, x]), jnp.asarray(rd[y, x])

    def err(pose):
        return np.linalg.norm(np.asarray(pose[:, :3] - pose_gt[:, :3]), axis=-1)

    pose, state = pose0, opt.init(pose0)
    print("init trans err:", err(pose0).round(5).tolist())
    t0 = time.time()
    for name, its, step in (
        ("coarse", args.coarse_its, make_step(0.0)),
        ("fine", args.fine_its, make_step(1.0)),
    ):
        for i in range(its):
            ro, rd = sample_rays(args.n_rand)
            tgt = render_batch(pose_gt, ro, rd, 1.0)  # real images: full texture
            pose, state, lv = step(pose, state, ro, rd, tgt)
        print(f"after {name}: trans err {err(pose).round(6).tolist()} "
              f"({time.time() - t0:.0f}s)", flush=True)
    final = err(pose)
    print("PASS" if final.max() < 1e-3 else "FAIL", final.round(6).tolist())


if __name__ == "__main__":
    main()
