"""Frame-0 gauge estimator: can a per-vehicle SE(3) gauge fitted on FRAME-0
rays against the PRODUCTION fields recover the canonical-frame drift?

The depth landscape (artifacts/depth_landscape_r4.json probe A) shows the
DS-NeRF depth loss of the production fields rendered at frame 0 with a probe
gauge g slopes toward the true drift delta — while the r3/r4 gauge machinery
fits its gauge on frames 1+ against BLURRY one-frame reference fields, whose
landscape stays flat (guard rejects, runs r3-gauge2 and r4-depth epoch 44).
This diagnostic runs the estimator the landscape actually supports:

    min_g  photo(frame0 | pose=g) + lambda_d * depth(frame0 | pose=g)

over frame-0 rays only (frame-0's true pose is identity; if the canonical
field drifted by delta, the best-fit g should approach delta, and
g^-1 ∘ est approaches GT). Reports the fitted g against the known per-vehicle
drift and the pose error before/after applying the correction.

Usage: python scripts/pose_frame0_gauge_diag.py --ckpt <dir> [--steps 1500]
Reference: the estimator generalizes train_online__.py's pose-only
optimization (:632-652) to a shared 6-DOF gauge with depth supervision.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "startrax", "configs", "synthetic_star_online.txt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--depth_lambda", type=float, default=2.0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--freeze_rot", action="store_true")
    ap.add_argument("--out", default="artifacts/frame0_gauge_diag_r4.json")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from startrax.apps.common import make_dataset, host_prng
    from startrax.eval.pose import get_pose_metrics_multi
    from startrax.ops import lie
    from startrax.train import checkpoint as ckpt_mod
    from startrax.train import loop
    from startrax.utils.config import load_config, star_config_from

    overrides = []
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides += [f"--{k}", v]

    cfg = load_config(["--config", CONFIG, "--basedir", "/tmp/startrax_f0g",
                       "--expname", "f0g"] + overrides)
    star_cfg = dc.replace(star_config_from(cfg), end_barf=-1)
    K = star_cfg.num_vehicles

    train_data = make_dataset(cfg, "train")
    gt_rel = np.swapaxes(train_data.gt_relative_poses(), 0, 1)

    rng, key = host_prng(cfg.seed)
    saved = ckpt_mod.restore_checkpoint(args.ckpt, None)
    saved_params = saved["params"] if "params" in saved else saved
    params = {"nerf": jax.tree.map(jnp.asarray, saved_params["nerf"]),
              "poses": jnp.asarray(saved_params["poses"])}

    est = jnp.asarray(params["poses"])
    d = np.asarray(lie.se3_multiply(est, lie.se3_inverse(jnp.asarray(gt_rel[1:]))))
    delta_t = d[..., :3].mean(axis=0)  # [K, 3]

    def pose_errors(poses):
        trans, rot, *_ = get_pose_metrics_multi(np.asarray(poses), gt_rel[1:])
        return [round(float(t), 4) for t in trans], [round(float(r), 4) for r in rot]

    t_before, r_before = pose_errors(est)
    print(f"before: trans={t_before} rot={r_before} "
          f"drift delta_t={delta_t.round(4).tolist()}", flush=True)

    # frame-0 gauge fit via the production gauge step (nerf = production
    # fields, poses = zero-row table so gather(frame=0) = identity and
    # pose_c = g)
    tx = optax.adam(args.lr)
    gauge_step = loop.make_gauge_train_step(
        star_cfg, tx, freeze_rot=args.freeze_rot,
        depth_lambda=args.depth_lambda)
    gauge = jnp.asarray(lie.se3_identity(K))
    opt_state = tx.init(gauge)
    dummy_poses = jnp.asarray(lie.se3_identity(1, K))  # frame table, unused rows

    csr = max(cfg.car_sample_ratio_pose, cfg.car_sample_ratio)
    pr = np.random.default_rng(cfg.seed + 11)
    t0 = time.time()
    losses = []
    for i in range(args.steps):
        b = train_data.sample_batch(pr, cfg.N_rand, frame=0,
                                    car_sample_ratio=csr)
        b = {k2: jnp.asarray(v) for k2, v in b.items()}
        key, sub = jax.random.split(key)
        gauge, opt_state, lossv = gauge_step(
            gauge, opt_state, params["nerf"], dummy_poses, b, sub)
        if i % 100 == 0:
            losses.append(round(float(lossv), 6))
            print(f"step {i}: loss {losses[-1]} g_t="
                  f"{np.asarray(gauge)[:, :3].round(4).tolist()}", flush=True)

    G = np.asarray(gauge)
    # correction: est' = G^-1 o est (G placed the drifted canonical at truth)
    corrected = lie.se3_multiply(
        lie.se3_inverse(jnp.asarray(G))[None], est)
    t_after, r_after = pose_errors(corrected)
    print(f"fitted G t={G[:, :3].round(4).tolist()} vs drift "
          f"{delta_t.round(4).tolist()}", flush=True)
    print(f"after: trans={t_after} rot={r_after}", flush=True)

    result = {"ckpt": args.ckpt, "steps": args.steps,
              "depth_lambda": args.depth_lambda, "freeze_rot": args.freeze_rot,
              "drift_delta_t": delta_t.tolist(), "fitted_G": G.tolist(),
              "loss_curve": losses,
              "trans_before": t_before, "rot_before": r_before,
              "trans_after": t_after, "rot_after": r_after,
              "elapsed_s": round(time.time() - t0, 1)}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
