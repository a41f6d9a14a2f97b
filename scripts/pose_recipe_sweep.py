"""Controlled pose-recipe sweep on the synthetic scene (one TPU chip).

Short online-training phases from a SHARED appearance checkpoint and the
SAME noisy pose init, with the curriculum frozen at the initial window, so
recipe variants are compared purely on their pose-error trajectory. Scores
each variant by the final-vs-init pose error ratio.

Usage:
  python scripts/pose_recipe_sweep.py --appinit_ckpt DIR [--epochs 15]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from startrax.data.prefetch import BatchPrefetcher
from startrax.data.synthetic import SyntheticAdapter, SyntheticScene
from startrax.eval.pose import get_pose_metrics_multi
from startrax.models.star import StarConfig, init_star
from startrax.train import checkpoint as ckpt_mod
from startrax.train import loop, optim

VARIANTS = {
    # name: overrides
    "r1_exact": dict(),  # round-1 validated: single-frame, no car ratio, accum 1
    "accum8": dict(accum=8),
    "mixed_car": dict(mixed=True, car=0.25, accum=8),
    "strong_regs": dict(ae=5e-3, dvs=5e-3),
    "fast_dyn": dict(lrate_dynamic=2e-3),
    "pose_lr_hi": dict(lrate_pose=2e-3),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--appinit_ckpt", required=True)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--n_rand", type=int, default=2048)
    ap.add_argument("--steps_per_epoch", type=int, default=500)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--only", default="", help="comma-separated variant names")
    ap.add_argument("--out", default="/tmp/pose_sweep.json")
    args = ap.parse_args()

    scene = SyntheticScene(num_vehicles=2, num_frames=8, H=args.height,
                           W=args.height, focal=float(args.height))
    data = SyntheticAdapter(scene, num_views=8)
    cfg = StarConfig(
        num_vehicles=2, netdepth=8, netdepth_fine=8, netwidth=128,
        netwidth_fine=128, n_samples=64, n_importance=64,
        near=scene.near, far=scene.far, compute_dtype=jnp.bfloat16,
    )
    gt_rel = np.swapaxes(data.gt_relative_poses(), 0, 1)

    rng = np.random.default_rng(42)
    noisy = data.noisy_gt_relative_poses(rng)
    noisy_poses = jnp.asarray(np.swapaxes(noisy, 0, 1)[1:])

    base_params = loop.init_online_params(jax.random.PRNGKey(7), cfg, scene.num_frames)
    app = ckpt_mod.restore_checkpoint(args.appinit_ckpt,
                                      template={"params": init_star(jax.random.PRNGKey(0), cfg)})
    base_params = ckpt_mod.restore_static_only(app["params"], base_params)
    base_params["poses"] = noisy_poses

    def pose_errors(poses):
        trans, rot, *_ = get_pose_metrics_multi(np.asarray(poses), gt_rel[1:])
        return np.asarray(trans, np.float64), np.asarray(rot, np.float64)

    init_t, init_r = pose_errors(noisy_poses)
    print(f"init: trans={init_t.round(4).tolist()} rot={init_r.round(4).tolist()}",
          flush=True)

    names = [n for n in (args.only.split(",") if args.only else VARIANTS) if n]
    results = {}
    for name in names:
        ov = VARIANTS[name]
        params = jax.tree.map(jnp.copy, base_params)
        tx = optim.make_fused_star_optimizer(
            params, lrate_static=1e-4,
            lrate_dynamic=ov.get("lrate_dynamic", 5e-4),
            lrate_pose=ov.get("lrate_pose", 5e-4),
            steps_per_epoch=args.steps_per_epoch, decay_milestones=[60],
            grad_clip=1.0, accumulate_steps=ov.get("accum", 1),
        )
        opt_state = tx.init(params)
        loss_cfg = loop.LossConfig(
            lambda_alpha_entropy=ov.get("ae", 1e-3),
            lambda_dynamic_vs_static_reg=ov.get("dvs", 1e-3),
            lambda_ray_reg=1e-5,
        )
        step_fn = loop.make_online_train_step(cfg, loss_cfg, tx)
        mixed = ov.get("mixed", False)
        car = ov.get("car", 0.0)

        pf = BatchPrefetcher(
            lambda r, st, mixed=mixed, car=car: data.sample_batch(
                r, args.n_rand, start_frame=0, current_frame=args.window,
                mixed_frames=mixed, car_sample_ratio=car),
            {}, seed=99, depth=6, workers=2)
        key = jax.random.PRNGKey(5)
        hist = []
        t0 = time.time()
        for epoch in range(args.epochs):
            fines = []
            for _ in range(args.steps_per_epoch):
                batch = {k: jnp.asarray(v) for k, v in next(pf).items()}
                key, sub = jax.random.split(key)
                params, opt_state, lossv, m = step_fn(
                    params, opt_state, batch, sub, jnp.asarray(epoch))
                fines.append(m["fine_loss"])
            fine = float(np.mean(np.asarray(jnp.stack(fines))))
            t, r = pose_errors(params["poses"])
            hist.append({"fine": round(fine, 5),
                         "trans": t.round(4).tolist(), "rot": r.round(4).tolist()})
            print(f"[{name}] ep{epoch}: fine={fine:.5f} trans={t.round(4).tolist()} "
                  f"rot={r.round(4).tolist()}", flush=True)
        pf.close()
        t, r = pose_errors(params["poses"])
        results[name] = {
            "final_trans": t.round(4).tolist(), "final_rot": r.round(4).tolist(),
            "trans_ratio": (t / init_t).round(3).tolist(),
            "rot_ratio": (r / init_r).round(3).tolist(),
            "fine": hist[-1]["fine"],
            "minutes": round((time.time() - t0) / 60, 1),
            "hist": hist,
        }
        with open(args.out, "w") as f:
            json.dump({"init_trans": init_t.tolist(), "init_rot": init_r.tolist(),
                       "results": results}, f, indent=1)
        print(f"[{name}] DONE trans_ratio={results[name]['trans_ratio']} "
              f"rot_ratio={results[name]['rot_ratio']}", flush=True)


if __name__ == "__main__":
    main()
