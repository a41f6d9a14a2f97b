"""End-to-end convergence demonstration on the synthetic dynamic scene.

Drives the PRODUCTION apps (apps/app_init.py, apps/online.py) through the
full two-stage pipeline on one TPU chip, using the shipped
startrax/configs/synthetic_star_online.txt recipe:

  1. appearance init of the static field (PSNR gate),
  2. online tracking: noisy pose init -> warmup (field-form + BARF) ->
     curriculum -> block-coordinate polish with GT-free photometric
     best-epoch selection; reports pose error vs ground truth, PSNR,
     throughput, and the photometric-vs-GT-oracle selection comparison.

This is the self-contained counterpart of the reference's CARLA experiments
(no CARLA captures ship with either repo). Since round 3 the script holds no
training logic of its own — the same result is reproducible with
`python -m startrax.apps.online --config startrax/configs/synthetic_star_online.txt`.

Usage: python scripts/synthetic_e2e.py [--minutes 120] [--set key=value ...]
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
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--out", default="/tmp/startrax_e2e")
    ap.add_argument("--config", default=CONFIG,
                    help="base config file (default: synthetic_star_online.txt)")
    ap.add_argument("--appinit_minutes", type=float, default=0.0,
                    help="appearance-init budget (default: min(0.35*minutes, 35))")
    ap.add_argument("--appinit_ckpt", default="",
                    help="restore appearance-init params from this checkpoint "
                         "dir instead of training stage 1")
    ap.add_argument("--resume_from", default="",
                    help="online checkpoint dir from a previous run (skips "
                         "appearance init; restores params + curriculum + "
                         "optimizer states)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on host CPU (smoke tests; JAX_PLATFORMS env is "
                         "ignored under the axon plugin)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                    help="config override on top of synthetic_star_online.txt "
                         "(repeatable), e.g. --set seed=7 "
                         "--set reference_numerics=true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)

    overrides = []
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides += [f"--{k}", v]

    from startrax.utils.config import load_config

    base_argv = ["--config", args.config, "--basedir", args.out,
                 "--expname", "e2e"]
    if args.cpu:
        base_argv += ["--mixed_precision", "false"]

    # ---------------- stage 1: appearance init ----------------
    t_start = time.time()
    appinit_budget = args.appinit_minutes or min(args.minutes * 0.35, 35.0)
    appinit_dir = args.appinit_ckpt
    if not appinit_dir and not args.resume_from:
        from startrax.apps import app_init

        cfg1 = load_config(base_argv + [
            "--appearance_init_thres", "2e-6",
            "--epochs_appearance", "10000",
            "--train_minutes", str(appinit_budget),
        ] + overrides)
        app_init.train(cfg1)
        appinit_dir = os.path.join(args.out, "e2e", "app_init", "ckpts")
        print(f"appearance init done -> {appinit_dir}", flush=True)

    # ---------------- stage 2: online tracking ----------------
    online_budget = max(args.minutes - (time.time() - t_start) / 60.0, 1.0)
    argv2 = base_argv + ["--train_minutes", str(online_budget)]
    if args.resume_from:
        argv2 += ["--online_ckpt_path", args.resume_from]
    else:
        argv2 += ["--appearance_ckpt_path", appinit_dir]
    cfg2 = load_config(argv2 + overrides)

    from startrax.apps import online as online_app
    from startrax.apps.common import make_dataset, host_prng
    from startrax.utils.config import star_config_from

    t_online = time.time()
    params = online_app.train(cfg2)
    online_secs = time.time() - t_online

    run_dir = os.path.join(args.out, "e2e", "online")
    with open(os.path.join(run_dir, "history.json")) as f:
        history = json.load(f)

    # ---------------- summary + artifacts ----------------
    import numpy as np
    import jax.numpy as jnp

    from startrax.eval.image import psnr as psnr_fn
    from startrax.eval.pose import get_pose_metrics_multi
    from startrax.eval.render import render_image
    from startrax.train import loop

    star_cfg = star_config_from(cfg2)
    import dataclasses as _dc

    star_cfg = _dc.replace(star_cfg, end_barf=-1)
    train_data = make_dataset(cfg2, "train")
    val_data = make_dataset(cfg2, "val")
    gt_rel = np.swapaxes(train_data.gt_relative_poses(), 0, 1)  # [F, K, 7]

    # deterministic noisy init (same seed path as apps/online._init_params)
    rng, _ = host_prng(cfg2.seed)
    noisy = train_data.noisy_gt_relative_poses(rng)
    init_poses = np.swapaxes(noisy, 0, 1)[1:]

    def pose_errors(poses):
        trans, rot, *_ = get_pose_metrics_multi(np.asarray(poses), gt_rel[1:])
        return [float(t) for t in trans], [float(r) for r in rot]

    init_trans, init_rot = pose_errors(init_poses)
    final_trans, final_rot = pose_errors(params["poses"])

    # selection comparison: photometric pick vs the GT-pose oracle pick,
    # over the post-curriculum epochs that have both signals
    scored = [h for h in history if "score" in h and "trans" in h]
    sel_cmp = None
    if scored:
        photo_best = min(scored, key=lambda h: h["score"])
        gt_best = min(scored, key=lambda h: sum(h["trans"]) + sum(h["rot"]))
        sel_cmp = {
            "photometric_best_epoch": photo_best["epoch"],
            "photometric_best_trans": photo_best["trans"],
            "photometric_best_rot": photo_best["rot"],
            "gt_oracle_best_epoch": gt_best["epoch"],
            "gt_oracle_best_trans": gt_best["trans"],
            "gt_oracle_best_rot": gt_best["rot"],
        }

    # final eval render: last frame, first held-out view
    rays_o, rays_d = val_data.view_rays(0)
    frame = cfg2.num_frames - 1
    pose = loop.gather_frame_pose(jnp.asarray(params["poses"]),
                                  jnp.asarray(frame), star_cfg.num_vehicles)
    out = render_image(params["nerf"], star_cfg, rays_o, rays_d, pose=pose,
                       with_test_outputs=True)
    final_psnr = float(psnr_fn(jnp.asarray(out["rgb"]),
                               jnp.asarray(val_data.images[0, frame])))

    # wall-clock rays/s including per-epoch eval renders (an end-to-end
    # number; bench.py isolates the raw step throughput)
    rays_per_sec = (len(history) * cfg2.steps_per_epoch * cfg2.N_rand
                    / max(online_secs, 1e-9)) if history else 0.0

    window_max = max((h["window"] for h in history), default=0)
    summary = {
        "online_epochs": len(history),
        "frames_admitted": window_max,
        "curriculum_done": window_max > cfg2.num_frames,
        "final_frame_psnr": round(final_psnr, 2),
        "init_trans_error": [round(t, 4) for t in init_trans],
        "final_trans_error": [round(t, 4) for t in final_trans],
        "init_rot_error": [round(r, 4) for r in init_rot],
        "final_rot_error": [round(r, 4) for r in final_rot],
        "online_rays_per_sec": round(rays_per_sec, 0),
        "selection_mode": cfg2.selection,
        "selection_comparison": sel_cmp,
        "recipe": {
            "config": args.config, "overrides": args.set,
            "polish_mode": cfg2.polish_mode,
            "ghost_sample_ratio": cfg2.ghost_sample_ratio,
            "frame0_sample_ratio": cfg2.frame0_sample_ratio,
            "end_barf": cfg2.end_barf,
            "pose_delay_epochs": cfg2.pose_delay_epochs,
            "mixed_frames": cfg2.mixed_frames,
            "seed": cfg2.seed,
        },
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    # artifacts: rendered decomposition panels + tracking video
    import imageio.v2 as imageio
    from startrax.ops.losses import to8b
    from startrax.utils.vis import visualize_depth

    frames_rgb = []
    for f in range(cfg2.num_frames):
        pose_f = loop.gather_frame_pose(jnp.asarray(params["poses"]),
                                        jnp.asarray(f), star_cfg.num_vehicles)
        o = render_image(params["nerf"], star_cfg, rays_o, rays_d, pose=pose_f,
                         with_test_outputs=True)
        frames_rgb.append(to8b(o["rgb"]))
        if f == cfg2.num_frames - 1:
            imageio.imwrite(os.path.join(args.out, "final_rgb.png"), to8b(o["rgb"]))
            imageio.imwrite(os.path.join(args.out, "final_target.png"),
                            to8b(val_data.images[0, f]))
            imageio.imwrite(os.path.join(args.out, "final_static.png"),
                            to8b(o["rgb_static"]))
            imageio.imwrite(os.path.join(args.out, "final_dynamic.png"),
                            to8b(o["rgb_dynamic_all"]))
            imageio.imwrite(os.path.join(args.out, "final_depth.png"),
                            to8b(visualize_depth(o["depth"])))
    try:
        imageio.mimwrite(os.path.join(args.out, "tracking.mp4"), frames_rgb, fps=2)
    except (ValueError, ImportError):
        imageio.mimwrite(os.path.join(args.out, "tracking.gif"), frames_rgb,
                         duration=500, loop=0)
    print("SUMMARY " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
