"""End-to-end convergence demonstration on the synthetic dynamic scene.

Runs the full two-stage pipeline on one TPU chip:
  1. appearance init of the static field (PSNR gate),
  2. online tracking: noisy pose init -> joint field+pose optimization with
     the curriculum; reports pose error vs ground truth, PSNR, throughput.

This is the self-contained counterpart of the reference's CARLA experiments
(no CARLA captures ship with either repo). Results land in the run dir and
are summarized on stdout as JSON.

Usage: python scripts/synthetic_e2e.py [--minutes 30]
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
from startrax.eval.image import psnr as psnr_fn, ssim as ssim_fn
from startrax.eval.pose import get_pose_metrics_multi
from startrax.eval.render import render_image
from startrax.models.star import StarConfig, init_star
from startrax.ops import lie
from startrax.train import checkpoint as ckpt_mod
from startrax.train import loop, optim
from startrax.train.curriculum import CurriculumConfig, CurriculumState, advance
from startrax.utils.profiling import StepTimer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=30.0)
    ap.add_argument("--out", default="/tmp/startrax_e2e")
    ap.add_argument("--height", type=int, default=80)
    ap.add_argument("--vehicles", type=int, default=2)
    ap.add_argument("--lrate_pose", type=float, default=5e-4)
    ap.add_argument("--lrate_dynamic", type=float, default=5e-4)
    ap.add_argument("--lrate_static", type=float, default=1e-4,
                    help="online static-field LR; raise to let the static "
                         "field carve out the frame-0 vehicle ghosts")
    ap.add_argument("--lambda_alpha_entropy", type=float, default=1e-3)
    ap.add_argument("--lambda_dvs", type=float, default=1e-3,
                    help="dynamic-vs-static separation regularizer weight")
    ap.add_argument("--lambda_static_reg", type=float, default=0.0)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--pose_only_every", type=int, default=3,
                    help="every N epochs, run one pose-only epoch (fields frozen)")
    ap.add_argument("--mixed_frames", type=int, default=1,
                    help="sample each ray's frame independently (every pose "
                         "gets gradient every step)")
    ap.add_argument("--car_ratio", type=float, default=0.25,
                    help="fraction of rays forced onto vehicle pixels (joint epochs)")
    ap.add_argument("--car_ratio_pose", type=float, default=0.5,
                    help="vehicle-pixel ray fraction during pose-only epochs")
    ap.add_argument("--cpu", action="store_true",
                    help="run on host CPU (smoke tests; JAX_PLATFORMS env is "
                         "ignored under the axon plugin)")
    ap.add_argument("--n_rand", type=int, default=2048)
    ap.add_argument("--width", type=int, default=128,
                    help="field MLP width")
    ap.add_argument("--samples", type=int, default=64,
                    help="coarse/fine sample count per ray")
    ap.add_argument("--steps_per_epoch", type=int, default=500)
    ap.add_argument("--appinit_minutes", type=float, default=0.0,
                    help="appearance-init budget (default: min(0.35*minutes, 35))")
    ap.add_argument("--target_pose_err", type=float, default=0.008,
                    help="stop once every vehicle's trans AND rot error is "
                         "below this (curriculum must be complete)")
    ap.add_argument("--ckpt_every", type=int, default=10,
                    help="save a checkpoint + history every N online epochs")
    ap.add_argument("--resume_from", default="",
                    help="checkpoint dir from a previous run: skip appearance "
                         "init, restore params (+ curriculum/epoch when the "
                         "checkpoint has them; else pass --resume_window/"
                         "--resume_epoch). Optimizer moments restart fresh.")
    ap.add_argument("--resume_window", type=int, default=0)
    ap.add_argument("--resume_epoch", type=int, default=0)
    ap.add_argument("--polish_pose_decay_rate", type=float, default=0.8)
    ap.add_argument("--polish_pose_decay_epochs", type=int, default=12)
    ap.add_argument("--polish_patience", type=int, default=40,
                    help="stop the polish stage after N epochs without a new "
                         "best pose error and restore the best snapshot "
                         "(late polish drifts; the best-epoch criterion uses "
                         "GT pose error, which this synthetic benchmark has "
                         "by construction); 0 disables")
    ap.add_argument("--appinit_ckpt", default="",
                    help="restore appearance-init params from this checkpoint "
                         "dir instead of training stage 1")
    ap.add_argument("--reference_numerics", action="store_true",
                    help="composite with the reference's pre-activation "
                         "density sum (A/B lever, see ops/compositing.py)")
    ap.add_argument("--pose_delay_epochs", type=int, default=4,
                    help="freeze ALL pose updates for the first N epochs so "
                         "the dynamic fields form before poses see gradients")
    ap.add_argument("--end_barf", type=int, default=12,
                    help="BARF coarse-to-fine warmup epochs on the DYNAMIC "
                         "fields: low-frequency-first fields widen the pose "
                         "basins of attraction past the vehicle texture's "
                         "local minima (validated: the analytic-field pose "
                         "diagnostic converges 0.088 -> 1e-6 with a coarse "
                         "stage, but locks onto the wrong texture stripe "
                         "without one); 0 disables")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)
    deadline = time.time() + args.minutes * 60

    scene = SyntheticScene(
        num_vehicles=args.vehicles, num_frames=8, H=args.height, W=args.height,
        focal=float(args.height),
    )
    data = SyntheticAdapter(scene, num_views=8,
                            cache_dir="/tmp/startrax_synth_cache")
    cfg = StarConfig(
        num_vehicles=args.vehicles, netdepth=8, netdepth_fine=8,
        netwidth=args.width, netwidth_fine=args.width,
        n_samples=args.samples, n_importance=args.samples,
        near=scene.near, far=scene.far,
        compute_dtype=jnp.float32 if args.cpu else jnp.bfloat16,
        reference_numerics=args.reference_numerics,
    )
    rng = np.random.default_rng(42)
    key = jax.random.PRNGKey(42)
    n_rand = args.n_rand

    spe = args.steps_per_epoch
    rays_o, rays_d = data.view_rays(0)

    # ---------------- stage 1: appearance init ----------------
    appinit_psnr = float("nan")
    if args.appinit_ckpt and not args.resume_from:
        params = init_star(key, cfg)
        params = ckpt_mod.restore_checkpoint(
            args.appinit_ckpt, template={"params": params})["params"]
        print(f"appearance init restored from {args.appinit_ckpt}", flush=True)
    elif not args.resume_from:
        params = init_star(key, cfg)
        tx = optim.make_appinit_optimizer(5e-4, steps_per_epoch=spe, decay_epochs=20, params=params)
        opt_state = tx.init(params)
        step_fn = loop.make_appinit_train_step(cfg, loop.LossConfig(), tx)

        appinit_budget = args.appinit_minutes * 60 or min(args.minutes * 60 * 0.35, 35 * 60)
        appinit_budget = min(appinit_budget, deadline - time.time())
        t0 = time.time()
        step = 0
        timer = StepTimer(sync_every=100)
        recent_fine = 1.0
        pf_init = BatchPrefetcher(
            lambda r, st: data.sample_batch(r, n_rand, frame=0),
            {}, seed=1000, depth=6, workers=2)
        while time.time() - t0 < appinit_budget and recent_fine > 2e-6:
            batch = {k: jnp.asarray(v) for k, v in next(pf_init).items()}
            key, sub = jax.random.split(key)
            params, opt_state, lossv, metrics = step_fn(params, opt_state, batch, sub)
            timer.tick(lossv, n_rand)
            step += 1
            if step % 500 == 0:
                recent_fine = float(metrics["fine_loss"])
                print(f"appinit step {step}: fine={float(metrics['fine_loss']):.5f} "
                      f"psnr={float(metrics['psnr']):.2f} rays/s={timer.rays_per_sec:.0f}",
                      flush=True)
        appinit_steps = step

        pf_init.close()

        ckpt_mod.save_checkpoint(os.path.join(args.out, "ckpt_appinit"),
                                 {"params": params}, step=0)

        # static val render
        out = render_image(params, cfg, rays_o, rays_d, pose=None)
        appinit_psnr = float(psnr_fn(jnp.asarray(out["rgb"]), jnp.asarray(data.images[0, 0])))
        print(f"appinit done: {appinit_steps} steps, val PSNR {appinit_psnr:.2f}", flush=True)

    # ---------------- stage 2: online tracking ----------------
    cur_cfg = CurriculumConfig(num_frames=scene.num_frames, initial_num_frames=5,
                               online_thres=2e-3, min_epochs_between=2)
    online_params = loop.init_online_params(jax.random.PRNGKey(7), cfg, scene.num_frames)
    # deterministic noisy init (rng(42) untouched so far) — also the init-error
    # reference when resuming
    noisy = data.noisy_gt_relative_poses(rng)  # [K, F, 7]
    noisy_poses = jnp.asarray(np.swapaxes(noisy, 0, 1)[1:])
    start_epoch = 0
    restored_cur = None
    if args.resume_from:
        saved = ckpt_mod.checkpoint_keys(args.resume_from)
        template = {"params": online_params}
        if "epoch" in saved:
            template["epoch"] = np.asarray(0)
        if "curriculum" in saved:
            template["curriculum"] = jax.tree.map(
                np.asarray,
                ckpt_mod.curriculum_to_dict(CurriculumState.initial(cur_cfg)))
        restored = ckpt_mod.restore_checkpoint(args.resume_from, template=template)
        online_params = restored["params"]
        if "curriculum" in restored:
            restored_cur = ckpt_mod.curriculum_from_dict(restored["curriculum"])
        start_epoch = int(restored.get("epoch", args.resume_epoch))
        print(f"resumed from {args.resume_from} at epoch {start_epoch}", flush=True)
    else:
        online_params = ckpt_mod.restore_static_only(params, online_params)
        online_params["poses"] = noisy_poses
    gt_rel = np.swapaxes(data.gt_relative_poses(), 0, 1)  # [F, K, 7]

    tx2 = optim.make_fused_star_optimizer(
        online_params, lrate_static=args.lrate_static,
        lrate_dynamic=args.lrate_dynamic,
        lrate_pose=args.lrate_pose,
        steps_per_epoch=spe, decay_milestones=[60], grad_clip=1.0,
        accumulate_steps=args.accum,
    )
    opt2 = tx2.init(online_params)
    loss_cfg = loop.LossConfig(
        lambda_alpha_entropy=args.lambda_alpha_entropy,
        lambda_dynamic_vs_static_reg=args.lambda_dvs,
        lambda_static_reg=args.lambda_static_reg,
        lambda_ray_reg=1e-5,
    )
    ostep = loop.make_online_train_step(cfg, loss_cfg, tx2)

    # BARF warmup variant: identical step but the dynamic fields' positional
    # encoding is coarse-to-fine masked by the epoch index (the static field
    # always sees full frequencies — it is already trained). A separate full-
    # frequency step (above) takes over after the warmup so the fused
    # in-kernel-PE path runs at full speed for the rest of training.
    ostep_barf = None
    if args.end_barf > 0:
        import dataclasses as _dc

        cfg_barf = _dc.replace(cfg, end_barf=args.end_barf)
        # rotations frozen during warmup: a blurred dynamic field is nearly
        # rotation-symmetric, so rotation gradients are noise and random-walk
        ostep_barf = loop.make_online_train_step(
            cfg_barf, loss_cfg, tx2, freeze_rot=True)
        # field-forming phase: poses completely frozen (zero pose LR) while
        # the coarse dynamic fields take shape
        tx_fieldform = optim.make_fused_star_optimizer(
            online_params, lrate_static=args.lrate_static,
            lrate_dynamic=args.lrate_dynamic,
            lrate_pose=0.0, steps_per_epoch=spe, grad_clip=1.0,
            accumulate_steps=args.accum,
        )
        opt_fieldform = tx_fieldform.init(online_params)
        ostep_fieldform = loop.make_online_train_step(
            cfg_barf, loss_cfg, tx_fieldform)

    # pose-only refinement: identical step with field LRs pinned to zero —
    # breaks the field/pose co-adaptation race (round-1 gap #1)
    tx_pose = optim.make_fused_star_optimizer(
        online_params, lrate_static=0.0, lrate_dynamic=0.0,
        lrate_pose=args.lrate_pose, steps_per_epoch=spe, grad_clip=1.0,
        accumulate_steps=args.accum,
    )
    opt_pose = tx_pose.init(online_params)
    ostep_pose = loop.make_online_train_step(cfg, loss_cfg, tx_pose)

    if restored_cur is not None:
        cur = restored_cur
    elif args.resume_window > 0:  # old checkpoints without curriculum state
        cur = CurriculumState(
            current_frame=args.resume_window, threshold=cur_cfg.tightened_thres,
            done=args.resume_window > cur_cfg.num_frames)
    else:
        cur = CurriculumState.initial(cur_cfg)

    def pose_errors(poses):
        trans, rot, *_ = get_pose_metrics_multi(np.asarray(poses), gt_rel[1:])
        return [float(t) for t in trans], [float(r) for r in rot]

    init_trans, init_rot = pose_errors(noisy_poses)
    print(f"initial pose error: trans={init_trans} rot={init_rot}", flush=True)

    # polish-stage optimizer: pose-only with a decaying pose LR (fresh Adam
    # moments; the curriculum-phase schedules keep running in opt_pose)
    tx_polish = optim.make_fused_star_optimizer(
        online_params, lrate_static=0.0, lrate_dynamic=0.0,
        lrate_pose=args.lrate_pose, steps_per_epoch=spe,
        pose_decay_rate=args.polish_pose_decay_rate,
        pose_decay_epochs=args.polish_pose_decay_epochs,
        grad_clip=1.0, accumulate_steps=args.accum,
    )
    opt_polish = tx_polish.init(online_params)
    ostep_polish = loop.make_online_train_step(cfg, loss_cfg, tx_polish)

    epoch = start_epoch
    timer2 = StepTimer(sync_every=100)
    history = []
    polish_start = None  # wall-clock when the polish stage began
    mixed = bool(args.mixed_frames)

    sample_state = {"start": 0, "end": 1, "car": args.car_ratio}
    pf = BatchPrefetcher(
        lambda r, st: data.sample_batch(
            r, n_rand, start_frame=st["start"], current_frame=st["end"],
            mixed_frames=mixed, car_sample_ratio=st["car"]),
        sample_state, seed=2000, depth=6, workers=2)

    def run_epoch(step_fn, opt_st, car_ratio, epoch_idx):
        # current_frame = num_frames + 1 once the curriculum is done
        sample_state.update(
            start=cur.start_frame, end=min(cur.current_frame, scene.num_frames),
            car=car_ratio)
        fines = []
        for _ in range(spe):
            batch = {k: jnp.asarray(v) for k, v in next(pf).items()}
            nonlocal key
            key, sub = jax.random.split(key)
            p, opt_st, lossv, metrics = step_fn(
                online_params_box[0], opt_st, batch, sub, jnp.asarray(epoch_idx)
            )
            online_params_box[0] = p
            timer2.tick(lossv, n_rand)
            fines.append(metrics["fine_loss"])
        return opt_st, float(np.mean(np.asarray(jnp.stack(fines))))

    online_params_box = [online_params]
    best = {"score": float("inf"), "epoch": -1, "params": None,
            "trans": None, "rot": None}
    while time.time() < deadline:
        in_polish = cur.done
        in_barf = ostep_barf is not None and epoch < args.end_barf
        if in_polish and polish_start is None:
            polish_start = time.time()
            print("curriculum complete -> pose-polish stage", flush=True)
        if in_polish:
            # 1 joint field-refresh epoch per 3 pose-only polish epochs
            pose_only = (epoch % 4) != 0
        elif in_barf:
            pose_only = False  # warmup: joint only, coarse-to-fine fields
        else:
            pose_only = args.pose_only_every > 0 and epoch > 0 and (
                epoch % args.pose_only_every == 0)

        ep_t0 = time.time()
        if in_barf and epoch < args.pose_delay_epochs:
            opt_fieldform, avg = run_epoch(ostep_fieldform, opt_fieldform,
                                           args.car_ratio, epoch)
        elif in_barf:
            opt2, avg = run_epoch(ostep_barf, opt2, args.car_ratio, epoch)
        elif in_polish and pose_only:
            opt_polish, avg = run_epoch(ostep_polish, opt_polish,
                                        args.car_ratio_pose, epoch)
        elif pose_only:
            opt_pose, avg = run_epoch(ostep_pose, opt_pose,
                                      args.car_ratio_pose, epoch)
        else:
            opt2, avg = run_epoch(ostep, opt2, args.car_ratio, epoch)

        if not cur.done:
            cur = advance(cur, cur_cfg, avg)
        trans_err, rot_err = pose_errors(online_params_box[0]["poses"])
        score = sum(trans_err) + sum(rot_err)
        if cur.done and score < best["score"]:
            best.update(score=score, epoch=epoch, trans=list(trans_err),
                        rot=list(rot_err),
                        params=jax.tree.map(np.asarray, online_params_box[0]))
        history.append({"epoch": epoch, "fine": round(avg, 6),
                        "window": cur.current_frame,
                        "pose_only": bool(pose_only), "polish": bool(in_polish),
                        "trans": [round(t, 5) for t in trans_err],
                        "rot": [round(r, 5) for r in rot_err]})
        tag = " [polish]" if in_polish else (
            " [pose-only]" if pose_only else (" [barf]" if in_barf else ""))
        print(
            f"online epoch {epoch}{tag}: "
            f"fine={avg:.5f} window={cur.current_frame} "
            f"trans={['%.4f' % t for t in trans_err]} rot={['%.4f' % r for r in rot_err]} "
            f"rays/s={timer2.rays_per_sec:.0f} ({time.time() - ep_t0:.0f}s)",
            flush=True,
        )
        epoch += 1
        if args.ckpt_every > 0 and epoch % args.ckpt_every == 0:
            ckpt_mod.save_checkpoint(
                os.path.join(args.out, "ckpt"),
                {"params": online_params_box[0],
                 "curriculum": jax.tree.map(np.asarray,
                                            ckpt_mod.curriculum_to_dict(cur)),
                 "epoch": np.asarray(epoch)},
                step=epoch)
            ckpt_mod.gc_checkpoints(os.path.join(args.out, "ckpt"), keep_last=2)
            with open(os.path.join(args.out, "history.json"), "w") as f:
                json.dump(history, f)
        if cur.done and max(trans_err) < args.target_pose_err \
                and max(rot_err) < args.target_pose_err:
            print(f"pose target {args.target_pose_err} reached at epoch {epoch - 1}",
                  flush=True)
            break
        if (args.polish_patience > 0 and in_polish and best["epoch"] >= 0
                and epoch - best["epoch"] >= args.polish_patience):
            print(f"polish patience exhausted (best epoch {best['epoch']}, "
                  f"score {best['score']:.4f}); stopping", flush=True)
            break
    if best["params"] is not None and best["score"] < sum(
            pose_errors(online_params_box[0]["poses"])[0]) + sum(
            pose_errors(online_params_box[0]["poses"])[1]):
        print(f"restoring best-epoch {best['epoch']} snapshot", flush=True)
        online_params_box[0] = jax.tree.map(jnp.asarray, best["params"])
    online_params = online_params_box[0]

    # final eval: render a frame with learned poses
    frame = scene.num_frames - 1 if cur.done else max(cur.current_frame - 1, 1)
    pose = loop.gather_frame_pose(online_params["poses"], jnp.asarray(frame), cfg.num_vehicles)
    out = render_image(online_params["nerf"], cfg, rays_o, rays_d, pose=pose)
    final_psnr = float(psnr_fn(jnp.asarray(out["rgb"]), jnp.asarray(data.images[0, frame])))
    final_trans, final_rot = pose_errors(online_params["poses"])

    summary = {
        "appinit_val_psnr": round(appinit_psnr, 2),
        "online_epochs": epoch,
        "frames_admitted": cur.current_frame,
        "curriculum_done": cur.done,
        "final_frame_psnr": round(final_psnr, 2),
        "init_trans_error": [round(t, 4) for t in init_trans],
        "final_trans_error": [round(t, 4) for t in final_trans],
        "init_rot_error": [round(r, 4) for r in init_rot],
        "final_rot_error": [round(r, 4) for r in final_rot],
        "online_rays_per_sec": round(timer2.rays_per_sec, 0),
        "best_epoch": best["epoch"],
        "best_trans_error": [round(t, 4) for t in best["trans"]] if best["trans"] else None,
        "best_rot_error": [round(r, 4) for r in best["rot"]] if best["rot"] else None,
        "recipe": {
            "mixed_frames": bool(args.mixed_frames),
            "car_ratio": args.car_ratio, "car_ratio_pose": args.car_ratio_pose,
            "pose_only_every": args.pose_only_every, "accum": args.accum,
            "lrate_pose": args.lrate_pose,
        },
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    with open(os.path.join(args.out, "history.json"), "w") as f:
        json.dump(history, f)

    # artifacts: final checkpoint + rendered decomposition panels + video
    ckpt_mod.save_checkpoint(os.path.join(args.out, "ckpt"),
                             {"params": online_params}, step=epoch)
    import imageio.v2 as imageio
    from startrax.ops.losses import to8b
    from startrax.utils.vis import visualize_depth

    frames_rgb = []
    for f in range(scene.num_frames):
        pose_f = loop.gather_frame_pose(
            online_params["poses"], jnp.asarray(f), cfg.num_vehicles)
        o = render_image(online_params["nerf"], cfg, rays_o, rays_d, pose=pose_f,
                         with_test_outputs=True)
        frames_rgb.append(to8b(o["rgb"]))
        if f == scene.num_frames - 1:
            imageio.imwrite(os.path.join(args.out, "final_rgb.png"), to8b(o["rgb"]))
            imageio.imwrite(os.path.join(args.out, "final_target.png"),
                            to8b(data.images[0, f]))
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
