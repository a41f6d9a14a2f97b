"""Online tracking: jointly optimize radiance fields and per-frame SE(3)
vehicle poses by photometric self-supervision, admitting frames via the
curriculum.

Counterpart of the reference train_online__.py (StarOnline): warm start from
the appearance checkpoint (static weights only), learnable pose table with
frame 0 pinned to identity, hybrid optimizer, five regularizers, frame-window
curriculum, val renders with pose metrics, and a test mode computing the
full parity metric suite (masked PSNR/SSIM, pose errors, RPE/ATE, 2D/3D IoU)
plus TUM-style pose export.

Usage:
  python -m startrax.apps.online --config startrax/configs/carla_star_online.txt
  python -m startrax.apps.online --config ... --test true
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval import iou as iou_mod
from ..eval import pose as pose_mod
from ..eval import trajectory as traj_mod
from ..eval.image import psnr as psnr_fn, ssim as ssim_fn, masked_ssim
from ..eval.render import render_image
from ..ops import lie
from ..train import checkpoint as ckpt
from ..train import loop, optim
from ..train.curriculum import CurriculumConfig, CurriculumState, advance
from ..utils.config import Config, load_config, star_config_from, loss_config_from
from .common import Workspace, make_dataset, host_prng




def _init_params(cfg: Config, star_cfg, key, train_data, rng):
    params = loop.init_online_params(key, star_cfg, cfg.num_frames)

    if cfg.appearance_ckpt_path:
        template = {"params": loop.init_online_params(key, star_cfg, cfg.num_frames)["nerf"]}
        app = ckpt.restore_checkpoint(cfg.appearance_ckpt_path, None)
        app_params = app["params"] if "params" in app else app
        params = ckpt.restore_static_only(app_params, params)

    if cfg.load_gt_poses:
        # debug path: train with ground-truth poses (reference
        # train_online__.py:102-117); poses are pinned by a zero pose LR set
        # by the caller
        gt = np.swapaxes(train_data.gt_relative_poses(), 0, 1)  # [F, K, 7]
        params["poses"] = jnp.asarray(gt[1:])
    elif cfg.noisy_pose_init and hasattr(train_data, "noisy_gt_relative_poses"):
        noisy = train_data.noisy_gt_relative_poses(rng)  # [K, F, 7]
        params["poses"] = jnp.asarray(np.swapaxes(noisy, 0, 1)[1:])  # [F-1, K, 7]
    return params


def train(cfg: Config):
    ws = Workspace(cfg, "online")
    star_cfg = star_config_from(cfg)
    loss_cfg = loss_config_from(cfg)

    train_data = make_dataset(cfg, "train")
    val_data = make_dataset(cfg, "val")
    gt_rel = np.swapaxes(train_data.gt_relative_poses(), 0, 1)  # [F, K, 7]

    rng, key = host_prng(1453)
    params = _init_params(cfg, star_cfg, key, train_data, rng)

    tx = optim.make_fused_star_optimizer(
        params,
        lrate_static=cfg.lrate_static,
        lrate_dynamic=cfg.lrate_dynamic,
        lrate_pose=0.0 if cfg.load_gt_poses else cfg.lrate_pose,
        steps_per_epoch=cfg.steps_per_epoch,
        decay_rate=cfg.lrate_decay_rate,
        decay_epochs=cfg.lrate_decay,
        decay_milestones=cfg.lrate_decay_steps,
        pose_decay_rate=cfg.pose_lrate_decay_rate,
        pose_decay_epochs=cfg.pose_lrate_decay,
        pose_decay_milestones=cfg.pose_lrate_decay_steps,
        grad_clip=1.0,
        accumulate_steps=cfg.accumulate_grad_batches,
    )
    opt_state = tx.init(params)
    step_fn = loop.make_online_train_step(
        star_cfg, loss_cfg, tx, trans_only=cfg.pose_trans_only
    )

    opt_state_pose = None
    if cfg.pose_only_every > 0:
        tx_pose = optim.make_fused_star_optimizer(
            params, lrate_static=0.0, lrate_dynamic=0.0,
            lrate_pose=0.0 if cfg.load_gt_poses else cfg.lrate_pose,
            steps_per_epoch=cfg.steps_per_epoch,
            pose_decay_rate=cfg.pose_lrate_decay_rate,
            pose_decay_epochs=cfg.pose_lrate_decay,
            pose_decay_milestones=cfg.pose_lrate_decay_steps,
            grad_clip=1.0, accumulate_steps=cfg.accumulate_grad_batches,
        )
        opt_state_pose = tx_pose.init(params)
        step_fn_pose = loop.make_online_train_step(
            star_cfg, loss_cfg, tx_pose, trans_only=cfg.pose_trans_only
        )

    cur_cfg = CurriculumConfig(
        num_frames=cfg.num_frames,
        initial_num_frames=cfg.initial_num_frames,
        online_thres=cfg.online_thres,
    )
    cur = CurriculumState.initial(cur_cfg)

    if cfg.online_ckpt_path:
        template = {
            "params": params, "opt_state": opt_state,
            "curriculum": ckpt.curriculum_to_dict(cur), "epoch": 0,
        }
        saved_keys = ckpt.checkpoint_keys(cfg.online_ckpt_path)
        if opt_state_pose is not None and "opt_state_pose" in saved_keys:
            template["opt_state_pose"] = opt_state_pose
        restored = ckpt.restore_checkpoint(cfg.online_ckpt_path, template)
        params, opt_state = restored["params"], restored["opt_state"]
        if "opt_state_pose" in restored and opt_state_pose is not None:
            opt_state_pose = restored["opt_state_pose"]
        cur = ckpt.curriculum_from_dict(restored["curriculum"])
        ws.log(f"resumed online training at frame window {cur.current_frame}")

    step = 0
    for epoch in range(cfg.epochs_online):
        fine_losses = []
        crop = epoch < cfg.precrop_iters
        pose_only = (
            cfg.pose_only_every > 0 and epoch > 0
            and epoch % cfg.pose_only_every == 0
        )
        for _ in range(cfg.steps_per_epoch):
            batch = train_data.sample_batch(
                rng, cfg.N_rand,
                start_frame=cur.start_frame, current_frame=cur.current_frame,
                car_sample_ratio=cfg.car_sample_ratio, crop=crop,
            )
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            key, sub = jax.random.split(key)
            if pose_only:
                params, opt_state_pose, lossv, metrics = step_fn_pose(
                    params, opt_state_pose, batch, sub, jnp.asarray(epoch)
                )
            else:
                params, opt_state, lossv, metrics = step_fn(
                    params, opt_state, batch, sub, jnp.asarray(epoch)
                )
            step += 1
            fine_losses.append(metrics["fine_loss"])  # device scalar, no sync
        avg_fine = float(np.mean(np.asarray(jnp.stack(fine_losses))))  # one device fetch

        prev_frame = cur.current_frame
        if epoch >= cfg.precrop_iters:
            cur = advance(cur, cur_cfg, avg_fine)
        if cur.current_frame != prev_frame:
            ws.log(f"curriculum: admitted frame {cur.current_frame - 1}")
        ws.metrics.log(
            {"train/fine_loss": avg_fine, "train/current_frame_num": cur.current_frame,
             "epoch": epoch},
            step,
        )

        if (epoch + 1) % cfg.epoch_val == 0:
            _validate(ws, cfg, params, star_cfg, val_data, gt_rel, rng, cur, step)
            state = {"params": params, "opt_state": opt_state,
                     "curriculum": ckpt.curriculum_to_dict(cur), "epoch": epoch}
            if opt_state_pose is not None:
                state["opt_state_pose"] = opt_state_pose
            ckpt.save_checkpoint(ws.ckpt_dir, state, step=epoch)

        if cur.done:
            ws.log("all frames admitted; training complete")
            break

    state = {"params": params, "opt_state": opt_state,
             "curriculum": ckpt.curriculum_to_dict(cur), "epoch": cfg.epochs_online}
    if opt_state_pose is not None:
        state["opt_state_pose"] = opt_state_pose
    ckpt.save_checkpoint(ws.ckpt_dir, state, step=cfg.epochs_online)
    return params


def _validate(ws, cfg, params, star_cfg, val_data, gt_rel, rng, cur, step):
    """Full val-view render + pose metrics (train_online__.py:488-652).

    Fixed protocol: always the first val view at the newest admitted frame —
    a deterministic gate (a random view/frame makes val PSNR too noisy to
    compare across epochs)."""
    frame = cur.current_frame - 1
    view = 0
    rays_o, rays_d = val_data.view_rays(view)
    target = val_data.images[view, frame]

    pose = loop.gather_frame_pose(params["poses"], jnp.asarray(frame), star_cfg.num_vehicles)
    out = render_image(params["nerf"], star_cfg, rays_o, rays_d, pose=pose)
    p = float(psnr_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))
    s = float(ssim_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))

    est = np.asarray(params["poses"])  # [F-1, K, 7]
    trans_err, rot_err, *_ = pose_mod.get_pose_metrics_multi(est, gt_rel[1:])
    ws.metrics.log(
        {
            "val/psnr": p, "val/ssim": s,
            **{f"val/trans_error_{k}": float(v) for k, v in enumerate(trans_err)},
            **{f"val/rot_error_{k}": float(v) for k, v in enumerate(rot_err)},
        },
        step,
    )
    ws.metrics.log_image("val/rgb", out["rgb"], step)
    ws.metrics.log_image("val/rgb_static", out["rgb_static"], step)
    for k in range(star_cfg.num_vehicles):
        ws.metrics.log_image(f"val/rgb_dynamic_{k}", out["rgb_dynamic"][:, :, k], step)
    ws.log(f"val: psnr={p:.2f} ssim={s:.4f} trans_err={[f'{t:.4f}' for t in trans_err]}")


def _frame_metrics(out, target, mask, num_vehicles, lpips_fn=None):
    """Full / static-masked / dynamic-masked PSNR + SSIM (+ LPIPS when
    weights are available) for one rendered frame — the reference's per-frame
    test metric block (train_online__.py:663-725):

    - psnr_dynamic / psnr_static: MSE of the FULL render vs target restricted
      to (non-)vehicle pixels,
    - ssim_dynamic / ssim_static: the full SSIM map mask-averaged,
    - lpips: full render vs target; lpips_dynamic: rgb_dynamic_all vs target
      with static pixels zeroed; lpips_static: both images with dynamic
      pixels zeroed.
    """
    rgb = jnp.asarray(out["rgb"])
    tgt = jnp.asarray(target)
    row = {
        "psnr": float(psnr_fn(rgb, tgt)),
        "ssim": float(ssim_fn(rgb, tgt)),
    }
    if lpips_fn is not None:
        row["lpips"] = float(lpips_fn(rgb, tgt))
    if mask is None or not mask.any():
        return row

    m = jnp.asarray(mask)
    row["psnr_dynamic"] = float(psnr_fn(rgb, tgt, mask=m))
    row["psnr_static"] = float(psnr_fn(rgb, tgt, mask=~m))
    row["ssim_dynamic"] = float(masked_ssim(rgb, tgt, m))
    row["ssim_static"] = float(masked_ssim(rgb, tgt, ~m))
    if lpips_fn is not None:
        m3 = m[..., None].astype(rgb.dtype)
        rgb_dyn_all = jnp.asarray(out["rgb_dynamic_all"])
        row["lpips_dynamic"] = float(lpips_fn(rgb_dyn_all, tgt * m3))
        row["lpips_static"] = float(lpips_fn(rgb * (1 - m3), tgt * (1 - m3)))
    return row


def test(cfg: Config):
    """Test protocol (train_online__.py:654-1005): per test view, render all
    frames with learned poses; full/static/dynamic-masked PSNR/SSIM (+LPIPS
    when weights present); 2D/3D IoU; RPE/ATE; pose trajectory export."""
    ws = Workspace(cfg, "online_test")
    star_cfg = star_config_from(cfg)
    test_data = make_dataset(cfg, "test")
    gt_rel = np.swapaxes(test_data.gt_relative_poses(), 0, 1)  # [F, K, 7]

    rng, key = host_prng(1453)
    params = loop.init_online_params(key, star_cfg, cfg.num_frames)
    template = {"params": params}
    restored = ckpt.restore_checkpoint(cfg.online_ckpt_path, None)
    params = restored["params"] if "params" in restored else restored

    eval_last = cfg.eval_last_frame or cfg.num_frames
    est_all = np.asarray(params["poses"])  # [F-1, K, 7]

    # pose trajectory export x100 (utils/io.py:497-519)
    for k in range(star_cfg.num_vehicles):
        mats = np.asarray(lie.se3_to_matrix(jnp.asarray(est_all[:, k])))
        ckpt.save_poses_txt(os.path.join(ws.run_dir, f"poses_vehicle{k}.txt"), mats)

    # trajectory metrics per vehicle
    for k in range(star_cfg.num_vehicles):
        est_traj = np.concatenate([np.asarray(lie.se3_identity(1, 1))[:, 0], est_all[:, k]])[:eval_last]
        gt_traj = gt_rel[:eval_last, k]
        rpe_t, rpe_r = traj_mod.evaluate_rpe(est_traj, gt_traj)
        ate = traj_mod.evaluate_ate(est_traj, gt_traj)
        ws.metrics.log({f"test/rpe_trans_{k}": rpe_t, f"test/rpe_rot_{k}": rpe_r,
                        f"test/ate_{k}": ate}, 0)
        ws.log(f"vehicle {k}: RPE trans={rpe_t:.5f} rot={rpe_r:.3f}deg ATE={ate:.5f}")

    local_vertices = (
        test_data.bbox_local_vertices() if hasattr(test_data, "bbox_local_vertices") else None
    )
    gt_vehicle = (
        test_data.gt_vehicle_poses() if hasattr(test_data, "gt_vehicle_poses") else None
    )

    # LPIPS is weight-gated: pretrained VGG16 weights can't ship in a
    # hermetic image (reference loads them via torchmetrics,
    # train_online__.py:1055-1062)
    lpips_fn = None
    if cfg.lpips_weights and os.path.exists(cfg.lpips_weights):
        from ..eval.image import LPIPS

        lpips_fn = LPIPS(cfg.lpips_weights)
    elif cfg.lpips_weights:
        ws.log(f"lpips_weights not found at {cfg.lpips_weights}; skipping LPIPS")

    n_views = test_data.rays_o.shape[0]
    for view in range(n_views):
        rays_o, rays_d = test_data.view_rays(view)
        acc: dict = {}
        video_frames = []
        for frame in range(min(eval_last, test_data.images.shape[1])):
            pose = loop.gather_frame_pose(
                params["poses"], jnp.asarray(frame), star_cfg.num_vehicles
            )
            out = render_image(
                params["nerf"], star_cfg, rays_o, rays_d, pose=pose,
                with_test_outputs=True,
            )
            target = test_data.images[view, frame]

            sem = getattr(test_data, "semantic", None)
            if sem is not None:
                mask = sem[view, frame] == 10
            elif hasattr(test_data, "data"):
                mask = test_data.data["dyn_masks"][view, frame]
            else:
                mask = None

            row = _frame_metrics(
                out, target, mask, star_cfg.num_vehicles, lpips_fn=lpips_fn
            )
            if mask is not None and mask.any():
                dt = out["dynamic_transmittance"].reshape(-1, star_cfg.num_vehicles)
                row["2d_iou"], _ = iou_mod.compute_2d_iou(dt, mask.reshape(-1))
            for k, v in row.items():
                acc.setdefault(k, []).append(v)
            # one reference-shaped metrics row per frame
            ws.metrics.log(
                {f"test/view{view}_frame_{k}": v for k, v in row.items()}, frame
            )

            if local_vertices is not None and gt_vehicle is not None and view == cfg.bbox_view:
                # est vehicle->world(f) = inv(est_rel) @ inv(gt_pose0);
                # gt vehicle->world(f) = inv(gt_pose_f)
                # (reference utils/test.py:114-121)
                est_rel_inv = np.asarray(lie.se3_to_matrix(lie.se3_inverse(pose)))
                gt_pose0_inv = np.linalg.inv(gt_vehicle[:, 0])
                est_v2w = np.einsum("vki,vij->vkj", est_rel_inv, gt_pose0_inv)
                gt_v2w = np.linalg.inv(gt_vehicle[:, frame])
                ious3d, _, _ = iou_mod.compute_3d_iou(est_v2w, gt_v2w, local_vertices)
                ws.metrics.log(
                    {f"test/3d_iou_{k}": float(v) for k, v in enumerate(ious3d)}, frame
                )

            ws.metrics.log_image(f"test/view{view}_rgb", out["rgb"], frame)
            video_frames.append(
                (255 * np.clip(np.nan_to_num(out["rgb"]), 0, 1)).astype(np.uint8)
            )

        if cfg.save_video_frames and video_frames:
            # per-view tracking video (reference video export,
            # train_online__.py test_step); gif fallback when no ffmpeg backend
            import imageio.v2 as imageio

            try:
                imageio.mimwrite(
                    os.path.join(ws.run_dir, f"view{view}.mp4"), video_frames, fps=4
                )
            except (ValueError, ImportError):
                imageio.mimwrite(
                    os.path.join(ws.run_dir, f"view{view}.gif"), video_frames,
                    duration=250, loop=0,
                )

        row = {f"test/view{view}_{k}": float(np.mean(vs)) for k, vs in acc.items()}
        ws.metrics.log(row, view)
        ws.log(" ".join(f"{k}={v:.4f}" for k, v in row.items()))


def main(argv=None):
    cfg = load_config(argv)
    if cfg.test:
        test(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
