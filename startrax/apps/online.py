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

from ..data.prefetch import BatchPrefetcher
from ..eval import pose as pose_mod
from ..eval.image import psnr as psnr_fn, ssim as ssim_fn
from ..eval.render import render_image
from ..train import checkpoint as ckpt
from ..train import loop, optim
from ..train.curriculum import CurriculumConfig, CurriculumState, advance
from ..utils.config import Config, load_config, star_config_from, loss_config_from
from .common import Workspace, make_dataset, host_prng
from .test_protocol import frame_metrics, run_test_protocol




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

    # Host-side sampling overlaps device execution (the reference's
    # DataLoader(num_workers=4) role, train_online__.py:1064).
    sample_state = {"start": cur.start_frame, "end": cur.current_frame,
                    "car": cfg.car_sample_ratio, "crop": False}
    prefetcher = BatchPrefetcher(
        lambda r, st: train_data.sample_batch(
            r, cfg.N_rand, start_frame=st["start"], current_frame=st["end"],
            car_sample_ratio=st["car"], crop=st["crop"],
            mixed_frames=cfg.mixed_frames),
        sample_state, seed=1453, depth=6, workers=2)

    step = 0
    try:
        for epoch in range(cfg.epochs_online):
            fine_losses = []
            crop = epoch < cfg.precrop_iters
            pose_only = (
                cfg.pose_only_every > 0 and epoch > 0
                and epoch % cfg.pose_only_every == 0
            )
            # current_frame = num_frames + 1 once the curriculum is done
            sample_state.update(start=cur.start_frame,
                                end=min(cur.current_frame, cfg.num_frames),
                                crop=crop)
            for _ in range(cfg.steps_per_epoch):
                batch = {k: jnp.asarray(v) for k, v in next(prefetcher).items()}
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
    finally:
        prefetcher.close()

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


# re-exported for backwards compatibility (shared protocol lives in
# apps/test_protocol.py)
_frame_metrics = frame_metrics


def test(cfg: Config):
    """Test protocol (train_online__.py:654-1005) over the vanilla STaR
    renderer — see apps/test_protocol.run_test_protocol for the shared
    implementation (pose export, RPE/ATE, masked metric suite, IoU, video)."""
    ws = Workspace(cfg, "online_test")
    star_cfg = star_config_from(cfg)
    test_data = make_dataset(cfg, "test")

    rng, key = host_prng(1453)
    params = loop.init_online_params(key, star_cfg, cfg.num_frames)
    restored = ckpt.restore_checkpoint(cfg.online_ckpt_path, None)
    params = restored["params"] if "params" in restored else restored

    def render_frame(pose, rays_o, rays_d):
        return render_image(
            params["nerf"], star_cfg, rays_o, rays_d, pose=pose,
            with_test_outputs=True,
        )

    run_test_protocol(
        ws, cfg, star_cfg.num_vehicles, np.asarray(params["poses"]),
        test_data, render_frame,
    )



def main(argv=None):
    cfg = load_config(argv)
    if cfg.test:
        test(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
