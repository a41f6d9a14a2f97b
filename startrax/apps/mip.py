"""STaR-mip training: appearance init and online tracking with the
integrated-positional-encoding (mip-NeRF) variant.

Counterpart of the reference train_app_init_mip.py / train_online_mip.py
(which drive nerfstudio fields/samplers); here models/mip.py provides the
native IPE field, frustum samplers and density-based compositing.

Usage:
  python -m startrax.apps.mip --config startrax/configs/carla_star_app_init.txt
  python -m startrax.apps.mip --config ... --test false  (online: set
  --appearance_ckpt_path and the regularizer lambdas as in the online config)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import mip
from ..ops.losses import img2mse, mse2psnr
from ..train import checkpoint as ckpt
from ..train import loop, optim
from ..train.curriculum import CurriculumConfig, CurriculumState, advance
from ..utils.config import Config, load_config, loss_config_from
from ..data.prefetch import BatchPrefetcher
from .common import Workspace, make_dataset, host_prng


def mip_config_from(cfg: Config) -> mip.MipConfig:
    scale = cfg.scale_factor if cfg.scale_factor > 0 else 1.0
    return mip.MipConfig(
        num_vehicles=cfg.num_vehicles,
        depth=cfg.netdepth,
        width=cfg.netwidth,
        num_freqs_pos=cfg.num_freqs_pos,
        num_freqs_dir=cfg.num_freqs_dir,
        n_samples=cfg.N_samples,
        n_importance=cfg.N_importance,
        near=cfg.near * scale,
        far=cfg.far * scale,
        base_radius=cfg.mip_base_radius,
        compute_dtype=jnp.bfloat16 if cfg.mixed_precision else jnp.float32,
    )


def _mip_losses(result, batch, cfg: Config, loss_cfg, has_fine: bool):
    img_loss0 = img2mse(result["rgb0"], batch["target"])
    loss = img_loss0
    metrics = {"psnr0": mse2psnr(img_loss0)}
    if has_fine:
        img_loss = img2mse(result["rgb"], batch["target"])
        loss = loss + img_loss
        metrics["fine_loss"] = img_loss
        metrics["psnr"] = mse2psnr(img_loss)
    else:
        metrics["fine_loss"] = img_loss0
    for name, lam in (
        ("alpha_entropy", loss_cfg.lambda_alpha_entropy),
        ("dynamic_vs_static_reg", loss_cfg.lambda_dynamic_vs_static_reg),
        ("ray_reg", loss_cfg.lambda_ray_reg),
        ("static_reg", loss_cfg.lambda_static_reg),
        ("dynamic_reg", loss_cfg.lambda_dynamic_reg),
    ):
        k = f"loss_{name}"
        if lam > 0 and k in result:
            v = result[f"{k}0"]
            if has_fine:
                v = (v + result[k]) / 2.0
            loss = loss + lam * v
            metrics[name] = v
    metrics["loss"] = loss
    return loss, metrics


def train_app_init(cfg: Config):
    ws = Workspace(cfg, "mip_app_init")
    mcfg = mip_config_from(cfg)
    loss_cfg = loss_config_from(cfg)
    train_data = make_dataset(cfg, "train")

    rng, key = host_prng(cfg.seed)
    params = mip.init_star_mip(key, mcfg)
    tx = optim.make_appinit_optimizer(
        cfg.lrate, steps_per_epoch=cfg.steps_per_epoch,
        decay_rate=cfg.lrate_decay_rate, decay_epochs=cfg.lrate_decay,
        decay_milestones=cfg.lrate_decay_steps,
    )
    opt_state = tx.init(params)

    def loss_fn(params, batch, k):
        out = mip.render_star_mip(
            params, mcfg, batch["rays_o"], batch["rays_d"], key=k, pose=None, train=True
        )
        return _mip_losses(out, batch, cfg, loss_cfg, mcfg.n_importance > 0)

    @jax.jit
    def step_fn(params, opt_state, batch, k):
        (lossv, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, k)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, lossv, metrics

    # host sampling off the critical path (same pattern as apps/online.py)
    if cfg.dataset_type == "blender":
        sample_fn = lambda r, st: train_data.sample_batch(r, cfg.N_rand)
    else:
        sample_fn = lambda r, st: train_data.sample_batch(r, cfg.N_rand, frame=0)
    prefetcher = BatchPrefetcher(sample_fn, {}, seed=cfg.seed * 7919 + 3,
                                 depth=6, workers=max(cfg.num_workers, 1))

    step = 0
    try:
        for epoch in range(cfg.epochs_appearance):
            fine_losses = []
            for _ in range(cfg.steps_per_epoch):
                batch = {k: jnp.asarray(v) for k, v in next(prefetcher).items()}
                key, sub = jax.random.split(key)
                params, opt_state, lossv, metrics = step_fn(params, opt_state, batch, sub)
                step += 1
                fine_losses.append(metrics["fine_loss"])
            avg = float(np.mean(np.asarray(jnp.stack(fine_losses))))  # one device fetch
            ws.metrics.log({"train/fine_loss": avg, "epoch": epoch}, step)
            ws.log(f"epoch {epoch}: fine_loss={avg:.6f}")
            if (epoch + 1) % cfg.epoch_ckpt == 0:
                ckpt.save_checkpoint(ws.ckpt_dir, {"params": params}, step=epoch)
            if avg <= cfg.appearance_init_thres:
                break
    finally:
        prefetcher.close()
    return params


def train_online(cfg: Config):
    ws = Workspace(cfg, "mip_online")
    mcfg = mip_config_from(cfg)
    loss_cfg = loss_config_from(cfg)
    train_data = make_dataset(cfg, "train")
    val_data = make_dataset(cfg, "val")
    gt_rel = np.swapaxes(train_data.gt_relative_poses(), 0, 1)  # [F, K, 7]
    rng, key = host_prng(cfg.seed)

    from ..ops import lie

    params = {
        "nerf": mip.init_star_mip(key, mcfg),
        "poses": lie.se3_identity(cfg.num_frames - 1, mcfg.num_vehicles),
    }
    if cfg.appearance_ckpt_path:
        app = ckpt.restore_checkpoint(cfg.appearance_ckpt_path)
        app_params = app["params"] if "params" in app else app
        params["nerf"] = {**params["nerf"], "static": app_params["static"]}
    if cfg.noisy_pose_init and hasattr(train_data, "noisy_gt_relative_poses"):
        noisy = train_data.noisy_gt_relative_poses(rng)
        params["poses"] = jnp.asarray(np.swapaxes(noisy, 0, 1)[1:])

    tx = optim.make_fused_star_optimizer(
        params, lrate_static=cfg.lrate_static, lrate_dynamic=cfg.lrate_dynamic,
        lrate_pose=cfg.lrate_pose, steps_per_epoch=cfg.steps_per_epoch,
        decay_rate=cfg.lrate_decay_rate, decay_milestones=cfg.lrate_decay_steps,
        grad_clip=1.0, accumulate_steps=cfg.accumulate_grad_batches,
    )
    opt_state = tx.init(params)

    def loss_fn(params, batch, k):
        pose = loop.gather_frame_pose(params["poses"], batch["frame"], mcfg.num_vehicles)
        out = mip.render_star_mip(
            params["nerf"], mcfg, batch["rays_o"], batch["rays_d"], key=k,
            pose=pose, train=True,
        )
        return _mip_losses(out, batch, cfg, loss_cfg, mcfg.n_importance > 0)

    @jax.jit
    def step_fn(params, opt_state, batch, k):
        (lossv, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, k)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        from ..ops import lie

        q = params["poses"][..., 3:7]
        params["poses"] = params["poses"].at[..., 3:7].set(lie.quat_normalize(q))
        return params, opt_state, lossv, metrics

    cur_cfg = CurriculumConfig(
        num_frames=cfg.num_frames, initial_num_frames=cfg.initial_num_frames,
        online_thres=cfg.online_thres,
        min_epochs_between=cfg.epochs_between_frames,
        tightened_thres=cfg.online_thres_tightened,
    )
    cur = CurriculumState.initial(cur_cfg)

    # current_frame = num_frames + 1 once the curriculum is done
    sample_state = {"start": cur.start_frame,
                    "end": min(cur.current_frame, cfg.num_frames)}
    prefetcher = BatchPrefetcher(
        lambda r, st: train_data.sample_batch(
            r, cfg.N_rand, start_frame=st["start"], current_frame=st["end"]),
        sample_state, seed=cfg.seed * 7919 + 4, depth=6,
        workers=max(cfg.num_workers, 1))

    step = 0
    try:
        for epoch in range(cfg.epochs_online):
            sample_state.update(start=cur.start_frame,
                                end=min(cur.current_frame, cfg.num_frames))
            fine_losses = []
            for _ in range(cfg.steps_per_epoch):
                batch = {k: jnp.asarray(v) for k, v in next(prefetcher).items()}
                key, sub = jax.random.split(key)
                params, opt_state, lossv, metrics = step_fn(params, opt_state, batch, sub)
                step += 1
                fine_losses.append(metrics["fine_loss"])
            avg = float(np.mean(np.asarray(jnp.stack(fine_losses))))  # one device fetch
            cur = advance(cur, cur_cfg, avg)

            # pose metrics every epoch (reference train_online_mip.py logs pose
            # trans/rot errors at val; here they are cheap host math)
            from ..eval.pose import get_pose_metrics_multi

            trans_err, rot_err, *_ = get_pose_metrics_multi(
                np.asarray(params["poses"]), gt_rel[1:]
            )
            ws.metrics.log(
                {"train/fine_loss": avg, "train/current_frame_num": cur.current_frame,
                 "epoch": epoch,
                 **{f"train/trans_error_{k}": float(v) for k, v in enumerate(trans_err)},
                 **{f"train/rot_error_{k}": float(v) for k, v in enumerate(rot_err)}},
                step,
            )
            if (epoch + 1) % cfg.epoch_val == 0:
                _validate_mip(ws, cfg, mcfg, params, val_data, cur, step)
            if (epoch + 1) % cfg.epoch_ckpt == 0:
                ckpt.save_checkpoint(
                    ws.ckpt_dir,
                    {"params": params, "curriculum": ckpt.curriculum_to_dict(cur)},
                    step=epoch,
                )
            if cur.done:
                break
    finally:
        prefetcher.close()
    return params


def _validate_mip(ws, cfg, mcfg, params, val_data, cur, step):
    """Fixed-view val render with PSNR/SSIM (train_online_mip.py val loop)."""
    from ..eval.image import psnr as psnr_fn, ssim as ssim_fn
    from ..eval.render import render_image_mip

    frame = min(cur.current_frame, cfg.num_frames) - 1
    rays_o, rays_d = val_data.view_rays(0)
    target = val_data.images[0, frame]
    pose = loop.gather_frame_pose(params["poses"], jnp.asarray(frame), mcfg.num_vehicles)
    out = render_image_mip(params["nerf"], mcfg, rays_o, rays_d, pose=pose)
    p = float(psnr_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))
    s = float(ssim_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))
    ws.metrics.log({"val/psnr": p, "val/ssim": s}, step)
    ws.metrics.log_image("val/rgb", out["rgb"], step)
    ws.log(f"val: psnr={p:.2f} ssim={s:.4f}")


def test(cfg: Config):
    """Mip test protocol: the shared run_test_protocol over the IPE renderer
    (reference train_online_mip.py test path)."""
    from ..eval.render import render_image_mip
    from .test_protocol import run_test_protocol

    ws = Workspace(cfg, "mip_test")
    mcfg = mip_config_from(cfg)
    test_data = make_dataset(cfg, "test")

    from ..ops import lie

    rng, key = host_prng(cfg.seed)
    params = {
        "nerf": mip.init_star_mip(key, mcfg),
        "poses": lie.se3_identity(cfg.num_frames - 1, mcfg.num_vehicles),
    }
    restored = ckpt.restore_checkpoint(cfg.online_ckpt_path, None)
    params = restored["params"] if "params" in restored else restored

    def render_frame(pose, rays_o, rays_d):
        return render_image_mip(
            params["nerf"], mcfg, rays_o, rays_d, pose=pose, with_test_outputs=True,
        )

    run_test_protocol(
        ws, cfg, mcfg.num_vehicles, np.asarray(params["poses"]),
        test_data, render_frame,
    )


def main(argv=None):
    cfg = load_config(argv)
    if cfg.test:
        test(cfg)
    elif cfg.skip_appearance_init or cfg.appearance_ckpt_path:
        train_online(cfg)
    else:
        train_app_init(cfg)


if __name__ == "__main__":
    main()
