"""Appearance initialization: fit the static field on frame-0 multi-view
images, with early stopping on the fine photometric loss.

Counterpart of the reference train_app_init__.py: 1000-step pseudo-epochs of
N_rand random rays, Adam + Step/MultiStepLR, EarlyStopping when the epoch's
fine MSE <= appearance_init_thres (m1 = 9e-4), val render + checkpoint every
epoch_val epochs.

Usage: python -m startrax.apps.app_init --config startrax/configs/carla_star_app_init.txt
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.prefetch import BatchPrefetcher
from ..eval.image import psnr as psnr_fn, ssim as ssim_fn
from ..eval.render import render_image
from ..models.star import init_star
from ..train import checkpoint as ckpt
from ..train import loop, optim
from ..utils.config import Config, load_config, star_config_from, loss_config_from
from .common import Workspace, make_dataset, host_prng




def train(cfg: Config):
    from .online import make_run_mesh, _place_batch

    ws = Workspace(cfg, "app_init")
    star_cfg = star_config_from(cfg)
    loss_cfg = loss_config_from(cfg)

    train_data = make_dataset(cfg, "train")
    val_data = make_dataset(cfg, "val")

    rng, key = host_prng(cfg.seed)
    params = init_star(key, star_cfg)

    mesh = make_run_mesh(cfg, ws.log)
    n_rand = cfg.N_rand
    if mesh is not None:
        from ..parallel import mesh as meshlib

        n_rand = meshlib.pad_rays_to_multiple(cfg.N_rand, mesh.size)
        if n_rand != cfg.N_rand:
            ws.log(f"N_rand {cfg.N_rand} -> {n_rand} (divisible by mesh size)")
        params = meshlib.replicate_params(params, mesh)

    tx = optim.make_appinit_optimizer(
        cfg.lrate,
        steps_per_epoch=cfg.steps_per_epoch,
        decay_rate=cfg.lrate_decay_rate,
        decay_epochs=cfg.lrate_decay,
        decay_milestones=cfg.lrate_decay_steps,
        accumulate_steps=cfg.accumulate_grad_batches,
        params=params,
    )
    opt_state = tx.init(params)
    step_fn = loop.make_appinit_train_step(star_cfg, loss_cfg, tx)

    if cfg.dataset_type == "blender":
        sample_fn = lambda r, st: train_data.sample_batch(r, n_rand)
    else:
        # car-balanced sampling covers the reference's semantic app-init
        # variant (carla_star_app_init_semantic.py)
        sample_fn = lambda r, st: train_data.sample_batch(
            r, n_rand, frame=0, car_sample_ratio=cfg.car_sample_ratio
        )
    prefetcher = BatchPrefetcher(sample_fn, {}, seed=cfg.seed * 7919 + 2,
                                 depth=6, workers=max(cfg.num_workers, 1))

    deadline = (time.time() + cfg.train_minutes * 60
                if cfg.train_minutes > 0 else None)
    step = 0
    try:
        for epoch in range(cfg.epochs_appearance):
            if deadline is not None and time.time() > deadline:
                ws.log("train_minutes budget exhausted; stopping")
                break
            fine_losses = []
            for _ in range(cfg.steps_per_epoch):
                batch = _place_batch(next(prefetcher), mesh)
                key, sub = jax.random.split(key)
                params, opt_state, lossv, metrics = step_fn(params, opt_state, batch, sub)
                step += 1
                fine_losses.append(metrics["fine_loss"])  # device scalar, no sync
            avg_fine = float(np.mean(np.asarray(jnp.stack(fine_losses))))  # one device fetch
            ws.metrics.log({"train/fine_loss": avg_fine, "epoch": epoch}, step)
            ws.log(f"epoch {epoch}: fine_loss={avg_fine:.6f}")

            if (epoch + 1) % cfg.epoch_val == 0:
                _validate(ws, params, star_cfg, val_data, rng, step, mesh=mesh)
                ckpt.save_checkpoint(ws.ckpt_dir, {"params": params}, step=epoch)

            # EarlyStopping on train/fine_loss (train_app_init__.py:242-246)
            if avg_fine <= cfg.appearance_init_thres:
                ws.log(f"appearance threshold {cfg.appearance_init_thres} reached; stopping")
                break
    finally:
        prefetcher.close()

    ckpt.save_checkpoint(ws.ckpt_dir, {"params": params}, step=cfg.epochs_appearance)
    return params


def _validate(ws: Workspace, params, star_cfg, val_data, rng, step, mesh=None):
    n_views = val_data.rays_o.shape[0] if hasattr(val_data, "rays_o") else 1
    view = int(rng.integers(0, max(n_views, 1)))
    rays_o, rays_d = val_data.view_rays(view)
    target = val_data.images[view] if val_data.images.ndim == 4 else val_data.images[view, 0]
    out = render_image(params, star_cfg, rays_o, rays_d, pose=None, mesh=mesh)
    p = float(psnr_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))
    s = float(ssim_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))
    ws.metrics.log({"val/psnr": p, "val/ssim": s}, step)
    ws.metrics.log_image("val/rgb", out["rgb"], step)
    ws.metrics.log_image("val/target", np.asarray(target), step)
    ws.log(f"val view {view}: psnr={p:.2f} ssim={s:.4f}")


def main(argv=None):
    cfg = load_config(argv)
    train(cfg)


if __name__ == "__main__":
    main()
