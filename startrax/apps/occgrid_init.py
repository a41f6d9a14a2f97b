"""Occupancy-grid accelerated appearance initialization.

Counterpart of the reference train_app_init_nerfacc.py: a single NeRF field
trained with empty-space skipping. The CUDA OccGridEstimator becomes the
dense-grid + mask-compaction march in kernels/occgrid.py; the reference's
dynamic ray-batch resizing (train_app_init_nerfacc.py:99-105, keeping total
samples ~2^16) becomes a fixed per-ray sample budget — same effect (bounded
compute), static shapes.

Usage: python -m startrax.apps.occgrid_init --config startrax/configs/carla_star_app_init.txt
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.prefetch import BatchPrefetcher
from ..kernels import occgrid
from ..models.fields import FieldConfig, init_field, apply_field
from ..ops.compositing import raw2outputs
from ..ops.losses import img2mse, mse2psnr
from ..train import checkpoint as ckpt
from ..train import optim
from ..utils.config import Config, load_config
from .common import Workspace, make_dataset, host_prng

GRID_UPDATE_EVERY = 16


def train(cfg: Config):
    ws = Workspace(cfg, "occgrid_init")
    scale = cfg.scale_factor if cfg.scale_factor > 0 else 1.0
    near, far = cfg.near * scale, cfg.far * scale

    field_cfg = FieldConfig(
        depth=cfg.netdepth, width=cfg.netwidth, multires=cfg.multires,
        multires_views=cfg.multires_views,
        compute_dtype=jnp.bfloat16 if cfg.mixed_precision else jnp.float32,
    )
    # AABB sized to the ray volume
    occ_cfg = occgrid.OccGridConfig(
        resolution=cfg.grid_resolution,
        aabb_min=(-far, -far, -far),
        aabb_max=(far, far, far),
        render_step_size=cfg.render_step_size,
        n_march=cfg.N_samples,
        n_selected=max(cfg.N_samples // 4, 32),
    )

    train_data = make_dataset(cfg, "train")
    rng, key = host_prng(cfg.seed)
    params = init_field(key, field_cfg)
    grid = occgrid.init_grid(occ_cfg)

    tx = optim.make_appinit_optimizer(
        cfg.lrate, steps_per_epoch=cfg.steps_per_epoch,
        decay_rate=cfg.lrate_decay_rate, decay_epochs=cfg.lrate_decay,
        decay_milestones=cfg.lrate_decay_steps,
    )
    opt_state = tx.init(params)

    def density_fn(params, pts):
        dirs = jnp.zeros_like(pts[:1])
        dirs = jnp.broadcast_to(jnp.asarray([[0.0, 0.0, -1.0]]), (pts.shape[0], 3))
        raw_alpha, _ = apply_field(params, field_cfg, pts[:, None, :], dirs)
        return jax.nn.softplus(raw_alpha[:, 0])

    @jax.jit
    def update_grid_fn(grid, params, key):
        return occgrid.update_grid(grid, lambda p: density_fn(params, p), key, occ_cfg)

    def make_train_step(occ_cfg):
        """Jitted step for one sample budget; rebuilt (re-jitted) when the
        budget adapts — the jit-boundary equivalent of the reference's
        dynamic ray-batch resizing (train_app_init_nerfacc.py:99-105)."""

        def loss_fn(params, grid, batch, key):
            z_sel, valid, n_occ = occgrid.march_and_select(
                grid, occ_cfg, batch["rays_o"], batch["rays_d"], near, far, key=key
            )
            viewdirs = batch["rays_d"] / jnp.linalg.norm(batch["rays_d"], axis=-1, keepdims=True)
            pts = batch["rays_o"][:, None, :] + batch["rays_d"][:, None, :] * z_sel[..., None]
            raw_alpha, raw_rgb = apply_field(params, field_cfg, pts, viewdirs)
            raw_alpha = occgrid.masked_raw_alpha(raw_alpha, valid)
            out = raw2outputs(
                raw_alpha, raw_rgb, z_sel, batch["rays_d"],
                white_bkgd=cfg.white_bkgd, far_dist=cfg.far_dist,
            )
            loss = img2mse(out["rgb"], batch["target"])
            n_occ = n_occ.astype(jnp.float32)
            dropped = jnp.maximum(n_occ - occ_cfg.n_selected, 0.0)
            return loss, {
                "fine_loss": loss, "psnr": mse2psnr(loss),
                "mean_samples": jnp.mean(jnp.sum(valid, -1).astype(jnp.float32)),
                "dropped_frac": jnp.sum(dropped) / jnp.maximum(jnp.sum(n_occ), 1.0),
            }

        @jax.jit
        def train_step(params, opt_state, grid, batch, key):
            (lossv, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, grid, batch, key
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, lossv, metrics

        return train_step

    train_step = make_train_step(occ_cfg)

    # host sampling off the critical path (same pattern as apps/online.py)
    if cfg.dataset_type == "blender":
        sample_fn = lambda r, st: train_data.sample_batch(r, cfg.N_rand)
    else:
        sample_fn = lambda r, st: train_data.sample_batch(r, cfg.N_rand, frame=0)
    prefetcher = BatchPrefetcher(sample_fn, {}, seed=cfg.seed * 7919 + 6,
                                 depth=6, workers=max(cfg.num_workers, 1))

    deadline = (time.time() + cfg.train_minutes * 60
                if cfg.train_minutes > 0 else None)
    step = 0
    try:
        for epoch in range(cfg.epochs_appearance):
            if deadline is not None and time.time() > deadline:
                ws.log("train_minutes budget exhausted; stopping")
                break
            fine_losses, dropped = [], []
            for _ in range(cfg.steps_per_epoch):
                if step % GRID_UPDATE_EVERY == 0:
                    key, sub = jax.random.split(key)
                    grid = update_grid_fn(grid, params, sub)
                batch = {k: jnp.asarray(v) for k, v in next(prefetcher).items()}
                key, sub = jax.random.split(key)
                params, opt_state, lossv, metrics = train_step(params, opt_state, grid, batch, sub)
                step += 1
                fine_losses.append(metrics["fine_loss"])
                dropped.append(metrics["dropped_frac"])
            avg = float(np.mean(np.asarray(jnp.stack(fine_losses))))  # one device fetch
            avg_dropped = float(np.mean(np.asarray(jnp.stack(dropped))))
            ws.metrics.log(
                {"train/fine_loss": avg, "train/mean_samples": float(metrics["mean_samples"]),
                 "train/dropped_frac": avg_dropped, "epoch": epoch},
                step,
            )
            ws.log(f"epoch {epoch}: fine_loss={avg:.6f} "
                   f"mean_samples={float(metrics['mean_samples']):.1f} "
                   f"dropped_frac={avg_dropped:.4f}")
            if avg_dropped > 0.01 and occ_cfg.n_selected < occ_cfg.n_march:
                # >1% of occupied samples were silently truncated: double the
                # per-ray budget at this jit boundary and rebuild the step
                occ_cfg = dataclasses.replace(
                    occ_cfg, n_selected=min(occ_cfg.n_selected * 2, occ_cfg.n_march)
                )
                train_step = make_train_step(occ_cfg)
                ws.log(f"raised occgrid sample budget to {occ_cfg.n_selected} "
                       f"(dropped_frac={avg_dropped:.4f})")
            if (epoch + 1) % cfg.epoch_ckpt == 0:
                ckpt.save_checkpoint(ws.ckpt_dir, {"params": params}, step=epoch)
            if avg <= cfg.appearance_init_thres:
                ws.log("appearance threshold reached; stopping")
                break
    finally:
        prefetcher.close()
    return params, grid


def main(argv=None):
    train(load_config(argv))


if __name__ == "__main__":
    main()
