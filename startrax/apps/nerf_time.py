"""Time-conditioned NeRF baseline training (no decomposition, no poses).

Counterpart of the reference train_nerf_time.py: same data/window protocol
as online training but a single xyzt-conditioned field pair and a plain Adam.

Usage: python -m startrax.apps.nerf_time --config startrax/configs/carla_nerf_time.txt
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.prefetch import BatchPrefetcher
from ..eval.image import psnr as psnr_fn
from ..models import nerf_time as nt
from ..train import checkpoint as ckpt
from ..train import optim
from ..train.loop import LossConfig, compute_losses
from ..utils.config import Config, load_config, star_config_from, loss_config_from
from .common import Workspace, make_dataset, host_prng



def train(cfg: Config):
    ws = Workspace(cfg, "nerf_time")
    star_cfg = star_config_from(cfg)
    loss_cfg = loss_config_from(cfg)

    train_data = make_dataset(cfg, "train")
    val_data = make_dataset(cfg, "val")

    rng, key = host_prng(cfg.seed)
    params = nt.init_nerf_time(key, star_cfg)

    tx = optim.make_appinit_optimizer(
        cfg.lrate, steps_per_epoch=cfg.steps_per_epoch,
        decay_rate=cfg.lrate_decay_rate, decay_epochs=cfg.lrate_decay,
        decay_milestones=cfg.lrate_decay_steps,
    )
    opt_state = tx.init(params)

    def loss_fn(params, batch, k):
        out = nt.render_nerf_time(
            params, star_cfg, batch["rays_o"], batch["rays_d"],
            frame=batch["frame"], num_frames=cfg.num_frames, key=k, train=True,
        )
        return compute_losses(out, batch, star_cfg, loss_cfg, online=False)

    @jax.jit
    def step_fn(params, opt_state, batch, k):
        (lossv, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, k
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, lossv, metrics

    # host sampling off the critical path (same pattern as apps/online.py)
    prefetcher = BatchPrefetcher(
        lambda r, st: train_data.sample_batch(
            r, cfg.N_rand, start_frame=0, current_frame=cfg.num_frames),
        {}, seed=cfg.seed * 7919 + 5, depth=6,
        workers=max(cfg.num_workers, 1))

    step = 0
    try:
        for epoch in range(cfg.epochs_online):
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
            if (epoch + 1) % cfg.epoch_val == 0:
                _validate(ws, cfg, star_cfg, params, val_data, step)
            if (epoch + 1) % cfg.epoch_ckpt == 0:
                ckpt.save_checkpoint(ws.ckpt_dir, {"params": params}, step=epoch)
            if avg <= cfg.online_thres:
                break
    finally:
        prefetcher.close()
    return params


def _validate(ws, cfg, star_cfg, params, val_data, step):
    """Fixed-view val render with PSNR/SSIM (reference
    train_nerf_time.py:147-170; LPIPS there is weight-gated here)."""
    from ..eval.image import ssim as ssim_fn
    from ..eval.render import render_image_nerf_time

    frame = cfg.num_frames - 1
    rays_o, rays_d = val_data.view_rays(0)
    target = val_data.images[0, frame]
    out = render_image_nerf_time(
        params, star_cfg, rays_o, rays_d, frame=frame, num_frames=cfg.num_frames
    )
    p = float(psnr_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))
    s = float(ssim_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))
    ws.metrics.log({"val/psnr": p, "val/ssim": s}, step)
    ws.metrics.log_image("val/rgb", out["rgb"], step)
    ws.log(f"val: psnr={p:.2f} ssim={s:.4f}")


def test(cfg: Config):
    """Baseline test protocol (reference train_nerf_time.py:205-270): per
    test view, render every frame and compute the full/static/dynamic masked
    PSNR/SSIM (+gated LPIPS) suite — so STaR's decomposition can be compared
    against the no-decomposition baseline on identical metrics."""
    from ..eval.render import render_image_nerf_time
    from .test_protocol import dynamic_mask_for, frame_metrics, make_lpips

    ws = Workspace(cfg, "nerf_time_test")
    star_cfg = star_config_from(cfg)
    test_data = make_dataset(cfg, "test")

    restored = ckpt.restore_checkpoint(cfg.online_ckpt_path, None)
    params = restored["params"] if "params" in restored else restored

    lpips_fn = make_lpips(cfg, ws)
    eval_last = cfg.eval_last_frame or cfg.num_frames
    n_views = test_data.rays_o.shape[0]
    for view in range(n_views):
        rays_o, rays_d = test_data.view_rays(view)
        acc: dict = {}
        for frame in range(min(eval_last, test_data.images.shape[1])):
            out = render_image_nerf_time(
                params, star_cfg, rays_o, rays_d, frame=frame,
                num_frames=cfg.num_frames,
            )
            target = test_data.images[view, frame]
            mask = dynamic_mask_for(test_data, view, frame)
            row = frame_metrics(out, target, mask, 0, lpips_fn=lpips_fn)
            for k, v in row.items():
                acc.setdefault(k, []).append(v)
            ws.metrics.log(
                {f"test/view{view}_frame_{k}": v for k, v in row.items()}, frame
            )
            ws.metrics.log_image(f"test/view{view}_rgb", out["rgb"], frame)
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
