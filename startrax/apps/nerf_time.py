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

    rng, key = host_prng(42)
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

    step = 0
    for epoch in range(cfg.epochs_online):
        fine_losses = []
        for _ in range(cfg.steps_per_epoch):
            batch = train_data.sample_batch(
                rng, cfg.N_rand, start_frame=0, current_frame=cfg.num_frames
            )
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            key, sub = jax.random.split(key)
            params, opt_state, lossv, metrics = step_fn(params, opt_state, batch, sub)
            step += 1
            fine_losses.append(metrics["fine_loss"])
        avg = float(np.mean(np.asarray(jnp.stack(fine_losses))))  # one device fetch
        ws.metrics.log({"train/fine_loss": avg, "epoch": epoch}, step)
        ws.log(f"epoch {epoch}: fine_loss={avg:.6f}")
        if (epoch + 1) % cfg.epoch_ckpt == 0:
            ckpt.save_checkpoint(ws.ckpt_dir, {"params": params}, step=epoch)
        if avg <= cfg.online_thres:
            break
    return params


def main(argv=None):
    train(load_config(argv))


if __name__ == "__main__":
    main()
