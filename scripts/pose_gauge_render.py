"""Visual probe for the canonical-drift analysis: render frame 0 from a val
view at gauge = identity vs the true mean delta, trained vs erased fields,
full + dynamic-only panels. Settles where the dynamic modes actually live.

Usage: python scripts/pose_gauge_render.py --ckpt <dir> [--erase_epochs 14]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "startrax", "configs", "synthetic_star_online.txt")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--erase_epochs", type=int, default=14)
    ap.add_argument("--outdir", default="artifacts/gauge_render")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import dataclasses as dc

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp
    import numpy as np

    from startrax.apps.common import make_dataset, host_prng
    from startrax.eval.render import render_image
    from startrax.ops import lie
    from startrax.ops.losses import to8b
    from startrax.train import checkpoint as ckpt_mod
    from startrax.train import loop, optim
    from startrax.utils.config import load_config, star_config_from, loss_config_from

    overrides = []
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides += [f"--{k}", v]

    cfg = load_config(["--config", CONFIG, "--basedir", "/tmp/startrax_gr",
                       "--expname", "gr"] + overrides)
    star_cfg = dc.replace(star_config_from(cfg), end_barf=-1)
    loss_cfg = loss_config_from(cfg)
    K = star_cfg.num_vehicles

    train_data = make_dataset(cfg, "train")
    val_data = make_dataset(cfg, "val")
    gt_rel = np.swapaxes(train_data.gt_relative_poses(), 0, 1)

    rng, key = host_prng(cfg.seed)
    saved = ckpt_mod.restore_checkpoint(args.ckpt, None)
    saved_params = saved["params"] if "params" in saved else saved
    params = {"nerf": jax.tree.map(jnp.asarray, saved_params["nerf"]),
              "poses": jnp.asarray(saved_params["poses"])}

    est = jnp.asarray(params["poses"])
    d = np.asarray(lie.se3_multiply(est, lie.se3_inverse(jnp.asarray(gt_rel[1:]))))
    q = d[..., 3:] * np.sign(d[..., 6:7] + 1e-12)
    mq = q.mean(axis=0)
    mq /= np.linalg.norm(mq, axis=-1, keepdims=True)
    delta = np.concatenate([d[..., :3].mean(axis=0), mq], -1)  # [K, 7]
    print("delta:", delta.tolist(), flush=True)

    os.makedirs(args.outdir, exist_ok=True)
    rays_o, rays_d = val_data.view_rays(0)
    target0 = np.asarray(val_data.images[0, 0])
    imageio.imwrite(os.path.join(args.outdir, "target_f0.png"), to8b(target0))

    ident = np.asarray(lie.se3_identity(K))

    def dump(nerf, tag):
        for name, g in (("id", ident), ("delta", delta),
                        ("negdelta", np.concatenate(
                            [-delta[:, :3],
                             np.asarray(lie.se3_inverse(jnp.asarray(delta)))[:, 3:]],
                            -1))):
            out = render_image(nerf, star_cfg, rays_o, rays_d,
                               pose=jnp.asarray(g), with_test_outputs=True)
            imageio.imwrite(os.path.join(args.outdir, f"{tag}_{name}_rgb.png"),
                            to8b(out["rgb"]))
            imageio.imwrite(
                os.path.join(args.outdir, f"{tag}_{name}_dyn.png"),
                to8b(out["rgb_dynamic_all"]))
            err = np.mean((np.asarray(out["rgb"]) - target0) ** 2)
            print(f"{tag}/{name}: mse={err:.6f}", flush=True)

    dump(params["nerf"], "trained")

    # frame-1 render with its learned pose, dynamic-only (mode location ref)
    pose1 = loop.gather_frame_pose(est, jnp.asarray(1), K)
    out1 = render_image(params["nerf"], star_cfg, rays_o, rays_d, pose=pose1,
                        with_test_outputs=True)
    imageio.imwrite(os.path.join(args.outdir, "trained_f1_dyn.png"),
                    to8b(out1["rgb_dynamic_all"]))
    imageio.imwrite(os.path.join(args.outdir, "target_f1.png"),
                    to8b(np.asarray(val_data.images[0, 1])))

    # erase the frame-0 duplicate
    csr = max(cfg.car_sample_ratio_pose, cfg.car_sample_ratio)
    s_rng = np.random.default_rng(cfg.seed + 101)
    er = {"nerf": dict(params["nerf"]), "poses": params["poses"]}
    tx = optim.make_fused_star_optimizer(
        er, lrate_static=0.0, lrate_dynamic=cfg.lrate_dynamic, lrate_pose=0.0,
        steps_per_epoch=cfg.steps_per_epoch, grad_clip=1.0,
        accumulate_steps=cfg.accumulate_grad_batches)
    opt = tx.init(er)
    step = loop.make_online_train_step(star_cfg, loss_cfg, tx)
    t0 = time.time()
    for e in range(args.erase_epochs):
        for _ in range(cfg.steps_per_epoch):
            batch = train_data.sample_batch(
                s_rng, cfg.N_rand, start_frame=1, current_frame=cfg.num_frames,
                mixed_frames=True, car_sample_ratio=csr)
            batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
            key, sub = jax.random.split(key)
            er, opt, lossv, m = step(er, opt, batch, sub, jnp.asarray(10_000))
    print(f"erasure done ({time.time()-t0:.0f}s) fine="
          f"{float(m['fine_loss']):.6f}", flush=True)

    dump(er["nerf"], "erased")
    out1 = render_image(er["nerf"], star_cfg, rays_o, rays_d, pose=pose1,
                        with_test_outputs=True)
    imageio.imwrite(os.path.join(args.outdir, "erased_f1_dyn.png"),
                    to8b(out1["rgb_dynamic_all"]))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
