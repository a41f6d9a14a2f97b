"""Frame-0 gauge landscape scan: where is the photometric minimum relative
to the known canonical drift?

Probes the frame-0 loss as a function of a frame-0 gauge pose G along the
true mean-delta direction, per vehicle and jointly, against (a) the trained
field and (b) the duplicate-erased field (re-fit on frames 1..T-1 only).
Resolves whether the mode-erase estimator's failure (mode_erase_diag) is a
composition-sign bug, a shifted minimum, or a flat/aliased landscape.

Usage: python scripts/pose_gauge_landscape.py --ckpt <dir> [--erase_epochs 14]
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
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--erase_epochs", type=int, default=14)
    ap.add_argument("--probe_batches", type=int, default=12)
    ap.add_argument("--out", default="artifacts/gauge_landscape.json")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from startrax.apps.common import make_dataset, host_prng
    from startrax.eval.pose import get_pose_metrics_multi
    from startrax.models.star import render_star
    from startrax.ops import lie
    from startrax.ops.losses import img2mse
    from startrax.train import checkpoint as ckpt_mod
    from startrax.train import loop, optim
    from startrax.utils.config import load_config, star_config_from, loss_config_from

    overrides = []
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides += [f"--{k}", v]

    cfg = load_config(["--config", CONFIG, "--basedir", "/tmp/startrax_gl",
                       "--expname", "gl"] + overrides)
    star_cfg = dc.replace(star_config_from(cfg), end_barf=-1)
    loss_cfg = loss_config_from(cfg)
    K = star_cfg.num_vehicles

    train_data = make_dataset(cfg, "train")
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
    delta_t = d[..., :3].mean(axis=0)  # [K, 3]
    print(f"true mean delta t: {delta_t.tolist()}", flush=True)

    csr = max(cfg.car_sample_ratio_pose, cfg.car_sample_ratio)
    s_rng = np.random.default_rng(cfg.seed + 101)
    t0 = time.time()

    # fixed probe batch set (same rays for every gauge -> comparable losses)
    probe_batches = []
    pr = np.random.default_rng(cfg.seed + 7)
    for _ in range(args.probe_batches):
        b = train_data.sample_batch(pr, cfg.N_rand, frame=0,
                                    car_sample_ratio=csr)
        probe_batches.append({k2: jnp.asarray(v) for k2, v in b.items()})

    @jax.jit
    def loss_one(nerf, gauge, b):
        out = render_star(nerf, star_cfg, b["rays_o"], b["rays_d"],
                          key=None, pose=gauge, train=False)
        l = img2mse(out["rgb0"], b["target"])
        if "rgb" in out:
            l = l + img2mse(out["rgb"], b["target"])
        return l

    def loss_at(nerf, gauge):
        return float(np.mean([float(loss_one(nerf, gauge, b))
                              for b in probe_batches]))

    def scan(nerf, label):
        rows = []
        alphas = [-1.25, -1.0, -0.75, -0.5, -0.25, 0.0, 0.25, 0.5, 0.75,
                  1.0, 1.25]
        for mode in ["joint"] + [f"v{k}" for k in range(K)]:
            for a in alphas:
                g = np.asarray(lie.se3_identity(K)).copy()
                if mode == "joint":
                    g[:, :3] = a * delta_t
                else:
                    k = int(mode[1:])
                    g[k, :3] = a * delta_t[k]
                l = float(loss_at(nerf, jnp.asarray(g)))
                rows.append({"scan": mode, "alpha": a, "loss": round(l, 6)})
            best = min((r for r in rows if r["scan"] == mode),
                       key=lambda r: r["loss"])
            print(f"{label} {mode}: best alpha={best['alpha']} "
                  f"loss={best['loss']:.6f} (identity="
                  f"{[r['loss'] for r in rows if r['scan'] == mode and r['alpha'] == 0.0][0]:.6f})",
                  flush=True)
        return rows

    print("=== trained field ===", flush=True)
    rows_trained = scan(params["nerf"], "trained")

    # erase the frame-0 duplicate mode (fields re-fit on frames 1.. only)
    er = {"nerf": dict(params["nerf"]), "poses": params["poses"]}
    tx = optim.make_fused_star_optimizer(
        er, lrate_static=0.0, lrate_dynamic=cfg.lrate_dynamic, lrate_pose=0.0,
        steps_per_epoch=cfg.steps_per_epoch, grad_clip=1.0,
        accumulate_steps=cfg.accumulate_grad_batches)
    opt = tx.init(er)
    step = loop.make_online_train_step(star_cfg, loss_cfg, tx)
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

    print("=== erased field ===", flush=True)
    rows_erased = scan(er["nerf"], "erased")

    result = {"ckpt": args.ckpt, "true_delta_t": delta_t.tolist(),
              "trained": rows_trained, "erased": rows_erased}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
