"""Depth-criterion landscape along the canonical-drift direction.

Round-3 closed with: the ~0.06 canonical-frame pose drift lies in the
nullspace of every GT-free PHOTOMETRIC criterion on this scene, and depth
supervision is the named side information (VERDICT r3 item 1). Before
spending hours of TPU on a full depth-supervised run, this diagnostic
answers the mechanism question directly on a trained checkpoint:

  A. frame-0 probe — render frame 0 (pose structurally pinned to identity)
     with a probe gauge g = alpha * delta_t instead. If the canonical field
     has drifted WITH the poses (fields+poses at a joint photometric
     optimum), the photometric loss is minimal at alpha=0 (measured, r3
     gauge_landscape) — but the DEPTH loss should expose the drift: the
     drifted canonical surface sits at the wrong metric depth along frame-0
     rays, which 8 views' photometric consistency could not see.

  B. frames-1+ probe — apply the correcting gauge g = -alpha * delta_t to
     the learned poses (corrected = g ∘ est, the app's gauge-apply
     composition, apps/online.py). Hypothesis: frames 1+ render at the
     CORRECT world positions under est (est ∘ c = gt placement), so both
     photometric AND depth losses are minimal at alpha=0 here — i.e. the
     drift is observable only through frame 0 / drift-free reference
     fields, not by re-scoring the production fields at corrected poses.

Per (probe, scan, alpha) the photometric, depth (DS-NeRF relative-squared),
and sigma (ray-distribution) losses are recorded separately, so the scan
also yields the loss SCALES needed to pick depth_lambda (the r3 run's
0.01 made the depth term ~100x smaller than photometric noise).

Usage: python scripts/pose_depth_landscape.py --ckpt <dir> [--out ...]
Reference: models/loss.py:4-66, train_online__.py:176-257 (depth path).
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
    ap.add_argument("--probe_batches", type=int, default=8)
    ap.add_argument("--out", default="artifacts/depth_landscape_r4.json")
    ap.add_argument("--axes", action="store_true",
                    help="also scan the canonical x/y/z axes (scale 0.1) "
                         "instead of only the drift direction — measures the "
                         "axis anisotropy of depth observability (a box "
                         "translated along its own long axis barely changes "
                         "the depth map)")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import dataclasses as dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from startrax.apps.common import make_dataset, host_prng
    from startrax.models.star import render_star
    from startrax.ops import lie
    from startrax.ops.losses import img2mse, depth_loss, sigma_loss
    from startrax.train import checkpoint as ckpt_mod
    from startrax.train import loop
    from startrax.utils.config import load_config, star_config_from

    overrides = []
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides += [f"--{k}", v]

    cfg = load_config(["--config", CONFIG, "--basedir", "/tmp/startrax_dl",
                       "--expname", "dl"] + overrides)
    star_cfg = dc.replace(star_config_from(cfg), end_barf=-1)
    K = star_cfg.num_vehicles

    train_data = make_dataset(cfg, "train")
    gt_rel = np.swapaxes(train_data.gt_relative_poses(), 0, 1)  # [F, K, 7]

    rng, key = host_prng(cfg.seed)
    saved = ckpt_mod.restore_checkpoint(args.ckpt, None)
    saved_params = saved["params"] if "params" in saved else saved
    params = {"nerf": jax.tree.map(jnp.asarray, saved_params["nerf"]),
              "poses": jnp.asarray(saved_params["poses"])}

    est = jnp.asarray(params["poses"])
    d = np.asarray(lie.se3_multiply(est, lie.se3_inverse(jnp.asarray(gt_rel[1:]))))
    delta_t = d[..., :3].mean(axis=0)  # [K, 3] drift est o gt^-1
    print(f"mean drift delta_t: {delta_t.tolist()} "
          f"(per-frame spread {d[..., :3].std(axis=0).max():.4f})", flush=True)

    csr = max(cfg.car_sample_ratio_pose, cfg.car_sample_ratio)
    pr = np.random.default_rng(cfg.seed + 7)

    def make_batches(**kw):
        out = []
        for _ in range(args.probe_batches):
            b = train_data.sample_batch(pr, cfg.N_rand, car_sample_ratio=csr, **kw)
            out.append({k2: jnp.asarray(v) for k2, v in b.items()})
        return out

    batches_f0 = make_batches(frame=0)
    batches_rest = make_batches(start_frame=1, current_frame=cfg.num_frames,
                                mixed_frames=True)

    def losses_from(out, b, fine):
        suff = "" if fine else "0"
        photo = img2mse(out["rgb" + suff], b["target"])
        dep = depth_loss(out["depth" + suff], b["target_depth"],
                         star_cfg.near, star_cfg.far)
        sig = sigma_loss(out["weights" + suff], out["z_vals" + suff],
                         out["dists" + suff], b["target_depth"],
                         star_cfg.near, star_cfg.far)
        return photo, dep, sig

    @jax.jit
    def probe_frame0(nerf, gauge, b):
        out = render_star(nerf, star_cfg, b["rays_o"], b["rays_d"],
                          key=None, pose=gauge, train=False)
        pc, dc_, sc = losses_from(out, b, fine=False)
        pf, df, sf = losses_from(out, b, fine=star_cfg.n_importance > 0)
        return jnp.stack([pc + pf, dc_ + df, sc + sf])

    @jax.jit
    def probe_rest(nerf, poses, gauge, b):
        corrected = lie.se3_multiply(
            jnp.broadcast_to(gauge[None], poses.shape), poses)
        pose = loop.gather_frame_pose(corrected, b["frame"], K)
        out = render_star(nerf, star_cfg, b["rays_o"], b["rays_d"],
                          key=None, pose=pose, train=False)
        pc, dc_, sc = losses_from(out, b, fine=False)
        pf, df, sf = losses_from(out, b, fine=star_cfg.n_importance > 0)
        return jnp.stack([pc + pf, dc_ + df, sc + sf])

    alphas = [-1.5, -1.25, -1.0, -0.75, -0.5, -0.25, 0.0,
              0.25, 0.5, 0.75, 1.0, 1.25, 1.5]

    def scan(name, fn, batches, direction):
        rows = []
        for mode in ["joint"] + [f"v{k}" for k in range(K)]:
            for a in alphas:
                g = np.asarray(lie.se3_identity(K)).copy()
                if mode == "joint":
                    g[:, :3] = a * direction
                else:
                    k = int(mode[1:])
                    g[k, :3] = a * direction[k]
                acc = np.zeros(3)
                for b in batches:
                    acc += np.asarray(fn(jnp.asarray(g), b))
                acc /= len(batches)
                rows.append({"scan": mode, "alpha": a,
                             "photo": float(acc[0]), "depth": float(acc[1]),
                             "sigma": float(acc[2])})
            sub = [r for r in rows if r["scan"] == mode]
            for crit in ("photo", "depth", "sigma"):
                best = min(sub, key=lambda r: r[crit])
                at0 = next(r for r in sub if r["alpha"] == 0.0)
                print(f"{name} {mode} {crit}: min at alpha={best['alpha']:+.2f} "
                      f"({best[crit]:.6g}) vs alpha=0 ({at0[crit]:.6g})",
                      flush=True)
        return rows

    t0 = time.time()
    print("=== probe A: frame-0 gauge (g = alpha * delta_t) ===", flush=True)
    rows_a = scan("A", lambda g, b: probe_frame0(params["nerf"], g, b),
                  batches_f0, delta_t)
    print("=== probe B: frames-1+ correction (g = -alpha * delta_t) ===",
          flush=True)
    rows_b = scan("B", lambda g, b: probe_rest(params["nerf"], params["poses"],
                                               g, b),
                  batches_rest, -delta_t)

    result = {"ckpt": args.ckpt, "delta_t": delta_t.tolist(),
              "delta_spread": float(d[..., :3].std(axis=0).max()),
              "alphas": alphas, "probe_frame0": rows_a,
              "probe_frames_rest": rows_b,
              "elapsed_s": round(time.time() - t0, 1)}

    if args.axes:
        for ax_i, ax_name in enumerate("xyz"):
            direction = np.zeros((K, 3), np.float32)
            direction[:, ax_i] = 0.1
            print(f"=== axis probe {ax_name} (frame 0, g = alpha * 0.1"
                  f"{ax_name}) ===", flush=True)
            result[f"axis_{ax_name}_frame0"] = scan(
                f"axis-{ax_name}",
                lambda g, b: probe_frame0(params["nerf"], g, b),
                batches_f0, direction)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
