"""Gauge re-anchoring diagnostic: recover the canonical-frame drift from
frame 0 alone (GT-free), transfer it to the per-frame poses, and re-converge.

Finding (artifacts/crossview_diag.json stage 0, round 3): at the production
alternation fixed point the per-frame pose deltas est_f o gt_f^-1 are nearly
CONSTANT across frames (spread ~0.003 vs magnitude ~0.05-0.09) — the
residual "pose error" is dominantly a rigid drift g of the dynamic fields'
canonical frame, with every per-frame pose compensating coherently:
est_f ~= g^-1 o gt_f. Per-frame tracking error after removing the common
drift is ~0.008/0.017 — near the proven floor (floor_diag_r3).

The drift is recoverable WITHOUT ground truth because frame 0's pose is
pinned to identity by construction: rendering frame 0 with a learnable pose
G (fields frozen) has its optimum at G* = g^-1 — this gauge degree of
freedom was never free during training, so its photometric gradient does NOT
vanish at the joint optimum (unlike the per-frame poses, which the fields
co-adapted to on the training views).

Stages, from a converged online checkpoint:
  A. fit G [K, 7] on frame-0 rays against frozen fields; compare to the
     per-frame mean delta (GT-known here) — fit quality check.
  B. apply poses <- G^-1 o poses; report the corrected pose errors.
  C. re-fit fields at the corrected (frozen) poses — all frames now agree on
     a consistently shifted canonical content, so the field optimum is the
     de-drifted field — then pose-polish; report final errors + held-out
     score (the GT-free signal must improve alongside).

Usage:
  python scripts/pose_gauge_diag.py --ckpt /tmp/startrax_e2e_repro2/e2e/online/ckpts \
      [--gauge_its 800] [--field_epochs 14] [--pose_epochs 6] [--rounds 2]
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
    ap.add_argument("--gauge_its", type=int, default=800)
    ap.add_argument("--field_epochs", type=int, default=14)
    ap.add_argument("--pose_epochs", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=2,
                    help="gauge->field->pose rounds after the first")
    ap.add_argument("--out", default="artifacts/gauge_diag.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np
    import optax

    from startrax.apps.common import make_dataset, host_prng
    from startrax.apps.online import selection_score
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

    cfg = load_config(["--config", CONFIG, "--basedir", "/tmp/startrax_gauge",
                       "--expname", "gauge"] + overrides)
    star_cfg = dc.replace(star_config_from(cfg), end_barf=-1)
    loss_cfg = loss_config_from(cfg)
    K = star_cfg.num_vehicles

    train_data = make_dataset(cfg, "train")
    val_data = make_dataset(cfg, "val")
    gt_rel = np.swapaxes(train_data.gt_relative_poses(), 0, 1)  # [F, K, 7]

    rng, key = host_prng(cfg.seed)
    saved = ckpt_mod.restore_checkpoint(args.ckpt, None)
    saved_params = saved["params"] if "params" in saved else saved
    params = {"nerf": jax.tree.map(jnp.asarray, saved_params["nerf"]),
              "poses": jnp.asarray(saved_params["poses"])}

    def errs(poses):
        t, r, *_ = get_pose_metrics_multi(np.asarray(poses), gt_rel[1:])
        return [round(float(x), 6) for x in t], [round(float(x), 6) for x in r]

    ckpt_trans, ckpt_rot = errs(params["poses"])
    print(f"checkpoint: trans={ckpt_trans} rot={ckpt_rot}", flush=True)

    # true mean delta (GT-known reference for the fit quality check)
    est = jnp.asarray(params["poses"])
    delta = np.asarray(lie.se3_multiply(est, lie.se3_inverse(jnp.asarray(gt_rel[1:]))))
    q = delta[..., 3:] * np.sign(delta[..., 3:4] + 1e-12)
    mean_q = q.mean(axis=0)
    mean_q /= np.linalg.norm(mean_q, axis=-1, keepdims=True)
    true_gauge = np.concatenate([delta[..., :3].mean(axis=0), mean_q], -1)  # [K,7]

    # ---------------- stage A: gauge fit on frame-0 rays ----------------
    def make_gauge_step(tx):
        def loss_fn(gauge, nerf, batch, k):
            out = render_star(nerf, star_cfg, batch["rays_o"], batch["rays_d"],
                              key=k, pose=gauge, train=True)
            loss = img2mse(out["rgb0"], batch["target"])
            if "rgb" in out:
                loss = loss + img2mse(out["rgb"], batch["target"])
            return loss

        @jax.jit
        def step(gauge, nerf, opt_state, batch, k):
            loss, grads = jax.value_and_grad(loss_fn)(gauge, nerf, batch, k)
            updates, opt_state = tx.update(grads, opt_state, gauge)
            gauge = optax.apply_updates(gauge, updates)
            gauge = gauge.at[..., 3:7].set(lie.quat_normalize(gauge[..., 3:7]))
            return gauge, opt_state, loss

        return step

    def fit_gauge(params, its, seed_off):
        gauge = np.asarray(lie.se3_identity(K))  # [K, 7]
        tx = optax.adam(cfg.lrate_pose)
        opt_state = tx.init(jnp.asarray(gauge))
        step = make_gauge_step(tx)
        s_rng = np.random.default_rng(cfg.seed + seed_off)
        gauge = jnp.asarray(gauge)
        nonlocal key
        for i in range(its):
            batch = train_data.sample_batch(
                s_rng, cfg.N_rand, frame=0,
                car_sample_ratio=max(cfg.car_sample_ratio_pose,
                                     cfg.car_sample_ratio))
            batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
            key, sub = jax.random.split(key)
            gauge, opt_state, lossv = step(gauge, params["nerf"], opt_state,
                                           batch, sub)
        return np.asarray(gauge)

    t0 = time.time()
    G = fit_gauge(params, args.gauge_its, 17)
    fit_err_t = np.linalg.norm(G[:, :3] - true_gauge[:, :3], axis=-1)
    print(f"stage A ({time.time()-t0:.0f}s): fitted gauge t={G[:, :3].tolist()}"
          f" vs true {true_gauge[:, :3].tolist()} (|dt|={fit_err_t.tolist()})",
          flush=True)

    # ---------------- stage B: transfer the gauge to the poses ----------------
    def apply_gauge(poses, G):
        return lie.se3_multiply(lie.se3_inverse(jnp.asarray(G))[None], poses)

    params["poses"] = apply_gauge(params["poses"], G)
    b_trans, b_rot = errs(params["poses"])
    print(f"stage B corrected: trans={b_trans} rot={b_rot}", flush=True)

    # ---------------- stage C: re-converge (field re-fit + pose polish) -----
    tx_field = optim.make_fused_star_optimizer(
        params, lrate_static=cfg.lrate_static, lrate_dynamic=cfg.lrate_dynamic,
        lrate_pose=0.0, decay_rate=cfg.lrate_decay_rate,
        decay_epochs=cfg.lrate_decay, steps_per_epoch=cfg.steps_per_epoch,
        grad_clip=1.0, accumulate_steps=cfg.accumulate_grad_batches)
    step_field = loop.make_online_train_step(star_cfg, loss_cfg, tx_field)
    tx_pose = optim.make_fused_star_optimizer(
        params, lrate_static=0.0, lrate_dynamic=0.0, lrate_pose=cfg.lrate_pose,
        pose_decay_rate=cfg.polish_pose_lrate_decay_rate,
        pose_decay_epochs=cfg.polish_pose_lrate_decay,
        steps_per_epoch=cfg.steps_per_epoch, grad_clip=1.0,
        accumulate_steps=cfg.accumulate_grad_batches)
    step_pose = loop.make_online_train_step(star_cfg, loss_cfg, tx_pose)

    s_rng = np.random.default_rng(cfg.seed + 59)

    def run_epochs(fn, opt_state, n, car, ghost, f0):
        nonlocal key
        avg = 0.0
        for e in range(n):
            fines = []
            for _ in range(cfg.steps_per_epoch):
                batch = train_data.sample_batch(
                    s_rng, cfg.N_rand, start_frame=0,
                    current_frame=cfg.num_frames, mixed_frames=True,
                    car_sample_ratio=car, ghost_sample_ratio=ghost,
                    frame0_sample_ratio=f0)
                batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
                key, sub = jax.random.split(key)
                new_params, opt_state, lossv, m = fn(params, opt_state, batch,
                                                     sub, jnp.asarray(10_000))
                params.update(new_params)
                fines.append(m["fine_loss"])
            avg = float(np.mean(np.asarray(jnp.stack(fines))))
        return opt_state, avg

    trace = []
    opt_f = tx_field.init(params)
    opt_p = tx_pose.init(params)
    for rnd in range(args.rounds):
        if rnd > 0:
            G = fit_gauge(params, args.gauge_its // 2, 61 + rnd)
            params["poses"] = apply_gauge(params["poses"], G)
            opt_f = tx_field.init(params)
            opt_p = tx_pose.init(params)
            t, r = errs(params["poses"])
            trace.append({"round": rnd, "stage": "gauge", "trans": t, "rot": r,
                          "gauge_t": G[:, :3].tolist()})
            print(f"round {rnd} gauge applied: trans={t} rot={r}", flush=True)
        opt_f, avg = run_epochs(step_field, opt_f, args.field_epochs,
                                cfg.car_sample_ratio, cfg.ghost_sample_ratio,
                                cfg.frame0_sample_ratio)
        t, r = errs(params["poses"])
        trace.append({"round": rnd, "stage": "field", "fine": avg,
                      "trans": t, "rot": r})
        print(f"round {rnd} field re-fit (fine={avg:.6f}): trans={t} rot={r} "
              f"({time.time()-t0:.0f}s)", flush=True)
        opt_p, avg = run_epochs(step_pose, opt_p, args.pose_epochs,
                                max(cfg.car_sample_ratio_pose,
                                    cfg.car_sample_ratio), 0.0, 0.0)
        t, r = errs(params["poses"])
        trace.append({"round": rnd, "stage": "pose", "fine": avg,
                      "trans": t, "rot": r})
        print(f"round {rnd} pose polish (fine={avg:.6f}): trans={t} rot={r} "
              f"({time.time()-t0:.0f}s)", flush=True)

    final_trans, final_rot = errs(params["poses"])
    score = selection_score(cfg, star_cfg, params, val_data, cfg.num_frames)
    result = {
        "ckpt": args.ckpt,
        "checkpoint_trans": ckpt_trans, "checkpoint_rot": ckpt_rot,
        "fitted_gauge_t": G[:, :3].tolist(),
        "true_gauge_t": true_gauge[:, :3].tolist(),
        "gauge_fit_err_t": fit_err_t.tolist(),
        "corrected_trans": b_trans, "corrected_rot": b_rot,
        "final_trans": final_trans, "final_rot": final_rot,
        "final_heldout_score": score,
        "trace": trace,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT " + json.dumps({k: v for k, v in result.items()
                                  if k != "trace"}), flush=True)


if __name__ == "__main__":
    main()
