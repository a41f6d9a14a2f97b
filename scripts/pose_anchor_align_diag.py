"""Anchor-align diagnostic: GT-free recovery of the canonical-frame drift via
a frame-0-refit reference field and a SHARED per-vehicle gauge fit.

Chain of evidence (round 3):
- crossview_diag stage 0: at the alternation fixed point the per-frame pose
  deltas est_f o gt_f^-1 are near-CONSTANT across frames (spread ~0.003 vs
  magnitude 0.05-0.09). Removing the common mode would land at ~0.008/0.017
  trans — near the proven floor.
- gauge_diag stage A: fitting a learnable frame-0 pose against the FROZEN
  TRAINED field returns ~identity, not the drift: the field satisfied the
  pinned frame-0 anchor by DUPLICATING content (one canonical mode at the
  frame-0 position, one at the drifted position serving frames 1..T-1) —
  which also explains the blurred ~19dB renders. World-space renders are
  consistent on every view, so no per-frame or shared gauge descent against
  the trained field can see the drift (crossview holdout stages diverged).

Estimator: the internal field<->pose split becomes observable against a
reference field that CANNOT have absorbed pose error:
  1. fit FRESH dynamic fields from frame-0 rays only (pose = identity, exact
     by construction) — density anchored at the true canonical position;
  2. fit a single shared per-vehicle SE(3) gauge G with warp G o p_f over
     frames 1..T-1 (train views, fresh fields + per-frame poses frozen).
     Sharing G across frames (6 DOF per vehicle vs 7x6 in refit_anchor's
     per-frame fits) collapses the rotation under-constraint of a one-
     time-instant reference field; the optimum is G* = delta^-1 (the common
     mode), since G o p_f must equal gt_f for all f simultaneously.
  3. correct poses <- G o p_f, RESTORE the original (appearance-rich)
     fields, re-fit them at the now-consistent poses (single-mode collapse),
     pose-polish, and iterate.

Usage:
  python scripts/pose_anchor_align_diag.py --ckpt <online ckpt dir>
      [--refit_epochs 12] [--gauge_its 800] [--rounds 2]
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
    ap.add_argument("--refit_epochs", type=int, default=12)
    ap.add_argument("--gauge_its", type=int, default=800)
    ap.add_argument("--field_epochs", type=int, default=14)
    ap.add_argument("--pose_epochs", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out", default="artifacts/anchor_align_diag.json")
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
    from startrax.models.fields import init_stacked_fields
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

    cfg = load_config(["--config", CONFIG, "--basedir", "/tmp/startrax_aa",
                       "--expname", "aa"] + overrides)
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

    # GT reference for fit-quality checks: the common mode delta^-1
    est = jnp.asarray(params["poses"])
    delta = np.asarray(lie.se3_multiply(est, lie.se3_inverse(jnp.asarray(gt_rel[1:]))))
    qd = delta[..., 3:] * np.sign(delta[..., 3:4] + 1e-12)
    mq = qd.mean(axis=0)
    mq /= np.linalg.norm(mq, axis=-1, keepdims=True)
    mean_delta = np.concatenate([delta[..., :3].mean(axis=0), mq], -1)  # [K,7]
    true_G = np.asarray(lie.se3_inverse(jnp.asarray(mean_delta)))

    csr = max(cfg.car_sample_ratio_pose, cfg.car_sample_ratio)
    s_rng = np.random.default_rng(cfg.seed + 71)
    t0 = time.time()

    # ---------------- step 1: fresh frame-0 reference fields ----------------
    def fit_reference_fields(params):
        nonlocal key
        key, kc, kf = jax.random.split(key, 3)
        ref = dict(params["nerf"])
        ref["dynamic_coarse"] = init_stacked_fields(
            kc, star_cfg.dynamic_field(), K)
        if "dynamic_fine" in ref:
            ref["dynamic_fine"] = init_stacked_fields(
                kf, star_cfg.dynamic_field(fine=True), K)
        ref_params = {"nerf": ref, "poses": params["poses"]}
        tx = optim.make_fused_star_optimizer(
            ref_params, lrate_static=0.0, lrate_dynamic=cfg.lrate_dynamic,
            lrate_pose=0.0, steps_per_epoch=cfg.steps_per_epoch, grad_clip=1.0,
            accumulate_steps=cfg.accumulate_grad_batches)
        opt = tx.init(ref_params)
        step = loop.make_online_train_step(star_cfg, loss_cfg, tx)
        for e in range(args.refit_epochs):
            for _ in range(cfg.steps_per_epoch):
                batch = train_data.sample_batch(
                    s_rng, cfg.N_rand, start_frame=0, current_frame=1,
                    mixed_frames=True, car_sample_ratio=csr)
                batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
                key, sub = jax.random.split(key)
                ref_params, opt, lossv, m = step(ref_params, opt, batch, sub,
                                                 jnp.asarray(10_000))
        print(f"reference fields fit ({time.time()-t0:.0f}s): "
              f"fine={float(m['fine_loss']):.6f}", flush=True)
        return ref_params["nerf"]

    # ---------------- step 2: shared gauge fit vs reference ----------------
    def fit_shared_gauge(ref_nerf, poses, its, freeze_rot=False):
        nonlocal key

        def loss_fn(gauge, batch, k):
            pose_f = loop.gather_frame_pose(poses, batch["frame"], K)  # [R,K,7]
            pose_c = lie.se3_multiply(gauge[None], pose_f)
            out = render_star(ref_nerf, star_cfg, batch["rays_o"],
                              batch["rays_d"], key=k, pose=pose_c, train=True)
            loss = img2mse(out["rgb0"], batch["target"])
            if "rgb" in out:
                loss = loss + img2mse(out["rgb"], batch["target"])
            return loss

        tx = optax.adam(cfg.lrate_pose)
        gauge = jnp.asarray(lie.se3_identity(K))
        opt = tx.init(gauge)

        @jax.jit
        def step(gauge, opt, batch, k):
            loss, grads = jax.value_and_grad(loss_fn)(gauge, batch, k)
            if freeze_rot:
                grads = grads.at[..., 3:7].set(0.0)
            updates, opt = tx.update(grads, opt, gauge)
            gauge = optax.apply_updates(gauge, updates)
            gauge = gauge.at[..., 3:7].set(lie.quat_normalize(gauge[..., 3:7]))
            return gauge, opt, loss

        for i in range(its):
            batch = train_data.sample_batch(
                s_rng, cfg.N_rand, start_frame=1, current_frame=cfg.num_frames,
                mixed_frames=True, car_sample_ratio=csr)
            batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
            key, sub = jax.random.split(key)
            gauge, opt, lossv = step(gauge, opt, batch, sub)
        return np.asarray(gauge)

    ref_nerf = fit_reference_fields(params)
    G = fit_shared_gauge(ref_nerf, params["poses"], args.gauge_its)
    print(f"shared gauge ({time.time()-t0:.0f}s): t={G[:, :3].tolist()} vs "
          f"true {true_G[:, :3].tolist()}", flush=True)

    # ---------------- step 3: correct + re-converge ----------------
    def apply_gauge(poses, G):
        return lie.se3_multiply(jnp.asarray(G)[None], poses)

    params["poses"] = apply_gauge(params["poses"], G)
    c_trans, c_rot = errs(params["poses"])
    print(f"corrected: trans={c_trans} rot={c_rot}", flush=True)

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

    trace = [{"round": 0, "stage": "gauge", "trans": c_trans, "rot": c_rot,
              "gauge_t": G[:, :3].tolist()}]
    for rnd in range(args.rounds):
        if rnd > 0:
            ref_nerf = fit_reference_fields(params)
            G = fit_shared_gauge(ref_nerf, params["poses"],
                                 args.gauge_its // 2)
            params["poses"] = apply_gauge(params["poses"], G)
            t, r = errs(params["poses"])
            trace.append({"round": rnd, "stage": "gauge", "trans": t,
                          "rot": r, "gauge_t": G[:, :3].tolist()})
            print(f"round {rnd} gauge applied: trans={t} rot={r}", flush=True)
        opt_f = tx_field.init(params)
        opt_p = tx_pose.init(params)
        opt_f, avg = run_epochs(step_field, opt_f, args.field_epochs,
                                cfg.car_sample_ratio, cfg.ghost_sample_ratio,
                                cfg.frame0_sample_ratio)
        t, r = errs(params["poses"])
        trace.append({"round": rnd, "stage": "field", "fine": avg,
                      "trans": t, "rot": r})
        print(f"round {rnd} field re-fit (fine={avg:.6f}): trans={t} rot={r} "
              f"({time.time()-t0:.0f}s)", flush=True)
        opt_p, avg = run_epochs(step_pose, opt_p, args.pose_epochs,
                                csr, 0.0, 0.0)
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
        "true_gauge_t": true_G[:, :3].tolist(),
        "corrected_trans": c_trans, "corrected_rot": c_rot,
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
