"""Gauge recovery by duplicate-mode erasure (GT-free), with landscape probes.

Evidence chain (round 3, see artifacts/crossview_diag.json, /tmp logs of
pose_gauge_diag / pose_anchor_align_diag):
- the alternation fixed point's pose residual is a near-constant per-vehicle
  canonical drift delta (est_f = delta o gt_f, spread ~0.003);
- a learnable frame-0 pose against the TRAINED field returns identity: the
  field holds TWO canonical modes — one at the frame-0-anchored position
  (satisfying the pinned identity anchor) and one at the drifted position
  serving frames 1..T-1 — so frame 0 cannot see the drift;
- a fresh frame-0-only reference field is too weak for a shared gauge fit
  (one time instant: unseen-viewpoint appearance dominates; v1 diverged).

This estimator removes the duplicate instead: re-fit a COPY of the dynamic
fields on frames 1..T-1 ONLY (poses frozen at their current estimates, no
frame-0 rays, no anchor sampling) — the frame-0 duplicate mode receives only
background supervision and is erased, leaving the rich multi-frame field in
its drifted gauge. Then a learnable frame-0 pose G0 against THAT field has
its photometric optimum at G0 = delta (frame 0 is the one frame whose true
pose is known by construction), and poses correct as p_f <- G0^-1 o p_f.

GT landscape probes (sanity, not used by the estimator): photometric loss at
G0 = identity vs G0 = delta_gt before/after erasure — shows directly whether
the duplicate mode was hiding the drift.

Usage:
  python scripts/pose_mode_erase_diag.py --ckpt <online ckpt dir>
      [--erase_epochs 14] [--gauge_its 1000] [--rounds 2]
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
    ap.add_argument("--gauge_its", type=int, default=1000)
    ap.add_argument("--field_epochs", type=int, default=14)
    ap.add_argument("--pose_epochs", type=int, default=6)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--out", default="artifacts/mode_erase_diag.json")
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

    cfg = load_config(["--config", CONFIG, "--basedir", "/tmp/startrax_me",
                       "--expname", "me"] + overrides)
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

    def mean_delta(poses):
        est = jnp.asarray(poses)
        d = np.asarray(lie.se3_multiply(
            est, lie.se3_inverse(jnp.asarray(gt_rel[1:]))))
        q = d[..., 3:] * np.sign(d[..., 6:7] + 1e-12)
        mq = q.mean(axis=0)
        mq /= np.linalg.norm(mq, axis=-1, keepdims=True)
        return np.concatenate([d[..., :3].mean(axis=0), mq], -1)  # [K, 7]

    true_delta = mean_delta(params["poses"])

    csr = max(cfg.car_sample_ratio_pose, cfg.car_sample_ratio)
    s_rng = np.random.default_rng(cfg.seed + 101)
    t0 = time.time()

    # ---------------- duplicate-mode erasure ----------------
    def erase_frame0_mode(params, epochs):
        """Re-fit a copy of the dynamic fields on frames 1..T-1 only (poses
        frozen): the frame-0 canonical duplicate receives only background
        supervision and decays. Returns the erased nerf dict."""
        nonlocal key
        er = {"nerf": dict(params["nerf"]), "poses": params["poses"]}
        tx = optim.make_fused_star_optimizer(
            er, lrate_static=0.0, lrate_dynamic=cfg.lrate_dynamic,
            lrate_pose=0.0, steps_per_epoch=cfg.steps_per_epoch, grad_clip=1.0,
            accumulate_steps=cfg.accumulate_grad_batches)
        opt = tx.init(er)
        step = loop.make_online_train_step(star_cfg, loss_cfg, tx)
        for e in range(epochs):
            for _ in range(cfg.steps_per_epoch):
                batch = train_data.sample_batch(
                    s_rng, cfg.N_rand, start_frame=1,
                    current_frame=cfg.num_frames, mixed_frames=True,
                    car_sample_ratio=csr)
                batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
                key, sub = jax.random.split(key)
                er, opt, lossv, m = step(er, opt, batch, sub,
                                         jnp.asarray(10_000))
        print(f"mode erasure done ({time.time()-t0:.0f}s): "
              f"fine={float(m['fine_loss']):.6f}", flush=True)
        return er["nerf"]

    # ---------------- frame-0 gauge fit ----------------
    def frame0_loss_fn(nerf):
        def loss_fn(gauge, batch, k):
            out = render_star(nerf, star_cfg, batch["rays_o"], batch["rays_d"],
                              key=k, pose=gauge, train=True)
            loss = img2mse(out["rgb0"], batch["target"])
            if "rgb" in out:
                loss = loss + img2mse(out["rgb"], batch["target"])
            return loss
        return loss_fn

    def probe(nerf, gauge7, n=20, seed_off=7):
        """Mean frame-0 photometric loss at a fixed gauge (landscape probe)."""
        loss_fn = frame0_loss_fn(nerf)
        f = jax.jit(lambda g, b, k: loss_fn(g, b, k))
        r = np.random.default_rng(cfg.seed + seed_off)
        tot = 0.0
        nonlocal key
        for _ in range(n):
            batch = train_data.sample_batch(r, cfg.N_rand, frame=0,
                                            car_sample_ratio=csr)
            batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
            key, sub = jax.random.split(key)
            tot += float(f(jnp.asarray(gauge7), batch, sub))
        return tot / n

    def fit_frame0_gauge(nerf, its):
        nonlocal key
        loss_fn = frame0_loss_fn(nerf)
        tx = optax.adam(cfg.lrate_pose)
        gauge = jnp.asarray(lie.se3_identity(K))
        opt = tx.init(gauge)

        @jax.jit
        def step(gauge, opt, batch, k):
            loss, grads = jax.value_and_grad(loss_fn)(gauge, batch, k)
            updates, opt = tx.update(grads, opt, gauge)
            gauge = optax.apply_updates(gauge, updates)
            gauge = gauge.at[..., 3:7].set(lie.quat_normalize(gauge[..., 3:7]))
            return gauge, opt, loss

        for i in range(its):
            batch = train_data.sample_batch(s_rng, cfg.N_rand, frame=0,
                                            car_sample_ratio=csr)
            batch = {k2: jnp.asarray(v) for k2, v in batch.items()}
            key, sub = jax.random.split(key)
            gauge, opt, lossv = step(gauge, opt, batch, sub)
        return np.asarray(gauge)

    ident = np.asarray(lie.se3_identity(K))

    # probes BEFORE erasure (against the trained, duplicated field)
    p_id_before = probe(params["nerf"], ident)
    p_gt_before = probe(params["nerf"], true_delta)
    print(f"probe pre-erase: loss(identity)={p_id_before:.6f} "
          f"loss(true delta)={p_gt_before:.6f}", flush=True)

    nerf_erased = erase_frame0_mode(params, args.erase_epochs)

    p_id_after = probe(nerf_erased, ident)
    p_gt_after = probe(nerf_erased, true_delta)
    print(f"probe post-erase: loss(identity)={p_id_after:.6f} "
          f"loss(true delta)={p_gt_after:.6f}", flush=True)

    G0 = fit_frame0_gauge(nerf_erased, args.gauge_its)
    print(f"frame-0 gauge ({time.time()-t0:.0f}s): t={G0[:, :3].tolist()} vs "
          f"true delta t {true_delta[:, :3].tolist()}", flush=True)

    # ---------------- correction + re-convergence ----------------
    params["poses"] = lie.se3_multiply(
        lie.se3_inverse(jnp.asarray(G0))[None], params["poses"])
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
              "gauge_t": G0[:, :3].tolist(),
              "probes": {"pre_id": p_id_before, "pre_gt": p_gt_before,
                         "post_id": p_id_after, "post_gt": p_gt_after}}]
    for rnd in range(args.rounds):
        if rnd > 0:
            nerf_erased = erase_frame0_mode(params, args.erase_epochs // 2)
            G0 = fit_frame0_gauge(nerf_erased, args.gauge_its // 2)
            params["poses"] = lie.se3_multiply(
                lie.se3_inverse(jnp.asarray(G0))[None], params["poses"])
            t, r = errs(params["poses"])
            trace.append({"round": rnd, "stage": "gauge", "trans": t, "rot": r,
                          "gauge_t": G0[:, :3].tolist()})
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
        "probes": trace[0]["probes"],
        "fitted_gauge_t": G0[:, :3].tolist(),
        "true_delta_t": true_delta[:, :3].tolist(),
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
