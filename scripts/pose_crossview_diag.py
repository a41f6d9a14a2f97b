"""Cross-view pose refinement diagnostic: can held-out-view gradients break
the joint photometric fixed point?

Background (STATUS.md, artifacts/e2e_r3_alternate_*): the production
curriculum + block-coordinate polish converges to a JOINT local optimum —
fields trained at wrong poses absorb the pose error *on the training views*,
so pose-only gradients there vanish while the true pose error stays ~50x
above the proven floor (artifacts/floor_diag_r3.json). But the GT-free
selection result shows held-out-view photometric error still ranks pose
quality — the co-adaptation is view-specific. Hypothesis: pose gradients
computed on rays the fields never trained on are non-zero at the fixed point
and point toward GT.

Stages, starting from a converged online checkpoint:

0. Gauge decomposition of the residual: per-frame delta_f = est_f o gt_f^-1.
   If delta is near-constant across frames the residual is canonical-frame
   drift (an anchoring failure, fixed by stronger frame-0 anchors); if it
   varies per frame it is genuine per-frame tracking error.
1. Control: pose-only steps on TRAIN-view rays at frozen fields — expected
   flat (confirms the fixed point).
2. Treatment: pose-only steps on HELD-OUT-view rays at frozen fields — the
   cross-view escape. Contraction here validates wiring a view-holdout into
   the app's polish pose phases.
3. Mixed: pose-only on a 50/50 train+held-out ray mix (the train-view terms
   regularize the single-view depth ambiguity of stage 2).

Usage:
  python scripts/pose_crossview_diag.py --ckpt /tmp/startrax_e2e_repro/e2e/online/ckpts \
      [--its 2500] [--out artifacts/crossview_diag.json]
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
    ap.add_argument("--ckpt", required=True,
                    help="online checkpoint dir (params incl. poses)")
    ap.add_argument("--its", type=int, default=2500, help="steps per stage")
    ap.add_argument("--out", default="artifacts/crossview_diag.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from startrax.apps.common import make_dataset, host_prng
    from startrax.eval.pose import get_pose_metrics_multi
    from startrax.ops import lie
    from startrax.train import checkpoint as ckpt_mod
    from startrax.train import loop, optim
    from startrax.utils.config import load_config, star_config_from, loss_config_from

    overrides = []
    for kv in args.set:
        k, _, v = kv.partition("=")
        overrides += [f"--{k}", v]

    cfg = load_config(["--config", CONFIG, "--basedir", "/tmp/startrax_xview",
                       "--expname", "xview"] + overrides)
    star_cfg = dc.replace(star_config_from(cfg), end_barf=-1)
    loss_cfg = loss_config_from(cfg)

    train_data = make_dataset(cfg, "train")
    val_data = make_dataset(cfg, "val")
    gt_rel = np.swapaxes(train_data.gt_relative_poses(), 0, 1)  # [F, K, 7]

    rng, key = host_prng(cfg.seed)
    params0 = loop.init_online_params(key, star_cfg, cfg.num_frames)
    saved = ckpt_mod.restore_checkpoint(args.ckpt, None)
    saved_params = saved["params"] if "params" in saved else saved
    params0 = {"nerf": jax.tree.map(jnp.asarray, saved_params["nerf"]),
               "poses": jnp.asarray(saved_params["poses"])}

    def errs(poses, reduce=True):
        t, r, *_ = get_pose_metrics_multi(np.asarray(poses), gt_rel[1:],
                                          reduce=reduce)
        rnd = lambda x: (round(float(x), 6) if np.ndim(x) == 0
                         else [round(float(v), 6) for v in np.asarray(x)])
        return [rnd(x) for x in t], [rnd(x) for x in r]

    ckpt_trans, ckpt_rot = errs(params0["poses"])
    pf_trans, pf_rot = errs(params0["poses"], reduce=False)
    print(f"checkpoint: trans={ckpt_trans} rot={ckpt_rot}", flush=True)

    # ---------------- stage 0: gauge decomposition ----------------
    est = jnp.asarray(params0["poses"])          # [F-1, K, 7]
    gt = jnp.asarray(gt_rel[1:])                 # [F-1, K, 7]
    delta = lie.se3_multiply(est, lie.se3_inverse(gt))   # canonical drift/frame
    dt = np.asarray(delta[..., :3])              # [F-1, K, 3]
    # common gauge = per-vehicle mean drift; residual after removing it
    mean_t = dt.mean(axis=0)                     # [K, 3]
    drift_spread = dt.std(axis=0)                # [K, 3]
    # correct: est' = G*^-1 o est with G* = (mean_t, mean quat)
    q = np.asarray(delta[..., 3:])               # [F-1, K, 4]
    q = q * np.sign(q[..., 3:4] + 1e-12)         # hemisphere-align
    mean_q = q.mean(axis=0)
    mean_q /= np.linalg.norm(mean_q, axis=-1, keepdims=True)
    G = jnp.asarray(np.concatenate([mean_t, mean_q], -1))  # [K, 7]
    est_corr = lie.se3_multiply(lie.se3_inverse(G)[None], est)
    corr_trans, corr_rot = errs(est_corr)
    gauge = {
        "mean_drift_t": [[round(float(v), 5) for v in row] for row in mean_t],
        "drift_spread_t": [[round(float(v), 5) for v in row]
                           for row in drift_spread],
        "gauge_removed_trans": corr_trans,
        "gauge_removed_rot": corr_rot,
    }
    print("gauge: " + json.dumps(gauge), flush=True)

    # ---------------- pose-only stages ----------------
    def run_stage(name, sample_fn):
        params = {"nerf": params0["nerf"], "poses": params0["poses"]}
        tx = optim.make_fused_star_optimizer(
            params, lrate_static=0.0, lrate_dynamic=0.0,
            lrate_pose=cfg.lrate_pose, pose_decay_rate=0.9,
            pose_decay_epochs=8, steps_per_epoch=cfg.steps_per_epoch,
            grad_clip=1.0, accumulate_steps=cfg.accumulate_grad_batches)
        opt_state = tx.init(params)
        step = loop.make_online_train_step(star_cfg, loss_cfg, tx)
        s_rng = np.random.default_rng(cfg.seed + 31)
        nonlocal key
        trace = []
        t0 = time.time()
        for i in range(args.its):
            batch = sample_fn(s_rng)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            key, sub = jax.random.split(key)
            params, opt_state, lossv, _ = step(params, opt_state, batch, sub,
                                               jnp.asarray(10_000))
            if (i + 1) % 250 == 0:
                t, r = errs(params["poses"])
                trace.append({"it": i + 1, "trans": t, "rot": r})
                print(f"{name} {i + 1}/{args.its}: trans={t} rot={r} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        ft, fr = errs(params["poses"])
        return {"final_trans": ft, "final_rot": fr, "trace": trace}, params

    csr = max(cfg.car_sample_ratio_pose, cfg.car_sample_ratio)

    def sample_train(r):
        return train_data.sample_batch(
            r, cfg.N_rand, start_frame=0, current_frame=cfg.num_frames,
            mixed_frames=True, car_sample_ratio=csr)

    def sample_holdout(r):
        return val_data.sample_batch(
            r, cfg.N_rand, start_frame=0, current_frame=cfg.num_frames,
            mixed_frames=True, car_sample_ratio=csr)

    def sample_mixed(r):
        a = sample_train(r)
        b = sample_holdout(r)
        n = cfg.N_rand // 2
        return {k: np.concatenate([np.asarray(a[k])[:n],
                                   np.asarray(b[k])[: cfg.N_rand - n]])
                for k in a}

    control, _ = run_stage("control(train-views)", sample_train)
    holdout, _ = run_stage("holdout-views", sample_holdout)
    mixed, _ = run_stage("mixed", sample_mixed)

    result = {
        "ckpt": args.ckpt,
        "its_per_stage": args.its,
        "checkpoint_trans": ckpt_trans, "checkpoint_rot": ckpt_rot,
        "per_frame_trans": pf_trans, "per_frame_rot": pf_rot,
        "gauge": gauge,
        "control": control,
        "holdout": holdout,
        "mixed": mixed,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("RESULT " + json.dumps({
        "ckpt_trans": ckpt_trans,
        "control_trans": control["final_trans"],
        "holdout_trans": holdout["final_trans"],
        "mixed_trans": mixed["final_trans"],
        "ckpt_rot": ckpt_rot,
        "holdout_rot": holdout["final_rot"],
        "mixed_rot": mixed["final_rot"],
    }), flush=True)


if __name__ == "__main__":
    main()
