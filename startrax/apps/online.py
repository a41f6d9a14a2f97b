"""Online tracking: jointly optimize radiance fields and per-frame SE(3)
vehicle poses by photometric self-supervision, admitting frames via the
curriculum.

Counterpart of the reference train_online__.py (StarOnline): warm start from
the appearance checkpoint (static weights only), learnable pose table with
frame 0 pinned to identity, hybrid optimizer, five regularizers, frame-window
curriculum, val renders with pose metrics, and a test mode computing the
full parity metric suite (masked PSNR/SSIM, pose errors, RPE/ATE, 2D/3D IoU)
plus TUM-style pose export.

Beyond the reference, the app carries the validated pose recipe as config
flags (see STATUS.md "Pose convergence work" and utils/config.py):

- warmup: a field-forming phase with poses frozen (pose_delay_epochs), then
  BARF coarse-to-fine on the dynamic fields with rotations frozen (end_barf,
  barf_freeze_rot) — escapes vehicle-texture local minima,
- curriculum: the reference frame-admission loop, optionally interleaving
  pose-only epochs (pose_only_every),
- polish: after all frames are admitted, block-coordinate descent —
  fields-only to a loss plateau, then poses-only to a plateau, repeated
  (polish_mode = "alternate") — with ghost/frame-0 anchor sampling to pin
  the dynamic fields' canonical frame, and GT-free best-epoch selection on
  held-out-view photometric error (selection = "photometric"),
- gauge correction (polish_mode = "gauge_align"): estimates the shared
  per-vehicle canonical-frame drift against fresh frame-0-refit reference
  fields and corrects all poses at once — the GT-free escape from the
  alternation fixed point where the fields have absorbed the pose error
  (see utils/config.py gauge_rounds and train/loop.make_gauge_train_step).

Ray-axis data parallelism (data_parallel flag) shards every train batch and
eval tile over the device mesh — the reference is strictly single-GPU
(train_online__.py:1165-1166).

Usage:
  python -m startrax.apps.online --config startrax/configs/carla_star_online.txt
  python -m startrax.apps.online --config ... --test true
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.prefetch import BatchPrefetcher
from ..ops import lie
from ..eval import pose as pose_mod
from ..eval.image import psnr as psnr_fn, ssim as ssim_fn
from ..eval.render import render_image
from ..parallel import mesh as meshlib
from ..train import checkpoint as ckpt
from ..train import loop, optim
from ..train.curriculum import CurriculumConfig, CurriculumState, advance
from ..utils.config import Config, load_config, star_config_from, loss_config_from
from .common import Workspace, make_dataset, host_prng
from .test_protocol import frame_metrics, run_test_protocol


def _init_params(cfg: Config, star_cfg, key, train_data, rng):
    params = loop.init_online_params(key, star_cfg, cfg.num_frames)

    if cfg.appearance_ckpt_path:
        app = ckpt.restore_checkpoint(cfg.appearance_ckpt_path, None)
        app_params = app["params"] if "params" in app else app
        params = ckpt.restore_static_only(app_params, params)

    if cfg.load_gt_poses:
        # debug path: train with ground-truth poses (reference
        # train_online__.py:102-117); poses are pinned by a zero pose LR set
        # by the caller
        gt = np.swapaxes(train_data.gt_relative_poses(), 0, 1)  # [F, K, 7]
        params["poses"] = jnp.asarray(gt[1:])
    elif cfg.noisy_pose_init and hasattr(train_data, "noisy_gt_relative_poses"):
        noisy = train_data.noisy_gt_relative_poses(rng)  # [K, F, 7]
        params["poses"] = jnp.asarray(np.swapaxes(noisy, 0, 1)[1:])  # [F-1, K, 7]
    return params


def make_run_mesh(cfg: Config, log=None):
    """Build the 1-D ray mesh per the data_parallel flag: "auto" shards over
    all visible devices when there is more than one, "on" requires it, "off"
    stays single-device (parallel/mesh.py)."""
    n = jax.device_count()
    if cfg.data_parallel == "off" or (cfg.data_parallel == "auto" and n <= 1):
        return None
    if cfg.data_parallel not in ("auto", "on"):
        raise ValueError(f"data_parallel must be auto/on/off, got {cfg.data_parallel}")
    if cfg.data_parallel == "on" and n <= 1:
        raise RuntimeError("data_parallel=on but only one device is visible")
    mesh = meshlib.make_mesh()
    if log:
        log(f"ray-axis data parallelism over {mesh.size} devices")
    return mesh


def _place_batch(batch, mesh):
    if mesh is None:
        return {k: jnp.asarray(v) for k, v in batch.items()}
    return meshlib.shard_batch(batch, mesh)


# polish sub-state <-> checkpoint encoding (phases as ints; orbax pytrees
# carry no strings)
_ALT_PHASES = ("field", "pose")
_REFIT_STAGES = ("field", "pose", "alternate")
_GA_STAGES = ("ref_field", "gauge", "alternate")


def _polish_template():
    return {"polish_used": 0, "alt_phase": 0, "alt_rounds": 0,
            "refit_stage": 0, "refit_used": 0,
            "ga_stage": 0, "ga_used": 0, "ga_rounds": 0,
            "best_score": 0.0, "best_epoch": -1,
            "bbest_score": 0.0, "bbest_epoch": -1, "n_boundary": 0}


def _loss_plateau(losses, window: int, tol: float) -> bool:
    """True when the mean loss of the last `window` epochs improved less than
    tol (relative) over the window before it."""
    if len(losses) < 2 * window:
        return False
    prev = float(np.mean(losses[-2 * window : -window]))
    last = float(np.mean(losses[-window:]))
    return last > (1.0 - tol) * prev


def _score_frames(cfg: Config, start_frame: int, num_frames: int):
    """Frames scored by selection/guard: evenly strided subset of the window
    when selection_frames caps it (cost control at production frame counts)."""
    frames = list(range(start_frame, num_frames))
    if 0 < cfg.selection_frames < len(frames):
        idx = np.linspace(0, len(frames) - 1, cfg.selection_frames)
        frames = [frames[i] for i in sorted({int(round(i)) for i in idx})]
    return frames


def _depth_mse(pred, gt, near: float, far: float) -> float:
    """Host-side DS-NeRF relative-squared depth error (ops/losses.depth_loss
    shape, numpy) over in-volume pixels."""
    mask = (gt > near) & (gt < far)
    if not mask.any():
        return 0.0
    err = ((pred - gt) / np.where(gt == 0, 1.0, gt)) ** 2
    return float(err[mask].mean())


def selection_score(cfg: Config, star_cfg, params, val_data, num_frames: int,
                    mesh=None, view: int = 0,
                    start_frame: int = 0) -> float:
    """GT-free best-epoch criterion: mean MSE of a held-out val view rendered
    at every scored frame with the learned poses (frame 0 = identity). Lower
    is better. Replaces the GT-pose oracle that only the synthetic benchmark
    has; validated against it in scripts/synthetic_e2e.py.

    selection = "photometric_depth" adds selection_depth_lambda * the
    relative-squared depth error when the dataset carries depth maps — the
    canonical-frame drift is flat under the photometric term but not under
    metric depth. selection_frames / selection_stride subsample the scored
    frames / pixels (cost control; defaults score everything)."""
    s = max(cfg.selection_stride, 1)
    rays_o, rays_d = val_data.view_rays(view)
    rays_o, rays_d = rays_o[::s, ::s], rays_d[::s, ::s]
    use_depth = (cfg.selection == "photometric_depth"
                 and getattr(val_data, "depths", None) is not None)
    # N_importance=0 renders only emit "0"-suffixed (coarse) outputs —
    # mirror the loop.py compute_losses fallback (ADVICE r4)
    suff = "" if star_cfg.n_importance > 0 else "0"
    keys = ("rgb" + suff, "depth" + suff) if use_depth else ("rgb" + suff,)
    total, count = 0.0, 0
    for f in _score_frames(cfg, start_frame, num_frames):
        pose = loop.gather_frame_pose(
            jnp.asarray(params["poses"]), jnp.asarray(f), star_cfg.num_vehicles)
        out = render_image(params["nerf"], star_cfg, rays_o, rays_d, pose=pose,
                           mesh=mesh, keys=keys)
        target = np.asarray(val_data.images[view, f], np.float32)[::s, ::s]
        score = float(np.mean((out["rgb" + suff] - target) ** 2))
        if use_depth:
            gt_d = np.asarray(val_data.depths[view, f], np.float32)[::s, ::s]
            score += cfg.selection_depth_lambda * _depth_mse(
                out["depth" + suff], gt_d, star_cfg.near, star_cfg.far)
        total += score
        count += 1
    return total / max(count, 1)


# gauge_guard: a candidate correction must keep the vehicle at least this
# visible (held-out mean opacity mass vs the uncorrected poses). A garbage
# fit that teleports a vehicle out of the frustum can IMPROVE the held-out
# photometric score whenever the reference dynamic fields explain the pixels
# worse than the static background — "accept by vanishing". Visibility is
# orthogonal to photometric quality, so the two checks compose.
# Default for the cfg.gauge_guard_min_vis flag (utils/config.py).
GAUGE_GUARD_MIN_VIS = 0.3


def _gauge_accept(base_score: float, cand_score: float,
                  base_vis: float, cand_vis: float,
                  min_vis: float = GAUGE_GUARD_MIN_VIS,
                  rel: float = 1e-3) -> bool:
    """Per-vehicle gauge acceptance: the candidate correction must strictly
    improve the held-out photometric error AND keep the vehicle visible."""
    better = cand_score < base_score * (1.0 - rel)
    visible = base_vis < 1e-4 or cand_vis >= min_vis * base_vis
    return bool(better and visible)


def _guard_eval(cfg: Config, star_cfg, params, val_data, num_frames: int,
                mesh=None, view: int = 0, start_frame: int = 1):
    """Held-out photometric error (+ gauge_depth_lambda * depth error when
    the dataset carries depth) + per-vehicle held-out visibility mass [K]
    (mean 1 - dynamic transmittance over rays and frames). Honors
    selection_frames / selection_stride like selection_score."""
    s = max(cfg.selection_stride, 1)
    rays_o, rays_d = val_data.view_rays(view)
    rays_o, rays_d = rays_o[::s, ::s], rays_d[::s, ::s]
    use_depth = (cfg.gauge_depth_lambda > 0
                 and getattr(val_data, "depths", None) is not None)
    # same "0"-suffix fallback as selection_score for N_importance=0 (ADVICE r4)
    suff = "" if star_cfg.n_importance > 0 else "0"
    keys = ((f"rgb{suff}", f"depth{suff}", f"dynamic_transmittance{suff}")
            if use_depth else (f"rgb{suff}", f"dynamic_transmittance{suff}"))
    total, count = 0.0, 0
    mass = np.zeros(star_cfg.num_vehicles)
    for f in _score_frames(cfg, start_frame, num_frames):
        pose = loop.gather_frame_pose(
            jnp.asarray(params["poses"]), jnp.asarray(f), star_cfg.num_vehicles)
        out = render_image(params["nerf"], star_cfg, rays_o, rays_d, pose=pose,
                           mesh=mesh, keys=keys)
        target = np.asarray(val_data.images[view, f], np.float32)[::s, ::s]
        score = float(np.mean((out["rgb" + suff] - target) ** 2))
        if use_depth:
            gt_d = np.asarray(val_data.depths[view, f], np.float32)[::s, ::s]
            score += cfg.gauge_depth_lambda * _depth_mse(
                out["depth" + suff], gt_d, star_cfg.near, star_cfg.far)
        total += score
        mass += np.mean(1.0 - out["dynamic_transmittance" + suff], axis=(0, 1))
        count += 1
    return total / max(count, 1), mass / max(count, 1)


def train(cfg: Config):
    ws = Workspace(cfg, "online")
    star_cfg = star_config_from(cfg)
    # the main (post-warmup) steps always run full-frequency so the fused
    # in-kernel-PE path stays on; a separate BARF-masked variant covers the
    # warmup epochs only
    import dataclasses as _dc

    star_cfg = _dc.replace(star_cfg, end_barf=-1)
    star_cfg_barf = (_dc.replace(star_cfg, end_barf=cfg.end_barf)
                     if cfg.end_barf > 0 else star_cfg)
    loss_cfg = loss_config_from(cfg)

    train_data = make_dataset(cfg, "train")
    val_data = make_dataset(cfg, "val")
    has_gt = hasattr(train_data, "gt_relative_poses")
    gt_rel = (np.swapaxes(train_data.gt_relative_poses(), 0, 1)
              if has_gt else None)  # [F, K, 7]

    rng, key = host_prng(cfg.seed)
    params = _init_params(cfg, star_cfg, key, train_data, rng)

    mesh = make_run_mesh(cfg, ws.log)
    n_rand = cfg.N_rand
    if mesh is not None:
        n_rand = meshlib.pad_rays_to_multiple(cfg.N_rand, mesh.size)
        if n_rand != cfg.N_rand:
            ws.log(f"N_rand {cfg.N_rand} -> {n_rand} (divisible by mesh size)")
        params = meshlib.replicate_params(params, mesh)

    pose_lr = 0.0 if cfg.load_gt_poses else cfg.lrate_pose
    opt_kw = dict(
        steps_per_epoch=cfg.steps_per_epoch,
        grad_clip=1.0, accumulate_steps=cfg.accumulate_grad_batches,
    )
    nerf_decay = dict(decay_rate=cfg.lrate_decay_rate,
                      decay_epochs=cfg.lrate_decay,
                      decay_milestones=cfg.lrate_decay_steps)
    pose_decay = dict(pose_decay_rate=cfg.pose_lrate_decay_rate,
                      pose_decay_epochs=cfg.pose_lrate_decay,
                      pose_decay_milestones=cfg.pose_lrate_decay_steps)

    tx = optim.make_fused_star_optimizer(
        params, lrate_static=cfg.lrate_static, lrate_dynamic=cfg.lrate_dynamic,
        lrate_pose=pose_lr, **nerf_decay, **pose_decay, **opt_kw)
    opt_state = tx.init(params)
    step_fn = loop.make_online_train_step(
        star_cfg, loss_cfg, tx, trans_only=cfg.pose_trans_only)

    # BARF warmup: same optimizer state as the joint step, coarse-to-fine
    # masked dynamic fields, rotations optionally frozen (a blurred field is
    # nearly rotation-symmetric — rotation gradients are noise)
    step_fn_barf = None
    if cfg.end_barf > 0:
        step_fn_barf = loop.make_online_train_step(
            star_cfg_barf, loss_cfg, tx,
            trans_only=cfg.pose_trans_only,
            freeze_rot=cfg.barf_freeze_rot and not cfg.pose_trans_only)

    # fields-only steps (pose LR 0): the field-forming warmup phase and the
    # alternation field phases share one optimizer
    # refit_anchor falls through to alternate after pose recovery, so it
    # needs the fields-only optimizer too
    need_field_tx = (cfg.pose_delay_epochs > 0
                     or (cfg.polish_epochs > 0
                         and cfg.polish_mode in ("alternate", "refit_anchor",
                                                 "gauge_align")))
    opt_state_field = None
    if need_field_tx:
        tx_field = optim.make_fused_star_optimizer(
            params, lrate_static=cfg.lrate_static,
            lrate_dynamic=cfg.lrate_dynamic, lrate_pose=0.0,
            **nerf_decay, **opt_kw)
        opt_state_field = tx_field.init(params)
        step_fn_field = loop.make_online_train_step(star_cfg, loss_cfg, tx_field)
        step_fn_fieldform = (
            loop.make_online_train_step(star_cfg_barf, loss_cfg, tx_field)
            if cfg.end_barf > 0 else step_fn_field)

    # pose-only step (field LRs 0) for pose_only_every epochs
    opt_state_pose = None
    if cfg.pose_only_every > 0 and not cfg.load_gt_poses:
        tx_pose = optim.make_fused_star_optimizer(
            params, lrate_static=0.0, lrate_dynamic=0.0, lrate_pose=pose_lr,
            **pose_decay, **opt_kw)
        opt_state_pose = tx_pose.init(params)
        step_fn_pose = loop.make_online_train_step(
            star_cfg, loss_cfg, tx_pose, trans_only=cfg.pose_trans_only)

    # polish pose refinement: pose-only with its own (decaying) LR schedule
    # and fresh moments
    opt_state_polish = None
    if cfg.polish_epochs > 0 and not cfg.load_gt_poses:
        tx_polish = optim.make_fused_star_optimizer(
            params, lrate_static=0.0, lrate_dynamic=0.0, lrate_pose=pose_lr,
            pose_decay_rate=cfg.polish_pose_lrate_decay_rate,
            pose_decay_epochs=cfg.polish_pose_lrate_decay, **opt_kw)
        opt_state_polish = tx_polish.init(params)
        step_fn_polish = loop.make_online_train_step(
            star_cfg, loss_cfg, tx_polish, trans_only=cfg.pose_trans_only)

    # refit_anchor / gauge_align: dynamic-fields-only optimizer for the
    # frame-0 (re-)fit (static and poses pinned; fresh moments at stage entry)
    tx_refit = None
    if (cfg.polish_epochs > 0
            and cfg.polish_mode in ("refit_anchor", "gauge_align")
            and not cfg.load_gt_poses):
        tx_refit = optim.make_fused_star_optimizer(
            params, lrate_static=0.0, lrate_dynamic=cfg.lrate_dynamic,
            lrate_pose=0.0, **nerf_decay, **opt_kw)
        step_fn_refit = loop.make_online_train_step(star_cfg, loss_cfg, tx_refit)
    if cfg.polish_epochs > 0 and cfg.polish_mode == "refit_anchor" \
            and not cfg.load_gt_poses:
        step_fn_refit_pose = (
            loop.make_online_train_step(
                star_cfg, loss_cfg, tx_polish,
                trans_only=cfg.pose_trans_only,
                freeze_rot=cfg.refit_pose_freeze_rot and not cfg.pose_trans_only)
            if cfg.refit_pose_freeze_rot else step_fn_polish)

    # gauge_align: plain Adam over the shared [K, 7] gauge; the jitted step
    # renders the scratch reference fields with pose = G ∘ p_f
    gauge_step_fn = None
    if (cfg.polish_epochs > 0 and cfg.polish_mode == "gauge_align"
            and not cfg.load_gt_poses):
        tx_gauge = optax.adam(cfg.lrate_pose)
        gauge_step_fn = loop.make_gauge_train_step(
            star_cfg, tx_gauge, freeze_rot=cfg.gauge_freeze_rot,
            depth_lambda=cfg.gauge_depth_lambda)

    cur_cfg = CurriculumConfig(
        num_frames=cfg.num_frames,
        initial_num_frames=cfg.initial_num_frames,
        online_thres=cfg.online_thres,
        min_epochs_between=cfg.epochs_between_frames,
        tightened_thres=cfg.online_thres_tightened,
    )
    cur = CurriculumState.initial(cur_cfg)

    start_epoch = 0
    resume_polish = None
    if cfg.online_ckpt_path:
        template = {
            "params": params, "opt_state": opt_state,
            "curriculum": ckpt.curriculum_to_dict(cur), "epoch": 0,
        }
        saved_keys = ckpt.checkpoint_keys(cfg.online_ckpt_path)
        for name, state in (("opt_state_pose", opt_state_pose),
                            ("opt_state_polish", opt_state_polish),
                            ("opt_state_field", opt_state_field)):
            if state is not None and name in saved_keys:
                template[name] = state
        if "polish" in saved_keys:
            template["polish"] = _polish_template()
        restored = ckpt.restore_checkpoint(cfg.online_ckpt_path, template)
        params, opt_state = restored["params"], restored["opt_state"]
        opt_state_pose = restored.get("opt_state_pose", opt_state_pose)
        opt_state_polish = restored.get("opt_state_polish", opt_state_polish)
        opt_state_field = restored.get("opt_state_field", opt_state_field)
        cur = ckpt.curriculum_from_dict(restored["curriculum"])
        # the admission threshold is config-derived calibration (m2 /
        # tightened-m2 in the reference, tuned per capture), not independent
        # run state: re-derive it from the CURRENT config so a per-scene
        # recalibration (e.g. --online_thres_tightened) applies on resume
        new_thr = (cur_cfg.tightened_thres
                   if cur.current_frame > cur_cfg.initial_num_frames
                   else cur_cfg.online_thres)
        if new_thr != cur.threshold:
            ws.log(f"curriculum threshold recalibrated on resume: "
                   f"{cur.threshold:g} -> {new_thr:g}")
            import dataclasses as _dc

            cur = _dc.replace(cur, threshold=new_thr)
        resume_polish = restored.get("polish")
        if mesh is not None:
            # restored leaves may land on one device; train batches are
            # mesh-sharded
            params = meshlib.replicate_params(params, mesh)
        start_epoch = int(restored.get("epoch", -1)) + 1
        ws.log(f"resumed online training at epoch {start_epoch}, "
               f"frame window {cur.current_frame}")

    def pose_errors(poses):
        trans, rot, *_ = pose_mod.get_pose_metrics_multi(
            np.asarray(poses), gt_rel[1:])
        return [float(t) for t in trans], [float(r) for r in rot]

    if has_gt and cfg.noisy_pose_init and not cfg.load_gt_poses:
        t0, r0 = pose_errors(params["poses"])
        ws.log(f"initial pose error: trans={t0} rot={r0}")

    # Host-side sampling overlaps device execution (the reference's
    # DataLoader(num_workers=4) role, train_online__.py:1064). The workers
    # read `sample_state` without locking: up to depth+workers queued batches
    # were sampled under the previous phase's state — steps_per_epoch is far
    # larger than the queue, so a handful of stale-window batches at each
    # transition is accepted by design.
    sample_state = {"start": cur.start_frame,
                    "end": min(cur.current_frame, cfg.num_frames),
                    "car": cfg.car_sample_ratio, "crop": False,
                    "ghost": cfg.ghost_sample_ratio,
                    "f0": cfg.frame0_sample_ratio,
                    "mixed": cfg.mixed_frames}
    prefetcher = BatchPrefetcher(
        lambda r, st: train_data.sample_batch(
            r, n_rand, start_frame=st["start"], current_frame=st["end"],
            car_sample_ratio=st["car"], crop=st["crop"],
            mixed_frames=st["mixed"],
            ghost_sample_ratio=st["ghost"], frame0_sample_ratio=st["f0"]),
        sample_state, seed=cfg.seed * 7919 + 1, depth=6,
        workers=max(cfg.num_workers, 1))

    car_pose = (cfg.car_sample_ratio_pose if cfg.car_sample_ratio_pose >= 0
                else cfg.car_sample_ratio)
    deadline = (time.time() + cfg.train_minutes * 60
                if cfg.train_minutes > 0 else None)
    sel_enabled = cfg.selection != "none" and (cfg.selection != "gt_pose" or has_gt)
    best = {"score": float("inf"), "epoch": -1, "params": None,
            "trans": None, "rot": None}
    # round-boundary best (selection_boundary_only): the best-scoring epoch
    # among those that COMPLETE a field+pose alternation round — the settled
    # states the offline re-judge showed track the GT oracle ~2x closer than
    # the every-epoch best (artifacts/selection_rejudge_r5.json)
    bbest = {"score": float("inf"), "epoch": -1, "params": None,
             "trans": None, "rot": None}
    n_boundary = 0
    best_saved = bbest_saved = -1

    def _active_best():
        """The selection rule that ships: prefer the boundary best once >= 2
        boundary candidates exist, else the every-epoch best (a single
        boundary carries no comparison and can sit on a bad state)."""
        if (cfg.selection_boundary_only and n_boundary >= 2
                and bbest["epoch"] >= 0):
            return bbest
        return best
    history = []
    # alternation sub-state (polish_mode = "alternate")
    alt_phase, alt_losses, alt_rounds = "field", [], 0
    # refit_anchor sub-state: field (frame-0 dynamic re-fit) -> pose ->
    # alternate for the remainder
    refit = {"stage": "field", "used": 0}
    # gauge_align sub-state: ref_field (fresh reference dynamics on a scratch
    # params copy) -> gauge (shared SE(3) fit) -> alternate re-convergence;
    # re-enters ref_field after each completed alternate round while rounds
    # remain. Like refit's, this sub-state restarts on resume.
    ga = {"stage": "ref_field", "used": 0, "rounds": 0,
          "ref_params": None, "opt": None, "gauge": None, "gauge_opt": None}
    # photometric multi-start sub-state (multi_start_rounds flag): restarts
    # on resume like the gauge scratch stages — the procedure is bounded and
    # its result lives in the adopted poses
    ms = {"rounds": 0, "pending": False}
    polish_used = 0
    step = 0
    stop_reason = ""

    if resume_polish is not None:
        pd = jax.tree.map(lambda x: x.item() if hasattr(x, "item") else x,
                          resume_polish)
        polish_used = int(pd["polish_used"])
        alt_phase = _ALT_PHASES[int(pd["alt_phase"])]
        alt_rounds = int(pd["alt_rounds"])
        refit = {"stage": _REFIT_STAGES[int(pd["refit_stage"])],
                 "used": int(pd["refit_used"])}
        ga.update(stage=_GA_STAGES[int(pd["ga_stage"])],
                  used=int(pd["ga_used"]), rounds=int(pd["ga_rounds"]))
        # the gauge round's scratch reference fields / gauge optimizer are
        # not checkpointed — restart an interrupted round from its ref fit
        if ga["stage"] in ("ref_field", "gauge"):
            ga.update(stage="ref_field", used=0)
        if int(pd["best_epoch"]) >= 0:
            best.update(score=float(pd["best_score"]),
                        epoch=int(pd["best_epoch"]))
            try:
                b = ckpt.restore_checkpoint(cfg.online_ckpt_path + "_best",
                                            {"params": params})
                best["params"] = jax.tree.map(np.asarray, b["params"])
                ws.log(f"restored best-epoch snapshot (epoch {best['epoch']}, "
                       f"score {best['score']:.3e})")
            except (FileNotFoundError, ValueError):
                best.update(score=float("inf"), epoch=-1)
        n_boundary = int(pd.get("n_boundary", 0))
        if int(pd.get("bbest_epoch", -1)) >= 0:
            bbest.update(score=float(pd["bbest_score"]),
                         epoch=int(pd["bbest_epoch"]))
            try:
                b = ckpt.restore_checkpoint(cfg.online_ckpt_path + "_bbound",
                                            {"params": params})
                bbest["params"] = jax.tree.map(np.asarray, b["params"])
                ws.log(f"restored boundary-best snapshot (epoch "
                       f"{bbest['epoch']}, score {bbest['score']:.3e})")
            except (FileNotFoundError, ValueError):
                bbest.update(score=float("inf"), epoch=-1)
        ws.log(f"resumed polish sub-state: used={polish_used} "
               f"alt={alt_phase}/{alt_rounds} ga={ga['stage']}/{ga['rounds']}")

    def _polish_state():
        return {"polish_used": polish_used,
                "alt_phase": _ALT_PHASES.index(alt_phase),
                "alt_rounds": alt_rounds,
                "refit_stage": _REFIT_STAGES.index(refit["stage"]),
                "refit_used": refit["used"],
                "ga_stage": _GA_STAGES.index(ga["stage"]),
                "ga_used": ga["used"], "ga_rounds": ga["rounds"],
                "best_score": (best["score"] if best["epoch"] >= 0 else 0.0),
                "best_epoch": best["epoch"],
                "bbest_score": (bbest["score"] if bbest["epoch"] >= 0 else 0.0),
                "bbest_epoch": bbest["epoch"], "n_boundary": n_boundary}

    # DS-NeRF supervision terms, averaged per epoch for the logs (reference
    # train_online__.py:317-320 logs them per step)
    aux_losses = {}

    def run_phase_epoch(fn, opt_st, epoch, car, ghost, f0, window=None,
                        params_arg=None, mixed=None):
        nonlocal key, step
        start, end = (window if window is not None
                      else (cur.start_frame,
                            min(cur.current_frame, cfg.num_frames)))
        sample_state.update(
            start=start, end=end,
            crop=epoch < cfg.precrop_iters, car=car, ghost=ghost, f0=f0,
            mixed=cfg.mixed_frames if mixed is None else mixed)
        fines = []
        aux_losses.clear()
        p = params if params_arg is None else params_arg
        for _ in range(cfg.steps_per_epoch):
            batch = _place_batch(next(prefetcher), mesh)
            key, sub = jax.random.split(key)
            p, opt_st, lossv, metrics = fn(p, opt_st, batch, sub,
                                           jnp.asarray(epoch))
            step += 1
            fines.append(metrics["fine_loss"])  # device scalar, no sync
            for k in ("depth_loss", "sigma_loss"):
                if k in metrics:
                    aux_losses.setdefault(k, []).append(metrics[k])
        return p, opt_st, float(np.mean(np.asarray(jnp.stack(fines))))

    def run_gauge_epoch(epoch):
        """One epoch of shared-gauge fitting. gauge_mode="ref_field": frames
        1..F-1 against the scratch reference fields, per-ray mixed frames
        (every frame contributes to the single shared G each step).
        gauge_mode="frame0": frame-0 rays against the PRODUCTION fields —
        frame-0's pose is identity, so the rendered pose is G itself and the
        fit directly estimates the canonical drift (the direction the depth
        landscape slopes along). Production poses frozen either way."""
        nonlocal key, step
        frame0 = cfg.gauge_mode == "frame0"
        sample_state.update(
            start=0 if frame0 else 1,
            end=1 if frame0 else cfg.num_frames, crop=False,
            car=car_pose, ghost=0.0, f0=0.0, mixed=True)
        nerf = params["nerf"] if frame0 else ga["ref_params"]["nerf"]
        losses = []
        for _ in range(cfg.steps_per_epoch):
            batch = _place_batch(next(prefetcher), mesh)
            key, sub = jax.random.split(key)
            ga["gauge"], ga["gauge_opt"], lossv = gauge_step_fn(
                ga["gauge"], ga["gauge_opt"], nerf,
                params["poses"], batch, sub)
            step += 1
            losses.append(lossv)
        return float(np.mean(np.asarray(jnp.stack(losses))))

    def run_multi_start(epoch):
        """Basin hopping over the drift subspace (train_online__.py:632-652
        names no such stage — new capability): per-vehicle constant
        translation perturbations of the pose table, each given a short
        pose-only polish with fresh moments, all scored by the GT-free
        selection criterion; the best strictly-improving candidate is
        adopted. The perturbation structure matches the measured residual
        (~94% a constant per-vehicle offset, artifacts/crossview_diag.json).
        Returns the adopted (or base) score."""
        nonlocal key, params, opt_state_field, opt_state_polish
        rng_ms = np.random.default_rng(cfg.seed * 31 + ms["rounds"] * 7 + 5)
        K = star_cfg.num_vehicles
        base_score = selection_score(cfg, star_cfg, params, val_data,
                                     cfg.num_frames, mesh=mesh)
        best_sc, best_params, best_c = base_score, None, -1
        for c in range(cfg.multi_start_candidates):
            g = np.asarray(lie.se3_identity(K)).copy()
            d = rng_ms.normal(size=(K, 3))
            d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
            g[:, :3] = cfg.multi_start_scale * d
            cand = dict(params, poses=lie.se3_multiply(
                jnp.asarray(g)[None], jnp.asarray(params["poses"])))
            if mesh is not None:
                cand = meshlib.replicate_params(cand, mesh)
            opt_c = tx_polish.init(cand)
            for _ in range(cfg.multi_start_epochs):
                # per-ray mixed frames: each candidate's short budget gives
                # every frame's pose gradient in every step
                cand, opt_c, _avg = run_phase_epoch(
                    step_fn_polish, opt_c, epoch, car_pose, 0.0, 0.0,
                    params_arg=cand, mixed=True)
            sc = selection_score(cfg, star_cfg, cand, val_data,
                                 cfg.num_frames, mesh=mesh)
            # residual displacement after the recovery polish: ~0 means the
            # candidate rolled back into the same basin (attractor radius >=
            # multi_start_scale — the r4 measured outcome), ~multi_start_scale
            # means it settled in a genuinely different optimum
            resid = float(np.abs(np.asarray(cand["poses"])[..., :3]
                                 - np.asarray(params["poses"])[..., :3]).max())
            ws.log(f"multi_start: candidate {c} |g|="
                   f"{np.linalg.norm(g[:, :3], axis=-1).round(4).tolist()} "
                   f"score {sc:.4e} (base {base_score:.4e}) "
                   f"residual_disp {resid:.4f}")
            if sc < best_sc:
                best_sc, best_params, best_c = sc, cand, c
        if best_params is not None:
            params = best_params
            # the pose jump invalidates accumulated moments
            opt_state_field = tx_field.init(params)
            opt_state_polish = tx_polish.init(params)
            ws.log(f"multi_start: adopted candidate {best_c} "
                   f"({base_score:.4e} -> {best_sc:.4e})")
        else:
            ws.log("multi_start: no candidate beat the base "
                   f"({base_score:.4e})")
        return best_sc

    try:
        for epoch in range(start_epoch, cfg.epochs_online):
            if deadline is not None and time.time() > deadline:
                stop_reason = "train_minutes budget"
                break
            # gauge_fit epochs don't run a phase epoch; without this they
            # would re-log the previous epoch's aux terms (ADVICE r3)
            aux_losses.clear()
            # set when this epoch COMPLETES a field+pose alternation round
            # (the settled state the boundary selection protocol scores)
            round_boundary = False

            in_fieldform = epoch < cfg.pose_delay_epochs and opt_state_field is not None
            in_barf = (not in_fieldform and cfg.end_barf > 0
                       and epoch < cfg.end_barf)
            in_polish = cur.done and cfg.polish_epochs > 0 and not cfg.load_gt_poses
            if cur.done and not in_polish:
                break

            phase = "joint"
            if in_fieldform:
                phase = "fieldform"
                params, opt_state_field, avg = run_phase_epoch(
                    step_fn_fieldform, opt_state_field, epoch,
                    cfg.car_sample_ratio, cfg.ghost_sample_ratio,
                    cfg.frame0_sample_ratio)
            elif in_barf:
                phase = "barf"
                params, opt_state, avg = run_phase_epoch(
                    step_fn_barf, opt_state, epoch,
                    cfg.car_sample_ratio, cfg.ghost_sample_ratio,
                    cfg.frame0_sample_ratio)
            elif in_polish:
                if polish_used >= cfg.polish_epochs:
                    stop_reason = "polish budget"
                    break
                polish_used += 1
                mode = cfg.polish_mode
                if mode == "refit_anchor":
                    mode = "alternate" if refit["stage"] == "alternate" else mode
                if mode == "gauge_align" and ga["stage"] == "alternate":
                    mode = "alternate"
                if (mode == "gauge_align" and ga["stage"] == "ref_field"
                        and cfg.gauge_mode == "frame0"):
                    # frame-0 estimator needs no reference fields: jump
                    # straight to the gauge fit against the production fields
                    ga.update(stage="gauge", used=0,
                              gauge=jnp.asarray(lie.se3_identity(
                                  star_cfg.num_vehicles)))
                    ga["gauge_opt"] = tx_gauge.init(ga["gauge"])
                    ws.log(f"gauge_align[frame0]: fitting the frame-0 gauge "
                           f"(round {ga['rounds']})")
                if (ms["pending"] and mode == "alternate"
                        and ms["rounds"] < cfg.multi_start_rounds):
                    phase = "multi_start"
                    avg = run_multi_start(epoch)
                    ms["rounds"] += 1
                    ms["pending"] = False
                    alt_phase, alt_losses = "field", []
                elif mode == "gauge_align" and ga["stage"] == "ref_field":
                    if ga["used"] == 0:
                        # scratch copy: original fields untouched; fresh
                        # dynamic fields fit from frame-0 rays carry zero
                        # canonical-frame drift by construction
                        from ..models.fields import init_stacked_fields
                        key, kc, kf = jax.random.split(key, 3)
                        ref_nerf = dict(params["nerf"])
                        ref_nerf["dynamic_coarse"] = init_stacked_fields(
                            kc, star_cfg.dynamic_field(), star_cfg.num_vehicles)
                        if "dynamic_fine" in ref_nerf:
                            ref_nerf["dynamic_fine"] = init_stacked_fields(
                                kf, star_cfg.dynamic_field(fine=True),
                                star_cfg.num_vehicles)
                        ga["ref_params"] = {"nerf": ref_nerf,
                                            "poses": params["poses"]}
                        if mesh is not None:
                            ga["ref_params"] = meshlib.replicate_params(
                                ga["ref_params"], mesh)
                        ga["opt"] = tx_refit.init(ga["ref_params"])
                        ws.log("gauge_align: fitting frame-0 reference fields "
                               f"(round {ga['rounds']})")
                    phase = "gauge_ref"
                    ga["ref_params"], ga["opt"], avg = run_phase_epoch(
                        step_fn_refit, ga["opt"], epoch, car_pose, 0.0, 0.0,
                        window=(0, 1), params_arg=ga["ref_params"],
                        mixed=True)
                    ga["used"] += 1
                    if ga["used"] >= cfg.refit_epochs:
                        ga.update(stage="gauge", used=0,
                                  gauge=jnp.asarray(lie.se3_identity(
                                      star_cfg.num_vehicles)))
                        ga["gauge_opt"] = tx_gauge.init(ga["gauge"])
                elif mode == "gauge_align":  # ga["stage"] == "gauge"
                    phase = "gauge_fit"
                    avg = run_gauge_epoch(epoch)
                    ga["used"] += 1
                    if ga["used"] >= cfg.gauge_epochs:
                        G = np.asarray(ga["gauge"])  # [K, 7]
                        if cfg.gauge_mode == "frame0":
                            # the fitted g places the drifted canonical field
                            # at frame-0 truth; the pose correction is its
                            # inverse (g^-1 ∘ est -> GT)
                            G = np.asarray(lie.se3_inverse(jnp.asarray(G)))
                        accepted = np.array(
                            lie.se3_identity(star_cfg.num_vehicles))
                        n_acc = 0
                        if cfg.gauge_mode == "frame0":
                            # no drift-free reference fields to guard
                            # against; the best-epoch selection criterion
                            # (photometric_depth) is the safety net — plus a
                            # per-vehicle magnitude bound so a diverged
                            # 2-epoch fit cannot jump the whole pose table
                            # and burn the remaining polish budget on
                            # recovery (ADVICE r4)
                            for k in range(star_cfg.num_vehicles):
                                tnorm = float(np.linalg.norm(G[k, :3]))
                                ang = 2.0 * float(np.arccos(
                                    min(1.0, abs(G[k, 6]))))
                                if (tnorm <= cfg.gauge_max_trans
                                        and ang <= cfg.gauge_max_rot):
                                    accepted[k] = G[k]
                                    n_acc += 1
                                else:
                                    ws.log("gauge_align[frame0]: vehicle "
                                           f"{k} correction |t|={tnorm:.4f} "
                                           f"rot={ang:.4f} exceeds cap "
                                           f"({cfg.gauge_max_trans}/"
                                           f"{cfg.gauge_max_rot}) — rejected")
                            if n_acc:
                                ws.log("gauge_align[frame0]: applying "
                                       f"g^-1 t={accepted[:, :3].round(4).tolist()} "
                                       f"({n_acc}/{star_cfg.num_vehicles} "
                                       "within bounds; selection guards)")
                        elif cfg.gauge_guard:
                            # per-vehicle acceptance on a HELD-OUT view
                            # against the drift-free reference fields: the
                            # r3 run showed the shared fit can land in a
                            # duplicate photometric mode on train views
                            # (v2 trans 0.068 -> 0.40); a component is
                            # applied only if it strictly improves the
                            # held-out error AND keeps the vehicle visible
                            # (no accept-by-vanishing, _guard_eval docs)
                            def _ref_eval(g):
                                cand = lie.se3_multiply(
                                    jnp.asarray(g)[None],
                                    jnp.asarray(params["poses"]))
                                return _guard_eval(
                                    cfg, star_cfg,
                                    {"nerf": ga["ref_params"]["nerf"],
                                     "poses": cand},
                                    val_data, cfg.num_frames, mesh=mesh,
                                    start_frame=1)
                            base, base_mass = _ref_eval(accepted)
                            for k in range(star_cfg.num_vehicles):
                                gk = accepted.copy()
                                gk[k] = G[k]
                                sk, mk = _ref_eval(gk)
                                ok = _gauge_accept(base, sk,
                                                   base_mass[k], mk[k],
                                                   min_vis=cfg.gauge_guard_min_vis)
                                ws.log(f"gauge_align guard: vehicle {k} "
                                       f"held-out {base:.4e} -> {sk:.4e} "
                                       f"vis {base_mass[k]:.4e} -> "
                                       f"{mk[k]:.4e} "
                                       f"({'accept' if ok else 'reject'})")
                                if ok:
                                    accepted[k] = G[k]
                                    n_acc += 1
                        else:
                            accepted, n_acc = G, star_cfg.num_vehicles
                        if n_acc == 0:
                            # no component improved the held-out view: the
                            # fit found no real drift (or a duplicate mode)
                            # — stop gauging, resume plain alternation with
                            # poses and optimizer moments untouched
                            ga.update(stage="alternate", used=0,
                                      rounds=cfg.gauge_rounds,
                                      ref_params=None, opt=None)
                            alt_phase, alt_losses = "field", []
                            ws.log("gauge_align: guard rejected every "
                                   "vehicle -> alternate (poses unchanged)")
                        else:
                            corrected = lie.se3_multiply(
                                jnp.asarray(accepted)[None],
                                jnp.asarray(params["poses"]))
                            params = dict(params, poses=corrected)
                            if mesh is not None:
                                params = meshlib.replicate_params(params, mesh)
                            # the pose jump invalidates accumulated moments
                            opt_state_field = tx_field.init(params)
                            opt_state_polish = tx_polish.init(params)
                            ga.update(stage="alternate", used=0,
                                      rounds=ga["rounds"] + 1,
                                      ref_params=None, opt=None)
                            alt_phase, alt_losses = "field", []
                            ws.log("gauge_align: applied gauge "
                                   f"t={accepted[:, :3].tolist()} "
                                   f"({n_acc}/{star_cfg.num_vehicles} "
                                   "accepted) -> alternate re-convergence")
                elif mode == "refit_anchor" and refit["stage"] == "field":
                    if refit["used"] == 0:
                        # re-anchor: FRESH canonical dynamic fields, fit from
                        # frame-0 rays only (identity pose, exact by
                        # construction) — fields trained under wrong poses
                        # place the photometric optimum at the wrong poses
                        # (the alternate mode's fixed point); frame-0 fields
                        # carry no pose-error bias (floor_diag_r3)
                        from ..models.fields import init_stacked_fields
                        key, kc, kf = jax.random.split(key, 3)
                        nerf = dict(params["nerf"])
                        nerf["dynamic_coarse"] = init_stacked_fields(
                            kc, star_cfg.dynamic_field(), star_cfg.num_vehicles)
                        if "dynamic_fine" in nerf:
                            nerf["dynamic_fine"] = init_stacked_fields(
                                kf, star_cfg.dynamic_field(fine=True),
                                star_cfg.num_vehicles)
                        params = dict(params, nerf=nerf)
                        if mesh is not None:
                            params = meshlib.replicate_params(params, mesh)
                        opt_state_refit = tx_refit.init(params)
                        ws.log("refit_anchor: dynamic fields re-initialized, "
                               "fitting from frame 0")
                    phase = "refit_field"
                    params, opt_state_refit, avg = run_phase_epoch(
                        step_fn_refit, opt_state_refit, epoch,
                        car_pose, 0.0, 0.0,
                        window=(0, max(1, min(cfg.refit_window,
                                              cfg.num_frames))))
                    refit["used"] += 1
                    if refit["used"] >= cfg.refit_epochs:
                        refit.update(stage="pose", used=0)
                elif mode == "refit_anchor":  # refit["stage"] == "pose"
                    phase = "refit_pose"
                    params, opt_state_polish, avg = run_phase_epoch(
                        step_fn_refit_pose, opt_state_polish, epoch,
                        car_pose, 0.0, 0.0)
                    refit["used"] += 1
                    if refit["used"] >= cfg.refit_pose_epochs:
                        refit.update(stage="alternate", used=0)
                        ws.log("refit_anchor: pose recovery done -> alternate")
                elif mode == "alternate":
                    if alt_phase == "field":
                        phase = "polish_field"
                        params, opt_state_field, avg = run_phase_epoch(
                            step_fn_field, opt_state_field, epoch,
                            cfg.car_sample_ratio, cfg.ghost_sample_ratio,
                            cfg.frame0_sample_ratio)
                        alt_losses.append(avg)
                        if (len(alt_losses) >= cfg.alt_field_epochs
                                or _loss_plateau(alt_losses,
                                                 cfg.alt_plateau_window,
                                                 cfg.alt_plateau_tol)):
                            alt_phase, alt_losses = "pose", []
                    else:
                        phase = "polish_pose"
                        params, opt_state_polish, avg = run_phase_epoch(
                            step_fn_polish, opt_state_polish, epoch,
                            car_pose, 0.0, 0.0)
                        alt_losses.append(avg)
                        if (len(alt_losses) >= cfg.alt_pose_epochs
                                or _loss_plateau(alt_losses,
                                                 cfg.alt_plateau_window,
                                                 cfg.alt_plateau_tol)):
                            alt_phase, alt_losses = "field", []
                            alt_rounds += 1
                            round_boundary = True
                            if (cfg.polish_mode == "gauge_align"
                                    and ga["rounds"] < cfg.gauge_rounds):
                                # another gauge round: the re-converged
                                # fields/poses define a new fixed point whose
                                # residual drift the next gauge fit measures
                                ga.update(stage="ref_field", used=0)
                            elif ms["rounds"] < cfg.multi_start_rounds:
                                # gauge rounds spent (or plain alternate):
                                # basin-hop from the completed round's optimum
                                ms["pending"] = True
                else:  # interleave (round-2 recipe)
                    joint = (polish_used % max(cfg.polish_joint_every, 1)) == 0
                    if joint:
                        phase = "polish_joint"
                        params, opt_state, avg = run_phase_epoch(
                            step_fn, opt_state, epoch,
                            cfg.car_sample_ratio, cfg.ghost_sample_ratio,
                            cfg.frame0_sample_ratio)
                    else:
                        phase = "polish_pose"
                        params, opt_state_polish, avg = run_phase_epoch(
                            step_fn_polish, opt_state_polish, epoch,
                            car_pose, 0.0, 0.0)
            else:
                pose_only = (opt_state_pose is not None and epoch > 0
                             and epoch % cfg.pose_only_every == 0)
                if pose_only:
                    phase = "pose"
                    params, opt_state_pose, avg = run_phase_epoch(
                        step_fn_pose, opt_state_pose, epoch, car_pose, 0.0, 0.0)
                else:
                    # no ghost/frame-0 anchor rays here: the curriculum
                    # admission threshold (online_thres, reference
                    # online_training_callback.py:104) is calibrated on plain
                    # photometric loss — anchor rays through un-carved static
                    # ghosts inflate the epoch average ~3x above the
                    # threshold and stall admission (measured r3). Anchors
                    # stay on in fieldform/barf (no admission there) and the
                    # post-curriculum polish field phases.
                    params, opt_state, avg = run_phase_epoch(
                        step_fn, opt_state, epoch,
                        cfg.car_sample_ratio, 0.0, 0.0)

            prev_frame = cur.current_frame
            if not cur.done and not in_fieldform and not in_barf \
                    and epoch >= cfg.precrop_iters:
                cur = advance(cur, cur_cfg, avg)
            if cur.current_frame != prev_frame:
                ws.log(f"curriculum: admitted frame {cur.current_frame - 1}")
            if cur.done and prev_frame != cur.current_frame and in_polish is False \
                    and cfg.polish_epochs > 0:
                ws.log("curriculum complete -> polish stage "
                       f"({cfg.polish_mode})")

            row = {"epoch": epoch, "phase": phase, "fine": round(avg, 6),
                   "window": cur.current_frame}
            logs = {"train/fine_loss": avg,
                    "train/current_frame_num": cur.current_frame,
                    "epoch": epoch}
            for k, v in aux_losses.items():
                logs[f"train/{k}"] = float(np.mean(np.asarray(jnp.stack(v))))

            trans_err = rot_err = None
            if has_gt and not cfg.load_gt_poses:
                trans_err, rot_err = pose_errors(params["poses"])
                row["trans"] = [round(t, 5) for t in trans_err]
                row["rot"] = [round(r, 5) for r in rot_err]
                logs.update({f"train/trans_error_{k}": v
                             for k, v in enumerate(trans_err)})
                logs.update({f"train/rot_error_{k}": v
                             for k, v in enumerate(rot_err)})

            # best-epoch selection once all frames are admitted (scores are
            # only comparable at a fixed window)
            if cur.done and sel_enabled:
                if cfg.selection == "gt_pose" and trans_err is not None:
                    score = sum(trans_err) + sum(rot_err)
                else:
                    score = selection_score(cfg, star_cfg, params, val_data,
                                            cfg.num_frames, mesh=mesh)
                row["score"] = round(score, 8)
                logs["train/selection_score"] = score
                if score < best["score"]:
                    best.update(score=score, epoch=epoch,
                                trans=trans_err, rot=rot_err,
                                params=jax.tree.map(np.asarray, params))
                if cfg.selection_boundary_only and round_boundary:
                    n_boundary += 1
                    row["boundary"] = True
                    if score < bbest["score"]:
                        bbest.update(score=score, epoch=epoch,
                                     trans=trans_err, rot=rot_err,
                                     params=jax.tree.map(np.asarray, params))
                        ws.log(f"boundary best: epoch {epoch} "
                               f"(round {alt_rounds}, score {score:.3e})")

            history.append(row)
            ws.metrics.log(logs, step)
            ws.log(f"epoch {epoch} [{phase}]: fine={avg:.6f} "
                   f"window={cur.current_frame}"
                   + (f" trans={['%.4f' % t for t in trans_err]}"
                      f" rot={['%.4f' % r for r in rot_err]}"
                      if trans_err is not None else "")
                   + (f" score={row['score']:.3e}" if "score" in row else ""))

            if (epoch + 1) % cfg.epoch_val == 0:
                _validate(ws, cfg, params, star_cfg, val_data, gt_rel, rng,
                          cur, step, mesh=mesh)
                state = {"params": params, "opt_state": opt_state,
                         "curriculum": ckpt.curriculum_to_dict(cur),
                         "epoch": epoch, "polish": _polish_state()}
                for name, st in (("opt_state_pose", opt_state_pose),
                                 ("opt_state_polish", opt_state_polish),
                                 ("opt_state_field", opt_state_field)):
                    if st is not None:
                        state[name] = st
                ckpt.save_checkpoint(ws.ckpt_dir, state, step=epoch)
                if best["params"] is not None and best["epoch"] > best_saved:
                    ckpt.save_checkpoint(ws.ckpt_dir + "_best",
                                         {"params": best["params"]},
                                         step=best["epoch"])
                    best_saved = best["epoch"]
                if bbest["params"] is not None and bbest["epoch"] > bbest_saved:
                    ckpt.save_checkpoint(ws.ckpt_dir + "_bbound",
                                         {"params": bbest["params"]},
                                         step=bbest["epoch"])
                    bbest_saved = bbest["epoch"]
                with open(os.path.join(ws.run_dir, "history.json"), "w") as f:
                    json.dump(history, f)

            if (cfg.target_pose_err > 0 and cur.done and trans_err is not None
                    and max(trans_err) < cfg.target_pose_err
                    and max(rot_err) < cfg.target_pose_err):
                stop_reason = f"pose target {cfg.target_pose_err} reached"
                break
            if (cfg.selection_patience > 0 and cur.done and in_polish
                    and sel_enabled and best["epoch"] >= 0
                    and epoch - best["epoch"] >= cfg.selection_patience):
                stop_reason = (f"selection patience (best epoch "
                               f"{best['epoch']}, score {best['score']:.3e})")
                break
            if cur.done and cfg.polish_epochs <= 0:
                stop_reason = "all frames admitted"
                break
    finally:
        prefetcher.close()

    if stop_reason:
        ws.log(f"training stopped: {stop_reason}")

    ab = _active_best()
    if ab["params"] is not None and ab["epoch"] >= 0:
        # keep the best-selected epoch if the final one is not it
        final_score = ab["score"] + 1.0
        if history and "score" in history[-1]:
            final_score = history[-1]["score"]
        if ab["score"] < final_score:
            which = ("boundary" if ab is bbest else "every-epoch")
            ws.log(f"restoring {which} best-epoch {ab['epoch']} snapshot "
                   f"(score {ab['score']:.3e}, {cfg.selection}"
                   + (f", {n_boundary} boundaries" if ab is bbest else "")
                   + ")")
            params = jax.tree.map(jnp.asarray, ab["params"])
        ckpt.save_checkpoint(ws.ckpt_dir + "_best", {"params": ab["params"]},
                             step=ab["epoch"])

    state = {"params": params, "opt_state": opt_state,
             "curriculum": ckpt.curriculum_to_dict(cur),
             "epoch": cfg.epochs_online, "polish": _polish_state()}
    for name, st in (("opt_state_pose", opt_state_pose),
                     ("opt_state_polish", opt_state_polish),
                     ("opt_state_field", opt_state_field)):
        if st is not None:
            state[name] = st
    ckpt.save_checkpoint(ws.ckpt_dir, state, step=cfg.epochs_online)
    with open(os.path.join(ws.run_dir, "history.json"), "w") as f:
        json.dump(history, f)
    return params


def _validate(ws, cfg, params, star_cfg, val_data, gt_rel, rng, cur, step,
              mesh=None):
    """Full val-view render + pose metrics (train_online__.py:488-652).

    Fixed protocol: always the first val view at the newest admitted frame —
    a deterministic gate (a random view/frame makes val PSNR too noisy to
    compare across epochs)."""
    frame = min(cur.current_frame, cfg.num_frames) - 1
    view = 0
    rays_o, rays_d = val_data.view_rays(view)
    target = val_data.images[view, frame]

    pose = loop.gather_frame_pose(params["poses"], jnp.asarray(frame), star_cfg.num_vehicles)
    out = render_image(params["nerf"], star_cfg, rays_o, rays_d, pose=pose,
                       mesh=mesh)
    p = float(psnr_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))
    s = float(ssim_fn(jnp.asarray(out["rgb"]), jnp.asarray(target)))

    logs = {"val/psnr": p, "val/ssim": s}
    if gt_rel is not None:
        est = np.asarray(params["poses"])  # [F-1, K, 7]
        trans_err, rot_err, *_ = pose_mod.get_pose_metrics_multi(est, gt_rel[1:])
        logs.update({f"val/trans_error_{k}": float(v) for k, v in enumerate(trans_err)})
        logs.update({f"val/rot_error_{k}": float(v) for k, v in enumerate(rot_err)})
        ws.log(f"val: psnr={p:.2f} ssim={s:.4f} "
               f"trans_err={[f'{t:.4f}' for t in trans_err]}")
    else:
        ws.log(f"val: psnr={p:.2f} ssim={s:.4f}")
    ws.metrics.log(logs, step)
    ws.metrics.log_image("val/rgb", out["rgb"], step)
    ws.metrics.log_image("val/rgb_static", out["rgb_static"], step)
    for k in range(star_cfg.num_vehicles):
        ws.metrics.log_image(f"val/rgb_dynamic_{k}", out["rgb_dynamic"][:, :, k], step)


# re-exported for backwards compatibility (shared protocol lives in
# apps/test_protocol.py)
_frame_metrics = frame_metrics


def test(cfg: Config):
    """Test protocol (train_online__.py:654-1005) over the vanilla STaR
    renderer — see apps/test_protocol.run_test_protocol for the shared
    implementation (pose export, RPE/ATE, masked metric suite, IoU, video)."""
    ws = Workspace(cfg, "online_test")
    star_cfg = star_config_from(cfg)
    test_data = make_dataset(cfg, "test")
    mesh = make_run_mesh(cfg, ws.log)

    rng, key = host_prng(cfg.seed)
    params = loop.init_online_params(key, star_cfg, cfg.num_frames)
    restored = ckpt.restore_checkpoint(cfg.online_ckpt_path, None)
    params = restored["params"] if "params" in restored else restored
    if mesh is not None:
        # restored leaves live on one device; eval rays are mesh-sharded
        params = meshlib.replicate_params(params, mesh)

    def render_frame(pose, rays_o, rays_d):
        return render_image(
            params["nerf"], star_cfg, rays_o, rays_d, pose=pose,
            with_test_outputs=True, mesh=mesh,
        )

    run_test_protocol(
        ws, cfg, star_cfg.num_vehicles, np.asarray(params["poses"]),
        test_data, render_frame,
    )


def main(argv=None):
    cfg = load_config(argv)
    if cfg.test:
        test(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
