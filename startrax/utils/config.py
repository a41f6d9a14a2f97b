"""Config system: one flat typed namespace of experiment flags.

Counterpart of the reference configargparse setup (utils/io.py:56-484, ~80
flags; 15 config files under configs/). Reads the same `key = value` .txt
format the reference ships, so its experiment files port verbatim, plus CLI
`--key value` overrides. Snapshot-to-disk is kept (copy_config_save_args).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
from typing import List, Optional


@dataclasses.dataclass
class Config:
    # run identity / paths
    job_id: str = ""
    config: str = ""
    expname: str = "exp"
    test: bool = False
    basedir: str = "./logs"
    datadir: str = ""
    code_dir: str = ""

    # workload
    num_frames: int = 16
    num_vehicles: int = 1
    has_depth_data: bool = False
    epochs: int = 100
    epochs_appearance: int = 800
    epochs_online: int = 10000

    # model
    netdepth: int = 8
    netwidth: int = 256
    netdepth_fine: int = 8
    netwidth_fine: int = 256
    use_viewdirs: bool = True
    # 0 = positional encoding, -1 = identity (no encoding) — reference
    # get_embedder semantics (models/embedder.py:38-54)
    i_embed: int = 0
    multires: int = 10
    multires_views: int = 4
    raw_noise_std: float = 0.0
    end_barf: int = -1
    # Sum pre-activation raw densities before softplus in the STaR joint
    # alpha, reproducing the reference exactly (rendering__.py:416-418);
    # default False = post-softplus density sum (see ops/compositing.py)
    reference_numerics: bool = False
    # stratified (sorted) importance-sample u's + bitonic-merge z-union;
    # false = the reference's iid uniforms + full sort (rendering__.py:738)
    stratified_fine: bool = True
    # field-MLP dispatch: true = fused Pallas kernel, false = plain-XLA
    # path (escape hatch when Mosaic remote compiles are degraded/wedged);
    # unset = auto (fused on TPU, XLA elsewhere)
    use_fused: Optional[bool] = None

    # sampling / rendering
    N_rand: int = 1000
    N_samples: int = 256
    N_importance: int = 256
    perturb: float = 1.0
    near: float = 3.0
    far: float = 80.0
    far_dist: float = 1e10
    white_bkgd: bool = False
    lindisp: bool = False
    no_ndc: bool = True

    # optimization
    lrate: float = 5e-4
    lrate_static: float = 5e-4
    lrate_dynamic: float = 5e-4
    lrate_pose: float = 5e-4
    accumulate_grad_batches: int = 1
    lrate_decay: Optional[int] = None
    lrate_decay_rate: float = 0.5
    lrate_decay_steps: Optional[List[int]] = None
    pose_lrate_decay: Optional[int] = None
    pose_lrate_decay_rate: float = 0.5
    pose_lrate_decay_steps: Optional[List[int]] = None
    mixed_precision: bool = False

    # chunking (kept for config compat; the TPU path renders full batches
    # under jit and tiles eval frames — see eval/render.py)
    chunk: int = 8192
    netchunk: int = 16384

    # ray-axis data parallelism (parallel/mesh.py; a capability the
    # strictly-single-GPU reference lacks, train_online__.py:1165-1166):
    # "auto" = shard over all visible devices when >1, "off" = single-device,
    # "on" = require a multi-device mesh (error if only one device)
    data_parallel: str = "auto"

    # checkpoints
    ckpt_path: str = ""
    skip_appearance_init: bool = False
    appearance_ckpt_path: str = ""
    online_ckpt_path: str = ""

    # online training
    car_sample_ratio: float = 0.0
    load_gt_poses: bool = False
    noisy_pose_init: bool = True
    pose_trans_only: bool = False  # star_trans variant: translation-only poses
    # every N epochs run one pose-only epoch (fields frozen) — breaks the
    # field/pose co-adaptation plateau; 0 disables (see STATUS.md)
    pose_only_every: int = 0
    # minimum epochs between frame admissions after the initial window (the
    # reference hardcodes 70, callbacks/online_training_callback.py:134-140)
    epochs_between_frames: int = 70
    # admission threshold after the first advance (the reference hardcodes
    # 95e-5, callbacks/online_training_callback.py:121)
    online_thres_tightened: float = 95e-5
    # run seed (reference seed_everything(42|1453), train_online__.py:1229);
    # data-sampler/prefetcher streams derive from it, so different seeds give
    # different ray streams
    seed: int = 1453

    # --- pose recipe (validated in scripts/synthetic_e2e.py, promoted to the
    # online app; see STATUS.md "Pose convergence work") ---
    # freeze ALL pose updates for the first N epochs so the dynamic fields
    # form before poses see gradients
    pose_delay_epochs: int = 0
    # rotations frozen while the BARF-warmup (end_barf) dynamic field is
    # still coarse (a blurred field is nearly rotation-symmetric, so rotation
    # gradients are noise)
    barf_freeze_rot: bool = True
    # car-ray fraction during pose-only epochs (-1 = car_sample_ratio)
    car_sample_ratio_pose: float = -1.0
    # fraction of rays drawn through vehicle pixels of a DIFFERENT frame than
    # the one being rendered — supervises the background where a vehicle
    # was/will be, carving frame-0 vehicle ghosts out of the static field
    # (the appearance init bakes them in; an uncarved ghost leaves the
    # dynamic field's position under-constrained — a gauge drift)
    ghost_sample_ratio: float = 0.0
    # fraction of rays pinned to frame 0, whose pose is identity by
    # construction — anchors the dynamic fields' canonical frame during
    # field-refit phases (gauge fix that needs no ground truth)
    frame0_sample_ratio: float = 0.0

    # --- post-curriculum polish stage ---
    # refinement epochs after the curriculum completes; 0 = stop at
    # curriculum completion (the reference behavior, train_online__.py)
    polish_epochs: int = 0
    # "alternate": block-coordinate descent — fields-only to plateau, then
    # poses-only to plateau, repeated. "interleave": pose-only epochs with 1
    # joint refresh per polish_joint_every (round-2 recipe). "refit_anchor":
    # re-initialize the dynamic fields and re-fit them from FRAME-0 rays only
    # (identity pose — exact by construction, so the canonical fields carry
    # zero pose-error bias), then run poses-only against the frozen fields
    # (the regime measured to contract 100x in artifacts/floor_diag_r3.json),
    # then fall through to "alternate". GT-free: breaks the alternate mode's
    # fixed point where fields absorb the pose error and the photometric
    # optimum sits at the wrong poses.
    polish_mode: str = "alternate"
    # refit_anchor stage lengths: dynamic re-fit epochs at frame 0, then
    # pose-only epochs against the frozen re-anchored fields
    refit_epochs: int = 12
    refit_pose_epochs: int = 20
    # frames used for the re-fit: 1 = frame 0 only (zero pose bias, but the
    # vehicle is seen from one time instant — rotations under-constrained);
    # k > 1 adds frames 1..k-1 at their current pose estimates (bounded bias,
    # much better viewpoint coverage)
    refit_window: int = 1
    # freeze rotations during the refit pose stage (translations only) —
    # guards against rotation runaway when the refit window leaves vehicle
    # appearance under-constrained from unseen viewpoints
    refit_pose_freeze_rot: bool = False
    polish_joint_every: int = 4
    # pose-LR decay inside the polish stage (fresh optimizer moments)
    polish_pose_lrate_decay: int = 12
    polish_pose_lrate_decay_rate: float = 0.8
    # alternation phase caps + loss-plateau detection
    alt_field_epochs: int = 16
    alt_pose_epochs: int = 6
    alt_plateau_window: int = 2
    alt_plateau_tol: float = 0.03
    # "gauge_align" polish: the pose residual at the alternation fixed point
    # is ~94% a constant per-vehicle canonical-frame drift that the trained
    # fields absorbed (artifacts/crossview_diag.json) — invisible to any
    # descent against those fields. Each round: (1) fit FRESH reference
    # dynamic fields from frame-0 rays on a scratch copy (refit_epochs;
    # identity pose is exact by construction so they carry zero drift),
    # (2) fit one shared per-vehicle SE(3) gauge G over frames 1..F-1 against
    # them (gauge_epochs; 6 DOF per vehicle collapses the one-time-instant
    # rotation under-constraint that broke refit_anchor), (3) correct poses
    # <- G ∘ p_f on the PRODUCTION params and re-converge via the alternate
    # machinery with fresh optimizer moments. Repeats up to gauge_rounds.
    gauge_rounds: int = 1
    gauge_epochs: int = 2
    # gauge estimator: "ref_field" fits the gauge over frames 1+ against
    # fresh frame-0 reference fields (the r3 machinery; its photometric AND
    # depth landscapes against the blurry one-frame fields measured flat —
    # guard rejected in both the r3-gauge2 and r4-depth runs). "frame0" fits
    # the gauge on FRAME-0 rays against the PRODUCTION fields — the direction
    # the measured landscape actually slopes along
    # (artifacts/depth_landscape_r4.json probe A: depth decreases toward the
    # true drift while frame-0 photometric is pinned) — and applies the
    # INVERSE as the correction (the fitted g places the drifted canonical
    # field at frame-0 truth, so g^-1 ∘ est approaches GT). No reference
    # fields, no guard (the held-out guard needs drift-free fields; the
    # best-epoch selection criterion is the safety net instead).
    gauge_mode: str = "ref_field"
    # translation-only gauge fit: the r3 gauge run (artifacts/
    # e2e_r3_gauge_history.json epoch 36) showed the full-SE(3) shared fit
    # can still jump to a duplicate photometric mode (v2 trans 0.068 -> 0.40,
    # rot 0.068 -> 0.46); restricting G to translation removes the rotation
    # mode family
    gauge_freeze_rot: bool = True
    # per-vehicle acceptance guard: apply a vehicle's gauge component only if
    # it strictly improves the held-out-val-view photometric error against
    # the reference fields (GT-free); a rejected fit ends the gauge rounds
    gauge_guard: bool = True
    # guard visibility floor: a candidate correction must keep at least this
    # fraction of the vehicle's held-out opacity mass (rejects
    # accept-by-vanishing fits — see apps/online._gauge_accept). Scenes with
    # legitimately small or heavily occluded vehicles may need this lower.
    gauge_guard_min_vis: float = 0.3
    # weight of the DS-NeRF depth term in the gauge FIT loss and the gauge
    # guard's held-out criterion (0 = photometric only). Depth is the side
    # information that makes the canonical-frame drift observable: the
    # held-out PHOTOMETRIC landscape along the drift direction is flat
    # (artifacts/gauge_landscape.json), metric depth is not.
    gauge_depth_lambda: float = 0.0
    # sanity bound on the APPLIED frame-0 gauge correction (ADVICE r4): the
    # frame0 estimator has no held-out reference-field guard, so a diverged
    # 2-epoch fit could jump the entire pose table and reset both optimizer
    # states with only best-epoch selection as the backstop. Per-vehicle: a
    # fitted correction with |t| above this cap (or rotation angle above
    # gauge_max_rot radians) is rejected and that vehicle keeps its poses.
    # Scale: the measured canonical drift is ~0.05-0.08 scene units
    # (artifacts/e2e_r4_depth_summary.json); 0.2 rejects only divergence.
    gauge_max_trans: float = 0.2
    gauge_max_rot: float = 0.5

    # --- photometric multi-start (basin hopping over pose perturbations) ---
    # After an alternation round completes (and any gauge rounds are spent),
    # perturb the pose table with per-vehicle constant translations of scale
    # multi_start_scale (the measured drift structure: ~94% a constant
    # per-vehicle offset, artifacts/crossview_diag.json), give each candidate
    # multi_start_epochs of pose-only polish, score every candidate with the
    # GT-free selection criterion, and adopt the best strictly-improving one.
    # 0 rounds = off (default). Restarts (not resumes) on checkpoint resume.
    multi_start_rounds: int = 0
    multi_start_candidates: int = 4
    multi_start_epochs: int = 2
    multi_start_scale: float = 0.05

    # --- best-epoch selection (GT-free by default) ---
    # "photometric": held-out-val-view MSE over all admitted frames (usable
    # on real data); "photometric_depth": adds selection_depth_lambda * the
    # DS-NeRF relative-squared depth error (needs dataset depth maps) —
    # sensitive along the canonical-drift direction where plain photometric
    # selection is flat; "gt_pose": GT pose error (synthetic benchmarks
    # only); "none": keep the final epoch
    selection: str = "photometric"
    selection_depth_lambda: float = 1.0
    # Score-at-round-boundaries protocol (r5, VERDICT r4 item 4): the
    # every-epoch criterion conflates post-adoption field re-convergence
    # with pose quality — right after a multi-start adoption or gauge
    # correction the fields have not re-converged, so a better-posed state
    # can transiently score worse. With this flag the run still scores every
    # epoch, but the final pick prefers the best ALTERNATION-ROUND-BOUNDARY
    # epoch (the settled state after each field+pose round) whenever the run
    # produced >= 2 boundary candidates, falling back to the every-epoch
    # best otherwise (a single boundary can sit on a catastrophic state —
    # e2e_r3_gauge's one boundary is the duplicate-mode jump, rot 0.31).
    # Validated offline on six committed histories: mean rot gap to the GT
    # oracle 0.0057 -> 0.0028, flagship r4 history 0.0289 -> 0.0134
    # (artifacts/selection_rejudge_r5.json, scripts/selection_rejudge.py).
    selection_boundary_only: bool = False
    # selection/guard cost controls at production scale (each post-curriculum
    # epoch renders the held-out view at every scored frame): score at most
    # this many frames (evenly strided over the window; 0 = all frames) at
    # this pixel stride (1 = full resolution)
    selection_frames: int = 0
    selection_stride: int = 1
    # end the polish stage after N epochs without a new best score; 0 = off
    selection_patience: int = 40
    # wall-clock training budget in minutes (0 = epochs_online only)
    train_minutes: float = 0.0
    # stop once every vehicle's trans AND rot error is below this
    # (requires dataset GT poses — synthetic benchmarks only; 0 = off)
    target_pose_err: float = 0.0
    # sample each ray's frame independently from the curriculum window so
    # every frame's pose gets gradient every step (new capability; the
    # reference samples one frame per batch, carla_star_online__.py:287)
    mixed_frames: bool = False
    appearance_init_thres: float = 9e-4
    online_thres: float = 1e-3
    initial_num_frames: int = 5
    # Accepted for config-file compatibility but deliberately inert, matching
    # the reference: its only use is commented out (train_online_mip.py:122).
    # Use lambda_alpha_entropy for an active entropy regularizer.
    entropy_weight: float = 0.0

    # regularizers
    lambda_alpha_entropy: float = 0.0
    lambda_dynamic_vs_static_reg: float = 0.0
    lambda_ray_reg: float = 0.0
    lambda_static_reg: float = 0.0
    lambda_dynamic_reg: float = 0.0
    epoch_start_dynamic_reg: int = 0

    # depth supervision
    depth_loss: bool = False
    depth_lambda: float = 0.0
    sigma_loss: bool = False
    sigma_lambda: float = 0.0

    # dataset
    dataset_type: str = "carla"
    testskip: int = 8
    # host-side prefetch workers (reference DataLoader(num_workers=4),
    # train_online__.py:1064); drives data/prefetch.BatchPrefetcher
    num_workers: int = 2
    # synthetic dataset geometry (dataset_type = "synthetic"; the analytic
    # benchmark scene — data/synthetic.py)
    synth_height: int = 64
    synth_views: int = 8
    # extra held-out views exposed as the val/test split (never sampled in
    # training; the photometric selection criterion renders these)
    synth_val_views: int = 1
    synth_cache_dir: str = ""
    scale_factor: float = -1.0
    half_res: bool = False
    factor: int = 8
    precrop_iters: int = -1
    precrop_frac: float = 0.5

    # mip (IPE) variant encoding (reference models/mipnerf.py:58-70)
    num_freqs_pos: int = 24
    num_freqs_dir: int = 4
    mip_base_radius: float = 0.0005

    # occupancy grid (nerfacc-equivalent path)
    grid_resolution: int = 128
    grid_nlvl: int = 1
    render_step_size: float = 5e-3
    target_sample_batch_size: int = 1 << 16

    # eval
    bbox_view: int = 0
    has_bbox: bool = False
    eval_last_frame: int = 0
    save_video_frames: bool = False
    render_test: bool = False
    # LPIPS needs pretrained VGG16 weights (.npz; see
    # scripts/convert_lpips_weights.py) — empty disables LPIPS metrics
    lpips_weights: str = ""

    # logging cadence
    epoch_ckpt: int = 1
    epoch_print: int = 1
    epoch_val: int = 1

    # steps per pseudo-epoch (reference hardcodes 1000; configurable here,
    # mainly so tests can shrink it)
    steps_per_epoch: int = 1000


_FIELDS = {f.name: f for f in dataclasses.fields(Config)}


def _parse_value(name: str, raw: str):
    f = _FIELDS[name]
    raw = raw.strip()
    base = f.type
    if raw.lower() in ("true", "false"):
        return raw.lower() == "true"
    if raw.startswith("["):
        return [int(x) for x in raw.strip("[]").split(",") if x.strip()]
    if base in (int, "int"):
        return int(float(raw))
    if base in (float, "float"):
        return float(raw)
    if base in (bool, "bool"):
        return raw.lower() in ("1", "true", "yes")
    if "List" in str(base):
        return [int(x) for x in raw.replace(",", " ").split()]
    if "int" in str(base) and "Optional" in str(base):
        return int(float(raw))
    return raw


def parse_config_file(path: str) -> dict:
    """Parse the reference's `key = value` txt format (comments with #)."""
    out = {}
    with open(path) as fp:
        for line in fp:
            line = line.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            key, val = line.split("=", 1)
            key = key.strip()
            if key in _FIELDS:
                out[key] = _parse_value(key, val)
    return out


def load_config(argv: Optional[List[str]] = None) -> Config:
    """--config file + --key value CLI overrides -> Config."""
    argv = list(sys.argv[1:] if argv is None else argv)
    overrides = {}
    i = 0
    cfg_path = None
    while i < len(argv):
        a = argv[i]
        if not a.startswith("--"):
            i += 1
            continue
        key = a[2:]
        val = "true"
        if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
            val = argv[i + 1]
            i += 1
        if key == "config":
            cfg_path = val
        elif key in _FIELDS:
            overrides[key] = _parse_value(key, val)
        else:
            raise ValueError(f"unknown flag --{key}")
        i += 1

    values = {}
    if cfg_path:
        values.update(parse_config_file(cfg_path))
        values["config"] = cfg_path
    values.update(overrides)
    return Config(**values)


def save_config(cfg: Config, run_dir: str):
    """Snapshot the resolved config into the run directory
    (reference copy_config_save_args, utils/io.py:23-32)."""
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "args.json"), "w") as fp:
        json.dump(dataclasses.asdict(cfg), fp, indent=2, default=str)


def star_config_from(cfg: Config):
    """Map the flat flags onto a models.star.StarConfig."""
    import jax.numpy as jnp

    from ..models.star import StarConfig

    scale = cfg.scale_factor if cfg.scale_factor > 0 else 1.0
    if cfg.i_embed not in (0, -1):
        raise ValueError(f"i_embed must be 0 (PE) or -1 (identity), got {cfg.i_embed}")
    identity_embed = cfg.i_embed == -1  # reference models/embedder.py:38-54
    return StarConfig(
        num_vehicles=cfg.num_vehicles,
        netdepth=cfg.netdepth,
        netdepth_fine=cfg.netdepth_fine,
        netwidth=cfg.netwidth,
        netwidth_fine=cfg.netwidth_fine,
        multires=0 if identity_embed else cfg.multires,
        multires_views=0 if identity_embed else cfg.multires_views,
        n_samples=cfg.N_samples,
        n_importance=cfg.N_importance,
        near=cfg.near * scale,
        far=cfg.far * scale,
        far_dist=cfg.far_dist,
        raw_noise_std=cfg.raw_noise_std,
        white_bkgd=cfg.white_bkgd,
        lindisp=cfg.lindisp,
        perturb=cfg.perturb,
        end_barf=cfg.end_barf,
        compute_dtype=jnp.bfloat16 if cfg.mixed_precision else jnp.float32,
        reference_numerics=cfg.reference_numerics,
        stratified_fine=cfg.stratified_fine,
        use_fused=cfg.use_fused,
    )


def loss_config_from(cfg: Config):
    from ..train.loop import LossConfig

    return LossConfig(
        lambda_alpha_entropy=cfg.lambda_alpha_entropy,
        lambda_dynamic_vs_static_reg=cfg.lambda_dynamic_vs_static_reg,
        lambda_ray_reg=cfg.lambda_ray_reg,
        lambda_static_reg=cfg.lambda_static_reg,
        lambda_dynamic_reg=cfg.lambda_dynamic_reg,
        epoch_start_dynamic_reg=cfg.epoch_start_dynamic_reg,
        use_depth_loss=cfg.depth_loss,
        depth_lambda=cfg.depth_lambda or 0.0,
        use_sigma_loss=cfg.sigma_loss,
        sigma_lambda=cfg.sigma_lambda or 0.0,
    )
