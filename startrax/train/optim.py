"""Optimizers and LR schedules.

TPU-native counterpart of the reference's HybridOptim / HybridLRS
(optimizer/hybrid_optimizer.py) and get_scheduler (utils/optim.py):

- the two reference Adam optimizers (NeRF params with per-group LRs, pose
  params) become one optax.multi_transform over labeled subtrees, stepped
  atomically — exactly HybridOptim's contract,
- StepLR / MultiStepLR / CosineAnnealingLR map to optax schedules keyed by
  *epoch* (the reference steps schedulers per epoch); pass steps_per_epoch
  to convert,
- gradient accumulation (Lightning accumulate_grad_batches) is
  optax.MultiSteps; clipping is clip_by_global_norm.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import optax


def make_schedule(
    lrate: float,
    decay_rate: float = 0.5,
    decay_epochs: Optional[int] = None,
    decay_milestones: Optional[Sequence[int]] = None,
    steps_per_epoch: int = 1,
    cosine_t_max: int = 60000,
    cosine_eta_min: float = 1e-4,
):
    """Reference get_scheduler semantics (utils/optim.py:4-27):
    milestones -> MultiStepLR; decay_epochs -> StepLR; else cosine."""
    if decay_milestones:
        boundaries = {int(m) * steps_per_epoch: decay_rate for m in decay_milestones}
        return optax.piecewise_constant_schedule(lrate, boundaries)
    if decay_epochs:
        return optax.exponential_decay(
            lrate,
            transition_steps=int(decay_epochs) * steps_per_epoch,
            decay_rate=decay_rate,
            staircase=True,
        )
    return optax.cosine_decay_schedule(
        lrate, decay_steps=cosine_t_max, alpha=cosine_eta_min / max(lrate, 1e-12)
    )


def _adam(schedule):
    return optax.adam(schedule, b1=0.9, b2=0.999)


def star_param_labels(params: Dict[str, Any]):
    """Label STaR subtrees for per-group learning rates: static vs dynamic
    fields (reference train_online__.py:328-352 uses two Adam param groups)."""
    return {
        k: jax.tree.map(lambda _: "static" if k.startswith("static") else "dynamic", v)
        for k, v in params.items()
    }


def make_star_optimizer(
    params: Dict[str, Any],
    lrate_static: float,
    lrate_dynamic: float,
    lrate_pose: float,
    steps_per_epoch: int = 1,
    decay_rate: float = 0.5,
    decay_epochs: Optional[int] = None,
    decay_milestones: Optional[Sequence[int]] = None,
    pose_decay_rate: float = 0.5,
    pose_decay_epochs: Optional[int] = None,
    pose_decay_milestones: Optional[Sequence[int]] = None,
    grad_clip: Optional[float] = 1.0,
    accumulate_steps: int = 1,
):
    """One atomic optimizer over {"nerf": star_params, "poses": pose_array}.

    Matches the reference online-training optimization: NeRF Adam with
    static/dynamic LR groups + shared schedule, pose Adam with its own
    schedule, global-norm clip 1.0, grad accumulation
    (train_online__.py:328-373, 1159-1170).
    """
    nerf_sched_kw = dict(
        decay_rate=decay_rate,
        decay_epochs=decay_epochs,
        decay_milestones=decay_milestones,
        steps_per_epoch=steps_per_epoch,
    )
    tx = optax.multi_transform(
        {
            "static": _adam(make_schedule(lrate_static, **nerf_sched_kw)),
            "dynamic": _adam(make_schedule(lrate_dynamic, **nerf_sched_kw)),
            "pose": _adam(
                make_schedule(
                    lrate_pose,
                    decay_rate=pose_decay_rate,
                    decay_epochs=pose_decay_epochs,
                    decay_milestones=pose_decay_milestones,
                    steps_per_epoch=steps_per_epoch,
                )
            ),
        },
        param_labels=lambda tree: {
            "nerf": star_param_labels(tree["nerf"]),
            "poses": jax.tree.map(lambda _: "pose", tree["poses"]),
        },
    )
    chain = []
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(tx)
    tx = optax.chain(*chain)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx


def make_appinit_optimizer(
    lrate: float,
    steps_per_epoch: int = 1,
    decay_rate: float = 0.5,
    decay_epochs: Optional[int] = None,
    decay_milestones: Optional[Sequence[int]] = None,
    grad_clip: Optional[float] = None,
    accumulate_steps: int = 1,
):
    """Single-group Adam + schedule for appearance init
    (train_app_init__.py:117-125)."""
    tx = _adam(
        make_schedule(
            lrate,
            decay_rate=decay_rate,
            decay_epochs=decay_epochs,
            decay_milestones=decay_milestones,
            steps_per_epoch=steps_per_epoch,
        )
    )
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
