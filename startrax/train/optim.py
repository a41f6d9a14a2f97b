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

from typing import Any, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


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
    # MultiSteps advances inner schedules once per *effective* (accumulated)
    # step; scale the per-epoch boundary accordingly so epoch-based LR decay
    # fires at the same wall-clock epoch as the reference.
    sched_steps = max(steps_per_epoch // max(accumulate_steps, 1), 1)
    nerf_sched_kw = dict(
        decay_rate=decay_rate,
        decay_epochs=decay_epochs,
        decay_milestones=decay_milestones,
        steps_per_epoch=sched_steps,
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
                    steps_per_epoch=sched_steps,
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


class _FusedAdamState(NamedTuple):
    count: jnp.ndarray
    m: jnp.ndarray
    v: jnp.ndarray


def fused_group_adam(
    params,
    group_schedules,
    group_of_leaf,
    grad_clip: Optional[float] = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam over ONE flattened parameter vector with per-element group LRs.

    A pytree of ~100 leaves costs ~100 x (per-leaf HLO overhead) per Adam
    update on TPU (~14 ms/step for the STaR model via optax.multi_transform);
    flattening to a single vector makes the whole update a handful of fused
    vector ops. Per-group learning rates/schedules become an elementwise LR
    vector; global-norm clipping is one reduction.

    group_schedules: list of optax schedules, one per group id.
    group_of_leaf: fn(path-free leaf index -> group id) applied to the
    flattened layout via a template — callers use star_group_vector().
    """
    flat0, unravel = ravel_pytree(params)
    group_vec = group_of_leaf  # precomputed int vector aligned with flat0
    assert group_vec.shape == flat0.shape

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        return _FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(flat),
            v=jnp.zeros_like(flat),
        )

    def update_fn(grads, state, params=None):
        g, _ = ravel_pytree(grads)
        if grad_clip is not None:
            gnorm = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
        count = state.count + 1
        m = b1 * state.m + (1 - b1) * g
        v = b2 * state.v + (1 - b2) * g * g
        mhat = m / (1 - b1 ** count.astype(jnp.float32))
        vhat = v / (1 - b2 ** count.astype(jnp.float32))
        lr = jnp.zeros_like(g)
        for gid, sched in enumerate(group_schedules):
            lr = jnp.where(group_vec == gid, sched(state.count), lr)
        updates_vec = -lr * mhat / (jnp.sqrt(vhat) + eps)
        return unravel(updates_vec), _FusedAdamState(count=count, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)


def star_group_vector(params) -> jnp.ndarray:
    """Flattened group ids for {"nerf": ..., "poses": ...}: 0=static field,
    1=dynamic field, 2=pose — aligned with ravel_pytree's layout."""
    labels = {
        "nerf": {
            k: jax.tree.map(
                lambda x, k=k: jnp.full(x.shape, 0 if k.startswith("static") else 1, jnp.int32),
                v,
            )
            for k, v in params["nerf"].items()
        },
        "poses": jnp.full(params["poses"].shape, 2, jnp.int32),
    }
    vec, _ = ravel_pytree(labels)
    return vec


def make_fused_star_optimizer(
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
    """Drop-in fast variant of make_star_optimizer (same semantics)."""
    sched_steps = max(steps_per_epoch // max(accumulate_steps, 1), 1)
    kw = dict(decay_rate=decay_rate, decay_epochs=decay_epochs,
              decay_milestones=decay_milestones, steps_per_epoch=sched_steps)
    scheds = [
        make_schedule(lrate_static, **kw),
        make_schedule(lrate_dynamic, **kw),
        make_schedule(
            lrate_pose, decay_rate=pose_decay_rate, decay_epochs=pose_decay_epochs,
            decay_milestones=pose_decay_milestones, steps_per_epoch=sched_steps,
        ),
    ]
    tx = fused_group_adam(params, scheds, star_group_vector(params), grad_clip=grad_clip)
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
    params: Optional[Dict[str, Any]] = None,
):
    """Single-group Adam + schedule for appearance init
    (train_app_init__.py:117-125). Pass `params` to get the fused
    single-vector implementation (identical updates, ~3x faster on TPU)."""
    sched_steps = max(steps_per_epoch // max(accumulate_steps, 1), 1)
    sched = make_schedule(
        lrate,
        decay_rate=decay_rate,
        decay_epochs=decay_epochs,
        decay_milestones=decay_milestones,
        steps_per_epoch=sched_steps,
    )
    if params is not None:
        flat, _ = ravel_pytree(params)
        tx = fused_group_adam(
            params, [sched], jnp.zeros(flat.shape, jnp.int32), grad_clip=grad_clip
        )
    else:
        tx = _adam(sched)
        if grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    if accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
    return tx
