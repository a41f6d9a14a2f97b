"""Ablation profile of the flagship online train step: times variants to
attribute the per-step cost (MLP kernels vs sampling vs compositing vs
optimizer). Run on the TPU when idle."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from startrax.models.star import StarConfig, init_star, render_star, apply_star
from startrax.ops.sampling import stratified_z_vals, pts_from_z
from startrax.train import loop, optim

R = 1000
cfg = StarConfig(num_vehicles=2, netdepth=8, netdepth_fine=8, netwidth=256,
                 netwidth_fine=256, n_samples=256, n_importance=256,
                 near=3.0, far=80.0, compute_dtype=jnp.bfloat16)

rng = np.random.default_rng(0)
rays_o = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
rays_d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
target = jnp.asarray(rng.uniform(size=(R, 3)).astype(np.float32))
pose = jnp.concatenate([jnp.zeros((2, 6)), jnp.ones((2, 1))], -1)
params = init_star(jax.random.PRNGKey(0), cfg)


def timeit(name, f, *args, n=10):
    out = f(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.1f} ms", flush=True)


def loss_full(p, k):
    out = render_star(p, cfg, rays_o, rays_d, key=k, pose=pose, train=True)
    return jnp.mean((out["rgb"] - target) ** 2) + jnp.mean((out["rgb0"] - target) ** 2)


timeit("A full render grad", jax.jit(jax.grad(loss_full)), params, jax.random.PRNGKey(1))

# B: no hierarchical resample (coarse only, 256 samples)
import dataclasses
cfg_b = dataclasses.replace(cfg, n_importance=0)
params_b = {k: v for k, v in params.items() if "fine" not in k}


def loss_coarse(p, k):
    out = render_star(p, cfg_b, rays_o, rays_d, key=k, pose=pose, train=True)
    return jnp.mean((out["rgb0"] - target) ** 2)


timeit("B coarse-only grad", jax.jit(jax.grad(loss_coarse)), params_b, jax.random.PRNGKey(1))

# C: fixed z (no stratified jitter, no pdf): isolate sampling cost
def loss_fixed_z(p):
    z = stratified_z_vals(None, R, cfg.near, cfg.far, 512, perturb=0.0)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    pts = pts_from_z(rays_o, rays_d, z)
    out = apply_star(p, cfg, pts, viewdirs, z, rays_d, pose=pose, is_coarse=False)
    return jnp.mean((out["rgb"] - target) ** 2)


timeit("C fine-pass-only (512smp, no sampling) grad", jax.jit(jax.grad(loss_fixed_z)), params)

# D: full train step incl optimizer
tx = optim.make_star_optimizer(
    loop.init_online_params(jax.random.PRNGKey(0), cfg, 16),
    lrate_static=5e-4, lrate_dynamic=5e-4, lrate_pose=5e-4, grad_clip=1.0,
)
op = loop.init_online_params(jax.random.PRNGKey(0), cfg, 16)
opt_state = tx.init(op)
step_fn = loop.make_online_train_step(
    cfg, loop.LossConfig(lambda_alpha_entropy=1e-3, lambda_dynamic_vs_static_reg=1e-3,
                         lambda_ray_reg=1e-5), tx)
batch = {"rays_o": rays_o, "rays_d": rays_d, "target": target,
         "frame": jnp.asarray(3, jnp.int32)}


def full_step(op, opt_state):
    p, o, l, m = step_fn(op, opt_state, batch, jax.random.PRNGKey(2), jnp.asarray(0))
    return l


timeit("D full train step", lambda: full_step(op, opt_state))

# E: static-only appinit render grad (1 field)
def loss_static(p, k):
    out = render_star(p, cfg, rays_o, rays_d, key=k, pose=None, train=True)
    return jnp.mean((out["rgb"] - target) ** 2) + jnp.mean((out["rgb0"] - target) ** 2)


timeit("E static-only render grad", jax.jit(jax.grad(loss_static)), params, jax.random.PRNGKey(1))
