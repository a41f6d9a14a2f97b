"""Runtime correctness diagnostics.

Counterpart of the reference's CheckBatchGradient callback
(callbacks/check_batch_grad.py:7-51): before training starts, backprop one
ray's output and assert every other ray's inputs receive zero gradient —
catching any cross-batch mixing (a bug class the chunked reference
implementation was prone to). Also usable for the sigma-loss path.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def check_batch_gradient_isolation(
    render_fn: Callable,
    batch: Dict,
    output_key: str = "rgb",
    ray_index: int = 0,
    atol: float = 0.0,
) -> None:
    """Raise if rays other than `ray_index` receive input gradients.

    render_fn(rays_o, rays_d) -> result dict with per-ray outputs.
    Deterministic sampling (no per-ray shared randomness) is assumed — call
    with an eval-mode renderer.
    """

    def one_ray(rays_o):
        out = render_fn(rays_o, batch["rays_d"])
        return jnp.sum(out[output_key][ray_index])

    g = np.asarray(jax.grad(one_ray)(batch["rays_o"]))
    others = np.delete(g, ray_index, axis=0)
    if np.abs(others).max() > atol:
        bad = int(np.argmax(np.abs(others).sum(axis=-1)))
        raise AssertionError(
            f"batch gradient mixing: ray {bad} has nonzero input gradient "
            f"(max |g| = {np.abs(others).max():.3e}) when only ray "
            f"{ray_index}'s output was differentiated"
        )
    if np.abs(g[ray_index]).max() == 0.0:
        raise AssertionError("selected ray received no gradient — check the graph")


def check_sigma_loss_isolation(
    render_fn: Callable, batch: Dict, ray_index: int = 0
) -> None:
    """Same check through the sigma-loss path (reference
    check_batch_grad.py:35-51)."""
    from ..ops.losses import sigma_loss_per_ray

    def one_ray(rays_o):
        out = render_fn(rays_o, batch["rays_d"])
        per_ray = sigma_loss_per_ray(
            out["weights"], out["z_vals"], out["dists"], batch["target_depth"]
        )
        return per_ray[ray_index]

    g = np.asarray(jax.grad(one_ray)(batch["rays_o"]))
    others = np.delete(g, ray_index, axis=0)
    if np.abs(others).max() > 0.0:
        raise AssertionError("sigma-loss gradient mixing across rays")
