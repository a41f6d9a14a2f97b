"""Device mesh + sharding for STaR training and eval.

This is a capability the reference does not have at all (it is strictly
single-GPU, train_online__.py:1165-1166; memory is managed by sequential
chunking instead). The TPU-native design:

- a 1-D mesh over the ray axis ("rays"): ray batches are embarrassingly
  parallel, so data parallelism over rays is the natural (and sufficient)
  sharding — parameters are replicated, the batch is sharded on axis 0, and
  XLA inserts a psum over ICI for the gradient reduction,
- full-frame eval renders tile H*W rays across the same mesh,
- the vehicle axis (K dynamic fields) stays vmapped on-chip; for very large K
  it could be sharded as an expert axis, but K<=2 in all reference configs.

Works identically on a real TPU pod slice and on the 8-virtual-device CPU
mesh used by the test suite.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


RAY_AXIS = "rays"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (RAY_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(RAY_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Batch keys whose leading axis is the ray axis. Sharding is decided by KEY,
# not by a shape heuristic: a divisibility rule would silently ray-shard any
# replicated array whose leading dim happens to be divisible by the mesh size
# (e.g. a [K, ...] or [F, ...] pose/aux table on a same-sized mesh) and
# produce wrong answers at exactly the scale DP advertises.
RAY_SHARDED_KEYS = frozenset({
    "rays_o", "rays_d", "target", "target_depth", "radii", "mask",
    "frame",  # per-ray frame indices in mixed-frame batches ([N] int32);
              # scalar frames (ndim 0) are replicated below regardless
    "viewdirs", "car_mask",
})


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                extra_ray_keys=()) -> Dict[str, Any]:
    """Place a host batch on the mesh: keys in RAY_SHARDED_KEYS (plus
    extra_ray_keys) are sharded on axis 0, everything else — scalars, pose
    tables, aux arrays of any shape — is replicated."""
    ray_sh = batch_sharding(mesh)
    rep = replicated(mesh)
    ray_keys = RAY_SHARDED_KEYS | frozenset(extra_ray_keys)

    def place(key, x):
        x = jax.numpy.asarray(x)
        if key in ray_keys and x.ndim >= 1:
            if x.shape[0] % mesh.size != 0:
                raise ValueError(
                    f"batch[{key!r}] leading dim {x.shape[0]} not divisible "
                    f"by mesh size {mesh.size} (pad with "
                    f"pad_rays_to_multiple)")
            return jax.device_put(x, ray_sh)
        return jax.device_put(x, rep)

    return {k: place(k, v) for k, v in batch.items()}


def replicate_params(params, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), params)


def pad_rays_to_multiple(n_rays: int, n_devices: int, tile: int = 8) -> int:
    """Smallest ray count >= n_rays divisible by n_devices * tile (keeps
    per-device shards aligned to f32 sublane tiling)."""
    m = n_devices * tile
    return ((n_rays + m - 1) // m) * m
