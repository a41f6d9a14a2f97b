"""Checkpoint / resume with orbax.

The reference's three-part contract (SURVEY §5, utils/io.py:35-53,
train_online__.py:1146-1175) is kept:

1. appearance checkpoint -> online warm start restoring ONLY the static
   field weights (the reference filters out keys containing "dynamic"),
2. full online resume: fields + poses + optimizer state + curriculum state,
3. eval artifacts: pose trajectories exported as TUM-style flat-matrix text
   with translations x100 (utils/io.py:497-519) — see save_poses_txt.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .curriculum import CurriculumState


def _abspath(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(path: str, state: Dict[str, Any], step: int) -> str:
    """Save a pytree state under path/step. Returns the checkpoint dir.

    The whole tree is fetched to host with ONE batched jax.device_get before
    orbax sees it: StandardSave otherwise enqueues a separate device->host
    transfer per leaf, each paying the tunneled backend's relay round trip
    (~0.3 s x hundreds of optimizer-state leaves = minutes per save — nearly
    half the wall-clock of an online run at epoch_val=10). Mirrors the
    restore-side PyTreeRestore fix."""
    path = _abspath(path)
    state = jax.device_get(state)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()
    return os.path.join(path, str(step))


def restore_checkpoint(path: str, template: Optional[Dict[str, Any]] = None, step: Optional[int] = None):
    """Restore a pytree saved by save_checkpoint; latest step if None.

    Uses PyTreeRestore with per-leaf RestoreArgs rather than StandardRestore:
    on tunneled TPU backends StandardRestore enqueues one host->device
    transfer per leaf, each paying the relay round-trip (~0.3s x hundreds of
    optimizer-state leaves = minutes).

    Pass `template` whenever the saved tree contains non-dict container nodes
    (optax NamedTuple states, custom pytrees): without it, orbax rebuilds the
    tree from checkpoint metadata where every container is a plain dict, so
    e.g. a restored optimizer state has no .count attribute. With a template,
    leaves are restored INTO the template's structure (and the template's
    own leaf values are ignored).
    """
    import warnings

    path = _abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        if template is not None:
            tree = template
        else:
            meta = mgr.item_metadata(step)
            tree = meta.tree if hasattr(meta, "tree") else meta
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree
        )
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # sharding-from-file notice
            if template is not None:
                return mgr.restore(
                    step,
                    args=ocp.args.PyTreeRestore(item=template, restore_args=restore_args),
                )
            return mgr.restore(step, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def checkpoint_keys(path: str, step: Optional[int] = None):
    """Top-level keys of a saved checkpoint (to build a matching restore
    template when optional entries like opt_state_pose may be absent)."""
    path = _abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        if step is None:
            step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {path}")
        meta = mgr.item_metadata(step)
        tree = meta.tree if hasattr(meta, "tree") else meta
        if tree is not None:
            return set(tree.keys())
    # some orbax versions return no item metadata for StandardSave trees;
    # the on-disk _METADATA json still records every leaf path
    meta_file = os.path.join(path, str(step), "default", "_METADATA")
    with open(meta_file) as f:
        tree_meta = json.load(f)["tree_metadata"]
    return {v["key_metadata"][0]["key"] for v in tree_meta.values()}


def restore_static_only(appearance_params, online_params):
    """Copy the static coarse/fine field weights from an appearance-init
    checkpoint into an online parameter tree, leaving dynamic fields and
    poses untouched (reference load_star_network_from_ckpt, utils/io.py:35-53
    filters state-dict keys containing "dynamic")."""
    nerf = dict(online_params["nerf"])
    for k in ("static_coarse", "static_fine"):
        if k in appearance_params:
            nerf[k] = appearance_params[k]
    out = dict(online_params)
    out["nerf"] = nerf
    return out


def gc_checkpoints(path: str, keep_last: int = 3):
    """Delete all but the newest `keep_last` checkpoint steps (the reference
    ships a manual remove_ckpts.py for this)."""
    path = _abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        steps = sorted(mgr.all_steps())
        for s in steps[:-keep_last] if keep_last > 0 else steps:
            mgr.delete(s)
        return sorted(mgr.all_steps())


def curriculum_to_dict(state: CurriculumState) -> Dict[str, Any]:
    return dataclasses.asdict(state)


def curriculum_from_dict(d: Dict[str, Any]) -> CurriculumState:
    return CurriculumState(**jax.tree.map(lambda x: x.item() if hasattr(x, "item") else x, d))


def save_poses_txt(path: str, poses_mat: np.ndarray, scale: float = 100.0):
    """Export per-frame 4x4 poses as flat 16-float rows with translations
    scaled x100 (reference save_poses_to_file, utils/io.py:497-519)."""
    poses_mat = np.asarray(poses_mat).copy()
    poses_mat[..., :3, 3] *= scale
    flat = poses_mat.reshape(poses_mat.shape[0], -1)
    with open(path, "w") as f:
        for row in flat:
            f.write(" ".join(f"{v:.6f}" for v in row) + "\n")


def load_poses_txt(path: str, scale: float = 100.0) -> np.ndarray:
    rows = np.loadtxt(path).reshape(-1, 4, 4)
    rows[..., :3, 3] /= scale
    return rows
