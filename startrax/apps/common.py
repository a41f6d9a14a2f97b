"""Shared app scaffolding: run workspace, dataset construction, epoch loop
helpers used by the training entry points."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..utils.config import Config, save_config
from ..utils.logging import MetricsLogger, configure_logger


class Workspace:
    """Run directory + loggers + checkpoint path (the role Lightning's
    Trainer/WandbLogger/ModelCheckpoint trio plays in the reference)."""

    def __init__(self, cfg: Config, app_name: str):
        self.cfg = cfg
        self.run_dir = os.path.join(cfg.basedir, cfg.expname, app_name)
        os.makedirs(self.run_dir, exist_ok=True)
        save_config(cfg, self.run_dir)
        self.logger = configure_logger(self.run_dir, app_name)
        self.metrics = MetricsLogger(self.run_dir)
        self.ckpt_dir = os.path.join(self.run_dir, "ckpts")

    def log(self, msg: str):
        self.logger.info(msg)


def make_dataset(cfg: Config, split: str):
    """Dataset factory over dataset_type (carla / blender / synthetic)."""
    if cfg.dataset_type == "carla":
        from ..data.carla import CarlaConfig, CarlaScene

        ccfg = CarlaConfig(
            datadir=cfg.datadir,
            num_frames=cfg.num_frames,
            num_vehicles=cfg.num_vehicles,
            has_depth_data=cfg.has_depth_data,
            scale_factor=cfg.scale_factor,
            near=cfg.near,
            far=cfg.far,
            eval_last_frame=cfg.eval_last_frame,
        )
        return CarlaScene(ccfg, split)
    if cfg.dataset_type == "blender":
        from ..data.blender import BlenderScene

        return BlenderScene(
            cfg.datadir, split=split, half_res=cfg.half_res,
            testskip=cfg.testskip, white_bkgd=cfg.white_bkgd,
            near=cfg.near, far=cfg.far,
        )
    if cfg.dataset_type == "synthetic":
        from ..data.synthetic import SyntheticAdapter, SyntheticScene

        scene = SyntheticScene(
            num_vehicles=cfg.num_vehicles, num_frames=cfg.num_frames,
            H=cfg.synth_height, W=cfg.synth_height,
            focal=float(cfg.synth_height),
        )
        return SyntheticAdapter(
            scene, num_views=cfg.synth_views,
            num_val_views=cfg.synth_val_views,
            cache_dir=cfg.synth_cache_dir,
            split="train" if split == "train" else "val",
        )
    raise ValueError(f"unknown dataset_type {cfg.dataset_type}")


def host_prng(seed: int = 42):
    return np.random.default_rng(seed), jax.random.PRNGKey(seed)
