"""Run logging: scalar metrics to JSONL + stdout, optional wandb.

Counterpart of the reference's wandb backbone (utils/logging__.py and the
self.log calls throughout the Lightning modules). wandb is optional — in a
hermetic environment metrics land in <run_dir>/metrics.jsonl and images under
<run_dir>/images/, which is also what the tests assert against.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def configure_logger(run_dir: str, name: str = "startrax") -> logging.Logger:
    """Named logger with a FileHandler on <run_dir>/run.log.

    Loggers are process-global: a second run in the same process (train then
    test, or consecutive runs in one pytest session) reuses the name, so the
    file handler must follow the CURRENT run_dir — a stale handler would keep
    appending to the first run's file and leave the new run.log missing."""
    os.makedirs(run_dir, exist_ok=True)
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    path = os.path.abspath(os.path.join(run_dir, "run.log"))
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    have_file = False
    for h in list(logger.handlers):
        if isinstance(h, logging.FileHandler):
            if h.baseFilename == path:
                have_file = True
            else:
                logger.removeHandler(h)
                h.close()
    if not have_file:
        fh = logging.FileHandler(path)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    if not any(type(h) is logging.StreamHandler for h in logger.handlers):
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    return logger


class MetricsLogger:
    def __init__(self, run_dir: str, use_wandb: bool = False, wandb_kwargs: Optional[dict] = None):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self.path = os.path.join(run_dir, "metrics.jsonl")
        self._fp = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: int):
        row = {"step": step, "time": time.time()}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        self._fp.write(json.dumps(row) + "\n")
        self._fp.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, img: np.ndarray, step: int):
        """Save a [H, W, 3] float image under images/."""
        import imageio.v2 as imageio

        img_dir = os.path.join(self.run_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        arr = (255 * np.clip(np.nan_to_num(np.asarray(img)), 0, 1)).astype(np.uint8)
        fname = f"{name.replace('/', '_')}_{step:06d}.png"
        imageio.imwrite(os.path.join(img_dir, fname), arr)
        if self._wandb is not None:
            self._wandb.log({name: self._wandb.Image(arr)}, step=step)

    def close(self):
        self._fp.close()
