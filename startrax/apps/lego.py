"""Vanilla NeRF on the Blender lego scene (appearance-init path, no poses).

Counterpart of the reference train_app_init_lego.py (whose imports are stale
in-tree; the capability is first-class here). Same trainer as app_init with
dataset_type=blender and white background.

Usage: python -m startrax.apps.lego --config startrax/configs/lego.txt
"""

from __future__ import annotations

from ..utils.config import load_config
from . import app_init


def main(argv=None):
    cfg = load_config(argv)
    cfg.dataset_type = "blender"
    app_init.train(cfg)


if __name__ == "__main__":
    main()
