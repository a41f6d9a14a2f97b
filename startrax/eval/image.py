"""Image quality metrics: PSNR, SSIM, and (weight-gated) LPIPS.

Counterparts of the reference's torchmetrics usage
(train_online__.py:1055-1118): SSIM with the standard 11x11 Gaussian window
(sigma 1.5, k1=0.01, k2=0.03, data_range 1.0), optionally computed full-image
first and then mask-averaged (the reference's masked static/dynamic SSIM path
passes return_full_image=True, train_online__.py:687-707).

LPIPS requires pretrained VGG features; in a hermetic environment the weights
may be absent, so lpips() raises a clear error unless a weights file is
provided (eval-only; PSNR/SSIM carry parity checks).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def psnr(pred, target, mask=None):
    """PSNR in dB over [0,1] images; optional boolean mask over pixels."""
    err = (pred - target) ** 2
    if mask is not None:
        m = mask.astype(err.dtype)
        while m.ndim < err.ndim:
            m = m[..., None]
        v = jnp.sum(err * m) / jnp.maximum(jnp.sum(jnp.broadcast_to(m, err.shape)), 1.0)
    else:
        v = jnp.mean(err)
    return -10.0 * jnp.log(v) / jnp.log(10.0)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return jnp.asarray(np.outer(g, g), dtype=jnp.float32)


@partial(jax.jit, static_argnames=("return_full",))
def ssim(
    pred,
    target,
    return_full: bool = False,
    k1: float = 0.01,
    k2: float = 0.03,
    data_range: float = 1.0,
):
    """SSIM of [H, W, C] images in [0,1] with an 11x11 Gaussian window.

    Returns the mean SSIM, or (mean, full SSIM map [H-10, W-10, C]) when
    return_full (used for mask-averaged SSIM).
    """
    kernel = _gaussian_kernel()  # [11, 11]
    kh, kw = kernel.shape

    def filt(img):
        # depthwise valid conv: [H,W,C] -> [H-10, W-10, C]
        img4 = jnp.moveaxis(img, -1, 0)[:, None]  # [C,1,H,W]
        k4 = kernel[None, None]  # [1,1,11,11]
        out = jax.lax.conv_general_dilated(
            img4, k4, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return jnp.moveaxis(out[:, 0], 0, -1)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = filt(pred * pred) - mu_p * mu_p
    mu_tt = filt(target * target) - mu_t * mu_t
    mu_pt = filt(pred * target) - mu_p * mu_t

    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * mu_pt + c2)) / (
        (mu_p * mu_p + mu_t * mu_t + c1) * (mu_pp + mu_tt + c2)
    )
    if return_full:
        return jnp.mean(ssim_map), ssim_map
    return jnp.mean(ssim_map)


def masked_ssim(pred, target, mask):
    """Full-image SSIM averaged over a pixel mask (valid-conv crop applied to
    the mask too) — the reference's masked static/dynamic SSIM."""
    _, full = ssim(pred, target, return_full=True)
    m = jnp.asarray(mask)[5:-5, 5:-5].astype(full.dtype)
    m = jnp.broadcast_to(m[..., None], full.shape)
    return jnp.sum(full * m) / jnp.maximum(jnp.sum(m), 1.0)


class LPIPS:
    """LPIPS(VGG16) re-implemented in JAX; requires a weights .npz.

    The torchmetrics LPIPS the reference uses downloads pretrained VGG16 +
    linear-head weights; this environment has no network egress, so weights
    must be supplied (convert with scripts or supply a path). Structure:
    conv weights w0..w12 (OIHW), biases b0..b12, and per-stage linear heads
    lin0..lin4 ([C]) applied to unit-normalized feature differences.
    """

    STAGES = (1, 3, 6, 8, 11)  # conv indices closing each VGG block (0-based)

    def __init__(self, weights_path: str):
        self.w = dict(np.load(weights_path))

    def __call__(self, pred, target):
        def feats(img):
            # [H,W,3] in [0,1] -> VGG-normalized NCHW
            mean = jnp.asarray([0.485, 0.456, 0.406])
            std = jnp.asarray([0.229, 0.224, 0.225])
            x = ((img - mean) / std)[None]
            x = jnp.moveaxis(x, -1, 1)
            outs = []
            ci = 0
            for blk, n_convs in enumerate([2, 2, 3, 3, 3]):
                for i in range(n_convs):
                    w = jnp.asarray(self.w[f"w{ci}"])
                    b = jnp.asarray(self.w[f"b{ci}"])
                    x = jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
                    ) + b[None, :, None, None]
                    x = jax.nn.relu(x)
                    ci += 1
                outs.append(x)
                if blk < 4:
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                    )
            return outs

        fp, ft = feats(pred), feats(target)
        total = 0.0
        for s, (a, b) in enumerate(zip(fp, ft)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = jnp.asarray(self.w[f"lin{s}"])[None, :, None, None]
            total = total + jnp.mean(jnp.sum(d * lin, axis=1))
        return total


def lpips(pred, target, weights_path: Optional[str] = None):
    if weights_path is None:
        raise RuntimeError(
            "LPIPS needs pretrained VGG16 weights (.npz); none bundled in this "
            "hermetic environment. Pass weights_path= or skip LPIPS."
        )
    return LPIPS(weights_path)(pred, target)
