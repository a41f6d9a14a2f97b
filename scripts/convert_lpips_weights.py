"""Convert torchvision VGG16 + lpips linear-head weights to the .npz format
eval/image.LPIPS expects.

Run in an environment with network access (this repo's hermetic environment
has none — LPIPS stays weight-gated there):

    python scripts/convert_lpips_weights.py --out lpips_vgg.npz

Keys produced: w0..w12 / b0..b12 (the 13 VGG16 conv layers, OIHW) and
lin0..lin4 (per-stage channel weights). If the lpips package is unavailable,
the linear heads default to uniform 1/C (a reasonable proxy; correlations
with human judgments are slightly weaker than the trained heads).
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    out = {}
    ci = 0
    for layer in vgg:
        if layer.__class__.__name__ == "Conv2d":
            out[f"w{ci}"] = layer.weight.detach().numpy()
            out[f"b{ci}"] = layer.bias.detach().numpy()
            ci += 1
    assert ci == 13, ci

    stage_channels = [64, 128, 256, 512, 512]
    try:
        import lpips as lpips_pkg

        net = lpips_pkg.LPIPS(net="vgg")
        for i, lin in enumerate(net.lins):
            out[f"lin{i}"] = lin.model[1].weight.detach().numpy().reshape(-1)
    except Exception:
        for i, c in enumerate(stage_channels):
            out[f"lin{i}"] = np.full((c,), 1.0 / c, np.float32)

    np.savez(args.out, **out)
    print(f"wrote {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
