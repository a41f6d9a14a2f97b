"""Device-time attribution of the flagship online train step via an xplane
trace: runs a few traced steps, parses the xspace with jax.profiler.ProfileData
(no tensorflow needed), and prints per-op device time aggregated by HLO/kernel
name. Run on the TPU when idle.

Usage: python scripts/trace_step.py [--steps 8] [--out /tmp/startrax_trace]
"""

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--out", default="/tmp/startrax_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from startrax.models.star import StarConfig
    from startrax.train import loop, optim

    R = 1000
    cfg = StarConfig(num_vehicles=2, netdepth=8, netdepth_fine=8, netwidth=256,
                     netwidth_fine=256, n_samples=256, n_importance=256,
                     near=3.0, far=80.0, compute_dtype=jnp.bfloat16)
    params = loop.init_online_params(jax.random.PRNGKey(0), cfg, 16)
    tx = optim.make_fused_star_optimizer(
        params, lrate_static=5e-4, lrate_dynamic=5e-4, lrate_pose=5e-4,
        steps_per_epoch=100, grad_clip=1.0)
    opt_state = tx.init(params)
    loss_cfg = loop.LossConfig(lambda_alpha_entropy=1e-3,
                               lambda_dynamic_vs_static_reg=1e-3,
                               lambda_ray_reg=1e-5)
    step_fn = loop.make_online_train_step(cfg, loss_cfg, tx)

    rng = np.random.default_rng(0)
    rays_d = rng.normal(size=(R, 3)).astype(np.float32)
    rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
    batch = {"rays_o": jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32)),
             "rays_d": jnp.asarray(rays_d),
             "target": jnp.asarray(rng.uniform(size=(R, 3)).astype(np.float32)),
             "frame": jnp.asarray(3, jnp.int32)}
    key = jax.random.PRNGKey(1)
    epoch = jnp.asarray(0)

    params, opt_state, lossv, _ = step_fn(params, opt_state, batch, key, epoch)
    float(lossv)  # compile + drain

    jax.profiler.start_trace(args.out)
    for _ in range(args.steps):
        key, sub = jax.random.split(key)
        params, opt_state, lossv, _ = step_fn(params, opt_state, batch, sub, epoch)
    float(lossv)
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(os.path.join(args.out, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise SystemExit(f"no xplane under {args.out}")
    pd = jax.profiler.ProfileData.from_file(paths[-1])

    # Aggregate event durations on the device plane's op lines. Async span
    # ops (copy-start/slice-start/async-start) measure wait-until-done time
    # overlapping real compute — bucket them separately so the sync total is
    # not inflated.
    def bucket(name: str) -> str:
        head = name.split(" = ", 1)[0].lstrip("%")
        base = head.split(".")[0]
        if "custom-call" in name and "tpu_custom_call" in name:
            # pallas kernel: identify fwd/bwd + point count from the shapes
            pts = "512k" if "512000," in name else (
                "256k" if "256000," in name else "?")
            kind = "bwd" if base.startswith("transpose") else "fwd"
            return f"pallas_{kind}_{pts}"
        return base
    sync_tot, async_tot = 0.0, 0.0
    sync_ops = collections.Counter()
    async_ops = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        for line in plane.lines:
            if "xla op" not in line.name.lower():
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6  # ms
                b = bucket(ev.name)
                if ("start" in b and ("copy" in b or "slice" in b
                                      or "async" in b or "all-" in b)):
                    async_ops[b] += dur
                    async_tot += dur
                else:
                    sync_ops[b] += dur
                    sync_tot += dur
    n = args.steps
    print(f"sync device op time: {sync_tot / n:.2f} ms/step; async spans "
          f"(overlapping waits): {async_tot / n:.2f} ms/step")
    for name, dur in sync_ops.most_common(args.top):
        print(f"{dur / n:8.3f} ms  {name}")


if __name__ == "__main__":
    main()
