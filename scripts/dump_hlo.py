"""Dump the compiled (post-optimization) HLO of the flagship online train
step and summarize the expensive non-kernel instructions (copy / pad / slice
fusions) with their shapes, to attribute the XLA-glue milliseconds seen in
trace_step.py. CPU-safe: compiles on whatever backend is active.

Usage: python scripts/dump_hlo.py [--out /tmp/step_hlo.txt]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/step_hlo.txt")
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

    lowered = jax.jit(step_fn).lower(params, opt_state, batch, key, epoch)
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB of HLO to {args.out}")

    # Summaries: copies and pads with shapes, largest first by element count.
    def shape_elems(shape: str) -> int:
        m = re.match(r"\w+\[([\d,]*)\]", shape)
        if not m or not m.group(1):
            return 1
        n = 1
        for d in m.group(1).split(","):
            n *= int(d)
        return n

    rows = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?([\w.\-]+) = (\S+) (copy|pad|slice|transpose|"
                     r"bitcast-convert|concatenate)\(", ls)
        if m:
            rows.append((shape_elems(m.group(2)), m.group(3), m.group(2),
                         m.group(1), ls[:240]))
    rows.sort(reverse=True)
    print("\ntop raw copy/pad/slice/transpose/concat instructions by size:")
    for n, kind, shape, name, full in rows[:30]:
        print(f"{n:>12,}  {kind:10s} {shape:32s} {name}")

    # Fusions named pad_add / copy fusions: print their root expressions.
    print("\nfusion computations containing pad+add (pad_add_fusion):")
    for m in re.finditer(r"%?(pad_add_fusion[\w.]*) = (\S+) fusion\(([^)]*)\)",
                         txt):
        print(f"  {m.group(1)}: out={m.group(2)} args={m.group(3)[:160]}")


if __name__ == "__main__":
    main()
