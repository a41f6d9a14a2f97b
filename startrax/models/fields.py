"""Radiance-field MLPs as pure init/apply functions over parameter pytrees.

TPU-native counterpart of the reference NeRF module (models/nerf.py:34-191)
with the ResNet-style trunk (models/resnet.py). Differences by design:

- No `netchunk` inner loop: the whole [rays * samples] batch is one set of
  large matmuls that XLA tiles onto the MXU (chunking only hurts under jit).
- Parameters are plain pytrees: K per-vehicle fields are *stacked* along a
  leading axis and evaluated with jax.vmap (reference loops in Python,
  star__.py:207-210).
- Matmuls run in a configurable compute dtype (bfloat16 by default on TPU)
  with f32 accumulation; encodings, heads' outputs, and compositing stay f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.encoding import positional_encoding, encoding_dim

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Architecture of one NeRF field.

    depth/width mirror reference netdepth/netwidth; the trunk holds depth//2
    residual blocks (models/nerf.py:66). Dynamic fields use depth//2
    (star__.py:41-57), i.e. depth=4 -> 2 blocks.
    """

    depth: int = 8
    width: int = 256
    multires: int = 10
    multires_views: int = 4
    use_viewdirs: bool = True
    input_dims: int = 3  # 4 for the time-conditioned variant
    end_barf: int = -1
    compute_dtype: Any = jnp.bfloat16
    # None = auto: the fused Pallas MLP kernel on TPU, plain XLA elsewhere.
    # The fused path always runs bf16 matmuls; set False for f32 parity runs.
    use_fused: Any = None

    @property
    def n_blocks(self) -> int:
        return self.depth // 2

    @property
    def input_ch(self) -> int:
        return encoding_dim(self.input_dims, self.multires)

    @property
    def input_ch_views(self) -> int:
        return encoding_dim(3, self.multires_views)


def _kaiming_normal(key, shape, dtype=jnp.float32):
    """He-normal, fan_in mode (matches the reference trunk init)."""
    fan_in = shape[0]
    std = (2.0 / fan_in) ** 0.5
    return std * jax.random.normal(key, shape, dtype)


def _xavier_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[1]
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def _linear(key, d_in, d_out, init=_kaiming_normal):
    return {"w": init(key, (d_in, d_out)), "b": jnp.zeros((d_out,), jnp.float32)}


def _dense(params, x, compute_dtype):
    """x @ w + b with MXU-friendly dtype and f32 accumulation."""
    w = params["w"].astype(compute_dtype)
    y = jnp.dot(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    return y + params["b"]


def init_field(key, cfg: FieldConfig) -> Params:
    """Initialize one radiance field's parameters.

    Trunk: lin_in -> n_blocks residual blocks -> (relu) lin_out, widths all W.
    Heads: alpha (W->1), feature (W->W), views (W+view_ch -> W//2), rgb
    (W//2 -> 3). Residual blocks' second linear starts at zero so each block
    is initially the identity (reference resnet.py:37).
    """
    W = cfg.width
    keys = jax.random.split(key, 6 + 2 * cfg.n_blocks)

    params: Params = {
        "lin_in": _linear(keys[0], cfg.input_ch, W),
        "lin_out": _linear(keys[1], W, W),
        "alpha": _linear(keys[2], W, 1),
        "feature": _linear(keys[3], W, W),
        "views": _linear(keys[4], W + cfg.input_ch_views, W // 2),
        "rgb": _linear(keys[5], W // 2, 3, init=_xavier_uniform),
        "blocks": [],
    }
    for i in range(cfg.n_blocks):
        fc0 = _linear(keys[6 + 2 * i], W, W)
        fc1 = {"w": jnp.zeros((W, W), jnp.float32), "b": jnp.zeros((W,), jnp.float32)}
        params["blocks"].append({"fc0": fc0, "fc1": fc1})
    return params


def apply_field(
    params: Params,
    cfg: FieldConfig,
    pts,
    viewdirs,
    step: Optional[jnp.ndarray] = None,
    time: Optional[jnp.ndarray] = None,
    warp=None,
    input_grads: bool = True,
):
    """Evaluate the field on pts [R, S, 3] with per-ray viewdirs [R, 3].

    input_grads=False tells the fused kernel its inputs carry no parameter
    gradient (static fields; in-kernel-warped dynamic fields, whose pose
    grads ride the warp cotangent), so the backward skips its per-point
    dx/dd HBM outputs. Keep True whenever pts/viewdirs are functions of
    parameters — e.g. the XLA-warp path, where pose grads flow through pts.

    warp: optional packed [16] SE(3) (M row-major [0:9], t [9:12]) applied to
    the inputs first — points -> M p + t, dirs -> M d — differentiably. On
    the fused-kernel path the warp runs inside the Pallas kernel (the warped
    arrays never exist in HBM); elsewhere it is applied eagerly with
    identical semantics.

    Returns (raw_alpha [R, S], raw_rgb [R, S, 3]) in f32 (pre-activation;
    compositing applies softplus/sigmoid).
    """
    import chex

    chex.assert_rank(pts, 3)
    R, S = pts.shape[0], pts.shape[1]
    chex.assert_shape(pts, (R, S, 3))
    chex.assert_shape(viewdirs, (R, 3))
    if warp is not None and time is not None:
        raise ValueError("warp is only supported for 3-d inputs")
    x = pts.reshape(-1, pts.shape[-1])  # [R*S, 3]
    if time is not None:
        t = jnp.broadcast_to(jnp.asarray(time, x.dtype).reshape(-1), (x.shape[0],))
        x = jnp.concatenate([x, t[:, None]], axis=-1)

    fused = _resolve_use_fused(cfg)
    eager_warp = warp is not None and not (fused and x.shape[-1] == 3)
    # per-ray dirs expansion in-kernel: measured SLOWER than the broadcast
    # at the flagship shapes (9,683 vs 9,821 rays/s, r4 — the per-tile
    # [T, R] selector construction outweighs the saved [N, 3] broadcast);
    # kept behind an env flag for larger-R workloads where the broadcast
    # dominates. Exact parity tested (test_dirs_stride_matches_broadcast).
    import os as _os

    if (fused and x.shape[-1] == 3 and not eager_warp and not input_grads
            and _os.environ.get("STARTRAX_DIRS_STRIDE") == "1"):
        from ..kernels.fused_mlp import DEFAULT_TILE

        dirs_stride = S if DEFAULT_TILE % S == 0 else None
    else:
        dirs_stride = None
    if dirs_stride is not None:
        # per-RAY dirs; the kernel expands rows in VMEM — the [N, 3]
        # per-point dirs broadcast (and its layout copies) never exists
        dirs = viewdirs
    else:
        dirs = jnp.broadcast_to(viewdirs[:, None, :], (R, S, 3)).reshape(-1, 3)

    if eager_warp:
        # eager warp (exact semantics of the in-kernel path); pose grads now
        # flow through the inputs, so the input cotangents must be kept
        M = warp[:9].reshape(3, 3)
        x = x @ M.T + warp[9:12]
        dirs = dirs @ M.T
        warp = None
        input_grads = True

    if fused:
        from ..kernels.fused_mlp import fused_field_apply, pe_mask_row

        barf_active = step is not None and cfg.end_barf > 0
        if x.shape[-1] == 3:
            # raw pts/dirs; the lane-aligned positional encoding (and its
            # backward) runs inside the kernel — no [N, 90] encode arrays.
            # BARF coarse-to-fine rides the same path: the schedule only
            # changes a per-frequency column mask, computed outside and
            # multiplied onto the encoding in-kernel.
            pe_masks = None
            if barf_active:
                from ..ops.encoding import barf_weights

                wx = barf_weights(step, cfg.end_barf, cfg.multires)
                wd = barf_weights(step, cfg.end_barf, cfg.multires_views)
                pe_masks = (pe_mask_row(wx, cfg.multires),
                            pe_mask_row(wd, cfg.multires_views))
            raw_alpha, raw_rgb = fused_field_apply(
                params, x, dirs, cfg.n_blocks,
                pe=(cfg.multires, cfg.multires_views), pe_masks=pe_masks,
                warp=warp, input_grads=input_grads,
                dirs_stride=dirs_stride,
            )
        else:
            emb = positional_encoding(x, cfg.multires, step=step, end_barf=cfg.end_barf)
            emb_dirs = positional_encoding(
                dirs, cfg.multires_views, step=step, end_barf=cfg.end_barf
            )
            raw_alpha, raw_rgb = fused_field_apply(
                params, emb, emb_dirs, cfg.n_blocks,
                input_grads=input_grads)
        return raw_alpha.reshape(R, S), raw_rgb.reshape(R, S, 3)

    emb = positional_encoding(x, cfg.multires, step=step, end_barf=cfg.end_barf)
    emb_dirs = positional_encoding(dirs, cfg.multires_views, step=step, end_barf=cfg.end_barf)

    cd = cfg.compute_dtype

    h = _dense(params["lin_in"], emb, cd)
    for blk in params["blocks"]:
        net = _dense(blk["fc0"], jax.nn.relu(h), cd)
        dx = _dense(blk["fc1"], jax.nn.relu(net), cd)
        h = h + dx
    h = _dense(params["lin_out"], jax.nn.relu(h), cd)

    raw_alpha = _dense(params["alpha"], h, cd)[..., 0]
    feature = _dense(params["feature"], h, cd)
    hv = jnp.concatenate([feature, emb_dirs], axis=-1)
    hv = jax.nn.relu(_dense(params["views"], hv, cd))
    raw_rgb = _dense(params["rgb"], hv, cd)

    return raw_alpha.reshape(R, S), raw_rgb.reshape(R, S, 3)


def apply_field_t(
    params: Params,
    cfg: FieldConfig,
    pts_t,
    viewdirs_t,
    step: Optional[jnp.ndarray] = None,
    warp=None,
):
    """Channel-leading apply: pts_t [3, R, S], viewdirs_t [3, R] ->
    (raw_alpha [R, S], raw_rgb_t [3, R, S]).

    The layout-optimal twin of apply_field for the fused-kernel renderer
    path (pe mode, input_grads=False): every [*, 3]-minor array between ray
    generation and compositing is lane-padded 3->128 in HBM (~43x its
    logical bytes per touch, BENCH_NOTES r4); keeping the channel axis MAJOR
    end-to-end makes every HBM touch lane-dense. Exact parity with
    apply_field (the in-kernel transposes are identity matmuls,
    kernels/fused_mlp._t_to_ct). Callers must fall back to apply_field when
    _resolve_use_fused is False or inputs are 4-D."""
    import chex

    chex.assert_rank(pts_t, 3)
    R, S = pts_t.shape[1], pts_t.shape[2]
    chex.assert_shape(pts_t, (3, R, S))
    chex.assert_shape(viewdirs_t, (3, R))
    if not _resolve_use_fused(cfg):
        raise ValueError("apply_field_t is fused-kernel only")

    from ..kernels.fused_mlp import fused_field_apply, pe_mask_row

    x = pts_t.reshape(3, R * S)
    dirs = jnp.broadcast_to(viewdirs_t[:, :, None], (3, R, S)).reshape(3, R * S)
    pe_masks = None
    if step is not None and cfg.end_barf > 0:
        from ..ops.encoding import barf_weights

        wx = barf_weights(step, cfg.end_barf, cfg.multires)
        wd = barf_weights(step, cfg.end_barf, cfg.multires_views)
        pe_masks = (pe_mask_row(wx, cfg.multires),
                    pe_mask_row(wd, cfg.multires_views))
    raw_alpha, raw_rgb_t = fused_field_apply(
        params, x, dirs, cfg.n_blocks,
        pe=(cfg.multires, cfg.multires_views), pe_masks=pe_masks,
        warp=warp, input_grads=False, io_t=True,
    )
    return raw_alpha.reshape(R, S), raw_rgb_t.reshape(3, R, S)


def query_density(params: Params, cfg: FieldConfig, pts):
    """Density at world points [N, 3] (post-softplus) — the nerfacc example
    models' query_density API (reference models/nerf.py:199-420), used for
    occupancy-grid updates."""
    dirs = jnp.broadcast_to(jnp.asarray([[0.0, 0.0, -1.0]], pts.dtype), (pts.shape[0], 3))
    raw_alpha, _ = apply_field(params, cfg, pts[:, None, :], dirs)
    return jax.nn.softplus(raw_alpha[:, 0])


def query_opacity(params: Params, cfg: FieldConfig, pts, step_size: float):
    """Opacity of a step through each point: 1 - exp(-density * step) —
    the nerfacc query_opacity used as occ_eval_fn."""
    return 1.0 - jnp.exp(-query_density(params, cfg, pts) * step_size)


def query_rgb(params: Params, cfg: FieldConfig, pts, viewdirs=None):
    """Radiance at points (post-sigmoid); default view direction -z.
    Used for vertex-colored mesh export."""
    if viewdirs is None:
        viewdirs = jnp.broadcast_to(
            jnp.asarray([[0.0, 0.0, -1.0]], pts.dtype), (pts.shape[0], 3)
        )
    _, raw_rgb = apply_field(params, cfg, pts[:, None, :], viewdirs)
    return jax.nn.sigmoid(raw_rgb[:, 0])


def _resolve_use_fused(cfg: FieldConfig) -> bool:
    if cfg.use_fused is not None:
        return bool(cfg.use_fused)
    return jax.default_backend() == "tpu"


def init_stacked_fields(key, cfg: FieldConfig, n: int) -> Params:
    """n independently-initialized fields with leaves stacked on axis 0."""
    keys = jax.random.split(key, n)
    return jax.vmap(lambda k: init_field(k, cfg))(keys)


def apply_stacked_fields(params: Params, cfg: FieldConfig, pts, viewdirs, step=None):
    """Evaluate n stacked fields on per-field inputs.

    pts: [n, R, S, 3], viewdirs: [n, R, 3] ->
    (raw_alpha [n, R, S], raw_rgb [n, R, S, 3]).

    The fused-kernel path unrolls the (small, static) vehicle axis in Python;
    the XLA path vmaps. A single-launch variant evaluating all n fields in
    one pallas_call exists (kernels.fused_mlp.fused_stacked_apply, exact
    parity) but measured ~5% SLOWER than the unroll at the flagship K=2
    (BENCH_NOTES.md round 2) — revisit for larger K.
    """
    import chex

    n, R, S = pts.shape[0], pts.shape[1], pts.shape[2]
    chex.assert_shape(pts, (n, R, S, 3))
    chex.assert_shape(viewdirs, (n, R, 3))
    if _resolve_use_fused(cfg):
        barf_active = step is not None and cfg.end_barf > 0
        import os as _os

        if (_os.environ.get("STARTRAX_STACKED_KERNEL") == "1"
                and cfg.input_dims == 3 and not barf_active):
            # measurement switch for the single-launch variant (exact
            # parity, tests/test_kernels.py): K fields, one pallas_call
            from ..kernels.fused_mlp import fused_stacked_apply

            x = pts.reshape(n, R * S, 3)
            d = jnp.broadcast_to(viewdirs[:, :, None, :], (n, R, S, 3))
            d = d.reshape(n, R * S, 3)
            a, r = fused_stacked_apply(
                params, x, d, cfg.n_blocks,
                pe=(cfg.multires, cfg.multires_views))
            return a.reshape(n, R, S), r.reshape(n, R, S, 3)
        outs = [
            apply_field(
                jax.tree.map(lambda x, k=k: x[k], params), cfg, pts[k], viewdirs[k],
                step=step,
            )
            for k in range(n)
        ]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )
    return jax.vmap(lambda p, x, v: apply_field(p, cfg, x, v, step=step))(
        params, pts, viewdirs
    )
