"""Fused Pallas MLP kernel tests (interpret mode on the CPU backend).

The fused kernel must match the XLA field implementation exactly in forward
(same bf16 matmul sequence) and closely in gradients (bwd recomputes
activations in bf16).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from startrax.models import fields
from startrax.kernels.fused_mlp import fused_field_apply, flatten_params, unflatten_grads
from startrax.ops.encoding import positional_encoding

CFG = fields.FieldConfig(depth=4, width=32, compute_dtype=jnp.bfloat16)


def _setup(seed=0, n_rays=4, n_samples=16):
    params = fields.init_field(jax.random.PRNGKey(seed), CFG)
    # nonzero fc1 so gradients flow through every path
    params = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(seed + 1), x.shape),
        params,
    )
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(size=(n_rays, n_samples, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(n_rays, 3)).astype(np.float32))
    x = pts.reshape(-1, 3)
    emb = positional_encoding(x, CFG.multires)
    d = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)
    emb_d = positional_encoding(d, CFG.multires_views)
    return params, pts, dirs, emb, emb_d


def test_fused_forward_matches_xla():
    params, pts, dirs, emb, emb_d = _setup()
    a_ref, r_ref = fields.apply_field(params, CFG, pts, dirs)
    a_k, r_k = fused_field_apply(params, emb, emb_d, CFG.n_blocks, tile=32, interpret=True)
    np.testing.assert_allclose(
        np.asarray(a_k).reshape(a_ref.shape), np.asarray(a_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_k).reshape(r_ref.shape), np.asarray(r_ref), atol=1e-5
    )


def test_fused_forward_pads_ragged_batch():
    params, pts, dirs, emb, emb_d = _setup(n_rays=3, n_samples=11)  # 33 pts, tile 32
    a_k, r_k = fused_field_apply(params, emb, emb_d, CFG.n_blocks, tile=32, interpret=True)
    assert a_k.shape == (33,) and r_k.shape == (33, 3)
    a_ref, r_ref = fields.apply_field(params, CFG, pts, dirs)
    np.testing.assert_allclose(
        np.asarray(a_k), np.asarray(a_ref).reshape(-1), atol=1e-5
    )


def test_fused_weight_grads_close_to_xla():
    params, pts, dirs, emb, emb_d = _setup(seed=2)

    def loss_fused(p):
        a, r = fused_field_apply(p, emb, emb_d, CFG.n_blocks, tile=32, interpret=True)
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    def loss_xla(p):
        a, r = fields.apply_field(p, CFG, pts, dirs)
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_xla)(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-2
        )


def test_fused_bwd_tile_decoupled_from_fwd_tile():
    """The backward grid may use a larger tile than the forward (fewer
    weight-grad accumulation rounds); gradients must not depend on it."""
    params, pts, dirs, emb, emb_d = _setup(seed=5, n_rays=4, n_samples=24)  # 96 pts

    def loss(p, bwd_tile):
        a, r = fused_field_apply(
            p, emb, emb_d, CFG.n_blocks, tile=32, interpret=True, bwd_tile=bwd_tile
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    g_small = jax.grad(lambda p: loss(p, 32))(params)
    g_large = jax.grad(lambda p: loss(p, 64))(params)  # 96 pads to 128, 2 rounds
    for a, b in zip(jax.tree.leaves(g_small), jax.tree.leaves(g_large)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
        )


@pytest.mark.slow
def test_fused_saved_acts_matches_recompute():
    """saved_acts=True streams forward activations to HBM for the backward
    instead of recomputing; both modes must produce the same value and the
    same gradients (the saves are the same bf16 casts the recompute makes)."""
    params, pts, dirs, emb, emb_d = _setup(seed=7, n_rays=4, n_samples=24)

    def loss(p, e, saved):
        a, r = fused_field_apply(
            p, e, emb_d, CFG.n_blocks, tile=32, interpret=True,
            saved_acts=saved,
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    v0 = float(loss(params, emb, False))
    v1 = float(loss(params, emb, True))
    np.testing.assert_allclose(v1, v0, rtol=1e-6)

    g0, ge0 = jax.grad(loss, argnums=(0, 1))(params, emb, False)
    g1, ge1 = jax.grad(loss, argnums=(0, 1))(params, emb, True)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
        )
    np.testing.assert_allclose(np.asarray(ge1), np.asarray(ge0), atol=1e-5)

    # same parity through the in-kernel PE mode (raw [N, 3] inputs)
    x = pts.reshape(-1, 3)
    d = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)

    def loss_pe(p, xx, saved):
        a, r = fused_field_apply(
            p, xx, d, CFG.n_blocks, tile=32, interpret=True,
            pe=(CFG.multires, CFG.multires_views), saved_acts=saved,
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    gp0, gx0 = jax.grad(loss_pe, argnums=(0, 1))(params, x, False)
    gp1, gx1 = jax.grad(loss_pe, argnums=(0, 1))(params, x, True)
    for a, b in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp0)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
        )
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=1e-5)


def test_fused_input_grads_flow():
    """d loss / d encoded inputs must be nonzero and close to XLA — this is
    the path pose gradients take."""
    params, pts, dirs, emb, emb_d = _setup(seed=3)

    g_emb = jax.grad(
        lambda e: jnp.sum(
            jnp.sin(fused_field_apply(params, e, emb_d, CFG.n_blocks, tile=32, interpret=True)[1])
        )
    )(emb)
    assert float(jnp.abs(g_emb).max()) > 0
    assert np.all(np.isfinite(np.asarray(g_emb)))

    # reference input grad through the XLA path
    def xla_from_emb(e):
        # re-implement apply_field's MLP on explicit encodings
        cd = CFG.compute_dtype
        from startrax.models.fields import _dense

        h = _dense(params["lin_in"], e, cd)
        for blk in params["blocks"]:
            net = _dense(blk["fc0"], jax.nn.relu(h), cd)
            dx = _dense(blk["fc1"], jax.nn.relu(net), cd)
            h = h + dx
        h = _dense(params["lin_out"], jax.nn.relu(h), cd)
        feature = _dense(params["feature"], h, cd)
        hv = jnp.concatenate([feature, emb_d], axis=-1)
        hv = jax.nn.relu(_dense(params["views"], hv, cd))
        return jnp.sum(jnp.sin(_dense(params["rgb"], hv, cd)))

    g_ref = jax.grad(xla_from_emb)(emb)
    scale = np.abs(np.asarray(g_ref)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(g_emb) / scale, np.asarray(g_ref) / scale, atol=2e-2
    )


def test_flatten_unflatten_roundtrip():
    params, *_ = _setup(seed=4)
    flat = flatten_params(params, CFG.n_blocks)
    back = unflatten_grads(flat, params, CFG.n_blocks)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_apply_field_fused_flag_dispatch():
    """use_fused=True routes through the kernel even on CPU (interpret)."""
    import dataclasses

    params, pts, dirs, *_ = _setup(seed=5)
    cfg_fused = dataclasses.replace(CFG, use_fused=True)
    a1, r1 = fields.apply_field(params, cfg_fused, pts, dirs)
    a2, r2 = fields.apply_field(params, CFG, pts, dirs)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)


def test_stacked_fields_fused_matches_vmap():
    import dataclasses

    cfg = dataclasses.replace(CFG, use_fused=True)
    stacked = fields.init_stacked_fields(jax.random.PRNGKey(6), cfg, 2)
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.normal(size=(2, 4, 8, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32))
    a1, r1 = fields.apply_stacked_fields(stacked, cfg, pts, dirs)
    a2, r2 = fields.apply_stacked_fields(stacked, CFG, pts, dirs)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


@pytest.mark.slow
def test_stacked_fused_grads_match_vmap():
    """The single-launch K-field kernel's weight/input/pose-path gradients
    match the vmapped XLA fields."""
    import dataclasses

    cfg = dataclasses.replace(CFG, use_fused=True)
    stacked = fields.init_stacked_fields(jax.random.PRNGKey(8), cfg, 3)
    stacked = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(9), x.shape), stacked
    )
    rng = np.random.default_rng(9)
    pts = jnp.asarray(rng.normal(size=(3, 4, 8, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(3, 4, 3)).astype(np.float32))

    def loss(cfg_):
        def f(p, x):
            a, r = fields.apply_stacked_fields(p, cfg_, x, dirs)
            return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)
        return f

    g_fused_w, g_fused_x = jax.grad(loss(cfg), argnums=(0, 1))(stacked, pts)

    # exact check: the K-field kernel == the per-field fused kernel unrolled
    # (identical bf16 math, just one launch instead of K)
    from startrax.kernels.fused_mlp import fused_field_apply

    def loss_unrolled(p, x):
        tot = 0.0
        for k in range(3):
            pk = jax.tree.map(lambda w, k=k: w[k], p)
            xk = x[k].reshape(-1, 3)
            dk = jnp.broadcast_to(dirs[k][:, None, :], x[k].shape).reshape(-1, 3)
            a, r = fused_field_apply(
                pk, xk, dk, CFG.n_blocks, tile=32, interpret=True,
                pe=(CFG.multires, CFG.multires_views),
            )
            tot = tot + jnp.sum(jnp.sin(a.reshape(x[k].shape[:2]))) + jnp.sum(r ** 2)
        return tot

    g_un_w, g_un_x = jax.grad(loss_unrolled, argnums=(0, 1))(stacked, pts)
    np.testing.assert_allclose(np.asarray(g_fused_x), np.asarray(g_un_x),
                               atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(g_fused_w), jax.tree.leaves(g_un_w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    # sanity vs the f32 XLA path: bf16 recompute noise is amplified by the
    # 2^9 PE frequency scale, so bound the error relative to the grad scale
    g_xla_w, g_xla_x = jax.grad(loss(CFG), argnums=(0, 1))(stacked, pts)
    err = float(jnp.max(jnp.abs(g_fused_x - g_xla_x)))
    scale = float(jnp.max(jnp.abs(g_xla_x)))
    assert err < 0.02 * scale, (err, scale)


def test_fused_pe_in_kernel_matches_xla():
    params, pts, dirs, emb, emb_d = _setup(seed=6)
    a_ref, r_ref = fields.apply_field(params, CFG, pts, dirs)
    x = pts.reshape(-1, 3)
    d = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)
    a_k, r_k = fused_field_apply(
        params, x, d, CFG.n_blocks, tile=32, interpret=True,
        pe=(CFG.multires, CFG.multires_views),
    )
    np.testing.assert_allclose(
        np.asarray(a_k).reshape(a_ref.shape), np.asarray(a_ref), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(r_k).reshape(r_ref.shape), np.asarray(r_ref), atol=1e-5
    )


def test_fused_pe_in_kernel_input_grads():
    """Pose gradients flow through the in-kernel encoding: d loss / d pts must
    match the XLA PE + fused-emb path."""
    params, pts, dirs, emb, emb_d = _setup(seed=7)
    x = pts.reshape(-1, 3)
    d = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)

    def loss_pe(x):
        a, r = fused_field_apply(
            params, x, d, CFG.n_blocks, tile=32, interpret=True,
            pe=(CFG.multires, CFG.multires_views),
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    from startrax.ops.encoding import positional_encoding

    def loss_xla_pe(x):
        e = positional_encoding(x, CFG.multires)
        a, r = fused_field_apply(params, e, emb_d, CFG.n_blocks, tile=32, interpret=True)
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    g1 = jax.grad(loss_pe)(x)
    g2 = jax.grad(loss_xla_pe)(x)
    scale = np.abs(np.asarray(g2)).max() + 1e-6
    np.testing.assert_allclose(np.asarray(g1) / scale, np.asarray(g2) / scale, atol=2e-2)


def test_barf_path_dispatches_and_masks():
    """end_barf > 0 with a step rides the in-kernel PE path with a column
    mask; low step suppresses high-frequency response."""
    import dataclasses

    cfg = dataclasses.replace(CFG, end_barf=100, use_fused=True)
    params, pts, dirs, *_ = _setup(seed=8)
    a_early, _ = fields.apply_field(params, cfg, pts, dirs, step=jnp.asarray(0.0))
    a_late, _ = fields.apply_field(params, cfg, pts, dirs, step=jnp.asarray(100.0))
    # different masking -> different outputs; late == unmasked
    a_unmasked, _ = fields.apply_field(params, dataclasses.replace(CFG, use_fused=True), pts, dirs)
    assert float(jnp.abs(a_early - a_late).max()) > 1e-6
    np.testing.assert_allclose(np.asarray(a_late), np.asarray(a_unmasked), atol=1e-5)


def test_fused_barf_in_kernel_matches_encode_outside():
    """Mid-schedule BARF: the in-kernel column-masked encoding must match the
    encode-outside masked encoding in values and in input gradients (the
    warmup's pose-gradient path)."""
    params, pts, dirs, *_ = _setup(seed=9)
    x = pts.reshape(-1, 3)
    d = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)
    step, end_barf = jnp.asarray(37.0), 100

    from startrax.kernels.fused_mlp import pe_mask_row
    from startrax.ops.encoding import barf_weights

    masks = (
        pe_mask_row(barf_weights(step, end_barf, CFG.multires), CFG.multires),
        pe_mask_row(barf_weights(step, end_barf, CFG.multires_views),
                    CFG.multires_views),
    )

    def loss_in_kernel(p, xx):
        a, r = fused_field_apply(
            p, xx, d, CFG.n_blocks, tile=32, interpret=True,
            pe=(CFG.multires, CFG.multires_views), pe_masks=masks,
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    def loss_outside(p, xx):
        e = positional_encoding(xx, CFG.multires, step=step, end_barf=end_barf)
        ed = positional_encoding(d, CFG.multires_views, step=step, end_barf=end_barf)
        a, r = fused_field_apply(p, e, ed, CFG.n_blocks, tile=32, interpret=True)
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    v1 = float(loss_in_kernel(params, x))
    v0 = float(loss_outside(params, x))
    np.testing.assert_allclose(v1, v0, rtol=1e-5)

    (gp1, gx1) = jax.grad(loss_in_kernel, argnums=(0, 1))(params, x)
    (gp0, gx0) = jax.grad(loss_outside, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp0)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-2
        )
    scale = np.abs(np.asarray(gx0)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(gx1) / scale, np.asarray(gx0) / scale, atol=2e-2
    )


def test_fused_barf_in_kernel_with_saved_acts():
    """BARF masking composes with the saved-activation backward."""
    params, pts, dirs, *_ = _setup(seed=10)
    x = pts.reshape(-1, 3)
    d = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)
    step, end_barf = jnp.asarray(42.0), 100

    from startrax.kernels.fused_mlp import pe_mask_row
    from startrax.ops.encoding import barf_weights

    masks = (
        pe_mask_row(barf_weights(step, end_barf, CFG.multires), CFG.multires),
        pe_mask_row(barf_weights(step, end_barf, CFG.multires_views),
                    CFG.multires_views),
    )

    def loss(p, xx, saved):
        a, r = fused_field_apply(
            p, xx, d, CFG.n_blocks, tile=32, interpret=True,
            pe=(CFG.multires, CFG.multires_views), pe_masks=masks,
            saved_acts=saved,
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    np.testing.assert_allclose(
        float(loss(params, x, True)), float(loss(params, x, False)), rtol=1e-6
    )
    g0, gx0 = jax.grad(loss, argnums=(0, 1))(params, x, False)
    g1, gx1 = jax.grad(loss, argnums=(0, 1))(params, x, True)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-5
        )
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=1e-5)


def _rand_warp(seed=0):
    """A random rigid warp packed for the kernel ([16]: M row-major, t)."""
    from startrax.ops import lie

    rng = np.random.default_rng(seed)
    q = lie.quat_normalize(jnp.asarray(rng.normal(size=4).astype(np.float32)))
    t = jnp.asarray(rng.normal(size=3).astype(np.float32))
    M = lie.quat_to_matrix(q)
    return jnp.concatenate([M.reshape(9), t, jnp.zeros(4, jnp.float32)]), M, t


def _eager_warp(x, warp, with_t):
    """Reference warp using the kernel's exact f32 op order (elementwise
    row dot + translate), so parity is bitwise-comparable after the
    frequency-amplifying PE."""
    x0, x1, x2 = x[:, 0:1], x[:, 1:2], x[:, 2:3]
    ys = []
    for r in range(3):
        y = warp[3 * r] * x0 + warp[3 * r + 1] * x1 + warp[3 * r + 2] * x2
        if with_t:
            y = y + warp[9 + r]
        ys.append(y)
    return jnp.concatenate(ys, axis=-1)


def test_fused_warp_in_kernel_matches_eager():
    """In-kernel SE(3) warp == warping the inputs before the kernel."""
    params, pts, dirs, *_ = _setup(seed=11)
    x = pts.reshape(-1, 3)
    d = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)
    warp, M, t = _rand_warp(seed=12)

    a_k, r_k = fused_field_apply(
        params, x, d, CFG.n_blocks, tile=32, interpret=True,
        pe=(CFG.multires, CFG.multires_views), warp=warp,
    )
    a_e, r_e = fused_field_apply(
        params, _eager_warp(x, warp, True), _eager_warp(d, warp, False),
        CFG.n_blocks, tile=32, interpret=True,
        pe=(CFG.multires, CFG.multires_views),
    )
    # tolerance is one bf16 ulp at activation scale: a ~1-ulp f32 difference
    # in the warped coordinate (FMA/association inside vs outside the kernel)
    # is amplified by the 2^9 top PE frequency and can flip a bf16 rounding
    # boundary in the MLP — a wrong warp would be off by O(1), not O(0.01)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_e), atol=2e-2)
    np.testing.assert_allclose(np.asarray(r_k), np.asarray(r_e), atol=2e-2)


@pytest.mark.parametrize("saved", [False, True])
def test_fused_warp_grads_match_eager(saved):
    """d loss / d (M, t, inputs, weights) through the in-kernel warp must
    match differentiating the eager warp through the kernel."""
    params, pts, dirs, *_ = _setup(seed=13)
    x = pts.reshape(-1, 3)
    d = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)
    warp0, M0, t0 = _rand_warp(seed=14)

    def loss_kernel(p, warp, xx):
        a, r = fused_field_apply(
            p, xx, d, CFG.n_blocks, tile=32, interpret=True,
            pe=(CFG.multires, CFG.multires_views), warp=warp, saved_acts=saved,
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    def loss_eager(p, warp, xx):
        a, r = fused_field_apply(
            p, _eager_warp(xx, warp, True), _eager_warp(d, warp, False),
            CFG.n_blocks, tile=32,
            interpret=True, pe=(CFG.multires, CFG.multires_views),
            saved_acts=saved,
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    # bf16 rounding-boundary noise (see test_fused_warp_in_kernel_matches_eager)
    np.testing.assert_allclose(
        float(loss_kernel(params, warp0, x)), float(loss_eager(params, warp0, x)),
        rtol=1e-3,
    )
    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(params, warp0, x)
    ge = jax.grad(loss_eager, argnums=(0, 1, 2))(params, warp0, x)
    for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(ge)):
        scale = np.abs(np.asarray(b)).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-2
        )


@pytest.mark.slow
def test_apply_star_kernel_warp_matches_xla_warp(monkeypatch):
    """apply_star with the in-kernel warp == the XLA warp_to_vehicle_frames
    path, in outputs and in pose gradients."""
    import dataclasses

    from startrax.models import star
    from startrax.ops import lie

    cfg = star.StarConfig(
        num_vehicles=2, netdepth=4, netdepth_fine=4, netwidth=32,
        netwidth_fine=32, n_samples=8, n_importance=0, near=2.0, far=6.0,
        use_fused=True, compute_dtype=jnp.bfloat16,
    )
    params = star.init_star(jax.random.PRNGKey(15), cfg)
    rng = np.random.default_rng(16)
    pts = jnp.asarray(rng.normal(size=(4, 8, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    z_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (4, 8))
    rays_d = dirs
    q = lie.quat_normalize(jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32)))
    pose = jnp.concatenate(
        [0.1 * jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32)), q], axis=-1
    )

    def fine_rgb_sum(pose):
        out = star.apply_star(params, cfg, pts, dirs, z_vals, rays_d, pose=pose)
        return jnp.sum(out["rgb"]), out["rgb"]

    monkeypatch.setenv("STARTRAX_KERNEL_WARP", "1")
    (s1, rgb1), g1 = jax.value_and_grad(fine_rgb_sum, has_aux=True)(pose)
    monkeypatch.setenv("STARTRAX_KERNEL_WARP", "0")
    (s0, rgb0), g0 = jax.value_and_grad(fine_rgb_sum, has_aux=True)(pose)

    np.testing.assert_allclose(np.asarray(rgb1), np.asarray(rgb0), atol=1e-4)
    scale = np.abs(np.asarray(g0)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(g1) / scale, np.asarray(g0) / scale, atol=2e-2
    )


@pytest.mark.parametrize("saved", [False, True])
@pytest.mark.slow
def test_input_grads_false_parity(saved):
    """input_grads=False (no per-point dx/dd HBM outputs; in-kernel pose-grad
    reduction) must produce identical weight AND warp gradients to the full
    path, and zero input cotangents. This is the renderer's default: rays are
    batch constants and z samples are stop-gradiented (ops/sampling.py:150),
    so input grads are structurally dead there."""
    params, pts, dirs, *_ = _setup(seed=21)
    x = pts.reshape(-1, 3)
    d = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)
    warp0, _, _ = _rand_warp(seed=22)

    def loss(p, warp, ig):
        a, r = fused_field_apply(
            p, x, d, CFG.n_blocks, tile=32, interpret=True,
            pe=(CFG.multires, CFG.multires_views), warp=warp,
            saved_acts=saved, input_grads=ig,
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    g_full = jax.grad(loss, argnums=(0, 1))(params, warp0, True)
    g_fast = jax.grad(loss, argnums=(0, 1))(params, warp0, False)
    # the pose-grad reduction accumulates per tile instead of one einsum —
    # summation-order noise on a cancellation-heavy sum; weight grads are
    # bitwise-identical math and pass far tighter
    for a, b in zip(jax.tree.leaves(g_full), jax.tree.leaves(g_fast)):
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=5e-3)

    # input cotangents are exactly zero on the fast path
    gx = jax.grad(
        lambda xx: loss_with_x(params, warp0, xx, saved, False))(x)
    np.testing.assert_array_equal(np.asarray(gx), 0.0)

    # unwarped (static-field shape): weight grads also match
    def loss_nw(p, ig):
        a, r = fused_field_apply(
            p, x, d, CFG.n_blocks, tile=32, interpret=True,
            pe=(CFG.multires, CFG.multires_views),
            saved_acts=saved, input_grads=ig,
        )
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    gw_full = jax.grad(loss_nw)(params, True)
    gw_fast = jax.grad(loss_nw)(params, False)
    for a, b in zip(jax.tree.leaves(gw_full), jax.tree.leaves(gw_fast)):
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-6)


def loss_with_x(p, warp, xx, saved, ig):
    d_full = jnp.zeros_like(xx).at[:, 0].set(1.0)
    a, r = fused_field_apply(
        p, xx, d_full, CFG.n_blocks, tile=32, interpret=True,
        pe=(CFG.multires, CFG.multires_views), warp=warp,
        saved_acts=saved, input_grads=ig,
    )
    return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)


@pytest.mark.parametrize("saved", [False, True])
def test_dirs_stride_matches_broadcast(saved):
    """dirs_stride: per-RAY dirs expanded in VMEM must match the per-point
    broadcast bitwise (the [N, 3] dirs array never exists in HBM), including
    through the warp and the in-kernel pose-grad reduction."""
    params, pts, dirs, *_ = _setup(seed=31)
    S = pts.shape[1]
    x = pts.reshape(-1, 3)
    dfull = jnp.broadcast_to(dirs[:, None, :], pts.shape).reshape(-1, 3)
    warp0, _, _ = _rand_warp(seed=32)

    def apply(p, warp, use_ds):
        return fused_field_apply(
            p, x, dirs if use_ds else dfull, CFG.n_blocks,
            tile=32, interpret=True, pe=(CFG.multires, CFG.multires_views),
            warp=warp, saved_acts=saved, input_grads=False,
            dirs_stride=S if use_ds else None)

    a1, r1 = apply(params, warp0, False)
    a2, r2 = apply(params, warp0, True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))

    def loss(p, warp, use_ds):
        a, r = apply(p, warp, use_ds)
        return jnp.sum(jnp.sin(a)) + jnp.sum(r ** 2)

    g1 = jax.grad(loss, argnums=(0, 1))(params, warp0, False)
    g2 = jax.grad(loss, argnums=(0, 1))(params, warp0, True)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_render_star_io_t_matches_legacy(monkeypatch):
    """The channel-leading renderer path (pts_from_z_t -> apply_field_t ->
    rgb_t compositing) must match the legacy layout in every output AND in
    pose gradients. The in-kernel transposes are exact identity matmuls, so
    the only tolerance is compositing reduction order."""
    from startrax.models import star
    from startrax.ops import lie

    cfg = star.StarConfig(
        num_vehicles=2, netdepth=4, netdepth_fine=4, netwidth=32,
        netwidth_fine=32, n_samples=8, n_importance=8, near=2.0, far=6.0,
        use_fused=True, compute_dtype=jnp.bfloat16,
    )
    params = star.init_star(jax.random.PRNGKey(41), cfg)
    rng = np.random.default_rng(42)
    rays_o = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    rays_d = jnp.asarray(
        (rng.normal(size=(4, 3)) + np.array([0, 0, 2.0])).astype(np.float32))
    q = lie.quat_normalize(jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32)))
    pose = jnp.concatenate(
        [0.1 * jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32)), q], axis=-1
    )

    def run(pose):
        out = star.render_star(params, cfg, rays_o, rays_d, key=None,
                               pose=pose, train=False, with_test_outputs=True)
        return jnp.sum(out["rgb"]) + jnp.sum(out["rgb0"]), out

    monkeypatch.setattr(star, "_IO_T", True)
    assert star._use_io_t(cfg, pose)
    (s1, out1), g1 = jax.value_and_grad(run, has_aux=True)(pose)
    monkeypatch.setattr(star, "_IO_T", False)
    assert not star._use_io_t(cfg, pose)
    (s0, out0), g0 = jax.value_and_grad(run, has_aux=True)(pose)

    assert set(out1.keys()) == set(out0.keys())
    for k in sorted(out0):
        a, b = np.asarray(out1[k]), np.asarray(out0[k])
        assert a.shape == b.shape, k
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=k)
    scale = np.abs(np.asarray(g0)).max() + 1e-6
    np.testing.assert_allclose(
        np.asarray(g1) / scale, np.asarray(g0) / scale, atol=1e-4
    )


@pytest.mark.slow
def test_render_star_io_t_appinit_matches_legacy(monkeypatch):
    """io_t parity on the appearance-init (pose=None, single-field) path."""
    from startrax.models import star

    cfg = star.StarConfig(
        num_vehicles=1, netdepth=4, netdepth_fine=4, netwidth=32,
        netwidth_fine=32, n_samples=8, n_importance=8, near=2.0, far=6.0,
        use_fused=True, compute_dtype=jnp.bfloat16,
    )
    params = star.init_star(jax.random.PRNGKey(43), cfg)
    rng = np.random.default_rng(44)
    rays_o = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    rays_d = jnp.asarray(
        (rng.normal(size=(4, 3)) + np.array([0, 0, 2.0])).astype(np.float32))

    def run(params):
        out = star.render_star(params, cfg, rays_o, rays_d, key=None,
                               pose=None, train=False)
        return jnp.sum(out["rgb"]), out

    monkeypatch.setattr(star, "_IO_T", True)
    (s1, out1) = run(params)
    monkeypatch.setattr(star, "_IO_T", False)
    (s0, out0) = run(params)
    assert set(out1.keys()) == set(out0.keys())
    for k in sorted(out0):
        np.testing.assert_allclose(
            np.asarray(out1[k]), np.asarray(out0[k]), atol=1e-5, err_msg=k)
