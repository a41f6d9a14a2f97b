"""Pallas TPU kernel: fused radiance-field MLP (trunk + heads) forward and
backward.

This is the framework's hot op — the tiny-cuda-nn "fully fused MLP" the
reference stubs out (models/nerf.py:67-76) rebuilt for TPU. The XLA fallback
(models/fields.apply_field) materializes every inter-layer activation in HBM:
for the flagship workload (512k points x 256 wide x ~11 layers) that is
~5.5 GB of activation traffic per forward — HBM-bound at ~25% MXU
utilization. This kernel keeps the whole layer chain resident in VMEM per
point-tile, so HBM traffic drops to the encoded inputs + outputs.

Design:
- default mode (pe=(multires, multires_views)): inputs are RAW points and
  view directions; the positional encoding runs inside the kernel as a
  lane-aligned [T, 128] construction via iota masks (_pe_encode128 — naive
  3-wide lane concats lower 4x slower in Mosaic), with the PE backward
  chained in-kernel, so no [N, 90] encode arrays ever hit HBM. A second
  mode takes pre-encoded features (BARF coarse-to-fine masking, 4-D inputs),
- grid over point tiles; all weights live in VMEM across grid steps
  (constant index_map), ~1.5 MB bf16 for a 256-wide 8-deep field,
- view branch avoids concatenation: hv = feat @ Wv_top + d_emb @ Wv_bot,
- backward: one kernel per tile recomputes the forward activations in VMEM,
  backprops through the chain, emits per-point input grads, and accumulates
  weight grads in f32 output blocks shared across the (sequential) TPU grid,
- matmuls in bf16 with f32 accumulation; biases/grads f32.

Structure must match models/fields.init_field:
  trunk: lin_in -> n_blocks x (fc0, fc1 residual) -> relu -> lin_out
  heads: alpha(W->1), feature(W->W), views(W+view_ch->W//2), rgb(W//2->3)
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE = int(__import__("os").environ.get("STARTRAX_FWD_TILE", "1024"))
# The backward kernel's per-tile fixed costs (weight-grad accumulation into
# the VMEM-resident f32 blocks, forward recompute staging, in-kernel PE) are
# amortized over the tile; a larger backward tile halves the number of
# accumulation rounds per call. Kept separate from the forward tile: the
# backward holds ~10 [T, W] bf16 activation saves plus live grad chains, so
# its VMEM ceiling, not launch overhead, binds the tile. Env-overridable for
# measurement (STARTRAX_BWD_TILE=2048 python bench.py).
DEFAULT_BWD_TILE = int(__import__("os").environ.get("STARTRAX_BWD_TILE", "1024"))
# Saved-activation backward: the forward kernel also streams its bf16
# layer activations to HBM and the backward reads them instead of
# recomputing the forward chain (~1/3 of the backward FLOPs) — trading
# activation HBM traffic for the recompute. Default ON: measured +9.3%
# on the flagship step (8,369 -> 9,147 rays/s, BENCH_NOTES.md round-3);
# STARTRAX_SAVED_ACTS=0 restores the recompute backward.
DEFAULT_SAVED_ACTS = __import__("os").environ.get("STARTRAX_SAVED_ACTS", "1") == "1"


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def flatten_params(params: Dict[str, Any], n_blocks: int):
    """Field param dict -> flat tuple of arrays in kernel operand order."""
    flat = [params["lin_in"]["w"], params["lin_in"]["b"]]
    for i in range(n_blocks):
        blk = params["blocks"][i]
        flat += [blk["fc0"]["w"], blk["fc0"]["b"], blk["fc1"]["w"], blk["fc1"]["b"]]
    flat += [
        params["lin_out"]["w"], params["lin_out"]["b"],
        params["alpha"]["w"], params["alpha"]["b"],
        params["feature"]["w"], params["feature"]["b"],
        params["views"]["w"], params["views"]["b"],
        params["rgb"]["w"], params["rgb"]["b"],
    ]
    return tuple(flat)


def unflatten_grads(flat, params: Dict[str, Any], n_blocks: int):
    """Inverse of flatten_params, shaped like the param dict."""
    it = iter(flat)
    out = {"lin_in": {"w": next(it), "b": next(it)}, "blocks": []}
    for _ in range(n_blocks):
        out["blocks"].append(
            {"fc0": {"w": next(it), "b": next(it)}, "fc1": {"w": next(it), "b": next(it)}}
        )
    for name in ("lin_out", "alpha", "feature", "views", "rgb"):
        out[name] = {"w": next(it), "b": next(it)}
    return out


def _dot(a, b):
    return jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def _pe_cols(T: int, num_freqs: int, width: int = 128):
    """Column metadata for the lane-aligned in-kernel encoding: column j holds
    x[dim] for j < 3, else sin/cos(x[dim] * 2^freq) with
    j = 3 + 6*freq + 3*phase + dim (the ops.encoding layout), zero beyond
    3 + 6*num_freqs. Everything is elementwise on [T, width] — no small-lane
    concats (which Mosaic lowers poorly)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, width), 1)
    j = jnp.maximum(cols - 3, 0)
    freq = jnp.clip(j // 6, 0, num_freqs - 1)
    rem = j % 6
    phase = rem // 3
    dim = jnp.where(cols < 3, cols, rem % 3)
    out_w = 3 + 6 * num_freqs
    return cols, freq, phase, dim, out_w


def _pe_encode128_c(x0, x1, x2, T: int, num_freqs: int, width: int = 128):
    """Per-component [T, 1] values -> lane-aligned encoding [T, width]."""
    cols, freq, phase, dim, out_w = _pe_cols(T, num_freqs, width)
    xv = jnp.where(dim == 0, x0, jnp.where(dim == 1, x1, x2))
    val = xv * jnp.exp2(freq.astype(jnp.float32))
    enc = jnp.where(phase == 0, jnp.sin(val), jnp.cos(val))
    enc = jnp.where(cols < 3, xv, enc)
    return jnp.where(cols < out_w, enc, 0.0)


def _pe_encode128(x, num_freqs: int, width: int = 128):
    """x [T, 3] -> lane-aligned encoding [T, width] (zeros beyond out_w)."""
    return _pe_encode128_c(x[:, 0:1], x[:, 1:2], x[:, 2:3], x.shape[0],
                           num_freqs, width)


def _pe_encode128_bwd_c(x0, x1, x2, g, T: int, num_freqs: int,
                        width: int = 128):
    """Chain d emb[T, width] -> per-component grads ([T, 1] x3)."""
    cols, freq, phase, dim, out_w = _pe_cols(T, num_freqs, width)
    xv = jnp.where(dim == 0, x0, jnp.where(dim == 1, x1, x2))
    scale = jnp.exp2(freq.astype(jnp.float32))
    val = xv * scale
    dval = jnp.where(phase == 0, jnp.cos(val), -jnp.sin(val)) * scale
    dval = jnp.where(cols < 3, 1.0, dval)
    dval = jnp.where(cols < out_w, dval, 0.0)
    gg = g * dval
    return [
        jnp.sum(jnp.where(dim == d, gg, 0.0), axis=-1, keepdims=True) for d in range(3)
    ]


def _pe_encode128_bwd(x, g, num_freqs: int, width: int = 128):
    """Chain d emb[T, width] -> d x[T, 3]."""
    dxs = _pe_encode128_bwd_c(x[:, 0:1], x[:, 1:2], x[:, 2:3], g,
                              x.shape[0], num_freqs, width)
    return jnp.concatenate(dxs, axis=-1)


def _warp_comps(x, w_ref, with_t: bool):
    """In-kernel SE(3) warp: x [T, 3] world -> components (y0, y1, y2) each
    [T, 1] with y = M x (+ t). w_ref is the packed [16] SMEM vector
    (M row-major at [0:9], t at [9:12]). Keeping components un-concatenated
    feeds _pe_encode128_c directly (3-wide lane concats lower poorly)."""
    x0, x1, x2 = x[:, 0:1], x[:, 1:2], x[:, 2:3]
    ys = []
    for r in range(3):
        y = w_ref[3 * r] * x0 + w_ref[3 * r + 1] * x1 + w_ref[3 * r + 2] * x2
        if with_t:
            y = y + w_ref[9 + r]
        ys.append(y)
    return ys


def _unwarp_grad_cols(dws, w_ref):
    """Rotate warped-frame per-component grads back to world: the columns of
    M (rows of M^T). dws: list of 3 [T, 1]."""
    return [
        w_ref[c] * dws[0] + w_ref[3 + c] * dws[1] + w_ref[6 + c] * dws[2]
        for c in range(3)
    ]


def pe_mask_row(weights_per_freq, num_freqs: int, width: int = 128):
    """BARF per-frequency weights [num_freqs] -> a [1, width] mask over the
    lane-aligned encoding columns (_pe_cols layout): 1.0 on the raw-input
    columns (BARF never masks include_input, reference embedder.py:104-108),
    w[freq(j)] on the sin/cos columns. Computed OUTSIDE the kernel (it only
    depends on the schedule step) and multiplied onto the [T, width] encoding
    inside — the coarse-to-fine warmup stays on the fused kernel instead of
    falling back to encode-outside HBM arrays."""
    cols = jnp.arange(width)
    j = jnp.maximum(cols - 3, 0)
    freq = jnp.clip(j // 6, 0, num_freqs - 1)
    row = jnp.where(cols < 3, 1.0, weights_per_freq.astype(jnp.float32)[freq])
    return row[None, :]


def _encode_in_kernel(x, num_freqs: int):
    """NeRF positional encoding computed on VMEM-resident values; layout
    matches ops.encoding.positional_encoding ([x, sin f0, cos f0, sin f1...])
    so the same weights work for both paths."""
    parts = [x]
    for i in range(num_freqs):
        s = x * (2.0 ** i)
        parts.append(jnp.sin(s))
        parts.append(jnp.cos(s))
    return jnp.concatenate(parts, axis=-1)


def _encode_bwd_in_kernel(x, d_emb_grad, num_freqs: int):
    """Chain rule through the in-kernel encoding: d emb -> d x.

    d_emb_grad: [T, d*(1+2F)] laid out as above; x: [T, d]."""
    d = x.shape[-1]
    dx = d_emb_grad[:, :d]
    for i in range(num_freqs):
        f = 2.0 ** i
        s = x * f
        g_sin = d_emb_grad[:, d * (1 + 2 * i) : d * (2 + 2 * i)]
        g_cos = d_emb_grad[:, d * (2 + 2 * i) : d * (3 + 2 * i)]
        dx = dx + f * (g_sin * jnp.cos(s) - g_cos * jnp.sin(s))
    return dx


def _forward_math(x_emb, d_emb, weights, n_blocks: int, save_acts: bool = False):
    """Shared fwd chain on VMEM-resident values. weights = flat tuple refs
    already read. Returns (alpha, rgb[, activations])."""
    it = iter(weights)
    W_in, b_in = next(it), next(it)
    blocks = [(next(it), next(it), next(it), next(it)) for _ in range(n_blocks)]
    W_out, b_out = next(it), next(it)
    W_a, b_a = next(it), next(it)
    W_f, b_f = next(it), next(it)
    W_v, b_v = next(it), next(it)
    W_r, b_r = next(it), next(it)

    width = W_in.shape[1]
    acts = {}
    bf = jnp.bfloat16  # residuals stored bf16 to fit VMEM in the bwd kernel

    h = _dot(x_emb, W_in) + b_in  # [T, W]
    for i, (W0, b0, W1, b1) in enumerate(blocks):
        a0 = jnp.maximum(h, 0.0)
        n = _dot(a0, W0) + b0
        a1 = jnp.maximum(n, 0.0)
        dxb = _dot(a1, W1) + b1
        if save_acts:
            acts[f"blk{i}"] = (h.astype(bf), n.astype(bf))  # block pre-activations
        h = h + dxb
    r = jnp.maximum(h, 0.0)
    ho = _dot(r, W_out) + b_out
    if save_acts:
        acts["h_last"] = h.astype(bf)
        acts["ho"] = ho.astype(bf)

    alpha = _dot(ho, W_a) + b_a  # [T, 1]
    feat = _dot(ho, W_f) + b_f  # [T, W]
    W_v_top = W_v[:width]
    W_v_bot = W_v[width:]
    hv_in = _dot(feat, W_v_top) + _dot(d_emb, W_v_bot) + b_v  # [T, W//2]
    hv = jnp.maximum(hv_in, 0.0)
    rgb = _dot(hv, W_r) + b_r  # [T, 3]
    if save_acts:
        acts["feat"] = feat.astype(bf)
        acts["hv_in"] = hv_in.astype(bf)
        return alpha, rgb, acts
    return alpha, rgb


def _acts_flat(acts, n_blocks: int):
    """acts dict -> flat tuple in the kernel save/restore order."""
    flat = []
    for i in range(n_blocks):
        flat += list(acts[f"blk{i}"])
    flat += [acts["h_last"], acts["ho"], acts["feat"], acts["hv_in"]]
    return tuple(flat)


def _acts_unflat(flat, n_blocks: int):
    it = iter(flat)
    acts = {f"blk{i}": (next(it), next(it)) for i in range(n_blocks)}
    acts["h_last"], acts["ho"] = next(it), next(it)
    acts["feat"], acts["hv_in"] = next(it), next(it)
    return acts


def _act_shapes(n_blocks: int, width: int, n_rows: int):
    """Shapes of the saved activations, in _acts_flat order."""
    shapes = [(n_rows, width)] * (2 * n_blocks)  # per-block (h, n)
    shapes += [(n_rows, width)] * 3              # h_last, ho, feat
    shapes += [(n_rows, width // 2)]             # hv_in
    return shapes


def _fwd_kernel(n_blocks, pe, save, masked, warped, dstride, io_t,
                x_ref, d_ref, *rest):
    n_w = 2 + 4 * n_blocks + 10
    n_m = 2 if masked else 0
    warp_ref = rest[0] if warped else None
    rest = rest[1:] if warped else rest
    mask_refs = rest[:n_m]
    wrefs = rest[n_m : n_m + n_w]
    out_ref = rest[n_m + n_w]
    act_refs = rest[n_m + n_w + 1 :]
    weights = tuple(w[...] for w in wrefs)
    x_emb = x_ref[...]
    d_emb = d_ref[...]
    if io_t:
        # channel-leading HBM I/O ([3, N] blocks): the lane-padded [N, 3]
        # layout costs ~43x its logical bytes per touch (BENCH_NOTES r4);
        # transpose to the row-major working shape in VMEM (exact, MXU)
        x_emb = _ct_to_tc(x_emb)
        if dstride is None:
            d_emb = _ct_to_tc(d_emb)
    if dstride is not None:
        d_emb = _expand_rows(d_emb, dstride, x_emb.shape[0])
    if pe is not None:
        T = x_emb.shape[0]
        if warped:
            # vehicle-frame warp fused into the encode: the [N, 3] warped
            # point/dir tensors never exist in HBM (models/star.py
            # warp_to_vehicle_frames runs in-kernel instead)
            x_emb = _pe_encode128_c(*_warp_comps(x_emb, warp_ref, True), T, pe[0])
            d_emb = _pe_encode128_c(*_warp_comps(d_emb, warp_ref, False), T, pe[1])
        else:
            x_emb = _pe_encode128(x_emb, pe[0])
            d_emb = _pe_encode128(d_emb, pe[1])
        if masked:
            x_emb = x_emb * mask_refs[0][...]
            d_emb = d_emb * mask_refs[1][...]
    if save:
        alpha, rgb, acts = _forward_math(x_emb, d_emb, weights, n_blocks,
                                         save_acts=True)
        for ref, val in zip(act_refs, _acts_flat(acts, n_blocks)):
            ref[...] = val
    else:
        alpha, rgb = _forward_math(x_emb, d_emb, weights, n_blocks)
    v = jnp.concatenate([alpha, rgb], axis=-1)  # [T, 4]
    out_ref[...] = _t_to_ct(v) if io_t else v   # io_t: [4, T] lane-major


def _gt0(x):
    # Mosaic can't lower bf16 vector compares on all layouts; compare in f32.
    return x.astype(jnp.float32) > 0.0


def _bwd_kernel(n_blocks, pe, saved, masked, warped, input_grads, dstride,
                io_t, x_ref, d_ref, *rest):
    """rest = ([warp_ref,] [mx_ref, md_ref,] *wrefs, g_ref, [*act_refs,]
    outputs). Outputs: with input_grads, (dx_ref, dd_ref, *dwrefs); without,
    ([pg_ref if warped,] *dwrefs) — the per-point input grads are never
    written to HBM (they carry no parameter gradient: rays are batch
    constants and z samples are stop-gradiented), and the pose-grad
    reduction G = DX^T X + DD^T D, s = sum DX accumulates in-kernel into a
    VMEM-resident (8, 128) block (rows 0-2 cols 0-2 = G, row 3 cols 0-2 = s)
    exactly like the weight grads. Measured r4: the [N, 3] f32 outputs are
    lane-padded 3 -> 128 in HBM (~43x the logical bytes), so dropping them
    removes most of the backward's non-matmul HBM traffic."""
    n_w = 2 + 4 * n_blocks + 10
    n_m = 2 if masked else 0
    n_acts = (2 * n_blocks + 4) if saved else 0
    warp_ref = rest[0] if warped else None
    rest = rest[1:] if warped else rest
    mask_refs = rest[:n_m]
    rest = rest[n_m:]
    wrefs = rest[:n_w]
    g_ref = rest[n_w]
    act_refs = rest[n_w + 1 : n_w + 1 + n_acts]
    outs = rest[n_w + 1 + n_acts:]
    if input_grads:
        dx_ref, dd_ref = outs[0], outs[1]
        pg_ref = None
        dwrefs = outs[2:]
    elif warped:
        dx_ref = dd_ref = None
        pg_ref = outs[0]
        dwrefs = outs[1:]
    else:
        dx_ref = dd_ref = pg_ref = None
        dwrefs = outs

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        for dw in dwrefs:
            dw[...] = jnp.zeros_like(dw)
        if pg_ref is not None:
            pg_ref[...] = jnp.zeros_like(pg_ref)

    weights = tuple(w[...] for w in wrefs)
    x_in = x_ref[...]
    d_in = d_ref[...]
    if io_t:
        x_in = _ct_to_tc(x_in)
        if dstride is None:
            d_in = _ct_to_tc(d_in)
    if dstride is not None:
        d_in = _expand_rows(d_in, dstride, x_in.shape[0])
    xc = dc = None
    if pe is not None:
        T = x_in.shape[0]
        if warped:
            xc = _warp_comps(x_in, warp_ref, True)
            dc = _warp_comps(d_in, warp_ref, False)
            x_emb = _pe_encode128_c(*xc, T, pe[0])
            d_emb = _pe_encode128_c(*dc, T, pe[1])
        else:
            x_emb = _pe_encode128(x_in, pe[0])
            d_emb = _pe_encode128(d_in, pe[1])
        if masked:
            x_emb = x_emb * mask_refs[0][...]
            d_emb = d_emb * mask_refs[1][...]
    else:
        x_emb, d_emb = x_in, d_in
    if saved:
        acts = _acts_unflat(tuple(a[...] for a in act_refs), n_blocks)
    else:
        alpha, rgb, acts = _forward_math(x_emb, d_emb, weights, n_blocks,
                                         save_acts=True)

    it = iter(weights)
    W_in, b_in = next(it), next(it)
    blocks = [(next(it), next(it), next(it), next(it)) for _ in range(n_blocks)]
    W_out, b_out = next(it), next(it)
    W_a, b_a = next(it), next(it)
    W_f, b_f = next(it), next(it)
    W_v, b_v = next(it), next(it)
    W_r, b_r = next(it), next(it)
    width = W_in.shape[1]

    g = g_ref[...]  # [T, 4] (io_t: [4, T] transposed to [T, 4] in VMEM)
    if io_t:
        g = _ct_to_tc(g)
    dalpha = g[:, 0:1]
    drgb = g[:, 1:4]

    hv = jnp.maximum(acts["hv_in"], 0.0)
    dhv = _dot(drgb, W_r.T)
    dW_r = _dot(hv.T, drgb)
    db_r = jnp.sum(drgb, axis=0)

    dhv_in = dhv * _gt0(acts["hv_in"])
    W_v_top = W_v[:width]
    W_v_bot = W_v[width:]
    dW_v_top = _dot(acts["feat"].T, dhv_in)
    dW_v_bot = _dot(d_emb.T, dhv_in)
    db_v = jnp.sum(dhv_in, axis=0)
    dfeat = _dot(dhv_in, W_v_top.T)
    dd_emb = _dot(dhv_in, W_v_bot.T)

    dho = _dot(dfeat, W_f.T) + _dot(dalpha, W_a.T)
    dW_f = _dot(acts["ho"].T, dfeat)
    db_f = jnp.sum(dfeat, axis=0)
    dW_a = _dot(acts["ho"].T, dalpha)
    db_a = jnp.sum(dalpha, axis=0)

    r = jnp.maximum(acts["h_last"], 0.0)
    dr = _dot(dho, W_out.T)
    dW_out = _dot(r.T, dho)
    db_out = jnp.sum(dho, axis=0)
    dh = dr * _gt0(acts["h_last"])

    dblocks = []
    for i in reversed(range(n_blocks)):
        W0, b0, W1, b1 = blocks[i]
        h_in, n = acts[f"blk{i}"]
        a0 = jnp.maximum(h_in, 0.0)
        a1 = jnp.maximum(n, 0.0)
        # h_out = h_in + (a1 @ W1 + b1); dh is d h_out
        da1 = _dot(dh, W1.T)
        dW1 = _dot(a1.T, dh)
        db1 = jnp.sum(dh, axis=0)
        dn = da1 * _gt0(n)
        dW0 = _dot(a0.T, dn)
        db0 = jnp.sum(dn, axis=0)
        da0 = _dot(dn, W0.T)
        dh = dh + da0 * _gt0(h_in)
        dblocks.append((dW0, db0, dW1, db1))
    dblocks.reverse()

    dx_emb = _dot(dh, W_in.T)
    dW_in = _dot(x_emb.T, dh)
    db_in = jnp.sum(dh, axis=0)

    if pe is not None:
        if masked:
            # emb = mask * base: chain the mask into the encoding backward
            dx_emb = dx_emb * mask_refs[0][...]
            dd_emb = dd_emb * mask_refs[1][...]
        if warped:
            # grads land in the warped frame; rotate back to world (M^T) so
            # the pose-grad reduction sees d/d world points.
            T = x_in.shape[0]
            dxw = _pe_encode128_bwd_c(*xc, dx_emb, T, pe[0])
            ddw = _pe_encode128_bwd_c(*dc, dd_emb, T, pe[1])
            dxm = jnp.concatenate(_unwarp_grad_cols(dxw, warp_ref), axis=-1)
            ddm = jnp.concatenate(_unwarp_grad_cols(ddw, warp_ref), axis=-1)
            if input_grads:
                dx_ref[...] = dxm
                dd_ref[...] = ddm
            else:
                # in-kernel pose-grad reduction (same math the VJP rule used
                # to run over the HBM-roundtripped [N, 3] arrays)
                G = (_dot(dxm.astype(jnp.float32).T, x_in.astype(jnp.float32))
                     + _dot(ddm.astype(jnp.float32).T, d_in.astype(jnp.float32)))
                s = jnp.sum(dxm.astype(jnp.float32), axis=0)
                top = jnp.concatenate([G, s[None, :]], axis=0)  # [4, 3]
                pg_ref[...] += jnp.pad(
                    top, ((0, pg_ref.shape[0] - 4), (0, pg_ref.shape[1] - 3)))
        elif input_grads:
            dx_ref[...] = _pe_encode128_bwd(x_in, dx_emb, pe[0])
            dd_ref[...] = _pe_encode128_bwd(d_in, dd_emb, pe[1])
    elif input_grads:
        dx_ref[...] = dx_emb
        dd_ref[...] = dd_emb

    dws = [dW_in, db_in]
    for (dW0, db0, dW1, db1) in dblocks:
        dws += [dW0, db0, dW1, db1]
    dws += [dW_out, db_out, dW_a, db_a, dW_f, db_f,
            jnp.concatenate([dW_v_top, dW_v_bot], axis=0), db_v, dW_r, db_r]
    for dw_ref, dw in zip(dwrefs, dws):
        dw_ref[...] += dw


def _pad_to(x, n_target):
    n = x.shape[0]
    if n == n_target:
        return x
    pad = jnp.zeros((n_target - n,) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _eye128(dtype=jnp.float32):
    return (
        jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ).astype(dtype)


def _t_to_ct(v):
    """[T, C] -> [C, T] for tiny C (Mosaic-safe transpose): contract each
    128-row chunk against a [128, 128] identity on the MXU (C*T*128 MACs —
    negligible) and concatenate along lanes. Mosaic has no cheap relayout
    for small-minor-dim transposes; eye-contractions always lower.

    The identity matmul is exact in f32: every output element is one
    x * 1.0 product (1.0 splits exactly in the MXU's multi-pass f32) plus
    zeros, so the transposed kernel I/O is bit-identical to the legacy
    layout (parity-tested)."""
    T, C = v.shape
    eye = _eye128(v.dtype)
    parts = []
    for i in range(T // 128):
        blk = v[128 * i : 128 * (i + 1), :]
        parts.append(jax.lax.dot_general(
            blk, eye, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
    return jnp.concatenate(parts, axis=-1)


def _ct_to_tc(v):
    """[C, T] -> [T, C] for tiny C; see _t_to_ct."""
    C, T = v.shape
    eye = _eye128(v.dtype)
    parts = []
    for i in range(T // 128):
        blk = v[:, 128 * i : 128 * (i + 1)]
        parts.append(jax.lax.dot_general(
            eye, blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST))
    return jnp.concatenate(parts, axis=0)


def _expand_rows(d_all, S, T):
    """Select this tile's per-point dirs from the VMEM-resident per-RAY
    array: output row t = d_all[program_id * (T // S) + t // S], via a 0/1
    selector matmul — iota + compare + dot are the Mosaic-safe way to
    express the gather/repeat. d_all rides a constant-index-map block (like
    the weights), so it is loaded once for the whole grid."""
    R = d_all.shape[0]
    base = pl.program_id(0) * (T // S)
    rows = jax.lax.broadcasted_iota(jnp.int32, (T, R), 0) // S + base
    cols = jax.lax.broadcasted_iota(jnp.int32, (T, R), 1)
    sel = (rows == cols)
    return jnp.dot(sel.astype(d_all.dtype), d_all,
                   preferred_element_type=jnp.float32).astype(d_all.dtype)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
def _fused_apply_flat(n_blocks, tile, bwd_tile, interpret, pe, saved, masked,
                      warped, input_grads, dstride, io_t, x_emb, d_emb,
                      mask_x, mask_d, warp, *weights):
    return _fused_fwd_call(n_blocks, tile, interpret, pe, x_emb, d_emb, weights,
                           masks=(mask_x, mask_d) if masked else None,
                           warp=warp if warped else None, dstride=dstride,
                           io_t=io_t)


def _pad_rows(w, n_rows):
    if w.shape[0] == n_rows:
        return w
    pad = jnp.zeros((n_rows - w.shape[0],) + w.shape[1:], w.dtype)
    return jnp.concatenate([w, pad], axis=0)


def _pad_weights_for_pe(weights):
    """Lane-aligned PE produces [T, 128] encodings; pad lin_in rows to 128
    and the views matrix's direction rows to 128 (zeros — padded encoding
    columns are zero so results are unchanged)."""
    ws = list(weights)
    W_in = ws[0]
    width = W_in.shape[1]
    ws[0] = _pad_rows(W_in, 128)
    # views weight is at index -4 (order: ..., views w, views b, rgb w, rgb b)
    W_v = ws[-4]
    top, bot = W_v[:width], W_v[width:]
    ws[-4] = jnp.concatenate([top, _pad_rows(bot, 128)], axis=0)
    return tuple(ws)


def _unpad_weight_grads(dws, weights):
    """Slice pe-mode weight grads back to the original shapes."""
    dws = list(dws)
    in_ch = weights[0].shape[0]
    width = weights[0].shape[1]
    view_ch = weights[-4].shape[0] - width
    dws[0] = dws[0][:in_ch]
    dws[-4] = jnp.concatenate([dws[-4][:width], dws[-4][width : width + view_ch]], axis=0)
    return tuple(dws)


def _cast_weights(weights):
    """Matmul weights go to the kernel in bf16 (halves VMEM + HBM traffic);
    biases stay f32 (added post-accumulation)."""
    return tuple(w.astype(jnp.bfloat16) if w.ndim == 2 else w for w in weights)


def _pad_cols(x, n_target):
    n = x.shape[1]
    if n == n_target:
        return x
    pad = jnp.zeros((x.shape[0], n_target - n), x.dtype)
    return jnp.concatenate([x, pad], axis=1)


def _fused_fwd_call(n_blocks, tile, interpret, pe, x_emb, d_emb, weights,
                    save_acts: bool = False, masks=None, warp=None,
                    dstride=None, io_t: bool = False):
    n = x_emb.shape[1] if io_t else x_emb.shape[0]
    n_pad = pl.cdiv(n, tile) * tile
    if io_t:
        # channel-leading I/O: x/d are [3, N] (lane-major, sublane-padded
        # 3->8 = 2.7x vs the [N, 3] lane padding's 43x), out is [4, N]
        xp = _pad_cols(x_emb, n_pad)
        x_spec = pl.BlockSpec((x_emb.shape[0], tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        xp = _pad_to(x_emb, n_pad)
        x_spec = pl.BlockSpec((tile, x_emb.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    if dstride is None:
        if io_t:
            dp = _pad_cols(d_emb, n_pad)
            d_spec = pl.BlockSpec((d_emb.shape[0], tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        else:
            dp = _pad_to(d_emb, n_pad)
            d_spec = pl.BlockSpec((tile, d_emb.shape[1]), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    else:
        # d_emb is per-RAY [R, 3], passed as ONE constant-index block (VMEM
        # resident across the grid like the weights); the kernel selects and
        # expands each tile's rows — the [N, 3] per-point dirs array (and
        # its broadcast + layout copies) never exists in HBM
        dp = _pad_to(d_emb, n_pad // dstride)
        d_spec = pl.BlockSpec(dp.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    grid = (n_pad // tile,)
    wk = _cast_weights(weights)
    if pe is not None:
        wk = _pad_weights_for_pe(wk)

    warp_args, warp_specs = (), []
    if warp is not None:
        warp_args = (warp,)
        warp_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    mask_args, mask_specs = (), []
    if masks is not None:
        mask_args = tuple(masks)
        mask_specs = [
            pl.BlockSpec((1, m.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for m in mask_args
        ]
    w_specs = [
        pl.BlockSpec(w.shape, (lambda i, nd=w.ndim: (0,) * nd))
        for w in wk
    ]
    if io_t:
        out_shapes = [jax.ShapeDtypeStruct((4, n_pad), jnp.float32)]
        out_specs = [pl.BlockSpec((4, tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)]
    else:
        out_shapes = [jax.ShapeDtypeStruct((n_pad, 4), jnp.float32)]
        out_specs = [pl.BlockSpec((tile, 4), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    if save_acts:
        width = weights[0].shape[1]
        for shp in _act_shapes(n_blocks, width, n_pad):
            out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.bfloat16))
            out_specs.append(pl.BlockSpec(
                (tile, shp[1]), lambda i: (i, 0), memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, n_blocks, pe, save_acts,
                          masks is not None, warp is not None, dstride, io_t),
        out_shape=tuple(out_shapes),
        grid=grid,
        in_specs=[
            x_spec,
            d_spec,
            *warp_specs,
            *mask_specs,
            *w_specs,
        ],
        out_specs=tuple(out_specs),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dp, *warp_args, *mask_args, *wk)
    out0 = outs[0][:, :n] if io_t else outs[0][:n]
    if save_acts:
        return out0, outs[1:]  # acts stay padded for the bwd call
    return out0


def _fused_fwd_rule(n_blocks, tile, bwd_tile, interpret, pe, saved, masked,
                    warped, input_grads, dstride, io_t, x_emb, d_emb, mask_x,
                    mask_d, warp, *weights):
    masks = (mask_x, mask_d) if masked else None
    wp = warp if warped else None
    if saved:
        out, acts = _fused_fwd_call(n_blocks, tile, interpret, pe,
                                    x_emb, d_emb, weights, save_acts=True,
                                    masks=masks, warp=wp, dstride=dstride,
                                    io_t=io_t)
        return out, (x_emb, d_emb, mask_x, mask_d, warp, weights, acts)
    out = _fused_fwd_call(n_blocks, tile, interpret, pe, x_emb, d_emb, weights,
                          masks=masks, warp=wp, dstride=dstride, io_t=io_t)
    return out, (x_emb, d_emb, mask_x, mask_d, warp, weights, None)


def _fused_bwd_rule(n_blocks, tile, bwd_tile, interpret, pe, saved, masked,
                    warped, input_grads, dstride, io_t, residuals, g):
    x_emb, d_emb, mask_x, mask_d, warp, weights, acts = residuals
    # saved acts are tiled by the forward tile; the backward must match it
    tile = tile if saved else (bwd_tile or tile)
    n = x_emb.shape[1] if io_t else x_emb.shape[0]
    n_pad = pl.cdiv(n, tile) * tile
    if io_t:
        xp = _pad_cols(x_emb, n_pad)
        x_spec = pl.BlockSpec((x_emb.shape[0], tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        xp = _pad_to(x_emb, n_pad)
        x_spec = pl.BlockSpec((tile, x_emb.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    if dstride is None:
        if io_t:
            dp = _pad_cols(d_emb, n_pad)
            d_spec = pl.BlockSpec((d_emb.shape[0], tile), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        else:
            dp = _pad_to(d_emb, n_pad)
            d_spec = pl.BlockSpec((tile, d_emb.shape[1]), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    else:
        dp = _pad_to(d_emb, n_pad // dstride)
        d_spec = pl.BlockSpec(dp.shape, lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    if io_t:
        gp = _pad_cols(g, n_pad)
        g_spec = pl.BlockSpec((4, tile), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    else:
        gp = _pad_to(g, n_pad)
        g_spec = pl.BlockSpec((tile, 4), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    grid = (n_pad // tile,)
    wk = _cast_weights(weights)
    if pe is not None:
        wk = _pad_weights_for_pe(wk)

    w_specs = [
        pl.BlockSpec(w.shape, (lambda i, nd=w.ndim: (0,) * nd))
        for w in wk
    ]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wk]
    dw_specs = [
        pl.BlockSpec(w.shape, (lambda i, nd=w.ndim: (0,) * nd), memory_space=pltpu.VMEM)
        for w in wk
    ]
    warp_args, warp_specs = (), []
    if warped:
        warp_args = (warp,)
        warp_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    mask_args, mask_specs = (), []
    if masked:
        mask_args = (mask_x, mask_d)
        mask_specs = [
            pl.BlockSpec((1, m.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for m in mask_args
        ]
    act_args, act_specs = (), []
    if saved:
        act_args = tuple(acts)
        act_specs = [
            pl.BlockSpec((tile, a.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
            for a in acts
        ]

    if input_grads:
        pre_shapes = [
            jax.ShapeDtypeStruct((n_pad, x_emb.shape[1]), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, d_emb.shape[1]), jnp.float32),
        ]
        pre_specs = [
            pl.BlockSpec((tile, x_emb.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_emb.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
    elif warped:
        # in-kernel pose-grad accumulator (see _bwd_kernel docstring)
        pre_shapes = [jax.ShapeDtypeStruct((8, 128), jnp.float32)]
        pre_specs = [pl.BlockSpec((8, 128), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)]
    else:
        pre_shapes, pre_specs = [], []

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, n_blocks, pe, saved, masked, warped,
                          input_grads, dstride, io_t),
        out_shape=(*pre_shapes, *dw_shapes),
        grid=grid,
        in_specs=[
            x_spec,
            d_spec,
            *warp_specs,
            *mask_specs,
            *w_specs,
            g_spec,
            *act_specs,
        ],
        out_specs=(*pre_specs, *dw_specs),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dp, *warp_args, *mask_args, *wk, gp, *act_args)

    n_pre = len(pre_shapes)
    dweights = outs[n_pre:]
    if pe is not None:
        dweights = _unpad_weight_grads(dweights, weights)
    if input_grads:
        dx = outs[0][:n]
        dd = outs[1][:n]
    else:
        # rays are batch constants and z samples are stop-gradiented: the
        # input cotangents are structurally zero wrt every parameter (XLA
        # folds these constants; the upstream path is dead)
        dx = jnp.zeros_like(x_emb)
        dd = jnp.zeros_like(d_emb)
    if warped:
        # Pose grads from the world-frame input grads (dx = M^T dxw):
        # dM = sum_t dxw_t p_t^T = M (DX^T X + DD^T D); dt = M sum_t dx_t.
        M = warp[:9].reshape(3, 3)
        if input_grads:
            G = (jnp.einsum("ni,nj->ij", dx, x_emb)
                 + jnp.einsum("ni,nj->ij", dd, d_emb))
            ssum = jnp.sum(dx, axis=0)
        else:
            pg = outs[0]
            G = pg[0:3, 0:3]
            ssum = pg[3, 0:3]
        dM = M @ G
        dt = M @ ssum
        dwarp = jnp.concatenate(
            [dM.reshape(9), dt, jnp.zeros(4, warp.dtype)]).astype(warp.dtype)
    else:
        dwarp = jnp.zeros_like(warp)
    # masks are schedule values, not parameters — zero cotangents
    return (dx, dd, jnp.zeros_like(mask_x), jnp.zeros_like(mask_d), dwarp,
            *dweights)


_fused_apply_flat.defvjp(_fused_fwd_rule, _fused_bwd_rule)


def fused_field_apply(
    params: Dict[str, Any],
    x_emb,
    d_emb,
    n_blocks: int,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
    pe=None,
    bwd_tile: int | None = None,
    saved_acts: bool | None = None,
    pe_masks=None,
    warp=None,
    input_grads: bool = True,
    dirs_stride: int | None = None,
    io_t: bool = False,
):
    """Fused MLP: encoded points [N, in_ch] + encoded dirs [N, view_ch] ->
    (raw_alpha [N], raw_rgb [N, 3]). Differentiable (custom VJP).

    io_t=True switches the kernel's HBM interface to channel-leading
    (transposed) I/O: x/d arrive as [3, N], the result leaves as one [4, N]
    array (alpha row 0, rgb rows 1:3), and the backward's cotangent arrives
    [4, N] — so no lane-padded [N, 3/4] f32 array (43x its logical bytes
    per touch, BENCH_NOTES r4) ever exists in HBM. The transposes run
    in-kernel as exact identity matmuls (_t_to_ct). Returns
    (raw_alpha [N], raw_rgb_t [3, N]). Requires the in-kernel pe mode and
    input_grads=False (the production renderer path).

    input_grads=False drops the backward's per-point dx/dd HBM outputs
    (zero cotangents are returned instead) and, for warped fields, runs the
    pose-grad reduction in-kernel. Safe whenever points/dirs carry no
    parameter gradient — true for the renderer (rays are batch constants,
    importance z samples are stop-gradiented); keep True when
    differentiating through the inputs themselves.

    With pe=(multires, multires_views), x_emb/d_emb are RAW [N, 3] points and
    directions and the positional encoding (and its backward) runs inside the
    kernel — no [N, 90] encode arrays in HBM.

    pe_masks=(mask_x [1, 128], mask_d [1, 128]) multiplies per-column masks
    onto the in-kernel encodings (BARF coarse-to-fine; build with
    pe_mask_row). Requires pe.

    saved_acts=True streams the forward's bf16 activations to HBM and the
    backward consumes them instead of recomputing the chain (forces the
    backward tile to the forward tile).

    warp: packed [16] f32 SE(3) warp (rotation M row-major at [0:9],
    translation at [9:12], zero pad) applied IN-KERNEL before the positional
    encoding: points -> M p + t, dirs -> M d. Differentiable in the warp
    (the VJP recovers dM/dt from the world-frame input grads), so the
    [N, 3] vehicle-frame point/dir arrays never exist in HBM. Requires pe."""
    if interpret is None:
        interpret = not _is_tpu()
    if bwd_tile is None:
        bwd_tile = DEFAULT_BWD_TILE
    if saved_acts is None:
        saved_acts = DEFAULT_SAVED_ACTS
    masked = pe_masks is not None
    if masked and pe is None:
        raise ValueError("pe_masks requires the in-kernel pe mode")
    if masked:
        mask_x, mask_d = pe_masks
    else:
        # unused dummies (DCE'd): custom_vjp needs a fixed positional arity
        mask_x = mask_d = jnp.ones((1, 1), jnp.float32)
    warped = warp is not None
    if warped and pe is None:
        raise ValueError("warp requires the in-kernel pe mode")
    if not warped:
        warp = jnp.zeros((16,), jnp.float32)
    if dirs_stride is not None:
        # d_emb is per-ray [R, 3]; every run of dirs_stride consecutive
        # points shares one row, expanded in VMEM — the [N, 3] per-point
        # dirs array never exists in HBM. The input cotangent for dirs is
        # only implemented in the dropped-input-grads mode.
        if pe is None:
            raise ValueError("dirs_stride requires the in-kernel pe mode")
        if input_grads:
            raise ValueError("dirs_stride requires input_grads=False")
        if tile % dirs_stride != 0:
            raise ValueError(f"tile {tile} not divisible by dirs_stride "
                             f"{dirs_stride}")
        # the backward runs at bwd_tile when saved_acts=False (else the fwd
        # tile); a non-divisible backward tile would make _expand_rows pick
        # wrong per-ray dir rows and silently corrupt weight/pose grads
        bwd_t = tile if saved_acts else bwd_tile
        if bwd_t % dirs_stride != 0:
            raise ValueError(f"backward tile {bwd_t} not divisible by "
                             f"dirs_stride {dirs_stride}")
        n_points = x_emb.shape[1] if io_t else x_emb.shape[0]
        if d_emb.shape[0] * dirs_stride != n_points:
            raise ValueError("d_emb rows * dirs_stride != points")
    if io_t:
        if pe is None:
            raise ValueError("io_t requires the in-kernel pe mode")
        if input_grads:
            raise ValueError("io_t requires input_grads=False")
        if tile % 128 != 0 or (not saved_acts and bwd_tile % 128 != 0):
            raise ValueError("io_t requires 128-divisible tiles "
                             "(in-kernel transpose chunks)")
    flat = flatten_params(params, n_blocks)
    out = _fused_apply_flat(n_blocks, tile, bwd_tile, interpret, pe, saved_acts,
                            masked, warped, bool(input_grads), dirs_stride,
                            io_t, x_emb, d_emb, mask_x, mask_d, warp, *flat)
    if io_t:
        return out[0], out[1:4]  # [N], [3, N] — major-dim slices, no padding
    return out[:, 0], out[:, 1:4]


# ---------------------------------------------------------------------------
# Stacked (K-field) kernel: all K dynamic fields in ONE pallas_call.
#
# The per-vehicle Python unroll costs one fwd + one bwd kernel launch per
# field plus XLA staging copies around each (~18 ms/step measured across the
# flagship step's 8 calls, BENCH_NOTES.md "Known headroom"). Here the grid is
# (K, point-tiles): weight blocks are indexed by the field axis, so K fields
# run in one launch with one set of staging copies, and the K small
# weight-grad accumulations happen inside a single backward kernel.
# ---------------------------------------------------------------------------


def _take_block(ref):
    """Read a (1, ...) weight block and drop the leading field axis; lifted
    biases ([1, 1, W] blocks) also drop their singleton row so kernel math
    adds a plain [W] vector instead of broadcasting [1, W]."""
    w = ref[...][0]
    if w.ndim == 2 and w.shape[0] == 1:
        w = w[0]
    return w


def _stacked_fwd_kernel(n_blocks, pe, x_ref, d_ref, *wrefs_and_out):
    wrefs = wrefs_and_out[:-1]
    out_ref = wrefs_and_out[-1]
    weights = tuple(_take_block(w) for w in wrefs)
    x_emb = x_ref[...][0]
    d_emb = d_ref[...][0]
    if pe is not None:
        x_emb = _pe_encode128(x_emb, pe[0])
        d_emb = _pe_encode128(d_emb, pe[1])
    alpha, rgb = _forward_math(x_emb, d_emb, weights, n_blocks)
    out_ref[...] = jnp.concatenate([alpha, rgb], axis=-1)[None]  # [1, T, 4]


def _stacked_bwd_kernel(n_blocks, pe, x_ref, d_ref, *rest):
    """rest = (*wrefs, g_ref, dx_ref, dd_ref, *dwrefs). Mirrors _bwd_kernel
    with a leading field axis on every block; weight grads are zeroed at each
    field's first point-tile (grid iterates tiles innermost)."""
    n_w = 2 + 4 * n_blocks + 10
    wrefs = rest[:n_w]
    g_ref = rest[n_w]
    dx_ref = rest[n_w + 1]
    dd_ref = rest[n_w + 2]
    dwrefs = rest[n_w + 3 :]

    tile_idx = pl.program_id(1)

    @pl.when(tile_idx == 0)
    def _():
        for dw in dwrefs:
            dw[...] = jnp.zeros_like(dw)

    weights = tuple(_take_block(w) for w in wrefs)
    x_in = x_ref[...][0]
    d_in = d_ref[...][0]
    if pe is not None:
        x_emb = _pe_encode128(x_in, pe[0])
        d_emb = _pe_encode128(d_in, pe[1])
    else:
        x_emb, d_emb = x_in, d_in
    alpha, rgb, acts = _forward_math(x_emb, d_emb, weights, n_blocks, save_acts=True)

    it = iter(weights)
    W_in, b_in = next(it), next(it)
    blocks = [(next(it), next(it), next(it), next(it)) for _ in range(n_blocks)]
    W_out, b_out = next(it), next(it)
    W_a, b_a = next(it), next(it)
    W_f, b_f = next(it), next(it)
    W_v, b_v = next(it), next(it)
    W_r, b_r = next(it), next(it)
    width = W_in.shape[1]

    g = g_ref[...][0]  # [T, 4]
    dalpha = g[:, 0:1]
    drgb = g[:, 1:4]

    hv = jnp.maximum(acts["hv_in"], 0.0)
    dhv = _dot(drgb, W_r.T)
    dW_r = _dot(hv.T, drgb)
    db_r = jnp.sum(drgb, axis=0)

    dhv_in = dhv * _gt0(acts["hv_in"])
    W_v_top = W_v[:width]
    W_v_bot = W_v[width:]
    dW_v_top = _dot(acts["feat"].T, dhv_in)
    dW_v_bot = _dot(d_emb.T, dhv_in)
    db_v = jnp.sum(dhv_in, axis=0)
    dfeat = _dot(dhv_in, W_v_top.T)
    dd_emb = _dot(dhv_in, W_v_bot.T)

    dho = _dot(dfeat, W_f.T) + _dot(dalpha, W_a.T)
    dW_f = _dot(acts["ho"].T, dfeat)
    db_f = jnp.sum(dfeat, axis=0)
    dW_a = _dot(acts["ho"].T, dalpha)
    db_a = jnp.sum(dalpha, axis=0)

    r = jnp.maximum(acts["h_last"], 0.0)
    dr = _dot(dho, W_out.T)
    dW_out = _dot(r.T, dho)
    db_out = jnp.sum(dho, axis=0)
    dh = dr * _gt0(acts["h_last"])

    dblocks = []
    for i in reversed(range(n_blocks)):
        W0, b0, W1, b1 = blocks[i]
        h_in, n = acts[f"blk{i}"]
        a0 = jnp.maximum(h_in, 0.0)
        a1 = jnp.maximum(n, 0.0)
        da1 = _dot(dh, W1.T)
        dW1 = _dot(a1.T, dh)
        db1 = jnp.sum(dh, axis=0)
        dn = da1 * _gt0(n)
        dW0 = _dot(a0.T, dn)
        db0 = jnp.sum(dn, axis=0)
        da0 = _dot(dn, W0.T)
        dh = dh + da0 * _gt0(h_in)
        dblocks.append((dW0, db0, dW1, db1))
    dblocks.reverse()

    dx_emb = _dot(dh, W_in.T)
    dW_in = _dot(x_emb.T, dh)
    db_in = jnp.sum(dh, axis=0)

    if pe is not None:
        dx_ref[...] = _pe_encode128_bwd(x_in, dx_emb, pe[0])[None]
        dd_ref[...] = _pe_encode128_bwd(d_in, dd_emb, pe[1])[None]
    else:
        dx_ref[...] = dx_emb[None]
        dd_ref[...] = dd_emb[None]

    dws = [dW_in, db_in]
    for (dW0, db0, dW1, db1) in dblocks:
        dws += [dW0, db0, dW1, db1]
    dws += [dW_out, db_out, dW_a, db_a, dW_f, db_f,
            jnp.concatenate([dW_v_top, dW_v_bot], axis=0), db_v, dW_r, db_r]
    for dw_ref, dw in zip(dwrefs, dws):
        dw_ref[...] += dw.reshape(dw_ref.shape)


def _pad_rows_axis1(w, n_rows):
    if w.shape[1] == n_rows:
        return w
    pad = jnp.zeros((w.shape[0], n_rows - w.shape[1]) + w.shape[2:], w.dtype)
    return jnp.concatenate([w, pad], axis=1)


def _pad_stacked_weights_for_pe(weights):
    """Stacked ([K, ...]) analog of _pad_weights_for_pe."""
    ws = list(weights)
    width = ws[0].shape[2]
    ws[0] = _pad_rows_axis1(ws[0], 128)
    W_v = ws[-4]
    top, bot = W_v[:, :width], W_v[:, width:]
    ws[-4] = jnp.concatenate([top, _pad_rows_axis1(bot, 128)], axis=1)
    return tuple(ws)


def _unpad_stacked_weight_grads(dws, weights):
    dws = list(dws)
    in_ch = weights[0].shape[1]
    width = weights[0].shape[2]
    view_ch = weights[-4].shape[1] - width
    dws[0] = dws[0][:, :in_ch]
    dws[-4] = jnp.concatenate(
        [dws[-4][:, :width], dws[-4][:, width : width + view_ch]], axis=1
    )
    return tuple(dws)


def _cast_stacked_weights(weights):
    """Stacked leaves carry a leading [K] axis: matmul weights are ndim==3
    (-> bf16), biases ndim==2 (stay f32)."""
    return tuple(w.astype(jnp.bfloat16) if w.ndim == 3 else w for w in weights)


def _lift_biases(wk):
    """Biases [K, W] -> [K, 1, W]: TPU Pallas requires the last two block
    dims divisible by (8, 128) or equal to the array dims, which a (1, W)
    per-field block of a 2-D [K, W] array violates; a (1, 1, W) block of a
    3-D array satisfies it (dims equal). [1, W] broadcasts like [W] in the
    kernel math."""
    return tuple(w if w.ndim == 3 else w[:, None, :] for w in wk)


def _stacked_specs(K, wk):
    return [
        pl.BlockSpec((1,) + w.shape[1:], (lambda k, i, nd=w.ndim: (k,) + (0,) * (nd - 1)))
        for w in wk
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_stacked_flat(n_blocks, tile, interpret, pe, x, d, *weights):
    return _fused_stacked_fwd_call(n_blocks, tile, interpret, pe, x, d, weights)


def _fused_stacked_fwd_call(n_blocks, tile, interpret, pe, x, d, weights):
    K, n = x.shape[0], x.shape[1]
    n_pad = pl.cdiv(n, tile) * tile
    xp = jnp.concatenate(
        [x, jnp.zeros((K, n_pad - n, x.shape[2]), x.dtype)], axis=1
    ) if n_pad != n else x
    dp = jnp.concatenate(
        [d, jnp.zeros((K, n_pad - n, d.shape[2]), d.dtype)], axis=1
    ) if n_pad != n else d
    grid = (K, n_pad // tile)
    wk = _cast_stacked_weights(weights)
    if pe is not None:
        wk = _pad_stacked_weights_for_pe(wk)
    wk = _lift_biases(wk)

    out = pl.pallas_call(
        functools.partial(_stacked_fwd_kernel, n_blocks, pe),
        out_shape=jax.ShapeDtypeStruct((K, n_pad, 4), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, x.shape[2]), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d.shape[2]), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM),
            *_stacked_specs(K, wk),
        ],
        out_specs=pl.BlockSpec((1, tile, 4), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dp, *wk)
    return out[:, :n]


def _fused_stacked_fwd_rule(n_blocks, tile, interpret, pe, x, d, *weights):
    out = _fused_stacked_fwd_call(n_blocks, tile, interpret, pe, x, d, weights)
    return out, (x, d, weights)


def _fused_stacked_bwd_rule(n_blocks, tile, interpret, pe, residuals, g):
    x, d, weights = residuals
    K, n = x.shape[0], x.shape[1]
    n_pad = pl.cdiv(n, tile) * tile

    def pad(a):
        if n_pad == n:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((K, n_pad - n, a.shape[2]), a.dtype)], axis=1
        )

    xp, dp, gp = pad(x), pad(d), pad(g)
    grid = (K, n_pad // tile)
    wk = _cast_stacked_weights(weights)
    if pe is not None:
        wk = _pad_stacked_weights_for_pe(wk)
    wk2d = wk  # padded shapes before the bias lift (grad reshape target)
    wk = _lift_biases(wk)

    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wk]
    dw_specs = _stacked_specs(K, wk)

    outs = pl.pallas_call(
        functools.partial(_stacked_bwd_kernel, n_blocks, pe),
        out_shape=(
            jax.ShapeDtypeStruct((K, n_pad, x.shape[2]), jnp.float32),
            jax.ShapeDtypeStruct((K, n_pad, d.shape[2]), jnp.float32),
            *dw_shapes,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, x.shape[2]), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d.shape[2]), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM),
            *_stacked_specs(K, wk),
            pl.BlockSpec((1, tile, 4), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, x.shape[2]), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, d.shape[2]), lambda k, i: (k, i, 0), memory_space=pltpu.VMEM),
            *dw_specs,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, dp, *wk, gp)

    dx = outs[0][:, :n]
    dd = outs[1][:, :n]
    dweights = tuple(dw.reshape(w.shape) for dw, w in zip(outs[2:], wk2d))
    if pe is not None:
        dweights = _unpad_stacked_weight_grads(dweights, weights)
    return (dx, dd, *dweights)


_fused_stacked_flat.defvjp(_fused_stacked_fwd_rule, _fused_stacked_bwd_rule)


def fused_stacked_apply(
    params_stacked: Dict[str, Any],
    x,
    d,
    n_blocks: int,
    tile: int = DEFAULT_TILE,
    interpret: bool | None = None,
    pe=None,
):
    """K stacked fields (leaves have a leading [K] axis, models/fields.
    init_stacked_fields) evaluated in ONE kernel launch.

    x: [K, N, in_ch], d: [K, N, view_ch] (raw [K, N, 3] with pe set) ->
    (raw_alpha [K, N], raw_rgb [K, N, 3]). Differentiable (custom VJP)."""
    if interpret is None:
        interpret = not _is_tpu()
    flat = flatten_params(params_stacked, n_blocks)
    out = _fused_stacked_flat(n_blocks, tile, interpret, pe, x, d, *flat)
    return out[..., 0], out[..., 1:4]
