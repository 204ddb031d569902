"""Epipolar projection + feature sampling for GNT (pure jnp).

Functional equivalent of the reference Projector
(``/root/reference/pgdvs/models/gnt/projector.py:117-308``): world sample
points are projected into every source camera; source rgb, deep features and
(optionally) dynamic masks are bilinearly sampled at the projections; the
validity mask combines in-front, in-bounds and not-dynamic.

Conventions locked to the reference:
  * rgb is sampled at full resolution with grid_sample align_corners=True
    semantics — i.e. plain bilinear at pixel coordinates with zero padding;
  * feature maps live at 1/4 resolution but are addressed with the *same
    normalized* coordinates, i.e. featmap pixels = uv * (wf-1)/(w-1);
  * a sampled dynamic-mask value > 1e-3 marks the tap invalid
    (``projector.py:265-271``).

TPU performance: the hot op is the random gather (~3.2G taps per 288x550
view at the benchmark config); gathers cost per row, so
  * all V views share ONE flat gather index space (view offset folded into
    the index) instead of a batched/vmapped gather;
  * in the default *fused* mode the quarter-res feature map is pre-upsampled
    once per image and packed with rgb (+ the dynamic mask) into a single
    [V, H, W, 36] map, halving taps per sample at the price of a
    double-interpolation on features (exact reference semantics available
    via ``fused=False``).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pgdvs_tpu.core import cameras


class FlatQuadMaps(NamedTuple):
    """Quad maps pre-flattened to the gather's 2D row table.

    Flattening OUTSIDE the per-tile loop matters: the gather wants a
    row-major [V*H*W, 4C] table, but the map builder's natural layout is
    channel-outer — XLA inserts the relayout transpose wherever the reshape
    sits, and when that is inside the ray-tile ``lax.map`` it re-transposes
    the loop-invariant 0.44 GB table EVERY tile (~1.9 s/view of the bench,
    measured via jax.profiler device trace — scripts/profile_render_trace.py).
    """

    flat: jnp.ndarray                     # [V*H*W, 4C]
    vhw: Tuple[int, int, int]             # static (V, H, W)
    scales: Optional[jnp.ndarray] = None  # [4C] int8 dequant scales


def flatten_quad_maps(qmaps, scales=None) -> FlatQuadMaps:
    """[V, H, W, 4C] (build_quad_maps / quantize_quad_maps) -> FlatQuadMaps."""
    v, h, w, c4 = qmaps.shape
    return FlatQuadMaps(qmaps.reshape(v * h * w, c4), (v, h, w), scales)


class FlatPatchMaps(NamedTuple):
    """fy x fx-pixel patch maps flattened to the gather's 2D row table.

    Row (y, x) stores the fy*fx fused-map pixels (y..y+fy-1, x..x+fx-1)
    (edge-clamped), i-major/j-minor: channel block p = i*fx + j.

    Rationale (the round-4 gather redesign): TPU gathers pay mostly per
    *row*, but the rate decays only mildly with row width (measured
    143 M rows/s at 280 B rows vs 85 M rows/s at 1120 B —
    scripts/perf_archive_2026_08/gather_width_exp2.py). Adjacent target
    rays project ~1 px apart in every source view (the target->source
    reprojection at fixed depth is a homography with Jacobian ~ I for
    rig-like cameras), so ONE patch row serves all taps of a small block
    of target rays: a 4x4 footprint serves a 2x2 ray block (4x fewer
    gather rows than the quad map), a 6x4 footprint serves a 4x2 block
    (8x fewer). The epipolar gather was 5.2 s of the 13.1 s/view round-3
    bench; 2x2 patches cut it to 1.77 s.
    """

    flat: jnp.ndarray          # [V*H*W, fy*fx*C]
    vhw: Tuple[int, int, int]  # static (V, H, W)
    foot: Tuple[int, int] = (4, 4)   # (fy, fx) patch footprint in pixels
    block: Tuple[int, int] = (2, 2)  # (by, bx) ray block it serves


# ray-block name -> ((by, bx) pixel block, (fy, fx) patch footprint):
# footprint = block + 2 per axis (intra-block spread + the 2x2 stencil)
PATCH_BLOCKS = {"2x2": ((2, 2), (4, 4)), "4x2": ((4, 2), (6, 4))}


def build_patch_maps(
    src_rgbs, src_feats, dtype=None, foot=(4, 4), block=(2, 2)
) -> FlatPatchMaps:
    """Fused maps with an fy x fx-pixel footprint packed into channels.

    Returns FlatPatchMaps with rows [V*H*W, fy*fx*C]; row (y, x) holds
    fused pixels (y+i, x+j) for i in 0..fy-1, j in 0..fx-1 (edge-clamped),
    at channel block i*fx+j. fy*fx times the fused-map memory (1.8 GB at
    eval scale for 4x4) — a fine trade on a 16 GB chip for the gather
    row-count saving.
    """
    fused = build_fused_maps(src_rgbs, src_feats, None, dtype=dtype)
    fy, fx = foot

    def shift_x(m, j):
        if j == 0:
            return m
        return jnp.concatenate(
            [m[:, :, j:], jnp.repeat(m[:, :, -1:], j, axis=2)], axis=2
        )

    def shift_y(m, i):
        if i == 0:
            return m
        return jnp.concatenate(
            [m[:, i:], jnp.repeat(m[:, -1:], i, axis=1)], axis=1
        )

    xcat = jnp.concatenate([shift_x(fused, j) for j in range(fx)], axis=-1)
    patch = jnp.concatenate([shift_y(xcat, i) for i in range(fy)], axis=-1)
    v, h, w, cp = patch.shape
    return FlatPatchMaps(patch.reshape(v * h * w, cp), (v, h, w), foot, block)


def _patch_gather(pts, src_cams, pmaps: FlatPatchMaps):
    """Shared patch-gather core: anchor selection + the ONE row gather.

    Returns (rows [v, b, s, fy*fx*C], x, y, sx, sy [V, R, S],
    ax, ay [v, b, s]) where b = R / (by*bx).
    """
    (v, h, w), flat = pmaps.vhw, pmaps.flat
    c16 = flat.shape[-1]
    fy, fx = pmaps.foot
    nb = pmaps.block[0] * pmaps.block[1]  # rays per block
    uv, z, in_front = project_all_views(pts, src_cams)  # [V, R, S, 2]
    r, s = pts.shape[0], pts.shape[1]
    if r % nb != 0:
        raise ValueError(f"patch mode needs rays % {nb} == 0, got {r}")
    b = r // nb

    x, y = uv[..., 0], uv[..., 1]
    sx = jnp.clip(jnp.floor(x), 0, max(w - 2, 0))
    sy = jnp.clip(jnp.floor(y), 0, max(h - 2, 0))

    # anchor: min stencil cell over the block's taps that can contribute
    # (|reach| < 1 px of the image); all-out-of-reach blocks gather an
    # arbitrary valid row — every tap weight is 0
    reach = (x > -1.0) & (x < float(w)) & (y > -1.0) & (y < float(h))
    big = jnp.float32(1e9)
    ax = jnp.clip(
        jnp.min(jnp.where(reach, sx, big).reshape(v, b, nb, s), axis=2),
        0,
        max(w - fx, 0),
    )
    ay = jnp.clip(
        jnp.min(jnp.where(reach, sy, big).reshape(v, b, nb, s), axis=2),
        0,
        max(h - fy, 0),
    )

    offs = (jnp.arange(v, dtype=jnp.int32) * (h * w)).reshape(v, 1, 1)
    base = ay.astype(jnp.int32) * w + ax.astype(jnp.int32) + offs  # [V,B,S]
    # rows stay FLAT [v, b, s, 16C] and are consumed via minor-dim lane
    # slices inside ONE loop fusion — reshaping to [.., 16, C] makes XLA
    # re-lay the gather output pixel-major and copy every slice (measured
    # ~3.4 s/view of relayouts, /tmp/trace_r4_patch)
    rows = jnp.take(flat, base.reshape(-1), axis=0, mode="clip").reshape(
        v, b, s, c16
    )
    # Measured dead ends (round 4, keep future sessions from retrying):
    # * optimization_barrier on (x, y, sx, sy, ax, ay) to stop XLA
    #   duplicating the uv chain into the gather + coef fusions: SLOWER
    #   (8.99 vs 8.93 s/view) — the duplication beats the HBM round trip.
    # * coef as [v, b, s, 64] tap-major lanes (2x pad instead of 8x) with
    #   per-tap [*, 64] x [64, 16C] expansion matmuls in-kernel: SLOWER
    #   (9.86 vs 8.93) — the transposed coef build + 4x wider expansion
    #   matmuls cost more than the padding tax they save.
    return rows, x, y, sx, sy, ax, ay


def patch_clamp_fraction(pts, src_cams, pmaps: FlatPatchMaps):
    """Debug diagnostic (ADVICE r4): fraction of in-reach bilinear taps whose
    stencil cell falls OUTSIDE the block's gathered patch and is therefore
    border-clamped — i.e. sampled up to 2 px off vs quad mode.

    ~0 for rig-like camera sets (the intra-block reprojection spread of a
    by x bx pixel block is ~its pixel extent, which the footprint covers by
    construction). A large value flags a rig whose reprojection Jacobian
    stretches blocks past the footprint (strong rotation between target and
    sources, extreme wide-angle) — patch mode then degrades quality without
    otherwise failing, so drive THIS diagnostic when qualifying a new rig.
    """
    _, x, y, sx, sy, ax, ay = _patch_gather(pts, src_cams, pmaps)
    (v, h, w), (fy, fx) = pmaps.vhw, pmaps.foot
    nb = pmaps.block[0] * pmaps.block[1]
    r, s = pts.shape[0], pts.shape[1]
    b = r // nb
    reach = (
        (x > -1.0) & (x < float(w)) & (y > -1.0) & (y < float(h))
    ).reshape(v, b, nb, s)
    dx = sx.reshape(v, b, nb, s) - ax[:, :, None, :]
    dy = sy.reshape(v, b, nb, s) - ay[:, :, None, :]
    clamped = reach & (
        (dx < 0.0) | (dx > float(fx - 2)) | (dy < 0.0) | (dy > float(fy - 2))
    )
    return jnp.sum(clamped) / jnp.maximum(jnp.sum(reach), 1)


def epipolar_sample_patch_raw(pts, tgt_cam, src_cams, pmaps: FlatPatchMaps):
    """Raw patch rows + per-tap stencil coefficients for the IN-KERNEL
    combine (mono4 ``patch_rows`` mode).

    The combined [V, R, S, C] tensor never exists in HBM: the kernel
    multiplies each row's 16 stencil positions by ``coef`` and feeds the
    result straight into rgbfeat_fc_0 (the XLA-side combine's [*, 35]-minor
    tensors pad to 128 lanes — 3.7x wasted HBM bandwidth, measured
    ~3.4 s/view at bench scale, /tmp/trace_r4_patch).

    Geometry/weights identical to :func:`epipolar_sample_patch`; only where
    the multiply-accumulate happens differs (kernel accumulates in f32 via
    the MXU vs bf16 XLA adds — deviation within bf16 rounding).

    Returns {"rows": [v, R/(by*bx), s, n_pos*C],
    "coef": [v, R/4, 4, s, n_pos] bf16} where n_pos = fy*fx — coef is
    grouped per KERNEL GRID STEP (quads of rays), independent of how many
    rays share a gather row (the kernel fetches the row block at grid
    index i * 4 / (by*bx)).
    """
    rows, x, y, sx, sy, ax, ay = _patch_gather(pts, src_cams, pmaps)
    v, b, s, cp = rows.shape
    fy, fx = pmaps.foot
    nb = pmaps.block[0] * pmaps.block[1]
    n_pos = fy * fx
    r = pts.shape[0]

    def by_tap(q):  # [V, R, S] -> [v, r/4, 4, s] (quad-of-rays grouping)
        return q.reshape(v, r // 4, 4, s)

    # anchors are per GATHER block (nb rays); broadcast to each ray, then
    # regroup to kernel quads — a free reshape since nb % 4 == 0
    def bcast_anchor(a):  # [v, b, s] -> [v, r/4, 4, s]
        a = jnp.broadcast_to(a[:, :, None, :], (v, b, nb, s))
        return a.reshape(v, r // 4, 4, s)

    wx0 = by_tap(jnp.maximum(0.0, 1.0 - jnp.abs(x - sx)))
    wx1 = by_tap(jnp.maximum(0.0, 1.0 - jnp.abs(x - (sx + 1.0))))
    wy0 = by_tap(jnp.maximum(0.0, 1.0 - jnp.abs(y - sy)))
    wy1 = by_tap(jnp.maximum(0.0, 1.0 - jnp.abs(y - sy - 1.0)))
    dx = jnp.clip(by_tap(sx) - bcast_anchor(ax), 0.0, float(fx - 2))
    dy = jnp.clip(by_tap(sy) - bcast_anchor(ay), 0.0, float(fy - 2))

    # ONE broadcast fusion against the n_pos static stencil offsets — a
    # per-position stack would materialize n_pos [v,b,4,s,1] f32 temps
    # whose minor dim pads 128x (2.5 GB each at bench scale)
    pi = jnp.asarray(np.arange(n_pos) // fx, jnp.float32)
    pj = jnp.asarray(np.arange(n_pos) % fx, jnp.float32)
    cy16 = wy0[..., None] * (dy[..., None] == pi) + wy1[..., None] * (
        dy[..., None] == pi - 1.0
    )
    cx16 = wx0[..., None] * (dx[..., None] == pj) + wx1[..., None] * (
        dx[..., None] == pj - 1.0
    )
    coef = (cy16 * cx16).astype(rows.dtype)  # [v, r/4, 4, s, n_pos]
    return {"rows": rows, "coef": coef}


def epipolar_sample_patch(pts, tgt_cam, src_cams, pmaps: FlatPatchMaps):
    """Patch-map epipolar sampling: ONE gather row per (2x2 ray block,
    sample, view).

    REQUIRES rays ordered in 2x2 pixel blocks (render_image_gnt's patch
    ray permutation): rays 4b..4b+3 must be the 2x2 target-pixel block b,
    so their taps in every source view fall within ~2 px of each other.

    Per (view, block, sample) the anchor cell is the min (edge-clamped)
    stencil cell over the block's in-reach taps; each tap's 2x2 bilinear
    stencil is extracted from the gathered 4x4 patch at offsets
    (dy, dx) in [0, 2]^2. Taps whose cell falls outside the patch
    (block spread > 2 px — geometrically ~impossible for rig-like
    cameras, see FlatPatchMaps) are clamped to the patch border: a
    bounded <=2 px sampling shift, never a wrong view or garbage row.

    Values match quad_bilinear to bf16 addition-order (the 4 stencil
    contributions accumulate in index order rather than pairwise).

    Returns the fold-everything kernel contract (views-outer, no mask /
    ray_diff — both recomputed in-kernel): {rgb_feat [V, R, S, C],
    ray_diff/mask/mask_inbound/mask_invalid: None}.
    """
    if pmaps.block != (2, 2):
        raise ValueError(
            "the XLA-combine patch sampler supports only 2x2 ray blocks "
            f"(got {pmaps.block}); larger blocks require the in-kernel "
            "combine (mono4 patch_rows mode)"
        )
    rows, x, y, sx, sy, ax, ay = _patch_gather(pts, src_cams, pmaps)
    v, b, s, c16 = rows.shape
    c = c16 // 16
    r = pts.shape[0]

    def per_tap(q):
        # [V, R, S] -> [v, b, s, 4] (ray LAST: the extraction output is
        # ray-minor so each patch row is read once, then one transpose)
        return q.reshape(v, b, 4, s).transpose(0, 1, 3, 2)

    # per-tap zero-pad bilinear weights (exact quad_bilinear semantics)
    wx0 = per_tap(jnp.maximum(0.0, 1.0 - jnp.abs(x - sx)))
    wx1 = per_tap(jnp.maximum(0.0, 1.0 - jnp.abs(x - (sx + 1.0))))
    wy0 = per_tap(jnp.maximum(0.0, 1.0 - jnp.abs(y - sy)))
    wy1 = per_tap(jnp.maximum(0.0, 1.0 - jnp.abs(y - sy - 1.0)))
    dx = jnp.clip(per_tap(sx) - ax[:, :, :, None], 0.0, 2.0)
    dy = jnp.clip(per_tap(sy) - ay[:, :, :, None], 0.0, 2.0)

    # separable selection: coef(i, j) = cy_i * cx_j, 8 selects per tap
    # instead of 16 two-hot masks
    dt = rows.dtype
    cy = [
        (wy0 * (dy == float(i)) + wy1 * (dy == float(i - 1))).astype(dt)
        for i in range(4)
    ]
    cx = [
        (wx0 * (dx == float(j)) + wx1 * (dx == float(j - 1))).astype(dt)
        for j in range(4)
    ]
    out = jnp.zeros((v, b, s, 4, c), dt)
    for i in range(4):
        for j in range(4):
            p = i * 4 + j
            out = out + (
                rows[:, :, :, None, p * c : (p + 1) * c]
                * (cy[i] * cx[j])[..., None]
            )

    rgb_feat = out.transpose(0, 1, 3, 2, 4).reshape(v, r, s, c)
    return {
        "rgb_feat": rgb_feat,
        "ray_diff": None,
        "mask": None,
        "mask_inbound": None,
        "mask_invalid": None,
    }


def multiview_bilinear(imgs, x, y, zero_pad: bool = True):
    """Bilinear sampling of V same-size maps with one flat gather space.

    Args:
      imgs: [V, H, W, C]; x, y: [V, ...] pixel coordinates per view.

    Returns: [V, ..., C].
    """
    v, h, w, c = imgs.shape
    flat = imgs.reshape(v * h * w, c)
    shape = x.shape
    xf = x.reshape(v, -1)
    yf = y.reshape(v, -1)

    sx = jnp.clip(jnp.floor(xf), 0, max(w - 2, 0))
    sy = jnp.clip(jnp.floor(yf), 0, max(h - 2, 0))
    offs = (jnp.arange(v, dtype=jnp.int32) * (h * w)).reshape(v, 1)
    base = (sy.astype(jnp.int32) * w + sx.astype(jnp.int32) + offs).reshape(-1)

    if zero_pad:
        wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(xf - sx))
        wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(xf - (sx + 1.0)))
        wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(yf - sy))
        wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(yf - (sy + 1.0)))
    else:
        fx = jnp.clip(xf, 0, w - 1.0) - sx
        fy = jnp.clip(yf, 0, h - 1.0) - sy
        wx0, wx1 = 1.0 - fx, fx
        wy0, wy1 = 1.0 - fy, fy

    out = 0.0
    for dd, wgt in (
        (0, wy0 * wx0),
        (1, wy0 * wx1),
        (w, wy1 * wx0),
        (w + 1, wy1 * wx1),
    ):
        # indices are in-bounds by construction (sx/sy clamped, +dd stays
        # inside the row-major [v*h*w] space); mode="clip" skips jnp.take's
        # default out-of-bounds fill select — a full pass over the gathered
        # rows (scripts/hlo_dump_exp.py)
        out = out + jnp.take(
            flat, base + dd, axis=0, mode="clip"
        ) * wgt.reshape(-1, 1).astype(imgs.dtype)
    return out.reshape(shape + (c,))


def project_all_views(pts, src_cams):
    """Project [R, S, 3] points into V cameras: uv [V, R, S, 2], in_front."""
    return jax.vmap(lambda cam: cameras.project_points(pts, cam))(src_cams)


def build_fused_maps(src_rgbs, src_feats, src_invalid_masks=None, dtype=None):
    """Pack rgb + (pre-upsampled) features + optional dynamic mask into one
    full-resolution per-view map: [V, H, W, 3 + F (+1)].

    The upsample uses align_corners bilinear so the subsequent full-res
    bilinear lookup approximates the reference's direct quarter-res lookup
    (exact on the feature-grid lattice; double-interpolated between).
    """
    v, h, w, _ = src_rgbs.shape
    if dtype is not None:
        src_rgbs = src_rgbs.astype(dtype)
        src_feats = src_feats.astype(dtype)
    from pgdvs_tpu.core.interpolate import resize_bilinear

    feats_up = jax.vmap(lambda f: resize_bilinear(f, h, w))(src_feats)
    parts = [src_rgbs, feats_up.astype(src_rgbs.dtype)]
    if src_invalid_masks is not None:
        parts.append(src_invalid_masks.astype(src_rgbs.dtype))
    return jnp.concatenate(parts, axis=-1)


def build_quad_maps(src_rgbs, src_feats, src_invalid_masks=None, dtype=None):
    """Fused maps with the full 2x2 bilinear stencil packed into channels.

    Returns [V, H, W, 4*C] where entry (y, x) stores the fused-map rows
    [(y,x), (y,x+1), (y+1,x), (y+1,x+1)] back to back (edge-clamped).

    Rationale: TPU gathers cost per *row*, so sampling from this map needs
    ONE gather per (sample, view) instead of four — measured ~5x faster at
    the benchmark shape (scripts/gather_exp3.py). 4x HBM for the maps
    (~0.5 GB at eval scale) is a fine trade on a 16 GB chip.
    """
    fused = build_fused_maps(src_rgbs, src_feats, src_invalid_masks, dtype=dtype)
    right = jnp.concatenate([fused[:, :, 1:], fused[:, :, -1:]], axis=2)
    rowp = jnp.concatenate([fused, right], axis=-1)  # [V,H,W,2C]
    down = jnp.concatenate([rowp[:, 1:], rowp[:, -1:]], axis=1)
    return jnp.concatenate([rowp, down], axis=-1)  # [V,H,W,4C]


def quantize_quad_maps(qmaps):
    """Per-channel symmetric int8 quantization of a quad map.

    The GNT transformer consumes the sampled features in bf16 (~0.4%
    relative precision), so per-channel int8 (~0.8% of the per-channel
    range) costs nothing material downstream while shrinking every gather
    row 2x (measured ~21% faster sampling at benchmark scale).

    Returns (int8 maps [V, H, W, 4C], scales [4C] f32).
    """
    amax = jnp.max(jnp.abs(qmaps.astype(jnp.float32)), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(qmaps.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quad_bilinear(qmaps, x, y, scales=None):
    """Bilinear sampling from build_quad_maps output: one gather row/tap.

    Args:
      qmaps: [V, H, W, 4C] or FlatQuadMaps; x, y: [V, ...] pixel
        coordinates per view.

    Returns [V, ..., C] with zero padding outside [0, W-1] x [0, H-1]
    (grid_sample padding_mode='zeros' semantics, matching
    `multiview_bilinear(zero_pad=True)`).
    """
    if isinstance(qmaps, FlatQuadMaps):
        if scales is None:
            scales = qmaps.scales
        (v, h, w), flat = qmaps.vhw, qmaps.flat
        c4 = flat.shape[-1]
    else:
        v, h, w, c4 = qmaps.shape
        flat = qmaps.reshape(v * h * w, c4)
    c = c4 // 4
    shape = x.shape
    xf = x.reshape(v, -1)
    yf = y.reshape(v, -1)

    sx = jnp.clip(jnp.floor(xf), 0, max(w - 2, 0))
    sy = jnp.clip(jnp.floor(yf), 0, max(h - 2, 0))
    offs = (jnp.arange(v, dtype=jnp.int32) * (h * w)).reshape(v, 1)
    base = (sy.astype(jnp.int32) * w + sx.astype(jnp.int32) + offs).reshape(-1)

    # zero-pad weights: taps whose neighbor falls outside contribute 0
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(xf - sx)).reshape(-1, 1)
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(xf - (sx + 1.0))).reshape(-1, 1)
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(yf - sy)).reshape(-1, 1)
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(yf - (sy + 1.0))).reshape(-1, 1)

    # base is in-bounds by construction; mode="clip" avoids the
    # out-of-bounds fill select over the [N, 4C] gathered rows
    row = jnp.take(flat, base, axis=0, mode="clip")  # [N, 4C]
    if scales is not None:  # int8 maps: dequantize after the gather
        row = row.astype(jnp.bfloat16) * scales.astype(jnp.bfloat16)
    dt = row.dtype
    top = row[:, :c] * (wx0 * wy0).astype(dt) + row[:, c : 2 * c] * (
        wx1 * wy0
    ).astype(dt)
    bot = row[:, 2 * c : 3 * c] * (wx0 * wy1).astype(dt) + row[:, 3 * c :] * (
        wx1 * wy1
    ).astype(dt)
    return (top + bot).reshape(shape + (c,))


def epipolar_sample_fused(
    pts,
    tgt_cam,
    src_cams,
    src_maps,
    with_mask: bool,
    quad: bool = False,
    views_outer: bool = False,
    map_scales=None,
    with_ray_diff: bool = True,
    pack_mask: bool = False,
    emit_mask: bool = True,
):
    """Fused-map epipolar sampling: ONE bilinear tap set per (sample, view).

    Args:
      pts: [R, S, 3]; src_maps: [V, H, W, 3+F(+1)] from build_fused_maps, or
        [V, H, W, 4C] from build_quad_maps with quad=True (single gather row
        per tap — the fast path).
      views_outer: return [V, R, S, *] (the fused kernel's native layout)
        instead of [R, S, V, *].
      pack_mask: emit "packed" = rgb_feat with the validity mask as the
        trailing channel (the fused kernel's exact input) INSTEAD of
        separate rgb_feat/mask tensors — XLA fuses the concat into the
        bilinear producer, saving a full [V, R, S, C+1] HBM copy per tile.

    Returns the same dict contract as `epipolar_sample` (with pack_mask:
    "packed" replaces "rgb_feat"/"mask").
    """
    if isinstance(src_maps, FlatQuadMaps):
        if map_scales is None:
            map_scales = src_maps.scales
        v, h, w = src_maps.vhw
    else:
        v, h, w, _ = src_maps.shape
    uv, z, in_front = project_all_views(pts, src_cams)  # [V, R, S, 2]

    if quad:
        sampled = quad_bilinear(
            src_maps, uv[..., 0], uv[..., 1], scales=map_scales
        )  # [V,R,S,C]
    else:
        sampled = multiview_bilinear(src_maps, uv[..., 0], uv[..., 1])
    if with_mask:
        rgb_feat = sampled[..., :-1]
        inv_s = (sampled[..., -1:] > 1e-3).astype(jnp.float32)
    else:
        rgb_feat = sampled
        inv_s = jnp.zeros(sampled.shape[:-1] + (1,), jnp.float32)

    if not emit_mask:
        # validity recomputed downstream (fused-kernel fold_mask): skip the
        # inbound comparisons and the [V, R, S, 1] mask materialization —
        # a pathological-layout ~1 s/view fusion chain at bench scale
        if with_mask or pack_mask:
            raise ValueError("emit_mask=False excludes with_mask/pack_mask")
        to_out = (lambda x: x) if views_outer else (
            lambda x: jnp.moveaxis(x, 0, 2)
        )
        return {
            "ray_diff": None
            if not with_ray_diff
            else to_out(
                jax.vmap(
                    lambda cam: cameras.ray_diff_features(
                        pts,
                        cameras.flat_cam_c2w(tgt_cam),
                        cameras.flat_cam_c2w(cam),
                    )
                )(src_cams)
            ),
            "rgb_feat": to_out(rgb_feat),
            "mask": None,
            "mask_inbound": None,
            "mask_invalid": None,
        }

    inbound = cameras.pixel_inbound(uv, float(h), float(w))

    tgt_c2w = cameras.flat_cam_c2w(tgt_cam)
    if with_ray_diff:
        diff = jax.vmap(
            lambda cam: cameras.ray_diff_features(
                pts, tgt_c2w, cameras.flat_cam_c2w(cam)
            )
        )(src_cams)
    else:
        diff = None  # computed in-kernel (pallas_fold_ray_diff)

    mask_inb = (inbound & in_front).astype(jnp.float32)[..., None]
    mask = mask_inb * (1.0 - inv_s)

    if views_outer:
        to_out = lambda x: x
    else:
        to_out = lambda x: jnp.moveaxis(x, 0, 2)

    out = {
        "ray_diff": None if diff is None else to_out(diff),
        "mask_inbound": to_out(mask_inb),
        "mask_invalid": to_out(inv_s),
    }
    if pack_mask:
        out["packed"] = to_out(
            jnp.concatenate(
                [rgb_feat.astype(jnp.bfloat16), mask.astype(jnp.bfloat16)],
                axis=-1,
            )
        )
    else:
        out["rgb_feat"] = to_out(rgb_feat)
        out["mask"] = to_out(mask)
    return out


def epipolar_sample_quad_raw(pts, tgt_cam, src_cams, qmaps):
    """Quad-map epipolar sampling WITHOUT the lerp: raw gathered rows.

    The bilinear combine is done inside the fused GNT kernel
    (``gnt_fused_mono3`` fold_lerp mode) — the [V, R, S, C] lerp output
    never touches HBM, removing a full-tensor fusion pass per ray tile
    (scripts/hlo_dump_exp.py). Only the no-dyn-mask path is supported
    (the sampled-invalid threshold would need the lerped mask channel).

    Returns dict (views-outer layouts):
      rows [V, R, S, 4C] raw quad rows; frac [V, R, S, 2] f32 fractional
      offsets (x - sx, y - sy, sx/sy clamped to [0, dim-2] — the kernel
      reconstructs the zero-pad bilinear weights exactly);
      mask / mask_inbound [V, R, S, 1] (in-front & in-bounds);
      mask_invalid zeros; ray_diff None (fold_ray_diff in-kernel).
    """
    if isinstance(qmaps, FlatQuadMaps):
        (v, h, w), flat = qmaps.vhw, qmaps.flat
        c4 = flat.shape[-1]
    else:
        v, h, w, c4 = qmaps.shape
        flat = qmaps.reshape(v * h * w, c4)
    uv, z, in_front = project_all_views(pts, src_cams)  # [V, R, S, 2]
    inbound = cameras.pixel_inbound(uv, float(h), float(w))
    x, y = uv[..., 0], uv[..., 1]
    sx = jnp.clip(jnp.floor(x), 0, max(w - 2, 0))
    sy = jnp.clip(jnp.floor(y), 0, max(h - 2, 0))
    offs = (jnp.arange(v, dtype=jnp.int32) * (h * w)).reshape(v, 1, 1)
    base = sy.astype(jnp.int32) * w + sx.astype(jnp.int32) + offs
    rows = jnp.take(flat, base.reshape(-1), axis=0, mode="clip").reshape(
        base.shape + (c4,)
    )
    frac = jnp.stack([x - sx, y - sy], axis=-1)

    mask_inb = (inbound & in_front).astype(jnp.float32)[..., None]
    return {
        "rows": rows,
        "frac": frac,
        "ray_diff": None,
        "mask": mask_inb,
        "mask_inbound": mask_inb,
        "mask_invalid": jnp.zeros_like(mask_inb),
    }


def epipolar_sample(
    pts,
    tgt_cam,
    src_cams,
    src_rgbs,
    src_feats,
    src_invalid_masks=None,
    sample_dtype=None,
    views_outer: bool = False,
):
    """Reference-exact epipolar sampling (separate rgb / feature lookups).

    Args:
      pts: [R, S, 3] world sample points.
      tgt_cam: [34] target flat camera.
      src_cams: [V, 34] source flat cameras.
      src_rgbs: [V, H, W, 3].
      src_feats: [V, Hf, Wf, F] deep features (any resolution).
      src_invalid_masks: optional [V, H, W, 1], 1 = invalid (dynamic).
      sample_dtype: cast maps before sampling (bf16 halves gather bytes).

    Returns dict (all [R, S, V, *]):
      rgb_feat [R, S, V, 3+F], ray_diff [R, S, V, 4],
      mask [R, S, V, 1] (validity incl. dynamic),
      mask_inbound [R, S, V, 1], mask_invalid [R, S, V, 1].
    """
    h, w = src_rgbs.shape[1], src_rgbs.shape[2]
    hf, wf = src_feats.shape[1], src_feats.shape[2]
    tgt_c2w = cameras.flat_cam_c2w(tgt_cam)
    if sample_dtype is not None:
        src_rgbs = src_rgbs.astype(sample_dtype)
        src_feats = src_feats.astype(sample_dtype)

    uv, z, in_front = project_all_views(pts, src_cams)  # [V, R, S, 2]
    inbound = cameras.pixel_inbound(uv, float(h), float(w))

    x, y = uv[..., 0], uv[..., 1]
    rgb_s = multiview_bilinear(src_rgbs, x, y)
    scale_x = (wf - 1.0) / (w - 1.0)
    scale_y = (hf - 1.0) / (h - 1.0)
    feat_s = multiview_bilinear(src_feats, x * scale_x, y * scale_y)
    rgb_feat = jnp.concatenate([rgb_s, feat_s.astype(rgb_s.dtype)], axis=-1)

    diff = jax.vmap(
        lambda cam: cameras.ray_diff_features(pts, tgt_c2w, cameras.flat_cam_c2w(cam))
    )(src_cams)

    mask_inb = (inbound & in_front).astype(jnp.float32)[..., None]
    if src_invalid_masks is not None:
        inv_s = (
            multiview_bilinear(src_invalid_masks.astype(jnp.float32), x, y) > 1e-3
        ).astype(jnp.float32)
        mask = mask_inb * (1.0 - inv_s)
    else:
        inv_s = jnp.zeros_like(mask_inb)
        mask = mask_inb

    if views_outer:
        to_out = lambda arr: arr
    else:
        to_out = lambda arr: jnp.moveaxis(arr, 0, 2)

    return {
        "rgb_feat": to_out(rgb_feat),
        "ray_diff": to_out(diff),
        "mask": to_out(mask),
        "mask_inbound": to_out(mask_inb),
        "mask_invalid": to_out(inv_s),
    }
